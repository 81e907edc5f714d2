"""OFF loader tests: magic variants, quad fan triangulation, COFF
colors ignored, truncation contract, OBJ parity, manager dispatch."""

import numpy as np
import pytest

from tinyrenderder_tpu.models.obj import load_obj
from tinyrenderder_tpu.models.off import load_off

QUAD = """OFF
# a quad
4 1 4
0 0 0
1 0 0
1 1 0
0 1 0
4 0 1 2 3
"""


def _check_quad(m):
    assert m.nverts == 4 and m.nfaces == 2
    np.testing.assert_allclose(
        m.positions, [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]])
    np.testing.assert_array_equal(m.faces, [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4, atol=1e-12)


def test_off_quad(tmp_path):
    p = tmp_path / "q.off"
    p.write_text(QUAD)
    _check_quad(load_off(str(p), load_textures=False))


def test_off_counts_on_magic_line_and_colors(tmp_path):
    p = tmp_path / "c.off"
    p.write_text("COFF 4 2 0\n"
                 "0 0 0 255 0 0\n1 0 0 0 255 0\n"
                 "1 1 0 0 0 255\n0 1 0 255 255 0\n"
                 "3 0 1 2 0.5 0.5 0.5\n3 0 2 3 0.1 0.2 0.3\n")
    _check_quad(load_off(str(p), load_textures=False))


def test_off_matches_obj_geometry(tmp_path):
    po = tmp_path / "q.obj"
    po.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    pf = tmp_path / "q.off"
    pf.write_text(QUAD)
    o = load_obj(str(po), load_textures=False)
    f = load_off(str(pf), load_textures=False)
    np.testing.assert_array_equal(o.faces, f.faces)
    np.testing.assert_allclose(o.positions, f.positions)
    np.testing.assert_allclose(o.normals, f.normals)


def test_off_truncated_and_malformed(tmp_path):
    p = tmp_path / "t.off"
    for bad in ("OFF\n4 2 0\n0 0 0\n",               # missing lines
                "OFF\n4 1 0\n0 0 0\n1 0 0\n1 1 0\n0 1 0\n4 0 1 2\n",
                "OFF\nx y z\n",                       # counts malformed
                "OFF\n3 1 0\n0 0 0\n1 0 0\n0 1 0\n3 0 1 7\n",  # oob
                ""):
        p.write_text(bad)
        with pytest.raises(ValueError):
            load_off(str(p), load_textures=False)


def test_off_manager_dispatch(tmp_path):
    from tinyrenderder_tpu.models.manager import load_mesh
    p = tmp_path / "q.off"
    p.write_text(QUAD)
    m = load_mesh(str(p), load_textures=False)
    assert m.nfaces == 2
