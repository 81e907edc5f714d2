"""STL loader tests: binary == ascii, exact-position vertex dedup
(JoinIdenticalVertices analogue), generated normals, render parity with
the same geometry loaded from OBJ, manager dispatch."""

import struct

import numpy as np
import pytest

from tinyrenderder_tpu.models.obj import load_obj
from tinyrenderder_tpu.models.stl import load_stl

# a unit right prism: 2 triangles sharing an edge (4 unique vertices,
# 6 corners in the STL stream -> dedup must merge 2)
TRIS = np.array([
    [[0, 0, 0], [1, 0, 0], [1, 1, 0]],
    [[0, 0, 0], [1, 1, 0], [0, 1, 0]],
], dtype=np.float64)


def _write_binary(path, tris):
    with open(path, "wb") as f:
        f.write(b"\x00" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(struct.pack("<3f", 0, 0, 1))
            for v in t:
                f.write(struct.pack("<3f", *v))
            f.write(struct.pack("<H", 0))


def _write_ascii(path, tris):
    with open(path, "w") as f:
        f.write("solid test\n")
        for t in tris:
            f.write("  facet normal 0 0 1\n    outer loop\n")
            for v in t:
                f.write(f"      vertex {v[0]} {v[1]} {v[2]}\n")
            f.write("    endloop\n  endfacet\n")
        f.write("endsolid test\n")


def test_stl_binary_ascii_identical(tmp_path):
    pb = tmp_path / "m.stl"
    pa = tmp_path / "a.stl"
    _write_binary(pb, TRIS)
    _write_ascii(pa, TRIS)
    mb = load_stl(str(pb), load_textures=False)
    ma = load_stl(str(pa), load_textures=False)
    np.testing.assert_array_equal(mb.positions, ma.positions)
    np.testing.assert_array_equal(mb.faces, ma.faces)


def test_stl_dedup_and_normals(tmp_path):
    p = tmp_path / "m.stl"
    _write_binary(p, TRIS)
    m = load_stl(str(p), load_textures=False)
    assert m.nverts == 4                      # 6 corners -> 4 unique
    assert m.nfaces == 2
    # first-appearance vertex order (deterministic ids)
    np.testing.assert_array_equal(m.positions[0], [0, 0, 0])
    np.testing.assert_array_equal(m.faces[0], [0, 1, 2])
    # finalize() generated area-weighted normals (facet normals dropped)
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4, atol=1e-12)
    assert m.local_aabb is not None


def test_stl_matches_obj_geometry(tmp_path):
    """The same two triangles via STL and OBJ produce identical
    positions/faces after load (shared postprocess contract)."""
    ps = tmp_path / "m.stl"
    _write_binary(ps, TRIS)
    po = tmp_path / "m.obj"
    with open(po, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
                "f 1 2 3\nf 1 3 4\n")
    ms = load_stl(str(ps), load_textures=False)
    mo = load_obj(str(po), load_textures=False)
    np.testing.assert_array_equal(ms.positions, mo.positions)
    np.testing.assert_array_equal(ms.faces, mo.faces)


def test_stl_truncated_raises(tmp_path):
    p = tmp_path / "bad.stl"
    with open(p, "wb") as f:
        f.write(b"\x00" * 80 + struct.pack("<I", 5) + b"\x00" * 30)
    with pytest.raises(ValueError, match="truncated"):
        load_stl(str(p), load_textures=False)


def test_stl_solid_prefixed_binary(tmp_path):
    """Binary files whose 80-byte header starts with 'solid' (common
    exporter quirk) must still parse as binary."""
    p = tmp_path / "m.stl"
    _write_binary(p, TRIS)
    data = bytearray(open(p, "rb").read())
    data[:6] = b"solid "
    open(p, "wb").write(bytes(data))
    m = load_stl(str(p), load_textures=False)
    assert m.nfaces == 2


def test_stl_manager_dispatch(tmp_path):
    from tinyrenderder_tpu.models.manager import load_mesh
    p = tmp_path / "m.stl"
    _write_binary(p, TRIS)
    m = load_mesh(str(p), load_textures=False)
    assert m.nfaces == 2 and m.nverts == 4
