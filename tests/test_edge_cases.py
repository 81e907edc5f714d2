"""Adversarial inputs and determinism (SURVEY §4 item 5).

The reference tolerates degenerate data inline (w<=eps, NaN/Inf,
zero-area triangles — our_gl.cpp:94-114, :82-83); the engine must make
the same decisions and never crash, and repeated renders must be
bit-identical (the determinism tests play the race-detector role for
the parallel depth resolve, SURVEY §5).
"""

import numpy as np
import pytest

from helpers import assert_parity, default_view, make_pass, render_engine, render_oracle
from tinyrenderder_tpu.models.mesh import Mesh
from tinyrenderder_tpu.shaders import GouraudShader


def _mesh_from_tris(tris) -> Mesh:
    tris = np.asarray(tris, dtype=np.float64).reshape(-1, 3, 3)
    n = tris.shape[0]
    return Mesh(positions=tris.reshape(-1, 3),
                faces=np.arange(n * 3, dtype=np.int32).reshape(n, 3),
                normals=np.tile([0.0, 0.0, 1.0], (n * 3, 1)),
                uvs=np.zeros((n * 3, 2)))


@pytest.mark.parametrize("backend", ["xla", "tiled"])
def test_degenerate_triangles_match_oracle(backend):
    tris = [
        # zero area (all points identical)
        [[0, 0, 0], [0, 0, 0], [0, 0, 0]],
        # collinear sliver
        [[-1, 0, 0], [0, 0, 0], [1, 0, 0]],
        # NaN vertex
        [[np.nan, 0, 0], [1, 0, 0], [0, 1, 0]],
        # vertex behind the eye (clip w <= 0 after projection)
        [[0, 0, 10], [1, 0, 10], [0, 1, 10]],
        # one normal visible triangle to prove the pass still renders
        [[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.0, 0.5, 0]],
        # gigantic triangle spanning far beyond the screen
        [[-50, -50, -1], [50, -50, -1], [0, 80, -1]],
    ]
    mesh = _mesh_from_tris(tris)
    view, proj = default_view()
    p = make_pass(mesh, GouraudShader(), view, proj)
    frame = render_oracle([p], 64, 48)
    fb = render_engine([p], 64, 48, backend=backend)
    assert_parity(frame, fb)
    assert np.isfinite(frame.zbuffer).any(), "nothing rendered at all"


@pytest.mark.parametrize("backend", ["xla", "tiled"])
def test_render_is_deterministic(backend):
    from helpers import standard_meshes
    meshes = standard_meshes()
    view, proj = default_view()
    p = make_pass(meshes["soup"], GouraudShader(), view, proj)
    fb1 = render_engine([p], 96, 64, backend=backend)
    fb2 = render_engine([p], 96, 64, backend=backend)
    assert (np.asarray(fb1.color) == np.asarray(fb2.color)).all()
    d1, d2 = np.asarray(fb1.depth), np.asarray(fb2.depth)
    assert np.array_equal(d1, d2, equal_nan=True)
    assert (np.asarray(fb1.winner) == np.asarray(fb2.winner)).all()


def test_random_soups_match_oracle():
    """Property sweep: several random triangle soups (including slivers
    crossing the camera plane) agree with the oracle exactly."""
    from tinyrenderder_tpu.models import procedural
    view, proj = default_view()
    for seed in (1, 17, 99):
        soup = procedural.triangle_soup(48, seed=seed, spread=2.0,
                                        tri_size=0.8)
        p = make_pass(soup, GouraudShader(), view, proj)
        frame = render_oracle([p], 72, 56)
        fb = render_engine([p], 72, 56, backend="tiled")
        assert_parity(frame, fb)
