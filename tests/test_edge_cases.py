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


def test_grayscale_diffuse_texture_renders():
    """Grayscale (1-channel) textures must render with the reference's
    zero-filled TGAColor semantics (gray byte lands in the blue channel),
    not crash (regression: IndexError in PhongShader)."""
    from tinyrenderder_tpu.models import procedural
    from tinyrenderder_tpu.models.mesh import Material
    from tinyrenderder_tpu.shaders import PhongShader

    gray = (np.arange(16 * 16) % 256).astype(np.uint8).reshape(16, 16, 1)
    mesh = procedural.uv_sphere(8, 12)
    mesh.materials = [Material(name="gray", diffuse=gray, normal=gray,
                               specular=gray)]
    view, proj = default_view()
    KEY = np.array([1.0, 1.4, 1.0])
    p = make_pass(mesh, PhongShader(KEY, KEY, KEY), view, proj)
    frame = render_oracle([p], 48, 48)
    fb = render_engine([p], 48, 48, backend="tiled")
    assert_parity(frame, fb)
    covered = np.isfinite(frame.zbuffer)
    assert covered.any()
    # gray byte feeds only the blue channel (reference BGRA zero-fill)
    assert (frame.color[covered][:, 0] <= frame.color[covered][:, 2]).all()


def test_truncated_rle_tga_raises_valueerror(tmp_path):
    """A truncated RLE stream must raise ValueError (the documented codec
    contract), not IndexError — on both the Python and native paths."""
    from tinyrenderder_tpu.utils import tga

    img = tga.TGAImage.from_rgb(
        np.random.RandomState(0).randint(0, 255, (8, 8, 3), dtype=np.int64
                                         ).astype(np.uint8))
    path = tmp_path / "ok.tga"
    img.write_tga_file(str(path), rle=True)
    data = path.read_bytes()
    bad = tmp_path / "truncated.tga"
    bad.write_bytes(data[:len(data) // 2])
    for use_native in (False, True):
        import tinyrenderder_tpu.utils.tga as tga_mod
        with pytest.raises((ValueError, OSError)):
            tga_mod.read(str(bad))


def test_depth_restore_then_later_pass():
    """A pass after an exclude_from_output_depth pass must render against
    the RESTORED depth (main.cpp:730 semantics) and its depth must reach
    the output (regression: later passes' depth was dropped)."""
    from tinyrenderder_tpu.models import procedural
    from tinyrenderder_tpu.scene import Scene
    from tinyrenderder_tpu import math3d
    from tinyrenderder_tpu.camera import Camera
    from tinyrenderder_tpu.shaders import GouraudShader

    cam = Camera()
    cam.set_eye(math3d.vec3(0, 0, 3))
    cam.set_target(math3d.vec3(0, 0, 0))
    cam.set_fov(60.0)
    cam.set_aspect(1.0)
    cam.set_clipping(0.1, 50.0)

    def tri_at(z, name):
        from tinyrenderder_tpu.models.mesh import Mesh
        pos = np.array([[-0.5, -0.5, z], [0.5, -0.5, z], [0.0, 0.5, z]])
        return Mesh(positions=pos, faces=np.array([[0, 1, 2]], np.int32),
                    normals=np.tile([0.0, 0.0, 1.0], (3, 1)),
                    uvs=np.zeros((3, 2)), name=name)

    near, far = tri_at(0.5, "near"), tri_at(-0.5, "far")
    for backend in ("oracle", "xla", "tiled"):
        scene = Scene(camera=cam, width=32, height=32)
        scene.add(near, math3d.identity4(), GouraudShader(), name="near",
                  exclude_from_output_depth=True)
        scene.add(far, math3d.identity4(), GouraudShader(), name="far")
        r = scene.render(backend=backend, frustum_cull=False)
        out = np.asarray(r.depth)
        full = np.asarray(r.full_depth)
        assert np.isfinite(out).any(), backend
        # the far triangle's depth is in the output even though it is
        # entirely BEHIND the excluded near triangle (restored z-buffer
        # lets it win those pixels, exactly like the reference restore)
        assert np.isfinite(out).sum() == np.isfinite(full).sum(), backend
