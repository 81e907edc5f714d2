"""Multi-device tests on 8 virtual CPU devices (conftest.py forces
--xla_force_host_platform_device_count=8): the renderer's analogue of
multi-node tests without a cluster.  Sharded output must be
pixel-identical to the single-device path for coverage/winners/color."""

import jax
import numpy as np
import pytest

from helpers import default_view, make_pass, render_engine, standard_meshes
from tinyrenderder_tpu.parallel import dist
from tinyrenderder_tpu.shaders import GouraudShader, PhongShader, TexturedShader

KEY = np.array([1.0, 1.4, 1.0])
FILL = np.array([-0.3, 0.5, 0.2])
RIM = np.array([-1.0, 0.8, -1.5])


@pytest.fixture(scope="module")
def meshes():
    return standard_meshes()


def _passes(meshes, view, proj):
    ps = [
        make_pass(meshes["head"], PhongShader(KEY, FILL, RIM), view, proj),
        make_pass(meshes["plane"], TexturedShader(), view, proj),
        make_pass(meshes["soup"], GouraudShader(), view, proj),
    ]
    return [(p.attrs, p.shader, p.uniforms) for p in ps]


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_matches_single_device(meshes, n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough virtual devices")
    w, h = 96, 64
    view, proj = default_view()
    passes = _passes(meshes, view, proj)

    mesh = dist.make_mesh(n_devices)
    fb_sh = dist.render_frame_sharded(mesh, passes, w, h, tiled=False)
    ps = [make_pass(meshes["head"], PhongShader(KEY, FILL, RIM), view, proj),
          make_pass(meshes["plane"], TexturedShader(), view, proj),
          make_pass(meshes["soup"], GouraudShader(), view, proj)]
    fb_one = render_engine(ps, w, h, backend="xla")

    c_sh = np.asarray(fb_sh.color)
    c_one = np.asarray(fb_one.color)
    w_sh = np.asarray(fb_sh.winner)
    w_one = np.asarray(fb_one.winner)
    d_sh = np.asarray(fb_sh.depth)
    d_one = np.asarray(fb_one.depth)

    assert (w_sh == w_one).all(), "winner map differs under sharding"
    assert (c_sh == c_one).all(), "color differs under sharding"
    assert (np.isfinite(d_sh) == np.isfinite(d_one)).all()
    both = np.isfinite(d_one)
    ulps = np.abs(d_sh[both].view(np.int32).astype(np.int64)
                  - d_one[both].view(np.int32).astype(np.int64))
    assert ulps.max(initial=0) <= 4


def test_sharded_layout_is_row_banded(meshes):
    """The framebuffer really is distributed: each device holds H/N rows."""
    mesh = dist.make_mesh(4)
    fb = dist.new_sharded_framebuffers(mesh, 32, 32)
    shardings = {d.device for d in fb.depth.addressable_shards}
    assert len(shardings) == 4
    for shard in fb.depth.addressable_shards:
        assert shard.data.shape == (8, 32)


def test_mesh_too_many_devices():
    with pytest.raises(ValueError):
        dist.make_mesh(len(jax.devices()) + 1)


def test_indivisible_height_rejected():
    mesh = dist.make_mesh(8)
    with pytest.raises(ValueError):
        dist.new_sharded_framebuffers(mesh, 32, 31)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_tiled_matches_single_device(meshes, n_devices):
    """The production binned/Pallas sharded path (interpret mode on CPU)
    must match the single-device scan path pixel for pixel."""
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough virtual devices")
    w, h = 128, 128         # bands tile-aligned: 128 / 8 devices = 16 rows
    view, proj = default_view()
    passes = _passes(meshes, view, proj)

    mesh = dist.make_mesh(n_devices)
    fb_sh = dist.render_frame_sharded(mesh, passes, w, h, tiled=True)

    ps = [make_pass(meshes["head"], PhongShader(KEY, FILL, RIM), view, proj),
          make_pass(meshes["plane"], TexturedShader(), view, proj),
          make_pass(meshes["soup"], GouraudShader(), view, proj)]
    fb_one = render_engine(ps, w, h, backend="xla")

    assert (np.asarray(fb_sh.winner) == np.asarray(fb_one.winner)).all()
    dc = np.abs(np.asarray(fb_sh.color).astype(int)
                - np.asarray(fb_one.color).astype(int))
    assert dc.max() <= 1
    d_sh, d_one = np.asarray(fb_sh.depth), np.asarray(fb_one.depth)
    assert (np.isfinite(d_sh) == np.isfinite(d_one)).all()


def test_sharded_2d_mesh_matches_single_device(meshes):
    """(2, 4) ('ty','tx') mesh: framebuffer blocks sharded in both screen
    axes, still pixel-identical to single-device."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough virtual devices")
    w, h = 512, 32          # blocks (16, 128): tile-aligned on both axes
    view, proj = default_view()
    passes = _passes(meshes, view, proj)

    mesh = dist.make_mesh_grid(2, 4)
    fb_sh = dist.render_frame_sharded(mesh, passes, w, h, tiled=True)

    ps = [make_pass(meshes["head"], PhongShader(KEY, FILL, RIM), view, proj),
          make_pass(meshes["plane"], TexturedShader(), view, proj),
          make_pass(meshes["soup"], GouraudShader(), view, proj)]
    fb_one = render_engine(ps, w, h, backend="xla")

    assert (np.asarray(fb_sh.winner) == np.asarray(fb_one.winner)).all()
    dc = np.abs(np.asarray(fb_sh.color).astype(int)
                - np.asarray(fb_one.color).astype(int))
    assert dc.max() <= 1
    shards = {s.device for s in fb_sh.color.addressable_shards}
    assert len(shards) == 8


def test_scene_backend_sharded(meshes):
    """Scene.render(backend='sharded') shards over all visible devices
    and matches the xla backend pixel for pixel."""
    from tinyrenderder_tpu import math3d
    from tinyrenderder_tpu.camera import Camera
    from tinyrenderder_tpu.models import procedural
    from tinyrenderder_tpu.scene import Scene

    cam = Camera()
    cam.set_eye(math3d.vec3(0, 0.5, 3))
    cam.set_target(math3d.vec3(0, 0, 0))
    cam.set_fov(60.0)
    cam.set_aspect(1.0)
    cam.set_clipping(0.1, 50.0)

    def build():
        s = Scene(camera=cam, width=128, height=128)
        s.add(meshes["head"], math3d.identity4(),
              PhongShader(KEY, FILL, RIM), name="head")
        s.add(meshes["plane"], math3d.identity4(), TexturedShader(),
              name="plane")
        return s

    a = build().render(backend="xla", frustum_cull=False)
    b = build().render(backend="sharded", frustum_cull=False)
    dc = np.abs(a.color.astype(int) - np.asarray(b.color).astype(int))
    assert dc.max() <= 1


def test_scene_backend_sharded_2d(meshes):
    """Scene.render(backend='sharded-2d') picks a tile-aligned
    ('ty','tx') grid (here (4, 2) on 8 devices) and matches the 1-D
    sharded backend BITWISE — both run the fused production pipeline,
    each proven bitwise against the single-device fused frame.  (The
    CPU 'tiled' backend resolves tiles in XLA, whose FMA grouping
    differs from the kernels by ±1 ulp in affine z — the documented
    cross-path depth variance — so the sharded backends are the
    bitwise anchors here.)"""
    if len(jax.devices()) < 8:
        pytest.skip("not enough virtual devices")
    from tinyrenderder_tpu import math3d
    from tinyrenderder_tpu.camera import Camera
    from tinyrenderder_tpu.scene import Scene

    cam = Camera()
    cam.set_eye(math3d.vec3(0, 0.5, 3))
    cam.set_target(math3d.vec3(0, 0, 0))
    cam.set_fov(60.0)
    cam.set_aspect(2.0)
    cam.set_clipping(0.1, 50.0)

    def build():
        s = Scene(camera=cam, width=256, height=128)
        s.add(meshes["head"], math3d.identity4(),
              PhongShader(KEY, FILL, RIM), name="head")
        s.add(meshes["plane"], math3d.identity4(), TexturedShader(),
              name="plane")
        return s

    a = build().render(backend="sharded", frustum_cull=False)
    b = build().render(backend="sharded-2d", frustum_cull=False)
    assert np.array_equal(a.color, np.asarray(b.color))
    assert np.array_equal(a.depth, np.asarray(b.depth), equal_nan=True)
    # and ≤ 1 LSB vs the single-device tiled backend like every backend
    c = build().render(backend="tiled", frustum_cull=False)
    dc = np.abs(c.color.astype(int) - np.asarray(b.color).astype(int))
    assert dc.max() <= 1


def test_sharded_eye_pass_depth_snapshot(meshes):
    """The full 3-pass eye scene (exclude_from_output_depth on the eye
    pass, main.cpp:700,730) sharded vs xla: bitwise output/full depth +
    winners, <=1-LSB color, and identical SSAO derived from the restored
    depth."""
    from tinyrenderder_tpu import math3d
    from tinyrenderder_tpu.camera import Camera
    from tinyrenderder_tpu.models import procedural
    from tinyrenderder_tpu.ops import post
    from tinyrenderder_tpu.scene import Scene
    from tinyrenderder_tpu.shaders import EyeShader

    cam = Camera()
    cam.set_eye(math3d.vec3(0, 0.8, 3.2))
    cam.set_target(math3d.vec3(0, 0, 0))
    cam.set_fov(60.0)
    cam.set_aspect(1.0)
    cam.set_clipping(0.1, 50.0)

    eyes = procedural.uv_sphere(6, 8, radius=0.15)
    eyes.positions += np.array([0.3, 0.2, 0.85])
    eyes.finalize()

    def build(with_eyes=True):
        s = Scene(camera=cam, width=128, height=128)
        s.add(meshes["plane"], math3d.identity4(), TexturedShader(),
              name="floor")
        s.add(meshes["head"], math3d.identity4(),
              PhongShader(KEY, FILL, RIM), name="head")
        if with_eyes:
            s.add(eyes, math3d.identity4(), EyeShader(KEY, RIM), name="eyes",
                  exclude_from_output_depth=True)
        return s

    a = build().render(backend="xla", frustum_cull=False)
    b = build().render(backend="sharded", frustum_cull=False)
    b_noeyes = build(with_eyes=False).render(backend="sharded",
                                             frustum_cull=False)

    # the restore semantics, bitwise within the sharded backend: the
    # 3-pass output depth must BE the depth of the same scene rendered
    # without the eye pass (main.cpp:700,730)
    assert not np.array_equal(np.asarray(b.depth), np.asarray(b.full_depth)), \
        "eye pass won no pixels — test scene is broken"
    assert np.array_equal(np.asarray(b.depth), np.asarray(b_noeyes.depth)), \
        "sharded output depth must be the pre-eyes snapshot"

    # cross-backend: identical coverage on both depths, depth within ulps
    # (CPU-only FMA-grouping gap between the scan path and the Pallas
    # interpret kernel; bitwise on TPU), color <= 1 LSB
    for d_sh, d_x in ((b.depth, a.depth), (b.full_depth, a.full_depth)):
        d_sh, d_x = np.asarray(d_sh), np.asarray(d_x)
        assert (np.isfinite(d_sh) == np.isfinite(d_x)).all()
        both = np.isfinite(d_x)
        ulps = np.abs(d_sh[both].view(np.int32).astype(np.int64)
                      - d_x[both].view(np.int32).astype(np.int64))
        assert ulps.max(initial=0) <= 4
    dc = np.abs(a.color.astype(int) - np.asarray(b.color).astype(int))
    assert dc.max() <= 1
    assert b.stats.fragments_drawn > 0

    # SSAO derived from the restored depth: near-identical across
    # backends (1-ulp z deltas may flip individual occlusion taps)
    ao_a = np.asarray(post.ssao_image(post.ssao_map(a.depth, np), np))
    ao_b = np.asarray(post.ssao_image(
        post.ssao_map(np.asarray(b.depth), np), np))
    d_ao = np.abs(ao_a.astype(int) - ao_b.astype(int))
    assert d_ao.max() <= 2
    assert (d_ao > 0).mean() < 0.01


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("not enough virtual devices")
    return dist.make_mesh(8)


def test_geometry_sharded_matches_unsharded(meshes, mesh8):
    """Triangle-parallel SPMD (faces sharded, pmin/psum merge over the
    mesh axis): depth, winner AND color bitwise vs the single-device
    scan path — the collectives analogue of SURVEY §2's checklist."""
    import jax.numpy as jnp

    from tinyrenderder_tpu.ops import raster
    view, proj = default_view()
    w, h = 170, 90
    p = make_pass(meshes["head"], PhongShader(KEY, FILL, RIM), view, proj)
    attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
    fb0 = raster.new_framebuffers(w, h)
    fb_ref, _ = raster.render_pass_xla(fb0, attrs, p.shader,
                                       dict(p.uniforms))
    fb_geo = dist.render_pass_geometry_sharded(
        mesh8, fb0, attrs, p.shader, dict(p.uniforms))
    np.testing.assert_array_equal(np.asarray(fb_ref.depth),
                                  np.asarray(fb_geo.depth))
    np.testing.assert_array_equal(np.asarray(fb_ref.winner),
                                  np.asarray(fb_geo.winner))
    np.testing.assert_array_equal(np.asarray(fb_ref.color),
                                  np.asarray(fb_geo.color))


def test_geometry_sharded_frame_with_excluded_pass(meshes, mesh8):
    """Multi-pass geometry-parallel frame incl. the z-snapshot/restore
    semantics (main.cpp:700,730) vs the single-device loop."""
    import jax.numpy as jnp

    from tinyrenderder_tpu import math3d
    from tinyrenderder_tpu.ops import raster
    from tinyrenderder_tpu.shaders import EyeShader
    view, proj = default_view()
    w, h = 170, 90
    g = make_pass(meshes["soup"], GouraudShader(), view, proj)
    e = make_pass(meshes["sphere"], EyeShader(KEY, RIM), view, proj,
                  model_matrix=math3d.translation_matrix(0.3, 0.0, 1.2)
                  @ math3d.scale_matrix(0.4, 0.4, 0.4))
    ph = make_pass(meshes["head"], PhongShader(KEY, FILL, RIM), view, proj)
    passes = []
    for p, excl in ((g, False), (ph, False), (e, True)):
        attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
        passes.append((attrs, p.shader, dict(p.uniforms), excl))

    fb_geo, od_geo = dist.render_frame_geometry_sharded(mesh8, passes, w, h)

    fb = raster.new_framebuffers(w, h)
    snapshot = None
    offset = 0
    for attrs, shader, uniforms, excl in passes:
        if excl and snapshot is None:
            snapshot = fb.depth
        elif not excl and snapshot is not None:
            fb = raster.FrameBuffers(color=fb.color, depth=snapshot,
                                     winner=fb.winner)
            snapshot = None
        fb, _ = raster.render_pass_xla(fb, attrs, shader, uniforms,
                                       winner_offset=offset)
        offset += attrs["position"].shape[0]
    out_depth = snapshot if snapshot is not None else fb.depth

    np.testing.assert_array_equal(np.asarray(fb.depth),
                                  np.asarray(fb_geo.depth))
    np.testing.assert_array_equal(np.asarray(fb.winner),
                                  np.asarray(fb_geo.winner))
    np.testing.assert_array_equal(np.asarray(fb.color),
                                  np.asarray(fb_geo.color))
    np.testing.assert_array_equal(np.asarray(out_depth),
                                  np.asarray(od_geo))


def test_scene_backend_sharded_geometry(meshes):
    """Scene.render(backend='sharded-geometry') matches the xla backend
    (coverage/winner bitwise via color equality on this scene)."""
    from tinyrenderder_tpu import math3d
    from tinyrenderder_tpu.camera import Camera
    from tinyrenderder_tpu.scene import Scene

    cam = Camera()
    cam.set_eye(math3d.vec3(0, 0.5, 3))
    cam.set_target(math3d.vec3(0, 0, 0))
    cam.set_fov(60.0)
    cam.set_aspect(96 / 64)
    cam.set_clipping(0.1, 50.0)
    sc = Scene(camera=cam, width=96, height=64)
    sc.add(meshes["head"], np.eye(4), PhongShader(KEY, FILL, RIM),
           name="head")
    r_x = sc.render(backend="xla")
    r_g = sc.render(backend="sharded-geometry")
    np.testing.assert_array_equal(r_x.color, r_g.color)
    np.testing.assert_array_equal(np.asarray(r_x.full_depth),
                                  np.asarray(r_g.full_depth))


# ---------------------------------------------------------------------------
# PRODUCTION sharded path: the fused sparse/fine frame under shard_map
# (round-3 verdict item #1 — the fast path and the scaled path are the
# same path)
# ---------------------------------------------------------------------------

def _fused_passes(meshes, view, proj):
    ps = [
        make_pass(meshes["head"], PhongShader(KEY, FILL, RIM), view, proj),
        make_pass(meshes["plane"], TexturedShader(), view, proj),
        make_pass(meshes["soup"], GouraudShader(), view, proj),
    ]
    import jax.numpy as jnp
    return [({k: jnp.asarray(v) for k, v in p.attrs.items()},
             p.shader, p.uniforms, i == 1)      # middle pass excluded
            for i, p in enumerate(ps)]


@pytest.mark.parametrize("n_devices,kernel", [
    (8, "coarse"), (8, "fine"), (8, "fine2"), (2, "coarse")])
def test_fused_sharded_bitwise_vs_single(meshes, n_devices, kernel):
    """render_frame_fused_sharded (the production sparse/fine pipeline
    over row bands) is BITWISE identical to the single-device fused
    frame — color, depth, winner, and excluded-pass output depth —
    for both the coarse and the fine kernel."""
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough virtual devices")
    from tinyrenderder_tpu.ops import raster_sparse

    w, h = 128, 16 * 8              # 1 tile row/band at n=8, 4 at n=2
    view, proj = default_view()
    passes = _fused_passes(meshes, view, proj)
    saved = raster_sparse.FINE_MODE
    raster_sparse.FINE_MODE = kernel
    raster_sparse._FINE_DECISION.clear()
    try:
        ft1, od1, _ = raster_sparse.render_frame_fused(passes, w, h)
        fb1 = raster_sparse.tiles_to_buffers(ft1, w, h)
        mesh = dist.make_mesh(n_devices)
        ft2, od2, _ = dist.render_frame_fused_sharded(mesh, passes, w, h)
        fb2 = dist.tiles_to_buffers_sharded(mesh, ft2, w, h)
        od2_hw = dist.untile_one_sharded(mesh, od2, w, h)
    finally:
        raster_sparse.FINE_MODE = saved
        raster_sparse._FINE_DECISION.clear()

    assert (np.asarray(fb1.winner) == np.asarray(fb2.winner)).all()
    assert np.array_equal(np.asarray(fb1.depth), np.asarray(fb2.depth),
                          equal_nan=True)
    assert (np.asarray(fb1.color) == np.asarray(fb2.color)).all()
    assert np.array_equal(np.asarray(od1), np.asarray(od2),
                          equal_nan=True)
    assert od2_hw.shape == (h, w)
    # really distributed: one band shard per device
    shards = {s.device for s in ft2.color.addressable_shards}
    assert len(shards) == n_devices


@pytest.mark.parametrize("n_devices,kernel", [
    (8, "coarse"), (8, "fine"), (8, "fine2"), (2, "fine")])
def test_fused_sharded_interleaved_bitwise(meshes, n_devices, kernel):
    """Interleaved row bands (device b owns tile rows b, b+N, ...) are
    BITWISE identical to the single-device fused frame after the
    transfer-boundary row reorder — color, depth, winner, and the
    excluded-pass output depth — for all three kernels.  Interleaving
    splits contiguous coverage hot spots evenly across devices (the
    round-3 band-imbalance fix, docs/PERFORMANCE.md)."""
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough virtual devices")
    from tinyrenderder_tpu.ops import raster_sparse

    w, h = 128, 16 * 8
    view, proj = default_view()
    passes = _fused_passes(meshes, view, proj)
    saved = raster_sparse.FINE_MODE
    raster_sparse.FINE_MODE = kernel
    raster_sparse._FINE_DECISION.clear()
    try:
        ft1, od1, _ = raster_sparse.render_frame_fused(passes, w, h)
        fb1 = raster_sparse.tiles_to_buffers(ft1, w, h)
        mesh = dist.make_mesh(n_devices)
        ft2, od2, _ = dist.render_frame_fused_sharded(
            mesh, passes, w, h, interleave=True)
        fb2 = dist.tiles_to_buffers_sharded(mesh, ft2, w, h,
                                            interleave=True)
        od2_hw = dist.untile_one_sharded(mesh, od2, w, h, interleave=True)
    finally:
        raster_sparse.FINE_MODE = saved
        raster_sparse._FINE_DECISION.clear()

    assert (np.asarray(fb1.winner) == np.asarray(fb2.winner)).all()
    assert np.array_equal(np.asarray(fb1.depth), np.asarray(fb2.depth),
                          equal_nan=True)
    assert (np.asarray(fb1.color) == np.asarray(fb2.color)).all()
    od1_img = np.asarray(raster_sparse._untile_one_jit(
        od1, w // 128, h // 16, 16, 128, True))
    assert np.array_equal(od1_img, np.asarray(od2_hw), equal_nan=True)
    # really distributed: one band shard per device
    shards = {s.device for s in ft2.color.addressable_shards}
    assert len(shards) == n_devices


@pytest.mark.parametrize("kernel", ["coarse", "fine", "fine2"])
def test_fused_sharded_geom_shard_flag_bitwise(meshes, kernel):
    """Geometry sharding of the vertex stage (geom_shard, the default)
    changes NOTHING in the output: each device transforms a contiguous
    F/N slice and the all_gather restores exact submission order, with
    zero-padded triangles rejected by the cross==0 backface test
    (raster_tiled._vertex_stage).  The head mesh's F is not a multiple
    of 8 (padding path) and the plane mesh has F < 8 (the tiny-pass
    fallback), so both edge paths run."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough virtual devices")
    from tinyrenderder_tpu.ops import raster_sparse

    w, h = 128, 16 * 8
    view, proj = default_view()
    passes = _fused_passes(meshes, view, proj)
    # drop one head triangle so F % 8 != 0 (the zero-padding path)
    head_attrs = {k: v[:-1] for k, v in passes[0][0].items()}
    passes[0] = (head_attrs, *passes[0][1:])
    assert passes[0][0]["position"].shape[0] % 8 != 0  # padding engaged
    assert passes[1][0]["position"].shape[0] < 8       # f < n fallback
    saved = raster_sparse.FINE_MODE
    raster_sparse.FINE_MODE = kernel
    raster_sparse._FINE_DECISION.clear()
    try:
        mesh = dist.make_mesh(8)
        ft1, od1, _ = dist.render_frame_fused_sharded(
            mesh, passes, w, h, geom_shard=False)
        fb1 = dist.tiles_to_buffers_sharded(mesh, ft1, w, h)
        ft2, od2, _ = dist.render_frame_fused_sharded(
            mesh, passes, w, h, geom_shard=True)
        fb2 = dist.tiles_to_buffers_sharded(mesh, ft2, w, h)
    finally:
        raster_sparse.FINE_MODE = saved
        raster_sparse._FINE_DECISION.clear()

    assert (np.asarray(fb1.winner) == np.asarray(fb2.winner)).all()
    assert np.array_equal(np.asarray(fb1.depth), np.asarray(fb2.depth),
                          equal_nan=True)
    assert (np.asarray(fb1.color) == np.asarray(fb2.color)).all()
    assert np.array_equal(np.asarray(od1), np.asarray(od2),
                          equal_nan=True)


@pytest.mark.parametrize("grid,kernel", [
    ((2, 4), "fine"), ((2, 4), "coarse"), ((2, 2), "fine2")])
def test_fused_sharded_2d_blocks_bitwise(meshes, grid, kernel):
    """render_frame_fused_sharded on a 2-D ('ty','tx') mesh — the
    production fused pipeline per screen BLOCK (binning clipped in both
    axes, 2-D kernel pixel origin, flat tile axis sharded over both mesh
    axes jointly) — is bitwise identical to the single-device fused
    frame, including the excluded-pass output depth."""
    n_rows, n_cols = grid
    if len(jax.devices()) < n_rows * n_cols:
        pytest.skip("not enough virtual devices")
    from tinyrenderder_tpu.ops import raster_sparse

    w, h = 128 * n_cols, 16 * n_rows * 2      # 2 tile rows per band
    view, proj = default_view()
    passes = _fused_passes(meshes, view, proj)
    saved = raster_sparse.FINE_MODE
    raster_sparse.FINE_MODE = kernel
    raster_sparse._FINE_DECISION.clear()
    try:
        ft1, od1, _ = raster_sparse.render_frame_fused(passes, w, h)
        fb1 = raster_sparse.tiles_to_buffers(ft1, w, h)
        mesh = dist.make_mesh_grid(n_rows, n_cols)
        ft2, od2, _ = dist.render_frame_fused_sharded(mesh, passes, w, h)
        fb2 = dist.tiles_to_buffers_sharded(mesh, ft2, w, h)
        od2_hw = dist.untile_one_sharded(mesh, od2, w, h)
    finally:
        raster_sparse.FINE_MODE = saved
        raster_sparse._FINE_DECISION.clear()

    assert (np.asarray(fb1.winner) == np.asarray(fb2.winner)).all()
    assert np.array_equal(np.asarray(fb1.depth), np.asarray(fb2.depth),
                          equal_nan=True)
    assert (np.asarray(fb1.color) == np.asarray(fb2.color)).all()
    # flat-tile comparison through the device-major block reorder
    flat_od2 = dist.blocks_to_flat_tiles(od2, w, h, n_rows, n_cols, 16, 128)
    assert np.array_equal(flat_od2, np.asarray(od1), equal_nan=True)
    od1_img = np.asarray(raster_sparse._untile_one_jit(
        od1, w // 128, h // 16, 16, 128, True))
    assert np.array_equal(od1_img, np.asarray(od2_hw), equal_nan=True)
    # really distributed: one block shard per device
    shards = {s.device for s in ft2.color.addressable_shards}
    assert len(shards) == n_rows * n_cols


def test_fused_sharded_async_capacity(meshes):
    """Async mode: no strict sync, capacities refine to band-local sizes
    next frame, output stays bitwise-exact across frames."""
    from tinyrenderder_tpu.ops import raster_sparse

    w, h = 128, 16 * 8
    view, proj = default_view()
    passes = _fused_passes(meshes, view, proj)
    mesh = dist.make_mesh(8)
    ref_ft, _, _ = raster_sparse.render_frame_fused(passes, w, h)
    ref = np.asarray(raster_sparse.tiles_to_buffers(ref_ft, w, h).color)
    for _ in range(3):
        ft, _, ovf = dist.render_frame_fused_sharded(
            mesh, passes, w, h, strict_capacity=False)
        got = np.asarray(dist.tiles_to_buffers_sharded(
            mesh, ft, w, h).color)
        assert (got == ref).all()
        assert not np.asarray(ovf).any()
    # the refinement shrank at least one pass's caps from the
    # full-screen seed to band-local sizes (key layout: f, ntx, nty,
    # tile_h, tile_w, n_rows, n_cols, mode, tag, interleave)
    skeys = [k for k in dist._SHARD_FUSED_CAPS
             if k[5] == 8 and k[6] == 1]
    assert skeys and any(k in dist._SHARD_FUSED_REFINED for k in skeys)


def test_fused_sharded_async_capacity_2d(meshes):
    """Async mode on a ('ty','tx') grid: the per-block totals array
    keeps the 1-D rank (joint-axis sharding), so the same staging/
    resolve machinery refines caps to block-local sizes; output stays
    bitwise-exact across frames."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    from tinyrenderder_tpu.ops import raster_sparse

    w, h = 256, 16 * 4
    view, proj = default_view()
    passes = _fused_passes(meshes, view, proj)
    mesh = dist.make_mesh_grid(2, 2)
    ref_ft, _, _ = raster_sparse.render_frame_fused(passes, w, h)
    ref = np.asarray(raster_sparse.tiles_to_buffers(ref_ft, w, h).color)
    for _ in range(3):
        ft, _, ovf = dist.render_frame_fused_sharded(
            mesh, passes, w, h, strict_capacity=False)
        got = np.asarray(dist.tiles_to_buffers_sharded(
            mesh, ft, w, h).color)
        assert (got == ref).all()
        assert not np.asarray(ovf).any()
    skeys = [k for k in dist._SHARD_FUSED_CAPS
             if k[5] == 2 and k[6] == 2]
    assert skeys and any(k in dist._SHARD_FUSED_REFINED for k in skeys)


def test_scene_backend_sharded_fused_route(meshes):
    """Scene.render(backend='sharded') with a tile-aligned height routes
    through the production fused path and matches the tiled backend
    bitwise (both run the same sparse/fine pipeline)."""
    from tinyrenderder_tpu import math3d, scene as scene_mod
    from tinyrenderder_tpu.camera import Camera
    from tinyrenderder_tpu.scene import Scene

    cam = Camera()
    cam.set_eye(math3d.vec3(0, 0.5, 3))
    cam.set_target(math3d.vec3(0, 0, 0))
    cam.set_fov(60.0)
    cam.set_aspect(1.0)
    cam.set_clipping(0.1, 50.0)

    def build():
        s = Scene(camera=cam, width=128, height=128)
        s.add(meshes["head"], math3d.identity4(),
              PhongShader(KEY, FILL, RIM), name="head")
        s.add(meshes["plane"], math3d.identity4(), TexturedShader(),
              name="plane")
        return s

    saved = scene_mod.FORCE_TILES_LOOP
    scene_mod.FORCE_TILES_LOOP = True     # tiled backend off-TPU
    try:
        a = build().render(backend="tiled", frustum_cull=False,
                           collect_stats=False)
    finally:
        scene_mod.FORCE_TILES_LOOP = saved
    b = build().render(backend="sharded", frustum_cull=False,
                       collect_stats=False)
    assert (np.asarray(a.color) == np.asarray(b.color)).all()
    assert np.array_equal(np.asarray(a.full_depth),
                          np.asarray(b.full_depth), equal_nan=True)


def test_geometry_tiles_bitwise_vs_fused(meshes):
    """PRODUCTION geometry parallelism (faces sharded through the
    binned/Pallas pipeline, pmin/psum merge on tiles) is bitwise-
    identical to the single-device fused frame, incl. the excluded-pass
    output depth (round-3 verdict item #7)."""
    from tinyrenderder_tpu.ops import raster_sparse

    w, h = 128, 96
    view, proj = default_view()
    passes = _fused_passes(meshes, view, proj)
    ft1, od1, _ = raster_sparse.render_frame_fused(passes, w, h)
    fb1 = raster_sparse.tiles_to_buffers(ft1, w, h)
    mesh = dist.make_mesh(8)
    ft2, od2 = dist.render_frame_geometry_tiles(mesh, passes, w, h)
    fb2 = raster_sparse.tiles_to_buffers(ft2, w, h)
    assert (np.asarray(fb1.winner) == np.asarray(fb2.winner)).all()
    assert np.array_equal(np.asarray(fb1.depth), np.asarray(fb2.depth),
                          equal_nan=True)
    assert (np.asarray(fb1.color) == np.asarray(fb2.color)).all()
    assert np.array_equal(np.asarray(od1), np.asarray(od2),
                          equal_nan=True)


def test_scene_backend_geometry_routes_production(meshes):
    """Scene backend 'sharded-geometry' with tile-aligned dims routes
    through the production pipeline and matches the xla backend."""
    from tinyrenderder_tpu import math3d
    from tinyrenderder_tpu.camera import Camera
    from tinyrenderder_tpu.scene import Scene

    cam = Camera()
    cam.set_eye(math3d.vec3(0, 0.5, 3))
    cam.set_target(math3d.vec3(0, 0, 0))
    cam.set_fov(60.0)
    cam.set_aspect(1.0)
    cam.set_clipping(0.1, 50.0)

    def build():
        s = Scene(camera=cam, width=128, height=128)
        s.add(meshes["head"], math3d.identity4(),
              PhongShader(KEY, FILL, RIM), name="head")
        s.add(meshes["plane"], math3d.identity4(), TexturedShader(),
              name="plane")
        return s

    a = build().render(backend="xla", frustum_cull=False)
    b = build().render(backend="sharded-geometry", frustum_cull=False)
    assert (np.isfinite(np.asarray(a.full_depth))
            == np.isfinite(np.asarray(b.full_depth))).all()
    dc = np.abs(np.asarray(a.color).astype(int)
                - np.asarray(b.color).astype(int))
    assert dc.max() <= 1


def test_shadows_through_sharded_backend(meshes):
    """Two-pass shadow mapping composes with the sharded-fused backend:
    bitwise-identical colors to the single-device tiled path (both the
    light-depth pass and the lit pass run per row band)."""
    from tinyrenderder_tpu.camera import Camera
    from tinyrenderder_tpu.models import procedural
    from tinyrenderder_tpu.scene import Scene
    from tinyrenderder_tpu.shadows import ShadowSettings, render_with_shadows

    def build():
        m = procedural.bumpy_head(n_lat=12, n_lon=16)
        m.materials = [procedural.default_head_material()]
        cam = Camera()
        cam.auto_setup_for_scene(m.get_local_aabb(), aspect=2.0)
        sc = Scene(camera=cam, width=128, height=64)
        sc.add(m, np.eye(4), PhongShader(KEY, FILL, RIM), name="head")
        return sc

    st = ShadowSettings(size=128)
    light = np.array([1.0, 1.0, 1.0])
    ra, map_a = render_with_shadows(build(), light, st, backend="tiled")
    rb, map_b = render_with_shadows(build(), light, st, backend="sharded")
    ca, cb = np.asarray(ra.color), np.asarray(rb.color)
    assert (ca.sum(-1) > 0).sum() > 100          # scene actually covers
    np.testing.assert_array_equal(ca, cb)
    # and through 2-D screen blocks (128x64 on 8 devices -> (2,1) or
    # row fallback; either way it must match the 1-D sharded colors)
    rc, _ = render_with_shadows(build(), light, st, backend="sharded-2d")
    np.testing.assert_array_equal(cb, np.asarray(rc.color))
    # depth contract: identical coverage, values within a few ulps
    # (different compiled programs group FMAs differently)
    map_a, map_b = np.asarray(map_a), np.asarray(map_b)
    fin = np.isfinite(map_a)
    np.testing.assert_array_equal(fin, np.isfinite(map_b))
    assert np.abs(map_a[fin] - map_b[fin]).max() <= 4 * np.finfo(
        np.float32).eps


def test_sharded_backends_all_passes_culled(meshes):
    """Every pass frustum-culled -> background frame on both sharded
    backends (regression: the geometry branch indexed visible[-1])."""
    from tinyrenderder_tpu import math3d
    from tinyrenderder_tpu.camera import Camera
    from tinyrenderder_tpu.scene import Scene

    cam = Camera()
    cam.set_eye(math3d.vec3(0, 0, 3))
    cam.set_target(math3d.vec3(0, 0, 0))
    cam.set_fov(40.0)
    cam.set_aspect(1.0)
    cam.set_clipping(0.1, 10.0)
    for backend in ("sharded", "sharded-geometry"):
        s = Scene(camera=cam, width=128, height=128)
        # translate the mesh far behind the camera: culled
        m = math3d.translation_matrix(0.0, 0.0, 500.0)
        s.add(meshes["head"], m, PhongShader(KEY, FILL, RIM), name="head")
        out = s.render(backend=backend, frustum_cull=True)
        assert np.asarray(out.color).sum() == 0
        assert not np.isfinite(np.asarray(out.full_depth)).any()


def test_fold_fused_totals_depth_sentinel_and_lifecycle():
    """Unit test of the sharded-fused caps folding: the depth-only
    sentinel (wt<0) must keep the seeded won-tile cap and leave the
    one-time w refinement unconsumed (regression: _band_quantized_caps
    quantized the sentinel to the 8-floor, so a color pass sharing the
    key shaded 8 won tiles forever); a real measurement then refines w
    once; overflow grows from the CURRENT caps."""
    key = ("unit-test-key",)
    n_band = 64
    try:
        # seed: full-screen-probe caps (coarse: pair, active, won)
        dist._SHARD_FUSED_CAPS[key] = (4096, 48, 40)
        # fold 1: depth-only frame — pair/active shrink, w cap KEPT
        over = dist._fold_fused_totals(key, "coarse",
                                       np.array([500, 10, -1, -1]), n_band)
        assert not over
        caps = dist._SHARD_FUSED_CAPS[key]
        assert caps[-1] == 40, "sentinel consumed the won-tile cap"
        assert caps[0] < 4096 and caps[1] < 48      # refined band-local
        assert key in dist._SHARD_FUSED_REFINED
        assert key not in dist._SHARD_FUSED_W_REFINED
        # fold 2: a real won-tile measurement refines w exactly once
        over = dist._fold_fused_totals(key, "coarse",
                                       np.array([500, 10, 12, -1]), n_band)
        assert not over
        caps = dist._SHARD_FUSED_CAPS[key]
        assert caps[-1] < 40
        assert key in dist._SHARD_FUSED_W_REFINED
        # fold 3: overflow grows from the current caps and reports it
        over = dist._fold_fused_totals(
            key, "coarse", np.array([caps[0] + 1, 10, 12, -1]), n_band)
        assert over
        assert dist._SHARD_FUSED_CAPS[key][0] > caps[0]
        assert dist._SHARD_FUSED_CAPS[key][-1] == caps[-1]   # w stable
    finally:
        dist._SHARD_FUSED_CAPS.pop(key, None)
        dist._SHARD_FUSED_REFINED.discard(key)
        dist._SHARD_FUSED_W_REFINED.discard(key)


def test_geometry_tiles_caps_grow_under_motion(meshes):
    """Geometry-parallel caps seed from the FIRST frame's view; a later
    view with more pair demand must grow them (one frame late, like the
    other async paths) instead of silently dropping triangles forever
    (regression: the path had no overflow detection at all)."""
    import jax.numpy as jnp
    from tinyrenderder_tpu import math3d
    from tinyrenderder_tpu.ops import raster_sparse

    w, h = 128, 128
    proj = np.asarray(math3d.perspective(60.0, 1.0, 0.1, 50.0))
    # view 1: far away — few (strip, tri) pairs
    view_far = np.asarray(math3d.lookat((0, 0, 14.0), (0, 0, 0), (0, 1, 0)))
    # view 2: close — the head fills the frame, many more pairs
    view_near = np.asarray(math3d.lookat((0, 0, 1.6), (0, 0, 0), (0, 1, 0)))
    mesh = dist.make_mesh(4)

    def gpass(view):
        p = make_pass(meshes["head"], PhongShader(KEY, FILL, RIM),
                      view, proj)
        return [({k: jnp.asarray(v) for k, v in p.attrs.items()},
                 p.shader, p.uniforms, False)]

    # clear any caps another test seeded for this (f, grid) key
    f = gpass(view_far)[0][0]["position"].shape[0]
    n = mesh.devices.size
    f_pad = -(-f // n) * n
    key = (f_pad, w // 128, h // 16, 16, 128)
    raster_sparse._SPARSE_CAPACITY.pop(key, None)
    raster_sparse._SPARSE_PENDING.pop(key, None)

    ft, _ = dist.render_frame_geometry_tiles(mesh, gpass(view_far), w, h)
    caps_far = raster_sparse._SPARSE_CAPACITY[key]
    # frame 2 (near view): renders with stale caps (may drop — detected
    # one frame late); frame 3 must be exact after the growth
    dist.render_frame_geometry_tiles(mesh, gpass(view_near), w, h)
    dist.render_frame_geometry_tiles(mesh, gpass(view_near), w, h)
    ft3, _ = dist.render_frame_geometry_tiles(mesh, gpass(view_near), w, h)
    caps_near = raster_sparse._SPARSE_CAPACITY[key]
    assert caps_near[0] >= caps_far[0]
    ref_ft, _, _ = raster_sparse.render_frame_fused(
        gpass(view_near), w, h)
    ref = np.asarray(raster_sparse.tiles_to_buffers(ref_ft, w, h).color)
    got = np.asarray(raster_sparse.tiles_to_buffers(ft3, w, h).color)
    assert (got == ref).all()


@pytest.mark.parametrize("n_devices,kernel,interleave,direct", [
    (8, "coarse", False, True), (8, "fine", False, False),
    (8, "fine", True, True), (8, "fine2", True, False),
    (2, "fine", False, True)])
def test_fused_image_sharded_bitwise(meshes, n_devices, kernel,
                                     interleave, direct):
    """render_frame_fused_image_sharded (single-pass direct-to-image
    under row-band shard_map) must be BITWISE identical to the
    single-device image path — contiguous and interleaved bands, both
    placement variants, every kernel."""
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough virtual devices")
    from tinyrenderder_tpu.ops import raster_sparse

    w, h = 128, 16 * 8
    view, proj = default_view()
    p = make_pass(meshes["head"], PhongShader(KEY, FILL, RIM), view, proj)
    import jax.numpy as jnp
    passes = [({k: jnp.asarray(v) for k, v in p.attrs.items()},
               p.shader, dict(p.uniforms), False)]
    saved = raster_sparse.FINE_MODE
    raster_sparse.FINE_MODE = kernel
    raster_sparse._FINE_DECISION.clear()
    try:
        ref, _ = raster_sparse.render_frame_fused_image(
            passes, w, h, direct=direct)
        mesh = dist.make_mesh(n_devices)
        img, ovf = dist.render_frame_fused_image_sharded(
            mesh, passes, w, h, interleave=interleave, direct=direct)
        # really distributed: one band shard per device (pre-reorder
        # the rows live band-sharded; the deinterleave reshuffle only
        # runs for interleave=True)
        np.testing.assert_array_equal(np.asarray(img), np.asarray(ref))
        assert not bool(np.asarray(ovf).any())
    finally:
        raster_sparse.FINE_MODE = saved
        raster_sparse._FINE_DECISION.clear()


def test_fused_image_sharded_async_capacity(meshes):
    """Async mode: seeded-tiny caps overflow (flagged same frame), the
    staged per-band totals resolve a frame late, growth lands, and a
    later frame is exact."""
    if len(jax.devices()) < 2:
        pytest.skip("not enough virtual devices")
    from tinyrenderder_tpu.ops import raster_sparse

    w, h = 128, 16 * 8
    view, proj = default_view()
    p = make_pass(meshes["head"], PhongShader(KEY, FILL, RIM), view, proj)
    import jax.numpy as jnp
    passes = [({k: jnp.asarray(v) for k, v in p.attrs.items()},
               p.shader, dict(p.uniforms), False)]
    saved = raster_sparse.FINE_MODE
    raster_sparse.FINE_MODE = "coarse"
    raster_sparse._FINE_DECISION.clear()
    try:
        ref, _ = raster_sparse.render_frame_fused_image(passes, w, h)
        mesh = dist.make_mesh(2)
        f = passes[0][0]["position"].shape[0]
        key = (f, 1, 8, 16, 128, 2, 1, "coarse", "fused-sharded", False)
        dist._SHARD_FUSED_CAPS[key] = (8, 8, 8)
        dist._SHARD_FUSED_PENDING.pop(key, None)
        dist._SHARD_FUSED_REFINED.discard(key)
        img, ovf = dist.render_frame_fused_image_sharded(
            mesh, passes, w, h, strict_capacity=False)
        assert bool(np.asarray(ovf).any())
        np.asarray(img)                      # land the staged totals
        for _ in range(4):
            img, ovf = dist.render_frame_fused_image_sharded(
                mesh, passes, w, h, strict_capacity=False)
            if not bool(np.asarray(ovf).any()):
                break
            np.asarray(img)
        assert not bool(np.asarray(ovf).any())
        np.testing.assert_array_equal(np.asarray(img), np.asarray(ref))
    finally:
        raster_sparse.FINE_MODE = saved
        raster_sparse._FINE_DECISION.clear()


# ---------------------------------------------------------------------------
# Measured-load band splitting (round-4 verdict #6)
# ---------------------------------------------------------------------------

def test_balance_bands_optimal_and_capped():
    """The contiguous min-max partition DP must match brute force on
    small instances, respect the band cap, and cover the rows exactly."""
    import itertools
    rng = np.random.default_rng(7)
    for _ in range(20):
        nty = int(rng.integers(4, 10))
        n = int(rng.integers(2, 5))
        costs = rng.integers(0, 50, nty).astype(float)
        cap = int(rng.integers(-(-nty // n), nty + 1))
        bands = dist.balance_bands(costs, n, band_cap=cap)
        assert len(bands) == n
        at = 0
        for lo, rows in bands:
            assert lo == at and 0 <= rows <= cap
            at += rows
        assert at == nty
        got = max(sum(costs[lo:lo + rows]) for lo, rows in bands)
        # brute force over all cut placements
        best = float("inf")
        for cuts in itertools.combinations(range(1, nty), n - 1):
            edges = [0, *cuts, nty]
            sizes = [b - a for a, b in zip(edges, edges[1:])]
            if max(sizes) > cap:
                continue
            best = min(best, max(sum(costs[a:b])
                                 for a, b in zip(edges, edges[1:])))
        if best < float("inf"):
            assert got <= best + 1e-9, (costs, n, cap, bands)


def test_measured_row_costs_match_tile_spans():
    """measure_tile_row_costs must agree with summing the binning's own
    per-band pair totals (the same clamped-bbox clip)."""
    from tinyrenderder_tpu.ops import raster_sparse
    from tinyrenderder_tpu.ops.raster_tiled import _tile_spans

    w, h = 128, 16 * 8
    view, proj = default_view()
    passes = _fused_passes(meshes_local(), view, proj)
    costs = dist.measure_tile_row_costs(passes, w, h)
    nty = h // 16
    assert costs.shape == (nty,)
    ref = np.zeros(nty, np.int64)
    for attrs, shader, uniforms, _ex in passes:
        setup, _ = raster_sparse._vertex_setup(
            attrs, dict(uniforms), shader, w, h)
        for t in range(nty):
            *_, tot = _tile_spans(setup, 128, 16, ty_lo=t, ty_hi=t)
            ref[t] += int(jax.device_get(tot))
    np.testing.assert_array_equal(costs, ref)


def meshes_local():
    return standard_meshes()


@pytest.mark.parametrize("kernel", ["coarse", "fine", "fine2"])
def test_fused_sharded_measured_bands_bitwise(meshes, kernel):
    """Measured-load bands (unequal contiguous row counts under one
    static band shape) must stay BITWISE identical to the single-device
    fused frame for every kernel, including the excluded-pass output
    depth and the (H, W) untiles."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough virtual devices")
    from tinyrenderder_tpu.ops import raster_sparse

    w, h = 128, 16 * 16             # 16 tile rows over 8 devices
    view, proj = default_view()
    passes = _fused_passes(meshes, view, proj)
    costs = dist.measure_tile_row_costs(passes, w, h)
    bands = dist.balance_bands(costs, 8)
    # the scene concentrates coverage: the measured split must NOT be
    # the even split (otherwise this test exercises nothing new)
    assert any(r != 2 for _, r in bands), bands
    saved = raster_sparse.FINE_MODE
    raster_sparse.FINE_MODE = kernel
    raster_sparse._FINE_DECISION.clear()
    try:
        ft1, od1, _ = raster_sparse.render_frame_fused(passes, w, h)
        fb1 = raster_sparse.tiles_to_buffers(ft1, w, h)
        mesh = dist.make_mesh(8)
        ft2, od2, _ = dist.render_frame_fused_sharded(
            mesh, passes, w, h, bands=bands)
        fb2 = dist.tiles_to_buffers_sharded(mesh, ft2, w, h, bands=bands)
        od2_hw = dist.untile_one_sharded(mesh, od2, w, h, bands=bands)
        od1_hw = raster_sparse._untile_one_jit(
            od1, w // 128, h // 16, 16, 128,
            jax.default_backend() != "tpu")[:h, :w]
        # image path under the same bands (single color pass)
        one = passes[:1]
        img1, _ = raster_sparse.render_frame_fused_image(one, w, h)
        img2, _ = dist.render_frame_fused_image_sharded(
            mesh, one, w, h, bands=bands)
    finally:
        raster_sparse.FINE_MODE = saved
        raster_sparse._FINE_DECISION.clear()

    assert (np.asarray(fb1.winner) == np.asarray(fb2.winner)).all()
    assert np.array_equal(np.asarray(fb1.depth), np.asarray(fb2.depth),
                          equal_nan=True)
    assert (np.asarray(fb1.color) == np.asarray(fb2.color)).all()
    assert np.array_equal(np.asarray(od1_hw), np.asarray(od2_hw),
                          equal_nan=True)
    assert (np.asarray(img1) == np.asarray(img2)).all()


def test_measured_bands_reject_bad_partition(meshes):
    if len(jax.devices()) < 8:
        pytest.skip("not enough virtual devices")
    view, proj = default_view()
    passes = _fused_passes(meshes, view, proj)
    mesh = dist.make_mesh(8)
    with pytest.raises(ValueError):
        dist.render_frame_fused_sharded(
            mesh, passes, 128, 16 * 16,
            bands=tuple((i, 1) for i in range(8)))      # covers 8 of 16


def test_scene_backend_sharded_measured_route(meshes):
    """Scene.render(backend='sharded-measured') routes through the
    measured-band fused path (unequal contiguous bands) and matches the
    tiled backend bitwise; the band partition is cached per scene
    state and invalidated by camera motion."""
    from tinyrenderder_tpu import math3d, scene as scene_mod
    from tinyrenderder_tpu.camera import Camera
    from tinyrenderder_tpu.scene import Scene

    if len(jax.devices()) < 8:
        pytest.skip("not enough virtual devices")

    cam = Camera()
    cam.set_eye(math3d.vec3(0, 0.5, 3))
    cam.set_target(math3d.vec3(0, 0, 0))
    cam.set_fov(60.0)
    cam.set_aspect(1.0)
    cam.set_clipping(0.1, 50.0)

    def build():
        # height = 10 tile rows: NOT divisible by 8 devices — only the
        # measured-band layout can run the fused path here
        s = Scene(camera=cam, width=128, height=160)
        s.add(meshes["head"], math3d.identity4(),
              PhongShader(KEY, FILL, RIM), name="head")
        s.add(meshes["plane"], math3d.identity4(), TexturedShader(),
              name="plane")
        return s

    saved = scene_mod.FORCE_TILES_LOOP
    scene_mod.FORCE_TILES_LOOP = True     # tiled backend off-TPU
    try:
        a = build().render(backend="tiled", frustum_cull=False,
                           collect_stats=False)
    finally:
        scene_mod.FORCE_TILES_LOOP = saved
    sc = build()
    b = sc.render(backend="sharded-measured", frustum_cull=False,
                  collect_stats=False)
    cache = sc.__dict__.get("_band_cache")
    assert cache and cache.get("bands"), "measured route not taken"
    bands = cache["bands"]
    assert sum(r for _, r in bands) == 10
    assert (np.asarray(a.color) == np.asarray(b.color)).all()
    assert np.array_equal(np.asarray(a.full_depth),
                          np.asarray(b.full_depth), equal_nan=True)
    # camera motion invalidates the key; the re-measure resolves ASYNC
    # (previous partition serves meanwhile — never a per-frame block)
    refs0 = cache["refs"]
    sc.camera.set_eye(math3d.vec3(0.2, 0.5, 3))
    c = sc.render(backend="sharded-measured", frustum_cull=False,
                  collect_stats=False)
    assert cache["refs"] is not refs0 or cache["pending"] is not None
    # frames stay bitwise-correct regardless of which partition served
    scene_mod2 = __import__("tinyrenderder_tpu.scene",
                            fromlist=["scene"])
    saved2 = scene_mod2.FORCE_TILES_LOOP
    scene_mod2.FORCE_TILES_LOOP = True
    try:
        sc2 = build()
        sc2.camera.set_eye(math3d.vec3(0.2, 0.5, 3))
        ref2 = sc2.render(backend="tiled", frustum_cull=False,
                          collect_stats=False)
    finally:
        scene_mod2.FORCE_TILES_LOOP = saved2
    assert (np.asarray(c.color) == np.asarray(ref2.color)).all()
    # the pending async measurement resolves on a later frame (loop:
    # the D2H land time is host-load dependent on the 1-vCPU box)
    for _ in range(20):
        sc.render(backend="sharded-measured", frustum_cull=False,
                  collect_stats=False)
        if cache["pending"] is None:
            break
        import time
        time.sleep(0.1)
    assert cache["pending"] is None


def test_scene_backend_sharded_auto_measured_on_nondivisible(meshes):
    """backend='sharded' on a tile-aligned frame whose rows do NOT
    divide by the device count must auto-route through measured bands
    (fused path) instead of the non-fused fallback, bitwise vs tiled."""
    from tinyrenderder_tpu import math3d, scene as scene_mod
    from tinyrenderder_tpu.camera import Camera
    from tinyrenderder_tpu.scene import Scene

    if len(jax.devices()) < 8:
        pytest.skip("not enough virtual devices")

    cam = Camera()
    cam.set_eye(math3d.vec3(0, 0.5, 3))
    cam.set_target(math3d.vec3(0, 0, 0))
    cam.set_fov(60.0)
    cam.set_aspect(1.0)
    cam.set_clipping(0.1, 50.0)

    def build():
        s = Scene(camera=cam, width=128, height=176)   # 11 tile rows
        s.add(meshes["head"], math3d.identity4(),
              PhongShader(KEY, FILL, RIM), name="head")
        return s

    calls = []
    orig = dist.render_frame_fused_sharded

    def spy(*a, **kw):
        calls.append(kw.get("bands"))
        return orig(*a, **kw)

    saved_fn = dist.render_frame_fused_sharded
    saved = scene_mod.FORCE_TILES_LOOP
    scene_mod.FORCE_TILES_LOOP = True
    try:
        a = build().render(backend="tiled", frustum_cull=False,
                           collect_stats=False)
    finally:
        scene_mod.FORCE_TILES_LOOP = saved
    dist.render_frame_fused_sharded = spy
    try:
        b = build().render(backend="sharded", frustum_cull=False,
                           collect_stats=False)
    finally:
        dist.render_frame_fused_sharded = saved_fn
    assert calls and calls[0] is not None, \
        "non-divisible frame did not take the measured-band fused route"
    assert sum(r for _, r in calls[0]) == 11
    assert (np.asarray(a.color) == np.asarray(b.color)).all()
    assert np.array_equal(np.asarray(a.full_depth),
                          np.asarray(b.full_depth), equal_nan=True)
