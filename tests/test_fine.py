"""Fine (strip-parallel) sparse rasterizer (ops.raster_fine) tests.

The strip kernel must be bitwise-identical to the coarse sparse kernel
on coverage, winner and depth maps and produce identical colors — the
cross-backend exactness invariant extends to it because its sub-block
merge keeps the coarse kernel's argmin op structure (raster_fine.py
module docstring / e35d513)."""

import numpy as np
import pytest

from helpers import default_view, make_pass, standard_meshes
from tinyrenderder_tpu import math3d
from tinyrenderder_tpu.ops import raster, raster_fine, raster_sparse
from tinyrenderder_tpu.shaders import (DepthShader, GouraudShader,
                                       PhongShader)

KEY = math3d.normalized(math3d.vec3(1.0, 1.4, 1.0))
FILL = math3d.normalized(math3d.vec3(-0.3, 0.5, 0.2))
RIM = math3d.normalized(math3d.vec3(-1.0, 0.8, -1.5))


@pytest.fixture(scope="module")
def meshes():
    return standard_meshes()


def _clear_caches():
    raster_fine._FINE_CAPACITY.clear()
    raster_fine._FINE_PENDING.clear()


def _render_both(p, w, h, ft=None, collect_stats=False):
    import jax.numpy as jnp
    attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
    ft0 = ft if ft is not None else raster_sparse.new_frame_tiles(w, h)
    out_c = raster_sparse.render_pass_tiles(
        ft0, attrs, p.shader, dict(p.uniforms), w, h,
        collect_stats=collect_stats)
    out_f = raster_fine.render_pass_fine(
        ft0, attrs, p.shader, dict(p.uniforms), w, h,
        collect_stats=collect_stats)
    return out_c, out_f


def _assert_frames_equal(ft_c, ft_f, w, h):
    fb_c = raster_sparse.tiles_to_buffers(ft_c, w, h)
    fb_f = raster_sparse.tiles_to_buffers(ft_f, w, h)
    np.testing.assert_array_equal(np.asarray(fb_c.winner),
                                  np.asarray(fb_f.winner))
    np.testing.assert_array_equal(np.asarray(fb_c.depth),
                                  np.asarray(fb_f.depth))
    np.testing.assert_array_equal(np.asarray(fb_c.color),
                                  np.asarray(fb_f.color))


def test_fine_matches_coarse_bitwise(meshes):
    """Depth/winner/color bitwise vs the coarse sparse path across mesh
    shapes (tiny soup triangles, curved head, huge cube faces) and
    ragged frame edges."""
    view, proj = default_view()
    w, h = 160, 42
    for name, shader in (("soup", GouraudShader()),
                         ("head", PhongShader(KEY, FILL, RIM,
                                              normal_map_strength=0.5)),
                         ("cube", GouraudShader()),
                         ("head", DepthShader())):
        p = make_pass(meshes[name], shader, view, proj)
        (ft_c, _, ovf_c), (ft_f, _, ovf_f) = _render_both(p, w, h)
        assert not bool(ovf_f)
        _assert_frames_equal(ft_c, ft_f, w, h)


def test_fine_multipass_accumulation(meshes):
    """Sequential passes on the same frame (depth carry-through between
    meshes) stay bitwise-equal to the coarse path."""
    import jax.numpy as jnp
    view, proj = default_view()
    w, h = 256, 128
    ft_c = raster_sparse.new_frame_tiles(w, h)
    ft_f = raster_sparse.new_frame_tiles(w, h)
    offset = 0
    for name, shader in (("soup", GouraudShader()),
                         ("head", PhongShader(KEY, FILL, RIM))):
        p = make_pass(meshes[name], shader, view, proj)
        attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
        ft_c, _, _ = raster_sparse.render_pass_tiles(
            ft_c, attrs, p.shader, dict(p.uniforms), w, h,
            winner_offset=offset)
        ft_f, _, _ = raster_fine.render_pass_fine(
            ft_f, attrs, p.shader, dict(p.uniforms), w, h,
            winner_offset=offset)
        offset += attrs["position"].shape[0]
    _assert_frames_equal(ft_c, ft_f, w, h)


def test_fused_depth_only_pass_per_kernel(meshes):
    """A depth-only pass inside the fused frame stays bitwise-identical
    to the coarse routing under every kernel (the DEPTH_ONLY_MODE=probe
    routing would send it to fine/fine2 on structure)."""
    import jax.numpy as jnp
    view, proj = default_view()
    w, h = 256, 128
    passes = []
    for name, shader in (("head", DepthShader()),
                         ("soup", GouraudShader())):
        p = make_pass(meshes[name], shader, view, proj)
        attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
        passes.append((attrs, p.shader, dict(p.uniforms), False))
    ref = None
    old = raster_sparse.FINE_MODE
    try:
        for mode in ("coarse", "fine", "fine2"):
            raster_sparse.FINE_MODE = mode
            ft, od, ovf = raster_sparse.render_frame_fused(
                passes, w, h, strict_capacity=True)
            assert not bool(ovf)
            fb = raster_sparse.tiles_to_buffers(ft, w, h)
            cur = (np.asarray(fb.color), np.asarray(fb.depth),
                   np.asarray(fb.winner))
            if ref is None:
                ref = cur
            else:
                for a, b in zip(ref, cur):
                    np.testing.assert_array_equal(a, b)
    finally:
        raster_sparse.FINE_MODE = old


def test_fine_exact_stats_match_coarse(meshes):
    """The overdraw-inclusive event counters must agree with the coarse
    kernel's (both implement our_gl.cpp:194-200 semantics)."""
    view, proj = default_view()
    w, h = 160, 42
    p = make_pass(meshes["head"], PhongShader(KEY, FILL, RIM), view, proj)
    out_c, out_f = _render_both(p, w, h, collect_stats=True)
    (frag_c, min_c, max_c) = (float(x) for x in np.asarray(out_c[3]))
    (frag_f, min_f, max_f) = (float(x) for x in np.asarray(out_f[3]))
    assert frag_c == frag_f and frag_f > 0
    np.testing.assert_array_equal(min_c, min_f)
    np.testing.assert_array_equal(max_c, max_f)


def test_fine_overflow_flag_fires_same_frame(meshes):
    """Non-strict mode: a capacity-busting frame reports overflow in its
    own outputs (pair, row, or active-tile overflow)."""
    view, proj = default_view()
    w = h = 64
    p = make_pass(meshes["soup"], GouraudShader(), view, proj)
    import jax.numpy as jnp
    attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
    key = (attrs["position"].shape[0],
           -(-w // raster_fine.TILE_W), -(-h // raster_fine.TILE_H),
           raster_fine.TILE_H, raster_fine.TILE_W)
    _clear_caches()
    ft = raster_sparse.new_frame_tiles(w, h)
    _, _, ovf = raster_fine.render_pass_fine(
        ft, attrs, p.shader, dict(p.uniforms), w, h,
        strict_capacity=False, _caps=(16, 4, 1))
    assert bool(ovf)
    _clear_caches()
    _, _, ovf2 = raster_fine.render_pass_fine(
        ft, attrs, p.shader, dict(p.uniforms), w, h, strict_capacity=False)
    assert not bool(ovf2)
    _clear_caches()


def test_fine_strict_capacity_growth(meshes):
    """Strict mode with a deliberately tiny cached capacity must grow and
    retry within the call, producing the exact frame."""
    view, proj = default_view()
    w, h = 160, 42
    p = make_pass(meshes["head"], GouraudShader(), view, proj)
    import jax.numpy as jnp
    attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
    key = (attrs["position"].shape[0],
           -(-w // raster_fine.TILE_W), -(-h // raster_fine.TILE_H),
           raster_fine.TILE_H, raster_fine.TILE_W)
    _clear_caches()
    raster_fine._FINE_CAPACITY[key] = (64, 16, 2)   # absurdly small
    ft = raster_sparse.new_frame_tiles(w, h)
    ft_f, _, ovf = raster_fine.render_pass_fine(
        ft, attrs, p.shader, dict(p.uniforms), w, h, strict_capacity=True)
    ft_c, _, _ = raster_sparse.render_pass_tiles(
        ft, attrs, p.shader, dict(p.uniforms), w, h)
    _assert_frames_equal(ft_c, ft_f, w, h)
    assert raster_fine._FINE_CAPACITY[key][0] > 64
    _clear_caches()


def test_fine_preserves_untouched_tiles(meshes):
    """Corner-covering geometry leaves all other tiles bitwise intact."""
    import jax.numpy as jnp
    view, proj = default_view()
    w, h = 512, 128
    p = make_pass(meshes["soup"], GouraudShader(), view, proj)
    attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
    rng = np.random.default_rng(9)
    base = raster.FrameBuffers(
        color=jnp.asarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)),
        depth=jnp.full((h, w), np.inf, jnp.float32),
        winner=jnp.full((h, w), raster.BACKGROUND, jnp.int32))
    ft = raster_sparse.buffers_to_tiles(base, w, h)
    ft2, _, ovf = raster_fine.render_pass_fine(
        ft, attrs, p.shader, dict(p.uniforms), w, h)
    assert not bool(ovf)
    touched = np.asarray(ft2.winner != ft.winner).any(axis=(1, 2))
    assert 0 < int(touched.sum()) < ft.winner.shape[0]
    keep = ~touched
    np.testing.assert_array_equal(np.asarray(ft2.color)[keep],
                                  np.asarray(ft.color)[keep])
    np.testing.assert_array_equal(np.asarray(ft2.depth)[keep],
                                  np.asarray(ft.depth)[keep])


def test_dispatch_forced_modes_agree(meshes):
    """render_pass_dispatch with FINE_MODE forced to each kernel
    produces bitwise-identical frames; auto mode on CPU picks coarse."""
    view, proj = default_view()
    w, h = 160, 42
    p = make_pass(meshes["head"], PhongShader(KEY, FILL, RIM), view, proj)
    import jax.numpy as jnp
    attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
    ft = raster_sparse.new_frame_tiles(w, h)
    old = raster_sparse.FINE_MODE
    try:
        raster_sparse.FINE_MODE = "coarse"
        ft_c, _, _ = raster_sparse.render_pass_dispatch(
            ft, attrs, p.shader, dict(p.uniforms), w, h)
        raster_sparse.FINE_MODE = "fine"
        ft_f, _, _ = raster_sparse.render_pass_dispatch(
            ft, attrs, p.shader, dict(p.uniforms), w, h)
        raster_sparse.FINE_MODE = "fine2"
        ft_f2, _, _ = raster_sparse.render_pass_dispatch(
            ft, attrs, p.shader, dict(p.uniforms), w, h)
        raster_sparse.FINE_MODE = "auto"
        raster_sparse._FINE_DECISION.clear()
        ft_a, _, _ = raster_sparse.render_pass_dispatch(
            ft, attrs, p.shader, dict(p.uniforms), w, h)
    finally:
        raster_sparse.FINE_MODE = old
        raster_sparse._FINE_DECISION.clear()
    _assert_frames_equal(ft_c, ft_f, w, h)
    _assert_frames_equal(ft_c, ft_f2, w, h)
    _assert_frames_equal(ft_c, ft_a, w, h)


def test_fused_frame_matches_loop(meshes):
    """render_frame_fused (one jitted program for all passes) must be
    bitwise-identical to the per-pass loop, including the z-snapshot /
    restore semantics around excluded passes (main.cpp:700,730)."""
    import jax.numpy as jnp

    from tinyrenderder_tpu.shaders import EyeShader
    view, proj = default_view()
    w, h = 160, 42
    g = make_pass(meshes["soup"], GouraudShader(), view, proj)
    ph = make_pass(meshes["head"], PhongShader(KEY, FILL, RIM), view, proj)
    e = make_pass(meshes["sphere"], EyeShader(KEY, RIM), view, proj,
                  model_matrix=math3d.translation_matrix(0.3, 0.0, 1.2)
                  @ math3d.scale_matrix(0.4, 0.4, 0.4))
    passes = []
    for p, excl in ((g, False), (ph, False), (e, True)):
        attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
        passes.append((attrs, p.shader, dict(p.uniforms), excl))

    ft_l, od_l, ovf_l, _ = raster_sparse.render_frame_tiles(
        passes, w, h)
    ft_f, od_f, ovf_f = raster_sparse.render_frame_fused(passes, w, h)
    assert not bool(ovf_f)
    _assert_frames_equal(ft_l, ft_f, w, h)
    np.testing.assert_array_equal(np.asarray(od_l), np.asarray(od_f))
    # excluded pass depth differs from the full frame depth
    assert (np.asarray(od_f) != np.asarray(ft_f.depth)).any()


def test_dispatch_rejects_over_limit_varyings(meshes):
    """A shader with more varying channels than the fine record layout
    holds must route to the coarse kernel, not raise."""
    import jax.numpy as jnp

    class WideShader(PhongShader):
        name = "wide"
        varying_spec = {"uv": 2, "position_eye": 3, "normal_eye": 3,
                        "extra": 3 * raster_fine.MAX_VARY}

        def vertex(self, u, attrs, xp):
            clip, vary = super().vertex(u, attrs, xp)
            vary["extra"] = xp.concatenate(
                [attrs["position"]] * raster_fine.MAX_VARY, axis=-1)
            return clip, vary

        def fragment(self, u, vary, xp):
            rgb = super().fragment(
                u, {k: vary[k] for k in
                    ("uv", "position_eye", "normal_eye")}, xp)
            return rgb + 0.0 * vary["extra"][..., :3]

    view, proj = default_view()
    p = make_pass(meshes["head"], WideShader(KEY, FILL, RIM), view, proj)
    attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
    assert raster_sparse._decide_mode(
        attrs, p.shader, dict(p.uniforms), 160, 42) == "coarse"


def test_depth_only_probe_routing_bitwise(monkeypatch):
    """DEPTH_ONLY_MODE='probe' (the un-shipped routing hook) must
    reproduce the shipped coarse routing bitwise on a fused two-pass
    frame whose depth-only pass SHARES its capacity key with a color
    pass (advisor round-4: the probe-time capacity seeding for a
    shared key ships untested otherwise).  The probe itself only runs
    under a TPU default_backend, so it is spoofed and the kernels run
    in interpret mode."""
    import jax
    import jax.numpy as jnp

    from tinyrenderder_tpu.ops import raster_fine, raster_fine2

    # a mesh past the f >= 512 probe threshold, used by BOTH passes
    # (same (f, grid) capacity key)
    head = procedural_head_large()
    view, proj = default_view()
    w, h = 256, 128
    passes = []
    for shader in (DepthShader(), GouraudShader()):
        p = make_pass(head, shader, view, proj)
        attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
        passes.append((attrs, p.shader, dict(p.uniforms), False))

    def clear():
        raster_sparse._FINE_DECISION.clear()
        raster_sparse._SPARSE_CAPACITY.clear()
        raster_sparse._SPARSE_PENDING.clear()
        raster_sparse._W_REFINED.clear()
        raster_fine._FINE_CAPACITY.clear()
        raster_fine._FINE_PENDING.clear()
        raster_fine._W_REFINED.clear()
        raster_fine2._FINE2_CAPACITY.clear()
        raster_fine2._FINE2_PENDING.clear()

    def frame(spoof_tpu=False):
        # the backend spoof is scoped to the fused render (where the
        # probe routing decides) — the untile in tiles_to_buffers picks
        # interpret from the REAL backend
        with monkeypatch.context() as m:
            if spoof_tpu:
                m.setattr(jax, "default_backend", lambda: "tpu")
            ft, od, ovf = raster_sparse.render_frame_fused(
                passes, w, h, strict_capacity=True, interpret=True)
        assert not bool(ovf)
        fb = raster_sparse.tiles_to_buffers(ft, w, h)
        return (np.asarray(fb.color), np.asarray(fb.depth),
                np.asarray(fb.winner))

    old_mode, old_depth = raster_sparse.FINE_MODE, raster_sparse.DEPTH_ONLY_MODE
    try:
        clear()
        raster_sparse.FINE_MODE = "coarse"
        ref = frame()
        clear()
        raster_sparse.FINE_MODE = "auto"
        raster_sparse.DEPTH_ONLY_MODE = "probe"
        got = frame(spoof_tpu=True)
        # the probe-routing decision must actually have been exercised
        # for the depth-only pass (dkey carries the routing mode)
        assert any(k[-1] == "probe"
                   for k in raster_sparse._FINE_DECISION), \
            raster_sparse._FINE_DECISION
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a, b)
    finally:
        raster_sparse.FINE_MODE = old_mode
        raster_sparse.DEPTH_ONLY_MODE = old_depth
        clear()


def procedural_head_large():
    from tinyrenderder_tpu.models import procedural
    head = procedural.bumpy_head(24, 32)
    head.materials = [procedural.default_head_material(32)]
    return head
