"""Grouped-strip fine2 rasterizer (ops.raster_fine2) tests.

fine2 decouples record rows from tiles (cross-tile strip groups +
pass-local kernel + strict-less post merge) — it must stay bitwise
identical to the coarse sparse kernel on depth/winner/color, across
mesh shapes, ragged edges, multi-pass frames and capacity growth, and
its stats launch must reproduce the exact overdraw-inclusive event
counters (our_gl.cpp:194-200)."""

import numpy as np
import pytest

from helpers import default_view, make_pass, standard_meshes
from tinyrenderder_tpu import math3d
from tinyrenderder_tpu.ops import raster_fine2, raster_sparse
from tinyrenderder_tpu.shaders import (DepthShader, GouraudShader,
                                       PhongShader, TexturedShader)

KEY = math3d.normalized(math3d.vec3(1.0, 1.4, 1.0))
FILL = math3d.normalized(math3d.vec3(-0.3, 0.5, 0.2))
RIM = math3d.normalized(math3d.vec3(-1.0, 0.8, -1.5))


@pytest.fixture(scope="module")
def meshes():
    return standard_meshes()


def _assert_frames_equal(ft_a, ft_b, w, h):
    fb_a = raster_sparse.tiles_to_buffers(ft_a, w, h)
    fb_b = raster_sparse.tiles_to_buffers(ft_b, w, h)
    np.testing.assert_array_equal(np.asarray(fb_a.winner),
                                  np.asarray(fb_b.winner))
    np.testing.assert_array_equal(np.asarray(fb_a.depth),
                                  np.asarray(fb_b.depth))
    np.testing.assert_array_equal(np.asarray(fb_a.color),
                                  np.asarray(fb_b.color))


@pytest.mark.parametrize("mesh_name,shader_fn", [
    ("head", lambda: PhongShader(KEY, FILL, RIM, normal_map_strength=0.5)),
    ("soup", lambda: GouraudShader()),
    ("plane", lambda: TexturedShader()),
    ("cube", lambda: DepthShader()),
])
def test_fine2_matches_coarse_bitwise(meshes, mesh_name, shader_fn):
    """Bitwise depth/winner/color vs the coarse sparse kernel across
    regimes: tiny soup triangles, curved head, huge faces (all-class
    groups), depth-only, ragged frame edges."""
    import jax.numpy as jnp
    view, proj = default_view()
    w, h = 160, 42
    p = make_pass(meshes[mesh_name], shader_fn(), view, proj)
    attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
    ft0 = raster_sparse.new_frame_tiles(w, h)
    ft_c, _, _ = raster_sparse.render_pass_tiles(
        ft0, attrs, p.shader, dict(p.uniforms), w, h)
    ft_2, _, _ = raster_fine2.render_pass_fine2(
        ft0, attrs, p.shader, dict(p.uniforms), w, h)
    _assert_frames_equal(ft_c, ft_2, w, h)


def test_fine2_multipass_and_excluded_depth(meshes):
    """Cross-pass strict-less merge (the pass-local kernel's post-stage
    frame merge) is bitwise-identical to the in-kernel init merge of the
    coarse path, across an occluding multi-pass sequence."""
    import jax.numpy as jnp
    view, proj = default_view()
    w, h = 160, 42
    p1 = make_pass(meshes["head"], PhongShader(KEY, FILL, RIM), view, proj)
    p2 = make_pass(meshes["plane"], TexturedShader(), view, proj)
    p3 = make_pass(meshes["soup"], GouraudShader(), view, proj)
    ft_c = raster_sparse.new_frame_tiles(w, h)
    ft_2 = raster_sparse.new_frame_tiles(w, h)
    off = 0
    for p in (p1, p2, p3):
        attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
        ft_c, _, _ = raster_sparse.render_pass_tiles(
            ft_c, attrs, p.shader, dict(p.uniforms), w, h,
            winner_offset=off)
        ft_2, _, _ = raster_fine2.render_pass_fine2(
            ft_2, attrs, p.shader, dict(p.uniforms), w, h,
            winner_offset=off)
        off += p.attrs["position"].shape[0]
    _assert_frames_equal(ft_c, ft_2, w, h)


def test_fine2_exact_event_stats(meshes):
    """The init-seeded stats launch reproduces the coarse kernel's exact
    overdraw-inclusive event counters on a non-empty frame (running
    depth honored across passes)."""
    import jax
    import jax.numpy as jnp
    view, proj = default_view()
    w, h = 160, 42
    p1 = make_pass(meshes["head"], PhongShader(KEY, FILL, RIM), view, proj)
    p2 = make_pass(meshes["soup"], GouraudShader(), view, proj)
    a1 = {k: jnp.asarray(v) for k, v in p1.attrs.items()}
    a2 = {k: jnp.asarray(v) for k, v in p2.attrs.items()}
    ft0 = raster_sparse.new_frame_tiles(w, h)
    ft_c, _, _ = raster_sparse.render_pass_tiles(
        ft0, a1, p1.shader, dict(p1.uniforms), w, h)
    ft_2, _, _ = raster_fine2.render_pass_fine2(
        ft0, a1, p1.shader, dict(p1.uniforms), w, h)
    _, _, _, ev_c = raster_sparse.render_pass_tiles(
        ft_c, a2, p2.shader, dict(p2.uniforms), w, h,
        winner_offset=100000, collect_stats=True)
    _, _, _, ev_2 = raster_fine2.render_pass_fine2(
        ft_2, a2, p2.shader, dict(p2.uniforms), w, h,
        winner_offset=100000, collect_stats=True)
    ev_c = [float(x) for x in jax.device_get(ev_c)]
    ev_2 = [float(x) for x in jax.device_get(ev_2)]
    assert ev_c == ev_2
    assert ev_c[0] > 0


def test_fine2_capacity_growth_strict(meshes):
    """Strict mode re-renders on overflow of any of the four
    capacities; the retried frame is exact."""
    import jax.numpy as jnp
    view, proj = default_view()
    w, h = 160, 42
    p = make_pass(meshes["head"], PhongShader(KEY, FILL, RIM), view, proj)
    attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
    key = (attrs["position"].shape[0], -(-w // 128), -(-h // 16), 16, 128)
    ft0 = raster_sparse.new_frame_tiles(w, h)
    ft_ref, _, _ = raster_sparse.render_pass_tiles(
        ft0, attrs, p.shader, dict(p.uniforms), w, h)
    raster_fine2._FINE2_CAPACITY[key] = (512, 256, 8, 8)  # far too small
    try:
        ft_2, _, ovf = raster_fine2.render_pass_fine2(
            ft0, attrs, p.shader, dict(p.uniforms), w, h,
            strict_capacity=True)
    finally:
        grown = raster_fine2._FINE2_CAPACITY.pop(key, None)
    assert grown is not None and grown[0] > 512
    _assert_frames_equal(ft_ref, ft_2, w, h)


def test_probe_rows_never_exceed_fine(meshes):
    """Sorted cross-class matching can only reduce rows: grouped rows <=
    per-tile rows on every scene shape (the optimality argument in the
    module docstring)."""
    import jax
    import jax.numpy as jnp
    from tinyrenderder_tpu.ops import raster_fine
    view, proj = default_view()
    w, h = 160, 42
    for name in ("head", "soup", "plane", "cube"):
        p = make_pass(meshes[name], GouraudShader(), view, proj)
        attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
        setup, pt = raster_fine._probe_totals_jit(
            attrs, dict(p.uniforms), p.shader, w, h, 16, 128)
        pc = max(256, int(jax.device_get(pt)))
        r1, r2, ng, na = (int(x) for x in jax.device_get(
            raster_fine2._probe_both_jit(setup, pc, w, h, 16, 128)))
        assert r2 <= r1, f"{name}: grouped rows {r2} > per-tile rows {r1}"
        assert ng <= na * 8


def test_flat_packing_is_optimal(meshes):
    """The flat-argsort assignment (rank r -> group r//8) yields
    row_total = sum(sorted_desc[0::8]), which is (a) what the probe
    reports, and (b) <= the group cost of any random partition of the
    strips into 8-slot groups (the optimality argument in the module
    docstring)."""
    import jax
    import jax.numpy as jnp
    from tinyrenderder_tpu.ops import raster_fine
    from tinyrenderder_tpu.ops.raster_tiled import _build_bins, _tile_spans
    view, proj = default_view()
    w, h = 160, 42
    for name in ("head", "soup"):
        p = make_pass(meshes[name], GouraudShader(), view, proj)
        attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
        setup, pt = raster_fine._probe_totals_jit(
            attrs, dict(p.uniforms), p.shader, w, h, 16, 128)
        pc = max(256, int(jax.device_get(pt)))
        tx0, ty0, span_x, spans, _ = _tile_spans(setup, 16, 16)
        ntx = (w + 127) // 128
        nty = (h + 15) // 16
        _, _, counts = _build_bins(tx0, ty0, span_x, spans, pc,
                                   ntx * 8, nty)
        c = np.sort(np.asarray(jax.device_get(counts)))[::-1]
        expect = int(c[0::8].sum())
        r1, r2, ng, na = (int(x) for x in jax.device_get(
            raster_fine2._probe_both_jit(setup, pc, w, h, 16, 128)))
        assert r2 == expect, f"{name}: probe {r2} != sorted-stride sum {expect}"
        rng = np.random.default_rng(0)
        n = c.shape[0]
        for _ in range(20):
            perm = rng.permutation(n)
            alt = int(np.asarray(c)[perm].reshape(-1, 8).max(axis=1).sum())
            assert r2 <= alt, f"{name}: flat packing {r2} beaten by {alt}"
