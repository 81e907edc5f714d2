"""Parity tests for the binned tile rasterizer and the Pallas kernel.

Contract: the tiled path and the Pallas kernel (interpret mode on CPU)
must agree with the scan path / oracle on coverage and winner maps
bitwise, depth within a few ulps (FMA contraction differs between
compiled programs), color within 1 LSB.
"""

import numpy as np
import pytest

from helpers import (assert_parity, default_view, make_pass, render_engine,
                     render_oracle, standard_meshes)
from tinyrenderder_tpu.shaders import (EyeShader, FlatShader, GouraudShader,
                                       PhongShader, TexturedShader)

KEY = np.array([1.0, 1.4, 1.0])
FILL = np.array([-0.3, 0.5, 0.2])
RIM = np.array([-1.0, 0.8, -1.5])


@pytest.fixture(scope="module")
def meshes():
    return standard_meshes()


def _passes(meshes, view, proj):
    return [
        make_pass(meshes["head"], PhongShader(KEY, FILL, RIM), view, proj),
        make_pass(meshes["plane"], TexturedShader(), view, proj),
        make_pass(meshes["soup"], GouraudShader(), view, proj),
    ]


@pytest.mark.parametrize("size", [(64, 64), (97, 61), (130, 120)])
def test_tiled_matches_xla(meshes, size):
    """Tiled vs scan path: winners and colors bitwise, odd sizes included
    (exercises the ragged-edge tile padding)."""
    w, h = size
    view, proj = default_view()
    passes = _passes(meshes, view, proj)
    fb_xla = render_engine(passes, w, h, backend="xla")
    fb_tiled = render_engine(passes, w, h, backend="tiled")
    assert (np.asarray(fb_xla.winner) == np.asarray(fb_tiled.winner)).all()
    assert (np.asarray(fb_xla.color) == np.asarray(fb_tiled.color)).all()
    d1 = np.asarray(fb_xla.depth)
    d2 = np.asarray(fb_tiled.depth)
    assert (np.isfinite(d1) == np.isfinite(d2)).all()
    both = np.isfinite(d1)
    ulps = np.abs(d1[both].view(np.int32).astype(np.int64)
                  - d2[both].view(np.int32).astype(np.int64))
    assert ulps.max(initial=0) <= 4


def test_tiled_matches_oracle(meshes):
    view, proj = default_view()
    passes = _passes(meshes, view, proj)
    frame = render_oracle(passes, 80, 64)
    fb = render_engine(passes, 80, 64, backend="tiled")
    assert_parity(frame, fb)


@pytest.mark.parametrize("shader_name", ["flat", "gouraud", "phong", "eye"])
def test_tiled_single_shader_oracle(meshes, shader_name):
    shaders = {
        "flat": FlatShader(light_world=(0.3, 0.4, 1.0)),
        "gouraud": GouraudShader(light_world=(0.3, 0.4, 1.0)),
        "phong": PhongShader(KEY, FILL, RIM, normal_map_strength=0.5),
        "eye": EyeShader(KEY, RIM),
    }
    view, proj = default_view()
    passes = [make_pass(meshes["head"], shaders[shader_name], view, proj)]
    frame = render_oracle(passes, 72, 56)
    fb = render_engine(passes, 72, 56, backend="tiled")
    assert_parity(frame, fb)


def test_pallas_matches_tiled(meshes):
    """Pallas kernel (interpret mode) vs the XLA tiled resolve: identical
    coverage and winners, depth within ulps."""
    import jax.numpy as jnp

    from tinyrenderder_tpu.ops import raster, raster_pallas, raster_tiled

    view, proj = default_view()
    w, h = 97, 61
    fb = raster.new_framebuffers(w, h)
    for p in _passes(meshes, view, proj):
        attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
        setup, _ = raster_tiled._vertex_setup_jit(
            attrs, dict(p.uniforms), p.shader, w, h)
        bins = raster_tiled.bin_triangles_csr(setup, w, h)
        d1, w1 = raster_tiled.depth_resolve_tiled(setup, bins, fb.depth, h, w)
        d2, w2 = raster_pallas.depth_resolve_pallas(
            setup, bins, fb.depth, h, w, interpret=True)
        d1n, d2n = np.asarray(d1), np.asarray(d2)
        assert (np.asarray(w1) == np.asarray(w2)).all()
        assert (np.isfinite(d1n) == np.isfinite(d2n)).all()
        both = np.isfinite(d1n)
        ulps = np.abs(d1n[both].view(np.int32).astype(np.int64)
                      - d2n[both].view(np.int32).astype(np.int64))
        assert ulps.max(initial=0) <= 4
        fb = raster.FrameBuffers(color=fb.color, depth=d1, winner=fb.winner)


def test_pallas_full_pipeline_matches_xla(meshes):
    """The v2 kernel path (depth + in-kernel varying interpolation +
    dense phase-C shading), in interpret mode, vs the XLA tiled path:
    winners bitwise, colors within 1 LSB (FMA contraction)."""
    import jax.numpy as jnp

    from tinyrenderder_tpu.ops import raster, raster_tiled

    view, proj = default_view()
    w, h = 97, 61
    fb_a = raster.new_framebuffers(w, h)
    fb_b = raster.new_framebuffers(w, h)
    offset = 0
    for p in _passes(meshes, view, proj):
        attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
        fb_a, _ = raster_tiled.render_pass_tiled(
            fb_a, attrs, p.shader, p.uniforms, winner_offset=offset,
            use_pallas=False)
        fb_b, _ = raster_tiled.render_pass_tiled(
            fb_b, attrs, p.shader, p.uniforms, winner_offset=offset,
            use_pallas=True)
        offset += attrs["position"].shape[0]
    assert (np.asarray(fb_a.winner) == np.asarray(fb_b.winner)).all()
    dc = np.abs(np.asarray(fb_a.color).astype(int)
                - np.asarray(fb_b.color).astype(int))
    assert dc.max() <= 1, f"color delta {dc.max()}"


def test_capacity_overflow_retry(meshes):
    """A deliberately tiny pair capacity must be detected and retried
    without changing the output."""
    import jax.numpy as jnp

    from tinyrenderder_tpu.ops import raster, raster_tiled

    view, proj = default_view()
    p = _passes(meshes, view, proj)[0]
    attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
    w, h = 64, 64
    fb_ref, _ = raster_tiled.render_pass_tiled(
        raster.new_framebuffers(w, h), attrs, p.shader, p.uniforms,
        use_pallas=False)
    fb_tiny, _ = raster_tiled.render_pass_tiled(
        raster.new_framebuffers(w, h), attrs, p.shader, p.uniforms,
        use_pallas=False, _capacity=16)
    assert (np.asarray(fb_ref.color) == np.asarray(fb_tiny.color)).all()
    assert (np.asarray(fb_ref.winner) == np.asarray(fb_tiny.winner)).all()


def test_bins_cover_all_candidates(meshes):
    """Every valid triangle appears in the bin of every tile its bbox
    overlaps, in ascending (submission) order."""
    import jax.numpy as jnp

    from tinyrenderder_tpu.ops import raster_tiled

    view, proj = default_view()
    p = make_pass(meshes["soup"], GouraudShader(), view, proj)
    w, h = 100, 60
    attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
    setup, _ = raster_tiled._vertex_setup_jit(
        attrs, dict(p.uniforms), p.shader, w, h)
    bins = raster_tiled.bin_triangles_csr(setup, w, h)

    valid = np.asarray(setup["valid"])
    bbox = np.asarray(setup["bbox"])
    start = np.asarray(bins.start)
    tri = np.asarray(bins.sorted_tri)
    tw, th = raster_tiled.TILE_W, raster_tiled.TILE_H
    ntx = bins.n_tiles_x

    expected = {t: [] for t in range(bins.n_tiles)}
    for f in range(valid.shape[0]):
        if not valid[f]:
            continue
        for ty in range(bbox[f, 2] // th, bbox[f, 3] // th + 1):
            for tx in range(bbox[f, 0] // tw, bbox[f, 1] // tw + 1):
                expected[ty * ntx + tx].append(f)
    for t in range(bins.n_tiles):
        got = list(tri[start[t]:start[t + 1]])
        assert got == expected[t], f"tile {t}"


def test_empty_pass_tiled():
    import jax.numpy as jnp

    from tinyrenderder_tpu.ops import raster, raster_tiled

    fb = raster.new_framebuffers(40, 24)
    attrs = {k: jnp.zeros((0, 3, c), jnp.float32)
             for k, c in [("position", 3), ("normal", 3), ("uv", 2),
                          ("tangent", 3), ("bitangent", 3)]}
    shader = GouraudShader()
    uniforms = shader.build_uniforms(np.eye(4), np.eye(4), None, np.float32)
    fb2, _ = raster_tiled.render_pass_tiled(fb, attrs, shader, uniforms)
    assert (np.asarray(fb2.color) == 0).all()
    assert not np.isfinite(np.asarray(fb2.depth)).any()


def test_async_capacity_grows_after_overflow(meshes):
    """Non-strict mode: an overflowing frame is detected at the next
    frame's start (the D2H is ready by then) and the capacity grows, so
    the following frame is exact again."""
    import jax.numpy as jnp

    from tinyrenderder_tpu.ops import raster, raster_tiled

    view, proj = default_view()
    p = _passes(meshes, view, proj)[0]
    attrs = {k: jnp.asarray(v) for k, v in p.attrs.items()}
    w, h = 64, 64
    from tinyrenderder_tpu.ops import raster_sparse
    key = (attrs["position"].shape[0],
           -(-w // raster_tiled.TILE_W), -(-h // raster_tiled.TILE_H),
           raster_tiled.TILE_H, raster_tiled.TILE_W)
    raster_sparse._SPARSE_CAPACITY.pop(key, None)
    raster_sparse._SPARSE_PENDING.pop(key, None)

    fb_ref, _ = raster_tiled.render_pass_tiled(
        raster.new_framebuffers(w, h), attrs, p.shader, p.uniforms,
        use_pallas=True)
    raster_sparse._SPARSE_PENDING.pop(key, None)

    # frame 1: deliberately tiny capacity, non-strict -> may drop pairs
    # (the async path lives on the Pallas branch; interpret mode on CPU)
    raster_tiled.render_pass_tiled(
        raster.new_framebuffers(w, h), attrs, p.shader, p.uniforms,
        use_pallas=True, strict_capacity=False, _capacity=16)
    assert raster_sparse._SPARSE_CAPACITY[key][0] == 16

    # wait for the overflow count's D2H (the production loop spaces
    # frames ms apart; under test-suite load the copy can lag, which
    # made this assertion flaky)
    import time
    for _ in range(500):
        pend = raster_sparse._SPARSE_PENDING.get(key)
        if pend is None or getattr(pend[0], "is_ready", lambda: True)():
            break
        time.sleep(0.01)

    # frame 2: the pending count resolves, capacity grows, output exact
    fb2, _ = raster_tiled.render_pass_tiled(
        raster.new_framebuffers(w, h), attrs, p.shader, p.uniforms,
        use_pallas=True, strict_capacity=False)
    assert raster_sparse._SPARSE_CAPACITY[key][0] > 16
    assert (np.asarray(fb2.color) == np.asarray(fb_ref.color)).all()
    assert (np.asarray(fb2.winner) == np.asarray(fb_ref.winner)).all()
