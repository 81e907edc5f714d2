"""Sub-op timing inside _build_bins at stress scale.

probe_sort_cost.py showed lax.sort itself is ~0.3 ms at 262k — so the
~5.9 ms measured for the whole _build_bins stage lives in the span
expansion (head scatter, cummax run fill, packed column gather,
divmod, searchsorted).  This isolates each.

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/probe_bins_cost.py
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from tinyrenderder_tpu import math3d
from tinyrenderder_tpu.models import procedural
from tinyrenderder_tpu.ops import semantics
from tinyrenderder_tpu.ops.raster_fine import STRIP_W, STRIPS
from tinyrenderder_tpu.ops.raster_tiled import (_cdiv, _exact_divmod_i32,
                                                _tile_spans)
from tinyrenderder_tpu.shaders import PhongShader


def t(fn, *args, n=20, warmup=3):
    from bench import _force, _measure_rtt
    for _ in range(warmup):
        _force(fn(*args))
    rtt = _measure_rtt()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _force(r)
    return (time.perf_counter() - t0 - rtt) / n * 1e3


def main():
    W, H = 1280, 800
    wall = procedural.head_wall(grid=3)
    view = math3d.lookat((0, 0.3, 6.5), (0, 0, 0), (0, 1, 0))
    proj = math3d.perspective(60.0, W / H, 0.1, 50.0)
    shader = PhongShader((1.2, 1.2, 1.2), (-1, 0, 0.5), (0.3, -0.5, -1),
                         normal_map_strength=0.5)
    from tinyrenderder_tpu.scene import _to_device_cached
    uniforms = {k: _to_device_cached(v) for k, v in shader.build_uniforms(
        view, proj, wall.materials[0], np.float32).items()}
    attrs = wall.device_face_attributes(np.float32)
    tile_h, tile_w = 16, 128
    ntx, nty = _cdiv(W, tile_w), _cdiv(H, tile_h)
    nsx = ntx * STRIPS
    n_tiles = nsx * nty
    p = 237568

    @jax.jit
    def setup_fn(attrs, uniforms):
        clip, _ = shader.vertex(uniforms, attrs, jnp)
        vp = jnp.asarray(math3d.viewport(0, 0, W, H), jnp.float32)
        setup = semantics.triangle_setup_planes(clip, vp, W, H, jnp)
        return _tile_spans(setup, STRIP_W, tile_h)

    tx0, ty0, span_x, spans, total = jax.block_until_ready(
        setup_fn(attrs, uniforms))
    f = spans.shape[0]
    print(f"pairs={int(jax.device_get(total))} cap={p} faces={f}")

    @jax.jit
    def s_offs(spans):
        offs = jnp.cumsum(spans) - spans
        return offs

    offs = jax.block_until_ready(s_offs(spans))

    @jax.jit
    def s_heads(spans, offs):
        has = spans > 0
        head_idx = jnp.where(has, offs, p)
        tri_ids = jnp.arange(f, dtype=jnp.int32)
        return jnp.full((p,), -1, jnp.int32).at[head_idx].set(
            tri_ids, mode="drop")

    heads = jax.block_until_ready(s_heads(spans, offs))

    @jax.jit
    def s_cummax(heads):
        return jax.lax.cummax(heads)

    tri = jax.block_until_ready(s_cummax(heads))

    @jax.jit
    def s_ptbl_gather(offs, spans, span_x, tx0, ty0, tri):
        safe_tri = jnp.maximum(tri, 0)
        ptbl = jnp.stack([offs, spans, jnp.maximum(span_x, 1), tx0, ty0],
                         axis=1)
        return ptbl[safe_tri]

    pg = jax.block_until_ready(s_ptbl_gather(offs, spans, span_x, tx0,
                                             ty0, tri))

    @jax.jit
    def s_divmod_tile(pg, tri):
        pair_pos = jnp.arange(p, dtype=jnp.int32)
        k = pair_pos - pg[:, 0]
        in_run = (tri >= 0) & (k < pg[:, 1])
        ky, kx = _exact_divmod_i32(k, pg[:, 2])
        tile_id = (pg[:, 4] + ky) * nsx + (pg[:, 3] + kx)
        return jnp.where(in_run, tile_id, n_tiles), in_run

    tile_id, in_run = jax.block_until_ready(s_divmod_tile(pg, tri))

    @jax.jit
    def s_sort(tile_id, tri, in_run):
        return jax.lax.sort(
            (tile_id.astype(jnp.int32), jnp.where(in_run, tri, -1)),
            num_keys=1)

    sorted_tile, sorted_tri = jax.block_until_ready(
        s_sort(tile_id, tri, in_run))

    @jax.jit
    def s_counts(sorted_tile):
        start = jnp.searchsorted(
            sorted_tile, jnp.arange(n_tiles + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        return start, start[1:] - start[:-1]

    jax.block_until_ready(s_counts(sorted_tile))

    print(f"cumsum offs (246k):      {t(s_offs, spans):6.2f} ms")
    print(f"head scatter (262k):     {t(s_heads, spans, offs):6.2f} ms")
    print(f"cummax fill (262k):      {t(s_cummax, heads):6.2f} ms")
    print(f"ptbl 5-col gather:       {t(s_ptbl_gather, offs, spans, span_x, tx0, ty0, tri):6.2f} ms")
    print(f"divmod + tile id:        {t(s_divmod_tile, pg, tri):6.2f} ms")
    print(f"sort (2-array):          {t(s_sort, tile_id, tri, in_run):6.2f} ms")
    print(f"searchsorted + counts:   {t(s_counts, sorted_tile):6.2f} ms")


if __name__ == "__main__":
    main()
