"""Stage-by-stage timing of the fine2 PRE stage at stress scale.

The stress frame is pre-bound (~15 of 22 ms, round 3); the known
per-op costs (record gather ~4 ms, sort 0.3, scatter 1.2) explain only
~5.5 ms.  This script times each sub-stage of _pre_fine2_jit as its own
jit, with every input passed as an ARGUMENT (closure-captured device
arrays let XLA constant-fold the chain — see CLAUDE.md).

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/profile_fine2_pre.py
"""
import functools
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from tinyrenderder_tpu import math3d
from tinyrenderder_tpu.models import procedural
from tinyrenderder_tpu.ops import semantics
from tinyrenderder_tpu.ops.raster_fine import (COL_ID, DMA_ROWS, NCOL,
                                               REC_ROWS, STRIP_W, STRIPS)
from tinyrenderder_tpu.ops.raster_fine2 import _pre_fine2_jit
from tinyrenderder_tpu.ops.raster_tiled import (_build_bins, _cdiv,
                                                _next_pow2, _tile_spans)
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
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    wall = procedural.head_wall(grid=grid)
    key, fill, rim = ((1.2, 1.2, 1.2), (-1, 0, 0.5), (0.3, -0.5, -1))
    view = math3d.lookat((0, 0.3, 6.5), (0, 0, 0), (0, 1, 0))
    proj = math3d.perspective(60.0, W / H, 0.1, 50.0)
    shader = PhongShader(key, fill, rim, normal_map_strength=0.5)
    from tinyrenderder_tpu.scene import _to_device_cached
    uniforms = {k: _to_device_cached(v) for k, v in shader.build_uniforms(
        view, proj, wall.materials[0], np.float32).items()}
    attrs = wall.device_face_attributes(np.float32)
    f = attrs["position"].shape[0]
    tile_h, tile_w = 16, 128
    ntx, nty = _cdiv(W, tile_w), _cdiv(H, tile_h)
    n_tiles = ntx * nty
    nsx = ntx * STRIPS
    n_strips = nsx * nty
    print(f"faces={f} tiles={n_tiles} strips={n_strips}")

    # ---- resolve capacities the way the runtime does
    from tinyrenderder_tpu.ops import raster_fine2
    caps = raster_fine2._resolve_caps(
        (f, ntx, nty), attrs, uniforms, shader, W, H, tile_h, tile_w,
        n_tiles)
    pc, rc, gc, ac = caps
    print(f"caps: pairs={pc} rows={rc} groups={gc} active={ac} "
          f"rec_cap={_next_pow2(rc)}")

    # ---- stage jits (all inputs as arguments)
    @jax.jit
    def s_vertex(attrs, uniforms):
        clip, varyings = shader.vertex(uniforms, attrs, jnp)
        vp = jnp.asarray(math3d.viewport(0, 0, W, H), jnp.float32)
        setup = semantics.triangle_setup_planes(clip, vp, W, H, jnp)
        return setup, varyings

    setup, varyings = jax.block_until_ready(s_vertex(attrs, uniforms))

    @jax.jit
    def s_spans(setup):
        return _tile_spans(setup, STRIP_W, tile_h)

    spans_out = jax.block_until_ready(s_spans(setup))
    tx0, ty0, span_x, spans, pair_total = spans_out

    @functools.partial(jax.jit)
    def s_bins(tx0, ty0, span_x, spans):
        return _build_bins(tx0, ty0, span_x, spans, pc, nsx, nty,
                           return_keys=True)

    bins_out = jax.block_until_ready(s_bins(tx0, ty0, span_x, spans))
    sorted_tri, start, counts, sorted_key = bins_out

    # flat-argsort packing — MUST mirror _pre_fine2_jit's shipped form
    # (the original per-class matching this script first profiled was
    # superseded in the same round; advisor round-3 item)
    n_strips_v = n_tiles * STRIPS

    @jax.jit
    def s_group(counts):
        order_f = jnp.argsort(-counts)
        pos = (jnp.zeros((n_strips_v,), jnp.int32)
               .at[order_f].set(jnp.arange(n_strips_v, dtype=jnp.int32)))
        sortc = counts[order_f]
        group_rows = sortc[0::STRIPS]
        group_start = (jnp.cumsum(group_rows) - group_rows).astype(jnp.int32)
        g_of = pos // STRIPS
        j_of = pos - g_of * STRIPS
        return order_f, group_rows, group_start, g_of, j_of

    order_f, group_rows, group_start, g_of, j_of = jax.block_until_ready(
        s_group(counts))

    @jax.jit
    def s_dst(sorted_key, start, group_start, g_of, j_of):
        q = jnp.arange(pc, dtype=jnp.int32)
        live_pair = sorted_key < n_strips
        s_safe = jnp.minimum(sorted_key, n_strips - 1)
        strip_tbl = jnp.stack([start[:-1],
                               group_start[g_of] * STRIPS + j_of],
                              axis=1)
        sg = strip_tbl[s_safe]
        rank = q - sg[:, 0]
        dst = sg[:, 1] + rank * STRIPS
        return jnp.where(live_pair & (dst < rc * STRIPS), dst, rc * STRIPS)

    dst = jax.block_until_ready(
        s_dst(sorted_key, start, group_start, g_of, j_of))

    @jax.jit
    def s_scatter(dst, sorted_tri):
        return (jnp.full((rc * STRIPS,), -1, jnp.int32)
                .at[dst].set(sorted_tri, mode="drop")
                .reshape(rc, STRIPS))

    tri8 = jax.block_until_ready(s_scatter(dst, sorted_tri))

    spec = tuple(shader.varying_spec.items())

    @jax.jit
    def s_tbl(setup, varyings):
        from tinyrenderder_tpu.ops.raster_tiled import _flatten_varyings
        vary_corners = _flatten_varyings(varyings, spec)
        n_vary = vary_corners.shape[-1]
        vary_cols = (vary_corners.astype(jnp.float32)
                     .transpose(0, 2, 1).reshape(-1, 3 * n_vary))
        tbl = jnp.concatenate([
            setup["screen"].reshape(-1, 6).astype(jnp.float32),
            setup["ndc_z"].astype(jnp.float32),
            setup["bbox"].astype(jnp.float32),
            setup["clip_w"].astype(jnp.float32),
            jnp.arange(f, dtype=jnp.float32)[:, None],
            vary_cols,
        ], axis=1)
        return jnp.pad(tbl, ((0, 0), (0, NCOL - tbl.shape[1])))

    tbl = jax.block_until_ready(s_tbl(setup, varyings))

    @jax.jit
    def s_recgather(tbl, tri8):
        padrow = jnp.zeros((NCOL,), jnp.float32).at[COL_ID].set(-1.0)
        g = jnp.where((tri8 >= 0)[..., None],
                      tbl[jnp.maximum(tri8, 0)], padrow)
        return (g.transpose(0, 2, 1).reshape(rc, REC_ROWS, 128))

    rec = jax.block_until_ready(s_recgather(tbl, tri8))

    @jax.jit
    def s_recpad(rec):
        rec_full = jnp.zeros((_next_pow2(rc) + DMA_ROWS, REC_ROWS, 128),
                             jnp.float32)
        return jax.lax.dynamic_update_slice(rec_full, rec, (0, 0, 0))

    jax.block_until_ready(s_recpad(rec))

    @jax.jit
    def s_full(attrs, uniforms):
        return _pre_fine2_jit(attrs, uniforms, shader, W, H, pc, rc,
                              _next_pow2(rc), gc, ac, tile_h, tile_w)

    jax.block_until_ready(s_full(attrs, uniforms))

    print(f"vertex+setup:        {t(s_vertex, attrs, uniforms):7.2f} ms")
    print(f"strip spans:         {t(s_spans, setup):7.2f} ms")
    print(f"build_bins (sort):   {t(s_bins, tx0, ty0, span_x, spans):7.2f} ms")
    print(f"grouping (argsort):  {t(s_group, counts):7.2f} ms")
    print(f"dst computation:     {t(s_dst, sorted_key, start, group_start, g_of, j_of):7.2f} ms")
    print(f"slot scatter:        {t(s_scatter, dst, sorted_tri):7.2f} ms")
    print(f"tbl build:           {t(s_tbl, setup, varyings):7.2f} ms")
    print(f"record gather:       {t(s_recgather, tbl, tri8):7.2f} ms")
    print(f"record pow2 pad:     {t(s_recpad, rec):7.2f} ms")
    print(f"FULL fused pre:      {t(s_full, attrs, uniforms):7.2f} ms")


if __name__ == "__main__":
    main()
