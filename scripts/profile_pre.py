"""Break down the sparse pre-stage: vertex/setup vs binning (sort) vs
pair-record build vs compaction, at a given pair capacity."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from tinyrenderder_tpu import math3d
from tinyrenderder_tpu.models import procedural
from tinyrenderder_tpu.ops import raster_pallas, raster_tiled, semantics
from tinyrenderder_tpu.ops.raster_tiled import (TILE_H, TILE_W, _build_bins,
                                                _cdiv, _tile_spans)
from tinyrenderder_tpu.shaders import PhongShader


def t(fn, n=20, warmup=3):
    for _ in range(warmup):
        r = fn()
        jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    W, H = 1280, 800
    from bench import _lights
    key, fill, rim = _lights()
    wall = procedural.head_wall(grid=3)
    view = math3d.lookat((0, 0.3, 6.5), (0, 0, 0), (0, 1, 0))
    proj = math3d.perspective(60.0, W / H, 0.1, 50.0)
    shader = PhongShader(key, fill, rim, normal_map_strength=0.5)
    from tinyrenderder_tpu.scene import _to_device_cached
    uniforms = {k: _to_device_cached(v) for k, v in shader.build_uniforms(
        view, proj, wall.materials[0], np.float32).items()}
    attrs = {k: jnp.asarray(v) for k, v in
             wall.face_attributes(np.float32).items()}
    ntx, nty = _cdiv(W, TILE_W), _cdiv(H, TILE_H)
    cap = 262144

    @jax.jit
    def vs(attrs, uniforms):
        clip, varyings = shader.vertex(uniforms, attrs, jnp)
        vp = jnp.asarray(math3d.viewport(0, 0, W, H), jnp.float32)
        setup = semantics.triangle_setup_planes(clip, vp, W, H, jnp)
        return setup, varyings

    setup, varyings = vs(attrs, uniforms)
    jax.block_until_ready(setup)
    print(f"vertex+setup: {t(lambda: vs(attrs, uniforms)):.2f} ms")

    spans_f = jax.jit(lambda s: _tile_spans(s, TILE_W, TILE_H))
    tx0, ty0, span_x, spans, total = spans_f(setup)
    jax.block_until_ready(spans)
    print(f"tile_spans: {t(lambda: spans_f(setup)):.2f} ms  "
          f"pairs={int(jax.device_get(total))}")

    bins_f = lambda: _build_bins(tx0, ty0, span_x, spans, cap, ntx, nty)
    sorted_tri, start, counts = bins_f()
    jax.block_until_ready(sorted_tri)
    print(f"build_bins (expand+sort+csr) cap={cap}: {t(bins_f):.2f} ms")

    from tinyrenderder_tpu.ops.raster_tiled import _flatten_varyings
    spec = tuple(shader.varying_spec.items())
    vary_corners = _flatten_varyings(varyings, spec)
    rec_f = lambda: raster_pallas.build_pair_records(setup, sorted_tri,
                                                     vary_corners)
    jax.block_until_ready(rec_f())
    print(f"build_pair_records: {t(rec_f):.2f} ms")

    # sort alone at this capacity
    key_arr = jnp.asarray(np.random.randint(0, ntx * nty, cap, np.int32))
    val = jnp.arange(cap, dtype=jnp.int32)
    sort_f = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    jax.block_until_ready(sort_f(key_arr, val))
    print(f"lax.sort {cap} pairs alone: "
          f"{t(lambda: sort_f(key_arr, val)):.2f} ms")

    # compaction alone
    @jax.jit
    def compact(counts):
        n_tiles = ntx * nty
        a_cap = 384
        active = counts > 0
        n_active = jnp.sum(active.astype(jnp.int32))
        pos = jnp.cumsum(active.astype(jnp.int32)) - 1
        slot = jnp.where(active, pos, a_cap)
        ids = jnp.full((a_cap,), n_tiles, jnp.int32).at[slot].set(
            jnp.arange(n_tiles, dtype=jnp.int32), mode="drop")
        return ids, n_active

    jax.block_until_ready(compact(counts))
    print(f"compaction: {t(lambda: compact(counts)):.2f} ms")


if __name__ == "__main__":
    main()
