"""Per-stage timing of the tiled pipeline on the current backend."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from bench import build_pass
from tinyrenderder_tpu.ops import raster, raster_pallas, raster_tiled


def t(fn, n=5, warmup=2):
    for _ in range(warmup):
        r = fn()
        jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


W = H = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
attrs, shader, uniforms = build_pass(W, H)
attrs = {k: jnp.asarray(v) for k, v in attrs.items()}
uniforms = dict(uniforms)
fb = raster.new_framebuffers(W, H)

print("backend:", jax.default_backend(), file=sys.stderr)

setup, varyings = raster_tiled._vertex_setup_jit(attrs, uniforms, shader, W, H)
jax.block_until_ready(setup)
print(f"vertex+setup: {t(lambda: raster_tiled._vertex_setup_jit(attrs, uniforms, shader, W, H))*1e3:.2f} ms")

bins = raster_tiled.bin_triangles_csr(setup, W, H)
print(f"binning (incl. 1 host sync): {t(lambda: raster_tiled.bin_triangles_csr(setup, W, H))*1e3:.2f} ms")
print(f"  pairs={int(jax.device_get(bins.start[-1]))} max_count={int(jax.device_get(bins.counts.max()))} tiles={bins.n_tiles}")

records = raster_pallas.build_pair_records(setup, bins.sorted_tri)
print(f"build_pair_records: {t(lambda: raster_pallas.build_pair_records(setup, bins.sorted_tri))*1e3:.2f} ms")

use_pallas = jax.default_backend() == "tpu"
if use_pallas:
    print(f"depth_resolve_pallas: {t(lambda: raster_pallas.depth_resolve_pallas(setup, bins, fb.depth, H, W))*1e3:.2f} ms")
print(f"depth_resolve_tiled(XLA): {t(lambda: raster_tiled.depth_resolve_tiled(setup, bins, fb.depth, H, W))*1e3:.2f} ms")

if use_pallas:
    depth, winner = raster_pallas.depth_resolve_pallas(setup, bins, fb.depth, H, W)
else:
    depth, winner = raster_tiled.depth_resolve_tiled(setup, bins, fb.depth, H, W)
jax.block_until_ready((depth, winner))

print(f"shade+merge: {t(lambda: raster_tiled._shade_merge_jit(fb, depth, winner, setup, varyings, uniforms, jnp.int32(0), shader, W, H))*1e3:.2f} ms")
print(f"full pass: {t(lambda: raster_tiled.render_pass_tiled(fb, attrs, shader, uniforms)[0])*1e3:.2f} ms")
