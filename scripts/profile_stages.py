"""Per-stage timing of the tiled pipeline on the current backend."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from bench import build_pass
from tinyrenderder_tpu.ops import raster, raster_pallas, raster_tiled


def t(fn, n=10, warmup=3):
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
# device-resident textures, like the bench/scene paths — otherwise every
# timed call re-uploads ~MBs of host numpy through the tunnel
from tinyrenderder_tpu.scene import _to_device_cached
uniforms = {k: _to_device_cached(v) for k, v in uniforms.items()}
fb = raster.new_framebuffers(W, H)

print("backend:", jax.default_backend(), file=sys.stderr)

setup, varyings = raster_tiled._vertex_setup_jit(attrs, uniforms, shader, W, H)
jax.block_until_ready(setup)
print(f"vertex+setup: {t(lambda: raster_tiled._vertex_setup_jit(attrs, uniforms, shader, W, H))*1e3:.2f} ms")

bins = raster_tiled.bin_triangles_csr(setup, W, H)
print(f"binning (capacity cached): {t(lambda: raster_tiled.bin_triangles_csr(setup, W, H))*1e3:.2f} ms")
print(f"  pairs={int(jax.device_get(bins.total_pairs))} cap={bins.capacity} max_count={int(jax.device_get(bins.counts.max()))} tiles={bins.n_tiles}")

vary_corners = raster_tiled._flatten_varyings(varyings)
spec = raster_tiled._varying_layout(shader, varyings)
print(f"build_pair_records(+vary): {t(lambda: raster_pallas.build_pair_records(setup, bins.sorted_tri, vary_corners))*1e3:.2f} ms")

use_pallas = jax.default_backend() == "tpu"
if use_pallas:
    print(f"rasterize_pallas depth-only: {t(lambda: raster_pallas.rasterize_pallas(setup, bins, fb.depth, H, W))*1e3:.2f} ms")
    print(f"rasterize_pallas depth+vary: {t(lambda: raster_pallas.rasterize_pallas(setup, bins, fb.depth, H, W, vary_corners))*1e3:.2f} ms")
    depth, winner, vary_planes = raster_pallas.rasterize_pallas(
        setup, bins, fb.depth, H, W, vary_corners)
    jax.block_until_ready((depth, winner, vary_planes))
    print(f"shade planes (phase C): {t(lambda: raster_tiled._shade_planes_jit(fb, depth, winner, vary_planes, uniforms, jnp.int32(0), shader, spec, W, H))*1e3:.2f} ms")

print(f"full pass: {t(lambda: raster_tiled.render_pass_tiled(fb, attrs, shader, uniforms)[0])*1e3:.2f} ms")
