"""A/B the fused headline frame across tile heights (round-4 headline
frontier probe).

The whole pipeline is parameterized on (tile_h, tile_w); tile_w = 128
is the VPU lane width, but tile_h trades per-grid-step kernel overhead
(fewer, taller tiles) against phase-C shaded-pixel tightness (coverage
per tile gets less exact, so the active-tile pixel count — the texture-
gather index count, THE headline floor — grows).  Measured inside the
production fused program per the repo A/B rule; outputs must stay
BITWISE equal across tile heights (the winner/depth/color maps do not
depend on the tiling).

Usage: python scripts/ab_tile_h.py [width height frames]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _force, _measure_rtt, build_pass
from tinyrenderder_tpu.ops import raster_sparse
from tinyrenderder_tpu.scene import _to_device_cached


def run_variant(attrs, shader, uniforms, width, height, tile_h, frames):
    passes = [(attrs, shader, uniforms, False)]
    # warm caps + compile
    ft, _, _ = raster_sparse.render_frame_fused(
        passes, width, height, tile_h=tile_h, strict_capacity=True)
    fb = raster_sparse.tiles_to_buffers(ft, width, height,
                                        tile_h=tile_h)
    _force(fb.color)
    rtt = _measure_rtt()
    t0 = time.perf_counter()
    out = None
    for _ in range(frames):
        ft, _, _ = raster_sparse.render_frame_fused(
            passes, width, height, tile_h=tile_h, strict_capacity=False)
        out = raster_sparse.tiles_to_buffers(ft, width, height,
                                             tile_h=tile_h)
    _force(out.color)
    dt = (time.perf_counter() - t0 - rtt) / frames
    caps = {k: v for k, v in raster_sparse._SPARSE_CAPACITY.items()
            if k[3] == tile_h}
    caps.update({k: v for k, v in
                 __import__("tinyrenderder_tpu.ops.raster_fine",
                            fromlist=["x"])._FINE_CAPACITY.items()
                 if k[3] == tile_h})
    return dt, np.asarray(out.color), np.asarray(out.depth), caps


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    scene = sys.argv[4] if len(sys.argv) > 4 else "head"

    if scene == "head":
        attrs, shader, uniforms = build_pass(width, height)
    else:
        from bench import _lights
        from tinyrenderder_tpu import math3d
        from tinyrenderder_tpu.models import procedural
        from tinyrenderder_tpu.shaders import PhongShader
        key, fill, rim = _lights()
        mesh = (procedural.head_wall(grid=3) if scene == "stress"
                else procedural.mixed_interior(grid=3))
        view = math3d.lookat((0, 0.3, 6.5), (0, 0, 0), (0, 1, 0))
        proj = math3d.perspective(60.0, width / height, 0.1, 50.0)
        shader = PhongShader(key, fill, rim, normal_map_strength=0.5)
        uniforms = shader.build_uniforms(view, proj, mesh.materials[0],
                                         np.float32)
        attrs = mesh.device_face_attributes(np.float32)
    attrs = {k: jnp.asarray(v) for k, v in attrs.items()}
    uniforms = {k: _to_device_cached(v) for k, v in uniforms.items()}

    tile_hs = (tuple(int(x) for x in sys.argv[5].split(","))
               if len(sys.argv) > 5 else (8, 16, 32))
    ref = None
    # interleave variants so a drifting tunnel window can't bias one arm
    results = {th: [] for th in tile_hs}
    for rep in range(3):
        for th in tile_hs:
            if height % th:
                continue
            dt, color, depth, caps = run_variant(
                attrs, shader, uniforms, width, height, th, frames)
            results[th].append(dt)
            print(f"tile_h={th} rep{rep}: {dt * 1e3:.2f} ms/frame "
                  f"({width * height / dt / 1e6:.1f} Mpix/s) caps={caps}",
                  flush=True)
            if ref is None:
                ref = (color, depth)
            else:
                assert (ref[0] == color).all(), f"tile_h={th} color diff!"
                assert np.array_equal(ref[1], depth, equal_nan=True), \
                    f"tile_h={th} depth diff!"
    for th, ds in results.items():
        if ds:
            med = sorted(ds)[len(ds) // 2]
            print(f"tile_h={th}: median {med * 1e3:.2f} ms "
                  f"({width * height / med / 1e6:.1f} Mpix/s)")


if __name__ == "__main__":
    main()
