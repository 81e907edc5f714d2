"""Per-stage timing of the two-pass shadow config (round-4 verdict #5).

Decomposes the FUSED shadow frame (the path bench_shadows actually
measures) with forced-fetch timing (bench._force — block_until_ready is
not a barrier through the axon tunnel, docs/PERFORMANCE.md):

  1. full fused two-pass frame (light depth + N shade passes)
  2. the light-view depth-only pass alone, A/B'd across kernel modes
     (coarse = the shipped depth-only routing, fine, fine2)
  3. the shadowed shade passes alone (shadow map held fixed)

Usage: python scripts/profile_shadows.py [width height shadow_size frames]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from bench import _force, _lights, _measure_rtt, _scene
from tinyrenderder_tpu import shadows
from tinyrenderder_tpu.ops import raster_sparse


def timed(fn, frames, reps=3):
    """Median of ``reps`` pipelined batches of ``frames``, forced-fetch,
    RTT-subtracted (the bench._time_frames discipline)."""
    _force(fn())                     # compile
    _force(fn())                     # warm caps
    rtt = _measure_rtt()
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = None
        for _ in range(frames):
            r = fn()
        _force(r)
        samples.append((time.perf_counter() - t0 - rtt) / frames)
    return float(np.median(samples)), rtt


def main():
    W = H = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    SM = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    key, _, _ = _lights()
    scene = _scene(W, H, meshes=3)
    settings = shadows.ShadowSettings(size=SM)
    print(f"backend: {jax.default_backend()}  frame {W}x{H}, "
          f"shadow map {SM}^2", file=sys.stderr)

    # --- 1. full fused frame (the bench config) -----------------------------
    def full():
        result, _ = shadows.render_with_shadows(
            scene, key, settings, backend="tiled", frustum_cull=False,
            collect_stats=False, transfer=False, strict_capacity=False)
        return result.color

    dt, rtt = timed(full, frames)
    print(f"full fused shadow frame: {dt*1e3:.2f} ms "
          f"({W*H/dt/1e6:.1f} Mpix/s)  [rtt {rtt*1e3:.1f} ms]")

    # --- 2. light depth pass alone, per kernel mode --------------------------
    light_cam = shadows.light_camera_for_scene(scene, key, settings)
    merged = shadows._merged_world_mesh(scene)
    from tinyrenderder_tpu.scene import _to_device_cached
    from tinyrenderder_tpu.shaders import DepthShader
    dshader = DepthShader()
    duni = {k: _to_device_cached(v) for k, v in dshader.build_uniforms(
        light_cam.view_matrix, light_cam.projection_matrix, None,
        np.float32).items()}
    dattrs = merged.device_face_attributes(np.float32)
    print(f"light pass: {merged.nfaces} merged faces at {SM}^2",
          file=sys.stderr)

    for mode in ("coarse", "fine", "fine2"):
        old = raster_sparse.FINE_MODE
        raster_sparse.FINE_MODE = mode
        try:
            def depth():
                ft, _, _ = raster_sparse.render_frame_fused(
                    [(dattrs, dshader, duni, False)], SM, SM,
                    strict_capacity=False)
                return ft.depth
            dt, _ = timed(depth, frames)
            print(f"  depth-only pass [{mode}]: {dt*1e3:.2f} ms")
        except Exception as e:  # noqa: BLE001 — report and move on
            print(f"  depth-only pass [{mode}]: FAILED ({type(e).__name__}: "
                  f"{e})")
        finally:
            raster_sparse.FINE_MODE = old

    # --- 2b. full fused frame with depth-only kernel routing A/B ------------
    for dmode in ("coarse", "probe"):
        old = raster_sparse.DEPTH_ONLY_MODE
        raster_sparse.DEPTH_ONLY_MODE = dmode
        try:
            dt, _ = timed(full, frames)
            print(f"full fused frame [depth-only routing={dmode}]: "
                  f"{dt*1e3:.2f} ms ({W*H/dt/1e6:.1f} Mpix/s)")
        except Exception as e:  # noqa: BLE001
            print(f"full fused frame [depth-only routing={dmode}]: FAILED "
                  f"({type(e).__name__}: {e})")
        finally:
            raster_sparse.DEPTH_ONLY_MODE = old

    # --- 3. shadowed shade passes alone (fixed shadow map) ------------------
    sm = shadows.render_depth_from_light(scene, light_cam, settings,
                                         backend="tiled", transfer=False,
                                         strict_capacity=False)
    lit = shadows.shadowed_scene(scene, key, sm, light_cam, settings)

    def shade():
        return lit.render(backend="tiled", frustum_cull=False,
                          collect_stats=False, transfer=False,
                          strict_capacity=False).color

    dt, _ = timed(shade, frames)
    print(f"shadowed shade passes ({len(lit.passes)} passes at {W}x{H}): "
          f"{dt*1e3:.2f} ms")

    # unshadowed baseline for the shadow-sampling overhead
    def plain():
        return scene.render(backend="tiled", frustum_cull=False,
                            collect_stats=False, transfer=False,
                            strict_capacity=False).color

    dt, _ = timed(plain, frames)
    print(f"unshadowed shade passes (same scene): {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
