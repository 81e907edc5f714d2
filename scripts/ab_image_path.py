"""A/B the single-pass direct-to-image path against the shipped
render_frame_fused + tiles_to_buffers chain, inside the production
program per the repo A/B rule (interleaved arms, forced-fetch timing,
bitwise equality asserted).

Arms:
  general   render_frame_fused -> tiles_to_buffers(...).color (shipped)
  tiles     image path, tile scatter + color-only untile
  direct    image path, one windowed scatter into screen layout

Usage: python scripts/ab_image_path.py [width height frames scene]
  scene: head (default, fine kernel) | stress (fine2) | mixed
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

from bench import _force, _measure_rtt, build_pass
from tinyrenderder_tpu.ops import raster_sparse
from tinyrenderder_tpu.scene import _to_device_cached


def build_scene(scene, width, height):
    if scene in ("head", "gouraud", "textured"):
        shader = None
        if scene != "head":
            from bench import _lights
            from tinyrenderder_tpu.shaders import (GouraudShader,
                                                   TexturedShader)
            key, _, _ = _lights()
            shader = (GouraudShader(light_world=key) if scene == "gouraud"
                      else TexturedShader(light_world=key))
        attrs, shader, uniforms = build_pass(width, height, shader=shader)
    elif scene in ("stress", "mixed"):
        from tinyrenderder_tpu import math3d
        from tinyrenderder_tpu.models import procedural
        from tinyrenderder_tpu.shaders import PhongShader
        from bench import _lights
        key, fill, rim = _lights()
        if scene == "stress":
            mesh = procedural.head_wall(grid=3)
            eye = (0, 0.3, 6.5)
        else:
            mesh = procedural.mixed_interior()
            eye = (0, 0.3, 6.5)
        view = math3d.lookat(eye, (0, 0, 0), (0, 1, 0))
        proj = math3d.perspective(60.0, width / height, 0.1, 50.0)
        shader = PhongShader(key, fill, rim, normal_map_strength=0.5)
        uniforms = shader.build_uniforms(view, proj, mesh.materials[0],
                                         np.float32)
        attrs = mesh.device_face_attributes(np.float32)
    else:
        raise SystemExit(f"unknown scene {scene}")
    attrs = {k: jnp.asarray(v) for k, v in attrs.items()}
    uniforms = {k: _to_device_cached(v) for k, v in uniforms.items()}
    return [(attrs, shader, uniforms, False)]


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    scene = sys.argv[4] if len(sys.argv) > 4 else "head"
    passes = build_scene(scene, width, height)

    def general():
        ft, _, _ = raster_sparse.render_frame_fused(
            passes, width, height, strict_capacity=False)
        return raster_sparse.tiles_to_buffers(ft, width, height).color

    def tiles():
        img, _ = raster_sparse.render_frame_fused_image(
            passes, width, height, strict_capacity=False, direct=False)
        return img

    def direct():
        img, _ = raster_sparse.render_frame_fused_image(
            passes, width, height, strict_capacity=False, direct=True)
        return img

    arms = {"general": general, "tiles": tiles, "direct": direct}

    # compile + warm caps + bitwise check
    ref = None
    for name, fn in arms.items():
        _force(fn())
        out = np.asarray(fn())
        if ref is None:
            ref = out
        else:
            assert (out == ref).all(), f"{name}: color diff vs general!"
    print("all arms bitwise-identical", file=sys.stderr)
    rtt = _measure_rtt()

    results = {k: [] for k in arms}
    for rep in range(3):
        for name, fn in arms.items():          # interleaved arms
            t0 = time.perf_counter()
            r = None
            for _ in range(frames):
                r = fn()
            _force(r)
            dt = (time.perf_counter() - t0 - rtt) / frames
            results[name].append(dt)
            print(f"rep{rep} {name}: {dt * 1e3:.2f} ms "
                  f"({width * height / dt / 1e6:.1f} Mpix/s)", flush=True)
    for name, ds in results.items():
        med = sorted(ds)[len(ds) // 2]
        print(f"{name}: median {med * 1e3:.2f} ms "
              f"({width * height / med / 1e6:.1f} Mpix/s)")


if __name__ == "__main__":
    main()
