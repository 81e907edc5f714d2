"""Headline benchmark: shaded-pixel throughput on the flagship pass.

Renders the normal-mapped 3-light Phong pass (the reference's main
workload, main.cpp:39-171) over a dense procedural head at 2048x2048
through the binned tile pipeline (Pallas depth kernel on TPU), and
reports steady-state Mpixels/s of shaded output.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N}

vs_baseline is measured against the BASELINE.md target of 1 Gpixel/s at
2048^2 (the reference itself publishes no numbers - BASELINE.json
"published": {}), i.e. vs_baseline = value / 1000.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_pass(width, height, n_lat=96, n_lon=144):
    from tinyrenderder_tpu import math3d
    from tinyrenderder_tpu.models import procedural
    from tinyrenderder_tpu.shaders import PhongShader

    head = procedural.bumpy_head(n_lat, n_lon)
    head.materials = [procedural.default_head_material(256)]
    view = math3d.lookat((0, 0.4, 2.6), (0, 0, 0), (0, 1, 0))
    proj = math3d.perspective(60.0, width / height, 0.1, 50.0)
    key = math3d.normalized(math3d.vec3(1.0, 1.4, 1.0))
    fill = math3d.normalized(math3d.vec3(-0.3, 0.5, 0.2))
    rim = math3d.normalized(math3d.vec3(-1.0, 0.8, -1.5))
    shader = PhongShader(key, fill, rim, normal_map_strength=0.5)
    uniforms = shader.build_uniforms(view, proj, head.materials[0], np.float32)
    attrs = head.face_attributes(np.float32)
    log(f"scene: head {head.nfaces} faces at {width}x{height}")
    return attrs, shader, uniforms


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tinyrenderder_tpu.ops import raster, raster_tiled

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    width = height = 2048 if on_tpu else 256
    warmup, frames = (3, 10) if on_tpu else (2, 4)
    log(f"backend={backend} devices={len(jax.devices())}")

    attrs, shader, uniforms = build_pass(width, height)
    attrs = {k: jnp.asarray(v) for k, v in attrs.items()}

    def frame():
        fb = raster.new_framebuffers(width, height)
        fb, _ = raster_tiled.render_pass_tiled(fb, attrs, shader, uniforms)
        return fb

    t0 = time.perf_counter()
    fb = frame()
    fb.color.block_until_ready()
    log(f"first frame (compile) {time.perf_counter() - t0:.1f}s, "
        f"covered={int(np.isfinite(np.asarray(fb.depth)).sum())}")
    for _ in range(warmup - 1):
        frame().color.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(frames):
        fb = frame()
    fb.color.block_until_ready()
    dt = time.perf_counter() - t0

    fps = frames / dt
    mpix_s = width * height * fps / 1e6
    log(f"{fps:.2f} fps, {mpix_s:.1f} Mpix/s over {frames} frames")

    print(json.dumps({
        "metric": f"phong_shaded_throughput_{width}x{height}_{backend}",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / 1000.0, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
