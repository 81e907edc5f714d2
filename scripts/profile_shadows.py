"""Per-stage timing of the two-pass shadow config (VERDICT weak #1).

Breaks the 800^2 shadow frame into its components on the current
backend: host-side scene/shader rebuild, the 1024^2 depth-only light
pass, each 800^2 shade pass, and the full render_with_shadows frame.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax

from bench import _lights, _scene
from tinyrenderder_tpu import shadows
from tinyrenderder_tpu.scene import render_scene


def t(fn, n=10, warmup=3, block=True):
    for _ in range(warmup):
        r = fn()
        if block:
            jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = None
    for _ in range(n):
        r = fn()
    if block:
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


W = H = int(sys.argv[1]) if len(sys.argv) > 1 else 800
SHADOW = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
key, _, _ = _lights()
scene = _scene(W, H, meshes=3)
settings = shadows.ShadowSettings(size=SHADOW)
print("backend:", jax.default_backend(), file=sys.stderr)

# --- components ------------------------------------------------------------
light_cam = shadows.light_camera_for_scene(scene, key, settings)
print(f"host: light_camera_for_scene: "
      f"{t(lambda: shadows.light_camera_for_scene(scene, key, settings), block=False)*1e3:.2f} ms")

sm = shadows.render_depth_from_light(scene, light_cam, settings,
                                     backend='tiled', transfer=False,
                                     strict_capacity=False)
print(f"depth pass {SHADOW}^2 (tiled, transfer=False, async cap): "
      f"{t(lambda: shadows.render_depth_from_light(scene, light_cam, settings, backend='tiled', transfer=False, strict_capacity=False))*1e3:.2f} ms")

lit = shadows.shadowed_scene(scene, key, sm, light_cam, settings)
print(f"host: shadowed_scene rebuild: "
      f"{t(lambda: shadows.shadowed_scene(scene, key, sm, light_cam, settings), block=False)*1e3:.2f} ms")

r = lit.render(backend="tiled", frustum_cull=False, collect_stats=False,
               transfer=False, strict_capacity=False)
jax.block_until_ready(r.color)
print(f"pass-2 shade frame ({len(lit.passes)} passes at {W}x{H}): "
      f"{t(lambda: lit.render(backend='tiled', frustum_cull=False, collect_stats=False, transfer=False, strict_capacity=False).color)*1e3:.2f} ms")

# per-pass breakdown of pass 2
from tinyrenderder_tpu.ops import raster, raster_tiled
from tinyrenderder_tpu.scene import _pass_inputs
import jax.numpy as jnp

fb0 = raster.new_framebuffers(W, H)
for p in lit.passes:
    attrs, uniforms = _pass_inputs(lit, p, np.float32, device=True)

    def one(attrs=attrs, sh=p.shader, u=uniforms):
        fb, _ = raster_tiled.render_pass_tiled(fb0, attrs, sh, u,
                                               strict_capacity=False)
        return fb.color
    jax.block_until_ready(one())
    print(f"  pass '{p.name}' ({p.mesh.nfaces} tris, {p.shader.name}): "
          f"{t(one)*1e3:.2f} ms")

def full():
    result, _ = shadows.render_with_shadows(
        scene, key, settings, backend="tiled", frustum_cull=False,
        collect_stats=False, transfer=False, strict_capacity=False)
    return result.color

jax.block_until_ready(full())
print(f"full render_with_shadows frame: {t(full)*1e3:.2f} ms")
print(f"  dispatch only (no block): {t(full, block=False)*1e3:.2f} ms")
