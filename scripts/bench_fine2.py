"""TPU micro-bench: coarse vs fine vs fine2 pass drivers on the stress
and headline scenes (forced-fetch timing, bench.py discipline)."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
import bench
from tinyrenderder_tpu import math3d
from tinyrenderder_tpu.models import procedural
from tinyrenderder_tpu.scene import _to_device_cached
from tinyrenderder_tpu.shaders import PhongShader
from tinyrenderder_tpu.ops import raster_sparse, raster_fine, raster_fine2

def scene_stress(width=1280, height=800, grid=3):
    wall = procedural.head_wall(grid=grid)
    key, fill, rim = bench._lights()
    view = math3d.lookat((0, 0.3, 6.5), (0, 0, 0), (0, 1, 0))
    proj = math3d.perspective(60.0, width / height, 0.1, 50.0)
    shader = PhongShader(key, fill, rim, normal_map_strength=0.5)
    uniforms = {k: _to_device_cached(v) for k, v in shader.build_uniforms(
        view, proj, wall.materials[0], np.float32).items()}
    attrs = wall.device_face_attributes(np.float32)
    return attrs, shader, uniforms, width, height, wall.nfaces

def scene_head(width=2048, height=2048):
    attrs, shader, uniforms = bench.build_pass(width, height)
    attrs = {k: jnp.asarray(v) for k, v in attrs.items()}
    uniforms = {k: _to_device_cached(v) for k, v in uniforms.items()}
    return attrs, shader, uniforms, width, height, attrs["position"].shape[0]

def run(name, fn_name, attrs, shader, uniforms, W, H, frames=8):
    drivers = {"coarse": raster_sparse.render_pass_tiles,
               "fine": raster_fine.render_pass_fine,
               "fine2": raster_fine2.render_pass_fine2}
    drv = drivers[fn_name]
    def frame():
        ft = raster_sparse.new_frame_tiles(W, H)
        ft, _, _ = drv(ft, attrs, shader, dict(uniforms), W, H,
                       strict_capacity=False)
        return ft.depth
    t0 = time.perf_counter(); bench._force(frame())
    compile_s = time.perf_counter() - t0
    for _ in range(2): frame()
    bench._force(frame())
    rtt = bench._measure_rtt()
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = None
        for _ in range(frames): r = frame()
        bench._force(r)
        samples.append((time.perf_counter() - t0 - rtt) / frames)
    dt = float(np.median(samples))
    print(f"{name:14s} {fn_name:7s} {dt*1e3:7.2f} ms/frame  "
          f"({W*H/dt/1e6:6.1f} Mpix/s, compile {compile_s:.0f}s)", flush=True)
    return dt

which = sys.argv[1] if len(sys.argv) > 1 else "both"
if which in ("both", "stress"):
    sc = scene_stress()
    for d in ("fine", "fine2", "coarse"):
        run("stress246k", d, *sc[:5])
if which in ("both", "head"):
    sc = scene_head()
    for d in ("fine", "fine2"):
        run("phong2048", d, *sc[:5])
