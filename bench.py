"""Benchmark suite: the five BASELINE.md configs on the current backend.

Prints the headline metric JSON (shaded-pixel throughput of the
normal-mapped Phong pass at 2048^2 through the binned/Pallas pipeline)
on stdout: a PROVISIONAL line right after the first headline sample —
so a driver timeout can never zero the round — and the final
suite-median line at the end (consumers parse the LAST metric line);
per-config details go to stderr and bench_report.json.

vs_baseline is measured against the BASELINE.md target of 1 Gpixel/s at
2048^2 on a v5e-8 (the reference itself publishes no numbers —
BASELINE.json "published": {}), i.e. vs_baseline = value / 1000.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Before ANY jax import (the env form also reaches the probe/reference
# subprocesses): Mosaic compiles take 1-3 min per config without the
# persistent cache (docs/PERFORMANCE.md) — r04 lost 192 s to one cold
# gouraud compile because code edits change the cache keys; the cache
# dir at least guarantees driver re-runs at the same HEAD are warm.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _lights():
    from tinyrenderder_tpu import math3d
    key = math3d.normalized(math3d.vec3(1.0, 1.4, 1.0))
    fill = math3d.normalized(math3d.vec3(-0.3, 0.5, 0.2))
    rim = math3d.normalized(math3d.vec3(-1.0, 0.8, -1.5))
    return key, fill, rim


def _head(n_lat=96, n_lon=144):
    from tinyrenderder_tpu.models import procedural
    head = procedural.bumpy_head(n_lat, n_lon)
    head.materials = [procedural.default_head_material(256)]
    return head


def _camera(width, height, eye=(0, 0.4, 2.6), target=(0, 0, 0), fov=60.0):
    from tinyrenderder_tpu import math3d
    from tinyrenderder_tpu.camera import Camera
    cam = Camera()
    cam.set_eye(math3d.vec3(*eye))
    cam.set_target(math3d.vec3(*target))
    cam.set_fov(fov)
    cam.set_aspect(width / height)
    cam.set_clipping(0.1, 50.0)
    return cam


def build_pass(width, height, n_lat=96, n_lon=144, shader=None):
    """Single flagship pass (kept for scripts/profile_stages.py)."""
    from tinyrenderder_tpu.shaders import PhongShader
    head = _head(n_lat, n_lon)
    cam = _camera(width, height)
    key, fill, rim = _lights()
    shader = shader or PhongShader(key, fill, rim, normal_map_strength=0.5)
    uniforms = shader.build_uniforms(cam.view_matrix, cam.projection_matrix,
                                     head.materials[0], np.float32)
    attrs = head.face_attributes(np.float32)
    log(f"scene: head {head.nfaces} faces at {width}x{height}")
    return attrs, shader, uniforms


def _scene(width, height, shader_for=None, meshes=3):
    """Multi-mesh scene (head + eyes + room) for the animation config."""
    from tinyrenderder_tpu import math3d
    from tinyrenderder_tpu.models import procedural
    from tinyrenderder_tpu.scene import Scene
    from tinyrenderder_tpu.shaders import EyeShader, PhongShader

    key, fill, rim = _lights()
    scene = Scene(camera=_camera(width, height, eye=(0, 0.6, 3.0)),
                  width=width, height=height)
    head = _head(64, 96)
    scene.add(head, math3d.identity4(),
              PhongShader(key, fill, rim, normal_map_strength=0.5),
              name="head")
    if meshes >= 2:
        eyes = procedural.uv_sphere(12, 16, radius=0.12, name="eyes")
        eyes.positions += np.array([0.35, 0.25, 0.8])
        eyes.finalize()
        eyes.materials = [procedural.default_head_material(64)]
        scene.add(eyes, math3d.identity4(), EyeShader(key, rim), name="eyes",
                  exclude_from_output_depth=True)
    if meshes >= 3:
        room = procedural.cube(size=12.0, name="room")
        room.faces = room.faces[:, ::-1].copy()
        room.finalize()
        room.materials = [procedural.default_head_material(128)]
        scene.add(room, math3d.identity4(),
                  PhongShader(key, fill, rim, normal_map_strength=0.0),
                  name="room")
    return scene


def _force(r):
    """Force TRUE completion of ``r`` (and, by in-order execution, all
    previously dispatched work) with a host fetch of a tiny reduction.

    ``jax.block_until_ready`` is NOT a reliable completion barrier
    through the axon tunnel — it has been observed returning in ~0.02 ms
    right after dispatching seconds of device work (measured 2026-08-16;
    see docs/PERFORMANCE.md).  A device_get of a value that depends on
    the result is the only trustworthy sync; keep the fetched value tiny
    (full-buffer transfers run at ~20 MB/s through the tunnel).
    """
    import jax
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(r)
    x = leaves[0]
    return jax.device_get(_force_red(jnp.ravel(x)[:8].astype(jnp.float32)))


def _force_red(x):
    import jax
    if not hasattr(_force_red, "_f"):
        import jax.numpy as jnp
        _force_red._f = jax.jit(lambda v: jnp.sum(v))
    return _force_red._f(x)


def _measure_rtt():
    """One-way-trip cost of a tiny forced fetch (median of 5)."""
    import jax.numpy as jnp
    x = jnp.zeros((8,), jnp.float32)
    _force(x)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _force(x)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _tunnel_gate(max_wait_s: float = 1800.0, bad_rtt_s: float = 0.2):
    """Refuse to bench through a degraded tunnel.

    The axon tunnel has been observed at ~100-250x latency for tens of
    minutes (docs/PERFORMANCE.md infra notes, 2026-08-17; a ~465 ms-RTT
    window was observed 2026-08-19 — well under the old 1.0 s bar yet
    ~20-50x off healthy); numbers taken in such a window are fiction.
    Probe the forced-fetch RTT; while it exceeds ``bad_rtt_s`` (healthy
    is ~4-30 ms), wait and re-probe, up to ``max_wait_s``.  Always
    proceeds eventually — but the returned state is recorded in
    bench_report.json so a degraded run is flagged instead of silently
    trusted."""
    import jax.numpy as jnp
    x = jnp.zeros((8,), jnp.float32)
    _force(x)                      # compile the probe (one fetch)
    deadline = time.time() + max_wait_s

    def probe_once():
        # single fetch, not median-of-5: in a deep degradation each
        # fetch can take minutes, and the gate must decide cheaply
        t0 = time.perf_counter()
        _force(x)
        return time.perf_counter() - t0

    waited = False
    while True:
        rtt = probe_once()
        if rtt < bad_rtt_s:
            return {"rtt_s": round(rtt, 4), "degraded": False,
                    "waited": waited}
        if time.time() >= deadline:
            log(f"WARNING: tunnel still degraded (rtt {rtt:.2f}s) after "
                f"{max_wait_s:.0f}s — proceeding; treat numbers as "
                "unreliable")
            return {"rtt_s": round(rtt, 4), "degraded": True,
                    "waited": waited}
        log(f"tunnel degraded (rtt {rtt:.2f}s >= {bad_rtt_s}s) — "
            "waiting 60s before re-probe")
        waited = True
        time.sleep(60)


def _time_frames(frame_fn, warmup, frames, batches: int = 3):
    """Median over a few LARGE pipelined batches.

    Each batch dispatches ``frames`` frames and forces completion once
    (a forced fetch through the device tunnel costs ~15-30 ms, so
    syncing per frame adds up to +50%); the fetch RTT is measured and
    subtracted.  The median over batches keeps robustness to spikes.
    """
    t0 = time.perf_counter()
    _force(frame_fn())
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        frame_fn()
    _force(frame_fn())
    rtt = _measure_rtt()
    samples = []
    for _ in range(batches):
        t0 = time.perf_counter()
        r = None
        for _ in range(frames):
            r = frame_fn()
        _force(r)
        samples.append((time.perf_counter() - t0 - rtt) / frames)
    return float(np.median(samples)), compile_s, rtt, samples


def _timing_fields(dt, compile_s, rtt, samples=None):
    """Per-config record incl. the tunnel RTT measured right before the
    timed batches: a degradation window starting MID-suite (observed:
    they last tens of minutes) is then visible per config in
    bench_report.json instead of only at the start-of-suite gate.

    ``samples`` (per-batch frame times, seconds) yields the per-config
    dispersion bound (round-4 verdict #7): batch samples + the median
    absolute deviation, so a cross-round delta can be judged against
    the measured within-run noise instead of eyeballed."""
    out = {"frame_ms": dt * 1e3, "fps": 1.0 / dt,
           "compile_s": compile_s, "rtt_ms": round(rtt * 1e3, 2),
           "rtt_degraded": bool(rtt >= 1.0)}
    if samples:
        ms = sorted(s * 1e3 for s in samples)
        med = ms[len(ms) // 2]
        out["samples_frame_ms"] = [round(s, 3) for s in ms]
        out["mad_frame_ms"] = round(float(np.median(
            [abs(s - med) for s in ms])), 3)
    return out


def bench_single_pass(shader_name, width, height, warmup, frames):
    import jax.numpy as jnp

    from tinyrenderder_tpu.shaders import (GouraudShader, PhongShader,
                                           TexturedShader)

    key, fill, rim = _lights()
    shaders = {
        "gouraud": GouraudShader(light_world=key),
        "textured": TexturedShader(light_world=key),
        "phong": PhongShader(key, fill, rim, normal_map_strength=0.5),
    }
    attrs, shader, uniforms = build_pass(width, height,
                                         shader=shaders[shader_name])
    attrs = {k: jnp.asarray(v) for k, v in attrs.items()}
    # upload textures once — per-frame H2D costs ~35 ms via the tunnel
    from tinyrenderder_tpu.scene import _to_device_cached
    uniforms = {k: _to_device_cached(v) for k, v in uniforms.items()}

    from tinyrenderder_tpu.ops import raster_sparse

    th = raster_sparse.pick_tile_h(width, height)
    if os.environ.get("BENCH_IMAGE_PATH", "1") != "0":
        # PRODUCTION route for image-only frames (round-4 lever, wired
        # round 5): the single-pass direct-to-image fused program — no
        # depth/winner tile planes, one windowed placement instead of
        # the tile scatter + 3-plane untile.  Bitwise-identical colors
        # to the general chain (tests/test_image_path.py); A/B either
        # way with scripts/ab_image_path.py.  BENCH_IMAGE_PATH=0
        # restores the general chain.
        def frame():
            img, _ = raster_sparse.render_frame_fused_image(
                [(attrs, shader, uniforms, False)], width, height,
                tile_h=th, strict_capacity=False)
            return img
    else:
        def frame():
            ft, _, _ = raster_sparse.render_frame_fused(
                [(attrs, shader, uniforms, False)], width, height,
                tile_h=th, strict_capacity=False)
            # the frame deliverable is the (H, W) image: untile is in
            # the measured loop (the one per-frame layout conversion)
            return raster_sparse.tiles_to_buffers(
                ft, width, height, tile_h=th).color

    dt, compile_s, rtt, samples = _time_frames(frame, warmup, frames)
    return {"mpix_s": width * height / dt / 1e6,
            **_timing_fields(dt, compile_s, rtt, samples)}


def bench_shadows(width, height, warmup, frames, shadow_size=1024):
    from tinyrenderder_tpu import shadows
    key, _, _ = _lights()
    scene = _scene(width, height, meshes=3)
    settings = shadows.ShadowSettings(size=shadow_size)

    def frame():
        result, _ = shadows.render_with_shadows(
            scene, key, settings, backend="tiled", frustum_cull=False,
            collect_stats=False, transfer=False, strict_capacity=False)
        return result.color

    dt, compile_s, rtt, samples = _time_frames(frame, warmup, frames)
    return {"mpix_s": width * height / dt / 1e6,
            **_timing_fields(dt, compile_s, rtt, samples)}


def bench_stress(width, height, warmup, frames, grid=3):
    """Sponza-scale geometry: grid^2 dense heads (~246k triangles at
    grid=3) through the full pipeline."""
    import jax
    import jax.numpy as jnp

    from tinyrenderder_tpu import math3d
    from tinyrenderder_tpu.models import procedural
    # raster_sparse imported below
    from tinyrenderder_tpu.scene import _to_device_cached
    from tinyrenderder_tpu.shaders import PhongShader

    wall = procedural.head_wall(grid=grid)
    key, fill, rim = _lights()
    view = math3d.lookat((0, 0.3, 6.5), (0, 0, 0), (0, 1, 0))
    proj = math3d.perspective(60.0, width / height, 0.1, 50.0)
    shader = PhongShader(key, fill, rim, normal_map_strength=0.5)
    uniforms = {k: _to_device_cached(v) for k, v in shader.build_uniforms(
        view, proj, wall.materials[0], np.float32).items()}
    attrs = wall.device_face_attributes(np.float32)
    log(f"stress scene: {wall.nfaces} triangles at {width}x{height}")
    from tinyrenderder_tpu.ops import raster_sparse

    def frame():
        ft, _, _ = raster_sparse.render_frame_fused(
            [(attrs, shader, uniforms, False)], width, height,
            strict_capacity=False)
        return raster_sparse.tiles_to_buffers(ft, width, height).color

    dt, compile_s, rtt, samples = _time_frames(frame, warmup, frames)
    return {"mpix_s": width * height / dt / 1e6,
            "mtri_s": wall.nfaces / dt / 1e6,
            **_timing_fields(dt, compile_s, rtt, samples)}


def bench_mixed(width, height, warmup, frames, grid=3):
    """Mixed-regime stress (round-3 verdict item #5): a few dozen giant
    room triangles + ~250k tiny head triangles in ONE mesh — the
    reference's actual Sponza-interior regime (main.cpp:483-513), which
    exercises the fine/coarse dispatch and the huge-triangle all-strip
    fallback in the same pass."""
    import jax.numpy as jnp

    from tinyrenderder_tpu import math3d
    from tinyrenderder_tpu.models import procedural
    from tinyrenderder_tpu.ops import raster_sparse
    from tinyrenderder_tpu.scene import _to_device_cached
    from tinyrenderder_tpu.shaders import PhongShader

    interior = procedural.mixed_interior(grid=grid)
    key, fill, rim = _lights()
    view = math3d.lookat((0, 0.3, 6.5), (0, 0, 0), (0, 1, 0))
    proj = math3d.perspective(60.0, width / height, 0.1, 50.0)
    shader = PhongShader(key, fill, rim, normal_map_strength=0.5)
    uniforms = {k: _to_device_cached(v) for k, v in shader.build_uniforms(
        view, proj, interior.materials[0], np.float32).items()}
    attrs = interior.device_face_attributes(np.float32)
    log(f"mixed scene: {interior.nfaces} triangles "
        f"(12 giant room + tiny heads) at {width}x{height}")

    def frame():
        ft, _, _ = raster_sparse.render_frame_fused(
            [(attrs, shader, uniforms, False)], width, height,
            strict_capacity=False)
        return raster_sparse.tiles_to_buffers(ft, width, height).color

    # _FINE_DECISION is a process-lifetime memo: snapshot before so the
    # reported decisions are the ones THIS config's passes made, not the
    # accumulated history of every earlier config in the suite
    before = set(raster_sparse._FINE_DECISION)
    dt, compile_s, rtt, samples = _time_frames(frame, warmup, frames)
    decision = {k: v for k, v in raster_sparse._FINE_DECISION.items()
                if k not in before}
    log(f"  dispatch decisions: {decision}")
    return {"mpix_s": width * height / dt / 1e6,
            "mtri_s": interior.nfaces / dt / 1e6,
            "dispatch": {str(k): v for k, v in decision.items()},
            **_timing_fields(dt, compile_s, rtt, samples)}


def bench_sharded_mesh1(width, height, warmup, frames):
    """The PRODUCTION pipeline under shard_map on a 1-device mesh
    (round-3 verdict item #1c): proves the sharded fused path adds no
    per-chip cost vs the plain fused path — the evidence behind
    '8 chips => 8 x single-chip' scaling."""
    import jax
    import jax.numpy as jnp

    from tinyrenderder_tpu.parallel import dist
    from tinyrenderder_tpu.scene import _to_device_cached
    from tinyrenderder_tpu.shaders import PhongShader

    key, fill, rim = _lights()
    attrs, shader, uniforms = build_pass(
        width, height, shader=PhongShader(key, fill, rim,
                                          normal_map_strength=0.5))
    attrs = {k: jnp.asarray(v) for k, v in attrs.items()}
    uniforms = {k: _to_device_cached(v) for k, v in uniforms.items()}
    from tinyrenderder_tpu.ops import raster_sparse
    mesh = dist.make_mesh(1)
    passes = [(attrs, shader, uniforms, False)]
    th = raster_sparse.pick_tile_h(width, height)

    def frame():
        ft, _, _ = dist.render_frame_fused_sharded(
            mesh, passes, width, height, tile_h=th,
            strict_capacity=False)
        return dist.tiles_to_buffers_sharded(mesh, ft, width, height,
                                             tile_h=th).color

    dt, compile_s, rtt, samples = _time_frames(frame, warmup, frames)
    return {"mpix_s": width * height / dt / 1e6,
            **_timing_fields(dt, compile_s, rtt, samples)}


def bench_reference_pipeline(width, height, warmup, frames):
    """The reference's ACTUAL default output pipeline (main.cpp:743-786)
    at its default frame size (1200x800, main.cpp:26-27): the 3-pass
    multi-mesh scene render plus z-buffer visualization, full-frame
    64-tap SSAO, and the multiply composite — post stages in one fused
    device dispatch (ops/post.postprocess_device), everything device-
    resident.  SSAO reads the OUTPUT depth, i.e. the no-eyes snapshot
    (main.cpp:700,730 semantics), which scene.render's
    exclude_from_output_depth plumbing reproduces.  Ragged tile edges
    (1200 = 9.375 x 128) are padded by the tiled path."""
    from tinyrenderder_tpu.ops import post

    scene = _scene(width, height, meshes=3)

    def frame():
        result = scene.render(backend="tiled", frustum_cull=False,
                              collect_stats=False, transfer=False,
                              strict_capacity=False)
        _, _, final = post.postprocess_device(result.color, result.depth)
        return final

    dt, compile_s, rtt, samples = _time_frames(frame, warmup, frames)
    return {"mpix_s": width * height / dt / 1e6,
            **_timing_fields(dt, compile_s, rtt, samples)}


def bench_animation(width, height, frames):
    """Config #5: multi-mesh orbit; reports steady fps over `frames`
    orbit steps (no disk writes — render throughput only)."""
    import math as pymath

    from tinyrenderder_tpu.animation import orbit_eye

    scene = _scene(width, height, meshes=3)
    base_eye = np.array(scene.camera.params.eye)
    base_target = np.array(scene.camera.params.target)

    def render_at(i):
        angle = 2 * pymath.pi * i / max(frames, 1)
        scene.camera.set_eye(orbit_eye(base_eye, base_target, angle))
        return scene.render(backend="tiled", frustum_cull=False,
                            collect_stats=False, transfer=False,
                            strict_capacity=False).color

    t0 = time.perf_counter()
    _force(render_at(0))
    compile_s = time.perf_counter() - t0
    # warm until capacities are stable: async totals resolve frames
    # late and each refinement/growth re-traces the fused program —
    # under an ORBIT the won-tile/pair counts drift, so a 2-frame
    # warmup leaks those one-time re-traces into the timed batches
    # (measured: 27 -> 467 ms/frame median, round 3)
    # one full warmup orbit so every angle's capacity demand has been
    # seen (caps are monotone after refinement — steady state follows);
    # then a few FORCED frames so in-flight async totals resolve and any
    # late-detected growth re-traces here, not inside a timed batch
    # (per-key pending slots drop totals while an entry is in flight,
    # so a max-demand angle can otherwise surface late)
    for j in range(1, frames):
        render_at(j)
    for j in range(4):
        _force(render_at((j * frames) // 4))
    rtt = _measure_rtt()
    # large pipelined batches: one forced fetch per batch (see
    # _time_frames — per-frame syncs cost ~15-30 ms each via the tunnel)
    samples = []
    third = max(frames // 3, 1)
    for b in range(3):
        t0 = time.perf_counter()
        r = None
        for j in range(third):
            r = render_at(b * third + j)
        _force(r)
        samples.append((time.perf_counter() - t0 - rtt) / third)
    dt = float(np.median(samples))
    return {"frame_ms": dt * 1e3, "fps": 1.0 / dt,
            "mpix_s": width * height / dt / 1e6, "compile_s": compile_s}


def bench_animation_tga(width, height, frames):
    """Config #5 AS SPECIFIED (BASELINE.md): the full `frames`-frame
    orbit through animation.py — checkpoint/resume ON, every frame
    transferred to host and written as a TGA file.  Reported separately
    from the render-only fps: the D2H transfer (~20 MB/s through the
    axon tunnel) dominates this number on tunneled hosts and is an
    infrastructure cost, not renderer throughput."""
    import shutil
    import tempfile

    from tinyrenderder_tpu.animation import AnimationConfig, render_animation

    scene = _scene(width, height, meshes=3)
    outdir = tempfile.mkdtemp(prefix="bench_anim_")
    cfg = AnimationConfig(frames=frames, backend="tiled", outdir=outdir,
                          frustum_cull=False, checkpoint=True)
    try:
        summary = render_animation(scene, cfg)
        written = len([f for f in __import__("os").listdir(outdir)
                       if f.endswith(".tga")])
    finally:
        shutil.rmtree(outdir, ignore_errors=True)
    dt = summary["seconds"] / max(summary["frames_rendered"], 1)
    return {"frame_ms": dt * 1e3, "fps": summary["fps"],
            "mpix_s": width * height / dt / 1e6,
            "frames_written": written, "compile_s": 0.0}


def _bounded_backend_probe(tries: int = 6, budget_s: float = 600.0) -> bool:
    """Axon plugin init can HANG (not error) while the device tunnel is
    down — observed outages exceed 4 h (docs/PERFORMANCE.md).  Probe
    backend init in a killable subprocess first so the bench process
    itself can never hang forever: True = init completed.

    Spend is budgeted (round-4 verdict #2: r04 burned 480 s on two
    240 s hangs BEFORE producing any number): short attempts first —
    a healthy init takes ~15-40 s — so a transient degradation is
    re-probed quickly, with the total probe spend capped at
    ``budget_s`` regardless of per-attempt timeouts."""
    import subprocess
    import sys
    deadline = time.time() + budget_s
    for attempt in range(tries):
        left = deadline - time.time()
        if left <= 10:
            log(f"backend probe budget ({budget_s:.0f}s) exhausted")
            return False
        timeout_s = min(90 if attempt < 2 else 240, left)
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print(float(jnp.sum(jnp.ones((8, 8)))))"],
                timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
            log(f"backend probe attempt {attempt + 1}: rc={r.returncode}")
        except subprocess.TimeoutExpired:
            log(f"backend probe attempt {attempt + 1}: init hang "
                f"({timeout_s:.0f}s) — tunnel down?")
        time.sleep(min(30, max(deadline - time.time(), 0)))
    return False


#: Round-3 revalidated medians (Mpix/s) — BENCH_r03.json + the
#: session-6 HEAD revalidation (docs/PERFORMANCE.md).  Each r05 config
#: is judged against these with its own measured dispersion so a delta
#: is labelled signal or noise instead of eyeballed (round-4 verdict #7).
_R03_MPIX = {
    "phong_2048": 288.3, "phong_2048_resample1": 288.3,
    "phong_2048_resample2": 288.3,
    "gouraud_800": 198.4, "gouraud_800_resample1": 198.4,
    "textured_800": 160.2, "textured_800_resample1": 160.2,
    "shadow_phong_800": 49.3, "shadow_phong_800_resample1": 49.3,
    "shadow_phong_800_resample2": 49.3,
    "reference_default_1200x800": 139.3,
    "sponza_scale_246k_1280x800": 56.2,
    "mixed_interior_1280x800": 53.1,
    "phong_2048_sharded_mesh1": 288.6,
    "animation_multimesh_2048": 162.6,     # 25.8 ms/frame render-only
    "animation_tga_writes_2048": 10.2,     # 411.8 ms/frame (D2H-bound)
}


def _vs_r03(name: str, rec: dict) -> None:
    """Annotate a config record with the round-3 delta and whether it
    exceeds the run's own noise: the band is max(3 x MAD-derived
    throughput spread, 8%) — sub-5 ms configs swing ±20-60% with the
    tunnel window (docs/PERFORMANCE.md), so their banding comes from
    the measured per-batch dispersion, not a fixed threshold."""
    r03 = _R03_MPIX.get(name)
    if not r03 or "mpix_s" not in rec:
        return
    now = rec["mpix_s"]
    band_pct = 8.0
    if rec.get("mad_frame_ms") and rec.get("frame_ms"):
        mad_pct = 100.0 * 3.0 * rec["mad_frame_ms"] / rec["frame_ms"]
        band_pct = max(band_pct, mad_pct)
    delta_pct = 100.0 * (now - r03) / r03
    rec["vs_r03"] = {
        "r03_mpix_s": r03, "delta_pct": round(delta_pct, 1),
        "noise_band_pct": round(band_pct, 1),
        "significant": bool(abs(delta_pct) > band_pct),
    }


def _ensure_native() -> None:
    """Best-effort build of native/libtinyrenderder_native.so (gitignored
    — a fresh checkout or VM migration loses it).  The TGA codec falls
    back to Python silently, which is correct but turns the animation
    TGA config's encode from ~21 ms into ~500 ms/frame (measured,
    session 5); build it so the artifact measures the shipped codec."""
    import subprocess
    root = os.path.dirname(os.path.abspath(__file__))
    try:
        r = subprocess.run(["make", "-C", os.path.join(root, "native")],
                           capture_output=True, timeout=120)
        if r.returncode != 0:
            log(f"native build failed (rc={r.returncode}) — Python "
                "codec fallback in effect")
    except (OSError, subprocess.TimeoutExpired) as e:
        log(f"native build skipped ({e}) — Python codec fallback")


def main() -> int:
    _ensure_native()
    if os.environ.get("JAX_PLATFORM_NAME") != "cpu" and \
            not _bounded_backend_probe():
        # record an honest unreachable artifact instead of hanging the
        # round's bench step forever
        report = {"backend": "unreachable",
                  "error": "TPU backend init hung/failed repeatedly "
                           "(axon tunnel down) — no measurement taken"}
        with open("bench_report.json", "w") as f:
            json.dump(report, f, indent=2)
        log("TPU backend unreachable — wrote error report")
        print(json.dumps({
            "metric": "phong_shaded_throughput_tpu_unreachable",
            "value": 0.0, "unit": "Mpix/s", "vs_baseline": 0.0,
        }))
        return 0        # the metric name carries the error; a nonzero
                        # exit could make the driver drop the line

    import jax

    if os.environ.get("JAX_PLATFORM_NAME") == "cpu":
        # env var alone still lets the axon TPU plugin initialize, which
        # can HANG while the tunnel is degraded (docs/PERFORMANCE.md);
        # the config update is the reliable CPU-forcing form
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    if on_tpu:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    big = 2048 if on_tpu else 128
    mid = 800 if on_tpu else 96
    warmup, frames = (3, 10) if on_tpu else (1, 2)
    anim_frames = 120 if on_tpu else 3      # BASELINE config #5 spec
    log(f"backend={backend} devices={len(jax.devices())}")

    report = {"backend": backend, "configs": {}}
    if on_tpu:
        report["tunnel"] = _tunnel_gate()
        log(f"tunnel: rtt {report['tunnel']['rtt_s'] * 1e3:.1f} ms"
            + (" (DEGRADED)" if report["tunnel"]["degraded"] else ""))

    def flush_report():
        # incremental flush after EVERY config (round-4 verdict #2): a
        # driver timeout mid-suite now leaves every completed config's
        # numbers on disk instead of losing the whole round (r04 died
        # with 4 configs measured and zero recorded)
        tmp = "bench_report.json.tmp"
        with open(tmp, "w") as f:
            json.dump(report, f, indent=2)
        os.replace(tmp, "bench_report.json")

    # BENCH_ONLY="phong,shadow" runs only configs whose name contains a
    # listed substring — post-recovery spot checks without the full
    # ~40-min suite (skipped configs return a zero record and are
    # excluded from the report)
    only = [s for s in os.environ.get("BENCH_ONLY", "").split(",") if s]

    def run(name, fn, *a):
        if only and not any(s in name for s in only):
            log(f"  {name}: skipped (BENCH_ONLY)")
            return {"mpix_s": 0.0, "frame_ms": 0.0, "fps": 0.0,
                    "compile_s": 0.0, "skipped": True}
        t0 = time.perf_counter()
        r = fn(*a)
        if on_tpu:
            _vs_r03(name, r)
        report["configs"][name] = r
        log(f"  {name}: {r['frame_ms']:.1f} ms/frame, {r['fps']:.1f} fps, "
            f"{r['mpix_s']:.1f} Mpix/s (compile {r['compile_s']:.0f}s, "
            f"total {time.perf_counter() - t0:.0f}s)")
        flush_report()
        return r

    def print_headline(value, provisional):
        # The headline metric line.  The PROVISIONAL line lands right
        # after the first headline sample so a driver timeout can never
        # again zero the round (r04: rc=124, parsed null); the final
        # line — the suite median — replaces it when the run completes
        # (the driver parses the LAST metric line on stdout).  Under
        # BENCH_ONLY the metric name carries a _partial suffix so a
        # spot-check run can never masquerade as a full-suite number.
        print(json.dumps({
            "metric": f"phong_shaded_throughput_{big}x{big}_{backend}"
                      + ("_partial" if only else "")
                      + ("_provisional" if provisional else ""),
            "value": round(value, 2),
            "unit": "Mpix/s",
            "vs_baseline": round(value / 1000.0, 4),
        }), flush=True)

    resamples = [run(f"phong_{big}", bench_single_pass, "phong", big, big,
                     warmup, frames)]
    live = [r["mpix_s"] for r in resamples if not r.get("skipped")]
    if live:
        report["headline"] = {"provisional_mpix_s": live[0]}
        flush_report()
        print_headline(live[0], provisional=True)
    mid_samples = {
        "gouraud": [run(f"gouraud_{mid}", bench_single_pass, "gouraud",
                        mid, mid, warmup, frames)],
        "textured": [run(f"textured_{mid}", bench_single_pass, "textured",
                         mid, mid, warmup, frames)],
    }
    shadow_samples = [run(f"shadow_phong_{mid}", bench_shadows, mid, mid,
                          max(warmup - 1, 1), max(frames // 2, 1),
                          1024 if on_tpu else 128)]
    run("reference_default_1200x800" if on_tpu else "reference_default_cpu",
        bench_reference_pipeline, 1200 if on_tpu else 120,
        800 if on_tpu else 80, max(warmup - 1, 1), max(frames // 2, 1))
    # resample1 sits MID-suite so the headline median samples the
    # start, middle, and end windows (shared-infra throughput swings
    # on a minutes timescale — docs/PERFORMANCE.md)
    resamples.append(run(f"phong_{big}_resample1", bench_single_pass,
                         "phong", big, big, warmup, frames))
    run("sponza_scale_246k_1280x800" if on_tpu else "sponza_scale_cpu",
        bench_stress, 1280 if on_tpu else 160, 800 if on_tpu else 100,
        max(warmup - 1, 1), max(frames // 2, 1), 3 if on_tpu else 2)
    run("mixed_interior_1280x800" if on_tpu else "mixed_interior_cpu",
        bench_mixed, 1280 if on_tpu else 160, 800 if on_tpu else 96,
        max(warmup - 1, 1), max(frames // 2, 1), 3 if on_tpu else 1)
    run(f"phong_{big}_sharded_mesh1", bench_sharded_mesh1, big, big,
        warmup, frames)
    # the two animation configs are the slowest in the suite (a full
    # warmup orbit + 120 TGA writes) — they run AFTER every per-frame
    # config so a driver timeout eats them last (round-4 verdict #2)
    run(f"animation_multimesh_{big}", bench_animation, big, big, anim_frames)
    run(f"animation_tga_writes_{big}", bench_animation_tga, big, big,
        anim_frames)
    # shared-infrastructure load on the tunneled TPU terminal swings
    # throughput ~2x on a minutes timescale (docs/PERFORMANCE.md): the
    # headline config is sampled at the start, middle and end of the
    # suite; the MEDIAN resample is the headline (typical throughput),
    # the best window is recorded alongside it in the report
    resamples.append(run(f"phong_{big}_resample2", bench_single_pass,
                         "phong", big, big, warmup, frames))
    rates = sorted(r["mpix_s"] for r in resamples if not r.get("skipped"))
    mpix = rates[len(rates) // 2] if rates else 0.0
    if rates:
        report["headline"] = {"median_mpix_s": mpix,
                              "best_mpix_s": rates[-1]}
    # sub-5 ms frames swing far more than the 2048 configs with the
    # same windows (their frame time is comparable to per-dispatch
    # tunnel jitter: observed 3.2-6.4 ms on identical code minutes
    # apart) — resample them once at suite end and record the median
    # and best alongside the first sample
    for name in ("gouraud", "textured"):
        if f"{name}_{mid}" not in report["configs"]:
            continue                       # skipped by BENCH_ONLY
        mid_samples[name].append(run(f"{name}_{mid}_resample1",
                                     bench_single_pass, name, mid, mid,
                                     warmup, frames))
        vals = sorted(round(r["mpix_s"], 1) for r in mid_samples[name])
        report["configs"][f"{name}_{mid}"]["samples_mpix_s"] = vals
        report["configs"][f"{name}_{mid}"]["best_mpix_s"] = vals[-1]
    # shadows swing with the same per-dispatch jitter (13.0-14.7 ms best
    # recorded vs 18+ ms in bad windows) — resample twice and report the
    # median so one degraded window can't set the recorded number
    # (round-4 verdict #5)
    if f"shadow_phong_{mid}" in report["configs"]:
        for i in (2, 3):
            shadow_samples.append(run(f"shadow_phong_{mid}_resample{i - 1}",
                                      bench_shadows, mid, mid,
                                      max(warmup - 1, 1),
                                      max(frames // 2, 1),
                                      1024 if on_tpu else 128))
        svals = sorted(round(r["mpix_s"], 1) for r in shadow_samples)
        report["configs"][f"shadow_phong_{mid}"]["samples_mpix_s"] = svals
        report["configs"][f"shadow_phong_{mid}"]["median_mpix_s"] = \
            svals[len(svals) // 2]
        report["configs"][f"shadow_phong_{mid}"]["best_mpix_s"] = svals[-1]

    # Evidence-based multi-chip projection (this terminal has ONE chip;
    # the 1 Gpix/s BASELINE bar is defined on a v5e-8): per-device XLA
    # cost_analysis of the sharded fused program puts the interleaved
    # row-band layout at 1.44x the 1/N-ideal per-device work at N=8 on
    # this exact workload, i.e. ~69.4% parallel efficiency
    # (scripts/analyze_sharded_cost.py; docs/PERFORMANCE.md round 3),
    # and the mesh(1) sharded config above measures sharding itself as
    # per-chip free.  Recorded as supporting evidence only — the
    # headline metric line stays the measured single-chip number.
    if on_tpu and rates:
        # 0.717: the N=8 per-device compiled-cost ratio vs the 1/N
        # ideal for the SHIPPED headline configuration — 32-row tiles
        # (pick_tile_h at 2048²) + interleaved bands + geom-sharded
        # vertex stage (AB_TILE_H=32 scripts/analyze_sharded_cost.py
        # measured, round 5).  Taller tiles cost multi-chip banding
        # granularity: at th=16 the factor is 0.813 with a ~13% slower
        # single chip — both pairings land within 1% of each other
        # (0.717 x 340.6 ≈ 0.813 x 297), so the projection is robust
        # to the tile-height choice.
        report["projected_v5e8"] = {
            "method": "measured single-chip median x 8 chips x 0.717 "
                      "(N=8 per-device compiled-cost ratio vs ideal at "
                      "the shipped th=32 tiling, interleaved bands + "
                      "geom-sharded vertex stage; th=16 pairing 0.813 x "
                      "its ~13%-slower single-chip lands within 1% — "
                      "scripts/analyze_sharded_cost.py)",
            "mpix_s": round(mpix * 8 * 0.717, 1),
            "vs_1gpix_s_target": round(mpix * 8 * 0.717 / 1000.0, 3),
            "th16_pairing_mpix_s": round(mpix * 0.873 * 8 * 0.813, 1),
        }
    # Live reference-CPU context: time the reference's own compiled hot
    # loop (our_gl.cpp:89-201) on the SAME headline triangle stream,
    # single thread, trivial shader (numbers flatter the reference —
    # the derived speedup is conservative).  Fail-soft: absent
    # reference tree / compiler just skips the block.
    try:
        if not on_tpu or not rates:
            raise RuntimeError("reference context is a TPU-bench artifact")
        import re as _re
        import subprocess as _sp
        script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "scripts", "bench_reference_cpu.py")
        # head = the headline stream; stress/mixed = the 246k-triangle
        # streams at their own bench resolution (round-4 verdict #3:
        # the reference's default workload scale, main.cpp:483-513)
        jobs = [("head", big, big, mpix),
                ("stress", 1280, 800,
                 report["configs"].get("sponza_scale_246k_1280x800",
                                       {}).get("mpix_s")),
                ("mixed", 1280, 800,
                 report["configs"].get("mixed_interior_1280x800",
                                       {}).get("mpix_s"))]
        ref_ctx = {"method": "reference our_gl.cpp compiled -O2, same "
                             "triangle streams, IdShader (cheaper than "
                             "its real Phong) — "
                             "scripts/bench_reference_cpu.py"}
        for stream, w_, h_, ours in jobs:
            p = _sp.run([sys.executable, script, str(w_), str(h_), "3",
                         stream],
                        capture_output=True, text=True, timeout=600)
            m = _re.search(
                r"best\): ([0-9.]+) ms/frame = ([0-9.]+) Mpix/s",
                p.stdout + p.stderr)
            if p.returncode != 0 or not m:
                # a failed child (e.g. g++ missing) must leave a trace,
                # not silently drop the context from the report
                log(f"reference-cpu context ({stream}) skipped: child "
                    f"exit {p.returncode}, match={bool(m)}, stderr "
                    f"tail: {p.stderr.strip()[-300:]}")
                continue
            ref_mpix = float(m.group(2))
            ref_ctx[stream] = {
                "ms_per_frame": float(m.group(1)),
                "mpix_s": ref_mpix,
            }
            if ours:
                ref_ctx[stream]["tpu_speedup_vs_reference_hot_loop"] = \
                    round(ours / ref_mpix, 2)
                log(f"reference CPU hot loop [{stream}]: {ref_mpix:.1f} "
                    f"Mpix/s -> TPU speedup {ours / ref_mpix:.1f}x "
                    "(conservative)")
        if len(ref_ctx) > 1:
            report["reference_cpu"] = ref_ctx
    except Exception as e:                            # noqa: BLE001
        log(f"reference-cpu context skipped: {e}")

    flush_report()
    log("wrote bench_report.json")
    if rates:
        log(f"headline: median {mpix:.1f} Mpix/s, best window "
            f"{rates[-1]:.1f}")
        print_headline(mpix, provisional=False)
    else:
        log("headline configs skipped by BENCH_ONLY — no metric line")
    return 0


if __name__ == "__main__":
    sys.exit(main())
