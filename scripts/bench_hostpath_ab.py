"""In-process A/B of the session-6 host-path caches on real TPU.

Times the reference-default-style 3-pass 1200x800 frame loop (the most
host-dispatch-sensitive bench config) twice in ONE process — caches
enabled (HEAD behavior) vs forcibly defeated every frame — with the
forced-fetch timing discipline (bench._force, RTT-subtracted).  The
same-process interleaved A/B is the only trustworthy comparison through
the tunnel (window swings dwarf sub-ms effects across runs:
docs/PERFORMANCE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_hostpath_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _defeat_caches(scene):
    """Drop every session-6 host cache so the next frame rebuilds all
    host-side state.  NOTE this measures HEAD's cache-MISS path, not the
    literal pre-cache code: a forced miss additionally pays the
    uniforms_token snapshot and eager small-uniform device_puts that the
    pre-1732903 code never did, so the cached-vs-defeated delta slightly
    OVERSTATES the cache win vs the true before state.  The honest
    before/after number is the stubbed host-floor measurement in
    docs/PERFORMANCE.md (1.17 -> 0.41 ms/frame)."""
    from tinyrenderder_tpu import scene as scene_mod
    scene_mod._FRUSTUM_CACHE = None
    scene.__dict__.pop("_cull_cache", None)
    for p in scene.passes:
        p.__dict__.pop("_device_inputs_cache", None)
        p.mesh.__dict__.pop("_world_aabb_cache", None)


def main():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    w, h = (1200, 800) if jax.default_backend() == "tpu" else (240, 160)
    scene = bench._scene(w, h, meshes=3)

    def frame():
        return scene.render(backend="tiled", frustum_cull=True,
                            collect_stats=False, transfer=False,
                            strict_capacity=False).color

    # warm: compiles + capacity refinement
    for _ in range(6):
        bench._force(frame())
    rtt = bench._measure_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", file=sys.stderr)

    N, BATCHES = 40, 4
    results = {"cached": [], "defeated": []}
    for b in range(BATCHES):
        for mode in ("cached", "defeated"):   # interleaved batches
            t0 = time.perf_counter()
            r = None
            for _ in range(N):
                if mode == "defeated":
                    _defeat_caches(scene)
                r = frame()
            bench._force(r)
            dt = (time.perf_counter() - t0 - rtt) / N
            results[mode].append(dt * 1e3)
            print(f"batch {b} {mode}: {dt * 1e3:.2f} ms/frame",
                  file=sys.stderr)
    for mode, xs in results.items():
        print(f"{mode}: median {float(np.median(xs)):.2f} ms/frame "
              f"(batches: {', '.join(f'{x:.2f}' for x in xs)})")


if __name__ == "__main__":
    main()
