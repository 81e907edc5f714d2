"""Throughput vs frame size on the flagship single-pass config.

The headline bench (bench.py) pins 2048² because BASELINE.md defines its
target there; this sweep measures how shaded-pixel throughput SCALES
with resolution on one chip.  The cost structure predicts Mpix/s should
RISE with frame size: the per-triangle pre-stage (~3.9 ms at the
headline — vertex/setup/binning over the fixed 27k-face stream) is
resolution-independent, while the kernel/phase-C/untile stages scale
with pixels at their measured per-index floors (docs/PERFORMANCE.md).
A falling curve would instead indicate a pixel-stage scaling bug
(capacity mis-sizing, tile-grid pathology) — so this doubles as a
scaling regression probe, and as end-to-end evidence that frames larger
than the reference ever renders (up to 4096²) work through the full
production pipeline.

Widths must be multiples of 128 (the Pallas lane tile); heights of 16.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site \
            python scripts/bench_resolution_sweep.py [sizes...]
        (default sizes: 1024 1536 2048 3072 4096; runs on the default
        backend — meaningful numbers need the TPU)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import bench  # noqa: E402


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [1024, 1536, 2048, 3072, 4096]
    for s in sizes:
        if s % 128:
            raise SystemExit(f"size {s} not a multiple of 128")

    import jax
    if os.environ.get("JAX_PLATFORM_NAME") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        gate = bench._tunnel_gate()
        bench.log(f"tunnel rtt {gate['rtt_s'] * 1e3:.1f} ms"
                  + (" (DEGRADED — numbers unreliable)"
                     if gate["degraded"] else ""))
    else:
        bench.log("WARNING: not on TPU — timing is not meaningful")
        sizes = [s for s in sizes if s <= 512] or [128]

    results = {}
    for s in sizes:
        # keep per-batch wall time roughly constant: ~fixed pixel budget
        frames = max(3, min(12, int(12 * (2048 / s) ** 2)))
        t0 = time.perf_counter()
        r = bench.bench_single_pass("phong", s, s, warmup=2, frames=frames)
        results[f"{s}x{s}"] = r
        bench.log(f"  {s}x{s}: {r['frame_ms']:.1f} ms/frame = "
                  f"{r['mpix_s']:.1f} Mpix/s "
                  f"(frames/batch {frames}, compile {r['compile_s']:.0f}s, "
                  f"total {time.perf_counter() - t0:.0f}s)")

    print(json.dumps({"backend": jax.default_backend(),
                      "sweep": {k: {"mpix_s": round(v["mpix_s"], 1),
                                    "frame_ms": round(v["frame_ms"], 2),
                                    "rtt_ms": v["rtt_ms"]}
                                for k, v in results.items()}}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
