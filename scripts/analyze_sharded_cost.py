"""Per-device compiled cost of the sharded fused frame at mesh sizes
1/2/4/8 (round-3 verdict item #9).

No multi-chip hardware exists in this environment, so the next-best
scaling artifact is the XLA cost analysis of the per-device SPMD
program: under shard_map every device executes the same compiled
module, so ``compiled.cost_analysis()`` IS the per-device work.  A
~1/N trend in FLOPs and bytes accessed turns the linear-scaling claim
("8 chips => 8x the single-chip fused throughput") from an assumption
into an auditable number.  Results are recorded in docs/PERFORMANCE.md.

The analysis is COMPILE-ONLY (nothing executes except the tiny
capacity probes), so it runs at the real bench scale: the flagship
2048x2048 normal-mapped Phong pass over the 27k-face procedural head —
the exact headline workload of bench.py.

Expected shape: per-device cost = replicated_geometry + pixel_work/N.
Round-3 originally replicated the per-triangle stage (vertex
transform, setup, span expansion) on every device; the model fit below
measured that term as the ENTIRE residual at 8 devices, so the fused
sharded path now also shards it (geom_shard=True: each device
transforms F/N triangles and all_gathers the setup/varyings over ICI,
bitwise-equal — raster_tiled._vertex_stage).  The geom_shard section
quantifies what that removes.

Run: python scripts/analyze_sharded_cost.py   (forces an 8-device
virtual CPU platform; safe anywhere)
"""

import os
import sys

os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "host_platform_device_count" not in f]
flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(flags)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tinyrenderder_tpu.ops import raster_sparse  # noqa: E402
from tinyrenderder_tpu.ops.raster_tiled import (_build_bins,  # noqa: E402
                                                _quantize_soft, _tile_spans)
from tinyrenderder_tpu.parallel import dist  # noqa: E402

TILE_H, TILE_W = 16, 128


def bench_pass(width, height):
    """The bench.py headline pass: 27k-face bumpy head, Phong."""
    import bench
    attrs, shader, uniforms = bench.build_pass(width, height)
    return ({k: jnp.asarray(v) for k, v in attrs.items()},
            shader, dict(uniforms))


def band_caps(setup, mode, n, width, height, interleave=False):
    """Honest per-band capacities: max over the N bands' pair totals /
    active tiles, quantized exactly like the runtime would after its
    first-frame refinement.  ``interleave`` uses the strided band
    layout (device b owns tile rows b, b+n, ...) — the capacity-shaped
    pre-stage work follows the MAX band, so balanced bands shrink every
    device's capacities."""
    ntx = width // TILE_W
    nty = height // TILE_H
    band_nty = nty // n
    n_tiles_band = ntx * band_nty
    stride = n if interleave else 1

    def clip(b):
        if interleave:
            return dict(ty_lo=b, ty_hi=band_nty - 1, ty_stride=stride)
        return dict(ty_lo=b * band_nty, ty_hi=(b + 1) * band_nty - 1)

    pair_max = act_max = 0
    for b in range(n):
        *_, total = _tile_spans(setup, TILE_W, TILE_H, **clip(b))
        pair_max = max(pair_max, int(jax.device_get(total)))
    cap = _quantize_soft(max(pair_max, 1))
    for b in range(n):
        tx0, ty0, sx, spans, _ = _tile_spans(setup, TILE_W, TILE_H,
                                             **clip(b))
        _, _, counts = _build_bins(tx0, ty0, sx, spans, cap, ntx, band_nty)
        n_act = jnp.sum((counts > 0).astype(jnp.int32))
        act_max = max(act_max, int(jax.device_get(n_act)))
    assert mode == "coarse", "extend band_caps for fine/fine2 modes"
    return (cap, raster_sparse._quantize_active(act_max, n_tiles_band))


def grid_caps(setup, n_rows, n_cols, width, height):
    """Honest per-BLOCK capacities for a ('ty','tx') grid: max over all
    blocks' pair totals / active tiles, quantized like the runtime."""
    ntx = width // TILE_W
    nty = height // TILE_H
    b_ntx = ntx // n_cols
    b_nty = nty // n_rows
    n_tiles_band = b_ntx * b_nty

    def clips():
        for iy in range(n_rows):
            for ix in range(n_cols):
                yield (iy * b_nty, (iy + 1) * b_nty - 1,
                       ix * b_ntx, (ix + 1) * b_ntx - 1)

    pair_max = act_max = 0
    for ty_lo, ty_hi, tx_lo, tx_hi in clips():
        *_, total = _tile_spans(setup, TILE_W, TILE_H, ty_lo, ty_hi,
                                tx_lo, tx_hi)
        pair_max = max(pair_max, int(jax.device_get(total)))
    cap = _quantize_soft(max(pair_max, 1))
    for ty_lo, ty_hi, tx_lo, tx_hi in clips():
        tx0, ty0, sx, spans, _ = _tile_spans(setup, TILE_W, TILE_H,
                                             ty_lo, ty_hi, tx_lo, tx_hi)
        _, _, counts = _build_bins(tx0, ty0, sx, spans, cap, b_ntx, b_nty)
        n_act = jnp.sum((counts > 0).astype(jnp.int32))
        act_max = max(act_max, int(jax.device_get(n_act)))
    return (cap, raster_sparse._quantize_active(act_max, n_tiles_band))


def cost_for_grid(n_rows, n_cols, width=2048, height=2048,
                  geom_shard=False):
    mesh = dist.make_mesh_grid(n_rows, n_cols)
    attrs, s, u = bench_pass(width, height)
    setup, _ = raster_sparse._vertex_setup(attrs, u, s, width, height)
    caps = grid_caps(setup, n_rows, n_cols, width, height)
    plan = ((s, "coarse", caps, False, 0),)
    fn = dist._sharded_fused_fn(mesh, plan, width, height,
                                TILE_H, TILE_W, True, False, geom_shard)
    lowered = fn.lower((attrs,), (u,))
    c = lowered.compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return {"flops": c.get("flops", float("nan")),
            "bytes": c.get("bytes accessed", float("nan")),
            "caps": caps}


def cost_for_mesh(n, width=2048, height=2048, interleave=False,
                  geom_shard=False):
    mesh = dist.make_mesh(n)
    attrs, s, u = bench_pass(width, height)
    setup, _ = raster_sparse._vertex_setup(attrs, u, s, width, height)
    mode = "coarse"                      # CPU analysis host; same HLO shape
    caps = band_caps(setup, mode, n, width, height, interleave)
    plan = ((s, mode, caps, False, 0),)
    fn = dist._sharded_fused_fn(mesh, plan, width, height,
                                TILE_H, TILE_W, True, interleave,
                                geom_shard)
    lowered = fn.lower((attrs,), (u,))
    c = lowered.compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return {"flops": c.get("flops", float("nan")),
            "bytes": c.get("bytes accessed", float("nan")),
            "mode": mode, "caps": caps}


def main():
    for interleave in (False, True):
        label = "interleaved" if interleave else "contiguous"
        print(f"\n==== {label} row bands ====", flush=True)
        rows = []
        base = None
        for n in (1, 2, 4, 8):
            r = cost_for_mesh(n, interleave=interleave)
            if base is None:
                base = r
            rows.append((n, r))
            print(f"mesh({n}): per-device flops={r['flops']:.4e} "
                  f"bytes={r['bytes']:.4e} "
                  f"(vs mesh(1): flops x{r['flops'] / base['flops']:.3f}, "
                  f"bytes x{r['bytes'] / base['bytes']:.3f}) "
                  f"caps={r['caps']}", flush=True)
        print("\n| mesh | per-device GFLOP | per-device GB | vs 1/N ideal |")
        print("|---|---|---|---|")
        for n, r in rows:
            ideal = base["flops"] / n
            print(f"| {n} | {r['flops'] / 1e9:.3f} | "
                  f"{r['bytes'] / 1e9:.3f} | "
                  f"{r['flops'] / ideal:.2f}x |")
        f1, f8 = base["flops"], rows[-1][1]["flops"]
        geom = (8 * f8 - f1) / 7          # solve geom + pix/N model
        pix = f1 - geom
        print(f"\nmodel fit ({label}): replicated-geometry term "
              f"{geom / 1e9:.3f} GFLOP, sharded pixel term "
              f"{pix / 1e9:.3f} GFLOP "
              f"({pix / f1 * 100:.1f}% of mesh(1) work shards)")
        print(f"projected 8-chip parallel efficiency at this workload "
              f"({label}): {f1 / (8 * f8) * 100:.1f}%")

    print("\n==== geometry-sharded vertex stage (interleaved bands) ====",
          flush=True)
    base = None
    rows = []
    for n in (1, 2, 4, 8):
        r = cost_for_mesh(n, interleave=(n > 1), geom_shard=True)
        if base is None:
            base = r
        rows.append((n, r))
        print(f"mesh({n}) geom_shard: per-device flops={r['flops']:.4e} "
              f"bytes={r['bytes']:.4e} "
              f"(vs mesh(1): flops x{r['flops'] / base['flops']:.3f})",
              flush=True)
    print("\n| mesh | per-device GFLOP | per-device GB | vs 1/N ideal |")
    print("|---|---|---|---|")
    for n, r in rows:
        ideal = base["flops"] / n
        print(f"| {n} | {r['flops'] / 1e9:.3f} | "
              f"{r['bytes'] / 1e9:.3f} | "
              f"{r['flops'] / ideal:.2f}x |")
    f1, f8 = base["flops"], rows[-1][1]["flops"]
    print(f"projected 8-chip parallel efficiency (geom-sharded, "
          f"interleaved): {f1 / (8 * f8) * 100:.1f}%")

    print("\n==== 2-D ('ty','tx') screen-block grids ====", flush=True)
    base = cost_for_mesh(1)
    print("| grid | per-device GFLOP | per-device GB | vs 1/N ideal |")
    print("|---|---|---|---|")
    for n_rows, n_cols in ((2, 2), (2, 4), (4, 2)):
        n = n_rows * n_cols
        r = cost_for_grid(n_rows, n_cols)
        ideal = base["flops"] / n
        print(f"| ({n_rows},{n_cols}) | {r['flops'] / 1e9:.3f} | "
              f"{r['bytes'] / 1e9:.3f} | "
              f"{r['flops'] / ideal:.2f}x |  caps={r['caps']}", flush=True)


if __name__ == "__main__":
    main()
