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

# AB_TILE_H=32 re-derives the per-device cost model at the 32-row
# tiling pick_tile_h ships on >= 2 MPx frames (round 5)
TILE_H = int(os.environ.get("AB_TILE_H", "16"))
TILE_W = 128


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


#: v5e ICI one-way bandwidth per link, bytes/s (public "How to Scale
#: Your Model" hardware table: 4.5e10 B/s each direction per link; a
#: v5e-8 is a 2x4 slice whose ring all_gather can use both directions
#: and both axes — modeling ONE direction of ONE link makes the comm
#: time an upper bound and the projection conservative).
V5E_ICI_ONEWAY_BPS = 4.5e10
#: measured single-chip headline frame time (phong_2048 median,
#: docs/PERFORMANCE.md round-3 revalidation: 14.3 ms = 288.3 Mpix/s)
T1_MS = 14.3


def gathered_bytes(width=2048, height=2048):
    """Exact all_gather payload of the geometry-sharded vertex stage:
    the setup dict + varying planes for the headline pass, computed
    from eval_shape (nothing executes)."""
    attrs, s, u = bench_pass(width, height)
    setup, vary = jax.eval_shape(
        lambda a, uu: raster_sparse._vertex_setup(a, uu, s, width, height),
        attrs, u)
    leaves = jax.tree.leaves((setup, vary))
    total = sum(int(np.prod(x.shape)) * x.dtype.itemsize for x in leaves)
    return total, [(x.shape, str(x.dtype)) for x in leaves]


def hlo_allgather_bytes(n=8, width=2048, height=2048):
    """Cross-check: sum the output bytes of every all-gather op in the
    compiled per-device SPMD module (geom_shard layout)."""
    import re
    mesh = dist.make_mesh(n)
    attrs, s, u = bench_pass(width, height)
    setup, _ = raster_sparse._vertex_setup(attrs, u, s, width, height)
    caps = band_caps(setup, "coarse", n, width, height, True)
    plan = ((s, "coarse", caps, False, 0),)
    fn = dist._sharded_fused_fn(mesh, plan, width, height,
                                TILE_H, TILE_W, True, True, True)
    txt = fn.lower((attrs,), (u,)).compile().as_text()
    dt_bytes = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "f64": 8,
                "s64": 8, "u64": 8, "bf16": 2, "f16": 2, "s8": 1,
                "u8": 1, "s16": 2, "u16": 2}
    total = 0
    ops = 0
    for m in re.finditer(
            r"= (\w+)\[([\d,]*)\][^ ]* all-gather", txt):
        ops += 1
        shape = [int(x) for x in m.group(2).split(",") if x]
        total += int(np.prod(shape) if shape else 1) * dt_bytes[m.group(1)]
    return total, ops


def band_imbalance(n=8, width=2048, height=2048, interleave=True):
    """Measured per-band work split: pair totals per device band."""
    attrs, s, u = bench_pass(width, height)
    setup, _ = raster_sparse._vertex_setup(attrs, u, s, width, height)
    nty = height // TILE_H
    band_nty = nty // n
    totals = []
    for b in range(n):
        if interleave:
            clip = dict(ty_lo=b, ty_hi=band_nty - 1, ty_stride=n)
        else:
            clip = dict(ty_lo=b * band_nty, ty_hi=(b + 1) * band_nty - 1)
        *_, total = _tile_spans(setup, TILE_W, TILE_H, **clip)
        totals.append(int(jax.device_get(total)))
    return totals


def comm_model():
    """Communication-inclusive 8-chip projection (round-4 verdict #4).

    Model (stated): per-device time = T1 x (f8/f1) for compute (time
    taken proportional to compiled per-device FLOPs — the same
    assumption the FLOPs-only projection made, now stated) PLUS the
    geometry all_gather at one-way single-link v5e ICI bandwidth (a
    ring all_gather moves (N-1)/N of the payload through each link;
    using one direction of one link upper-bounds the time on the 2x4
    v5e-8 torus).  The per-pixel stages are collective-free by
    construction (each device owns its screen band); the only other
    off-chip traffic is the final frame D2H, which the animation path
    already overlaps and every bench config excludes."""
    n = 8
    width = height = 2048
    print("\n==== communication-inclusive 8-chip projection ====",
          flush=True)
    b_setup, leaves = gathered_bytes(width, height)
    b_hlo, ops = hlo_allgather_bytes(n, width, height)
    print(f"all_gather payload (setup leaves, eval_shape): "
          f"{b_setup / 1e6:.2f} MB/frame over {len(leaves)} arrays")
    print(f"all_gather output bytes in compiled HLO ({ops} ops, setup + "
          f"varyings — the authoritative payload): "
          f"{b_hlo / 1e6:.2f} MB/frame")
    b_gather = b_hlo if ops else b_setup
    t_comm_ms = b_gather * (n - 1) / n / V5E_ICI_ONEWAY_BPS * 1e3
    print(f"ring all_gather time at v5e ICI one-way "
          f"{V5E_ICI_ONEWAY_BPS / 1e9:.0f} GB/s: {t_comm_ms:.3f} ms "
          f"({(n - 1) / n * b_gather / 1e6:.2f} MB through each link)")

    tot = band_imbalance(n, width, height, interleave=True)
    tot_c = band_imbalance(n, width, height, interleave=False)
    print(f"per-band pair totals (interleaved): {tot} "
          f"(max/mean {max(tot) / (sum(tot) / n):.3f})")
    print(f"per-band pair totals (contiguous):  {tot_c} "
          f"(max/mean {max(tot_c) / (sum(tot_c) / n):.3f})")

    f1 = cost_for_mesh(1)["flops"]
    f8 = cost_for_mesh(n, interleave=True, geom_shard=True)["flops"]
    t_compute_ms = T1_MS * f8 / f1
    t8 = t_compute_ms + t_comm_ms
    gpix = width * height / (t8 * 1e-3) / 1e9
    eff = T1_MS / (n * t8)
    print(f"\n| stage | per-device cost | time model |")
    print(f"|---|---|---|")
    print(f"| compute (geom-sharded, interleaved bands) | "
          f"{f8 / 1e9:.3f} GFLOP = {f8 / f1:.4f} x f1 | "
          f"{t_compute_ms:.2f} ms |")
    print(f"| geometry all_gather over ICI | "
          f"{(n - 1) / n * b_gather / 1e6:.2f} MB/link | "
          f"{t_comm_ms:.3f} ms |")
    print(f"| total | | {t8:.2f} ms |")
    print(f"projected v5e-8: {gpix:.2f} Gpix/s at {width}x{height} "
          f"(parallel efficiency {eff * 100:.1f}%, "
          f"T1 = {T1_MS} ms measured median)")


def cost_for_mesh_measured(n, width=2048, height=2048, geom_shard=False):
    """Per-device compiled cost under the MEASURED-LOAD band layout
    (round-5): honest caps = max over the measured bands, static band
    shape = the largest band's rows."""
    mesh = dist.make_mesh(n)
    attrs, s, u = bench_pass(width, height)
    passes = [(attrs, s, u, False)]
    costs = dist.measure_tile_row_costs(passes, width, height)
    bands = dist.balance_bands(costs, n)
    band_cap = max(r for _, r in bands)
    ntx = width // TILE_W
    n_tiles_band = ntx * band_cap
    setup, _ = raster_sparse._vertex_setup(attrs, u, s, width, height)
    pair_max = act_max = 0
    for lo, rows in bands:
        if rows == 0:
            continue
        *_, total = _tile_spans(setup, TILE_W, TILE_H, ty_lo=lo,
                                ty_hi=lo + rows - 1)
        pair_max = max(pair_max, int(jax.device_get(total)))
    cap = _quantize_soft(max(pair_max, 1))
    for lo, rows in bands:
        if rows == 0:
            continue
        tx0, ty0, sx, spans, _ = _tile_spans(setup, TILE_W, TILE_H,
                                             ty_lo=lo,
                                             ty_hi=lo + rows - 1)
        _, _, counts = _build_bins(tx0, ty0, sx, spans, cap, ntx,
                                   band_cap)
        n_act = jnp.sum((counts > 0).astype(jnp.int32))
        act_max = max(act_max, int(jax.device_get(n_act)))
    caps = (cap, raster_sparse._quantize_active(act_max, n_tiles_band))
    plan = ((s, "coarse", caps, False, 0),)
    fn = dist._sharded_fused_fn(mesh, plan, width, height, TILE_H,
                                TILE_W, True, False, geom_shard,
                                band_cap=band_cap)
    lo_arr = jnp.asarray([lo for lo, _ in bands], jnp.int32)
    rows_arr = jnp.asarray([r for _, r in bands], jnp.int32)
    lowered = fn.lower((attrs,), (u,), lo_arr, rows_arr)
    c = lowered.compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return {"flops": c.get("flops", float("nan")),
            "bytes": c.get("bytes accessed", float("nan")),
            "caps": caps, "bands": bands}


def measured_vs_interleave(n=8, width=2048, height=2048):
    """Round-5: per-device compiled cost of the measured-band layout
    vs the shipped interleave at n devices (both geom-sharded)."""
    print(f"\n==== measured bands vs interleave at mesh({n}) ====",
          flush=True)
    f1 = cost_for_mesh(1)["flops"]
    ri = cost_for_mesh(n, interleave=True, geom_shard=True)
    rm = cost_for_mesh_measured(n, width, height, geom_shard=True)
    for label, r in (("interleave", ri), ("measured", rm)):
        ideal = f1 / n
        print(f"{label}: per-device flops={r['flops']:.4e} "
              f"({r['flops'] / ideal:.3f}x the 1/N ideal), "
              f"caps={r['caps']}", flush=True)
    print(f"measured bands: {rm['bands']}")
    print(f"projected {n}-chip parallel efficiency: interleave "
          f"{f1 / (n * ri['flops']) * 100:.1f}% -> measured "
          f"{f1 / (n * rm['flops']) * 100:.1f}%")


def measured_nondivisible(n=8, width=1280, height=800):
    """Round-5: per-device compiled cost of the measured-band fused
    path on a frame whose 50 tile rows do NOT divide by 8 — the
    stress/mixed bench geometry, where even/interleaved layouts are
    illegal and the only pre-round-5 option was the non-fused scan
    fallback (O(F x band pixels) per device)."""
    print(f"\n==== measured bands on the NON-divisible frame "
          f"{width}x{height} at mesh({n}) ====", flush=True)
    f1 = cost_for_mesh(1, width, height)["flops"]
    rm = cost_for_mesh_measured(n, width, height, geom_shard=True)
    ideal = f1 / n
    print(f"mesh(1) fused: {f1:.4e} flops; mesh({n}) measured-bands "
          f"per-device: {rm['flops']:.4e} ({rm['flops'] / ideal:.3f}x "
          f"the 1/N ideal), caps={rm['caps']}")
    print(f"measured bands: {rm['bands']}")
    print(f"projected {n}-chip parallel efficiency (fused, measured "
          f"bands): {f1 / (n * rm['flops']) * 100:.1f}% — the layout "
          f"that makes the fused path legal here at all")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "measured":
        measured_vs_interleave()
        measured_nondivisible()
        return
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

    comm_model()


if __name__ == "__main__":
    main()
