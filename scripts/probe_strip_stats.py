"""Sizing probe for the Pallas strip-compacted shade stage (round-4
verdict #1): what fraction of active-tile pixels survive won-STRIP
(16x16) compaction on the bench scenes?

Phase C's texture-gather count currently equals active-tile pixels
(a_cap x tile_px).  A strip-granularity won-skip would shade only
(won strips x strip_px).  This probe computes, per bench pass, from an
oracle/CPU winner map:

  active tiles, covered pixels, won strips, and the ratio
  won_strip_px / active_tile_px  ==  the phase-C gather scale factor.

Runs on CPU (JAX_PLATFORM_NAME=cpu) — pure coverage structure, no
timing.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

TILE_H, TILE_W, STRIP_W = 16, 128, 16


def strip_stats(winner, tile_h=TILE_H, tile_w=TILE_W, strip_w=STRIP_W,
                pass_ids=None):
    """winner: (H, W) int; >=0 means some pass won the pixel.  pass_ids:
    restrict 'won' to these winner values (per-pass analysis)."""
    H, W = winner.shape
    nty, ntx = H // tile_h, W // tile_w
    won = winner >= 0 if pass_ids is None else np.isin(winner, pass_ids)
    t = won.reshape(nty, tile_h, ntx, tile_w).transpose(0, 2, 1, 3)
    active = t.any(axis=(2, 3)).sum()                 # tiles with a win
    s = t.reshape(nty, ntx, tile_h, tile_w // strip_w, strip_w)
    strips = s.any(axis=(2, 4))                       # (nty, ntx, nstrips)
    won_strips = strips.sum()
    n_strips = tile_w // strip_w
    return {
        "covered_px": int(won.sum()),
        "active_tiles": int(active),
        "active_px": int(active) * tile_h * tile_w,
        "won_strips": int(won_strips),
        "won_strip_px": int(won_strips) * tile_h * strip_w,
        "total_strips": nty * ntx * n_strips,
    }


def report(name, winner, pass_ids=None):
    st = strip_stats(winner, pass_ids=pass_ids)
    ratio = st["won_strip_px"] / max(st["active_px"], 1)
    cov = st["covered_px"] / max(st["won_strip_px"], 1)
    print(f"{name}: active_tiles={st['active_tiles']} "
          f"active_px={st['active_px']} won_strips={st['won_strips']} "
          f"strip_px={st['won_strip_px']} covered_px={st['covered_px']}")
    print(f"  gather scale strip/active = {ratio:.3f} "
          f"(covered/strip {cov:.3f})")
    return ratio


def main():
    W = H = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    from bench import _scene, build_pass
    from tinyrenderder_tpu.scene import Scene

    # headline: single phong pass
    attrs, shader, uniforms = build_pass(W, H)
    # render through the xla backend on CPU (exact winner map)
    from tinyrenderder_tpu.ops import raster
    import jax.numpy as jnp
    fb = raster.new_framebuffers(W, H)
    fb, *_ = raster.render_pass_xla(fb, {k: jnp.asarray(v) for k, v in
                                         attrs.items()},
                                    shader, uniforms)
    winner = np.asarray(fb.winner)
    report(f"phong_{W} (single pass)", winner)

    # orbit scene: 3 passes, per-pass won strips
    from tinyrenderder_tpu.scene import _pass_inputs
    scene = _scene(W, H, meshes=3)
    fb = raster.new_framebuffers(W, H)
    offsets = []
    off = 0
    for p in scene.passes:
        a, u = _pass_inputs(scene, p, np.float32, device=True)
        fb, *_ = raster.render_pass_xla(fb, a, p.shader, u,
                                        winner_offset=off)
        offsets.append((p.name, off, p.mesh.nfaces))
        off += p.mesh.nfaces
    winner = np.asarray(fb.winner)
    tot_active = tot_strip = 0
    for name, off, n in offsets:
        st = strip_stats(winner, pass_ids=np.arange(off, off + n))
        tot_active += st["active_px"]
        tot_strip += st["won_strip_px"]
        print(f"orbit pass '{name}': active_px={st['active_px']} "
              f"won_strip_px={st['won_strip_px']} "
              f"scale={st['won_strip_px']/max(st['active_px'],1):.3f}")
    print(f"orbit total: strip/active = {tot_strip/max(tot_active,1):.3f}")


if __name__ == "__main__":
    main()
