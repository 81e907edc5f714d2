"""Feasibility probe for the in-place active-block kernel design:

1. out BlockSpec with a DYNAMIC index map (scalar-prefetched tile ids)
2. input_output_aliases so blocks NOT visited by the grid keep the
   input's contents
3. grid smaller than the number of blocks (active-tile compaction)
4. duplicate/padded ids writing a block twice (no-op copies)

Run with no args: interpret mode (CPU). With 'tpu': real Mosaic.
"""
import sys

sys.path.insert(0, ".")
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

interpret = not (len(sys.argv) > 1 and sys.argv[1] == "tpu")
if interpret:
    jax.config.update("jax_platforms", "cpu")

TH, TW = 16, 128
H, W = 4 * TH, 2 * TW          # 8 blocks (4 x 2)
NBX = W // TW


def kernel(ids_ref, add_ref, img_ref, out_ref):
    i = pl.program_id(0)
    t = ids_ref[i]
    val = add_ref[0, 0]
    # merge-style in-place update: read the aliased block, modify, write
    out_ref[:] = img_ref[:] + jnp.float32(1.0) * val + jnp.float32(t)


@functools.partial(jax.jit, static_argnames=("a_cap",))
def run(img, ids, add, a_cap):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(a_cap,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, ids: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TH, TW),
                         lambda i, ids: (ids[i] // NBX, ids[i] % NBX)),
        ],
        out_specs=pl.BlockSpec((TH, TW),
                               lambda i, ids: (ids[i] // NBX, ids[i] % NBX)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        input_output_aliases={2: 0},       # img (3rd arg incl. prefetch) -> out
        interpret=interpret,
    )(ids, jnp.full((1, 1), add, jnp.float32), img)


img = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W) * 0.001
ids = jnp.asarray([1, 3, 3, 6], jnp.int32)   # block 3 visited twice
out = run(img, ids, 10.0, 4)
ref = np.asarray(img).copy()
for t in [1, 3, 6]:
    by, bx = t // NBX, t % NBX
    # visited twice -> applied twice? NO: each visit recomputes from the
    # CURRENT content; block 3 gets +10+3 twice if writes land twice.
    pass
res = np.asarray(out)
delta = res - np.asarray(img)
blocks = {}
for t in range(8):
    by, bx = t // NBX, t % NBX
    d = delta[by * TH:(by + 1) * TH, bx * TW:(bx + 1) * TW]
    blocks[t] = (float(d.min()), float(d.max()))
print("per-block delta (expect 0 for unvisited 0,2,4,5,7; 10+t for visited):")
for t, v in blocks.items():
    print(f"  block {t}: {v}")
ok = (blocks[0] == (0.0, 0.0) and blocks[2] == (0.0, 0.0)
      and blocks[4] == (0.0, 0.0) and blocks[5] == (0.0, 0.0)
      and blocks[7] == (0.0, 0.0)
      and blocks[1] == (11.0, 11.0) and blocks[6] == (16.0, 16.0))
print("double-visit block 3 delta:", blocks[3],
      "(13 = visited-once semantics, 26 = applied twice)")
print("PROBE", "OK" if ok else "FAILED", "| backend:",
      jax.default_backend(), "interpret:", interpret)
