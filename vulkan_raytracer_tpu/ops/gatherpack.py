"""Size-gated row-gather packing (round 5).

A packed (R, K) axis-0 row gather costs the same as ONE element gather
on TPU and is flat in K up to 32 — measured at R = 262144 with random
indices (tools/bench_gather_pack.py: 28 element gathers 220 ms vs one
(R, 32) row gather 28 ms at 512k lanes).  That measurement covers LARGE
tables only; small-table row gathers are gated back to per-column
element gathers until validated on hardware (the full-bench run that
followed the unconditional pack showed small-table configs slowing
while the large-table config improved, with a device-tunnel outage
confounding the numbers — the gate makes the small-table path identical
to the previously measured code either way).

Both paths return the same values in the same arithmetic order, so
callers are bit-identical regardless of which side the gate picks.
"""

from __future__ import annotations

import jax.numpy as jnp

#: minimum table rows for the packed row gather (below this the
#: per-column element gathers are the measured-known path)
PACK_MIN_ROWS = 4096


def packed_gather(cols, idx):
    """Gather ``[c[idx] for c in cols]`` — one (R, K) row gather when the
    table is large enough, K element gathers otherwise.

    Args:
      cols: sequence of (R,) arrays (same R; dtypes may mix — the packed
        side stacks as f32 and exactly recovers bool/int32-as-float
        values only when they are representable; callers pass f32/bool).
      idx: (N,) int32 row indices.

    Returns: list of (N,) arrays, one per column, dtype preserved.
    """
    r = cols[0].shape[0]
    if r >= PACK_MIN_ROWS:
        packed = jnp.stack(
            [c.astype(jnp.float32) for c in cols], axis=1
        )  # trace-time, loop-invariant -> hoisted by XLA
        g = jnp.take(packed, idx, axis=0)
        return [
            g[:, k].astype(c.dtype) if g.dtype != c.dtype else g[:, k]
            for k, c in enumerate(cols)
        ]
    return [jnp.take(c, idx, axis=0) for c in cols]
