#!/usr/bin/env python
"""Row-gather vs element-gather on TPU (round 5).

eval_hit + winner_uv spend ~46 ms per 512k-lane band-bounce on ~28
separate 1-D element gathers (normals, tangents, winner vertices).  If a
single row gather from a packed (Nt, 32) f32 table lowers efficiently,
one gather replaces them all.  DESIGN.md §3 pinned 2-index (H, W, 3)
gathers at 336x slower — this measures the (N, K) axis-0 take family.

Usage: python tools/bench_gather_pack.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_vkrt_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    nt = 1 << 18  # 262k triangles
    n = 1 << 19  # 512k lanes
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, nt, n).astype(np.int32))
    cols = [jnp.asarray(rng.random(nt).astype(np.float32)) for _ in range(28)]
    for k in (4, 8, 16, 32):
        packed = jnp.asarray(rng.random((nt, k)).astype(np.float32))

        def row(i, p=packed):
            return jnp.sum(jnp.take(p, i, axis=0))

        f = jax.jit(row)
        jax.block_until_ready(f(idx))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(idx))
            best = min(best, time.perf_counter() - t0)
        print(f"row gather (Nt, {k:2d}): {1e3 * best:8.2f} ms", flush=True)

    for m in (1, 9, 28):
        def elems(i, m=m):
            return sum(jnp.sum(jnp.take(c, i, axis=0)) for c in cols[:m])

        f = jax.jit(elems)
        jax.block_until_ready(f(idx))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(idx))
            best = min(best, time.perf_counter() - t0)
        print(f"{m:2d} element gathers:  {1e3 * best:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
