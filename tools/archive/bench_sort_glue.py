"""Price the wavefront sort/permute glue on-chip.

Every bounce of the big-scene path pays TWO coherence sorts (material
wave in `_sort_wavefront`, occlusion wave in `_shadow`), each of which
is one uint32 argsort plus ~16 independent (N,) permute-gathers (and the
occlusion one a scatter-back of 2).  This tool measures, at the cfg4
wave size, the candidate implementations of "permute K lane arrays":

  a. argsort(key) + K separate 1-D `take`s            (shipped today)
  b. argsort(key) + ONE (N, K) row-gather of a packed u32 matrix
     (bitcast pack -> take(axis=0) -> unpack)
  c. variadic `lax.sort` with K payload operands (no argsort at all)
  d. argsort(key) + K separate scatters (`.at[perm].set`) — the
     inverse-permute direction, for the scatter-back sites

Run on the chip: ``python tools/bench_sort_glue.py [N] [K]``.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 960 * 540
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    cols = [jnp.asarray(rng.uniform(size=N).astype(np.float32)) for _ in range(K)]

    @jax.jit
    def argsort_only(key):
        return jnp.argsort(key)

    @jax.jit
    def separate(key, *cols):
        perm = jnp.argsort(key)
        return [jnp.take(c, perm, axis=0) for c in cols]

    @jax.jit
    def packed(key, *cols):
        perm = jnp.argsort(key)
        m = jnp.stack([c.view(jnp.uint32) for c in cols], axis=1)  # (N, K)
        g = jnp.take(m, perm, axis=0)
        return [g[:, i].view(jnp.float32) for i in range(len(cols))]

    @jax.jit
    def variadic(key, *cols):
        out = jax.lax.sort((key,) + cols, dimension=0, num_keys=1)
        return out[1:]

    @jax.jit
    def scatters(key, *cols):
        perm = jnp.argsort(key)
        return [jnp.zeros_like(c).at[perm].set(c) for c in cols]

    t_sort = timeit(argsort_only, key)
    t_a = timeit(separate, key, *cols)
    t_b = timeit(packed, key, *cols)
    t_c = timeit(variadic, key, *cols)
    t_d = timeit(scatters, key, *cols)
    print(f"N={N} K={K}  (times per call)")
    print(f"argsort alone          {t_sort*1e3:8.3f} ms")
    print(f"a. argsort + {K} takes   {t_a*1e3:8.3f} ms  (gather glue {1e3*(t_a-t_sort):.3f})")
    print(f"b. argsort + packed    {t_b*1e3:8.3f} ms  (gather glue {1e3*(t_b-t_sort):.3f})")
    print(f"c. variadic lax.sort   {t_c*1e3:8.3f} ms")
    print(f"d. argsort + {K} scatters{t_d*1e3:8.3f} ms")

    # sanity: identical results
    ra = separate(key, *cols)
    rb = packed(key, *cols)
    rc = variadic(key, *cols)
    for x, y in zip(ra, rb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # variadic sort is stable on equal keys only with unique keys; random
    # u32 keys at N<<2^32 are unique with overwhelming probability
    for x, y in zip(ra, rc):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    print("results identical across impls")


if __name__ == "__main__":
    main()
