#!/usr/bin/env python
"""A/B the packed row gather vs the old per-column element gathers on the
scenes where the full bench regressed (cornell / dragon / chess) and on
the one where it improved (hall) — both implementations inline so no git
gymnastics are needed.

Usage: python tools/bench_pack_ab.py [scene] [n_exp]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VKRT_LOG_LEVEL", "ERROR")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_vkrt_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np  # noqa: E402


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    n = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 19)

    import jax
    import jax.numpy as jnp

    from vulkan_raytracer_tpu.ops.math3 import V3

    if scene == "cornell":
        from vulkan_raytracer_tpu.scene.builtin import cornell_box_scene
        t = cornell_box_scene().upload()
    elif scene == "dragon":
        from vulkan_raytracer_tpu.scene.procedural import dragon_scene
        t = dragon_scene().upload()
    else:
        from vulkan_raytracer_tpu.scene.procedural import hall_scene
        t = hall_scene().upload()

    nt = t.v0.x.shape[0]
    rng = np.random.default_rng(0)
    ti = jnp.asarray(rng.integers(0, nt, n).astype(np.int32))
    u = jnp.asarray(rng.random(n).astype(np.float32)) * 0.5
    v = jnp.asarray(rng.random(n).astype(np.float32)) * 0.5
    w0 = 1.0 - u - v

    def packed(ti):
        tp = jnp.stack(
            [
                t.n0.x, t.n0.y, t.n0.z, t.n1.x, t.n1.y, t.n1.z,
                t.n2.x, t.n2.y, t.n2.z, t.tg0.x, t.tg0.y, t.tg0.z,
                t.tg1.x, t.tg1.y, t.tg1.z, t.tg2.x, t.tg2.y, t.tg2.z,
                t.tg_sign,
            ],
            axis=1,
        )
        g = jnp.take(tp, ti, axis=0)
        return sum(jnp.sum(g[:, k] * (w0 if k % 3 == 0 else u))
                   for k in range(19))

    def elementwise(ti):
        cols = [
            t.n0.x, t.n0.y, t.n0.z, t.n1.x, t.n1.y, t.n1.z,
            t.n2.x, t.n2.y, t.n2.z, t.tg0.x, t.tg0.y, t.tg0.z,
            t.tg1.x, t.tg1.y, t.tg1.z, t.tg2.x, t.tg2.y, t.tg2.z,
            t.tg_sign,
        ]
        return sum(jnp.sum(jnp.take(c, ti, axis=0) * (w0 if k % 3 == 0 else u))
                   for k, c in enumerate(cols))

    for name, fn in (("packed", packed), ("element", elementwise)):
        f = jax.jit(fn)
        jax.block_until_ready(f(ti))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(ti))
            best = min(best, time.perf_counter() - t0)
        print(f"{scene:8s} T={nt:7d} n={n}: {name:8s} {1e3 * best:9.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
