"""Measure the packet kernel's fixed per-program cost.

Launches _packet_sweep over N lanes with per-tile walk windows of zero
length (lim = [0, 0)) so every program does nothing but its prologue:
block DMAs, scratch init, SMEM table reads, output writes.  The slope of
time vs program count is the per-program floor that bounds how finely the
binned walk can partition work.

Run: ``python tools/bench_program_overhead.py``
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from vulkan_raytracer_tpu.ops import pallas_bvh as pk
from vulkan_raytracer_tpu.scene.procedural import hall_scene


def main():
    print("backend:", jax.default_backend(), flush=True)
    t = hall_scene().upload()
    pb = t.pbvh

    for n_tiles in (128, 512, 1088):
        n = n_tiles * pk._TILE
        rng = np.random.default_rng(0)
        o = rng.uniform(-5, 5, (3, n)).astype(np.float32)
        d = rng.normal(size=(3, n)).astype(np.float32)
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        rays = tuple(
            jnp.asarray(x.reshape(-1, pk._TILE_L))
            for x in (o[0], o[1], o[2], d[0], d[1], d[2])
        )
        t_init = jnp.full((n // pk._TILE_L, pk._TILE_L), 1e32, jnp.float32)
        t_lo = jnp.zeros_like(t_init)
        bounds = jnp.zeros((n_tiles, 12), jnp.float32)
        octs = jnp.zeros((n_tiles, 1), jnp.int32)

        for label, lims in (
            ("skip  ", jnp.zeros((n_tiles, 2), jnp.int32)),
            ("1chunk", jnp.broadcast_to(
                jnp.asarray([[0, 1]], jnp.int32), (n_tiles, 2))),
        ):
            f = jax.jit(
                lambda lm, r=rays, b=bounds, oc=octs, tl=t_lo, ti=t_init:
                pk._packet_sweep(
                    (pb.nodes_f, pb.nodes_i, pb.leaves), b, oc, lm, r, tl,
                    ti, int(pb.leaf_size), False,
                )[0].sum()
            )
            f(lims).block_until_ready()
            reps = 10
            t0 = time.perf_counter()
            for _ in range(reps):
                f(lims).block_until_ready()
            dt = (time.perf_counter() - t0) / reps
            print(
                f"{label} tiles={n_tiles:5d}: {dt*1e3:7.2f} ms "
                f"({dt/n_tiles*1e6:6.1f} us/program)",
                flush=True,
            )


if __name__ == "__main__":
    main()
