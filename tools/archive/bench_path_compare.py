"""A/B the plain packet sweep vs the treelet-binned walk on one wave.

Builds the same sorted hall bounce wave as bench_binned_sweep and times
``packet_closest`` both ways (VKRT_NO_BINNED toggles which path the
dispatch takes), so the default can be pinned by measurement instead of
hope.  Run: ``python tools/bench_path_compare.py [wave_scale]``.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from vulkan_raytracer_tpu.ops.math3 import V3
from vulkan_raytracer_tpu.ops import pallas_bvh as pk
from vulkan_raytracer_tpu.scene.procedural import hall_scene
from tools.bench_binned_sweep import build_wave


def time_closest(label, tabs, ov, dv, n):
    def run(tables, a, b):
        tb, tri, _, _ = pk.packet_closest(
            tables, a, b, t_min=1e-4, t_max=1e32,
            active=jnp.ones((n,), bool),
        )
        return tb.sum(), (tri >= 0).sum()

    f = jax.jit(run)
    out = f(tabs, ov, dv)
    jax.block_until_ready(out)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(f(tabs, ov, dv))
    dt = (time.perf_counter() - t0) / reps
    print(
        f"{label}: {dt*1e3:8.1f} ms -> {n/dt/1e6:5.2f} Mrays/s | "
        f"hits={int(out[1])}",
        flush=True,
    )


def main():
    ws = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n = 512 * 512 * ws
    print("backend:", jax.default_backend(), "wave", n, flush=True)
    po, bd = build_wave(n)
    ov = V3(*(jnp.asarray(np.ascontiguousarray(po[:, k])) for k in range(3)))
    dv = V3(*(jnp.asarray(np.ascontiguousarray(bd[:, k])) for k in range(3)))

    os.environ["VKRT_NO_BINNED"] = "1"
    tabs = hall_scene().upload()
    time_closest("plain sweep ", tabs, ov, dv, n)
    os.environ.pop("VKRT_NO_BINNED", None)
    tabs = hall_scene().upload()
    time_closest("binned walk ", tabs, ov, dv, n)


if __name__ == "__main__":
    main()
