#!/usr/bin/env python
"""Hardware A/B: shared-beam sweep vs round-4 tile-windowed treelet walk.

Production workload: the sorted diffuse bounce wave on the 256k-tri hall
(tools/bench_binned_sweep.build_wave).  Cost-model prediction from
tools/sim_windowed.py: x1.50 (9158->6192 node, 4403->2927 leaf
visits/tile).  This measures the real thing end-to-end including the XLA
window-glue price.

Usage: python tools/bench_windowed.py [wave_scale] [treelet_tris ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VKRT_LOG_LEVEL", "ERROR")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.bench_binned_sweep import build_wave  # noqa: E402
from vulkan_raytracer_tpu.ops import pallas_bvh as pk  # noqa: E402
from vulkan_raytracer_tpu.ops.math3 import V3  # noqa: E402
from vulkan_raytracer_tpu.scene.procedural import hall_scene  # noqa: E402


def timed(f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ws = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    tts = [int(x) for x in sys.argv[2:]] or [4096, 2048]
    n = 512 * 512 * ws
    po, bd = build_wave(n)
    ov = V3(*(jnp.asarray(np.ascontiguousarray(po[:, k])) for k in range(3)))
    dv = V3(*(jnp.asarray(np.ascontiguousarray(bd[:, k])) for k in range(3)))
    act = jnp.ones((n,), bool)
    t_lo = jnp.full((n,), 1e-4, jnp.float32)
    t0 = jnp.full((n,), 1e32, jnp.float32)

    for tt in tts:
        os.environ["VKRT_TREELET_TRIS"] = str(tt)
        tabs = hall_scene().upload()
        pb = tabs.pbvh
        print(f"--- treelet_tris {tt}: K={pb.n_treelets} ---", flush=True)

        plain_c = jax.jit(
            lambda o, d: pk._plain_sweep_pb(pb, o, d, t_lo, t0, shadow=False)
        )
        dt_p, (tb_p, slot_p, octs_p) = timed(plain_c, ov, dv)
        tri_p, _ = pk._slot_to_tri(pb, octs_p, slot_p, n)
        print(f"plain    closest: {1e3 * dt_p:8.1f} ms  "
              f"{n / dt_p / 1e6:6.3f} Mrays/s", flush=True)

        win_c = jax.jit(
            lambda o, d: pk._windowed_sweep(pb, o, d, t_lo, t0, shadow=False)
        )
        dt_w, (tb_w, slot_w, octs) = timed(win_c, ov, dv)
        print(f"windowed closest: {1e3 * dt_w:8.1f} ms  "
              f"{n / dt_w / 1e6:6.3f} Mrays/s  (x{dt_p / dt_w:.2f})", flush=True)

        tri_w, found = pk._slot_to_tri(pb, octs, slot_w, n)
        a, b = np.asarray(tri_p), np.asarray(tri_w)
        agree = (a == b).mean()
        hit_eq = ((a >= 0) == (b >= 0)).mean()
        print(f"  agreement: tri {agree:.6f}  hit-mask {hit_eq:.6f}", flush=True)

        # shadow variant on the same wave (NEE-shaped t_max)
        t0s = jnp.full((n,), 1.0, jnp.float32)
        plain_s = jax.jit(
            lambda o, d: pk._plain_sweep_pb(
                pb, o, d, jnp.zeros((n,), jnp.float32), t0s, shadow=True
            )
        )
        dt_ps, out_p = timed(plain_s, ov, dv)
        occ_p = out_p[1] >= 0
        win_s = jax.jit(
            lambda o, d: pk._windowed_sweep(
                pb, o, d, jnp.zeros((n,), jnp.float32), t0s, shadow=True
            )
        )
        dt_ws, out_s = timed(win_s, ov, dv)
        occ_w = out_s[1] >= 0
        print(f"plain    shadow : {1e3 * dt_ps:8.1f} ms; "
              f"windowed {1e3 * dt_ws:8.1f} ms (x{dt_ps / dt_ws:.2f}); "
              f"occ agree {(np.asarray(occ_p) == np.asarray(occ_w)).mean():.6f}",
              flush=True)


if __name__ == "__main__":
    main()
