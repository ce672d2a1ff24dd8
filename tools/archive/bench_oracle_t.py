"""Oracle-t ceiling: the packet sweep with PERFECT per-lane t bounds.

Any t-bounding scheme (ladders, proxy prepasses, tighter running max-t)
can at best hand the walk t_max = the true hit t per lane.  This tool
measures that exact upper bound on the production sorted hall bounce
wave: trace once for truth, re-trace with t_max = t_true*(1+1e-3).
The gap between baseline and oracle is ALL that t-bounding can ever
recover; the oracle time itself is the beam-geometry floor (origin
spread x direction spread of a sorted tile, independent of t).

Also reports the same for a coarse SUBSET prepass (largest-area K
triangles, a real implementable bound: subset hit t >= true t).

Run: ``python tools/bench_oracle_t.py [wave_scale]``.
"""

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


def timed(label, f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    n = args[1].x.shape[0]
    print(f"{label}: {dt*1e3:8.1f} ms -> {n/dt/1e6:5.2f} Mrays/s", flush=True)
    return out


def main():
    ws = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n = 512 * 512 * ws
    print("backend:", jax.default_backend(), "wave", n, flush=True)
    po, bd = build_wave(n)
    ov = V3(*(jnp.asarray(np.ascontiguousarray(po[:, k])) for k in range(3)))
    dv = V3(*(jnp.asarray(np.ascontiguousarray(bd[:, k])) for k in range(3)))
    tabs = hall_scene().upload()
    act = jnp.ones((n,), bool)

    base = jax.jit(
        lambda t, a, b: pk.packet_closest(
            t, a, b, t_min=1e-4, t_max=1e32, active=act
        )
    )
    out = timed("baseline full sweep  ", base, tabs, ov, dv)
    t_true = np.asarray(out[0])
    tri = np.asarray(out[1])
    hit = tri >= 0
    # misses keep an unbounded cap (they must still prove no hit exists)
    t_cap = np.where(hit & np.isfinite(t_true), t_true * 1.001, 1e32)
    t_cap_j = jnp.asarray(t_cap.astype(np.float32))

    oracle = jax.jit(
        lambda t, a, b, cap: pk.packet_closest(
            t, a, b, t_min=1e-4, t_max=cap, active=act
        )
    )
    out2 = timed("oracle per-lane t_max", oracle, tabs, ov, dv, t_cap_j)
    same = np.array_equal(np.asarray(out2[1]), tri)
    print(f"  oracle result matches: {same}", flush=True)

    # oracle with miss lanes ALSO capped (how much do the 0.03% misses
    # cost via their unbounded beams?)
    t_cap2 = jnp.asarray(
        np.where(hit & np.isfinite(t_true), t_true * 1.001, 0.0).astype(
            np.float32
        )
    )
    timed("oracle, misses dead   ", oracle, tabs, ov, dv, t_cap2)

    # implementable bound: largest-area subset prepass
    v0 = np.stack([np.asarray(c) for c in (tabs.v0.x, tabs.v0.y, tabs.v0.z)], -1)
    v1 = np.stack([np.asarray(c) for c in (tabs.v1.x, tabs.v1.y, tabs.v1.z)], -1)
    v2 = np.stack([np.asarray(c) for c in (tabs.v2.x, tabs.v2.y, tabs.v2.z)], -1)
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)
    for k in (256, 1024):
        top = np.argsort(-area)[:k]
        tsub = t_true.copy()
        # brute-force numpy subset trace (host, excluded from timing)
        o = po.astype(np.float64)
        d = bd.astype(np.float64)
        tbest = np.full(n, 1e32)
        for i in top:
            e1 = (v1[i] - v0[i]).astype(np.float64)
            e2 = (v2[i] - v0[i]).astype(np.float64)
            pv = np.cross(d, e2)
            det = pv @ e1
            inv = np.where(np.abs(det) < 1e-12, 0.0, 1.0 / np.where(det == 0, 1, det))
            tv = o - v0[i]
            u = np.sum(tv * pv, -1) * inv
            qv = np.cross(tv, e1)
            v = np.sum(d * qv, -1) * inv
            t = (qv @ e2) * inv
            ok = (inv != 0) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
            tbest = np.where(ok & (t < tbest), t, tbest)
        frac = (tbest < 1e31).mean()
        cap = np.where(tbest < 1e31, tbest * 1.001, 1e32).astype(np.float32)
        print(f"subset k={k}: bounded {frac:.1%} of lanes", flush=True)
        timed(f"subset-{k} capped walk", oracle, tabs, ov, dv, jnp.asarray(cap))


if __name__ == "__main__":
    main()
