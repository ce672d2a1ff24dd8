"""Parameter sweep for the pair-expansion binned walk on the real chip.

Times the jitted binned closest-hit trace over (TREELET_TRIS, C) configs
on the hall bounce wave; the scaling pattern separates the cost drivers
(kernel treelet walks ~ pairs x treelet size; per-round glue ~ rounds;
per-tile overhead ~ total tiles).

Run: ``python tools/bench_binned_sweep.py [wave_scale] [cfg ...]`` where
cfg = TREELET_TRIS:C, default sweep ``4096:4 4096:8 8192:4 16384:4``.
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

RES = 512


def build_wave(n):
    """Bounce wave (numpy) via a single-sweep primary trace."""
    os.environ["VKRT_NO_BINNED"] = "1"
    t = hall_scene().upload()
    rng = np.random.default_rng(0)
    xs = rng.uniform(-1, 1, n).astype(np.float32)
    ys = rng.uniform(-1, 1, n).astype(np.float32)
    s = np.tan(np.deg2rad(50.0) / 2)
    dirs = np.stack([xs * s + 1e-4, ys * s * 0.5625, -np.ones(n, np.float32)], -1)
    dirs = dirs[:, [2, 1, 0]] * np.array([-1, 1, 1], np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = np.broadcast_to(np.array([-9.0, 1.8, 0.0], np.float32), (n, 3)).copy()
    ov = V3(*(jnp.asarray(np.ascontiguousarray(o[:, k])) for k in range(3)))
    dv = V3(*(jnp.asarray(dirs[:, k]) for k in range(3)))
    tb, tri, _, _ = pk.packet_closest(
        t, ov, dv, t_min=1e-4, t_max=1e32, active=jnp.ones((n,), bool)
    )
    os.environ.pop("VKRT_NO_BINNED", None)
    hit = np.asarray(tri) >= 0
    po = o + np.where(hit, np.asarray(tb), 0.0)[:, None] * dirs
    ti = np.maximum(np.asarray(tri), 0)
    v0 = np.stack([np.asarray(c)[ti] for c in (t.v0.x, t.v0.y, t.v0.z)], -1)
    v1 = np.stack([np.asarray(c)[ti] for c in (t.v1.x, t.v1.y, t.v1.z)], -1)
    v2 = np.stack([np.asarray(c)[ti] for c in (t.v2.x, t.v2.y, t.v2.z)], -1)
    nrm = np.cross(v1 - v0, v2 - v0)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
    nrm = np.where((np.sum(nrm * dirs, -1) > 0)[:, None], -nrm, nrm)
    u1, u2 = rng.uniform(size=n), rng.uniform(size=n)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    tang = np.cross(nrm, np.array([0.577, 0.577, 0.577]))
    tang /= np.maximum(np.linalg.norm(tang, axis=-1, keepdims=True), 1e-20)
    bitang = np.cross(nrm, tang)
    bd = (
        (r * np.cos(phi))[:, None] * tang
        + (r * np.sin(phi))[:, None] * bitang
        + np.sqrt(np.maximum(1 - u1, 0.0))[:, None] * nrm
    ).astype(np.float32)
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True)
    po = np.where(hit[:, None], po, 0.0).astype(np.float32)
    root_lo = np.asarray(t.bvh.aabb_min[0])
    root_hi = np.asarray(t.bvh.aabb_max[0])
    scale = 64.0 / np.maximum(root_hi - root_lo, 1e-20)
    cell = np.clip((po - root_lo) * scale, 0, 63).astype(np.uint32)
    m = np.zeros(n, np.uint32)
    for i in range(6):
        for k in range(3):
            m |= ((cell[:, k] >> i) & 1) << (3 * i + (2 - k))
    octant = ((bd[:, 0] < 0) * 4 + (bd[:, 1] < 0) * 2 + (bd[:, 2] < 0)).astype(
        np.uint32
    )
    order = np.argsort((octant << 27) | (m << 9), kind="stable")
    return po[order], bd[order]


def main():
    ws = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cfgs = sys.argv[2:] or ["4096:4", "4096:8", "8192:4", "16384:4"]
    n = RES * RES * ws
    print("backend:", jax.default_backend(), "wave", n, flush=True)
    po, bd = build_wave(n)
    ov = V3(*(jnp.asarray(np.ascontiguousarray(po[:, k])) for k in range(3)))
    dv = V3(*(jnp.asarray(np.ascontiguousarray(bd[:, k])) for k in range(3)))
    act = jnp.ones((n,), bool)
    t_lo = jnp.full((n,), 1e-4, jnp.float32)

    for cfg in cfgs:
        tt, cc = (int(x) for x in cfg.split(":"))
        os.environ["VKRT_TREELET_TRIS"] = str(tt)
        os.environ["VKRT_PAIRS_PER_ROUND"] = str(cc)
        tabs = hall_scene().upload()
        kk = tabs.pbvh.n_treelets

        stats_on = bool(os.environ.get("VKRT_BINNED_STATS"))

        def run(tables, a, b):
            t0 = jnp.where(act, jnp.full((n,), 1e32, jnp.float32), -1.0)
            out = pk._binned_sweep(tables.pbvh, a, b, t_lo, t0, shadow=False)
            r = (out[0].sum(), (out[1] >= 0).sum(), out[2])
            return r + ((out[3],) if stats_on else ())

        f = jax.jit(run)
        out = f(tabs, ov, dv)
        jax.block_until_ready(out)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(tabs, ov, dv)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        msg = (
            f"tt={tt:6d} C={cc} K={kk:3d}: {dt*1e3:8.1f} ms -> "
            f"{n/dt/1e6:5.2f} Mrays/s | rounds={int(out[2])} "
            f"hits={int(out[1])}"
        )
        if stats_on:
            st = np.asarray(out[3])
            msg += (
                f" | visits={st[0]} leafs={st[1]} nodeDMA={st[2]} "
                f"leafDMA={st[3]}"
            )
        print(msg, flush=True)


if __name__ == "__main__":
    main()
