"""Bounce-wavefront sort-key ablation on the real chip.

The packet kernel's big-scene cost is set by how tight each (8, 128)-lane
tile's beam is after the integrator re-sorts bounce wavefronts.  This tool
builds a REALISTIC diffuse bounce wavefront on the cfg4-class hall scene
(primary hits -> cosine hemisphere directions), then times the packet
trace under candidate sort keys, with visit counters.

Run: ``python tools/bench_bounce.py [wave_scale]`` — wave_scale multiplies
the 512x512 pixel wave by batching that many samples per wave (the
sample-batched-waves design question: coherence vs wave size).
"""

import os
import sys
import time
import types

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from vulkan_raytracer_tpu.ops.math3 import V3
from vulkan_raytracer_tpu.ops import pallas_bvh as pk
from vulkan_raytracer_tpu.scene.procedural import hall_scene

RES = 512


def _trace(tables, o, d, stats=False):
    n = o.x.shape[0]
    act = jnp.ones((n,), bool)
    t_bound = jnp.full((n,), 1e32, jnp.float32)
    rays, t_init, _ = pk._prep_rays(o, d, jnp.where(act, t_bound, -1.0))
    t_lo = jnp.full(t_init.shape, 1e-4, jnp.float32)
    bounds, octs = pk._tile_beam_bounds(rays, t_init)
    out = pk._packet_sweep(
        (tables.pbvh.nodes_f, tables.pbvh.nodes_i, tables.pbvh.leaves),
        bounds, octs, pk._full_lims(tables.pbvh, bounds.shape[0]),
        rays, t_lo, t_init,
        int(tables.pbvh.leaf_size), False,
        stats=stats,
    )
    return out


def _time_sorted(tables, o, d, perm, label, binned=False):
    og = V3(*(jnp.take(c, perm) for c in (o.x, o.y, o.z)))
    dg = V3(*(jnp.take(c, perm) for c in (d.x, d.y, d.z)))
    if binned:
        n = o.x.shape[0]
        act = jnp.ones((n,), bool)
        if os.environ.get("VKRT_BINNED_EAGER"):
            # per-round telemetry prints from inside _binned_sweep
            t0 = time.perf_counter()
            pk.packet_closest(tables, og, dg, t_min=1e-4, t_max=1e32,
                              active=act)[0].block_until_ready()
            print(f"{label}: eager total {1e3*(time.perf_counter()-t0):.1f} ms")
            return
        f = jax.jit(
            lambda t, a, b: pk.packet_closest(
                t, a, b, t_min=1e-4, t_max=1e32, active=act
            )[0].sum()
        )
        stat_line = ""
    else:
        # stats pass
        _, _, st = _trace(tables, og, dg, stats=True)
        st = np.asarray(st).reshape(-1, 8, 128)[:, :4, 0]
        tot = st.sum(axis=0)
        t_cnt = st.shape[0]
        stat_line = (
            f" | visits/tile={tot[0]/t_cnt:7.0f} leafs/tile={tot[1]/t_cnt:6.0f}"
        )
        # tables as a jit ARG (a closure would embed the scene as program
        # constants and overflow the axon remote-compile request at scale)
        f = jax.jit(lambda t, a, b: _trace(t, a, b)[0].sum())
    f(tables, og, dg).block_until_ready()
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        f(tables, og, dg).block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    n = o.x.shape[0]
    print(
        f"{label}: {dt*1e3:8.2f} ms -> {n/dt/1e6:6.2f} Mrays/s{stat_line}"
    )


def main():
    wave_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    print("backend:", jax.default_backend(), "wave_scale:", wave_scale)
    t = hall_scene().upload()
    print("tris:", t.num_triangles, "nodes:", t.bvh.num_nodes)

    # primary hits from the cfg4 camera
    n = RES * RES * wave_scale
    rng = np.random.default_rng(0)
    xs = rng.uniform(-1, 1, n).astype(np.float32)
    ys = rng.uniform(-1, 1, n).astype(np.float32)
    s = np.tan(np.deg2rad(50.0) / 2)
    dirs = np.stack([xs * s + 1e-4, ys * s * 0.5625, -np.ones(n, np.float32)], -1)
    # cfg4 camera looks +x from the hall end
    dirs = dirs[:, [2, 1, 0]] * np.array([-1, 1, 1], np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = V3(*(jnp.full((n,), v) for v in (-9.0, 1.8, 0.0)))
    d = V3(*(jnp.asarray(dirs[:, k]) for k in range(3)))
    tb, tri, _, _ = pk.packet_closest(t, o, d, t_min=1e-4, t_max=1e32, active=jnp.ones((n,), bool))
    hit = np.asarray(tri) >= 0
    print(f"primary hit rate {hit.mean():.2%}")

    # bounce origins at hit points, cosine-hemisphere dirs about geo normal
    tbn = np.asarray(tb)
    po = np.stack([np.asarray(c) for c in (o.x, o.y, o.z)], -1) + np.where(
        hit, tbn, 0.0
    )[:, None] * dirs
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
    ob = V3(*(jnp.asarray(po[:, k]) for k in range(3)))
    db = V3(*(jnp.asarray(bd[:, k]) for k in range(3)))

    # ---- sort key variants -------------------------------------------
    root_lo = np.asarray(t.bvh.aabb_min[0])
    root_hi = np.asarray(t.bvh.aabb_max[0])
    scale = 64.0 / np.maximum(root_hi - root_lo, 1e-20)
    cell = np.clip((po - root_lo) * scale, 0, 63).astype(np.uint64).astype(np.uint32)

    def morton(c, bits):
        c = c >> (6 - bits)
        out = np.zeros(n, np.uint32)
        for i in range(bits):
            for k in range(3):
                out |= ((c[:, k] >> i) & 1) << (3 * i + (2 - k))
        return out

    octant = (
        (bd[:, 0] < 0).astype(np.uint32) * 4
        + (bd[:, 1] < 0) * 2
        + (bd[:, 2] < 0)
    ).astype(np.uint32)
    ab = np.abs(bd)
    dom = np.argmax(ab, axis=-1).astype(np.uint32)
    mj = np.take_along_axis(ab, dom[:, None], axis=-1)[:, 0]
    # minor-axis ratios in [0,1) quantised to 2 bits each
    others = np.stack(
        [ab[np.arange(n), (dom + 1) % 3], ab[np.arange(n), (dom + 2) % 3]], -1
    ) / np.maximum(mj, 1e-20)[:, None]
    q = np.clip((others * 4), 0, 3).astype(np.uint32)
    dirfine = (dom << 4) | (q[:, 0] << 2) | q[:, 1]  # 6 bits
    keys = {}

    keys["oct|morton18 (current)"] = (octant << 27) | (morton(cell, 6) << 9)
    keys["oct|morton18|dir6"] = (
        (octant << 27) | (morton(cell, 6) << 9) | (dirfine << 3)
    )
    keys["oct|morton12|dir6"] = (
        (octant << 27) | (morton(cell, 4) << 15) | (dirfine << 9)
    )

    only = os.environ.get("VKRT_BENCH_ONLY", "")
    if only != "binned":
        for label, key in keys.items():
            perm = jnp.asarray(np.argsort(key, kind="stable").astype(np.int32))
            _time_sorted(t, ob, db, perm, f"{label:28s}")

    if only != "sweep":
        # treelet-binned multi-pass walk (the round-3 structural change)
        perm = jnp.asarray(
            np.argsort(keys["oct|morton18 (current)"], kind="stable").astype(np.int32)
        )
        print(f"treelets: {t.pbvh.n_treelets}", flush=True)
        _time_sorted(t, ob, db, perm, f"{'binned treelet walk':28s}", binned=True)


if __name__ == "__main__":
    main()
