#!/usr/bin/env python
"""Exact walk simulation: shared-beam full-tree sweep vs tile-windowed
treelet walk, on real production-wave tiles.

tools/windowed_stats.py showed the per-tile UNION of exact treelet
entries covers ~38% of the tree (K=64) — walking union treelets FULLY
would be a wash (0.84x) on node visits.  The open question is the
within-treelet walk under TIGHT per-window beams (only the ~172 lanes
that personally enter the treelet shape the interval bounds, not all
1024) with front-to-back window ordering and a running shared t.  This
sim replicates the kernel's conservative interval slab test and exact
leaf Moller-Trumbore on sampled tiles and counts node/leaf visits both
ways, pricing the windowed design with the fitted cost model
(~28 ns/node visit, ~280 ns/leaf visit, DESIGN.md §3) before any kernel
is built.

Usage: python tools/sim_windowed.py [n_tiles_sampled] [treelet_tris]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VKRT_LOG_LEVEL", "ERROR")

import numpy as np  # noqa: E402

TILE = 1024
NODE_NS, LEAF_NS = 28.0, 280.0


def beam_bounds(o, d, live):
    """Kernel's per-tile scalars: origin box + direction reciprocal
    interval per axis (pallas_bvh._tile_beam_bounds semantics)."""
    big = np.float32(1e30)
    lo = np.where(live[:, None], o, big).min(0)
    hi = np.where(live[:, None], o, -big).max(0)
    dlo = np.where(live[:, None], d, big).min(0)
    dhi = np.where(live[:, None], d, -big).max(0)
    uni = (dlo > 0) | (dhi < 0)
    ia = np.where(uni, 1.0 / np.where(dhi == 0, -1e-30, dhi), -big)
    ib = np.where(uni, 1.0 / np.where(dlo == 0, 1e-30, dlo), big)
    return lo, hi, ia, ib


def node_test(bmin, bmax, lo, hi, ia, ib, tmax):
    near = far = None
    for a in range(3):
        c = [
            (bmin[a] - hi[a]) * ia[a], (bmin[a] - hi[a]) * ib[a],
            (bmin[a] - lo[a]) * ia[a], (bmin[a] - lo[a]) * ib[a],
            (bmax[a] - hi[a]) * ia[a], (bmax[a] - hi[a]) * ib[a],
            (bmax[a] - lo[a]) * ia[a], (bmax[a] - lo[a]) * ib[a],
        ]
        n, f = min(c), max(c)
        near = n if near is None else max(near, n)
        far = f if far is None else min(far, f)
    near = max(near, 0.0)
    return near <= far and near <= tmax


def walk(o, d, t, live, start, end, nf, ni, leaves, k, counts):
    """Kernel walk over [start, end): shared scalar cursor, interval beam
    cull, exact MT at leaves tightening per-lane t.  Mutates t, counts."""
    lo, hi, ia, ib = beam_bounds(o, d, live)
    cur = start
    nvis = nlf = 0
    tmax = float(np.where(live, t, -1.0).max())
    since_refresh = 0
    while cur < end:
        nvis += 1
        # per-chunk (1024-node) stale tmax refresh, like the kernel
        if since_refresh >= 1024:
            tmax = float(np.where(live, t, -1.0).max())
            since_refresh = 0
        since_refresh += 1
        bmin = nf[:3, cur]
        bmax = nf[3:, cur]
        fl, miss = int(ni[0, cur]), int(ni[1, cur])
        if not node_test(bmin, bmax, lo, hi, ia, ib, tmax):
            cur = miss
            continue
        if fl >= 0:
            nlf += 1
            tri9 = leaves[:, fl].reshape(k, 9)
            v0, e1, e2 = tri9[:, 0:3], tri9[:, 3:6], tri9[:, 6:9]
            p = np.cross(d[:, None, :], e2[None])
            det = (e1[None] * p).sum(-1)
            bad = np.abs(det) < 1e-12
            inv = 1.0 / np.where(bad, 1.0, det)
            tv = o[:, None, :] - v0[None]
            u = (tv * p).sum(-1) * inv
            q = np.cross(tv, e1[None])
            v = (d[:, None, :] * q).sum(-1) * inv
            tt = (e2[None] * q).sum(-1) * inv
            hit = (~bad & (u >= 0) & (v >= 0) & (u + v <= 1)
                   & (tt > 1e-4) & (tt <= t[:, None]) & live[:, None])
            t[:] = np.where(hit.any(1), np.minimum(t, np.where(hit, tt, np.inf).min(1)), t)
        cur = cur + 1
    counts[0] += nvis
    counts[1] += nlf


def main():
    n_sample = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    tt = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    os.environ["VKRT_TREELET_TRIS"] = str(tt)

    import jax.numpy as jnp

    from tools.bench_binned_sweep import build_wave
    from tools.windowed_stats import slab_entries
    from vulkan_raytracer_tpu.ops import pallas_bvh as pk
    from vulkan_raytracer_tpu.ops.math3 import V3
    from vulkan_raytracer_tpu.scene.procedural import hall_scene

    n = 512 * 512
    po, bd = build_wave(n)
    tabs = hall_scene().upload()
    pb = tabs.pbvh
    kk, k = pb.n_treelets, pb.leaf_size

    # converged per-ray t caps (bench_oracle_t methodology: the best any
    # bounding could supply; zero-effect for the shared beam, so fair)
    ov = V3(*(jnp.asarray(np.ascontiguousarray(po[:, c])) for c in range(3)))
    dv = V3(*(jnp.asarray(np.ascontiguousarray(bd[:, c])) for c in range(3)))
    tb, tri, _, _ = pk.packet_closest(
        tabs, ov, dv, t_min=1e-4, t_max=1e32,
        active=jnp.ones((n,), bool),
    )
    t_cap = np.where(np.asarray(tri) >= 0, np.asarray(tb) * 1.001,
                     np.float32(np.inf)).astype(np.float32)

    nf = np.asarray(pb.nodes_f).reshape(8, 6, -1)  # (8, 6, N)
    ni = np.asarray(pb.nodes_i).reshape(8, 2, -1)
    lv = np.asarray(pb.leaves)  # (8, 9k, Nleaf)
    lim = np.asarray(pb.tl_lim)  # (8, K, 2)
    box = np.asarray(pb.tl_box)
    nn = pb.num_nodes

    te_all = slab_entries(po, bd, box)  # (n, K)
    rng = np.random.default_rng(1)
    tiles = rng.choice(n // TILE, n_sample, replace=False)

    tot_s = np.zeros(2, np.int64)  # shared-beam node/leaf visits
    tot_w = np.zeros(2, np.int64)
    for ti in tiles:
        sl = slice(ti * TILE, (ti + 1) * TILE)
        o, d = po[sl].astype(np.float32), bd[sl].astype(np.float32)
        octv = ((d[:, 0] < 0) * 1 + (d[:, 1] < 0) * 2 + (d[:, 2] < 0) * 4)
        oc = int(np.bincount(octv, minlength=8).argmax())
        te = te_all[sl]  # (TILE, K)

        # --- shared-beam full-tree sweep -------------------------------
        t1 = t_cap[sl].copy()
        walk(o, d, t1, np.ones(TILE, bool), 0, nn,
             nf[oc], ni[oc], lv[oc], k, tot_s)

        # --- windowed: union treelets, entry-t order, tight bounds -----
        t2 = t_cap[sl].copy()
        entered = np.isfinite(te)
        union = np.where(entered.any(0))[0]
        order = union[np.argsort(np.where(entered[:, union], te[:, union],
                                          np.inf).min(0))]
        for kix in order:
            lanes = entered[:, kix]
            entry = float(np.where(lanes, te[:, kix], np.inf).min())
            alive = lanes & (t2 >= entry)
            if not alive.any():
                continue
            s, e = int(lim[oc, kix, 0]), int(lim[oc, kix, 1])
            walk(o, d, t2, alive, s, e, nf[oc], ni[oc], lv[oc], k, tot_w)
        assert np.allclose(t1, t2, rtol=1e-5), "walks disagree on closest t"

    def cost(c):
        return (c[0] * NODE_NS + c[1] * LEAF_NS) / 1e3 / n_sample

    print(f"treelet_tris {tt} (K={kk}), {n_sample} tiles sampled:")
    print(f"  shared beam : {tot_s[0]/n_sample:8.0f} node + "
          f"{tot_s[1]/n_sample:6.0f} leaf visits/tile -> {cost(tot_s):7.1f} us/tile")
    print(f"  windowed    : {tot_w[0]/n_sample:8.0f} node + "
          f"{tot_w[1]/n_sample:6.0f} leaf visits/tile -> {cost(tot_w):7.1f} us/tile")
    print(f"  model speedup x{cost(tot_s)/max(cost(tot_w),1e-9):.2f}")


if __name__ == "__main__":
    main()
