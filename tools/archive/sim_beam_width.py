"""Beam-width scaling: visit counts vs lanes-per-beam, simulated on host.

The oracle-t experiment (tools/bench_oracle_t.py) proved per-lane t
bounds recover nothing — the packet walk's running max-t already
converges to truth.  What remains is beam WIDTH: a (8,128)-lane tile's
conservative beam is the hull of 1024 sorted-but-diffuse rays.  This
tool walks the real hall BVH per beam of G consecutive sorted lanes
(G = 1024 .. 1) and counts node/leaf visits under the kernel's own
conservative interval slab test, answering: how much useful-work
density does a narrower beam buy, before any kernel is built?

Monotonicity makes the count exact without walking: the beam test is
conservative interval arithmetic, so a beam that passes a node's test
passes every ancestor's (boxes nest), and the per-group visit count is
simply the number of nodes whose test passes with the group's
converged t cap.

Run: ``python tools/sim_beam_width.py [wave_scale]`` (pure NumPy).
"""

import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")

from vulkan_raytracer_tpu.ops.math3 import V3
from vulkan_raytracer_tpu.ops import pallas_bvh as pk
from vulkan_raytracer_tpu.scene.procedural import hall_scene
from tools.bench_binned_sweep import build_wave


def group_stats(o, d, t_true, bmin, bmax, is_leaf, g, max_groups=4096):
    """Per-group conservative-beam visit counts, vectorised over groups."""
    n = o.shape[0]
    ng = n // g
    sel = slice(0, min(ng, max_groups))
    og = o[: ng * g].reshape(ng, g, 3)[sel]
    dg = d[: ng * g].reshape(ng, g, 3)[sel]
    tg = t_true[: ng * g].reshape(ng, g)[sel]
    k = og.shape[0]

    o_lo, o_hi = og.min(1), og.max(1)  # (k, 3)
    # groups are octant-sorted; within a group all direction signs match
    # except possibly at octant boundaries — split handling: use the
    # signed interval of 1/d directly (sign changes make the interval
    # unbounded; clamp to a huge magnitude like the kernel does)
    inv = 1.0 / np.where(np.abs(dg) < 1e-30, np.where(dg < 0, -1e-30, 1e-30), dg)
    i_lo, i_hi = inv.min(1), inv.max(1)
    t_cap = tg.max(1) * 1.001  # converged running max-t (oracle-justified)

    nn = bmin.shape[0]
    visits = np.zeros(k, np.int64)
    leafs = np.zeros(k, np.int64)
    # chunk nodes to bound memory: (k, C, 3) temporaries
    C = 2048
    for s in range(0, nn, C):
        bl = bmin[s : s + C][None]  # (1, C, 3)
        bh = bmax[s : s + C][None]
        a_lo = bl - o_hi[:, None]  # (k, C, 3) smallest (Blo - o)
        a_hi = bl - o_lo[:, None]
        b_lo = bh - o_hi[:, None]
        b_hi = bh - o_lo[:, None]
        il = i_lo[:, None, :]
        ih = i_hi[:, None, :]

        def prods(x_lo, x_hi):
            p1, p2 = x_lo * il, x_lo * ih
            p3, p4 = x_hi * il, x_hi * ih
            return (
                np.minimum(np.minimum(p1, p2), np.minimum(p3, p4)),
                np.maximum(np.maximum(p1, p2), np.maximum(p3, p4)),
            )

        eA_min, eA_max = prods(a_lo, a_hi)  # (Blo - o) * inv interval
        eB_min, eB_max = prods(b_lo, b_hi)  # (Bhi - o) * inv interval
        # per-axis slab interval = [min(entryA, entryB), max(exitA, exitB)]
        ax_lo = np.minimum(eA_min, eB_min)
        ax_hi = np.maximum(eA_max, eB_max)
        t_near = ax_lo.max(-1)  # (k, C)
        t_far = ax_hi.min(-1)
        hit = (t_near <= t_far) & (t_far >= 0.0) & (t_near <= t_cap[:, None])
        visits += hit.sum(1)
        leafs += (hit & is_leaf[None, s : s + C]).sum(1)
    return visits.mean(), leafs.mean(), k


def main():
    ws = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n = 512 * 512 * ws
    po, bd = build_wave(n)
    tabs = hall_scene().upload()
    ov = V3(*(jnp.asarray(np.ascontiguousarray(po[:, k])) for k in range(3)))
    dv = V3(*(jnp.asarray(np.ascontiguousarray(bd[:, k])) for k in range(3)))
    tb, tri, _, _ = pk.packet_closest(
        tabs, ov, dv, t_min=1e-4, t_max=1e32, active=jnp.ones((n,), bool)
    )
    t_true = np.where(np.asarray(tri) >= 0, np.asarray(tb), 1e6).astype(
        np.float64
    )
    bmin = np.asarray(tabs.bvh.aabb_min, np.float64)
    bmax = np.asarray(tabs.bvh.aabb_max, np.float64)
    is_leaf = np.asarray(tabs.bvh.first_tri) >= 0
    nn = bmin.shape[0]
    print(f"wave {n} nodes {nn} leaves {is_leaf.sum()}", flush=True)

    base_v = base_l = None
    for g in (1024, 512, 256, 128, 64, 32, 8, 1):
        v, l, k = group_stats(po.astype(np.float64), bd.astype(np.float64),
                              t_true, bmin, bmax, is_leaf, g)
        if base_v is None:
            base_v, base_l = v, l
        # total work if every group must be walked independently:
        # groups-per-1024-lanes x per-group visits, relative to the tile
        rel = (1024 // g) * v / base_v
        rel_l = (1024 // g) * l / base_l
        print(
            f"G={g:5d}: visits/group {v:8.0f} leafs/group {l:7.0f} "
            f"({k} groups sampled) | total-work x{rel:5.2f} "
            f"leaf-work x{rel_l:5.2f} | per-lane share {v/g:7.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
