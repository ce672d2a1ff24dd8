"""Wide-BVH arity + quantized-AABB closure: visit counts, simulated on host.

Closes the two remaining structural-traversal proposals from the round-2
verdict that tools/sim_beam_width.py (sub-tile beams) did not cover:

(a) **Arity-k nodes.**  In the threaded skip-pointer walk
    (ops/pallas_bvh.py: pass -> cur+1, fail/leaf -> miss), the nodes the
    cursor lands on are exactly the *children of passed interior nodes*
    (plus the root): a passed node falls through to its first child and
    the sibling chain is reached via miss pointers regardless of each
    sibling's own outcome.  Collapsing two binary levels into one
    arity-4 node halves the passed-interior count but quadruples the
    children per pass — the landed-on count is invariant up to leaf
    promotion.  What arity actually buys is fewer *loop iterations*
    (k box tests share one cursor update/branch), i.e. only the fixed
    per-visit overhead, on a node phase that is ~17% of tile time
    (docs/DESIGN.md S3 cost model: 10.5k visits x 28ns vs 5.2k leaf
    visits x 280ns).  This tool measures the landed-on counts exactly.

(b) **Quantized (u8/u16) child AABBs.**  Quantizing each node's box to
    the parent-box grid (floor min / ceil max, conservative) shrinks
    node-stream DMA bytes 4x/2x — but node-chunk DMA is already hidden
    (prefetch double-buffering measured neutral, DESIGN.md S3), so the
    only effect that can reach the clock is the *inflated* boxes passing
    the beam test more often: extra 28ns node visits and, much worse,
    extra 280ns leaf intersections.  This tool measures both inflations.

Counting is exact without walking (beam-test monotonicity: boxes nest,
so child passes => parent passes; see tools/sim_beam_width.py).

Run: ``python tools/sim_bvh_arity.py [wave_scale]`` (t_true via one
device trace; counting pure NumPy).
"""

import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")

from vulkan_raytracer_tpu.ops.math3 import V3
from vulkan_raytracer_tpu.ops import pallas_bvh as pk
from vulkan_raytracer_tpu.scene.procedural import hall_scene
from tools.bench_binned_sweep import build_wave

G = 1024  # production tile width (8 x 128 lanes)
MAX_GROUPS = 512


def node_pass_matrix(o, d, t_true, bmin, bmax):
    """(k_groups, Nn) bool: does group g's conservative beam pass node n."""
    n = o.shape[0]
    ng = min(n // G, MAX_GROUPS)
    og = o[: ng * G].reshape(-1, G, 3)[:ng]
    dg = d[: ng * G].reshape(-1, G, 3)[:ng]
    tg = t_true[: ng * G].reshape(-1, G)[:ng]

    o_lo, o_hi = og.min(1), og.max(1)
    inv = 1.0 / np.where(np.abs(dg) < 1e-30, np.where(dg < 0, -1e-30, 1e-30), dg)
    i_lo, i_hi = inv.min(1), inv.max(1)
    t_cap = tg.max(1) * 1.001  # converged running max-t (oracle-justified)

    nn = bmin.shape[0]
    out = np.zeros((ng, nn), bool)
    C = 2048
    for s in range(0, nn, C):
        bl = bmin[s : s + C][None]
        bh = bmax[s : s + C][None]
        il, ih = i_lo[:, None, :], i_hi[:, None, :]

        def prods(x_lo, x_hi):
            p1, p2 = x_lo * il, x_lo * ih
            p3, p4 = x_hi * il, x_hi * ih
            return (
                np.minimum(np.minimum(p1, p2), np.minimum(p3, p4)),
                np.maximum(np.maximum(p1, p2), np.maximum(p3, p4)),
            )

        eA = prods(bl - o_hi[:, None], bl - o_lo[:, None])
        eB = prods(bh - o_hi[:, None], bh - o_lo[:, None])
        t_near = np.minimum(eA[0], eB[0]).max(-1)
        t_far = np.maximum(eA[1], eB[1]).min(-1)
        out[:, s : s + C] = (
            (t_near <= t_far) & (t_far >= 0.0) & (t_near <= t_cap[:, None])
        )
    return out


def tree_arrays(first_tri, miss):
    """parent[], and per-node (left, right) for interiors, from preorder."""
    nn = first_tri.shape[0]
    parent = np.full(nn, -1, np.int64)
    interior = np.nonzero(first_tri < 0)[0]
    left = interior + 1
    right = miss[left]
    parent[left] = interior
    parent[right[right < nn]] = interior[right < nn]
    return parent, interior, left, right


def collapse(first_tri, left_of, right_of, k):
    """Arity-k collapse: kept-node list + children-per-kept-interior.

    Returns (kept_interior_ids, n_children[kept]) where children are the
    binary descendants log2(k) levels down (leaves promote early).  Kept
    nodes keep their binary boxes, so the pass matrix applies unchanged.
    """
    levels = int(np.log2(k))
    is_leaf = first_tri >= 0
    kept, nchild = [], []
    stack = [0]
    while stack:
        n = stack.pop()
        if is_leaf[n]:
            continue
        frontier = [n]
        for _ in range(levels):
            nxt = []
            for f in frontier:
                if is_leaf[f]:
                    nxt.append(f)  # promoted leaf stays a direct child
                else:
                    nxt.extend((left_of[f], right_of[f]))
            frontier = nxt
        kept.append(n)
        nchild.append(len(frontier))
        stack.extend(f for f in frontier if not is_leaf[f])
    return np.asarray(kept), np.asarray(nchild)


def quantize(bmin, bmax, parent, bits):
    """Conservative parent-grid quantization of every non-root box."""
    qmax = float(2**bits - 1)
    pmin = bmin[np.maximum(parent, 0)]
    pext = np.maximum(bmax[np.maximum(parent, 0)] - pmin, 1e-30)
    lo = np.floor((bmin - pmin) / pext * qmax) / qmax
    hi = np.ceil((bmax - pmin) / pext * qmax) / qmax
    qmin = np.where(parent[:, None] >= 0, pmin + lo * pext, bmin)
    qmax_ = np.where(parent[:, None] >= 0, pmin + hi * pext, bmax)
    return np.minimum(qmin, bmin), np.maximum(qmax_, bmax)


def left_right_maps(first_tri, interior, left, right):
    lmap = np.zeros(first_tri.shape[0], np.int64)
    rmap = np.zeros(first_tri.shape[0], np.int64)
    lmap[interior], rmap[interior] = left, right
    return lmap, rmap


def main():
    ws = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n = 512 * 512 * ws
    po, bd = build_wave(n)
    tabs = hall_scene().upload()
    ov = V3(*(jnp.asarray(np.ascontiguousarray(po[:, c])) for c in range(3)))
    dv = V3(*(jnp.asarray(np.ascontiguousarray(bd[:, c])) for c in range(3)))
    tb, tri, _, _ = pk.packet_closest(
        tabs, ov, dv, t_min=1e-4, t_max=1e32, active=jnp.ones((n,), bool)
    )
    t_true = np.where(np.asarray(tri) >= 0, np.asarray(tb), 1e6).astype(np.float64)

    first = np.asarray(tabs.bvh.first_tri)
    miss = np.asarray(tabs.bvh.miss)
    bmin = np.asarray(tabs.bvh.aabb_min, np.float64)
    bmax = np.asarray(tabs.bvh.aabb_max, np.float64)
    parent, interior, left, right = tree_arrays(first, miss)
    lmap, rmap = left_right_maps(first, interior, left, right)
    is_leaf = first >= 0
    print(f"wave {n} nodes {len(first)} leaves {is_leaf.sum()}", flush=True)

    o = po.astype(np.float64)
    d = bd.astype(np.float64)
    P = node_pass_matrix(o, d, t_true, bmin, bmax)  # exact boxes
    ng = P.shape[0]

    # --- (a) arity: landed-on node visits + leaf intersections ----------
    pass_int = P[:, interior]  # (ng, Ni)
    v2 = 1 + 2 * pass_int.sum(1)
    leaf_hits = P[:, is_leaf].sum(1)  # 280ns leaf visits, arity-invariant
    print(
        f"arity 2: visits/tile {v2.mean():8.0f}  leaf-isect/tile "
        f"{leaf_hits.mean():7.0f}  ({ng} tiles)",
        flush=True,
    )
    for k in (4, 8):
        kept, nchild = collapse(first, lmap, rmap, k)
        vk = 1 + (P[:, kept] * nchild[None]).sum(1)
        print(
            f"arity {k}: visits/tile {vk.mean():8.0f}  (x{vk.mean()/v2.mean():.3f} "
            f"of binary; kept interiors {len(kept)}, mean children "
            f"{nchild.mean():.2f})",
            flush=True,
        )

    # --- (b) quantization: inflated-box visit/leaf growth ---------------
    for bits in (16, 8):
        qlo, qhi = quantize(bmin, bmax, parent, bits)
        Q = node_pass_matrix(o, d, t_true, qlo, qhi)
        vq = 1 + 2 * Q[:, interior].sum(1)
        lq = Q[:, is_leaf].sum(1)
        print(
            f"u{bits} boxes: visits/tile {vq.mean():8.0f} "
            f"(x{vq.mean()/v2.mean():.3f})  leaf-isect/tile {lq.mean():7.0f} "
            f"(x{lq.mean()/leaf_hits.mean():.3f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
