#!/usr/bin/env python
"""Price the tile-windowed treelet walk before building it (round-4).

Question: on the production sorted diffuse bounce wave, how sparse is the
per-tile UNION of exact per-ray treelet entries?  The shared-beam kernel
visits 10,546 nodes/tile (32% of the tree) because the tile's conservative
interval beam is near scene-wide; per-ray slab tests against the treelet
cut are exact.  If a 1024-lane tile's union of entered treelets covers
far fewer nodes than the beam walk visits, a windowed walk (same kernel,
one walk window + tight per-window beam per entered treelet, rays never
move) wins; if the union is still ~a third of the tree, the family is
dead and the round-3 ceiling stands.

Usage: python tools/windowed_stats.py [wave_scale] [treelet_tris ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VKRT_LOG_LEVEL", "ERROR")

import numpy as np  # noqa: E402

from tools.bench_binned_sweep import build_wave  # noqa: E402

RES = 512
TILE = 1024


def slab_entries(po, bd, box, t_lo=1e-4):
    """(n, K) exact entry interval tests + entry t (inf if missed)."""
    inv = 1.0 / np.where(np.abs(bd) < 1e-30, np.where(bd < 0, -1e-30, 1e-30), bd)
    n = po.shape[0]
    kk = box.shape[0]
    te = np.full((n, kk), np.inf, np.float32)
    chunk = max(1, (1 << 24) // kk)
    for i in range(0, n, chunk):
        o, iv = po[i : i + chunk, None, :], inv[i : i + chunk, None, :]
        a = (box[None, :, :3] - o) * iv
        b = (box[None, :, 3:] - o) * iv
        near = np.minimum(a, b).max(-1)
        far = np.maximum(a, b).min(-1)
        ok = (near <= far) & (far >= t_lo)
        te[i : i + chunk] = np.where(ok, np.maximum(near, 0.0), np.inf)
    return te


def main():
    ws = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    tts = [int(x) for x in sys.argv[2:]] or [4096, 8192, 16384]
    n = RES * RES * ws
    po, bd = build_wave(n)
    n_tiles = n // TILE

    from vulkan_raytracer_tpu.scene.procedural import hall_scene

    for tt in tts:
        os.environ["VKRT_TREELET_TRIS"] = str(tt)
        tabs = hall_scene().upload()
        pb = tabs.pbvh
        kk = pb.n_treelets
        box = np.asarray(pb.tl_box)
        lim = np.asarray(pb.tl_lim)  # (8, K, 2)
        tl_nodes = (lim[0, :, 1] - lim[0, :, 0]).astype(np.int64)
        total_nodes = pb.num_nodes

        te = slab_entries(po[: n_tiles * TILE], bd[: n_tiles * TILE], box)
        enters = np.isfinite(te)
        per_ray = enters.sum(1)
        tiles = enters.reshape(n_tiles, TILE, kk)
        union = tiles.any(1)  # (n_tiles, K)
        per_tile = union.sum(1)
        # upper bound: walking every union treelet fully
        visits_ub = (union * tl_nodes[None]).sum(1)
        occ = np.where(union, tiles.sum(1), 0)  # live lanes per window

        print(
            f"treelet_tris {tt}: K={kk}, tree nodes={total_nodes}, "
            f"nodes/treelet mean={tl_nodes.mean():.0f}"
        )
        print(
            f"  per-ray entered treelets: mean {per_ray.mean():.2f} "
            f"p50 {np.percentile(per_ray, 50):.0f} "
            f"p95 {np.percentile(per_ray, 95):.0f}"
        )
        print(
            f"  per-tile union: mean {per_tile.mean():.1f}/{kk} "
            f"p95 {np.percentile(per_tile, 95):.0f} "
            f"(fraction {per_tile.mean() / kk:.2f})"
        )
        print(
            f"  node-visit upper bound/tile: mean {visits_ub.mean():.0f} "
            f"p95 {np.percentile(visits_ub, 95):.0f} "
            f"vs shared-beam measured 10546 "
            f"(x{10546 / max(visits_ub.mean(), 1):.2f} if beam-free)"
        )
        print(
            f"  live lanes per entered window: mean "
            f"{occ.sum() / max(union.sum(), 1):.0f}/1024",
            flush=True,
        )


if __name__ == "__main__":
    main()
