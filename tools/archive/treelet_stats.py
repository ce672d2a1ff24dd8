"""Host-side analysis of treelet binning on a realistic bounce wave.

Computes, for the cfg4-class hall bounce wavefront (same construction as
tools/bench_bounce.py): treelets entered per ray, distinct treelets per
1024-lane tile (= binned pass count per tile), and total tile-walks under
candidate lane orderings.  Pure NumPy — runs anywhere, guides the kernel
scheduling without burning TPU time.

Run: ``python tools/treelet_stats.py [wave_scale]``
"""

import os
import sys

import numpy as np

sys.path.insert(0, ".")

from vulkan_raytracer_tpu.scene.procedural import hall_scene

RES = 512
TILE = 1024


def slab_entries(o, d, boxes):
    """(N, K) t_entry or +inf where the ray misses the (dilated) box."""
    inv = 1.0 / np.where(np.abs(d) < 1e-30, np.where(d < 0, -1e-30, 1e-30), d)
    n = o.shape[0]
    K = boxes.shape[0]
    t_entry = np.full((n, K), np.inf, np.float32)
    for k in range(K):
        lo, hi = boxes[k, :3], boxes[k, 3:]
        a = (lo[None] - o) * inv
        b = (hi[None] - o) * inv
        near = np.minimum(a, b).max(axis=1)
        far = np.maximum(a, b).min(axis=1)
        hit = (near <= far) & (far >= 0)
        t_entry[hit, k] = np.maximum(near[hit], 0.0)
    return t_entry


def tile_stats(entered, label):
    n = entered.shape[0]
    nt = n // TILE
    e = entered[: nt * TILE].reshape(nt, TILE, -1)
    distinct = e.any(axis=1).sum(axis=1)  # (T,) distinct treelets per tile
    per_ray = entered.sum(axis=1)
    print(
        f"{label}: treelets/ray mean {per_ray.mean():.2f} p95 "
        f"{np.percentile(per_ray, 95):.0f} | distinct/tile mean "
        f"{distinct.mean():.1f} max {distinct.max()} | total tile-walks "
        f"{distinct.sum()} (tiles={nt})"
    )


def main():
    wave_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    t = hall_scene().upload()
    boxes = np.asarray(t.pbvh.tl_box)
    print(f"tris={t.num_triangles} treelets={boxes.shape[0]}")

    # same wave construction as bench_bounce
    n = RES * RES * wave_scale
    rng = np.random.default_rng(0)
    xs = rng.uniform(-1, 1, n).astype(np.float32)
    ys = rng.uniform(-1, 1, n).astype(np.float32)
    s = np.tan(np.deg2rad(50.0) / 2)
    dirs = np.stack([xs * s + 1e-4, ys * s * 0.5625, -np.ones(n, np.float32)], -1)
    dirs = dirs[:, [2, 1, 0]] * np.array([-1, 1, 1], np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = np.broadcast_to(np.array([-9.0, 1.8, 0.0], np.float32), (n, 3))

    import jax.numpy as jnp
    from vulkan_raytracer_tpu.ops.math3 import V3
    from vulkan_raytracer_tpu.ops import pallas_bvh as pk

    os.environ["VKRT_NO_BINNED"] = "1"
    ov = V3(*(jnp.asarray(np.ascontiguousarray(o[:, k])) for k in range(3)))
    dv = V3(*(jnp.asarray(dirs[:, k]) for k in range(3)))
    tb, tri, _, _ = pk.packet_closest(
        t, ov, dv, t_min=1e-4, t_max=1e32, active=jnp.ones((n,), bool)
    )
    hit = np.asarray(tri) >= 0
    tbn = np.asarray(tb)
    po = o + np.where(hit, tbn, 0.0)[:, None] * dirs
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

    # closest-hit truth for t clamp: rays keep entering treelets until their
    # hit; approximate per-ray t_best as the final hit t (optimistic clamp)
    os.environ.pop("VKRT_NO_BINNED", None)
    t_entry = slab_entries(po, bd, boxes)
    entered = np.isfinite(t_entry)

    # current sort: (octant, morton18 of origin)
    root_lo = np.asarray(t.bvh.aabb_min[0])
    root_hi = np.asarray(t.bvh.aabb_max[0])
    scale = 64.0 / np.maximum(root_hi - root_lo, 1e-20)
    cell = np.clip((po - root_lo) * scale, 0, 63).astype(np.uint32)

    def morton(c, bits=6):
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
    mkey = morton(cell)
    key_cur = (octant << 27) | (mkey << 9)
    ord_cur = np.argsort(key_cur, kind="stable")
    tile_stats(entered[ord_cur], "oct|morton18 (current)  ")

    # first (nearest) treelet of each ray
    first = np.argmin(np.where(entered, t_entry, np.inf), axis=1).astype(np.uint32)
    first = np.where(entered.any(axis=1), first, boxes.shape[0])

    key_tl = (first.astype(np.uint64) << 32) | key_cur.astype(np.uint64)
    ord_tl = np.argsort(key_tl, kind="stable")
    tile_stats(entered[ord_tl], "first-treelet|oct|morton")

    key_tlo = (
        (octant.astype(np.uint64) << 40)
        | (first.astype(np.uint64) << 32)
        | mkey.astype(np.uint64)
    )
    ord_tlo = np.argsort(key_tlo, kind="stable")
    tile_stats(entered[ord_tlo], "oct|first-treelet|morton")


if __name__ == "__main__":
    main()
