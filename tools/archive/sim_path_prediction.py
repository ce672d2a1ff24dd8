"""Price hash-based ray-path prediction (PAPERS.md: arXiv 1910.01304).

The idea: cache, per (origin-cell, light) hash bucket, the triangle that
occluded a previous NEE shadow ray, test the predicted triangle first,
and skip BVH traversal for rays it occludes.  Prediction can only ever
remove work for OCCLUDED rays — an unoccluded ray must still walk the
whole structure to prove no hit — and only helps end-to-end if skipped
lanes compact into fewer packet tiles.  This tool measures, on the
cfg4-class hall wave:

1. the occluded fraction F of NEE shadow rays (the hard cap),
2. the fraction a previous-sample prediction table actually verifies
   (same origins, fresh light draws — an OPTIMISTIC stand-in for the
   sample s -> s+1 reuse the renderer could implement), across grid
   resolutions and with/without the light id in the key,
3. the shadow launch's measured share of per-bounce traversal time
   (packet_shadow vs packet_closest on the same chip), which bounds the
   end-to-end win at share x F (perfect prediction, free compaction).

Run: ``python tools/sim_path_prediction.py`` (one chip trace for ground
truth; everything else NumPy).
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

N = 512 * 512
EPS = 1e-3


def _v3(a):
    return V3(*(jnp.asarray(np.ascontiguousarray(a[:, k])) for k in range(3)))


def nee_targets(tabs, rng):
    """Random emissive-triangle surface points, one per lane."""
    ev0 = np.stack([np.asarray(c) for c in (tabs.em_v0.x, tabs.em_v0.y, tabs.em_v0.z)], -1)
    ev1 = np.stack([np.asarray(c) for c in (tabs.em_v1.x, tabs.em_v1.y, tabs.em_v1.z)], -1)
    ev2 = np.stack([np.asarray(c) for c in (tabs.em_v2.x, tabs.em_v2.y, tabs.em_v2.z)], -1)
    ne = ev0.shape[0]
    li = rng.integers(0, ne, N)
    u, v = rng.uniform(size=N), rng.uniform(size=N)
    flip = u + v > 1
    u, v = np.where(flip, 1 - u, u), np.where(flip, 1 - v, v)
    pt = ev0[li] + u[:, None] * (ev1[li] - ev0[li]) + v[:, None] * (ev2[li] - ev0[li])
    return pt.astype(np.float32), li.astype(np.int64), ne


def shadow_rays(po, target):
    d = target - po
    dist = np.linalg.norm(d, axis=-1)
    d = d / np.maximum(dist, 1e-20)[:, None]
    return d.astype(np.float32), dist.astype(np.float32)


def occluders(tabs, po, d, dist):
    """Ground-truth occluding triangle id per lane (-1 if unoccluded)."""
    t_max = dist * (1 - EPS) - 1e-5
    tb, tri, _, _ = pk.packet_closest(
        tabs, _v3(po), _v3(d), t_min=EPS, t_max=jnp.asarray(t_max),
        active=jnp.ones((N,), bool),
    )
    return np.asarray(tri)


def mt_occludes(tabs, po, d, dist, tri):
    """Does triangle ``tri`` occlude each ray (NumPy Moller-Trumbore)?"""
    ti = np.maximum(tri, 0)
    v0 = np.stack([np.asarray(c)[ti] for c in (tabs.v0.x, tabs.v0.y, tabs.v0.z)], -1)
    e1 = np.stack([np.asarray(c)[ti] for c in (tabs.v1.x, tabs.v1.y, tabs.v1.z)], -1) - v0
    e2 = np.stack([np.asarray(c)[ti] for c in (tabs.v2.x, tabs.v2.y, tabs.v2.z)], -1) - v0
    p = np.cross(d, e2)
    det = np.sum(p * e1, -1)
    ok = np.abs(det) > 1e-12
    inv = 1.0 / np.where(ok, det, 1.0)
    tv = po - v0
    u = np.sum(p * tv, -1) * inv
    q = np.cross(tv, e1)
    v = np.sum(q * d, -1) * inv
    t = np.sum(q * e2, -1) * inv
    return (
        ok & (tri >= 0) & (u >= 0) & (v >= 0) & (u + v <= 1)
        & (t > EPS) & (t < dist * (1 - EPS) - 1e-5)
    )


def predict(table_keys, table_vals, query_keys):
    """Vectorised dict lookup: last-write-wins table, -1 on miss."""
    order = np.argsort(table_keys, kind="stable")
    k_sorted, v_sorted = table_keys[order], table_vals[order]
    # last occurrence per key via the reverse trick
    uk_r, first_r = np.unique(k_sorted[::-1], return_index=True)
    last_vals = v_sorted[::-1][first_r]
    pos = np.searchsorted(uk_r, query_keys)
    pos = np.clip(pos, 0, len(uk_r) - 1)
    hit = uk_r[pos] == query_keys
    return np.where(hit, last_vals[pos], -1)


def cell_key(tabs, po, res):
    lo = np.asarray(tabs.bvh.aabb_min[0])
    hi = np.asarray(tabs.bvh.aabb_max[0])
    c = np.clip(((po - lo) / np.maximum(hi - lo, 1e-20) * res), 0, res - 1).astype(np.int64)
    return (c[:, 0] * res + c[:, 1]) * res + c[:, 2]


def main():
    tabs = hall_scene().upload()
    po, _bd = build_wave(N)
    rng = np.random.default_rng(7)

    # two independent NEE draws from the same hit points (sample s, s+1)
    tA, liA, ne = nee_targets(tabs, rng)
    tB, liB, _ = nee_targets(tabs, rng)
    dA, distA = shadow_rays(po, tA)
    dB, distB = shadow_rays(po, tB)
    occA = occluders(tabs, po, dA, distA)
    occB = occluders(tabs, po, dB, distB)
    F = float((occB >= 0).mean())
    print(f"wave {N}: occluded fraction F = {F:.3f} "
          f"(A: {(occA >= 0).mean():.3f}); emissive tris {ne}", flush=True)

    for res in (32, 64, 128):
        for with_light in (True, False):
            kA = cell_key(tabs, po, res)
            kB = kA.copy()
            if with_light:
                kA = kA * ne + liA
                kB = kB * ne + liB
            mA = occA >= 0
            pred = predict(kA[mA], occA[mA].astype(np.int64), kB)
            ver = mt_occludes(tabs, po, dB, distB, pred)
            skip = float(ver.mean())
            print(
                f"grid {res}^3 key={'cell*light' if with_light else 'cell'}:"
                f" pred-exists {float((pred >= 0).mean()):.3f}"
                f" verified(skip) {skip:.3f}"
                f" of occluded {skip / max(F, 1e-9):.3f}",
                flush=True,
            )

    # shadow launch share: packet_shadow vs packet_closest on this wave
    ov, dv = _v3(po), _v3(dB)
    act = jnp.ones((N,), bool)
    t_max = jnp.asarray(distB * (1 - EPS) - 1e-5)

    def timeit(fn):
        r = fn()
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(3):
            r = fn()
            jax.block_until_ready(r)
        return (time.perf_counter() - t0) / 3

    ts = timeit(lambda: pk.packet_shadow(tabs, ov, dv, t_max=t_max, active=act))
    bdv = _v3(_bd)
    tc = timeit(lambda: pk.packet_closest(
        tabs, ov, bdv, t_min=EPS, t_max=1e32, active=act)[1])
    share = ts / (ts + tc + ts)  # bounce = 1 closest + ~2 occlusion launches
    print(
        f"shadow launch {ts*1e3:.1f} ms vs bounce closest {tc*1e3:.1f} ms"
        f" -> occlusion share of traversal ~{2*ts/(2*ts+tc):.2f};"
        f" end-to-end cap = share x F = {2*ts/(2*ts+tc)*F:.3f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
