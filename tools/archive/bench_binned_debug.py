"""Eager per-pass timing of the binned treelet walk + gather microbench.

Replicates ops.pallas_bvh._binned_sweep as an eager python loop with
block_until_ready timers per phase, on the hall bounce wave, to locate
the per-pass overhead.  Also microbenches flat gather/scatter at pair
scale to price a pair-expansion design.

Run: ``python tools/bench_binned_debug.py [wave_scale]``
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

RES = 512


def bounce_wave(t, n, rng):
    xs = rng.uniform(-1, 1, n).astype(np.float32)
    ys = rng.uniform(-1, 1, n).astype(np.float32)
    s = np.tan(np.deg2rad(50.0) / 2)
    dirs = np.stack([xs * s + 1e-4, ys * s * 0.5625, -np.ones(n, np.float32)], -1)
    dirs = dirs[:, [2, 1, 0]] * np.array([-1, 1, 1], np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = np.broadcast_to(np.array([-9.0, 1.8, 0.0], np.float32), (n, 3)).copy()
    import os

    os.environ["VKRT_NO_BINNED"] = "1"
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
    # sort by current bounce key
    root_lo = np.asarray(t.bvh.aabb_min[0])
    root_hi = np.asarray(t.bvh.aabb_max[0])
    scale = 64.0 / np.maximum(root_hi - root_lo, 1e-20)
    cell = np.clip((po - root_lo) * scale, 0, 63).astype(np.uint32)
    m = np.zeros(n, np.uint32)
    for i in range(6):
        for k in range(3):
            m |= ((cell[:, k] >> i) & 1) << (3 * i + (2 - k))
    octant = ((bd[:, 0] < 0) * 4 + (bd[:, 1] < 0) * 2 + (bd[:, 2] < 0)).astype(np.uint32)
    order = np.argsort((octant << 27) | (m << 9), kind="stable")
    po, bd = po[order], bd[order]
    return (
        V3(*(jnp.asarray(np.ascontiguousarray(po[:, k])) for k in range(3))),
        V3(*(jnp.asarray(np.ascontiguousarray(bd[:, k])) for k in range(3))),
    )


def eager_binned(pb, o, d, n):
    """_binned_sweep unrolled eagerly with timers."""
    kk = int(pb.n_treelets)
    nw = (kk + 31) // 32
    t_lo_l = jnp.full((n,), 1e-4, jnp.float32)
    t_init0 = jnp.full((n,), 1e32, jnp.float32)
    rays, t_pad0, _ = pk._prep_rays(o, d, t_init0)
    pshape = t_pad0.shape
    t_lo_p = jnp.pad(t_lo_l, (0, t_pad0.size - n)).reshape(pshape)
    n_tiles = t_pad0.size // pk._TILE
    box = pb.tl_box

    @jax.jit
    def phase_a(done, t_best):
        ivx, ivy, ivz = (pk._inv_comp(c) for c in (d.x, d.y, d.z))

        def step(k, c):
            bt, bk = c
            row = jax.lax.dynamic_slice_in_dim(box, k, 1, 0)[0]
            ax, bx = (row[0] - o.x) * ivx, (row[3] - o.x) * ivx
            ay, by = (row[1] - o.y) * ivy, (row[4] - o.y) * ivy
            az, bz = (row[2] - o.z) * ivz, (row[5] - o.z) * ivz
            near = jnp.maximum(
                jnp.maximum(jnp.minimum(ax, bx), jnp.minimum(ay, by)),
                jnp.minimum(az, bz),
            )
            far = jnp.minimum(
                jnp.minimum(jnp.maximum(ax, bx), jnp.maximum(ay, by)),
                jnp.maximum(az, bz),
            )
            dw = jax.lax.dynamic_index_in_dim(done, k >> 5, 0, keepdims=False)
            nd = ((dw >> (k & 31).astype(jnp.uint32)) & 1) == 0
            cand = nd & (near <= far) & (far >= t_lo_l) & (near <= t_best)
            te = jnp.maximum(near, 0.0)
            better = cand & (te < bt)
            return jnp.where(better, te, bt), jnp.where(better, k, bk)

        return jax.lax.fori_loop(
            0, kk, step,
            (jnp.full((n,), jnp.inf, jnp.float32), jnp.full((n,), kk, jnp.int32)),
        )[1]

    @jax.jit
    def prep_pass(bk, done, t_best):
        ivx, ivy, ivz = (pk._inv_comp(c) for c in (d.x, d.y, d.z))
        padded = jnp.pad(bk, (0, t_pad0.size - n), constant_values=kk)
        tile_k = jnp.min(padded.reshape(n_tiles, pk._TILE), axis=1)
        has = tile_k < kk
        tk_l = jnp.repeat(
            jnp.minimum(tile_k, kk - 1), pk._TILE, total_repeat_length=t_pad0.size
        )[:n]
        tbox = jnp.take(box, jnp.minimum(tile_k, kk - 1), axis=0)

        def bcol(j):
            return jnp.repeat(tbox[:, j], pk._TILE, total_repeat_length=t_pad0.size)[:n]

        ax, bx = (bcol(0) - o.x) * ivx, (bcol(3) - o.x) * ivx
        ay, by = (bcol(1) - o.y) * ivy, (bcol(4) - o.y) * ivy
        az, bz = (bcol(2) - o.z) * ivz, (bcol(5) - o.z) * ivz
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(ax, bx), jnp.minimum(ay, by)),
            jnp.minimum(az, bz),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(ax, bx), jnp.maximum(ay, by)),
            jnp.maximum(az, bz),
        )
        wsel = tk_l >> 5
        bit = (jnp.uint32(1) << (tk_l & 31).astype(jnp.uint32)).astype(jnp.uint32)
        dw = done[0]
        for w in range(1, nw):
            dw = jnp.where(wsel == w, done[w], dw)
        has_l = jnp.repeat(has, pk._TILE, total_repeat_length=t_pad0.size)[:n]
        part = (
            has_l & ((dw & bit) == 0) & (near <= far) & (far >= t_lo_l)
            & (near <= t_best)
        )
        t_init = jnp.pad(
            jnp.where(part, t_best, -1.0), (0, t_pad0.size - n),
            constant_values=-1.0,
        ).reshape(pshape)
        bounds, octs = pk._tile_beam_bounds(rays, t_init)
        lim = jnp.take(
            pb.tl_lim.reshape(-1, 2),
            octs[:, 0] * kk + jnp.minimum(tile_k, kk - 1), axis=0,
        )
        lim = jnp.where(has[:, None], lim, 0)
        done2 = jnp.stack(
            [done[w] | jnp.where(part & (wsel == w), bit, jnp.uint32(0))
             for w in range(nw)]
        )
        return part, t_init, bounds, octs, lim, done2, jnp.sum(has), jnp.sum(part)

    @jax.jit
    def merge(t_best, part, t_new_p):
        t_new = t_new_p.reshape(-1)[:n]
        upd = part & (t_new < t_best) & (t_new >= 0)
        return jnp.where(upd, t_new, t_best)

    done = jnp.zeros((nw, n), jnp.uint32)
    t_best = t_init0
    ta = tp_ = tk = tm = 0.0
    passes = 0
    tile_engaged = 0
    while True:
        t0 = time.perf_counter()
        bk = phase_a(done, t_best)
        bk.block_until_ready()
        t1 = time.perf_counter()
        if not bool(jnp.any(bk < kk)):
            ta += t1 - t0
            break
        part, t_init, bounds, octs, lim, done, n_has, n_part = prep_pass(
            bk, done, t_best
        )
        n_part.block_until_ready()
        t2 = time.perf_counter()
        t_new_p, slot_p = pk._packet_sweep(
            (pb.nodes_f, pb.nodes_i, pb.leaves), bounds, octs, lim, rays,
            t_lo_p, t_init, int(pb.leaf_size), False,
        )
        t_new_p.block_until_ready()
        t3 = time.perf_counter()
        t_best = merge(t_best, part, t_new_p)
        t_best.block_until_ready()
        t4 = time.perf_counter()
        ta += t1 - t0
        tp_ += t2 - t1
        tk += t3 - t2
        tm += t4 - t3
        passes += 1
        tile_engaged += int(n_has)
        if passes <= 3 or passes % 16 == 0:
            print(
                f"  pass {passes}: tiles {int(n_has)}/{n_tiles} lanes "
                f"{int(n_part)} | A {1e3*(t1-t0):.1f} prep {1e3*(t2-t1):.1f} "
                f"kern {1e3*(t3-t2):.1f} merge {1e3*(t4-t3):.1f} ms",
                flush=True,
            )
    print(
        f"passes={passes} tile-walks={tile_engaged} | phaseA {ta*1e3:.0f} "
        f"prep {tp_*1e3:.0f} kernel {tk*1e3:.0f} merge {tm*1e3:.0f} ms",
        flush=True,
    )


def gather_bench(n_src, n_idx):
    src = jnp.asarray(np.random.default_rng(0).normal(size=n_src).astype(np.float32))
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, n_src, n_idx).astype(np.int32)
    )

    @jax.jit
    def g8(s, i):
        return sum(jnp.take(s * (j + 1), i, axis=0).sum() for j in range(8))

    g8(src, idx).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        g8(src, idx).block_until_ready()
    dt = (time.perf_counter() - t0) / 5
    print(
        f"gather 8x{n_idx} from {n_src}: {dt*1e3:.1f} ms "
        f"({dt/8/n_idx*1e9:.2f} ns/el)",
        flush=True,
    )


def main():
    ws = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    print("backend:", jax.default_backend(), flush=True)
    gather_bench(256 * 1024, 1 << 20)
    gather_bench(256 * 1024, 1 << 22)
    t = hall_scene().upload()
    n = RES * RES * ws
    o, d = bounce_wave(t, n, np.random.default_rng(0))
    print(f"wave {n} lanes, treelets {t.pbvh.n_treelets}", flush=True)
    eager_binned(t.pbvh, o, d, n)


if __name__ == "__main__":
    main()
