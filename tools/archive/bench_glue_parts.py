"""Time the binned walk's XLA glue piecewise at production shapes.

Isolates: treelet selection (C x K fori), pair key sort, unique scatters,
flat gathers, per-tile beam bounds, and the C-row reduction — each as its
own jitted function at the hall-wave shapes (n=262144, K=64, C=4).

Run: ``python tools/bench_glue_parts.py``
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from vulkan_raytracer_tpu.ops import pallas_bvh as pk

N = 262144
K = 64
C = 4
TILE = 1024
P_PAD = (-(-(C * N + K * TILE + 1) // TILE)) * TILE


def timeit(label, f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(f(*args))
    print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:7.2f} ms", flush=True)


def main():
    print("backend:", jax.default_backend(), "P_PAD:", P_PAD, flush=True)
    rng = np.random.default_rng(0)
    o = tuple(jnp.asarray(rng.uniform(-5, 5, N).astype(np.float32)) for _ in range(3))
    d3 = rng.normal(size=(3, N)).astype(np.float32)
    d3 /= np.linalg.norm(d3, axis=0, keepdims=True)
    d = tuple(jnp.asarray(d3[k]) for k in range(3))
    box = jnp.asarray(rng.uniform(-5, 5, (K, 6)).astype(np.float32))
    t_best = jnp.full((N,), 1e32, jnp.float32)
    t_lo = jnp.zeros((N,), jnp.float32)

    @jax.jit
    def select4(box, ox, oy, oz, dx, dy, dz, tb):
        ivx, ivy, ivz = (pk._inv_comp(c) for c in (dx, dy, dz))
        ct = jnp.full((N,), -jnp.inf, jnp.float32)
        ck = jnp.full((N,), -1, jnp.int32)
        sels = []
        for _ in range(C):
            def step(k, acc):
                bt, bk = acc
                row = jax.lax.dynamic_slice_in_dim(box, k, 1, 0)[0]
                ax, bx = (row[0] - ox) * ivx, (row[3] - ox) * ivx
                ay, by = (row[1] - oy) * ivy, (row[4] - oy) * ivy
                az, bz = (row[2] - oz) * ivz, (row[5] - oz) * ivz
                near = jnp.maximum(jnp.maximum(jnp.minimum(ax, bx), jnp.minimum(ay, by)), jnp.minimum(az, bz))
                far = jnp.minimum(jnp.minimum(jnp.maximum(ax, bx), jnp.maximum(ay, by)), jnp.maximum(az, bz))
                te = jnp.maximum(near, 0.0)
                cand = ((te > ct) | ((te == ct) & (k > ck))) & (near <= far) & (far >= t_lo) & (te <= tb)
                better = cand & ((te < bt) | ((te == bt) & (k < bk)))
                return jnp.where(better, te, bt), jnp.where(better, k, bk)
            bt, bk = jax.lax.fori_loop(0, K, step, (jnp.full((N,), jnp.inf, jnp.float32), jnp.full((N,), K, jnp.int32)))
            sels.append(bk)
            valid = bk < K
            ct = jnp.where(valid, bt, ct)
            ck = jnp.where(valid, bk, ck)
        return jnp.stack(sels)

    timeit("select (CxK fori)    ", select4, box, *o, *d, t_best)
    sel = select4(box, *o, *d, t_best)

    pair_k = sel.reshape(-1)
    pair_ray = jnp.tile(jnp.arange(N, dtype=jnp.int32), C)
    ray_bits = int(N - 1).bit_length()

    @jax.jit
    def sortkey(pair_k, pair_ray):
        key = (pair_k.astype(jnp.uint32) << ray_bits) | pair_ray.astype(jnp.uint32)
        return jnp.argsort(key)

    timeit("argsort u32 (C*N)    ", sortkey, pair_k, pair_ray)
    perm = sortkey(pair_k, pair_ray)

    @jax.jit
    def binning(pair_k, pair_ray, perm):
        pk_s = jnp.take(pair_k, perm)
        pr_s = jnp.take(pair_ray, perm)
        off = jnp.searchsorted(pk_s, jnp.arange(K + 1, dtype=jnp.int32)).astype(jnp.int32)
        cnt = jnp.diff(off)
        pof = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(-(-cnt // TILE) * TILE).astype(jnp.int32)])
        i_s = jnp.arange(C * N, dtype=jnp.int32)
        pkc = jnp.minimum(pk_s, K - 1)
        dest = jnp.where(pk_s < K, jnp.take(pof, pkc) + (i_s - jnp.take(off, pkc)), pof[K] + (i_s - off[K]))
        prp = jnp.full((P_PAD,), -1, jnp.int32).at[dest].set(jnp.where(pk_s < K, pr_s, -1))
        back = jnp.zeros((C * N,), jnp.int32).at[perm].set(dest)
        return prp, back, pof

    timeit("bin scatters         ", binning, pair_k, pair_ray, perm)
    prp, back, pof = binning(pair_k, pair_ray, perm)

    @jax.jit
    def gathers(prp, ox, oy, oz, dx, dy, dz, tb, tl):
        prc = jnp.maximum(prp, 0)
        outs = [jnp.take(x, prc) for x in (ox, oy, oz, dx, dy, dz, tb, tl)]
        return sum(x.sum() for x in outs)

    timeit("pair gathers (8x)    ", gathers, prp, *o, *d, t_best, t_lo)

    @jax.jit
    def beams(prp, ox, oy, oz, dx, dy, dz, tb):
        prc = jnp.maximum(prp, 0)
        po = pk.V3(*(jnp.take(x, prc) for x in (ox, oy, oz)))
        pd = pk.V3(*(jnp.take(x, prc) for x in (dx, dy, dz)))
        t_init = jnp.where(prp >= 0, jnp.take(tb, prc), -1.0)
        rays_p, t_init_pp, _ = pk._prep_rays(po, pd, t_init)
        bounds, octs = pk._tile_beam_bounds(rays_p, t_init_pp)
        return bounds.sum() + octs.sum()

    timeit("beam bounds (P_PAD)  ", beams, prp, *o, *d, t_best)

    t_new = jnp.asarray(rng.uniform(0, 1, P_PAD).astype(np.float32))
    slot = jnp.asarray(rng.integers(-1, 100, P_PAD).astype(np.int32))

    @jax.jit
    def reduce(back, t_new, slot, tb):
        t_c = jnp.take(t_new, back).reshape(C, N)
        s_c = jnp.take(slot, back).reshape(C, N)
        res = jnp.full((N,), -1, jnp.int32)
        t = tb
        for ci in range(C):
            ok = s_c[ci] >= 0
            upd = ok & ((t_c[ci] < t) | (res < 0))
            t = jnp.where(upd, t_c[ci], t)
            res = jnp.where(upd, s_c[ci], res)
        return t.sum() + res.sum()

    timeit("C-row reduce         ", reduce, back, t_new, slot, t_best)


if __name__ == "__main__":
    main()
