"""Dense (gather-free) ray/triangle intersection — the TPU fast path.

BVH traversal is pointer chasing: every step gathers node/triangle data at
ray-dependent indices, and TPU gathers run orders of magnitude below VPU
peak.  For scenes up to a few thousand triangles it is far faster on a TPU
to test EVERY ray against EVERY triangle as dense (N_rays, T_chunk) tensors
— pure element-wise VPU work XLA fuses into tiled loops — folding a running
closest-hit over triangle chunks.  This plays the role of the hardware RT
core for the reference's default workloads (CornellBox et al.); larger
scenes fall back to the threaded BVH (:mod:`vulkan_raytracer_tpu.ops.traverse`).

Layout note (the whole point of this module): vectors are *component
arrays* ``(N, C)``, never ``(..., 3)``.  A trailing dimension of 3 lands on
the TPU's 128-wide lane axis at 2.3% utilisation; component-wise layout
keeps every op on natively tiled (8, 128) f32 tiles.

Semantics identical to the traversal module: closest hit, any-hit occlusion
(shadow), and the emissive-pdf probe (shaders/emissivepdf.rahit).  The
deterministic alpha MASK test is supported (reject triangles whose material
alpha is below the cutoff, hit.rahit:52); stochastic BLEND requires
per-intersection RNG ordering and routes through the BVH path instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Scenes at or below this many triangles use dense intersection.
DENSE_MAX_TRIS = 4096

#: Triangle chunk width per fold step (the native f32 lane width).
CHUNK = 128

_BIG = jnp.float32(3e38)


def _pad_to(x, t_pad):
    pad = t_pad - x.shape[0]
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x


def _tri_components(tables, mask_alpha):
    """Per-triangle MT constants as padded (T_pad,) component rows."""
    t_count = tables.tri_v0.shape[0]
    nc = max(1, -(-t_count // CHUNK))
    t_pad = nc * CHUNK
    v0 = _pad_to(tables.tri_v0, t_pad)
    e1 = _pad_to(tables.tri_v1 - tables.tri_v0, t_pad)
    e2 = _pad_to(tables.tri_v2 - tables.tri_v0, t_pad)
    valid = jnp.arange(t_pad) < t_count
    if mask_alpha and tables.has_alpha:
        amode = _pad_to(tables.alpha.mode, t_pad)
        aval = _pad_to(tables.alpha.value, t_pad)
        acut = _pad_to(tables.alpha.cutoff, t_pad)
        valid = valid & ~((amode == 1) & (aval < acut))
    comps = tuple(v0[:, k] for k in range(3)) + tuple(
        e1[:, k] for k in range(3)
    ) + tuple(e2[:, k] for k in range(3))
    return comps, valid, nc, t_count


def _mt_chunk(o, d, tri, valid, s, t_min, t_max_col):
    """Möller-Trumbore on (N, CHUNK) component tensors.

    o/d: tuples of (N, 1) ray components; tri: tuples of (T_pad,) triangle
    components sliced at ``s``; returns (hit, t, u, v) as (N, CHUNK).
    """
    ox, oy, oz, dx, dy, dz = o + d
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = (
        jax.lax.dynamic_slice_in_dim(c, s, CHUNK)[None, :] for c in tri
    )
    vmask = jax.lax.dynamic_slice_in_dim(valid, s, CHUNK)[None, :]

    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    near_zero = jnp.abs(det) < 1e-12
    inv_det = 1.0 / jnp.where(near_zero, 1.0, det)
    # tvec = o - v0
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        vmask
        & ~near_zero
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t <= t_max_col)
    )
    return hit, t, u, v


def _ray_components(o, d):
    return (
        (o[:, 0:1], o[:, 1:2], o[:, 2:3]),
        (d[:, 0:1], d[:, 1:2], d[:, 2:3]),
    )


def dense_closest(tables, o, d, *, t_min, t_max, active, mask_alpha=True):
    """Closest hit over all triangles; mirrors trace_closest's returns
    (t, tri, u, v) with t=+inf / tri=-1 on miss.

    Gather-free: per chunk the winner is found with two masked min-folds
    (t, then smallest index among t-ties); barycentrics are recomputed once
    at the end from the winning triangle only.
    """
    n = o.shape[0]
    tri, valid, nc, t_count = _tri_components(tables, mask_alpha)
    oc, dc = _ray_components(o, d)
    t_bound = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    col = jnp.arange(CHUNK, dtype=jnp.int32)[None, :]

    def fold(c, carry):
        t_best, tri_best = carry
        s = c * CHUNK
        hit, t, _, _ = _mt_chunk(oc, dc, tri, valid, s, t_min, t_best[:, None])
        t = jnp.where(hit, t, _BIG)
        t_chunk = jnp.min(t, axis=1)
        idx_chunk = jnp.min(
            jnp.where(hit & (t <= t_chunk[:, None]), s + col, jnp.int32(2**30)),
            axis=1,
        )
        closer = t_chunk < t_best
        return (
            jnp.where(closer, t_chunk, t_best),
            jnp.where(closer, idx_chunk, tri_best),
        )

    init = (jnp.where(active, t_bound, 0.0), jnp.full((n,), -1, jnp.int32))
    if nc == 1:
        t_best, tri_best = fold(0, init)
    else:
        t_best, tri_best = jax.lax.fori_loop(0, nc, fold, init)

    found = (tri_best >= 0) & (tri_best < t_count)
    tri_best = jnp.where(found, tri_best, -1)

    # recompute (u, v) for the single winning triangle (9-float gather/lane)
    ti = jnp.maximum(tri_best, 0)
    wv0 = jnp.take(tables.tri_v0, ti, axis=0)
    wv1 = jnp.take(tables.tri_v1, ti, axis=0)
    wv2 = jnp.take(tables.tri_v2, ti, axis=0)
    e1 = wv1 - wv0
    e2 = wv2 - wv0
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    tvec = o - wv0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det

    return (
        jnp.where(found, t_best, jnp.inf),
        tri_best,
        jnp.where(found, u, 0.0),
        jnp.where(found, v, 0.0),
    )


def dense_shadow(tables, o, d, *, t_max, active):
    """Any-hit occlusion over all triangles (tMin = 0, lightsample.glsl:27)."""
    n = o.shape[0]
    tri, valid, nc, _ = _tri_components(tables, mask_alpha=True)
    oc, dc = _ray_components(o, d)
    t_bound = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    def fold(c, occ):
        hit, _, _, _ = _mt_chunk(oc, dc, tri, valid, c * CHUNK, 0.0, t_bound[:, None])
        return occ | jnp.any(hit, axis=1)

    init = jnp.zeros((n,), bool)
    occ = fold(0, init) if nc == 1 else jax.lax.fori_loop(0, nc, fold, init)
    return occ & active


def dense_emissive_pdf(tables, o, d, *, t_min, active):
    """Sum the NEE pdf over every emissive triangle along each ray
    (shaders/emissivepdf.rahit:57-67).  Emissive sets are small (they feed
    the sampling CDF), so a single dense pass; the cosine uses the
    interpolated vertex normal flipped toward the ray origin."""
    em = tables.em_tables
    te = tables.em_tri.shape[0]
    nc = max(1, -(-te // CHUNK))
    t_pad = nc * CHUNK
    ev0 = jnp.take(tables.tri_v0, tables.em_tri, axis=0)
    ev1 = jnp.take(tables.tri_v1, tables.em_tri, axis=0)
    ev2 = jnp.take(tables.tri_v2, tables.em_tri, axis=0)
    tri = tuple(_pad_to(ev0, t_pad)[:, k] for k in range(3)) + tuple(
        _pad_to(ev1 - ev0, t_pad)[:, k] for k in range(3)
    ) + tuple(_pad_to(ev2 - ev0, t_pad)[:, k] for k in range(3))
    valid = jnp.arange(t_pad) < te
    n0 = _pad_to(em.n0, t_pad)
    n1 = _pad_to(em.n1, t_pad)
    n2 = _pad_to(em.n2, t_pad)
    p_delta = _pad_to(em.p_delta, t_pad)
    area = _pad_to(jnp.maximum(em.area, 1e-30), t_pad)
    oc, dc = _ray_components(o, d)

    def fold(c, pdf):
        s = c * CHUNK
        hit, t, u, v = _mt_chunk(oc, dc, tri, valid, s, t_min, _BIG)
        hit = hit & active[:, None]
        w0 = 1.0 - u - v
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, s, CHUNK)
        nx = w0 * sl(n0[:, 0])[None] + u * sl(n1[:, 0])[None] + v * sl(n2[:, 0])[None]
        ny = w0 * sl(n0[:, 1])[None] + u * sl(n1[:, 1])[None] + v * sl(n2[:, 1])[None]
        nz = w0 * sl(n0[:, 2])[None] + u * sl(n1[:, 2])[None] + v * sl(n2[:, 2])[None]
        inv_len = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
        cosine = jnp.abs(nx * dc[0] + ny * dc[1] + nz * dc[2]) * inv_len
        contrib = sl(p_delta)[None] * t * t / jnp.maximum(sl(area)[None] * cosine, 1e-30)
        return pdf + jnp.sum(jnp.where(hit, contrib, 0.0), axis=1)

    init = jnp.zeros((o.shape[0],), jnp.float32)
    return fold(0, init) if nc == 1 else jax.lax.fori_loop(0, nc, fold, init)
