"""Pallas TPU kernels for the dense closest-hit / occlusion / pdf sweeps.

The XLA dense path (:mod:`vulkan_raytracer_tpu.ops.dense`) materialises a
(T_chunk, N) test matrix per fold step; these kernels instead keep the whole
(small) scene resident in scalar memory and stream ray tiles through VMEM:
each program owns a (32, 128) = 4096-ray block, loops over every triangle
with its nine MT constants read from SMEM (scalar broadcasts are free on the
VPU), and folds the result in registers — zero HBM traffic between
triangles, zero padding waste.

Performance shape (measured v5e, 262144-lane Cornell wave):
* ray blocks are (32, 128), not the (8, 128) minimum: 4x more vector work
  per scalar issue (SMEM reads, loop control) — the 8-sublane version ran
  ~7x above pure-VPU time on issue overhead;
* the triangle loop is statically unrolled (fully below
  ``_FULL_UNROLL_TRIS``, in chunks of ``_UNROLL`` above) so Mosaic can
  software-pipeline the scalar reads under the vector math;
* occlusion (shadow) rays get a dedicated kernel: no closest fold, no
  winner (u, v) recompute epilogue — an any-hit bool per lane
  (terminate-on-first-hit analogue, lightsample.glsl:27).

Used for scenes up to ``PALLAS_MAX_TRIS`` with no alpha; the XLA dense fold
covers the rest.  Identical results to dense_closest (same MT math and
tie-breaking by smallest t; ties on t across triangles resolve to the
lower triangle id, matching the fold order).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .math3 import v3_gather

#: SMEM row budget: 10 rows x T floats; keep the table comfortably small.
PALLAS_MAX_TRIS = 1024

_BLOCK_S, _TILE_L = 32, 128
_BLOCK = _BLOCK_S * _TILE_L

#: full static unroll below this; chunked unroll above
_FULL_UNROLL_TRIS = 64
_UNROLL = 8


def _interpret() -> bool:
    return bool(os.environ.get("VKRT_PALLAS_INTERPRET"))


def _mt_test(tri_ref, t, o, d, row0=0):
    """One scalar-broadcast Möller–Trumbore test of triangle ``t`` against
    the whole ray block.  Returns (near0, u, v, tt)."""
    o_x, o_y, o_z = o
    d_x, d_y, d_z = d
    v0x = tri_ref[row0 + 0, t]
    v0y = tri_ref[row0 + 1, t]
    v0z = tri_ref[row0 + 2, t]
    e1x = tri_ref[row0 + 3, t]
    e1y = tri_ref[row0 + 4, t]
    e1z = tri_ref[row0 + 5, t]
    e2x = tri_ref[row0 + 6, t]
    e2y = tri_ref[row0 + 7, t]
    e2z = tri_ref[row0 + 8, t]

    px = d_y * e2z - d_z * e2y
    py = d_z * e2x - d_x * e2z
    pz = d_x * e2y - d_y * e2x
    det = e1x * px + e1y * py + e1z * pz
    near0 = jnp.abs(det) < 1e-12
    inv = 1.0 / jnp.where(near0, 1.0, det)
    tx = o_x - v0x
    ty = o_y - v0y
    tz = o_z - v0z
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (d_x * qx + d_y * qy + d_z * qz) * inv
    tt = (e2x * qx + e2y * qy + e2z * qz) * inv
    return near0, u, v, tt


def _unrolled_fold(n_pad, step):
    """Run ``step(t, carry)`` for t in [0, n_pad): fully unrolled below the
    threshold, else a fori_loop over ``_UNROLL``-wide unrolled chunks.
    ``n_pad`` must be a multiple of _UNROLL (or small enough to full-unroll);
    padded slots hold degenerate triangles (zero edges -> det 0 -> no hit).
    """

    def run(init):
        if n_pad <= _FULL_UNROLL_TRIS:
            carry = init
            for t in range(n_pad):
                carry = step(t, carry)
            return carry

        def chunk(c, carry):
            for j in range(_UNROLL):
                carry = step(c * _UNROLL + j, carry)
            return carry

        return jax.lax.fori_loop(0, n_pad // _UNROLL, chunk, init)

    return run


def _kernel(tri_ref, ox, oy, oz, dx, dy, dz, tlo_ref, t0_ref, tout, triout,
            n_pad: int):
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    t_lo = tlo_ref[:]

    def step(t, carry):
        t_best, tri_best = carry
        near0, u, v, tt = _mt_test(tri_ref, t, o, d)
        hit = (
            ~near0
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (tt > t_lo)
            & (tt <= t_best)
        )
        # tie-break like the dense fold: first (smallest-id) triangle wins
        # among equal t; equality with the initial bound is still a hit
        replace = hit & ((tt < t_best) | (tri_best < 0))
        return (
            jnp.where(replace, tt, t_best),
            jnp.where(replace, t, tri_best),
        )

    t_best, tri_best = _unrolled_fold(n_pad, step)(
        (t0_ref[:], jnp.full((_BLOCK_S, _TILE_L), -1, jnp.int32))
    )
    tout[:] = t_best
    triout[:] = tri_best


def _shadow_kernel(tri_ref, ox, oy, oz, dx, dy, dz, t0_ref, occout,
                   n_pad: int):
    """Any-hit occlusion: no fold, no epilogue (shadow.rmiss analogue).

    ``t0_ref`` carries the per-lane t upper bound (0 for inactive lanes,
    so they can never be occluded); tMin = 0 (lightsample.glsl:27).
    """
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    t_hi = t0_ref[:]

    def step(t, occ):
        near0, u, v, tt = _mt_test(tri_ref, t, o, d)
        hit = (
            ~near0
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (tt > 0.0)
            & (tt <= t_hi)
        )
        # i32 carry, not bool: Mosaic cannot legalize an i1 memref carry
        # through the scf.for the >64-tri fold lowers to (fails on real
        # TPU with "failed to legalize operation 'scf.for'"; interpret
        # mode accepts it, which is why only hardware caught this)
        return occ | hit.astype(jnp.int32)

    occ = _unrolled_fold(n_pad, step)(
        jnp.zeros((_BLOCK_S, _TILE_L), jnp.int32)
    )
    occout[:] = occ


def _pad_cols(x, mult):
    n = x.shape[-1]
    p = -(-max(n, 1) // mult) * mult - n
    if p:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, p)])
    return x


def _tri_pad(n_tris: int) -> int:
    if n_tris <= _FULL_UNROLL_TRIS:
        return max(n_tris, 1)
    return -(-n_tris // _UNROLL) * _UNROLL


def _ray_block_spec():
    return pl.BlockSpec(
        (_BLOCK_S, _TILE_L), lambda i: (i, 0), memory_space=pltpu.VMEM
    )


@functools.partial(jax.jit, static_argnames=("n_tris",))
def _pallas_sweep(tri_smem, rays, t_lo, t_init, n_tris):
    n_rows = rays[0].shape[0]
    grid = (n_rows // _BLOCK_S,)
    ray_spec = _ray_block_spec()
    n_pad = _tri_pad(n_tris)
    t_best, tri_best = pl.pallas_call(
        functools.partial(_kernel, n_pad=n_pad),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [ray_spec] * 8,
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, _TILE_L), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, _TILE_L), jnp.int32),
        ),
        interpret=_interpret(),
    )(_pad_cols(tri_smem, n_pad), *rays, t_lo, t_init)
    return t_best, tri_best


@functools.partial(jax.jit, static_argnames=("n_tris",))
def _pallas_shadow_sweep(tri_smem, rays, t_init, n_tris):
    n_rows = rays[0].shape[0]
    grid = (n_rows // _BLOCK_S,)
    ray_spec = _ray_block_spec()
    n_pad = _tri_pad(n_tris)
    return pl.pallas_call(
        functools.partial(_shadow_kernel, n_pad=n_pad),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [ray_spec] * 7,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, _TILE_L), jnp.int32),
        interpret=_interpret(),
    )(_pad_cols(tri_smem, n_pad), *rays, t_init)


def pallas_ok(tables) -> bool:
    on_tpu = jax.default_backend() in ("tpu",) or _interpret()
    return on_tpu and tables.num_triangles <= PALLAS_MAX_TRIS


def _tri_table(tables):
    """(9, Tp) f32 triangle MT constants (padded tris are degenerate)."""
    v0, v1, v2 = tables.v0, tables.v1, tables.v2
    return jnp.stack(
        [
            v0.x, v0.y, v0.z,
            v1.x - v0.x, v1.y - v0.y, v1.z - v0.z,
            v2.x - v0.x, v2.y - v0.y, v2.z - v0.z,
        ]
    )


def _prep_rays(o, d, extra):
    """Pad lane arrays to a block multiple and reshape to (rows, 128)."""
    n = o.x.shape[0]
    n_pad = -(-n // _BLOCK) * _BLOCK

    def prep(x):
        return jnp.pad(x, (0, n_pad - n)).reshape(n_pad // _TILE_L, _TILE_L)

    rays = (prep(o.x), prep(o.y), prep(o.z), prep(d.x), prep(d.y), prep(d.z))
    return rays, tuple(prep(e) for e in extra), n


def pallas_closest(tables, o, d, *, t_min, t_max, active):
    """Drop-in for dense_closest on small scenes (alpha-agnostic candidates).

    ``t_min`` may be a scalar or per-lane (N,) array — the alpha resample
    loop in the integrator re-traces with advancing lower bounds.
    """
    n = o.x.shape[0]
    t_bound = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    t_lo = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    rays, (t_lo, t_init), _ = _prep_rays(
        o, d, (t_lo, jnp.where(active, t_bound, 0.0))
    )
    tri_smem = _tri_table(tables)
    t_best, tri_best = _pallas_sweep(
        tri_smem, rays, t_lo, t_init, int(tables.num_triangles)
    )
    t_best = t_best.reshape(-1)[:n]
    tri_best = tri_best.reshape(-1)[:n]
    found = tri_best >= 0

    # recompute (u, v) for the winner (9 flat gathers)
    ti = jnp.maximum(tri_best, 0)
    wv0 = v3_gather(tables.v0, ti)
    e1 = v3_gather(tables.v1, ti) - wv0
    e2 = v3_gather(tables.v2, ti) - wv0
    pvec = d.cross(e2)
    det = e1.dot(pvec)
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    tvec = o - wv0
    u = tvec.dot(pvec) * inv
    v = d.dot(tvec.cross(e1)) * inv
    return (
        jnp.where(found, t_best, jnp.inf),
        tri_best,
        jnp.where(found, u, 0.0),
        jnp.where(found, v, 0.0),
    )


def pallas_shadow(tables, o, d, *, t_max, active):
    """Any-hit occlusion (tMin = 0): dedicated kernel, no closest fold."""
    n = o.x.shape[0]
    t_bound = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    rays, (t_init,), _ = _prep_rays(o, d, (jnp.where(active, t_bound, 0.0),))
    occ = _pallas_shadow_sweep(
        _tri_table(tables), rays, t_init, int(tables.num_triangles)
    )
    return (occ.reshape(-1)[:n] != 0) & active


# ---------------------------------------------------------------------------
# Emissive-pdf probe kernel (shaders/emissivepdf.rahit): accumulate the NEE
# solid-angle pdf over every emissive triangle along the ray.
# ---------------------------------------------------------------------------


def _pdf_kernel(tri_ref, ox, oy, oz, dx, dy, dz, act_ref, out_ref,
                n_pad: int, t_min: float):
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    d_x, d_y, d_z = d
    gate = act_ref[:]

    def step(t, pdf):
        near0, u, v, tt = _mt_test(tri_ref, t, o, d)
        p_delta = tri_ref[9, t]
        area = tri_ref[10, t]
        n0x, n0y, n0z = tri_ref[11, t], tri_ref[12, t], tri_ref[13, t]
        n1x, n1y, n1z = tri_ref[14, t], tri_ref[15, t], tri_ref[16, t]
        n2x, n2y, n2z = tri_ref[17, t], tri_ref[18, t], tri_ref[19, t]
        hit = (
            ~near0 & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (tt > t_min)
        )
        w0 = 1.0 - u - v
        nx = w0 * n0x + u * n1x + v * n2x
        ny = w0 * n0y + u * n1y + v * n2y
        nz = w0 * n0z + u * n1z + v * n2z
        inv_len = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
        cosine = jnp.abs(nx * d_x + ny * d_y + nz * d_z) * inv_len
        contrib = p_delta * tt * tt / jnp.maximum(area * cosine, 1e-30)
        return pdf + jnp.where(hit, contrib, 0.0)

    pdf = _unrolled_fold(n_pad, step)(
        jnp.zeros((_BLOCK_S, _TILE_L), jnp.float32)
    )
    out_ref[:] = pdf * gate


@functools.partial(jax.jit, static_argnames=("n_tris", "t_min"))
def _pallas_pdf_sweep(tri_smem, rays, act, n_tris, t_min):
    n_rows = rays[0].shape[0]
    grid = (n_rows // _BLOCK_S,)
    ray_spec = _ray_block_spec()
    n_pad = _tri_pad(n_tris)
    return pl.pallas_call(
        functools.partial(_pdf_kernel, n_pad=n_pad, t_min=t_min),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [ray_spec] * 7,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, _TILE_L), jnp.float32),
        interpret=_interpret(),
    )(_pad_cols(tri_smem, n_pad), *rays, act)


def pallas_pdf_ok(tables) -> bool:
    on_tpu = jax.default_backend() in ("tpu",) or _interpret()
    return on_tpu and 0 < tables.num_emissive_tris <= PALLAS_MAX_TRIS


def pallas_emissive_pdf(tables, o, d, *, t_min, active):
    """Drop-in for dense_emissive_pdf on TPU."""
    em = tables.em_tables
    ev0, ev1, ev2 = tables.em_v0, tables.em_v1, tables.em_v2
    tri_smem = jnp.stack(
        [
            ev0.x, ev0.y, ev0.z,
            ev1.x - ev0.x, ev1.y - ev0.y, ev1.z - ev0.z,
            ev2.x - ev0.x, ev2.y - ev0.y, ev2.z - ev0.z,
            em.p_delta, jnp.maximum(em.area, 1e-30),
            em.n0[:, 0], em.n0[:, 1], em.n0[:, 2],
            em.n1[:, 0], em.n1[:, 1], em.n1[:, 2],
            em.n2[:, 0], em.n2[:, 1], em.n2[:, 2],
        ]
    )
    rays, (act,), n = _prep_rays(o, d, (jnp.where(active, 1.0, 0.0),))
    pdf = _pallas_pdf_sweep(
        tri_smem, rays, act, int(tables.num_emissive_tris), float(t_min)
    )
    return pdf.reshape(-1)[:n]
