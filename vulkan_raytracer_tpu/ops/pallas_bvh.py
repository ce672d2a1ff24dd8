"""Pallas packet-traversal kernel — large-scene closest-hit/shadow on TPU.

The reference hands every ray to the RT cores (traceRayEXT,
shaders/raygen.rgen:59); the TPU has no traversal hardware and per-lane
pointer chasing dies on gather latency (measured: the XLA threaded-BVH walk
runs ~3 orders of magnitude below VPU peak past 64k triangles).  This
kernel instead traverses in *packets*: one tile of rays (8x128 = 1024
lanes) shares a single scalar cursor into the threaded (skip-pointer) BVH
of :mod:`vulkan_raytracer_tpu.accel.bvh`.

Why this maps well onto a TPU core:

* The threaded layout makes the cursor **monotone increasing** (hit ->
  ``cur+1``, miss/leaf -> ``miss[cur] > cur``), so node *and* leaf-triangle
  accesses stream strictly forward.  Both tables are therefore DMA'd
  HBM -> SMEM in aligned chunks on demand — no per-lane gathers anywhere.
* Interior nodes are culled with a **conservative scalar beam test**:
  interval arithmetic over the tile's origin box, direction interval and
  running max-t — a handful of scalar ops per node, with NO vector work
  and no vector->scalar reduce on the hot path (a per-lane slab test costs
  ~600 cycles/node on v5e from exactly that serialisation; the beam test
  measured ~10x cheaper).
* Leaf intersection restores per-lane exactness: ``leaf_size`` statically
  unrolled Möller–Trumbore tests, scalar-broadcast against the full tile.
* A tile whose rays all died (t bound -1) fails every slab test and exits
  along the miss chain in O(depth) steps — wavefront compaction comes free
  with alive-first lane ordering.

Stream layouts obey Mosaic DMA tiling ((8, 128) for f32): nodes pack
[bmin.xyz, bmax.xyz, first, miss] into an (8, Nn) float array (the two int
fields are exact in f32 below 2^24 slots), and leaves pack their
``leaf_size`` triangles' 9 Möller–Trumbore constants into one
(9*leaf_size, Nleaf) column each.

The cost model is packet coherence: all lanes visit the union of their
nodes.  Primary rays in image order are coherent; the integrator improves
bounce coherence by sorting lanes (see render/integrator.py).

Returns match trace_closest/trace_shadow; (u, v) of the winner are
recomputed outside the kernel from 9 flat gathers (cheaper than carrying
them through the walk).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .math3 import v3_gather

_TILE_S, _TILE_L = 8, 128
_TILE = _TILE_S * _TILE_L
#: node-stream chunk (nodes per DMA); multiple of 128 lanes
NODE_CHUNK = 512
#: leaf-stream chunk (leaves per DMA); multiple of 128 lanes
LEAF_CHUNK = 128

_NEG_BIG = -(2**30)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PacketBVH:
    """Stream-layout mirror of :class:`ThreadedBVH` for the packet kernel.

    ``nodes`` rows are [bmin.xyz, bmax.xyz, first_leaf, miss] — the last two
    are integers stored exactly as f32 (guarded < 2^24).  ``first_leaf`` is
    the LEAF index (first_tri / leaf_size), -1 for interior nodes.
    ``leaves`` columns hold one leaf each: rows j*9 + c are triangle j's
    Möller–Trumbore constants [v0.xyz, e1.xyz, e2.xyz]; padded slots are
    degenerate (zero edges -> no hit).  Both padded to chunk multiples.
    """

    nodes: jax.Array  # (8, Nn_pad) f32
    leaves: jax.Array  # (9*leaf_size, Nleaf_pad) f32
    tri_id: jax.Array  # (Nt_slots,) i32 (-1 padding), slot = leaf*K + j
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    leaf_size: int = dataclasses.field(metadata=dict(static=True))


def build_packet_bvh(bvh) -> PacketBVH:
    """Repack a ThreadedBVH into the stream layout (device-side)."""
    k = bvh.leaf_size
    if (9 * k) % 8 != 0:
        raise ValueError("packet kernel needs leaf_size a multiple of 8")
    if bvh.num_tri_slots >= 2**24 or bvh.num_nodes >= 2**24:
        raise ValueError("packet stream float-packed indices exceed 2^24")

    def pad_to(x, m, fill=0):
        n = x.shape[-1]
        p = -(-n // m) * m - n
        if p:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, p)], constant_values=fill)
        return x

    first_leaf = jnp.where(bvh.first_tri >= 0, bvh.first_tri // k, -1)
    nodes = pad_to(
        jnp.concatenate(
            [
                bvh.aabb_min.T,
                bvh.aabb_max.T,
                first_leaf[None].astype(jnp.float32),
                bvh.miss[None].astype(jnp.float32),
            ],
            axis=0,
        ),
        NODE_CHUNK,
    ).astype(jnp.float32)
    # (Nt, 3) x3 -> (Nleaf, k*9) -> (k*9, Nleaf)
    tri9 = jnp.concatenate([bvh.tri_v0, bvh.tri_e1, bvh.tri_e2], axis=1)
    leaves = pad_to(tri9.reshape(-1, k * 9).T.astype(jnp.float32), LEAF_CHUNK)
    return PacketBVH(
        nodes=nodes,
        leaves=leaves,
        tri_id=bvh.tri_id.astype(jnp.int32),
        num_nodes=bvh.num_nodes,
        leaf_size=k,
    )


def _kernel(
    nodes_hbm,
    leaves_hbm,
    ox,
    oy,
    oz,
    dx,
    dy,
    dz,
    tlo_ref,
    t0_ref,
    tout,
    slotout,
    nf_s,
    lf_s,
    base_s,
    tmax_s,
    tb_ref,
    sb_ref,
    sems,
    *,
    end: int,
    leaf_size: int,
    shadow: bool,
):
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    t_lo = tlo_ref[:]

    tb_ref[:] = t0_ref[:]
    sb_ref[:] = jnp.full((_TILE_S, _TILE_L), -1, jnp.int32)
    base_s[0] = _NEG_BIG  # node chunk base
    base_s[1] = _NEG_BIG  # leaf chunk base
    # running scalar t upper bound across live lanes (dead lanes carry -1)
    tmax_s[0] = jnp.max(tb_ref[:])

    # ---- beam bounds: interval arithmetic over the tile's rays ---------
    # Interior nodes are culled with a CONSERVATIVE scalar slab test of the
    # whole beam (origin box x direction interval) — zero vector work per
    # node, no vector->scalar reduce on the hot path.  Per-lane exactness
    # is restored at leaves by the Möller–Trumbore tests.
    big = jnp.float32(1e30)

    def interval(x):
        return jnp.min(x), jnp.max(x)

    o_lo_x, o_hi_x = interval(o_x)
    o_lo_y, o_hi_y = interval(o_y)
    o_lo_z, o_hi_z = interval(o_z)

    def inv_interval(d):
        d_lo, d_hi = interval(d)
        sign_uniform = (d_lo > 0.0) | (d_hi < 0.0)
        ia = jnp.where(sign_uniform, 1.0 / jnp.where(d_hi == 0.0, -1e-30, d_hi), -big)
        ib = jnp.where(sign_uniform, 1.0 / jnp.where(d_lo == 0.0, 1e-30, d_lo), big)
        return ia, ib

    ia_x, ib_x = inv_interval(d_x)
    ia_y, ib_y = inv_interval(d_y)
    ia_z, ib_z = inv_interval(d_z)

    def axis_bounds(bmin, bmax, olo, ohi, ia, ib):
        a = bmin - ohi
        b = bmin - olo
        c = bmax - ohi
        e = bmax - olo
        p1, p2, p3, p4 = a * ia, a * ib, b * ia, b * ib
        q1, q2, q3, q4 = c * ia, c * ib, e * ia, e * ib
        near = jnp.minimum(
            jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
            jnp.minimum(jnp.minimum(q1, q2), jnp.minimum(q3, q4)),
        )
        far = jnp.maximum(
            jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)),
            jnp.maximum(jnp.maximum(q1, q2), jnp.maximum(q3, q4)),
        )
        return near, far

    def fetch(dst, src, base, chunk, sem):
        cp = pltpu.make_async_copy(src.at[:, pl.ds(base, chunk)], dst, sem)
        cp.start()
        cp.wait()

    def body(cur):
        # ---- node chunk residency (cursor is monotone increasing) ------
        @pl.when(cur >= base_s[0] + NODE_CHUNK)
        def _():
            nb = pl.multiple_of((cur // NODE_CHUNK) * NODE_CHUNK, NODE_CHUNK)
            fetch(nf_s, nodes_hbm, nb, NODE_CHUNK, sems.at[0])
            base_s[0] = nb

        off = cur - base_s[0]
        bmin_x = nf_s[0, off]
        bmin_y = nf_s[1, off]
        bmin_z = nf_s[2, off]
        bmax_x = nf_s[3, off]
        bmax_y = nf_s[4, off]
        bmax_z = nf_s[5, off]
        first_leaf = nf_s[6, off].astype(jnp.int32)
        miss = nf_s[7, off].astype(jnp.int32)

        # ---- conservative scalar beam/AABB slab test --------------------
        n_x, f_x = axis_bounds(bmin_x, bmax_x, o_lo_x, o_hi_x, ia_x, ib_x)
        n_y, f_y = axis_bounds(bmin_y, bmax_y, o_lo_y, o_hi_y, ia_y, ib_y)
        n_z, f_z = axis_bounds(bmin_z, bmax_z, o_lo_z, o_hi_z, ia_z, ib_z)
        t_near = jnp.maximum(jnp.maximum(n_x, n_y), jnp.maximum(n_z, jnp.float32(0.0)))
        t_far = jnp.minimum(jnp.minimum(f_x, f_y), jnp.minimum(f_z, tmax_s[0]))
        # all-dead tiles: tmax = -1 -> t_far < 0 <= t_near, never descend
        any_hit = t_near <= t_far
        is_leaf = first_leaf >= 0

        # ---- leaf: unrolled MT over the tile ----------------------------
        @pl.when(any_hit & is_leaf)
        def _():
            @pl.when((first_leaf < base_s[1]) | (first_leaf >= base_s[1] + LEAF_CHUNK))
            def _():
                lb = pl.multiple_of(
                    (first_leaf // LEAF_CHUNK) * LEAF_CHUNK, LEAF_CHUNK
                )
                fetch(lf_s, leaves_hbm, lb, LEAF_CHUNK, sems.at[1])
                base_s[1] = lb

            loff = first_leaf - base_s[1]
            tb_v = tb_ref[:]
            sb_v = sb_ref[:]
            for j in range(leaf_size):
                v0x = lf_s[9 * j + 0, loff]
                v0y = lf_s[9 * j + 1, loff]
                v0z = lf_s[9 * j + 2, loff]
                e1x = lf_s[9 * j + 3, loff]
                e1y = lf_s[9 * j + 4, loff]
                e1z = lf_s[9 * j + 5, loff]
                e2x = lf_s[9 * j + 6, loff]
                e2y = lf_s[9 * j + 7, loff]
                e2z = lf_s[9 * j + 8, loff]

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
                hit = (
                    ~near0
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (tt > t_lo)
                    & (tt <= tb_v)
                )
                if shadow:
                    # any accepted hit occludes; kill the bound so the lane
                    # stops passing slab tests (terminate-on-first-hit,
                    # lightsample.glsl:27)
                    tb_v = jnp.where(hit, -1.0, tb_v)
                    sb_v = jnp.where(hit, first_leaf * leaf_size + j, sb_v)
                else:
                    replace = hit & ((tt < tb_v) | (sb_v < 0))
                    tb_v = jnp.where(replace, tt, tb_v)
                    sb_v = jnp.where(replace, first_leaf * leaf_size + j, sb_v)

            tb_ref[:] = tb_v
            sb_ref[:] = sb_v
            # tighten the scalar beam bound (shadow: occluded lanes fell to
            # -1, shrinking it toward early exit)
            tmax_s[0] = jnp.max(tb_v)

        return jnp.where(any_hit & ~is_leaf, cur + 1, miss)

    jax.lax.while_loop(lambda cur: cur < end, body, jnp.int32(0))
    tout[:] = tb_ref[:]
    slotout[:] = sb_ref[:]


@functools.partial(
    jax.jit, static_argnames=("end", "leaf_size", "shadow")
)
def _packet_sweep(pb_arrays, rays, t_lo, t_init, end, leaf_size, shadow):
    nodes, leaves = pb_arrays
    n_rows = rays[0].shape[0]
    grid = (n_rows // _TILE_S,)
    ray_spec = pl.BlockSpec(
        (_TILE_S, _TILE_L), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        functools.partial(
            _kernel, end=end, leaf_size=leaf_size, shadow=shadow
        ),
        grid=grid,
        in_specs=[any_spec] * 2 + [ray_spec] * 8,
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, _TILE_L), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, _TILE_L), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((8, NODE_CHUNK), jnp.float32),
            pltpu.SMEM((9 * leaf_size, LEAF_CHUNK), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.VMEM((_TILE_S, _TILE_L), jnp.float32),
            pltpu.VMEM((_TILE_S, _TILE_L), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=bool(os.environ.get("VKRT_PALLAS_INTERPRET")),
    )(nodes, leaves, *rays, t_lo, t_init)


def packet_ok(tables) -> bool:
    on_tpu = jax.default_backend() in ("tpu",) or bool(
        os.environ.get("VKRT_PALLAS_INTERPRET")
    )
    return on_tpu and tables.pbvh is not None


def _prep_rays(o, d, t_init_flat):
    n = o.x.shape[0]
    n_pad = -(-n // _TILE) * _TILE

    def prep(x):
        return jnp.pad(x, (0, n_pad - n)).reshape(n_pad // _TILE_L, _TILE_L)

    rays = (prep(o.x), prep(o.y), prep(o.z), prep(d.x), prep(d.y), prep(d.z))
    return rays, prep(t_init_flat), n


def packet_closest(tables, o, d, *, t_min, t_max, active):
    """Drop-in for dense_closest/trace_closest on big scenes.

    Alpha-agnostic (every triangle is a candidate); ``t_min`` may be a
    scalar or per-lane (N,) array for the alpha resample loop.
    """
    pb: PacketBVH = tables.pbvh
    n = o.x.shape[0]
    t_bound = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    t_lo = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    rays, t_init, _ = _prep_rays(o, d, jnp.where(active, t_bound, -1.0))
    t_lo = jnp.pad(t_lo, (0, t_init.size - n)).reshape(t_init.shape)
    t_best, slot = _packet_sweep(
        (pb.nodes, pb.leaves),
        rays,
        t_lo,
        t_init,
        int(pb.num_nodes),
        int(pb.leaf_size),
        False,
    )
    t_best = t_best.reshape(-1)[:n]
    slot = slot.reshape(-1)[:n]
    tri = jnp.take(pb.tri_id, jnp.maximum(slot, 0), axis=0)
    found = (slot >= 0) & (tri >= 0)
    tri = jnp.where(found, tri, -1)

    # recompute (u, v) for the winner (9 flat gathers)
    ti = jnp.maximum(tri, 0)
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
        tri,
        jnp.where(found, u, 0.0),
        jnp.where(found, v, 0.0),
    )


def packet_shadow(tables, o, d, *, t_max, active):
    """Terminate-on-first-hit occlusion over the packet BVH (tMin = 0)."""
    pb: PacketBVH = tables.pbvh
    n = o.x.shape[0]
    t_bound = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    rays, t_init, _ = _prep_rays(o, d, jnp.where(active, t_bound, -1.0))
    t_lo = jnp.zeros_like(t_init)
    _, slot = _packet_sweep(
        (pb.nodes, pb.leaves),
        rays,
        t_lo,
        t_init,
        int(pb.num_nodes),
        int(pb.leaf_size),
        True,
    )
    slot = slot.reshape(-1)[:n]
    return (slot >= 0) & active
