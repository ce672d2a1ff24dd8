"""Pallas packet-traversal kernel — large-scene closest-hit/shadow on TPU.

The reference hands every ray to the RT cores (traceRayEXT,
shaders/raygen.rgen:59); the TPU has no traversal hardware and per-lane
pointer chasing dies on gather latency (measured: the XLA threaded-BVH walk
runs ~3 orders of magnitude below VPU peak past 64k triangles).  This
kernel instead traverses in *packets*: one tile of rays (8x128 = 1024
lanes) shares a single scalar cursor into a threaded (skip-pointer) BVH
stream derived from :mod:`vulkan_raytracer_tpu.accel.bvh`.

Why this maps well onto a TPU core:

* The threaded layout makes the cursor **monotone increasing** (hit ->
  ``cur+1``, miss/leaf -> ``miss[cur] > cur``), so node *and* leaf-triangle
  accesses stream strictly forward.  Both tables are therefore DMA'd
  HBM -> on-chip in aligned chunks on demand — no per-lane gathers.
* Interior nodes are culled with a **conservative beam test** (interval
  arithmetic over the tile's origin box and direction interval) that is
  evaluated ONE CHUNK AT A TIME by the VPU: the node stream is field-major
  ((6, rows, 128) box components), so the 1024-node slab test is lane-wise
  vector math with no cross-sublane relayouts, and each node's traversal
  decision is pre-encoded into a single int (see ``_kernel``).  The serial
  hot path is then two SMEM reads and a sign test per visited node (~6
  scalar ops), versus ~75 for an in-loop scalar slab test — the earlier
  all-scalar variant measured ~200 ns/visit and this is what the
  "35 ns/visit" microbench floor buys.  Two measured dead ends to not
  revisit: a per-(tile, node) t_near table precomputed by XLA outside the
  kernel (57x SLOWER coherent — HBM traffic per trace swamps the walk) and
  in-kernel vectorisation over a (1, 512) row layout (40x slower — every
  op relayouts across sublanes).
* **Eight per-octant streams**: each direction octant gets its own
  near-child-first preorder (accel.bvh.octant_permutations), so coherent
  packets walk front-to-back and the running max-t kills far subtrees
  early — the software stand-in for the RT cores' ordered traversal.
  Leaf tables are re-ordered per octant too, keeping leaf DMA streaming
  forward.  A tile picks its stream by the sign of its mean live
  direction; mixed tiles just get a valid-but-unordered stream.
* Leaf intersection restores per-lane exactness: ``leaf_size`` statically
  unrolled Möller–Trumbore tests, scalar-broadcast against the full tile.
  Leaf visits are SCALAR-READ-bound, not vector-bound: a Baldwin-Weber
  leaf form (12 precomputed constants, ~30% fewer vector ops) measured
  SLOWER everywhere (swizzled 5.90 -> 5.58, bounce 0.39 -> 0.35 Mrays/s)
  because 12 SMEM broadcasts per triangle beat 9 + the vector savings —
  the 9-constant MT budget is a measured floor.  Double-buffered
  node-chunk prefetch (2-slot VMEM, next chunk's DMA issued behind the
  walk) measured NEUTRAL on every workload (swizzled 5.91 vs 5.90,
  bounce 0.38 vs 0.39) — chunk DMA latency is already off the critical
  path, so the kernel keeps the simple single-buffer refill.  2-way
  tile interleaving (two independent walks per program, hoping the
  compiler overlaps their scalar/broadcast chains) also measured
  SLIGHTLY WORSE (swizzled 5.63 vs 5.90, bounce 0.37 vs 0.39) — Mosaic
  schedules the predicated blocks in order, so the second tile only adds
  state pressure.  This kernel is at its architecture's local optimum;
  remaining cost is intrinsic (vector MT issue rate x visit counts).
* A tile whose rays all died (t bound -1) fails the beam test everywhere
  (t_near >= 0 > tmax) and exits along the miss chain in O(depth) steps —
  wavefront compaction comes free with alive-first lane ordering.

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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gatherpack import packed_gather
from .math3 import V3, v3_gather

_TILE_S, _TILE_L = 8, 128
_TILE = _TILE_S * _TILE_L
#: node-stream chunk (nodes per DMA); 8 sublane rows x 128 lanes keeps every
#: chunk block at the (8, 128) f32 Mosaic tile shape
NODE_CHUNK = 1024
#: leaf-stream chunk (leaves per DMA); multiple of 128 lanes
LEAF_CHUNK = 128

_CROWS = NODE_CHUNK // _TILE_L  # sublane rows per node chunk
_NEG_BIG = -(2**30)
_BIGF = jnp.float32(1e30)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PacketBVH:
    """Per-octant stream layout of a ThreadedBVH for the packet kernel.

    Leading axis 8 = direction octant (bit k set <=> d[k] < 0), each a
    near-child-first preorder of the same tree.  ``nodes_i`` rows are
    [first_leaf, miss]; ``first_leaf`` is the octant-local LEAF index
    (-1 for interior).  ``leaves`` columns hold one leaf each in octant
    visit order: rows j*9 + c are triangle j's Möller–Trumbore constants
    [v0.xyz, e1.xyz, e2.xyz]; padded slots are degenerate (zero edges ->
    no hit).  ``tri_id[o, leaf*K + j]`` maps back to scene triangle ids
    (-1 padding).  All padded to chunk multiples.
    """

    leaves: jax.Array  # (8, 9*leaf_size, Nleaf_pad) f32
    tri_id: jax.Array  # (8, Nt_slots) i32
    nodes_f: jax.Array  # (8, 6, Nc, 128) f32: bmin.xyz, bmax.xyz
    nodes_i: jax.Array  # (8, 2, Nc, 128) i32: first_leaf, miss
    tl_box: jax.Array  # (K, 6) f32 treelet AABBs (slightly dilated)
    tl_lim: jax.Array  # (8, K, 2) i32 per-octant stream [start, end)
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    leaf_size: int = dataclasses.field(metadata=dict(static=True))
    n_treelets: int = dataclasses.field(metadata=dict(static=True))
    #: treelet granularity the cut was built at (refit reuses it instead
    #: of re-running the upload-time probe)
    cut_tris: int = dataclasses.field(default=0, metadata=dict(static=True))


def _pad_np(x, m, fill=0.0):
    n = x.shape[-1]
    p = -(-n // m) * m - n
    if p:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, p)]
        x = np.pad(x, pad, constant_values=fill)
    return x


#: upper bound on treelets (done-bit words in the binned walk = K/32)
MAX_TREELETS = 128
#: default target triangle slots per treelet (VKRT_TREELET_TRIS overrides,
#: read at build time so tests/tuning can vary it per scene upload).
#: 2048 is the windowed-walk sweet spot measured on the 256k-tri hall
#: (tools/bench_windowed.py: K=128 beats K=64 and K=32; K=256 is noise-
#: level better but doubles the window-glue arrays)
TREELET_TRIS = 2048


def _build_streams(bvh):
    """The heavy half of :func:`build_packet_bvh`: the 8 per-octant node/
    leaf streams plus the per-octant node position maps the (cheap) cut
    tables are sliced from — shared across treelet-cut candidates by the
    upload-time probe (:func:`_probe_treelet_cut`)."""
    from ..accel.bvh import octant_permutations

    k = bvh.leaf_size
    if bvh.num_tri_slots >= 2**24 or bvh.num_nodes >= 2**24:
        raise ValueError("packet stream indices exceed 2^24 guard")

    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)
    first = np.asarray(bvh.first_tri)
    miss = np.asarray(bvh.miss)
    tri_id = np.asarray(bvh.tri_id)
    n = first.shape[0]
    size = miss - np.arange(n)
    first_leaf = np.where(first >= 0, first // k, -1)
    # (Nleaf, 9k) leaf-major triangle constants, original leaf order
    tri9 = np.concatenate(
        [np.asarray(bvh.tri_v0), np.asarray(bvh.tri_e1), np.asarray(bvh.tri_e2)],
        axis=1,
    ).reshape(-1, k * 9)

    perms = octant_permutations(amin, amax, first, miss)
    pos8 = np.empty((8, n), np.int64)  # old node index -> stream position

    nf, ni, lv, tid = [], [], [], []
    for o in range(8):
        old = perms[o]  # new node index -> old node index
        pos8[o, old] = np.arange(n)
        fl_old = first_leaf[old]
        leafmask = fl_old >= 0
        # renumber leaves along this octant's preorder -> forward streaming
        fl_new = np.where(leafmask, np.cumsum(leafmask) - 1, -1).astype(np.int64)
        leaf_perm = fl_old[leafmask]  # new leaf index -> old leaf index
        nf.append(
            _pad_np(
                np.concatenate([amin[old].T, amax[old].T], axis=0).astype(
                    np.float32
                ),
                NODE_CHUNK,
            ).reshape(6, -1, 128)
        )
        ni.append(
            np.stack(
                [
                    _pad_np(fl_new[None], NODE_CHUNK, -1)[0],
                    _pad_np(
                        (np.arange(n) + size[old])[None], NODE_CHUNK, n
                    )[0],
                ],
                axis=0,
            )
            .astype(np.int32)
            .reshape(2, -1, 128)
        )
        lv.append(_pad_np(tri9[leaf_perm].T.astype(np.float32), LEAF_CHUNK))
        tid.append(tri_id.reshape(-1, k)[leaf_perm].reshape(-1).astype(np.int32))

    return dict(
        leaves=jnp.asarray(np.stack(lv)),
        tri_id=jnp.asarray(np.stack(tid)),
        nodes_f=jnp.asarray(np.stack(nf)),
        nodes_i=jnp.asarray(np.stack(ni)),
        pos8=pos8,
    )


def _cut_tables(bvh, pos8, max_tris: int):
    """Treelet-cut tables for a given granularity (cheap per candidate).

    Picks max_tris so the cut fits the cap (each halving of the frontier
    roughly halves the count); the windowed walk has no done-bit words,
    so its cut may be finer than the binned walk's 128 cap
    (VKRT_MAX_TREELETS tunes)."""
    from ..accel.bvh import treelet_cut

    k = bvh.leaf_size
    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)
    first = np.asarray(bvh.first_tri)
    miss = np.asarray(bvh.miss)
    n = first.shape[0]
    cap = int(os.environ.get("VKRT_MAX_TREELETS", MAX_TREELETS))
    max_tris = max(int(max_tris), k)
    cut = treelet_cut(first, miss, k, max_tris)
    while cut.shape[0] > cap:
        max_tris *= 2
        cut = treelet_cut(first, miss, k, max_tris)
    kt = cut.shape[0]
    ext = amax[cut] - amin[cut]
    eps = 1e-5 * np.maximum(ext.max(axis=1, keepdims=True), 1e-3) + 1e-7
    tl_box = np.concatenate([amin[cut] - eps, amax[cut] + eps], axis=1).astype(
        np.float32
    )
    tsize = (miss - np.arange(n))[cut]  # subtree node count, swap-invariant
    tl_lim = np.empty((8, kt, 2), np.int32)
    for o in range(8):
        tl_lim[o, :, 0] = pos8[o][cut]
        tl_lim[o, :, 1] = pos8[o][cut] + tsize
    return jnp.asarray(tl_box), jnp.asarray(tl_lim), kt


def _assemble(bvh, streams, tl_box, tl_lim, kt, cut_tris=0) -> PacketBVH:
    return PacketBVH(
        leaves=streams["leaves"],
        tri_id=streams["tri_id"],
        nodes_f=streams["nodes_f"],
        nodes_i=streams["nodes_i"],
        tl_box=tl_box,
        tl_lim=tl_lim,
        num_nodes=bvh.num_nodes,
        leaf_size=bvh.leaf_size,
        n_treelets=kt,
        cut_tris=cut_tris,
    )


def build_packet_bvh(bvh, max_tris=None) -> PacketBVH:
    """Repack a ThreadedBVH into 8 per-octant packet streams (host-side).

    Treelet granularity: ``max_tris`` argument > ``VKRT_TREELET_TRIS``
    env > a measured upload-time probe on TPU (2-3 candidate cuts timed
    on a synthetic bounce wave, :func:`_probe_treelet_cut` — treelet
    preference is scene-shape-sensitive and the SA-heuristic predictor
    was disproved, DESIGN.md §r4) > the ``TREELET_TRIS`` default."""
    streams = _build_streams(bvh)
    if max_tris is None:
        env = os.environ.get("VKRT_TREELET_TRIS")
        if env is not None:
            max_tris = int(env)
        else:
            max_tris = _probe_treelet_cut(bvh, streams)
    tl_box, tl_lim, kt = _cut_tables(bvh, streams["pos8"], max_tris)
    return _assemble(bvh, streams, tl_box, tl_lim, kt, cut_tris=int(max_tris))


#: candidate treelet granularities for the upload-time probe (measured:
#: the 256k-tri hall prefers 2048, the displaced-sphere dragon 8192 —
#: +9% there, DESIGN.md §r4)
PROBE_CUTS = (2048, 8192)
#: probe wave: lanes (64 tiles) per candidate timing rep
_PROBE_LANES = 64 * _TILE


def _probe_treelet_cut(bvh, streams) -> int:
    """Pick treelet granularity by MEASUREMENT at upload (VERDICT r4
    item 4): time the windowed closest-hit walk on a synthetic sorted
    diffuse bounce wave (cosine lobes off random scene triangles) for
    each candidate cut and keep the winner.  All candidates share the
    node/leaf streams and — because the window tables are padded to the
    treelet cap — one compiled kernel, so the probe costs one kernel
    compile plus ~a second of timing, amortised over any real render.
    Skipped off-TPU, for small scenes, and under VKRT_NO_TREELET_PROBE."""
    import time as _time

    if (
        jax.default_backend() != "tpu"
        or os.environ.get("VKRT_NO_TREELET_PROBE")
        or bvh.num_tri_slots < 4 * PROBE_CUTS[-1]
    ):
        return TREELET_TRIS

    from .math3 import V3 as _V3

    # synthetic bounce wave: origins just off random triangle surfaces,
    # cosine-distributed directions, production (octant, morton) sort
    rng = np.random.default_rng(0)
    v0 = np.asarray(bvh.tri_v0)
    e1 = np.asarray(bvh.tri_e1)
    e2 = np.asarray(bvh.tri_e2)
    real = (np.abs(e1).sum(1) + np.abs(e2).sum(1)) > 0
    idx = rng.choice(np.flatnonzero(real), _PROBE_LANES)
    c = v0[idx] + (e1[idx] + e2[idx]) / 3.0
    nrm = np.cross(e1[idx], e2[idx])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    nrm *= np.where(rng.random(_PROBE_LANES) < 0.5, 1.0, -1.0)[:, None]
    u1, u2 = rng.random(_PROBE_LANES), rng.random(_PROBE_LANES)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    tang = np.cross(nrm, [0.577, 0.577, 0.577])
    tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-20)
    bit = np.cross(nrm, tang)
    d = (r * np.cos(phi))[:, None] * tang + (r * np.sin(phi))[:, None] * bit \
        + np.sqrt(np.maximum(1 - u1, 0))[:, None] * nrm
    # degenerate lanes (nrm parallel to the fixed tangent seed, u1 ~ 1)
    # can yield a near-zero d; keep them finite — they trace as a normal-
    # direction ray and cost the probe nothing
    nd = np.linalg.norm(d, axis=1, keepdims=True)
    d = np.where(nd > 1e-12, d / np.maximum(nd, 1e-20), nrm)
    root_lo = np.asarray(bvh.aabb_min[0])
    root_hi = np.asarray(bvh.aabb_max[0])
    diag = float(np.linalg.norm(root_hi - root_lo))
    o = (c + 1e-4 * diag * nrm).astype(np.float32)
    d = d.astype(np.float32)
    cell = np.clip(
        (o - root_lo) * (64.0 / np.maximum(root_hi - root_lo, 1e-20)), 0, 63
    ).astype(np.uint32)
    m = np.zeros(_PROBE_LANES, np.uint32)
    for i in range(6):
        for k in range(3):
            m |= ((cell[:, k] >> i) & 1) << (3 * i + (2 - k))
    octant = ((d[:, 0] < 0) * 4 + (d[:, 1] < 0) * 2 + (d[:, 2] < 0)).astype(
        np.uint32
    )
    order = np.argsort((octant << 27) | (m << 9), kind="stable")
    ov = _V3(*(jnp.asarray(np.ascontiguousarray(o[order, k])) for k in range(3)))
    dv = _V3(*(jnp.asarray(np.ascontiguousarray(d[order, k])) for k in range(3)))
    t_lo = jnp.full((_PROBE_LANES,), 1e-4 * diag, jnp.float32)
    t0 = jnp.full((_PROBE_LANES,), _BIGF, jnp.float32)

    best, best_cut = np.inf, TREELET_TRIS
    for cut in PROBE_CUTS:
        tl_box, tl_lim, kt = _cut_tables(bvh, streams["pos8"], cut)
        if kt <= 1:
            continue
        pb = _assemble(bvh, streams, tl_box, tl_lim, kt)
        f = jax.jit(
            lambda ov, dv, pb=pb: _windowed_sweep(
                pb, ov, dv, t_lo, t0, shadow=False
            )
        )
        jax.block_until_ready(f(ov, dv))  # compile (shared across cuts)
        dt = np.inf
        for _ in range(2):
            s = _time.perf_counter()
            jax.block_until_ready(f(ov, dv))
            dt = min(dt, _time.perf_counter() - s)
        if dt < best:
            best, best_cut = dt, cut
    return best_cut


def _tile_beam_bounds(rays, t_init):
    """Per-tile beam scalars + stream octant, precomputed at full VPU rate
    outside the kernel: origin box [olo, ohi] per axis and direction
    reciprocal interval [ia, ib] per axis -> (T, 12) f32, plus the octant
    of the mean live direction -> (T, 1) i32.  Dead lanes (t_init < 0) are
    excluded so padding/retired lanes don't dilate the beam."""
    ox, oy, oz, dx, dy, dz = rays
    t = t_init.reshape(-1, _TILE)
    dead = t < 0.0

    def lohi(x):
        xt = x.reshape(-1, _TILE)
        lo = jnp.min(jnp.where(dead, _BIGF, xt), axis=1)
        hi = jnp.max(jnp.where(dead, -_BIGF, xt), axis=1)
        return lo, hi

    def inv_interval(d):
        dt = d.reshape(-1, _TILE)
        d_lo = jnp.min(jnp.where(dead, _BIGF, dt), axis=1)
        d_hi = jnp.max(jnp.where(dead, -_BIGF, dt), axis=1)
        uni = (d_lo > 0.0) | (d_hi < 0.0)
        ia = jnp.where(uni, 1.0 / jnp.where(d_hi == 0.0, -1e-30, d_hi), -_BIGF)
        ib = jnp.where(uni, 1.0 / jnp.where(d_lo == 0.0, 1e-30, d_lo), _BIGF)
        return ia, ib

    def mean_neg(d):
        dt = d.reshape(-1, _TILE)
        return jnp.sum(jnp.where(dead, 0.0, dt), axis=1) < 0.0

    olx, ohx = lohi(ox)
    oly, ohy = lohi(oy)
    olz, ohz = lohi(oz)
    iax, ibx = inv_interval(dx)
    iay, iby = inv_interval(dy)
    iaz, ibz = inv_interval(dz)
    bounds = jnp.stack(
        [olx, ohx, oly, ohy, olz, ohz, iax, ibx, iay, iby, iaz, ibz], axis=1
    )
    octs = (
        mean_neg(dx).astype(jnp.int32)
        + 2 * mean_neg(dy).astype(jnp.int32)
        + 4 * mean_neg(dz).astype(jnp.int32)
    )[:, None]
    return bounds, octs


def _kernel(
    bounds_ref,
    oct_ref,
    lim_ref,
    nodes_f_hbm,
    nodes_i_hbm,
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
    *rest,
    leaf_size: int,
    shadow: bool,
    stats: bool = False,
):
    if stats:
        statsout, *rest = rest
    (
        code_s,
        lf_s,
        base_s,
        tmax_s,
        cnt_s,
        nf_v,
        ni_v,
        code_v,
        tb_ref,
        sb_ref,
        sems,
    ) = rest
    """Vector-culled packet walk.  Per 1024-node chunk, ONE vectorised pass
    evaluates the beam slab test for all nodes ((rows, 128) lane-wise math
    on the field-major stream) and pre-encodes each node's decision:

      code[n] = miss[n]            dead (beam miss / beaten by tmax)
              = n + 1              alive interior -> descend
              = -(first_leaf + 2)  alive leaf     -> intersect, then miss[n]

    so the serial hot path is two SMEM reads and a sign test.  The tmax
    snapshot taken at chunk entry is conservative: t tightens only at
    leaves, so late chunk nodes may run a stale (looser) test — extra
    visits, never misses.
    """
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    t_lo = tlo_ref[:]

    tb_ref[:] = t0_ref[:]
    sb_ref[:] = jnp.full((_TILE_S, _TILE_L), -1, jnp.int32)
    base_s[0] = _NEG_BIG  # node chunk base
    base_s[1] = _NEG_BIG  # leaf chunk base
    tmax_s[0] = jnp.max(tb_ref[:])
    if stats:
        cnt_s[0] = 0  # node visits
        cnt_s[1] = 0  # leaf visits
        cnt_s[2] = 0  # node-chunk refills
        cnt_s[3] = 0  # leaf-chunk DMAs
    # Mosaic SMEM blocks need sublane counts divisible by 8, so programs
    # share (8, .) blocks of the per-tile tables and read their own row
    row = pl.program_id(0) % 8
    oct_i = oct_ref[row, 0]
    # per-tile walk window [start, end): the whole tree for a plain sweep,
    # one treelet subtree for the binned walk (contiguous in every octant
    # stream — see accel.bvh.treelet_cut)
    start_i = lim_ref[row, 0]
    end_i = lim_ref[row, 1]

    olx, ohx = bounds_ref[row, 0], bounds_ref[row, 1]
    oly, ohy = bounds_ref[row, 2], bounds_ref[row, 3]
    olz, ohz = bounds_ref[row, 4], bounds_ref[row, 5]
    iax, ibx = bounds_ref[row, 6], bounds_ref[row, 7]
    iay, iby = bounds_ref[row, 8], bounds_ref[row, 9]
    iaz, ibz = bounds_ref[row, 10], bounds_ref[row, 11]

    def axis_bounds(bmin, bmax, olo, ohi, ia, ib):
        a = bmin - ohi
        b = bmin - olo
        c = bmax - ohi
        e = bmax - olo
        near = jnp.minimum(
            jnp.minimum(jnp.minimum(a * ia, a * ib), jnp.minimum(b * ia, b * ib)),
            jnp.minimum(jnp.minimum(c * ia, c * ib), jnp.minimum(e * ia, e * ib)),
        )
        far = jnp.maximum(
            jnp.maximum(jnp.maximum(a * ia, a * ib), jnp.maximum(b * ia, b * ib)),
            jnp.maximum(jnp.maximum(c * ia, c * ib), jnp.maximum(e * ia, e * ib)),
        )
        return near, far

    def body(cur):
        # ---- chunk entry: DMA fields, vector-cull, encode decisions -----
        @pl.when(cur >= base_s[0] + NODE_CHUNK)
        def _():
            # refresh the beam's scalar t bound here, ONCE per chunk: the
            # vector->scalar max reduce costs ~600 cycles, which used to
            # run after EVERY leaf visit and dominated the leaf budget —
            # per-chunk refresh is conservative (stale = looser test =
            # extra visits, never misses) and measured strictly faster
            tmax_s[0] = jnp.max(tb_ref[:])
            nb = pl.multiple_of((cur // NODE_CHUNK) * NODE_CHUNK, NODE_CHUNK)
            rb = pl.multiple_of(nb // _TILE_L, _CROWS)
            cpf = pltpu.make_async_copy(
                nodes_f_hbm.at[oct_i, :, pl.ds(rb, _CROWS), :], nf_v, sems.at[0]
            )
            cpf.start()
            cpi = pltpu.make_async_copy(
                nodes_i_hbm.at[oct_i, :, pl.ds(rb, _CROWS), :], ni_v, sems.at[1]
            )
            cpi.start()
            cpf.wait()
            cpi.wait()

            n_x, f_x = axis_bounds(nf_v[0], nf_v[3], olx, ohx, iax, ibx)
            n_y, f_y = axis_bounds(nf_v[1], nf_v[4], oly, ohy, iay, iby)
            n_z, f_z = axis_bounds(nf_v[2], nf_v[5], olz, ohz, iaz, ibz)
            t_near = jnp.maximum(
                jnp.maximum(n_x, n_y), jnp.maximum(n_z, jnp.float32(0.0))
            )
            t_far = jnp.minimum(jnp.minimum(f_x, f_y), f_z)
            alive = (t_near <= t_far) & (t_near <= tmax_s[0])
            fl = ni_v[0]
            miss = ni_v[1]
            nxt1 = (
                nb
                + 1
                + jax.lax.broadcasted_iota(jnp.int32, (_CROWS, _TILE_L), 0)
                * _TILE_L
                + jax.lax.broadcasted_iota(jnp.int32, (_CROWS, _TILE_L), 1)
            )
            code_v[:] = jnp.where(alive, jnp.where(fl >= 0, -fl - 2, nxt1), miss)
            cpc = pltpu.make_async_copy(code_v, code_s, sems.at[2])
            cpc.start()
            cpc.wait()
            base_s[0] = nb
            if stats:
                cnt_s[2] = cnt_s[2] + 1

        if stats:
            cnt_s[0] = cnt_s[0] + 1
        off = cur - base_s[0]
        code = code_s[off >> 7, off & 127]
        is_leaf = code < -1

        # ---- leaf: unrolled MT over the tile ----------------------------
        @pl.when(is_leaf)
        def _():
            first_leaf = -code - 2

            @pl.when(
                (first_leaf < base_s[1]) | (first_leaf >= base_s[1] + LEAF_CHUNK)
            )
            def _():
                lb = pl.multiple_of(
                    (first_leaf // LEAF_CHUNK) * LEAF_CHUNK, LEAF_CHUNK
                )
                cp = pltpu.make_async_copy(
                    leaves_hbm.at[oct_i, :, pl.ds(lb, LEAF_CHUNK)],
                    lf_s,
                    sems.at[1],
                )
                cp.start()
                cp.wait()
                base_s[1] = lb
                if stats:
                    cnt_s[3] = cnt_s[3] + 1

            if stats:
                cnt_s[1] = cnt_s[1] + 1
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
                    # stops passing beam tests (terminate-on-first-hit,
                    # lightsample.glsl:27)
                    tb_v = jnp.where(hit, -1.0, tb_v)
                    sb_v = jnp.where(hit, first_leaf * leaf_size + j, sb_v)
                else:
                    replace = hit & ((tt < tb_v) | (sb_v < 0))
                    tb_v = jnp.where(replace, tt, tb_v)
                    sb_v = jnp.where(replace, first_leaf * leaf_size + j, sb_v)

            tb_ref[:] = tb_v
            sb_ref[:] = sb_v

        # a leaf's skip pointer is always cur + 1: its preorder subtree is
        # itself, so miss = index + size = cur + 1 — no miss table needed
        return jnp.where(is_leaf, cur + 1, code)

    jax.lax.while_loop(lambda cur: cur < end_i, body, start_i)
    tout[:] = tb_ref[:]
    slotout[:] = sb_ref[:]
    if stats:
        r = jax.lax.broadcasted_iota(jnp.int32, (_TILE_S, _TILE_L), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (_TILE_S, _TILE_L), 1)
        vals = jnp.where(
            r == 0,
            cnt_s[0],
            jnp.where(r == 1, cnt_s[1], jnp.where(r == 2, cnt_s[2], cnt_s[3])),
        )
        statsout[:] = jnp.where((c == 0) & (r < 4), vals, 0)


@functools.partial(
    jax.jit, static_argnames=("leaf_size", "shadow", "stats")
)
def _packet_sweep(
    pb_arrays, bounds, octs, lims, rays, t_lo, t_init, leaf_size, shadow, stats=False
):
    nodes_f, nodes_i, leaves = pb_arrays
    n_rows = rays[0].shape[0]
    grid = (n_rows // _TILE_S,)
    ray_spec = pl.BlockSpec(
        (_TILE_S, _TILE_L), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    # (8, .) tile-table blocks shared by 8 consecutive programs (Mosaic
    # requires sublane counts divisible by 8); rows padded to match
    t_pad = -(-bounds.shape[0] // 8) * 8 - bounds.shape[0]
    if t_pad:
        bounds = jnp.pad(bounds, ((0, t_pad), (0, 0)))
        octs = jnp.pad(octs, ((0, t_pad), (0, 0)))
        lims = jnp.pad(lims, ((0, t_pad), (0, 0)))
    bounds_spec = pl.BlockSpec((8, 12), lambda i: (i // 8, 0), memory_space=pltpu.SMEM)
    oct_spec = pl.BlockSpec((8, 1), lambda i: (i // 8, 0), memory_space=pltpu.SMEM)
    lim_spec = pl.BlockSpec((8, 2), lambda i: (i // 8, 0), memory_space=pltpu.SMEM)
    out_specs = (ray_spec, ray_spec)
    out_shape = (
        jax.ShapeDtypeStruct((n_rows, _TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((n_rows, _TILE_L), jnp.int32),
    )
    if stats:
        out_specs = out_specs + (ray_spec,)
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((n_rows, _TILE_L), jnp.int32),
        )
    return pl.pallas_call(
        functools.partial(
            _kernel, leaf_size=leaf_size, shadow=shadow, stats=stats
        ),
        grid=grid,
        in_specs=[bounds_spec, oct_spec, lim_spec] + [any_spec] * 3 + [ray_spec] * 8,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((_CROWS, _TILE_L), jnp.int32),  # code_s
            pltpu.SMEM((9 * leaf_size, LEAF_CHUNK), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),  # cnt_s (stats)
            pltpu.VMEM((6, _CROWS, _TILE_L), jnp.float32),  # nf_v
            pltpu.VMEM((2, _CROWS, _TILE_L), jnp.int32),  # ni_v
            pltpu.VMEM((_CROWS, _TILE_L), jnp.int32),  # code_v
            pltpu.VMEM((_TILE_S, _TILE_L), jnp.float32),
            pltpu.VMEM((_TILE_S, _TILE_L), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=bool(os.environ.get("VKRT_PALLAS_INTERPRET")),
    )(bounds, octs, lims, nodes_f, nodes_i, leaves, *rays, t_lo, t_init)


def _wkernel(
    win_f_ref,
    win_i_ref,
    nwin_ref,
    oct_ref,
    nodes_f_hbm,
    nodes_i_hbm,
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
    *rest,
    leaf_size: int,
    shadow: bool,
    stats: bool = False,
    strict: bool = False,
):
    if stats:
        statsout, *rest = rest
    (
        code_s,
        lf_s,
        base_s,
        tmax_s,
        cnt_s,
        nf_v,
        ni_v,
        code_v,
        tb_ref,
        sb_ref,
        sems,
    ) = rest
    """Tile-windowed treelet walk (round 4).

    The shared-beam sweep's bounds come from ALL 1024 lanes, so a diffuse
    tile's beam is near scene-wide and visits ~32% of the tree.  Here the
    XLA glue (:func:`_window_glue`) has already slab-tested every ray
    against the treelet cut at full VPU rate and produced, per tile, a
    front-to-back list of WINDOWS — one per treelet any live lane
    personally enters — each carrying interval bounds computed from ONLY
    the entering lanes.  The kernel walks each window's node range with
    the same chunk-cull body as :func:`_kernel`; per-lane t carries across
    windows, and because windows are sorted by min entry t, the outer loop
    STOPS outright once the next window's entry exceeds the running max t
    (per-ray-style early termination the shared beam cannot express).
    Rays never move: no pair expansion, no gathers, no scatters — the glue
    the round-3 binned walk lost to (DESIGN.md §3 item 1) does not exist.
    Cost-model sim on production-wave tiles (tools/sim_windowed.py):
    9158 -> 6192 node and 4403 -> 2927 leaf visits/tile, x1.50.
    """
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    t_lo = tlo_ref[:]

    tb_ref[:] = t0_ref[:]
    sb_ref[:] = jnp.full((_TILE_S, _TILE_L), -1, jnp.int32)
    base_s[1] = _NEG_BIG  # leaf chunk base (valid across windows)
    base_s[2] = _NEG_BIG  # node DATA chunk resident in nf_v/ni_v — the
    # raw stream never changes, so residency survives window changes;
    # only the cull CODES (base_s[0]) go stale when the beam bounds move
    if stats:
        cnt_s[0] = 0  # node visits
        cnt_s[1] = 0  # leaf visits
        cnt_s[2] = 0  # chunk cull passes (code rebuild + SMEM copy)
        cnt_s[3] = 0  # node-data HBM DMAs
        cnt_s[4] = 0  # leaf-chunk HBM DMAs
        cnt_s[5] = 0  # windows entered (walked)
        cnt_s[6] = 0  # window-loop iterations

    row = pl.program_id(0) % 8
    oct_i = oct_ref[row, 0]
    n_win = nwin_ref[row, 0]

    def window(w):
        # refresh the beam's scalar t bound at window entry; entries are
        # ascending, so entry > tmax ends the whole tile (return n_win)
        tmax_s[0] = jnp.max(tb_ref[:])
        entry = win_f_ref[w, 0]
        if stats:
            cnt_s[6] = cnt_s[6] + 1

        @pl.when(entry <= tmax_s[0])
        def _():
            if stats:
                cnt_s[5] = cnt_s[5] + 1
            start_i = win_i_ref[w, 0]
            end_i = win_i_ref[w, 1]
            olx, ohx = win_f_ref[w, 1], win_f_ref[w, 2]
            oly, ohy = win_f_ref[w, 3], win_f_ref[w, 4]
            olz, ohz = win_f_ref[w, 5], win_f_ref[w, 6]
            iax, ibx = win_f_ref[w, 7], win_f_ref[w, 8]
            iay, iby = win_f_ref[w, 9], win_f_ref[w, 10]
            iaz, ibz = win_f_ref[w, 11], win_f_ref[w, 12]
            base_s[0] = _NEG_BIG  # bounds changed: invalidate code cache

            def axis_bounds(bmin, bmax, olo, ohi, ia, ib):
                a = bmin - ohi
                b = bmin - olo
                c = bmax - ohi
                e = bmax - olo
                near = jnp.minimum(
                    jnp.minimum(jnp.minimum(a * ia, a * ib), jnp.minimum(b * ia, b * ib)),
                    jnp.minimum(jnp.minimum(c * ia, c * ib), jnp.minimum(e * ia, e * ib)),
                )
                far = jnp.maximum(
                    jnp.maximum(jnp.maximum(a * ia, a * ib), jnp.maximum(b * ia, b * ib)),
                    jnp.maximum(jnp.maximum(c * ia, c * ib), jnp.maximum(e * ia, e * ib)),
                )
                return near, far

            def body(cur):
                @pl.when(cur >= base_s[0] + NODE_CHUNK)
                def _():
                    tmax_s[0] = jnp.max(tb_ref[:])
                    nb = pl.multiple_of(
                        (cur // NODE_CHUNK) * NODE_CHUNK, NODE_CHUNK
                    )

                    # DMA only when the chunk is NOT already resident:
                    # consecutive windows usually land in the same chunk
                    # (a 2048-tri treelet spans ~256 of its 1024 nodes),
                    # and their re-entry previously re-pulled the same
                    # 32 KiB from HBM every time (round-5 fix; the
                    # re-CULL below still runs — bounds moved)
                    @pl.when(nb != base_s[2])
                    def _():
                        rb = pl.multiple_of(nb // _TILE_L, _CROWS)
                        cpf = pltpu.make_async_copy(
                            nodes_f_hbm.at[oct_i, :, pl.ds(rb, _CROWS), :],
                            nf_v,
                            sems.at[0],
                        )
                        cpf.start()
                        cpi = pltpu.make_async_copy(
                            nodes_i_hbm.at[oct_i, :, pl.ds(rb, _CROWS), :],
                            ni_v,
                            sems.at[1],
                        )
                        cpi.start()
                        cpf.wait()
                        cpi.wait()
                        base_s[2] = nb
                        if stats:
                            cnt_s[3] = cnt_s[3] + 1

                    n_x, f_x = axis_bounds(nf_v[0], nf_v[3], olx, ohx, iax, ibx)
                    n_y, f_y = axis_bounds(nf_v[1], nf_v[4], oly, ohy, iay, iby)
                    n_z, f_z = axis_bounds(nf_v[2], nf_v[5], olz, ohz, iaz, ibz)
                    t_near = jnp.maximum(
                        jnp.maximum(n_x, n_y), jnp.maximum(n_z, jnp.float32(0.0))
                    )
                    t_far = jnp.minimum(jnp.minimum(f_x, f_y), f_z)
                    alive = (t_near <= t_far) & (t_near <= tmax_s[0])
                    fl = ni_v[0]
                    miss = ni_v[1]
                    nxt1 = (
                        nb
                        + 1
                        + jax.lax.broadcasted_iota(
                            jnp.int32, (_CROWS, _TILE_L), 0
                        )
                        * _TILE_L
                        + jax.lax.broadcasted_iota(
                            jnp.int32, (_CROWS, _TILE_L), 1
                        )
                    )
                    code_v[:] = jnp.where(
                        alive, jnp.where(fl >= 0, -fl - 2, nxt1), miss
                    )
                    cpc = pltpu.make_async_copy(code_v, code_s, sems.at[2])
                    cpc.start()
                    cpc.wait()
                    base_s[0] = nb
                    if stats:
                        cnt_s[2] = cnt_s[2] + 1

                if stats:
                    cnt_s[0] = cnt_s[0] + 1
                off = cur - base_s[0]
                code = code_s[off >> 7, off & 127]
                is_leaf = code < -1

                @pl.when(is_leaf)
                def _():
                    first_leaf = -code - 2

                    @pl.when(
                        (first_leaf < base_s[1])
                        | (first_leaf >= base_s[1] + LEAF_CHUNK)
                    )
                    def _():
                        lb = pl.multiple_of(
                            (first_leaf // LEAF_CHUNK) * LEAF_CHUNK, LEAF_CHUNK
                        )
                        cp = pltpu.make_async_copy(
                            leaves_hbm.at[oct_i, :, pl.ds(lb, LEAF_CHUNK)],
                            lf_s,
                            sems.at[1],
                        )
                        cp.start()
                        cp.wait()
                        base_s[1] = lb
                        if stats:
                            cnt_s[4] = cnt_s[4] + 1

                    if stats:
                        cnt_s[1] = cnt_s[1] + 1
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
                            # strict (phase 2): only strictly-closer hits
                            # may displace the phase-1 winner carried in
                            # the combine outside; shadow keeps <= (any
                            # occluder within t_max counts, idempotent)
                            & ((tt < tb_v) if strict and not shadow
                               else (tt <= tb_v))
                        )
                        if shadow:
                            tb_v = jnp.where(hit, -1.0, tb_v)
                            sb_v = jnp.where(
                                hit, first_leaf * leaf_size + j, sb_v
                            )
                        else:
                            replace = (
                                hit if strict
                                else hit & ((tt < tb_v) | (sb_v < 0))
                            )
                            tb_v = jnp.where(replace, tt, tb_v)
                            sb_v = jnp.where(
                                replace, first_leaf * leaf_size + j, sb_v
                            )

                    tb_ref[:] = tb_v
                    sb_ref[:] = sb_v

                return jnp.where(is_leaf, cur + 1, code)

            jax.lax.while_loop(lambda cur: cur < end_i, body, start_i)

        # ascending entries: a window beyond tmax ends the tile outright
        return jnp.where(entry <= tmax_s[0], w + 1, n_win)

    jax.lax.while_loop(lambda w: w < n_win, window, jnp.int32(0))
    tout[:] = tb_ref[:]
    slotout[:] = sb_ref[:]
    if stats:
        r = jax.lax.broadcasted_iota(jnp.int32, (_TILE_S, _TILE_L), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (_TILE_S, _TILE_L), 1)
        vals = cnt_s[0]
        for i in range(1, 7):
            vals = jnp.where(r == i, cnt_s[i], vals)
        statsout[:] = jnp.where((c == 0) & (r < 7), vals, 0)


@functools.partial(
    jax.jit, static_argnames=("leaf_size", "shadow", "stats", "strict")
)
def _windowed_sweep_call(
    pb_arrays, win_f, win_i, nwin, octs, rays, t_lo, t_init, leaf_size, shadow,
    stats=False, strict=False,
):
    nodes_f, nodes_i, leaves = pb_arrays
    n_rows = rays[0].shape[0]
    n_tiles = n_rows // _TILE_S
    kp = win_f.shape[1]
    grid = (n_tiles,)
    ray_spec = pl.BlockSpec(
        (_TILE_S, _TILE_L), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    t_pad = -(-n_tiles // 8) * 8 - n_tiles
    if t_pad:
        octs = jnp.pad(octs, ((0, t_pad), (0, 0)))
        nwin = jnp.pad(nwin, ((0, t_pad), (0, 0)))
    win_f_spec = pl.BlockSpec(
        (kp, 16), lambda i: (i, 0), memory_space=pltpu.SMEM
    )
    win_i_spec = pl.BlockSpec(
        (kp, 2), lambda i: (i, 0), memory_space=pltpu.SMEM
    )
    oct_spec = pl.BlockSpec((8, 1), lambda i: (i // 8, 0), memory_space=pltpu.SMEM)
    out_specs = (ray_spec, ray_spec)
    out_shape = (
        jax.ShapeDtypeStruct((n_rows, _TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((n_rows, _TILE_L), jnp.int32),
    )
    if stats:
        out_specs = out_specs + (ray_spec,)
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((n_rows, _TILE_L), jnp.int32),
        )
    return pl.pallas_call(
        functools.partial(
            _wkernel, leaf_size=leaf_size, shadow=shadow, stats=stats,
            strict=strict,
        ),
        grid=grid,
        in_specs=[win_f_spec, win_i_spec, oct_spec, oct_spec]
        + [any_spec] * 3
        + [ray_spec] * 8,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((_CROWS, _TILE_L), jnp.int32),  # code_s
            pltpu.SMEM((9 * leaf_size, LEAF_CHUNK), jnp.float32),
            pltpu.SMEM((3,), jnp.int32),  # code base, leaf base, data base
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SMEM((7,), jnp.int32),  # cnt_s (stats)
            pltpu.VMEM((6, _CROWS, _TILE_L), jnp.float32),  # nf_v
            pltpu.VMEM((2, _CROWS, _TILE_L), jnp.int32),  # ni_v
            pltpu.VMEM((_CROWS, _TILE_L), jnp.int32),  # code_v
            pltpu.VMEM((_TILE_S, _TILE_L), jnp.float32),
            pltpu.VMEM((_TILE_S, _TILE_L), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=bool(os.environ.get("VKRT_PALLAS_INTERPRET")),
    )(
        win_f.reshape(-1, 16),
        win_i.reshape(-1, 2),
        nwin,
        octs,
        nodes_f,
        nodes_i,
        leaves,
        *rays,
        t_lo,
        t_init,
    )


def _window_glue(pb: PacketBVH, rays, t_lo_p, t_init, octs, walked=None):
    """Per-tile front-to-back treelet window tables, built at full VPU
    rate in XLA: exact per-ray slab tests against the treelet cut, then
    masked per-(tile, treelet) reductions give each window interval
    bounds over ONLY its entering live lanes.  ``walked`` (T, K) bool
    masks treelets already walked by an earlier phase (see
    :func:`_windowed_sweep`'s two-phase schedule).  Returns
    (win_f (T, Kp, 16) f32 [entry, 12 bounds, pad], win_i (T, Kp, 2) i32
    stream windows in the tile's octant, nwin (T, 1) i32,
    order (T, K) i32 treelet ids in window order)."""
    kk = int(pb.n_treelets)
    # pad the window tables to the treelet CAP, not the scene's K: every
    # upload-time probe candidate (and any same-node-count rebuild) then
    # shares one compiled kernel — K only varies the nwin loop bound
    cap = int(os.environ.get("VKRT_MAX_TREELETS", MAX_TREELETS))
    kp = -(-max(kk, cap) // 8) * 8
    box = pb.tl_box  # (K, 6)
    n_tiles = t_init.shape[0] // _TILE_S
    lane = lambda x: x.reshape(n_tiles, _TILE)
    ox, oy, oz, dx, dy, dz = (lane(r) for r in rays)
    t_init_l = lane(t_init)
    t_lo_l = lane(t_lo_p)
    live = t_init_l >= 0.0

    ivx, ivy, ivz = _inv_comp(dx), _inv_comp(dy), _inv_comp(dz)

    def axis(bmin, bmax, o, iv):
        a = (bmin - o[..., None]) * iv[..., None]
        b = (bmax - o[..., None]) * iv[..., None]
        return jnp.minimum(a, b), jnp.maximum(a, b)

    n1, f1 = axis(box[:, 0], box[:, 3], ox, ivx)
    n2, f2 = axis(box[:, 1], box[:, 4], oy, ivy)
    n3, f3 = axis(box[:, 2], box[:, 5], oz, ivz)
    near = jnp.maximum(jnp.maximum(n1, n2), n3)
    far = jnp.minimum(jnp.minimum(f1, f2), f3)
    enters = (
        live[..., None]
        & (near <= far)
        & (far >= t_lo_l[..., None])
        & (near <= t_init_l[..., None])  # beyond the lane's cap: no hit
    )  # (T, TILE, K)
    if walked is not None:
        enters = enters & ~walked[:, None, :]
    te = jnp.where(enters, jnp.maximum(near, 0.0), _BIGF)

    entry = jnp.min(te, axis=1)  # (T, K)

    def mm(x, big):
        lo = jnp.min(jnp.where(enters, x[..., None], big), axis=1)
        hi = jnp.max(jnp.where(enters, x[..., None], -big), axis=1)
        return lo, hi

    olx, ohx = mm(ox, _BIGF)
    oly, ohy = mm(oy, _BIGF)
    olz, ohz = mm(oz, _BIGF)

    def dinterval(dc):
        dlo, dhi = mm(dc, _BIGF)
        uni = (dlo > 0.0) | (dhi < 0.0)
        ia = jnp.where(uni, 1.0 / jnp.where(dhi == 0.0, -1e-30, dhi), -_BIGF)
        ib = jnp.where(uni, 1.0 / jnp.where(dlo == 0.0, 1e-30, dlo), _BIGF)
        return ia, ib

    iax, ibx = dinterval(dx)
    iay, iby = dinterval(dy)
    iaz, ibz = dinterval(dz)

    order = jnp.argsort(entry, axis=1)  # empty windows (entry BIG) last
    nwin = jnp.sum(entry < _BIGF, axis=1, dtype=jnp.int32)[:, None]
    feats = jnp.stack(
        [entry, olx, ohx, oly, ohy, olz, ohz, iax, ibx, iay, iby, iaz, ibz],
        axis=-1,
    )  # (T, K, 13)
    win_f = jnp.take_along_axis(feats, order[..., None], axis=1)
    win_f = jnp.pad(win_f, ((0, 0), (0, kp - kk), (0, 3)))
    lims = jnp.take(pb.tl_lim, octs[:, 0], axis=0)  # (T, K, 2)
    win_i = jnp.take_along_axis(lims, order[..., None], axis=1)
    win_i = jnp.pad(win_i, ((0, 0), (0, kp - kk), (0, 0)))
    return win_f, win_i, nwin, order


def _windowed_enabled(pb) -> bool:
    """Tile-windowed treelet walk (round 4): DEFAULT for multi-treelet
    scenes.  Measured on v5e (tools/bench_windowed.py, bench_windowed_e2e):
    closest x1.26, NEE shadow x2.51, cfg4-class render end-to-end
    0.474 -> 0.620 Mrays/s (x1.31) with pixel-identical output.
    VKRT_NO_WINDOWED force-disables (A/B); the opt-in binned pair walk
    (VKRT_BINNED) takes precedence in the callers."""
    return pb.n_treelets > 1 and not os.environ.get("VKRT_NO_WINDOWED")


#: closest-hit window batch sizes between re-glues (comma list, then an
#: implicit "rest" phase; VKRT_WIN_SCHEDULE overrides, "" = single phase).
#: The round-4 sim predicted x1.63 but handed the glue ORACLE-converged
#: per-ray t caps; the real single-phase glue builds every window's beam
#: from the initial (infinite) t, so the kernel visited 8390 nodes/tile
#: where the sim said 5727 (tools/windowed_kernel_stats.py; the cost
#: model fits the realised time to -1%, so the gap is visits, not
#: overhead).  The multi-phase schedule walks a small batch of nearest
#: windows — where almost all hits are — then RE-GLUES with the
#: now-tightened per-lane t: resolved lanes stop dilating later beams,
#: far windows prune outright.  Exact (each phase continues where the
#: last stopped; no bounded-t escapees like the round-3 ladder).
#: Shadow stays single-phase: terminate-on-first-hit already early-stops
#: and the re-glue measured neutral-to-worse (57.4 -> 58-61 ms).
#: Schedule sweep on the 262k-lane hall wave (v5e): single 381.0 ms,
#: "16" 360.8, "4,12" 358.0, "4,8,16" 353.7 (best, x1.33 over the plain
#: sweep's 472.1), "2,6,16" 355.3, "6,18" 356.4 — all bit-identical.
#: Finer treelet cuts were swept at the same time and REJECTED: K=256
#: (tt=1024) is strictly slower (376.9/371.3 ms) — per-window glue and
#: cull overhead doubles faster than beams tighten — and K=512 exceeds
#: the v5e 1 MiB SMEM budget outright (the (K,16)+(K,2) window tables
#: are lane-padded in SMEM; XLA OOMs at compile), so the K -> infinity
#: limit of the round-4 sim is unreachable in this layout.
WIN_SCHEDULE = "4,8,16"


def _win_schedule() -> list:
    s = os.environ.get("VKRT_WIN_SCHEDULE")
    if s is None:
        # legacy knob from the two-phase experiment keeps working
        w1 = os.environ.get("VKRT_WIN_PHASE1")
        if w1 is not None:
            return [int(w1)] if int(w1) > 0 else []
        s = WIN_SCHEDULE
    return [int(x) for x in s.split(",") if x.strip()]


def _windowed_sweep(pb: PacketBVH, o, d, t_lo_l, t_init0, shadow: bool,
                    stats: bool = False):
    """Windowed traversal entry: returns (t_best, slot, octs[, stats])."""
    n = o.x.shape[0]
    kk = int(pb.n_treelets)
    rays, t_init, _ = _prep_rays(o, d, t_init0)
    t_lo_p = jnp.pad(t_lo_l, (0, t_init.size - n)).reshape(t_init.shape)
    _, octs = _tile_beam_bounds(rays, t_init)
    batches = [b for b in _win_schedule() if 0 < b < kk] if not shadow else []
    pb_arrays = (pb.nodes_f, pb.nodes_i, pb.leaves)

    t_cur, slot, walked = t_init, None, None
    st_acc = None
    for i, b in enumerate(batches + [None]):
        win_f, win_i, nwin, order = _window_glue(
            pb, rays, t_lo_p, t_cur, octs, walked=walked
        )
        out = _windowed_sweep_call(
            pb_arrays, win_f, win_i,
            nwin if b is None else jnp.minimum(nwin, b),
            octs, rays, t_lo_p, t_cur,
            int(pb.leaf_size), shadow, stats=stats, strict=i > 0,
        )
        if slot is None:
            t_cur, slot = out[0], out[1]
        else:
            upd = out[1] >= 0  # strict: only strictly-closer later hits
            t_cur = jnp.where(upd, out[0], t_cur)
            slot = jnp.where(upd, out[1], slot)
        if stats:
            st_acc = out[2] if st_acc is None else st_acc + out[2]
        if b is None:
            break
        # mark this phase's windows walked (treelet-id space; the next
        # glue re-sorts the survivors under the tightened t)
        ranks = jnp.argsort(order, axis=1)  # treelet id -> window rank
        done = ranks < jnp.minimum(nwin, b)[:, :1]
        walked = done if walked is None else walked | done

    res = (t_cur.reshape(-1)[:n], slot.reshape(-1)[:n], octs)
    if stats:
        # (n_tiles, 7) per-tile counters (see _wkernel cnt_s layout)
        res = res + (st_acc.reshape(-1, _TILE_S, _TILE_L)[:, :7, 0],)
    return res


def packet_backend_ok() -> bool:
    """The packet kernel runs on TPU (or interpret mode for CI)."""
    return jax.default_backend() in ("tpu",) or bool(
        os.environ.get("VKRT_PALLAS_INTERPRET")
    )


def packet_ok(tables) -> bool:
    return packet_backend_ok() and tables.pbvh is not None


def _prep_rays(o, d, t_init_flat):
    n = o.x.shape[0]
    n_pad = -(-n // _TILE) * _TILE

    def prep(x, fill=0.0):
        return jnp.pad(x, (0, n_pad - n), constant_values=fill).reshape(
            n_pad // _TILE_L, _TILE_L
        )

    rays = (prep(o.x), prep(o.y), prep(o.z), prep(d.x), prep(d.y), prep(d.z))
    # padding lanes are dead (t bound -1): they never hit, and the per-tile
    # beam bounds exclude them from the origin box
    return rays, prep(t_init_flat, -1.0), n


def _oct_lane(octs, n):
    return jnp.repeat(octs[:, 0], _TILE, total_repeat_length=octs.shape[0] * _TILE)[
        :n
    ]


def _full_lims(pb: PacketBVH, n_tiles: int):
    return jnp.broadcast_to(
        jnp.asarray([[0, pb.num_nodes]], jnp.int32), (n_tiles, 2)
    )


def _winner_uv(tables, o, d, found, t_best, tri):
    """Recompute (u, v) for the winning triangle.

    One packed (T, 9) row gather — a row gather costs the same as one
    element gather on TPU (tools/bench_gather_pack.py), so stacking the
    vertex columns at trace time (loop-invariant, hoisted by XLA)
    replaces the 9 separate flat gathers this used to issue; small
    tables keep element gathers (ops/gatherpack.py size gate)."""
    ti = jnp.maximum(tri, 0)
    g = packed_gather(
        [
            tables.v0.x, tables.v0.y, tables.v0.z,
            tables.v1.x, tables.v1.y, tables.v1.z,
            tables.v2.x, tables.v2.y, tables.v2.z,
        ],
        ti,
    )
    wv0 = V3(g[0], g[1], g[2])
    e1 = V3(g[3], g[4], g[5]) - wv0
    e2 = V3(g[6], g[7], g[8]) - wv0
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


def _slot_to_tri(pb: PacketBVH, octs, slot, n):
    """Map an octant-stream leaf slot back to the scene triangle id."""
    nt = pb.tri_id.shape[1]
    flat = _oct_lane(octs, n) * nt + jnp.maximum(slot, 0)
    tri = jnp.take(pb.tri_id.reshape(-1), flat, axis=0)
    found = (slot >= 0) & (tri >= 0)
    return jnp.where(found, tri, -1), found


def _inv_comp(x):
    tiny = jnp.float32(1e-30)
    return 1.0 / jnp.where(jnp.abs(x) < tiny, jnp.where(x < 0, -tiny, tiny), x)


def _binned_enabled(pb) -> bool:
    """Opt-in only (VKRT_BINNED=1).  Measured on the production sorted
    hall bounce wave (tools/bench_path_compare.py, 262k lanes, 256k
    tris): plain sweep 0.55 Mrays/s vs binned 0.25 — the pair-expansion
    glue (random gathers at ~26 ns/element) plus per-round kernel
    relaunches cost more than the beam-union waste they remove.  Binned
    only wins on fully random ray sets (0.25 vs 0.19), which production
    waves never are (they are origin-morton|octant sorted)."""
    return (
        pb.n_treelets > 1
        and bool(os.environ.get("VKRT_BINNED"))
        and not os.environ.get("VKRT_NO_BINNED")
    )


#: treelets expanded per ray per round; small C recovers closest-hit early
#: termination (the round loop prunes treelets behind the tightened t)
PAIRS_PER_ROUND = 4


def _binned_sweep(pb: PacketBVH, o, d, t_lo_l, t_init0, shadow: bool):
    """Treelet-binned pair-expansion traversal (the big-scene path).

    The single-sweep walk's cost is beam fatness: one 1024-lane tile's
    conservative beam visits the union of its rays' subtrees, ~0.1% of
    whose triangle tests are useful on diffuse bounce waves (measured:
    ~58k triangles tested per 1024-lane tile for ~50 hits).  Here each
    ray determines *exactly* which treelets (maximal <= ~4k-triangle
    subtrees, accel.bvh.treelet_cut) it enters — K cheap full-VPU slab
    tests — and is expanded into (ray, treelet) PAIRS, its C nearest
    unprocessed treelets per round.  Pairs are binned treelet-major into
    tile-padded lanes (one u32 argsort + unique-index scatters + flat
    gathers, all bandwidth-bound), so every (8, 128) tile walks ONE
    treelet subtree with a beam over rays that all personally enter it —
    exact pair enumeration instead of beam-union waste.  Rounds iterate
    a per-ray (entry_t, k) lexicographic cursor: closest-hit rays stop
    as soon as the next treelet's entry exceeds their best t, shadow
    rays stop at the first occluder — per-ray early termination the
    shared beam could never express.

    The reference gets all this for free in RT-core hardware per-ray
    traversal (raygen.rgen:59); this is its TPU shape: exact per-ray
    decisions in vector code, shared-cursor packets only inside small
    same-destination subtrees.

    Returns (t_best, res): res = winning scene triangle id / -1 for
    closest, occluded flag (>= 0) for shadow.
    """
    n = o.x.shape[0]
    kk = int(pb.n_treelets)
    cc = min(int(os.environ.get("VKRT_PAIRS_PER_ROUND", PAIRS_PER_ROUND)), kk)
    if n >= 1 << 24:
        raise ValueError("binned sweep supports < 2^24 lanes per band")
    ray_bits = max(int(n - 1).bit_length(), 1)
    # padded pair-lane count: every bin padded up to a tile boundary
    p_pad = (-(-(cc * n + kk * _TILE + 1) // _TILE)) * _TILE
    n_tiles = p_pad // _TILE
    box = pb.tl_box  # (K, 6)
    ivx, ivy, ivz = _inv_comp(d.x), _inv_comp(d.y), _inv_comp(d.z)
    active0 = t_init0 >= 0.0
    tile_starts = jnp.arange(n_tiles, dtype=jnp.int32) * _TILE

    def select(cursor_t, cursor_k, t_best, alive):
        """C smallest (entry_t, k) > cursor among live entered treelets.

        Returns (sel_k (C, n) with kk = none, cursor_t', cursor_k').
        """
        sels = []
        ct, ck = cursor_t, cursor_k
        for _ in range(cc):
            def step(k, acc):
                bt, bk = acc
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
                te = jnp.maximum(near, 0.0)
                cand = (
                    alive
                    & ((te > ct) | ((te == ct) & (k > ck)))
                    & (near <= far)
                    & (far >= t_lo_l)
                    & (te <= t_best)
                )
                better = cand & ((te < bt) | ((te == bt) & (k < bk)))
                return jnp.where(better, te, bt), jnp.where(better, k, bk)

            bt, bk = jax.lax.fori_loop(
                0, kk, step,
                (jnp.full((n,), jnp.inf, jnp.float32),
                 jnp.full((n,), kk, jnp.int32)),
            )
            sels.append(bk)
            valid = bk < kk
            ct = jnp.where(valid, bt, ct)
            ck = jnp.where(valid, bk, ck)
        return jnp.stack(sels), ct, ck

    def body(c):
        t_best, res = c["t"], c["res"]
        sel_k = c["sel"]  # (C, n)
        # ---- bin pairs treelet-major, bins padded to tile multiples ----
        pair_k = sel_k.reshape(-1)  # (C*n,)
        pair_ray = jnp.tile(jnp.arange(n, dtype=jnp.int32), cc)
        key = (
            pair_k.astype(jnp.uint32) << ray_bits
        ) | pair_ray.astype(jnp.uint32)
        perm = jnp.argsort(key)
        pk_s = jnp.take(pair_k, perm)
        pr_s = jnp.take(pair_ray, perm)
        off = jnp.searchsorted(
            pk_s, jnp.arange(kk + 1, dtype=jnp.int32)
        ).astype(jnp.int32)  # (kk+1,) bin starts in sorted order
        cnt = jnp.diff(off)
        pof = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(-(-cnt // _TILE) * _TILE).astype(jnp.int32)]
        )  # padded bin starts
        i_s = jnp.arange(cc * n, dtype=jnp.int32)
        pkc = jnp.minimum(pk_s, kk - 1)
        dest = jnp.where(
            pk_s < kk,
            jnp.take(pof, pkc) + (i_s - jnp.take(off, pkc)),
            pof[kk] + (i_s - off[kk]),  # invalid pairs park past the bins
        )
        pair_ray_p = (
            jnp.full((p_pad,), -1, jnp.int32)
            .at[dest]
            .set(jnp.where(pk_s < kk, pr_s, -1))
        )
        back = jnp.zeros((cc * n,), jnp.int32).at[perm].set(dest)
        # ---- gather pair-lane rays, walk every bin in ONE launch -------
        prc = jnp.maximum(pair_ray_p, 0)
        po = V3(*(jnp.take(x, prc) for x in (o.x, o.y, o.z)))
        pd = V3(*(jnp.take(x, prc) for x in (d.x, d.y, d.z)))
        live = pair_ray_p >= 0
        t_init_pair = jnp.where(live, jnp.take(t_best, prc), -1.0)
        rays_p, t_init_pp, _ = _prep_rays(po, pd, t_init_pair)
        t_lo_pp = jnp.take(t_lo_l, prc).reshape(t_init_pp.shape)
        bounds, octs = _tile_beam_bounds(rays_p, t_init_pp)
        tile_k = jnp.clip(
            jnp.searchsorted(pof, tile_starts, side="right") - 1, 0, kk - 1
        ).astype(jnp.int32)
        # bin-padding tiles carry no live pairs: zero their walk window so
        # the kernel skips them outright instead of walking a dead beam
        has_live = jnp.any(live.reshape(n_tiles, _TILE), axis=1)
        lim = jnp.take(
            pb.tl_lim.reshape(-1, 2), octs[:, 0] * kk + tile_k, axis=0
        )
        lim = jnp.where(has_live[:, None], lim, 0)
        if os.environ.get("VKRT_BINNED_NO_KERNEL"):
            # debug: glue-only timing variant (results are wrong)
            t_new_p, slot_p = t_init_pp, jnp.full(
                t_init_pp.shape, -1, jnp.int32
            )
        elif stats_on:
            t_new_p, slot_p, st = _packet_sweep(
                (pb.nodes_f, pb.nodes_i, pb.leaves),
                bounds, octs, lim, rays_p, t_lo_pp, t_init_pp,
                int(pb.leaf_size), shadow, stats=True,
            )
            st_acc = c["stats"] + jnp.sum(
                st.reshape(-1, _TILE_S, _TILE_L)[:, :4, 0], axis=0
            )
        else:
            t_new_p, slot_p = _packet_sweep(
                (pb.nodes_f, pb.nodes_i, pb.leaves),
                bounds, octs, lim, rays_p, t_lo_pp, t_init_pp,
                int(pb.leaf_size), shadow,
            )
        t_new = t_new_p.reshape(-1)
        slot = slot_p.reshape(-1)
        # ---- reduce pair results back to rays (C-row min, no sort) -----
        if shadow:
            occ_c = jnp.take(slot >= 0, back).reshape(cc, n)
            hit_any = jnp.any(occ_c, axis=0) & (sel_k[0] < kk)
            res = jnp.where(hit_any & (res < 0), 1, res)
        else:
            tri_pair, found = _slot_to_tri(pb, octs, slot, p_pad)
            t_c = jnp.take(t_new, back).reshape(cc, n)
            tri_c = jnp.take(jnp.where(found, tri_pair, -1), back).reshape(cc, n)
            for ci in range(cc):
                ok = (sel_k[ci] < kk) & (tri_c[ci] >= 0)
                upd = ok & ((t_c[ci] < t_best) | (res < 0))
                t_best = jnp.where(upd, t_c[ci], t_best)
                res = jnp.where(upd, tri_c[ci], res)
        # ---- next round's selection ------------------------------------
        alive2 = active0 & (res < 0) if shadow else active0
        sel2, ct2, ck2 = select(c["ct"], c["ck"], t_best, alive2)
        out = dict(
            t=t_best, res=res, sel=sel2, ct=ct2, ck=ck2, it=c["it"] + 1
        )
        if stats_on:
            out["stats"] = st_acc
        return out

    stats_on = bool(os.environ.get("VKRT_BINNED_STATS"))
    ct0 = jnp.full((n,), -jnp.inf, jnp.float32)
    ck0 = jnp.full((n,), -1, jnp.int32)
    sel0, ct1, ck1 = select(ct0, ck0, t_init0, active0)
    init = dict(
        t=jnp.where(active0, t_init0, 0.0),
        res=jnp.full((n,), -1, jnp.int32),
        sel=sel0, ct=ct1, ck=ck1, it=jnp.int32(0),
    )
    if stats_on:
        init["stats"] = jnp.zeros((4,), jnp.int32)
    if os.environ.get("VKRT_BINNED_EAGER"):
        # debug/tuning hook: run the round loop in python with per-round
        # wall-clock + live-pair telemetry (only valid outside jit)
        import time as _time

        bodyj = jax.jit(body)
        c = init
        while bool(jnp.any(c["sel"] < kk)) and int(c["it"]) < kk:
            pairs = int(jnp.sum(c["sel"] < kk))
            jax.block_until_ready(c)
            t0 = _time.perf_counter()
            c = bodyj(c)
            jax.block_until_ready(c)
            print(
                f"  round {int(c['it'])}: pairs {pairs} "
                f"{1e3 * (_time.perf_counter() - t0):8.2f} ms",
                flush=True,
            )
        return (c["t"], c["res"], c["it"]) + (
            (c["stats"],) if stats_on else ()
        )
    max_rounds = int(os.environ.get("VKRT_BINNED_MAX_ROUNDS", kk))
    out = jax.lax.while_loop(
        lambda c: jnp.any(c["sel"] < kk)
        & (c["it"] < jnp.int32(min(kk, max_rounds))),
        body, init,
    )
    return (out["t"], out["res"], out["it"]) + (
        (out["stats"],) if stats_on else ()
    )


def packet_closest(tables, o, d, *, t_min, t_max, active):
    """Drop-in for dense_closest/trace_closest on big scenes.

    Alpha-agnostic (every triangle is a candidate); ``t_min`` may be a
    scalar or per-lane (N,) array for the alpha resample loop.  Multi-
    treelet scenes default to the tile-windowed treelet walk
    (:func:`_windowed_sweep`, via :func:`packet_closest_pb`); single-
    treelet scenes (and ``VKRT_NO_WINDOWED=1``) use the shared-beam
    sweep; ``VKRT_BINNED=1`` opts into the pair-expansion walk.
    """
    pb: PacketBVH = tables.pbvh
    n = o.x.shape[0]
    t_bound = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    t_lo = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_init0 = jnp.where(active, t_bound, -1.0)

    if _binned_enabled(pb):  # explicit opt-in wins over the default
        out = _binned_sweep(pb, o, d, t_lo, t_init0, shadow=False)
        t_best, tri = out[0], out[1]
        return _winner_uv(tables, o, d, tri >= 0, t_best, tri)

    t_best, tri = packet_closest_pb(pb, o, d, t_lo=t_lo, t_init0=t_init0)
    return _winner_uv(tables, o, d, tri >= 0, t_best, tri)


def packet_closest_pb(pb: PacketBVH, o, d, *, t_lo, t_init0):
    """Closest hit over a bare PacketBVH: (t_best, tri) with ids local to
    ``pb``'s triangle range and no (u, v) recompute.

    The building block both the scene-level entry (:func:`packet_closest`)
    and the instanced BLAS walk (ops/instanced.py) share: the latter calls
    it per instance group with object-space rays, where triangle ids must
    stay prototype-local for (instance, tri) encoding.  ``t_init0`` is the
    per-lane upper bound with -1 marking dead lanes.  Multi-treelet
    streams ride the tile-windowed treelet walk (round 5: big instanced
    prototypes get the same windowed gain as flattened scenes); single-
    treelet streams use the shared-beam sweep.
    """
    n = o.x.shape[0]
    if _windowed_enabled(pb):
        t_best, slot, octs = _windowed_sweep(
            pb, o, d, t_lo, t_init0, shadow=False
        )
    else:
        t_best, slot, octs = _plain_sweep_pb(
            pb, o, d, t_lo, t_init0, shadow=False
        )
    tri, found = _slot_to_tri(pb, octs, slot, n)
    return jnp.where(found, t_best, jnp.inf), tri


def _plain_sweep_pb(pb: PacketBVH, o, d, t_lo, t_init0, shadow: bool):
    """Single shared-beam sweep over the whole stream: (t, slot, octs),
    sliced to the lane count.  The non-windowed building block (also the
    A/B baseline tools/bench_windowed.py times against)."""
    n = o.x.shape[0]
    rays, t_init, _ = _prep_rays(o, d, t_init0)
    t_lo_p = jnp.pad(t_lo, (0, t_init.size - n)).reshape(t_init.shape)
    bounds, octs = _tile_beam_bounds(rays, t_init)
    t_best, slot = _packet_sweep(
        (pb.nodes_f, pb.nodes_i, pb.leaves),
        bounds,
        octs,
        _full_lims(pb, bounds.shape[0]),
        rays,
        t_lo_p,
        t_init,
        int(pb.leaf_size),
        shadow,
    )
    return t_best.reshape(-1)[:n], slot.reshape(-1)[:n], octs


def packet_shadow(tables, o, d, *, t_max, active):
    """Terminate-on-first-hit occlusion over the packet BVH (tMin = 0)."""
    pb: PacketBVH = tables.pbvh
    n = o.x.shape[0]
    t_bound = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    t_init0 = jnp.where(active, t_bound, -1.0)

    if _binned_enabled(pb):  # explicit opt-in wins over the default
        out = _binned_sweep(
            pb, o, d, jnp.zeros((n,), jnp.float32), t_init0, shadow=True
        )
        return (out[1] >= 0) & active

    return packet_shadow_pb(pb, o, d, t_init0=t_init0) & active


def packet_shadow_pb(pb: PacketBVH, o, d, *, t_init0):
    """First-hit occlusion over a bare PacketBVH (tMin = 0); dead lanes
    (``t_init0 < 0``) report unoccluded.  Shared by the scene-level entry
    and the instanced BLAS walk.  Multi-treelet streams ride the
    tile-windowed treelet walk (x2.5 on NEE-shaped occlusion waves,
    DESIGN.md §r4); single-treelet streams use the shared-beam sweep."""
    n = o.x.shape[0]
    zeros = jnp.zeros((n,), jnp.float32)
    if _windowed_enabled(pb):
        _, slot, _ = _windowed_sweep(pb, o, d, zeros, t_init0, shadow=True)
        return slot >= 0
    _, slot, _ = _plain_sweep_pb(pb, o, d, zeros, t_init0, shadow=True)
    return slot >= 0
