"""Software bounding-volume hierarchy replacing VK_KHR_acceleration_structure.

The reference delegates BLAS/TLAS construction and traversal to the Vulkan
driver (src/accelerationstructure.cpp:85-229).  On TPU we build our own:

* **Flattened one-level world-space BVH.**  The reference's two-level
  BLAS-per-primitive / TLAS-over-instances split exists to support instancing
  and refit (accelerationstructure.cpp:26-32), but its render loop never
  mutates the scene after load (SURVEY.md §3.5).  We therefore pre-transform
  every instance's triangles to world space at upload time and build a single
  BVH over all of them — one traversal loop instead of a nested TLAS->BLAS
  walk, which matters on a vector machine where every extra level of
  data-dependent control flow serialises lanes.  ``rebuild()`` re-flattens,
  providing the same update entry point.

* **Threaded (skip-pointer) layout for stackless traversal.**  Nodes are
  stored in DFS preorder.  An AABB hit on an interior node advances to
  ``i+1`` (its left child); a miss — or a processed leaf — jumps to
  ``miss[i]``, the preorder index just past the node's subtree.  Per-ray
  traversal state is then a single int32, so a whole wavefront of rays walks
  the tree inside one ``lax.while_loop`` with no per-lane stacks.

* **Fixed-arity leaves.**  Every leaf owns exactly ``leaf_size`` padded
  triangle slots stored contiguously, so leaf intersection is a statically
  unrolled batch of Möller–Trumbore tests — dense VPU work instead of a
  data-dependent inner loop.

The builder runs in NumPy on the host (scene load is host-side in the
reference too, scene.cpp:23-143); traversal is pure JAX
(:mod:`vulkan_raytracer_tpu.ops.traverse`).
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ThreadedBVH:
    """Flattened threaded BVH plus its leaf-reordered triangle soup.

    ``first_tri[i] >= 0`` marks a leaf and indexes the first of ``leaf_size``
    contiguous slots in the padded triangle arrays; interior nodes store -1.
    ``miss[i]`` is the skip pointer; a value of ``num_nodes`` exits traversal.
    ``tri_id`` maps padded slots back to the caller's original triangle
    numbering (-1 for padding), so per-triangle payloads (materials, emissive
    CDF rows, ...) stay in scene order.
    """

    aabb_min: jax.Array  # (Nn, 3) f32
    aabb_max: jax.Array  # (Nn, 3) f32
    first_tri: jax.Array  # (Nn,) i32
    miss: jax.Array  # (Nn,) i32
    tri_v0: jax.Array  # (Nt, 3) f32
    tri_e1: jax.Array  # (Nt, 3) f32
    tri_e2: jax.Array  # (Nt, 3) f32
    tri_id: jax.Array  # (Nt,) i32
    leaf_size: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_nodes(self) -> int:
        return self.aabb_min.shape[0]

    @property
    def num_tri_slots(self) -> int:
        return self.tri_v0.shape[0]


def build_bvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray, leaf_size: int = 16) -> ThreadedBVH:
    """Build a threaded BVH over world-space triangles.

    Median split on the longest centroid axis (balanced depth ~= log2(T)),
    equivalent in role to the driver's PREFER_FAST_TRACE build
    (accelerationstructure.cpp:111).  Host-side NumPy; O(T log^2 T).
    leaf_size 16 measured best for the packet kernel (soup swizzled
    5.90 -> 7.31 Mrays/s over 8): per-leaf fixed overhead amortises over
    more statically-unrolled triangle tests and node count halves.

    Args:
      v0, v1, v2: (T, 3) float arrays, triangle vertices in world space.
      leaf_size: triangles per leaf (padded).

    Returns a :class:`ThreadedBVH` with device arrays.
    """
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    T = v0.shape[0]
    if T == 0:
        raise ValueError("cannot build a BVH over zero triangles")

    # native C++ builder when available (accel/native.py; ~20x the NumPy
    # recursion on Sponza-class counts), identical topology contract
    from .native import bvh_build_native

    nat = bvh_build_native(v0, v1, v2, leaf_size)
    if nat is not None:
        node_min_a, node_max_a, first_a, miss_a, slots = nat
        return _finish(
            node_min_a, node_max_a, first_a, miss_a, slots, v0, v1, v2, leaf_size
        )

    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    centroid = 0.5 * (tmin + tmax)

    node_min: list[np.ndarray] = []
    node_max: list[np.ndarray] = []
    first_tri: list[int] = []
    subtree_end: list[int] = []
    tri_slots: list[int] = []  # original ids, -1 padding, leaf-contiguous

    sys.setrecursionlimit(max(sys.getrecursionlimit(), 10000))

    def rec(ids: np.ndarray) -> None:
        i = len(node_min)
        node_min.append(tmin[ids].min(axis=0))
        node_max.append(tmax[ids].max(axis=0))
        first_tri.append(-1)
        subtree_end.append(-1)
        if len(ids) <= leaf_size:
            first_tri[i] = len(tri_slots)
            tri_slots.extend(ids.tolist())
            tri_slots.extend([-1] * (leaf_size - len(ids)))
        else:
            c = centroid[ids]
            axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
            mid = len(ids) // 2
            part = np.argpartition(c[:, axis], mid)
            rec(ids[part[:mid]])
            rec(ids[part[mid:]])
        subtree_end[i] = len(node_min)

    rec(np.arange(T, dtype=np.int64))

    return _finish(
        np.stack(node_min),
        np.stack(node_max),
        np.asarray(first_tri, np.int32),
        np.asarray(subtree_end, np.int32),
        np.asarray(tri_slots, np.int32),
        v0, v1, v2, leaf_size,
    )


def refit_bvh(bvh: ThreadedBVH, v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> ThreadedBVH:
    """Cheap AS update: keep topology, recompute AABBs + leaf triangles.

    The equivalent of the reference's AccelerationStructure::update()
    (accelerationstructure.cpp:26-32, PREFER_FAST_BUILD + allowUpdate):
    vertex positions moved but the tree structure is reused.  Leaf AABBs
    come from the new vertices through the existing slot ordering; interior
    AABBs are unioned bottom-up in reverse preorder (children of interior
    node ``i`` are ``i+1`` and ``miss[i+1]``, both > i).  Tree quality
    degrades as geometry drifts — rebuild with build_bvh when it does,
    exactly like the reference's rebuild()/update() split.
    """
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    slots = np.asarray(bvh.tri_id)
    first = np.asarray(bvh.first_tri)
    miss = np.asarray(bvh.miss)
    k = bvh.leaf_size
    n_nodes = bvh.num_nodes

    safe = np.maximum(slots, 0)
    pad = (slots < 0)[:, None]
    tv0 = np.where(pad, 0.0, v0[safe]).astype(np.float32)
    te1 = np.where(pad, 0.0, (v1 - v0)[safe]).astype(np.float32)
    te2 = np.where(pad, 0.0, (v2 - v0)[safe]).astype(np.float32)

    smin = np.where(pad, np.inf, np.minimum(np.minimum(v0, v1), v2)[safe])
    smax = np.where(pad, -np.inf, np.maximum(np.maximum(v0, v1), v2)[safe])
    leaf_min = smin.reshape(-1, k, 3).min(axis=1)
    leaf_max = smax.reshape(-1, k, 3).max(axis=1)

    # leaves seed their boxes; interior boxes converge in depth(tree) fully
    # vectorised sweeps of nmin[i] = union(nmin[i+1], nmin[miss[i+1]])
    is_leaf = first >= 0
    nmin = np.full((n_nodes, 3), np.inf, np.float32)
    nmax = np.full((n_nodes, 3), -np.inf, np.float32)
    nmin[is_leaf] = leaf_min[first[is_leaf] // k]
    nmax[is_leaf] = leaf_max[first[is_leaf] // k]
    interior = np.nonzero(~is_leaf)[0]
    left = interior + 1
    right = miss[left]
    for _ in range(64):  # >= tree depth; early exit on convergence
        new_min = np.minimum(nmin[left], nmin[right])
        new_max = np.maximum(nmax[left], nmax[right])
        if np.array_equal(new_min, nmin[interior]) and np.array_equal(
            new_max, nmax[interior]
        ):
            break
        nmin[interior] = new_min
        nmax[interior] = new_max

    dev = jax.numpy.asarray
    return ThreadedBVH(
        aabb_min=dev(nmin),
        aabb_max=dev(nmax),
        first_tri=bvh.first_tri,
        miss=bvh.miss,
        tri_v0=dev(tv0),
        tri_e1=dev(te1),
        tri_e2=dev(te2),
        tri_id=bvh.tri_id,
        leaf_size=k,
    )


def treelet_cut(first_tri, miss, leaf_size: int, max_tris: int) -> np.ndarray:
    """Select a treelet frontier: maximal subtrees holding <= max_tris slots.

    The cut partitions the leaf set: every leaf belongs to exactly one
    treelet, and each treelet is a preorder-contiguous subtree
    ``[i, miss[i])`` (contiguous in EVERY octant stream too, since child
    swaps keep subtrees contiguous).  The binned traversal in
    :mod:`vulkan_raytracer_tpu.ops.pallas_bvh` bins rays by the treelets
    they *individually* enter — the structural fix for beam fatness: a
    tile's walk of treelet ``t`` only carries the lanes that enter ``t``.

    Returns the treelet root node ids (preorder-ascending).
    """
    first_tri = np.asarray(first_tri)
    miss = np.asarray(miss)
    n = first_tri.shape[0]
    # leaf count of subtree [i, miss[i]) via prefix sum over leaf flags
    pref = np.zeros(n + 1, np.int64)
    np.cumsum(first_tri >= 0, out=pref[1:])
    out: list[int] = []
    stack = [0]
    while stack:
        i = stack.pop()
        tris = (pref[miss[i]] - pref[i]) * leaf_size
        if tris <= max_tris or first_tri[i] >= 0:
            out.append(i)
        else:
            # children of interior i are i+1 and miss[i+1]; push right first
            # so the popped order stays preorder-ascending
            stack.append(miss[i + 1])
            stack.append(i + 1)
    return np.asarray(sorted(out), np.int64)


def octant_permutations(aabb_min, aabb_max, first_tri, miss) -> np.ndarray:
    """Preorder permutations of a threaded BVH for the 8 direction octants.

    The driver's RT cores traverse near-child-first per ray; a threaded
    (skip-pointer) stream fixes ONE child order for everyone, so closest-hit
    walks find their hit late and t-tightening culls little.  Emitting eight
    streams — octant ``o`` visits the child nearer along direction signs
    ``(±1, ±1, ±1)`` first — restores front-to-back order for packets whose
    rays share an octant (the integrator already sorts bounce waves by
    octant).

    Vectorised over nodes: under any per-node child swap the subtree stays
    preorder-contiguous, so ``size_i = miss[i] - i`` is invariant and the
    new positions solve  pos[first] = pos[i] + 1,
    pos[second] = pos[i] + 1 + size[first]  level by level (depth sweeps).

    Returns (8, Nn) int32: ``perm[o, new_index] = old_index``.
    """
    first_tri = np.asarray(first_tri)
    miss = np.asarray(miss)
    n = first_tri.shape[0]
    center = 0.5 * (np.asarray(aabb_min) + np.asarray(aabb_max))
    size = miss - np.arange(n)  # subtree node count, invariant under swaps
    interior = first_tri < 0
    left = np.where(interior, np.arange(n) + 1, -1)
    right = np.where(interior, miss[np.minimum(left, n - 1)], -1)

    il = left[interior]
    ir = right[interior]
    proj_delta = center[ir] - center[il]  # (Ni, 3)
    imap = np.cumsum(interior) - 1  # node index -> interior-compressed index

    perms = np.empty((8, n), np.int64)
    for o in range(8):
        sgn = np.array(
            [1 - 2 * (o & 1), 1 - 2 * ((o >> 1) & 1), 1 - 2 * ((o >> 2) & 1)],
            np.float32,
        )
        swap = proj_delta @ sgn < 0.0  # right child nearer -> visit first
        first_c = np.where(swap, ir, il)
        second_c = np.where(swap, il, ir)
        pos = np.full(n, -1, np.int64)
        pos[0] = 0
        frontier = np.array([0], np.int64)
        while frontier.size:
            f = frontier[interior[frontier]]
            if f.size == 0:
                break
            fi = imap[f]
            fc, sc = first_c[fi], second_c[fi]
            pos[fc] = pos[f] + 1
            pos[sc] = pos[f] + 1 + size[fc]
            frontier = np.concatenate([fc, sc])
        perm = np.empty(n, np.int64)
        perm[pos] = np.arange(n)
        perms[o] = perm
    return perms.astype(np.int32)


def _finish(node_min, node_max, first_tri, miss, slots, v0, v1, v2, leaf_size):
    safe = np.maximum(slots, 0)
    pad = (slots < 0)[:, None]
    tv0 = np.where(pad, 0.0, v0[safe]).astype(np.float32)
    te1 = np.where(pad, 0.0, (v1 - v0)[safe]).astype(np.float32)
    te2 = np.where(pad, 0.0, (v2 - v0)[safe]).astype(np.float32)

    dev = jax.numpy.asarray
    return ThreadedBVH(
        aabb_min=dev(np.asarray(node_min, np.float32)),
        aabb_max=dev(np.asarray(node_max, np.float32)),
        first_tri=dev(np.asarray(first_tri, np.int32)),
        miss=dev(np.asarray(miss, np.int32)),
        tri_v0=dev(tv0),
        tri_e1=dev(te1),
        tri_e2=dev(te2),
        tri_id=dev(slots),
        leaf_size=leaf_size,
    )
