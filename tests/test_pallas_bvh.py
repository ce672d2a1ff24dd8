"""Packet-traversal Pallas kernel vs the dense fold (interpret mode on CPU)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from vulkan_raytracer_tpu.ops.dense import dense_closest, dense_shadow
from vulkan_raytracer_tpu.ops.math3 import V3
from vulkan_raytracer_tpu.scene.builtin import cornell_box_scene, triangle_soup_scene


@pytest.fixture
def interpret():
    os.environ["VKRT_PALLAS_INTERPRET"] = "1"
    yield
    os.environ.pop("VKRT_PALLAS_INTERPRET", None)


def _rays(rng, n, spread=0.9, ylift=1.0):
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    o[:, 1] += ylift
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ov = V3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]))
    dv = V3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]))
    return ov, dv


@pytest.mark.slow
def test_packet_closest_matches_dense_cornell(interpret):
    from vulkan_raytracer_tpu.ops.pallas_bvh import packet_closest, packet_ok

    t = cornell_box_scene().upload()
    assert packet_ok(t)
    rng = np.random.default_rng(0)
    n = 1024
    ov, dv = _rays(rng, n)
    act = jnp.asarray(np.arange(n) % 5 != 0)
    tp, trip, up, vp = packet_closest(t, ov, dv, t_min=1e-7, t_max=1e32, active=act)
    td, trid, ud, vd = dense_closest(t, ov, dv, t_min=1e-7, t_max=1e32, active=act)
    # exact-t ties on shared edges may resolve to a different (equally
    # correct) winner: dense breaks by lowest id, the walk by leaf order
    trip_n, trid_n = np.asarray(trip), np.asarray(trid)
    np.testing.assert_array_equal(trip_n >= 0, trid_n >= 0)
    m = trip_n >= 0
    np.testing.assert_allclose(np.asarray(tp)[m], np.asarray(td)[m], rtol=1e-5)
    same = trip_n == trid_n
    assert same[m].mean() > 0.995
    np.testing.assert_allclose(
        np.asarray(up)[m & same], np.asarray(ud)[m & same], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(vp)[m & same], np.asarray(vd)[m & same], atol=1e-5
    )


def test_packet_closest_matches_dense_soup(interpret, monkeypatch):
    """Soup big enough for multiple node and triangle chunks + 2 ray tiles.

    Pinned to the single-sweep walk (VKRT_NO_BINNED) — this test covers
    chunk streaming; the binned pair machinery has its own (smaller)
    test below, sized for the interpreter."""
    monkeypatch.setenv("VKRT_NO_BINNED", "1")
    from vulkan_raytracer_tpu.ops.pallas_bvh import packet_closest

    t = triangle_soup_scene(n_tris=9000, seed=3).upload()
    assert t.bvh.num_nodes > 1024  # crosses node-chunk boundaries
    rng = np.random.default_rng(1)
    n = 2048
    ov, dv = _rays(rng, n, spread=1.5, ylift=0.0)
    act = jnp.asarray(np.ones(n, bool))
    tp, trip, up, vp = packet_closest(t, ov, dv, t_min=1e-7, t_max=1e32, active=act)
    td, trid, ud, vd = dense_closest(t, ov, dv, t_min=1e-7, t_max=1e32, active=act)
    # dense breaks t-ties by lowest id; the packet walk visits leaves in BVH
    # order, so compare by t and verify ids where t is unique
    np.testing.assert_array_equal(np.asarray(trip) >= 0, np.asarray(trid) >= 0)
    m = np.asarray(trip) >= 0
    np.testing.assert_allclose(np.asarray(tp)[m], np.asarray(td)[m], rtol=1e-5)
    same = np.asarray(trip) == np.asarray(trid)
    assert same[m].mean() > 0.999  # identical winners except fp-tie noise
    np.testing.assert_allclose(
        np.asarray(up)[m & same], np.asarray(ud)[m & same], atol=1e-5
    )


def test_packet_shadow_matches_dense(interpret):
    from vulkan_raytracer_tpu.ops.pallas_bvh import packet_shadow

    t = triangle_soup_scene(n_tris=900, seed=5).upload()
    rng = np.random.default_rng(2)
    n = 1024
    ov, dv = _rays(rng, n, spread=1.2, ylift=0.0)
    act = jnp.asarray(np.arange(n) % 4 != 0)
    t_max = jnp.asarray(rng.uniform(0.1, 4.0, n).astype(np.float32))
    occ_p = packet_shadow(t, ov, dv, t_max=t_max, active=act)
    occ_d = dense_shadow(t, ov, dv, t_max=t_max, active=act)
    np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_d))


@pytest.mark.slow
def test_packet_end_to_end_render_matches(interpret, monkeypatch):
    """Full render through the packet path (forced) vs the dense path."""
    import jax.numpy as jnp_
    from vulkan_raytracer_tpu.render.integrator import render_sample
    from vulkan_raytracer_tpu.scene.camera import Camera

    t = cornell_box_scene().upload()
    cam = Camera(
        position=np.array([0.0, 1.0, 3.0]), direction=np.array([0.0, 0.0, -1.0])
    )
    vi = jnp_.asarray(cam.view_inverse())
    pi = jnp_.asarray(cam.projection_inverse())

    ref, rays_ref = render_sample(t, vi, pi, 32, 32, 3, 3)
    monkeypatch.setenv("VKRT_FORCE_PACKET", "1")
    got, rays_got = render_sample(t, vi, pi, 32, 32, 3, 3)
    # identical RNG streams; only t-tie winners may differ at box edges
    diff = np.abs(np.asarray(ref) - np.asarray(got))
    assert (diff.max(-1) < 1e-5).mean() > 0.995
    assert float(np.median(diff)) < 1e-7


def test_packet_dead_lanes_cheap_and_correct(interpret):
    """All-inactive input returns all-miss without touching leaf data."""
    from vulkan_raytracer_tpu.ops.pallas_bvh import packet_closest

    t = cornell_box_scene().upload()
    rng = np.random.default_rng(7)
    ov, dv = _rays(rng, 1024)
    act = jnp.zeros(1024, bool)
    tp, trip, _, _ = packet_closest(t, ov, dv, t_min=1e-7, t_max=1e32, active=act)
    assert np.all(np.asarray(trip) == -1)
    assert np.all(np.isinf(np.asarray(tp)))


@pytest.mark.slow
def test_binned_treelet_walk_matches_dense(interpret, monkeypatch):
    """Forced tiny treelets: the multi-pass binned walk equals dense.

    Exercises many passes per ray (done-bit cursors, waiting lanes,
    per-pass beam restriction) including per-lane t_min as used by the
    integrator's alpha resample loop.
    """
    monkeypatch.setenv("VKRT_TREELET_TRIS", "128")
    monkeypatch.setenv("VKRT_BINNED", "1")  # opt-in since the A/B pin
    from vulkan_raytracer_tpu.ops import pallas_bvh as pk

    t = triangle_soup_scene(n_tris=600, seed=9).upload()
    assert t.pbvh.n_treelets > 4
    rng = np.random.default_rng(4)
    n = 512
    ov, dv = _rays(rng, n, spread=1.2, ylift=0.0)
    act = jnp.asarray(np.arange(n) % 3 != 0)
    t_lo = jnp.asarray(rng.uniform(0.0, 0.5, n).astype(np.float32))
    tp, trip, up, vp = pk.packet_closest(
        t, ov, dv, t_min=t_lo, t_max=1e32, active=act
    )
    td, trid, ud, vd = dense_closest(
        t, ov, dv, t_min=t_lo, t_max=1e32, active=act
    )
    trip_n, trid_n = np.asarray(trip), np.asarray(trid)
    np.testing.assert_array_equal(trip_n >= 0, trid_n >= 0)
    m = trip_n >= 0
    np.testing.assert_allclose(np.asarray(tp)[m], np.asarray(td)[m], rtol=1e-5)
    same = trip_n == trid_n
    assert same[m].mean() > 0.999
    np.testing.assert_allclose(
        np.asarray(up)[m & same], np.asarray(ud)[m & same], atol=1e-5
    )

    # shadow with per-lane t_max through the same binned machinery
    t_max = jnp.asarray(rng.uniform(0.1, 4.0, n).astype(np.float32))
    occ_p = pk.packet_shadow(t, ov, dv, t_max=t_max, active=act)
    occ_d = dense_shadow(t, ov, dv, t_max=t_max, active=act)
    np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_d))

    # all-dead wave exits without finding anything
    none = jnp.zeros(n, bool)
    tp0, trip0, _, _ = pk.packet_closest(
        t, ov, dv, t_min=0.0, t_max=1e32, active=none
    )
    assert np.all(np.asarray(trip0) == -1)
    assert np.all(np.isinf(np.asarray(tp0)))


def test_treelet_cut_partitions_leaves():
    """The treelet frontier covers every leaf exactly once."""
    from vulkan_raytracer_tpu.accel.bvh import build_bvh, treelet_cut

    rng = np.random.default_rng(13)
    v0 = rng.uniform(-5, 5, (3000, 3)).astype(np.float32)
    v1 = v0 + rng.normal(0, 0.2, (3000, 3)).astype(np.float32)
    v2 = v0 + rng.normal(0, 0.2, (3000, 3)).astype(np.float32)
    bvh = build_bvh(v0, v1, v2)
    first = np.asarray(bvh.first_tri)
    miss = np.asarray(bvh.miss)
    cut = treelet_cut(first, miss, bvh.leaf_size, 256)
    assert len(cut) > 1
    covered = np.zeros(bvh.num_nodes, np.int32)
    for i in cut:
        assert (np.asarray(bvh.first_tri[i]) >= 0) or (
            (np.count_nonzero(first[i:miss[i]] >= 0) * bvh.leaf_size) <= 256
        )
        covered[i:miss[i]] += 1
    # every leaf node inside exactly one treelet range
    leaves = first >= 0
    np.testing.assert_array_equal(covered[leaves], 1)


def test_octant_permutations_structure():
    """Each octant stream is a valid near-first preorder of the same tree."""
    from vulkan_raytracer_tpu.accel.bvh import build_bvh, octant_permutations

    rng = np.random.default_rng(11)
    v0 = rng.uniform(-5, 5, (777, 3)).astype(np.float32)
    v1 = v0 + rng.normal(0, 0.2, (777, 3)).astype(np.float32)
    v2 = v0 + rng.normal(0, 0.2, (777, 3)).astype(np.float32)
    bvh = build_bvh(v0, v1, v2)
    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)
    first = np.asarray(bvh.first_tri)
    miss = np.asarray(bvh.miss)
    n = first.shape[0]
    size = miss - np.arange(n)
    center = 0.5 * (amin + amax)

    perms = octant_permutations(amin, amax, first, miss)
    for o in range(8):
        old = perms[o]
        assert sorted(old.tolist()) == list(range(n))  # a permutation
        new_miss = np.arange(n) + size[old]
        sgn = np.array(
            [1 - 2 * (o & 1), 1 - 2 * ((o >> 1) & 1), 1 - 2 * ((o >> 2) & 1)]
        )
        for i in range(n):
            oi = old[i]
            if first[oi] >= 0:
                assert new_miss[i] == i + 1  # leaf subtree = itself
                continue
            # children cover the subtree contiguously in the new order
            c1 = i + 1
            m1 = new_miss[c1]
            assert i + 1 < new_miss[i] and m1 < new_miss[i]
            assert new_miss[m1] == new_miss[i]
            # near-child-first: first child's center is nearer along sgn
            d1 = center[old[c1]] @ sgn
            d2 = center[old[m1]] @ sgn
            assert d1 <= d2 + 1e-5
            # the two children are the original node's children
            lo, ro = oi + 1, miss[oi + 1]
            assert {old[c1], old[m1]} == {lo, ro}


def test_windowed_treelet_walk_matches_dense(interpret, monkeypatch):
    """Round-4 tile-windowed walk equals dense: forced tiny treelets so a
    tile carries many windows, per-lane t_min/t_max, inactive lanes, the
    ascending-entry early stop, and the shadow variant."""
    monkeypatch.setenv("VKRT_TREELET_TRIS", "128")
    monkeypatch.setenv("VKRT_WINDOWED", "1")
    from vulkan_raytracer_tpu.ops import pallas_bvh as pk

    t = triangle_soup_scene(n_tris=600, seed=9).upload()
    assert t.pbvh.n_treelets > 4
    rng = np.random.default_rng(4)
    n = 512
    ov, dv = _rays(rng, n, spread=1.2, ylift=0.0)
    act = jnp.asarray(np.arange(n) % 3 != 0)
    t_lo = jnp.asarray(rng.uniform(0.0, 0.5, n).astype(np.float32))
    tp, trip, up, vp = pk.packet_closest(
        t, ov, dv, t_min=t_lo, t_max=1e32, active=act
    )
    td, trid, ud, vd = dense_closest(
        t, ov, dv, t_min=t_lo, t_max=1e32, active=act
    )
    trip_n, trid_n = np.asarray(trip), np.asarray(trid)
    np.testing.assert_array_equal(trip_n >= 0, trid_n >= 0)
    m = trip_n >= 0
    np.testing.assert_allclose(np.asarray(tp)[m], np.asarray(td)[m], rtol=1e-5)
    same = trip_n == trid_n
    assert same[m].mean() > 0.999
    np.testing.assert_allclose(
        np.asarray(up)[m & same], np.asarray(ud)[m & same], atol=1e-5
    )

    # shadow with per-lane t_max through the same windowed machinery
    t_max = jnp.asarray(rng.uniform(0.1, 4.0, n).astype(np.float32))
    occ_p = pk.packet_shadow(t, ov, dv, t_max=t_max, active=act)
    occ_d = dense_shadow(t, ov, dv, t_max=t_max, active=act)
    np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_d))

    # all-dead wave exits without walking any window
    none = jnp.zeros(n, bool)
    tp0, trip0, _, _ = pk.packet_closest(
        t, ov, dv, t_min=0.0, t_max=1e32, active=none
    )
    assert np.all(np.asarray(trip0) == -1)
    assert np.all(np.isinf(np.asarray(tp0)))
