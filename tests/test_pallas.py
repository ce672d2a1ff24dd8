"""Pallas dense-sweep kernel vs the XLA dense fold (interpret mode on CPU)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from vulkan_raytracer_tpu.ops.dense import dense_closest
from vulkan_raytracer_tpu.ops.math3 import V3
from vulkan_raytracer_tpu.scene.builtin import cornell_box_scene


@pytest.fixture
def interpret():
    os.environ["VKRT_PALLAS_INTERPRET"] = "1"
    yield
    os.environ.pop("VKRT_PALLAS_INTERPRET", None)


@pytest.mark.slow
def test_pallas_closest_matches_dense(interpret):
    from vulkan_raytracer_tpu.ops.pallas_dense import pallas_closest, pallas_ok

    t = cornell_box_scene().upload()
    assert pallas_ok(t)
    r = np.random.default_rng(0)
    n = 1024  # one tile
    o = r.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    o[:, 1] += 1.0
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ov = V3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]))
    dv = V3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]))
    act = jnp.asarray(np.arange(n) % 5 != 0)
    tp, trip, up, vp = pallas_closest(t, ov, dv, t_min=1e-7, t_max=1e32, active=act)
    td, trid, ud, vd = dense_closest(t, ov, dv, t_min=1e-7, t_max=1e32, active=act)
    np.testing.assert_array_equal(np.asarray(trip), np.asarray(trid))
    m = np.asarray(trip) >= 0
    np.testing.assert_allclose(np.asarray(tp)[m], np.asarray(td)[m], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(up)[m], np.asarray(ud)[m], atol=1e-5)


def test_pallas_shadow_matches_dense(interpret):
    """Any-hit occlusion kernel vs the XLA fold, incl. dead lanes and
    per-lane t_max edge cases (t_max below/straddling/above the hit)."""
    from vulkan_raytracer_tpu.ops.dense import dense_shadow
    from vulkan_raytracer_tpu.ops.pallas_dense import pallas_shadow

    t = cornell_box_scene().upload()
    r = np.random.default_rng(8)
    n = 1024
    o = r.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    o[:, 1] += 1.0
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ov = V3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]))
    dv = V3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]))
    act = jnp.asarray(np.arange(n) % 4 != 0)
    # t_max spanning 0.05 (mostly unoccluded) to 5 (mostly occluded)
    t_max = jnp.asarray(r.uniform(0.05, 5.0, n).astype(np.float32))
    occ_p = pallas_shadow(t, ov, dv, t_max=t_max, active=act)
    occ_d = dense_shadow(t, ov, dv, t_max=t_max, active=act)
    np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_d))
    assert not np.any(np.asarray(occ_p)[~np.asarray(act)])
    # scalar t_max too (the NEE merged-occlusion launch shape)
    occ_p2 = pallas_shadow(t, ov, dv, t_max=2.5, active=act)
    occ_d2 = dense_shadow(t, ov, dv, t_max=2.5, active=act)
    np.testing.assert_array_equal(np.asarray(occ_p2), np.asarray(occ_d2))


def test_pallas_emissive_pdf_matches_dense(interpret):
    from vulkan_raytracer_tpu.ops.dense import dense_emissive_pdf
    from vulkan_raytracer_tpu.ops.pallas_dense import (
        pallas_emissive_pdf,
        pallas_pdf_ok,
    )

    t = cornell_box_scene().upload()
    assert pallas_pdf_ok(t)
    r = np.random.default_rng(4)
    n = 1024
    o = r.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    o[:, 1] += 0.5
    d = r.normal(size=(n, 3)).astype(np.float32)
    d[:, 1] = np.abs(d[:, 1])  # bias toward the ceiling light
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ov = V3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]))
    dv = V3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]))
    act = jnp.asarray(np.arange(n) % 3 != 0)
    pp = pallas_emissive_pdf(t, ov, dv, t_min=1e-7, active=act)
    pd = dense_emissive_pdf(t, ov, dv, t_min=1e-7, active=act)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(pd), rtol=1e-4, atol=1e-6)
    assert float(np.asarray(pp).max()) > 0  # some rays hit the light
