"""End-to-end RMSE vs the independent NumPy oracle (BASELINE.md metric).

The quality bar from BASELINE.json: per-pixel RMSE < 2e-3 vs the CPU
reference at equal spp.  The XLA renderer and the oracle share RNG streams,
so they should agree to float32 rounding (observed ~1e-7), far inside the
bar; these tests exercise diffuse GI, emissive MIS, and the full
transmission/volume/dispersion path.
"""

import numpy as np
import pytest

from vulkan_raytracer_tpu.render import oracle
from vulkan_raytracer_tpu.render.renderer import render_image
from vulkan_raytracer_tpu.scene.builtin import cornell_box_scene, glass_sphere_scene
from vulkan_raytracer_tpu.scene.camera import Camera

RMSE_BAR = 2e-3


def _rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)))


def test_cornell_matches_oracle():
    tables = cornell_box_scene().upload()
    cam = Camera(
        position=np.array([0.0, 1.0, 3.9]), direction=np.array([0.0, 0.0, -1.0])
    )
    img_j, _ = render_image(tables, cam, 32, 32, spp=2, max_depth=3, tonemap=False)
    img_o = oracle.render_image(tables, cam, 32, 32, spp=2, max_depth=3)
    r = _rmse(img_j, img_o)
    assert r < RMSE_BAR, f"RMSE {r} vs oracle exceeds bar"
    assert img_j.mean() > 1e-3  # actually lit


def test_glass_sphere_matches_oracle():
    """Transmission + refraction + Beer-Lambert volume absorption."""
    tables = glass_sphere_scene(subdiv=2).upload()
    cam = Camera(
        position=np.array([0.0, 1.2, 3.0]), direction=np.array([0.0, -0.1, -1.0])
    )
    img_j, _ = render_image(tables, cam, 24, 24, spp=2, max_depth=4, tonemap=False)
    img_o = oracle.render_image(tables, cam, 24, 24, spp=2, max_depth=4)
    r = _rmse(img_j, img_o)
    assert r < RMSE_BAR, f"glass RMSE {r} vs oracle exceeds bar"


def test_dispersive_glass_matches_oracle():
    """Spectral dispersion: wavelength collapse + Cauchy ior fit."""
    tables = glass_sphere_scene(subdiv=2, dispersion=0.2).upload()
    cam = Camera(
        position=np.array([0.0, 1.2, 3.0]), direction=np.array([0.0, -0.1, -1.0])
    )
    img_j, _ = render_image(tables, cam, 16, 16, spp=3, max_depth=4, tonemap=False)
    img_o = oracle.render_image(tables, cam, 16, 16, spp=3, max_depth=4)
    r = _rmse(img_j, img_o)
    assert r < RMSE_BAR, f"dispersion RMSE {r} vs oracle exceeds bar"


def test_thin_glass_matches_oracle():
    tables = glass_sphere_scene(subdiv=2, thin=True).upload()
    cam = Camera(
        position=np.array([0.0, 1.2, 3.0]), direction=np.array([0.0, -0.1, -1.0])
    )
    img_j, _ = render_image(tables, cam, 16, 16, spp=2, max_depth=3, tonemap=False)
    img_o = oracle.render_image(tables, cam, 16, 16, spp=2, max_depth=3)
    assert _rmse(img_j, img_o) < RMSE_BAR
