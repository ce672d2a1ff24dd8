#!/usr/bin/env python
"""Marginal-cost ablation of render_sample stages on config 1.

Monkeypatches integrator stages with cheap stubs and times the fused
program; the delta vs the full pipeline is each stage's marginal cost
inside XLA's fusion (standalone timings overcount by HBM round-trips).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VKRT_LOG_LEVEL", "ERROR")

import jax
import jax.numpy as jnp
import numpy as np

import vulkan_raytracer_tpu.render.integrator as integ
from vulkan_raytracer_tpu.ops.math3 import V3
from vulkan_raytracer_tpu.render.renderer import camera_uniforms
from vulkan_raytracer_tpu.scene.builtin import cornell_box_scene
from vulkan_raytracer_tpu.scene.camera import Camera

W = H = 512
N = W * H


def time_render(tables, view_inv, proj_inv, reps=10):
    fn = jax.jit(lambda vi, pi: integ.render_sample(tables, vi, pi, W, H, 3, 4))
    out = fn(view_inv, proj_inv)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(view_inv, proj_inv)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    tables = cornell_box_scene().upload()
    cam = Camera(
        position=np.array([0.0, 1.0, 3.9]),
        direction=np.array([0.0, 0.0, -1.0]),
        aspect=1.0,
    )
    view_inv, proj_inv = camera_uniforms(cam)

    base = time_render(tables, view_inv, proj_inv)
    print(f"full pipeline            {base * 1e3:8.3f} ms/sample")

    orig_lights = integ.sample_lights
    orig_pdf = integ._emissive_pdf
    orig_shadow = integ._shadow

    # ablate NEE entirely
    integ.sample_lights = lambda tables, hit, wl, view, seed, mask: (
        V3.splat((0.0, 0.0, 0.0), (hit.t.shape[0],)), seed, jnp.zeros((), jnp.int32)
    )
    t = time_render(tables, view_inv, proj_inv)
    print(f"- NEE (sample_lights)    {t * 1e3:8.3f} ms  (marginal {1e3 * (base - t):.3f})")
    integ.sample_lights = orig_lights

    # ablate just the shadow trace inside NEE
    integ._shadow = lambda tables, o, d, *, t_max, active, seed: (
        jnp.zeros_like(active), seed
    )
    t = time_render(tables, view_inv, proj_inv)
    print(f"- shadow traces          {t * 1e3:8.3f} ms  (marginal {1e3 * (base - t):.3f})")
    integ._shadow = orig_shadow

    # ablate all emissive-pdf probes (terminal MIS + NEE pdf)
    integ._emissive_pdf = lambda tables, o, d, *, t_min, active: jnp.ones(
        (o.x.shape[0],), jnp.float32
    )
    t = time_render(tables, view_inv, proj_inv)
    print(f"- pdf probes             {t * 1e3:8.3f} ms  (marginal {1e3 * (base - t):.3f})")
    integ._emissive_pdf = orig_pdf

    # ablate material closest trace: fixed plane hit
    orig_closest = integ._closest
    def fake_closest(tables, o, d, *, t_min, t_max, active, seed):
        n = o.x.shape[0]
        return (
            jnp.full((n,), 2.0, jnp.float32),
            jnp.zeros((n,), jnp.int32),
            jnp.full((n,), 0.3, jnp.float32),
            jnp.full((n,), 0.3, jnp.float32),
        ), seed
    integ._closest = fake_closest
    t = time_render(tables, view_inv, proj_inv)
    print(f"- material closest       {t * 1e3:8.3f} ms  (marginal {1e3 * (base - t):.3f})")
    integ._closest = orig_closest


if __name__ == "__main__":
    main()
