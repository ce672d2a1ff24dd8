#!/usr/bin/env python
"""Stage-level timing for the config-1 (Cornell 512x512) hot path.

Times each pipeline stage under its own jit on the full 262144-lane
wavefront, and the end-to-end sample, so kernel-vs-glue cost is visible.
Numbers feed the DESIGN.md perf journey table.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("VKRT_LOG_LEVEL", "ERROR")

import jax
import jax.numpy as jnp
import numpy as np

from vulkan_raytracer_tpu.ops import rng
from vulkan_raytracer_tpu.ops.math3 import EPS, INF
from vulkan_raytracer_tpu.ops.pallas_dense import pallas_closest, pallas_emissive_pdf
from vulkan_raytracer_tpu.render.integrator import (
    eval_hit,
    generate_primary_rays,
    render_sample,
    sample_lights,
)
from vulkan_raytracer_tpu.ops.bsdf import sample_material
from vulkan_raytracer_tpu.ops.math3 import v3_to_tangent
from vulkan_raytracer_tpu.render.renderer import camera_uniforms
from vulkan_raytracer_tpu.scene.builtin import cornell_box_scene
from vulkan_raytracer_tpu.scene.camera import Camera

W = H = 512
N = W * H


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt * 1e3:9.3f} ms   ({N / dt / 1e6:8.1f} Mlanes/s)")
    return dt


def main():
    tables = cornell_box_scene().upload()
    cam = Camera(
        position=np.array([0.0, 1.0, 3.9]),
        direction=np.array([0.0, 0.0, -1.0]),
        aspect=1.0,
    )
    view_inv, proj_inv = camera_uniforms(cam)

    o, d, seed = jax.jit(
        lambda vi, pi: generate_primary_rays(vi, pi, W, H, 3)
    )(view_inv, proj_inv)
    active = jnp.ones((N,), bool)

    t_closest = timeit(
        "pallas_closest (1 trace)",
        jax.jit(lambda o, d: pallas_closest(tables, o, d, t_min=EPS, t_max=INF, active=active)),
        o, d,
    )
    t, tri, u, v = jax.jit(
        lambda o, d: pallas_closest(tables, o, d, t_min=EPS, t_max=INF, active=active)
    )(o, d)

    t_pdf = timeit(
        "pallas_emissive_pdf (1 probe)",
        jax.jit(lambda o, d: pallas_emissive_pdf(tables, o, d, t_min=EPS, active=active)),
        o, d,
    )

    t_eval = timeit(
        "eval_hit",
        jax.jit(lambda o, d, t, tri, u, v: eval_hit(tables, o, d, t, tri, u, v)),
        o, d, t, tri, u, v,
    )
    hit = jax.jit(lambda o, d, t, tri, u, v: eval_hit(tables, o, d, t, tri, u, v))(
        o, d, t, tri, u, v
    )

    wl = jnp.zeros((N,), jnp.float32)

    def _mat(seed, hit, wl, d):
        view = -d
        tview = v3_to_tangent(view, hit.tangent, hit.bitangent, hit.normal)
        return sample_material(seed, hit, wl, tview)

    t_mat = timeit("sample_material", jax.jit(_mat), seed, hit, wl, d)

    def _lights(hit, wl, d, seed):
        return sample_lights(tables, hit, wl, -d, seed, active)

    t_lights = timeit("sample_lights (shadow+pdf+bsdf)", jax.jit(_lights), hit, wl, d, seed)

    t_sample = timeit(
        "render_sample (full, depth 4)",
        jax.jit(lambda vi, pi: render_sample(tables, vi, pi, W, H, 3, 4)),
        view_inv, proj_inv, reps=5,
    )

    # rough reconstruction: bounces ~ depth, each = closest + mat + eval + lights (+pdf probe)
    per_bounce = t_closest + t_pdf + t_eval + t_mat + t_lights
    print(f"\nsum-of-stages x4 bounces = {per_bounce * 4 * 1e3:.2f} ms "
          f"vs render_sample {t_sample * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
