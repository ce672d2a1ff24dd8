#!/usr/bin/env python
"""Isolate why an identical wave is slower under a 1-device shard_map.

Times the same 512x512 Cornell 2-sample wave three ways: plain jit,
jit(shard_map) over a 1-device mesh, and the full scan programs
(_render_batch vs _render_scan_sharded).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VKRT_LOG_LEVEL", "ERROR")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from vulkan_raytracer_tpu.parallel.sharding import (
    _render_scan_sharded,
    make_mesh,
)
from vulkan_raytracer_tpu.render.integrator import _block_order
from vulkan_raytracer_tpu.render.renderer import (
    _render_batch,
    _render_wave,
    camera_uniforms,
)
from vulkan_raytracer_tpu.scene.builtin import cornell_box_scene
from vulkan_raytracer_tpu.scene.camera import Camera

W = H = 512
N = W * H


def bench(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best * 1e3:9.2f} ms", flush=True)
    return best


def main():
    tables = cornell_box_scene().upload()
    cam = Camera(position=np.array([0.0, 1.0, 2.4]),
                 direction=np.array([0.0, 0.0, -1.0]), aspect=1.0)
    view_inv, proj_inv = camera_uniforms(cam)
    lanes = jnp.asarray(_block_order(W, H)[0])
    samples = jnp.arange(1, 3, dtype=jnp.uint32)
    mesh = make_mesh(jax.devices()[:1])

    wave = jax.jit(lambda t, vi, pi, s, l: _render_wave(
        t, vi, pi, W, H, 4, s, l, "reference"))
    bench("wave plain jit", wave, tables, view_inv, proj_inv, samples, lanes)

    @jax.jit
    def wave_sm(tables_, vi, pi, samples_, lanes_):
        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=(P(), P(), P(), P(), P("dp")),
            out_specs=(P("dp"), P()), check_vma=False)
        def body(t_, vi_, pi_, s_, l_):
            r, rays = _render_wave(t_, vi_, pi_, W, H, 4, s_, l_, "reference")
            return r, jax.lax.psum(rays, "dp")
        return body(tables_, vi, pi, samples_, lanes_)

    bench("wave 1-dev shard_map", wave_sm, tables, view_inv, proj_inv,
          samples, lanes)

    bench("_render_batch (16spp)", _render_batch, tables, view_inv, proj_inv,
          W, H, 4, 16, jnp.uint32(1))
    bench("_render_scan_sharded 16spp", functools.partial(
        _render_scan_sharded, mesh=mesh), tables, view_inv, proj_inv,
        W, H, 4, 16, jnp.uint32(1), lanes)


if __name__ == "__main__":
    main()
