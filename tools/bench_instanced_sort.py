#!/usr/bin/env python
"""Measure the instanced-scene wavefront-sort gap (round-3 verdict weak 7).

Instanced scenes whose prototypes are all <= DENSE_MAX_TRIS get no
per-bounce wavefront repack (`_beam_occlusion` is false: every BLAS walk
is a per-lane dense fold, which is order-insensitive in its vector math).
The open question: do the per-instance dense folds still benefit from
sorted bounce waves via dead-lane clustering (tiles of dead lanes exit
cheaply only in the packet kernel - dense folds pay the same for dead
and live lanes, so the expected answer is NO - but it was unmeasured).

A/B: many-small-prototype instanced scene, depth-4 render, with
VKRT_FORCE_REPACK=1 vs default (no repack).

Usage: python tools/bench_instanced_sort.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VKRT_LOG_LEVEL", "ERROR")
os.environ["VKRT_INSTANCING"] = "1"

import numpy as np  # noqa: E402


def build():
    from vulkan_raytracer_tpu.scene.procedural import (
        _add_mesh,
        _mat,
        _sphere_mesh,
    )
    from vulkan_raytracer_tpu.scene.scenegraph import Scene

    s = Scene()
    pos, idx = _sphere_mesh(12, 18, 0.4)  # ~400 tris per prototype
    rng = np.random.default_rng(3)
    for i in range(160):  # 160 instances of one small prototype
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = rng.uniform(-6, 6, 3) * [1, 0.4, 1] + [0, 1.2, 0]
        _add_mesh(s, pos, idx, _mat(base=(0.7, 0.6, 0.5), roughness=0.6),
                  transform=t)
    floor = np.array(
        [[-8, 0, -8], [8, 0, -8], [8, 0, 8], [-8, 0, 8]], np.float32
    )
    _add_mesh(s, floor, np.array([[0, 1, 2], [0, 2, 3]], np.int32),
              _mat(base=(0.8, 0.8, 0.8)))
    light = np.array(
        [[-1, 7, -1], [1, 7, -1], [1, 7, 1], [-1, 7, 1]], np.float32
    )
    _add_mesh(s, light, np.array([[0, 2, 1], [0, 3, 2]], np.int32),
              _mat(emissive=(12.0, 12.0, 12.0)))
    return s


def run(tag):
    from vulkan_raytracer_tpu.render.renderer import render_image
    from vulkan_raytracer_tpu.scene.camera import Camera

    t = build().upload()
    assert t.inst is not None, "scene must take the instanced path"
    assert all(g.pblas is None for g in t.inst.groups), (
        "prototypes must be dense-fold sized for this measurement"
    )
    cam = Camera(position=np.array([0.0, 3.0, 9.0]),
                 direction=np.array([0.0, -0.2, -1.0]))
    img, rays = render_image(t, cam, 512, 512, spp=2, max_depth=4,
                             as_uint8=True)
    t0 = time.perf_counter()
    img, rays = render_image(t, cam, 512, 512, spp=2, max_depth=4,
                             as_uint8=True)
    dt = time.perf_counter() - t0
    print(f"{tag:24s}: {dt:7.2f} s  {rays / dt / 1e6:6.3f} Mrays/s", flush=True)
    return np.asarray(img)


def main():
    base = run("no repack (default)")
    os.environ["VKRT_FORCE_REPACK"] = "1"
    forced = run("forced wavefront sort")
    print(f"pixel agreement: {(base == forced).mean():.6f}")


if __name__ == "__main__":
    main()
