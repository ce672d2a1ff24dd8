#!/usr/bin/env python
"""Real-chip parity: sharded renderer on a 1-device mesh vs the plain path.

The sharded renderer (parallel/sharding.py) reuses the single-chip perf
machinery — 32x32 block-swizzled lane slices, sample-batched waves,
banding — so a mesh of ONE device should match render_image's Mrays/s
within ~10% (round-2 verdict, sharded-parity item).  Multi-device
correctness is covered by tests/test_parallel.py on the virtual CPU mesh;
this tool is the perf half, runnable only where a real chip exists.

Run: python tools/bench_sharded_parity.py [small|big|both]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VKRT_LOG_LEVEL", "ERROR")

import jax
import numpy as np

from vulkan_raytracer_tpu.parallel.sharding import make_mesh, render_image_sharded
from vulkan_raytracer_tpu.render.renderer import render_image
from vulkan_raytracer_tpu.scene.builtin import cornell_box_scene
from vulkan_raytracer_tpu.scene.camera import Camera


def run(name, tables, cam, w, h, spp, depth):
    mesh = make_mesh(jax.devices()[:1])

    def plain():
        return render_image(tables, cam, w, h, spp=spp, max_depth=depth)

    def sharded():
        return render_image_sharded(tables, cam, w, h, spp, depth, mesh)

    out = {}
    for label, fn in (("plain", plain), ("sharded", sharded)):
        img, rays = fn()  # warm-up/compile
        t0 = time.perf_counter()
        img, rays = fn()
        dt = time.perf_counter() - t0
        out[label] = (rays / dt / 1e6, img)
        print(f"{name:10s} {label:8s} {rays / dt / 1e6:9.3f} Mrays/s "
              f"({dt:6.2f} s)", flush=True)
    ratio = out["sharded"][0] / out["plain"][0]
    rmse = float(np.sqrt(np.mean((out["sharded"][1] - out["plain"][1]) ** 2)))
    print(f"{name:10s} sharded/plain = {ratio:.3f}   image RMSE {rmse:.2e}",
          flush=True)
    return ratio


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("small", "both"):
        t = cornell_box_scene().upload()
        cam = Camera(position=np.array([0.0, 1.0, 2.4]),
                     direction=np.array([0.0, 0.0, -1.0]))
        run("cornell", t, cam, 512, 512, spp=16, depth=4)
    if which in ("big", "both"):
        from vulkan_raytracer_tpu.scene.procedural import hall_scene

        t = hall_scene().upload()
        cam = Camera(position=np.array([-9.0, 1.8, 0.0]),
                     direction=np.array([1.0, 0.0, 0.0]))
        run("hall", t, cam, 512, 512, spp=2, depth=3)


if __name__ == "__main__":
    main()
