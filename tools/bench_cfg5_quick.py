#!/usr/bin/env python
"""Quick cfg5-class e2e number (multi-model scene, 1920x1080, depth 8,
spp 8) — the deepest BASELINE config, where the width ladder has the
most dead-lane tail to shed.

Usage: python tools/bench_cfg5_quick.py [spp] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VKRT_LOG_LEVEL", "ERROR")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_vkrt_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np  # noqa: E402


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from vulkan_raytracer_tpu.render.renderer import render_image
    from vulkan_raytracer_tpu.scene.camera import Camera
    from vulkan_raytracer_tpu.scene.procedural import multi_scene

    t = multi_scene().upload()
    cam = Camera(position=np.array([-9.0, 2.0, 1.5]),
                 direction=np.array([1.0, -0.1, -0.15]))
    img, rays = render_image(t, cam, 1920, 1080, spp=spp, max_depth=8,
                             as_uint8=True)
    assert np.asarray(img).any()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        img, rays = render_image(t, cam, 1920, 1080, spp=spp, max_depth=8,
                                 as_uint8=True)
        best = min(best, time.perf_counter() - t0)
    print(f"cfg5-class spp={spp}: {best:7.2f} s  "
          f"{rays / best / 1e6:6.3f} Mrays/s  mean_px={np.asarray(img).mean():.3f}",
          flush=True)


if __name__ == "__main__":
    main()
