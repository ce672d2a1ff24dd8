#!/usr/bin/env python
"""Quick cfg4-class e2e number (hall + HDR sky, 960x540, depth 4, spp 8).

One warm-up frame + N timed frames through the production banded
renderer with current defaults — the round-5 A/B harness for integrator
eval changes (deferred sky, NEE glue, window-glue schedule).

Usage: python tools/bench_cfg4_quick.py [spp] [reps]
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from vulkan_raytracer_tpu.render.renderer import render_image
    from vulkan_raytracer_tpu.scene.camera import Camera
    from vulkan_raytracer_tpu.scene.procedural import hall_scene, sky_hdr

    s = hall_scene()
    s.skybox = sky_hdr()
    s.skybox_strength = 1.0
    t = s.upload()
    cam = Camera(position=np.array([-9.0, 1.8, 0.0]),
                 direction=np.array([1.0, 0.0, 0.0]))
    img, rays = render_image(t, cam, 960, 540, spp=spp, max_depth=4,
                             as_uint8=True)
    assert np.asarray(img).any()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        img, rays = render_image(t, cam, 960, 540, spp=spp, max_depth=4,
                                 as_uint8=True)
        best = min(best, time.perf_counter() - t0)
    print(f"cfg4-class spp={spp}: {best:7.2f} s  "
          f"{rays / best / 1e6:6.3f} Mrays/s  mean_px={np.asarray(img).mean():.3f}",
          flush=True)


if __name__ == "__main__":
    main()
