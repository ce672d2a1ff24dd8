#!/usr/bin/env python
"""End-to-end render A/B for the tile-windowed treelet walk.

cfg4-class frame (hall + HDR sky, 960x540, depth 4) through the real
renderer - primaries, bounce material rays, merged NEE occlusion, pdf
probes - with the windowed walk off/on at several treelet cuts.

Usage: python tools/bench_windowed_e2e.py [spp]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VKRT_LOG_LEVEL", "ERROR")

import numpy as np  # noqa: E402


def run(tag, spp):
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
    t0 = time.perf_counter()
    img, rays = render_image(t, cam, 960, 540, spp=spp, max_depth=4,
                             as_uint8=True)
    dt = time.perf_counter() - t0
    print(f"{tag:32s}: {dt:7.2f} s  {rays / dt / 1e6:6.3f} Mrays/s",
          flush=True)
    return np.asarray(img)


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    base = run("plain (windowed off)", spp)
    for tt, cap in ((2048, 128), (1024, 256)):
        os.environ["VKRT_WINDOWED"] = "1"
        os.environ["VKRT_TREELET_TRIS"] = str(tt)
        os.environ["VKRT_MAX_TREELETS"] = str(cap)
        img = run(f"windowed tt={tt} K<={cap}", spp)
        same = (img == base).mean()
        print(f"  pixel agreement vs plain: {same:.6f}", flush=True)


if __name__ == "__main__":
    main()
