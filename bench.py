#!/usr/bin/env python
"""Benchmark: Cornell box 512x512, depth 4, 64 spp (BASELINE.md config 1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = Mrays/s on the current accelerator (real traversals counted
in-program: material + NEE shadow/verify + MIS pdf-probe rays).
vs_baseline is against the BASELINE.json north-star target of 150 Mrays/s
per chip (the reference publishes no numbers of its own, BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("VKRT_LOG_LEVEL", "ERROR")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_vkrt_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np  # noqa: E402

from vulkan_raytracer_tpu.render.renderer import render_image  # noqa: E402
from vulkan_raytracer_tpu.scene.builtin import cornell_box_scene  # noqa: E402
from vulkan_raytracer_tpu.scene.camera import Camera  # noqa: E402

WIDTH = HEIGHT = 512
SPP = 64
DEPTH = 4
TARGET_MRAYS = 150.0  # BASELINE.json north_star


def main() -> None:
    tables = cornell_box_scene().upload()
    cam = Camera(
        position=np.array([0.0, 1.0, 2.4]), direction=np.array([0.0, 0.0, -1.0])
    )
    # warm-up / compile (same spp so the timed call hits the compiled program)
    img, _ = render_image(tables, cam, WIDTH, HEIGHT, spp=SPP, max_depth=DEPTH)
    t0 = time.perf_counter()
    img, rays = render_image(tables, cam, WIDTH, HEIGHT, spp=SPP, max_depth=DEPTH)
    dt = time.perf_counter() - t0
    assert np.isfinite(img).all(), "benchmark render produced non-finite pixels"
    mrays = rays / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "Mrays_per_sec_cornell_512x512_depth4_64spp",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / TARGET_MRAYS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
