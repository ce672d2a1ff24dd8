"""A/B the pixels-per-band vs samples-per-wave trade at fixed wave size.

A traversal wave is (band_pixels x spp_chunk) lanes <= MAX_LANES_PER_PASS.
More samples of the SAME pixel block pack more rays per (octant,
origin-morton) sort bin — bounce tiles get tighter beams — at the price
of smaller pixel bands (more dispatches).  DESIGN.md measured the 4x
sample batch at +44% bounce throughput on the hall wave; this tool sweeps
spp_chunk in {1, 2, 4, 8, 16} on a cfg4-class frame (960x540, hall scene,
HDR-skybox-free) by forcing the banded path, so the default chunk is
pinned by an end-to-end number instead of one wave microbench.

Run on chip: python tools/bench_sample_batch.py [spp] [depth]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VKRT_LOG_LEVEL", "ERROR")

import jax
import numpy as np


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    w, h = 960, 540

    from vulkan_raytracer_tpu.render import renderer as rd
    from vulkan_raytracer_tpu.scene.procedural import hall_scene
    from vulkan_raytracer_tpu.scene.camera import Camera

    tables = hall_scene().upload()
    cam = Camera(position=np.array([-9.0, 1.8, 0.0]),
                 direction=np.array([1.0, 0.0, 0.0]))
    cam.aspect = w / h
    view_inv, proj_inv = rd.camera_uniforms(cam)

    base_img = None
    for chunk in (1, 2, 4, 8, 16):
        if chunk > spp:
            break
        os.environ["VKRT_SPP_CHUNK"] = str(chunk)
        # warm-up (compile) with 1 chunk's worth, then timed full run
        rd._render_batch_banded(
            tables, view_inv, proj_inv, w, h, depth, min(spp, chunk),
            1,
        )
        t0 = time.perf_counter()
        acc, rays = rd._render_batch_banded(
            tables, view_inv, proj_inv, w, h, depth, spp, 1,
        )
        jax.block_until_ready(acc)
        dt = time.perf_counter() - t0
        img = np.asarray(acc)
        if base_img is None:
            base_img = img
        rmse = float(np.sqrt(np.mean((img - base_img) ** 2)))
        print(
            f"spp_chunk {chunk:3d}: {rays / dt / 1e6:7.3f} Mrays/s "
            f"({dt:6.2f} s, {spp / dt:6.3f} spp/s, rmse_vs_chunk1 {rmse:.2e})",
            flush=True,
        )


if __name__ == "__main__":
    main()
