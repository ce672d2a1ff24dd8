#!/usr/bin/env python
"""Per-bounce live-lane fractions on the cfg4-class workload (round 5).

The bounce loop evaluates eval_hit/sample_material/sample_lights at FULL
band width every bounce; lanes only mask out.  If late bounces run well
under half occupancy, a width-halving ladder (live-first sort + static
prefix slice under lax.cond) pays.  This measures the actual fractions.

Usage: python tools/bounce_occupancy.py [side] [depth]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VKRT_LOG_LEVEL", "ERROR")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax.numpy as jnp

    from vulkan_raytracer_tpu.ops.math3 import V3, v3_from_tangent, v3_to_tangent
    from vulkan_raytracer_tpu.ops.bsdf import sample_material
    from vulkan_raytracer_tpu.render import integrator as I
    from vulkan_raytracer_tpu.render.renderer import camera_uniforms
    from vulkan_raytracer_tpu.scene.camera import Camera
    from vulkan_raytracer_tpu.scene.procedural import hall_scene, sky_hdr

    s = hall_scene()
    s.skybox = sky_hdr()
    s.skybox_strength = 1.0
    t = s.upload()
    cam = Camera(position=np.array([-9.0, 1.8, 0.0]),
                 direction=np.array([1.0, 0.0, 0.0]))
    cam.aspect = 1.0
    vi, pi = camera_uniforms(cam)

    n = side * side
    origin, direction, seed = I.generate_primary_rays(
        vi, pi, side, side, jnp.uint32(1))
    active = jnp.ones((n,), bool)
    throughput = V3.splat((1.0, 1.0, 1.0), (n,))
    wavelength = jnp.zeros((n,), jnp.float32)

    for b in range(depth + 1):
        frac = float(jnp.mean(active))
        print(f"bounce {b}: live {frac:6.3f}", flush=True)
        if frac == 0.0:
            break
        (tt, tri, u, v), seed = I._closest(
            t, origin, direction, t_min=I.EPS, t_max=I.INF, active=active,
            seed=seed)
        hit = I.eval_hit(t, origin, direction, tt, tri, u, v, sky=False)
        miss = tri < 0
        terminal = miss | hit.mat.emissive.any_nonzero() | (b == depth)
        cont = active & ~terminal
        view = -direction
        tview = v3_to_tangent(view, hit.tangent, hit.bitangent, hit.normal)
        d_t, est, pdf_m, _, wl, seed_m = sample_material(
            seed, hit, wavelength, tview)
        seed = jnp.where(cont, seed_m, seed)
        wavelength = jnp.where(cont, wl, wavelength)
        new_dir = v3_from_tangent(d_t, hit.tangent, hit.bitangent, hit.normal)
        throughput = (throughput * est).where(cont, throughput)
        active = cont & throughput.any_nonzero()
        off = jnp.where(hit.normal.dot(new_dir) >= 0.0, I.BIAS, -I.BIAS)
        origin = (hit.pos + hit.normal * off).where(cont, origin)
        direction = new_dir.where(cont, direction)


if __name__ == "__main__":
    main()
