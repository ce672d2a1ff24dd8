#!/usr/bin/env python
"""Split the integrator's per-bounce XLA eval cost by component (round 5).

tools/profile_cfg4.py (self-time fix) shows the cfg4 frame is ~48%
windowed traversal kernels and ~52% fused XLA — the integrator eval is
now the bigger half and was never attacked.  This tool times each eval
component on ONE production-shaped band (512k lanes, hall + HDR sky,
the cfg4 workload) so optimisation effort goes where the time is:

  closest      windowed closest-hit traversal (the known kernel cost)
  winner_uv    9 flat gathers recomputing the winner's barycentrics
  eval_hit     attribute/material gathers + TBN + sky fetch
  sky_only     sample_equirect alone (per-bounce skybox fetch, all lanes)
  sample_mat   full-lobe BSDF sampling (ops/bsdf.sample_material)
  nee_full     sample_lights complete (incl. its occlusion launch)
  shadow_only  the occlusion traversal alone (to subtract from nee_full)

Usage: python tools/bench_eval_split.py [reps]
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import jax
    import jax.numpy as jnp

    from vulkan_raytracer_tpu.ops.bsdf import sample_material
    from vulkan_raytracer_tpu.ops.math3 import V3, v3_to_tangent
    from vulkan_raytracer_tpu.ops.texture import sample_equirect
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

    n = 1 << 19
    side = 724  # ~512k primary lanes
    origin, direction, seed = I.generate_primary_rays(
        vi, pi, side, side, jnp.uint32(1),
        lane_idx=jnp.arange(n, dtype=jnp.int32))
    active = jnp.ones((n,), bool)

    # one real closest-hit to get production-shaped (t, tri, u, v)
    (tt, tri, u, v), seed2 = I._closest(
        t, origin, direction, t_min=I.EPS, t_max=I.INF, active=active,
        seed=seed)
    hit = I.eval_hit(t, origin, direction, tt, tri, u, v)
    wavelength = jnp.zeros((n,), jnp.float32)
    view = -direction
    tview = v3_to_tangent(view, hit.tangent, hit.bitangent, hit.normal)

    def timeit(name, fn, *args):
        # reduce over EVERY output leaf so XLA cannot dead-code-eliminate
        # any part of the component being timed
        def wrapped(*a):
            out = fn(*a)
            return sum(
                jnp.sum(x.astype(jnp.float32))
                for x in jax.tree_util.tree_leaves(out)
            )

        f = jax.jit(wrapped)
        out = jax.block_until_ready(f(*args))  # compile
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:12s} {1e3 * best:9.2f} ms", flush=True)
        return best, out

    print(f"hall+sky, {n} lanes, best of {reps}:", flush=True)

    from vulkan_raytracer_tpu.ops.bsdf import material_bsdf, material_pdf
    from vulkan_raytracer_tpu.ops.pallas_bvh import _winner_uv

    timeit("closest", lambda o, d: I._closest(
        t, o, d, t_min=I.EPS, t_max=I.INF, active=active, seed=seed),
        origin, direction)

    timeit("winner_uv", lambda o, d: _winner_uv(t, o, d, tri >= 0, tt, tri),
           origin, direction)

    timeit("eval_hit", lambda o, d: I.eval_hit(
        t, o, d, tt, tri, u, v), origin, direction)

    timeit("sky_only", lambda d: sample_equirect(
        t.skybox, d.to_array()), direction)

    timeit("sample_mat", lambda sd: sample_material(
        sd, hit, wavelength, tview), seed2)

    timeit("bsdf+pdf", lambda l: (
        material_bsdf(hit, wavelength, tview, l),
        material_pdf(hit, tview, l)), tview)

    timeit("emis_sample", lambda sd: I._sample_emissive(
        t, hit, sd, active), seed2)

    timeit("pdf_probe", lambda o, d: I._emissive_pdf(
        t, o, d, t_min=0.0, active=active), hit.pos, direction)

    sh_t, _ = timeit("shadow_only", lambda o: I._shadow(
        t, o, hit.normal, t_max=jnp.full((n,), 1.0), active=active,
        seed=seed2), hit.pos)

    nee_t, _ = timeit("nee_full", lambda sd: I.sample_lights(
        t, hit, wavelength, view, sd, active), seed2)

    print(f"  nee minus shadow ~ {1e3 * (nee_t - sh_t):9.2f} ms")

    # window-glue alone (the XLA slab-test + masked-reduction pass that
    # runs once per phase per launch — 4x per closest under the default
    # "4,8,16" schedule, 1x per shadow)
    from vulkan_raytracer_tpu.ops import pallas_bvh as PB

    pb = t.pbvh
    if pb is not None and pb.n_treelets > 1:
        def glue(o_, d_):
            rays, t_init, _ = PB._prep_rays(o_, d_, jnp.where(
                active, jnp.float32(I.INF), -1.0))
            t_lo_p = jnp.zeros(t_init.shape, jnp.float32)
            _, octs = PB._tile_beam_bounds(rays, t_init)
            return PB._window_glue(pb, rays, t_lo_p, t_init, octs)

        timeit("win_glue", glue, origin, direction)


if __name__ == "__main__":
    main()
