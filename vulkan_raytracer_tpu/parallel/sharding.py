"""Multi-chip rendering: pixel-tile data parallelism over a device mesh.

The reference is strictly single-GPU — its "communication backend" is
Vulkan queues/fences/barriers on one device (SURVEY.md §2c).  The TPU-native
scaling axis is embarrassing pixel parallelism: shard the pixel lanes over
a 1-D ``jax.sharding.Mesh`` with ``shard_map``, replicate the (small) scene
tables on every chip, and let each chip run its own traversal loops over its
tile — no halos, no collectives in the hot path (a single psum folds the
per-chip ray counters).  Display/IO gathers tiles over ICI via the output
sharding.

Per-chip loops beat one global SPMD loop here: ``lax.while_loop`` traversal
under a global program would all-reduce its continuation predicate every
iteration; with shard_map each chip's wavefront converges independently.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.tonemap import reinhard_jodie
from ..render.integrator import render_sample


def make_mesh(devices=None, axis: str = "dp") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    import numpy as np

    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


def render_sample_sharded(
    tables, view_inv, proj_inv, width, height, sample_count, max_depth, mesh: Mesh,
    nee_weighting: str = "reference",
):
    """One progressive sample, pixels sharded over ``mesh``'s first axis.

    Returns (radiance (N, 3) sharded over lanes, total rays psum'd).
    Lane counts that do not divide the mesh size are padded: the last chip
    re-renders a few duplicate pixels whose lanes are sliced off again —
    an 800x600 frame on 7 devices just works.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    n = width * height
    per = -(-n // n_dev)  # ceil: pad duplicate lanes on the last chip

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(axis), P()),
        # loop carries created inside the body start as replicated-typed but
        # become device-varying; skip the static vma check instead of
        # peppering pcast through the traversal loops
        check_vma=False,
    )
    def body(tables_, vi, pi):
        d = jax.lax.axis_index(axis)
        lane0 = (d * per).astype(jnp.uint32)
        lanes = jnp.minimum(lane0 + jnp.arange(per, dtype=jnp.uint32), n - 1)
        radiance, rays = render_sample(
            tables_, vi, pi, width, height, sample_count, max_depth,
            lane_idx=lanes, nee_weighting=nee_weighting,
        )
        return radiance, jax.lax.psum(rays, axis)

    radiance, rays = body(tables, view_inv, proj_inv)
    return radiance[:n], rays


@functools.partial(
    jax.jit, static_argnums=(3, 4, 5, 6, 8),
    static_argnames=("mesh", "nee_weighting"),
)
def _render_batch_sharded(
    tables, view_inv, proj_inv, width, height, max_depth, spp, start_sample, mesh,
    nee_weighting="reference",
):
    def step(acc, s):
        radiance, rays = render_sample_sharded(
            tables, view_inv, proj_inv, width, height, s, max_depth, mesh,
            nee_weighting=nee_weighting,
        )
        return acc + radiance, rays

    init = jnp.zeros((width * height, 3), jnp.float32)
    samples = start_sample + jnp.arange(spp, dtype=jnp.uint32)
    return jax.lax.scan(step, init, samples)


def render_image_sharded(
    tables, camera, width, height, spp, max_depth, mesh: Mesh, start_sample: int = 1,
    tonemap: bool = True, nee_weighting: str = "reference",
):
    """Headless multi-chip render; same contract as render.renderer.render_image."""
    import numpy as np

    from ..render.renderer import camera_uniforms

    camera.aspect = width / height
    view_inv, proj_inv = camera_uniforms(camera)
    acc, rays = _render_batch_sharded(
        tables, view_inv, proj_inv, width, height, max_depth, spp,
        jnp.uint32(start_sample), mesh=mesh, nee_weighting=nee_weighting,
    )
    img = acc / jnp.float32(spp)
    if tonemap:
        img = reinhard_jodie(img)
    img = np.asarray(jax.device_get(img)).reshape(height, width, 3)
    total_rays = int(np.asarray(jax.device_get(rays), dtype=np.int64).sum())
    return img, total_rays
