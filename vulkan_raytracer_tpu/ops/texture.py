"""Bilinear texture sampling on TPU — replaces the Vulkan sampler objects.

The reference binds glTF textures as a bindless array of linear-filtered,
repeat-addressed UNORM samplers (texture.cpp:5-40, shaders/texture.glsl:1-4)
and the HDR skybox as an equirectangular sampler (shaders/skybox.rmiss:17-29).
Here a texture fetch is four gathers + a lerp over a zero-padded texture
stack ``(NT, MH, MW, 4)`` with per-texture valid sizes.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math3 import PIINV, TWOPIINV


def _wrap(i, n):
    """Repeat addressing: floor-mod into [0, n)."""
    return jnp.mod(i, n)


def sample_bilinear_stack(tex_data, tex_size, tex_idx, uv):
    """Sample texture ``tex_idx`` (per lane) at ``uv`` with repeat+bilinear.

    Args:
      tex_data: (NT, MH, MW, 4) padded stack.
      tex_size: (NT, 2) int32 (h, w) valid extents.
      tex_idx: (N,) int32 texture index (callers mask out -1 lanes).
      uv: (N, 2) float32.

    Returns (N, 4) float32 texels.
    """
    ti = jnp.maximum(tex_idx, 0)
    hw = jnp.take(tex_size, ti, axis=0)
    h = hw[:, 0].astype(jnp.float32)
    w = hw[:, 1].astype(jnp.float32)
    # GL-style: texel centres at (i+0.5)/n
    x = uv[:, 0] * w - 0.5
    y = uv[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = _wrap(x0.astype(jnp.int32), hw[:, 1])
    x1i = _wrap(x0.astype(jnp.int32) + 1, hw[:, 1])
    y0i = _wrap(y0.astype(jnp.int32), hw[:, 0])
    y1i = _wrap(y0.astype(jnp.int32) + 1, hw[:, 0])

    def fetch(yy, xx):
        return tex_data[ti, yy, xx]

    c00 = fetch(y0i, x0i)
    c01 = fetch(y0i, x1i)
    c10 = fetch(y1i, x0i)
    c11 = fetch(y1i, x1i)
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_equirect(env, direction):
    """Equirectangular environment lookup (shaders/skybox.rmiss:17-29).

    Replicates the reference exactly: uv = (atan2(z, x)/2pi + 0.5,
    -(asin(y)/pi + 0.5)) with repeat addressing (the negative v wraps).
    ``direction`` may be non-unit (the reference passes the raw ray
    direction); asin input is clamped for NaN safety.

    Args: env (H, W, 3); direction (N, 3).  Returns (N, 3).
    """
    h, w = env.shape[0], env.shape[1]
    u = jnp.arctan2(direction[:, 2], direction[:, 0]) * TWOPIINV + 0.5
    v = -(jnp.arcsin(jnp.clip(direction[:, 1], -1.0, 1.0)) * PIINV + 0.5)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0.astype(jnp.int32) + 1, w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)
    y1i = jnp.mod(y0.astype(jnp.int32) + 1, h)
    c00 = env[y0i, x0i]
    c01 = env[y0i, x1i]
    c10 = env[y1i, x0i]
    c11 = env[y1i, x1i]
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy
