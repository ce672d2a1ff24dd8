"""Tonemapping operators — port of shaders/hdr.glsl.

The renderer's display path uses Reinhard-Jodie (shaders/raygen.rgen:99);
Reinhard and Hable are provided for parity with the reference library.
All operate on (..., 3) linear-RGB arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

_LUMA = jnp.array([0.2126, 0.7152, 0.0722], dtype=jnp.float32)


def luminance(v):
    """Rec.709 luma (shaders/hdr.glsl:5-7)."""
    return jnp.sum(v * _LUMA, axis=-1)


def reinhard(v):
    """v / (1 + v), per channel (shaders/hdr.glsl:1-3)."""
    return v / (1.0 + v)


def reinhard_jodie(v):
    """Luminance/channel-blended Reinhard (shaders/hdr.glsl:9-13)."""
    l = luminance(v)[..., None]
    tv = reinhard(v)
    return (v / (1.0 + l)) * (1.0 - tv) + tv * tv


def hable(x):
    """Hable filmic curve (shaders/hdr.glsl:15-25; unused by the display path)."""
    a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return ((x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f)) - e / f
