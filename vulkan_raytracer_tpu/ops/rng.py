"""Counter-based PRNG — bit-exact port of the reference's shader RNG.

The reference seeds a per-pixel stream with 16-round TEA over
``(pixelIdx, sampleCount)`` and then draws from an LCG whose low 24 bits
become floats in [0, 1) (reference: shaders/random.glsl:14-42, used from
shaders/raygen.rgen:33).  We reproduce the exact bit behaviour on uint32
lanes so every sampling decision is a pure function of (pixel, sample).

All functions are vectorised: ``seed`` is a uint32 array of any shape and
every draw advances it functionally — ``value, seed = rnd(seed)``.

Branch-dependent RNG consumption (the reference draws different numbers of
randoms on different shader branches) is reproduced with the *select rule*:
evaluate every branch's draws from the same incoming seed and lane-wise
select both the value and the advanced seed.  This keeps each lane's stream
identical to what a scalar interpreter of the reference shader would
produce.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32

# TEA round constants (shaders/random.glsl:21-23).
_TEA_SUM = jnp.uint32(0x9E3779B9)
_TEA_K0 = jnp.uint32(0xA341316C)
_TEA_K1 = jnp.uint32(0xC8013EA4)
_TEA_K2 = jnp.uint32(0xAD90777D)
_TEA_K3 = jnp.uint32(0x7E95761E)

# LCG constants (shaders/random.glsl:32-33).
_LCG_MUL = jnp.uint32(1664525)
_LCG_INC = jnp.uint32(1013904223)
_MANTISSA_MASK = jnp.uint32(0x00FFFFFF)
_INV_2_24 = jnp.float32(1.0 / float(1 << 24))


def tea(val0, val1):
    """16-round Tiny Encryption Algorithm hash (shaders/random.glsl:14-26).

    Returns ``v0`` after 16 rounds; used to decorrelate per-pixel streams
    across samples: ``seed = tea(pixel_index, sample_count)``
    (shaders/raygen.rgen:33).
    """
    v0 = jnp.asarray(val0, _U32)
    v1 = jnp.asarray(val1, _U32)
    v0, v1 = jnp.broadcast_arrays(v0, v1)
    s = jnp.zeros_like(v0)
    for _ in range(16):
        s = s + _TEA_SUM
        v0 = v0 + (((v1 << 4) + _TEA_K0) ^ (v1 + s) ^ ((v1 >> 5) + _TEA_K1))
        v1 = v1 + (((v0 << 4) + _TEA_K2) ^ (v0 + s) ^ ((v0 >> 5) + _TEA_K3))
    return v0


def lcg(seed):
    """One LCG step; returns (low-24-bits, new_seed) (shaders/random.glsl:30-36)."""
    seed = _LCG_MUL * seed + _LCG_INC
    return seed & _MANTISSA_MASK, seed


def rnd(seed):
    """Uniform float32 in [0, 1) with 24-bit resolution (shaders/random.glsl:39-42)."""
    bits, seed = lcg(seed)
    return bits.astype(jnp.float32) * _INV_2_24, seed


def rnd_range(seed, lo, hi):
    """Uniform float in [lo, hi] (shaders/random.glsl:47-49)."""
    u, seed = rnd(seed)
    return lo + u * (hi - lo), seed


def rnd_int(seed, lo, hi):
    """Uniform int in [lo, hi] inclusive (shaders/random.glsl:52-54).

    ``lo``/``hi`` may be arrays (per-lane ranges).  Matches the reference's
    modulo construction exactly, including its slight modulo bias.
    """
    bits, seed = lcg(seed)
    span = (jnp.asarray(hi) - jnp.asarray(lo) + 1).astype(_U32)
    # Guard span==0 (empty range never selected by callers, but keep it safe).
    span = jnp.maximum(span, _U32(1))
    return (bits % span).astype(jnp.int32) + jnp.asarray(lo, jnp.int32), seed


def rnd_square(seed):
    """Two uniforms (shaders/random.glsl:62-64): returns ((u, v), seed)."""
    u, seed = rnd(seed)
    v, seed = rnd(seed)
    return (u, v), seed


def rnd_cube(seed):
    """Three uniforms (shaders/random.glsl:67-69)."""
    u, seed = rnd(seed)
    v, seed = rnd(seed)
    w, seed = rnd(seed)
    return (u, v, w), seed


_TWOPI = jnp.float32(2.0 * 3.14159265358979323846)


def sample_uniform_hemisphere(seed):
    """Uniform point on the z+ hemisphere (shaders/random.glsl:72-76).

    Note the reference's construction is *not* the textbook one: it uses
    ``r = sqrt(1 - u.x^2)``, ``z = u.x`` which IS uniform in solid angle.
    Returns ((x, y, z), seed) as separate lanes.
    """
    (ux, uy), seed = rnd_square(seed)
    r = jnp.sqrt(jnp.maximum(1.0 - ux * ux, 0.0))
    phi = _TWOPI * uy
    return (r * jnp.cos(phi), r * jnp.sin(phi), ux), seed


def sample_cosine_hemisphere(seed):
    """"Cosine" hemisphere sample — exact replica of shaders/random.glsl:87-94.

    NOTE: the reference's construction is non-textbook: ``r = u.x`` (not
    sqrt(u.x)), ``z = 1 - r^2`` (not sqrt(1 - r^2)), with ``(sin, cos)``
    component ordering, and the returned vector is NOT unit length
    (|p|^2 = r^2 + (1-r^2)^2).  The reference nevertheless treats its z as
    NdotL and uses pdf = z/pi downstream (shaders/bsdf.glsl:383,427).  We
    replicate the behaviour, not the textbook, so renders and estimators
    match the reference.  Returns ((x, y, z), seed).
    """
    (ux, uy), seed = rnd_square(seed)
    r = ux
    phi = _TWOPI * uy
    x = r * jnp.sin(phi)
    y = r * jnp.cos(phi)
    z = 1.0 - (x * x + y * y)
    return (x, y, z), seed
