"""Small vector-math helpers shared by all kernels.

Vectors are jnp arrays with trailing dimension 3 (shape ``(..., 3)``), so a
wavefront of N rays stores directions as ``(N, 3)`` — SoA enough for the
VPU (the last dim unrolls into 3 lane-parallel planes under XLA).

Contains the branchless ONB of Duff et al. (reference: shaders/maths.glsl:13-19)
and GLSL intrinsic equivalents (reflect/refract/mix) used by the BSDF port.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.14159265358979323846
TWOPI = 2.0 * PI
PIINV = 1.0 / PI
TWOPIINV = 0.5 / PI

# Ray-march constants (shaders/constants.glsl:4-6).
BIAS = 1e-3
EPS = 1e-7
INF = 1e32

# Fraunhofer lines for dispersion (shaders/constants.glsl:8-13).
LAMBDA_F = 486.13
INV_LAMBDA_F_SQ = 0.00205706292555
LAMBDA_D = 587.56
INV_LAMBDA_D_SQ = 0.00170195384301
LAMBDA_C = 656.27
INV_LAMBDA_C_SQ = 0.00152376308532


def vec3(x, y, z):
    """Stack three lane arrays into a (..., 3) vector."""
    return jnp.stack(jnp.broadcast_arrays(x, y, z), axis=-1)


def dot3(a, b):
    return jnp.sum(a * b, axis=-1)


def cross3(a, b):
    return jnp.cross(a, b)


def length3(a):
    return jnp.sqrt(jnp.maximum(dot3(a, a), 0.0))


def normalize3(a, eps: float = 0.0):
    """GLSL normalize; with eps=0 matches GLSL (inf/nan on zero vectors)."""
    n = length3(a)
    if eps:
        n = jnp.maximum(n, eps)
    return a / n[..., None]


def safe_normalize3(a):
    return normalize3(a, eps=1e-20)


def mix(a, b, t):
    """GLSL mix(a, b, t) = a*(1-t) + b*t."""
    return a * (1.0 - t) + b * t


def reflect(incident, n):
    """GLSL reflect(I, N) = I - 2*dot(N, I)*N."""
    return incident - 2.0 * dot3(n, incident)[..., None] * n


def refract(incident, n, eta):
    """GLSL refract(I, N, eta); returns zero vector on total internal reflection."""
    cosi = dot3(n, incident)
    eta = jnp.asarray(eta)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    tir = k < 0.0
    k_safe = jnp.maximum(k, 0.0)
    out = eta[..., None] * incident - (eta * cosi + jnp.sqrt(k_safe))[..., None] * n
    return jnp.where(tir[..., None], 0.0, out)


def branchless_onb(n):
    """Orthonormal basis from a unit normal, Duff et al. (shaders/maths.glsl:13-19).

    Returns (tangent, bitangent) with the exact sign conventions of the
    reference so that sampled hemispheres line up bit-for-bit.
    """
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    tangent = vec3(
        1.0 + sign * n[..., 0] * n[..., 0] * a,
        sign * b,
        -sign * n[..., 0],
    )
    bitangent = vec3(b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1])
    return tangent, bitangent


def to_tangent(v, tangent, bitangent, normal):
    """world -> tangent space (rows of the orthonormal frame)."""
    return vec3(dot3(v, tangent), dot3(v, bitangent), dot3(v, normal))


def from_tangent(v, tangent, bitangent, normal):
    """tangent -> world space."""
    return (
        v[..., 0:1] * tangent + v[..., 1:2] * bitangent + v[..., 2:3] * normal
    )
