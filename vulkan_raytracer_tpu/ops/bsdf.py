"""Cook-Torrance BSDF with bounded Smith-GGX VNDF sampling — port of
shaders/bsdf.glsl to branch-free vectorised jnp over ray wavefronts.

All directions (V = view, L = light/sample, H = halfway) live in tangent
space with the shading normal at +z, exactly like the reference (the
integrator builds the frame from hit.rchit's TBN).  GLSL branches become
``jnp.where`` selects; every divide/sqrt is guarded so masked lanes never
poison the wavefront with NaNs.

Branch-dependent RNG consumption in ``sample_material`` follows the select
rule (see :mod:`vulkan_raytracer_tpu.ops.rng`): each lane's stream advances
exactly as a scalar interpreter of shaders/bsdf.glsl:312-441 would.

Known deviations from the reference (documented, deliberate):
* shaders/bsdf.glsl:254 declares a *local* ``F_transmission`` that shadows
  the outer one, leaving the outer uninitialised (GLSL UB) for thin
  back-hemisphere NEE evaluation; we use the computed value (the evident
  intent).
* exact 0-denominator lanes produce 0 instead of inf (guarded divides).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import rng
from .math3 import (
    INV_LAMBDA_C_SQ,
    INV_LAMBDA_D_SQ,
    INV_LAMBDA_F_SQ,
    PIINV,
    TWOPI,
    dot3,
    reflect,
    refract,
    vec3,
)
from .spectral import spectral_colour_1931

_TINY = 1e-20


def _safe_div(a, b):
    return a / jnp.where(jnp.abs(b) < _TINY, jnp.where(b < 0, -_TINY, _TINY), b)


def _safe_normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _TINY)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HitMaterial:
    """Evaluated material at a hit (shaders/hit.glsl:4-14), SoA over lanes."""

    base_colour: jax.Array  # (N, 3)
    emissive: jax.Array  # (N, 3)
    metallic: jax.Array  # (N,)
    alpha: jax.Array  # (N, 2) roughness^2, >= 0.001 (hit.rchit:94-95)
    aniso_dir: jax.Array  # (N, 2) (cos r, sin r) (hit.rchit:110)
    transmission: jax.Array  # (N,)
    ior: jax.Array  # (N,)
    thin: jax.Array  # (N,) bool (thicknessFactor == 0, hit.rchit:98)
    attenuation: jax.Array  # (N, 3) Beer-Lambert sigma
    dispersion: jax.Array  # (N,)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HitInfo:
    """Hit geometry + material (shaders/hit.glsl:16-20), SoA over lanes."""

    pos: jax.Array  # (N, 3) world
    normal: jax.Array  # (N, 3) world shading normal (front-face flipped)
    tangent: jax.Array  # (N, 3)
    bitangent: jax.Array  # (N, 3)
    t: jax.Array  # (N,) ray t; -INF encodes miss (skybox.rmiss:27)
    front_face: jax.Array  # (N,) bool
    mat: HitMaterial


# ---------------------------------------------------------------------------
# Microfacet pieces (shaders/bsdf.glsl:8-110)
# ---------------------------------------------------------------------------


def _aniso2(a, v2):
    """mat2(anisoDir, anisoDir.yx*(1,-1)) * v — symmetric, self-inverse-ish."""
    ax, ay = a[..., 0], a[..., 1]
    return jnp.stack(
        [ax * v2[..., 0] + ay * v2[..., 1], ay * v2[..., 0] - ax * v2[..., 1]],
        axis=-1,
    )


def diffuse_brdf(colour, l):
    """Lambert, zero below the horizon (bsdf.glsl:8-10)."""
    return jnp.where(l[..., 2:3] > 0.0, colour * PIINV, 0.0)


def d_ggx(alpha, aniso_dir, h):
    """Anisotropic GGX NDF (bsdf.glsl:12-22)."""
    alpha_sq = alpha[..., 0] * alpha[..., 1]
    ndoth = h[..., 2]
    hdot_t = h[..., 0] * aniso_dir[..., 0] + h[..., 1] * aniso_dir[..., 1]
    hdot_b = h[..., 0] * aniso_dir[..., 1] - h[..., 1] * aniso_dir[..., 0]
    f = vec3(alpha[..., 1] * hdot_t, alpha[..., 0] * hdot_b, alpha_sq * ndoth)
    w_sq = _safe_div(alpha_sq, dot3(f, f))
    return alpha_sq * w_sq * w_sq * PIINV


def _smith_lengths(alpha, aniso_dir, v, l):
    vdot_t = v[..., 0] * aniso_dir[..., 0] + v[..., 1] * aniso_dir[..., 1]
    vdot_b = v[..., 0] * aniso_dir[..., 1] - v[..., 1] * aniso_dir[..., 0]
    ldot_t = l[..., 0] * aniso_dir[..., 0] + l[..., 1] * aniso_dir[..., 1]
    ldot_b = l[..., 0] * aniso_dir[..., 1] - l[..., 1] * aniso_dir[..., 0]
    len_l = jnp.sqrt(
        (alpha[..., 0] * ldot_t) ** 2 + (alpha[..., 1] * ldot_b) ** 2 + l[..., 2] ** 2
    )
    len_v = jnp.sqrt(
        (alpha[..., 0] * vdot_t) ** 2 + (alpha[..., 1] * vdot_b) ** 2 + v[..., 2] ** 2
    )
    return len_l, len_v


def visibility(alpha, aniso_dir, v, l):
    """Height-correlated Smith visibility for reflection (bsdf.glsl:24-35)."""
    len_l, len_v = _smith_lengths(alpha, aniso_dir, v, l)
    shadowing = v[..., 2] * len_l
    masking = l[..., 2] * len_v
    return _safe_div(jnp.ones_like(masking), 2.0 * (masking + shadowing))


def transmission_visibility(alpha, aniso_dir, v, l, h):
    """Thin-transmission visibility (bsdf.glsl:37-56); 0 outside HdotV>0>HdotL."""
    valid = (dot3(h, v) > 0.0) & (dot3(h, l) < 0.0)
    len_l, len_v = _smith_lengths(alpha, aniso_dir, v, l)
    shadowing = v[..., 2] * len_l
    masking = -l[..., 2] * len_v
    return jnp.where(valid, _safe_div(jnp.ones_like(masking), 2.0 * (masking + shadowing)), 0.0)


def refraction_visibility(alpha, aniso_dir, eta, v, l, h):
    """Refractive visibility incl. the eta Jacobian (bsdf.glsl:58-80)."""
    hdotl = dot3(h, l)
    hdotv = dot3(h, v)
    valid = (hdotv > 0.0) & (hdotl < 0.0)
    len_l, len_v = _smith_lengths(alpha, aniso_dir, v, l)
    shadowing = v[..., 2] * len_l
    masking = -l[..., 2] * len_v
    denom = (eta * hdotv + hdotl) ** 2
    out = _safe_div(2.0 * -hdotl * hdotv, denom * (masking + shadowing))
    return jnp.where(valid, out, 0.0)


def specular_brdf(alpha, aniso_dir, v, l, h):
    return visibility(alpha, aniso_dir, v, l) * d_ggx(alpha, aniso_dir, h)


def specular_btdf(alpha, aniso_dir, v, l, h):
    return transmission_visibility(alpha, aniso_dir, v, l, h) * d_ggx(alpha, aniso_dir, h)


def refractive_btdf(alpha, aniso_dir, eta, v, l, h):
    return refraction_visibility(alpha, aniso_dir, eta, v, l, h) * d_ggx(alpha, aniso_dir, h)


def fresnel_schlick(f0, costheta):
    """Schlick with raw costheta (bsdf.glsl:94-96)."""
    p = jnp.maximum(1.0 - costheta, 0.0) ** 5
    return p * (1.0 - f0) + f0


def fresnel_schlick_vh(f0, v, h):
    """Schlick with |V.H| (bsdf.glsl:102-110); f0 may be (N,) or (N,3)."""
    c = jnp.abs(dot3(v, h))
    if jnp.ndim(f0) and f0.shape[-1:] == (3,):
        c = c[..., None]
    return fresnel_schlick(f0, c)


def fresnel_transmission(f0d, eta, vdoth):
    """The three-way transmission Fresnel used throughout sampleMaterial /
    materialPDF / materialBSDF (bsdf.glsl:358-364 etc.): below critical
    angle uses the refracted angle, above returns 1 (TIR)."""
    sin_sq_out = eta * eta * (1.0 - vdoth * vdoth)
    f_below = fresnel_schlick(f0d, vdoth)
    f_refr = fresnel_schlick(f0d, jnp.sqrt(jnp.maximum(1.0 - sin_sq_out, 0.0)))
    return jnp.where(
        eta <= 1.0, f_below, jnp.where(sin_sq_out <= 1.0, f_refr, 1.0)
    )


# ---------------------------------------------------------------------------
# Bounded VNDF sampling + PDFs (bsdf.glsl:112-167; Eto & Tokuyoshi)
# ---------------------------------------------------------------------------


def _bounded_k(alpha, view):
    s = 1.0 + jnp.sqrt(view[..., 0] ** 2 + view[..., 1] ** 2)
    a = jnp.minimum(alpha[..., 0], alpha[..., 1])
    a_sq, s_sq = a * a, s * s
    return (1.0 - a_sq) * s_sq / (s_sq + a_sq * view[..., 2] ** 2)


def ggx_vndf_reflection_pdf(alpha, aniso_dir, view, halfway):
    """bsdf.glsl:112-124 (note: k/s use the reference's exact mix of
    anisotropic-space and raw view components)."""
    ndf = d_ggx(alpha, aniso_dir, halfway)
    ani_view = _aniso2(aniso_dir, view[..., :2])
    ai = alpha * ani_view
    t = jnp.sqrt(dot3(vec3(ai[..., 0], ai[..., 1], view[..., 2]), vec3(ai[..., 0], ai[..., 1], view[..., 2])))
    s = 1.0 + jnp.sqrt(ani_view[..., 0] ** 2 + ani_view[..., 1] ** 2)
    a = jnp.minimum(alpha[..., 0], alpha[..., 1])
    a_sq, s_sq = a * a, s * s
    k = (1.0 - a_sq) * s_sq / (s_sq + a_sq * view[..., 2] ** 2)
    return _safe_div(ndf, 2.0 * (k * view[..., 2] + t))


def ggx_vndf_refraction_pdf(alpha, aniso_dir, eta, view, direction, halfway):
    """bsdf.glsl:126-145."""
    hdotl = dot3(halfway, direction)
    hdotv = dot3(halfway, view)
    denom = (eta * hdotv + hdotl) ** 2
    jacobian = _safe_div(-hdotl, denom)
    ndf = d_ggx(alpha, aniso_dir, halfway)
    ani_view = _aniso2(aniso_dir, view[..., :2])
    ai = alpha * ani_view
    t = jnp.sqrt(ai[..., 0] ** 2 + ai[..., 1] ** 2 + view[..., 2] ** 2)
    s = 1.0 + jnp.sqrt(ani_view[..., 0] ** 2 + ani_view[..., 1] ** 2)
    a = jnp.minimum(alpha[..., 0], alpha[..., 1])
    a_sq, s_sq = a * a, s * s
    k = (1.0 - a_sq) * s_sq / (s_sq + a_sq * view[..., 2] ** 2)
    return _safe_div(2.0 * hdotv * ndf, k * view[..., 2] + t) * jacobian


def sample_ggx_vndf(seed, alpha, aniso_dir, view):
    """Bounded-VNDF halfway sample (bsdf.glsl:149-167); 2 rnd draws.

    Returns (halfway, seed).
    """
    view_std = _safe_normalize(
        vec3(alpha[..., 0] * view[..., 0], alpha[..., 1] * view[..., 1], view[..., 2])
    )
    (ux, uy), seed = rng.rnd_square(seed)
    phi = TWOPI * ux
    k = _bounded_k(alpha, view)
    b = k * view_std[..., 2]
    z = (1.0 - uy) * (1.0 + b) - b
    sin_theta = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    dir_std = vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), z)
    halfway_std = view_std + dir_std
    ani_halfway = _safe_normalize(
        vec3(
            halfway_std[..., 0] * alpha[..., 0],
            halfway_std[..., 1] * alpha[..., 1],
            halfway_std[..., 2],
        )
    )
    hxy = _aniso2(aniso_dir, ani_halfway[..., :2])
    return vec3(hxy[..., 0], hxy[..., 1], ani_halfway[..., 2]), seed


# ---------------------------------------------------------------------------
# Dispersion (bsdf.glsl:240-246, 330-340)
# ---------------------------------------------------------------------------


def dispersed_ior(ior, dispersion, wavelength):
    """Cauchy-style ior(lambda) used by the reference; identity when the
    path's wavelength has not collapsed (guards the reference's div-by-0)."""
    wl_sq = jnp.maximum(wavelength * wavelength, _TINY)
    adjusted = jnp.maximum(
        ior + (ior - 1.0) * dispersion / 20.0 * (523655.0 / wl_sq - 1.5168), 1.0
    )
    return jnp.where((dispersion != 0.0) & (wavelength > 0.0), adjusted, ior)


def _f0_dielectric(ior):
    f = (ior - 1.0) / (ior + 1.0)
    return f * f


# ---------------------------------------------------------------------------
# materialPDF (bsdf.glsl:169-226) — pdf of the BSDF sampler for MIS weights
# ---------------------------------------------------------------------------


def material_pdf(hit: HitInfo, v, l):
    m = hit.mat
    f0d = _f0_dielectric(m.ior)
    p_trans = (1.0 - m.metallic) * m.transmission
    p_diff = 0.5 * (1.0 - m.metallic)
    ndotl = l[..., 2]
    eta = jnp.where(hit.front_face, 1.0 / m.ior, m.ior)

    # --- NdotL < 0 branch (transmission through the surface) ---
    h_thin = _safe_normalize(v + vec3(l[..., 0], l[..., 1], -l[..., 2]))
    f_thin = fresnel_schlick(f0d, dot3(v, h_thin))
    pdf_thin = ggx_vndf_reflection_pdf(m.alpha, m.aniso_dir, v, h_thin)

    h_refr_raw = _safe_normalize(eta[..., None] * v + l)
    h_refr = jnp.where((eta > 1.0)[..., None], h_refr_raw, -h_refr_raw)
    f_refr = fresnel_transmission(f0d, eta, dot3(v, h_refr))
    pdf_refr = ggx_vndf_refraction_pdf(m.alpha, m.aniso_dir, eta, v, l, h_refr)

    pdf_neg = p_trans * jnp.where(
        m.thin, (1.0 - f_thin) * pdf_thin, (1.0 - f_refr) * pdf_refr
    )

    # --- NdotL >= 0 branch (reflection side) ---
    h = _safe_normalize(l + v)
    ggx_pdf = ggx_vndf_reflection_pdf(m.alpha, m.aniso_dir, v, h)
    pdf_pos = (1.0 - p_diff) * (1.0 - p_trans) * ggx_pdf + p_diff * ndotl * PIINV
    vdoth = dot3(v, h)
    f_t_pos = jnp.where(
        m.thin, fresnel_schlick(f0d, vdoth), fresnel_transmission(f0d, eta, vdoth)
    )
    pdf_pos = pdf_pos + jnp.where(p_trans > 0.0, p_trans * f_t_pos * ggx_pdf, 0.0)

    return jnp.where(ndotl < 0.0, pdf_neg, pdf_pos)


# ---------------------------------------------------------------------------
# materialBSDF (bsdf.glsl:228-310) — NEE evaluation
# ---------------------------------------------------------------------------


def material_bsdf(hit: HitInfo, wavelength, v, l):
    m = hit.mat
    ior = dispersed_ior(m.ior, m.dispersion, wavelength)
    f0d = _f0_dielectric(ior)
    p_trans = (1.0 - m.metallic) * m.transmission
    ndotl = l[..., 2]
    eta = jnp.where(hit.front_face, 1.0 / ior, ior)
    # Beer-Lambert interior absorption on backface transmission (bsdf.glsl:271,304)
    absorb = jnp.where(
        (~m.thin & ~hit.front_face)[..., None],
        jnp.exp(-m.attenuation * hit.t[..., None]),
        1.0,
    )

    # --- NdotL < 0: transmission lobe only ---
    h_thin = _safe_normalize(v + vec3(l[..., 0], l[..., 1], -l[..., 2]))
    f_thin = fresnel_schlick_vh(f0d, v, h_thin)
    btdf_thin = specular_btdf(m.alpha, m.aniso_dir, v, l, h_thin)

    h_refr_raw = _safe_normalize(eta[..., None] * v + l)
    h_refr = jnp.where((eta > 1.0)[..., None], h_refr_raw, -h_refr_raw)
    f_refr = fresnel_transmission(f0d, eta, dot3(v, h_refr))
    btdf_refr = refractive_btdf(m.alpha, m.aniso_dir, eta, v, l, h_refr)

    f_t_neg = jnp.where(m.thin, f_thin, f_refr)
    lobe_neg = jnp.where(m.thin, btdf_thin, btdf_refr)
    bsdf_neg = (p_trans * (1.0 - f_t_neg))[..., None] * m.base_colour * lobe_neg[..., None]
    bsdf_neg = bsdf_neg * absorb

    # --- NdotL > 0: diffuse + specular + transmissive-specular ---
    h = _safe_normalize(v + l)
    f_diel = fresnel_schlick_vh(f0d, v, h)
    f_metal = fresnel_schlick_vh(m.base_colour, v, h)
    spec = specular_brdf(m.alpha, m.aniso_dir, v, l, h)

    diffuse = (1.0 - m.transmission)[..., None] * diffuse_brdf(m.base_colour, l)
    dielectric = diffuse * (1.0 - f_diel[..., None]) + spec[..., None] * f_diel[..., None]
    metallic_lobe = f_metal * spec[..., None]
    base = dielectric * (1.0 - m.metallic[..., None]) + metallic_lobe * m.metallic[..., None]
    base = jnp.where((p_trans < 1.0)[..., None], base, 0.0)

    vdoth = dot3(v, h)
    f_t_pos = jnp.where(
        m.thin, fresnel_schlick(f0d, vdoth), fresnel_transmission(f0d, eta, vdoth)
    )
    trans_pos = (p_trans * f_t_pos)[..., None] * m.base_colour * spec[..., None] * absorb
    bsdf_pos = base + jnp.where((p_trans > 0.0)[..., None], trans_pos, 0.0)

    return jnp.where(
        (ndotl < 0.0)[..., None],
        bsdf_neg,
        jnp.where((ndotl > 0.0)[..., None], bsdf_pos, 0.0),
    )


# ---------------------------------------------------------------------------
# sampleMaterial (bsdf.glsl:312-441) — the lobe-selection importance sampler
# ---------------------------------------------------------------------------


def sample_material(seed, hit: HitInfo, wavelength, view):
    """Sample an outgoing direction + estimator (bsdf/pdf * |NdotL|).

    Args:
      seed: (N,) uint32 lanes.
      hit: HitInfo with tangent-space material.
      wavelength: (N,) current path wavelength (0 = not collapsed).
      view: (N, 3) tangent-space view (= -incoming direction).

    Returns (direction, estimator, pdf, base_colour_used, wavelength, seed):
      direction: (N, 3) tangent-space sample (zero on rejected lanes);
      estimator: (N, 3) throughput multiplier;
      pdf: (N,) the sampler pdf (``materialSamplePDF`` for emissive MIS,
      raygen.rgen:72);
      base_colour_used: base colour after spectral collapse (lanes where the
      wavelength collapsed this bounce tint their baseColour,
      bsdf.glsl:333) — the integrator threads it into subsequent shading;
      wavelength, seed: updated path state.
    """
    m = hit.mat

    # ---- dispersion: collapse wavelength on first dispersive hit ----
    needs_collapse = (m.dispersion != 0.0) & (wavelength == 0.0)
    wl_new, seed_c = rng.rnd_range(seed, 400.0, 700.0)
    wavelength = jnp.where(needs_collapse, wl_new, wavelength)
    seed = jnp.where(needs_collapse, seed_c, seed)
    base_colour = jnp.where(
        needs_collapse[..., None],
        m.base_colour * spectral_colour_1931(wavelength),
        m.base_colour,
    )
    ior = dispersed_ior(m.ior, m.dispersion, wavelength)

    f0d = _f0_dielectric(ior)
    p_trans = (1.0 - m.metallic) * m.transmission
    p_diff = 0.5 * (1.0 - m.metallic)
    eta = jnp.where(hit.front_face, 1.0 / ior, ior)

    # ---- lobe selection draw (always consumed, bsdf.glsl:342) ----
    u_lobe, seed = rng.rnd(seed)
    take_trans = u_lobe < p_trans

    # ======== transmission branch (bsdf.glsl:343-380) ========
    h_t, seed_t = sample_ggx_vndf(seed, m.alpha, m.aniso_dir, view)

    # thin: reflect, maybe flip z (bsdf.glsl:344-352)
    f_thin = fresnel_schlick_vh(f0d, view, h_t)
    dir_thin_refl = reflect(-view, h_t)
    thin_fail = dir_thin_refl[..., 2] < 0.0
    pdf_thin = ggx_vndf_reflection_pdf(m.alpha, m.aniso_dir, view, h_t)
    u_flip, seed_t_flip = rng.rnd(seed_t)
    flip = u_flip > f_thin
    dir_thin = jnp.where(
        flip[..., None],
        dir_thin_refl * jnp.asarray([1.0, 1.0, -1.0]),
        dir_thin_refl,
    )
    seed_thin = jnp.where(thin_fail, seed_t, seed_t_flip)

    # volumetric: Fresnel-split reflect/refract (bsdf.glsl:353-377)
    vdoth_t = dot3(view, h_t)
    f_vol = fresnel_transmission(f0d, eta, vdoth_t)
    u_frn, seed_vol = rng.rnd(seed_t)
    vol_reflect = u_frn < f_vol
    dir_vol_refl = reflect(-view, h_t)
    dir_vol_refr = refract(-view, h_t, eta)
    dir_vol = jnp.where(vol_reflect[..., None], dir_vol_refl, dir_vol_refr)
    pdf_vol = jnp.where(
        vol_reflect,
        ggx_vndf_reflection_pdf(m.alpha, m.aniso_dir, view, h_t),
        ggx_vndf_refraction_pdf(m.alpha, m.aniso_dir, eta, view, dir_vol_refr, h_t),
    )
    vol_fail = jnp.where(
        vol_reflect, dir_vol[..., 2] < 0.0, dir_vol[..., 2] > 0.0
    )

    dir_trans = jnp.where(m.thin[..., None], dir_thin, dir_vol)
    pdf_ggx_trans = jnp.where(m.thin, pdf_thin, pdf_vol)
    fail_trans = jnp.where(m.thin, thin_fail, vol_fail)
    seed_trans = jnp.where(m.thin, seed_thin, seed_vol)
    f_trans_trans = jnp.where(m.thin, f_thin, f_vol)

    # ======== reflection/diffuse branch (bsdf.glsl:381-408) ========
    u_diff, seed_r = rng.rnd(seed)
    is_diff = u_diff < p_diff
    (cx, cy, cz), seed_cos = rng.sample_cosine_hemisphere(seed_r)
    dir_cos = vec3(cx, cy, cz)
    h_cos = _safe_normalize(view + dir_cos)
    h_v, seed_vndf = sample_ggx_vndf(seed_r, m.alpha, m.aniso_dir, view)
    dir_vndf = reflect(-view, h_v)
    dir_refl = jnp.where(is_diff[..., None], dir_cos, dir_vndf)
    h_refl = jnp.where(is_diff[..., None], h_cos, h_v)
    seed_refl = jnp.where(is_diff, seed_cos, seed_vndf)
    fail_refl = dir_refl[..., 2] < 0.0
    pdf_ggx_refl = ggx_vndf_reflection_pdf(m.alpha, m.aniso_dir, view, h_refl)
    vdoth_r = dot3(view, h_refl)
    f_trans_refl = jnp.where(
        m.thin | (eta <= 1.0),
        fresnel_schlick(f0d, vdoth_r),
        fresnel_transmission(f0d, eta, vdoth_r),
    )

    # ======== merge branches ========
    direction = jnp.where(take_trans[..., None], dir_trans, dir_refl)
    halfway = jnp.where(take_trans[..., None], h_t, h_refl)
    pdf_ggx = jnp.where(take_trans, pdf_ggx_trans, pdf_ggx_refl)
    fail = jnp.where(take_trans, fail_trans, fail_refl)
    seed = jnp.where(take_trans, seed_trans, seed_refl)
    f_trans = jnp.where(take_trans, f_trans_trans, f_trans_refl)
    ndotl = direction[..., 2]

    f_diel = fresnel_schlick_vh(f0d, view, halfway)
    f_metal = fresnel_schlick_vh(base_colour, view, halfway)

    absorb = jnp.where(
        (~m.thin & ~hit.front_face)[..., None],
        jnp.exp(-m.attenuation * hit.t[..., None]),
        1.0,
    )

    # ---- NdotL < 0 tail: transmission bsdf/pdf (bsdf.glsl:410-418) ----
    lobe_neg = jnp.where(
        m.thin,
        specular_btdf(m.alpha, m.aniso_dir, view, direction, halfway),
        refractive_btdf(m.alpha, m.aniso_dir, eta, view, direction, halfway),
    )
    bsdf_neg = (p_trans * (1.0 - f_trans))[..., None] * base_colour * lobe_neg[..., None]
    bsdf_neg = bsdf_neg * absorb
    pdf_neg = p_trans * (1.0 - f_trans) * pdf_ggx

    # ---- NdotL >= 0 tail (bsdf.glsl:419-437) ----
    spec = specular_brdf(m.alpha, m.aniso_dir, view, direction, halfway)
    diffuse = (1.0 - m.transmission)[..., None] * diffuse_brdf(base_colour, direction)
    dielectric = diffuse * (1.0 - f_diel[..., None]) + spec[..., None] * f_diel[..., None]
    base = dielectric * (1.0 - m.metallic[..., None]) + f_metal * (spec * m.metallic)[..., None]
    has_nontrans = p_trans < 1.0
    bsdf_pos = jnp.where(has_nontrans[..., None], base, 0.0)
    pdf_pos = jnp.where(
        has_nontrans,
        (1.0 - p_diff) * (1.0 - p_trans) * pdf_ggx + p_diff * ndotl * PIINV,
        0.0,
    )
    trans_pos = (p_trans * f_trans)[..., None] * base_colour * spec[..., None] * absorb
    has_trans = p_trans > 0.0
    bsdf_pos = bsdf_pos + jnp.where(has_trans[..., None], trans_pos, 0.0)
    pdf_pos = pdf_pos + jnp.where(has_trans, p_trans * f_trans * pdf_ggx, 0.0)

    neg = ndotl < 0.0
    bsdf = jnp.where(neg[..., None], bsdf_neg, bsdf_pos)
    pdf = jnp.where(neg, pdf_neg, pdf_pos)

    # rejected lanes: direction/estimator/pdf zero (early returns :347,370,375,391)
    ok = ~fail
    direction = jnp.where(ok[..., None], direction, 0.0)
    zero_bsdf = jnp.all(bsdf == 0.0, axis=-1) | (pdf <= 0.0)
    est = jnp.where(
        (ok & ~zero_bsdf)[..., None],
        bsdf * _safe_div(jnp.ones_like(pdf), pdf)[..., None]
        * jnp.abs(ndotl)[..., None],
        0.0,
    )
    pdf = jnp.where(ok, pdf, 0.0)
    return direction, est, pdf, base_colour, wavelength, seed
