"""Wavefront path-tracing integrator — the TPU rebuild of the GLSL pipeline.

The reference's per-pixel megakernel (shaders/raygen.rgen:32-100 plus the
closest-hit/any-hit/miss stages it dispatches) becomes one jit-compiled
program over SoA ray wavefronts: every pixel is a lane, the bounce loop is a
``lax.fori_loop`` with masked termination, and each ``traceRayEXT`` becomes
a vectorised BVH traversal (:mod:`vulkan_raytracer_tpu.ops.traverse`).

Algorithmic parity notes (faithful to the reference, quirks included):
* NEE runs at the *start* of the next bounce with the throughput already
  multiplied by the current hit's BSDF estimator (raygen.rgen:54-55 runs
  after line 83's ``throughput *= reflectivity`` of the previous
  iteration); we preserve that exact weighting and RNG order by sampling
  the material first and then sampling lights within one loop iteration.
* paths terminate on emissive hits, weighted against NEE by a balance
  heuristic whose light pdf comes from an any-hit probe over emissive
  geometry (raygen.rgen:64-75, shaders/emissivepdf.rahit).
* sample 0 is the fast preview: centre jitter, termination at bounce 1
  (raygen.rgen:34,64), and it is excluded from accumulation
  (raygen.rgen:95-96).
* hit position is taken as ``o + t*d`` instead of re-interpolating object
  -space positions (hit.rchit:49-57) — identical up to fp rounding, one
  gather cheaper.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import rng
from ..ops.bsdf import (
    HitInfo,
    HitMaterial,
    material_bsdf,
    material_pdf,
    sample_material,
)
from ..ops.math3 import (
    BIAS,
    EPS,
    INF,
    branchless_onb,
    cross3,
    dot3,
    from_tangent,
    to_tangent,
    vec3,
)
from ..ops.dense import (
    DENSE_MAX_TRIS,
    dense_closest,
    dense_emissive_pdf,
    dense_shadow,
)
from ..ops.texture import sample_bilinear_stack, sample_equirect
from ..ops.traverse import trace_closest, trace_emissive_pdf, trace_shadow

_F32 = jnp.float32


# ---------------------------------------------------------------------------
# Traversal dispatch: dense (gather-free, VPU-saturating) for small scenes,
# threaded BVH beyond DENSE_MAX_TRIS or with stochastic BLEND alpha (which
# needs per-intersection RNG ordering).  Static per compiled pipeline.
# ---------------------------------------------------------------------------


def _dense_ok(tables) -> bool:
    return tables.num_triangles <= DENSE_MAX_TRIS and not tables.has_blend


def _closest(tables, o, d, *, t_min, t_max, active, seed):
    if _dense_ok(tables):
        return dense_closest(tables, o, d, t_min=t_min, t_max=t_max, active=active), seed
    alpha = tables.alpha if tables.has_alpha else None
    return trace_closest(
        tables.bvh, o, d, t_min=t_min, t_max=t_max, active=active, seed=seed,
        alpha=alpha,
    )


def _shadow(tables, o, d, *, t_max, active, seed):
    if _dense_ok(tables):
        return dense_shadow(tables, o, d, t_max=t_max, active=active), seed
    alpha = tables.alpha if tables.has_alpha else None
    return trace_shadow(
        tables.bvh, o, d, t_max=t_max, active=active, seed=seed, alpha=alpha
    )


def _emissive_pdf(tables, o, d, *, t_min, active):
    if tables.num_emissive_tris <= 1024:
        return dense_emissive_pdf(tables, o, d, t_min=t_min, active=active)
    return trace_emissive_pdf(
        tables.ebvh, tables.em_tables, o, d, t_min=t_min, active=active
    )


# ---------------------------------------------------------------------------
# Primary rays (raygen.rgen:33-43)
# ---------------------------------------------------------------------------


def generate_primary_rays(view_inv, proj_inv, width, height, sample_count, lane_idx=None):
    """Camera rays for the given pixel lanes; returns (origin, direction, seed).

    Seeds are TEA(pixelIdx, sampleCount) (raygen.rgen:33); jitter is the
    pixel centre on sample 0, else two rnd draws (raygen.rgen:34).
    ``lane_idx`` selects a subset of pixels (used by the multi-chip
    pixel-tile sharding); defaults to all width*height pixels.
    """
    idx = (
        jnp.arange(width * height, dtype=jnp.uint32)
        if lane_idx is None
        else lane_idx.astype(jnp.uint32)
    )
    px = (idx % jnp.uint32(width)).astype(_F32)
    py = (idx // jnp.uint32(width)).astype(_F32)
    seed = rng.tea(idx, jnp.uint32(sample_count))
    (jx, jy), seed_j = rng.rnd_square(seed)
    preview = sample_count == jnp.uint32(0)
    jx = jnp.where(preview, 0.5, jx)
    jy = jnp.where(preview, 0.5, jy)
    seed = jnp.where(preview, seed, seed_j)

    u = (px + jx) / _F32(width) * 2.0 - 1.0
    v = -((py + jy) / _F32(height) * 2.0 - 1.0)
    # target = projInverse * (d.x, d.y, 1, 1), xyz only (raygen.rgen:41)
    ndc = jnp.stack([u, v, jnp.ones_like(u), jnp.ones_like(u)], axis=-1)
    target = ndc @ proj_inv[:3, :].T  # (N, 3)
    tnorm = target / jnp.maximum(
        jnp.linalg.norm(target, axis=-1, keepdims=True), 1e-20
    )
    direction = tnorm @ view_inv[:3, :3].T
    direction = direction / jnp.maximum(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-20
    )
    origin = jnp.broadcast_to(view_inv[:3, 3], (idx.shape[0], 3))
    return origin, direction, seed


# ---------------------------------------------------------------------------
# Hit shading state (hit.rchit:31-117 + skybox.rmiss)
# ---------------------------------------------------------------------------


def eval_hit(tables, origin, direction, t, tri, u, v):
    """Build HitInfo for every lane; miss lanes get skybox emission, t=-INF."""
    n_lanes = origin.shape[0]
    miss = tri < 0
    ti = jnp.maximum(tri, 0)
    w0 = (1.0 - u - v)[:, None]
    w1 = u[:, None]
    w2 = v[:, None]

    pos = origin + jnp.where(jnp.isfinite(t), t, 0.0)[:, None] * direction

    tn = jnp.take(tables.tri_n, ti, axis=0)  # (N, 3, 3)
    nrm_raw = w0 * tn[:, 0] + w1 * tn[:, 1] + w2 * tn[:, 2]
    normal = nrm_raw / jnp.maximum(
        jnp.linalg.norm(nrm_raw, axis=-1, keepdims=True), 1e-20
    )

    mat_i = jnp.take(tables.tri_mat, ti, axis=0)
    m = tables.materials
    tex_idx = jnp.take(m.tex_idx, mat_i, axis=0)  # (N, 6)
    uv_tri = jnp.take(tables.tri_uv, ti, axis=0)  # (N, 3, 2)
    uv = w0 * uv_tri[:, 0] + w1 * uv_tri[:, 1] + w2 * uv_tri[:, 2]

    # tangent frame (hit.rchit:61-71): built from the pre-flip normal
    tt = jnp.take(tables.tri_tg, ti, axis=0)  # (N, 3, 3)
    tg_raw = w0 * tt[:, 0] + w1 * tt[:, 1] + w2 * tt[:, 2]
    has_tg = jnp.any(tg_raw != 0.0, axis=-1)
    sign = jnp.take(tables.tri_tg_sign, ti, axis=0)

    tg_n = tg_raw / jnp.maximum(jnp.linalg.norm(tg_raw, axis=-1, keepdims=True), 1e-20)

    shading_normal = normal
    if tables.has_textures:  # normal mapping (hit.rchit:64-66)
        has_nm = (tex_idx[:, 2] >= 0) & has_tg
        bt0 = cross3(normal, tg_n) * sign[:, None]
        texel = sample_bilinear_stack(tables.tex_data, tables.tex_size, tex_idx[:, 2], uv)
        nmap = texel[:, :3] * 2.0 - 1.0
        nmap = nmap / jnp.maximum(jnp.linalg.norm(nmap, axis=-1, keepdims=True), 1e-20)
        mapped = (
            nmap[:, 0:1] * tg_n + nmap[:, 1:2] * bt0 + nmap[:, 2:3] * normal
        )
        mapped = mapped / jnp.maximum(
            jnp.linalg.norm(mapped, axis=-1, keepdims=True), 1e-20
        )
        shading_normal = jnp.where(has_nm[:, None], mapped, normal)

    # re-orthogonalise tangent against the (possibly mapped) normal
    tg_ortho = tg_n - dot3(shading_normal, tg_n)[:, None] * shading_normal
    tg_ortho = tg_ortho / jnp.maximum(
        jnp.linalg.norm(tg_ortho, axis=-1, keepdims=True), 1e-20
    )
    bt_ortho = cross3(shading_normal, tg_ortho) * sign[:, None]
    onb_t, onb_b = branchless_onb(shading_normal)
    tangent = jnp.where(has_tg[:, None], tg_ortho, onb_t)
    bitangent = jnp.where(has_tg[:, None], bt_ortho, onb_b)

    view = -direction
    front = dot3(shading_normal, view) >= 0.0
    shading_normal = jnp.where(front[:, None], shading_normal, -shading_normal)

    # material evaluation (hit.rchit:75-113)
    base = jnp.take(m.base_colour, mat_i, axis=0)[:, :3]
    emissive = jnp.take(m.emissive, mat_i, axis=0)
    transmission = jnp.take(m.transmission, mat_i, axis=0)
    metallic = jnp.take(m.metallic, mat_i, axis=0)
    rough = jnp.take(m.roughness, mat_i, axis=0)
    aniso_s = jnp.take(m.aniso_strength, mat_i, axis=0)
    aniso_r = jnp.take(m.aniso_rotation, mat_i, axis=0)

    if tables.has_textures:
        def modulate(col, val, ch):
            has = tex_idx[:, col] >= 0
            texel = sample_bilinear_stack(
                tables.tex_data, tables.tex_size, tex_idx[:, col], uv
            )
            mod = texel[:, ch]
            if val.ndim == 2:
                return jnp.where(has[:, None], val * mod, val)
            return jnp.where(has, val * mod, val)

        base = modulate(0, base, slice(0, 3))
        emissive = modulate(3, emissive, slice(0, 3))
        transmission = modulate(4, transmission, 0)
        mr_has = tex_idx[:, 1] >= 0
        mr = sample_bilinear_stack(tables.tex_data, tables.tex_size, tex_idx[:, 1], uv)
        metallic = jnp.where(mr_has, metallic * mr[:, 2], metallic)
        rough = jnp.where(mr_has, rough * mr[:, 1], rough)
        an_has = tex_idx[:, 5] >= 0
        an = sample_bilinear_stack(tables.tex_data, tables.tex_size, tex_idx[:, 5], uv)
        aniso_r = jnp.where(
            an_has, aniso_r + jnp.arctan2(an[:, 1], an[:, 0]), aniso_r
        )
        aniso_s = jnp.where(an_has, aniso_s * an[:, 2], aniso_s)

    alpha_c = jnp.maximum(rough * rough, 0.001)  # hit.rchit:94-95
    alpha_x = alpha_c + (1.0 - alpha_c) * (aniso_s * aniso_s)  # mix (hit.rchit:112)
    alpha = jnp.stack([alpha_x, alpha_c], axis=-1)
    aniso_dir = jnp.stack([jnp.cos(aniso_r), jnp.sin(aniso_r)], axis=-1)

    # miss lanes: skybox emission with t = -INF (skybox.rmiss:26-28)
    sky = sample_equirect(tables.skybox, direction) * tables.skybox_strength
    emissive = jnp.where(miss[:, None], sky, emissive)
    t_out = jnp.where(miss, -INF, t)

    mat = HitMaterial(
        base_colour=base,
        emissive=emissive,
        metallic=metallic,
        alpha=alpha,
        aniso_dir=aniso_dir,
        transmission=transmission,
        ior=jnp.take(m.ior, mat_i, axis=0),
        thin=jnp.take(m.thin, mat_i, axis=0),
        attenuation=jnp.take(m.attenuation, mat_i, axis=0),
        dispersion=jnp.take(m.dispersion, mat_i, axis=0),
    )
    return HitInfo(
        pos=pos,
        normal=shading_normal,
        tangent=tangent,
        bitangent=bitangent,
        t=t_out,
        front_face=front,
        mat=mat,
    )


# ---------------------------------------------------------------------------
# Next-event estimation (shaders/lightsample.glsl)
# ---------------------------------------------------------------------------


def _balance(p1, p2):
    """Balance heuristic (shaders/sampling.glsl:8-10)."""
    return p1 / jnp.maximum(p1 + p2, 1e-30)


def _sample_analytic(tables, hit, seed, mask, alpha_tables):
    """50/50 point-vs-directional pick + shadow ray (lightsample.glsl:14-52).

    Returns (radiance, light_dir, pdf, seed).
    """
    np_, nd = tables.num_point, tables.num_directional
    p_factor = 1.0 / ((np_ > 0) + (nd > 0))
    n = hit.pos.shape[0]

    pick_point = jnp.zeros((n,), bool)
    if np_ > 0:
        u, seed_a = rng.rnd(seed)
        seed = jnp.where(mask, seed_a, seed)  # draw iff numPoint>0 (:17)
        pick_point = (u < 0.5) | (nd == 0)

    idx, seed_i = rng.rnd_int(
        seed,
        jnp.where(pick_point, 0, np_),
        jnp.where(pick_point, max(np_ - 1, 0), np_ + nd - 1),
    )
    seed = jnp.where(mask, seed_i, seed)

    # point branch
    pi = jnp.clip(idx, 0, max(np_ - 1, 0))
    l_pos = jnp.take(tables.pl_pos, pi, axis=0)
    ray = l_pos - hit.pos
    dist = jnp.sqrt(jnp.maximum(dot3(ray, ray), 1e-30))
    dir_p = ray / dist[:, None]
    att = jnp.where(
        jnp.take(tables.pl_range, pi, axis=0) == 0.0,
        1.0,
        jnp.maximum(
            1.0 - (dist / jnp.maximum(jnp.take(tables.pl_range, pi, axis=0), 1e-20)) ** 4,
            0.0,
        ),
    )
    att = jnp.minimum(att / (dist * dist), 1.0)
    rad_p = (
        jnp.take(tables.pl_colour, pi, axis=0)
        * (jnp.take(tables.pl_intensity, pi, axis=0) * att)[:, None]
    )
    pdf_p = jnp.full((n,), p_factor / max(np_, 1), _F32)

    # directional branch
    di = jnp.clip(idx - np_, 0, max(nd - 1, 0))
    dir_d = -jnp.take(tables.dl_dir, di, axis=0)
    rad_d = (
        jnp.take(tables.dl_colour, di, axis=0)
        * jnp.take(tables.dl_intensity, di, axis=0)[:, None]
    )
    pdf_d = jnp.full((n,), p_factor / max(nd, 1), _F32)

    light_dir = jnp.where(pick_point[:, None], dir_p, dir_d)
    radiance = jnp.where(pick_point[:, None], rad_p, rad_d)
    pdf = jnp.where(pick_point, pdf_p, pdf_d)
    t_max = jnp.where(pick_point, dist, INF)

    offset = jnp.where(dot3(hit.normal, light_dir) >= 0.0, 1.0, -1.0)
    ray_o = hit.pos + (offset * BIAS)[:, None] * hit.normal
    occluded, seed = _shadow(
        tables, ray_o, light_dir, t_max=t_max, active=mask, seed=seed
    )
    radiance = jnp.where((occluded | ~mask)[:, None], 0.0, radiance)
    return radiance, light_dir, pdf, seed, jnp.sum(mask, dtype=jnp.int32)


def _sample_emissive(tables, hit, seed, mask, alpha_tables):
    """Emissive-triangle NEE (lightsample.glsl:54-141): CDF search, uniform
    point on the triangle, closest-hit verification, pdf probe.

    Returns (radiance, light_dir, pdf, seed).
    """
    n = hit.pos.shape[0]
    u_cdf, seed_c = rng.rnd(seed)
    seed = jnp.where(mask, seed_c, seed)
    tri_e = jnp.clip(
        jnp.searchsorted(tables.em_cdf, u_cdf, side="left"),
        0,
        tables.num_emissive_tris - 1,
    ).astype(jnp.int32)
    scene_tri = jnp.take(tables.em_tri, tri_e, axis=0)

    (ux, uy), seed_uv = rng.rnd_square(seed)
    seed = jnp.where(mask, seed_uv, seed)
    fold = ux + uy > 1.0  # parallelogram fold (lightsample.glsl:116-119)
    ux = jnp.where(fold, 1.0 - ux, ux)
    uy = jnp.where(fold, 1.0 - uy, uy)

    v0 = jnp.take(tables.tri_v0, scene_tri, axis=0)
    v1 = jnp.take(tables.tri_v1, scene_tri, axis=0)
    v2 = jnp.take(tables.tri_v2, scene_tri, axis=0)
    point = v0 * ux[:, None] + v1 * uy[:, None] + v2 * (1.0 - ux - uy)[:, None]

    ray = point - hit.pos
    dist = jnp.sqrt(jnp.maximum(dot3(ray, ray), 1e-30))
    light_dir = ray / dist[:, None]
    offset = jnp.where(dot3(hit.normal, light_dir) >= 0.0, 1.0, -1.0)
    ray_o = hit.pos + (offset * BIAS)[:, None] * hit.normal

    # verification ray: closest hit must be the sampled triangle
    # (emissive.rchit:47).  The reference uses tMax = dist + 1e-7
    # (lightsample.glsl:131) which is below f32 ulp at scene scale and
    # spuriously rejects the target triangle; we use a relative slack —
    # harmless because the hit identity is checked anyway.
    (t_hit, tri_hit, _, _), seed = _closest(
        tables,
        ray_o,
        light_dir,
        t_min=0.0,
        t_max=dist * 1.0001 + jnp.float32(1e-4),
        active=mask,
        seed=seed,
    )
    visible = mask & (tri_hit == scene_tri)

    # pdf probe over all emissive surfaces along the ray (lightsample.glsl:136)
    pdf = _emissive_pdf(tables, ray_o, light_dir, t_min=0.0, active=visible)

    mat_i = jnp.take(tables.tri_mat, jnp.maximum(scene_tri, 0), axis=0)
    radiance = jnp.take(tables.materials.emissive, mat_i, axis=0)
    radiance = jnp.where(visible[:, None], radiance, 0.0)
    rays = jnp.sum(mask, dtype=jnp.int32) + jnp.sum(visible, dtype=jnp.int32)
    return radiance, light_dir, pdf, seed, rays


def sample_lights(tables, hit, wavelength, view_world, seed, mask):
    """Port of sampleLights (lightsample.glsl:143-173).

    Strategy pick between analytic and emissive NEE, BSDF x cos / pdf with
    balance-heuristic MIS for area lights (delta lights exempt).
    Returns (contribution (N,3), seed, rays_traced).
    """
    has_analytic = tables.num_point + tables.num_directional > 0
    has_emissive = tables.num_emissive_tris > 0
    n = hit.pos.shape[0]
    rays = jnp.zeros((), jnp.int32)
    if not has_analytic and not has_emissive:
        return jnp.zeros((n, 3), _F32), seed, rays

    alpha_tables = tables.alpha if tables.has_alpha else None

    if has_analytic:
        u, seed_s = rng.rnd(seed)  # drawn whenever analytic lights exist (:150)
        seed = jnp.where(mask, seed_s, seed)
        pick_analytic = (u < 0.5) | (not has_emissive)
    else:
        pick_analytic = jnp.zeros((n,), bool)

    radiance = jnp.zeros((n, 3), _F32)
    light_dir = jnp.zeros((n, 3), _F32)
    pdf = jnp.zeros((n,), _F32)
    delta = pick_analytic

    if has_analytic:
        rad_a, dir_a, pdf_a, seed, r_a = _sample_analytic(
            tables, hit, seed, mask & pick_analytic, alpha_tables
        )
        radiance = jnp.where(pick_analytic[:, None], rad_a, radiance)
        light_dir = jnp.where(pick_analytic[:, None], dir_a, light_dir)
        pdf = jnp.where(pick_analytic, pdf_a, pdf)
        rays = rays + r_a
    if has_emissive:
        rad_e, dir_e, pdf_e, seed, r_e = _sample_emissive(
            tables, hit, seed, mask & ~pick_analytic, alpha_tables
        )
        radiance = jnp.where(pick_analytic[:, None], radiance, rad_e)
        light_dir = jnp.where(pick_analytic[:, None], light_dir, dir_e)
        pdf = jnp.where(pick_analytic, pdf, pdf_e)
        rays = rays + r_e

    got_light = jnp.any(radiance != 0.0, axis=-1) & mask
    pdf = pdf / _F32(max(1, int(has_analytic) + int(has_emissive)))  # :161

    tview = to_tangent(view_world, hit.tangent, hit.bitangent, hit.normal)
    tlight = to_tangent(light_dir, hit.tangent, hit.bitangent, hit.normal)
    bsdf_val = material_bsdf(hit, wavelength, tview, tlight)
    mis = jnp.where(
        delta, 1.0, _balance(pdf, material_pdf(hit, tview, tlight))
    )
    scale = mis * jnp.abs(dot3(hit.normal, light_dir)) / jnp.maximum(pdf, 1e-30)
    contrib = radiance * bsdf_val * scale[:, None]
    zero_bsdf = jnp.all(bsdf_val == 0.0, axis=-1)
    contrib = jnp.where((got_light & ~zero_bsdf)[:, None], contrib, 0.0)
    return contrib, seed, rays


# ---------------------------------------------------------------------------
# The bounce loop (raygen.rgen:52-88)
# ---------------------------------------------------------------------------


def render_sample(
    tables, view_inv, proj_inv, width, height, sample_count, max_depth, lane_idx=None
):
    """Path-trace one sample for every pixel (or the given pixel lanes).

    Returns (radiance (N, 3), rays_traced ()) with N = width*height (or
    len(lane_idx)); the ray counter tallies every traversal launched on an
    active lane (material + shadow/verify + pdf probes) for the Mrays/s
    benchmark metric.
    """
    origin, direction, seed = generate_primary_rays(
        view_inv, proj_inv, width, height, sample_count, lane_idx
    )
    n = origin.shape[0]
    alpha_tables = tables.alpha if tables.has_alpha else None
    preview = jnp.uint32(sample_count) == jnp.uint32(0)

    state = dict(
        origin=origin,
        direction=direction,
        value=jnp.zeros((n, 3), _F32),
        throughput=jnp.ones((n, 3), _F32),
        seed=seed,
        wavelength=jnp.zeros((n,), _F32),
        mat_pdf=jnp.ones((n,), _F32),
        active=jnp.ones((n,), bool),
        rays=jnp.zeros((), jnp.int64) if jax.config.jax_enable_x64 else jnp.zeros((), jnp.int32),
    )

    def bounce(b, s):
        active = s["active"]
        n_active = jnp.sum(active, dtype=s["rays"].dtype)

        (t, tri, u, v), seed = _closest(
            tables,
            s["origin"],
            s["direction"],
            t_min=EPS,
            t_max=INF,
            active=active,
            seed=s["seed"],
        )
        hit = eval_hit(tables, s["origin"], s["direction"], t, tri, u, v)

        miss = tri < 0
        is_emissive = jnp.any(hit.mat.emissive != 0.0, axis=-1)
        terminal = miss | is_emissive | (b == max_depth) | (preview & (b == 1))

        # emissive MIS probe (raygen.rgen:67-73); miss lanes keep weight 1
        probe_mask = active & terminal & is_emissive & ~miss & (b != 0)
        pdf_probe = _emissive_pdf(
            tables, s["origin"], s["direction"], t_min=EPS, active=probe_mask
        )
        weight = jnp.where(probe_mask, _balance(s["mat_pdf"], pdf_probe), 1.0)
        add = s["throughput"] * hit.mat.emissive * weight[:, None]
        value = s["value"] + jnp.where((active & terminal)[:, None], add, 0.0)

        cont = active & ~terminal

        # material sample at this hit (raygen.rgen:79-83)
        view = -s["direction"]
        tview = to_tangent(view, hit.tangent, hit.bitangent, hit.normal)
        d_t, est, pdf_m, _, wl_new, seed_m = sample_material(
            seed, hit, s["wavelength"], tview
        )
        seed = jnp.where(cont, seed_m, seed)
        wavelength = jnp.where(cont, wl_new, s["wavelength"])
        new_dir = from_tangent(d_t, hit.tangent, hit.bitangent, hit.normal)
        throughput = jnp.where(cont[:, None], s["throughput"] * est, s["throughput"])
        mat_pdf = jnp.where(cont, pdf_m, s["mat_pdf"])
        alive = cont & jnp.any(throughput != 0.0, axis=-1)  # raygen.rgen:84

        off_sign = jnp.where(dot3(hit.normal, new_dir) >= 0.0, 1.0, -1.0)
        new_origin = hit.pos + (off_sign * BIAS)[:, None] * hit.normal
        origin = jnp.where(cont[:, None], new_origin, s["origin"])
        direction = jnp.where(cont[:, None], new_dir, s["direction"])

        # NEE for surviving lanes (raygen.rgen:54-56 semantics: throughput
        # already includes this hit's estimator; runs before the next trace)
        light, seed, nee_rays = sample_lights(
            tables, hit, wavelength, view, seed, alive
        )
        value = value + jnp.where(alive[:, None], throughput * light, 0.0)

        # ray accounting: material rays + NEE rays + terminal emissive probes
        n_probe = jnp.sum(probe_mask, dtype=s["rays"].dtype)
        rays = s["rays"] + n_active + n_probe + nee_rays.astype(s["rays"].dtype)

        return dict(
            origin=origin,
            direction=direction,
            value=value,
            throughput=throughput,
            seed=seed,
            wavelength=wavelength,
            mat_pdf=mat_pdf,
            active=alive,
            rays=rays,
        )

    out = jax.lax.fori_loop(0, max_depth + 1, bounce, state)
    return out["value"], out["rays"]
