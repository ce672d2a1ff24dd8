"""Slow NumPy reference integrator — the "CPU reference" for RMSE.

An independent re-implementation of the renderer's algorithm in plain
NumPy float32: brute-force intersection against every triangle (no BVH, no
chunk folds, no XLA), with the math transcribed directly from the
reference's GLSL (shaders/bsdf.glsl, lightsample.glsl, raygen.rgen) and the
RNG consumption following the integrator's documented canonical order
(trace -> sample material -> NEE per bounce, select-rule conditional
consumption).  BASELINE.md's quality metric — per-pixel RMSE at equal spp —
is measured against this oracle; tests/test_rmse.py enforces it.

Intentionally simple and slow: no performance tricks, maximum legibility,
so disagreements between this and the XLA path localise transcription bugs.
Covers the full material model: anisotropic GGX (rotation + strength,
hit.rchit:104-113), all six texture slots incl. normal mapping with scene
tangents, spectral dispersion, thin/volumetric transmission.
"""

from __future__ import annotations

import numpy as np

F = np.float32
U = np.uint32
#: bound on (lanes x triangles) temporaries in the brute-force fold
MAX_PAIRS = 1 << 24
PI = F(np.pi)
TWOPI = F(2 * np.pi)
BIAS = F(1e-3)
EPS = F(1e-7)
INF = F(1e32)


# ---------------------------------------------------------------------------
# RNG (shaders/random.glsl) — vectorised uint32 lanes
# ---------------------------------------------------------------------------


def tea(v0, v1):
    v0 = v0.astype(U).copy()
    v1 = np.broadcast_to(np.asarray(v1, U), v0.shape).copy()
    s = np.zeros_like(v0)
    with np.errstate(over="ignore"):
        for _ in range(16):
            s += U(0x9E3779B9)
            v0 += ((v1 << U(4)) + U(0xA341316C)) ^ (v1 + s) ^ ((v1 >> U(5)) + U(0xC8013EA4))
            v1 += ((v0 << U(4)) + U(0xAD90777D)) ^ (v0 + s) ^ ((v0 >> U(5)) + U(0x7E95761E))
    return v0


def rnd(seed):
    with np.errstate(over="ignore"):
        seed = U(1664525) * seed + U(1013904223)
    return (seed & U(0x00FFFFFF)).astype(F) / F(1 << 24), seed


def rnd_range(seed, lo, hi):
    u, seed = rnd(seed)
    return F(lo) + u * (F(hi) - F(lo)), seed


# ---------------------------------------------------------------------------
# Vector helpers (all on (..., 3) float32)
# ---------------------------------------------------------------------------


def dot(a, b):
    return np.sum(a * b, axis=-1)


def normalize(a):
    return a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-20)


def reflect(i, n):
    return i - 2.0 * dot(n, i)[..., None] * n


def refract(i, n, eta):
    cosi = dot(n, i)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    out = eta[..., None] * i - (eta * cosi + np.sqrt(np.maximum(k, 0)))[..., None] * n
    return np.where((k < 0)[..., None], 0.0, out).astype(F)


def branchless_onb(n):
    sgn = np.where(n[..., 2] >= 0.0, 1.0, -1.0).astype(F)
    a = -1.0 / (sgn + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = np.stack([1.0 + sgn * n[..., 0] ** 2 * a, sgn * b, -sgn * n[..., 0]], -1)
    bt = np.stack([b, sgn + n[..., 1] ** 2 * a, -n[..., 1]], -1)
    return t.astype(F), bt.astype(F)


# ---------------------------------------------------------------------------
# Scene snapshot (host numpy copies of the device tables)
# ---------------------------------------------------------------------------


class OracleScene:
    """NumPy copies of SceneTables for the oracle."""

    def __init__(self, tables):
        if getattr(tables, "inst", None) is not None:
            raise ValueError(
                "the oracle reads world-space triangle columns; upload the "
                "scene with instancing=False for oracle comparisons "
                "(instanced renders are validated against the flattened "
                "render of the same scene, tests/test_instancing.py)"
            )
        g = lambda x: np.asarray(x, F)

        def gv3(v):  # component V3 -> (K, 3)
            return np.stack([g(v.x), g(v.y), g(v.z)], axis=-1)

        self.v0, self.v1, self.v2 = gv3(tables.v0), gv3(tables.v1), gv3(tables.v2)
        self.e1, self.e2 = self.v1 - self.v0, self.v2 - self.v0
        self.tri_n = np.stack([gv3(tables.n0), gv3(tables.n1), gv3(tables.n2)], axis=1)
        self.tri_mat = np.asarray(tables.tri_mat)
        m = tables.materials
        self.base = gv3(m.base_colour)
        self.emissive = g(m.emissive)
        self.metallic = g(m.metallic)
        self.rough = g(m.roughness)
        self.transmission = g(m.transmission)
        self.thin = np.asarray(m.thin)
        self.atten = gv3(m.attenuation)
        self.ior = g(m.ior)
        self.dispersion = g(m.dispersion)
        self.em_cdf = g(tables.em_cdf)
        self.em_tri = np.asarray(tables.em_tri)
        self.em_p = g(tables.em_tables.p_delta)
        self.em_area = g(tables.em_tables.area)
        self.num_emissive = tables.num_emissive_tris
        self.num_point = tables.num_point
        self.num_directional = tables.num_directional
        self.pl_pos, self.pl_colour = gv3(tables.pl_pos), gv3(tables.pl_colour)
        self.pl_intensity, self.pl_range = g(tables.pl_intensity), g(tables.pl_range)
        self.dl_dir, self.dl_colour = gv3(tables.dl_dir), gv3(tables.dl_colour)
        self.dl_intensity = g(tables.dl_intensity)
        sb = tables.skybox  # flat EnvMap -> (H, W, 3)
        self.skybox = np.stack([g(sb.r), g(sb.g), g(sb.b)], axis=-1).reshape(
            sb.h, sb.w, 3
        )
        self.skybox_strength = F(np.asarray(tables.skybox_strength))
        # textures + tangent frames (hit.rchit:46,59-71; texture.glsl)
        self.has_textures = tables.has_textures
        self.uv = g(tables.uv)  # (T, 6) [u0 v0 u1 v1 u2 v2]
        self.tri_tg = np.stack(
            [gv3(tables.tg0), gv3(tables.tg1), gv3(tables.tg2)], axis=1
        )
        self.tg_sign = g(tables.tg_sign)
        self.tex_idx = np.asarray(m.tex_idx)  # (M, 6) texture slots
        self.aniso_strength = g(m.aniso_strength)
        self.aniso_rotation = g(m.aniso_rotation)
        # flat RGBA8 atlas unpacked to float once (ops/texture.py parity)
        p = np.asarray(tables.tex.texels).astype(np.uint32)
        self.texels = np.stack(
            [((p >> s) & 0xFF).astype(F) / F(255.0) for s in (0, 8, 16, 24)],
            axis=-1,
        )  # (S, 4)
        self.tex_off = np.asarray(tables.tex.off)
        self.tex_h = np.asarray(tables.tex.h)
        self.tex_w = np.asarray(tables.tex.w)
        # per-triangle any-hit alpha tables (hit/shadow/emissive.rahit)
        self.has_alpha = tables.has_alpha
        self.alpha_mode = np.asarray(tables.alpha.mode)
        self.alpha_value = g(tables.alpha.value)
        self.alpha_cutoff = g(tables.alpha.cutoff)

    def sample_tex(self, ti, uv):
        """Bilinear + repeat over the flat atlas (ops/texture.py parity).

        ti: (N,) texture ids (callers gate on ti >= 0); uv: (N, 2).
        Returns (N, 4).
        """
        t = np.maximum(ti, 0)
        hh = self.tex_h[t].astype(F)
        ww = self.tex_w[t].astype(F)
        x = uv[:, 0] * ww - 0.5
        y = uv[:, 1] * hh - 0.5
        x0 = np.floor(x)
        y0 = np.floor(y)
        fx = (x - x0)[:, None]
        fy = (y - y0)[:, None]
        wi = np.maximum(self.tex_w[t], 1)
        hi = np.maximum(self.tex_h[t], 1)
        x0i = np.mod(x0.astype(int), wi)
        x1i = np.mod(x0.astype(int) + 1, wi)
        y0i = np.mod(y0.astype(int), hi)
        y1i = np.mod(y0.astype(int) + 1, hi)
        off = self.tex_off[t]
        c00 = self.texels[off + y0i * wi + x0i]
        c10 = self.texels[off + y0i * wi + x1i]
        c01 = self.texels[off + y1i * wi + x0i]
        c11 = self.texels[off + y1i * wi + x1i]
        top = c00 * (1 - fx) + c10 * fx
        bot = c01 * (1 - fx) + c11 * fx
        return (top * (1 - fy) + bot * fy).astype(F)

    # brute force closest hit
    def closest(self, o, d, t_min, t_max):
        """Lane-chunked so (lanes x triangles) temporaries stay bounded —
        big-scene quality crops (bench.py cfg2-5 gates) would otherwise
        allocate O(n*T*3) floats in one shot."""
        n = o.shape[0]
        max_lanes = max(1, MAX_PAIRS // max(self.v0.shape[0], 1))
        if n > max_lanes:
            outs = [
                self.closest(
                    o[i : i + max_lanes],
                    d[i : i + max_lanes],
                    t_min if np.ndim(t_min) == 0 else t_min[i : i + max_lanes],
                    t_max if np.ndim(t_max) == 0 else t_max[i : i + max_lanes],
                )
                for i in range(0, n, max_lanes)
            ]
            return tuple(np.concatenate(x) for x in zip(*outs))
        pvec = np.cross(d[:, None, :], self.e2[None])
        det = np.sum(self.e1[None] * pvec, -1)
        bad = np.abs(det) < 1e-12
        inv = 1.0 / np.where(bad, 1.0, det)
        tvec = o[:, None, :] - self.v0[None]
        u = np.sum(tvec * pvec, -1) * inv
        qvec = np.cross(tvec, self.e1[None])
        v = np.sum(d[:, None, :] * qvec, -1) * inv
        t = np.sum(self.e2[None] * qvec, -1) * inv
        tm = t_max if np.ndim(t_max) else np.full(n, t_max, F)
        tmn = t_min if np.ndim(t_min) else np.full(n, t_min, F)
        hit = (~bad) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > tmn[:, None]) & (t <= tm[:, None])
        t = np.where(hit, t, np.inf).astype(F)
        k = np.argmin(t, 1)
        r = np.arange(n)
        tb = t[r, k]
        found = np.isfinite(tb)
        return (
            np.where(found, tb, np.inf).astype(F),
            np.where(found, k, -1),
            np.where(found, u[r, k], 0).astype(F),
            np.where(found, v[r, k], 0).astype(F),
        )

    def occluded(self, o, d, t_max):
        t, tri, _, _ = self.closest(o, d, F(0.0), INF)
        return (tri >= 0) & (t <= t_max)

    def alpha_test(self, tri, u, v, seed, cand):
        """Any-hit alpha decision (hit.rahit:26-53), bit-matching
        integrator._alpha_test: alpha = baseColourFactor.a x
        baseColourTexture.a at the candidate's barycentrics; MASK ignores
        below the cutoff, BLEND ignores with probability 1-alpha drawing
        ONE rnd per BLEND candidate.  Returns (keep, seed)."""
        ti = np.maximum(tri, 0)
        mode = self.alpha_mode[ti]
        alpha = self.alpha_value[ti]
        acut = self.alpha_cutoff[ti]
        if self.has_textures:
            tex_b = self.tex_idx[self.tri_mat[ti], 0]
            w0 = 1.0 - u - v
            uv6 = self.uv[ti]
            uv = np.stack(
                [
                    w0 * uv6[:, 0] + u * uv6[:, 2] + v * uv6[:, 4],
                    w0 * uv6[:, 1] + u * uv6[:, 3] + v * uv6[:, 5],
                ],
                -1,
            ).astype(F)
            texel = self.sample_tex(tex_b, uv)
            alpha = np.where(tex_b >= 0, alpha * texel[:, 3], alpha).astype(F)
        is_blend = cand & (mode == 2)
        u_rnd, seed_adv = rnd(seed)
        seed = np.where(is_blend, seed_adv, seed)
        ignore = (cand & (mode == 1) & (alpha < acut)) | (
            is_blend & (u_rnd < 1.0 - alpha)
        )
        return cand & ~ignore, seed

    def closest_alpha(self, o, d, t_min, t_max, active, seed):
        """integrator._closest parity: alpha-free scenes go straight to
        the brute-force sweep; MASK/BLEND scenes run the same t-ordered
        accept/reject resample loop (rejected candidates advance the lower
        bound strictly past themselves, ignoreIntersectionEXT equivalent)
        with the same per-BLEND-candidate RNG consumption."""
        if not self.has_alpha:
            t, tri, u, v = self.closest(o, d, t_min, t_max)
            t = np.where(active, t, np.inf).astype(F)
            tri = np.where(active, tri, -1)
            return (t, tri, u, v), seed
        n = o.shape[0]
        t_lo = (
            np.full(n, t_min, F) if np.ndim(t_min) == 0 else t_min.astype(F)
        )
        pending = active.copy()
        t_out = np.full(n, np.inf, F)
        tri_out = np.full(n, -1, np.int64)
        u_out = np.zeros(n, F)
        v_out = np.zeros(n, F)
        while pending.any():
            t, tri, u, v = self.closest(o, d, t_lo, t_max)
            found = pending & (tri >= 0)
            keep, seed2 = self.alpha_test(tri, u, v, seed, found)
            seed = np.where(pending, seed2, seed)
            t_safe = np.where(np.isfinite(t), t, F(0.0)).astype(F)
            rejected = found & ~keep
            t_lo = np.where(
                rejected, t_safe * F(1.0 + 4e-7) + F(1e-30), t_lo
            ).astype(F)
            t_out = np.where(keep, t, t_out).astype(F)
            tri_out = np.where(keep, tri, tri_out)
            u_out = np.where(keep, u, u_out).astype(F)
            v_out = np.where(keep, v, v_out).astype(F)
            pending = rejected
        return (t_out, tri_out, u_out, v_out), seed

    def occluded_alpha(self, o, d, t_max, seed, active):
        """Occlusion with shadow.rahit alpha semantics (tMin = 0), matching
        integrator._shadow_unsorted: nearest ACCEPTED hit within t_max."""
        if not self.has_alpha:
            return self.occluded(o, d, t_max) & active, seed
        (_, tri, _, _), seed = self.closest_alpha(
            o, d, F(0.0), t_max, active, seed
        )
        return (tri >= 0) & active, seed

    def emissive_pdf(self, o, d, t_min):
        """shaders/emissivepdf.rahit over emissive triangles, brute force."""
        if self.num_emissive == 0:
            return np.zeros(o.shape[0], F)
        et = self.em_tri
        ev0, ee1, ee2 = self.v0[et], self.e1[et], self.e2[et]
        pvec = np.cross(d[:, None, :], ee2[None])
        det = np.sum(ee1[None] * pvec, -1)
        bad = np.abs(det) < 1e-12
        inv = 1.0 / np.where(bad, 1.0, det)
        tvec = o[:, None, :] - ev0[None]
        u = np.sum(tvec * pvec, -1) * inv
        qvec = np.cross(tvec, ee1[None])
        v = np.sum(d[:, None, :] * qvec, -1) * inv
        t = np.sum(ee2[None] * qvec, -1) * inv
        hit = (~bad) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min)
        en = self.tri_n[et]  # (Te, 3, 3)
        w0 = (1 - u - v)[..., None]
        nrm = w0 * en[None, :, 0] + u[..., None] * en[None, :, 1] + v[..., None] * en[None, :, 2]
        nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
        cos = np.abs(np.sum(nrm * d[:, None, :], -1))
        with np.errstate(over="ignore", invalid="ignore"):
            contrib = self.em_p[None] * t * t / np.maximum(
                self.em_area[None] * cos, 1e-30
            )
        return np.sum(np.where(hit, contrib, 0), 1).astype(F)

    def sky(self, d):
        h, w = self.skybox.shape[:2]
        u = np.arctan2(d[:, 2], d[:, 0]) / TWOPI + 0.5
        v = -(np.arcsin(np.clip(d[:, 1], -1, 1)) / PI + 0.5)
        x = u * w - 0.5
        y = v * h - 0.5
        x0, y0 = np.floor(x), np.floor(y)
        fx, fy = (x - x0)[:, None], (y - y0)[:, None]
        x0i, x1i = np.mod(x0.astype(int), w), np.mod(x0.astype(int) + 1, w)
        y0i, y1i = np.mod(y0.astype(int), h), np.mod(y0.astype(int) + 1, h)
        top = self.skybox[y0i, x0i] * (1 - fx) + self.skybox[y0i, x1i] * fx
        bot = self.skybox[y1i, x0i] * (1 - fx) + self.skybox[y1i, x1i] * fx
        return ((top * (1 - fy) + bot * fy) * self.skybox_strength).astype(F)


# ---------------------------------------------------------------------------
# Material evaluation at a hit (hit.rchit, isotropic subset)
# ---------------------------------------------------------------------------


class Hit:
    pass


def eval_hit(sc: OracleScene, o, d, t, tri, u, v):
    """hit.rchit:31-117 — interpolation, TBN + normal mapping, all six
    texture slots, anisotropic alpha construction, skybox on miss."""
    h = Hit()
    miss = tri < 0
    ti = np.maximum(tri, 0)
    h.pos = (o + np.where(np.isfinite(t), t, 0)[:, None] * d).astype(F)
    tn = sc.tri_n[ti]
    w0 = (1 - u - v)[:, None]
    nrm = normalize(w0 * tn[:, 0] + u[:, None] * tn[:, 1] + v[:, None] * tn[:, 2])
    mi = sc.tri_mat[ti]

    # tangent frame from scene tangents (hit.rchit:61-71), pre-flip normal
    tg_raw = (
        w0 * sc.tri_tg[ti, 0] + u[:, None] * sc.tri_tg[ti, 1] + v[:, None] * sc.tri_tg[ti, 2]
    )
    has_tg = np.any(tg_raw != 0, -1)
    sign = sc.tg_sign[ti]
    tg_n = normalize(tg_raw)

    shading = nrm
    uvp = None
    tex = sc.tex_idx[mi] if sc.has_textures else None
    if sc.has_textures:
        uv6 = sc.uv[ti]
        uvp = np.stack(
            [
                w0[:, 0] * uv6[:, 0] + u * uv6[:, 2] + v * uv6[:, 4],
                w0[:, 0] * uv6[:, 1] + u * uv6[:, 3] + v * uv6[:, 5],
            ],
            -1,
        ).astype(F)
        has_nm = (tex[:, 2] >= 0) & has_tg
        bt0 = np.cross(nrm, tg_n) * sign[:, None]
        texel = sc.sample_tex(tex[:, 2], uvp)
        nmap = normalize(texel[:, :3] * 2.0 - 1.0)
        mapped = normalize(
            tg_n * nmap[:, 0:1] + bt0 * nmap[:, 1:2] + nrm * nmap[:, 2:3]
        )
        shading = np.where(has_nm[:, None], mapped, nrm).astype(F)

    tg_ortho = normalize(tg_n - shading * dot(shading, tg_n)[:, None])
    bt_ortho = np.cross(shading, tg_ortho) * sign[:, None]
    onb_t, onb_b = branchless_onb(shading)
    tangent = np.where(has_tg[:, None], tg_ortho, onb_t).astype(F)
    bitangent = np.where(has_tg[:, None], bt_ortho, onb_b).astype(F)

    view = -d
    h.front = dot(shading, view) >= 0
    h.normal = np.where(h.front[:, None], shading, -shading).astype(F)
    h.tangent, h.bitangent = tangent, bitangent
    h.t = np.where(miss, -INF, t).astype(F)

    h.base = sc.base[mi].copy()
    emissive = sc.emissive[mi].copy()
    h.metallic = sc.metallic[mi].copy()
    rough = sc.rough[mi].copy()
    h.transmission = sc.transmission[mi].copy()
    aniso_s = sc.aniso_strength[mi].copy()
    aniso_r = sc.aniso_rotation[mi].copy()

    if sc.has_textures:  # hit.rchit:75-113 texture modulation
        tb = sc.sample_tex(tex[:, 0], uvp)
        h.base = np.where((tex[:, 0] >= 0)[:, None], h.base * tb[:, :3], h.base)
        te = sc.sample_tex(tex[:, 3], uvp)
        emissive = np.where((tex[:, 3] >= 0)[:, None], emissive * te[:, :3], emissive)
        tt = sc.sample_tex(tex[:, 4], uvp)
        h.transmission = np.where(
            tex[:, 4] >= 0, h.transmission * tt[:, 0], h.transmission
        )
        mr = sc.sample_tex(tex[:, 1], uvp)
        h.metallic = np.where(tex[:, 1] >= 0, h.metallic * mr[:, 2], h.metallic)
        rough = np.where(tex[:, 1] >= 0, rough * mr[:, 1], rough)
        an = sc.sample_tex(tex[:, 5], uvp)
        aniso_r = np.where(
            tex[:, 5] >= 0, aniso_r + np.arctan2(an[:, 1], an[:, 0]), aniso_r
        )
        aniso_s = np.where(tex[:, 5] >= 0, aniso_s * an[:, 2], aniso_s)

    a = np.maximum(rough * rough, 0.001).astype(F)  # hit.rchit:94-95
    h.ax = (a + (1 - a) * aniso_s * aniso_s).astype(F)  # mix (hit.rchit:112)
    h.ay = a
    h.adx = np.cos(aniso_r).astype(F)
    h.ady = np.sin(aniso_r).astype(F)
    h.emissive = np.where(miss[:, None], sc.sky(d), emissive).astype(F)
    h.thin = sc.thin[mi]
    h.atten = sc.atten[mi]
    h.ior = sc.ior[mi]
    h.dispersion = sc.dispersion[mi]
    h.miss = miss
    return h


def to_tangent(h, v):
    return np.stack([dot(v, h.tangent), dot(v, h.bitangent), dot(v, h.normal)], -1).astype(F)


def from_tangent(h, v):
    return (
        v[..., 0:1] * h.tangent + v[..., 1:2] * h.bitangent + v[..., 2:3] * h.normal
    ).astype(F)


# ---------------------------------------------------------------------------
# Isotropic GGX BSDF (shaders/bsdf.glsl, anisotropyDirection=(1,0), ax=ay)
# ---------------------------------------------------------------------------


def aniso2(h, vx, vy):
    """mat2(anisoDir, anisoDir.yx*(1,-1)) * v (bsdf.glsl:14,150)."""
    return h.adx * vx + h.ady * vy, h.ady * vx - h.adx * vy


def d_ggx(h, hv):
    ht, hb = aniso2(h, hv[..., 0], hv[..., 1])
    a2 = h.ax * h.ay
    f = a2 / np.maximum((h.ay * ht) ** 2 + (h.ax * hb) ** 2 + (a2 * hv[..., 2]) ** 2, 1e-30)
    return a2 * f * f / PI


def _smith_len(h, v):
    vt, vb = aniso2(h, v[..., 0], v[..., 1])
    return np.sqrt((h.ax * vt) ** 2 + (h.ay * vb) ** 2 + v[..., 2] ** 2)


def vis(h, v, l):
    den = 2 * (l[..., 2] * _smith_len(h, v) + v[..., 2] * _smith_len(h, l))
    return np.where(np.abs(den) < 1e-20, 0.0, 1.0 / np.where(den == 0, 1, den)).astype(F)


def vis_trans(h, v, l, hv):
    valid = (dot(hv, v) > 0) & (dot(hv, l) < 0)
    den = 2 * (-l[..., 2] * _smith_len(h, v) + v[..., 2] * _smith_len(h, l))
    out = np.where(np.abs(den) < 1e-20, 0.0, 1.0 / np.where(den == 0, 1, den))
    return np.where(valid, out, 0.0).astype(F)


def vis_refr(h, eta, v, l, hv):
    hl, hv_ = dot(hv, l), dot(hv, v)
    valid = (hv_ > 0) & (hl < 0)
    den = (eta * hv_ + hl) ** 2 * (
        -l[..., 2] * _smith_len(h, v) + v[..., 2] * _smith_len(h, l)
    )
    out = np.where(np.abs(den) < 1e-30, 0.0, 2 * -hl * hv_ / np.where(den == 0, 1, den))
    return np.where(valid, out, 0.0).astype(F)


def fresnel(f0, c):
    return (np.maximum(1 - c, 0) ** 5 * (1 - f0) + f0).astype(F)


def fresnel_vh(f0, v, hv):
    c = np.abs(dot(v, hv))
    if np.ndim(f0) == 2:
        c = c[..., None]
    return fresnel(f0, c)


def fresnel_transmission(f0, eta, vdoth):
    s2 = eta * eta * (1 - vdoth * vdoth)
    f_lo = fresnel(f0, vdoth)
    f_r = fresnel(f0, np.sqrt(np.maximum(1 - s2, 0)))
    return np.where(eta <= 1, f_lo, np.where(s2 <= 1, f_r, 1.0)).astype(F)


def _vndf_k(h, sx, sy, vz):
    """Bounded-VNDF k; s from the given xy components (bsdf.glsl:119-122,
    155-158 — raw view.xy in the sampler, aniso-space in the pdfs; the
    rotation is orthogonal so |xy| matches, mirrored here for parity)."""
    s = 1 + np.sqrt(sx * sx + sy * sy)
    a = np.minimum(h.ax, h.ay)
    s2, a2 = s * s, a * a
    return (1 - a2) * s2 / (s2 + a2 * vz * vz)


def vndf_refl_pdf(h, v, hv):
    ndf = d_ggx(h, hv)
    ax, ay = aniso2(h, v[..., 0], v[..., 1])
    t = np.sqrt((h.ax * ax) ** 2 + (h.ay * ay) ** 2 + v[..., 2] ** 2)
    k = _vndf_k(h, ax, ay, v[..., 2])
    den = 2 * (k * v[..., 2] + t)
    return np.where(np.abs(den) < 1e-20, 0.0, ndf / np.where(den == 0, 1, den)).astype(F)


def vndf_refr_pdf(h, eta, v, l, hv):
    hl, hvv = dot(hv, l), dot(hv, v)
    den = (eta * hvv + hl) ** 2
    jac = np.where(den < 1e-30, 0.0, -hl / np.where(den == 0, 1, den))
    ndf = d_ggx(h, hv)
    ax, ay = aniso2(h, v[..., 0], v[..., 1])
    t = np.sqrt((h.ax * ax) ** 2 + (h.ay * ay) ** 2 + v[..., 2] ** 2)
    k = _vndf_k(h, ax, ay, v[..., 2])
    d2 = k * v[..., 2] + t
    return np.where(np.abs(d2) < 1e-20, 0.0, 2 * hvv * ndf / np.where(d2 == 0, 1, d2) * jac).astype(F)


def sample_vndf(seed, h, v):
    vstd = normalize(np.stack([h.ax * v[..., 0], h.ay * v[..., 1], v[..., 2]], -1))
    ux, seed = rnd(seed)
    uy, seed = rnd(seed)
    phi = TWOPI * ux
    b = _vndf_k(h, v[..., 0], v[..., 1], v[..., 2]) * vstd[..., 2]
    z = (1 - uy) * (1 + b) - b
    st = np.sqrt(np.clip(1 - z * z, 0, 1))
    dstd = np.stack([st * np.cos(phi), st * np.sin(phi), z], -1).astype(F)
    hstd = vstd + dstd
    # map back through mat2(anisoDir, anisoDir.yx*(1,-1)) (bsdf.glsl:150,166)
    # — an (x, -y) mirror for the default direction, observable per sample
    ani = normalize(
        np.stack([hstd[..., 0] * h.ax, hstd[..., 1] * h.ay, hstd[..., 2]], -1)
    )
    hx, hy = aniso2(h, ani[..., 0], ani[..., 1])
    return np.stack([hx, hy, ani[..., 2]], -1).astype(F), seed


def sample_cosine(seed):
    ux, seed = rnd(seed)
    uy, seed = rnd(seed)
    r = ux
    x = r * np.sin(TWOPI * uy)
    y = r * np.cos(TWOPI * uy)
    return np.stack([x, y, 1 - (x * x + y * y)], -1).astype(F), seed


def material_pdf(h, v, l):
    f0 = ((h.ior - 1) / (h.ior + 1)) ** 2
    p_t = (1 - h.metallic) * h.transmission
    p_d = 0.5 * (1 - h.metallic)
    eta = np.where(h.front, 1 / h.ior, h.ior).astype(F)
    ndotl = l[..., 2]

    h_thin = normalize(v + l * np.asarray([1, 1, -1], F))
    f_thin = fresnel(f0, dot(v, h_thin))
    pdf_thin = vndf_refl_pdf(h, v, h_thin)
    hr = normalize(eta[..., None] * v + l)
    hr = np.where((eta > 1)[..., None], hr, -hr)
    f_r = fresnel_transmission(f0, eta, dot(v, hr))
    pdf_r = vndf_refr_pdf(h, eta, v, l, hr)
    pdf_neg = p_t * np.where(h.thin, (1 - f_thin) * pdf_thin, (1 - f_r) * pdf_r)

    hh = normalize(v + l)
    ggx = vndf_refl_pdf(h, v, hh)
    pdf_pos = (1 - p_d) * (1 - p_t) * ggx + p_d * ndotl / PI
    vdoth = dot(v, hh)
    ft = np.where(h.thin, fresnel(f0, vdoth), fresnel_transmission(f0, eta, vdoth))
    pdf_pos = pdf_pos + np.where(p_t > 0, p_t * ft * ggx, 0)
    return np.where(ndotl < 0, pdf_neg, pdf_pos).astype(F)


def material_bsdf(h, wavelength, v, l):
    ior = dispersed_ior(h.ior, h.dispersion, wavelength)
    f0 = ((ior - 1) / (ior + 1)) ** 2
    p_t = (1 - h.metallic) * h.transmission
    eta = np.where(h.front, 1 / ior, ior).astype(F)
    ndotl = l[..., 2]
    absorb = np.where(
        (~h.thin & ~h.front)[:, None], np.exp(-h.atten * h.t[:, None]), 1.0
    ).astype(F)

    h_thin = normalize(v + l * np.asarray([1, 1, -1], F))
    f_thin = fresnel_vh(f0, v, h_thin)
    lobe_thin = vis_trans(h, v, l, h_thin) * d_ggx(h, h_thin)
    hr = normalize(eta[..., None] * v + l)
    hr = np.where((eta > 1)[..., None], hr, -hr)
    f_r = fresnel_transmission(f0, eta, dot(v, hr))
    lobe_r = vis_refr(h, eta, v, l, hr) * d_ggx(h, hr)
    ft_neg = np.where(h.thin, f_thin, f_r)
    lobe_neg = np.where(h.thin, lobe_thin, lobe_r)
    bsdf_neg = (p_t * (1 - ft_neg))[:, None] * h.base * lobe_neg[:, None] * absorb

    hh = normalize(v + l)
    f_diel = fresnel_vh(f0, v, hh)
    f_met = fresnel_vh(h.base, v, hh)
    spec = vis(h, v, l) * d_ggx(h, hh)
    diffuse = (1 - h.transmission)[:, None] * np.where(
        (l[..., 2] > 0)[:, None], h.base / PI, 0
    )
    diel = diffuse * (1 - f_diel[:, None]) + spec[:, None] * f_diel[:, None]
    base = diel * (1 - h.metallic[:, None]) + f_met * (spec * h.metallic)[:, None]
    base = np.where((p_t < 1)[:, None], base, 0)
    vdoth = dot(v, hh)
    ftp = np.where(h.thin, fresnel(f0, vdoth), fresnel_transmission(f0, eta, vdoth))
    tpos = (p_t * ftp)[:, None] * h.base * spec[:, None] * absorb
    bsdf_pos = base + np.where((p_t > 0)[:, None], tpos, 0)
    out = np.where((ndotl < 0)[:, None], bsdf_neg, np.where((ndotl > 0)[:, None], bsdf_pos, 0))
    return out.astype(F)


def dispersed_ior(ior, dispersion, wl):
    wl2 = np.maximum(wl * wl, 1e-20)
    adj = np.maximum(ior + (ior - 1) * dispersion / 20 * (523655.0 / wl2 - 1.5168), 1.0)
    return np.where((dispersion != 0) & (wl > 0), adj, ior).astype(F)


def spectral_1931(wl):
    def g(w, mu, lo, hi):
        t = (w - mu) * np.where(w < mu, lo, hi)
        return np.exp(-0.5 * t * t)

    x = 0.362 * g(wl, 442.0, 0.0624, 0.0374) + 1.056 * g(wl, 599.8, 0.0264, 0.0323) - 0.065 * g(wl, 501.1, 0.0490, 0.0382)
    y = 0.821 * g(wl, 568.8, 0.0213, 0.0247) + 0.286 * g(wl, 530.9, 0.0613, 0.0322)
    z = 1.217 * g(wl, 437.0, 0.0845, 0.0278) + 0.681 * g(wl, 459.0, 0.0385, 0.0725)
    m = np.array(
        [
            [2.364613, -0.896541, -0.468073],
            [-0.5151166, 1.426408, 0.088758],
            [0.005203, -0.014408, 1.009204],
        ],
        F,
    )
    return np.stack([x, y, z], -1).astype(F) @ m.T


def sample_material(seed, h, wavelength, view):
    needs = (h.dispersion != 0) & (wavelength == 0)
    wl_new, seed_c = rnd_range(seed, 400.0, 700.0)
    wavelength = np.where(needs, wl_new, wavelength).astype(F)
    seed = np.where(needs, seed_c, seed)
    base = np.where(needs[:, None], h.base * spectral_1931(wavelength), h.base).astype(F)
    ior = dispersed_ior(h.ior, h.dispersion, wavelength)
    f0 = ((ior - 1) / (ior + 1)) ** 2
    p_t = (1 - h.metallic) * h.transmission
    p_d = 0.5 * (1 - h.metallic)
    eta = np.where(h.front, 1 / ior, ior).astype(F)

    u_lobe, seed = rnd(seed)
    take_t = u_lobe < p_t

    # transmission branch
    h_t, seed_t = sample_vndf(seed, h, view)
    f_thin = fresnel_vh(f0, view, h_t)
    d_thin_r = reflect(-view, h_t)
    thin_fail = d_thin_r[..., 2] < 0
    pdf_thin = vndf_refl_pdf(h, view, h_t)
    u_flip, seed_tf = rnd(seed_t)
    d_thin = np.where((u_flip > f_thin)[:, None], d_thin_r * np.asarray([1, 1, -1], F), d_thin_r)
    seed_thin = np.where(thin_fail, seed_t, seed_tf)

    vdoth = dot(view, h_t)
    f_vol = fresnel_transmission(f0, eta, vdoth)
    u_f, seed_v = rnd(seed_t)
    refl = u_f < f_vol
    d_refl = reflect(-view, h_t)
    d_refr = refract(-view, h_t, eta)
    d_vol = np.where(refl[:, None], d_refl, d_refr)
    pdf_vol = np.where(
        refl, vndf_refl_pdf(h, view, h_t), vndf_refr_pdf(h, eta, view, d_refr, h_t)
    )
    vol_fail = np.where(refl, d_vol[..., 2] < 0, d_vol[..., 2] > 0)

    d_trans = np.where(h.thin[:, None], d_thin, d_vol)
    pdf_g_t = np.where(h.thin, pdf_thin, pdf_vol)
    fail_t = np.where(h.thin, thin_fail, vol_fail)
    seed_trans = np.where(h.thin, seed_thin, seed_v)
    ft_t = np.where(h.thin, f_thin, f_vol)

    # reflection branch
    u_d, seed_r = rnd(seed)
    is_d = u_d < p_d
    d_cos, seed_cos = sample_cosine(seed_r)
    h_cos = normalize(view + d_cos)
    h_v, seed_vn = sample_vndf(seed_r, h, view)
    d_vn = reflect(-view, h_v)
    d_r = np.where(is_d[:, None], d_cos, d_vn)
    h_r = np.where(is_d[:, None], h_cos, h_v)
    seed_refl = np.where(is_d, seed_cos, seed_vn)
    fail_r = d_r[..., 2] < 0
    pdf_g_r = vndf_refl_pdf(h, view, h_r)
    vd_r = dot(view, h_r)
    ft_r = np.where(
        h.thin | (eta <= 1), fresnel(f0, vd_r), fresnel_transmission(f0, eta, vd_r)
    )

    direction = np.where(take_t[:, None], d_trans, d_r)
    hw = np.where(take_t[:, None], h_t, h_r)
    pdf_g = np.where(take_t, pdf_g_t, pdf_g_r)
    fail = np.where(take_t, fail_t, fail_r)
    seed = np.where(take_t, seed_trans, seed_refl)
    ft = np.where(take_t, ft_t, ft_r)
    ndotl = direction[..., 2]

    f_diel = fresnel_vh(f0, view, hw)
    f_met = fresnel_vh(base, view, hw)
    absorb = np.where((~h.thin & ~h.front)[:, None], np.exp(-h.atten * h.t[:, None]), 1.0)

    lobe_neg = np.where(
        h.thin,
        vis_trans(h, view, direction, hw) * d_ggx(h, hw),
        vis_refr(h, eta, view, direction, hw) * d_ggx(h, hw),
    )
    bsdf_neg = (p_t * (1 - ft))[:, None] * base * lobe_neg[:, None] * absorb
    pdf_neg = p_t * (1 - ft) * pdf_g

    spec = vis(h, view, direction) * d_ggx(h, hw)
    diffuse = (1 - h.transmission)[:, None] * np.where(
        (ndotl > 0)[:, None], base / PI, 0
    )
    diel = diffuse * (1 - f_diel[:, None]) + spec[:, None] * f_diel[:, None]
    b0 = diel * (1 - h.metallic[:, None]) + f_met * (spec * h.metallic)[:, None]
    bsdf_pos = np.where((p_t < 1)[:, None], b0, 0)
    pdf_pos = np.where(p_t < 1, (1 - p_d) * (1 - p_t) * pdf_g + p_d * ndotl / PI, 0)
    tpos = (p_t * ft)[:, None] * base * spec[:, None] * absorb
    bsdf_pos = bsdf_pos + np.where((p_t > 0)[:, None], tpos, 0)
    pdf_pos = pdf_pos + np.where(p_t > 0, p_t * ft * pdf_g, 0)

    neg = ndotl < 0
    bsdf = np.where(neg[:, None], bsdf_neg, bsdf_pos)
    pdf = np.where(neg, pdf_neg, pdf_pos).astype(F)
    ok = ~fail
    direction = np.where(ok[:, None], direction, 0).astype(F)
    zero = np.all(bsdf == 0, -1) | (pdf <= 0)
    est = np.where(
        (ok & ~zero)[:, None],
        bsdf / np.where(pdf == 0, 1, pdf)[:, None] * np.abs(ndotl)[:, None],
        0,
    ).astype(F)
    pdf = np.where(ok, pdf, 0).astype(F)
    return direction, est, pdf, wavelength, seed


# ---------------------------------------------------------------------------
# NEE (shaders/lightsample.glsl)
# ---------------------------------------------------------------------------


def sample_lights(sc, h, wavelength, view_world, seed, mask):
    n = h.pos.shape[0]
    has_a = sc.num_point + sc.num_directional > 0
    has_e = sc.num_emissive > 0
    if not has_a and not has_e:
        return np.zeros((n, 3), F), seed
    if has_a:
        u, s2 = rnd(seed)
        seed = np.where(mask, s2, seed)
        pick_a = (u < 0.5) | (not has_e)
    else:
        pick_a = np.zeros(n, bool)

    radiance = np.zeros((n, 3), F)
    ldir = np.zeros((n, 3), F)
    pdf = np.zeros(n, F)
    t_max = np.full(n, INF, F)

    if has_a:
        pf = 1.0 / ((sc.num_point > 0) + (sc.num_directional > 0))
        m = mask & pick_a
        pick_p = np.zeros(n, bool)
        if sc.num_point > 0:
            u, s2 = rnd(seed)
            seed = np.where(m, s2, seed)
            pick_p = (u < 0.5) | (sc.num_directional == 0)
        with np.errstate(over="ignore"):
            bits = (U(1664525) * seed + U(1013904223)) & U(0xFFFFFF)
            s_idx = U(1664525) * seed + U(1013904223)
        lo = np.where(pick_p, 0, sc.num_point)
        hi = np.where(pick_p, max(sc.num_point - 1, 0), sc.num_point + sc.num_directional - 1)
        idx = (bits % np.maximum(hi - lo + 1, 1).astype(U)).astype(np.int64) + lo
        seed = np.where(m, s_idx, seed)
        pi_ = np.clip(idx, 0, max(sc.num_point - 1, 0))
        ray = sc.pl_pos[pi_] - h.pos
        dist = np.maximum(np.linalg.norm(ray, axis=-1), 1e-15)
        dp = ray / dist[:, None]
        att = np.where(
            sc.pl_range[pi_] == 0,
            1.0,
            np.maximum(1 - (dist / np.maximum(sc.pl_range[pi_], 1e-20)) ** 4, 0),
        )
        att = np.minimum(att / (dist * dist), 1.0)
        rad_p = sc.pl_colour[pi_] * (sc.pl_intensity[pi_] * att)[:, None]
        di = np.clip(idx - sc.num_point, 0, max(sc.num_directional - 1, 0))
        dd = -sc.dl_dir[di]
        rad_d = sc.dl_colour[di] * sc.dl_intensity[di][:, None]
        l = np.where(pick_p[:, None], dp, dd).astype(F)
        rad = np.where(pick_p[:, None], rad_p, rad_d).astype(F)
        pdf_a = np.where(pick_p, pf / max(sc.num_point, 1), pf / max(sc.num_directional, 1)).astype(F)
        radiance = np.where(pick_a[:, None], rad, radiance)
        ldir = np.where(pick_a[:, None], l, ldir)
        pdf = np.where(pick_a, pdf_a, pdf)
        t_max = np.where(pick_a, np.where(pick_p, dist, INF), t_max).astype(F)

    if has_e:
        m = mask & ~pick_a
        u, s2 = rnd(seed)
        seed = np.where(m, s2, seed)
        te = np.clip(np.searchsorted(sc.em_cdf, u, side="left"), 0, sc.num_emissive - 1)
        st = sc.em_tri[te]
        ux, s2 = rnd(seed)
        uy, s3 = rnd(s2)
        seed = np.where(m, s3, seed)
        fold = ux + uy > 1
        ux = np.where(fold, 1 - ux, ux)
        uy = np.where(fold, 1 - uy, uy)
        point = sc.v0[st] * ux[:, None] + sc.v1[st] * uy[:, None] + sc.v2[st] * (1 - ux - uy)[:, None]
        ray = point - h.pos
        dist = np.maximum(np.linalg.norm(ray, axis=-1), 1e-15).astype(F)
        l = (ray / dist[:, None]).astype(F)
        rad_e = sc.emissive[sc.tri_mat[st]].copy()
        if sc.has_textures:
            # emissive.rchit:39-41 — emissive texture at the sampled point
            tex_e = sc.tex_idx[sc.tri_mat[st], 3]
            uv6 = sc.uv[st]
            w2 = 1 - ux - uy
            uvh = np.stack(
                [
                    ux * uv6[:, 0] + uy * uv6[:, 2] + w2 * uv6[:, 4],
                    ux * uv6[:, 1] + uy * uv6[:, 3] + w2 * uv6[:, 5],
                ],
                -1,
            ).astype(F)
            tex_val = sc.sample_tex(tex_e, uvh)
            rad_e = np.where((tex_e >= 0)[:, None], rad_e * tex_val[:, :3], rad_e)
        radiance = np.where(pick_a[:, None], radiance, rad_e).astype(F)
        ldir = np.where(pick_a[:, None], ldir, l)
        # verify-as-occlusion t_max: visible iff nothing closer than the
        # sampled point (== emissive.rchit's identity check)
        t_max = np.where(pick_a, t_max, dist * F(1.0 - 1e-4) - F(1e-5)).astype(F)

    # ONE merged occlusion launch for both branches, in the integrator's
    # seed order (sample_lights: strategy -> branch draws -> _shadow);
    # shadow.rahit alpha semantics consume per-BLEND-candidate RNG here
    off = np.where(dot(h.normal, ldir) >= 0, 1.0, -1.0).astype(F)
    ro = (h.pos + (off * BIAS)[:, None] * h.normal).astype(F)
    occ, seed = sc.occluded_alpha(ro, ldir, t_max, seed, mask)
    radiance = np.where((occ | ~mask)[:, None], 0, radiance)
    if has_e:
        visible = mask & ~pick_a & ~occ & np.any(radiance != 0, -1)
        pdf_e = sc.emissive_pdf(ro, ldir, F(0.0))
        pdf = np.where(pick_a, pdf, pdf_e)
        radiance = np.where((pick_a | visible)[:, None], radiance, 0).astype(F)

    got = np.any(radiance != 0, -1) & mask
    pdf = pdf / F(max(1, int(has_a) + int(has_e)))
    tv = to_tangent(h, view_world)
    tl = to_tangent(h, ldir)
    bsdf = material_bsdf(h, wavelength, tv, tl)
    mis = np.where(pick_a, 1.0, pdf / np.maximum(pdf + material_pdf(h, tv, tl), 1e-30))
    scale = mis * np.abs(dot(h.normal, ldir)) / np.maximum(pdf, 1e-30)
    contrib = radiance * bsdf * scale[:, None]
    zero = np.all(bsdf == 0, -1)
    return np.where((got & ~zero)[:, None], contrib, 0).astype(F), seed


# ---------------------------------------------------------------------------
# Full sample (raygen.rgen, canonical order: trace -> sample -> NEE)
# ---------------------------------------------------------------------------


def render_sample(tables, view_inv, proj_inv, width, height, sample_count, max_depth):
    sc = tables if isinstance(tables, OracleScene) else OracleScene(tables)
    n = width * height
    idx = np.arange(n, dtype=U)
    px = (idx % U(width)).astype(F)
    py = (idx // U(width)).astype(F)
    seed = tea(idx, U(sample_count))
    jx, s1 = rnd(seed)
    jy, s2 = rnd(s1)
    if sample_count == 0:
        jx = np.full(n, 0.5, F)
        jy = np.full(n, 0.5, F)
    else:
        seed = s2
    u = (px + jx) / F(width) * 2 - 1
    v = -((py + jy) / F(height) * 2 - 1)
    vi = np.asarray(view_inv, F)
    pi_ = np.asarray(proj_inv, F)
    ndc = np.stack([u, v, np.ones_like(u), np.ones_like(u)], -1)
    target = normalize(ndc @ pi_[:3].T)
    direction = normalize(target @ vi[:3, :3].T)
    origin = np.broadcast_to(vi[:3, 3], (n, 3)).astype(F).copy()

    value = np.zeros((n, 3), F)
    throughput = np.ones((n, 3), F)
    wavelength = np.zeros(n, F)
    mat_pdf = np.ones(n, F)
    active = np.ones(n, bool)
    preview = sample_count == 0

    for b in range(max_depth + 1):
        # material trace with any-hit alpha (hit.rahit), RNG-threaded like
        # integrator._closest (one rnd per BLEND candidate in t-order)
        (t, tri, uu, vv), seed = sc.closest_alpha(
            origin, direction, EPS, INF, active, seed
        )
        h = eval_hit(sc, origin, direction, t, tri, uu, vv)
        miss = tri < 0
        is_em = np.any(h.emissive != 0, -1)
        terminal = miss | is_em | (b == max_depth) | (preview and b == 1)
        probe_m = active & terminal & is_em & ~miss & (b != 0)
        pdf_probe = sc.emissive_pdf(origin, direction, EPS)
        weight = np.where(probe_m, mat_pdf / np.maximum(mat_pdf + pdf_probe, 1e-30), 1.0)
        value += np.where((active & terminal)[:, None], throughput * h.emissive * weight[:, None], 0)
        cont = active & ~terminal

        view = -direction
        tview = to_tangent(h, view)
        d_t, est, pdf_m, wl2, seed_m = sample_material(seed, h, wavelength, tview)
        seed = np.where(cont, seed_m, seed)
        wavelength = np.where(cont, wl2, wavelength).astype(F)
        nd = from_tangent(h, d_t)
        throughput = np.where(cont[:, None], throughput * est, throughput)
        mat_pdf = np.where(cont, pdf_m, mat_pdf).astype(F)
        alive = cont & np.any(throughput != 0, -1)
        offs = np.where(dot(h.normal, nd) >= 0, 1.0, -1.0).astype(F)
        origin = np.where(cont[:, None], h.pos + (offs * BIAS)[:, None] * h.normal, origin).astype(F)
        direction = np.where(cont[:, None], nd, direction).astype(F)

        light, seed = sample_lights(sc, h, wavelength, view, seed, alive)
        value += np.where(alive[:, None], throughput * light, 0)
        active = alive
        if not active.any():
            break
    return value


def render_image(tables, camera, width, height, spp, max_depth, start_sample=1):
    """Oracle batch render (linear radiance, no tonemap)."""
    sc = OracleScene(tables)
    camera.aspect = width / height
    vi = camera.view_inverse()
    pi_ = camera.projection_inverse()
    acc = np.zeros((width * height, 3), F)
    for s in range(start_sample, start_sample + spp):
        acc += render_sample(sc, vi, pi_, width, height, s, max_depth)
    return (acc / F(spp)).reshape(height, width, 3)
