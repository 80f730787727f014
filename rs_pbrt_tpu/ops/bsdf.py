"""BSDF evaluation / importance sampling as branchless batched kernels.

TPU-native replacement for reference src/core/reflection.rs (18 BxDFs,
Bsdf combiner), src/core/microfacet.rs and the material layer
src/core/material.rs + src/materials/*.  Instead of enum dispatch per ray,
every lane carries a material tag + parameter vector; each lobe family is
evaluated vectorized for all lanes and the result selected by mask
(wavefront-style "execute all, select one" — profitable because the lobe
math is cheap VPU code; sorting by material comes later for the expensive
exotic lobes).

Convention: shading-local frame with z = shading normal; wo, wi are unit
vectors in that frame.  Reflection vs transmission sidedness is decided
against the GEOMETRIC normal by the caller (reference reflection.rs:355-368
Bsdf::f) via the `reflect` flag.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..scene import arrays as sa
from ..utils import vecmath as vm
from .sampling import concentric_sample_disk, cosine_sample_hemisphere

INV_PI = vm.INV_PI


# ---- local-frame helpers (reference reflection.rs cos_theta etc.) ----

def cos_theta(w):
    return w[..., 2]


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def cos2_theta(w):
    return w[..., 2] * w[..., 2]


def sin2_theta(w):
    return jnp.maximum(0.0, 1.0 - cos2_theta(w))


def tan2_theta(w):
    return sin2_theta(w) / jnp.maximum(cos2_theta(w), 1e-20)


def cos_phi(w):
    # floored sqrt: its backward at exactly 0 is inf, which turns a
    # 0-cotangent into NaN in reverse-mode geometry gradients
    s = jnp.sqrt(jnp.maximum(sin2_theta(w), 1e-24))
    return jnp.where(sin2_theta(w) == 0.0, 1.0, jnp.clip(w[..., 0] / s, -1, 1))


def sin_phi(w):
    s = jnp.sqrt(jnp.maximum(sin2_theta(w), 1e-24))
    return jnp.where(sin2_theta(w) == 0.0, 0.0, jnp.clip(w[..., 1] / s, -1, 1))


def same_hemisphere(a, b):
    return a[..., 2] * b[..., 2] > 0.0


def reflect_dir(wo, n):
    return -wo + 2.0 * vm.dot(wo, n)[..., None] * n


def refract_dir(wi, n, eta):
    """Returns (ok, wt) (reference geometry.rs refract)."""
    cos_i = vm.dot(n, wi)
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta * eta * sin2_i
    ok = sin2_t < 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wt = eta[..., None] * -wi + (eta * cos_i - cos_t)[..., None] * n
    return ok, wt


# ---- Fresnel (reference reflection.rs:636-770) ----

def fr_dielectric(cos_i, eta_i, eta_t):
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    entering = cos_i > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    ci = jnp.abs(cos_i)
    sin_t = ei / et * jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
    tir = sin_t >= 1.0
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
    r_parl = (et * ci - ei * ct) / jnp.maximum(et * ci + ei * ct, 1e-20)
    r_perp = (ei * ci - et * ct) / jnp.maximum(ei * ci + et * ct, 1e-20)
    fr = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, fr)


def fr_conductor(cos_i, eta_i, eta_t, k):
    """rgb Fresnel for conductors (reference reflection.rs fr_conductor).

    cos_i: (...,); eta_i/eta_t/k: (...,3).  Returns (...,3).
    """
    ci = jnp.clip(jnp.abs(cos_i), -1.0, 1.0)[..., None]
    eta = eta_t / eta_i
    etak = k / eta_i
    cos2 = ci * ci
    sin2 = 1.0 - cos2
    eta2 = eta * eta
    etak2 = etak * etak
    t0 = eta2 - etak2 - sin2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * etak2, 0.0))
    t1 = a2b2 + cos2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * ci
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
    t3 = cos2 * a2b2 + sin2 * sin2
    t4 = t2 * sin2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
    return 0.5 * (rp + rs)


# ---- Oren-Nayar (reference reflection.rs OrenNayar) ----

def oren_nayar_f(r, sigma_deg, wo, wi):
    sigma = jnp.deg2rad(sigma_deg)
    sigma2 = sigma * sigma
    a = 1.0 - sigma2 / (2.0 * (sigma2 + 0.33))
    b = 0.45 * sigma2 / (sigma2 + 0.09)
    # floored sqrts: backward at exactly 0 is inf (NaN via 0-cotangent)
    sin_ti = jnp.sqrt(jnp.maximum(sin2_theta(wi), 1e-24))
    sin_to = jnp.sqrt(jnp.maximum(sin2_theta(wo), 1e-24))
    cos_diff = cos_phi(wi) * cos_phi(wo) + sin_phi(wi) * sin_phi(wo)
    max_cos = jnp.where((sin_ti > 1e-4) & (sin_to > 1e-4), jnp.maximum(cos_diff, 0.0), 0.0)
    aci, aco = abs_cos_theta(wi), abs_cos_theta(wo)
    sin_a = jnp.where(aci > aco, sin_to, sin_ti)
    tan_b = jnp.where(aci > aco, sin_ti / jnp.maximum(aci, 1e-7), sin_to / jnp.maximum(aco, 1e-7))
    return r * (INV_PI * (a + b * max_cos * sin_a * tan_b))[..., None]


# ---- Trowbridge-Reitz / GGX microfacet (reference microfacet.rs) ----

def tr_roughness_to_alpha(roughness):
    """reference microfacet.rs:243."""
    x = jnp.log(jnp.maximum(roughness, 1e-3))
    return (
        1.62142
        + 0.819955 * x
        + 0.1734 * x * x
        + 0.0171201 * x**3
        + 0.000640711 * x**4
    )


def tr_d(wh, ax, ay):
    t2 = tan2_theta(wh)
    c4 = cos2_theta(wh) ** 2
    e = (cos_phi(wh) ** 2 / jnp.maximum(ax * ax, 1e-12)
         + sin_phi(wh) ** 2 / jnp.maximum(ay * ay, 1e-12)) * t2
    d = 1.0 / (vm.PI * ax * ay * c4 * (1.0 + e) ** 2)
    return jnp.where(jnp.isfinite(t2) & (c4 > 1e-16), d, 0.0)


def tr_lambda(w, ax, ay):
    abs_tan = jnp.sqrt(jnp.maximum(tan2_theta(w), 0.0))
    alpha = jnp.sqrt(
        jnp.maximum(cos_phi(w) ** 2 * ax * ax + sin_phi(w) ** 2 * ay * ay, 1e-12)
    )
    a2t2 = (alpha * abs_tan) ** 2
    lam = (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0
    return jnp.where(jnp.isfinite(abs_tan), lam, 0.0)


def tr_g1(w, ax, ay):
    return 1.0 / (1.0 + tr_lambda(w, ax, ay))


def tr_g(wo, wi, ax, ay):
    return 1.0 / (1.0 + tr_lambda(wo, ax, ay) + tr_lambda(wi, ax, ay))


def tr_sample_wh(wo, u, ax, ay):
    """Visible-normal GGX sampling (Heitz 2018 VNDF), distribution-equal to
    reference microfacet.rs sample_wh with sample_visible_area=true."""
    sign = jnp.sign(jnp.where(cos_theta(wo) == 0.0, 1.0, cos_theta(wo)))
    wo_s = wo * sign[..., None]
    vh = vm.normalize(jnp.stack(
        [ax * wo_s[..., 0], ay * wo_s[..., 1], wo_s[..., 2]], axis=-1))
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 1e-14)[..., None],
        jnp.stack([-vh[..., 1] * inv_len, vh[..., 0] * inv_len, jnp.zeros_like(inv_len)], -1),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], wo.dtype), wo.shape),
    )
    t2 = vm.cross(vh, t1)
    d = concentric_sample_disk(u)
    p1 = d[..., 0]
    p2 = d[..., 1]
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * vh
    wh = vm.normalize(jnp.stack(
        [ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(nh[..., 2], 1e-6)], axis=-1))
    return wh * sign[..., None]


def tr_pdf_wh(wo, wh, ax, ay):
    """pdf of sample_wh (visible normals): D * G1 * |wo.wh| / |cos wo|."""
    return (
        tr_d(wh, ax, ay)
        * tr_g1(wo, ax, ay)
        * vm.absdot(wo, wh)
        / jnp.maximum(abs_cos_theta(wo), 1e-7)
    )


# ---- Beckmann distribution (reference microfacet.rs:23 Beckmann*) ----
# Available as the alternative MicrofacetDistribution (the reference's
# materials default to TrowbridgeReitz; mixmat machinery can carry Beckmann).

def bk_roughness_to_alpha(roughness):
    """Identical fit to the TR remap (reference microfacet.rs:81)."""
    return tr_roughness_to_alpha(roughness)


def bk_d(wh, ax, ay):
    """Beckmann NDF (reference microfacet.rs BeckmannDistribution::d)."""
    t2 = tan2_theta(wh)
    c4 = cos2_theta(wh) ** 2
    e = jnp.exp(
        -t2 * (cos_phi(wh) ** 2 / jnp.maximum(ax * ax, 1e-12)
               + sin_phi(wh) ** 2 / jnp.maximum(ay * ay, 1e-12))
    )
    d = e / (vm.PI * ax * ay * jnp.maximum(c4, 1e-16))
    return jnp.where(jnp.isfinite(t2) & (c4 > 1e-16), d, 0.0)


def bk_lambda(w, ax, ay):
    """Beckmann Lambda via the rational approximation (microfacet.rs)."""
    abs_tan = jnp.sqrt(jnp.maximum(tan2_theta(w), 0.0))
    alpha = jnp.sqrt(
        jnp.maximum(cos_phi(w) ** 2 * ax * ax + sin_phi(w) ** 2 * ay * ay, 1e-12)
    )
    a = 1.0 / jnp.maximum(alpha * abs_tan, 1e-12)
    lam = (1.0 - 1.259 * a + 0.396 * a * a) / (3.535 * a + 2.181 * a * a)
    lam = jnp.where(a >= 1.6, 0.0, lam)
    return jnp.where(jnp.isfinite(abs_tan), lam, 0.0)


def bk_g1(w, ax, ay):
    return 1.0 / (1.0 + bk_lambda(w, ax, ay))


def bk_g(wo, wi, ax, ay):
    return 1.0 / (1.0 + bk_lambda(wo, ax, ay) + bk_lambda(wi, ax, ay))


def bk_sample_wh(wo, u, ax, ay):
    """Full-distribution Beckmann wh sampling (the non-visible-area branch
    of microfacet.rs sample_wh — anisotropic log-sampling)."""
    logs = jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-20))
    phi = jnp.arctan(ay / ax * jnp.tan(2.0 * vm.PI * u[..., 1] + 0.5 * vm.PI))
    phi = jnp.where(u[..., 1] > 0.5, phi + vm.PI, phi)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    t2 = -logs / jnp.maximum(cp * cp / (ax * ax) + sp * sp / (ay * ay), 1e-12)
    ct = 1.0 / jnp.sqrt(1.0 + t2)
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    wh = jnp.stack([st * cp, st * sp, ct], axis=-1)
    # flip into wo's hemisphere
    flip = ~same_hemisphere(wo, wh)
    return jnp.where(flip[..., None], -wh, wh)


def bk_pdf_wh(wo, wh, ax, ay):
    """pdf of the full-distribution sampler: D * |cos wh|."""
    return bk_d(wh, ax, ay) * abs_cos_theta(wh)


# ---- per-lane BSDF parameter block ----

N_LOBE_KINDS = 19
(
    LOBE_NONE,
    LOBE_LAMBERT,
    LOBE_ORENNAYAR,
    LOBE_SPEC_REFL,
    LOBE_FRESNEL_SPEC,
    LOBE_MICROFACET_REFL,
    LOBE_FRESNEL_BLEND,
    LOBE_MICROFACET_REFL_COND,
    LOBE_DISNEY_DIFFUSE,
    LOBE_DISNEY_GLOSS,
    LOBE_HAIR,
    LOBE_FOURIER,
    LOBE_LAMBERT_TRANS,
    LOBE_MICROFACET_TRANS,  # reflection.rs:1211 MicrofacetTransmission
    LOBE_SPEC_TRANS,  # reflection.rs SpecularTransmission (eta from b.eta)
    LOBE_SPEC_TRANS_PASS,  # SpecularTransmission(t, 1, 1): uber opacity
    LOBE_SPEC_REFL_FR,  # SpecularReflection with dielectric fresnel (uber kr)
    LOBE_DISNEY_CLEARCOAT,  # disney.rs DisneyClearcoat (GTR1)
    LOBE_DISNEY_SHEEN,  # disney.rs DisneySheen (Schlick-weight grazing lobe)
) = range(N_LOBE_KINDS)

# transmission-side lobes (used by sidedness masks)
_TRANS_LOBES = (LOBE_LAMBERT_TRANS, LOBE_MICROFACET_TRANS, LOBE_SPEC_TRANS,
                LOBE_SPEC_TRANS_PASS)


# ---- hair BSDF (reference materials/hair.rs:178-790, Marschner/Chiang) ----
# Local frame convention matches the BSDF frame: x = fiber tangent (dpdu),
# so wo.x = sin(theta_o); azimuth phi = atan2(w.z, w.y).

HAIR_P_MAX = 3
SQRT_PI_OVER_8 = 0.626657069


def _safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def _hair_i0(x):
    """Modified Bessel I0 via the reference's 10-term series (hair.rs:679)."""
    val = jnp.zeros_like(x)
    x2i = jnp.ones_like(x)
    ifact = 1.0
    i4 = 1.0
    for i in range(10):
        if i > 1:
            ifact *= i
        val = val + x2i / (i4 * ifact * ifact)
        x2i = x2i * x * x
        i4 *= 4.0
    return val


def _hair_log_i0(x):
    big = x + 0.5 * (-jnp.log(2.0 * jnp.pi) + jnp.log(1.0 / jnp.maximum(x, 1e-12)) + 1.0 / (8.0 * jnp.maximum(x, 1e-12)))
    return jnp.where(x > 12.0, big, jnp.log(jnp.maximum(_hair_i0(x), 1e-37)))


def _hair_mp(cos_ti, cos_to, sin_ti, sin_to, v):
    """Longitudinal scattering Mp (hair.rs:660)."""
    a = cos_ti * cos_to / v
    b = sin_ti * sin_to / v
    small = jnp.exp(_hair_log_i0(a) - b - 1.0 / v + 0.6931 + jnp.log(1.0 / (2.0 * v)))
    large = jnp.exp(-b) * _hair_i0(a) / (jnp.sinh(1.0 / v) * 2.0 * v)
    return jnp.where(v <= 0.1, small, large)


def _hair_derived(beta_m, beta_n, alpha_deg):
    """Per-lane derived hair parameters (hair.rs:196-268): longitudinal
    variances v[0..3], azimuthal scale s, scale-tilt rotation tables."""
    bm2 = beta_m * beta_m
    bm4 = bm2 * bm2
    bm20 = bm4 * bm4 * bm4 * bm4 * bm4
    f = 0.726 * beta_m + 0.812 * bm2 + 3.7 * bm20
    v0 = f * f
    v = [v0, 0.25 * v0, 4.0 * v0, 4.0 * v0]
    v = [jnp.maximum(x, 1e-7) for x in v]
    bn2 = beta_n * beta_n
    bn4 = bn2 * bn2
    bn22 = bn4 * bn4 * bn4 * bn4 * bn4 * bn2
    s = SQRT_PI_OVER_8 * (0.265 * beta_n + 1.194 * bn2 + 5.372 * bn22)
    s = jnp.maximum(s, 1e-5)
    alpha = alpha_deg * (jnp.pi / 180.0)
    sin2k = [jnp.sin(alpha)]
    cos2k = [_safe_sqrt(1.0 - sin2k[0] ** 2)]
    for _ in range(2):
        sin2k.append(2.0 * cos2k[-1] * sin2k[-1])
        cos2k.append(cos2k[-1] ** 2 - sin2k[-1] ** 2)
    return v, s, sin2k, cos2k


def _hair_common(b, wo):
    sin_to = wo[..., 0]
    cos_to = _safe_sqrt(1.0 - sin_to * sin_to)
    phi_o = jnp.arctan2(wo[..., 2], wo[..., 1])
    sin_tt = sin_to / b.eta
    cos_tt = _safe_sqrt(1.0 - sin_tt * sin_tt)
    etap = _safe_sqrt(b.eta * b.eta - sin_to * sin_to) / jnp.maximum(cos_to, 1e-7)
    sin_gt = b.h / etap
    cos_gt = _safe_sqrt(1.0 - sin_gt * sin_gt)
    gamma_t = jnp.arcsin(jnp.clip(sin_gt, -1.0, 1.0))
    gamma_o = jnp.arcsin(jnp.clip(b.h, -1.0, 1.0))
    # single-pass transmittance through the fiber (hair.rs:358); sigma_a in r0
    t = jnp.exp(-b.r0 * (2.0 * cos_gt / jnp.maximum(cos_tt, 1e-7))[..., None])
    return sin_to, cos_to, phi_o, gamma_o, gamma_t, t


def _hair_ap(cos_to, eta, h, t):
    """Attenuations A_p, p=0..3 (hair.rs:707)."""
    cos_go = _safe_sqrt(1.0 - h * h)
    f = fr_dielectric(cos_to * cos_go, 1.0, eta)[..., None]
    ap = [jnp.broadcast_to(f, t.shape)]
    ap.append(t * (1.0 - f) ** 2)
    ap.append(ap[1] * t * f)
    ap.append(ap[2] * t * f / jnp.maximum(1.0 - t * f, 1e-4))
    return ap


def _hair_np(phi, p, s, gamma_o, gamma_t):
    """Azimuthal scattering Np: trimmed logistic around phi_fn (hair.rs:752)."""
    dphi = phi - (2.0 * p * gamma_t - 2.0 * gamma_o + p * jnp.pi)
    dphi = jnp.mod(dphi + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    x = jnp.abs(dphi)
    e = jnp.exp(-x / s)
    logistic = e / (s * (1.0 + e) ** 2)
    cdf = lambda y: 1.0 / (1.0 + jnp.exp(-y / s))
    return logistic / (cdf(jnp.pi) - cdf(-jnp.pi))


def _hair_tilt(p, sin_to, cos_to, sin2k, cos2k):
    """Scale-tilt rotated (sin,cos)theta_o for lobe p (hair.rs:363-387)."""
    if p == 0:
        st = sin_to * cos2k[1] - cos_to * sin2k[1]
        ct = cos_to * cos2k[1] + sin_to * sin2k[1]
    elif p == 1:
        st = sin_to * cos2k[0] + cos_to * sin2k[0]
        ct = cos_to * cos2k[0] - sin_to * sin2k[0]
    elif p == 2:
        st = sin_to * cos2k[2] + cos_to * sin2k[2]
        ct = cos_to * cos2k[2] - sin_to * sin2k[2]
    else:
        return sin_to, cos_to
    return st, jnp.abs(ct)


def hair_f(b, wo, wi):
    """HairBSDF::f (hair.rs:325-417).  sigma_a lives in b.r0, beta_m in
    b.ax, beta_n in b.ay, alpha(deg) in b.sigma, offset h in b.h."""
    v, s, sin2k, cos2k = _hair_derived(b.ax, b.ay, b.sigma)
    sin_to, cos_to, phi_o, gamma_o, gamma_t, t = _hair_common(b, wo)
    sin_ti = wi[..., 0]
    cos_ti = _safe_sqrt(1.0 - sin_ti * sin_ti)
    phi_i = jnp.arctan2(wi[..., 2], wi[..., 1])
    phi = phi_i - phi_o
    ap = _hair_ap(cos_to, b.eta, b.h, t)
    fsum = jnp.zeros_like(t)
    for p in range(HAIR_P_MAX):
        st, ct = _hair_tilt(p, sin_to, cos_to, sin2k, cos2k)
        mp = _hair_mp(cos_ti, ct, sin_ti, st, v[p])
        np_ = _hair_np(phi, p, s, gamma_o, gamma_t)
        fsum = fsum + ap[p] * (mp * np_)[..., None]
    mp_last = _hair_mp(cos_ti, cos_to, sin_ti, sin_to, v[HAIR_P_MAX])
    fsum = fsum + ap[HAIR_P_MAX] * (mp_last / (2.0 * jnp.pi))[..., None]
    aci = abs_cos_theta(wi)
    fsum = jnp.where(aci[..., None] > 0.0, fsum / jnp.maximum(aci, 1e-7)[..., None], fsum)
    return jnp.nan_to_num(fsum, nan=0.0, posinf=0.0)


def _hair_ap_pdf(b, cos_to, t):
    ap = _hair_ap(cos_to, b.eta, b.h, t)
    y = lambda c: 0.212671 * c[..., 0] + 0.715160 * c[..., 1] + 0.072169 * c[..., 2]
    ys = [y(a) for a in ap]
    total = jnp.maximum(sum(ys), 1e-12)
    return [yy / total for yy in ys]


def hair_pdf(b, wo, wi):
    """HairBSDF::pdf (hair.rs:553-622)."""
    v, s, sin2k, cos2k = _hair_derived(b.ax, b.ay, b.sigma)
    sin_to, cos_to, phi_o, gamma_o, gamma_t, t = _hair_common(b, wo)
    sin_ti = wi[..., 0]
    cos_ti = _safe_sqrt(1.0 - sin_ti * sin_ti)
    phi_i = jnp.arctan2(wi[..., 2], wi[..., 1])
    phi = phi_i - phi_o
    ap_pdf = _hair_ap_pdf(b, cos_to, t)
    pdf = jnp.zeros_like(cos_to)
    for p in range(HAIR_P_MAX):
        st, ct = _hair_tilt(p, sin_to, cos_to, sin2k, cos2k)
        pdf = pdf + ap_pdf[p] * _hair_mp(cos_ti, ct, sin_ti, st, v[p]) * _hair_np(
            phi, p, s, gamma_o, gamma_t
        )
    pdf = pdf + ap_pdf[HAIR_P_MAX] * _hair_mp(
        cos_ti, cos_to, sin_ti, sin_to, v[HAIR_P_MAX]
    ) * (1.0 / (2.0 * jnp.pi))
    return jnp.nan_to_num(pdf, nan=0.0, posinf=0.0)


def _compact_1_by_1(x):
    x = x & jnp.uint32(0x55555555)
    x = (x ^ (x >> 1)) & jnp.uint32(0x33333333)
    x = (x ^ (x >> 2)) & jnp.uint32(0x0F0F0F0F)
    x = (x ^ (x >> 4)) & jnp.uint32(0x00FF00FF)
    x = (x ^ (x >> 8)) & jnp.uint32(0x0000FFFF)
    return x


def _demux_float(f):
    """Split one uniform into two by bit de-interleave (hair.rs:647).
    The 32-bit fixed-point value is assembled from two 16-bit halves so no
    f32->u32 conversion exceeds 2^16 (safe without x64 and on TPU)."""
    f = jnp.clip(f, 0.0, 0.99999994)
    hi16 = jnp.floor(f * 65536.0)
    lo16 = jnp.floor((f * 65536.0 - hi16) * 65536.0)
    v = (hi16.astype(jnp.uint32) << 16) | jnp.minimum(lo16, 65535.0).astype(jnp.uint32)
    a = _compact_1_by_1(v).astype(jnp.float32) / np.float32(1 << 16)
    b = _compact_1_by_1(v >> 1).astype(jnp.float32) / np.float32(1 << 16)
    return a, b


def hair_sample(b, wo, u2):
    """HairBSDF::sample_f (hair.rs:418-552): returns (wi, pdf)."""
    v, s, sin2k, cos2k = _hair_derived(b.ax, b.ay, b.sigma)
    sin_to, cos_to, phi_o, gamma_o, gamma_t, t = _hair_common(b, wo)
    u0x, u0y = _demux_float(u2[..., 0])
    u1x, u1y = _demux_float(u2[..., 1])
    ap_pdf = _hair_ap_pdf(b, cos_to, t)

    # discrete lobe choice p by ap_pdf (hair.rs:439-446)
    c0 = ap_pdf[0]
    c1 = c0 + ap_pdf[1]
    c2 = c1 + ap_pdf[2]
    p_idx = (
        (u0x >= c0).astype(jnp.int32)
        + (u0x >= c1).astype(jnp.int32)
        + (u0x >= c2).astype(jnp.int32)
    )
    u0x_rem = u0x - jnp.where(p_idx >= 1, c0 * 0 + ap_pdf[0], 0.0)
    u0x_rem = u0x_rem - jnp.where(p_idx >= 2, ap_pdf[1], 0.0)
    u0x_rem = u0x_rem - jnp.where(p_idx >= 3, ap_pdf[2], 0.0)

    # tilted angles for the chosen p
    st_all, ct_all = [], []
    for p in range(HAIR_P_MAX + 1):
        st, ct = _hair_tilt(p, sin_to, cos_to, sin2k, cos2k)
        st_all.append(st)
        ct_all.append(ct)
    stack = lambda xs: jnp.stack(xs, -1)
    pick = lambda xs: jnp.take_along_axis(stack(xs), p_idx[..., None], -1)[..., 0]
    sin_top = pick(st_all)
    cos_top = pick(ct_all)
    vp = pick(v)

    # longitudinal sample (hair.rs:463-477)
    u1x = jnp.maximum(u1x, 1e-5)
    cos_theta = 1.0 + vp * jnp.log(u1x + (1.0 - u1x) * jnp.exp(-2.0 / vp))
    sin_theta = _safe_sqrt(1.0 - cos_theta * cos_theta)
    cos_phi_l = jnp.cos(2.0 * jnp.pi * u1y)
    sin_ti = -cos_theta * sin_top + sin_theta * cos_phi_l * cos_top
    cos_ti = _safe_sqrt(1.0 - sin_ti * sin_ti)

    # azimuthal sample (hair.rs:479-491): trimmed-logistic around phi_fn
    k = 1.0 / (1.0 + jnp.exp(-jnp.pi / s)) - 1.0 / (1.0 + jnp.exp(jnp.pi / s))
    cdf_a = 1.0 / (1.0 + jnp.exp(jnp.pi / s))
    x = -s * jnp.log(1.0 / jnp.clip(u0y * k + cdf_a, 1e-7, 1.0 - 1e-7) - 1.0)
    x = jnp.clip(jnp.nan_to_num(x, nan=0.0), -jnp.pi, jnp.pi)
    pf = 2.0 * p_idx.astype(jnp.float32) * gamma_t - 2.0 * gamma_o + p_idx * jnp.pi
    dphi = jnp.where(p_idx < HAIR_P_MAX, pf + x, 2.0 * jnp.pi * u0y)
    phi_i = phi_o + dphi
    wi = jnp.stack(
        [sin_ti, cos_ti * jnp.cos(phi_i), cos_ti * jnp.sin(phi_i)], axis=-1
    )

    # pdf over all lobes (hair.rs:500-546) == hair_pdf(b, wo, wi)
    pdf = jnp.zeros_like(cos_to)
    for p in range(HAIR_P_MAX):
        pdf = pdf + ap_pdf[p] * _hair_mp(cos_ti, ct_all[p], sin_ti, st_all[p], v[p]) * _hair_np(
            dphi, p, s, gamma_o, gamma_t
        )
    pdf = pdf + ap_pdf[HAIR_P_MAX] * _hair_mp(
        cos_ti, cos_to, sin_ti, sin_to, v[HAIR_P_MAX]
    ) * (1.0 / (2.0 * jnp.pi))
    return wi, jnp.nan_to_num(pdf, nan=0.0, posinf=0.0)


def _pow5(v):
    return (v * v) * (v * v) * v


def disney_diffuse_f(base, sigma_extra, wo, wi, flatness=None):
    """Disney diffuse + retro-reflection (reference materials/disney.rs
    DisneyDiffuse/DisneyRetro; sigma_extra carries roughness for retro).
    flatness: optional (N,) thin-mode blend toward the Hanrahan-Krueger
    fake-subsurface term (disney.rs DisneyFakeSS; 0 = plain diffuse)."""
    wh = wi + wo
    wh_ok = jnp.any(wh != 0.0, axis=-1)
    wh_n = vm.normalize(wh)
    cos_d = vm.absdot(wi, wh_n)
    fl = _pow5(1.0 - abs_cos_theta(wi))
    fv = _pow5(1.0 - abs_cos_theta(wo))
    rough = sigma_extra
    rr = 2.0 * rough * cos_d * cos_d
    diffuse = (1.0 - 0.5 * fl) * (1.0 - 0.5 * fv)
    retro = rr * (fl + fv + fl * fv * (rr - 1.0))
    if flatness is not None:
        # Hanrahan-Krueger approximation (disney.rs DisneyFakeSS): Fss90
        # from the half-angle, 1.25 scale to match diffuse albedo
        fss90 = cos_d * cos_d * rough
        fss = vm.lerp(fl, 1.0, fss90) * vm.lerp(fv, 1.0, fss90)
        denom = jnp.maximum(abs_cos_theta(wi) + abs_cos_theta(wo), 1e-6)
        ss = 1.25 * (fss * (1.0 / denom - 0.5) + 0.5)
        diffuse = vm.lerp(flatness, diffuse, ss)
    return base * (INV_PI * (diffuse + retro) * jnp.where(wh_ok, 1.0, 0.0))[..., None]


def disney_gloss_f(f0, ax, ay, wo, wi):
    """Metallic GGX lobe with Schlick fresnel toward f0 (reference
    disney.rs microfacet + DisneyFresnel)."""
    wh = wi + wo
    wh_ok = jnp.any(wh != 0.0, axis=-1) & (abs_cos_theta(wi) > 0) & (abs_cos_theta(wo) > 0)
    wh_n = vm.normalize(wh)
    fr = f0 + _pow5(1.0 - vm.absdot(wi, wh_n))[..., None] * (1.0 - f0)
    d_val = tr_d(wh_n, ax, ay)
    g_val = tr_g(wo, wi, ax, ay)
    denom = 4.0 * abs_cos_theta(wi) * abs_cos_theta(wo)
    return jnp.where(
        (wh_ok & (denom > 0))[..., None],
        fr * (d_val * g_val / jnp.maximum(denom, 1e-12))[..., None],
        0.0,
    )


from flax import struct


@struct.dataclass
class Bsdf:
    """Flattened per-lane 2-lobe BSDF built from the material tables.

    The reference builds up to 8 BxDFs per hit (reflection.rs:280); the 13
    materials in practice use 1 diffuse-ish + 1 glossy/specular lobe (+
    transmission).  We carry two lobe slots; materials needing more use the
    combined closed forms (uber folds kr into spec slot etc.).
    enable_hair is a STATIC trace-time gate (non-hair scenes skip the
    Bessel-series math); fou is the FourierTable pytree or None."""

    kind0: jnp.ndarray  # (N,) lobe kind tags
    kind1: jnp.ndarray
    r0: jnp.ndarray  # (N,3) lobe-0 color (kd / kr)
    r1: jnp.ndarray  # (N,3) lobe-1 color (ks / kt)
    ax: jnp.ndarray  # (N,) anisotropic alphas for glossy lobe
    ay: jnp.ndarray
    eta: jnp.ndarray  # (N,) ior (dielectrics; 1 otherwise)
    sigma: jnp.ndarray  # (N,) oren-nayar sigma degrees
    eta3: jnp.ndarray  # (N,3) conductor eta
    k3: jnp.ndarray  # (N,3) conductor k
    kt: jnp.ndarray  # (N,3) transmission color (fresnel-spec lobe)
    h: jnp.ndarray  # (N,) hair fiber offset in [-1,1] (= -1 + 2*uv.y)
    enable_hair: bool = struct.field(pytree_node=False, default=True)
    fou: object = None
    # STATIC bitmask of lobe kinds possibly present (from the scene's
    # material-type mask) — absent families compile to nothing
    lobe_mask: int = struct.field(pytree_node=False, default=-1)
    # slots 2/3 (None unless the material set needs >2 lobes: uber's 4-lobe
    # stack, rough translucent's 4, mix's two scaled children — the
    # reference carries up to 8 BxDFs, reflection.rs:280)
    kind2: object = None  # (N,) or None
    kind3: object = None
    r2: object = None  # (N,3)
    r3: object = None
    # per-slot parameter overrides for slots 2/3 (mix: material B's
    # roughness/eta/sigma differ from material A's in slots 0/1)
    ax2: object = None
    ay2: object = None
    eta2: object = None
    sigma2: object = None
    # STATIC: use the Beckmann distribution for microfacet lobes
    use_beckmann: bool = struct.field(pytree_node=False, default=False)
    # slots 4/5 (None unless the material set contains UBER): the FULL
    # uber stack is kd + ks + kr + kt + opacity-pass = 5 simultaneous
    # lobes (reference uber.rs:142-257; Bsdf holds up to 8,
    # reflection.rs:280) — slots 4/5 carry the extra specular lobes with
    # the BASE eta/roughness (no per-slot overrides needed)
    kind4: object = None
    kind5: object = None
    r4: object = None  # (N,3)
    r5: object = None


def make_bsdf_at(scene, it, width=None):
    """Build the per-lane BSDF at hits, resolving textured parameter slots
    (replaces Material::compute_scattering_functions + per-material texture
    evaluate calls, material.rs:63 + src/materials/*).  width: optional
    (N,) texture-space footprint from ray differentials
    (ops/differentials.py) for mip filtering."""
    return make_bsdf_from_mat(scene, it.mat, it.uv, it.p, width=width)


def make_bsdf_from_mat(scene, mat_idx, uv=None, p_hit=None, width=None):
    """BSDF from material indices; uv/p_hit enable texture overrides (the
    BDPT/SPPM vertex-reevaluation path passes uv=None: mix materials still
    resolve, textures fall back to their base params)."""
    from ..scene import arrays as sa
    from . import gathers as gx

    ma = gx.take_rows(scene.mat_attr, mat_idx)  # one-hot matmul
    mat_type = gx.coli(ma, sa.MA_TYPE)
    params = ma[..., sa.MA_PARAMS : sa.MA_PARAMS + sa.N_MAT_PARAMS]
    # gate on the slot bitmask alone: requiring tex_type rows > 1 silently
    # disabled ALL texture overrides in single-texture scenes (the no-tex
    # dummy table also has one row, but its slot_mask is 0)
    if uv is not None and scene.tex_slot_mask:
        from . import texture as tx

        mt = jnp.round(ma[..., sa.MA_TEX : sa.MA_TEX + sa.N_TEX_SLOTS]).astype(jnp.int32)

        def override3(params, slot, col):
            tid = mt[:, slot]
            val = tx.eval_texture(scene, tid, uv, p_hit, width=width)
            cur = params[:, col : col + 3]
            new = jnp.where((tid >= 0)[:, None], val, cur)
            return params.at[:, col : col + 3].set(new)

        def override1(params, slot, col):
            tid = mt[:, slot]
            val = tx.eval_texture(scene, tid, uv, p_hit, width=width)[..., 0]
            new = jnp.where(tid >= 0, val, params[:, col])
            return params.at[:, col].set(new)

        # the scene's static slot bitmask prunes unbound slots at trace
        # time (each override drags a full texture eval into the graph)
        sm = scene.tex_slot_mask
        if sm & (1 << sa.TEX_SLOT_KD):
            params = override3(params, sa.TEX_SLOT_KD, sa.MP_KD)
        if sm & (1 << sa.TEX_SLOT_KS):
            params = override3(params, sa.TEX_SLOT_KS, sa.MP_KS)
        if sm & (1 << sa.TEX_SLOT_KR):
            params = override3(params, sa.TEX_SLOT_KR, sa.MP_KR)
        if sm & (1 << sa.TEX_SLOT_KT):
            params = override3(params, sa.TEX_SLOT_KT, sa.MP_KT)
        if sm & (1 << sa.TEX_SLOT_SIGMA):
            params = override1(params, sa.TEX_SLOT_SIGMA, sa.MP_SIGMA)
        if sm & (1 << sa.TEX_SLOT_ROUGH_U):
            params = override1(params, sa.TEX_SLOT_ROUGH_U, sa.MP_ROUGH_U)
        if sm & (1 << sa.TEX_SLOT_ROUGH_V):
            params = override1(params, sa.TEX_SLOT_ROUGH_V, sa.MP_ROUGH_V)
        if sm & (1 << sa.TEX_SLOT_OPACITY):
            params = override3(params, sa.TEX_SLOT_OPACITY, sa.MP_OPACITY)
    fou = None
    if scene.has_fourier:
        from .fourier_bsdf import FourierTable

        fou = FourierTable(
            scene.fou_mu, scene.fou_dense, scene.fou_m, scene.fou_cdf,
            scene.fou_a0, scene.fou_eta, jnp.int32(3),
        )

    if scene.mat_kind_mask & (1 << sa.MIXMAT):
        # MIX (reference materials/mixmat.rs): true per-bxdf scaling —
        # child A's two lobes in slots 0/1 scaled by amt, child B's in
        # slots 2/3 scaled by (1-amt), with B's microfacet/eta params in
        # the slot-2/3 overrides.  (Children are limited to their primary
        # two lobes; the reference unions up to 8 BxDFs.)
        is_mix = mat_type == sa.MIXMAT
        amt = params[:, sa.MP_KD : sa.MP_KD + 3]
        aid = jnp.round(params[:, sa.MP_KS]).astype(jnp.int32)
        bid = jnp.round(params[:, sa.MP_KS + 1]).astype(jnp.int32)
        maA = gx.take_rows(scene.mat_attr, jnp.where(is_mix, aid, mat_idx))
        maB = gx.take_rows(scene.mat_attr, jnp.where(is_mix, bid, mat_idx))
        tA = jnp.where(is_mix, gx.coli(maA, sa.MA_TYPE), mat_type)
        pA = jnp.where(
            is_mix[:, None],
            maA[..., sa.MA_PARAMS : sa.MA_PARAMS + sa.N_MAT_PARAMS], params,
        )
        tB = gx.coli(maB, sa.MA_TYPE)
        pB = maB[..., sa.MA_PARAMS : sa.MA_PARAMS + sa.N_MAT_PARAMS]
        bA = make_bsdf(tA, pA, uv=uv, enable_hair=scene.has_hair, fou=fou,
                       mat_mask=scene.mat_kind_mask)
        bB = make_bsdf(tB, pB, uv=uv, enable_hair=scene.has_hair, fou=fou,
                       mat_mask=scene.mat_kind_mask)
        mix1 = is_mix[:, None]
        one_m = 1.0 - amt

        def pick2(cur, bval):
            if cur is None:
                return None
            return jnp.where(is_mix, bval, cur)

        return bA.replace(
            r0=jnp.where(mix1, bA.r0 * amt, bA.r0),
            r1=jnp.where(mix1, bA.r1 * amt, bA.r1),
            kind2=jnp.where(is_mix, bB.kind0, bA.kind2)
            if bA.kind2 is not None else bB.kind0,
            kind3=jnp.where(is_mix, bB.kind1, bA.kind3)
            if bA.kind3 is not None else bB.kind1,
            r2=jnp.where(mix1, bB.r0 * one_m, bA.r2)
            if bA.r2 is not None else bB.r0 * one_m,
            r3=jnp.where(mix1, bB.r1 * one_m, bA.r3)
            if bA.r3 is not None else bB.r1 * one_m,
            ax2=pick2(bA.ax2 if bA.ax2 is not None else bA.ax, bB.ax),
            ay2=pick2(bA.ay2 if bA.ay2 is not None else bA.ay, bB.ay),
            eta2=pick2(bA.eta2 if bA.eta2 is not None else bA.eta, bB.eta),
            sigma2=pick2(bA.sigma2 if bA.sigma2 is not None else bA.sigma, bB.sigma),
        )

    return make_bsdf(
        mat_type, params, uv=uv, enable_hair=scene.has_hair, fou=fou,
        mat_mask=scene.mat_kind_mask,
    )


def apply_bump(scene, it, ss, ts):
    """Bump-map shading-normal perturbation (reference material.rs:118-220).

    Finite differences of the displacement texture in uv (the reference's
    du fallback 0.0005 — no ray differentials in the wavefront), displaced
    tangents, new normal = normalize(cross(dpdu', dpdv')) kept on the
    original side.  Statically gated on the scene's bump-slot bitmask.
    Returns (ns, ss, ts)."""
    from ..scene import arrays as sa
    from . import gathers as gx
    from . import texture as tx

    if not (scene.tex_slot_mask & (1 << sa.TEX_SLOT_BUMP)):
        return it.ns, ss, ts
    ma = gx.take_rows(scene.mat_attr, it.mat)
    tid = jnp.round(ma[..., sa.MA_TEX + sa.TEX_SLOT_BUMP]).astype(jnp.int32)
    has = tid >= 0
    tid_s = jnp.maximum(tid, 0)
    du = 0.0005
    d0 = tx.eval_texture(scene, tid_s, it.uv, it.p)[..., 0]
    uv_u = it.uv + jnp.asarray([du, 0.0], jnp.float32)
    uv_v = it.uv + jnp.asarray([0.0, du], jnp.float32)
    d_u = tx.eval_texture(scene, tid_s, uv_u, it.p + ss * du)[..., 0]
    d_v = tx.eval_texture(scene, tid_s, uv_v, it.p + ts * du)[..., 0]
    dddu = (d_u - d0) / du
    dddv = (d_v - d0) / du
    dpdu_b = ss + dddu[..., None] * it.ns
    dpdv_b = ts + dddv[..., None] * it.ns
    ns_b = vm.normalize(vm.cross(dpdu_b, dpdv_b))
    ns_b = jnp.where(vm.dot(ns_b, it.ns)[..., None] < 0.0, -ns_b, ns_b)
    ss_b = vm.normalize(dpdu_b - ns_b * vm.dot(ns_b, dpdu_b)[..., None])
    ts_b = vm.cross(ns_b, ss_b)
    sel = has[..., None]
    return (
        jnp.where(sel, ns_b, it.ns),
        jnp.where(sel, ss_b, ss),
        jnp.where(sel, ts_b, ts),
    )


_MAT_LOBES = None


def _mat_lobes():
    global _MAT_LOBES
    if _MAT_LOBES is None:
        _MAT_LOBES = {
            sa.MATTE: (LOBE_LAMBERT, LOBE_ORENNAYAR),
            sa.PLASTIC: (LOBE_LAMBERT, LOBE_MICROFACET_REFL),
            sa.MIRROR: (LOBE_SPEC_REFL,),
            sa.GLASS: (LOBE_FRESNEL_SPEC, LOBE_MICROFACET_REFL,
                       LOBE_MICROFACET_TRANS),
            sa.SUBSURFACE: (LOBE_FRESNEL_SPEC, LOBE_MICROFACET_REFL,
                            LOBE_MICROFACET_TRANS),
            sa.METAL: (LOBE_MICROFACET_REFL_COND,),
            sa.SUBSTRATE: (LOBE_FRESNEL_BLEND,),
            sa.UBER: (LOBE_LAMBERT, LOBE_MICROFACET_REFL, LOBE_SPEC_REFL_FR,
                      LOBE_SPEC_TRANS, LOBE_SPEC_TRANS_PASS),
            sa.TRANSLUCENT: (LOBE_LAMBERT, LOBE_LAMBERT_TRANS,
                             LOBE_MICROFACET_REFL, LOBE_MICROFACET_TRANS),
            sa.DISNEY: (LOBE_DISNEY_DIFFUSE, LOBE_DISNEY_GLOSS,
                        LOBE_DISNEY_CLEARCOAT, LOBE_DISNEY_SHEEN,
                        LOBE_LAMBERT_TRANS,
                        LOBE_MICROFACET_TRANS),
            sa.HAIR: (LOBE_HAIR,),
            sa.FOURIER: (LOBE_FOURIER,),
            # mix blends params into the first material's type at build time
            sa.MIXMAT: tuple(range(1, N_LOBE_KINDS)),
        }
    return _MAT_LOBES


def lobe_mask_of(mat_mask: int) -> int:
    if mat_mask < 0:
        return -1
    lm = 0
    for mt, lobes in _mat_lobes().items():
        if mat_mask & (1 << mt):
            for l in lobes:
                lm |= 1 << l
    return lm if lm else -1


def make_bsdf(mat_type, params, uv=None, enable_hair=True, fou=None, mat_mask=-1):
    """Material tag + parameter row -> per-lane Bsdf
    (replaces Material::compute_scattering_functions, material.rs:63).
    uv: optional (N,2) hit coordinates; uv.y gives the hair fiber offset.
    enable_hair: STATIC — pass False for scenes with no hair material.
    mat_mask: STATIC bitmask of material types present (absent families
    compile to nothing; -1 = all)."""
    hasm = lambda t: mat_mask < 0 or bool(mat_mask & (1 << t))
    n = mat_type.shape[0]
    kd = params[:, sa.MP_KD : sa.MP_KD + 3]
    ks = params[:, sa.MP_KS : sa.MP_KS + 3]
    kr = params[:, sa.MP_KR : sa.MP_KR + 3]
    kt = params[:, sa.MP_KT : sa.MP_KT + 3]
    rough_u = params[:, sa.MP_ROUGH_U]
    rough_v = params[:, sa.MP_ROUGH_V]
    remap = params[:, sa.MP_REMAP_ROUGH] > 0.5
    eta = jnp.where(params[:, sa.MP_ETA] > 0.0, params[:, sa.MP_ETA], 1.0)
    sigma = params[:, sa.MP_SIGMA]
    eta3 = params[:, sa.MP_ETA3 : sa.MP_ETA3 + 3]
    k3 = params[:, sa.MP_K3 : sa.MP_K3 + 3]

    ax = jnp.where(remap, tr_roughness_to_alpha(rough_u), rough_u)
    ay = jnp.where(remap, tr_roughness_to_alpha(rough_v), rough_v)
    ax = jnp.maximum(ax, 1e-4)
    ay = jnp.maximum(ay, 1e-4)
    smooth = (rough_u <= 0.0) & (rough_v <= 0.0)

    z = jnp.zeros(n, jnp.int32)
    kind0 = z + LOBE_NONE
    kind1 = z + LOBE_NONE
    r0 = jnp.zeros((n, 3), jnp.float32)
    r1 = jnp.zeros((n, 3), jnp.float32)
    # slots 2/3 only exist when the material set can need >2 lobes (STATIC)
    need4 = (hasm(sa.UBER) or hasm(sa.TRANSLUCENT) or hasm(sa.MIXMAT)
             or hasm(sa.DISNEY))
    if need4:
        kind2 = z + LOBE_NONE
        kind3 = z + LOBE_NONE
        r2 = jnp.zeros((n, 3), jnp.float32)
        r3 = jnp.zeros((n, 3), jnp.float32)
    else:
        kind2 = kind3 = r2 = r3 = None
    # slots 4/5 only when a FULL uber stack is possible (STATIC): kd + ks
    # + kr + kt + opacity-pass = 5 lobes (uber.rs:142-257)
    if hasm(sa.UBER) or hasm(sa.MIXMAT) or hasm(sa.DISNEY):
        kind4 = z + LOBE_NONE
        kind5 = z + LOBE_NONE
        r4 = jnp.zeros((n, 3), jnp.float32)
        r5 = jnp.zeros((n, 3), jnp.float32)
    else:
        kind4 = kind5 = r4 = r5 = None
    ax2 = ay2 = eta2 = sigma2 = None  # per-slot overrides (disney/mix)

    is_black = lambda c: jnp.all(c == 0.0, axis=-1)

    if hasm(sa.MATTE) or hasm(sa.MIXMAT):
        # MATTE (materials/matte.rs): lambertian or oren-nayar by sigma
        m = mat_type == sa.MATTE
        kind0 = jnp.where(m & ~is_black(kd), jnp.where(sigma == 0.0, LOBE_LAMBERT, LOBE_ORENNAYAR), kind0)
        r0 = jnp.where(m[:, None], kd, r0)

    if hasm(sa.PLASTIC) or hasm(sa.MIXMAT):
        # PLASTIC (materials/plastic.rs): lambertian + TR dielectric gloss
        m = mat_type == sa.PLASTIC
        kind0 = jnp.where(m & ~is_black(kd), LOBE_LAMBERT, kind0)
        kind1 = jnp.where(m & ~is_black(ks), LOBE_MICROFACET_REFL, kind1)
        r0 = jnp.where(m[:, None], kd, r0)
        r1 = jnp.where(m[:, None], ks, r1)
        eta = jnp.where(m, 1.5, eta)

    if hasm(sa.MIRROR) or hasm(sa.MIXMAT):
        # MIRROR (materials/mirror.rs): perfect specular, fresnel no-op
        m = mat_type == sa.MIRROR
        kind0 = jnp.where(m & ~is_black(kr), LOBE_SPEC_REFL, kind0)
        r0 = jnp.where(m[:, None], kr, r0)

    if hasm(sa.GLASS) or hasm(sa.SUBSURFACE) or hasm(sa.MIXMAT):
        # GLASS (materials/glass.rs:107-205): smooth -> FresnelSpecular;
        # rough -> MicrofacetReflection(kr) + MicrofacetTransmission(kt).
        # SUBSURFACE (materials/subsurface.rs) has the same glass-like surface
        # BSDF; its BSSRDF is handled by the integrator on transmission.
        m = (mat_type == sa.GLASS) | (mat_type == sa.SUBSURFACE)
        kind0 = jnp.where(
            m & ~(~smooth & is_black(kr)),
            jnp.where(smooth, LOBE_FRESNEL_SPEC, LOBE_MICROFACET_REFL), kind0,
        )
        kind1 = jnp.where(
            m & ~smooth & ~is_black(kt), LOBE_MICROFACET_TRANS, kind1
        )
        r0 = jnp.where(m[:, None], kr, r0)
        r1 = jnp.where((m & ~smooth)[:, None], kt, r1)

    if hasm(sa.METAL) or hasm(sa.MIXMAT):
        # METAL (materials/metal.rs): TR conductor
        m = mat_type == sa.METAL
        kind0 = jnp.where(m, LOBE_MICROFACET_REFL_COND, kind0)
        r0 = jnp.where(m[:, None], jnp.ones_like(kr), r0)

    if hasm(sa.SUBSTRATE) or hasm(sa.MIXMAT):
        # SUBSTRATE (materials/substrate.rs): FresnelBlend
        m = mat_type == sa.SUBSTRATE
        kind0 = jnp.where(m, LOBE_FRESNEL_BLEND, kind0)
        r0 = jnp.where(m[:, None], kd, r0)
        r1 = jnp.where(m[:, None], ks, r1)

    if hasm(sa.UBER) or hasm(sa.MIXMAT):
        # UBER (materials/uber.rs:142-257): opacity-scaled 4-lobe stack —
        # lambert(kd*op) + microfacet(ks*op) + one specular slot
        # (SpecRefl(kr*op) preferred, else SpecTrans(kt*op, eta)) + the
        # opacity pass-through SpecularTransmission(1-op, 1, 1)
        m = mat_type == sa.UBER
        op = params[:, sa.MP_OPACITY : sa.MP_OPACITY + 3]
        t_pass = 1.0 - op
        kd_u, ks_u, kr_u, kt_u = kd * op, ks * op, kr * op, kt * op
        kind0 = jnp.where(m & ~is_black(kd_u), LOBE_LAMBERT, kind0)
        kind1 = jnp.where(m & ~is_black(ks_u), LOBE_MICROFACET_REFL, kind1)
        r0 = jnp.where(m[:, None], kd_u, r0)
        r1 = jnp.where(m[:, None], ks_u, r1)
        # FULL 5-lobe stack: kr and kt get their own slots (2 and 3) and
        # the opacity pass-through sits in slot 4 — an uber with all of
        # kd+ks+kr+kt+opacity now matches the reference lobe-for-lobe
        # (uber.rs:142-257; formerly kr/kt shared one slot)
        kind2 = jnp.where(m & ~is_black(kr_u), LOBE_SPEC_REFL_FR, kind2)
        r2 = jnp.where(m[:, None], kr_u, r2)
        kind3 = jnp.where(m & ~is_black(kt_u), LOBE_SPEC_TRANS, kind3)
        r3 = jnp.where(m[:, None], kt_u, r3)
        kind4 = jnp.where(m & ~is_black(t_pass), LOBE_SPEC_TRANS_PASS, kind4)
        r4 = jnp.where(m[:, None], t_pass, r4)

    if hasm(sa.DISNEY) or hasm(sa.MIXMAT):
        # DISNEY (materials/disney.rs:640): diffuse+retro, tinted
        # anisotropic GGX, GTR1 clearcoat (slot 2), sheen OR specular
        # transmission (slot 3).  Scalar packing (builder.add_disney):
        # MP_KS = (metallic, sheen, clearcoat);
        # MP_OPACITY = (spec_tint, anisotropic, spec_trans);
        # MP_KR = (clearcoat_gloss, sheen_tint, -).
        m = mat_type == sa.DISNEY
        metallic = params[:, sa.MP_KS]
        sheen_w = params[:, sa.MP_KS + 1]
        cc_w = params[:, sa.MP_KS + 2]
        spec_tint = params[:, sa.MP_OPACITY]
        aniso = params[:, sa.MP_OPACITY + 1]
        s_trans = params[:, sa.MP_OPACITY + 2]
        cc_gloss = params[:, sa.MP_KR]
        sheen_tint = params[:, sa.MP_KR + 1]
        # tint color: hue/saturation of the base (disney.rs CalculateTint)
        lum = jnp.einsum("...c,c->...", kd, jnp.asarray([0.2126, 0.7152, 0.0722]))
        ctint = jnp.where(lum[:, None] > 0, kd / jnp.maximum(lum[:, None], 1e-6), 1.0)
        white = jnp.ones_like(kd)
        # DisneyFresnel Cspec0: lerp(metallic, 0.04*lerp(specTint,1,tint), base)
        spec0 = 0.04 * vm.lerp(spec_tint[:, None], white, ctint)
        f0 = vm.lerp(metallic[:, None], spec0, kd)
        kind0 = jnp.where(m, LOBE_DISNEY_DIFFUSE, kind0)
        kind1 = jnp.where(m, LOBE_DISNEY_GLOSS, kind1)
        # THIN mode (disney.rs thin branch): MP_KT = (thin, diffTrans,-);
        # dt = diffTrans/2 splits the diffuse energy between reflection
        # and a Lambertian transmission lobe; flatness (MP_KR+2) blends
        # the diffuse lobe toward the Hanrahan-Krueger fake-SS term
        # (evaluated inside disney_diffuse_f — the per-lane flatness/dt
        # ride the conductor k3 channels, unused by disney lanes)
        thin = params[:, sa.MP_KT] > 0.5
        dt = jnp.where(thin, 0.5 * params[:, sa.MP_KT + 1], 0.0)
        flat = jnp.where(thin, params[:, sa.MP_KR + 2], 0.0)
        k3 = jnp.where(
            m[:, None],
            jnp.stack([flat, dt, jnp.zeros_like(dt)], -1), k3,
        )
        diff_w = (1.0 - metallic) * (1.0 - s_trans)
        r0 = jnp.where(m[:, None], kd * (diff_w * (1.0 - dt))[:, None], r0)
        r1 = jnp.where(m[:, None], f0, r1)
        # disney roughness remaps alpha = rough^2 (not the TR fit), split
        # by the anisotropy aspect (disney.rs: aspect = sqrt(1-0.9*aniso))
        aspect = jnp.sqrt(jnp.maximum(1.0 - 0.9 * aniso, 1e-4))
        r2_alpha = jnp.maximum(rough_u * rough_u, 1e-4)
        ax = jnp.where(m, r2_alpha / aspect, ax)
        ay = jnp.where(m, r2_alpha * aspect, ay)
        sigma = jnp.where(m, rough_u, sigma)  # disney diffuse retro uses roughness
        if need4:
            # slot 2: clearcoat (weight in r2.x, GTR1 alpha in sigma2)
            kind2 = jnp.where(m & (cc_w > 0), LOBE_DISNEY_CLEARCOAT, kind2)
            r2 = jnp.where(
                m[:, None], jnp.stack([cc_w, cc_w * 0, cc_w * 0], -1), r2
            )
            alpha_cc = vm.lerp(cc_gloss, 0.1, 0.001)
            sigma2_new = jnp.where(m, alpha_cc, 1.0)
            sigma2 = sigma2_new if sigma2 is None else jnp.where(m, alpha_cc, sigma2)
            # slot 3: specular transmission beats sheen when both set
            csheen = vm.lerp(sheen_tint[:, None], white, ctint)
            trans_col = jnp.sqrt(jnp.maximum(kd, 0.0)) * (
                (1.0 - metallic) * s_trans
            )[:, None]
            use_trans = s_trans > 0
            kind3 = jnp.where(
                m & use_trans, LOBE_MICROFACET_TRANS,
                jnp.where(m & (sheen_w > 0), LOBE_DISNEY_SHEEN, kind3),
            )
            r3 = jnp.where(
                m[:, None],
                jnp.where(
                    use_trans[:, None], trans_col,
                    sheen_w[:, None] * diff_w[:, None] * csheen,
                ),
                r3,
            )
            # transmission distribution shares the disney alphas; eta 1.5
            ax2 = ax if ax2 is None else jnp.where(m, ax, ax2)
            ay2 = ay if ay2 is None else jnp.where(m, ay, ay2)
            eta2_new = jnp.where(m, eta, 1.5)
            eta2 = eta2_new if eta2 is None else jnp.where(m, eta, eta2)
        if kind4 is not None:
            # thin diffTrans -> LambertianTransmission(dt * base)
            # (disney.rs thin branch; slot 4 exists for DISNEY scenes)
            kind4 = jnp.where(m & (dt > 0), LOBE_LAMBERT_TRANS, kind4)
            r4 = jnp.where(m[:, None], kd * (diff_w * dt)[:, None], r4)

    if hasm(sa.TRANSLUCENT) or hasm(sa.MIXMAT):
        # TRANSLUCENT (materials/translucent.rs:82-185): the full 4-lobe
        # stack at eta 1.5 — Lambertian refl/trans (kd x reflect/transmit)
        # + Microfacet refl/trans (ks x reflect/transmit); reflect/transmit
        # colors ride the KR/KT param slots (builder defaults 0.5)
        m = mat_type == sa.TRANSLUCENT
        kind0 = jnp.where(m & ~is_black(kd * kr), LOBE_LAMBERT, kind0)
        kind1 = jnp.where(m & ~is_black(kd * kt), LOBE_LAMBERT_TRANS, kind1)
        r0 = jnp.where(m[:, None], kd * kr, r0)
        r1 = jnp.where(m[:, None], kd * kt, r1)
        kind2 = jnp.where(m & ~is_black(ks * kr), LOBE_MICROFACET_REFL, kind2)
        kind3 = jnp.where(m & ~is_black(ks * kt), LOBE_MICROFACET_TRANS, kind3)
        r2 = jnp.where(m[:, None], ks * kr, r2)
        r3 = jnp.where(m[:, None], ks * kt, r3)
        eta = jnp.where(m, 1.5, eta)

    if hasm(sa.FOURIER):
        # FOURIER (materials/fourier.rs): tabulated single lobe; eval needs the
        # scene's FourierTable carried in the Bsdf
        m = mat_type == sa.FOURIER
        kind0 = jnp.where(m & (fou is not None), LOBE_FOURIER, kind0)
        kind1 = jnp.where(m, LOBE_NONE, kind1)

    if hasm(sa.HAIR):
        # HAIR (materials/hair.rs): single Marschner lobe.  Param mapping:
        # MP_KD = sigma_a OR reflectance color (MP_OPACITY.x = 1 -> convert via
        # sigma_a_from_reflectance at shade time so textured color works),
        # MP_ROUGH_U/V = beta_m/beta_n (remap flag off), MP_SIGMA = alpha deg.
        m = mat_type == sa.HAIR
        kind0 = jnp.where(m, LOBE_HAIR, kind0)
        kind1 = jnp.where(m, LOBE_NONE, kind1)
        from_color = params[:, sa.MP_OPACITY] > 0.5
        beta_n_h = rough_v
        bn = jnp.clip(beta_n_h, 1e-3, 1.0)
        denom_sa = (
            5.969 - 0.215 * bn + 2.532 * bn**2 - 10.73 * bn**3 + 5.574 * bn**4
            + 0.245 * bn**5
        )
        f_sa = jnp.log(jnp.clip(kd, 1e-5, 1.0)) / denom_sa[:, None]
        sigma_a_hair = jnp.where(from_color[:, None], f_sa * f_sa, kd)
        r0 = jnp.where(m[:, None], sigma_a_hair, r0)
        ax = jnp.where(m, jnp.clip(rough_u, 1e-3, 1.0), ax)  # beta_m
        ay = jnp.where(m, jnp.clip(rough_v, 1e-3, 1.0), ay)  # beta_n

    if uv is None:
        h = jnp.zeros(n, jnp.float32)
    else:
        h = jnp.clip(-1.0 + 2.0 * uv[..., 1], -1.0, 1.0)
    if ax2 is not None and sigma2 is None:
        sigma2 = sigma
    if sigma2 is not None and ax2 is None:
        ax2, ay2, eta2 = ax, ay, eta
    return Bsdf(
        kind0, kind1, r0, r1, ax, ay, eta, sigma, eta3, k3, kt, h,
        bool(enable_hair), fou, lobe_mask_of(mat_mask),
        kind2, kind3, r2, r3,
        ax2, ay2, eta2, sigma2,
        kind4=kind4, kind5=kind5, r4=r4, r5=r5,
    )


def num_components(b: Bsdf):
    n = (b.kind0 != LOBE_NONE).astype(jnp.int32) + (b.kind1 != LOBE_NONE).astype(
        jnp.int32
    )
    if b.kind2 is not None:
        n = n + (b.kind2 != LOBE_NONE).astype(jnp.int32) + (
            b.kind3 != LOBE_NONE
        ).astype(jnp.int32)
    if b.kind4 is not None:
        n = n + (b.kind4 != LOBE_NONE).astype(jnp.int32) + (
            b.kind5 != LOBE_NONE
        ).astype(jnp.int32)
    return n


def has_nonspecular(b: Bsdf):
    """Any non-specular lobe present, over ALL slots (reference
    Bsdf::num_components with BSDF_SPECULAR excluded)."""
    spec = (LOBE_NONE, LOBE_SPEC_REFL, LOBE_FRESNEL_SPEC, LOBE_SPEC_REFL_FR,
            LOBE_SPEC_TRANS, LOBE_SPEC_TRANS_PASS)

    def non(k):
        m = jnp.ones(k.shape, bool)
        for sk in spec:  # explicit compares: jnp.isin const-folds slowly
            m &= k != sk
        return m
    out = None
    for kind, _, _ in _slots(b):
        v = non(kind)
        out = v if out is None else out | v
    return out


def disney_clearcoat_f(color, gloss, wo, wi):
    """DisneyClearcoat lobe (reference disney.rs): GTR1 D, fixed-ior-1.5
    Schlick fresnel, separable smith G with alpha 0.25.  `color.x` carries
    the clearcoat weight; `gloss` the GTR1 alpha."""
    wh = wi + wo
    wh_ok = jnp.any(wh != 0.0, axis=-1)
    wh_n = vm.normalize(wh)
    a2 = jnp.maximum(gloss * gloss, 1e-6)
    c2 = cos2_theta(wh_n)
    d = (a2 - 1.0) / (vm.PI * jnp.log(a2) * jnp.maximum(1.0 + (a2 - 1.0) * c2, 1e-12))
    fr = 0.04 + _pow5(1.0 - vm.absdot(wi, wh_n)) * (1.0 - 0.04)
    lam = lambda w: tr_lambda(w, jnp.full_like(gloss, 0.25), jnp.full_like(gloss, 0.25))
    g = 1.0 / (1.0 + lam(wo) + lam(wi))
    weight = color[..., 0]
    val = weight * d * fr * g / 4.0
    return jnp.where(wh_ok, val, 0.0)[..., None] * jnp.ones_like(color)


def _trans_eta(wo, eta):
    """Relative IOR for a transmission event with eta_a=1 (air) outside:
    eta_b/eta_a when entering (cosθo>0) else eta_a/eta_b (reflection.rs
    MicrofacetTransmission::f)."""
    return jnp.where(cos_theta(wo) > 0.0, eta, 1.0 / jnp.maximum(eta, 1e-6))


def _microfacet_trans_f(color, b: Bsdf, wo, wi, ax, ay, eta):
    """reference reflection.rs:1246-1313 (radiance transport factor 1/eta)."""
    mf_d, mf_g, _, _, _ = _dist(b)
    cto = cos_theta(wo)
    cti = cos_theta(wi)
    e = _trans_eta(wo, eta)
    wh = vm.normalize(wo + wi * e[..., None])
    wh = wh * jnp.sign(wh[..., 2:3])
    dot_o = vm.dot(wo, wh)
    dot_i = vm.dot(wi, wh)
    fr = fr_dielectric(dot_o, 1.0, eta)
    sqrt_denom = dot_o + e * dot_i
    factor = 1.0 / jnp.maximum(e, 1e-6)  # TransportMode::Radiance
    val = (
        (1.0 - fr)[..., None]
        * color
        * jnp.abs(
            mf_d(wh, ax, ay) * mf_g(wo, wi, ax, ay) * e * e * jnp.abs(dot_i)
            * jnp.abs(dot_o) * factor * factor
            / jnp.maximum(jnp.abs(cti * cto * sqrt_denom * sqrt_denom), 1e-12)
        )[..., None]
    )
    ok = (cto != 0.0) & (cti != 0.0) & (dot_o * dot_i <= 0.0)
    return jnp.where(ok[..., None], val, 0.0)


def _microfacet_trans_pdf(b: Bsdf, wo, wi, ax, ay, eta):
    """reference reflection.rs:1348-1370: wh pdf x |dwh/dwi| jacobian."""
    _, _, _, _, mf_pdf_wh = _dist(b)
    e = _trans_eta(wo, eta)
    wh = vm.normalize(wo + wi * e[..., None])
    dot_o = vm.dot(wo, wh)
    dot_i = vm.dot(wi, wh)
    sqrt_denom = dot_o + e * dot_i
    dwh_dwi = jnp.abs(e * e * dot_i / jnp.maximum(sqrt_denom * sqrt_denom, 1e-12))
    # sample_wh uses wh in wo's hemisphere
    wh_s = wh * jnp.sign(wh[..., 2:3]) * jnp.sign(cos_theta(wo))[..., None]
    pdf = mf_pdf_wh(wo, wh_s, ax, ay) * dwh_dwi
    ok = ~same_hemisphere(wo, wi) & (dot_o * dot_i <= 0.0)
    return jnp.where(ok, pdf, 0.0)


def _slot_params(b: Bsdf, slot23: bool):
    """(ax, ay, eta, sigma) for a lobe slot: slots 2/3 may carry their own
    microfacet/eta params (mix materials)."""
    if slot23 and b.ax2 is not None:
        return b.ax2, b.ay2, b.eta2, b.sigma2
    return b.ax, b.ay, b.eta, b.sigma


def _dist(b: Bsdf):
    """Static microfacet-distribution dispatch (microfacet.rs:22 enum)."""
    if b.use_beckmann:
        return bk_d, bk_g, bk_g1, bk_sample_wh, bk_pdf_wh
    return tr_d, tr_g, tr_g1, tr_sample_wh, tr_pdf_wh


def _lobe_f(kind, color, b: Bsdf, wo, wi, reflect, slot23: bool = False):
    """Evaluate one lobe slot for all lanes (specular lobes -> 0).
    Families absent from b.lobe_mask (STATIC) compile to nothing."""
    hasl = lambda k: b.lobe_mask < 0 or bool(b.lobe_mask & (1 << k))
    need_mf = hasl(LOBE_MICROFACET_REFL) or hasl(LOBE_MICROFACET_REFL_COND) or hasl(LOBE_FRESNEL_BLEND)
    ax, ay, eta, sigma = _slot_params(b, slot23)
    mf_d, mf_g, mf_g1, _, _ = _dist(b)

    out = jnp.zeros_like(color)
    if hasl(LOBE_LAMBERT):
        out = jnp.where((kind == LOBE_LAMBERT)[..., None], color * INV_PI, out)
    if hasl(LOBE_ORENNAYAR):
        out = jnp.where((kind == LOBE_ORENNAYAR)[..., None], oren_nayar_f(color, sigma, wo, wi), out)

    if need_mf:
        wh = wi + wo
        wh_ok = jnp.any(wh != 0.0, axis=-1) & (abs_cos_theta(wi) > 0) & (abs_cos_theta(wo) > 0)
        wh_n = vm.normalize(wh)
        # fresnel with wh facing forward (reference microfacetreflection::f)
        wh_f = wh_n * jnp.sign(wh_n[..., 2:3])
        d_val = mf_d(wh_n, ax, ay)
    if hasl(LOBE_MICROFACET_REFL) or hasl(LOBE_MICROFACET_REFL_COND):
        g_val = mf_g(wo, wi, ax, ay)
        denom = 4.0 * abs_cos_theta(wi) * abs_cos_theta(wo)
        f_mf_base = jnp.where(
            (wh_ok & (denom > 0))[..., None],
            color * (d_val * g_val / jnp.maximum(denom, 1e-12))[..., None],
            0.0,
        )
        if hasl(LOBE_MICROFACET_REFL):
            fr_d = fr_dielectric(vm.dot(wi, wh_f), 1.0, eta)
            out = jnp.where(
                (kind == LOBE_MICROFACET_REFL)[..., None], f_mf_base * fr_d[..., None], out
            )
        if hasl(LOBE_MICROFACET_REFL_COND):
            fr_c = fr_conductor(vm.dot(wi, wh_f), jnp.ones_like(b.eta3), b.eta3, b.k3)
            out = jnp.where(
                (kind == LOBE_MICROFACET_REFL_COND)[..., None], f_mf_base * fr_c, out
            )
    if hasl(LOBE_FRESNEL_BLEND):
        # fresnel blend (reference reflection.rs FresnelBlend)
        pow5 = lambda v: (v * v) * (v * v) * v
        diffuse = (
            (28.0 / (23.0 * vm.PI))
            * b.r0
            * (1.0 - b.r1)
            * (1.0 - pow5(1.0 - 0.5 * abs_cos_theta(wi)))[..., None]
            * (1.0 - pow5(1.0 - 0.5 * abs_cos_theta(wo)))[..., None]
        )
        schlick = b.r1 + pow5(1.0 - vm.absdot(wi, wh_f))[..., None] * (1.0 - b.r1)
        spec_fb = jnp.where(
            wh_ok[..., None],
            (d_val / jnp.maximum(4.0 * vm.absdot(wi, wh_n)
              * jnp.maximum(abs_cos_theta(wi), abs_cos_theta(wo)), 1e-12))[..., None] * schlick,
            0.0,
        )
        out = jnp.where((kind == LOBE_FRESNEL_BLEND)[..., None], diffuse + spec_fb, out)
    if hasl(LOBE_DISNEY_DIFFUSE):
        out = jnp.where(
            (kind == LOBE_DISNEY_DIFFUSE)[..., None],
            disney_diffuse_f(color, sigma, wo, wi, flatness=b.k3[..., 0]), out,
        )
    if hasl(LOBE_DISNEY_GLOSS):
        out = jnp.where(
            (kind == LOBE_DISNEY_GLOSS)[..., None],
            disney_gloss_f(color, ax, ay, wo, wi), out,
        )
    if hasl(LOBE_DISNEY_CLEARCOAT):
        out = jnp.where(
            (kind == LOBE_DISNEY_CLEARCOAT)[..., None],
            disney_clearcoat_f(color, sigma, wo, wi), out,
        )
    if hasl(LOBE_DISNEY_SHEEN):
        # DisneySheen::f (disney.rs): R * SchlickWeight(|wi . wh|)
        wh_s = wi + wo
        wh_ok_s = jnp.any(wh_s != 0.0, axis=-1)
        cos_d = vm.absdot(wi, vm.normalize(wh_s))
        out = jnp.where(
            (kind == LOBE_DISNEY_SHEEN)[..., None],
            color * (_pow5(1.0 - cos_d) * jnp.where(wh_ok_s, 1.0, 0.0))[..., None],
            out,
        )
    # reflective lobes contribute only when geometric sidedness says reflect
    out = jnp.where(reflect[..., None], out, 0.0)
    # and only when wo/wi are in the same shading hemisphere
    out = jnp.where(same_hemisphere(wo, wi)[..., None], out, 0.0)
    if hasl(LOBE_LAMBERT_TRANS):
        # LambertianTransmission: opposite hemisphere, bypasses both masks
        out = jnp.where(
            (kind == LOBE_LAMBERT_TRANS)[..., None],
            jnp.where((~same_hemisphere(wo, wi) & ~reflect)[..., None], color * INV_PI, 0.0),
            out,
        )
    if hasl(LOBE_MICROFACET_TRANS):
        # MicrofacetTransmission::f (reference reflection.rs:1246-1313):
        # glossy transmission through the rough dielectric interface
        ft = _microfacet_trans_f(color, b, wo, wi, ax, ay, eta)
        out = jnp.where(
            (kind == LOBE_MICROFACET_TRANS)[..., None],
            jnp.where((~same_hemisphere(wo, wi) & ~reflect)[..., None], ft, 0.0),
            out,
        )
    # hair scatters over the full sphere — bypasses both masks
    if b.enable_hair and hasl(LOBE_HAIR):
        out = jnp.where((kind == LOBE_HAIR)[..., None], hair_f(b, wo, wi), out)
    if b.fou is not None and hasl(LOBE_FOURIER):
        from .fourier_bsdf import fourier_f

        out = jnp.where((kind == LOBE_FOURIER)[..., None], fourier_f(b.fou, wo, wi), out)
    return out


def _lobe_pdf(kind, b: Bsdf, wo, wi, slot23: bool = False):
    hasl = lambda k: b.lobe_mask < 0 or bool(b.lobe_mask & (1 << k))
    ax, ay, eta, sigma = _slot_params(b, slot23)
    _, _, _, _, mf_pdf_wh = _dist(b)
    pdf_cos = abs_cos_theta(wi) * INV_PI
    need_mf = (hasl(LOBE_MICROFACET_REFL) or hasl(LOBE_MICROFACET_REFL_COND)
               or hasl(LOBE_DISNEY_GLOSS) or hasl(LOBE_FRESNEL_BLEND)
               or hasl(LOBE_DISNEY_CLEARCOAT))
    same = same_hemisphere(wo, wi)
    out = jnp.zeros_like(pdf_cos)
    if (hasl(LOBE_LAMBERT) or hasl(LOBE_ORENNAYAR) or hasl(LOBE_DISNEY_DIFFUSE)
            or hasl(LOBE_DISNEY_SHEEN)):
        out = jnp.where(
            (kind == LOBE_LAMBERT) | (kind == LOBE_ORENNAYAR)
            | (kind == LOBE_DISNEY_DIFFUSE) | (kind == LOBE_DISNEY_SHEEN),
            pdf_cos, out,
        )
    if need_mf:
        wh = vm.normalize(wi + wo)
        pdf_mf = mf_pdf_wh(wo, wh, ax, ay) / jnp.maximum(4.0 * vm.dot(wo, wh), 1e-12)
        out = jnp.where(
            (kind == LOBE_MICROFACET_REFL) | (kind == LOBE_MICROFACET_REFL_COND)
            | (kind == LOBE_DISNEY_GLOSS),
            pdf_mf, out,
        )
        if hasl(LOBE_FRESNEL_BLEND):
            out = jnp.where(kind == LOBE_FRESNEL_BLEND, 0.5 * (pdf_cos + pdf_mf), out)
        if hasl(LOBE_DISNEY_CLEARCOAT):
            # clearcoat samples the GTR1 NDF (full distribution): pdf =
            # D_gtr1 * |cos wh| / (4 wo.wh) (disney.rs DisneyClearcoat)
            a2 = jnp.maximum(sigma * sigma, 1e-6)
            c2 = cos2_theta(wh)
            d_cc = (a2 - 1.0) / (
                vm.PI * jnp.log(a2) * jnp.maximum(1.0 + (a2 - 1.0) * c2, 1e-12)
            )
            out = jnp.where(
                kind == LOBE_DISNEY_CLEARCOAT,
                d_cc * abs_cos_theta(wh) / jnp.maximum(4.0 * vm.dot(wo, wh), 1e-12),
                out,
            )
    out = jnp.where(same, out, 0.0)
    if hasl(LOBE_LAMBERT_TRANS):
        out = jnp.where(kind == LOBE_LAMBERT_TRANS, jnp.where(same, 0.0, pdf_cos), out)
    if hasl(LOBE_MICROFACET_TRANS):
        out = jnp.where(
            kind == LOBE_MICROFACET_TRANS,
            _microfacet_trans_pdf(b, wo, wi, ax, ay, eta), out,
        )
    if b.enable_hair and hasl(LOBE_HAIR):
        out = jnp.where(kind == LOBE_HAIR, hair_pdf(b, wo, wi), out)
    if b.fou is not None and hasl(LOBE_FOURIER):
        from .fourier_bsdf import fourier_pdf

        out = jnp.where(kind == LOBE_FOURIER, fourier_pdf(b.fou, wo, wi), out)
    return out


def _slots(b: Bsdf):
    """List of (kind, color, slot23) for the present lobe slots (2 or 4 —
    STATIC by scene material set)."""
    s = [(b.kind0, b.r0, False), (b.kind1, b.r1, False)]
    if b.kind2 is not None:
        s.append((b.kind2, b.r2, True))
        s.append((b.kind3, b.r3, True))
    if b.kind4 is not None:
        s.append((b.kind4, b.r4, False))
        s.append((b.kind5, b.r5, False))
    return s


def bsdf_f(b: Bsdf, wo, wi, reflect):
    """Combined f over non-specular lobes (reference Bsdf::f reflection.rs:355)."""
    out = None
    for kind, color, s23 in _slots(b):
        v = _lobe_f(kind, color, b, wo, wi, reflect, s23)
        out = v if out is None else out + v
    return out


def bsdf_pdf(b: Bsdf, wo, wi):
    """Average pdf over matching components (reference Bsdf::pdf)."""
    p = None
    for kind, _, s23 in _slots(b):
        v = _lobe_pdf(kind, b, wo, wi, s23)
        p = v if p is None else p + v
    n = num_components(b)
    has_any = n > 0
    return jnp.where(has_any, p / jnp.maximum(n.astype(jnp.float32), 1.0), 0.0)


class BsdfSample(NamedTuple):
    wi: jnp.ndarray  # (N,3) local
    f: jnp.ndarray  # (N,3)
    pdf: jnp.ndarray  # (N,)
    is_specular: jnp.ndarray  # (N,) bool
    is_transmission: jnp.ndarray  # (N,) bool


def bsdf_sample(b: Bsdf, wo, u2, uc) -> BsdfSample:
    """Importance-sample the BSDF (reference Bsdf::sample_f reflection.rs:280).

    Chooses a lobe slot uniformly among present components using uc, samples
    it, then computes combined f and averaged pdf over non-specular lobes.
    Lobe families absent from b.lobe_mask (STATIC) compile to nothing.
    """
    hasl = lambda k: b.lobe_mask < 0 or bool(b.lobe_mask & (1 << k))
    n_comp = num_components(b).astype(jnp.float32)
    slots = _slots(b)
    if len(slots) == 2:
        pick1 = (uc * jnp.maximum(n_comp, 1.0)) >= 1.0  # true -> lobe slot 1
        kind = jnp.where(pick1, b.kind1, b.kind0)
        color = jnp.where(pick1[..., None], b.r1, b.r0)
        sel23 = jnp.zeros(kind.shape, bool)
    else:
        # rank-select the ci-th PRESENT slot among 4 (reference
        # reflection.rs:287-300 matching-component choice)
        pres = [k != LOBE_NONE for k, _, _ in slots]
        ci = jnp.floor(uc * jnp.maximum(n_comp, 1.0)).astype(jnp.int32)
        ci = jnp.minimum(ci, jnp.maximum(num_components(b) - 1, 0))
        rank = jnp.cumsum(jnp.stack([p.astype(jnp.int32) for p in pres], 0), 0) - 1
        kind = slots[0][0] * 0 + LOBE_NONE
        color = jnp.zeros_like(b.r0)
        sel23 = jnp.zeros(kind.shape, bool)
        for si, (k, c, s23) in enumerate(slots):
            hit = pres[si] & (rank[si] == ci)
            kind = jnp.where(hit, k, kind)
            color = jnp.where(hit[..., None], c, color)
            if s23:
                sel23 = sel23 | hit
    # per-lane slot params: slots 2/3 may carry their own (mix materials)
    if b.ax2 is not None:
        ax_s = jnp.where(sel23, b.ax2, b.ax)
        ay_s = jnp.where(sel23, b.ay2, b.ay)
        eta_s = jnp.where(sel23, b.eta2, b.eta)
    else:
        ax_s, ay_s, eta_s = b.ax, b.ay, b.eta
    mf_d_f, mf_g_f, mf_g1_f, mf_sample_wh, mf_pdf_wh = _dist(b)

    # candidate wi per family
    wi_cos = cosine_sample_hemisphere(u2)
    wi_cos = wi_cos * jnp.sign(jnp.where(cos_theta(wo) == 0, 1.0, cos_theta(wo)))[..., None]
    wi = wi_cos

    is_ltrans = kind == LOBE_LAMBERT_TRANS
    if hasl(LOBE_LAMBERT_TRANS):
        wi = jnp.where(is_ltrans[..., None], -wi_cos, wi)

    is_mf = (kind == LOBE_MICROFACET_REFL) | (kind == LOBE_MICROFACET_REFL_COND) | (
        kind == LOBE_DISNEY_GLOSS
    )
    if hasl(LOBE_MICROFACET_REFL) or hasl(LOBE_MICROFACET_REFL_COND) or hasl(LOBE_DISNEY_GLOSS):
        wh = mf_sample_wh(wo, u2, ax_s, ay_s)
        wi = jnp.where(is_mf[..., None], reflect_dir(wo, wh), wi)

    # glossy transmission: sample wh, refract through it
    # (reference MicrofacetTransmission::sample_f reflection.rs:1316-1346)
    is_mft = kind == LOBE_MICROFACET_TRANS
    mft_ok = jnp.ones(wo.shape[:-1], bool)
    if hasl(LOBE_MICROFACET_TRANS):
        wh_t = mf_sample_wh(wo, u2, ax_s, ay_s)
        eta_r_t = jnp.where(cos_theta(wo) > 0.0, 1.0 / eta_s, eta_s)
        wh_side = wh_t * jnp.sign(vm.dot(wo, wh_t))[..., None]
        ok_rt, wi_rt = refract_dir(wo, wh_side, eta_r_t)
        wi = jnp.where(is_mft[..., None], wi_rt, wi)
        mft_ok = jnp.where(is_mft, ok_rt, mft_ok)

    # GTR1 clearcoat wh sampling (disney.rs DisneyClearcoat::sample_f)
    is_cc = kind == LOBE_DISNEY_CLEARCOAT
    if hasl(LOBE_DISNEY_CLEARCOAT):
        gloss_cc = jnp.where(sel23, b.sigma2, b.sigma) if b.ax2 is not None else b.sigma
        a2c = jnp.maximum(gloss_cc * gloss_cc, 1e-6)
        ct2 = (1.0 - jnp.power(a2c, 1.0 - u2[..., 0])) / jnp.maximum(1.0 - a2c, 1e-9)
        ct_c = jnp.sqrt(jnp.clip(ct2, 0.0, 1.0))
        st_c = jnp.sqrt(jnp.maximum(1.0 - ct2, 0.0))
        phi_c = 2.0 * vm.PI * u2[..., 1]
        wh_cc = jnp.stack([st_c * jnp.cos(phi_c), st_c * jnp.sin(phi_c), ct_c], -1)
        wh_cc = jnp.where(same_hemisphere(wo, wh_cc)[..., None], wh_cc, -wh_cc)
        wi = jnp.where(is_cc[..., None], reflect_dir(wo, wh_cc), wi)

    n_up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], wo.dtype), wo.shape)
    wi_spec = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)
    is_spec_r = kind == LOBE_SPEC_REFL
    is_spec_rf = kind == LOBE_SPEC_REFL_FR
    if hasl(LOBE_SPEC_REFL) or hasl(LOBE_SPEC_REFL_FR):
        wi = jnp.where((is_spec_r | is_spec_rf)[..., None], wi_spec, wi)

    # specular transmission (reference SpecularTransmission::sample_f):
    # uber's kt (eta from the material) and opacity pass-through (eta 1)
    is_st = kind == LOBE_SPEC_TRANS
    is_stp = kind == LOBE_SPEC_TRANS_PASS
    st_ok = jnp.ones(wo.shape[:-1], bool)
    if hasl(LOBE_SPEC_TRANS):
        ent_st = cos_theta(wo) > 0.0
        eta_r_st = jnp.where(ent_st, 1.0 / eta_s, eta_s)
        n_f_st = jnp.where(ent_st[..., None], n_up, -n_up)
        ok_st, wi_st = refract_dir(wo, n_f_st, eta_r_st)
        wi = jnp.where(is_st[..., None], wi_st, wi)
        st_ok = jnp.where(is_st, ok_st, st_ok)
    if hasl(LOBE_SPEC_TRANS_PASS):
        wi = jnp.where(is_stp[..., None], -wo, wi)

    # fresnel specular (smooth glass): choose R/T by fresnel using u2.x
    # (reference FresnelSpecular::sample_f)
    is_fs = kind == LOBE_FRESNEL_SPEC
    fr = fr_dielectric(cos_theta(wo), 1.0, eta_s)
    choose_refl = u2[..., 0] < fr
    entering = cos_theta(wo) > 0.0
    if hasl(LOBE_FRESNEL_SPEC):
        eta_ratio = jnp.where(entering, 1.0 / eta_s, eta_s)
        n_facing = jnp.where(entering[..., None], n_up, -n_up)
        ok_t, wi_t = refract_dir(wo, n_facing, eta_ratio)
        wi_fs = jnp.where(choose_refl[..., None], wi_spec, wi_t)
        wi = jnp.where(is_fs[..., None], wi_fs, wi)
    else:
        ok_t = jnp.ones(wo.shape[:-1], bool)

    is_fb = kind == LOBE_FRESNEL_BLEND
    if hasl(LOBE_FRESNEL_BLEND):
        # half cosine, half wh (reference FresnelBlend::sample_f)
        fb_spec = u2[..., 0] >= 0.5
        u_fb = jnp.stack(
            [jnp.where(fb_spec, 2.0 * (u2[..., 0] - 0.5), 2.0 * u2[..., 0]), u2[..., 1]],
            axis=-1,
        )
        wh_fb = mf_sample_wh(wo, u_fb, ax_s, ay_s)
        wi_fb_cos = cosine_sample_hemisphere(u_fb)
        wi_fb_cos = wi_fb_cos * jnp.sign(jnp.where(cos_theta(wo) == 0, 1.0, cos_theta(wo)))[..., None]
        wi_fb = jnp.where(fb_spec[..., None], reflect_dir(wo, wh_fb), wi_fb_cos)
        wi = jnp.where(is_fb[..., None], wi_fb, wi)

    if b.enable_hair and hasl(LOBE_HAIR):
        is_hair = kind == LOBE_HAIR
        wi_hair, _ = hair_sample(b, wo, u2)
        wi = jnp.where(is_hair[..., None], wi_hair, wi)
    if b.fou is not None and hasl(LOBE_FOURIER):
        from .fourier_bsdf import fourier_sample

        wi_fou, _, _ = fourier_sample(b.fou, wo, u2)
        wi = jnp.where((kind == LOBE_FOURIER)[..., None], wi_fou, wi)
    wi = vm.normalize(wi)

    is_specular = is_fs | is_spec_r | is_spec_rf | is_st | is_stp
    is_transmission = (is_fs & ~choose_refl) | is_ltrans | is_mft | is_st | is_stp

    # --- pdf ---
    pdf_smooth = bsdf_pdf_with_choice(b, wo, wi)
    # delta lobes: pdf over the discrete choice, divided by the number of
    # matching components (reference reflection.rs Bsdf::sample_f epilogue)
    pdf_fs = jnp.where(choose_refl, fr, 1.0 - fr)
    pdf_delta = jnp.where(is_fs, pdf_fs, 1.0) / jnp.maximum(n_comp, 1.0)
    pdf = jnp.where(is_specular, pdf_delta, pdf_smooth)

    # --- f ---
    reflect_same = same_hemisphere(wo, wi)
    f = bsdf_f(b, wo, wi, reflect_same)
    aci = jnp.maximum(abs_cos_theta(wi), 1e-7)
    if hasl(LOBE_SPEC_REFL):
        # mirror: f = R/|cos| with the delta absorbed (fresnel no-op)
        f = jnp.where(is_spec_r[..., None], color / aci[..., None], f)
    if hasl(LOBE_SPEC_REFL_FR):
        # uber kr: dielectric-fresnel-weighted perfect mirror
        f = jnp.where(is_spec_rf[..., None], (fr / aci)[..., None] * color, f)
    if hasl(LOBE_SPEC_TRANS):
        scale_st = jnp.where(entering, 1.0 / (eta_s * eta_s), eta_s * eta_s)
        f_st = ((1.0 - fr) * scale_st / aci)[..., None] * color
        f_st = jnp.where((is_st & ~st_ok)[..., None], 0.0, f_st)
        f = jnp.where(is_st[..., None], f_st, f)
    if hasl(LOBE_SPEC_TRANS_PASS):
        # SpecularTransmission(t, 1, 1): F = 0, straight-through
        f = jnp.where(is_stp[..., None], color / aci[..., None], f)
    if hasl(LOBE_FRESNEL_SPEC):
        f_fs_refl = (fr / aci)[..., None] * b.r0
        # radiance transport applies (eta_i/eta_t)^2 on transmission
        scale_t = jnp.where(entering, 1.0 / (eta_s * eta_s), eta_s * eta_s)
        f_fs_trans = ((1.0 - fr) * scale_t / aci)[..., None] * b.kt
        f_fs = jnp.where(choose_refl[..., None], f_fs_refl, f_fs_trans)
        f_fs = jnp.where((is_fs & ~choose_refl & ~ok_t)[..., None], 0.0, f_fs)
        f = jnp.where(is_fs[..., None], f_fs, f)

    # microfacet sample below horizon -> invalid; failed refraction -> dead
    bad_mf = (is_mf & ~same_hemisphere(wo, wi)) | (is_mft & (
        same_hemisphere(wo, wi) | ~mft_ok)) | (is_st & ~st_ok)
    pdf = jnp.where(bad_mf, 0.0, pdf)
    f = jnp.where(bad_mf[..., None], 0.0, f)
    # no components at all
    none = num_components(b) == 0
    pdf = jnp.where(none, 0.0, pdf)
    f = jnp.where(none[..., None], 0.0, f)
    return BsdfSample(wi, f, pdf, is_specular, is_transmission)


def bsdf_pdf_with_choice(b: Bsdf, wo, wi):
    return bsdf_pdf(b, wo, wi)
