"""FourierBSDF — tabulated BSDFs from SCATFUN .bsdf files.

TPU-native replacement for reference src/core/reflection.rs:64-130
(FourierBSDFTable::read) + FourierBSDF f/sample_f/pdf (:1480-1750) and the
fourier/sample_fourier helpers of src/core/interpolation.rs.

Departures for the hardware:
- the ragged per-cell coefficient lists are repacked DENSE at load time:
  (n_mu*n_mu, channels*m_cap) with per-cell order counts, m truncated to
  m_cap (high-order azimuthal terms beyond m_cap contribute only to very
  narrow specular peaks).  Eval then accumulates the 16 spline-weighted
  cells as 16 sequential row gathers — no per-coefficient scatter/gather.
- sample_fourier's unbounded Newton/bisection (interpolation.rs:223-300)
  runs a fixed 20-step vectorized iteration.
- double-precision cosine recurrences run in f32 (TPU has no f64); for the
  tabulated m_cap<=64 series the accumulated error is ~1e-5 relative.

One Fourier table per scene is supported (multiple fourier materials share
it) — the common case; lift by adding a table axis if ever needed.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

M_CAP = 64  # azimuthal order cap for the dense repack


class FourierTable(NamedTuple):
    """Device arrays (single table)."""

    mu: jnp.ndarray  # (MU,)
    dense: jnp.ndarray  # (MU*MU, C*m_cap) spline-cell coefficient rows
    m: jnp.ndarray  # (MU*MU,) per-cell order (possibly > m_cap pre-trunc)
    cdf: jnp.ndarray  # (MU, MU)
    a0: jnp.ndarray  # (MU, MU) first luminance coefficient per cell
    eta: jnp.ndarray  # ()
    n_channels: jnp.ndarray  # () (1 or 3; static-ish, stored for io)


def read_bsdf_file(path):
    """Parse a SCATFUN v1 binary table (reflection.rs:80-187) -> host dict."""
    raw = open(path, "rb").read()
    if raw[:8] != b"SCATFUN\x01":
        raise ValueError(f"{path}: not a SCATFUN v1 file")
    ints = struct.unpack_from("<9i", raw, 8)
    flags, n_mu, n_coeffs, m_max, n_channels, n_bases = ints[:6]
    (eta,) = struct.unpack_from("<f", raw, 8 + 36)
    if flags != 1 or n_channels not in (1, 3) or n_bases != 1:
        raise ValueError(f"{path}: unsupported SCATFUN variant")
    off = 8 + 36 + 4 + 16
    mu = np.frombuffer(raw, "<f4", n_mu, off)
    off += 4 * n_mu
    cdf = np.frombuffer(raw, "<f4", n_mu * n_mu, off).reshape(n_mu, n_mu)
    off += 4 * n_mu * n_mu
    om = np.frombuffer(raw, "<i4", n_mu * n_mu * 2, off).reshape(-1, 2)
    off += 8 * n_mu * n_mu
    a = np.frombuffer(raw, "<f4", n_coeffs, off)
    return dict(
        mu=mu.copy(), cdf=cdf.copy(), a_offset=om[:, 0].copy(), m=om[:, 1].copy(),
        a=a.copy(), eta=float(eta), n_channels=int(n_channels), m_max=int(m_max),
    )


def make_fourier_table(tab: dict, m_cap: int = M_CAP) -> dict:
    """Host repack of a read_bsdf_file dict into dense numpy arrays."""
    n_mu = tab["mu"].shape[0]
    C = tab["n_channels"]
    cells = n_mu * n_mu
    dense = np.zeros((cells, C * m_cap), np.float32)
    a0 = np.zeros(cells, np.float32)
    for i in range(cells):
        m = int(tab["m"][i])
        o = int(tab["a_offset"][i])
        mm = min(m, m_cap)
        if m > 0:
            a0[i] = tab["a"][o]
            for c in range(C):
                dense[i, c * m_cap : c * m_cap + mm] = tab["a"][o + c * m : o + c * m + mm]
    return dict(
        mu=tab["mu"].astype(np.float32),
        dense=dense,
        m=np.minimum(tab["m"], m_cap).astype(np.int32),
        cdf=tab["cdf"].astype(np.float32),
        a0=a0.reshape(n_mu, n_mu),
        eta=np.float32(tab["eta"]),
        n_channels=np.int32(C),
    )


def synth_lambertian_table(rho=0.5, n_mu=16, m_cap: int = M_CAP) -> dict:
    """Synthetic table of a Lambertian reflector (test oracle).  The stored
    series is f*|mu_i| (pbrt convention; eval divides by |mu_i|), and
    reflection lives where mu_i*mu_o < 0 (incident directions negated)."""
    mu = np.linspace(-1.0, 1.0, n_mu).astype(np.float32)
    dense = np.zeros((n_mu * n_mu, 3 * m_cap), np.float32)
    m = np.zeros(n_mu * n_mu, np.int32)
    a0 = np.zeros((n_mu, n_mu), np.float32)
    for o in range(n_mu):
        for i in range(n_mu):
            if mu[i] * mu[o] < 0.0:
                val = rho / np.pi * abs(mu[i])
                idx = o * n_mu + i
                dense[idx, 0] = val
                dense[idx, m_cap] = val
                dense[idx, 2 * m_cap] = val
                m[idx] = 1
                a0[o, i] = val
    # cdf rows: integral of a0 over mu_i (catmull-rom quadrature) — the
    # SCATFUN file layout; the 2*pi azimuth factor is applied in pdf()
    # (reflection.rs:1770-1782)
    from .bssrdf import integrate_catmull_rom

    cdf, _total = integrate_catmull_rom(mu.astype(np.float64), a0)
    return dict(
        mu=mu, dense=dense, m=m, cdf=cdf.astype(np.float32), a0=a0,
        eta=np.float32(1.0), n_channels=np.int32(3),
    )


def to_device(tabs: dict) -> FourierTable:
    return FourierTable(
        jnp.asarray(tabs["mu"]), jnp.asarray(tabs["dense"]), jnp.asarray(tabs["m"]),
        jnp.asarray(tabs["cdf"]), jnp.asarray(tabs["a0"]),
        jnp.asarray(tabs["eta"]), jnp.asarray(tabs["n_channels"]),
    )


# ---------------------------------------------------------------------------
# device eval
# ---------------------------------------------------------------------------


def _cr_weights_dyn(nodes, x):
    """catmull_rom_weights over a traced 1-D node array (vectorized over x).
    Same math as bssrdf._cr_weights but nodes is a device array."""
    K = nodes.shape[0]
    valid = (x >= nodes[0]) & (x <= nodes[-1])
    cnt = jnp.sum((nodes[None, :] <= x[..., None]).astype(jnp.int32), axis=-1)
    idx = jnp.clip(cnt - 1, 0, K - 2)
    x0 = nodes[idx]
    x1 = nodes[idx + 1]
    t = (x - x0) / jnp.maximum(x1 - x0, 1e-20)
    t2 = t * t
    t3 = t2 * t
    w1b = 2 * t3 - 3 * t2 + 1
    w2b = -2 * t3 + 3 * t2
    xm1 = nodes[jnp.maximum(idx - 1, 0)]
    xp2 = nodes[jnp.minimum(idx + 2, K - 1)]
    w0_i = (t3 - 2 * t2 + t) * (x1 - x0) / jnp.maximum(x1 - xm1, 1e-20)
    w3_i = (t3 - t2) * (x1 - x0) / jnp.maximum(xp2 - x0, 1e-20)
    at_lo = idx == 0
    at_hi = idx + 2 >= K
    w0b = t3 - 2 * t2 + t
    w3b = t3 - t2
    w0 = jnp.where(at_lo, 0.0, -w0_i)
    w1 = w1b - jnp.where(at_lo, w0b, 0.0) - jnp.where(at_hi, w3b, w3_i)
    w2 = w2b + jnp.where(at_lo, w0b, w0_i) + jnp.where(at_hi, w3b, 0.0)
    w3 = jnp.where(at_hi, 0.0, w3_i)
    # offset convention: taps are idx-1 .. idx+2
    return valid, idx - 1, (w0, w1, w2, w3)


def _accumulate_ak(ft: FourierTable, mu_i, mu_o, m_cap: int):
    """Spline-weighted coefficient accumulation over the 16 neighbor cells
    (reflection.rs:1528-1546).  Returns (valid, ak (N, C*m_cap))."""
    MU = ft.mu.shape[0]
    ok_i, off_i, wi4 = _cr_weights_dyn(ft.mu, mu_i)
    ok_o, off_o, wo4 = _cr_weights_dyn(ft.mu, mu_o)
    ak = jnp.zeros(mu_i.shape + (ft.dense.shape[1],), jnp.float32)
    for b in range(4):
        row_o = jnp.clip(off_o + b, 0, MU - 1)
        for a in range(4):
            row_i = jnp.clip(off_i + a, 0, MU - 1)
            w = wi4[a] * wo4[b]
            cell = row_o * MU + row_i
            ak = ak + w[..., None] * ft.dense[cell]
    return ok_i & ok_o, ak


def _fourier_sum(ak_ch, cos_phi, m_cap: int):
    """Σ a_k cos(k φ) via the double-angle recurrence
    (interpolation.rs:209-222), as a lax.scan to keep graphs small."""
    ak_t = jnp.moveaxis(ak_ch, -1, 0)  # (m_cap, N)

    def step(carry, ak_k):
        cos_km1, cos_k, val = carry
        val = val + ak_k * cos_k
        cos_kp1 = 2.0 * cos_phi * cos_k - cos_km1
        return (cos_k, cos_kp1, val), None

    init = (cos_phi, jnp.ones_like(cos_phi), jnp.zeros_like(cos_phi))
    (_a, _b, val), _ = jax.lax.scan(step, init, ak_t)
    return val


def _cos_d_phi(wa, wb):
    """cosine of azimuth difference (reference geometry cos_d_phi)."""
    waxy = wa[..., 0] ** 2 + wa[..., 1] ** 2
    wbxy = wb[..., 0] ** 2 + wb[..., 1] ** 2
    num = wa[..., 0] * wb[..., 0] + wa[..., 1] * wb[..., 1]
    den = jnp.sqrt(jnp.maximum(waxy * wbxy, 1e-20))
    ok = (waxy > 0) & (wbxy > 0)
    return jnp.where(ok, jnp.clip(num / den, -1.0, 1.0), 1.0)


def fourier_f(ft: FourierTable, wo, wi, m_cap: int = M_CAP):
    """FourierBSDF::f (reflection.rs:1498-1586), radiance transport."""
    mu_i = -wi[..., 2]
    mu_o = wo[..., 2]
    cos_phi = _cos_d_phi(-wi, wo)
    ok, ak = _accumulate_ak(ft, mu_i, mu_o, m_cap)
    y = jnp.maximum(_fourier_sum(ak[..., 0:m_cap], cos_phi, m_cap), 0.0)
    r = _fourier_sum(ak[..., m_cap : 2 * m_cap], cos_phi, m_cap)
    bl = _fourier_sum(ak[..., 2 * m_cap : 3 * m_cap], cos_phi, m_cap)
    g = 1.39829 * y - 0.100913 * bl - 0.297375 * r
    scale = jnp.where(mu_i != 0.0, 1.0 / jnp.maximum(jnp.abs(mu_i), 1e-20), 0.0)
    # adjoint eta^2 factor for transmission (radiance mode)
    trans = mu_i * mu_o > 0.0
    eta = jnp.where(mu_i > 0.0, 1.0 / ft.eta, ft.eta)
    scale = scale * jnp.where(trans, eta * eta, 1.0)
    rgb = jnp.stack([r, g, bl], -1) * scale[..., None]
    rgb = jnp.where(ok[..., None], jnp.maximum(rgb, 0.0), 0.0)
    return rgb


def fourier_pdf(ft: FourierTable, wo, wi, m_cap: int = M_CAP):
    """FourierBSDF::pdf (reflection.rs:1726-1790): luminance series over the
    o-row CDF normalization."""
    MU = ft.mu.shape[0]
    mu_i = -wi[..., 2]
    mu_o = wo[..., 2]
    cos_phi = _cos_d_phi(-wi, wo)
    ok, ak = _accumulate_ak(ft, mu_i, mu_o, m_cap)
    y = jnp.maximum(_fourier_sum(ak[..., 0:m_cap], cos_phi, m_cap), 0.0)
    _, off_o, wo4 = _cr_weights_dyn(ft.mu, mu_o)
    rho = jnp.zeros_like(mu_o)
    for b in range(4):
        row = jnp.clip(off_o + b, 0, MU - 1)
        rho = rho + wo4[b] * ft.cdf[row, MU - 1] * (2.0 * jnp.pi)
    return jnp.where(ok & (rho > 0.0), y / jnp.maximum(rho, 1e-20), 0.0)


def fourier_sample(ft: FourierTable, wo, u2, m_cap: int = M_CAP):
    """FourierBSDF::sample_f (reflection.rs:1593-1724): exact CDF inversion
    for mu_i, fixed-step Newton for phi.  Returns (wi, pdf, f_rgb)."""
    MU = ft.mu.shape[0]
    mu_o = wo[..., 2]
    _, off_o, wo4 = _cr_weights_dyn(ft.mu, mu_o)

    # interpolate the o-row of (a0, cdf) with the 4 spline weights
    def row_interp(table2d):
        out = 0.0
        for b in range(4):
            row = jnp.clip(off_o + b, 0, MU - 1)
            out = out + wo4[b][..., None] * table2d[row]
        return out  # (N, MU)

    vals = row_interp(ft.a0)
    cdfs = row_interp(ft.cdf)
    # invert the interpolated CDF along mu_i (sample_catmull_rom_2d)
    maximum = cdfs[..., -1]
    uu = u2[..., 1] * maximum
    cnt = jnp.sum((cdfs <= uu[..., None]).astype(jnp.int32), axis=-1)
    idx = jnp.clip(cnt - 1, 0, MU - 2)
    take = lambda a, i: jnp.take_along_axis(a, jnp.clip(i, 0, MU - 1)[..., None], -1)[..., 0]
    f0 = take(vals, idx)
    f1 = take(vals, idx + 1)
    x0 = ft.mu[idx]
    x1 = ft.mu[idx + 1]
    width = x1 - x0
    u_loc = (uu - take(cdfs, idx)) / jnp.maximum(width, 1e-20)
    fm1 = take(vals, idx - 1)
    f2 = take(vals, idx + 2)
    xm1 = ft.mu[jnp.maximum(idx - 1, 0)]
    xp2 = ft.mu[jnp.minimum(idx + 2, MU - 1)]
    d0 = jnp.where(idx > 0, width * (f1 - fm1) / jnp.maximum(x1 - xm1, 1e-20), f1 - f0)
    d1 = jnp.where(idx + 2 < MU, width * (f2 - f0) / jnp.maximum(xp2 - x0, 1e-20), f1 - f0)
    t = jnp.where(
        jnp.abs(f0 - f1) > 1e-20,
        (f0 - jnp.sqrt(jnp.maximum(f0 * f0 + 2.0 * u_loc * (f1 - f0), 0.0)))
        / jnp.where(jnp.abs(f0 - f1) > 1e-20, f0 - f1, 1.0),
        u_loc / jnp.maximum(f0, 1e-20),
    )
    a_b = jnp.zeros_like(t)
    b_b = jnp.ones_like(t)
    fhat = f0
    for _ in range(12):
        t = jnp.where((t >= a_b) & (t <= b_b), t, 0.5 * (a_b + b_b))
        f_hat = t * (
            f0 + t * (0.5 * d0 + t * ((1.0 / 3.0) * (-2.0 * d0 - d1) + f1 - f0
                                      + t * (0.25 * (d0 + d1) + 0.5 * (f0 - f1))))
        )
        fhat = f0 + t * (d0 + t * (-2.0 * d0 - d1 + 3.0 * (f1 - f0)
                                   + t * (d0 + d1 + 2.0 * (f0 - f1))))
        below = f_hat < u_loc
        a_b = jnp.where(below, t, a_b)
        b_b = jnp.where(below, b_b, t)
        t = t - (f_hat - u_loc) / jnp.where(jnp.abs(fhat) < 1e-12, 1e-12, fhat)
    mu_i = x0 + width * jnp.clip(t, 0.0, 1.0)
    pdf_mu = jnp.maximum(fhat, 0.0) / jnp.maximum(maximum, 1e-20)

    # coefficients at (mu_i, mu_o) and the phi inversion
    ok, ak = _accumulate_ak(ft, mu_i, mu_o, m_cap)
    ak_y = ak[..., 0:m_cap]
    u = u2[..., 0]
    flip = u >= 0.5
    u_side = jnp.where(flip, 1.0 - 2.0 * (u - 0.5), 2.0 * u)
    a0c = ak_y[..., 0]
    ak_t = jnp.moveaxis(ak_y, -1, 0)  # (m_cap, N)
    recip = jnp.concatenate(
        [jnp.ones(1, jnp.float32), 1.0 / jnp.arange(1, m_cap, dtype=jnp.float32)]
    )

    def cf_and_deriv(phi):
        """F(phi) = a0*phi + sum ak/k sin(k phi) and f(phi) = sum ak cos(k phi)
        via a lax.scan over the double-angle recurrence."""
        cos_phi = jnp.cos(phi)
        sin_phi = jnp.sqrt(jnp.maximum(1.0 - cos_phi * cos_phi, 0.0))

        def step(carry, inp):
            sin_prev, sin_cur, cos_prev, cos_cur, cf, fd = carry
            ak_k, rk = inp
            sin_next = 2.0 * cos_phi * sin_cur - sin_prev
            cos_next = 2.0 * cos_phi * cos_cur - cos_prev
            cf = cf + ak_k * rk * sin_next
            fd = fd + ak_k * cos_next
            return (sin_cur, sin_next, cos_cur, cos_next, cf, fd), None

        init = (
            -sin_phi, jnp.zeros_like(phi), cos_phi, jnp.ones_like(phi),
            a0c * phi, a0c + jnp.zeros_like(phi),
        )
        (_sp, _s, _c0, _c1, cf, fd), _ = jax.lax.scan(
            step, init, (ak_t[1:], recip[1:])
        )
        return cf, fd

    def newton_body(_, carry):
        a_ph, b_ph, phi, _fd = carry
        cf, fd = cf_and_deriv(phi)
        cf = cf - u_side * a0c * jnp.pi
        b_ph = jnp.where(cf > 0.0, phi, b_ph)
        a_ph = jnp.where(cf > 0.0, a_ph, phi)
        phi_n = phi - cf / jnp.where(jnp.abs(fd) < 1e-12, 1e-12, fd)
        phi = jnp.where((phi_n > a_ph) & (phi_n < b_ph), phi_n, 0.5 * (a_ph + b_ph))
        return a_ph, b_ph, phi, fd

    carry = (
        jnp.zeros_like(u), jnp.full_like(u, jnp.pi), jnp.full_like(u, 0.5 * jnp.pi),
        a0c + jnp.zeros_like(u),
    )
    carry = jax.lax.fori_loop(0, 20, newton_body, carry)
    _, _, phi, f_der = carry
    phi = jnp.where(flip, 2.0 * jnp.pi - phi, phi)
    pdf_phi = (1.0 / (2.0 * jnp.pi)) * f_der / jnp.maximum(a0c, 1e-20)
    pdf = jnp.maximum(pdf_phi * pdf_mu, 0.0)

    # scattered direction (reflection.rs:1662-1692)
    sin2_i = jnp.maximum(1.0 - mu_i * mu_i, 0.0)
    sin2_o = 1.0 - mu_o * mu_o
    norm = jnp.sqrt(sin2_i / jnp.maximum(sin2_o, 1e-20))
    norm = jnp.where(sin2_o <= 0.0, 0.0, norm)
    sp = jnp.sin(phi)
    cp = jnp.cos(phi)
    wi = -jnp.stack(
        [
            norm * (cp * wo[..., 0] - sp * wo[..., 1]),
            norm * (sp * wo[..., 0] + cp * wo[..., 1]),
            mu_i,
        ],
        axis=-1,
    )
    wi = wi / jnp.maximum(jnp.linalg.norm(wi, axis=-1, keepdims=True), 1e-20)
    f_rgb = fourier_f(ft, wo, wi, m_cap)
    pdf = jnp.where(ok, pdf, 0.0)
    return wi, pdf, f_rgb
