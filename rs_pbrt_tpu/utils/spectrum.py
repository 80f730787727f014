"""RGB spectra and colorimetry.

TPU-native replacement for reference src/core/spectrum.rs.  Spectra are plain
``(..., 3)`` f32 arrays (the reference's Spectrum alias is RGBSpectrum,
src/core/pbrt.rs:12-14, so RGB is full parity).  CIE 1931 tables are loaded
from the extracted data file (see tools/extract_tables.py) and match the
reference's 471-sample curves bit-for-bit.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

_DATA = np.load(Path(__file__).resolve().parent.parent / "data" / "tables.npz")

CIE_LAMBDA = _DATA["cie_lambda"]
CIE_X = _DATA["cie_x"]
CIE_Y = _DATA["cie_y"]
CIE_Z = _DATA["cie_z"]
N_CIE_SAMPLES = 471
CIE_Y_INTEGRAL = 106.856895  # reference: src/core/spectrum.rs:1481
N_SPECTRAL_SAMPLES = 60
SAMPLED_LAMBDA_START = 400.0
SAMPLED_LAMBDA_END = 700.0


def luminance(rgb):
    """y() luminance (reference spectrum.rs:1581)."""
    w = jnp.asarray([0.212671, 0.715160, 0.072169], rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


def rgb_to_xyz(rgb):
    """reference spectrum.rs:1822-1836."""
    m = jnp.asarray(
        [
            [0.412453, 0.357580, 0.180423],
            [0.212671, 0.715160, 0.072169],
            [0.019334, 0.119193, 0.950227],
        ],
        rgb.dtype,
    )
    return jnp.einsum("ij,...j->...i", m, rgb)


def xyz_to_rgb(xyz):
    m = jnp.asarray(
        [
            [3.240479, -1.537150, -0.498535],
            [-0.969256, 1.875991, 0.041556],
            [0.055648, -0.204043, 1.057311],
        ],
        xyz.dtype,
    )
    return jnp.einsum("ij,...j->...i", m, xyz)


def gamma_correct(v):
    """sRGB OETF (reference spectrum.rs:1865)."""
    v = jnp.asarray(v)
    return jnp.where(
        v <= 0.0031308,
        12.92 * v,
        1.055 * jnp.power(jnp.maximum(v, 1e-8), 1.0 / 2.4) - 0.055,
    )


def inverse_gamma_correct(v):
    v = jnp.asarray(v)
    return jnp.where(
        v <= 0.04045, v / 12.92, jnp.power((v + 0.055) / 1.055, 2.4)
    )


def is_black(rgb):
    return jnp.all(rgb == 0.0, axis=-1)


def blackbody(lambda_nm, temperature):
    """Planck's law, W/(m^2 sr m) (reference spectrum.rs:1483). NumPy host code."""
    lam = np.asarray(lambda_nm, np.float64) * 1e-9
    t = float(temperature)
    if t <= 0.0:
        return np.zeros_like(lam, dtype=np.float32)
    c = 299792458.0
    h = 6.62606957e-34
    kb = 1.3806488e-23
    le = (2.0 * h * c * c) / (lam ** 5 * (np.exp((h * c) / (lam * kb * t)) - 1.0))
    return le.astype(np.float32)


def blackbody_normalized(lambda_nm, temperature):
    """reference spectrum.rs blackbody_normalized."""
    le = blackbody(lambda_nm, temperature)
    lambda_max = 2.8977721e-3 / temperature * 1e9
    max_l = blackbody(np.array([lambda_max]), temperature)
    return le / max_l[0]


def spd_to_rgb(lambdas, values):
    """Resample an SPD (host numpy) to RGB via CIE integration.

    Mirrors reference from_sampled (spectrum.rs:1585): sorts, then integrates
    against the CIE curves by piecewise-linear interpolation at the CIE
    sample wavelengths.
    """
    lambdas = np.asarray(lambdas, np.float64)
    values = np.asarray(values, np.float64)
    order = np.argsort(lambdas)
    lambdas, values = lambdas[order], values[order]
    interp = np.interp(CIE_LAMBDA.astype(np.float64), lambdas, values)
    xyz = np.array(
        [
            np.sum(interp * CIE_X.astype(np.float64)),
            np.sum(interp * CIE_Y.astype(np.float64)),
            np.sum(interp * CIE_Z.astype(np.float64)),
        ]
    )
    scale = (CIE_LAMBDA[-1] - CIE_LAMBDA[0]) / (CIE_Y_INTEGRAL * N_CIE_SAMPLES)
    xyz *= scale
    m = np.array(
        [
            [3.240479, -1.537150, -0.498535],
            [-0.969256, 1.875991, 0.041556],
            [0.055648, -0.204043, 1.057311],
        ]
    )
    return (m @ xyz).astype(np.float32)


_COPPER_RGB = None


def copper_rgb():
    """Measured copper (eta, k) resampled to RGB (reference metal.rs:108-121:
    Spectrum::from_sampled(COPPER_WAVELENGTHS, COPPER_N/K)) — the reference's
    built-in default when a metal material gives no eta/k."""
    global _COPPER_RGB
    if _COPPER_RGB is None:
        wl = _DATA["copper_wavelengths"]
        eta = tuple(float(v) for v in spd_to_rgb(wl, _DATA["copper_n"]))
        k = tuple(float(v) for v in spd_to_rgb(wl, _DATA["copper_k"]))
        _COPPER_RGB = (eta, k)
    return _COPPER_RGB
