"""MipMap pyramids — reference src/core/mipmap.rs.

Host-side (numpy): Lanczos resample of non-power-of-two images up to pow2
(mipmap.rs:56-196 resample_weights path) and 2x2 box pyramid construction.
Device-side: trilinear width lookup (mipmap.rs:233-270 lookup_pnt_flt) as
two bilinear atlas fetches lerped by the fractional level — the pyramid
levels live in the same packed texture atlas, one rect per (texture,
level).

Width source: the reference uses per-ray differentials; the wavefront
renderer passes a ray-cone footprint estimate (0 = finest level, matching
the reference's behavior when differentials are absent).
"""

from __future__ import annotations

import numpy as np

MAX_LEVELS = 12


def _lanczos(x, tau=2.0):
    x = np.abs(x)
    out = np.where(
        x < 1e-5, 1.0,
        np.where(
            x > 1.0, 0.0,
            np.sinc(x) * np.sinc(x / tau),
        ),
    )
    return out


def _resample_weights(old_res, new_res):
    """4-tap Lanczos magnification weights (mipmap.rs resample_weights)."""
    assert new_res >= old_res
    filter_width = 2.0
    first = np.zeros(new_res, np.int32)
    w = np.zeros((new_res, 4), np.float64)
    for i in range(new_res):
        center = (i + 0.5) * old_res / new_res
        first[i] = int(np.floor(center - filter_width + 0.5))
        for j in range(4):
            pos = first[i] + j + 0.5
            w[i, j] = _lanczos((pos - center) / filter_width)
        s = w[i].sum()
        if s != 0:
            w[i] /= s
    return first, w.astype(np.float32)


def _wrap_idx(idx, n, wrap):
    if wrap == 0:  # repeat
        return np.mod(idx, n)
    if wrap == 1:  # clamp
        return np.clip(idx, 0, n - 1)
    return np.clip(idx, 0, n - 1)  # black handled by caller bounds


def resample_pow2(img, wrap=0):
    """Resample (H,W,3) to power-of-two dims with separable Lanczos."""
    h, w = img.shape[:2]
    w2 = 1 << int(np.ceil(np.log2(max(w, 1))))
    h2 = 1 << int(np.ceil(np.log2(max(h, 1))))
    if w2 == w and h2 == h:
        return img.astype(np.float32)
    out = img.astype(np.float64)
    if w2 != w:
        first, wt = _resample_weights(w, w2)
        cols = _wrap_idx(first[:, None] + np.arange(4)[None, :], w, wrap)  # (w2,4)
        out = (out[:, cols, :] * wt[None, :, :, None]).sum(2)
    if h2 != h:
        first, wt = _resample_weights(h, h2)
        rows = _wrap_idx(first[:, None] + np.arange(4)[None, :], h, wrap)
        out = (out[rows, :, :] * wt[:, :, None, None]).sum(1)
    return np.maximum(out, 0.0).astype(np.float32)


def build_pyramid(img, wrap=0, max_levels=MAX_LEVELS):
    """Full mip chain from (H,W,3); level 0 is the pow2-resampled base."""
    base = resample_pow2(np.asarray(img, np.float32), wrap)
    levels = [base]
    cur = base
    while min(cur.shape[0], cur.shape[1]) > 1 and len(levels) < max_levels:
        h, w = cur.shape[:2]
        nh, nw = max(h // 2, 1), max(w // 2, 1)
        # 2x2 box of the previous level (mipmap.rs:150-196 texel average)
        ys = np.minimum(2 * np.arange(nh), h - 1)
        xs = np.minimum(2 * np.arange(nw), w - 1)
        ys1 = np.minimum(ys + 1, h - 1)
        xs1 = np.minimum(xs + 1, w - 1)
        cur = 0.25 * (
            cur[np.ix_(ys, xs)] + cur[np.ix_(ys, xs1)]
            + cur[np.ix_(ys1, xs)] + cur[np.ix_(ys1, xs1)]
        )
        levels.append(cur.astype(np.float32))
    return levels
