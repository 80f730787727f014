"""Film accumulation as deterministic scatter-add.

TPU-native replacement for reference src/core/film.rs + src/filters/*.
The reference merges per-tile buffers under RwLock (film.rs:346) and splats
under lock; here samples scatter-add into per-device film arrays with
``.at[].add`` (XLA lowers to efficient on-chip scatter), and cross-device
reduction is a psum at the end (see parallel/).

Filters are evaluated analytically per footprint tap instead of the
reference's 16x16 lookup table (film.rs:198-211) — same filters, exact
weights, branchless.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils import vecmath as vm

FILTER_BOX = 0
FILTER_TRIANGLE = 1
FILTER_GAUSSIAN = 2
FILTER_MITCHELL = 3
FILTER_SINC = 4


class FilterCfg(NamedTuple):
    kind: int  # static
    xwidth: float  # static
    ywidth: float  # static
    alpha: float  # static (gaussian)
    b: float  # static (mitchell)
    c: float  # static
    tau: float  # static (sinc)


def make_filter(kind=FILTER_BOX, xwidth=None, ywidth=None, alpha=2.0, b=1.0 / 3.0, c=1.0 / 3.0, tau=3.0):
    defaults = {
        FILTER_BOX: 0.5,
        FILTER_TRIANGLE: 2.0,
        FILTER_GAUSSIAN: 2.0,
        FILTER_MITCHELL: 2.0,
        FILTER_SINC: 4.0,
    }
    w = defaults[kind]
    return FilterCfg(kind, xwidth or w, ywidth or w, alpha, b, c, tau)


def filter_eval(cfg: FilterCfg, x, y):
    """Evaluate filter at offset (x, y) from the sample (reference
    src/filters/*.rs evaluate)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    inside = (ax <= cfg.xwidth) & (ay <= cfg.ywidth)
    if cfg.kind == FILTER_BOX:
        # half-open support: a sample exactly on a pixel corner (Sobol's
        # first sample is (0,0)) belongs to its own pixel only.  The
        # reference's inclusive edge splats such samples into the left/top
        # neighbor too (film.rs:94-147) — a knife-edge artifact, not a
        # semantic; half-open keeps the scatter and grid film paths equal.
        inside = (x > -cfg.xwidth) & (x <= cfg.xwidth) & (y > -cfg.ywidth) & (y <= cfg.ywidth)
        w = jnp.ones_like(x)
    elif cfg.kind == FILTER_TRIANGLE:
        w = jnp.maximum(0.0, cfg.xwidth - ax) * jnp.maximum(0.0, cfg.ywidth - ay)
    elif cfg.kind == FILTER_GAUSSIAN:
        ex = jnp.exp(-cfg.alpha * x * x) - np.exp(-cfg.alpha * cfg.xwidth**2)
        ey = jnp.exp(-cfg.alpha * y * y) - np.exp(-cfg.alpha * cfg.ywidth**2)
        w = jnp.maximum(0.0, ex) * jnp.maximum(0.0, ey)
    elif cfg.kind == FILTER_MITCHELL:
        w = _mitchell_1d(cfg, x / cfg.xwidth) * _mitchell_1d(cfg, y / cfg.ywidth)
    else:  # SINC (lanczos windowed)
        w = _sinc_1d(cfg, x / cfg.xwidth) * _sinc_1d(cfg, y / cfg.ywidth)
    return jnp.where(inside, w, 0.0)


def _mitchell_1d(cfg, x):
    x = jnp.abs(2.0 * x)
    b, c = cfg.b, cfg.c
    big = (
        (-b - 6 * c) * x**3 + (6 * b + 30 * c) * x**2 + (-12 * b - 48 * c) * x + (8 * b + 24 * c)
    ) * (1.0 / 6.0)
    small = (
        (12 - 9 * b - 6 * c) * x**3 + (-18 + 12 * b + 6 * c) * x**2 + (6 - 2 * b)
    ) * (1.0 / 6.0)
    return jnp.where(x > 1.0, jnp.where(x < 2.0, big, 0.0), small)


def _sinc_1d(cfg, x):
    x = jnp.abs(x)
    s = lambda v: jnp.where(v < 1e-5, 1.0, jnp.sin(vm.PI * v) / (vm.PI * v))
    lanczos = s(x) * s(x / cfg.tau)
    return jnp.where(x > cfg.tau, 0.0, lanczos)


class Film(NamedTuple):
    rgb: jnp.ndarray  # (H, W, 3) weighted sums
    weight: jnp.ndarray  # (H, W)
    splat: jnp.ndarray  # (H, W, 3)


def make_film(resolution) -> Film:
    w, h = resolution
    return Film(
        jnp.zeros((h, w, 3), jnp.float32),
        jnp.zeros((h, w), jnp.float32),
        jnp.zeros((h, w, 3), jnp.float32),
    )


def footprint(cfg: FilterCfg) -> int:
    """Static number of pixel taps per axis covering the filter support."""
    return int(np.floor(2.0 * max(cfg.xwidth, cfg.ywidth) + 0.9999)) + 1


def add_samples(film: Film, cfg: FilterCfg, p_film, L) -> Film:
    """Splat N samples (reference FilmTile::add_sample film.rs:94-147).

    p_film: (N,2) raster positions, L: (N,3).  Discrete-continuous offset:
    a sample at p contributes to pixels px with weight f(px + 0.5 - p).
    """
    h, w = film.weight.shape
    pd = p_film - 0.5
    base = jnp.floor(pd - jnp.asarray([cfg.xwidth - 0.5, cfg.ywidth - 0.5])).astype(jnp.int32)
    F = footprint(cfg)
    rgb, weight = film.rgb, film.weight
    # clamp NaN/inf samples to black like the reference's sanity check
    # (integrator.rs:165-193)
    bad = ~jnp.all(jnp.isfinite(L), axis=-1)
    L = jnp.where(bad[..., None], 0.0, L)
    for dy in range(F):
        for dx in range(F):
            px = base[:, 0] + dx
            py = base[:, 1] + dy
            wgt = filter_eval(cfg, px.astype(jnp.float32) + 0.5 - p_film[:, 0], py.astype(jnp.float32) + 0.5 - p_film[:, 1])
            inb = (px >= 0) & (px < w) & (py >= 0) & (py < h)
            wgt = jnp.where(inb, wgt, 0.0)
            pxc = jnp.clip(px, 0, w - 1)
            pyc = jnp.clip(py, 0, h - 1)
            rgb = rgb.at[pyc, pxc].add(wgt[:, None] * L)
            weight = weight.at[pyc, pxc].add(wgt)
    return Film(rgb, weight, film.splat)


def add_samples_grid(film: Film, cfg: FilterCfg, L, nb: int, rect=None) -> Film:
    """Scatter-free film update for the common render() layout: the lane
    array is nb ordered copies of a (cropped) pixel grid and the filter is
    a box of width <= 0.5 pixels (every sample lands in exactly its own
    pixel).  The per-pixel scatter-add (slow on TPU) becomes a dense
    reshape+sum.  rect: optional static (y0, h, x0, w) crop window
    (reference film.rs:185,224-262).  Falls back to None when inapplicable."""
    if not (cfg.kind == FILTER_BOX and cfg.xwidth <= 0.5 and cfg.ywidth <= 0.5):
        return None
    fh, fw = film.weight.shape
    y0, h, x0, w = rect if rect is not None else (0, fh, 0, fw)
    bad = ~jnp.all(jnp.isfinite(L), axis=-1)
    L = jnp.where(bad[..., None], 0.0, L)
    add = L.reshape(nb, h, w, 3).sum(0)
    rgb = film.rgb.at[y0 : y0 + h, x0 : x0 + w].add(add)
    weight = film.weight.at[y0 : y0 + h, x0 : x0 + w].add(float(nb))
    return Film(rgb, weight, film.splat)


def add_splats(film: Film, p_film, L) -> Film:
    """Unfiltered splat accumulation (reference Film::add_splat film.rs:388)."""
    h, w = film.weight.shape
    px = jnp.clip(p_film[:, 0].astype(jnp.int32), 0, w - 1)
    py = jnp.clip(p_film[:, 1].astype(jnp.int32), 0, h - 1)
    inb = (p_film[:, 0] >= 0) & (p_film[:, 0] < w) & (p_film[:, 1] >= 0) & (p_film[:, 1] < h)
    good = jnp.all(jnp.isfinite(L), axis=-1) & inb
    Ls = jnp.where(good[..., None], L, 0.0)
    return Film(film.rgb, film.weight, film.splat.at[py, px].add(Ls))


def to_rgb(film: Film, splat_scale: float = 1.0):
    """Resolve to linear RGB (reference Film::write_image film.rs:438-528)."""
    w = jnp.maximum(film.weight[..., None], 0.0)
    img = jnp.where(w > 0.0, film.rgb / jnp.maximum(w, 1e-12), 0.0)
    return img + splat_scale * film.splat
