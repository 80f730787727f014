"""Samplers as stateless index math: value = f(pixel, sample_index, dim).

TPU-native replacement for reference src/core/sampler.rs + src/samplers/*.
The reference's GlobalSampler design (sampler.rs:196, sobol.rs:110) already
addresses samples by (pixel, sample, dimension); here EVERY sampler is
expressed that way so lanes can be sharded arbitrarily and no mutable
sampler state exists on device.

Dimension budget convention (mirrors the reference's consumption order):
  dims 0,1   film xy
  dim  2     time
  dims 3,4   lens uv
  dims 5+    integrator (see integrators/path.py DIM_* constants)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops import lowdiscrepancy as ld
from ..utils import rng as rngmod
from ..utils import u64

SOBOL = 0
RANDOM = 1
ZEROTWO = 2  # (0,2)-sequence with per-(pixel,dim) scrambles
STRATIFIED = 3
HALTON = 4
MAXMIN = 5

U32 = jnp.uint32


class SamplerCfg(NamedTuple):
    kind: int  # static
    spp: int  # static
    log2_resolution: int  # static: sobol pixel-domain scaling
    seed: int  # static
    # halton GlobalSampler constants (reference halton.rs:85-110):
    # (scale_x, scale_y, exp_x, exp_y, stride, mult_inv_x, mult_inv_y)
    halton: tuple = ()


_HALTON_MAX_RESOLUTION = 128  # reference halton.rs:30 K_MAX_RESOLUTION


def _mult_inverse(a: int, n: int) -> int:
    """Multiplicative inverse of a mod n (reference halton.rs:32-51
    extended-gcd; pow-based since gcd(a,n)=1 for coprime 2^j/3^k scales)."""
    return pow(a, -1, n)


def make_sampler(kind: int, spp: int, resolution=(1, 1), seed: int = 0) -> SamplerCfg:
    res = max(resolution[0], resolution[1])
    log2res = int(np.ceil(np.log2(max(res, 1))))
    if kind in (SOBOL, ZEROTWO, MAXMIN) and spp & (spp - 1):
        spp = 1 << int(np.ceil(np.log2(spp)))  # round up pow2 like sobol.rs:40
    if kind == MAXMIN and spp > (1 << 16):
        raise ValueError("maxmindist supports at most 2^16 samples per pixel")
    halton = ()
    if kind == HALTON:
        scales, exps = [], []
        for i in range(2):
            base = 2 if i == 0 else 3
            scale, exp = 1, 0
            while scale < min(int(resolution[i]), _HALTON_MAX_RESOLUTION):
                scale *= base
                exp += 1
            scales.append(scale)
            exps.append(exp)
        stride = scales[0] * scales[1]
        minv_x = _mult_inverse(scales[1], scales[0]) if scales[0] > 1 else 0
        minv_y = _mult_inverse(scales[0], scales[1]) if scales[1] > 1 else 0
        if spp * stride >= (1 << 32):
            raise ValueError(
                f"halton: spp={spp} x stride={stride} exceeds the 32-bit "
                "index budget of the TPU sampler"
            )
        halton = (scales[0], scales[1], exps[0], exps[1], stride, minv_x, minv_y)
    return SamplerCfg(kind, spp, log2res, seed, halton)


class SampleCtx(NamedTuple):
    """Per-lane sampling context, computed once per (pixel, sample).

    pss: optional (N, U) primary-sample-space vector; when present every
    get_1d/get_2d reads pss[:, dim] directly — the MLT sampler's
    3-stream PrimarySample vector (reference mlt.rs:28-279) expressed as
    data instead of mutable state."""

    pixel: jnp.ndarray  # (N,2) int32
    sample_num: jnp.ndarray  # (N,) uint32
    global_index: u64.U64  # sobol global index (or zeros)
    pss: jnp.ndarray | None = None


def make_ctx(cfg: SamplerCfg, pixel, sample_num, frame_lt_spp: bool = False) -> SampleCtx:
    """frame_lt_spp: STATIC promise that sample_num < cfg.spp for every
    lane (true for the spp-batched render loops) — prunes the 32-iteration
    frame-bit loop of sobol_interval_to_index to ceil(log2(spp)).  SPPM
    passes iteration numbers that can exceed spp, so it stays at 32."""
    pixel = jnp.asarray(pixel, jnp.int32)
    sample_num = jnp.asarray(sample_num, U32)
    if cfg.kind == SOBOL:
        fbits = (
            max(1, int(np.ceil(np.log2(max(cfg.spp, 2))))) if frame_lt_spp else 32
        )
        idx = ld.sobol_interval_to_index(
            cfg.log2_resolution, sample_num, pixel, max_frame_bits=fbits
        )
    elif cfg.kind == HALTON:
        idx = u64.from_u32(_halton_index(cfg, pixel, sample_num))
    else:
        z = jnp.zeros_like(sample_num)
        idx = u64.U64(z, z)
    return SampleCtx(pixel, sample_num, idx)


def _halton_index(cfg: SamplerCfg, pixel, sample_num):
    """Global Halton index of (pixel, sample_num): the reference's
    get_index_for_sample (halton.rs:173-215) — per-pixel offset via CRT on
    the base-2/3 pixel strides, then sample_num strides.  32-bit arithmetic
    (make_sampler rejects spp x stride >= 2^32)."""
    sx, sy, ex, ey, stride, minv_x, minv_y = cfg.halton
    if stride <= 1:
        return jnp.asarray(sample_num, U32)
    pm_x = (pixel[..., 0] % _HALTON_MAX_RESOLUTION).astype(U32)
    pm_y = (pixel[..., 1] % _HALTON_MAX_RESOLUTION).astype(U32)
    do_x = ld.inverse_radical_inverse_2(pm_x, ex)
    do_y = ld.inverse_radical_inverse_3(pm_y, ey)
    offset = (
        do_x * U32((stride // sx) * minv_x % stride)
        + do_y * U32((stride // sy) * minv_y % stride)
    ) % U32(stride)
    return offset + jnp.asarray(sample_num, U32) * U32(stride)


def _pixel_hash(cfg: SamplerCfg, ctx: SampleCtx, dim):
    px = ctx.pixel[..., 0].astype(U32)
    py = ctx.pixel[..., 1].astype(U32)
    return rngmod.uniform_u32(
        px, py, jnp.asarray(dim, U32), U32(cfg.seed & 0xFFFFFFFF)
    )


def _maxmin_film(cfg: SamplerCfg, ctx: SampleCtx):
    """The max-min-distance film pair (reference maxmin.rs:117-126
    start_pixel): x = j/spp, y = C_maxmin . j, with the per-pixel shuffle
    expressed as a random-access index permutation."""
    c_index = int(np.log2(max(cfg.spp, 1)))
    j = _permute(ctx.sample_num, cfg.spp, _pixel_hash(cfg, ctx, 0))
    x = jnp.minimum(
        j.astype(jnp.float32) / cfg.spp, rngmod.FLOAT_ONE_MINUS_EPSILON
    )
    y = ld.max_min_dist_sample(j, c_index)
    return jnp.stack([x, y], axis=-1)


def get_1d(cfg: SamplerCfg, ctx: SampleCtx, dim: int):
    """dim is a static python int (uniform across lanes)."""
    if ctx.pss is not None:
        return ctx.pss[:, dim % ctx.pss.shape[1]]
    if cfg.kind == SOBOL:
        s = ld.sobol_sample(ctx.global_index, dim)
        if dim < 2:
            res = jnp.float32(1 << cfg.log2_resolution)
            p = ctx.pixel[..., dim].astype(jnp.float32)
            s = jnp.clip(s * res - p, 0.0, rngmod.FLOAT_ONE_MINUS_EPSILON)
        return s
    if cfg.kind == HALTON:
        return ld.halton_sample(
            ctx.global_index.lo, dim, cfg.halton[2], cfg.halton[1]
        )
    if cfg.kind == MAXMIN:
        if dim < 2:
            return _maxmin_film(cfg, ctx)[..., dim]
        cfg = cfg._replace(kind=ZEROTWO)  # higher dims: (0,2)-sequence family
    if cfg.kind == ZEROTWO:
        scr = _pixel_hash(cfg, ctx, dim)
        if dim < 2:
            # film dims: (0,2)-sequence over sample index, per-pixel scramble
            return ld.van_der_corput_sample(ctx.sample_num, scr)
        return ld.van_der_corput_sample(ctx.sample_num, scr)
    if cfg.kind == STRATIFIED:
        # random-access stratified: stratum = permuted sample index
        perm = _permute(ctx.sample_num, cfg.spp, _pixel_hash(cfg, ctx, dim))
        jitter = rngmod.uniform_float(
            _pixel_hash(cfg, ctx, dim), ctx.sample_num, U32(0x9E37)
        )
        return jnp.minimum(
            (perm.astype(jnp.float32) + jitter) / cfg.spp,
            rngmod.FLOAT_ONE_MINUS_EPSILON,
        )
    if cfg.kind != RANDOM:
        raise ValueError(f"unknown sampler kind {cfg.kind}")
    px = ctx.pixel[..., 0].astype(U32)
    py = ctx.pixel[..., 1].astype(U32)
    return rngmod.uniform_float(
        px, py, ctx.sample_num, jnp.asarray(dim, U32), U32(cfg.seed & 0xFFFFFFFF)
    )


def get_2d(cfg: SamplerCfg, ctx: SampleCtx, dim: int):
    if ctx.pss is not None:
        u = ctx.pss.shape[1]
        return jnp.stack([ctx.pss[:, dim % u], ctx.pss[:, (dim + 1) % u]], axis=-1)
    if cfg.kind in (SOBOL, HALTON):
        return jnp.stack([get_1d(cfg, ctx, dim), get_1d(cfg, ctx, dim + 1)], axis=-1)
    if cfg.kind == MAXMIN:
        if dim < 2:
            return _maxmin_film(cfg, ctx)
        cfg = cfg._replace(kind=ZEROTWO)
    if cfg.kind == ZEROTWO:
        scr_x = _pixel_hash(cfg, ctx, dim)
        scr_y = _pixel_hash(cfg, ctx, dim + 1)
        pt = ld.sobol_02(ctx.sample_num, scr_x, scr_y)
        return pt
    if cfg.kind == STRATIFIED:
        # 2D strata on a near-square grid of spp cells, permuted per pixel/dim
        nx = 1 << int(np.floor(np.log2(max(cfg.spp, 1)) / 2))
        ny = max(cfg.spp // max(nx, 1), 1)
        perm = _permute(ctx.sample_num, nx * ny, _pixel_hash(cfg, ctx, dim))
        sx = (perm % U32(nx)).astype(jnp.float32)
        sy = (perm // U32(nx)).astype(jnp.float32)
        jx = rngmod.uniform_float(_pixel_hash(cfg, ctx, dim), ctx.sample_num, U32(1))
        jy = rngmod.uniform_float(_pixel_hash(cfg, ctx, dim + 1), ctx.sample_num, U32(2))
        x = jnp.minimum((sx + jx) / nx, rngmod.FLOAT_ONE_MINUS_EPSILON)
        y = jnp.minimum((sy + jy) / ny, rngmod.FLOAT_ONE_MINUS_EPSILON)
        return jnp.stack([x, y], axis=-1)
    return jnp.stack([get_1d(cfg, ctx, dim), get_1d(cfg, ctx, dim + 1)], axis=-1)


def get_1d_dyn(cfg: SamplerCfg, ctx: SampleCtx, dim):
    """get_1d with a TRACED dim (integrator dims >= 5: no film remap).

    Needed so the bounce loop can be a lax.fori_loop instead of a python
    unroll (compile time ~ O(1) in max_depth)."""
    if cfg.kind == SOBOL:
        return ld.sobol_sample(ctx.global_index, dim)
    if cfg.kind == HALTON:
        return ld.halton_sample_dyn(ctx.global_index.lo, dim)
    if cfg.kind == MAXMIN:
        cfg = cfg._replace(kind=ZEROTWO)  # traced dims are integrator dims >= 5
    if cfg.kind == ZEROTWO:
        return ld.van_der_corput_sample(ctx.sample_num, _pixel_hash(cfg, ctx, dim))
    if cfg.kind == STRATIFIED:
        perm = _permute(ctx.sample_num, cfg.spp, _pixel_hash(cfg, ctx, dim))
        jitter = rngmod.uniform_float(_pixel_hash(cfg, ctx, dim), ctx.sample_num, U32(0x9E37))
        return jnp.minimum(
            (perm.astype(jnp.float32) + jitter) / cfg.spp,
            rngmod.FLOAT_ONE_MINUS_EPSILON,
        )
    if cfg.kind != RANDOM:
        raise ValueError(f"unknown sampler kind {cfg.kind}")
    px = ctx.pixel[..., 0].astype(U32)
    py = ctx.pixel[..., 1].astype(U32)
    return rngmod.uniform_float(
        px, py, ctx.sample_num, jnp.asarray(dim, U32), U32(cfg.seed & 0xFFFFFFFF)
    )


def get_2d_dyn(cfg: SamplerCfg, ctx: SampleCtx, dim):
    if cfg.kind == MAXMIN:
        cfg = cfg._replace(kind=ZEROTWO)
    if cfg.kind == ZEROTWO:
        return ld.sobol_02(
            ctx.sample_num, _pixel_hash(cfg, ctx, dim), _pixel_hash(cfg, ctx, dim + 1)
        )
    return jnp.stack(
        [get_1d_dyn(cfg, ctx, dim), get_1d_dyn(cfg, ctx, dim + 1)], axis=-1
    )


def get_dims(cfg: SamplerCfg, ctx: SampleCtx, dim0, n_dims: int):
    """All integrator dims for a bounce in one shot: (N, n_dims), or None
    to signal the caller to fall back to per-dim calls.

    For Sobol' on TPU this runs the fused Pallas bit-matrix kernel
    (ops/pallas_sobol.py) — the XLA lowering of the per-dim XOR chains was
    the single largest cost in the whole integrator."""
    if cfg.kind == SOBOL:
        import jax

        if jax.default_backend() in ("tpu", "axon"):
            from ..ops.pallas_sobol import sobol_dims

            # static index-width bound: sobol_interval_to_index yields
            # index < spp << 2*log2res (lowdiscrepancy.rs:1014) — when that
            # fits u32 the kernel skips the high-word XOR chain
            bits = 32 if cfg.spp * (4 ** cfg.log2_resolution) <= (1 << 32) else 52
            return sobol_dims(
                ctx.global_index.hi, ctx.global_index.lo, dim0, n_dims,
                index_bits=bits,
            )
        return jnp.stack(
            [get_1d_dyn(cfg, ctx, dim0 + k) for k in range(n_dims)], axis=-1
        )
    if cfg.kind == HALTON and isinstance(dim0, int):
        # per-dim prime bases are static: unroll the dims here so the
        # fori_loop bounce body can dynamic-slice one hoisted table
        return jnp.stack(
            [get_1d(cfg, ctx, dim0 + k) for k in range(n_dims)], axis=-1
        )
    return None


def get_camera_dims(cfg: SamplerCfg, ctx: SampleCtx, pixel):
    """(u_film, u_time, u_lens) for camera-ray generation in ONE sampler
    pass.  On the Sobol' TPU path, dims 0-4 come from a single Pallas
    launch instead of five per-dim XLA XOR chains (the per-dim chains were
    ~7ms of the raygen cost at 4M lanes); the film-dim pixel remap of
    get_1d (dims 0,1) is applied here."""
    if cfg.kind == SOBOL and ctx.pss is None:
        dims5 = get_dims(cfg, ctx, 0, 5)
        if dims5 is not None:
            res = jnp.float32(1 << cfg.log2_resolution)
            pf = pixel.astype(jnp.float32)
            u_film = jnp.clip(
                dims5[:, 0:2] * res - pf, 0.0, rngmod.FLOAT_ONE_MINUS_EPSILON
            )
            return u_film, dims5[:, 2], dims5[:, 3:5]
    return get_2d(cfg, ctx, 0), get_1d(cfg, ctx, 2), get_2d(cfg, ctx, 3)


def _permute(i, n: int, key):
    """Pseudorandom permutation of [0, n) via cycle-walking a k-bit-domain
    permutation (k = ceil(log2 n)).

    Every round op is individually bijective on [0, 2^k): odd-constant
    multiply mod 2^k, constant XOR/add mod 2^k, and x ^= x >> s (an
    invertible upper-triangular linear map).  This matters: a Kensler-style
    hash with an even multiplier (0x74DCCA9A) is provably 2-to-1 mod any
    power of two — all its low-bit operations depend only on low bits, so
    lost low-bit information never comes back (round-1 bug: duplicated
    strata in the stratified sampler)."""
    i = jnp.asarray(i, U32)
    if n <= 1:
        return jnp.zeros_like(i)
    k = int(np.ceil(np.log2(n)))
    mask = U32((1 << k) - 1)
    key = jnp.asarray(key, U32)
    # per-key round constants (splitmix-style host-free mixing)
    c1 = (key * U32(0x9E3779B9) + U32(0x85EBCA6B)) & mask
    c2 = ((key ^ U32(0xC2B2AE35)) * U32(0x27D4EB2F) + U32(0x165667B1)) & mask
    s1 = U32(max(1, k // 2))
    s2 = U32(max(1, (k + 2) // 3))

    def perm(x):
        x = (x * U32(0x2545F491)) & mask  # odd
        x = x ^ c1
        x = x ^ (x >> s1)
        x = (x + c2) & mask
        x = (x * U32(0x6935FA69)) & mask  # odd
        x = x ^ (x >> s2)
        x = x ^ (c1 >> U32(1))
        x = (x * U32(0x9E501CC3)) & mask  # odd
        x = x ^ (x >> s1)
        return x

    # cycle-walk: repeatedly apply the same 2^k permutation until the value
    # lands in [0, n); the induced map on [0, n) is a permutation.  Pow2 gap
    # is < 2x so 15 retries leave < 2^-16 fallback probability per lane.
    x = perm(i)
    for _ in range(15):
        x = jnp.where(x >= U32(n), perm(x), x)
    return jnp.where(x >= U32(n), x % U32(n), x)
