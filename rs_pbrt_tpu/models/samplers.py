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


def make_sampler(kind: int, spp: int, resolution=(1, 1), seed: int = 0) -> SamplerCfg:
    res = max(resolution[0], resolution[1])
    log2res = int(np.ceil(np.log2(max(res, 1))))
    if kind in (SOBOL, ZEROTWO, MAXMIN) and spp & (spp - 1):
        spp = 1 << int(np.ceil(np.log2(spp)))  # round up pow2 like sobol.rs:40
    return SamplerCfg(kind, spp, log2res, seed)


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
    else:
        z = jnp.zeros_like(sample_num)
        idx = u64.U64(z, z)
    return SampleCtx(pixel, sample_num, idx)


def _pixel_hash(cfg: SamplerCfg, ctx: SampleCtx, dim):
    px = ctx.pixel[..., 0].astype(U32)
    py = ctx.pixel[..., 1].astype(U32)
    return rngmod.uniform_u32(
        px, py, jnp.asarray(dim, U32), U32(cfg.seed & 0xFFFFFFFF)
    )


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
    # RANDOM and fallback
    px = ctx.pixel[..., 0].astype(U32)
    py = ctx.pixel[..., 1].astype(U32)
    return rngmod.uniform_float(
        px, py, ctx.sample_num, jnp.asarray(dim, U32), U32(cfg.seed & 0xFFFFFFFF)
    )


def get_2d(cfg: SamplerCfg, ctx: SampleCtx, dim: int):
    if ctx.pss is not None:
        u = ctx.pss.shape[1]
        return jnp.stack([ctx.pss[:, dim % u], ctx.pss[:, (dim + 1) % u]], axis=-1)
    if cfg.kind == SOBOL:
        return jnp.stack([get_1d(cfg, ctx, dim), get_1d(cfg, ctx, dim + 1)], axis=-1)
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
    if cfg.kind == ZEROTWO:
        return ld.van_der_corput_sample(ctx.sample_num, _pixel_hash(cfg, ctx, dim))
    if cfg.kind == STRATIFIED:
        perm = _permute(ctx.sample_num, cfg.spp, _pixel_hash(cfg, ctx, dim))
        jitter = rngmod.uniform_float(_pixel_hash(cfg, ctx, dim), ctx.sample_num, U32(0x9E37))
        return jnp.minimum(
            (perm.astype(jnp.float32) + jitter) / cfg.spp,
            rngmod.FLOAT_ONE_MINUS_EPSILON,
        )
    px = ctx.pixel[..., 0].astype(U32)
    py = ctx.pixel[..., 1].astype(U32)
    return rngmod.uniform_float(
        px, py, ctx.sample_num, jnp.asarray(dim, U32), U32(cfg.seed & 0xFFFFFFFF)
    )


def get_2d_dyn(cfg: SamplerCfg, ctx: SampleCtx, dim):
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
    """Pseudorandom permutation of [0, n) via cycle-walking Feistel-lite
    (Kensler-style hash permutation used by correlated multi-jitter)."""
    i = jnp.asarray(i, U32)
    if n <= 1:
        return jnp.zeros_like(i)
    # next pow2 mask
    w = int(2 ** np.ceil(np.log2(n))) - 1
    w_u = U32(w)

    def scramble(x):
        x ^= key
        x *= U32(0xE170893D)
        x ^= key >> U32(16)
        x ^= (x & w_u) >> U32(4)
        x ^= key >> U32(8)
        x *= U32(0x0929EB3F)
        x ^= key >> U32(23)
        x ^= (x & w_u) >> U32(1)
        x *= U32(1) | key >> U32(27)
        x *= U32(0x6935FA69)
        x ^= (x & w_u) >> U32(11)
        x *= U32(0x74DCCA9A)
        x ^= (x & w_u) >> U32(2)
        x *= U32(0x9E501CC3)
        x ^= (x & w_u) >> U32(2)
        x *= U32(0xC860A3DF)
        x &= w_u
        x ^= x >> U32(5)
        return x

    # scramble, then cycle-walk until < n (pow2 gap < 2x: 8 tries plenty)
    x = scramble(i)
    for _ in range(7):
        x = jnp.where(x >= U32(n), scramble(x), x)
    return jnp.where(x >= U32(n), x % U32(n), x)
