"""Pallas TPU kernel: dense ray-triangle closest-hit sweep.

The XLA lowering of the (R,T) brute-force sweep (ops/intersect.py) splits
into multiple fusions with (R,T) intermediates round-tripping through HBM
(~22ms per bounce at 262k rays x 32 tris).  This kernel keeps the whole
watertight test in VMEM/registers: rays stream through the grid as (8,128)
tiles, triangle rows load once per grid step, and the running best hit is
carried in registers — HBM traffic is exactly rays-in + hits-out.

Same math as ops/intersect.intersect_tri (reference triangle.rs:134-449
watertight algorithm with conservative error bounds).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import vecmath as vm
from .intersect import TriHit

LANE = 128
SUB = 64
TILE = SUB * LANE  # rays per grid step
BIG = np.float32(3e38)


def _ray_constants(ox, oy, oz, dx, dy, dz):
    """Per-ray shear-permutation as a 3x3 matrix + origin offset, computed
    ONCE per ray tile.  Equivalent to the reference's permute+shear
    (triangle.rs:154-222): rows are
      S_x = onehot(kx) + sx * onehot(kz)
      S_y = onehot(ky) + sy * onehot(kz)
      S_z = onehot(kz)            (z scaling by inv_dz applied separately)
    Shared vertices transform identically for a given ray, so adjacency
    watertightness is preserved."""
    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    use_x = (adx >= ady) & (adx >= adz)
    use_y = (~use_x) & (ady >= adz)
    use_z = ~(use_x | use_y)
    zero = jnp.zeros_like(dx)
    one = jnp.ones_like(dx)
    # onehot rows for kz / kx / ky  (kx = kz+1 mod 3, ky = kx+1 mod 3)
    hz = (jnp.where(use_x, one, zero), jnp.where(use_y, one, zero), jnp.where(use_z, one, zero))
    hx = (hz[2], hz[0], hz[1])  # kz=0->kx=1? careful: kx=kz+1: onehot shifts
    hy = (hz[1], hz[2], hz[0])
    # kz=0 -> kx=1: hx = e1 when kz=0 -> hx components: (0,1,0) = shift of hz
    dzp = hz[0] * dx + hz[1] * dy + hz[2] * dz
    dxp = hx[0] * dx + hx[1] * dy + hx[2] * dz
    dyp = hy[0] * dx + hy[1] * dy + hy[2] * dz
    inv_dz = 1.0 / dzp
    sx = -dxp * inv_dz
    sy = -dyp * inv_dz
    # S rows (3 components each)
    Sx = (hx[0] + sx * hz[0], hx[1] + sx * hz[1], hx[2] + sx * hz[2])
    Sy = (hy[0] + sy * hz[0], hy[1] + sy * hz[1], hy[2] + sy * hz[2])
    Sz = hz
    cx = Sx[0] * ox + Sx[1] * oy + Sx[2] * oz
    cy = Sy[0] * ox + Sy[1] * oy + Sy[2] * oz
    cz = Sz[0] * ox + Sz[1] * oy + Sz[2] * oz
    return Sx, Sy, Sz, cx, cy, cz, inv_dz


def _watertight_tri(rc, p0x, p0y, p0z, p1x, p1y, p1z, p2x, p2y, p2z, t_lim):
    """One triangle (scalars) vs a ray tile, given precomputed ray
    constants.  All-FMA inner loop (no per-pair int selects / divides except
    the final inv_det)."""
    Sx, Sy, Sz, cx, cy, cz, inv_dz = rc

    def xform(px, py, pz):
        x = Sx[0] * px + Sx[1] * py + Sx[2] * pz - cx
        y = Sy[0] * px + Sy[1] * py + Sy[2] * pz - cy
        z = Sz[0] * px + Sz[1] * py + Sz[2] * pz - cz
        return x, y, z

    x0, y0, z0 = xform(p0x, p0y, p0z)
    x1, y1, z1 = xform(p1x, p1y, p1z)
    x2, y2, z2 = xform(p2x, p2y, p2z)

    e0 = x1 * y2 - y1 * x2
    e1 = x2 * y0 - y2 * x0
    e2 = x0 * y1 - y0 * x1
    neg = (e0 < 0) | (e1 < 0) | (e2 < 0)
    pos = (e0 > 0) | (e1 > 0) | (e2 > 0)
    det = e0 + e1 + e2

    z0s = inv_dz * z0
    z1s = inv_dz * z1
    z2s = inv_dz * z2
    t_scaled = e0 * z0s + e1 * z1s + e2 * z2s
    # boolean select via logic ops (Mosaic can't select between i1 vectors)
    neg_det = det < 0.0
    miss_range = (neg_det & ((t_scaled >= 0.0) | (t_scaled < t_lim * det))) | (
        (~neg_det) & ((t_scaled <= 0.0) | (t_scaled > t_lim * det))
    )
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    b0 = e0 * inv_det
    b1 = e1 * inv_det
    t = t_scaled * inv_det

    max_zt = jnp.maximum(jnp.maximum(jnp.abs(z0s), jnp.abs(z1s)), jnp.abs(z2s))
    delta_z = vm.gamma(3.0) * max_zt
    max_xt = jnp.maximum(jnp.maximum(jnp.abs(x0), jnp.abs(x1)), jnp.abs(x2))
    max_yt = jnp.maximum(jnp.maximum(jnp.abs(y0), jnp.abs(y1)), jnp.abs(y2))
    delta_x = vm.gamma(5.0) * (max_xt + max_zt)
    delta_y = vm.gamma(5.0) * (max_yt + max_zt)
    delta_e = 2.0 * (vm.gamma(2.0) * max_xt * max_yt + delta_y * max_xt + delta_x * max_yt)
    max_e = jnp.maximum(jnp.maximum(jnp.abs(e0), jnp.abs(e1)), jnp.abs(e2))
    delta_t = (
        3.0 * (vm.gamma(3.0) * max_e * max_zt + delta_e * max_zt + delta_z * max_e)
        * jnp.abs(inv_det)
    )
    hit = ~((neg & pos) | (det == 0.0) | miss_range | (t <= delta_t))
    return hit, t, b0, b1


UNROLL = 8  # triangles per fori_loop iteration (ILP; no carried t_lim dep)


def _sweep_kernel(n_tri: int, ox, oy, oz, dx, dy, dz, tmax, tris, bt_o, bi_o, b0_o, b1_o):
    oxv, oyv, ozv = ox[...], oy[...], oz[...]
    dxv, dyv, dzv = dx[...], dy[...], dz[...]
    tmv = tmax[...]
    rc = _ray_constants(oxv, oyv, ozv, dxv, dyv, dzv)

    def one(t, bt, bi, b0, b1):
        hit, tval, tb0, tb1 = _watertight_tri(
            rc,
            tris[t, 0], tris[t, 1], tris[t, 2],
            tris[t, 3], tris[t, 4], tris[t, 5],
            tris[t, 6], tris[t, 7], tris[t, 8],
            tmv,
        )
        upd = hit & (tval < bt)
        return (
            jnp.where(upd, tval, bt),
            jnp.where(upd, t, bi),
            jnp.where(upd, tb0, b0),
            jnp.where(upd, tb1, b1),
        )

    init = (
        jnp.full(oxv.shape, BIG, jnp.float32),
        jnp.full(oxv.shape, -1, jnp.int32),
        jnp.zeros(oxv.shape, jnp.float32),
        jnp.zeros(oxv.shape, jnp.float32),
    )
    n_pad = -(-n_tri // UNROLL) * UNROLL

    if n_pad <= 64:
        # full static unroll: all addresses constant-folded
        bt, bi, b0, b1 = init
        for t in range(n_tri):
            bt, bi, b0, b1 = one(t, bt, bi, b0, b1)
    else:
        def body(i, state):
            bt, bi, b0, b1 = state
            base = i * UNROLL
            for k in range(UNROLL):
                bt, bi, b0, b1 = one(base + k, bt, bi, b0, b1)
            return bt, bi, b0, b1

        bt, bi, b0, b1 = jax.lax.fori_loop(0, n_pad // UNROLL, body, init)
    bt_o[...] = bt
    bi_o[...] = bi
    b0_o[...] = b0
    b1_o[...] = b1


@partial(jax.jit, static_argnames=("n_tri",))
def _sweep(ox, oy, oz, dx, dy, dz, tmax, tris, n_tri: int):
    rows = ox.shape[0]
    grid = (rows // SUB,)
    ray_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((tris.shape[0], tris.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
    shp_i = jax.ShapeDtypeStruct((rows, LANE), jnp.int32)
    return pl.pallas_call(
        partial(_sweep_kernel, n_tri),
        grid=grid,
        in_specs=[ray_spec] * 7 + [tri_spec],
        out_specs=[out_spec] * 4,
        out_shape=[shp, shp_i, shp, shp],
    )(ox, oy, oz, dx, dy, dz, tmax, tris)


def pack_tris(p0, p1, p2):
    """Host/trace-time packing of triangle SoA into the kernel table
    (rows padded to the unroll factor; zero rows give det==0 -> miss)."""
    t = p0.shape[0]
    t_pad = -(-t // UNROLL) * UNROLL
    tris = jnp.concatenate(
        [p0, p1, p2, jnp.zeros((t, 7), jnp.float32)], axis=1
    )  # (T, 16)
    return jnp.pad(tris, ((0, t_pad - t), (0, 0)))


def pallas_intersect_tris(o, d, t_max, p0, p1, p2, tris_packed=None):
    """Drop-in replacement for intersect.intersect_tris_brute on TPU."""
    r = o.shape[0]
    n_tri = p0.shape[0]
    r_pad = -(-r // TILE) * TILE
    rows = r_pad // LANE

    def prep(v):
        return jnp.pad(v, (0, r_pad - r)).reshape(rows, LANE)

    ox, oy, oz = prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2])
    dx, dy, dz = prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2])
    # padded lanes have degenerate dir (0,0,0): inv_dz = inf -> guaranteed miss
    tm = prep(jnp.asarray(t_max, jnp.float32))

    tris = tris_packed if tris_packed is not None else pack_tris(p0, p1, p2)
    bt, bi, b0, b1 = _sweep(ox, oy, oz, dx, dy, dz, tm, tris, n_tri)

    bt = bt.reshape(-1)[:r]
    bi = bi.reshape(-1)[:r]
    b0 = b0.reshape(-1)[:r]
    b1 = b1.reshape(-1)[:r]
    valid = bi >= 0
    return TriHit(valid, jnp.where(valid, bt, t_max), bi, b0, b1)


def _watertight_tri_any(rc, p0x, p0y, p0z, p1x, p1y, p1z, p2x, p2y, p2z, t_lim):
    """Occlusion-only variant of _watertight_tri: same edge/range tests but
    division-free (the t <= delta_t epsilon test is rescaled by |det|:
    t_scaled/det <= C|1/det|  <=>  t_scaled*sign(det) <= C), and no
    barycentrics.  ~30% fewer ops and no divide per ray-triangle pair."""
    Sx, Sy, Sz, cx, cy, cz, inv_dz = rc

    def xform(px, py, pz):
        x = Sx[0] * px + Sx[1] * py + Sx[2] * pz - cx
        y = Sy[0] * px + Sy[1] * py + Sy[2] * pz - cy
        z = Sz[0] * px + Sz[1] * py + Sz[2] * pz - cz
        return x, y, z

    x0, y0, z0 = xform(p0x, p0y, p0z)
    x1, y1, z1 = xform(p1x, p1y, p1z)
    x2, y2, z2 = xform(p2x, p2y, p2z)

    e0 = x1 * y2 - y1 * x2
    e1 = x2 * y0 - y2 * x0
    e2 = x0 * y1 - y0 * x1
    neg = (e0 < 0) | (e1 < 0) | (e2 < 0)
    pos = (e0 > 0) | (e1 > 0) | (e2 > 0)
    det = e0 + e1 + e2

    z0s = inv_dz * z0
    z1s = inv_dz * z1
    z2s = inv_dz * z2
    t_scaled = e0 * z0s + e1 * z1s + e2 * z2s
    neg_det = det < 0.0
    miss_range = (neg_det & ((t_scaled >= 0.0) | (t_scaled < t_lim * det))) | (
        (~neg_det) & ((t_scaled <= 0.0) | (t_scaled > t_lim * det))
    )

    max_zt = jnp.maximum(jnp.maximum(jnp.abs(z0s), jnp.abs(z1s)), jnp.abs(z2s))
    delta_z = vm.gamma(3.0) * max_zt
    max_xt = jnp.maximum(jnp.maximum(jnp.abs(x0), jnp.abs(x1)), jnp.abs(x2))
    max_yt = jnp.maximum(jnp.maximum(jnp.abs(y0), jnp.abs(y1)), jnp.abs(y2))
    delta_x = vm.gamma(5.0) * (max_xt + max_zt)
    delta_y = vm.gamma(5.0) * (max_yt + max_zt)
    delta_e = 2.0 * (vm.gamma(2.0) * max_xt * max_yt + delta_y * max_xt + delta_x * max_yt)
    max_e = jnp.maximum(jnp.maximum(jnp.abs(e0), jnp.abs(e1)), jnp.abs(e2))
    c_eps = 3.0 * (vm.gamma(3.0) * max_e * max_zt + delta_e * max_zt + delta_z * max_e)
    t_signed = jnp.where(neg_det, -t_scaled, t_scaled)
    return ~((neg & pos) | (det == 0.0) | miss_range | (t_signed <= c_eps))


def _any_kernel(n_tri: int, ox, oy, oz, dx, dy, dz, tmax, tris, hit_o):
    oxv, oyv, ozv = ox[...], oy[...], oz[...]
    dxv, dyv, dzv = dx[...], dy[...], dz[...]
    tmv = tmax[...]
    rc = _ray_constants(oxv, oyv, ozv, dxv, dyv, dzv)

    def one(t, occ):
        hit = _watertight_tri_any(
            rc,
            tris[t, 0], tris[t, 1], tris[t, 2],
            tris[t, 3], tris[t, 4], tris[t, 5],
            tris[t, 6], tris[t, 7], tris[t, 8],
            tmv,
        )
        # i32 carry: Mosaic can't thread i1 vectors through scf.for
        return occ | hit.astype(jnp.int32)

    occ = jnp.zeros(oxv.shape, jnp.int32)
    n_pad = -(-n_tri // UNROLL) * UNROLL
    if n_pad <= 64:
        for t in range(n_tri):
            occ = one(t, occ)
    else:
        def body(i, occ):
            base = i * UNROLL
            for k in range(UNROLL):
                occ = one(base + k, occ)
            return occ

        occ = jax.lax.fori_loop(0, n_pad // UNROLL, body, occ)
    hit_o[...] = occ


@partial(jax.jit, static_argnames=("n_tri",))
def _sweep_any(ox, oy, oz, dx, dy, dz, tmax, tris, n_tri: int):
    rows = ox.shape[0]
    grid = (rows // SUB,)
    ray_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(
        (tris.shape[0], tris.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shp_i = jax.ShapeDtypeStruct((rows, LANE), jnp.int32)
    return pl.pallas_call(
        partial(_any_kernel, n_tri),
        grid=grid,
        in_specs=[ray_spec] * 7 + [tri_spec],
        out_specs=[out_spec],
        out_shape=[shp_i],
    )(ox, oy, oz, dx, dy, dz, tmax, tris)[0]


def pallas_intersect_tris_p(o, d, t_max, p0, p1, p2, tris_packed=None):
    """Occlusion query (reference triangle.rs intersect_p :450): same
    watertight test, no hit record."""
    r = o.shape[0]
    n_tri = p0.shape[0]
    r_pad = -(-r // TILE) * TILE
    rows = r_pad // LANE

    def prep(v):
        return jnp.pad(v, (0, r_pad - r)).reshape(rows, LANE)

    ox, oy, oz = prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2])
    dx, dy, dz = prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2])
    tm = prep(jnp.asarray(t_max, jnp.float32))
    tris = tris_packed if tris_packed is not None else pack_tris(p0, p1, p2)
    occ = _sweep_any(ox, oy, oz, dx, dy, dz, tm, tris, n_tri)
    return occ.reshape(-1)[:r] != 0
