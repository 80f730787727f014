"""Texture evaluation kernels: procedural noise + table-driven eval switch.

TPU-native replacement for reference src/core/texture.rs (Perlin noise
:295-424, mappings :51-284) and src/textures/* (12 texture classes).
Textures live in flat scene tables (type tag + params + child refs + a
packed image atlas); evaluation is branchless execute-and-select over the
per-lane texture id.  Nesting (scale/mix/checker children) is supported one
level deep — children evaluate as leaves (covers the reference test scenes;
deeper chains fold at build time when constant).

Noise uses the reference's 512-entry permutation table (extracted to
data/tables.npz) for bit-comparable values.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..utils import vecmath as vm

_DATA = np.load(Path(__file__).resolve().parent.parent / "data" / "tables.npz")
NOISE_PERM = jnp.asarray(_DATA["noise_perm"], jnp.int32)  # (512,)

# texture type tags (reference src/textures/*)
TEX_CONSTANT = 0
TEX_SCALE = 1
TEX_MIX = 2
TEX_CHECKER = 3
TEX_DOTS = 4
TEX_FBM = 5
TEX_WRINKLED = 6
TEX_MARBLE = 7
TEX_WINDY = 8
TEX_IMAGEMAP = 9
TEX_UV = 10
TEX_BILERP = 11

# tex_params layout
TP_VALUE = 0  # 0:3 constant rgb / scale factor
TP_SU = 3  # uv mapping scale/offset
TP_SV = 4
TP_DU = 5
TP_DV = 6
TP_OMEGA = 7
TP_OCTAVES = 8
TP_VARIATION = 9  # marble
TP_SCALE_N = 10  # marble/windy noise scale
TP_WRAP = 11  # imagemap wrap: 0 repeat, 1 clamp, 2 black
TP_GAMMA_SCALE = 12  # imagemap scale factor
N_TEX_PARAMS = 16

MAX_OCTAVES = 8


def grad(x, y, z, dx, dy, dz):
    """reference texture.rs grad :341."""
    h = NOISE_PERM[NOISE_PERM[NOISE_PERM[x] + y] + z] & 15
    u = jnp.where((h < 8) | (h == 12) | (h == 13), dx, dy)
    v = jnp.where((h < 4) | (h == 12) | (h == 13), dy, dz)
    u = jnp.where(h & 1 > 0, -u, u)
    v = jnp.where(h & 2 > 0, -v, v)
    return u + v


def _noise_weight(t):
    t3 = t * t * t
    t4 = t3 * t
    return 6.0 * t4 * t - 15.0 * t4 + 10.0 * t3


def noise(p):
    """Perlin noise at (..., 3) points (reference texture.rs noise_flt :295)."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    iz = jnp.floor(z).astype(jnp.int32)
    dx, dy, dz = x - ix, y - iy, z - iz
    ix &= 255
    iy &= 255
    iz &= 255
    w000 = grad(ix, iy, iz, dx, dy, dz)
    w100 = grad(ix + 1, iy, iz, dx - 1, dy, dz)
    w010 = grad(ix, iy + 1, iz, dx, dy - 1, dz)
    w110 = grad(ix + 1, iy + 1, iz, dx - 1, dy - 1, dz)
    w001 = grad(ix, iy, iz + 1, dx, dy, dz - 1)
    w101 = grad(ix + 1, iy, iz + 1, dx - 1, dy, dz - 1)
    w011 = grad(ix, iy + 1, iz + 1, dx, dy - 1, dz - 1)
    w111 = grad(ix + 1, iy + 1, iz + 1, dx - 1, dy - 1, dz - 1)
    wx, wy, wz = _noise_weight(dx), _noise_weight(dy), _noise_weight(dz)
    x00 = vm.lerp(wx, w000, w100)
    x10 = vm.lerp(wx, w010, w110)
    x01 = vm.lerp(wx, w001, w101)
    x11 = vm.lerp(wx, w011, w111)
    y0 = vm.lerp(wy, x00, x10)
    y1 = vm.lerp(wy, x01, x11)
    return vm.lerp(wz, y0, y1)


def fbm(p, omega, octaves):
    """reference texture.rs fbm :370 (no ray-differential antialiasing yet:
    octaves is the per-lane requested count, capped at MAX_OCTAVES)."""
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    lam = 1.0
    o = jnp.ones_like(total)
    for i in range(MAX_OCTAVES):
        active = i < octaves
        total = total + jnp.where(active, o * noise(p * lam), 0.0)
        lam *= 1.99
        o = o * omega
    return total


def turbulence(p, omega, octaves):
    """reference texture.rs turbulence :400."""
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    lam = 1.0
    o = jnp.ones_like(total)
    for i in range(MAX_OCTAVES):
        active = i < octaves
        total = total + jnp.where(active, o * jnp.abs(noise(p * lam)), 0.0)
        lam *= 1.99
        o = o * omega
    return total


# marble color curve (reference textures/marble.rs evaluate)
_MARBLE_C = np.asarray(
    [
        [0.58, 0.58, 0.6], [0.58, 0.58, 0.6], [0.58, 0.58, 0.6],
        [0.5, 0.5, 0.5], [0.6, 0.59, 0.58], [0.58, 0.58, 0.6],
        [0.58, 0.58, 0.6], [0.2, 0.2, 0.33], [0.58, 0.58, 0.6],
    ],
    np.float32,
)


def marble(p, scale_n, omega, octaves, variation):
    """reference textures/marble.rs evaluate: sin displaced by fbm, mapped
    through a 9-color spline."""
    first = scale_n[..., None] * p
    t_disp = variation * fbm(first, omega, octaves)
    t = jnp.sin(first[..., 1] + t_disp) * 0.5 + 0.5
    # evaluate the spline through _MARBLE_C
    nc = len(_MARBLE_C) - 3
    tt = jnp.clip(t, 0.0, 0.9999) * nc
    i = tt.astype(jnp.int32)
    ft = tt - i
    c = jnp.asarray(_MARBLE_C)
    # catmull-rom-ish cubic through 4 control points (reference uses
    # spline() with s-basis); simple smooth blend here
    c0, c1, c2, c3 = c[i], c[i + 1], c[i + 2], c[i + 3]
    s0 = (1 - ft) * (1 - ft) * (1 - ft)
    s1 = 3 * ft * (1 - ft) * (1 - ft)
    s2 = 3 * ft * ft * (1 - ft)
    s3 = ft * ft * ft
    rgb = (
        s0[..., None] * c0 + s1[..., None] * c1 + s2[..., None] * c2 + s3[..., None] * c3
    )
    return 1.5 * rgb


def windy(p, scale_n):
    """reference textures/windy.rs: strength * waveheight."""
    wind_strength = fbm(0.1 * p, 0.5, jnp.full(p.shape[:-1], 3))
    wave_height = fbm(p, 0.5, jnp.full(p.shape[:-1], 6))
    return (jnp.abs(wind_strength) * wave_height)


def atlas_lookup(atlas, rect, u, v):
    """Bilinear atlas fetch.  rect: (..., 4) = (y0, h, w, wrap)."""
    y0 = rect[..., 0].astype(jnp.float32)
    h = rect[..., 1].astype(jnp.float32)
    w = rect[..., 2].astype(jnp.float32)
    wrap = rect[..., 3]
    # v flip: image row 0 is top (reference imagemap convention)
    uu = u * w - 0.5
    vv = (1.0 - v) * h - 0.5

    def wrapc(x, n):
        rep = jnp.mod(x, n)
        clm = jnp.clip(x, 0.0, n - 1.0)
        return jnp.where(wrap == 0, rep, clm)

    x0 = jnp.floor(uu)
    y0f = jnp.floor(vv)
    fx = uu - x0
    fy = vv - y0f
    out = 0.0
    AH, AW = atlas.shape[0], atlas.shape[1]
    black = (wrap == 2) & ((uu < -0.5) | (uu > w - 0.5) | (vv < -0.5) | (vv > h - 0.5))
    acc = jnp.zeros(u.shape + (3,), jnp.float32)
    for dy_i in (0, 1):
        for dx_i in (0, 1):
            xs = wrapc(x0 + dx_i, w).astype(jnp.int32)
            ys = wrapc(y0f + dy_i, h).astype(jnp.int32) + rect[..., 0]
            wgt = (fx if dx_i else (1 - fx)) * (fy if dy_i else (1 - fy))
            texel = atlas[jnp.clip(ys, 0, AH - 1), jnp.clip(xs, 0, AW - 1)]
            acc = acc + wgt[..., None] * texel
    return jnp.where(black[..., None], 0.0, acc)


def trilinear_lookup(scene, tex_id, u, v, width):
    """Mip-pyramid width lookup (reference mipmap.rs:233-270): two bilinear
    fetches at adjacent levels lerped by the fractional level.  width is the
    texture-space footprint (0 -> finest level)."""
    nlv = scene.tex_nlv[tex_id].astype(jnp.float32)
    level = nlv - 1.0 + jnp.log2(jnp.maximum(width, 1e-8))
    level = jnp.clip(level, 0.0, jnp.maximum(nlv - 1.0, 0.0))
    l0 = jnp.floor(level).astype(jnp.int32)
    nl1 = jnp.maximum(scene.tex_nlv[tex_id] - 1, 0)
    l1 = jnp.minimum(l0 + 1, nl1)
    f = (level - l0.astype(jnp.float32))[..., None]
    wrap = scene.tex_rect[tex_id][..., 3:4]

    def rect_at(lv):
        r3 = jnp.take_along_axis(
            scene.tex_mip[tex_id], lv[..., None, None], axis=-2
        )[..., 0, :]
        return jnp.concatenate([r3, wrap], axis=-1)

    c0 = atlas_lookup(scene.tex_atlas, rect_at(l0), u, v)
    c1 = atlas_lookup(scene.tex_atlas, rect_at(l1), u, v)
    return (1.0 - f) * c0 + f * c1


def eval_leaf(scene, tex_id, uv, p, width=None):
    """Evaluate the leaf texture families PRESENT IN THE SCENE for per-lane
    tex_id, select one.  Absent families compile to nothing — the scene's
    shape-encoded tex_kind_mask prunes them at trace time (a textured scene
    otherwise drags 4 Perlin-noise families into every material eval).
    Returns (..., 3) rgb.  width: optional per-lane texture-space footprint
    for mip selection (None -> finest level, the reference's behavior
    without ray differentials)."""
    kinds = getattr(scene, "tex_kind_mask", ~0)
    has = lambda t: bool(kinds & (1 << t))

    tp = scene.tex_params[tex_id]
    ttype = scene.tex_type[tex_id]
    su, sv = tp[..., TP_SU], tp[..., TP_SV]
    du, dv = tp[..., TP_DU], tp[..., TP_DV]
    u = uv[..., 0] * jnp.where(su == 0.0, 1.0, su) + du
    v = uv[..., 1] * jnp.where(sv == 0.0, 1.0, sv) + dv

    out = jnp.broadcast_to(tp[..., TP_VALUE : TP_VALUE + 3], uv.shape[:-1] + (3,))

    if has(TEX_FBM) or has(TEX_WRINKLED) or has(TEX_MARBLE) or has(TEX_WINDY):
        from ..utils import transform as tr

        p_tex = tr.xform_point(scene.tex_w2t[tex_id], p)
        octs = jnp.clip(tp[..., TP_OCTAVES].astype(jnp.int32), 1, MAX_OCTAVES)
        omega = jnp.where(tp[..., TP_OMEGA] == 0.0, 0.5, tp[..., TP_OMEGA])
        if has(TEX_FBM):
            f = fbm(p_tex, omega, octs)
            out = jnp.where((ttype == TEX_FBM)[..., None], f[..., None] * tp[..., TP_VALUE : TP_VALUE + 3], out)
        if has(TEX_WRINKLED):
            w = turbulence(p_tex, omega, octs)
            out = jnp.where((ttype == TEX_WRINKLED)[..., None], w[..., None] * tp[..., TP_VALUE : TP_VALUE + 3], out)
        if has(TEX_MARBLE):
            m = marble(p_tex, jnp.where(tp[..., TP_SCALE_N] == 0, 1.0, tp[..., TP_SCALE_N]), omega, octs, tp[..., TP_VARIATION])
            out = jnp.where((ttype == TEX_MARBLE)[..., None], m, out)
        if has(TEX_WINDY):
            wd = windy(p_tex, 1.0)
            out = jnp.where((ttype == TEX_WINDY)[..., None], wd[..., None] * tp[..., TP_VALUE : TP_VALUE + 3], out)
    if has(TEX_UV):
        uvc = jnp.stack([u - jnp.floor(u), v - jnp.floor(v), jnp.zeros_like(u)], axis=-1)
        out = jnp.where((ttype == TEX_UV)[..., None], uvc, out)
    if has(TEX_IMAGEMAP) and scene.tex_atlas.shape[0] > 1:
        if width is None:
            img = atlas_lookup(scene.tex_atlas, scene.tex_rect[tex_id], u, v)
        else:
            # the uv mapping scales the footprint too (texture.rs
            # UVMapping2D::map scales dstdx/dstdy by su/sv)
            w_eff = width * jnp.maximum(
                jnp.abs(jnp.where(su == 0.0, 1.0, su)),
                jnp.abs(jnp.where(sv == 0.0, 1.0, sv)),
            )
            img = trilinear_lookup(scene, tex_id, u, v, w_eff)
        img = img * tp[..., TP_GAMMA_SCALE, None]
        out = jnp.where((ttype == TEX_IMAGEMAP)[..., None], img, out)
    return out


def eval_texture(scene, tex_id, uv, p, width=None):
    """Full eval with one nesting level (scale/mix/checker/dots children)."""
    tex_id = jnp.clip(tex_id, 0, scene.tex_type.shape[0] - 1)
    v_self = eval_leaf(scene, tex_id, uv, p, width)
    ttype = scene.tex_type[tex_id]
    needs_children = (
        (ttype == TEX_SCALE) | (ttype == TEX_MIX) | (ttype == TEX_CHECKER) | (ttype == TEX_DOTS)
    )
    c1 = jnp.clip(scene.tex_child[tex_id, 0], 0, scene.tex_type.shape[0] - 1)
    c2 = jnp.clip(scene.tex_child[tex_id, 1], 0, scene.tex_type.shape[0] - 1)
    v1 = eval_leaf(scene, c1, uv, p, width)
    v2 = eval_leaf(scene, c2, uv, p, width)

    tp = scene.tex_params[tex_id]
    su = jnp.where(tp[..., TP_SU] == 0.0, 1.0, tp[..., TP_SU])
    sv = jnp.where(tp[..., TP_SV] == 0.0, 1.0, tp[..., TP_SV])
    u = uv[..., 0] * su + tp[..., TP_DU]
    v = uv[..., 1] * sv + tp[..., TP_DV]

    out = v_self
    out = jnp.where((ttype == TEX_SCALE)[..., None], v1 * v2, out)
    amt = tp[..., TP_VALUE]
    out = jnp.where((ttype == TEX_MIX)[..., None], vm.lerp(amt[..., None], v1, v2), out)
    check = (jnp.floor(u).astype(jnp.int32) + jnp.floor(v).astype(jnp.int32)) % 2 == 0
    out = jnp.where((ttype == TEX_CHECKER)[..., None], jnp.where(check[..., None], v1, v2), out)
    # dots (reference textures/dots.rs): noise-jittered dot centers
    s_cell = jnp.floor(u + 0.5)
    t_cell = jnp.floor(v + 0.5)
    cell = jnp.stack([s_cell, t_cell, jnp.zeros_like(s_cell)], axis=-1)
    has_dot = noise(cell + 0.5) > 0.0
    cx = s_cell + 0.35 * noise(cell + jnp.asarray([1.5, 2.8, 0.0]))
    cy = t_cell + 0.35 * noise(cell + jnp.asarray([4.5, 9.8, 0.0]))
    radius = 0.35 * 0.7
    inside = has_dot & ((u - cx) ** 2 + (v - cy) ** 2 < radius * radius)
    out = jnp.where((ttype == TEX_DOTS)[..., None], jnp.where(inside[..., None], v1, v2), out)
    return out
