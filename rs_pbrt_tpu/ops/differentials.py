"""Ray differentials -> texture-space footprints for mip filtering.

TPU-native equivalent of reference src/core/camera.rs:28
(generate_ray_differential), src/core/interaction.rs:388-470
(compute_differentials) and the duv width consumed by
src/core/mipmap.rs:233-270 (trilinear width lookup).

The reference carries rx/ry offset rays on every camera ray and solves a
per-hit least-squares for (dudx, dvdx, dudy, dvdy).  Here the whole
machinery is STATICALLY GATED on the scene actually containing imagemap
textures bound to a material slot (needs_diffs) — other scenes compile
the exact same graphs as before; textured scenes add one ray-gen triple
at the camera and an elementwise solve at the primary hit.  Like the
reference path integrator, only camera rays carry differentials: at
secondary bounces the footprint is 0 (finest mip level).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils import vecmath as vm


class RayDiffs(NamedTuple):
    rx_o: jnp.ndarray  # (N,3) origin of the +1px-in-x offset ray
    rx_d: jnp.ndarray  # (N,3)
    ry_o: jnp.ndarray  # (N,3)
    ry_d: jnp.ndarray  # (N,3)


def needs_diffs(scene) -> bool:
    """Static: does this scene have an imagemap texture bound to any
    material slot?  (Footprints only feed mip selection; everything else
    evaluates at a point.)"""
    from . import texture as tx

    kinds = getattr(scene, "tex_kind_mask", 0)
    return bool(kinds & (1 << tx.TEX_IMAGEMAP)) and bool(
        getattr(scene, "tex_slot_mask", 0)
    )


def camera_differentials(camera, rays, p_film, u_lens, u_time, spp: int) -> RayDiffs:
    """Offset rays for +1 pixel in x and y (reference camera.rs:28 shifts
    the film sample exactly so), scaled by 1/sqrt(spp) like the reference
    render loop's scale_differentials (integrator.rs:139-141).  rays: the
    already-generated base CameraRays for p_film."""
    from ..models import cameras as cam

    dx = jnp.asarray([1.0, 0.0], jnp.float32)
    dy = jnp.asarray([0.0, 1.0], jnp.float32)
    rx = cam.generate_rays(camera, p_film + dx, u_lens, u_time)
    ry = cam.generate_rays(camera, p_film + dy, u_lens, u_time)
    s = max(0.125, 1.0 / float(spp) ** 0.5)
    sx = lambda a, b: a + (b - a) * s
    return RayDiffs(
        sx(rays.o, rx.o), sx(rays.d, rx.d), sx(rays.o, ry.o), sx(rays.d, ry.d)
    )


def _tri_dpdv(scene, it):
    """Exact dpdv for triangle hits (second column of the uv-param system,
    reference triangle.rs:300-330); fallback cross(ng, dpdu) elsewhere
    (quadric/curve imagemaps get an isotropic-footprint approximation)."""
    from ..scene import arrays as sa
    from . import gathers as gx

    fallback = vm.cross(it.ng, it.dpdu)
    if scene.n_tris == 0:
        return fallback
    is_tri = it.valid & (it.prim >= 0) & (it.prim < scene.n_tris)
    tri = jnp.clip(it.prim, 0, scene.n_tris - 1)
    at = gx.take_rows(scene.tri_attr, tri)
    p0 = gx.col3(at, sa.TA_P0)
    p1 = gx.col3(at, sa.TA_P1)
    p2 = gx.col3(at, sa.TA_P2)
    uv0 = gx.col2(at, sa.TA_UV0)
    uv1 = gx.col2(at, sa.TA_UV1)
    uv2 = gx.col2(at, sa.TA_UV2)
    duv02 = uv0 - uv2
    duv12 = uv1 - uv2
    dp02 = p0 - p2
    dp12 = p1 - p2
    det = duv02[..., 0] * duv12[..., 1] - duv02[..., 1] * duv12[..., 0]
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / jnp.where(det == 0, 1.0, det))
    dpdv = (-duv12[..., 0:1] * dp02 + duv02[..., 0:1] * dp12) * inv_det[..., None]
    degen = vm.length_squared(dpdv) < 1e-16
    return jnp.where((is_tri & ~degen)[..., None], dpdv, fallback)


def duv_width_at_hit(scene, it, diffs: RayDiffs):
    """Texture-space footprint width at primary hits (reference
    interaction.rs:388-470: offset-ray/tangent-plane intersection, then a
    2x2 solve in the two most stable axes; width = the max |partial| that
    mipmap.rs feeds the trilinear lookup).  Returns (N,) float32, 0 where
    the footprint is invalid (the reference's zero-differential path)."""
    n = it.ng
    p = it.p
    d_dot = lambda a, b: jnp.sum(a * b, axis=-1)
    nd = d_dot(n, p)

    def plane_hit(ro, rd):
        denom = d_dot(n, rd)
        t = (nd - d_dot(n, ro)) / jnp.where(denom == 0.0, 1.0, denom)
        ok = jnp.abs(denom) > 1e-12
        return ro + t[..., None] * rd - p, ok

    dpdx, okx = plane_hit(diffs.rx_o, diffs.rx_d)
    dpdy, oky = plane_hit(diffs.ry_o, diffs.ry_d)

    dpdu = it.dpdu
    dpdv = _tri_dpdv(scene, it)
    # choose the two axes where |n| is smallest (interaction.rs:430-443)
    an = jnp.abs(n)
    big = jnp.argmax(an, axis=-1)
    dims = jnp.stack([(big + 1) % 3, (big + 2) % 3], axis=-1)  # (N,2)
    ax3 = jnp.arange(3, dtype=dims.dtype)

    def pick(v, k):
        # one-hot select, not take_along_axis (per-lane (N,3) gathers hit
        # the slow gather unit, CLAUDE.md)
        oh = dims[..., k : k + 1] == ax3
        return jnp.sum(jnp.where(oh, v, 0.0), axis=-1)
    a00 = pick(dpdu, 0)
    a01 = pick(dpdv, 0)
    a10 = pick(dpdu, 1)
    a11 = pick(dpdv, 1)
    det = a00 * a11 - a01 * a10
    ok_det = jnp.abs(det) > 1e-12
    inv = 1.0 / jnp.where(ok_det, det, 1.0)

    def solve(dp):
        b0 = pick(dp, 0)
        b1 = pick(dp, 1)
        du = (a11 * b0 - a01 * b1) * inv
        dv = (a00 * b1 - a10 * b0) * inv
        return du, dv

    dudx, dvdx = solve(dpdx)
    dudy, dvdy = solve(dpdy)
    width = jnp.maximum(
        jnp.maximum(jnp.abs(dudx), jnp.abs(dvdx)),
        jnp.maximum(jnp.abs(dudy), jnp.abs(dvdy)),
    )
    ok = it.valid & okx & oky & ok_det & jnp.isfinite(width)
    return jnp.where(ok, width, 0.0)
