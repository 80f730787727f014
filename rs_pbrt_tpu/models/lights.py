"""Light sampling / evaluation as batched tag-switched kernels.

TPU-native replacement for reference src/core/light.rs + src/lights/*.
Per-lane light index + the scene's flat light tables; every light family is
evaluated vectorized and mask-selected (NEE typically touches one light per
lane so the families are cheap).

sample_li returns the world-space direction, radiance, solid-angle pdf and
the visibility target point (for the shadow ray), mirroring
reference light.rs:43-176 + VisibilityTester.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops import sampling as smp
from ..scene import arrays as sa
from ..utils import transform as tr
from ..utils import vecmath as vm


class LiSample(NamedTuple):
    wi: jnp.ndarray  # (N,3)
    li: jnp.ndarray  # (N,3)
    pdf: jnp.ndarray  # (N,)
    p_target: jnp.ndarray  # (N,3) point for shadow ray (or far point)
    n_light: jnp.ndarray  # (N,3) normal at light sample (0 for delta)
    is_delta: jnp.ndarray  # (N,) bool


def _area_sample_tri(scene: sa.Scene, light_idx, ref_p, u2):
    """Uniform-by-area sample on a triangle-range area light.

    Uses the per-light normalized area CDF (scene.alight_tri_cdf) then
    uniform barycentrics (reference shapes/triangle.rs sample +
    lights/diffuse.rs sample_li).  Table reads ride one-hot matmuls.
    """
    from ..ops import gathers as gx

    cdf = gx.take_rows(scene.alight_tri_cdf, light_idx)  # (N, A+1)
    # remap u2.x through the CDF to both pick the triangle and recycle
    o, c0, c1 = smp.bracket_cdf(cdf, u2[..., 0])
    u_remap = jnp.clip((u2[..., 0] - c0) / jnp.maximum(c1 - c0, 1e-12), 0.0, 1.0 - 1e-7)
    la = gx.take_rows(scene.light_attr, light_idx)
    tri = gx.coli(la, sa.LA_TRI_START) + o.astype(jnp.int32)
    tri = jnp.clip(tri, 0, scene.n_tris - 1)
    at = gx.take_rows(scene.tri_attr, tri)
    b = smp.uniform_sample_triangle(jnp.stack([u_remap, u2[..., 1]], axis=-1))
    b0, b1 = b[..., 0], b[..., 1]
    b2 = 1.0 - b0 - b1
    p0 = gx.col3(at, sa.TA_P0)
    p1 = gx.col3(at, sa.TA_P1)
    p2 = gx.col3(at, sa.TA_P2)
    p = b0[..., None] * p0 + b1[..., None] * p1 + b2[..., None] * p2
    ng = vm.normalize(vm.cross(p1 - p0, p2 - p0))
    # orient by shading normals if present (reference triangle.rs sample)
    ns = (
        b0[..., None] * gx.col3(at, sa.TA_N0)
        + b1[..., None] * gx.col3(at, sa.TA_N1)
        + b2[..., None] * gx.col3(at, sa.TA_N2)
    )
    has_n = gx.colb(at, sa.TA_HAS_N)
    ng = jnp.where(has_n[..., None], vm.face_forward(ng, ns), ng)
    ng = jnp.where(gx.colb(at, sa.TA_REVERSE)[..., None], -ng, ng)
    return p, ng


def _sphere_light_geom(scene: sa.Scene, la):
    """World-space (center, radius, reverse) of each lane's sphere area
    light (la = gathered light_attr rows).  World radius folds the o2w
    uniform scale (column-0 norm of the row-major 4x4)."""
    from ..ops import gathers as gx

    sidx = jnp.clip(gx.coli(la, sa.LA_SHAPE_IDX), 0, scene.sph_attr.shape[0] - 1)
    sat = gx.take_rows(scene.sph_attr, sidx)
    o2w = sat[:, sa.SP_O2W : sa.SP_O2W + 16]
    center = o2w[:, jnp.array([3, 7, 11])]
    scale = jnp.sqrt(o2w[:, 0] ** 2 + o2w[:, 4] ** 2 + o2w[:, 8] ** 2)
    radius = sat[:, sa.SP_PARAMS] * scale
    reverse = sat[:, sa.SP_REVERSE] > 0.5
    return center, radius, reverse


def _area_sample_sphere(scene: sa.Scene, la, ref_p, u2):
    """Solid-angle sphere sampling (reference shapes/sphere.rs:391-480
    sample_with_ref_point): uniform cone toward the sphere when the
    reference point is outside, uniform area when inside.

    Returns (p, n, pdf_solid_angle); pdf already in solid-angle measure so
    the caller must NOT apply the dist^2/(cos*A) conversion."""
    center, radius, reverse = _sphere_light_geom(scene, la)
    r2 = radius * radius
    wc_vec = center - ref_p
    dc2 = jnp.maximum(vm.length_squared(wc_vec), 1e-20)
    inside = dc2 <= r2

    # --- outside: cone sampling (sphere.rs:432-480) ---
    dc = jnp.sqrt(dc2)
    wc = wc_vec / dc[..., None]
    wcx, wcy = vm.coordinate_system(wc)
    sin2_t_max = jnp.clip(r2 / dc2, 0.0, 1.0)
    cos_t_max = jnp.sqrt(jnp.maximum(1.0 - sin2_t_max, 0.0))
    cos_t = (1.0 - u2[..., 0]) + u2[..., 0] * cos_t_max
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = u2[..., 1] * 2.0 * vm.PI
    ds = dc * cos_t - jnp.sqrt(jnp.maximum(r2 - dc2 * sin_t * sin_t, 0.0))
    cos_a = (dc2 + r2 - ds * ds) / jnp.maximum(2.0 * dc * radius, 1e-12)
    sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
    # normal in the frame (-wcx, -wcy, -wc) (sphere.rs: SphericalDirection)
    n_cone = (
        (sin_a * jnp.cos(phi))[..., None] * -wcx
        + (sin_a * jnp.sin(phi))[..., None] * -wcy
        + cos_a[..., None] * -wc
    )
    p_cone = center + radius[..., None] * n_cone
    pdf_cone = smp.uniform_cone_pdf(cos_t_max)

    # --- inside: uniform by area, pdf converted to solid angle ---
    n_in = smp.uniform_sample_sphere(u2)
    p_in = center + radius[..., None] * n_in
    to_in = p_in - ref_p
    d2_in = jnp.maximum(vm.length_squared(to_in), 1e-12)
    wi_in = to_in / jnp.sqrt(d2_in)[..., None]
    cos_in = jnp.abs(vm.dot(n_in, -wi_in))
    area_w = 4.0 * vm.PI * jnp.maximum(r2, 1e-20)
    pdf_in = jnp.where(
        cos_in < 1e-7, 0.0, d2_in / jnp.maximum(cos_in * area_w, 1e-20)
    )

    p = jnp.where(inside[..., None], p_in, p_cone)
    nrm = jnp.where(inside[..., None], n_in, n_cone)
    nrm = jnp.where(reverse[..., None], -nrm, nrm)
    pdf = jnp.where(inside, pdf_in, pdf_cone)
    return p, nrm, pdf


def sample_li(scene: sa.Scene, light_idx, ref_p, u2) -> LiSample:
    """light_idx: (N,) int32; ref_p: (N,3); u2: (N,2)."""
    from ..ops import gathers as gx

    la = gx.take_rows(scene.light_attr, light_idx)
    lp = la[..., : sa.N_LIGHT_PARAMS]
    ltype = gx.coli(la, sa.LA_TYPE)
    n = ref_p.shape[0]

    pos = lp[:, sa.LP_P : sa.LP_P + 3]
    intensity = lp[:, sa.LP_I : sa.LP_I + 3]
    world_r = lp[:, sa.LP_WORLD_RADIUS]

    # --- point (lights/point.rs sample_li) ---
    to_l = pos - ref_p
    d2 = jnp.maximum(vm.length_squared(to_l), 1e-12)
    wi_point = to_l / jnp.sqrt(d2)[..., None]
    li_point = intensity / d2[..., None]

    # --- spot (lights/spot.rs): point * falloff ---
    # spot direction stored in world_center slot 9:12 (repurposed at build)
    spot_dir = lp[:, sa.LP_WORLD_CENTER : sa.LP_WORLD_CENTER + 3]
    cos_t = vm.dot(-wi_point, spot_dir)
    ct_total = lp[:, sa.LP_COS_TOTAL]
    ct_fall = lp[:, sa.LP_COS_FALLOFF]
    delta = jnp.clip((cos_t - ct_total) / jnp.maximum(ct_fall - ct_total, 1e-7), 0.0, 1.0)
    falloff = jnp.where(cos_t < ct_total, 0.0, jnp.where(cos_t > ct_fall, 1.0, (delta * delta) * (delta * delta)))
    li_spot = li_point * falloff[..., None]

    # --- projection (lights/projection.rs): spot frame + image modulation
    # --- goniometric (lights/gonio.rs): angular map modulation ---
    if scene.tex_atlas.shape[0] > 1:
        proj_tex, gon_tex = _angular_map_factors(scene, lp, spot_dir, -wi_point)
        li_proj = li_point * proj_tex
        li_gonio = li_point * gon_tex
    else:
        li_proj = li_point * 0.0
        li_gonio = li_point

    # --- distant (lights/distant.rs): pos slot holds w_light ---
    wi_dist = vm.normalize(pos)
    li_dist = intensity
    p_far_dist = ref_p + wi_dist * (2.0 * world_r)[..., None]

    # --- area (tri range) ---
    if scene.n_tris > 0:
        p_area, n_area = _area_sample_tri(scene, light_idx, ref_p, u2)
    else:
        p_area = ref_p
        n_area = jnp.zeros_like(ref_p)
    # sphere-shape area lights: cone/uniform sampling with a direct
    # solid-angle pdf (sphere.rs:391); gated on the build-time static
    if scene.has_sphere_lights:
        p_sph, n_sph, pdf_sph = _area_sample_sphere(scene, la, ref_p, u2)
        is_sph = gx.coli(la, sa.LA_GEOM) == sa.ALG_SPHERE
        p_area = jnp.where(is_sph[..., None], p_sph, p_area)
        n_area = jnp.where(is_sph[..., None], n_sph, n_area)
    if scene.has_quadric_lights:
        p_qd, n_qd, is_qd = _quadric_light_sample(scene, la, u2)
        p_area = jnp.where(is_qd[..., None], p_qd, p_area)
        n_area = jnp.where(is_qd[..., None], n_qd, n_area)
    to_a = p_area - ref_p
    d2a = jnp.maximum(vm.length_squared(to_a), 1e-12)
    wi_area = to_a / jnp.sqrt(d2a)[..., None]
    cos_l = vm.dot(n_area, -wi_area)
    two_sided = lp[:, sa.LP_TWO_SIDED] > 0.5
    emits = two_sided | (cos_l > 0.0)
    li_area = jnp.where(emits[..., None], intensity, 0.0)
    area = jnp.maximum(lp[:, sa.LP_AREA], 1e-12)
    # solid-angle pdf = dist^2 / (|cos| * A) (reference shape.rs
    # pdf_with_ref_point)
    pdf_area = d2a / jnp.maximum(jnp.abs(cos_l) * area, 1e-12)
    pdf_area = jnp.where(jnp.abs(cos_l) < 1e-7, 0.0, pdf_area)
    if scene.has_sphere_lights:
        pdf_area = jnp.where(is_sph, pdf_sph, pdf_area)

    # --- infinite (lights/infinite.rs sample_li) ---
    if scene.has_env:
        uv, map_pdf = smp.sample_distribution_2d(scene.inf_dist, u2)
        theta = uv[..., 1] * vm.PI
        phi = uv[..., 0] * 2.0 * vm.PI
        st, ct_ = jnp.sin(theta), jnp.cos(theta)
        d_light = vm.spherical_direction(st, ct_, phi)
        wi_inf = vm.normalize(tr.xform_vector(scene.inf_l2w, d_light))
        pdf_inf = jnp.where(
            st > 1e-9, map_pdf / (2.0 * vm.PI * vm.PI * jnp.maximum(st, 1e-9)), 0.0
        )
        li_inf = _env_lookup(scene, uv)
    else:
        wi_inf = wi_dist
        pdf_inf = jnp.zeros(n, jnp.float32)
        li_inf = jnp.zeros((n, 3), jnp.float32)
    p_far_inf = ref_p + wi_inf * (2.0 * world_r)[..., None]

    one = jnp.ones(n, jnp.float32)
    wi = jnp.where(
        ((ltype == sa.LIGHT_POINT) | (ltype == sa.LIGHT_SPOT)
         | (ltype == sa.LIGHT_PROJECTION) | (ltype == sa.LIGHT_GONIO))[..., None],
        wi_point, 0.0,
    )
    wi = jnp.where((ltype == sa.LIGHT_DISTANT)[..., None], wi_dist, wi)
    wi = jnp.where((ltype == sa.LIGHT_AREA)[..., None], wi_area, wi)
    wi = jnp.where((ltype == sa.LIGHT_INFINITE)[..., None], wi_inf, wi)

    li = jnp.where((ltype == sa.LIGHT_POINT)[..., None], li_point, 0.0)
    li = jnp.where((ltype == sa.LIGHT_SPOT)[..., None], li_spot, li)
    li = jnp.where((ltype == sa.LIGHT_PROJECTION)[..., None], li_proj, li)
    li = jnp.where((ltype == sa.LIGHT_GONIO)[..., None], li_gonio, li)
    li = jnp.where((ltype == sa.LIGHT_DISTANT)[..., None], li_dist, li)
    li = jnp.where((ltype == sa.LIGHT_AREA)[..., None], li_area, li)
    li = jnp.where((ltype == sa.LIGHT_INFINITE)[..., None], li_inf, li)

    pdf = jnp.where(
        (ltype == sa.LIGHT_POINT) | (ltype == sa.LIGHT_SPOT)
        | (ltype == sa.LIGHT_PROJECTION) | (ltype == sa.LIGHT_GONIO)
        | (ltype == sa.LIGHT_DISTANT),
        one, 0.0,
    )
    pdf = jnp.where(ltype == sa.LIGHT_AREA, pdf_area, pdf)
    pdf = jnp.where(ltype == sa.LIGHT_INFINITE, pdf_inf, pdf)

    is_positional = (
        (ltype == sa.LIGHT_POINT) | (ltype == sa.LIGHT_SPOT)
        | (ltype == sa.LIGHT_PROJECTION) | (ltype == sa.LIGHT_GONIO)
    )
    p_target = jnp.where(is_positional[..., None], pos, ref_p)
    p_target = jnp.where((ltype == sa.LIGHT_DISTANT)[..., None], p_far_dist, p_target)
    p_target = jnp.where((ltype == sa.LIGHT_AREA)[..., None], p_area, p_target)
    p_target = jnp.where((ltype == sa.LIGHT_INFINITE)[..., None], p_far_inf, p_target)

    n_light = jnp.where((ltype == sa.LIGHT_AREA)[..., None], n_area, 0.0)
    is_delta = (
        (ltype == sa.LIGHT_POINT) | (ltype == sa.LIGHT_SPOT)
        | (ltype == sa.LIGHT_PROJECTION) | (ltype == sa.LIGHT_GONIO)
        | (ltype == sa.LIGHT_DISTANT)
    )
    return LiSample(wi, li, pdf, p_target, n_light, is_delta)


def _env_lookup(scene: sa.Scene, uv):
    """Bilinear lookup of the equirect radiance map (reference
    infinite.rs:339 uses the MipMap's triangle-filtered lookup; NEE/Le
    queries are point lookups of level 0, which bilinear matches)."""
    h, w = scene.inf_radiance.shape[:2]
    fx = uv[..., 0] * w - 0.5
    fy = uv[..., 1] * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    xw0 = jnp.mod(x0i, w)  # azimuth wraps
    xw1 = jnp.mod(x0i + 1, w)
    yc0 = jnp.clip(y0i, 0, h - 1)  # polar clamps
    yc1 = jnp.clip(y0i + 1, 0, h - 1)
    img = scene.inf_radiance
    top = img[yc0, xw0] * (1.0 - tx) + img[yc0, xw1] * tx
    bot = img[yc1, xw0] * (1.0 - tx) + img[yc1, xw1] * tx
    return top * (1.0 - ty) + bot * ty


def _quadric_light_sample(scene: sa.Scene, la, u2):
    """Uniform-by-area sample on an analytic disk/cylinder area light
    (reference shapes/disk.rs sample + shapes/cylinder.rs sample; like the
    reference, disk sampling covers the full disk even for annuli /
    partial phi — the pdf uses the true area).  Returns (p, n, is_qd)."""
    from ..ops import gathers as gx

    sidx = jnp.clip(gx.coli(la, sa.LA_SHAPE_IDX), 0, scene.sph_attr.shape[0] - 1)
    sat = gx.take_rows(scene.sph_attr, sidx)
    o2w = sat[..., sa.SP_O2W : sa.SP_O2W + 16].reshape(sat.shape[:-1] + (4, 4))
    w2o = sat[..., sa.SP_W2O : sa.SP_W2O + 16].reshape(sat.shape[:-1] + (4, 4))
    prm = sat[..., sa.SP_PARAMS : sa.SP_PARAMS + 4]
    reverse = sat[..., sa.SP_REVERSE] > 0.5
    geom = gx.coli(la, sa.LA_GEOM)
    is_cyl = geom == sa.ALG_CYLINDER
    is_dsk = geom == sa.ALG_DISK

    # disk (params: radius, inner, height, phi_max): concentric sample
    radius = prm[..., 0]
    cd = smp.concentric_sample_disk(u2)
    p_dsk = jnp.stack(
        [cd[..., 0] * radius, cd[..., 1] * radius, prm[..., 2]], axis=-1
    )
    n_dsk = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32), p_dsk.shape
    )
    # cylinder (params: radius, z_min, z_max, phi_max)
    z = vm.lerp(u2[..., 0], prm[..., 1], prm[..., 2])
    phi = u2[..., 1] * prm[..., 3]
    p_cyl = jnp.stack(
        [radius * jnp.cos(phi), radius * jnp.sin(phi), z], axis=-1
    )
    n_cyl = jnp.stack(
        [jnp.cos(phi), jnp.sin(phi), jnp.zeros_like(phi)], axis=-1
    )

    p_obj = jnp.where(is_cyl[..., None], p_cyl, p_dsk)
    n_obj = jnp.where(is_cyl[..., None], n_cyl, n_dsk)
    p = tr.xform_point(o2w, p_obj)
    nrm = vm.normalize(tr.xform_normal(w2o, n_obj))
    flip = reverse ^ tr.swaps_handedness(o2w)
    nrm = jnp.where(flip[..., None], -nrm, nrm)
    return p, nrm, is_cyl | is_dsk


def pdf_li_area(scene: sa.Scene, light_idx, ref_p, p_hit, n_hit):
    """Solid-angle pdf that sample_li on area light light_idx would have
    produced direction towards p_hit (for BSDF-sampling MIS)."""
    from ..ops import gathers as gx

    la = gx.take_rows(scene.light_attr, light_idx)
    lp = la[..., : sa.N_LIGHT_PARAMS]
    d = p_hit - ref_p
    d2 = jnp.maximum(vm.length_squared(d), 1e-12)
    wi = d / jnp.sqrt(d2)[..., None]
    cos_l = jnp.abs(vm.dot(n_hit, wi))
    area = jnp.maximum(lp[:, sa.LP_AREA], 1e-12)
    pdf = d2 / jnp.maximum(cos_l * area, 1e-12)
    pdf = jnp.where(cos_l < 1e-7, 0.0, pdf)
    if scene.has_sphere_lights:
        # sphere lights sample a uniform cone from outside
        # (sphere.rs pdf_with_ref_point), matching _area_sample_sphere
        center, radius, _ = _sphere_light_geom(scene, la)
        dc2 = jnp.maximum(vm.length_squared(center - ref_p), 1e-20)
        r2 = radius * radius
        outside = dc2 > r2
        cos_t_max = jnp.sqrt(jnp.maximum(1.0 - jnp.clip(r2 / dc2, 0.0, 1.0), 0.0))
        pdf_cone = smp.uniform_cone_pdf(cos_t_max)
        is_sph = gx.coli(la, sa.LA_GEOM) == sa.ALG_SPHERE
        pdf = jnp.where(is_sph & outside, pdf_cone, pdf)
    return pdf


def pdf_li_env(scene: sa.Scene, wi):
    """Env-map pdf for direction wi (reference infinite.rs pdf_li)."""
    if not scene.has_env:
        return jnp.zeros(wi.shape[:-1], jnp.float32)
    d = tr.xform_vector(scene.inf_w2l, wi)
    d = vm.normalize(d)
    theta = vm.spherical_theta(d)
    phi = vm.spherical_phi(d)
    st = jnp.sin(theta)
    uv = jnp.stack([phi * vm.INV_2_PI, theta * vm.INV_PI], axis=-1)
    map_pdf = smp.distribution_2d_pdf(scene.inf_dist, uv)
    return jnp.where(st > 1e-9, map_pdf / (2.0 * vm.PI * vm.PI * jnp.maximum(st, 1e-9)), 0.0)


def env_le(scene: sa.Scene, d):
    """Escaped-ray radiance (reference infinite.rs le)."""
    if not scene.has_env:
        return jnp.zeros(d.shape[:-1] + (3,), jnp.float32)
    dl = vm.normalize(tr.xform_vector(scene.inf_w2l, d))
    uv = jnp.stack(
        [vm.spherical_phi(dl) * vm.INV_2_PI, vm.spherical_theta(dl) * vm.INV_PI],
        axis=-1,
    )
    return _env_lookup(scene, uv)


def area_light_emitted(scene: sa.Scene, light_idx, n_hit, wo):
    """L() of an intersected area light (reference lights/diffuse.rs l()):
    lemit when the outgoing direction is on the emitting side."""
    from ..ops import gathers as gx

    lp = gx.take_rows(scene.light_attr, light_idx)[..., : sa.N_LIGHT_PARAMS]
    lemit = lp[:, sa.LP_I : sa.LP_I + 3]
    two_sided = lp[:, sa.LP_TWO_SIDED] > 0.5
    emits = two_sided | (vm.dot(n_hit, wo) > 0.0)
    valid = light_idx >= 0
    return jnp.where((emits & valid)[..., None], lemit, 0.0)


def compute_light_power(light_type, light_params, has_env_total):
    """Host-side approximate power for the light-selection distribution
    (reference core/integrator.rs:574 compute_light_power_distribution)."""
    lp = light_params
    intensity = lp[:, sa.LP_I : sa.LP_I + 3]
    area = lp[:, sa.LP_AREA]
    wr = lp[:, sa.LP_WORLD_RADIUS]
    lum = intensity.sum(-1)
    power = np.zeros(len(light_type), np.float32)
    power = np.where(light_type == sa.LIGHT_POINT, 4 * np.pi * lum, power)
    power = np.where(light_type == sa.LIGHT_SPOT, 2 * np.pi * lum, power)
    power = np.where(light_type == sa.LIGHT_DISTANT, np.pi * wr * wr * lum, power)
    two = 1.0 + (lp[:, sa.LP_TWO_SIDED] > 0.5)
    power = np.where(light_type == sa.LIGHT_AREA, two * area * np.pi * lum, power)
    power = np.where(
        light_type == sa.LIGHT_INFINITE, np.pi * wr * wr * has_env_total, power
    )
    return np.maximum(power, 1e-9).astype(np.float32)


def _angular_map_factors(scene, lp, spot_dir, dl):
    """Projection / goniometric map factors for direction dl FROM the
    light (reference projection.rs ProjectionLight::projection,
    goniometric.rs GonioPhotometricLight::scale).  Returns
    (proj (N,3) gated to inside the projection window, gonio (N,3)).
    Shared by sample_li and sample_le so NEE and photon emission see the
    same angular distribution."""
    from ..ops.texture import atlas_lookup

    tex_id = jnp.clip(
        lp[:, sa.LP_TEX].astype(jnp.int32), 0, scene.tex_rect.shape[0] - 1
    )
    rect = scene.tex_rect[tex_id]
    w_l = vm.normalize(spot_dir)
    s1, s2 = vm.coordinate_system(w_l)
    x_l = vm.dot(dl, s1)
    y_l = vm.dot(dl, s2)
    z_l = vm.dot(dl, w_l)
    tan_fov = jnp.maximum(lp[:, sa.LP_TAN_FOV], 1e-6)
    up = 0.5 * (x_l / jnp.maximum(z_l, 1e-6) / tan_fov + 1.0)
    vp = 0.5 * (y_l / jnp.maximum(z_l, 1e-6) / tan_fov + 1.0)
    inside = (z_l > 0) & (up >= 0) & (up < 1) & (vp >= 0) & (vp < 1)
    proj_tex = atlas_lookup(scene.tex_atlas, rect, up, vp)
    proj = jnp.where(inside[..., None], proj_tex, 0.0)
    # gonio: equirect angular lookup of the SAME frame
    theta_g = jnp.arccos(jnp.clip(z_l, -1, 1))
    phi_g = jnp.arctan2(y_l, x_l)
    phi_g = jnp.where(phi_g < 0, phi_g + 2 * vm.PI, phi_g)
    gonio = atlas_lookup(
        scene.tex_atlas, rect, phi_g * vm.INV_2_PI, theta_g * vm.INV_PI
    )
    return proj, gonio


class LeSample(NamedTuple):
    """Emitted-ray sample (reference light.rs sample_le :118-156)."""

    o: jnp.ndarray  # (N,3) ray origin on/near the light
    d: jnp.ndarray  # (N,3) emitted direction
    n_light: jnp.ndarray  # (N,3)
    le: jnp.ndarray  # (N,3)
    pdf_pos: jnp.ndarray  # (N,)
    pdf_dir: jnp.ndarray  # (N,)


def sample_le(scene: sa.Scene, light_idx, u_pos, u_dir) -> LeSample:
    """Sample an emitted photon ray (point/spot/distant/area families —
    reference src/lights/*.rs sample_le)."""
    from ..ops import gathers as gx

    la = gx.take_rows(scene.light_attr, light_idx)
    lp = la[..., : sa.N_LIGHT_PARAMS]
    ltype = gx.coli(la, sa.LA_TYPE)
    n = light_idx.shape[0]
    pos = lp[:, sa.LP_P : sa.LP_P + 3]
    intensity = lp[:, sa.LP_I : sa.LP_I + 3]
    world_r = lp[:, sa.LP_WORLD_RADIUS]
    world_c = lp[:, sa.LP_WORLD_CENTER : sa.LP_WORLD_CENTER + 3]
    one = jnp.ones(n, jnp.float32)

    # point: uniform sphere direction
    d_pt = smp.uniform_sample_sphere(u_dir)
    # spot: uniform cone around spot dir
    ct_total = lp[:, sa.LP_COS_TOTAL]
    d_cone_local = smp.uniform_sample_cone(u_dir, ct_total)
    spot_dir = world_c  # spot stores its direction here
    s1, s2 = vm.coordinate_system(vm.normalize(spot_dir))
    d_spot = (
        d_cone_local[:, 0:1] * s1 + d_cone_local[:, 1:2] * s2
        + d_cone_local[:, 2:3] * vm.normalize(spot_dir)
    )
    pdf_dir_spot = smp.uniform_cone_pdf(ct_total)

    # distant: origin on a world-radius disk, direction fixed
    w = vm.normalize(pos)  # distant stores w_light in pos
    v1, v2 = vm.coordinate_system(w)
    cd = smp.concentric_sample_disk(u_pos)
    p_disk = world_c + (world_r[:, None]) * (cd[:, 0:1] * v1 + cd[:, 1:2] * v2)
    o_dist = p_disk + world_r[:, None] * w
    pdf_pos_dist = 1.0 / jnp.maximum(vm.PI * world_r * world_r, 1e-12)

    # area (tri range): area point + cosine hemisphere direction
    if scene.n_tris > 0:
        p_area, n_area = _area_sample_tri(scene, light_idx, pos, u_pos)
    else:
        p_area, n_area = pos, jnp.zeros_like(pos)
    if scene.has_sphere_lights:
        # photon emission from a sphere light: uniform by area
        # (sphere.rs sample / diffuse.rs sample_le position term)
        center, radius, reverse = _sphere_light_geom(scene, la)
        dir_s = smp.uniform_sample_sphere(u_pos)
        is_sph = gx.coli(la, sa.LA_GEOM) == sa.ALG_SPHERE
        p_area = jnp.where(
            is_sph[..., None], center + radius[..., None] * dir_s, p_area
        )
        n_s = jnp.where(reverse[..., None], -dir_s, dir_s)
        n_area = jnp.where(is_sph[..., None], n_s, n_area)
    if scene.has_quadric_lights:
        # photon emission from analytic disk/cylinder lights: uniform by
        # area (diffuse.rs sample_le position term)
        p_qd, n_qd, is_qd = _quadric_light_sample(scene, la, u_pos)
        p_area = jnp.where(is_qd[..., None], p_qd, p_area)
        n_area = jnp.where(is_qd[..., None], n_qd, n_area)
    d_cos = smp.cosine_sample_hemisphere(u_dir)
    a1, a2 = vm.coordinate_system(n_area)
    d_area = d_cos[:, 0:1] * a1 + d_cos[:, 1:2] * a2 + d_cos[:, 2:3] * n_area
    area = jnp.maximum(lp[:, sa.LP_AREA], 1e-12)
    pdf_pos_area = 1.0 / area
    pdf_dir_area = smp.cosine_hemisphere_pdf(jnp.abs(d_cos[:, 2]))

    is_pt = ltype == sa.LIGHT_POINT
    is_spot = ltype == sa.LIGHT_SPOT
    is_proj = ltype == sa.LIGHT_PROJECTION
    is_gonio = ltype == sa.LIGHT_GONIO
    is_dist = ltype == sa.LIGHT_DISTANT
    is_area = ltype == sa.LIGHT_AREA
    is_inf = ltype == sa.LIGHT_INFINITE

    # projection: uniform cone over the projection window (reference
    # projection.rs:408-435 — cosTotalWidth is the normalized screen
    # corner's z: corner dir (tanFov, tanFov, 1) for the square window)
    tan_fov = jnp.maximum(lp[:, sa.LP_TAN_FOV], 1e-6)
    ct_proj = 1.0 / jnp.sqrt(1.0 + 2.0 * tan_fov * tan_fov)
    d_cone_p = smp.uniform_sample_cone(u_dir, ct_proj)
    d_proj = (
        d_cone_p[:, 0:1] * s1 + d_cone_p[:, 1:2] * s2
        + d_cone_p[:, 2:3] * vm.normalize(spot_dir)
    )
    pdf_dir_proj = smp.uniform_cone_pdf(ct_proj)
    # gonio: uniform sphere direction, map-modulated le
    # (reference goniometric.rs:290-312)
    if scene.tex_atlas.shape[0] > 1:
        proj_f, _ = _angular_map_factors(scene, lp, spot_dir, d_proj)
        _, gonio_f = _angular_map_factors(scene, lp, spot_dir, d_pt)
    else:
        proj_f = jnp.ones_like(intensity)
        gonio_f = jnp.ones_like(intensity)

    o = jnp.where(is_area[:, None], p_area, pos)
    o = jnp.where(is_dist[:, None], o_dist, o)
    d = jnp.where(is_pt[:, None], d_pt, d_pt)
    d = jnp.where(is_spot[:, None], d_spot, d)
    d = jnp.where(is_proj[:, None], d_proj, d)
    d = jnp.where(is_dist[:, None], -w, d)
    d = jnp.where(is_area[:, None], d_area, d)
    nl = jnp.where(is_area[:, None], n_area, d)
    le = intensity
    # spot: falloff band modulation (reference spot.rs sample_le:
    # I * falloff(w); inside the falloff cone it is 1)
    cos_sp = vm.dot(d_spot, vm.normalize(spot_dir))
    ct_fall = lp[:, sa.LP_COS_FALLOFF]
    delta_sp = jnp.clip(
        (cos_sp - ct_total) / jnp.maximum(ct_fall - ct_total, 1e-7), 0.0, 1.0
    )
    fall_sp = jnp.where(
        cos_sp < ct_total, 0.0,
        jnp.where(cos_sp > ct_fall, 1.0, (delta_sp * delta_sp) ** 2),
    )
    le = jnp.where(is_spot[:, None], intensity * fall_sp[:, None], le)
    le = jnp.where(is_proj[:, None], intensity * proj_f, le)
    le = jnp.where(is_gonio[:, None], intensity * gonio_f, le)
    pdf_pos = jnp.where(is_area, pdf_pos_area, one)
    pdf_pos = jnp.where(is_dist, pdf_pos_dist, pdf_pos)
    pdf_dir = jnp.where(is_pt | is_gonio, smp.UNIFORM_SPHERE_PDF, one)
    pdf_dir = jnp.where(is_spot, pdf_dir_spot, pdf_dir)
    pdf_dir = jnp.where(is_proj, pdf_dir_proj, pdf_dir)
    pdf_dir = jnp.where(is_area, pdf_dir_area, pdf_dir)
    pdf_dir = jnp.where(is_dist, one, pdf_dir)

    # --- infinite/env (infinite.rs sample_le): importance-sample the env
    # direction, origin on a world-radius disk behind the scene ---
    if scene.has_env:
        uv, map_pdf = smp.sample_distribution_2d(scene.inf_dist, u_dir)
        theta = uv[..., 1] * vm.PI
        phi = uv[..., 0] * 2.0 * vm.PI
        st_e = jnp.sin(theta)
        d_env_l = vm.spherical_direction(st_e, jnp.cos(theta), phi)
        w_env = vm.normalize(tr.xform_vector(scene.inf_l2w, d_env_l))  # toward env
        d_inf = -w_env  # emitted into the scene
        v1e, v2e = vm.coordinate_system(-d_inf)
        cd_e = smp.concentric_sample_disk(u_pos)
        wc = lp[:, sa.LP_WORLD_CENTER : sa.LP_WORLD_CENTER + 3]
        p_disk = wc + world_r[:, None] * (
            cd_e[:, 0:1] * v1e + cd_e[:, 1:2] * v2e
        )
        o_inf = p_disk - d_inf * world_r[:, None]
        pdf_dir_inf = jnp.where(
            st_e > 1e-9, map_pdf / (2.0 * vm.PI * vm.PI * jnp.maximum(st_e, 1e-9)), 0.0
        )
        le_inf = _env_lookup(scene, uv)
        o = jnp.where(is_inf[:, None], o_inf, o)
        d = jnp.where(is_inf[:, None], d_inf, d)
        nl = jnp.where(is_inf[:, None], d_inf, nl)
        le = jnp.where(is_inf[:, None], le_inf, le)
        pdf_pos = jnp.where(
            is_inf, 1.0 / jnp.maximum(vm.PI * world_r * world_r, 1e-12), pdf_pos
        )
        pdf_dir = jnp.where(is_inf, pdf_dir_inf, pdf_dir)
    return LeSample(o, d, nl, le, jnp.maximum(pdf_pos, 1e-20), jnp.maximum(pdf_dir, 1e-20))
