"""Flat SoA scene representation — the TPU-native Scene.

Replaces the reference's pointer graph (Arc<Primitive> aggregates,
src/core/scene.rs:19, src/core/primitive.rs:21) with flat index tables:
geometry, materials and lights are parallel arrays; "virtual dispatch"
becomes integer tags consumed by ``lax.switch`` inside kernels.  A Scene is
a pytree of device arrays whose SHAPES are static under jit, so structural
branching (has triangles? has env light?) happens at trace time for free.

All world-space. Instancing (TransformedPrimitive) is resolved at build
time for now; two-level BVH instancing comes with the accelerator rework.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops.sampling import Distribution1D, Distribution2D

# material type tags (reference src/core/material.rs:39 enum of 13)
MATTE = 0
PLASTIC = 1
MIRROR = 2
GLASS = 3
METAL = 4
SUBSTRATE = 5
UBER = 6
TRANSLUCENT = 7
FOURIER = 8
DISNEY = 9
HAIR = 10
MIXMAT = 11
SUBSURFACE = 12
N_MATERIAL_TYPES = 13

# material parameter vector layout (mat_params[:, k]); unused slots = 0.
# Textured slots are overridden at shade time when mat_tex[:, slot] >= 0.
MP_KD = 0  # 0:3 diffuse/reflectance rgb
MP_KS = 3  # 3:6 glossy rgb
MP_KR = 6  # 6:9 specular reflection rgb
MP_KT = 9  # 9:12 specular transmission rgb
MP_ROUGH_U = 12
MP_ROUGH_V = 13
MP_ETA = 14
MP_SIGMA = 15  # oren-nayar sigma (degrees)
MP_REMAP_ROUGH = 16  # bool: remap roughness to alpha
MP_ETA3 = 17  # 17:20 conductor eta rgb (metal)
MP_K3 = 20  # 20:23 conductor absorption k rgb (metal)
MP_OPACITY = 23  # 23:26 uber opacity rgb (hair reuses .x as a mode flag)
MP_BSSRDF = 26  # subsurface material: index into the bss_* tables (-1 none)
N_MAT_PARAMS = 27

# texturable slots (mat_tex[:, slot] is a texture id or -1)
TEX_SLOT_KD = 0
TEX_SLOT_KS = 1
TEX_SLOT_KR = 2
TEX_SLOT_KT = 3
TEX_SLOT_SIGMA = 4
TEX_SLOT_ROUGH_U = 5
TEX_SLOT_ROUGH_V = 6
TEX_SLOT_BUMP = 7
TEX_SLOT_OPACITY = 8
N_TEX_SLOTS = 9

# light type tags (reference src/core/light.rs:29 enum of 7)
LIGHT_POINT = 0
LIGHT_SPOT = 1
LIGHT_DISTANT = 2
LIGHT_PROJECTION = 3
LIGHT_GONIO = 4
LIGHT_AREA = 5  # diffuse area light over a triangle range or quadric
LIGHT_INFINITE = 6

# LightFlags (reference src/core/light.rs:22)
LF_DELTA_POSITION = 1
LF_DELTA_DIRECTION = 2
LF_AREA = 4
LF_INFINITE = 8

# light parameter layout
LP_P = 0  # 0:3 position (point/spot) or direction-to (distant w_light)
LP_I = 3  # 3:6 intensity/radiance rgb (premultiplied by scale)
LP_COS_TOTAL = 6  # spot cos(total width)
LP_COS_FALLOFF = 7  # spot cos(falloff start)
LP_WORLD_RADIUS = 8
LP_WORLD_CENTER = 9  # 9:12
LP_TWO_SIDED = 12  # area light two-sided flag
LP_AREA = 13  # total emitting area of this light's shape
LP_TEX = 14  # texture id for projection/goniometric maps (-1 none)
LP_TAN_FOV = 15  # projection light: tan(fov/2)
N_LIGHT_PARAMS = 16

# area-light geometry kinds (reference shape.rs:91-137 samples any shape
# as an area light; here each analytic family has a sampling branch)
ALG_NONE = 0
ALG_TRI_RANGE = 1  # triangles [light_tri_start, light_tri_end)
ALG_SPHERE = 2
ALG_CYLINDER = 3  # analytic quadric (shapes/cylinder.rs sample)
ALG_DISK = 4      # analytic quadric (shapes/disk.rs sample)

# ---- packed per-object attribute tables (one-hot-matmul gather targets;
# see ops/gathers.py — per-lane gathers from small tables are turned into
# MXU matmuls, so all attributes of an object live in ONE f32 row) ----

# tri_attr columns
TA_P0 = 0
TA_P1 = 3
TA_P2 = 6
TA_N0 = 9
TA_N1 = 12
TA_N2 = 15
TA_UV0 = 18
TA_UV1 = 20
TA_UV2 = 22
TA_HAS_N = 24
TA_MAT = 25
TA_LIGHT = 26
TA_REVERSE = 27
TA_MED_IN = 28
TA_MED_OUT = 29
TA_ALPHA = 30  # float-texture id for alpha cutout mask, -1 = none
TA_SALPHA = 31  # shadow-alpha mask texture id, -1 = none
N_TRI_ATTR = 32

# mat_attr columns
MA_TYPE = 0
MA_PARAMS = 1  # 1 : 1+N_MAT_PARAMS
MA_TEX = 1 + N_MAT_PARAMS  # texture slot ids (as floats, -1 = none)
N_MAT_ATTR = 1 + N_MAT_PARAMS + N_TEX_SLOTS

# light_attr columns: light_params in 0:N_LIGHT_PARAMS then ints
LA_TYPE = N_LIGHT_PARAMS
LA_FLAGS = N_LIGHT_PARAMS + 1
LA_GEOM = N_LIGHT_PARAMS + 2
LA_TRI_START = N_LIGHT_PARAMS + 3
LA_TRI_END = N_LIGHT_PARAMS + 4
LA_SHAPE_IDX = N_LIGHT_PARAMS + 5
N_LIGHT_ATTR = N_LIGHT_PARAMS + 6

# quadric (sph_*) family kinds: analytic sphere/cylinder/disk share one
# SoA family (o2w/w2o + 4 params + kind), reference src/shapes/{sphere,
# cylinder,disk}.rs.  Param layout per kind:
#   SPHERE:   radius, z_min, z_max, phi_max
#   CYLINDER: radius, z_min, z_max, phi_max
#   DISK:     radius, inner_radius, height, phi_max
QK_SPHERE = 0
QK_CYLINDER = 1
QK_DISK = 2

# sph_attr columns
SP_O2W = 0  # 16 (row-major 4x4)
SP_W2O = 16
SP_PARAMS = 32  # 4 params (per-kind layout above)
SP_MAT = 36
SP_LIGHT = 37
SP_REVERSE = 38
SP_MED_IN = 39
SP_MED_OUT = 40
SP_KIND = 41
N_SPH_ATTR = 42


def quadric_bound_radius(params: np.ndarray, kind: np.ndarray) -> np.ndarray:
    """Conservative object-space bounding radius per quadric (host)."""
    r = params[:, 0]
    zmag = np.maximum(np.abs(params[:, 1]), np.abs(params[:, 2]))
    rb = np.sqrt(r * r + zmag * zmag)
    return np.where(kind == QK_SPHERE, r, rb).astype(np.float32)


class Scene(NamedTuple):
    # --- triangle soup (world space) ---
    tri_p0: jnp.ndarray  # (T,3)
    tri_p1: jnp.ndarray
    tri_p2: jnp.ndarray
    tri_n0: jnp.ndarray  # (T,3) shading normals (= geometric if none given)
    tri_n1: jnp.ndarray
    tri_n2: jnp.ndarray
    tri_uv0: jnp.ndarray  # (T,2)
    tri_uv1: jnp.ndarray
    tri_uv2: jnp.ndarray
    tri_has_n: jnp.ndarray  # (T,) bool: mesh provided shading normals
    tri_mat: jnp.ndarray  # (T,) i32
    tri_light: jnp.ndarray  # (T,) i32 area-light id or -1
    tri_reverse: jnp.ndarray  # (T,) bool ReverseOrientation^transform-swap
    tri_alpha: jnp.ndarray  # (T,) i32 alpha-mask texture id, -1 = none
    #   (reference triangle.rs:39,313-327: alpha==0 at the hit uv -> the hit
    #    is skipped entirely; api.rs:1920-1940 binds the "alpha" parameter)
    tri_salpha: jnp.ndarray  # (T,) i32 shadow-alpha texture id, -1 = none

    # --- spheres (object space + transform) ---
    sph_o2w: jnp.ndarray  # (S,4,4)
    sph_w2o: jnp.ndarray  # (S,4,4)
    sph_params: jnp.ndarray  # (S,4): per-kind layout (see QK_* above)
    sph_kind: jnp.ndarray  # (S,) i32 QK_*
    sph_mat: jnp.ndarray  # (S,)
    sph_light: jnp.ndarray  # (S,)
    sph_reverse: jnp.ndarray  # (S,) bool

    # --- curve (hair) leaf segments, pre-flattened at build time ---
    # packed rows per ops/curves.py CV_* layout (world-space control points)
    crv_attr: jnp.ndarray  # (C, curves.N_CURVE_ATTR)

    # --- two-level instancing (reference core/primitive.rs
    # TransformedPrimitive :198-265): shared OBJECT-SPACE prototype
    # triangles + per-instance transforms.  Ecosys-class scenes keep one
    # geometry copy instead of O(instances x tris) flattening. ---
    proto_p0: jnp.ndarray  # (PT,3) object space
    proto_p1: jnp.ndarray
    proto_p2: jnp.ndarray
    proto_attr: jnp.ndarray  # (max(PT,1), N_TRI_ATTR) tri_attr layout
    proto_range: jnp.ndarray  # (P,2) [tri0, tri1) per prototype
    inst_o2w: jnp.ndarray  # (I,4,4)
    inst_w2o: jnp.ndarray  # (I,4,4)
    inst_proto: jnp.ndarray  # (I,) prototype index
    inst_mat: jnp.ndarray  # (I,) material override (-1 -> prototype's)

    # --- object-level motion blur (reference TransformedPrimitive with
    # AnimatedTransform, primitive.rs:198-265 + transform.rs:894): meshes
    # whose CTM pair differs keep OBJECT-space triangles per animated
    # group; rays are carried into object space by the inverse of the
    # slerp-interpolated transform at RAY TIME (utils/animated.py) ---
    anim_p0: jnp.ndarray  # (A,3) object space
    anim_p1: jnp.ndarray
    anim_p2: jnp.ndarray
    anim_attr: jnp.ndarray  # (max(A,1), N_TRI_ATTR) object-space attrs
    anim_range: jnp.ndarray  # (G,2) i32 [tri0, tri1) per group
    anim_xf: jnp.ndarray  # (G,32): T0(3) q0(4) S0(9) T1(3) q1(4) S1(9)

    # --- materials ---
    mat_type: jnp.ndarray  # (M,) i32
    mat_params: jnp.ndarray  # (M, N_MAT_PARAMS)
    mat_tex: jnp.ndarray  # (M, N_TEX_SLOTS) i32 texture ids, -1 = constant

    # --- textures (type/param tables + child refs + packed image atlas) ---
    tex_type: jnp.ndarray  # (X,) i32
    tex_params: jnp.ndarray  # (X, 16)
    tex_child: jnp.ndarray  # (X, 2) i32 sub-texture refs (-1 none)
    tex_w2t: jnp.ndarray  # (X, 4, 4) world->texture transforms (3D mappings)
    tex_atlas: jnp.ndarray  # (AH, AW, 3) all image textures stacked
    tex_rect: jnp.ndarray  # (X, 4) i32: y0, h, w, wrap (mip level 0)
    tex_mip: jnp.ndarray  # (X, MAX_LEVELS, 3) i32 per-level (y0, h, w)
    tex_nlv: jnp.ndarray  # (X,) i32 number of pyramid levels

    # --- lights ---
    light_type: jnp.ndarray  # (L,) i32
    light_flags: jnp.ndarray  # (L,) i32
    light_params: jnp.ndarray  # (L, N_LIGHT_PARAMS)
    light_geom_kind: jnp.ndarray  # (L,) i32 ALG_*
    light_tri_start: jnp.ndarray  # (L,) i32
    light_tri_end: jnp.ndarray  # (L,) i32
    light_shape_idx: jnp.ndarray  # (L,) i32 (sphere/disk index)
    # per-light triangle-area CDF, padded to max range length:
    alight_tri_cdf: jnp.ndarray  # (L, A+1) cumulative area, normalized
    # power distribution over lights for light selection
    light_power: jnp.ndarray  # (L,)

    # --- participating media (homogeneous table; grids carried separately) ---
    med_sigma_a: jnp.ndarray  # (K,3)
    med_sigma_s: jnp.ndarray  # (K,3)
    med_g: jnp.ndarray  # (K,)
    med_grid: jnp.ndarray  # (K, D, H, W) density grids (1-voxel = homogeneous)
    med_w2m: jnp.ndarray  # (K, 4, 4) world -> unit medium space
    med_max_density: jnp.ndarray  # (K,)
    tri_med: jnp.ndarray  # (T,2) i32 (inside, outside) medium ids, -1 = vacuum
    sph_med: jnp.ndarray  # (S,2) i32
    camera_medium: jnp.ndarray  # () i32

    # --- env map (present iff inf_radiance.shape[0] > 1) ---
    inf_radiance: jnp.ndarray  # (H,W,3) equirect radiance map * scale
    inf_dist: Distribution2D  # luminance*sin(theta) importance
    inf_w2l: jnp.ndarray  # (4,4) world->light transform
    inf_l2w: jnp.ndarray  # (4,4)

    # --- packed attribute tables (derived; see gathers.py) ---
    tri_attr: jnp.ndarray  # (T, N_TRI_ATTR)
    mat_attr: jnp.ndarray  # (M, N_MAT_ATTR)
    light_attr: jnp.ndarray  # (L, N_LIGHT_ATTR)
    sph_attr: jnp.ndarray  # (S, N_SPH_ATTR)

    # --- world bound ---
    world_center: jnp.ndarray  # (3,)
    world_radius: jnp.ndarray  # ()

    # shape-encoded static flag: (1,) if any material is HAIR else (0,)
    # (lets jitted code skip the hair-lobe math without a traced branch)
    hair_flag: jnp.ndarray

    # shape-encoded static flag: (1,) if any triangle carries an alpha or
    # shadow-alpha mask (gates the recast loop in scene_intersect)
    alpha_flag: jnp.ndarray

    # shape-encoded static flag: (1,) if any area light is an ALG_SPHERE
    # (gates the sphere cone-sampling branch in models/lights.py)
    sphlight_flag: jnp.ndarray

    # shape-encoded static flag: (1,) if any area light is an analytic
    # disk/cylinder quadric (gates the quadric sampling branch)
    qdlight_flag: jnp.ndarray

    # shape-encoded static flag: (1,) if any primitive or the camera carries
    # a medium interface (gates medium vertices in BDPT and medium code in
    # other integrators without a traced branch)
    med_flag: jnp.ndarray

    # shape-encoded static bitmask of quadric kinds present (QK_*):
    # sphere-only scenes compile no cylinder/disk intersection code
    quad_kind_flag: jnp.ndarray  # (mask, 0)

    # shape-encoded static bitmasks (jitted code prunes absent branches):
    # tex_kind_flag.shape[0] = bitmask of texture TYPE tags present;
    # tex_slot_flag.shape[0] = bitmask of material texture SLOTS bound;
    # mat_kind_flag.shape[0] = bitmask of MATERIAL type tags present
    tex_kind_flag: jnp.ndarray  # (kind_mask, 0)
    tex_slot_flag: jnp.ndarray  # (slot_mask, 0)
    mat_kind_flag: jnp.ndarray  # (mat_mask, 0)

    # --- subsurface (BSSRDF) per-material folded profile tables
    # (ops/bssrdf.py); B rows, 0 when no subsurface material ---
    bss_profile: jnp.ndarray  # (B,3,K) radial profile per channel
    bss_cdf: jnp.ndarray  # (B,3,K)
    bss_rho_eff: jnp.ndarray  # (B,3)
    bss_sigma_t: jnp.ndarray  # (B,3)
    bss_eta: jnp.ndarray  # (B,)

    # --- FourierBSDF table (ops/fourier_bsdf.py); one per scene,
    # zero-size mu when absent ---
    fou_mu: jnp.ndarray  # (MU,)
    fou_dense: jnp.ndarray  # (MU*MU, 3*m_cap)
    fou_m: jnp.ndarray  # (MU*MU,)
    fou_cdf: jnp.ndarray  # (MU, MU)
    fou_a0: jnp.ndarray  # (MU, MU)
    fou_eta: jnp.ndarray  # ()

    @property
    def n_tris(self):
        return self.tri_p0.shape[0]

    @property
    def n_spheres(self):
        return self.sph_o2w.shape[0]

    @property
    def n_curve_segs(self):
        return self.crv_attr.shape[0]

    @property
    def n_instances(self):
        return self.inst_o2w.shape[0]

    @property
    def n_anim_tris(self):
        return self.anim_p0.shape[0]

    @property
    def n_anim_groups(self):
        return self.anim_range.shape[0]

    @property
    def n_lights(self):
        return self.light_type.shape[0]

    @property
    def has_env(self):
        return self.inf_radiance.shape[0] > 1

    @property
    def has_hair(self):
        return self.hair_flag.shape[0] > 0

    @property
    def has_alpha(self):
        return self.alpha_flag.shape[0] > 0

    @property
    def quad_kind_mask(self):
        return self.quad_kind_flag.shape[0]

    @property
    def has_sphere_lights(self):
        return self.sphlight_flag.shape[0] > 0

    @property
    def has_quadric_lights(self):
        return self.qdlight_flag.shape[0] > 0

    @property
    def has_media(self):
        return self.med_flag.shape[0] > 0

    @property
    def has_subsurface(self):
        return self.bss_profile.shape[0] > 0

    @property
    def has_fourier(self):
        return self.fou_mu.shape[0] > 0

    @property
    def tex_kind_mask(self):
        return self.tex_kind_flag.shape[0]

    @property
    def tex_slot_mask(self):
        return self.tex_slot_flag.shape[0]

    @property
    def mat_kind_mask(self):
        return self.mat_kind_flag.shape[0]


def empty_scene_arrays(n_tris=0, n_sph=0, n_mat=1, n_lights=0, alight_pad=1):
    """Host-side numpy template dict with all keys zero-sized/defaulted."""
    T, S, M, L = max(n_tris, 0), max(n_sph, 0), max(n_mat, 1), max(n_lights, 0)
    z3 = lambda n: np.zeros((n, 3), np.float32)
    z2 = lambda n: np.zeros((n, 2), np.float32)
    return dict(
        tri_p0=z3(T), tri_p1=z3(T), tri_p2=z3(T),
        tri_n0=z3(T), tri_n1=z3(T), tri_n2=z3(T),
        tri_uv0=z2(T), tri_uv1=z2(T), tri_uv2=z2(T),
        tri_has_n=np.zeros(T, bool),
        tri_mat=np.zeros(T, np.int32),
        tri_light=np.full(T, -1, np.int32),
        tri_reverse=np.zeros(T, bool),
        tri_alpha=np.full(T, -1, np.int32),
        tri_salpha=np.full(T, -1, np.int32),
        sph_o2w=np.tile(np.eye(4, dtype=np.float32), (S, 1, 1)),
        sph_w2o=np.tile(np.eye(4, dtype=np.float32), (S, 1, 1)),
        sph_params=np.zeros((S, 4), np.float32),
        sph_kind=np.zeros(S, np.int32),
        sph_mat=np.zeros(S, np.int32),
        sph_light=np.full(S, -1, np.int32),
        sph_reverse=np.zeros(S, bool),
        crv_attr=np.zeros((0, 26), np.float32),  # curves.N_CURVE_ATTR
        proto_p0=np.zeros((0, 3), np.float32),
        proto_p1=np.zeros((0, 3), np.float32),
        proto_p2=np.zeros((0, 3), np.float32),
        proto_attr=np.zeros((1, N_TRI_ATTR), np.float32),
        proto_range=np.zeros((0, 2), np.int32),
        inst_o2w=np.zeros((0, 4, 4), np.float32),
        inst_w2o=np.zeros((0, 4, 4), np.float32),
        inst_proto=np.zeros(0, np.int32),
        inst_mat=np.full(0, -1, np.int32),
        anim_p0=np.zeros((0, 3), np.float32),
        anim_p1=np.zeros((0, 3), np.float32),
        anim_p2=np.zeros((0, 3), np.float32),
        anim_attr=np.zeros((1, N_TRI_ATTR), np.float32),
        anim_range=np.zeros((0, 2), np.int32),
        anim_xf=np.zeros((0, 32), np.float32),
        mat_type=np.zeros(M, np.int32),
        mat_params=np.zeros((M, N_MAT_PARAMS), np.float32),
        mat_tex=np.full((M, N_TEX_SLOTS), -1, np.int32),
        tex_type=np.zeros(1, np.int32),
        tex_params=np.zeros((1, 16), np.float32),
        tex_child=np.full((1, 2), -1, np.int32),
        tex_w2t=np.tile(np.eye(4, dtype=np.float32), (1, 1, 1)),
        tex_atlas=np.zeros((1, 1, 3), np.float32),
        tex_rect=np.zeros((1, 4), np.int32),
        tex_mip=np.zeros((1, 12, 3), np.int32),
        tex_nlv=np.ones(1, np.int32),
        light_type=np.zeros(L, np.int32),
        light_flags=np.zeros(L, np.int32),
        light_params=np.zeros((L, N_LIGHT_PARAMS), np.float32),
        light_geom_kind=np.zeros(L, np.int32),
        light_tri_start=np.zeros(L, np.int32),
        light_tri_end=np.zeros(L, np.int32),
        light_shape_idx=np.zeros(L, np.int32),
        alight_tri_cdf=np.zeros((L, alight_pad + 1), np.float32),
        light_power=np.ones(L, np.float32),
        med_sigma_a=np.zeros((1, 3), np.float32),
        med_sigma_s=np.zeros((1, 3), np.float32),
        med_g=np.zeros(1, np.float32),
        med_grid=np.ones((1, 1, 1, 1), np.float32),
        med_w2m=np.tile(np.eye(4, dtype=np.float32), (1, 1, 1)),
        med_max_density=np.ones(1, np.float32),
        tri_med=np.full((T, 2), -1, np.int32),
        sph_med=np.full((S, 2), -1, np.int32),
        camera_medium=np.int32(-1),
        inf_radiance=np.zeros((1, 1, 3), np.float32),
        inf_w2l=np.eye(4, dtype=np.float32),
        inf_l2w=np.eye(4, dtype=np.float32),
        world_center=np.zeros(3, np.float32),
        world_radius=np.float32(1.0),
        hair_flag=np.zeros(0, np.float32),
        med_flag=np.zeros(0, np.float32),
        bss_profile=np.zeros((0, 3, 64), np.float32),
        bss_cdf=np.zeros((0, 3, 64), np.float32),
        bss_rho_eff=np.zeros((0, 3), np.float32),
        bss_sigma_t=np.zeros((0, 3), np.float32),
        bss_eta=np.zeros(0, np.float32),
        fou_mu=np.zeros(0, np.float32),
        fou_dense=np.zeros((0, 0), np.float32),
        fou_m=np.zeros(0, np.int32),
        fou_cdf=np.zeros((0, 0), np.float32),
        fou_a0=np.zeros((0, 0), np.float32),
        fou_eta=np.float32(1.0),
        tex_kind_flag=np.zeros((0, 0), np.float32),
        tex_slot_flag=np.zeros((0, 0), np.float32),
        mat_kind_flag=np.zeros((0, 0), np.float32),
    )


def finalize_scene(arrs: dict) -> Scene:
    """dict of numpy arrays -> device Scene pytree (computes world bound and
    the env-map importance distribution if not already given)."""
    from ..ops.sampling import make_distribution_2d
    import jax

    pts = []
    if len(arrs["tri_p0"]):
        pts += [arrs["tri_p0"], arrs["tri_p1"], arrs["tri_p2"]]
    if len(arrs["sph_o2w"]):
        # conservative: transformed sphere centers +- scaled radius
        c = arrs["sph_o2w"][:, :3, 3]
        scale = np.linalg.norm(arrs["sph_o2w"][:, :3, :3], axis=(1, 2))
        r = quadric_bound_radius(arrs["sph_params"], arrs["sph_kind"]) * scale
        pts += [c - r[:, None], c + r[:, None]]
    if len(arrs.get("inst_o2w", ())):
        pp = np.stack([arrs["proto_p0"], arrs["proto_p1"], arrs["proto_p2"]])
        pr = np.asarray(arrs["proto_range"], np.int64)
        plo = np.stack([pp[:, a:b].min((0, 1)) for a, b in pr])  # (P,3)
        phi = np.stack([pp[:, a:b].max((0, 1)) for a, b in pr])
        ip = np.asarray(arrs["inst_proto"], np.int64)
        lo, hi = plo[ip], phi[ip]
        corners = np.stack(
            [np.stack([np.where(m & 1, hi[:, 0], lo[:, 0]),
                       np.where(m & 2, hi[:, 1], lo[:, 1]),
                       np.where(m & 4, hi[:, 2], lo[:, 2])], -1)
             for m in range(8)], 1)  # (I,8,3)
        R3 = arrs["inst_o2w"][:, :3, :3]
        t3 = arrs["inst_o2w"][:, :3, 3]
        wc = np.einsum("ikj,icj->ick", R3, corners) + t3[:, None, :]
        pts += [wc.min(1).astype(np.float32), wc.max(1).astype(np.float32)]
    if len(arrs.get("crv_attr", ())):
        cp = arrs["crv_attr"][:, 0:12].reshape(-1, 4, 3)
        hw = arrs["crv_attr"][:, 12:14].max(1)[:, None] * 0.5
        pts += [cp.min(1) - hw, cp.max(1) + hw]
    if len(arrs.get("anim_p0", ())):
        # interval motion bound over the WHOLE shutter, not just the
        # endpoint union (reference transform.rs:2207-2281 motion_bounds;
        # utils/animated.motion_bounds chord + arc-deviation form)
        from ..utils import animated as _an

        av = np.concatenate([arrs["anim_p0"], arrs["anim_p1"], arrs["anim_p2"]])
        rg = np.asarray(arrs["anim_range"], np.int64)
        A = len(arrs["anim_p0"])
        for g, (a, b) in enumerate(rg):
            xf = arrs["anim_xf"][g]
            vv = np.concatenate([av[a:b], av[A + a:A + b], av[2 * A + a:2 * A + b]])
            lo, hi = _an.motion_bounds(
                xf[0:3], xf[3:7], xf[7:16], xf[16:19], xf[19:23], xf[23:32], vv
            )
            pts += [lo[None], hi[None]]
    if pts:
        allp = np.concatenate(pts, 0)
        lo, hi = allp.min(0), allp.max(0)
        center = 0.5 * (lo + hi)
        radius = float(np.linalg.norm(hi - center)) + 1e-6
    else:
        center, radius = np.zeros(3, np.float32), 1.0
    arrs["world_center"] = center.astype(np.float32)
    arrs["world_radius"] = np.float32(radius)

    # distant/infinite lights need world radius in their params; spots
    # repurpose the world-center slot for their direction (set by builder)
    for li in range(len(arrs["light_type"])):
        arrs["light_params"][li, LP_WORLD_RADIUS] = radius
        if arrs["light_type"][li] not in (LIGHT_SPOT, LIGHT_PROJECTION, LIGHT_GONIO):
            arrs["light_params"][li, LP_WORLD_CENTER : LP_WORLD_CENTER + 3] = center

    rad = arrs["inf_radiance"]
    if rad.shape[0] > 1:
        h, w = rad.shape[:2]
        lum = rad @ np.array([0.212671, 0.715160, 0.072169], np.float32)
        sin_theta = np.sin(np.pi * (np.arange(h) + 0.5) / h).astype(np.float32)
        inf_dist = make_distribution_2d(jnp.asarray(lum * sin_theta[:, None]))
    else:
        inf_dist = make_distribution_2d(jnp.ones((1, 1), jnp.float32))

    # ---- derived packed attribute tables (host numpy) ----
    T = len(arrs["tri_p0"])
    tri_attr = np.zeros((max(T, 1), N_TRI_ATTR), np.float32)
    if T:
        tri_attr[:, TA_P0 : TA_P0 + 3] = arrs["tri_p0"]
        tri_attr[:, TA_P1 : TA_P1 + 3] = arrs["tri_p1"]
        tri_attr[:, TA_P2 : TA_P2 + 3] = arrs["tri_p2"]
        tri_attr[:, TA_N0 : TA_N0 + 3] = arrs["tri_n0"]
        tri_attr[:, TA_N1 : TA_N1 + 3] = arrs["tri_n1"]
        tri_attr[:, TA_N2 : TA_N2 + 3] = arrs["tri_n2"]
        tri_attr[:, TA_UV0 : TA_UV0 + 2] = arrs["tri_uv0"]
        tri_attr[:, TA_UV1 : TA_UV1 + 2] = arrs["tri_uv1"]
        tri_attr[:, TA_UV2 : TA_UV2 + 2] = arrs["tri_uv2"]
        tri_attr[:, TA_HAS_N] = arrs["tri_has_n"]
        tri_attr[:, TA_MAT] = arrs["tri_mat"]
        tri_attr[:, TA_LIGHT] = arrs["tri_light"]
        tri_attr[:, TA_REVERSE] = arrs["tri_reverse"]
        tri_attr[:, TA_MED_IN] = arrs["tri_med"][:, 0]
        tri_attr[:, TA_MED_OUT] = arrs["tri_med"][:, 1]
        tri_attr[:, TA_ALPHA] = arrs["tri_alpha"]
        tri_attr[:, TA_SALPHA] = arrs["tri_salpha"]
    arrs["tri_attr"] = tri_attr

    M = len(arrs["mat_type"])
    mat_attr = np.zeros((M, N_MAT_ATTR), np.float32)
    mat_attr[:, MA_TYPE] = arrs["mat_type"]
    mat_attr[:, MA_PARAMS : MA_PARAMS + N_MAT_PARAMS] = arrs["mat_params"]
    mat_attr[:, MA_TEX : MA_TEX + N_TEX_SLOTS] = arrs["mat_tex"]
    arrs["mat_attr"] = mat_attr

    L = len(arrs["light_type"])
    light_attr = np.zeros((max(L, 1), N_LIGHT_ATTR), np.float32)
    if L:
        light_attr[:, :N_LIGHT_PARAMS] = arrs["light_params"]
        light_attr[:, LA_TYPE] = arrs["light_type"]
        light_attr[:, LA_FLAGS] = arrs["light_flags"]
        light_attr[:, LA_GEOM] = arrs["light_geom_kind"]
        light_attr[:, LA_TRI_START] = arrs["light_tri_start"]
        light_attr[:, LA_TRI_END] = arrs["light_tri_end"]
        light_attr[:, LA_SHAPE_IDX] = arrs["light_shape_idx"]
    arrs["light_attr"] = light_attr

    S = len(arrs["sph_o2w"])
    sph_attr = np.zeros((max(S, 1), N_SPH_ATTR), np.float32)
    if S:
        sph_attr[:, SP_O2W : SP_O2W + 16] = arrs["sph_o2w"].reshape(S, 16)
        sph_attr[:, SP_W2O : SP_W2O + 16] = arrs["sph_w2o"].reshape(S, 16)
        sph_attr[:, SP_PARAMS : SP_PARAMS + 4] = arrs["sph_params"]
        sph_attr[:, SP_MAT] = arrs["sph_mat"]
        sph_attr[:, SP_LIGHT] = arrs["sph_light"]
        sph_attr[:, SP_REVERSE] = arrs["sph_reverse"]
        sph_attr[:, SP_MED_IN] = arrs["sph_med"][:, 0]
        sph_attr[:, SP_MED_OUT] = arrs["sph_med"][:, 1]
        sph_attr[:, SP_KIND] = arrs["sph_kind"]
    arrs["sph_attr"] = sph_attr
    qmask = 0
    for k in np.unique(np.asarray(arrs["sph_kind"], np.int64)) if S else ():
        qmask |= 1 << int(k)
    arrs["quad_kind_flag"] = np.zeros((qmask, 0), np.float32)

    arrs["hair_flag"] = np.zeros(
        1 if np.any(np.asarray(arrs["mat_type"]) == HAIR) else 0, np.float32
    )
    arrs["alpha_flag"] = np.zeros(
        1
        if (np.any(np.asarray(arrs["tri_alpha"]) >= 0)
            or np.any(np.asarray(arrs["tri_salpha"]) >= 0))
        else 0,
        np.float32,
    )
    arrs["sphlight_flag"] = np.zeros(
        1 if np.any(np.asarray(arrs["light_geom_kind"]) == ALG_SPHERE) else 0,
        np.float32,
    )
    arrs["qdlight_flag"] = np.zeros(
        1
        if np.any(np.isin(np.asarray(arrs["light_geom_kind"]),
                          (ALG_CYLINDER, ALG_DISK)))
        else 0,
        np.float32,
    )
    arrs["med_flag"] = np.zeros(
        1
        if (np.any(np.asarray(arrs["tri_med"]) >= 0)
            or np.any(np.asarray(arrs["sph_med"]) >= 0)
            or int(arrs["camera_medium"]) >= 0)
        else 0,
        np.float32,
    )
    kind_mask = 0
    for t in np.unique(np.asarray(arrs["tex_type"], np.int64)):
        kind_mask |= 1 << int(t)
    if arrs["tex_type"].shape[0] <= 1 and not np.any(arrs["mat_tex"] >= 0):
        kind_mask = 0  # no real textures
    slot_mask = 0
    mt = np.asarray(arrs["mat_tex"])
    for s_ in range(mt.shape[1]):
        if np.any(mt[:, s_] >= 0):
            slot_mask |= 1 << s_
    arrs["tex_kind_flag"] = np.zeros((kind_mask, 0), np.float32)
    arrs["tex_slot_flag"] = np.zeros((slot_mask, 0), np.float32)
    mat_mask = 0
    for t in np.unique(np.asarray(arrs["mat_type"], np.int64)):
        mat_mask |= 1 << int(t)
    arrs["mat_kind_flag"] = np.zeros((mat_mask, 0), np.float32)
    dev = {k: jnp.asarray(v) for k, v in arrs.items()}
    return Scene(inf_dist=inf_dist, **dev)
