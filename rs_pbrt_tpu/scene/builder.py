"""Programmatic scene construction -> flat SceneArrays.

TPU-native replacement for the reference's pbrtAPI state machine factories
(src/core/api.rs make_* functions, :1608-1754): a SceneBuilder accumulates
numpy tables and finalizes into the device Scene pytree.  The .pbrt parser
(scene/parser.py) drives this same API, mirroring how the reference's
Blender importer reuses the api.rs factories (SURVEY §3.5).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..models import lights as lt
from ..utils import transform as tr
from ..utils.spectrum import copper_rgb
from . import arrays as sa


class SceneBuilder:
    def __init__(self):
        self.tris = {k: [] for k in (
            "p0", "p1", "p2", "n0", "n1", "n2", "uv0", "uv1", "uv2",
            "has_n", "mat", "light", "reverse")}
        self.n_tri_rows = 0  # running count (entries are (k, ...) blocks)
        self.sphs = {k: [] for k in ("o2w", "w2o", "params", "kind", "mat", "light", "reverse")}
        self.curves = []  # list of packed (M_i, N_CURVE_ATTR) segment blocks
        # two-level instancing (primitive.rs TransformedPrimitive): shared
        # object-space prototype meshes + per-instance transforms
        self.protos = []  # list of dict(p0,p1,p2,attr) numpy blocks
        self.instances = []  # list of (proto_id, o2w(4,4), mat_override)
        # object-level motion blur groups (reference TransformedPrimitive
        # w/ AnimatedTransform, primitive.rs:198-265): object-space tris +
        # decomposed start/end transforms
        self.anims = []  # list of dict(p0,p1,p2,n*,uv*,has_n,mat,reverse,xf)
        self.bssrdfs = []  # list of per-material folded BSSRDF table dicts
        self.fourier_table = None  # single SCATFUN table dict (ops/fourier_bsdf)
        self.mats = []  # list of (type, params, tex)
        self.lights = []  # list of dicts
        self.env = None  # (radiance HxWx3, l2w, w2o)
        self.media = []  # list of (sigma_a, sigma_s, g)
        self.camera_medium = -1
        self.textures = []  # list of (type, params(16,), children(2,), w2t(4,4), image|None)
        # default material: grey matte (reference api.rs default)
        self.add_matte(kd=(0.5, 0.5, 0.5))

    # ---- materials (reference src/materials/*, factory api.rs:634-732) ----

    def _add_material(self, mtype, **kw):
        p = np.zeros(sa.N_MAT_PARAMS, np.float32)
        t = np.full(sa.N_TEX_SLOTS, -1, np.int32)
        p[sa.MP_KD : sa.MP_KD + 3] = kw.get("kd", (0, 0, 0))
        p[sa.MP_KS : sa.MP_KS + 3] = kw.get("ks", (0, 0, 0))
        p[sa.MP_KR : sa.MP_KR + 3] = kw.get("kr", (0, 0, 0))
        p[sa.MP_KT : sa.MP_KT + 3] = kw.get("kt", (0, 0, 0))
        p[sa.MP_ROUGH_U] = kw.get("rough_u", kw.get("roughness", 0.0))
        p[sa.MP_ROUGH_V] = kw.get("rough_v", kw.get("roughness", 0.0))
        p[sa.MP_ETA] = kw.get("eta", 1.5)
        p[sa.MP_SIGMA] = kw.get("sigma", 0.0)
        p[sa.MP_REMAP_ROUGH] = float(kw.get("remap_roughness", True))
        p[sa.MP_ETA3 : sa.MP_ETA3 + 3] = kw.get("eta3", (0.2, 0.92, 1.1))
        p[sa.MP_K3 : sa.MP_K3 + 3] = kw.get("k3", (3.9, 2.45, 2.14))
        p[sa.MP_OPACITY : sa.MP_OPACITY + 3] = kw.get("opacity", (1, 1, 1))
        p[sa.MP_BSSRDF] = -1
        self.mats.append((mtype, p, t))
        return len(self.mats) - 1

    def add_matte(self, kd=(0.5, 0.5, 0.5), sigma=0.0):
        return self._add_material(sa.MATTE, kd=kd, sigma=sigma)

    def add_plastic(self, kd=(0.25,) * 3, ks=(0.25,) * 3, roughness=0.1, remap=True):
        return self._add_material(sa.PLASTIC, kd=kd, ks=ks, roughness=roughness, remap_roughness=remap)

    def add_mirror(self, kr=(0.9, 0.9, 0.9)):
        return self._add_material(sa.MIRROR, kr=kr)

    def add_glass(self, kr=(1, 1, 1), kt=(1, 1, 1), eta=1.5, roughness=0.0, remap=True):
        return self._add_material(
            sa.GLASS, kr=kr, kt=kt, eta=eta, roughness=roughness, remap_roughness=remap
        )

    def add_metal(self, eta3=None, k3=None, roughness=0.01, remap=True):
        """Conductor material; defaults to the measured copper spectra
        resampled to RGB at build time (reference metal.rs:12-121:
        Spectrum::from_sampled(COPPER_*))."""
        if eta3 is None or k3 is None:
            cu_eta, cu_k = copper_rgb()
            eta3 = cu_eta if eta3 is None else eta3
            k3 = cu_k if k3 is None else k3
        return self._add_material(sa.METAL, eta3=eta3, k3=k3, roughness=roughness, remap_roughness=remap)

    def add_substrate(self, kd=(0.5,) * 3, ks=(0.5,) * 3, roughness=0.1, remap=True):
        return self._add_material(sa.SUBSTRATE, kd=kd, ks=ks, roughness=roughness, remap_roughness=remap)

    def add_uber(self, kd=(0.25,) * 3, ks=(0.25,) * 3, kr=(0, 0, 0), kt=(0, 0, 0), roughness=0.1, eta=1.5, opacity=(1, 1, 1), remap=True):
        return self._add_material(
            sa.UBER, kd=kd, ks=ks, kr=kr, kt=kt, roughness=roughness, eta=eta,
            opacity=opacity, remap_roughness=remap,
        )

    def add_translucent(self, kd=(0.25,) * 3, reflect=(0.5,) * 3, transmit=(0.5,) * 3):
        """materials/translucent.rs: diffuse reflection + diffuse
        transmission scaled by reflect/transmit."""
        return self._add_material(sa.TRANSLUCENT, kd=kd, kr=reflect, kt=transmit)

    def add_disney(self, color=(0.5,) * 3, metallic=0.0, roughness=0.5,
                   sheen=0.0, clearcoat=0.0, eta=1.5, spec_tint=0.0,
                   anisotropic=0.0, spec_trans=0.0, clearcoat_gloss=1.0,
                   sheen_tint=0.5, thin=False, flatness=0.0, diff_trans=0.0):
        """Principled BSDF (reference materials/disney.rs:640): diffuse+
        retro, sheen, anisotropic GGX with tinted DisneyFresnel, GTR1
        clearcoat, specular transmission, and THIN-surface mode (flatness
        blends the diffuse lobe toward the Hanrahan-Krueger fake-
        subsurface term; diff_trans adds a Lambertian transmission lobe —
        disney.rs thin branch).  Scalar packing:
        MP_KS = (metallic, sheen, clearcoat);
        MP_OPACITY = (spec_tint, anisotropic, spec_trans);
        MP_KR = (clearcoat_gloss, sheen_tint, flatness);
        MP_KT = (thin, diff_trans, 0)."""
        return self._add_material(
            sa.DISNEY, kd=color, ks=(metallic, sheen, clearcoat),
            opacity=(spec_tint, anisotropic, spec_trans),
            kr=(clearcoat_gloss, sheen_tint, float(flatness)),
            kt=(float(bool(thin)), float(diff_trans), 0.0),
            roughness=roughness, eta=eta, remap_roughness=False,
        )

    def add_hair(self, sigma_a=None, color=None, eumelanin=None, pheomelanin=None,
                 eta=1.55, beta_m=0.3, beta_n=0.3, alpha=2.0):
        """Hair material (reference materials/hair.rs:28-126).  Parameter
        resolution order mirrors HairMaterial::create: sigma_a > color >
        melanin concentrations > default eumelanin 1.3."""
        mode = 0.0  # MP_OPACITY.x: 0 = KD holds sigma_a, 1 = KD holds color
        if sigma_a is not None:
            kd = sigma_a
        elif color is not None:
            kd = color
            mode = 1.0
        else:
            ce = 1.3 if (eumelanin is None and pheomelanin is None) else (eumelanin or 0.0)
            cp = pheomelanin or 0.0
            eu = np.array([0.419, 0.697, 1.37], np.float32)
            ph = np.array([0.187, 0.4, 1.05], np.float32)
            kd = tuple(ce * eu + cp * ph)
        return self._add_material(
            sa.HAIR, kd=kd, rough_u=beta_m, rough_v=beta_n, sigma=alpha,
            eta=eta, remap_roughness=False, opacity=(mode, 0.0, 0.0),
        )

    def add_subsurface(self, sigma_a=None, sigma_s=None, name=None, scale=1.0,
                       eta=1.33, g=0.0, kr=(1.0,) * 3, kt=(1.0,) * 3,
                       roughness=0.0, remap=True):
        """Subsurface material (reference materials/subsurface.rs): a
        glass-like surface BSDF + a TabulatedBssrdf built from the
        photon-beam-diffusion table (core/bssrdf.rs:569-682).  The (rho,
        radius) table is folded to per-channel radius profiles at build time
        (see ops/bssrdf.py)."""
        from ..ops import bssrdf as bss

        if name is not None:
            from ..io.measured_ss import get_medium_scattering_properties

            props = get_medium_scattering_properties(name)
            if props is not None:
                sigma_a, sigma_s = props
        if sigma_a is None:
            sigma_a = (0.0011, 0.0024, 0.014)
        if sigma_s is None:
            sigma_s = (2.55, 3.21, 3.77)
        sigma_a = np.asarray(sigma_a, np.float32) * scale
        sigma_s = np.asarray(sigma_s, np.float32) * scale
        tabs = bss.make_material_tables(sigma_a, sigma_s, g, eta)
        self.bssrdfs.append(tabs)
        mid = self._add_material(
            sa.SUBSURFACE, kr=kr, kt=kt, eta=eta, roughness=roughness,
            remap_roughness=remap,
        )
        self.mats[mid][1][sa.MP_BSSRDF] = len(self.bssrdfs) - 1
        return mid

    def add_fourier(self, bsdffile=None, table=None):
        """FourierBSDF material (reference materials/fourier.rs + the
        SCATFUN loader reflection.rs:80-187).  One table per scene."""
        from ..ops import fourier_bsdf as fb

        if table is None and bsdffile is not None:
            table = fb.make_fourier_table(fb.read_bsdf_file(bsdffile))
        if table is not None:
            self.fourier_table = table
        return self._add_material(sa.FOURIER)

    def add_mix(self, mat1: int, mat2: int, amount=(0.5,) * 3):
        """Mix material (reference materials/mixmat.rs): true per-bxdf
        scaling — child A's lobes x amount + child B's lobes x (1-amount),
        resolved at shade time through the 4-slot stack
        (ops/bsdf.make_bsdf_at).  Packing: MP_KD = amount rgb,
        MP_KS[0/1] = child material ids.  Children contribute their two
        primary lobes (the reference unions up to 8 BxDFs)."""
        p = np.zeros(sa.N_MAT_PARAMS, np.float32)
        p[sa.MP_KD : sa.MP_KD + 3] = amount
        p[sa.MP_KS] = float(mat1)
        p[sa.MP_KS + 1] = float(mat2)
        p[sa.MP_BSSRDF] = -1
        self.mats.append((sa.MIXMAT, p, np.full(sa.N_TEX_SLOTS, -1, np.int32)))
        return len(self.mats) - 1

    def add_texture(self, tex_type, params=None, children=(-1, -1),
                    world_to_texture=None, image=None):
        """Texture table entry (reference src/textures/* create fns).
        params: dict of ops.texture.TP_* slot -> value, or (16,) array."""
        from ..ops import texture as tx

        pvec = np.zeros(tx.N_TEX_PARAMS, np.float32)
        pvec[tx.TP_SU] = 1.0
        pvec[tx.TP_SV] = 1.0
        pvec[tx.TP_GAMMA_SCALE] = 1.0
        if isinstance(params, dict):
            for k, v in params.items():
                if hasattr(v, "__len__"):
                    pvec[k : k + len(v)] = v
                else:
                    pvec[k] = v
        elif params is not None:
            pvec[: len(params)] = params
        w2t = np.asarray(
            (world_to_texture.m_inv if world_to_texture is not None else np.eye(4)),
            np.float32,
        )
        self.textures.append((int(tex_type), pvec, np.asarray(children, np.int32), w2t, image))
        return len(self.textures) - 1

    def set_material_texture(self, mat_id, slot, tex_id):
        """Bind a texture to a material's texturable slot (sa.TEX_SLOT_*)."""
        self.mats[mat_id][2][slot] = tex_id

    def add_medium(self, sigma_a=(1.0,) * 3, sigma_s=(1.0,) * 3, g=0.0, scale=1.0,
                   density_grid=None, medium_to_world=None):
        """Homogeneous or density-grid medium (reference
        media/homogeneous.rs + media/grid.rs + api.rs make_medium :953).
        density_grid: (D,H,W) numpy array; medium_to_world maps the unit
        cube onto the grid's world placement."""
        grid = None
        w2m = np.eye(4, dtype=np.float32)
        if density_grid is not None:
            grid = np.asarray(density_grid, np.float32)
            if medium_to_world is not None:
                w2m = np.asarray(medium_to_world.m_inv, np.float32)
        self.media.append(
            (np.asarray(sigma_a, np.float32) * scale,
             np.asarray(sigma_s, np.float32) * scale, float(g), grid, w2m)
        )
        return len(self.media) - 1

    # ---- geometry (reference api.rs get_shapes_and_materials :1789-2050) --

    def add_triangle_mesh(
        self,
        indices,
        positions,
        normals=None,
        uvs=None,
        material: int = 0,
        object_to_world: Optional[tr.Transform] = None,
        area_light=None,  # dict(L=(r,g,b), two_sided=bool, scale=(r,g,b))
        reverse_orientation: bool = False,
        medium_interface=(-1, -1),
        alpha_tex: int = -1,
        shadow_alpha_tex: int = -1,
    ):
        idx = np.asarray(indices, np.int32).reshape(-1, 3)
        P = np.asarray(positions, np.float32).reshape(-1, 3)
        if object_to_world is not None:
            m = np.asarray(object_to_world.m)
            P = P @ m[:3, :3].T + m[:3, 3]
            if normals is not None:
                mi = np.asarray(object_to_world.m_inv)
                normals = np.asarray(normals, np.float32) @ mi[:3, :3]
            if np.linalg.det(m[:3, :3]) < 0:
                reverse_orientation = not reverse_orientation
        n_tri = len(idx)
        light_id = -1
        if area_light is not None:
            light_id = self._add_area_light_tri(
                tri_start=self.n_tri_rows, n_tri=n_tri, P=P, idx=idx, **area_light
            )
        # fully vectorized block append (the former per-triangle python
        # loop made a 1.3M-tri mesh take 25-140s to assemble)
        t = self.tris
        i0, i1, i2 = idx[:, 0], idx[:, 1], idx[:, 2]
        t["p0"].append(P[i0]); t["p1"].append(P[i1]); t["p2"].append(P[i2])
        if normals is not None:
            N = np.asarray(normals, np.float32)
            t["n0"].append(N[i0]); t["n1"].append(N[i1]); t["n2"].append(N[i2])
            t["has_n"].append(np.ones(n_tri, bool))
        else:
            z = np.zeros((n_tri, 3), np.float32)
            t["n0"].append(z); t["n1"].append(z); t["n2"].append(z)
            t["has_n"].append(np.zeros(n_tri, bool))
        if uvs is not None:
            U = np.asarray(uvs, np.float32).reshape(-1, 2)
            t["uv0"].append(U[i0]); t["uv1"].append(U[i1]); t["uv2"].append(U[i2])
        else:
            t["uv0"].append(np.tile(np.array([[0, 0]], np.float32), (n_tri, 1)))
            t["uv1"].append(np.tile(np.array([[1, 0]], np.float32), (n_tri, 1)))
            t["uv2"].append(np.tile(np.array([[1, 1]], np.float32), (n_tri, 1)))
        t["mat"].append(np.full(n_tri, material, np.int32))
        t["light"].append(np.full(n_tri, light_id, np.int32))
        t["reverse"].append(np.full(n_tri, reverse_orientation, bool))
        t.setdefault("med", []).append(
            np.tile(np.asarray(medium_interface, np.int32)[None, :], (n_tri, 1))
        )
        t.setdefault("alpha", []).append(np.full(n_tri, alpha_tex, np.int32))
        t.setdefault("salpha", []).append(np.full(n_tri, shadow_alpha_tex, np.int32))
        self.n_tri_rows += n_tri
        return light_id

    def add_animated_triangle_mesh(
        self,
        indices,
        positions,
        object_to_world: tr.Transform,
        object_to_world_end: tr.Transform,
        normals=None,
        uvs=None,
        material: int = 0,
        reverse_orientation: bool = False,
    ):
        """Object-level motion blur mesh (reference TransformedPrimitive
        with AnimatedTransform, primitive.rs:198-265): triangles stay in
        OBJECT space; rays are carried into object space at ray time by
        the inverse interpolated transform.  Area lights / alpha masks /
        media are not supported on animated meshes (same restriction as
        instanced prototypes)."""
        from ..utils import animated as an

        idx = np.asarray(indices, np.int32).reshape(-1, 3)
        P = np.asarray(positions, np.float32).reshape(-1, 3)
        m0 = np.asarray(object_to_world.m, np.float64)
        m1 = np.asarray(object_to_world_end.m, np.float64)
        T0, q0, S0 = an.decompose(m0)
        T1, q1, S1 = an.decompose(m1)
        if np.linalg.det(m0[:3, :3]) < 0:
            reverse_orientation = not reverse_orientation
        n_tri = len(idx)
        i0, i1, i2 = idx[:, 0], idx[:, 1], idx[:, 2]
        if normals is not None:
            N = np.asarray(normals, np.float32)
            n0, n1, n2 = N[i0], N[i1], N[i2]
            has_n = np.ones(n_tri, bool)
        else:
            n0 = n1 = n2 = np.zeros((n_tri, 3), np.float32)
            has_n = np.zeros(n_tri, bool)
        if uvs is not None:
            U = np.asarray(uvs, np.float32).reshape(-1, 2)
            uv0, uv1, uv2 = U[i0], U[i1], U[i2]
        else:
            uv0 = np.tile(np.array([[0, 0]], np.float32), (n_tri, 1))
            uv1 = np.tile(np.array([[1, 0]], np.float32), (n_tri, 1))
            uv2 = np.tile(np.array([[1, 1]], np.float32), (n_tri, 1))
        self.anims.append(dict(
            p0=P[i0], p1=P[i1], p2=P[i2],
            n0=n0, n1=n1, n2=n2, has_n=has_n,
            uv0=uv0, uv1=uv1, uv2=uv2,
            mat=np.full(n_tri, material, np.int32),
            reverse=np.full(n_tri, reverse_orientation, bool),
            xf=np.concatenate([
                T0, q0, S0.ravel(), T1, q1, S1.ravel()
            ]).astype(np.float32),
        ))

    def add_sphere(
        self,
        object_to_world: Optional[tr.Transform] = None,
        radius=1.0,
        z_min=None,
        z_max=None,
        phi_max=360.0,
        material: int = 0,
        area_light=None,
        reverse_orientation: bool = False,
        medium_interface=(-1, -1),
    ):
        o2w = object_to_world or tr.identity()
        z_min = -radius if z_min is None else z_min
        z_max = radius if z_max is None else z_max
        light_id = -1
        if area_light is not None:
            # full-sphere area in WORLD units (o2w uniform scale folded in);
            # drives both the power heuristic and the inside-sphere
            # solid-angle pdf (models/lights.py _area_sample_sphere)
            scale = float(np.linalg.norm(np.asarray(o2w.m, np.float32)[:3, 0]))
            area = 4.0 * np.pi * (radius * scale) ** 2
            light_id = self._add_light(
                sa.LIGHT_AREA, flags=sa.LF_AREA,
                I=np.asarray(area_light.get("L", (1, 1, 1)), np.float32)
                * np.asarray(area_light.get("scale", (1, 1, 1)), np.float32),
                geom_kind=sa.ALG_SPHERE, shape_idx=len(self.sphs["o2w"]),
                area=area, two_sided=float(area_light.get("two_sided", False)),
            )
        self._add_quadric(
            o2w, sa.QK_SPHERE,
            np.array([radius, z_min, z_max, np.deg2rad(phi_max)], np.float32),
            material, light_id, reverse_orientation, medium_interface,
        )
        return light_id

    def _add_quadric(self, o2w, kind, params, material, light_id,
                     reverse_orientation, medium_interface):
        self.sphs["o2w"].append(np.asarray(o2w.m, np.float32))
        self.sphs["w2o"].append(np.asarray(o2w.m_inv, np.float32))
        self.sphs["params"].append(np.asarray(params, np.float32))
        self.sphs["kind"].append(kind)
        self.sphs["mat"].append(material)
        self.sphs["light"].append(light_id)
        self.sphs["reverse"].append(reverse_orientation)
        self.sphs.setdefault("med", []).append(medium_interface)

    def _add_quadric_area_light(self, area_light, geom_kind, world_area):
        """Area-light row for an analytic quadric shape (reference samples
        any shape as an area light, shape.rs:91-137; disk.rs/cylinder.rs
        sample + area)."""
        return self._add_light(
            sa.LIGHT_AREA, flags=sa.LF_AREA,
            I=np.asarray(area_light.get("L", (1, 1, 1)), np.float32)
            * np.asarray(area_light.get("scale", (1, 1, 1)), np.float32),
            geom_kind=geom_kind, shape_idx=len(self.sphs["o2w"]),
            area=world_area, two_sided=float(area_light.get("two_sided", False)),
        )

    def add_cylinder(self, object_to_world=None, radius=1.0, z_min=-1.0,
                     z_max=1.0, phi_max=360.0, material: int = 0,
                     area_light=None,
                     reverse_orientation: bool = False,
                     medium_interface=(-1, -1)):
        """Analytic cylinder (reference shapes/cylinder.rs)."""
        o2w = object_to_world or tr.identity()
        light_id = -1
        if area_light is not None:
            scale = float(np.linalg.norm(np.asarray(o2w.m, np.float32)[:3, 0]))
            area = (z_max - z_min) * radius * np.deg2rad(phi_max) * scale * scale
            light_id = self._add_quadric_area_light(
                area_light, sa.ALG_CYLINDER, area
            )
        self._add_quadric(
            o2w, sa.QK_CYLINDER,
            np.array([radius, z_min, z_max, np.deg2rad(phi_max)], np.float32),
            material, light_id, reverse_orientation, medium_interface,
        )
        return light_id

    def add_disk(self, object_to_world=None, height=0.0, radius=1.0,
                 inner_radius=0.0, phi_max=360.0, material: int = 0,
                 area_light=None,
                 reverse_orientation: bool = False,
                 medium_interface=(-1, -1)):
        """Analytic disk/annulus at z=height (reference shapes/disk.rs)."""
        o2w = object_to_world or tr.identity()
        light_id = -1
        if area_light is not None:
            scale = float(np.linalg.norm(np.asarray(o2w.m, np.float32)[:3, 0]))
            area = (
                0.5 * np.deg2rad(phi_max)
                * (radius * radius - inner_radius * inner_radius)
                * scale * scale
            )
            light_id = self._add_quadric_area_light(area_light, sa.ALG_DISK, area)
        self._add_quadric(
            o2w, sa.QK_DISK,
            np.array([radius, inner_radius, height, np.deg2rad(phi_max)], np.float32),
            material, light_id, reverse_orientation, medium_interface,
        )
        return light_id

    def add_curve(
        self,
        cps,
        width=1.0,
        width0=None,
        width1=None,
        curve_type="flat",
        normals=None,
        splitdepth=3,
        material: int = 0,
        object_to_world: Optional[tr.Transform] = None,
    ):
        """Cubic Bézier curve(s) (reference shapes/curve.rs create_curve_shape
        :556).  cps: (4,3) or (N,4,3) control points in object space; curves
        are flattened to leaf segments at build time (ops/curves.py)."""
        from ..ops import curves as cv

        cps = np.asarray(cps, np.float32).reshape(-1, 4, 3)
        n = cps.shape[0]
        if object_to_world is not None:
            m = np.asarray(object_to_world.m, np.float32)
            cps = cps @ m[:3, :3].T + m[:3, 3]
        w0 = np.full(n, width if width0 is None else width0, np.float32)
        w1 = np.full(n, width if width1 is None else width1, np.float32)
        ctype = {"flat": cv.FLAT, "cylinder": cv.CYLINDER, "ribbon": cv.RIBBON}[curve_type]
        n0 = n1 = None
        if normals is not None:
            nn = np.asarray(normals, np.float32).reshape(-1, 2, 3)
            if object_to_world is not None:
                minv_t = np.linalg.inv(np.asarray(object_to_world.m, np.float32)[:3, :3]).T
                nn = nn @ minv_t.T
            n0, n1 = nn[:, 0], nn[:, 1]
        arrs = cv.flatten_curves(cps, w0, w1, np.full(n, ctype, np.int32),
                                 n0, n1, splitdepth=splitdepth)
        at = cv.pack_curve_attr(arrs, np.full(arrs["crv_cp"].shape[0], material, np.int32))
        self.curves.append(at)
        return at.shape[0]

    # ---- lights (reference api.rs make_light :769-952) ----

    def _add_light(self, ltype, flags, I, geom_kind=sa.ALG_NONE, shape_idx=0,
                   area=0.0, two_sided=0.0, P=(0, 0, 0), extra=None,
                   tri_start=0, tri_end=0, tri_areas=None):
        lp = np.zeros(sa.N_LIGHT_PARAMS, np.float32)
        lp[sa.LP_P : sa.LP_P + 3] = P
        lp[sa.LP_I : sa.LP_I + 3] = I
        lp[sa.LP_TWO_SIDED] = two_sided
        lp[sa.LP_AREA] = area
        if extra:
            for k, v in extra.items():
                lp[k] = v
        self.lights.append(
            dict(type=ltype, flags=flags, params=lp, geom_kind=geom_kind,
                 shape_idx=shape_idx, tri_start=tri_start, tri_end=tri_end,
                 tri_areas=tri_areas)
        )
        return len(self.lights) - 1

    def _add_area_light_tri(self, tri_start, n_tri, P, idx, L=(1, 1, 1),
                            two_sided=False, scale=(1, 1, 1)):
        areas = np.zeros(n_tri, np.float32)
        for k in range(n_tri):
            i0, i1, i2 = idx[k]
            areas[k] = 0.5 * np.linalg.norm(np.cross(P[i1] - P[i0], P[i2] - P[i0]))
        return self._add_light(
            sa.LIGHT_AREA, flags=sa.LF_AREA,
            I=np.asarray(L, np.float32) * np.asarray(scale, np.float32),
            geom_kind=sa.ALG_TRI_RANGE, area=float(areas.sum()),
            two_sided=float(two_sided), tri_start=tri_start,
            tri_end=tri_start + n_tri, tri_areas=areas,
        )

    def add_point_light(self, p=(0, 0, 0), I=(1, 1, 1), scale=(1, 1, 1)):
        return self._add_light(
            sa.LIGHT_POINT, flags=sa.LF_DELTA_POSITION,
            I=np.asarray(I, np.float32) * np.asarray(scale, np.float32), P=p,
        )

    def add_spot_light(self, p=(0, 0, 0), to=(0, 0, 1), I=(1, 1, 1),
                       cone_angle=30.0, cone_delta=5.0, scale=(1, 1, 1)):
        d = np.asarray(to, np.float64) - np.asarray(p, np.float64)
        d = (d / np.linalg.norm(d)).astype(np.float32)
        li = self._add_light(
            sa.LIGHT_SPOT, flags=sa.LF_DELTA_POSITION,
            I=np.asarray(I, np.float32) * np.asarray(scale, np.float32), P=p,
            extra={
                sa.LP_COS_TOTAL: np.cos(np.deg2rad(cone_angle)),
                sa.LP_COS_FALLOFF: np.cos(np.deg2rad(cone_angle - cone_delta)),
            },
        )
        # spot direction is stored in the world-center slot (overwritten by
        # finalize for other light types only)
        self.lights[li]["spot_dir"] = d
        return li

    def add_projection_light(self, p=(0, 0, 0), to=(0, 0, 1), I=(1, 1, 1),
                             fov=45.0, image=None, scale=(1, 1, 1)):
        """reference lights/projection.rs (MipMap-projected spotlight)."""
        from ..ops import texture as tx

        if image is None:
            image = np.ones((4, 4, 3), np.float32)
        tex = self.add_texture(tx.TEX_IMAGEMAP, image=image)
        d = np.asarray(to, np.float64) - np.asarray(p, np.float64)
        d = (d / np.linalg.norm(d)).astype(np.float32)
        li = self._add_light(
            sa.LIGHT_PROJECTION, flags=sa.LF_DELTA_POSITION,
            I=np.asarray(I, np.float32) * np.asarray(scale, np.float32), P=p,
            extra={sa.LP_TEX: tex, sa.LP_TAN_FOV: np.tan(np.deg2rad(fov) / 2)},
        )
        self.lights[li]["spot_dir"] = d
        return li

    def add_gonio_light(self, p=(0, 0, 0), to=(0, 0, 1), I=(1, 1, 1),
                        image=None, scale=(1, 1, 1)):
        """reference lights/gonio.rs (angular intensity map)."""
        from ..ops import texture as tx

        if image is None:
            image = np.ones((4, 8, 3), np.float32)
        tex = self.add_texture(tx.TEX_IMAGEMAP, image=image)
        d = np.asarray(to, np.float64) - np.asarray(p, np.float64)
        d = (d / np.linalg.norm(d)).astype(np.float32)
        li = self._add_light(
            sa.LIGHT_GONIO, flags=sa.LF_DELTA_POSITION,
            I=np.asarray(I, np.float32) * np.asarray(scale, np.float32), P=p,
            extra={sa.LP_TEX: tex},
        )
        self.lights[li]["spot_dir"] = d
        return li

    def add_distant_light(self, from_p=(0, 0, 0), to=(0, 0, 1), L=(1, 1, 1), scale=(1, 1, 1)):
        w = np.asarray(from_p, np.float64) - np.asarray(to, np.float64)
        w = (w / np.linalg.norm(w)).astype(np.float32)
        return self._add_light(
            sa.LIGHT_DISTANT, flags=sa.LF_DELTA_DIRECTION,
            I=np.asarray(L, np.float32) * np.asarray(scale, np.float32), P=w,
        )

    def add_infinite_light(self, radiance_map=None, L=(1, 1, 1), scale=(1, 1, 1),
                           light_to_world: Optional[tr.Transform] = None):
        if radiance_map is None:
            radiance_map = np.ones((2, 2, 3), np.float32)
        radiance_map = np.asarray(radiance_map, np.float32) * (
            np.asarray(L, np.float32) * np.asarray(scale, np.float32)
        )
        l2w = light_to_world or tr.identity()
        self.env = (radiance_map, np.asarray(l2w.m, np.float32), np.asarray(l2w.m_inv, np.float32))
        return self._add_light(
            sa.LIGHT_INFINITE, flags=sa.LF_INFINITE, I=(0, 0, 0),
            extra=None,
        )

    # ---- finalize ----

    def add_prototype_mesh(self, indices, positions, normals=None, uvs=None,
                           material: int = 0):
        """Register a shared OBJECT-SPACE mesh for instancing.  Returns a
        prototype id for add_instance.  (reference primitive.rs:198-265 —
        one geometry copy however many instances reference it.)"""
        F = np.asarray(indices, np.int64).reshape(-1, 3)
        P = np.asarray(positions, np.float32).reshape(-1, 3)
        p0, p1, p2 = P[F[:, 0]], P[F[:, 1]], P[F[:, 2]]
        n = F.shape[0]
        attr = np.zeros((n, sa.N_TRI_ATTR), np.float32)
        attr[:, sa.TA_P0 : sa.TA_P0 + 3] = p0
        attr[:, sa.TA_P1 : sa.TA_P1 + 3] = p1
        attr[:, sa.TA_P2 : sa.TA_P2 + 3] = p2
        if normals is not None:
            N = np.asarray(normals, np.float32).reshape(-1, 3)
            attr[:, sa.TA_N0 : sa.TA_N0 + 3] = N[F[:, 0]]
            attr[:, sa.TA_N1 : sa.TA_N1 + 3] = N[F[:, 1]]
            attr[:, sa.TA_N2 : sa.TA_N2 + 3] = N[F[:, 2]]
            attr[:, sa.TA_HAS_N] = 1.0
        if uvs is not None:
            U = np.asarray(uvs, np.float32).reshape(-1, 2)
            attr[:, sa.TA_UV0 : sa.TA_UV0 + 2] = U[F[:, 0]]
            attr[:, sa.TA_UV1 : sa.TA_UV1 + 2] = U[F[:, 1]]
            attr[:, sa.TA_UV2 : sa.TA_UV2 + 2] = U[F[:, 2]]
        else:
            attr[:, sa.TA_UV1] = 1.0
            attr[:, sa.TA_UV2 : sa.TA_UV2 + 2] = 1.0
        attr[:, sa.TA_MAT] = material
        attr[:, sa.TA_LIGHT] = -1
        attr[:, sa.TA_ALPHA] = -1
        attr[:, sa.TA_SALPHA] = -1
        self.protos.append(dict(p0=p0, p1=p1, p2=p2, attr=attr))
        return len(self.protos) - 1

    def add_prototype_tris(self, tris: dict):
        """Register a prototype directly from a realized tris dict (the
        scene/api.py ObjectInstance path: shapes already expanded to
        per-triangle lists in object space)."""
        p0 = np.concatenate(tris["p0"]).astype(np.float32)
        p1 = np.concatenate(tris["p1"]).astype(np.float32)
        p2 = np.concatenate(tris["p2"]).astype(np.float32)
        n = p0.shape[0]
        attr = np.zeros((n, sa.N_TRI_ATTR), np.float32)
        attr[:, sa.TA_P0 : sa.TA_P0 + 3] = p0
        attr[:, sa.TA_P1 : sa.TA_P1 + 3] = p1
        attr[:, sa.TA_P2 : sa.TA_P2 + 3] = p2
        attr[:, sa.TA_N0 : sa.TA_N0 + 3] = np.concatenate(tris["n0"])
        attr[:, sa.TA_N1 : sa.TA_N1 + 3] = np.concatenate(tris["n1"])
        attr[:, sa.TA_N2 : sa.TA_N2 + 3] = np.concatenate(tris["n2"])
        attr[:, sa.TA_HAS_N] = np.concatenate(tris["has_n"]).astype(np.float32)
        attr[:, sa.TA_UV0 : sa.TA_UV0 + 2] = np.concatenate(tris["uv0"])
        attr[:, sa.TA_UV1 : sa.TA_UV1 + 2] = np.concatenate(tris["uv1"])
        attr[:, sa.TA_UV2 : sa.TA_UV2 + 2] = np.concatenate(tris["uv2"])
        attr[:, sa.TA_MAT] = np.concatenate(tris["mat"]).astype(np.float32)
        attr[:, sa.TA_LIGHT] = -1.0
        attr[:, sa.TA_REVERSE] = np.concatenate(tris["reverse"]).astype(np.float32)
        attr[:, sa.TA_ALPHA] = -1.0
        attr[:, sa.TA_SALPHA] = -1.0
        self.protos.append(dict(p0=p0, p1=p1, p2=p2, attr=attr))
        return len(self.protos) - 1

    def add_instance(self, proto_id: int, object_to_world=None,
                     material: int = -1):
        o2w = object_to_world or tr.identity()
        self.instances.append((proto_id, np.asarray(o2w.m, np.float32), material))

    def finalize(self) -> sa.Scene:
        n_tri = self.n_tri_rows
        n_sph = len(self.sphs["o2w"])
        n_mat = len(self.mats)
        n_l = len(self.lights)
        max_range = max(
            [l["tri_end"] - l["tri_start"] for l in self.lights] + [1]
        )
        arrs = sa.empty_scene_arrays(n_tri, n_sph, n_mat, n_l, alight_pad=max_range)

        for key, src in (
            ("tri_p0", "p0"), ("tri_p1", "p1"), ("tri_p2", "p2"),
            ("tri_n0", "n0"), ("tri_n1", "n1"), ("tri_n2", "n2"),
            ("tri_uv0", "uv0"), ("tri_uv1", "uv1"), ("tri_uv2", "uv2"),
        ):
            if n_tri:
                arrs[key] = np.concatenate(self.tris[src]).astype(np.float32)
        if n_tri:
            arrs["tri_has_n"] = np.concatenate(self.tris["has_n"]).astype(bool)
            arrs["tri_mat"] = np.concatenate(self.tris["mat"]).astype(np.int32)
            arrs["tri_light"] = np.concatenate(self.tris["light"]).astype(np.int32)
            arrs["tri_reverse"] = np.concatenate(self.tris["reverse"]).astype(bool)
            if self.tris.get("alpha"):
                arrs["tri_alpha"] = np.concatenate(self.tris["alpha"]).astype(np.int32)
                arrs["tri_salpha"] = np.concatenate(self.tris["salpha"]).astype(np.int32)
        if self.instances:
            arrs["proto_p0"] = np.concatenate([pr["p0"] for pr in self.protos])
            arrs["proto_p1"] = np.concatenate([pr["p1"] for pr in self.protos])
            arrs["proto_p2"] = np.concatenate([pr["p2"] for pr in self.protos])
            arrs["proto_attr"] = np.concatenate([pr["attr"] for pr in self.protos])
            offs = np.cumsum([0] + [pr["p0"].shape[0] for pr in self.protos])
            arrs["proto_range"] = np.stack([offs[:-1], offs[1:]], -1).astype(np.int32)
            o2ws = np.stack([i[1] for i in self.instances])
            arrs["inst_o2w"] = o2ws
            arrs["inst_w2o"] = np.linalg.inv(o2ws.astype(np.float64)).astype(np.float32)
            arrs["inst_proto"] = np.asarray([i[0] for i in self.instances], np.int32)
            arrs["inst_mat"] = np.asarray([i[2] for i in self.instances], np.int32)
        if self.anims:
            cat = lambda k: np.concatenate([g[k] for g in self.anims])
            arrs["anim_p0"] = cat("p0").astype(np.float32)
            arrs["anim_p1"] = cat("p1").astype(np.float32)
            arrs["anim_p2"] = cat("p2").astype(np.float32)
            offs = np.cumsum([0] + [len(g["p0"]) for g in self.anims])
            arrs["anim_range"] = np.stack([offs[:-1], offs[1:]], -1).astype(np.int32)
            arrs["anim_xf"] = np.stack([g["xf"] for g in self.anims])
            A = offs[-1]
            aat = np.zeros((max(A, 1), sa.N_TRI_ATTR), np.float32)
            aat[:, sa.TA_P0 : sa.TA_P0 + 3] = arrs["anim_p0"]
            aat[:, sa.TA_P1 : sa.TA_P1 + 3] = arrs["anim_p1"]
            aat[:, sa.TA_P2 : sa.TA_P2 + 3] = arrs["anim_p2"]
            aat[:, sa.TA_N0 : sa.TA_N0 + 3] = cat("n0")
            aat[:, sa.TA_N1 : sa.TA_N1 + 3] = cat("n1")
            aat[:, sa.TA_N2 : sa.TA_N2 + 3] = cat("n2")
            aat[:, sa.TA_HAS_N] = cat("has_n")
            aat[:, sa.TA_UV0 : sa.TA_UV0 + 2] = cat("uv0")
            aat[:, sa.TA_UV1 : sa.TA_UV1 + 2] = cat("uv1")
            aat[:, sa.TA_UV2 : sa.TA_UV2 + 2] = cat("uv2")
            aat[:, sa.TA_MAT] = cat("mat")
            aat[:, sa.TA_LIGHT] = -1.0
            aat[:, sa.TA_REVERSE] = cat("reverse")
            aat[:, sa.TA_MED_IN] = -1.0
            aat[:, sa.TA_MED_OUT] = -1.0
            aat[:, sa.TA_ALPHA] = -1.0
            aat[:, sa.TA_SALPHA] = -1.0
            arrs["anim_attr"] = aat
        if n_sph:
            arrs["sph_o2w"] = np.stack(self.sphs["o2w"])
            arrs["sph_w2o"] = np.stack(self.sphs["w2o"])
            arrs["sph_params"] = np.stack(self.sphs["params"])
            arrs["sph_kind"] = np.asarray(self.sphs["kind"], np.int32)
            arrs["sph_mat"] = np.asarray(self.sphs["mat"], np.int32)
            arrs["sph_light"] = np.asarray(self.sphs["light"], np.int32)
            arrs["sph_reverse"] = np.asarray(self.sphs["reverse"], bool)

        arrs["mat_type"] = np.asarray([m[0] for m in self.mats], np.int32)
        arrs["mat_params"] = np.stack([m[1] for m in self.mats])
        arrs["mat_tex"] = np.stack([m[2] for m in self.mats])

        for li, l in enumerate(self.lights):
            arrs["light_type"][li] = l["type"]
            arrs["light_flags"][li] = l["flags"]
            arrs["light_params"][li] = l["params"]
            arrs["light_geom_kind"][li] = l["geom_kind"]
            arrs["light_tri_start"][li] = l["tri_start"]
            arrs["light_tri_end"][li] = l["tri_end"]
            arrs["light_shape_idx"][li] = l["shape_idx"]
            if l["tri_areas"] is not None and len(l["tri_areas"]):
                a = np.asarray(l["tri_areas"], np.float64)
                cdf = np.concatenate([[0.0], np.cumsum(a)]) / max(a.sum(), 1e-12)
                arrs["alight_tri_cdf"][li, : len(cdf)] = cdf
                arrs["alight_tri_cdf"][li, len(cdf) :] = 1.0
            else:
                arrs["alight_tri_cdf"][li, :] = np.linspace(
                    0, 1, arrs["alight_tri_cdf"].shape[1]
                )

        if self.media:
            arrs["med_sigma_a"] = np.stack([m[0] for m in self.media])
            arrs["med_sigma_s"] = np.stack([m[1] for m in self.media])
            arrs["med_g"] = np.asarray([m[2] for m in self.media], np.float32)
            grids = [m[3] for m in self.media]
            dims = [(g.shape if g is not None else (1, 1, 1)) for g in grids]
            D = max(d[0] for d in dims); H = max(d[1] for d in dims); W = max(d[2] for d in dims)
            gstack = np.ones((len(self.media), D, H, W), np.float32)
            maxd = np.ones(len(self.media), np.float32)
            for i, g in enumerate(grids):
                if g is not None:
                    gstack[i, : g.shape[0], : g.shape[1], : g.shape[2]] = g
                    # pad region must never be sampled: w2m keeps p in the
                    # real extent; set pad to 0 to be safe
                    gstack[i, g.shape[0]:, :, :] = 0.0
                    gstack[i, :, g.shape[1]:, :] = 0.0
                    gstack[i, :, :, g.shape[2]:] = 0.0
                    maxd[i] = float(g.max())
            arrs["med_grid"] = gstack
            arrs["med_w2m"] = np.stack([m[4] for m in self.media])
            arrs["med_max_density"] = np.maximum(maxd, 1e-6)
        if n_tri and self.tris.get("med"):
            arrs["tri_med"] = np.concatenate(self.tris["med"]).astype(np.int32)
        if n_sph and self.sphs.get("med"):
            arrs["sph_med"] = np.asarray(self.sphs["med"], np.int32)
        arrs["camera_medium"] = np.int32(self.camera_medium)

        if self.curves:
            arrs["crv_attr"] = np.concatenate(self.curves, axis=0)

        if self.fourier_table is not None:
            t = self.fourier_table
            arrs["fou_mu"] = t["mu"]
            arrs["fou_dense"] = t["dense"]
            arrs["fou_m"] = t["m"]
            arrs["fou_cdf"] = t["cdf"]
            arrs["fou_a0"] = t["a0"]
            arrs["fou_eta"] = t["eta"]

        if self.bssrdfs:
            arrs["bss_profile"] = np.stack([t["profile"] for t in self.bssrdfs])
            arrs["bss_cdf"] = np.stack([t["cdf"] for t in self.bssrdfs])
            arrs["bss_rho_eff"] = np.stack([t["rho_eff"] for t in self.bssrdfs])
            arrs["bss_sigma_t"] = np.stack([t["sigma_t"] for t in self.bssrdfs])
            arrs["bss_eta"] = np.asarray([t["eta"] for t in self.bssrdfs], np.float32)

        if self.textures:
            from ..ops import texture as tx

            X = len(self.textures)
            arrs["tex_type"] = np.asarray([t[0] for t in self.textures], np.int32)
            arrs["tex_params"] = np.stack([t[1] for t in self.textures])
            arrs["tex_child"] = np.stack([t[2] for t in self.textures])
            arrs["tex_w2t"] = np.stack([t[3] for t in self.textures])
            # pack images into a vertical atlas — every texture's full mip
            # pyramid (ops/mipmap.py, reference core/mipmap.rs) is stacked,
            # one rect per (texture, level)
            from ..ops import mipmap as mp

            imgs = [(i, t[4]) for i, t in enumerate(self.textures) if t[4] is not None]
            rects = np.zeros((X, 4), np.int32)
            mips = np.zeros((X, mp.MAX_LEVELS, 3), np.int32)
            nlv = np.zeros(X, np.int32)
            if imgs:
                pyramids = {
                    i: mp.build_pyramid(im[..., :3], int(self.textures[i][1][tx.TP_WRAP]))
                    for i, im in imgs
                }
                aw = max(lv.shape[1] for p in pyramids.values() for lv in p)
                ah = sum(lv.shape[0] for p in pyramids.values() for lv in p)
                atlas = np.zeros((ah, aw, 3), np.float32)
                y = 0
                for i, _im in imgs:
                    for li, lv in enumerate(pyramids[i]):
                        h, w = lv.shape[:2]
                        atlas[y : y + h, :w] = lv
                        mips[i, li] = (y, h, w)
                        if li == 0:
                            rects[i] = (y, h, w, int(self.textures[i][1][tx.TP_WRAP]))
                        y += h
                    nlv[i] = len(pyramids[i])
                arrs["tex_atlas"] = atlas
            arrs["tex_rect"] = rects
            arrs["tex_mip"] = mips
            arrs["tex_nlv"] = nlv

        if self.env is not None:
            arrs["inf_radiance"] = self.env[0]
            arrs["inf_l2w"] = self.env[1]
            arrs["inf_w2l"] = self.env[2]

        # spot directions ride the world-center slot (finalize_scene leaves
        # it alone for spot lights)
        for li, l in enumerate(self.lights):
            if "spot_dir" in l:
                arrs["light_params"][li, sa.LP_WORLD_CENTER : sa.LP_WORLD_CENTER + 3] = l["spot_dir"]

        scene = sa.finalize_scene(arrs)

        env_total = float(np.mean(self.env[0])) * 3 if self.env is not None else 0.0
        power = lt.compute_light_power(
            np.asarray(scene.light_type), np.asarray(scene.light_params), env_total
        ) if n_l else np.ones(0, np.float32)
        import jax.numpy as jnp

        return scene._replace(
            light_power=jnp.asarray(power) if n_l else scene.light_power,
        )
