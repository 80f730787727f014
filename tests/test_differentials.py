"""Ray differentials -> texture-footprint mip filtering (VERDICT r3 #1).

Reference: camera.rs:28 generate_ray_differential, interaction.rs:388-470
compute_differentials, mipmap.rs:233-270 width lookup.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rs_pbrt_tpu.models import cameras as cam
from rs_pbrt_tpu.ops import bsdf as bx
from rs_pbrt_tpu.ops import differentials as rd
from rs_pbrt_tpu.ops import scene_intersect as si
from rs_pbrt_tpu.ops import texture as tx
from rs_pbrt_tpu.scene.builder import SceneBuilder
from rs_pbrt_tpu.utils import transform as tr


def _grazing_scene(img):
    """A big textured floor (y=0, uv = x,z / 40) seen from a low camera
    looking toward +z: distant hits have huge texture footprints."""
    b = SceneBuilder()
    tid = b.add_texture(tx.TEX_IMAGEMAP, {tx.TP_GAMMA_SCALE: 1.0}, image=img)
    m = b.add_matte()
    b.set_material_texture(m, 0, tid)  # TEX_SLOT_KD
    S = 40.0
    V = np.array(
        [[-S, 0, -1], [S, 0, -1], [S, 0, 2 * S], [-S, 0, 2 * S]], np.float32
    )
    UV = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    b.add_triangle_mesh(
        np.array([[0, 1, 2], [0, 2, 3]], np.int32), V, uvs=UV, material=m
    )
    return b.finalize()


def _camera(res=64):
    c2w = tr.look_at((0.0, 0.5, 0.0), (0.0, 0.3, 10.0), (0.0, 1.0, 0.0))
    return cam.make_perspective(c2w, fov=60.0, resolution=(res, res))


class TestWidthSolve:
    def test_frontal_plane_analytic(self):
        """Quad facing the camera: duv width must match the analytic
        pixel-footprint projection."""
        res = 64
        c2w = tr.identity()  # camera at origin looking +z
        camera = cam.make_perspective(c2w, fov=90.0, resolution=(res, res))
        n = 4
        p_film = jnp.asarray([[32.0, 32.0]] * n, jnp.float32)
        u0 = jnp.zeros((n, 2), jnp.float32)
        t0 = jnp.zeros((n,), jnp.float32)
        rays = cam.generate_rays(camera, p_film, u0, t0)
        diffs = rd.camera_differentials(camera, rays, p_film, u0, t0, spp=1)
        z = 5.0
        t_hit = z / np.asarray(rays.d)[:, 2]
        p = np.asarray(rays.o) + t_hit[:, None] * np.asarray(rays.d)
        # plane z=5 with u=(x+L)/(2L): dpdu=(2L,0,0), L=10
        L = 10.0
        it = si.Interaction(
            valid=jnp.ones(n, bool), t=jnp.asarray(t_hit),
            p=jnp.asarray(p), p_error=jnp.zeros((n, 3)),
            ng=jnp.asarray([[0.0, 0, -1]] * n), ns=jnp.asarray([[0.0, 0, -1]] * n),
            uv=jnp.zeros((n, 2)), wo=-rays.d,
            mat=jnp.zeros(n, jnp.int32), light=jnp.full(n, -1, jnp.int32),
            prim=jnp.full(n, -1, jnp.int32),  # not a tri: dpdv fallback
            dpdu=jnp.asarray([[2 * L, 0, 0]] * n),
        )

        class _S:
            n_tris = 0

        w = np.asarray(rd.duv_width_at_hit(_S(), it, diffs))
        # fov 90 at z=5: image plane spans 2*5=10 over 64 px ->
        # 0.15625 world/px -> /(2L) in u -> 0.0078125
        np.testing.assert_allclose(w, 10.0 / res / (2 * L), rtol=0.05)

    def test_grazing_filtering_reduces_variance(self):
        """Far hits on a striped floor: footprint-filtered kd has far lower
        pixel-to-pixel variance than point samples, and both keep the mean."""
        img = np.zeros((64, 64, 3), np.float32)
        img[:, ::2] = 1.0  # vertical stripes, mean 0.5
        scene = _grazing_scene(img)
        assert rd.needs_diffs(scene)
        camera = _camera(64)
        # rays through a horizontal row near the horizon (distant floor)
        n = 64
        # rows just under the horizon (raster y grows downward; the floor
        # appears from row ~32): distant, grazing hits
        rows = []
        for y in (32.5, 32.75, 33.0, 33.5, 34.0):
            rows.append(jnp.stack(
                [jnp.arange(n, dtype=jnp.float32) + 0.5, jnp.full(n, y)], -1
            ))
        px = jnp.concatenate(rows)
        m = px.shape[0]
        u0 = jnp.zeros((m, 2), jnp.float32)
        t0 = jnp.zeros((m,), jnp.float32)
        rays = cam.generate_rays(camera, px, u0, t0)
        diffs = rd.camera_differentials(camera, rays, px, u0, t0, spp=1)
        it = si.scene_intersect(scene, rays.o, rays.d, jnp.full(m, 1e6))
        far = np.asarray(it.valid) & (np.asarray(it.t) > 8.0)
        assert far.sum() > 32, f"only {far.sum()} far hits"
        width = rd.duv_width_at_hit(scene, it, diffs)
        assert float(np.asarray(width)[far].min()) > 0.0
        b_flt = bx.make_bsdf_from_mat(scene, it.mat, it.uv, it.p, width=width)
        b_pnt = bx.make_bsdf_from_mat(scene, it.mat, it.uv, it.p)
        kd_f = np.asarray(b_flt.r0)[far, 0]
        kd_p = np.asarray(b_pnt.r0)[far, 0]
        assert kd_f.std() < 0.25 * max(kd_p.std(), 1e-6), (kd_f.std(), kd_p.std())
        np.testing.assert_allclose(kd_f.mean(), 0.5, atol=0.1)

    def test_volpath_minification(self):
        """VERDICT r4 missing #3: the reference threads differentials
        through every SamplerIntegrator (integrator.rs:139-141), so
        textured VOLPATH scenes must mip-filter too.  Far grazing hits on
        a striped floor: volpath radiance with diffs has far lower
        pixel-to-pixel variance than without, same mean."""
        import jax.numpy as jnp

        from rs_pbrt_tpu.models import samplers as smpl
        from rs_pbrt_tpu.models.integrators import path as pathmod
        from rs_pbrt_tpu.models.integrators import volpath as volmod

        img = np.zeros((64, 64, 3), np.float32)
        img[:, ::2] = 1.0  # stripes, mean 0.5
        b = SceneBuilder()
        tid = b.add_texture(tx.TEX_IMAGEMAP, {tx.TP_GAMMA_SCALE: 1.0}, image=img)
        m = b.add_matte()
        b.set_material_texture(m, 0, tid)
        S = 40.0
        V = np.array(
            [[-S, 0, -1], [S, 0, -1], [S, 0, 2 * S], [-S, 0, 2 * S]], np.float32
        )
        UV = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        b.add_triangle_mesh(
            np.array([[0, 1, 2], [0, 2, 3]], np.int32), V, uvs=UV, material=m
        )
        # overhead quad light (smooth illumination over the floor)
        L = 30.0
        VL = np.array(
            [[-L, 30, -L], [L, 30, -L], [L, 30, 2 * S], [-L, 30, 2 * S]],
            np.float32,
        )
        b.add_triangle_mesh(
            np.array([[0, 2, 1], [0, 3, 2]], np.int32), VL,
            material=b.add_matte(kd=(0, 0, 0)),
            area_light=dict(L=(5.0, 5.0, 5.0)),
        )
        scene = b.finalize()
        assert rd.needs_diffs(scene)
        camera = _camera(64)
        rows = []
        n = 64
        for y in (32.5, 32.75, 33.0, 33.5, 34.0):
            rows.append(jnp.stack(
                [jnp.arange(n, dtype=jnp.float32) + 0.5, jnp.full(n, y)], -1
            ))
        px_f = jnp.concatenate(rows)
        m_n = px_f.shape[0]
        px = px_f.astype(jnp.int32)
        u0 = jnp.zeros((m_n, 2), jnp.float32)
        t0 = jnp.zeros((m_n,), jnp.float32)
        rays = cam.generate_rays(camera, px_f, u0, t0)
        diffs = rd.camera_differentials(camera, rays, px_f, u0, t0, spp=1)
        scfg = smpl.make_sampler(smpl.SOBOL, 1, camera.resolution)
        ctx = smpl.make_ctx(scfg, px, jnp.zeros(m_n, jnp.uint32))
        pcfg = pathmod.PathCfg(1, 1.0)
        L_f = np.asarray(volmod.radiance(
            scene, pcfg, scfg, ctx, rays.o, rays.d, diffs=diffs))
        L_p = np.asarray(volmod.radiance(
            scene, pcfg, scfg, ctx, rays.o, rays.d, diffs=None))
        it = si.scene_intersect(scene, rays.o, rays.d, jnp.full(m_n, 1e6))
        far = (
            np.asarray(it.valid)
            & (np.asarray(it.t) > 8.0)
            & (np.asarray(it.light) < 0)
        )
        assert far.sum() > 32
        v_f, v_p = L_f[far, 0].std(), L_p[far, 0].std()
        assert v_f < 0.5 * max(v_p, 1e-6), (v_f, v_p)
        np.testing.assert_allclose(
            L_f[far, 0].mean(), L_p[far, 0].mean(), rtol=0.25, atol=0.02
        )

    def test_render_smoke_with_diffs(self):
        """End-to-end wiring: a textured scene renders finite through the
        path integrator with the diffs path enabled."""
        from rs_pbrt_tpu.models import samplers as smpl
        from rs_pbrt_tpu.models.integrators import render as rdr

        img = np.zeros((16, 16, 3), np.float32)
        img[::2] = 1.0
        scene = _grazing_scene(img)
        camera = _camera(16)
        cfg = rdr.RenderCfg("path", spp=2, max_depth=2, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 2, camera.resolution)
        out = np.asarray(rdr.render(scene, camera, cfg, scfg))
        assert out.shape == (16, 16, 3)
        assert np.isfinite(out).all()
