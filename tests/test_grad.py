"""Differentiable rendering tests: AD vs finite differences on fixed seeds.

With detached sampling the estimator is a deterministic differentiable
function of the parameters for a fixed sample set, so reverse-mode AD and
central finite differences must agree tightly (BASELINE.md gradient metric).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_pbrt_tpu.diff import grad as dg
from rs_pbrt_tpu.models import cameras as cam
from rs_pbrt_tpu.models import samplers as smpl
from rs_pbrt_tpu.models.integrators import render as rdr
from rs_pbrt_tpu.scene import presets
from rs_pbrt_tpu.scene.builder import SceneBuilder
from rs_pbrt_tpu.utils import transform as tr

import pytest

pytestmark = pytest.mark.slow  # FD-gradient / BSSRDF renders: nightly profile


def _loss(img):
    return jnp.mean(img)


def _fd(scene, camera, cfg, scfg, params, leaf, index, h):
    def val(delta):
        arr = np.asarray(getattr(params, leaf))
        arr = arr.copy()
        arr[index] += delta
        p2 = params._replace(**{leaf: jnp.asarray(arr)})
        img = dg.render_image(scene, camera, cfg, scfg, p2)
        return float(_loss(img))

    return (val(h) - val(-h)) / (2 * h)


class TestGradients:
    @pytest.fixture(scope="class")
    def setup(self):
        scene, camera = presets.cornell_box(resolution=(16, 16))
        cfg = rdr.RenderCfg("path", spp=4, max_depth=3, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 4, camera.resolution)
        return scene, camera, cfg, scfg

    def test_ad_matches_fd_albedo(self, setup):
        scene, camera, cfg, scfg = setup
        params = dg.get_params(scene)
        loss, g = dg.grad_loss(scene, camera, cfg, scfg, _loss, params)
        assert np.isfinite(float(loss))
        # white wall material is index 0 (builder default) then 1.. check a
        # few kd components of the white walls (material id 1 in presets)
        from rs_pbrt_tpu.scene import arrays as sa

        idx = (1, sa.MP_KD)  # white kd red channel
        ad = float(g.mat_params[idx])
        fd = _fd(scene, camera, cfg, scfg, params, "mat_params", idx, 5e-3)
        assert ad != 0.0
        np.testing.assert_allclose(ad, fd, rtol=5e-2)

    def test_ad_matches_fd_emission(self, setup):
        scene, camera, cfg, scfg = setup
        params = dg.get_params(scene)
        _, g = dg.grad_loss(scene, camera, cfg, scfg, _loss, params)
        idx = (0, 0)  # light 0 red emission
        ad = float(g.light_emission[idx])
        fd = _fd(scene, camera, cfg, scfg, params, "light_emission", idx, 0.25)
        assert ad > 0.0  # more light -> brighter
        np.testing.assert_allclose(ad, fd, rtol=5e-2)

    def test_grad_zero_for_unused_material(self, setup):
        scene, camera, cfg, scfg = setup
        params = dg.get_params(scene)
        _, g = dg.grad_loss(scene, camera, cfg, scfg, _loss, params)
        from rs_pbrt_tpu.scene import arrays as sa

        # the black light-surface material (kd=0, last) gets ~0 gradient on
        # its specular slots which nothing uses
        assert float(jnp.abs(g.mat_params[:, sa.MP_ETA3]).sum()) == 0.0


class TestCameraGradients:
    def test_camera_translation_grad_matches_fd(self):
        """d(loss)/d(camera position) via AD vs central differences on the
        same fixed sample set (detached-sampling interior term).  The
        Cornell interior is smooth w.r.t. small camera translations for
        almost all lanes; silhouette lanes are a measure-~h set, so the
        aggregate loss derivative matches to a few percent."""
        from rs_pbrt_tpu.diff import grad as dg
        from rs_pbrt_tpu.utils import transform as tr

        scene, camera = presets.cornell_box(resolution=(12, 12))
        cfg = rdr.RenderCfg("path", spp=2, max_depth=2, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 2, camera.resolution)
        loss_fn = lambda img: jnp.mean(img)

        loss, g = dg.grad_loss_wrt_camera(scene, camera, cfg, scfg, loss_fn)
        assert np.isfinite(float(loss))
        # translation entries of cam_to_world: column 3, rows 0..2
        g_t = np.asarray(g.cam_to_world)[:3, 3]
        assert np.isfinite(g_t).all()

        h = 0.05  # cm in the 556-unit box
        fd = np.zeros(3)
        base = np.asarray(camera.cam_to_world)
        for k in range(3):
            for sgn in (+1.0, -1.0):
                m = base.copy()
                m[k, 3] += sgn * h
                cam2 = camera.replace(cam_to_world=jnp.asarray(m))
                img = rdr.render(scene, cam2, cfg, scfg)
                fd[k] += sgn * float(jnp.mean(img)) / (2 * h)
        # detached sampling yields the INTERIOR derivative only: the
        # world-y and world-z translations are dominated by smooth
        # dist^2/cos shading changes and must match FD; the world-x
        # translation slides the view sideways, so its FD is dominated by
        # silhouette (visibility-boundary) terms the estimator
        # deliberately does not model (diff/grad.py docstring)
        for k in (1, 2):
            scale = max(abs(fd[k]), 1e-6)
            assert abs(g_t[k] - fd[k]) / scale < 0.08, (k, g_t, fd)


class TestGeometryGradients:
    """Visibility-aware geometry gradients (diff/geometry.py): interior
    term by AD + primary-silhouette boundary term by adjacency-filtered
    edge sampling, validated against finite differences (VERDICT r2
    next-round #5)."""

    def test_edge_grad_matches_fd_analytic_quad(self):
        """Single lit quad, loss weighted on half the image so exactly one
        silhouette edge contributes: the boundary estimator must equal FD
        almost exactly (measured agreement ~2e-4 relative)."""
        from rs_pbrt_tpu.diff import geometry as dgeo
        from rs_pbrt_tpu.models import cameras as cam
        from rs_pbrt_tpu.scene.builder import SceneBuilder
        from rs_pbrt_tpu.utils import transform as tr

        res = 64
        b = SceneBuilder()
        m = b.add_matte(kd=(0.8,) * 3)
        b.add_triangle_mesh(
            [[0, 1, 2], [0, 2, 3]],
            [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], material=m,
        )
        b.add_distant_light(from_p=(0, 0, 1), to=(0, 0, 0), L=(2.0,) * 3)
        scene = b.finalize()
        camera = cam.make_perspective(
            tr.look_at([0, 0, 8], [0, 0, 0], [0, 1, 0]), (res, res), fov=30.0
        )
        cfg = rdr.RenderCfg("path", spp=64, max_depth=1, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 64, camera.resolution)
        mask = jnp.ones(scene.n_tris, bool)
        w = np.zeros((res, res), np.float32)
        w[:, : res // 2] = 1.0 / (res * res)
        w_img = jnp.asarray(w)

        boundary = float(dgeo.edge_boundary_grad(
            scene, camera, cfg, scfg, mask, (1.0, 0.0, 0.0), w_img,
            samples_per_edge=256, seed=0,
        ))
        h = 0.05

        def loss_at(theta):
            s2 = dgeo.translate_tris(scene, mask, jnp.asarray(
                [theta, 0.0, 0.0], jnp.float32))
            img = rdr.render(s2, camera, cfg, scfg)
            return float(jnp.sum(img * w_img[..., None]))

        fd = (loss_at(h) - loss_at(-h)) / (2 * h)
        assert fd != 0.0
        np.testing.assert_allclose(boundary, fd, rtol=0.02)

    @pytest.mark.slow
    def test_box_translation_grad_matches_fd(self):
        """Cornell short-box translation: total (interior AD + boundary)
        vs central FD with common random numbers, loss restricted to an
        image band above the floor (the floor carries the box's moving
        SHADOW — a secondary-visibility term the primary-silhouette
        estimator deliberately does not model).  Residual tolerance covers
        edge-on top-face samples the ownership filter rejects and the
        finite-h FD bias (measured: boundary -3.7e-5 +- 0.25 vs FD -4.7
        to -5.7e-5 over h in [3, 6])."""
        from rs_pbrt_tpu.diff import geometry as dgeo
        from rs_pbrt_tpu.models import cameras as cam
        from rs_pbrt_tpu.ops import scene_intersect as si

        res, spp = 48, 64
        scene, camera = presets.cornell_box(resolution=(res, res))
        mask = np.zeros(scene.n_tris, bool)
        mask[10:20] = True  # short box (walls are tris 0..9)
        mask_j = jnp.asarray(mask)
        # raise the box 2cm: its bottom face is exactly coplanar with the
        # floor otherwise (tie-broken hits flip under translation)
        scene = dgeo.translate_tris(scene, mask_j, jnp.asarray(
            [0.0, 2.0, 0.0], jnp.float32))
        cfg = rdr.RenderCfg("path", spp=spp, max_depth=1, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, spp, camera.resolution)

        # loss band: rows strictly above the first floor-visible row
        ys, xs = np.mgrid[0:res, 0:res]
        pf = np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5], -1).astype(np.float32)
        rays = cam.generate_rays(
            camera, jnp.asarray(pf), jnp.zeros((res * res, 2), jnp.float32),
            jnp.zeros(res * res, jnp.float32))
        it = si.scene_intersect(scene, rays.o, rays.d, jnp.full(res * res, 1e30))
        hy = np.asarray(it.p)[:, 1].reshape(res, res)
        hv = np.asarray(it.valid).reshape(res, res)
        r0 = int(np.where((hv & (hy < 1.0)).any(1))[0].min()) - 4
        w = np.zeros((res, res), np.float32)
        w[:r0] = 1.0 / (res * res)
        w_img = jnp.asarray(w)
        direction = (1.0, 0.0, 0.0)

        interior, _, _ = dgeo.grad_loss_wrt_translation(
            scene, camera, cfg, scfg, mask_j, direction, w_img,
            samples_per_edge=1, seed=0)
        bs = [float(dgeo.edge_boundary_grad(
            scene, camera, cfg, scfg, mask_j, direction, w_img,
            samples_per_edge=384, seed=sd)) for sd in range(6)]
        total = float(interior) + float(np.mean(bs))

        def loss_at(theta):
            s2 = dgeo.translate_tris(scene, mask_j, jnp.asarray(
                [theta, 0.0, 0.0], jnp.float32))
            img = rdr.render(s2, camera, cfg, scfg)
            return float(jnp.sum(img * w_img[..., None]))

        fd = np.mean([(loss_at(h) - loss_at(-h)) / (2 * h) for h in (3.0, 6.0)])
        assert np.isfinite(total) and fd != 0.0
        assert np.sign(total) == np.sign(fd)
        np.testing.assert_allclose(total, fd, rtol=0.5)

    def test_edge_grad_zero_for_off_screen_weights(self):
        from rs_pbrt_tpu.diff import geometry as dgeo

        scene, camera = presets.cornell_box(resolution=(16, 16))
        cfg = rdr.RenderCfg("path", spp=4, max_depth=2, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 4, camera.resolution)
        mask = np.zeros(scene.n_tris, bool)
        mask[10:20] = True
        w_img = jnp.zeros((16, 16), jnp.float32)  # zero loss weights
        g = float(dgeo.edge_boundary_grad(
            scene, camera, cfg, scfg, jnp.asarray(mask), (1.0, 0.0, 0.0),
            w_img, samples_per_edge=8,
        ))
        assert g == 0.0


class TestShadowBoundary:
    """Secondary-visibility (cast shadow) boundary term (VERDICT r3 #7):
    a floating blocker whose shadow falls on the weighted floor region
    while the blocker itself is outside it — FD of the loss is then almost
    entirely the shadow-silhouette term (interior AD ~ 0, primary
    silhouettes unweighted)."""

    def _scene(self):
        from rs_pbrt_tpu.scene.builder import SceneBuilder

        b = SceneBuilder()
        floor = b.add_matte(kd=(0.7,) * 3)
        dark = b.add_matte(kd=(0.2,) * 3)
        g = 8.0
        b.add_triangle_mesh(
            [[0, 1, 2], [0, 2, 3]],
            [[-g, 0, -g], [-g, 0, g], [g, 0, g], [g, 0, -g]], material=floor,
        )
        # blocker quad at y=2, x in [0, 0.8]
        blk0 = b.builder_tri_count if hasattr(b, "builder_tri_count") else None
        n_before = len(b.tris["p0"]) if hasattr(b, "tris") else 2
        b.add_triangle_mesh(
            [[0, 1, 2], [0, 2, 3]],
            [[0.0, 2, -0.6], [0.8, 2, -0.6], [0.8, 2, 0.6], [0.0, 2, 0.6]],
            material=dark,
        )
        # small light quad at (-1, 4, 0), facing down; two-sided dodges
        # winding-orientation concerns (nothing is above it)
        hl = 0.3
        b.add_triangle_mesh(
            [[0, 1, 2], [0, 2, 3]],
            [[-1 - hl, 4, -hl], [-1 + hl, 4, -hl], [-1 + hl, 4, hl], [-1 - hl, 4, hl]],
            material=dark,
            area_light=dict(L=(40.0,) * 3, two_sided=True),
        )
        scene = b.finalize()
        mask = np.zeros(scene.n_tris, bool)
        mask[2:4] = True  # the blocker triangles
        return scene, mask

    def _camera(self, res):
        from rs_pbrt_tpu.models import cameras as cam
        from rs_pbrt_tpu.utils import transform as tr

        return cam.make_perspective(
            tr.look_at([1.5, 8.0, 0.0], [1.5, 0.0, 0.0], [0.0, 0.0, 1.0]),
            fov=30.0, resolution=(res, res),
        )

    def test_smoke_finite(self):
        from rs_pbrt_tpu.diff import geometry as dgeo

        scene, mask = self._scene()
        res = 24
        camera = self._camera(res)
        cfg = rdr.RenderCfg("path", spp=4, max_depth=1, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 4, camera.resolution)
        w = np.zeros((res, res), np.float32)
        w[:, res // 2 :] = 1.0 / (res * res)
        g = float(dgeo.shadow_boundary_grad(
            scene, camera, cfg, scfg, mask, (1.0, 0.0, 0.0), jnp.asarray(w),
            samples_per_edge=8,
        ))
        assert np.isfinite(g)

    @pytest.mark.slow
    def test_shadow_grad_matches_fd(self):
        from rs_pbrt_tpu.diff import geometry as dgeo

        scene, mask = self._scene()
        res = 48
        camera = self._camera(res)
        cfg = rdr.RenderCfg("path", spp=64, max_depth=1, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 64, camera.resolution)
        # weight the raster half that maps to floor x > ~1.5: the shadow
        # band lies there, the blocker's own image does not.  look_at up
        # is +z; raster y runs along -z ... weight by raster x (floor x).
        w = np.zeros((res, res), np.float32)
        w[:, res // 2 :] = 1.0 / (res * res)
        w_img = jnp.asarray(w)

        shadow = float(dgeo.shadow_boundary_grad(
            scene, camera, cfg, scfg, mask, (1.0, 0.0, 0.0), w_img,
            samples_per_edge=64,
        ))
        h = 0.05

        def loss_at(theta):
            s2 = dgeo.translate_tris(scene, jnp.asarray(mask), jnp.asarray(
                [theta, 0.0, 0.0], jnp.float32))
            img = rdr.render(s2, camera, cfg, scfg)
            return float(jnp.sum(img * w_img[..., None]))

        fd = (loss_at(h) - loss_at(-h)) / (2 * h)
        assert fd != 0.0
        # primary-silhouette term must be ~0 here (blocker unweighted)
        prim = float(dgeo.edge_boundary_grad(
            scene, camera, cfg, scfg, mask, (1.0, 0.0, 0.0), w_img,
            samples_per_edge=64,
        ))
        np.testing.assert_allclose(shadow + prim, fd, rtol=0.15)


class TestTextureGradients:
    """Texture leaves in DiffParams (VERDICT r3 #8): AD through imagemap
    texels and constant-texture values must match finite differences."""

    @pytest.fixture(scope="class")
    def setup(self):
        from rs_pbrt_tpu.models import cameras as cam
        from rs_pbrt_tpu.ops import texture as txm
        from rs_pbrt_tpu.scene.builder import SceneBuilder
        from rs_pbrt_tpu.utils import transform as tr

        b = SceneBuilder()
        img = np.full((4, 4, 3), 0.5, np.float32)
        tid = b.add_texture(txm.TEX_IMAGEMAP, {txm.TP_GAMMA_SCALE: 1.0}, image=img)
        m = b.add_matte()
        b.set_material_texture(m, 0, tid)
        b.add_triangle_mesh(
            [[0, 1, 2], [0, 2, 3]],
            [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
            uvs=[[0, 0], [1, 0], [1, 1], [0, 1]], material=m,
        )
        b.add_distant_light(from_p=(0, 0, 1), to=(0, 0, 0), L=(2.0,) * 3)
        scene = b.finalize()
        camera = cam.make_perspective(
            tr.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]), fov=45.0,
            resolution=(16, 16),
        )
        cfg = rdr.RenderCfg("path", spp=4, max_depth=1, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 4, camera.resolution)
        return scene, camera, cfg, scfg

    def test_ad_matches_fd_atlas_texel(self, setup):
        scene, camera, cfg, scfg = setup
        params = dg.get_params(scene)
        _, g = dg.grad_loss(scene, camera, cfg, scfg, _loss, params)
        ga = np.asarray(g.tex_atlas)
        # pick the strongest texel gradient; it must be nonzero and match FD
        flat = np.abs(ga).sum(-1)
        iy, ix = np.unravel_index(np.argmax(flat), flat.shape)
        assert flat[iy, ix] > 0.0
        idx = (iy, ix, 0)
        ad = float(ga[idx])
        fd = _fd(scene, camera, cfg, scfg, params, "tex_atlas", idx, 5e-2)
        np.testing.assert_allclose(ad, fd, rtol=5e-2)

    def test_ad_matches_fd_tex_value(self, setup):
        from rs_pbrt_tpu.ops import texture as txm
        from rs_pbrt_tpu.scene.builder import SceneBuilder
        from rs_pbrt_tpu.models import cameras as cam
        from rs_pbrt_tpu.utils import transform as tr

        # constant texture driving kd through TP_VALUE
        b = SceneBuilder()
        tid = b.add_texture(txm.TEX_CONSTANT, {txm.TP_VALUE: (0.4, 0.5, 0.6)})
        m = b.add_matte()
        b.set_material_texture(m, 0, tid)
        b.add_triangle_mesh(
            [[0, 1, 2], [0, 2, 3]],
            [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], material=m,
        )
        b.add_distant_light(from_p=(0, 0, 1), to=(0, 0, 0), L=(2.0,) * 3)
        scene = b.finalize()
        camera = cam.make_perspective(
            tr.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]), fov=45.0,
            resolution=(12, 12),
        )
        cfg = rdr.RenderCfg("path", spp=4, max_depth=1, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 4, camera.resolution)
        params = dg.get_params(scene)
        _, g = dg.grad_loss(scene, camera, cfg, scfg, _loss, params)
        idx = (int(tid), txm.TP_VALUE)
        ad = float(np.asarray(g.tex_params)[idx])
        assert ad != 0.0
        fd = _fd(scene, camera, cfg, scfg, params, "tex_params", idx, 2e-2)
        np.testing.assert_allclose(ad, fd, rtol=5e-2)
