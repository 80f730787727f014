"""Pallas kernel unit tests (CPU interpret mode).

The intersect kernels normally execute only on real TPUs; interpret mode
runs the same kernel logic off-chip so correctness is covered by CI.
Oracle: the plain-XLA brute-force sweep (ops/intersect.py) and the
unfused interaction builder (scene_intersect._tri_interaction), both
independently tested against the reference's watertight algorithm.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from rs_pbrt_tpu.ops import intersect as isect


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Scope interpret mode to THIS module's tests: a process-wide env set
    at import time would reroute every CPU render test in the suite
    through the (slow) interpreted megakernel."""
    monkeypatch.setenv("RS_PBRT_PALLAS_INTERPRET", "1")
from rs_pbrt_tpu.ops import pallas_intersect as pin
from rs_pbrt_tpu.ops import scene_intersect as si
from rs_pbrt_tpu.scene import presets


@pytest.fixture(scope="module")
def cornell_rays():
    scene, _ = presets.cornell_box(resolution=(8, 8))
    rng = np.random.default_rng(7)
    n = 512
    o = rng.uniform(50.0, 500.0, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = np.where(rng.uniform(size=n) < 0.2, 300.0, 3e38).astype(np.float32)
    return scene, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max)


class TestSweepKernels:
    @pytest.mark.slow
    def test_closest_matches_brute(self, cornell_rays):
        scene, o, d, t_max = cornell_rays
        ph = pin.pallas_intersect_tris(
            o, d, t_max, scene.tri_p0, scene.tri_p1, scene.tri_p2
        )
        bh = isect.intersect_tris_brute(
            o, d, t_max, scene.tri_p0, scene.tri_p1, scene.tri_p2
        )
        assert np.array_equal(np.asarray(ph.valid), np.asarray(bh.valid))
        v = np.asarray(bh.valid)
        assert np.array_equal(np.asarray(ph.tri)[v], np.asarray(bh.tri)[v])
        assert np.allclose(np.asarray(ph.t)[v], np.asarray(bh.t)[v], rtol=1e-5)
        assert np.allclose(np.asarray(ph.b0)[v], np.asarray(bh.b0)[v], atol=1e-5)
        assert np.allclose(np.asarray(ph.b1)[v], np.asarray(bh.b1)[v], atol=1e-5)

    def test_anyhit_matches_brute(self, cornell_rays):
        scene, o, d, t_max = cornell_rays
        po = pin.pallas_intersect_tris_p(
            o, d, t_max, scene.tri_p0, scene.tri_p1, scene.tri_p2
        )
        bo = isect.intersect_tris_brute_p(
            o, d, t_max, scene.tri_p0, scene.tri_p1, scene.tri_p2
        )
        assert np.array_equal(np.asarray(po), np.asarray(bo))

    @pytest.mark.slow
    def test_fused_record_matches_unfused(self, cornell_rays):
        scene, o, d, t_max = cornell_rays
        rec = pin.pallas_intersect_tris_full(o, d, t_max, scene.tri_attr, scene.n_tris)
        bh = isect.intersect_tris_brute(
            o, d, t_max, scene.tri_p0, scene.tri_p1, scene.tri_p2
        )
        tp, tperr, tng, tns, tuv, tmat, tlight, tdpdu = si._tri_interaction(
            scene, o, d, bh
        )
        v = np.asarray(bh.valid)
        assert np.array_equal(np.asarray(rec["valid"]), v)
        assert np.array_equal(np.asarray(rec["prim"])[v], np.asarray(bh.tri)[v])
        assert np.allclose(np.asarray(rec["t"])[v], np.asarray(bh.t)[v], rtol=1e-5)
        for key, ref in (
            ("p", tp), ("p_err", tperr), ("ng", tng), ("ns", tns),
            ("uv", tuv), ("dpdu", tdpdu),
        ):
            got = np.asarray(rec[key])[v]
            want = np.asarray(ref)[v]
            assert np.allclose(got, want, rtol=1e-4, atol=1e-4), key
        assert np.array_equal(np.asarray(rec["mat"])[v], np.asarray(tmat)[v])
        assert np.array_equal(np.asarray(rec["light"])[v], np.asarray(tlight)[v])


class TestSobolKernel:
    def test_sobol_dims_bitmatch(self):
        """Kernel output must match ops/lowdiscrepancy.sobol_sample to
        1 ulp (the kernel's u32->f32 split-halves conversion — a Mosaic
        workaround — can round differently from the direct cast) on both
        the 52- and 32-bit index paths."""
        from rs_pbrt_tpu.ops import lowdiscrepancy as ld
        from rs_pbrt_tpu.ops import pallas_sobol as ps
        from rs_pbrt_tpu.utils import u64

        rng = np.random.default_rng(3)
        n = 300
        lo = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.uint32))
        hi32 = jnp.zeros(n, jnp.uint32)
        hi52 = jnp.asarray(rng.integers(0, 1 << 20, n, dtype=np.uint32))
        for hi, bits in ((hi32, 32), (hi52, 52)):
            got = ps.sobol_dims(hi, lo, 2, 5, index_bits=bits)
            want = jnp.stack(
                [ld.sobol_sample(u64.U64(hi, lo), 2 + k) for k in range(5)],
                axis=-1,
            )
            g, w = np.asarray(got), np.asarray(want)
            assert np.abs(g - w).max() <= 2.0 ** -24, bits  # <= 1 ulp in [0,1)


@pytest.mark.slow
class TestMegakernel:
    def test_bounce_megakernel_matches_general_path(self):
        """The single-kernel bounce loop (ops/pallas_path.py) must agree
        with the general wavefront integrator on an eligible scene — same
        formulas, same sampler dims, so differences are float-association
        only."""
        import jax
        from rs_pbrt_tpu.models import cameras as cam
        from rs_pbrt_tpu.models import samplers as smpl
        from rs_pbrt_tpu.models.integrators import path as pathmod
        from rs_pbrt_tpu.ops import pallas_path as pp

        scene, camera = presets.cornell_box(resolution=(16, 16))
        mega = pp.mega_cfg(scene)
        assert mega is not None, "cornell box must be megakernel-eligible"

        spp = 4
        scfg = smpl.make_sampler(smpl.SOBOL, spp, camera.resolution)
        w, h = camera.resolution
        xs, ys = np.meshgrid(np.arange(w, dtype=np.int32), np.arange(h, dtype=np.int32))
        pixels = np.stack([xs.ravel(), ys.ravel()], -1)
        pix = jnp.asarray(np.tile(pixels, (spp, 1)))
        snums = jnp.repeat(jnp.arange(spp, dtype=np.uint32), w * h)
        ctx = smpl.make_ctx(scfg, pix, snums)
        u_film = smpl.get_2d(scfg, ctx, 0)
        p_film = pix.astype(jnp.float32) + u_film
        rays = cam.generate_rays(
            camera, p_film, smpl.get_2d(scfg, ctx, 3), smpl.get_1d(scfg, ctx, 2)
        )
        pcfg = pathmod.PathCfg(max_depth=4, rr_threshold=1.0)
        L_gen = pathmod.radiance(scene, pcfg, scfg, ctx, rays.o, rays.d, None)
        L_mega = pathmod.radiance(
            scene, pcfg, scfg, ctx, rays.o, rays.d, None, mega=mega
        )
        g = np.asarray(L_gen)
        m = np.asarray(L_mega)
        assert np.isfinite(m).all()
        # identical estimator + identical samples -> tight agreement
        assert np.allclose(m, g, rtol=2e-3, atol=2e-3), (
            np.abs(m - g).max(), np.abs(g).max()
        )
        assert abs(m.mean() - g.mean()) < 1e-4 * max(g.mean(), 1e-6)

    def test_mega_cfg_rejects_ineligible(self):
        from rs_pbrt_tpu.ops import pallas_path as pp

        scene, _ = presets.cornell_box(resolution=(8, 8))
        assert pp.mega_cfg(scene, accel=object()) is None
        assert pp.mega_cfg(scene, light_distrib=object()) is None

    def test_megakernel_hard_scene(self):
        """Stress parity on an eligible scene exercising every megakernel
        branch the Cornell test doesn't: multiple area lights (non-uniform
        power CDF), a multi-triangle light range, vertex-normal meshes,
        two-sided emission, and a black (NONE-lobe) material."""
        from rs_pbrt_tpu.models import cameras as cam
        from rs_pbrt_tpu.models import samplers as smpl
        from rs_pbrt_tpu.models.integrators import path as pathmod
        from rs_pbrt_tpu.ops import pallas_path as pp
        from rs_pbrt_tpu.scene.builder import SceneBuilder
        from rs_pbrt_tpu.utils import transform as tr

        b = SceneBuilder()
        gray = b.add_matte(kd=(0.6, 0.55, 0.5))
        black = b.add_matte(kd=(0.0, 0.0, 0.0))
        # floor (no normals) + a tilted quad with smooth vertex normals
        b.add_triangle_mesh(
            [[0, 1, 2], [0, 2, 3]],
            [[-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]],
            material=gray,
        )
        nrm = np.array([[0.2, 1, 0], [0, 1, 0.2], [-0.2, 1, 0], [0, 1, -0.2]])
        nrm = nrm / np.linalg.norm(nrm, axis=1, keepdims=True)
        b.add_triangle_mesh(
            [[0, 1, 2], [0, 2, 3]],
            [[-1, 0.5, -1], [1, 0.6, -1], [1, 0.5, 1], [-1, 0.4, 1]],
            normals=nrm, material=gray,
        )
        # black occluder
        b.add_triangle_mesh(
            [[0, 1, 2]], [[-0.5, 1.2, -0.5], [0.5, 1.2, -0.5], [0.0, 1.2, 0.6]],
            material=black,
        )
        # two area lights: a 2-tri one-sided panel and a 2-tri two-sided
        # panel with very different power (non-trivial selection CDF)
        b.add_triangle_mesh(
            [[0, 1, 2], [0, 2, 3]],
            [[-2, 3, -2], [-1, 3, -2], [-1, 3, -1], [-2, 3, -1]],
            material=black, area_light=dict(L=(12.0, 10.0, 8.0), two_sided=False),
        )
        b.add_triangle_mesh(
            [[0, 1, 2], [0, 2, 3]],
            [[1, 2.5, 1], [2, 2.5, 1], [2, 2.5, 2], [1, 2.5, 2]],
            material=black, area_light=dict(L=(0.5, 0.8, 1.1), two_sided=True),
        )
        scene = b.finalize()
        mega = pp.mega_cfg(scene)
        assert mega is not None and len(mega.lights) == 2

        camera = cam.make_perspective(
            tr.look_at((0, 1.5, -6), (0, 0.8, 0), (0, 1, 0)), (12, 12), fov=60.0
        )
        spp = 4
        scfg = smpl.make_sampler(smpl.SOBOL, spp, camera.resolution)
        w, h = camera.resolution
        xs, ys = np.meshgrid(np.arange(w, dtype=np.int32), np.arange(h, dtype=np.int32))
        pix = jnp.asarray(np.tile(np.stack([xs.ravel(), ys.ravel()], -1), (spp, 1)))
        snums = jnp.repeat(jnp.arange(spp, dtype=np.uint32), w * h)
        ctx = smpl.make_ctx(scfg, pix, snums)
        p_film = pix.astype(jnp.float32) + smpl.get_2d(scfg, ctx, 0)
        rays = cam.generate_rays(
            camera, p_film, smpl.get_2d(scfg, ctx, 3), smpl.get_1d(scfg, ctx, 2)
        )
        pcfg = pathmod.PathCfg(max_depth=4, rr_threshold=1.0)
        g = np.asarray(pathmod.radiance(scene, pcfg, scfg, ctx, rays.o, rays.d, None))
        m = np.asarray(
            pathmod.radiance(scene, pcfg, scfg, ctx, rays.o, rays.d, None, mega=mega)
        )
        assert np.isfinite(m).all()
        assert np.allclose(m, g, rtol=2e-3, atol=2e-3), (
            np.abs(m - g).max(), np.abs(g).max()
        )
