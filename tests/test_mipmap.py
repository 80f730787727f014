"""MipMap tests (reference core/mipmap.rs): pyramid build + trilinear."""

import numpy as np
import jax.numpy as jnp

from rs_pbrt_tpu.ops import mipmap as mp
from rs_pbrt_tpu.ops import texture as tx


class TestPyramid:
    def test_levels_and_sizes(self):
        img = np.random.default_rng(0).random((64, 32, 3)).astype(np.float32)
        lv = mp.build_pyramid(img)
        assert lv[0].shape == (64, 32, 3)
        assert lv[-1].shape[0] == 1 or lv[-1].shape[1] == 1
        for a, b in zip(lv, lv[1:]):
            assert b.shape[0] == max(a.shape[0] // 2, 1)
            assert b.shape[1] == max(a.shape[1] // 2, 1)

    def test_constant_image_preserved(self):
        img = np.full((16, 16, 3), 0.25, np.float32)
        for lv in mp.build_pyramid(img):
            np.testing.assert_allclose(lv, 0.25, atol=1e-6)

    def test_non_pow2_resample(self):
        """Lanczos resample of a constant non-pow2 image stays constant."""
        img = np.full((30, 23, 3), 0.7, np.float32)
        out = mp.resample_pow2(img)
        assert out.shape == (32, 32, 3)
        np.testing.assert_allclose(out, 0.7, atol=1e-4)

    def test_mean_preserved_down_chain(self):
        img = np.random.default_rng(1).random((32, 32, 3)).astype(np.float32)
        lv = mp.build_pyramid(img)
        np.testing.assert_allclose(lv[-1].mean(), img.mean(), atol=0.02)


class TestTrilinear:
    def _scene(self, img):
        from rs_pbrt_tpu.scene.builder import SceneBuilder

        b = SceneBuilder()
        tid = b.add_texture(tx.TEX_IMAGEMAP, {tx.TP_GAMMA_SCALE: 1.0}, image=img)
        m = b.add_matte()
        b.set_material_texture(m, 0, tid)
        V = np.array([[-1, 0, -1], [1, 0, -1], [1, 0, 1]], np.float32)
        b.add_triangle_mesh(np.array([[0, 1, 2]], np.int32), V, material=m)
        return b.finalize(), tid

    def test_width_zero_matches_bilinear(self):
        img = np.random.default_rng(2).random((16, 16, 3)).astype(np.float32)
        scene, tid = self._scene(img)
        n = 64
        rng = np.random.default_rng(3)
        u = jnp.asarray(rng.random(n).astype(np.float32))
        v = jnp.asarray(rng.random(n).astype(np.float32))
        ids = jnp.full(n, tid, jnp.int32)
        fine = tx.atlas_lookup(scene.tex_atlas, scene.tex_rect[ids], u, v)
        tri = tx.trilinear_lookup(scene, ids, u, v, jnp.zeros(n))
        np.testing.assert_allclose(np.asarray(tri), np.asarray(fine), atol=1e-5)

    def test_width_one_is_coarsest(self):
        img = np.random.default_rng(4).random((16, 16, 3)).astype(np.float32)
        scene, tid = self._scene(img)
        n = 8
        u = jnp.linspace(0.1, 0.9, n)
        v = jnp.linspace(0.1, 0.9, n)
        ids = jnp.full(n, tid, jnp.int32)
        tri = np.asarray(tx.trilinear_lookup(scene, ids, u, v, jnp.ones(n)))
        # coarsest level is the image mean everywhere
        np.testing.assert_allclose(
            tri, np.broadcast_to(img.mean((0, 1)), tri.shape), atol=0.02
        )

    def test_width_monotone_blur(self):
        """Wider footprints converge toward the mean (variance shrinks)."""
        img = np.zeros((16, 16, 3), np.float32)
        img[::2] = 1.0  # stripes
        scene, tid = self._scene(img)
        n = 256
        rng = np.random.default_rng(5)
        u = jnp.asarray(rng.random(n).astype(np.float32))
        v = jnp.asarray(rng.random(n).astype(np.float32))
        ids = jnp.full(n, tid, jnp.int32)
        var = []
        for wd in (0.0, 0.1, 0.5):
            out = np.asarray(tx.trilinear_lookup(scene, ids, u, v, jnp.full(n, wd)))
            var.append(out[:, 0].var())
        assert var[0] > var[1] > var[2]
