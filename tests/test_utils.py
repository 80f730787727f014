import jax.numpy as jnp
import numpy as np
import pytest

from rs_pbrt_tpu.utils import rng as rngmod
from rs_pbrt_tpu.utils import spectrum, transform, u64
from rs_pbrt_tpu.utils import vecmath as vm


class TestVecMath:
    def test_dot_cross(self):
        a = jnp.asarray([[1.0, 0, 0], [0, 2, 0]])
        b = jnp.asarray([[0.0, 1, 0], [0, 0, 3]])
        np.testing.assert_allclose(vm.dot(a, b), [0.0, 0.0])
        np.testing.assert_allclose(vm.cross(a, b)[0], [0, 0, 1.0])

    def test_normalize(self):
        v = jnp.asarray([3.0, 0.0, 4.0])
        np.testing.assert_allclose(vm.length(vm.normalize(v)), 1.0, rtol=1e-6)

    def test_coordinate_system_orthonormal(self):
        rs = np.random.default_rng(0)
        v1 = vm.normalize(jnp.asarray(rs.normal(size=(64, 3)), jnp.float32))
        v2, v3 = vm.coordinate_system(v1)
        np.testing.assert_allclose(vm.dot(v1, v2), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.dot(v1, v3), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.length(v2), 1.0, atol=1e-5)
        np.testing.assert_allclose(vm.length(v3), 1.0, atol=1e-5)

    def test_quadratic(self):
        has, t0, t1 = vm.quadratic(
            jnp.asarray([1.0, 1.0]), jnp.asarray([-3.0, 0.0]), jnp.asarray([2.0, 1.0])
        )
        assert bool(has[0]) and not bool(has[1])
        np.testing.assert_allclose([t0[0], t1[0]], [1.0, 2.0], rtol=1e-5)

    def test_face_forward(self):
        n = jnp.asarray([[0.0, 0, 1]])
        v = jnp.asarray([[0.0, 0, -1]])
        np.testing.assert_allclose(vm.face_forward(n, v), [[0, 0, -1.0]])

    def test_spherical_roundtrip(self):
        rs = np.random.default_rng(1)
        v = vm.normalize(jnp.asarray(rs.normal(size=(32, 3)), jnp.float32))
        theta, phi = vm.spherical_theta(v), vm.spherical_phi(v)
        v2 = vm.spherical_direction(jnp.sin(theta), jnp.cos(theta), phi)
        np.testing.assert_allclose(v, v2, atol=1e-5)

    def test_next_float(self):
        x = jnp.asarray([1.0, -1.0, 0.0])
        up = vm.next_float_up(x)
        dn = vm.next_float_down(x)
        assert np.all(np.asarray(up) > np.asarray(x))
        assert np.all(np.asarray(dn) < np.asarray(x))


class TestTransform:
    def test_translate_roundtrip(self):
        t = transform.translate([1.0, 2.0, 3.0])
        p = jnp.asarray([[0.5, 0.5, 0.5]])
        p2 = transform.xform_point(t.m, p)
        np.testing.assert_allclose(p2, [[1.5, 2.5, 3.5]])
        p3 = transform.xform_point(t.m_inv, p2)
        np.testing.assert_allclose(p3, p, atol=1e-6)

    def test_rotate_preserves_length(self):
        t = transform.rotate(37.0, [1.0, 2.0, 0.5])
        v = jnp.asarray([[1.0, -2.0, 0.3]])
        v2 = transform.xform_vector(t.m, v)
        np.testing.assert_allclose(vm.length(v2), vm.length(v), rtol=1e-5)

    def test_look_at(self):
        t = transform.look_at([0, 0, -5], [0, 0, 0], [0, 1, 0])
        # camera-space +z maps to world direction towards look point
        d = transform.xform_vector(t.m, jnp.asarray([0.0, 0, 1]))
        np.testing.assert_allclose(d, [0, 0, 1.0], atol=1e-6)
        o = transform.xform_point(t.m, jnp.asarray([0.0, 0, 0]))
        np.testing.assert_allclose(o, [0, 0, -5.0], atol=1e-6)

    def test_normal_transform(self):
        t = transform.scale(2.0, 1.0, 1.0)
        # surface z=const has normal z; scaling x should keep normal direction
        n = transform.xform_normal(t.m_inv, jnp.asarray([1.0, 0.0, 0.0]))
        v = transform.xform_vector(t.m, jnp.asarray([0.0, 1.0, 0.0]))
        assert abs(float(vm.dot(n, v))) < 1e-6

    def test_bounds(self):
        t = transform.rotate_z(45.0)
        bmin, bmax = transform.xform_bounds(
            t.m, jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1])
        )
        np.testing.assert_allclose(bmax[0], np.sqrt(2), rtol=1e-3)


class TestSpectrum:
    def test_luminance_white(self):
        np.testing.assert_allclose(
            spectrum.luminance(jnp.asarray([1.0, 1.0, 1.0])), 1.0, rtol=1e-4
        )

    def test_xyz_roundtrip(self):
        rgb = jnp.asarray([[0.2, 0.5, 0.8]])
        back = spectrum.xyz_to_rgb(spectrum.rgb_to_xyz(rgb))
        np.testing.assert_allclose(back, rgb, atol=1e-4)

    def test_gamma_roundtrip(self):
        v = jnp.linspace(0.0, 1.0, 32)
        back = spectrum.inverse_gamma_correct(spectrum.gamma_correct(v))
        np.testing.assert_allclose(back, v, atol=1e-5)

    def test_cie_tables(self):
        assert spectrum.CIE_LAMBDA[0] == 360.0
        assert spectrum.CIE_LAMBDA[-1] == 830.0
        # CIE_Y sums to ~CIE_Y_INTEGRAL
        np.testing.assert_allclose(
            np.sum(spectrum.CIE_Y), spectrum.CIE_Y_INTEGRAL, rtol=1e-3
        )

    def test_blackbody_peak(self):
        # Wien: 5500K peaks near 527nm
        lams = np.linspace(300, 900, 601)
        le = spectrum.blackbody(lams, 5500.0)
        assert abs(lams[np.argmax(le)] - 527) < 5


class TestRng:
    def test_pcg32_reference_values(self):
        # reference PCG32 with default state produces this well-known sequence
        r = rngmod.Pcg32()
        vals = [r.uniform_uint32() for _ in range(4)]
        # deterministic: re-run matches
        r2 = rngmod.Pcg32()
        assert vals == [r2.uniform_uint32() for _ in range(4)]
        # seeded stream differs
        r3 = rngmod.Pcg32(42, 54)
        assert r3.uniform_uint32() != vals[0]

    def test_pcg32_float_range(self):
        r = rngmod.Pcg32(1, 1)
        for _ in range(100):
            f = r.uniform_float()
            assert 0.0 <= f < 1.0

    def test_bounded(self):
        r = rngmod.Pcg32(7, 7)
        for _ in range(100):
            assert 0 <= r.uniform_uint32_bounded(10) < 10

    def test_device_hash_uniform(self):
        idx = jnp.arange(100000, dtype=jnp.uint32)
        f = rngmod.uniform_float(idx, jnp.uint32(3))
        f = np.asarray(f)
        assert f.min() >= 0.0 and f.max() < 1.0
        assert abs(f.mean() - 0.5) < 0.01
        # decorrelated across key
        f2 = np.asarray(rngmod.uniform_float(idx, jnp.uint32(4)))
        assert abs(np.corrcoef(f, f2)[0, 1]) < 0.01


class TestU64:
    def test_roundtrip(self):
        x = 0x123456789ABCDEF0
        a = u64.from_python(x)
        assert u64.to_python(a) == x

    @pytest.mark.parametrize("n", [0, 1, 13, 32, 45, 63])
    def test_shifts(self, n):
        x = 0x9E3779B97F4A7C15
        assert u64.to_python(u64.shl(u64.from_python(x), n)) == (x << n) & ((1 << 64) - 1)
        assert u64.to_python(u64.shr(u64.from_python(x), n)) == x >> n

    def test_xor_add(self):
        a, b = 0xDEADBEEFCAFEBABE, 0x0123456789ABCDEF
        assert u64.to_python(u64.xor(u64.from_python(a), u64.from_python(b))) == a ^ b
        assert (
            u64.to_python(u64.add(u64.from_python(a), u64.from_python(b)))
            == (a + b) & (1 << 64) - 1
        )

    def test_bits(self):
        x = 1 << 40
        assert bool(u64.bit(u64.from_python(x), 40))
        assert not bool(u64.bit(u64.from_python(x), 39))

    def test_mul_u32(self):
        a, b = 0xDEADBEEF, 0x12345678
        assert u64.to_python(u64.mul_u32(a, b)) == a * b
