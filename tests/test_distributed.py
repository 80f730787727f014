"""Multi-host scaffolding (parallel/distributed.py): hosts-x-chips mesh
render parity and primitive-range geometry sharding (SURVEY §2.2 row 10,
VERDICT r1 missing #9).  Runs on the 8-device CPU mesh as 2 simulated
hosts x 4 chips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_pbrt_tpu.models import samplers as smpl
from rs_pbrt_tpu.models.integrators import render as rdr
from rs_pbrt_tpu.parallel import distributed as dist
from rs_pbrt_tpu.parallel import mesh as pmesh
from rs_pbrt_tpu.scene import presets


def test_host_mesh_shape():
    m = dist.make_host_mesh(n_hosts=2)
    assert m.axis_names == ("h", "d")
    assert m.devices.shape == (2, len(jax.devices()) // 2)
    with pytest.raises(ValueError):
        dist.make_host_mesh(n_hosts=3)


def test_init_distributed_noop_without_env(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert dist.init_distributed() is False


@pytest.mark.slow
def test_host_mesh_render_matches_chip_mesh():
    scene, camera = presets.cornell_box(resolution=(12, 12))
    cfg = rdr.RenderCfg("path", spp=2, max_depth=3, rr_threshold=1.0)
    scfg = smpl.make_sampler(smpl.SOBOL, 2, camera.resolution)
    img1 = np.asarray(
        pmesh.render_sharded(scene, camera, cfg, scfg, mesh=pmesh.make_mesh())
    )
    img2 = np.asarray(
        pmesh.render_sharded(
            scene, camera, cfg, scfg, mesh=dist.make_host_mesh(n_hosts=2)
        )
    )
    np.testing.assert_allclose(img1, img2, rtol=1e-5, atol=1e-6)


class TestGeometrySharding:
    @pytest.mark.slow
    def test_matches_single_device_sweep(self):
        from rs_pbrt_tpu.ops.intersect import intersect_tris_brute

        rs = np.random.RandomState(3)
        nt, nr = 61, 256  # odd count: exercises shard padding
        p0 = rs.uniform(-1, 1, (nt, 3)).astype(np.float32)
        p1 = p0 + rs.uniform(0.05, 0.4, (nt, 3)).astype(np.float32)
        p2 = p0 + rs.uniform(0.05, 0.4, (nt, 3)).astype(np.float32)
        o = rs.uniform(-2, 2, (nr, 3)).astype(np.float32)
        d = rs.normal(size=(nr, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        t_max = np.full(nr, 1e30, np.float32)

        ref = intersect_tris_brute(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max),
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        )

        mesh = pmesh.make_mesh(axis="g")
        shards = dist.build_geom_shards(p0, p1, p2, mesh.devices.size)
        got = dist.geometry_sharded_intersect(shards, mesh, "g", o, d, t_max)

        np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
        v = np.asarray(ref.valid)
        np.testing.assert_allclose(
            np.asarray(got.t)[v], np.asarray(ref.t)[v], rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(got.tri)[v], np.asarray(ref.tri)[v]
        )
