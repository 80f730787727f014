"""Two-level BVH instancing tests (reference primitive.rs
TransformedPrimitive :198-265).  Oracle: flattened geometry."""

import pytest
import numpy as np
import jax.numpy as jnp

from rs_pbrt_tpu.ops import instancing as inst
from rs_pbrt_tpu.ops import intersect as isect
from rs_pbrt_tpu.utils import transform as tr


def _tetra():
    V = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    F = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    return V[F[:, 0]], V[F[:, 1]], V[F[:, 2]]


def _grid_instances(n=6, spacing=2.5, seed=0):
    rng = np.random.default_rng(seed)
    mats = []
    for i in range(n):
        for j in range(n):
            t = tr.compose(
                tr.translate((i * spacing, 0.0, j * spacing)),
                tr.rotate_y(float(rng.uniform(0, 360))),
            )
            mats.append(np.asarray(t.m, np.float32))
    return np.stack(mats)


class TestInstancing:
    def _build(self):
        p0, p1, p2 = _tetra()
        lo = np.minimum(np.minimum(p0, p1), p2)
        hi = np.maximum(np.maximum(p0, p1), p2)
        o2w = _grid_instances()
        acc = inst.build_instance_accel(
            [(0, 4)], np.stack([[lo.min(0), hi.max(0)]]),
            np.zeros(len(o2w), np.int64), o2w,
            np.zeros(len(o2w), np.int32), lo, hi,
        )
        return acc, (jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2)), o2w

    def _flatten(self, o2w):
        p0, p1, p2 = _tetra()
        P0, P1, P2 = [], [], []
        for m in o2w:
            R, t = m[:3, :3], m[:3, 3]
            P0.append(p0 @ R.T + t)
            P1.append(p1 @ R.T + t)
            P2.append(p2 @ R.T + t)
        return (
            jnp.asarray(np.concatenate(P0)),
            jnp.asarray(np.concatenate(P1)),
            jnp.asarray(np.concatenate(P2)),
        )

    @pytest.mark.slow
    def test_matches_flattened(self):
        acc, (p0, p1, p2), o2w = self._build()
        f0, f1, f2 = self._flatten(o2w)
        rng = np.random.default_rng(1)
        m = 512
        o = jnp.asarray(
            rng.uniform(-2, 16, (m, 3)).astype(np.float32) * [1, 0, 1]
            + [0, 6.0, 0]
        )
        dd = rng.normal(size=(m, 3)).astype(np.float32)
        dd[:, 1] = -np.abs(dd[:, 1]) - 0.3  # aim downward at the grid
        dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
        d = jnp.asarray(dd)
        tm = jnp.full(m, 1e30, jnp.float32)

        hb = isect.intersect_tris_brute(o, d, tm, f0, f1, f2)
        hi_ = inst.instance_intersect(o, d, tm, acc, p0, p1, p2)
        np.testing.assert_array_equal(np.asarray(hb.valid), np.asarray(hi_.valid))
        sel = np.asarray(hb.valid)
        np.testing.assert_allclose(
            np.asarray(hb.t)[sel], np.asarray(hi_.t)[sel], rtol=2e-4
        )
        # instance-local triangle id consistency: flattened tri id =
        # inst*4 + local tri
        flat_tri = np.asarray(hb.tri)[sel]
        got = (np.asarray(hi_.inst)[sel] * 4 + np.asarray(hi_.tri)[sel])
        np.testing.assert_array_equal(got, flat_tri)

    def test_memory_sharing(self):
        """The instanced accel keeps ONE prototype (4 tris) regardless of
        the instance count."""
        acc, (p0, _, _), o2w = self._build()
        assert p0.shape[0] == 4
        assert acc.inst_o2w.shape[0] == 36
