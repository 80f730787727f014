"""Two-level instancing wired into the scene pipeline (VERDICT r1 gap #8):
ObjectInstance beyond the flatten limit builds prototype tables + a
top-level BVH instead of duplicating geometry (reference
primitive.rs:198-265 TransformedPrimitive)."""

import numpy as np
import pytest

from rs_pbrt_tpu.models import cameras as cam
from rs_pbrt_tpu.models import samplers as smpl
from rs_pbrt_tpu.models.integrators import render as rdr
from rs_pbrt_tpu.ops.scene_intersect import build_accel
from rs_pbrt_tpu.scene import parser as ps
from rs_pbrt_tpu.scene.api import PbrtAPI
from rs_pbrt_tpu.scene.builder import SceneBuilder
from rs_pbrt_tpu.utils import transform as tr
from rs_pbrt_tpu.scene import bigscene


def _grid_instances(b, proto, n=5, spacing=2.5, mat=-1):
    for i in range(n):
        for j in range(n):
            b.add_instance(
                proto,
                tr.translate([(i - n / 2) * spacing, 0.0, (j - n / 2) * spacing]),
                material=mat,
            )


def _mesh():
    v, f = bigscene.icosphere(3)  # 1280 tris
    return f, v


class TestBuilderInstancing:
    @pytest.mark.slow
    def test_instanced_matches_flattened(self):
        f, v = _mesh()
        res = (20, 20)
        camera = cam.make_perspective(
            tr.look_at([0, 12, -14], [0, 0, 0], [0, 1, 0]), res, fov=55.0
        )
        cfg = rdr.RenderCfg("path", spp=4, max_depth=2, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 4, res)

        # instanced: ONE geometry copy
        bi = SceneBuilder()
        m = bi.add_matte(kd=(0.6, 0.6, 0.6))
        proto = bi.add_prototype_mesh(f, v, material=m)
        _grid_instances(bi, proto, n=4)
        bi.add_triangle_mesh(
            [[0, 1, 2], [0, 2, 3]],
            [[-30, -1.2, -30], [-30, -1.2, 30], [30, -1.2, 30], [30, -1.2, -30]],
            material=bi.add_matte(kd=(0.4,) * 3),
        )
        bi.add_triangle_mesh(
            [[0, 1, 2], [0, 2, 3]],
            [[-4, 14, -4], [4, 14, -4], [4, 14, 4], [-4, 14, 4]],
            material=bi.add_matte(kd=(0,) * 3),
            area_light=dict(L=(12.0,) * 3),
        )
        si = bi.finalize()
        assert si.n_instances == 16
        assert si.proto_p0.shape[0] == f.shape[0]  # one copy
        assert si.n_tris == 4  # only ground + light flattened

        # flattened oracle
        bf = SceneBuilder()
        m2 = bf.add_matte(kd=(0.6, 0.6, 0.6))
        n = 4
        for i in range(n):
            for j in range(n):
                off = np.array(
                    [(i - n / 2) * 2.5, 0.0, (j - n / 2) * 2.5], np.float32
                )
                bf.add_triangle_mesh(f, v + off, material=m2)
        bf.add_triangle_mesh(
            [[0, 1, 2], [0, 2, 3]],
            [[-30, -1.2, -30], [-30, -1.2, 30], [30, -1.2, 30], [30, -1.2, -30]],
            material=bf.add_matte(kd=(0.4,) * 3),
        )
        bf.add_triangle_mesh(
            [[0, 1, 2], [0, 2, 3]],
            [[-4, 14, -4], [4, 14, -4], [4, 14, 4], [-4, 14, 4]],
            material=bf.add_matte(kd=(0,) * 3),
            area_light=dict(L=(12.0,) * 3),
        )
        sf = bf.finalize()

        img_i = np.asarray(
            rdr.render(si, camera, cfg, scfg, accel=build_accel(si))
        )
        img_f = np.asarray(
            rdr.render(sf, camera, cfg, scfg, accel=build_accel(sf))
        )
        assert np.isfinite(img_i).all()
        # same geometry, same sampler: images should be near-identical
        # (instanced path computes hits in object space -> float-level diff)
        close = np.isclose(img_i, img_f, rtol=0.05, atol=5e-3).mean()
        assert close > 0.97, close
        np.testing.assert_allclose(img_i.mean(), img_f.mean(), rtol=0.02)


class TestParserInstancing:
    def _api_scene(self, n_uses):
        uses = "\n".join(
            f"AttributeBegin\nTranslate {3*k} 0 0\nObjectInstance \"blob\"\nAttributeEnd"
            for k in range(n_uses)
        )
        txt = f'''
            WorldBegin
            ObjectBegin "blob"
              Shape "trianglemesh" "integer indices" [0 1 2]
                "point P" [0 0 0  1 0 0  0 1 0]
            ObjectEnd
            {uses}
            WorldEnd
        '''
        api = PbrtAPI()
        api.FLATTEN_INSTANCE_LIMIT = 4  # force the two-level path at 5 uses
        for st in ps.parse_statements(txt):
            api.do_statement(st)
        return api.builder.finalize()

    def test_small_counts_flatten(self):
        api = PbrtAPI()
        for st in ps.parse_statements('''
            WorldBegin
            ObjectBegin "thing"
              Shape "trianglemesh" "integer indices" [0 1 2]
                "point P" [0 0 0  1 0 0  0 1 0]
            ObjectEnd
            ObjectInstance "thing"
            Translate 10 0 0
            ObjectInstance "thing"
            WorldEnd
        '''):
            api.do_statement(st)
        scene = api.builder.finalize()
        assert scene.n_tris == 2 and scene.n_instances == 0

    def test_large_counts_instance(self):
        scene = self._api_scene(6)
        assert scene.n_instances == 6
        assert scene.proto_p0.shape[0] == 1
        assert scene.n_tris == 0
        # instances carry their use-time CTMs
        x = np.asarray(scene.inst_o2w)[:, 0, 3]
        np.testing.assert_allclose(sorted(x), [0, 3, 6, 9, 12, 15], atol=1e-5)
