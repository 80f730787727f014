"""Differentiable rendering: gradients w.r.t. material and light parameters.

The reference has no gradients at all; this is new capability (BASELINE.md
north-star metric: finite-difference pixel-gradient allclose).

Strategy: detached sampling (Zeltner et al. style).  All sampling decisions
(BSDF directions, light picks, MIS weights, RR) are stop_gradient'ed inside
the integrators; the radiance estimator is then an a.e.-differentiable
composition of BSDF evaluations, emitted radiance, and transmittance — its
reverse-mode gradient w.r.t. material/light parameters is exact for the
FIXED sample set, so AD must match finite differences on the same seeds to
float precision.

Geometry gradients (edge/visibility terms) need reparameterized or
boundary-sampling estimators — future work; material/light/camera-exposure
gradients cover the differentiable-rendering workloads (inverse material
estimation, light calibration) the north star names.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import samplers as smpl
from ..models.integrators import render as rdr
from ..scene import arrays as sa


class DiffParams(NamedTuple):
    """The differentiable leaves of a Scene."""

    mat_params: jnp.ndarray  # (M, N_MAT_PARAMS)
    light_emission: jnp.ndarray  # (L, 3) emitted radiance / intensity rgb
    # texture leaves (VERDICT r3 #8: textured albedos bypassed mat_params):
    # per-texture parameter rows (constant values, scale factors, noise
    # params) and the imagemap texel atlas (all mip levels as stored —
    # perturbing a texel is an FD on the same leaf AD differentiates)
    tex_params: jnp.ndarray  # (T, N_TEX_PARAMS)
    tex_atlas: jnp.ndarray  # (AH, AW, 3)


def get_params(scene: sa.Scene) -> DiffParams:
    return DiffParams(
        scene.mat_params,
        scene.light_params[:, sa.LP_I : sa.LP_I + 3],
        scene.tex_params,
        scene.tex_atlas,
    )


def apply_params(scene: sa.Scene, p: DiffParams) -> sa.Scene:
    """Rebuild the scene (including the packed attribute tables that shadow
    these values) from differentiable leaves — all jnp ops, so gradients
    flow into every consumer."""
    light_params = scene.light_params.at[:, sa.LP_I : sa.LP_I + 3].set(
        p.light_emission
    )
    mat_attr = scene.mat_attr.at[
        :, sa.MA_PARAMS : sa.MA_PARAMS + sa.N_MAT_PARAMS
    ].set(p.mat_params)
    light_attr = (
        scene.light_attr.at[:, : sa.N_LIGHT_PARAMS].set(light_params)
        if scene.light_attr.shape[0] else scene.light_attr
    )
    return scene._replace(
        mat_params=p.mat_params,
        light_params=light_params,
        mat_attr=mat_attr,
        light_attr=light_attr,
        tex_params=p.tex_params,
        tex_atlas=p.tex_atlas,
    )


def render_image(scene, camera, cfg, sampler_cfg, params: Optional[DiffParams] = None,
                 accel=None, max_lanes=1 << 20):
    """Differentiable render: image as a function of DiffParams."""
    if params is not None:
        scene = apply_params(scene, params)
    # regen=False: the regeneration while_loop is forward-only; AD needs
    # the fixed-depth fori_loop (reverse-differentiable)
    return rdr.render(scene, camera, cfg, sampler_cfg, accel=accel,
                      max_lanes=max_lanes, regen=False)


def grad_loss(scene, camera, cfg, sampler_cfg, loss_fn, params: Optional[DiffParams] = None,
              accel=None, mesh=None):
    """Returns (loss, dloss/dDiffParams).

    loss_fn: (H,W,3) image -> scalar.  Jittable and reverse-mode
    differentiated; the whole bounce loop is checkpointed implicitly via the
    fori_loop (XLA stores the carried state per iteration).
    mesh: optional jax.sharding.Mesh — the forward render shards lanes
    data-parallel over the mesh (parallel/mesh.render_sharded) and the
    backward pass transposes the film psum into the per-device gradient
    all-reduce (the dp gradient-sync analogue, SURVEY §2.2 row 10).
    """
    if params is None:
        params = get_params(scene)

    def f(p):
        if mesh is not None:
            from ..parallel import mesh as pmesh

            img = pmesh.render_sharded(
                apply_params(scene, p), camera, cfg, sampler_cfg,
                mesh=mesh, accel=accel,
            )
        else:
            img = render_image(scene, camera, cfg, sampler_cfg, p, accel=accel)
        return loss_fn(img)

    return jax.value_and_grad(f)(params)


def grad_loss_wrt_camera(scene, camera, cfg, sampler_cfg, loss_fn, accel=None):
    """Returns (loss, dloss/dcamera-leaves).

    Camera is a flax struct pytree; its differentiable leaves are the
    cam_to_world / raster_to_camera matrices, lens radius, focal distance
    and shutter interval, so this yields pose, zoom, defocus and exposure-
    window gradients (BASELINE.md: gradients w.r.t. camera).  Detached
    sampling: the interior term is exact for the fixed sample set;
    silhouette (visibility) terms are not modeled — finite differences
    agree away from geometric edges (tests/test_grad.py)."""

    def f(cam_p):
        img = rdr.render(scene, cam_p, cfg, sampler_cfg, accel=accel,
                         regen=False)
        return loss_fn(img)

    return jax.value_and_grad(f)(camera)
