"""Geometry (visibility) gradients via primary-silhouette edge sampling.

The interior term of a pixel-value gradient w.r.t. geometry (shading and
measure changes at fixed visibility) flows through ordinary AD once vertex
positions are differentiable inputs.  The BOUNDARY term — radiance is
discontinuous across silhouette/crease edges, and those discontinuities
MOVE with the geometry — needs an explicit edge integral (Li et al. 2018
"Differentiable Monte Carlo Ray Tracing through Edge Sampling"; the
reference renderer has no gradients at all, SURVEY §7 stage 4):

    d/dtheta  (1/WH) iint L dx dy
      = (1/WH) [ iint dL/dtheta dx dy                       (interior, AD)
               + sum_edges int (L^- - L^+) (v . n) dl ]     (boundary)

evaluated in RASTER space: for each unique edge of the moving geometry,
sample points along the edge, project to the raster, trace a ray pair
offset +-delta pixels along the projected edge normal, take the radiance
difference, and weight by the raster-space velocity of the edge point
under the parameter.  Occluded and non-silhouette samples contribute ~0
automatically (both offset rays see the same surface -> zero difference),
so no explicit silhouette test is needed — at the cost of wasted samples
on interior edges.

Scope: PRIMARY visibility (camera-ray silhouettes), box filter, scalar
loss = weighted pixel sum.  Secondary (shadow/indirect) boundary terms are
not modeled; for the diffuse test scenes their FD contribution is well
below the primary term.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import cameras as cam
from ..models import samplers as smpl
from ..models.integrators import path as pathmod
from ..scene import arrays as sa


def world_to_raster(camera: cam.Camera, p_world):
    """(N,3) world points -> (N,2) raster coordinates (perspective/ortho)."""
    w2c = jnp.linalg.inv(camera.cam_to_world)
    c2r = jnp.linalg.inv(camera.raster_to_camera)
    ph = jnp.concatenate([p_world, jnp.ones_like(p_world[..., :1])], -1)
    pc = ph @ w2c.T
    pr = pc @ c2r.T
    return pr[..., :2] / jnp.maximum(pr[..., 3:4], 1e-12)


def unique_edges(idx_pairs, face_ids=None):
    """(E,2) vertex-position pairs -> deduplicated host-side edge list.
    idx_pairs are (p_a, p_b) coordinate ROWS; dedup by rounded coords so
    shared triangle edges count once in the boundary integral.
    With face_ids (per input edge), also returns the (E,2) adjacent-face
    table (-1 for boundary edges)."""
    a, b = idx_pairs
    key = np.round(np.concatenate([np.minimum(a, b), np.maximum(a, b)], -1), 6)
    uniq, first, inv = np.unique(key, axis=0, return_index=True, return_inverse=True)
    order = np.sort(first)
    if face_ids is None:
        return a[order], b[order]
    adj = np.full((len(uniq), 2), -1, np.int64)
    for i, f in zip(inv, np.asarray(face_ids)):
        if adj[i, 0] < 0:
            adj[i, 0] = f
        elif adj[i, 1] < 0 and adj[i, 0] != f:
            adj[i, 1] = f
    # remap to the order-sorted edge list
    rank = {fi: k for k, fi in enumerate(first[np.argsort(first)])}
    pos_of_uniq = np.empty(len(uniq), np.int64)
    for u_i, f_i in enumerate(first):
        pos_of_uniq[u_i] = np.searchsorted(order, f_i)
    adj_sorted = np.empty_like(adj)
    adj_sorted[pos_of_uniq] = adj
    return a[order], b[order], adj_sorted


def translate_tris(scene: sa.Scene, mask, offset):
    """Differentiably translate the masked triangles by `offset` (3,),
    updating both the SoA arrays and the packed tri_attr shadow copy."""
    m = mask[:, None].astype(jnp.float32)
    d = jnp.asarray(offset, jnp.float32)[None, :]
    p0 = scene.tri_p0 + m * d
    p1 = scene.tri_p1 + m * d
    p2 = scene.tri_p2 + m * d
    ta = scene.tri_attr
    ta = ta.at[:, sa.TA_P0 : sa.TA_P0 + 3].set(p0)
    ta = ta.at[:, sa.TA_P1 : sa.TA_P1 + 3].set(p1)
    ta = ta.at[:, sa.TA_P2 : sa.TA_P2 + 3].set(p2)
    return scene._replace(tri_p0=p0, tri_p1=p1, tri_p2=p2, tri_attr=ta)


def _primary_radiance(scene, camera, cfg, sampler_cfg, p_raster, accel, seed,
                      pix_base=None):
    """Path radiance through given raster points (one sample per point).
    pix_base: shared sampler pixel for paired +-delta rays — BOTH rays of
    an edge pair must draw the same sobol dims or their difference is
    noise instead of the visibility jump."""
    n = p_raster.shape[0]
    pix = (jnp.clip(p_raster.astype(jnp.int32), 0, None)
           if pix_base is None else pix_base)
    snum = jnp.full((n,), np.uint32(seed), jnp.uint32)
    ctx = smpl.make_ctx(sampler_cfg, pix, snum)
    rays = cam.generate_rays(
        camera, p_raster, jnp.full((n, 2), 0.5, jnp.float32),
        jnp.zeros((n,), jnp.float32),
    )
    pcfg = pathmod.PathCfg(cfg.max_depth, cfg.rr_threshold)
    return pathmod.radiance(scene, pcfg, sampler_cfg, ctx, rays.o, rays.d, accel)


def edge_boundary_grad(
    scene: sa.Scene,
    camera: cam.Camera,
    cfg,
    sampler_cfg,
    moving_mask,
    direction,
    loss_weight_image,
    accel=None,
    samples_per_edge: int = 64,
    delta_px: float = 0.02,
    seed: int = 0,
):
    """Boundary term of d(loss)/dtheta for translating the masked
    triangles along `direction`, loss = sum_px weight[px] * img[px].

    Returns a scalar.  Monte-Carlo over edge points: contribution
    (L_in - L_out) * (v_raster . n_raster) * |dl_raster| * w(px).
    """
    mm = np.asarray(moving_mask)
    tri_ids = np.where(mm)[0]
    p0 = np.asarray(scene.tri_p0)[mm]
    p1 = np.asarray(scene.tri_p1)[mm]
    p2 = np.asarray(scene.tri_p2)[mm]
    ea = np.concatenate([p0, p1, p2], 0)
    eb = np.concatenate([p1, p2, p0], 0)
    fids = np.concatenate([tri_ids] * 3)
    ea, eb, adj = unique_edges((ea, eb), face_ids=fids)
    E = len(ea)
    S = samples_per_edge
    rng = np.random.RandomState(seed)
    t = ((np.arange(S) + rng.rand(S)) / S).astype(np.float32)  # stratified
    pa = jnp.asarray(ea)[:, None, :]
    pb = jnp.asarray(eb)[:, None, :]
    tt = jnp.asarray(t)[None, :, None]
    p_edge = (pa * (1 - tt) + pb * tt).reshape(-1, 3)  # (E*S, 3)
    dirv = jnp.asarray(direction, jnp.float32)

    # raster positions + parameter velocity + edge tangent (jvp-free:
    # translation moves every edge point by `direction`)
    x = world_to_raster(camera, p_edge)
    _, v = jax.jvp(lambda p: world_to_raster(camera, p), (p_edge,),
                   (jnp.broadcast_to(dirv, p_edge.shape),))
    xa = world_to_raster(camera, jnp.asarray(ea))
    xb = world_to_raster(camera, jnp.asarray(eb))
    tang = (xb - xa)  # (E,2) raster-space edge vector
    dl = jnp.linalg.norm(tang, axis=-1) / S  # per-sample raster length
    tang_n = tang / jnp.maximum(jnp.linalg.norm(tang, axis=-1, keepdims=True), 1e-12)
    nrm = jnp.stack([-tang_n[:, 1], tang_n[:, 0]], -1)  # (E,2) normal
    nrm_s = jnp.repeat(nrm, S, axis=0)
    dl_s = jnp.repeat(dl, S, axis=0)

    x_plus = x + delta_px * nrm_s
    x_minus = x - delta_px * nrm_s
    pix_base = jnp.clip(x.astype(jnp.int32), 0, None)
    L_p = _primary_radiance(scene, camera, cfg, sampler_cfg, x_plus, accel,
                            seed, pix_base=pix_base)
    L_m = _primary_radiance(scene, camera, cfg, sampler_cfg, x_minus, accel,
                            seed, pix_base=pix_base)

    # ---- edge-OWNERSHIP filter (the Li et al. silhouette test, recast
    # for a wavefront): a sample's measured discontinuity belongs to THIS
    # edge only if at least one offset primary ray lands on one of the
    # edge's own adjacent triangles.  Hidden edges and face diagonals that
    # happen to project near someone else's silhouette (near-collinear
    # raster lines at box corners / edge-on faces) otherwise double-count
    # that silhouette with arbitrary sign. ----
    from ..ops import scene_intersect as si

    def first_prim(xq):
        rq = cam.generate_rays(
            camera, xq, jnp.full((xq.shape[0], 2), 0.5, jnp.float32),
            jnp.zeros((xq.shape[0],), jnp.float32),
        )
        it = si.scene_intersect(scene, rq.o, rq.d,
                                jnp.full(xq.shape[0], 1e30, jnp.float32), accel)
        return jnp.where(it.valid, it.prim, -2)
    h_p = first_prim(x_plus)
    h_m = first_prim(x_minus)
    adj_s = jnp.repeat(jnp.asarray(adj, jnp.int32), S, axis=0)  # (E*S, 2)
    in_adj = lambda h: (h == adj_s[:, 0]) | (h == adj_s[:, 1])
    own = in_adj(h_p) | in_adj(h_m)

    # loss weights at the edge samples (nearest pixel)
    w_img = jnp.asarray(loss_weight_image)
    H, W = w_img.shape[:2]
    px = jnp.clip(x[:, 0].astype(jnp.int32), 0, W - 1)
    py = jnp.clip(x[:, 1].astype(jnp.int32), 0, H - 1)
    inside = (x[:, 0] >= 0) & (x[:, 0] < W) & (x[:, 1] >= 0) & (x[:, 1] < H)
    w = jnp.where(inside, w_img[py, px], 0.0)

    # (L(-n side) - L(+n side)) * (v . n): the region swept by the
    # advancing discontinuity flips from the +n-side value to the -n-side
    # value.  Channel handling matches grad_loss_wrt_translation's loss
    # (scalar weights broadcast over rgb -> sum channels).
    if w_img.ndim == 3:
        wc = jnp.where(inside[:, None], w_img[py, px], 0.0)
        contrib = jnp.sum((L_m - L_p) * wc, axis=-1)
    else:
        contrib = jnp.sum(L_m - L_p, axis=-1) * w
    vn = jnp.sum(v * nrm_s, axis=-1)
    return jnp.sum(jnp.where(own, contrib * vn * dl_s, 0.0))


def _moving_edges(scene, moving_mask):
    mm = np.asarray(moving_mask)
    tri_ids = np.where(mm)[0]
    p0 = np.asarray(scene.tri_p0)[mm]
    p1 = np.asarray(scene.tri_p1)[mm]
    p2 = np.asarray(scene.tri_p2)[mm]
    ea = np.concatenate([p0, p1, p2], 0)
    eb = np.concatenate([p1, p2, p0], 0)
    fids = np.concatenate([tri_ids] * 3)
    return unique_edges((ea, eb), face_ids=fids)


def shadow_boundary_grad(
    scene: sa.Scene,
    camera: cam.Camera,
    cfg,
    sampler_cfg,
    moving_mask,
    direction,
    loss_weight_image,
    accel=None,
    samples_per_edge: int = 16,
    light_idx: int = 0,
    delta_world: float = 5e-3,
    max_pixels: int = 4096,
):
    """SECONDARY-visibility (cast shadow) boundary term of d(loss)/dtheta
    for translating the masked triangles along `direction` (VERDICT r3 #7;
    Li et al. 2018 secondary edge sampling, recast for a wavefront).

    The direct-light integral at a shading point p,
    D(p) = int_A f Le G V(p,y) dA(y), is discontinuous in y along the
    blocker edge's projection from p onto the light plane; translating the
    blocker sweeps that curve, so
        dD/dtheta |_boundary = int_curve (I- - I+) (v . n_c) dl
    with everything measured ON the light plane.  The curve is sampled by
    projecting points of each moving edge from p; the integrand at y +-
    delta*n_c is evaluated by tracing p->y: if the first hit is the light
    itself the NEE integrand f*Le*cos_p*|cos_l|/d^2 applies, otherwise 0
    (one trace handles occlusion AND light-extent clipping).  The Li
    silhouette test is the same adjacency-ownership filter as the primary
    term: a sample counts only if one side's blocking hit lands on one of
    the edge's own faces.

    Scope: direct lighting at PRIMARY hits, planar tri-range area light
    `light_idx` (the dominant term when only a cast shadow moves; deeper
    bounces' shadow terms are not modeled).  Returns a scalar.
    """
    from ..models.integrators.path import _shading_frame_du, _to_local
    from ..ops import bsdf as bx
    from ..ops import scene_intersect as si
    from ..utils import vecmath as vm

    # ---- shading points: one center ray per weighted pixel ----
    w_img = np.asarray(loss_weight_image)
    w_scalar = w_img.sum(-1) if w_img.ndim == 3 else w_img
    py, px = np.nonzero(w_scalar)
    if len(px) == 0:
        return jnp.float32(0.0)
    if len(px) > max_pixels:
        sel = np.linspace(0, len(px) - 1, max_pixels).astype(np.int64)
        px, py = px[sel], py[sel]
    # each retained pixel represents len/|kept| of the weighted set
    scale_pix = len(np.nonzero(w_scalar)[0]) / len(px)
    p_raster = jnp.asarray(np.stack([px + 0.5, py + 0.5], -1), jnp.float32)
    rays = cam.generate_rays(
        camera, p_raster, jnp.full((len(px), 2), 0.5, jnp.float32),
        jnp.zeros((len(px),), jnp.float32),
    )
    it = si.scene_intersect(
        scene, rays.o, rays.d, jnp.full(len(px), 1e30, jnp.float32), accel
    )
    wpx = jnp.asarray(
        w_img[py, px] if w_img.ndim == 3
        else np.repeat(w_scalar[py, px, None], 3, -1)
    )

    b = bx.make_bsdf_at(scene, it)
    ss, ts = _shading_frame_du(it.ns, it.dpdu)

    # ---- light plane + emission (planar tri-range light) ----
    la = np.asarray(scene.light_attr)[light_idx]
    t0 = int(la[sa.LA_TRI_START])
    lp0 = np.asarray(scene.tri_p0)[t0]
    lp1 = np.asarray(scene.tri_p1)[t0]
    lp2 = np.asarray(scene.tri_p2)[t0]
    n_l = np.cross(lp1 - lp0, lp2 - lp0)
    n_l = jnp.asarray(n_l / max(np.linalg.norm(n_l), 1e-12), jnp.float32)
    c_l = jnp.asarray(lp0, jnp.float32)
    le = jnp.asarray(la[sa.LP_I : sa.LP_I + 3], jnp.float32)
    two_sided = la[sa.LP_TWO_SIDED] > 0.5

    # ---- edge samples projected onto the light plane ----
    ea, eb, adj = _moving_edges(scene, moving_mask)
    E = len(ea)
    S = samples_per_edge
    t = ((np.arange(S) + 0.5) / S).astype(np.float32)
    m = (jnp.asarray(ea)[:, None] * (1 - t)[None, :, None]
         + jnp.asarray(eb)[:, None] * t[None, :, None])  # (E,S,3)
    Np = len(px)
    lanes = Np * E * S
    rep = lambda a: jnp.repeat(a, E * S, axis=0)  # pixel-major tiling
    p = rep(it.p)  # (lanes,3)
    m_l = jnp.tile(m.reshape(E * S, 3), (Np, 1))
    edge_dir = jnp.tile(
        jnp.repeat(jnp.asarray(eb - ea, jnp.float32), S, axis=0), (Np, 1)
    )
    dirv = jnp.asarray(direction, jnp.float32)

    def proj(mq, pq):
        denom = jnp.sum((mq - pq) * n_l, axis=-1)
        s = jnp.sum((c_l - pq) * n_l, axis=-1) / jnp.where(denom == 0, 1e-20, denom)
        return pq + s[..., None] * (mq - pq), s

    (y, s_proj), (v_y, _) = jax.jvp(
        lambda mq: proj(mq, p), (m_l,), (jnp.broadcast_to(dirv, m_l.shape),)
    )
    _, tau = jax.jvp(lambda mq: proj(mq, p)[0], (m_l,), (edge_dir,))
    # blocker must sit between the shading point and the light plane
    proj_ok = (s_proj > 1.0 + 1e-4) & jnp.isfinite(s_proj)
    n_c = vm.normalize(vm.cross(n_l[None, :], tau))
    dl = jnp.linalg.norm(tau, axis=-1) / S

    valid_px = rep(it.valid)
    b_l = jax.tree.map(
        lambda a: rep(a) if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == Np
        else a, b)
    ss_l, ts_l = rep(ss), rep(ts)
    ns_l, ng_l, wo_l3 = rep(it.ns), rep(it.ng), rep(it.wo)
    perr_l = rep(it.p_error)
    wpx_l = rep(wpx)

    def integrand_and_blocker(y_off):
        to_y = y_off - p
        dist = jnp.linalg.norm(to_y, axis=-1)
        wi = to_y / jnp.maximum(dist, 1e-12)[..., None]
        o_sh = vm.offset_ray_origin(p, perr_l, ng_l, wi)
        hit = si.scene_intersect(
            scene, o_sh, wi, jnp.full(lanes, 1e30, jnp.float32), accel
        )
        on_light = hit.valid & (hit.light == light_idx)
        blocker = jnp.where(hit.valid & ~on_light, hit.prim, -2)
        wo_loc = _to_local(wo_l3, ss_l, ts_l, ns_l)
        wi_loc = _to_local(wi, ss_l, ts_l, ns_l)
        reflect = vm.dot(wi, ng_l) * vm.dot(wo_l3, ng_l) > 0.0
        f = bx.bsdf_f(b_l, wo_loc, wi_loc, reflect)
        cos_p = jnp.abs(vm.dot(ns_l, wi))
        cos_l = vm.dot(n_l[None, :], -wi)
        emits = bool(two_sided) | (cos_l > 0.0)
        g = jnp.abs(cos_l) * cos_p / jnp.maximum(dist * dist, 1e-12)
        i_val = jnp.where(
            (on_light & emits)[..., None], f * le[None, :] * g[..., None], 0.0
        )
        return i_val, blocker

    i_m, blk_m = integrand_and_blocker(y - delta_world * n_c)
    i_p, blk_p = integrand_and_blocker(y + delta_world * n_c)

    adj_l = jnp.tile(
        jnp.repeat(jnp.asarray(adj, jnp.int32), S, axis=0), (Np, 1)
    )
    in_adj = lambda h: (h == adj_l[:, 0]) | (h == adj_l[:, 1])
    own = in_adj(blk_m) | in_adj(blk_p)

    contrib = jnp.sum((i_m - i_p) * wpx_l, axis=-1)
    vn = jnp.sum(v_y * n_c, axis=-1)
    keep = own & proj_ok & valid_px
    return jnp.sum(jnp.where(keep, contrib * vn * dl, 0.0)) * scale_pix


def grad_loss_wrt_translation(
    scene: sa.Scene,
    camera: cam.Camera,
    cfg,
    sampler_cfg,
    moving_mask,
    direction,
    loss_weight_image,
    accel=None,
    samples_per_edge: int = 64,
    seed: int = 0,
):
    """d/dtheta of loss = sum_px w[px]*img[px] for geometry translated by
    theta*direction: interior term by AD + silhouette boundary term by
    edge sampling.  Returns (interior, boundary, total) scalars."""
    from ..models.integrators import render as rdr

    w_img = jnp.asarray(loss_weight_image)

    def f(theta):
        s2 = translate_tris(scene, jnp.asarray(moving_mask), theta * jnp.asarray(direction, jnp.float32))
        img = rdr.render(s2, camera, cfg, sampler_cfg, accel=accel)
        return jnp.sum(img * (w_img if w_img.ndim == 3 else w_img[..., None]))

    interior = jax.grad(f)(jnp.float32(0.0))
    boundary = edge_boundary_grad(
        scene, camera, cfg, sampler_cfg, moving_mask, direction, w_img,
        accel=accel, samples_per_edge=samples_per_edge, seed=seed,
    )
    return interior, boundary, interior + boundary
