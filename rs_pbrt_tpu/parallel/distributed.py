"""Multi-host distribution scaffolding.

The reference parallelizes across the threads of ONE machine
(src/blockqueue/mod.rs work stealing); there is no multi-node path to
mirror, so this is designed TPU-first:

- `init_distributed()` brings up `jax.distributed` from standard env vars
  (one process per host on a pod slice / multi-host v5e deployment).
- `make_host_mesh()` shapes `jax.devices()` into a ("h", "d") mesh:
  axis "h" spans hosts (collectives cross DCN), axis "d" spans the chips
  of one host (collectives ride ICI).
- `parallel.mesh.render_sharded` accepts any mesh and shards the
  (pixel x sample) lane axis over ALL mesh axes; the film `psum` over
  ("h", "d") lowers to an ICI reduction per host followed by a DCN
  all-reduce of one film per host — the film (H*W*7 floats) is the ONLY
  cross-host traffic, once per spp batch.
- Scene tables are REPLICATED per host (Cornell..Ganesha fit one chip's
  HBM).  For scenes beyond HBM, `geometry_sharded_intersect` (below)
  shards triangle positions + per-shard BVH over a mesh axis and merges
  closest hits with an `all_gather` + argmin — the primitive-range
  sharding escape hatch (SURVEY §2.2 row 10).

Single-host testing: an 8-device CPU mesh factored as (2 "hosts" x 4
"chips") exercises the exact same program; only the physical transport
differs (tests/test_parallel.py, __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import numpy as np


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed for a multi-host deployment.

    Arguments default from the conventional env vars
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID); returns
    False (no-op) when unset so single-host runs need no configuration.
    Cloud TPU pod slices auto-detect all three when env vars are absent.
    """
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_host_mesh(n_hosts: Optional[int] = None, devices=None):
    """("h", "d") mesh over hosts x per-host chips.

    On a real multi-host slice, n_hosts defaults to jax.process_count().
    On a single host, pass n_hosts to FACTOR the local devices into
    simulated hosts (CI: 8 CPU devices as 2x4)."""
    import jax
    from jax.sharding import Mesh

    devices = devices if devices is not None else jax.devices()
    if n_hosts is None:
        n_hosts = max(jax.process_count(), 1)
    n = len(devices)
    if n % n_hosts:
        raise ValueError(f"{n} devices do not factor into {n_hosts} hosts")
    arr = np.asarray(devices).reshape(n_hosts, n // n_hosts)
    return Mesh(arr, ("h", "d"))


# ---------------------------------------------------------------------------
# primitive-range geometry sharding (the >HBM escape hatch)
# ---------------------------------------------------------------------------


class GeomShards(NamedTuple):
    """Host-built per-device triangle shards (leading axis = shard)."""

    p0: np.ndarray  # (G, Ts, 3) padded positions
    p1: np.ndarray
    p2: np.ndarray
    offset: np.ndarray  # (G,) global id of each shard's first triangle
    n_valid: np.ndarray  # (G,) real (unpadded) triangle count per shard


def build_geom_shards(p0, p1, p2, n_shards: int) -> GeomShards:
    """Split triangles into contiguous ranges, one per device.  Padding
    triangles are degenerate (all-zero -> det == 0 -> guaranteed miss)."""
    p0 = np.asarray(p0, np.float32)
    p1 = np.asarray(p1, np.float32)
    p2 = np.asarray(p2, np.float32)
    t = p0.shape[0]
    ts = -(-t // n_shards)

    def pad(v):
        out = np.zeros((n_shards * ts, 3), np.float32)
        out[:t] = v
        return out.reshape(n_shards, ts, 3)

    offset = np.arange(n_shards, dtype=np.int32) * ts
    n_valid = np.clip(t - offset, 0, ts).astype(np.int32)
    return GeomShards(pad(p0), pad(p1), pad(p2), offset, n_valid)


def geometry_sharded_intersect(shards: GeomShards, mesh, axis: str,
                               o, d, t_max):
    """Closest-hit over triangle shards distributed on a mesh axis.

    Every device tests ALL rays against its local range (brute Pallas sweep
    or local traversal), then the winner is picked with an all_gather +
    argmin over the axis — deterministic (ties resolve to the lowest
    global triangle id, matching the single-device sweep order).

    Returns a global-id TriHit replicated across the axis."""
    import jax
    import jax.numpy as jnp
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.intersect import TriHit, intersect_tris_brute

    def local(p0s, p1s, p2s, off, o, d, t_max):
        p0l, p1l, p2l = p0s[0], p1s[0], p2s[0]
        hit = intersect_tris_brute(o, d, t_max, p0l, p1l, p2l)
        tri_g = jnp.where(hit.valid, hit.tri + off[0], jnp.int32(2**31 - 1))
        t = jnp.where(hit.valid, hit.t, jnp.float32(3e38))
        # gather all shards' candidates, pick min (t, tri) lexicographically
        tg = jax.lax.all_gather(t, axis)  # (G, R)
        trig = jax.lax.all_gather(tri_g, axis)
        b0g = jax.lax.all_gather(hit.b0, axis)
        b1g = jax.lax.all_gather(hit.b1, axis)
        # lexicographic (t, global tri id) winner: among equal-t candidates
        # the lowest global id wins, matching single-device sweep order
        tmin = jnp.min(tg, axis=0)
        trig_tie = jnp.where(tg <= tmin[None, :], trig, 2**31 - 1)
        tri_w = jnp.min(trig_tie, axis=0)
        win = jnp.argmin(jnp.where(trig == tri_w[None, :], 0, 1), axis=0)
        r = jnp.arange(t.shape[0])
        return (
            tmin,
            tri_w,
            b0g[win, r],
            b1g[win, r],
        )

    spec_g = P(axis)
    kw = dict(
        mesh=mesh,
        in_specs=(spec_g, spec_g, spec_g, spec_g, P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
    )
    try:
        # outputs are replicated by construction (all_gather + identical
        # per-device argmin), which the static checker cannot infer
        fn = shard_map(local, check_vma=False, **kw)
    except TypeError:  # older jax spells it check_rep
        fn = shard_map(local, check_rep=False, **kw)
    t, tri, b0, b1 = fn(
        shards.p0, shards.p1, shards.p2, shards.offset,
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max, jnp.float32),
    )
    valid = tri < 2**31 - 1
    return TriHit(valid, jnp.where(valid, t, jnp.asarray(t_max, jnp.float32)),
                  jnp.where(valid, tri, -1), b0, b1)
