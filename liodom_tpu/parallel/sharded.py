"""SPMD odometry over a device mesh.

Replaces the reference's process-parallelism + ROS transport (SURVEY.md §5)
with mesh axes:

* ``data``: a batch of independent sequences, one odometry state each —
  multi-sequence throughput scaling (vmap over the batch, sharded over the
  axis).
* ``map``: the hot per-frame work — kNN correspondence search and the
  Gauss-Newton normal equations — sharded across chips.  Each device searches
  its slice of the matching map and computes partial top-k candidates
  (values *and* coordinates, so no cross-shard gather is ever needed); an
  ``all_gather`` over 'map' merges candidates, and the 6x6 ``JtJ``/``Jtr``
  reduce with a ``psum``.  Both collectives ride ICI.

The per-sequence window state is replicated inside a map group (it is ~100s
of KB); what is sharded is the O(E x M) correspondence compute — the term
that dominates the frame budget.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from liodom_tpu.core import pose as se3
from liodom_tpu.core.config import LiodomConfig
from liodom_tpu.core.frame import EdgeCloud
from liodom_tpu.core.pose import Pose
from liodom_tpu.odometry import local_map
from liodom_tpu.odometry.pipeline import OdomState, init_state
from liodom_tpu.ops.neighbors import knn_auto, sym3_eigenvalues
from liodom_tpu.ops.solver import lm_solve


def init_batch_state(cfg: LiodomConfig, batch: int) -> OdomState:
    """A batch of independent odometry states (leading dim = sequences)."""
    one = init_state(cfg)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape),
                        one)


def _sharded_correspondences(edges_world, emask, map_xyz, map_valid, cfg):
    """kNN + line fit with the map sharded over the 'map' mesh axis.

    map_xyz/map_valid are the LOCAL shard. Returns (lpa, lpb, valid)
    identical on every device of the map group."""
    k = cfg.knn_k
    d2l, idxl = knn_auto(edges_world, emask, map_xyz, map_valid, k=k)
    ptsl = map_xyz[idxl]                                     # (E, k, 3)
    # gather candidates from all map shards: (md, E, k[, 3]) -> (E, md*k[, 3])
    d2g = jax.lax.all_gather(d2l, "map")
    ptsg = jax.lax.all_gather(ptsl, "map")
    md = d2g.shape[0]
    e = d2l.shape[0]
    d2g = jnp.moveaxis(d2g, 0, 1).reshape(e, md * k)
    ptsg = jnp.moveaxis(ptsg, 0, 1).reshape(e, md * k, 3)
    nd, sel = jax.lax.top_k(-d2g, k)
    d2 = -nd                                                 # (E, k) ascending
    near = jnp.take_along_axis(ptsg, sel[..., None].repeat(3, -1), axis=1)
    center = jnp.mean(near, axis=1, keepdims=True)
    zm = near - center
    cov = jnp.einsum("eki,ekj->eij", zm, zm)
    eigs = sym3_eigenvalues(cov)
    sep_sq = jnp.sum((near[:, 0, :] - near[:, 1, :]) ** 2, axis=-1)
    ok = ((d2[:, k - 1] < cfg.knn_max_sq_dist)
          & (eigs[:, 2] > cfg.eig_ratio * eigs[:, 1]) & emask
          & (sep_sq > cfg.min_line_sep * cfg.min_line_sep))
    return near[:, 0, :], near[:, 1, :], ok


def _one_sequence_step(state: OdomState, exyz, evalid, cfg: LiodomConfig):
    """Per-sequence frame step with 'map'-sharded correspondence compute.
    Runs inside shard_map; window state is replicated over 'map'."""
    # same matching-map assembly as the single-chip path (incl. the optional
    # window voxel filter and the received-map merge) — replicated compute
    # inside the map group
    from liodom_tpu.odometry.pipeline import _matching_map
    map_xyz, map_valid = _matching_map(state, cfg)

    # slice my map shard
    md = jax.lax.axis_size("map")
    me = jax.lax.axis_index("map")
    m = map_xyz.shape[0]
    shard = -(-m // md)  # cdiv; last shard padded with invalid
    pad = shard * md - m
    map_xyz = jnp.pad(map_xyz, ((0, pad), (0, 0)))
    map_valid = jnp.pad(map_valid, (0, pad))
    my_xyz = jax.lax.dynamic_slice_in_dim(map_xyz, me * shard, shard, 0)
    my_valid = jax.lax.dynamic_slice_in_dim(map_valid, me * shard, shard, 0)

    pred = se3.compose(state.odom,
                       se3.compose(se3.inverse(state.prev_odom), state.odom))
    new_prev = state.odom
    pose = pred

    # shard the residual set over 'map' as well for the normal equations
    e = exyz.shape[0]
    esh = -(-e // md)
    epad = esh * md - e

    for _ in range(cfg.outer_iters):
        ew = se3.transform(pose, exyz)
        lpa, lpb, ok = _sharded_correspondences(ew, evalid, my_xyz, my_valid,
                                                cfg)
        cp_p = jnp.pad(exyz, ((0, epad), (0, 0)))
        lpa_p = jnp.pad(lpa, ((0, epad), (0, 0)))
        lpb_p = jnp.pad(lpb, ((0, epad), (0, 0)))
        ok_p = jnp.pad(ok, (0, epad))
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, me * esh, esh, 0)
        pose = lm_solve(pose, sl(cp_p), sl(lpa_p), sl(lpb_p), sl(ok_p),
                        min_range=cfg.min_range, max_range=cfg.max_range,
                        huber_delta=cfg.huber_delta, iters=cfg.inner_iters,
                        axis_name="map")

    edges_final = se3.transform(pose, exyz)
    window = local_map.push(state.window,
                            jnp.where(evalid[:, None], edges_final, 0.0),
                            evalid)
    new_state = OdomState(window, pose, new_prev, state.received_xyz,
                          state.received_valid, state.imu_ori)
    return new_state, pose


def make_sharded_step(mesh: Mesh, cfg: LiodomConfig):
    """Build the jitted multi-chip step: (batched state, batched edges) ->
    (state, poses).  Batch is sharded over 'data'; per-frame compute over
    'map'."""

    def device_fn(state: OdomState, exyz, evalid):
        # leading batch dim (local shard of 'data'); vmap sequences, with the
        # 'map' collectives inside
        step = lambda s, x, v: _one_sequence_step(s, x, v, cfg)
        return jax.vmap(step)(state, exyz, evalid)

    state_spec = jax.tree.map(lambda _: P("data"), init_batch_state(cfg, 1))
    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(state_spec, P("data"), P("data")),
        out_specs=(state_spec, jax.tree.map(lambda _: P("data"),
                                            Pose.identity())),
        check_vma=False,
    )
    return jax.jit(fn)
