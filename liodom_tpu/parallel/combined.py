"""Composed multi-chip odometry + mapping: the full adaptive-local-mapping
loop as ONE SPMD program.

The reference's flagship deployment is two processes wired over ROS topics —
the odometer (liodom_node) solves against the local map it received last,
the mapper (liodom_mapping_node.cc:45-90) inserts the solved frame's edges
into the global hash-grid map and publishes back the neighbourhood around
the pose, which the odometer merges next frame
(launch/liodom.launch:34-57, laser_odometry.cc:310-314).

Here that whole loop is one ``shard_map`` program over a (data x map) mesh:

* odometry — kNN correspondence + LM normal equations sharded over 'map'
  (parallel/sharded.py: all_gather'd candidates, psum'd 6x6);
* map update — each device owns the cells hashing to it
  (parallel/sharded_map.py), zero cross-device traffic on insert;
* feedback — per-shard local-map extraction + one ``all_gather`` over ICI
  assembles the replicated matching map for the NEXT frame (the reference's
  mapper->odometer topic, one-message latency preserved).

Frame dataflow matches mapping.service.combined_step exactly; per-frame
collectives: 2 all_gathers + 1 psum per LM stage for odometry, 1 all_gather
for the map feedback — all riding ICI within a 'map' group.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from liodom_tpu.core.config import LiodomConfig, MapConfig
from liodom_tpu.core.pose import Pose
from liodom_tpu.mapping.grid import MapState
from liodom_tpu.odometry import pipeline as _pipeline
from liodom_tpu.odometry.pipeline import OdomState
from liodom_tpu.parallel.sharded import _one_sequence_step
from liodom_tpu.parallel.sharded_map import (_shard_local_map, _shard_update,
                                             init_sharded_map)


def init_combined_sharded(cfg: LiodomConfig, mcfg: MapConfig, mesh: Mesh,
                          dtype=jnp.float32) -> Tuple[OdomState, MapState]:
    """Host-side: (batched odom state, (data, map)-stacked map state).

    One sequence per 'data' group; each sequence owns a map sharded over
    'map' (per-shard capacity = map_capacity // n_map).  The received-map
    buffer is sized to a multiple of n_map so the all_gather'd feedback
    fills it exactly."""
    if not cfg.mapping:
        raise ValueError("composed sharded step requires cfg.mapping=True")
    batch, n_map = mesh.shape["data"], mesh.shape["map"]
    r = (mcfg.local_map_capacity // n_map) * n_map
    o1 = _pipeline.init_state(cfg, received_capacity=r)
    ostate = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), o1)
    m1 = init_sharded_map(mcfg, n_map, dtype)            # (n_map, ...)
    mstate = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), m1)
    return ostate, mstate


def make_sharded_combined_step(mesh: Mesh, cfg: LiodomConfig,
                               mcfg: MapConfig):
    """Build the jitted composed step: (odom, map, edges, valid) ->
    (odom, map, poses).  Solve order mirrors the reference dataflow: the
    odometer consumes the map received LAST frame, then the mapper inserts
    this frame at the solved pose, then the refreshed neighbourhood is
    handed to the next frame (mapping.service.combined_step)."""
    n_map = mesh.shape["map"]
    per_loc = mcfg.local_map_capacity // n_map

    def device_fn(ostate, mstate, exyz, evalid):
        o = jax.tree.map(lambda x: x[0], ostate)         # my 'data' sequence
        m = jax.tree.map(lambda x: x[0, 0], mstate)      # my map shard
        ex, ev = exyz[0], evalid[0]
        o2, pose = _one_sequence_step(o, ex, ev, cfg)
        m2 = _shard_update(m, ex, ev, pose, mcfg, "map")
        lx, lv = _shard_local_map(m2, pose.t, mcfg, per_loc, "map")
        o2 = o2._replace(received_xyz=lx.astype(o2.received_xyz.dtype),
                         received_valid=lv)
        return (jax.tree.map(lambda x: x[None], o2),
                jax.tree.map(lambda x: x[None, None], m2),
                jax.tree.map(lambda x: x[None], pose))

    ospec = jax.tree.map(lambda _: P("data"),
                         _pipeline.init_state(cfg, received_capacity=1))
    mspec = jax.tree.map(lambda _: P("data", "map"),
                         init_sharded_map(mcfg, 1))
    pspec = jax.tree.map(lambda _: P("data"), Pose.identity())
    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(ospec, mspec, P("data"), P("data")),
        out_specs=(ospec, mspec, pspec), check_vma=False)
    return jax.jit(fn)
