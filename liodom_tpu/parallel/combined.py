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

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from liodom_tpu.core import pose as se3
from liodom_tpu.core.config import LiodomConfig, MapConfig
from liodom_tpu.core.pose import Pose
from liodom_tpu.mapping.grid import MapState, get_local_map
from liodom_tpu.odometry import pipeline as _pipeline
from liodom_tpu.odometry.pipeline import OdomState
from liodom_tpu.parallel.sharded import (_one_sequence_step,
                                         _sharded_correspondences)
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


# --------------------------------------------------------------------------
# Fully-sharded composed step (round 4): features, window and feedback shard
# too.  The round-3 composed step replicated feature extraction, window
# storage/push and the matching-map assembly inside a 'map' group, capping
# the model speedup at ~2.2x (README Amdahl note).  Here every per-frame
# stage with O(points) work is sharded over 'map':
#
# * feature extraction — ring-sliced (rings are independent,
#   feature_extractor.cc:181-313 is per-scan-line); one all_gather of the
#   picked edge SLOTS (~90 KB) assembles the frame's edge cloud;
# * correspondence search — each device searches ITS shard of the matching
#   map, which is now simply the window frames it OWNS plus its own
#   received-map shard (no global assembly at all);
# * window push — global ring slot s belongs to device s % n_map at local
#   row s // n_map: eviction stays index arithmetic, storage is 1/n_map per
#   device;
# * LM — residuals sharded + 6x6 psum (unchanged);
# * map update / local-map extraction — shard-local (unchanged), and the
#   feedback all_gather is GONE: the received neighbourhood stays on the
#   shard that will search it next frame.
#
# Replicated remnants per frame: pose algebra and the (scalar) window
# bookkeeping — O(1), not O(points).


class ShardedCombinedState(NamedTuple):
    """Per-sequence state for the fully-sharded composed step.

    Pose/scalar leaves are replicated inside a 'map' group (every device
    computes them identically); ``win_*``/``recv_*`` leaves carry a leading
    'map'-shard axis in the host-side stacked layout."""

    odom: Pose
    prev_odom: Pose
    win_xyz: jax.Array     # (Kl, E, 3) — my window slots (world frame)
    win_valid: jax.Array   # (Kl, E)
    next_slot: jax.Array   # () int32 — GLOBAL ring pointer (replicated)
    nframes: jax.Array     # () int32 — GLOBAL frames held (replicated)
    recv_xyz: jax.Array    # (per_loc, 3) — my received-map shard
    recv_valid: jax.Array  # (per_loc,)


def init_combined_image_sharded(cfg: LiodomConfig, mcfg: MapConfig,
                                mesh: Mesh, dtype=jnp.float32
                                ) -> Tuple[ShardedCombinedState, MapState]:
    if not cfg.mapping:
        raise ValueError("composed sharded step requires cfg.mapping=True")
    if cfg.filter_local_map:
        raise ValueError("filter_local_map is a window-replicated transform "
                         "— unsupported on the fully-sharded path")
    batch, n_map = mesh.shape["data"], mesh.shape["map"]
    kl = -(-cfg.local_map_size // n_map)      # ceil: unused tail slots stay
    per_loc = mcfg.local_map_capacity // n_map  # invalid on some devices
    e = cfg.max_edges
    st = ShardedCombinedState(
        Pose.identity(dtype), Pose.identity(dtype),
        jnp.zeros((n_map, kl, e, 3), dtype),
        jnp.zeros((n_map, kl, e), bool),
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        jnp.zeros((n_map, per_loc, 3), dtype),
        jnp.zeros((n_map, per_loc), bool),
    )
    ostate = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), st)
    m1 = init_sharded_map(mcfg, n_map, dtype)
    mstate = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), m1)
    return ostate, mstate


def _state_specs(dtype=jnp.float32):
    pose_spec = jax.tree.map(lambda _: P("data"), Pose.identity(dtype))
    return ShardedCombinedState(
        pose_spec, pose_spec,
        P("data", "map"), P("data", "map"), P("data"), P("data"),
        P("data", "map"), P("data", "map"))


def make_sharded_combined_image_step(mesh: Mesh, cfg: LiodomConfig,
                                     mcfg: MapConfig):
    """Build the jitted FULLY-sharded composed step:
    (state, map, img_xyz (B, R, W, 3), img_count (B, R)) ->
    (state, map, poses).

    Dataflow order matches mapping.service.combined_image_step exactly
    (solve against last frame's received map -> insert at the solved pose ->
    refresh the shard-local neighbourhood for next frame); results match the
    single-device path to float-reassociation tolerance (asserted by
    __graft_entry__.dryrun_multichip)."""
    n_map = mesh.shape["map"]
    if cfg.scan_lines % n_map != 0:
        raise ValueError(f"scan_lines {cfg.scan_lines} must divide over "
                         f"map axis {n_map}")
    rpd = cfg.scan_lines // n_map
    per_loc = mcfg.local_map_capacity // n_map
    k_global = cfg.local_map_size

    def device_fn(state: ShardedCombinedState, mstate, img_xyz, img_count):
        from liodom_tpu.core.frame import RingImage
        from liodom_tpu.ops.features import select_edges, smoothness
        from liodom_tpu.ops.solver import lm_solve

        s = jax.tree.map(lambda x: x[0], state)
        s = s._replace(
            win_xyz=s.win_xyz[0], win_valid=s.win_valid[0],
            recv_xyz=s.recv_xyz[0], recv_valid=s.recv_valid[0])
        m = jax.tree.map(lambda x: x[0, 0], mstate)
        img, cnt = img_xyz[0], img_count[0]

        me = jax.lax.axis_index("map")
        n = jax.lax.axis_size("map")

        # 1. features on MY rings (exact: the pick chain never crosses
        # rings); all_gather the edge slots — ring-major order preserved,
        # so the assembled cloud is slot-identical to the full extractor
        my_img = RingImage(
            jax.lax.dynamic_slice_in_dim(img, me * rpd, rpd, 0),
            jax.lax.dynamic_slice_in_dim(cnt, me * rpd, rpd, 0))
        ec = select_edges(my_img, smoothness(my_img, cfg), cfg)
        exyz = jax.lax.all_gather(ec.xyz, "map").reshape(-1, 3)
        evalid = jax.lax.all_gather(ec.valid, "map").reshape(-1)

        # 2. my matching-map shard = the window frames I OWN + my received
        # shard.  Global slot j*n + me lives at my local row j.
        kl = s.win_xyz.shape[0]
        slot_ids = jnp.arange(kl, dtype=jnp.int32) * n + me       # (Kl,)
        live = (slot_ids < jnp.minimum(s.nframes, k_global))
        map_xyz = jnp.concatenate(
            [s.win_xyz.reshape(-1, 3), s.recv_xyz], axis=0)
        map_valid = jnp.concatenate(
            [(s.win_valid & live[:, None]).reshape(-1), s.recv_valid])

        # 3. predict + 2x (sharded correspondences -> residual-sharded LM)
        pred = se3.compose(
            s.odom, se3.compose(se3.inverse(s.prev_odom), s.odom))
        new_prev = s.odom
        pose = pred
        e = exyz.shape[0]
        esh = -(-e // n)
        epad = esh * n - e
        for _ in range(cfg.outer_iters):
            ew = se3.transform(pose, exyz)
            lpa, lpb, ok = _sharded_correspondences(
                ew, evalid, map_xyz, map_valid, cfg)
            sl = lambda a: jax.lax.dynamic_slice_in_dim(
                jnp.pad(a, ((0, epad),) + ((0, 0),) * (a.ndim - 1)),
                me * esh, esh, 0)
            pose = lm_solve(pose, sl(exyz), sl(lpa), sl(lpb), sl(ok),
                            min_range=cfg.min_range, max_range=cfg.max_range,
                            huber_delta=cfg.huber_delta,
                            iters=cfg.inner_iters, axis_name="map")

        # 4. window push — only the owner of global slot next_slot writes
        frame_x = jnp.where(evalid[:, None],
                            se3.transform(pose, exyz), 0.0)
        gslot = s.next_slot
        mine = (gslot % n) == me
        lrow = gslot // n
        win_xyz = jnp.where(
            mine,
            jax.lax.dynamic_update_index_in_dim(s.win_xyz, frame_x, lrow, 0),
            s.win_xyz)
        win_valid = jnp.where(
            mine,
            jax.lax.dynamic_update_index_in_dim(s.win_valid, evalid, lrow, 0),
            s.win_valid)
        next_slot = (gslot + 1) % k_global
        nframes = jnp.minimum(s.nframes + 1, k_global)

        # 5. mapper insert (shard-local) + shard-local feedback for the
        # NEXT frame — no all_gather: the shard that extracts these rows is
        # the shard that searches them
        m2 = _shard_update(m, exyz, evalid, pose, mcfg, "map")
        lx, lv, _nh = get_local_map(m2, pose.t, mcfg, capacity=per_loc)

        out = ShardedCombinedState(
            pose, new_prev,
            win_xyz[None], win_valid[None], next_slot, nframes,
            lx.astype(s.recv_xyz.dtype)[None], lv[None])
        return (jax.tree.map(lambda x: x[None], out),
                jax.tree.map(lambda x: x[None, None], m2),
                jax.tree.map(lambda x: x[None], pose))

    ospec = _state_specs()
    mspec = jax.tree.map(lambda _: P("data", "map"), init_sharded_map(mcfg, 1))
    pspec = jax.tree.map(lambda _: P("data"), Pose.identity())
    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(ospec, mspec, P("data"), P("data")),
        out_specs=(ospec, mspec, pspec), check_vma=False)
    return jax.jit(fn)
