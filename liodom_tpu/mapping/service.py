"""Mapping service + the odometry<->mapping feedback loop.

The reference runs mapping as a SECOND OS PROCESS (liodom_mapping_node.cc)
fed over ROS topics: the odometry node publishes edges + a TF pose, the
mapper inserts them into the hash-grid map and publishes back a local map
that the odometer merges into its matching map when ``mapping:=true``
(liodom_node.cc:57-64 -> laser_odometry.cc:310-314) — "adaptive local
mapping".

Here that loop has two deployments:

* :func:`combined_step` — odometry + map update + local-map extraction fused
  into ONE compiled program (no host round-trips; the feedback the reference
  ships over TCPROS becomes an in-program data dependency).  The extracted
  local map feeds the *next* frame's matching map, mirroring the reference's
  one-message latency.
* :class:`MappingService` — a host-side service object mirroring the
  two-process architecture (async update cadence decoupled from the sensor
  rate, latched re-publish semantics) for when mapping should run slower
  than odometry.
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from liodom_tpu.core.config import LiodomConfig, MapConfig
from liodom_tpu.core.pose import Pose
from liodom_tpu.mapping.grid import (MapState, get_local_map, get_map,
                                     init_map, update_map)
from liodom_tpu.odometry.pipeline import OdomState, full_step, init_state


def init_combined(cfg: LiodomConfig, mcfg: MapConfig
                  ) -> Tuple[OdomState, MapState]:
    if not cfg.mapping:
        raise ValueError("combined pipeline requires cfg.mapping=True")
    odom = init_state(cfg, received_capacity=mcfg.local_map_capacity)
    return odom, init_map(mcfg.map_capacity)


def _refresh_local_map(odom_state: OdomState, map_state: MapState,
                       pose: Pose, mcfg: MapConfig, step, every: int
                       ) -> OdomState:
    """Hand the freshly-extracted local map to the odometer — every
    ``every``-th frame.

    ``every > 1`` mirrors the reference deployment more closely than
    every-frame extraction: the mapper is a second PROCESS publishing at its
    own cadence (latched topic + 3 s stale republish, liodom_mapping_node.cc:
    92-106, 139-142) and the odometer merges whatever map it received *last*
    (laser_odometry.cc:276-279) — a stale-by-a-few-frames local map is the
    reference's normal operating mode."""
    def fresh(_):
        loc_xyz, loc_valid, _n_hits = get_local_map(
            map_state, pose.t, mcfg, capacity=mcfg.local_map_capacity)
        return odom_state._replace(received_xyz=loc_xyz,
                                   received_valid=loc_valid)

    if every <= 1 or step is None:
        return fresh(None)
    return jax.lax.cond(jnp.asarray(step) % every == 0,
                        fresh, lambda _: odom_state, None)


@partial(jax.jit, static_argnames=("cfg", "mcfg", "local_map_every"))
def combined_step(odom_state: OdomState, map_state: MapState,
                  raw_xyz: jax.Array, raw_valid: jax.Array,
                  cfg: LiodomConfig, mcfg: MapConfig,
                  step=None, local_map_every: int = 1,
                  t_laser_base: Optional[Pose] = None
                  ) -> Tuple[OdomState, MapState, Pose, jax.Array]:
    """One frame of odometry + mapping, fully fused.

    Order mirrors the reference dataflow: odometry solves against the map
    received *last* frame (laser_odometry.cc:310-314), then the mapper
    inserts this frame's edges at the solved pose (liodom_mapping_node.cc:
    45-90) and the refreshed local map is handed to the next frame.
    ``local_map_every`` (with a ``step`` counter) throttles the local-map
    extraction to the reference's async-mapper cadence — see
    :func:`_refresh_local_map`."""
    from liodom_tpu.core.frame import RawScan
    from liodom_tpu.ops.features import extract_features

    edges = extract_features(RawScan(raw_xyz, raw_valid), cfg)
    new_odom, pose = _odom_only(odom_state, edges, cfg, t_laser_base)
    map_state = update_map(map_state, edges.xyz, edges.valid, pose, mcfg)
    new_odom = _refresh_local_map(new_odom, map_state, pose, mcfg,
                                  step, local_map_every)
    return new_odom, map_state, pose, edges.num_valid()


@partial(jax.jit, static_argnames=("cfg", "mcfg", "local_map_every"))
def combined_image_step(odom_state: OdomState, map_state: MapState,
                        img_xyz: jax.Array, img_count: jax.Array,
                        cfg: LiodomConfig, mcfg: MapConfig,
                        step=None, local_map_every: int = 1,
                        t_laser_base: Optional[Pose] = None
                        ) -> Tuple[OdomState, MapState, Pose, jax.Array]:
    """:func:`combined_step` starting from a loader-split ring image
    (see odometry.pipeline.image_step)."""
    from liodom_tpu.core.frame import RingImage
    from liodom_tpu.ops.features import smoothness, select_edges

    img = RingImage(img_xyz, img_count)
    edges = select_edges(img, smoothness(img, cfg), cfg)
    new_odom, pose = _odom_only(odom_state, edges, cfg, t_laser_base)
    map_state = update_map(map_state, edges.xyz, edges.valid, pose, mcfg)
    new_odom = _refresh_local_map(new_odom, map_state, pose, mcfg,
                                  step, local_map_every)
    return new_odom, map_state, pose, edges.num_valid()


@partial(jax.jit, static_argnames=("cfg", "mcfg", "local_map_every"))
def chained_combined_image_step(odom_state: OdomState, map_state: MapState,
                                imgs_xyz: jax.Array, imgs_count: jax.Array,
                                cfg: LiodomConfig, mcfg: MapConfig,
                                step0=0, local_map_every: int = 1,
                                t_laser_base: Optional[Pose] = None,
                                imu_quats: Optional[jax.Array] = None
                                ) -> Tuple[OdomState, MapState, Pose,
                                           jax.Array]:
    """K frames of the fused odometry+mapping loop per device dispatch —
    ``lax.scan`` over the :func:`combined_image_step` body (see
    odometry.pipeline.chained_image_step for the dispatch-floor rationale).

    ``step0`` seeds the frame counter for the ``local_map_every`` cadence
    (a traced operand — chunk k of a replay passes ``step0=k*K`` and the
    async-mapper refresh pattern is identical to the unchained loop).
    With ``cfg.use_imu`` pass per-frame ``imu_quats`` (K, 4) — see the
    chained_image_step note.

    Returns (odom_state, map_state, poses (K, ...), n_edges (K,))."""
    if cfg.use_imu and imu_quats is None:
        raise ValueError("cfg.use_imu requires per-frame imu_quats (K, 4) "
                         "in the chained step")

    def body(carry, xc):
        s, m, i = carry
        if imu_quats is None:
            x, c = xc
        else:
            x, c, q = xc
            s = s._replace(imu_ori=q.astype(s.imu_ori.dtype))
        s2, m2, pose, ne = combined_image_step(
            s, m, x, c, cfg, mcfg, step=i,
            local_map_every=local_map_every, t_laser_base=t_laser_base)
        return (s2, m2, i + 1), (pose, ne)

    xs = (imgs_xyz, imgs_count) if imu_quats is None else \
        (imgs_xyz, imgs_count, imu_quats)
    (odom_state, map_state, _), (poses, nedges) = jax.lax.scan(
        body, (odom_state, map_state, jnp.asarray(step0, jnp.int32)), xs)
    return odom_state, map_state, poses, nedges


def _odom_only(state: OdomState, edges, cfg: LiodomConfig,
               t_laser_base: Optional[Pose] = None):
    from liodom_tpu.odometry.pipeline import odometry_step
    return odometry_step(state, edges, cfg, t_laser_base)


class MappingService:
    """Host-side mapper mirroring liodom_mapping_node.cc.

    The reference node consumes `/liodom/edges` + the TF pose, updates the
    map on every message, publishes the full map and — when anyone listens —
    the local map around the current pose, re-publishing latched copies every
    ``publish_period`` if stale (liodom_mapping_node.cc:92-106)."""

    def __init__(self, mcfg: MapConfig, publish_period: float = 3.0,
                 stale_after: float = 5.0):
        self.mcfg = mcfg
        self.state = init_map(mcfg.map_capacity)
        self.publish_period = publish_period
        self.stale_after = stale_after
        self._last_update_t = 0.0
        self._last_publish_t = 0.0
        self._latched_map: Optional[Tuple[np.ndarray, np.ndarray]] = None

    def update(self, edges_xyz, edges_valid, pose: Pose,
               now: Optional[float] = None) -> None:
        """lidarClb (liodom_mapping_node.cc:45-90): insert edges at pose."""
        self.state = update_map(self.state, edges_xyz, edges_valid, pose,
                                self.mcfg)
        self._last_update_t = time.monotonic() if now is None else now

    def full_map(self, now: Optional[float] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
        xyz, valid = get_map(self.state)
        out = (np.asarray(xyz), np.asarray(valid))
        self._latched_map = out
        self._last_publish_t = time.monotonic() if now is None else now
        return out

    def local_map(self, position) -> Tuple[jax.Array, jax.Array]:
        xyz, valid, _ovf = self.local_map_with_overflow(position)
        return xyz, valid

    def local_map_with_overflow(self, position
                                ) -> Tuple[jax.Array, jax.Array, int]:
        """(xyz, valid, hits beyond capacity) from ONE extraction — the
        publish path needs both, and ``get_local_map`` is a C-sized
        membership scan + top_k that should not run twice per publish."""
        xyz, valid, n_hits = get_local_map(
            self.state, jnp.asarray(position), self.mcfg,
            capacity=self.mcfg.local_map_capacity)
        ovf = max(int(n_hits) - self.mcfg.local_map_capacity, 0)
        if ovf:
            logging.getLogger("liodom.mapping").warning(
                "local map truncated: %d hits > capacity %d "
                "(raise MapConfig.local_map_capacity)",
                int(n_hits), self.mcfg.local_map_capacity)
        return xyz, valid, ovf

    def local_map_overflow(self, position) -> int:
        """Hits beyond ``local_map_capacity`` at ``position`` (0 = lossless).
        The fused combined path clips silently on-device; apps poll this
        periodically to honour the no-silent-caps contract."""
        _, _, n_hits = get_local_map(
            self.state, jnp.asarray(position), self.mcfg,
            capacity=self.mcfg.local_map_capacity)
        return max(int(n_hits) - self.mcfg.local_map_capacity, 0)

    def entropy(self) -> float:
        """Shannon entropy of hash-bucket occupancy (``Map::getMapEntropy``,
        map.cc:191-211) — the reference's map-health diagnostic."""
        from liodom_tpu.mapping.grid import map_entropy
        return map_entropy(self.state)

    def maybe_republish(self, now: Optional[float] = None):
        """timerClb (liodom_mapping_node.cc:92-106): return the latched map
        if it has gone stale, else None."""
        now = time.monotonic() if now is None else now
        if (self._latched_map is not None
                and now - self._last_publish_t > self.stale_after):
            self._last_publish_t = now
            return self._latched_map
        return None
