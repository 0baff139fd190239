"""SPMD global hash-grid map: cells sharded across the 'map' mesh axis.

The reference's mapper is a single process owning one ``unordered_map`` of
cells (map.cc).  At scale the map outgrows one device, so here each device
owns a deterministic slice of the grid.  Ownership is at RESOLUTION-LEAF
granularity (0.4 m), not cell granularity (40 m): a scan near the origin
touches only a handful of cells but thousands of leaves, so hashing cells
puts nearly every point on one shard while hashing leaves balances
~uniformly.  This is exact because re-voxelisation never looks across
leaves (a leaf's centroid depends only on that leaf's points; map.cc:124-128
re-filters per cell but VoxelGrid leaves live on the global grid), so
shard-local updates produce exactly the same global point set as the
monolithic map — no cross-device traffic on update at all.
Only the local-map gather communicates: each shard extracts its hits of the
query neighbourhood and one ``all_gather`` over ICI assembles the matching
map (replacing the reference's mapper->odometer ROS topic,
liodom_mapping_node.cc:81-87).

Capacity semantics: each shard has ``map_capacity // n_shards`` rows, so
overflow is per-shard rather than global — a pathologically skewed scene
can drop points earlier than the monolithic map would (counted in
``overflow`` exactly like grid.update_map).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from liodom_tpu.core.config import MapConfig
from liodom_tpu.core.pose import Pose
from liodom_tpu.core import pose as se3
from liodom_tpu.mapping.grid import (MapState, get_local_map,
                                     init_map, update_map)


def cell_owner(key: jax.Array, n_shards: int) -> jax.Array:
    """Shard owning an integer grid key (..., 3) — the reference's HashKey
    mix (map.h:74-83), avalanched, mod the shard count.

    The avalanche multiply is essential, not cosmetic: grid keys are
    regular integers (cell keys are meter-valued multiples of the voxel
    sizes), so the raw reference hash has highly structured low bits and a
    raw ``% n_shards`` with a power-of-two shard count collapses onto few
    shards (the reference survives because ``unordered_map`` buckets are
    prime-counted)."""
    k = key.astype(jnp.uint32)
    h = (k[..., 0] ^ (k[..., 1] << 1)) ^ (k[..., 2] << 2)
    h = h * jnp.uint32(0x9E3779B1)
    h = h ^ (h >> 16)
    return (h % jnp.uint32(n_shards)).astype(jnp.int32)


def leaf_owner(world_xyz: jax.Array, res: float, n_shards: int) -> jax.Array:
    """Shard owning each point, by its RESOLUTION leaf ``floor(p / res)``.

    Leaf-granular ownership is the balance-critical choice: a 40 m cell near
    the sensor can hold most of a frame's points (one shard overflows while
    the rest idle), whereas 0.4 m leaves split any scene ~uniformly.  Exact
    w.r.t. the monolithic map because a leaf's centroid never depends on
    other leaves."""
    leaf = jnp.floor(world_xyz / res).astype(jnp.int32)
    return cell_owner(leaf, n_shards)


def init_sharded_map(mcfg: MapConfig, n_shards: int, dtype=jnp.float32
                     ) -> MapState:
    """Host-side: a stacked (n_shards, ...) MapState pytree to be placed with
    PartitionSpec('map') on the mesh."""
    one = init_map(mcfg.map_capacity // n_shards, dtype)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_shards,) + x.shape), one)


def _shard_update(state: MapState, pts: jax.Array, valid: jax.Array,
                  pose: Pose, mcfg: MapConfig, axis: str) -> MapState:
    """Inside shard_map: keep only my leaves, merge locally."""
    n = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    world = se3.transform(pose, pts)
    mine = valid & (leaf_owner(world, mcfg.resolution, n) == me)
    return update_map(state, pts, mine, pose, mcfg)


def _shard_local_map(state: MapState, position: jax.Array, mcfg: MapConfig,
                     per_shard_capacity: int, axis: str
                     ) -> Tuple[jax.Array, jax.Array]:
    """Inside shard_map: local neighbourhood hits + all_gather assembly."""
    xyz, ok, _n_hits = get_local_map(state, position, mcfg,
                                     capacity=per_shard_capacity)
    gx = jax.lax.all_gather(xyz, axis)      # (n, cap, 3)
    gv = jax.lax.all_gather(ok, axis)       # (n, cap)
    return gx.reshape(-1, 3), gv.reshape(-1)


def make_sharded_map_fns(mesh: Mesh, mcfg: MapConfig,
                         per_shard_local_capacity: int | None = None):
    """Build (update_fn, local_map_fn, full_map_specs) over ``mesh``'s 'map'
    axis.

    update_fn(sharded_state, pts, valid, pose) -> sharded_state
        pts/valid/pose replicated; each shard keeps its own cells.
    local_map_fn(sharded_state, position) -> (xyz, valid) REPLICATED
        the assembled neighbourhood around ``position`` on every device.
    """
    n = mesh.shape["map"]
    cap = (per_shard_local_capacity if per_shard_local_capacity is not None
           else max(mcfg.local_map_capacity // n, 1))

    state_spec = jax.tree.map(lambda _: P("map"),
                              init_sharded_map(mcfg, n))
    pose_spec = jax.tree.map(lambda _: P(), Pose.identity())

    def upd(state, pts, valid, pose):
        # shard_map gives per-device blocks with a leading length-1 'map'
        # slice of the stacked state; strip/restore it
        st = jax.tree.map(lambda x: x[0], state)
        st = _shard_update(st, pts, valid, pose, mcfg, "map")
        return jax.tree.map(lambda x: x[None], st)

    def loc(state, position):
        st = jax.tree.map(lambda x: x[0], state)
        return _shard_local_map(st, position, mcfg, cap, "map")

    update_fn = jax.jit(shard_map(
        upd, mesh=mesh,
        in_specs=(state_spec, P(), P(), pose_spec),
        out_specs=state_spec, check_vma=False))
    local_map_fn = jax.jit(shard_map(
        loc, mesh=mesh,
        in_specs=(state_spec, P()),
        out_specs=(P(), P()), check_vma=False))
    return update_fn, local_map_fn
