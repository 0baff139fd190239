"""SPMD sharded hash-grid map vs. the monolithic map (8-device CPU mesh).

Cell ownership partitions the map, and re-voxelisation is cell-local, so the
union of shard soups must equal the single-device map's point set exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from liodom_tpu.core.config import MapConfig
from liodom_tpu.core.pose import Pose
from liodom_tpu.mapping.grid import get_map, init_map, update_map
from liodom_tpu.parallel.mesh import make_mesh
from liodom_tpu.parallel.sharded_map import (cell_owner, init_sharded_map,
                                             make_sharded_map_fns)


def _mesh(n_map):
    devs = jax.devices()
    if len(devs) < n_map:
        pytest.skip(f"needs {n_map} devices")
    return make_mesh(data=1, map_=n_map, devices=devs[:n_map])


def _point_set(xyz, valid, decimals=4):
    pts = np.asarray(xyz)[np.asarray(valid)]
    return set(map(tuple, np.round(pts, decimals)))


def test_matches_monolithic_map():
    mcfg = MapConfig(map_capacity=8192, local_map_capacity=2048)
    mesh = _mesh(4)
    upd, loc = make_sharded_map_fns(mesh, mcfg)

    rng = np.random.default_rng(0)
    mono = init_map(mcfg.map_capacity)
    shard = init_sharded_map(mcfg, 4)
    pose = Pose.identity()
    for i in range(3):
        pts = jnp.asarray(rng.uniform(-60, 60, (512, 3)).astype(np.float32))
        valid = jnp.asarray(rng.random(512) < 0.9)
        pose = Pose(jnp.array([1.0, 0, 0, 0]),
                    jnp.array([float(i), 0.0, 0.0]))
        mono = update_map(mono, pts, valid, pose, mcfg)
        shard = upd(shard, pts, valid, pose)

    mono_set = _point_set(*get_map(mono))
    shard_sets = [
        _point_set(np.asarray(shard.xyz)[s], np.asarray(shard.valid)[s])
        for s in range(4)]
    union = set().union(*shard_sets)
    assert union == mono_set
    # shards are disjoint (cell ownership partitions)
    total = sum(len(s) for s in shard_sets)
    assert total == len(union)


def test_local_map_assembly_matches():
    from liodom_tpu.mapping.grid import get_local_map
    mcfg = MapConfig(map_capacity=8192, local_map_capacity=4096,
                     voxel_xysize=20.0, voxel_zsize=25.0)
    mesh = _mesh(4)
    upd, loc = make_sharded_map_fns(mesh, mcfg)

    rng = np.random.default_rng(1)
    mono = init_map(mcfg.map_capacity)
    shard = init_sharded_map(mcfg, 4)
    pts = jnp.asarray(rng.uniform(-40, 40, (1024, 3)).astype(np.float32))
    valid = jnp.ones((1024,), bool)
    pose = Pose.identity()
    mono = update_map(mono, pts, valid, pose, mcfg)
    shard = upd(shard, pts, valid, pose)

    position = jnp.array([5.0, -3.0, 0.0])
    ref_xyz, ref_ok, _ = get_local_map(mono, position, mcfg,
                                    capacity=mcfg.local_map_capacity)
    got_xyz, got_ok = loc(shard, position)
    assert _point_set(got_xyz, got_ok) == _point_set(ref_xyz, ref_ok)


def test_owner_is_partition():
    rng = np.random.default_rng(2)
    keys = jnp.asarray(rng.integers(-500, 500, (1000, 3)).astype(np.int32))
    owner = np.asarray(cell_owner(keys, 8))
    assert owner.min() >= 0 and owner.max() < 8
    # deterministic
    np.testing.assert_array_equal(owner, np.asarray(cell_owner(keys, 8)))
