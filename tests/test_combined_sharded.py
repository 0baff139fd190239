"""Composed multi-chip odometry+mapping vs the single-device combined flow.

The composed shard_map program (parallel/combined.py) must track the
single-device adaptive-local-mapping loop — the reference's two-process
deployment (launch/liodom.launch:34-57): solve against the map received
last frame, insert the solved frame, feed the refreshed neighbourhood to
the next frame."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from liodom_tpu.core.config import LiodomConfig, MapConfig
from liodom_tpu.core.frame import RawScan
from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
from liodom_tpu.mapping.grid import get_local_map, init_map, update_map
from liodom_tpu.odometry import pipeline as P
from liodom_tpu.ops.features import extract_features
from liodom_tpu.parallel.mesh import make_mesh
from liodom_tpu.parallel import combined as C

CFG = LiodomConfig(max_points=16384, ring_width=256, local_map_size=3,
                   mapping=True)
MCFG = MapConfig(map_capacity=4096, local_map_capacity=1024)


def test_composed_combined_matches_single_device():
    mesh = make_mesh(data=2, map_=4)
    n_map = mesh.shape["map"]
    r = (MCFG.local_map_capacity // n_map) * n_map

    world = BoxWorld(seed=0)
    n_frames = 4
    pos, yaws = drive_trajectory(n_frames, speed=0.8, yaw_rate=0.02)
    edge_frames = []
    for f in range(n_frames):
        scan = world.render(pos[f], yaw_matrix(yaws[f]), width=256,
                            noise=0.005, seed=f)
        raw = RawScan.from_points(jnp.array(scan), CFG.max_points)
        edge_frames.append(extract_features(raw, CFG))

    # composed SPMD loop
    step = C.make_sharded_combined_step(mesh, CFG, MCFG)
    ostate, mstate = C.init_combined_sharded(CFG, MCFG, mesh)
    batch = mesh.shape["data"]
    for e in edge_frames:
        bx = jnp.broadcast_to(e.xyz, (batch,) + e.xyz.shape)
        bv = jnp.broadcast_to(e.valid, (batch,) + e.valid.shape)
        ostate, mstate, bpose = step(ostate, mstate, bx, bv)
    bt = np.asarray(bpose.t)
    assert np.isfinite(bt).all()
    assert np.linalg.norm(bt[0]) > 0.3, f"composed pose did not move: {bt}"

    # single-device reference: identical dataflow, monolithic map
    o = P.init_state(CFG, received_capacity=r)
    m = init_map(MCFG.map_capacity)
    for e in edge_frames:
        o, pose = P.odometry_step(o, e, CFG)
        m = update_map(m, e.xyz, e.valid, pose, MCFG)
        lx, lv, nh = get_local_map(m, pose.t, MCFG, capacity=r)
        # parity is only exact when neither path truncates the local map
        # (truncation keeps layout-dependent subsets — different by design)
        assert int(nh) <= r, f"test config must not truncate: {int(nh)} > {r}"
        o = o._replace(received_xyz=lx, received_valid=lv)
    st = np.asarray(pose.t)

    err = float(np.linalg.norm(bt[0] - st))
    assert err < 5e-3, f"composed vs single-device pose diverged: {err} m"
    # both sequences in the batch are identical inputs -> identical poses
    np.testing.assert_allclose(bt[0], bt[1], atol=1e-6)

    # the sharded maps' union must carry every cell the mono map has
    total_valid = int(np.asarray(
        jnp.sum(mstate.valid.astype(jnp.int32))) // batch)
    mono_valid = int(np.asarray(jnp.sum(m.valid.astype(jnp.int32))))
    assert total_valid == mono_valid


def test_fully_sharded_image_step_matches_single_device():
    """Round-4 fully-sharded composed step (ring-sliced features, per-shard
    window ownership, shard-local feedback — no O(points) replicated stage)
    vs the single-device fused combined_image_step on the same ring images."""
    from liodom_tpu.mapping.service import combined_image_step, init_combined
    from liodom_tpu.runtime import native

    mesh = make_mesh(data=2, map_=4)
    n_map = mesh.shape["map"]
    mcfg = MCFG.replace(local_map_capacity=(
        MCFG.local_map_capacity // n_map) * n_map)

    world = BoxWorld(seed=0)
    n_frames = 4
    pos, yaws = drive_trajectory(n_frames, speed=0.8, yaw_rate=0.02)
    img_frames = []
    for f in range(n_frames):
        scan = world.render(pos[f], yaw_matrix(yaws[f]), width=256,
                            noise=0.005, seed=f)
        img, counts, _ = native.split_velodyne_np(
            scan.astype(np.float32), CFG.scan_lines, CFG.ring_width,
            CFG.min_range, CFG.max_range)
        img_frames.append((jnp.asarray(img), jnp.asarray(counts)))

    step = C.make_sharded_combined_image_step(mesh, CFG, mcfg)
    ostate, mstate = C.init_combined_image_sharded(CFG, mcfg, mesh)
    batch = mesh.shape["data"]
    for ix, ic in img_frames:
        bx = jnp.broadcast_to(ix, (batch,) + ix.shape)
        bc = jnp.broadcast_to(ic, (batch,) + ic.shape)
        ostate, mstate, bpose = step(ostate, mstate, bx, bc)
    bt = np.asarray(bpose.t)
    assert np.isfinite(bt).all()
    assert np.linalg.norm(bt[0]) > 0.3, f"composed pose did not move: {bt}"

    co, cm = init_combined(CFG, mcfg)
    for ix, ic in img_frames:
        co, cm, pose, _ = combined_image_step(co, cm, ix, ic, CFG, mcfg)
    st = np.asarray(pose.t)

    err = float(np.linalg.norm(bt[0] - st))
    assert err < 5e-3, f"fully-sharded vs single-device diverged: {err} m"
    np.testing.assert_allclose(bt[0], bt[1], atol=1e-6)

    # the sharded window union holds every frame the mono window holds
    # (per-device slot ownership covers each global ring slot exactly once)
    win_pts = int(np.asarray(jnp.sum(
        ostate.win_valid[0].astype(jnp.int32))))
    mono_pts = int(np.asarray(jnp.sum(
        co.window.valid.astype(jnp.int32))))
    assert win_pts == mono_pts
    # sharded map union == mono map cells
    total_valid = int(np.asarray(
        jnp.sum(mstate.valid.astype(jnp.int32))) // batch)
    mono_valid = int(np.asarray(jnp.sum(cm.valid.astype(jnp.int32))))
    assert total_valid == mono_valid
