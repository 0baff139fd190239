"""Checkpoint / resume round-trips (runtime/checkpoint.py).

A resumed run must continue bit-identically: same state pytrees, same
trajectory, same subsequent poses.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from liodom_tpu import LiodomConfig
from liodom_tpu.core.config import MapConfig
from liodom_tpu.core.frame import RawScan
from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
from liodom_tpu.mapping.grid import init_map, update_map
from liodom_tpu.odometry import pipeline as P
from liodom_tpu.runtime import checkpoint as C


def _cfg():
    return LiodomConfig(max_points=32768, ring_width=512, local_map_size=3,
                        scan_lines=16)


def _scans(cfg, n):
    world = BoxWorld(seed=3)
    pos, yaws = drive_trajectory(n, speed=1.0, yaw_rate=0.02)
    return [RawScan.from_points(
        jnp.array(world.render(pos[i], yaw_matrix(yaws[i]), width=400,
                               noise=0.005, seed=i)), cfg.max_points)
        for i in range(n)]


def test_roundtrip_and_identical_resume(tmp_path):
    cfg = _cfg()
    scans = _scans(cfg, 6)

    # run 3 frames, checkpoint
    state = P.init_state(cfg)
    traj = []
    for i in range(3):
        state, pose, _ = P.full_step(state, scans[i].xyz, scans[i].valid, cfg)
        traj.append(np.asarray(pose.matrix())[:3, :4])
    path = C.save(str(tmp_path), 3,
                  C.EngineCheckpoint(state, None, np.stack(traj), 3))
    assert path

    # uninterrupted continuation
    ref_state = state
    ref_poses = []
    for i in range(3, 6):
        ref_state, pose, _ = P.full_step(ref_state, scans[i].xyz,
                                         scans[i].valid, cfg)
        ref_poses.append(np.asarray(pose.matrix()))

    # resume from disk and continue
    step, ckpt = C.restore(str(tmp_path),
                           template={"odom_state": P.init_state(cfg)})
    assert step == 3 and ckpt.frame_index == 3
    assert ckpt.trajectory.shape == (3, 3, 4)
    for a, b in zip(jax.tree.leaves(ckpt.odom_state),
                    jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    res_state = ckpt.odom_state
    for i, j in zip(range(3, 6), range(3)):
        res_state, pose, _ = P.full_step(res_state, scans[i].xyz,
                                         scans[i].valid, cfg)
        np.testing.assert_allclose(np.asarray(pose.matrix()), ref_poses[j],
                                   rtol=0, atol=1e-6)


def test_map_state_roundtrip(tmp_path):
    cfg = _cfg()
    mcfg = MapConfig(map_capacity=4096, local_map_capacity=1024)
    rng = np.random.default_rng(0)
    m = init_map(mcfg.map_capacity)
    pts = jnp.asarray(rng.standard_normal((512, 3)).astype(np.float32) * 20)
    from liodom_tpu.core.pose import Pose
    m = update_map(m, pts, jnp.ones((512,), bool), Pose.identity(), mcfg)

    C.save(str(tmp_path), 7,
           C.EngineCheckpoint(P.init_state(cfg), m,
                              np.zeros((0, 3, 4)), 0))
    _, ckpt = C.restore(str(tmp_path), template={
        "odom_state": P.init_state(cfg), "map_state": init_map(
            mcfg.map_capacity)})
    assert ckpt.map_state is not None
    for a, b in zip(jax.tree.leaves(ckpt.map_state), jax.tree.leaves(m)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_step(tmp_path):
    assert C.latest_step(str(tmp_path)) is None
    cfg = _cfg()
    st = P.init_state(cfg)
    for s in (2, 9, 5):
        C.save(str(tmp_path), s,
               C.EngineCheckpoint(st, None, np.zeros((0, 3, 4)), s))
    assert C.latest_step(str(tmp_path)) == 9
