"""Odometry<->mapping feedback loop (adaptive local mapping) tests."""

import numpy as np
import jax.numpy as jnp

from liodom_tpu.core.config import LiodomConfig, MapConfig
from liodom_tpu.core.frame import RawScan
from liodom_tpu.core.pose import Pose
from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
from liodom_tpu.mapping import (MappingService, combined_step, init_combined,
                                count_cells)

CFG = LiodomConfig(max_points=16384, ring_width=256, local_map_size=3,
                   mapping=True)
MCFG = MapConfig(voxel_xysize=20.0, voxel_zsize=25.0, resolution=0.4,
                 map_capacity=16384, local_map_capacity=4096)


def make_scans(n, width=256, seed=0):
    world = BoxWorld(seed=seed, extent=40.0, n_poles=30)
    pos, yaws = drive_trajectory(n, speed=0.8, yaw_rate=0.01)
    scans = []
    for i in range(n):
        s = world.render(pos[i], yaw_matrix(yaws[i]), width=width,
                         noise=0.0, seed=seed + i)
        scans.append(RawScan.from_points(jnp.array(s), CFG.max_points))
    return scans, pos


def test_combined_step_tracks_and_builds_map():
    n = 6
    scans, gt = make_scans(n)
    odom, mstate = init_combined(CFG, MCFG)
    errs = []
    for i in range(n):
        odom, mstate, pose, n_edges = combined_step(
            odom, mstate, scans[i].xyz, scans[i].valid, CFG, MCFG)
        errs.append(np.linalg.norm(np.asarray(pose.t) - gt[i]))
    assert int(n_edges) > 100
    # map built and feedback populated
    assert int(jnp.sum(mstate.valid)) > 500
    assert count_cells(mstate) >= 1
    assert int(jnp.sum(odom.received_valid)) > 100
    # pose error stays small over the little trajectory
    assert float(np.max(errs)) < 0.5


def test_combined_matches_reference_dataflow_latency():
    """Frame k's matching map must NOT include frame k's own local-map
    feedback (one-message latency like the reference's topic round-trip):
    after the first step the received map reflects exactly frame 0's edges."""
    scans, _ = make_scans(2)
    odom, mstate = init_combined(CFG, MCFG)
    odom1, mstate1, pose1, n1 = combined_step(
        odom, mstate, scans[0].xyz, scans[0].valid, CFG, MCFG)
    # feedback after frame 0 comes from a map holding only frame 0's edges
    assert int(jnp.sum(odom.received_valid)) == 0            # before
    got = int(jnp.sum(odom1.received_valid))
    assert 0 < got <= int(jnp.sum(mstate1.valid))


def test_mapping_service_host_path():
    scans, gt = make_scans(3)
    svc = MappingService(MCFG)
    from liodom_tpu.ops.features import extract_features
    for i in range(3):
        edges = extract_features(scans[i], CFG)
        pose = Pose(jnp.array([1.0, 0, 0, 0], jnp.float32),
                    jnp.asarray(gt[i], jnp.float32))
        svc.update(edges.xyz, edges.valid, pose, now=float(i))
    xyz, valid = svc.full_map(now=3.0)
    assert valid.sum() > 500
    lx, lv = svc.local_map(gt[2])
    assert int(jnp.sum(lv)) > 0
    # latched republish: stale after 5 s
    assert svc.maybe_republish(now=100.0) is not None
    assert svc.maybe_republish(now=101.0) is None


def test_local_map_cadence_reuses_stale_map():
    """local_map_every=N: non-refresh frames must keep the previously
    received local map verbatim (the reference's odometer consumes the
    LAST received map, laser_odometry.cc:276-279), and refresh frames must
    match an every-frame run's extraction."""
    cfg = LiodomConfig(local_map_size=2, mapping=True, max_points=32768,
                       ring_width=512)
    mcfg = MapConfig(map_capacity=8192, local_map_capacity=1024)
    world = BoxWorld(seed=2)
    pos, yaws = drive_trajectory(5, speed=0.8, yaw_rate=0.02)
    scans = [RawScan.from_points(
        jnp.asarray(world.render(pos[i], yaw_matrix(yaws[i]), width=300,
                                 noise=0.005, seed=i)), cfg.max_points)
        for i in range(5)]

    o1, m1 = init_combined(cfg, mcfg)     # every-frame refresh
    o2, m2 = init_combined(cfg, mcfg)     # every-2nd-frame refresh
    received = []
    for i, raw in enumerate(scans):
        o1, m1, p1, _ = combined_step(o1, m1, raw.xyz, raw.valid, cfg, mcfg)
        o2, m2, p2, _ = combined_step(o2, m2, raw.xyz, raw.valid, cfg, mcfg,
                                      step=i, local_map_every=2)
        received.append((np.asarray(o2.received_xyz).copy(),
                         np.asarray(o2.received_valid).copy()))
        if i == 0:
            # first frame refreshes in both runs from the same map state
            np.testing.assert_allclose(np.asarray(o1.received_xyz),
                                       received[0][0], atol=1e-5)
        elif i % 2 == 1:
            # stale frame: received map unchanged from the previous frame
            np.testing.assert_array_equal(received[i][0], received[i - 1][0])
            np.testing.assert_array_equal(received[i][1], received[i - 1][1])
        else:
            # refresh frame: the received map actually changed
            assert not np.array_equal(received[i][0], received[i - 1][0])
        # a few-frames-stale map must not derail tracking (the reference's
        # normal operating mode): both runs stay close
        np.testing.assert_allclose(np.asarray(p2.t), np.asarray(p1.t),
                                   atol=0.05)


def test_local_map_capacity_invariance():
    """Right-sizing the received-map buffer is LOSSLESS while the
    neighbourhood fits: the pose trajectory must be bit-equal across
    local_map_capacity values when n_hits never exceeds the smaller one
    (the property bench.py's 16384-row sizing rests on;
    scripts/combined_capacity_sweep.py measured it on hardware)."""
    from liodom_tpu.mapping.grid import get_local_map

    n = 6
    scans, _ = make_scans(n)
    traj = {}
    for cap in (1024, 4096):
        mcfg = MCFG.replace(local_map_capacity=cap)
        odom, mstate = init_combined(CFG, mcfg)
        poses = []
        for i in range(n):
            odom, mstate, pose, _ = combined_step(
                odom, mstate, scans[i].xyz, scans[i].valid, CFG, mcfg)
            poses.append(np.asarray(pose.t))
            # premise guard at EVERY frame (not just the last): a mid-run
            # overflow would diverge the trajectories and fail the
            # bit-equality below with a misleading message
            _, _, n_hits = get_local_map(mstate, pose.t, mcfg, capacity=cap)
            assert int(n_hits) <= 1024, \
                f"course outgrew the small buffer at frame {i}; " \
                "shrink the scene so the invariance premise holds"
        traj[cap] = np.concatenate(poses)
    np.testing.assert_array_equal(traj[1024], traj[4096])
