"""End-to-end odometry pipeline tests on synthetic scenes with exact ground
truth (SURVEY.md §4b/c — the reference ships no tests; this is our design)."""

import numpy as np
import jax.numpy as jnp

from liodom_tpu.core import pose as se3
from liodom_tpu.core.config import LiodomConfig
from liodom_tpu.core.frame import RawScan
from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
from liodom_tpu.odometry import pipeline as P

# small config so CPU tests stay fast
CFG = LiodomConfig(max_points=65536, ring_width=1024, local_map_size=5)


def _run_sequence(cfg, n_frames, speed=0.8, yaw_rate=0.01, width=900,
                  noise=0.01, seed=0):
    world = BoxWorld(seed=seed)
    pos, yaws = drive_trajectory(n_frames, speed=speed, yaw_rate=yaw_rate)
    state = P.init_state(cfg)
    est, gt = [], []
    for i in range(n_frames):
        R = yaw_matrix(yaws[i])
        scan = world.render(pos[i], R, width=width, noise=noise, seed=100 + i)
        raw = RawScan.from_points(jnp.array(scan), cfg.max_points)
        state, pose, n_edges = P.full_step(state, raw.xyz, raw.valid, cfg)
        est.append((np.asarray(pose.q), np.asarray(pose.t)))
        gt.append((R, pos[i]))
    return est, gt


def _ate(est, gt):
    errs = []
    for (q, t), (R, p) in zip(est, gt):
        errs.append(np.linalg.norm(t - p))
    return float(np.sqrt(np.mean(np.square(errs))))


def test_first_frame_is_identity():
    cfg = CFG
    world = BoxWorld(seed=1)
    scan = world.render(np.zeros(3), np.eye(3), width=900, seed=3)
    state = P.init_state(cfg)
    raw = RawScan.from_points(jnp.array(scan), cfg.max_points)
    state, pose, n_edges = P.full_step(state, raw.xyz, raw.valid, cfg)
    assert int(n_edges) > 50
    np.testing.assert_allclose(np.asarray(pose.t), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pose.q), [1, 0, 0, 0], atol=1e-6)
    assert int(state.window.nframes) == 1


def test_static_scene_stays_put():
    cfg = CFG
    world = BoxWorld(seed=2)
    state = P.init_state(cfg)
    for i in range(4):
        scan = world.render(np.zeros(3), np.eye(3), width=900, seed=10 + i)
        raw = RawScan.from_points(jnp.array(scan), cfg.max_points)
        state, pose, _ = P.full_step(state, raw.xyz, raw.valid, cfg)
    assert np.linalg.norm(np.asarray(pose.t)) < 0.02
    assert np.linalg.norm(np.asarray(se3.so3_log(pose.q))) < 0.005


def test_sequence_tracks_ground_truth():
    # clean sensor: tracking must be cm-accurate
    est, gt = _run_sequence(CFG, n_frames=10, speed=0.8, yaw_rate=0.015,
                            noise=0.0)
    ate = _ate(est, gt)
    assert ate < 0.05, f"ATE too high: {ate}"
    # final yaw tracks
    qf, tf = est[-1]
    Rf, pf = gt[-1]
    yaw_est = se3.rpy_from_quat(jnp.array(qf))[2]
    yaw_gt = np.arctan2(Rf[1, 0], Rf[0, 0])
    assert abs(float(yaw_est) - yaw_gt) < 0.02


def test_sequence_noisy_drift_bounded():
    # 1 cm sensor noise on a sparse synthetic scene produces noise-edges that
    # bias odometry (an algorithm property, not an implementation one); drift
    # must stay bounded
    est, gt = _run_sequence(CFG, n_frames=10, speed=0.8, yaw_rate=0.015,
                            noise=0.01)
    assert _ate(est, gt) < 1.5


def test_window_eviction():
    cfg = CFG.replace(local_map_size=3)
    est, gt = _run_sequence(cfg, n_frames=6, speed=0.5)
    # after 6 frames only 3 in window
    # (re-run to grab final state)
    world = BoxWorld(seed=0)
    state = P.init_state(cfg)
    for i in range(6):
        scan = world.render(np.zeros(3), np.eye(3), width=900, seed=i)
        raw = RawScan.from_points(jnp.array(scan), cfg.max_points)
        state, _, _ = P.full_step(state, raw.xyz, raw.valid, cfg)
    assert int(state.window.nframes) == 3
    assert int(state.window.next_slot) == 0  # 6 % 3


def test_filter_local_map_path():
    cfg = CFG.replace(filter_local_map=True, local_map_size=3)
    est, gt = _run_sequence(cfg, n_frames=6, speed=0.5, noise=0.0)
    assert _ate(est, gt) < 0.1


def test_empty_scan_holds_prediction():
    """All-padding scan -> 0 edges, pose = constant-velocity prediction,
    everything finite."""
    import jax.numpy as jnp
    import numpy as np
    from liodom_tpu import LiodomConfig
    from liodom_tpu.odometry import pipeline as P

    cfg = LiodomConfig(max_points=4096, ring_width=128, scan_lines=16,
                       local_map_size=2)
    state = P.init_state(cfg)
    xyz = jnp.zeros((cfg.max_points, 3))
    valid = jnp.zeros((cfg.max_points,), bool)
    state, pose, n_edges = P.full_step(state, xyz, valid, cfg)
    assert int(n_edges) == 0
    np.testing.assert_allclose(np.asarray(pose.t), 0.0, atol=1e-9)
    assert np.isfinite(np.asarray(pose.q)).all()


def test_nan_points_never_leak():
    """NaN-poisoned input points must not reach edges or the pose."""
    import jax.numpy as jnp
    import numpy as np
    from liodom_tpu import LiodomConfig
    from liodom_tpu.core.frame import RawScan
    from liodom_tpu.core.synth import BoxWorld
    from liodom_tpu.odometry import pipeline as P

    cfg = LiodomConfig(max_points=65536, ring_width=512, scan_lines=64,
                       local_map_size=2)
    world = BoxWorld(seed=5)
    pts = world.render(np.zeros(3), np.eye(3), width=500, noise=0.01,
                       seed=5)
    pts[::7] = np.nan
    raw = RawScan.from_points(jnp.asarray(pts), cfg.max_points)
    state = P.init_state(cfg)
    for _ in range(2):
        state, pose, n_edges = P.full_step(state, raw.xyz, raw.valid, cfg)
    assert int(n_edges) > 0
    assert np.isfinite(np.asarray(pose.t)).all()
    assert np.isfinite(np.asarray(pose.q)).all()
    w = np.asarray(state.window.xyz)
    assert np.isfinite(w[np.asarray(state.window.valid)]).all()


def test_out_of_range_scan():
    """Points entirely outside [min_range, max_range] -> 0 edges."""
    import jax.numpy as jnp
    import numpy as np
    from liodom_tpu import LiodomConfig
    from liodom_tpu.core.frame import RawScan
    from liodom_tpu.odometry import pipeline as P

    cfg = LiodomConfig(max_points=4096, ring_width=128, scan_lines=16,
                       local_map_size=2)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.0, 1.0, (2000, 3)).astype(np.float32)  # < 3 m XY
    raw = RawScan.from_points(jnp.asarray(pts), cfg.max_points)
    state = P.init_state(cfg)
    state, pose, n_edges = P.full_step(state, raw.xyz, raw.valid, cfg)
    assert int(n_edges) == 0
    assert np.isfinite(np.asarray(pose.t)).all()
