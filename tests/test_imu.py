"""IMU side-path tests (laser_odometry.cc:152-183).

The optional IMU override replaces the predicted pose's roll/pitch (in the
base frame) with the IMU's, keeping the predicted yaw, then re-expresses in
the laser frame.
"""

import numpy as np
import jax.numpy as jnp

from liodom_tpu import LiodomConfig
from liodom_tpu.core import pose as se3
from liodom_tpu.core.pose import Pose
from liodom_tpu.odometry import pipeline as P


def _q_rpy(r, p, y):
    return se3.quat_from_rpy(jnp.array([r, p, y], jnp.float32))


def test_override_takes_imu_roll_pitch_keeps_yaw():
    pred = Pose(_q_rpy(0.10, -0.05, 0.70), jnp.array([1.0, 2.0, 0.3]))
    imu = _q_rpy(0.02, 0.04, 9.99)  # IMU yaw must be ignored
    out = P._imu_override(pred, imu, Pose.identity())
    rpy = np.asarray(se3.rpy_from_quat(out.q))
    np.testing.assert_allclose(rpy[0], 0.02, atol=1e-6)
    np.testing.assert_allclose(rpy[1], 0.04, atol=1e-6)
    np.testing.assert_allclose(rpy[2], 0.70, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.t), [1.0, 2.0, 0.3], atol=1e-7)


def test_override_respects_base_laser_transform():
    """With a laser->base transform, the roll/pitch replacement happens in
    the BASE frame (laser_odometry.cc:160-178)."""
    tlb = Pose(_q_rpy(0.0, 0.0, np.pi / 2), jnp.zeros(3))  # laser->base: 90° yaw
    pred = Pose(_q_rpy(0.1, 0.0, 0.3), jnp.zeros(3))
    imu = _q_rpy(0.0, 0.0, 0.0)
    out = P._imu_override(pred, imu, tlb)
    # round-trip: composing out with tlb must have zero roll/pitch
    out_base = se3.compose(out, tlb)
    rpy_base = np.asarray(se3.rpy_from_quat(out_base.q))
    np.testing.assert_allclose(rpy_base[:2], 0.0, atol=1e-6)


def test_identity_imu_zero_attitude_is_noop():
    """When the prediction has no roll/pitch and the IMU reports none, the
    override must not change the pose."""
    pred = Pose(_q_rpy(0.0, 0.0, 0.45), jnp.array([0.5, -0.2, 0.0]))
    out = P._imu_override(pred, jnp.array([1.0, 0, 0, 0], jnp.float32),
                          Pose.identity())
    np.testing.assert_allclose(np.asarray(out.q), np.asarray(pred.q),
                               atol=1e-6)


def test_set_imu_threads_through_step():
    """use_imu=True consumes state.imu_ori inside odometry_step without
    breaking the solve (smoke: finite pose out)."""
    cfg = LiodomConfig(max_points=8192, ring_width=256, scan_lines=16,
                       local_map_size=2, use_imu=True)
    state = P.init_state(cfg)
    state = P.set_imu(state, jnp.array([1.0, 0, 0, 0]))
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-20, 20, (cfg.max_points, 3))
                      .astype(np.float32))
    valid = jnp.ones((cfg.max_points,), bool)
    state, pose, _ = P.full_step(state, xyz, valid, cfg)
    assert np.all(np.isfinite(np.asarray(pose.t)))
    assert np.all(np.isfinite(np.asarray(pose.q)))


def test_set_received_map():
    cfg = LiodomConfig(max_points=8192, ring_width=256, scan_lines=16,
                       local_map_size=2, mapping=True)
    state = P.init_state(cfg, received_capacity=128)
    xyz = jnp.ones((128, 3))
    valid = jnp.zeros((128,), bool).at[:10].set(True)
    state = P.set_received_map(state, xyz, valid)
    assert int(state.received_valid.sum()) == 10


# ----------------------------------------------------- end-to-end IMU + TF

def _run_6dof(frames=12, use_imu=False, imu_noise=0.001, scan_noise=0.03,
              t_base_laser=None, seed=5):
    """Drive the full pipeline over the rotation-rich 6-DoF course and
    return (rp_rmse_rad, trajectory poses).  High scan noise makes
    roll/pitch drift without the IMU; the simulated IMU is ground truth +
    ``imu_noise``."""
    from liodom_tpu.core.frame import RawScan
    from liodom_tpu.core.synth import (BoxWorld, drive_trajectory_6dof,
                                       quat_from_matrix_np, rpy_matrix)

    cfg = LiodomConfig(local_map_size=4, use_imu=use_imu, max_points=32768)
    world = BoxWorld(seed=seed)
    pos, rots, quats = drive_trajectory_6dof(frames, speed=1.0,
                                             yaw_rate=0.03)
    tlb = t_base_laser if t_base_laser is not None else Pose.identity()
    rng = np.random.default_rng(seed)
    state = P.init_state(cfg)
    rp_errs = []
    for i in range(frames):
        scan = world.render(pos[i], rots[i], width=400, noise=scan_noise,
                            seed=300 + i)
        raw = RawScan.from_points(jnp.asarray(scan), cfg.max_points)
        if use_imu:
            gt_laser = Pose(jnp.asarray(quats[i], jnp.float32),
                            jnp.asarray(pos[i], jnp.float32))
            q_base = se3.compose(gt_laser, tlb).q
            dq = quat_from_matrix_np(rpy_matrix(
                *(rng.normal(scale=imu_noise, size=3))))
            state = P.set_imu(state, se3.quat_mul(jnp.asarray(
                dq, jnp.float32), q_base))
        state, pose, _ = P.full_step(state, raw.xyz, raw.valid, cfg,
                                     t_laser_base=tlb)
        est_rpy = np.asarray(se3.rpy_from_quat(pose.q))
        gt_rpy = np.asarray(se3.rpy_from_quat(jnp.asarray(quats[i])))
        rp_errs.append(np.linalg.norm((est_rpy - gt_rpy)[:2]))
    return float(np.sqrt(np.mean(np.square(rp_errs))))


def test_imu_improves_roll_pitch_6dof():
    """The IMU override must beat IMU-less roll/pitch tracking on the
    rotation-rich noisy course (laser_odometry.cc:152-183 exercised
    end-to-end, not just as dead engine code)."""
    rp_no_imu = _run_6dof(use_imu=False)
    rp_imu = _run_6dof(use_imu=True)
    # with the override, roll/pitch is pinned to the (slightly noisy) IMU
    assert rp_imu < rp_no_imu, (rp_imu, rp_no_imu)
    assert rp_imu < 0.01   # ~0.57 deg: within a few x of the IMU noise


def test_imu_with_base_laser_tf():
    """Non-identity base<->laser TF through the IMU re-expression
    (getBaseToLaserTf parity, laser_odometry.cc:368-393): roll/pitch must
    still land, not double-apply the extrinsic."""
    from liodom_tpu.core.synth import quat_from_matrix_np, rpy_matrix

    q_bl = quat_from_matrix_np(rpy_matrix(0.05, -0.03, 0.4))
    t_base_laser = Pose(jnp.asarray(q_bl, jnp.float32),
                        jnp.asarray([0.3, -0.1, 0.8], jnp.float32))
    tlb = se3.inverse(t_base_laser)
    rp = _run_6dof(use_imu=True, t_base_laser=tlb)
    assert rp < 0.01
