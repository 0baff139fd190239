"""Publisher / tracer / launch-mesh unit tests."""

import numpy as np

from liodom_tpu.runtime.publisher import OdomPublisher, _rpy, _quat_to_matrix
from liodom_tpu.runtime.stats import Stats
from liodom_tpu.runtime.tracer import StageTimer, DeviceTrace, annotate


def _pose(yaw=0.0, t=(0, 0, 0)):
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4)
    T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    T[:3, 3] = t
    return T


def test_twist_finite_difference():
    pub = OdomPublisher(publish_tf=True)
    pub.publish(_pose(t=(0, 0, 0)), stamp=0.0)
    odom, twist, tf = pub.publish(_pose(yaw=0.1, t=(1.0, 0, 0)), stamp=0.5)
    # 1 m in 0.5 s along x, 0.1 rad yaw in 0.5 s
    np.testing.assert_allclose(twist.linear, [2.0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(twist.angular[2], 0.2, atol=1e-9)
    assert tf is not None and tf.frame_id == "odom"
    np.testing.assert_allclose(odom.pose, _pose(yaw=0.1, t=(1.0, 0, 0)))


def test_base_frame_reexpression():
    """Pose is re-expressed laser -> base via the static transform
    (laser_odometry.cc:402)."""
    t_bl = _pose(yaw=np.pi / 2, t=(0.5, 0, 0.2))   # base <- laser
    pub = OdomPublisher(t_base_laser=t_bl, publish_tf=False)
    pose_laser = _pose(t=(2.0, 0, 0))
    odom, _, tf = pub.publish(pose_laser, stamp=0.0)
    expected = t_bl @ pose_laser @ np.linalg.inv(t_bl)
    np.testing.assert_allclose(odom.pose, expected, atol=1e-12)
    assert tf is None


def test_rpy_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        R = _quat_to_matrix(q)
        r, p, y = _rpy(R)
        cr, sr = np.cos(r), np.sin(r)
        cp, sp = np.cos(p), np.sin(p)
        cy, sy = np.cos(y), np.sin(y)
        Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
        Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
        Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
        np.testing.assert_allclose(Rz @ Ry @ Rx, R, atol=1e-9)


def test_stage_timer_routes_to_stats():
    stats = Stats()
    timer = StageTimer(stats)
    with timer.stage("feature_extraction"):
        pass
    with timer.stage("laser_odometry"):
        pass
    with timer.stage("unknown"):
        pass
    assert len(stats.feat_ext_times) == 1
    assert len(stats.laser_odom_times) == 1
    assert "unknown" in timer.last_ms


def test_device_trace_graceful(tmp_path):
    with DeviceTrace(str(tmp_path)):
        with annotate("section"):
            pass


def test_make_global_mesh():
    from liodom_tpu.parallel.launch import make_global_mesh
    import jax
    n = len(jax.devices())
    mesh = make_global_mesh()
    assert mesh.shape["data"] * mesh.shape["map"] == n
    mesh2 = make_global_mesh(data=1, map_=n)
    assert mesh2.shape["map"] == n
