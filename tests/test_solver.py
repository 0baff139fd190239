import numpy as np
import jax
import jax.numpy as jnp

from liodom_tpu.core import pose as se3
from liodom_tpu.core.pose import Pose
from liodom_tpu.ops import solver as S

from golden import golden_point_to_line_residual

MIN_R, MAX_R = 3.0, 75.0


def rand_pose(rng, rot_scale=0.3, t_scale=1.0):
    q = se3.so3_exp_quat(jnp.array(rng.normal(size=3) * rot_scale,
                                   jnp.float32))
    t = jnp.array(rng.normal(size=3) * t_scale, jnp.float32)
    return Pose(q, t)


def test_residual_matches_golden():
    rng = np.random.default_rng(0)
    p = rand_pose(rng)
    for _ in range(10):
        cp = rng.uniform(-30, 30, 3)
        lpa = cp + rng.normal(size=3) * 0.5
        lpb = cp + rng.normal(size=3) * 0.5
        got = S.point_to_line_residual(
            p, jnp.array(cp, jnp.float32), jnp.array(lpa, jnp.float32),
            jnp.array(lpb, jnp.float32), MIN_R, MAX_R)
        want = golden_point_to_line_residual(
            np.asarray(p.q, np.float64), np.asarray(p.t, np.float64),
            cp, lpa, lpb, MIN_R, MAX_R)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_analytic_jacobian_matches_autodiff():
    rng = np.random.default_rng(1)
    p = rand_pose(rng)
    e = 16
    cp = jnp.array(rng.uniform(-30, 30, (e, 3)), jnp.float32)
    lpa = cp + jnp.array(rng.normal(size=(e, 3)), jnp.float32) * 0.5
    lpb = cp + jnp.array(rng.normal(size=(e, 3)), jnp.float32) * 0.5

    r, J = S.point_to_line_jacobian(p, cp, lpa, lpb, MIN_R, MAX_R)

    def res_of_delta(delta):
        return S.point_to_line_residual(se3.retract(p, delta), cp, lpa, lpb,
                                        MIN_R, MAX_R)

    J_auto = jax.jacfwd(res_of_delta)(jnp.zeros(6, jnp.float32))  # (e,3,6)
    r0 = res_of_delta(jnp.zeros(6, jnp.float32))
    np.testing.assert_allclose(np.asarray(r), np.asarray(r0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto),
                               rtol=2e-3, atol=2e-4)


def _make_line_world(rng, n_lines=40, pts_per_line=2):
    """Synthetic world of 3-D line segments; returns per-line (origin, dir)."""
    origins = rng.uniform(-30, 30, (n_lines, 3))
    dirs = rng.normal(size=(n_lines, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return origins, dirs


def test_lm_recovers_known_transform():
    """Property test (SURVEY.md §4b): points sampled on known lines,
    transformed by a known pose; LM from a perturbed guess must recover it."""
    rng = np.random.default_rng(2)
    origins, dirs = _make_line_world(rng)
    n = len(origins)
    # true pose: the scan was taken at T_true, so edge points in sensor frame
    # are world points moved by T_true^{-1}
    q_true = se3.so3_exp_quat(jnp.array([0.03, -0.02, 0.05], jnp.float32))
    t_true = jnp.array([0.8, -0.4, 0.1], jnp.float32)
    T_true = Pose(q_true, t_true)
    T_inv = se3.inverse(T_true)

    # world points on the lines; sensor-frame edge points
    s = rng.uniform(-2, 2, (n, 4))
    world_pts = origins[:, None, :] + s[..., None] * dirs[:, None, :]
    world_pts = world_pts.reshape(-1, 3).astype(np.float32)
    cp = se3.transform(T_inv, jnp.array(world_pts))
    # line endpoints: two other points on the same lines
    lpa = jnp.array((origins + 0.5 * dirs).repeat(4, 0), jnp.float32)
    lpb = jnp.array((origins - 0.5 * dirs).repeat(4, 0), jnp.float32)
    valid = jnp.ones(cp.shape[0], dtype=bool)

    # start from a perturbed guess
    T0 = se3.retract(T_true, jnp.array([0.02, -0.03, 0.02, 0.3, -0.2, 0.15],
                                       jnp.float32))
    sol = S.lm_solve(T0, cp, lpa, lpb, valid, min_range=MIN_R, max_range=MAX_R,
                     iters=8)
    err = se3.compose(se3.inverse(sol), T_true)
    rot_err = np.linalg.norm(np.asarray(se3.so3_log(err.q)))
    t_err = np.linalg.norm(np.asarray(err.t))
    assert rot_err < 1e-3, rot_err
    assert t_err < 5e-3, t_err


def test_lm_zero_matches_keeps_pose():
    rng = np.random.default_rng(3)
    p0 = rand_pose(rng)
    cp = jnp.array(rng.normal(size=(8, 3)), jnp.float32) * 10
    sol = S.lm_solve(p0, cp, cp + 1.0, cp - 1.0,
                     jnp.zeros(8, dtype=bool), min_range=MIN_R,
                     max_range=MAX_R)
    np.testing.assert_allclose(np.asarray(sol.q), np.asarray(p0.q), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sol.t), np.asarray(p0.t), atol=1e-6)


def test_huber_outlier_robustness():
    """With a Huber loss, a handful of gross outliers must not destroy the
    estimate (plain least squares would)."""
    rng = np.random.default_rng(4)
    origins, dirs = _make_line_world(rng, n_lines=60)
    n = len(origins)
    T_true = Pose(se3.so3_exp_quat(jnp.array([0.01, 0.02, -0.03], jnp.float32)),
                  jnp.array([0.5, 0.2, -0.1], jnp.float32))
    T_inv = se3.inverse(T_true)
    s = rng.uniform(-2, 2, (n, 2))
    world_pts = (origins[:, None, :] + s[..., None] * dirs[:, None, :]).reshape(-1, 3)
    cp = np.asarray(se3.transform(T_inv, jnp.array(world_pts, jnp.float32)))
    lpa = (origins + 0.5 * dirs).repeat(2, 0).astype(np.float32)
    lpb = (origins - 0.5 * dirs).repeat(2, 0).astype(np.float32)
    # corrupt 10% of correspondences with wildly wrong lines
    n_out = len(cp) // 10
    lpa[:n_out] += rng.normal(size=(n_out, 3)) * 20
    lpb[:n_out] += rng.normal(size=(n_out, 3)) * 20
    sol = S.lm_solve(Pose.identity(), jnp.array(cp), jnp.array(lpa),
                     jnp.array(lpb), jnp.ones(len(cp), dtype=bool),
                     min_range=MIN_R, max_range=MAX_R, iters=12)
    err = se3.compose(se3.inverse(sol), T_true)
    assert np.linalg.norm(np.asarray(err.t)) < 0.05
    assert np.linalg.norm(np.asarray(se3.so3_log(err.q))) < 0.01


def test_point_to_point_residual_and_jacobian():
    """Parity factor (factors.hpp:29-61) — reference defines it unused; we
    verify value + analytic Jacobian against finite differences."""
    import numpy as np
    import jax.numpy as jnp
    from liodom_tpu.core import pose as se3
    from liodom_tpu.core.pose import Pose
    from liodom_tpu.ops.solver import (point_to_point_jacobian,
                                       point_to_point_residual)

    rng = np.random.default_rng(0)
    q = rng.standard_normal(4)
    q = jnp.asarray(q / np.linalg.norm(q), jnp.float32)
    t = jnp.asarray(rng.standard_normal(3), jnp.float32)
    pose = Pose(q, t)
    cp = jnp.asarray(rng.standard_normal((16, 3)), jnp.float32)
    mp = jnp.asarray(rng.standard_normal((16, 3)), jnp.float32)

    r0 = point_to_point_residual(pose, cp, mp)
    np.testing.assert_allclose(
        np.asarray(r0),
        np.asarray(se3.quat_rotate(q, cp) + t - mp), atol=1e-6)

    r, J = point_to_point_jacobian(pose, cp, mp)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r0), atol=1e-6)
    eps = 1e-4
    for d in range(6):
        delta = np.zeros(6, np.float32)
        delta[d] = eps
        p_plus = se3.retract(pose, jnp.asarray(delta))
        p_minus = se3.retract(pose, jnp.asarray(-delta))
        fd = (np.asarray(point_to_point_residual(p_plus, cp, mp))
              - np.asarray(point_to_point_residual(p_minus, cp, mp))
              ) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[..., d]), fd, atol=5e-3)
