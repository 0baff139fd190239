import numpy as np
import jax.numpy as jnp

from liodom_tpu.core import pose as se3


def rand_quat(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    return q


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    q = jnp.array(rand_quat(rng))
    v = jnp.array(rng.normal(size=(7, 3)))
    R = se3.quat_to_matrix(q)
    got = se3.quat_rotate(q, v)
    want = v @ np.asarray(R).T
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_matrix_quat_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(20):
        q = rand_quat(rng)
        R = se3.quat_to_matrix(jnp.array(q))
        q2 = np.asarray(se3.matrix_to_quat(R))
        if q2[0] < 0:
            q2 = -q2
        np.testing.assert_allclose(q, q2, atol=1e-6)


def test_compose_inverse():
    rng = np.random.default_rng(2)
    a = se3.Pose(jnp.array(rand_quat(rng)), jnp.array(rng.normal(size=3)))
    b = se3.Pose(jnp.array(rand_quat(rng)), jnp.array(rng.normal(size=3)))
    ab = se3.compose(a, b)
    M = np.asarray(a.matrix()) @ np.asarray(b.matrix())
    np.testing.assert_allclose(np.asarray(ab.matrix()), M, atol=1e-6)
    ai = se3.inverse(a)
    ident = se3.compose(a, ai)
    np.testing.assert_allclose(np.asarray(ident.matrix()), np.eye(4), atol=1e-6)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(3)
    # keep ||phi|| < pi: so3_log returns the short-arc representative
    dirs = rng.normal(size=(10, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    phi = dirs * rng.uniform(0.01, 3.1, size=(10, 1))
    q = se3.so3_exp_quat(jnp.array(phi))
    phi2 = se3.so3_log(q)
    np.testing.assert_allclose(phi, np.asarray(phi2), atol=1e-5)
    # tiny angles
    phi = rng.normal(size=(10, 3)) * 1e-9
    q = se3.so3_exp_quat(jnp.array(phi))
    assert np.all(np.isfinite(np.asarray(q)))
    np.testing.assert_allclose(np.asarray(se3.so3_log(q)), phi, atol=1e-12)


def test_retract_is_left_multiplicative():
    rng = np.random.default_rng(4)
    p = se3.Pose(jnp.array(rand_quat(rng)), jnp.array(rng.normal(size=3)))
    delta = jnp.array(rng.normal(size=6) * 0.1)
    p2 = se3.retract(p, delta)
    dq = se3.so3_exp_quat(delta[:3])
    want_q = se3.quat_mul(dq, p.q)
    np.testing.assert_allclose(np.asarray(p2.q), np.asarray(want_q), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2.t), np.asarray(p.t + delta[3:]),
                               atol=1e-6)


def test_rpy_roundtrip():
    rng = np.random.default_rng(5)
    rpy = np.stack([rng.uniform(-3, 3, 10), rng.uniform(-1.4, 1.4, 10),
                    rng.uniform(-3, 3, 10)], axis=-1)
    q = se3.quat_from_rpy(jnp.array(rpy))
    rpy2 = np.asarray(se3.rpy_from_quat(q))
    np.testing.assert_allclose(rpy, rpy2, atol=1e-5)


def test_kitti_row():
    p = se3.Pose.identity()
    row = np.asarray(se3.kitti_row(p))
    np.testing.assert_allclose(
        row, [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], atol=0)
