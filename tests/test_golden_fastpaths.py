"""The oracle's vectorised fast paths vs its sequential transcriptions.

golden.py's frame loop was vectorised in round 4 (per-edge argsort ->
partitioned stable top-k; per-correspondence residual/Jacobian -> batched
float64) so the 6-DoF 20-frame gate fits the suite.  The sequential
per-element transcriptions remain the implementation of record; these tests
pin the fast paths to them so the oracle's trustworthiness does not rest on
the rewrite.
"""

import numpy as np

from golden import (GoldenPose, _golden_residual_jacobian,
                    _golden_residuals_jacobians, _golden_stable_topk,
                    golden_quat_rotate, golden_so3_exp)


def test_stable_topk_equals_stable_argsort():
    rng = np.random.default_rng(0)
    for trial in range(50):
        m = rng.integers(10, 500)
        d2 = rng.random(m)
        # engineered ties, incl. exactly at the k-boundary
        if trial % 2:
            d2[rng.integers(0, m, 5)] = d2[rng.integers(0, m)]
        k = int(rng.integers(1, min(8, m)))
        np.testing.assert_array_equal(
            _golden_stable_topk(d2, k),
            np.argsort(d2, kind="stable")[:k])


def test_batched_residual_jacobian_matches_sequential():
    rng = np.random.default_rng(1)
    pose = GoldenPose(golden_so3_exp(rng.normal(scale=0.2, size=3)),
                      rng.normal(scale=5.0, size=3))
    n = 64
    cps = rng.uniform(-20, 20, (n, 3))
    lpas = rng.uniform(-20, 20, (n, 3))
    lpbs = lpas + rng.normal(scale=0.5, size=(n, 3))
    rb, jb = _golden_residuals_jacobians(pose, cps, lpas, lpbs, 3.0, 75.0)
    for i in range(n):
        r, j = _golden_residual_jacobian(pose, cps[i], lpas[i], lpbs[i],
                                         3.0, 75.0)
        np.testing.assert_allclose(rb[i], r, rtol=0, atol=1e-12)
        np.testing.assert_allclose(jb[i], j, rtol=0, atol=1e-12)


def test_vectorised_transform_matches_per_point():
    rng = np.random.default_rng(2)
    pose = GoldenPose(golden_so3_exp(rng.normal(scale=0.3, size=3)),
                      rng.normal(scale=2.0, size=3))
    pts = rng.uniform(-30, 30, (100, 3))
    fast = pose.transform(pts)
    slow = np.stack([golden_quat_rotate(pose.q, p) for p in pts]) + pose.t
    np.testing.assert_array_equal(fast, slow)
