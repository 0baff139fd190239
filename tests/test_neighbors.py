import numpy as np
import jax.numpy as jnp

from liodom_tpu.ops import neighbors as N


def test_knn_matches_numpy_bruteforce():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(37, 3)).astype(np.float32) * 5
    r = rng.normal(size=(513, 3)).astype(np.float32) * 5
    qm = np.ones(37, bool)
    qm[5] = False
    rm = np.ones(513, bool)
    rm[100:110] = False
    d, i = N.knn(jnp.array(q), jnp.array(qm), jnp.array(r), jnp.array(rm),
                 k=5, chunk=128)
    d, i = np.asarray(d), np.asarray(i)
    full = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    full[:, ~rm] = np.inf
    for e in range(37):
        if not qm[e]:
            assert np.all(d[e] >= 1e29)
            continue
        want = np.sort(full[e])[:5]
        np.testing.assert_allclose(d[e], want, rtol=1e-4, atol=1e-4)
        # index set agrees (ties measure-zero with random floats)
        assert set(i[e]) == set(np.argsort(full[e])[:5])
        # ascending order
        assert np.all(np.diff(d[e]) >= -1e-6)


def test_knn_all_ref_invalid():
    q = jnp.zeros((4, 3))
    r = jnp.zeros((16, 3))
    d, i = N.knn(q, jnp.ones(4, bool), r, jnp.zeros(16, bool), k=5, chunk=8)
    assert np.all(np.asarray(d) >= 1e29)
    assert np.all(np.asarray(i) >= 0) and np.all(np.asarray(i) < 16)


def test_sym3_eigenvalues():
    rng = np.random.default_rng(1)
    B = rng.normal(size=(50, 3, 3))
    A = B @ np.transpose(B, (0, 2, 1))
    got = np.asarray(N.sym3_eigenvalues(jnp.array(A)))
    want = np.linalg.eigvalsh(A)
    # inputs are f32 on device; tolerances sized for f32 Cardano
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    # degenerate: multiples of identity and diagonal
    A2 = np.stack([np.eye(3) * 2.5, np.diag([1.0, 1.0, 5.0]), np.zeros((3, 3))])
    got2 = np.asarray(N.sym3_eigenvalues(jnp.array(A2)))
    want2 = np.linalg.eigvalsh(A2)
    # repeated roots cost sqrt(eps_f32) ~ 3e-4 of precision — inherent to
    # any eigenvalue method, harmless for the 3x ratio gate
    np.testing.assert_allclose(got2, want2, rtol=1e-3, atol=1e-3)


def test_line_correspondences_accepts_lines_rejects_blobs():
    rng = np.random.default_rng(2)
    # map: one dense line along x at y=z=0 and one isotropic blob at (0, 10, 0)
    line = np.stack([np.linspace(-5, 5, 200), np.zeros(200), np.zeros(200)], -1)
    line += rng.normal(size=line.shape) * 0.01
    # an isotropic 6-point octahedron: its covariance has equal eigenvalues,
    # so the lambda_max > 3*lambda_mid line test must reject it
    blob = np.array([[0.3, 0, 0], [-0.3, 0, 0], [0, 0.3, 0], [0, -0.3, 0],
                     [0, 0, 0.3], [0, 0, -0.3]]) + np.array([0, 10.0, 0])
    mp = np.concatenate([line, blob]).astype(np.float32)
    edges = np.array([[0.1, 0.05, 0.0],     # near the line -> accept
                      [0.0, 10.0, 0.1],     # in the blob   -> eig reject
                      [50.0, 50.0, 50.0]],  # far away      -> dist reject
                     np.float32)
    corr = N.line_correspondences(
        jnp.array(edges), jnp.ones(3, dtype=bool), jnp.array(mp),
        jnp.ones(len(mp), dtype=bool), chunk=64)
    v = np.asarray(corr.valid)
    assert v.tolist() == [True, False, False]
    # endpoints are the two nearest line points
    lpa, lpb = np.asarray(corr.lpa[0]), np.asarray(corr.lpb[0])
    d_all = ((mp - edges[0]) ** 2).sum(-1)
    near2 = mp[np.argsort(d_all)[:2]]
    np.testing.assert_allclose(np.sort(lpa), np.sort(near2[0]), atol=1e-5)
    np.testing.assert_allclose(np.sort(lpb), np.sort(near2[1]), atol=1e-5)
