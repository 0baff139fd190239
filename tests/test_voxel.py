import numpy as np
import jax.numpy as jnp

from liodom_tpu.ops.voxel import voxel_downsample
from golden import golden_voxel_centroids


def test_voxel_matches_pcl_semantics():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
    out, mask = voxel_downsample(jnp.array(pts), jnp.ones(500, bool), 0.4)
    got = np.asarray(out)[np.asarray(mask)]
    want = golden_voxel_centroids(pts.astype(np.float64), 0.4)
    assert len(got) == len(want)
    # compare as sorted sets of rows
    gi = np.lexsort(got.T)
    wi = np.lexsort(want.T)
    np.testing.assert_allclose(got[gi], want[wi], atol=1e-3)


def test_voxel_merges_dense_cluster():
    pts = np.zeros((100, 3), np.float32) + 0.05  # all in one leaf
    out, mask = voxel_downsample(jnp.array(pts), jnp.ones(100, bool), 0.4)
    assert int(np.asarray(mask).sum()) == 1
    np.testing.assert_allclose(np.asarray(out)[0], [0.05, 0.05, 0.05],
                               atol=1e-5)


def test_voxel_respects_mask():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-5, 5, (64, 3)).astype(np.float32)
    valid = np.zeros(64, bool)
    valid[:10] = True
    out, mask = voxel_downsample(jnp.array(pts), jnp.array(valid), 0.4)
    want = golden_voxel_centroids(pts[:10].astype(np.float64), 0.4)
    assert int(np.asarray(mask).sum()) == len(want)


def test_voxel_all_invalid():
    out, mask = voxel_downsample(jnp.zeros((16, 3)), jnp.zeros(16, bool), 0.4)
    assert not np.asarray(mask).any()
    assert np.isfinite(np.asarray(out)).all()


def test_voxel_negative_coords():
    # leaf boundary behaviour for negative coordinates must follow floor()
    pts = np.array([[-0.1, -0.1, -0.1], [-0.3, -0.3, -0.3],  # same leaf (-1)
                    [0.1, 0.1, 0.1]], np.float32)            # leaf 0
    out, mask = voxel_downsample(jnp.array(pts), jnp.ones(3, bool), 0.4)
    got = np.asarray(out)[np.asarray(mask)]
    assert len(got) == 2
    np.testing.assert_allclose(sorted(got[:, 0]), [-0.2, 0.1], atol=1e-5)
