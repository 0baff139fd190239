"""Host-side ring split (native C++ / numpy) vs. the on-device split.

The three implementations of the reference's splitPointCloud
(feature_extractor.cc:104-179) must agree: ops/features.split_scan (XLA),
runtime/native.split_velodyne_np (numpy), and loader.cc split_velodyne (C++).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from liodom_tpu import LiodomConfig
from liodom_tpu.core.frame import RawScan
from liodom_tpu.core.synth import BoxWorld
from liodom_tpu.ops.features import split_scan
from liodom_tpu.runtime import native


def _scan(seed=0, width=700):
    world = BoxWorld(seed=seed)
    return world.render(np.zeros(3), np.eye(3), width=width, noise=0.01,
                        seed=seed).astype(np.float32)


@pytest.mark.parametrize("scan_lines", [64, 32, 16])
def test_numpy_matches_device(scan_lines):
    cfg = LiodomConfig(scan_lines=scan_lines, ring_width=1024,
                       max_points=65536)
    pts = _scan()
    raw = RawScan.from_points(jnp.asarray(pts), cfg.max_points)
    dev = split_scan(raw, cfg)
    img_np, counts_np, _ = native.split_velodyne_np(
        pts, scan_lines, cfg.ring_width, cfg.min_range, cfg.max_range)
    dev_img = np.asarray(dev.xyz)
    dev_counts = np.asarray(dev.count)
    # boundary points can flip rings on 1-ulp atan differences; demand
    # near-total agreement and identical totals
    agree = (dev_counts == counts_np).mean()
    assert agree >= 0.97, (dev_counts, counts_np)
    same_rows = dev_counts == counts_np
    np.testing.assert_allclose(dev_img[same_rows], img_np[same_rows],
                               atol=1e-6)


def test_native_matches_numpy():
    if not native.native_available():
        pytest.skip("native toolchain unavailable")
    cfg = LiodomConfig()
    pts = _scan(seed=1, width=900)
    # pad to stride-4 records like a KITTI .bin
    rec = np.zeros((len(pts), 4), np.float32)
    rec[:, :3] = pts
    img_c, counts_c, _ = native.split_velodyne(
        rec, cfg.scan_lines, cfg.ring_width, cfg.min_range, cfg.max_range)
    img_np, counts_np, _ = native.split_velodyne_np(
        rec, cfg.scan_lines, cfg.ring_width, cfg.min_range, cfg.max_range)
    # adjacent-ring flips from 1-ulp atan differences are expected; the
    # invariants are: identical totals, per-ring count off by <= 2, and
    # bitwise-equal rows wherever counts agree
    assert counts_c.sum() == counts_np.sum()
    assert np.abs(counts_c - counts_np).max() <= 2
    assert (counts_c == counts_np).mean() >= 0.9
    same = counts_c == counts_np
    np.testing.assert_allclose(img_c[same], img_np[same], atol=1e-6)


def test_nan_and_range_gating():
    cfg = LiodomConfig()
    pts = _scan(seed=2)
    pts[::5] = np.nan
    pts[1::5] = 1e6  # beyond max_range
    img, counts, _dropped = native.split_velodyne_np(
        pts, cfg.scan_lines, cfg.ring_width, cfg.min_range, cfg.max_range)
    assert np.all(np.isfinite(img))
    assert counts.sum() > 0


def test_image_step_matches_full_step():
    """image_step (host split) and full_step (device split) must agree."""
    from liodom_tpu.odometry import pipeline as P
    cfg = LiodomConfig(max_points=65536, ring_width=1024, local_map_size=3)
    world = BoxWorld(seed=4)
    state_a = P.init_state(cfg)
    state_b = P.init_state(cfg)
    for i in range(4):
        pts = world.render(np.array([0.1 * i, 0, 0]), np.eye(3), width=700,
                           noise=0.005, seed=i).astype(np.float32)
        raw = RawScan.from_points(jnp.asarray(pts), cfg.max_points)
        state_a, pose_a, na = P.full_step(state_a, raw.xyz, raw.valid, cfg)
        img, counts, _ = native.split_velodyne_np(
            pts, cfg.scan_lines, cfg.ring_width, cfg.min_range,
            cfg.max_range)
        state_b, pose_b, nb = P.image_step(
            state_b, jnp.asarray(img), jnp.asarray(counts), cfg)
        # ring-boundary flips can move an edge or two; poses stay equal to
        # solver tolerance
        np.testing.assert_allclose(np.asarray(pose_a.t), np.asarray(pose_b.t),
                                   atol=5e-3)
        assert abs(int(na) - int(nb)) <= max(5, int(0.02 * int(na)))


def test_split_drop_accounting():
    """Ring-width overflow must be COUNTED, never silent: numpy, native C++,
    and the on-device split_overflow all report the same drop total."""
    import jax.numpy as jnp
    from liodom_tpu.core.config import LiodomConfig
    from liodom_tpu.core.frame import RawScan
    from liodom_tpu.ops.features import split_overflow

    rng = np.random.default_rng(7)
    # 300 points all on (almost) one elevation -> one ring; width 64 drops 236
    n = 300
    az = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(10.0, 20.0, n)
    pts = np.stack([r * np.cos(az), r * np.sin(az),
                    np.zeros(n)], -1).astype(np.float32)
    width = 64

    img_np, counts_np, drop_np = native.split_velodyne_np(
        pts, 64, width, 3.0, 75.0)
    assert drop_np > 0
    assert counts_np.sum() + drop_np == n

    if native.native_available():
        img_c, counts_c, drop_c = native.split_velodyne(
            pts, 64, width, 3.0, 75.0)
        assert drop_c == drop_np
        np.testing.assert_array_equal(counts_c, counts_np)

    cfg = LiodomConfig(scan_lines=64, ring_width=width, max_points=512)
    raw = RawScan.from_points(jnp.asarray(pts), cfg.max_points)
    assert int(split_overflow(raw, cfg)) == drop_np


def test_ouster_np_matches_device_split():
    """split_ouster_np (host loader path) must match the on-device
    split_scan_ouster bit-for-bit: same compaction, same counts, same
    validity gates (feature_extractor.cc:158-175)."""
    import numpy as np
    import jax.numpy as jnp
    from liodom_tpu import LiodomConfig
    from liodom_tpu.ops.features import split_scan_ouster
    from liodom_tpu.runtime.native import split_ouster_np

    rng = np.random.default_rng(5)
    h, w0 = 32, 256
    organized = (rng.standard_normal((h, w0, 3)) * 20).astype(np.float32)
    # sprinkle NaNs (missing returns) and close/far points
    organized[rng.random((h, w0)) < 0.1] = np.nan
    organized[rng.random((h, w0)) < 0.05] *= 0.01   # inside min_range
    cfg = LiodomConfig(lidar_type=1, scan_lines=h, ring_width=128)

    img_np, counts_np, dropped = split_ouster_np(
        organized, cfg.ring_width, cfg.min_range, cfg.max_range)
    dev = split_scan_ouster(jnp.asarray(organized), cfg)
    np.testing.assert_array_equal(counts_np, np.asarray(dev.count))
    np.testing.assert_array_equal(img_np, np.asarray(dev.xyz))
    # drop accounting: exactly the valid points beyond the width clamp
    # (both paths clamp identically; the count is the loader's to report)
    from liodom_tpu.ops.features import valid_points
    n_valid = int(np.asarray(valid_points(
        jnp.asarray(organized.reshape(-1, 3)), cfg).sum()))
    assert dropped == n_valid - int(counts_np.sum())
    assert dropped > 0    # this scene must actually exercise the clamp
