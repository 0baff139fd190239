import numpy as np
import jax.numpy as jnp

from liodom_tpu.core.config import LiodomConfig
from liodom_tpu.core.frame import RawScan, ring_mask
from liodom_tpu.ops import features as F

from golden import golden_ring_split, golden_smoothness, golden_select_edges


def synth_scan(rng, n=4000, lines=64):
    """Random points in the HDL-64 FOV with ranges in [4, 70] m."""
    az = rng.uniform(-np.pi, np.pi, n)
    elev = np.deg2rad(rng.uniform(-24.0, 1.9, n))
    r = rng.uniform(4.0, 70.0, n)
    x = r * np.cos(elev) * np.cos(az)
    y = r * np.cos(elev) * np.sin(az)
    z = r * np.sin(elev)
    return np.stack([x, y, z], axis=-1)


def test_ring_split_matches_golden():
    rng = np.random.default_rng(0)
    cfg = LiodomConfig(max_points=8192, ring_width=512)
    pts = synth_scan(rng, 4000)
    # sprinkle invalid points: NaN, too close, too far
    pts[10] = np.nan
    pts[20] = [0.5, 0.5, 0.0]
    pts[30] = [200.0, 0.0, 0.0]
    raw = RawScan.from_points(jnp.array(pts, jnp.float32), cfg.max_points)
    img = F.split_scan(raw, cfg)
    golden = golden_ring_split(pts, cfg.scan_lines, cfg.min_range, cfg.max_range)
    counts = np.asarray(img.count)
    for rid in range(cfg.scan_lines):
        assert counts[rid] == len(golden[rid]), rid
        got = np.asarray(img.xyz[rid, :counts[rid]])
        want = pts[golden[rid]]
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_ring_split_width_overflow_truncates():
    rng = np.random.default_rng(1)
    cfg = LiodomConfig(max_points=8192, ring_width=8)
    pts = synth_scan(rng, 2000)
    raw = RawScan.from_points(jnp.array(pts, jnp.float32), cfg.max_points)
    img = F.split_scan(raw, cfg)
    counts = np.asarray(img.count)
    assert np.all(counts <= 8)
    # an overflowing ring keeps its first `width` points and must NOT shift
    # the packing of later rings
    golden = golden_ring_split(pts, cfg.scan_lines, cfg.min_range, cfg.max_range)
    for rid in range(cfg.scan_lines):
        keep = golden[rid][:8]
        assert counts[rid] == len(keep)
        np.testing.assert_allclose(np.asarray(img.xyz[rid, :len(keep)]),
                                   pts[keep], atol=1e-5)


def test_ouster_split():
    rng = np.random.default_rng(2)
    cfg = LiodomConfig(lidar_type=1, scan_lines=16, ring_width=256)
    h, w = 16, 128
    organized = synth_scan(rng, h * w).reshape(h, w, 3)
    organized[3, 7] = np.nan
    organized[5, 9] = [1.0, 0.0, 0.0]  # too close
    img = F.split_scan_ouster(jnp.array(organized, jnp.float32), cfg)
    counts = np.asarray(img.count)
    for row in range(h):
        valid = []
        for col in range(w):
            p = organized[row, col]
            if not np.all(np.isfinite(p)):
                continue
            d = np.hypot(p[0], p[1])
            if d < cfg.min_range or d > cfg.max_range:
                continue
            valid.append(p)
        assert counts[row] == len(valid)
        np.testing.assert_allclose(
            np.asarray(img.xyz[row, :counts[row]]), np.array(valid), atol=1e-5)


def test_smoothness_matches_golden():
    rng = np.random.default_rng(3)
    cfg = LiodomConfig(ring_width=128)
    n = 100
    ring = synth_scan(rng, n)
    from liodom_tpu.core.frame import RingImage
    xyz = np.zeros((cfg.scan_lines, cfg.ring_width, 3), np.float32)
    xyz[0, :n] = ring
    img = RingImage(jnp.array(xyz), jnp.zeros(cfg.scan_lines, jnp.int32).at[0].set(n))
    s = np.asarray(F.smoothness(img, cfg))[0]
    want = golden_smoothness(ring.astype(np.float32))
    np.testing.assert_allclose(s[:n], want, rtol=2e-4, atol=1e-3)
    assert np.all(s[n:] == 0)


def _structured_ring(rng, n):
    """A smooth arc with injected corners so some smoothness values clear the
    0.1 pick threshold and some don't."""
    t = np.linspace(0, 0.8 * np.pi, n)
    r = 20.0 + 0.1 * np.sin(5 * t)
    pts = np.stack([r * np.cos(t), r * np.sin(t), 0.05 * t], axis=-1)
    # corners: displace some isolated points
    idx = rng.choice(np.arange(8, n - 8), size=12, replace=False)
    pts[idx] += rng.normal(size=(12, 3)) * 0.8
    return pts


def test_select_edges_matches_golden_sequential():
    rng = np.random.default_rng(4)
    cfg = LiodomConfig(ring_width=256)
    from liodom_tpu.core.frame import RingImage
    nrings = cfg.scan_lines
    xyz = np.zeros((nrings, cfg.ring_width, 3), np.float32)
    counts = np.zeros(nrings, np.int32)
    rings = {}
    for rid in range(6):  # a few populated rings, one too-small ring
        n = [200, 150, 97, 89, 256, 123][rid]  # 89 < min gate (90)
        ring = _structured_ring(rng, n).astype(np.float32)
        xyz[rid, :n] = ring
        counts[rid] = n
        rings[rid] = (ring, n)
    img = RingImage(jnp.array(xyz), jnp.array(counts))
    s = F.smoothness(img, cfg)
    s_np = np.asarray(s)
    # golden selection driven by the same (f32) smoothness values, so the test
    # isolates the greedy pick+suppress semantics from float accumulation order
    goldens = [(rid, golden_select_edges(
        np.asarray(ring, np.float64), cfg.scan_regions, cfg.edges_per_region,
        cfg.min_points_per_scan, smooth=s_np[rid][:n]))
        for rid, (ring, n) in rings.items()]
    edges = F.select_edges(img, s, cfg)
    got_xyz = np.asarray(edges.xyz).reshape(
        nrings, cfg.scan_regions * cfg.max_edges_per_region, 3)
    got_valid = np.asarray(edges.valid).reshape(
        nrings, cfg.scan_regions * cfg.max_edges_per_region)
    for rid, want_idx in goldens:
        got = got_xyz[rid][got_valid[rid]]
        want = xyz[rid][want_idx]
        # pick order inside the flat slot layout follows (region, pick) which
        # matches the golden's sequential order per region
        assert got.shape == want.shape, (rid, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=1e-5)
    # untouched rings produce nothing
    assert not got_valid[6:].any()


def test_select_edges_budget():
    # a ring where every interior point is a huge corner: per region the
    # greedy loop must admit at most edges_per_region+1 picks
    rng = np.random.default_rng(5)
    cfg = LiodomConfig(ring_width=1024)
    n = 900
    ring = (rng.normal(size=(n, 3)) * 5.0 + np.array([20.0, 0, 0])).astype(np.float32)
    from liodom_tpu.core.frame import RingImage
    xyz = np.zeros((cfg.scan_lines, cfg.ring_width, 3), np.float32)
    xyz[0, :n] = ring
    img = RingImage(jnp.array(xyz),
                    jnp.zeros(cfg.scan_lines, jnp.int32).at[0].set(n))
    s = F.smoothness(img, cfg)
    edges = F.select_edges(img, s, cfg)
    want = golden_select_edges(np.asarray(ring, np.float64), cfg.scan_regions,
                               cfg.edges_per_region, cfg.min_points_per_scan)
    got_valid = np.asarray(edges.valid).reshape(cfg.scan_lines, -1)[0]
    assert got_valid.sum() == len(want)
    got = np.asarray(edges.xyz).reshape(cfg.scan_lines, -1, 3)[0][got_valid]
    np.testing.assert_allclose(got, ring[want], atol=1e-5)


def test_features_custom_vmap_ring_fold():
    """The TPU smoothness/select custom_vmap rules (batch folded into the
    ring axis) must match per-element solo kernel calls bit-for-bit
    (interpret mode on CPU; rings are independent so the fold is exact)."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from liodom_tpu import LiodomConfig
    from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
    from liodom_tpu.ops.features import _smoothness_tpu, _select_edges_tpu
    from liodom_tpu.runtime import native

    cfg = LiodomConfig(ring_width=512, scan_lines=64)
    world = BoxWorld(seed=0)
    pos, yaws = drive_trajectory(3, speed=1.0, yaw_rate=0.02)
    imgs, cnts = [], []
    for i in range(3):
        pts = world.render(pos[i], yaw_matrix(yaws[i]), width=400,
                           noise=0.005, seed=i)
        img, cnt, _ = native.split_velodyne_np(
            pts, cfg.scan_lines, cfg.ring_width, cfg.min_range,
            cfg.max_range)
        imgs.append(img)
        cnts.append(cnt)
    xb = jnp.asarray(np.stack(imgs))
    cb = jnp.asarray(np.stack(cnts))

    fs = _smoothness_tpu(interpret=True)
    sm_b = jax.vmap(fs)(xb, cb)
    fe = _select_edges_tpu(cfg, interpret=True)
    ec_b = jax.vmap(fe)(xb, cb, sm_b)
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(sm_b[i]),
                                      np.asarray(fs(xb[i], cb[i])))
        ec_s = fe(xb[i], cb[i], sm_b[i])
        np.testing.assert_array_equal(np.asarray(ec_b.xyz[i]),
                                      np.asarray(ec_s.xyz))
        np.testing.assert_array_equal(np.asarray(ec_b.valid[i]),
                                      np.asarray(ec_s.valid))
