"""Whole-pipeline sequential-golden parity.

The strongest end-to-end semantics oracle available without real KITTI data:
``golden.golden_frame_loop`` re-enacts the ENTIRE reference frame loop
(split -> smoothness -> greedy select -> predict -> 2x (brute 5-NN + PCA
line gate -> 4-iter Huber-LM) -> window push; laser_odometry.cc:100-272,
feature_extractor.cc:42-313, factors.hpp:71-105) as sequential NumPy
float64, and the fused XLA ``full_step`` trajectory must match it frame by
frame.

Tolerances: the engine runs float32 and reassociates sums (normal
equations, smoothness), so poses agree to a few mm / ~1e-4 rad on this
well-conditioned scene — far below the 0.035 m ATE the synthetic benchmark
operates at.

Pitfall pinned by the max-ring assert: the elevation ring formulas can
route two laser rows into one ring id, so a ring can hold ~2x the per-laser
width — an undersized ``ring_width`` makes the engine silently truncate
while the oracle keeps everything, and they diverge.  (App-level truncation
accounting lives in ops/features + the apps.)
"""

import numpy as np
import jax.numpy as jnp

from liodom_tpu.core.config import LiodomConfig
from liodom_tpu.core.frame import RawScan
from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
from liodom_tpu.odometry import pipeline as P

from golden import golden_frame_loop, golden_quat_conj, golden_quat_mul

N_FRAMES = 6


def _render_scans(n, width=720):
    world = BoxWorld(seed=3)
    pos, yaws = drive_trajectory(n, speed=1.0, yaw_rate=0.02)
    return [world.render(pos[i], yaw_matrix(yaws[i]), width=width,
                         noise=0.005, seed=100 + i) for i in range(n)]


def _quat_angle(qa, qb):
    """Rotation angle between two unit quaternions (radians)."""
    d = golden_quat_mul(golden_quat_conj(np.asarray(qa, np.float64)),
                        np.asarray(qb, np.float64))
    return 2.0 * np.arccos(np.clip(abs(d[0]), -1.0, 1.0))


def test_full_step_matches_sequential_golden():
    scans = _render_scans(N_FRAMES)
    cfg = LiodomConfig(local_map_size=5, ring_width=2048)

    # the engine must not be truncating rings for this comparison to be fair
    from golden import golden_ring_split
    rings = golden_ring_split(np.asarray(scans[0], np.float64),
                              cfg.scan_lines, cfg.min_range, cfg.max_range)
    assert max(len(r) for r in rings) <= cfg.ring_width

    golden_poses = golden_frame_loop(
        scans, scan_lines=cfg.scan_lines, min_range=cfg.min_range,
        max_range=cfg.max_range, scan_regions=cfg.scan_regions,
        edges_per_region=cfg.edges_per_region,
        local_map_size=cfg.local_map_size, outer_iters=cfg.outer_iters,
        inner_iters=cfg.inner_iters, huber_delta=cfg.huber_delta,
        knn_k=cfg.knn_k, knn_max_sq_dist=cfg.knn_max_sq_dist,
        eig_ratio=cfg.eig_ratio, min_line_sep=cfg.min_line_sep)

    state = P.init_state(cfg)
    cap = cfg.max_points
    for i, scan in enumerate(scans):
        n = len(scan)
        xyz = np.zeros((cap, 3), np.float32)
        xyz[:n] = scan
        valid = np.zeros(cap, bool)
        valid[:n] = True
        state, pose, n_edges = P.full_step(
            state, jnp.asarray(xyz), jnp.asarray(valid), cfg)
        g = golden_poses[i]
        t_err = float(np.linalg.norm(np.asarray(pose.t, np.float64) - g.t))
        r_err = _quat_angle(np.asarray(pose.q), g.q)
        assert int(n_edges) > 100, f"frame {i}: only {int(n_edges)} edges"
        assert t_err < 5e-3, f"frame {i}: |t - t_golden| = {t_err:.2e} m"
        assert r_err < 2e-4, f"frame {i}: rot angle err = {r_err:.2e} rad"

    # the trajectory actually moved (the oracle isn't vacuous)
    assert np.linalg.norm(golden_poses[-1].t) > 1.0
