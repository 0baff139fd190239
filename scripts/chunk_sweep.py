#!/usr/bin/env python
"""Sweep the chained-dispatch chunk size K (round 5): how much of the
~1.1 ms dispatch floor does each K recover, and where does it flatten?

Protocol: fresh state, one warm pass over the course, then timed passes,
per K; the same scans for every K.  Parity vs K=1 asserted on the final
pose (chained is bit-exact by construction, tests/test_chained.py)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from liodom_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax.numpy as jnp

from liodom_tpu import LiodomConfig
from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
from liodom_tpu.odometry import pipeline as P
from liodom_tpu.runtime import native

REPS = int(os.environ.get("SWEEP_REPS", "4"))
KS = [1, 4, 8, 12, 24, 48]
N = 48


def main():
    cfg = LiodomConfig(local_map_size=5)
    world = BoxWorld(seed=0)
    pos, yaws = drive_trajectory(N, speed=1.2, yaw_rate=0.01)
    scans = []
    for i in range(N):
        scan = world.render(pos[i], yaw_matrix(yaws[i]), width=1800,
                            noise=0.01, seed=i)
        img, counts, n_drop = native.split_velodyne_np(
            scan.astype(np.float32), cfg.scan_lines, cfg.ring_width,
            cfg.min_range, cfg.max_range)
        assert n_drop == 0
        scans.append((jnp.asarray(img), jnp.asarray(counts)))
    all_imgs = jnp.stack([s[0] for s in scans])
    all_cnts = jnp.stack([s[1] for s in scans])

    ref_t = None
    for k in KS:
        chunks = [(all_imgs[j:j + k], all_cnts[j:j + k])
                  for j in range(0, N, k)]

        def course():
            st = P.init_state(cfg)
            if k == 1:
                for i in range(N):
                    st, pose, _ = P.image_step(st, scans[i][0], scans[i][1],
                                               cfg)
                np.asarray(pose.t)
                return pose
            for cx, cc in chunks:
                st, poses, _ = P.chained_image_step(st, cx, cc, cfg)
            np.asarray(poses.t)
            return poses

        out = course()          # compile + warm + parity
        final_t = np.asarray(out.t)[-1] if k > 1 else np.asarray(out.t)
        if ref_t is None:
            ref_t = final_t
        err = float(np.linalg.norm(final_t - ref_t))
        t0 = time.perf_counter()
        for _ in range(REPS):
            course()
        per_s = REPS * N / (time.perf_counter() - t0)
        print(f"K={k:3d}: {per_s:7.1f} scans/s  "
              f"(final-pose err vs K=1: {err:.2e} m)", flush=True)


if __name__ == "__main__":
    main()
