#!/usr/bin/env python
"""Benchmark: full odometry pipeline throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference runs on a desktop CPU and its own real-time criterion
is keeping up with the 10 Hz KITTI Velodyne stream (laser_odometry.cc:253-256
warns below 0.8x input rate; BASELINE.md).  The repo publishes no faster
number, so vs_baseline is measured scans/s divided by the 10 scans/s the
reference is engineered to sustain.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_SCANS_PER_S = 10.0  # reference real-time target (BASELINE.md)


def main():
    from liodom_tpu import LiodomConfig
    from liodom_tpu.core.frame import RawScan
    from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
    from liodom_tpu.odometry import pipeline as P

    from liodom_tpu.runtime import native

    cfg = LiodomConfig(local_map_size=5)
    world = BoxWorld(seed=0)
    n_warm, n_bench = 6, 30
    pos, yaws = drive_trajectory(n_warm + n_bench, speed=1.2, yaw_rate=0.01)

    # Pre-generate host-side ring images: rendering is the sensor's job and
    # ring routing is the loader's (native C++ split in prefetch threads,
    # runtime/native_src/loader.cc — overlapped with TPU compute in
    # production, exactly like the reference's dedicated extraction thread).
    scans = []
    for i in range(n_warm + n_bench):
        scan = world.render(pos[i], yaw_matrix(yaws[i]), width=1800,
                            noise=0.01, seed=i)
        img, counts = native.split_velodyne(
            scan.astype(np.float32), cfg.scan_lines, cfg.ring_width,
            cfg.min_range, cfg.max_range)
        scans.append((jnp.asarray(img), jnp.asarray(counts)))

    state = P.init_state(cfg)
    for i in range(n_warm):
        state, pose, _ = P.image_step(state, scans[i][0], scans[i][1], cfg)
    # NOTE: on the tunneled TPU backend block_until_ready() can return before
    # execution; a host fetch is the only reliable barrier.  Fetch to close
    # the warmup, then time the chained steady state ending with a fetch.
    np.asarray(pose.t)

    t0 = time.perf_counter()
    for i in range(n_warm, n_warm + n_bench):
        state, pose, _ = P.image_step(state, scans[i][0], scans[i][1], cfg)
    np.asarray(pose.t)
    dt = time.perf_counter() - t0

    scans_per_s = n_bench / dt
    print(json.dumps({
        "metric": "odometry_scans_per_s_1chip",
        "value": round(scans_per_s, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_s / BASELINE_SCANS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
