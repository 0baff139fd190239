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
    from liodom_tpu.core.config import MapConfig
    from liodom_tpu.core.frame import RawScan
    from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
    from liodom_tpu.odometry import pipeline as P
    from liodom_tpu.mapping.service import combined_image_step, init_combined

    from liodom_tpu.runtime import native

    cfg = LiodomConfig(local_map_size=5)
    mcfg = MapConfig()
    ccfg = cfg.replace(mapping=True)
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
        img, counts, _ = native.split_velodyne(
            scan.astype(np.float32), cfg.scan_lines, cfg.ring_width,
            cfg.min_range, cfg.max_range)
        scans.append((jnp.asarray(img), jnp.asarray(counts)))

    # --- odometry-only (the reference's liodom_node alone) ---
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
    scans_per_s = n_bench / (time.perf_counter() - t0)

    # --- fused odometry + mapping (liodom_node + liodom_mapping together),
    # local map extracted every frame (per-message mapper) ---
    def combined_run(every):
        co, cm = init_combined(ccfg, mcfg)
        for i in range(n_warm):
            co, cm, cpose, _ = combined_image_step(
                co, cm, scans[i][0], scans[i][1], ccfg, mcfg,
                step=i, local_map_every=every)
        np.asarray(cpose.t)
        t0 = time.perf_counter()
        for i in range(n_warm, n_warm + n_bench):
            co, cm, cpose, _ = combined_image_step(
                co, cm, scans[i][0], scans[i][1], ccfg, mcfg,
                step=i, local_map_every=every)
        np.asarray(cpose.t)
        return n_bench / (time.perf_counter() - t0)

    combined_per_s = combined_run(1)
    # async-mapper cadence: the reference mapper is a second process on a
    # latched topic; the odometer consumes the *last received* local map
    # (laser_odometry.cc:276-279), so a refresh every 4th frame mirrors the
    # real deployment.
    combined_async_per_s = combined_run(4)

    print(json.dumps({
        "metric": "odometry_scans_per_s_1chip",
        "value": round(scans_per_s, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_s / BASELINE_SCANS_PER_S, 2),
        "combined_scans_per_s": round(combined_per_s, 2),
        "combined_vs_baseline": round(combined_per_s / BASELINE_SCANS_PER_S,
                                      2),
        "combined_async_scans_per_s": round(combined_async_per_s, 2),
        "note": "vs_baseline = measured scans/s over the 10 Hz sensor rate "
                "the reference CPU stack is engineered to sustain "
                "(laser_odometry.cc:253-256); the ROS stack itself cannot "
                "run in this environment. Per-stage device times: "
                "BENCH_STAGES.json / bench_stages.py.",
    }))


if __name__ == "__main__":
    main()
