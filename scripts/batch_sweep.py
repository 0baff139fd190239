#!/usr/bin/env python
"""Multi-sequence batched odometry throughput sweep (VERDICT r3 #1).

Round-3 measurement (README dead end (b)): vmap'd batch=2 cost 12.0 ms/step
— 166 aggregate scans/s, LESS than one sequence's 222 — because JAX's
default pallas batching rule took the kNN/selection kernels off the tuned
Mosaic path.  Round 4 adds custom_vmap rules that route the batch into
dedicated batched kernels (batch folded into the Pallas grid:
ops/knn_pallas.knn_coords_pallas_batched; ring-folded select/smoothness,
ops/features._select_edges_tpu/_smoothness_tpu).  This script measures the
result on hardware: aggregate scans/s at B in {1, 2, 4, 8} on the bench
workload (width-1800 synthetic HDL-64 scans, window 5).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/batch_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from liodom_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from liodom_tpu import LiodomConfig
    from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
    from liodom_tpu.odometry import pipeline as P
    from liodom_tpu.parallel.sharded import init_batch_state
    from liodom_tpu.runtime import native

    cfg = LiodomConfig(local_map_size=5, ring_width=2048)
    n_warm, n_bench = 5, 20
    n_frames = n_warm + n_bench
    max_b = 8

    # one independent sequence per batch lane (own world + trajectory)
    seqs = []
    for s in range(max_b):
        world = BoxWorld(seed=s)
        pos, yaws = drive_trajectory(n_frames, speed=1.2,
                                     yaw_rate=0.01 * (1 + 0.3 * s))
        frames = []
        for i in range(n_frames):
            scan = world.render(pos[i], yaw_matrix(yaws[i]), width=1800,
                                noise=0.01, seed=s * 1000 + i)
            img, counts, _ = native.split_velodyne(
                scan.astype(np.float32), cfg.scan_lines, cfg.ring_width,
                cfg.min_range, cfg.max_range)
            frames.append((img, counts))
        seqs.append(frames)
    print(f"rendered {max_b} sequences x {n_frames} frames", flush=True)

    # solo reference (inputs pre-staged on device, like bench.py — a
    # per-frame host->device transfer costs ~20 ms of tunnel RPC here)
    solo_frames = [(jnp.asarray(seqs[0][i][0]), jnp.asarray(seqs[0][i][1]))
                   for i in range(n_frames)]
    state = P.init_state(cfg)
    for i in range(n_warm):
        state, pose, _ = P.image_step(state, *solo_frames[i], cfg)
    np.asarray(pose.t)
    t0 = time.perf_counter()
    for i in range(n_warm, n_frames):
        state, pose, _ = P.image_step(state, *solo_frames[i], cfg)
    np.asarray(pose.t)
    solo = n_bench / (time.perf_counter() - t0)
    print(json.dumps({"B": 1, "scans_per_s": round(solo, 1),
                      "ms_per_step": round(1e3 / solo, 2)}), flush=True)

    for b in (2, 4, 8):
        states = init_batch_state(cfg, b)
        imgs = [jnp.asarray(np.stack([seqs[s][i][0] for s in range(b)]))
                for i in range(n_frames)]
        cnts = [jnp.asarray(np.stack([seqs[s][i][1] for s in range(b)]))
                for i in range(n_frames)]
        for i in range(n_warm):
            states, poses, _ = P.batch_image_step(states, imgs[i], cnts[i],
                                                  cfg)
        np.asarray(poses.t)
        t0 = time.perf_counter()
        for i in range(n_warm, n_frames):
            states, poses, _ = P.batch_image_step(states, imgs[i], cnts[i],
                                                  cfg)
        np.asarray(poses.t)
        dt = time.perf_counter() - t0
        agg = b * n_bench / dt
        # parity: lane 0 == the solo run (same scans)
        err = float(np.linalg.norm(np.asarray(poses.t)[0]
                                   - np.asarray(pose.t)))
        print(json.dumps({
            "B": b, "agg_scans_per_s": round(agg, 1),
            "ms_per_step": round(dt / n_bench * 1e3, 2),
            "x_over_solo": round(agg / solo, 2),
            "lane0_vs_solo_m": round(err, 6),
        }), flush=True)


if __name__ == "__main__":
    main()
