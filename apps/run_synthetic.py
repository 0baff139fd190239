#!/usr/bin/env python
"""End-to-end odometry demo on a synthetic world with exact ground truth.

The TPU-native equivalent of replaying a rosbag through liodom_node
(launch/liodom.launch): feeds simulated HDL-64 scans through the full
compiled pipeline, prints per-frame poses, and scores ATE against ground
truth.  Use this to eyeball that the engine actually works on real hardware.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--speed", type=float, default=1.2, help="m/frame")
    ap.add_argument("--yaw-rate", type=float, default=0.01, help="rad/frame")
    ap.add_argument("--noise", type=float, default=0.0, help="sensor sigma, m")
    ap.add_argument("--width", type=int, default=1800, help="azimuth samples")
    ap.add_argument("--local-map-size", type=int, default=5)
    ap.add_argument("--mapping", action="store_true",
                    help="fused odometry + hash-grid mapping with the "
                    "adaptive local-map feedback loop")
    ap.add_argument("--save-results-dir", default=None,
                    help="dump KITTI poses.txt + timing files here")
    args = ap.parse_args()

    from liodom_tpu import LiodomConfig
    from liodom_tpu.core.frame import RawScan
    from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
    from liodom_tpu.odometry import pipeline as P

    print(f"devices: {jax.devices()}")
    cfg = LiodomConfig(local_map_size=args.local_map_size,
                       mapping=args.mapping,
                       save_results=args.save_results_dir is not None)

    world = BoxWorld(seed=0)
    pos, yaws = drive_trajectory(args.frames, speed=args.speed,
                                 yaw_rate=args.yaw_rate)
    state = P.init_state(cfg)

    stats = None
    if args.save_results_dir:
        from liodom_tpu.runtime.stats import Stats
        stats = Stats()

    # Pre-render the scans (sensor-side work); the engine loop below then
    # measures the device pipeline with poses fetched asynchronously — on
    # the tunneled dev TPU a per-frame fetch costs ~100 ms of pure RPC
    # latency, so blocking every frame measures the tunnel, not the engine.
    scans = [RawScan.from_points(
        jnp.array(world.render(pos[i], yaw_matrix(yaws[i]), width=args.width,
                               noise=args.noise, seed=100 + i)),
        cfg.max_points) for i in range(args.frames)]

    if args.mapping:
        from liodom_tpu import MapConfig
        from liodom_tpu.mapping.service import combined_step, init_combined
        mcfg = MapConfig()
        state, mstate = init_combined(cfg, mcfg)

        def step(st, raw):
            nonlocal mstate
            st, mstate, pose, ne = combined_step(
                st, mstate, raw.xyz, raw.valid, cfg, mcfg)
            return st, pose, ne
    else:
        def step(st, raw):
            return P.full_step(st, raw.xyz, raw.valid, cfg)

    t0 = time.perf_counter()
    state, pose, n_edges = step(state, scans[0])
    np.asarray(pose.t)
    t_compile = time.perf_counter() - t0

    poses, n_edges_all = [pose], [n_edges]
    t0 = time.perf_counter()
    for i in range(1, args.frames):
        state, pose, n_edges = step(state, scans[i])
        poses.append(pose)
        n_edges_all.append(n_edges)
    np.asarray(pose.t)  # host fetch = the only reliable barrier here
    wall = time.perf_counter() - t0
    mean_ms = wall / max(args.frames - 1, 1) * 1e3

    errs = []
    for i, (p, ne) in enumerate(zip(poses, n_edges_all)):
        t = np.asarray(p.t)
        err = np.linalg.norm(t - pos[i])
        errs.append(err)
        if stats is not None:
            stats.add_pose(np.asarray(p.matrix()))
            stats.add_laser_odometry_time(mean_ms)
            stats.add_num_feats(int(ne))
            stats.add_frame_time(mean_ms)
        print(f"frame {i:3d}: edges={int(ne):5d}  "
              f"t=({t[0]:7.2f} {t[1]:7.2f} {t[2]:6.2f})  "
              f"gt=({pos[i][0]:7.2f} {pos[i][1]:7.2f} {pos[i][2]:6.2f})  "
              f"err={err:6.3f} m")

    ate = float(np.sqrt(np.mean(np.square(errs))))
    print(f"\nATE (rmse): {ate:.4f} m over {args.frames} frames")
    print(f"compile (first frame): {t_compile:.1f} s")
    print(f"steady-state: {mean_ms:.2f} ms/frame = {1e3/mean_ms:.1f} scans/s "
          f"(sensor rate 10 Hz)")
    if stats is not None:
        stats.write_results(args.save_results_dir)
        print(f"results written to {args.save_results_dir}")
    return 0 if ate < 0.5 else 1


if __name__ == "__main__":
    raise SystemExit(main())
