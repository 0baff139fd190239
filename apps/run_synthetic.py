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
    ap.add_argument("--save-results-dir", default=None,
                    help="dump KITTI poses.txt + timing files here")
    args = ap.parse_args()

    from liodom_tpu import LiodomConfig
    from liodom_tpu.core.frame import RawScan
    from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
    from liodom_tpu.odometry import pipeline as P

    print(f"devices: {jax.devices()}")
    cfg = LiodomConfig(local_map_size=args.local_map_size,
                       save_results=args.save_results_dir is not None)

    world = BoxWorld(seed=0)
    pos, yaws = drive_trajectory(args.frames, speed=args.speed,
                                 yaw_rate=args.yaw_rate)
    state = P.init_state(cfg)

    stats = None
    if args.save_results_dir:
        from liodom_tpu.runtime.stats import Stats
        stats = Stats()

    errs = []
    t_compile = None
    t_frames = []
    for i in range(args.frames):
        R = yaw_matrix(yaws[i])
        scan = world.render(pos[i], R, width=args.width, noise=args.noise,
                            seed=100 + i)
        raw = RawScan.from_points(jnp.array(scan), cfg.max_points)
        t0 = time.perf_counter()
        state, pose, n_edges = P.full_step(state, raw.xyz, raw.valid, cfg)
        pose.t.block_until_ready()
        dt = time.perf_counter() - t0
        if i == 0:
            t_compile = dt
        else:
            t_frames.append(dt)
        t = np.asarray(pose.t)
        err = np.linalg.norm(t - pos[i])
        errs.append(err)
        if stats is not None:
            stats.add_pose(np.asarray(pose.matrix()))
            stats.add_laser_odometry_time(dt * 1e3)
            stats.add_num_feats(int(n_edges))
            stats.add_frame_time(dt * 1e3)
        print(f"frame {i:3d}: edges={int(n_edges):5d}  "
              f"t=({t[0]:7.2f} {t[1]:7.2f} {t[2]:6.2f})  "
              f"gt=({pos[i][0]:7.2f} {pos[i][1]:7.2f} {pos[i][2]:6.2f})  "
              f"err={err:6.3f} m  {dt*1e3:7.1f} ms")

    ate = float(np.sqrt(np.mean(np.square(errs))))
    mean_ms = float(np.mean(t_frames) * 1e3) if t_frames else float("nan")
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
