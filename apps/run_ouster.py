#!/usr/bin/env python
"""Run the engine on Ouster-style row-organized clouds.

TPU-native equivalent of ``roslaunch liodom liodom_ouster.launch``
(launch/liodom_ouster.launch:19-33: ``lidar_type=1``, clouds from
``/os_cloud_node/points`` whose row index IS the ring,
feature_extractor.cc:158-175).

Input: a directory of ``.npy`` files, each an (rings, width, 3) float32
organized cloud (NaN rows for missing returns), or ``--synthetic`` to
generate a scene.

Usage:
    python apps/run_ouster.py --dir /data/ouster_npy
    python apps/run_ouster.py --synthetic --frames 30
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from liodom_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=None,
                    help="directory of (rings, width, 3) .npy organized clouds")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--width", type=int, default=1024,
                    help="columns per ring for --synthetic renders")
    ap.add_argument("--scan-lines", type=int, default=64)
    ap.add_argument("--local-map-size", type=int, default=15)
    ap.add_argument("--results-dir", default=None)
    args = ap.parse_args()

    from liodom_tpu import LiodomConfig
    from liodom_tpu.odometry import pipeline as P
    from liodom_tpu.runtime.publisher import OdomPublisher
    from liodom_tpu.runtime.stats import Stats

    if args.dir:
        files = sorted(glob.glob(os.path.join(args.dir, "*.npy")))
        if not files:
            print(f"no .npy files in {args.dir}", file=sys.stderr)
            return 1
        frames = [np.load(f).astype(np.float32) for f in
                  files[:args.frames]]
    elif args.synthetic:
        from liodom_tpu.core.synth import BoxWorld, drive_trajectory, \
            yaw_matrix
        world = BoxWorld(seed=0)
        pos, yaws = drive_trajectory(args.frames, speed=1.0, yaw_rate=0.01)
        # BoxWorld renders ring-major (hdl64_directions meshgrid 'ij'), so a
        # reshape IS the row-organized cloud an Ouster driver would emit
        frames = [world.render(pos[i], yaw_matrix(yaws[i]), width=args.width,
                               noise=0.01, seed=i).reshape(64, args.width, 3)
                  for i in range(args.frames)]
    else:
        print("need --dir or --synthetic", file=sys.stderr)
        return 1

    rings, width = frames[0].shape[:2]
    cfg = LiodomConfig(lidar_type=1, scan_lines=rings,
                       ring_width=max(width, 128),
                       local_map_size=args.local_map_size,
                       # the Ouster launch leaves laser_frame empty — taken
                       # from the message header (laser_odometry.cc:111-113)
                       laser_frame="")

    state = P.init_state(cfg)
    pub = OdomPublisher(fixed_frame=cfg.fixed_frame,
                        base_frame=cfg.base_frame)
    stats = Stats()
    # Production input path: the row split is the LOADER's job (rows are
    # rings; host-side left-compaction in runtime.native.split_ouster_np,
    # parity-tested against the on-device split_scan_ouster) — the fused
    # step then starts at the smoothness kernel, like run_kitti/bench.
    from liodom_tpu.runtime.native import split_ouster_np
    images = [split_ouster_np(f, cfg.ring_width, cfg.min_range,
                              cfg.max_range) for f in frames]
    n_drop = sum(d for _, _, d in images)
    if n_drop:
        print(f"WARNING: {n_drop} points dropped by the "
              f"ring_width={cfg.ring_width} clamp across the run")
    # Fetch poses after the loop: a per-frame host fetch costs ~70 ms of
    # pure tunnel RPC on the dev TPU and would measure the link, not the
    # engine (see run_synthetic).
    jframes = [(jnp.asarray(im, jnp.float32), jnp.asarray(ct, jnp.int32))
               for im, ct, _ in images]
    ts = time.perf_counter()
    state, pose, n_edges = P.image_step(state, *jframes[0], cfg)
    np.asarray(pose.t)
    t_compile = time.perf_counter() - ts
    results = [(pose, n_edges)]
    t0 = time.perf_counter()
    for im, ct in jframes[1:]:
        state, pose, n_edges = P.image_step(state, im, ct, cfg)
        results.append((pose, n_edges))
    np.asarray(pose.t)  # host fetch = the only reliable barrier
    wall = time.perf_counter() - t0
    for i, (p, ne) in enumerate(results):
        mat = np.asarray(p.matrix(), np.float64)
        stats.add_pose(mat)
        stats.add_num_feats(int(ne))
        pub.publish(mat, stamp=i * 0.1)
    n = len(frames)
    print(f"compile: {t_compile:.1f} s; {n - 1} frames in {wall:.2f} s = "
          f"{(n - 1) / max(wall, 1e-9):.1f} scans/s")
    print(f"final position: {pub.history[-1].pose[:3, 3]}")
    if args.results_dir:
        stats.write_results(args.results_dir)
        print(f"results in {args.results_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
