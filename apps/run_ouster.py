#!/usr/bin/env python
"""Run the engine on Ouster-style row-organized clouds — production path.

TPU-native equivalent of ``roslaunch liodom liodom_ouster.launch``
(launch/liodom_ouster.launch:19-33: ``lidar_type=1``, clouds from
``/os_cloud_node/points`` whose row index IS the ring,
feature_extractor.cc:158-175).

Same production surface as run_kitti: loader-split ingest in prefetch
threads (the row split is the sensor/loader's job — runtime.native.
split_ouster_np, parity-tested against the on-device split_scan_ouster),
``--chunk`` chained dispatch, ``--aot`` warm start, checkpoint/resume,
``--time-every`` sampled true latency, and counted ring-clamp drops.

Input: a directory of ``.npy`` files, each an (rings, width, 3) float32
organized cloud (NaN rows for missing returns), or ``--synthetic`` to
generate a scene.

Usage:
    python apps/run_ouster.py --dir /data/ouster_npy
    python apps/run_ouster.py --synthetic --frames 30 --chunk 10 --aot
"""

import argparse
import glob
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from liodom_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
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
    ap.add_argument("--ring-width", type=int, default=0,
                    help="padded points per ring; 0 auto-sizes from the "
                    "organized width (rows never exceed it)")
    ap.add_argument("--local-map-size", type=int, default=15)
    ap.add_argument("--chunk", type=int, default=1,
                    help="frames per device dispatch (chained lax.scan; "
                    "remainder falls back to per-frame)")
    ap.add_argument("--time-every", type=int, default=25,
                    help="sample true per-frame device latency every Nth "
                    "frame with a blocking pose fetch")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=500)
    ap.add_argument("--aot", action="store_true",
                    help="AOT warm start for the step program "
                    "(runtime/aot.py)")
    ap.add_argument("--prefetch", type=int, default=2,
                    help="load+split worker threads")
    ap.add_argument("--results-dir", default=None)
    args = ap.parse_args()

    from liodom_tpu import LiodomConfig
    from liodom_tpu.odometry import pipeline as P
    from liodom_tpu.runtime import checkpoint as CK
    from liodom_tpu.runtime.channels import FrequencyMonitor
    from liodom_tpu.runtime.native import split_ouster_np
    from liodom_tpu.runtime.publisher import OdomPublisher
    from liodom_tpu.runtime.stats import Stats

    if args.dir:
        files = sorted(glob.glob(os.path.join(args.dir, "*.npy")))
        if not files:
            print(f"no .npy files in {args.dir}", file=sys.stderr)
            return 1
        files = files[:args.frames]
        probe = np.load(files[0]).astype(np.float32)
        rings, width = probe.shape[:2]
        n = len(files)

        def load_organized(i):
            return np.load(files[i]).astype(np.float32)
    elif args.synthetic:
        from liodom_tpu.core.synth import BoxWorld, drive_trajectory, \
            yaw_matrix
        world = BoxWorld(seed=0)
        n = args.frames
        pos, yaws = drive_trajectory(n, speed=1.0, yaw_rate=0.01)
        rings, width = 64, args.width

        def load_organized(i):
            # BoxWorld renders ring-major (hdl64_directions meshgrid 'ij'),
            # so a reshape IS the row-organized cloud an Ouster driver emits
            return world.render(pos[i], yaw_matrix(yaws[i]),
                                width=args.width, noise=0.01,
                                seed=i).reshape(rings, args.width, 3)
    else:
        print("need --dir or --synthetic", file=sys.stderr)
        return 1

    ring_width = args.ring_width
    if ring_width <= 0:
        # rows are rings: occupancy can never exceed the organized width
        ring_width = max(128, int(-(-width // 128)) * 128)
    cfg = LiodomConfig(lidar_type=1, scan_lines=rings,
                       ring_width=ring_width,
                       local_map_size=args.local_map_size,
                       # the Ouster launch leaves laser_frame empty — taken
                       # from the message header (laser_odometry.cc:111-113)
                       laser_frame="")
    chunk = max(args.chunk, 1)

    # loader-split ingest in prefetch threads (the production input path:
    # device program starts at the smoothness kernel, like run_kitti/bench)
    def make_frame(i):
        img, counts, n_drop = split_ouster_np(
            load_organized(i), cfg.ring_width, cfg.min_range, cfg.max_range)
        return img, counts, n_drop

    state = P.init_state(cfg)

    def step_image(s, x, c):
        return P.image_step(s, x, c, cfg)

    def step_chunk(s, xs, cs):
        return P.chained_image_step(s, xs, cs, cfg)

    if args.aot:
        from liodom_tpu.runtime import aot
        ex_img = jnp.zeros((cfg.scan_lines, cfg.ring_width, 3), jnp.float32)
        ex_cnt = jnp.zeros((cfg.scan_lines,), jnp.int32)
        if chunk > 1:
            step_chunk = aot.get_or_compile(
                "ouster_image_chunk", step_chunk,
                (state, jnp.zeros((chunk,) + ex_img.shape, jnp.float32),
                 jnp.zeros((chunk,) + ex_cnt.shape, jnp.int32)),
                extra=f"{cfg}|chunk={chunk}")
        else:
            step_image = aot.get_or_compile(
                "ouster_image_step", step_image, (state, ex_img, ex_cnt),
                extra=str(cfg))

    pub = OdomPublisher(fixed_frame=cfg.fixed_frame,
                        base_frame=cfg.base_frame)
    stats = Stats()
    freq = FrequencyMonitor()

    start_frame = 0
    poses = []
    if args.checkpoint_dir and CK.latest_step(args.checkpoint_dir) is not None:
        step_no, ck = CK.restore(args.checkpoint_dir,
                                 template={"odom_state": state})
        state, start_frame = ck.odom_state, ck.frame_index
        for m in ck.trajectory:
            m44 = np.eye(4)
            m44[:3, :4] = m
            poses.append(m44)
            stats.add_pose(m44)
        print(f"resumed from checkpoint step {step_no} "
              f"(frame {start_frame})")

    pool = ThreadPoolExecutor(max_workers=args.prefetch)
    depth = max(args.prefetch * 2, chunk + 2)
    futures = {i: pool.submit(make_frame, i)
               for i in range(start_frame, min(start_frame + depth, n))}

    def get_frame(i):
        out = futures.pop(i).result()
        j = i + depth
        if j < n:
            futures[j] = pool.submit(make_frame, j)
        return out

    n_dropped = 0
    cbuf, pending = [], []
    last_odom_ms = float("nan")
    t_compile = None
    next_timed = start_frame   # chunk-mode sampling: first flush at/after
    n_flushed = 1              # each due point (boundaries rarely align)
    # checkpoint at the first flush AT/AFTER each due point — a modulo test
    # never fires when checkpoint_every is not a multiple of the chunk size
    next_ck = start_frame + args.checkpoint_every
    t_start = time.perf_counter()
    for i in range(start_frame, n):
        img, counts, nd = get_frame(i)
        n_dropped += nd
        freq.tick_input(t=i * 0.1)
        t0 = time.perf_counter()
        jx = jnp.asarray(img, jnp.float32)
        jc = jnp.asarray(counts, jnp.int32)
        if chunk == 1:
            state, pose, n_edges = step_image(state, jx, jc)
            pending.append((pose, n_edges))
            flushed = True
        else:
            cbuf.append((jx, jc))
            flushed = len(cbuf) == chunk or i == n - 1
            if flushed:
                if len(cbuf) == chunk:
                    xs = jnp.stack([b[0] for b in cbuf])
                    cs = jnp.stack([b[1] for b in cbuf])
                    state, cposes, cnes = step_chunk(state, xs, cs)
                    for kk in range(chunk):
                        pending.append(
                            (jax.tree.map(lambda a, kk=kk: a[kk], cposes),
                             cnes[kk]))
                else:
                    for bx, bc in cbuf:
                        state, p_, ne_ = step_image(state, bx, bc)
                        pending.append((p_, ne_))
                pose = pending[-1][0]
                n_flushed = len(cbuf)
                cbuf.clear()
        timed = args.time_every > 0 and flushed and i >= next_timed
        if flushed and (timed or t_compile is None):
            np.asarray(pose.t)
            dt = (time.perf_counter() - t0) * 1e3
            if t_compile is None:
                # compile-inflated — record it as compile, NOT as a
                # latency sample
                t_compile = dt / 1e3
            else:
                last_odom_ms = dt / n_flushed if chunk > 1 else dt
                next_timed = i + args.time_every
        ck_due = (args.checkpoint_dir is not None and flushed
                  and (i + 1) >= next_ck)
        if flushed and (timed or (i + 1) % 50 == 0 or i == n - 1 or ck_due):
            for p_, ne_ in pending:
                mat = np.asarray(p_.matrix(), np.float64)
                stats.add_pose(mat)
                stats.add_num_feats(int(ne_))
                stats.add_laser_odometry_time(
                    last_odom_ms,
                    measured=timed and bool(np.isfinite(last_odom_ms)))
                poses.append(mat)
                pub.publish(mat, stamp=len(poses) * 0.1)
            pending.clear()
            if ck_due:
                CK.save(args.checkpoint_dir, i + 1, CK.EngineCheckpoint(
                    state, None, np.stack(poses)[:, :3, :4], i + 1))
                next_ck = i + 1 + args.checkpoint_every
        freq.tick_output(t=i * 0.1 + (time.perf_counter() - t_start))

    wall = time.perf_counter() - t_start - (t_compile or 0.0)
    done = n - start_frame
    print(f"compile: {t_compile or 0:.1f} s; {done - 1} frames in "
          f"{wall:.2f} s = {(done - 1) / max(wall, 1e-9):.1f} scans/s")
    if n_dropped:
        print(f"WARNING: {n_dropped} points dropped by the "
              f"ring_width={cfg.ring_width} clamp across the run")
    if poses:
        print(f"final position: {poses[-1][:3, 3]}")
    if args.results_dir:
        stats.write_results(args.results_dir)
        print(f"results in {args.results_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
