#!/usr/bin/env python
"""Run the engine on a KITTI odometry sequence.

TPU-native equivalent of ``roslaunch liodom liodom.launch`` + a KITTI rosbag
(launch/liodom.launch:11-36): streams ``.bin`` scans through the compiled
pipeline (native prefetcher feeding the device), writes the reference's five
results files (stats.cc:73-132), and — when ground truth is present — scores
ATE/RPE in the velodyne frame.

Usage:
    python apps/run_kitti.py --root /data/kitti_odometry --seq 00
    python apps/run_kitti.py --root ... --seq 08 --mapping --frames 500
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from liodom_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="KITTI odometry root")
    ap.add_argument("--seq", default="00")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--local-map-size", type=int, default=15,
                    help="prev_frames (launch/liodom.launch:23 uses 15)")
    ap.add_argument("--mapping", action="store_true",
                    help="adaptive local mapping feedback loop")
    ap.add_argument("--local-map-every", type=int, default=1,
                    help="refresh the received local map every Nth frame "
                    "(the reference mapper is an async second process; the "
                    "odometer consumes the LAST received map, "
                    "laser_odometry.cc:276-279)")
    ap.add_argument("--filter-local-map", action="store_true")
    ap.add_argument("--local-map-capacity", type=int, default=65536,
                    help="received-local-map buffer rows (fixed-shape "
                    "deployment sizing; truncation is counted and warned)")
    ap.add_argument("--scan-lines", type=int, default=64)
    ap.add_argument("--ring-width", type=int, default=0,
                    help="padded points per ring; 0 (default) auto-sizes "
                    "from the first scan so no routed point is ever dropped "
                    "(the reference's ring vectors are unbounded, "
                    "feature_extractor.cc:153-156)")
    ap.add_argument("--results-dir", default=None)
    ap.add_argument("--chunk", type=int, default=1,
                    help="frames per device dispatch (lax.scan chaining; "
                    "amortizes the ~1.1 ms dispatch floor — throughput up, "
                    "pose latency = one chunk). Remainder frames fall back "
                    "to the per-frame step (one extra compile)")
    ap.add_argument("--sync-every", type=int, default=50,
                    help="host sync cadence (frames); poses are fetched in "
                    "blocks to amortize device round-trips")
    ap.add_argument("--time-every", type=int, default=25,
                    help="sample true per-frame device latency every Nth "
                    "frame with a blocking pose fetch; laser_odom_times.txt "
                    "rows carry the last sample (see runtime/stats.py)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="write a resumable checkpoint every "
                    "--checkpoint-every frames; resumes automatically when "
                    "one exists")
    ap.add_argument("--checkpoint-every", type=int, default=500)
    ap.add_argument("--export-viz", default=None,
                    help="directory for PLY exports (trajectory; per-frame "
                    "debug dumps every --viz-every frames)")
    ap.add_argument("--viz-every", type=int, default=0)
    ap.add_argument("--aot", action="store_true",
                    help="AOT warm start: load (or create) a serialized "
                    "COMPILED executable for this config's step program — "
                    "measured 8.4 s to first pose vs 190 s on the "
                    "persistent-cache path (runtime/aot.py; blob is tied "
                    "to jax version + backend + shapes, stale blobs fall "
                    "back to jit)")
    args = ap.parse_args()

    from liodom_tpu import LiodomConfig, MapConfig
    from liodom_tpu.core.io import KittiSequence
    from liodom_tpu.odometry import pipeline as P
    from liodom_tpu.runtime.channels import FrequencyMonitor
    from liodom_tpu.runtime.publisher import OdomPublisher
    from liodom_tpu.runtime.stats import Stats, ate_rmse, rpe
    from liodom_tpu.runtime import checkpoint as CK

    seq = KittiSequence(args.root, args.seq)
    ring_width = args.ring_width
    if ring_width <= 0:
        # auto-size from the first scan: max points routed to any ring,
        # rounded up to a lane multiple — zero drops by construction (and
        # re-checked per frame below, since later scans can be denser)
        from liodom_tpu.runtime import native as _nat
        probe = np.ascontiguousarray(seq.scan(0).astype(np.float32))
        _, counts0, _ = _nat.split_velodyne_np(
            probe, args.scan_lines, 16384, 3.0, 75.0)
        ring_width = max(512, int(-(-int(counts0.max()) * 1.25 // 256)) * 256)
        print(f"ring_width auto-sized to {ring_width} "
              f"(first scan max ring occupancy {int(counts0.max())})")
    cfg = LiodomConfig(local_map_size=args.local_map_size,
                       scan_lines=args.scan_lines,
                       ring_width=ring_width,
                       filter_local_map=args.filter_local_map,
                       mapping=args.mapping)
    n = len(seq) if args.frames is None else min(args.frames, len(seq))
    print(f"sequence {args.seq}: {n} scans, mapping={args.mapping}")

    chunk = max(args.chunk, 1)
    if args.mapping:
        from liodom_tpu.mapping import init_combined
        from liodom_tpu.mapping.service import (chained_combined_image_step,
                                                combined_image_step)
        mcfg = MapConfig(voxel_xysize=40.0, voxel_zsize=50.0, resolution=0.4,
                         cells_xy=3, cells_z=2,  # launch/liodom.launch:46-52
                         local_map_capacity=args.local_map_capacity)
        state, mstate = init_combined(cfg, mcfg)

        def step_comb(s, m, x, c, i):
            return combined_image_step(
                s, m, x, c, cfg, mcfg, step=i,
                local_map_every=args.local_map_every)

        def step_comb_chunk(s, m, xs, cs, i0):
            return chained_combined_image_step(
                s, m, xs, cs, cfg, mcfg, step0=i0,
                local_map_every=args.local_map_every)
    else:
        state = P.init_state(cfg)

        def step_image(s, x, c):
            return P.image_step(s, x, c, cfg)

        def step_image_chunk(s, xs, cs):
            return P.chained_image_step(s, xs, cs, cfg)

    if args.aot:
        # swap the jitted step for an AOT-serialized executable (creating
        # the blob on first use) — cuts the backend's first-execution path
        # from minutes to seconds (runtime/aot.py measurements)
        from liodom_tpu.runtime import aot
        ex_img = jnp.zeros((cfg.scan_lines, cfg.ring_width, 3), jnp.float32)
        ex_cnt = jnp.zeros((cfg.scan_lines,), jnp.int32)
        if chunk > 1:
            ex_imgs = jnp.zeros((chunk,) + ex_img.shape, jnp.float32)
            ex_cnts = jnp.zeros((chunk,) + ex_cnt.shape, jnp.int32)
            if args.mapping:
                step_comb_chunk = aot.get_or_compile(
                    "kitti_combined_chunk", step_comb_chunk,
                    (state, mstate, ex_imgs, ex_cnts, jnp.int32(0)),
                    extra=f"{cfg}|{mcfg}|every={args.local_map_every}"
                          f"|chunk={chunk}")
            else:
                step_image_chunk = aot.get_or_compile(
                    "kitti_image_chunk", step_image_chunk,
                    (state, ex_imgs, ex_cnts), extra=f"{cfg}|chunk={chunk}")
        elif args.mapping:
            step_comb = aot.get_or_compile(
                "kitti_combined", step_comb,
                (state, mstate, ex_img, ex_cnt, jnp.int32(0)),
                extra=f"{cfg}|{mcfg}|every={args.local_map_every}")
        else:
            step_image = aot.get_or_compile(
                "kitti_image_step", step_image, (state, ex_img, ex_cnt),
                extra=str(cfg))

    stats = Stats()
    freq = FrequencyMonitor()
    pub = OdomPublisher(fixed_frame=cfg.fixed_frame,
                        base_frame=cfg.base_frame,
                        publish_tf=cfg.publish_tf)
    poses, pending = [], []
    t_start = time.perf_counter()
    t_compile = None
    sensor_dt = 0.1 if seq.times is None else float(np.median(
        np.diff(seq.times))) if len(seq) > 1 else 0.1

    # resume from the latest checkpoint if one exists
    start_frame = 0
    if args.checkpoint_dir and CK.latest_step(args.checkpoint_dir) is not None:
        tmpl = {"odom_state": state}
        if args.mapping:
            tmpl["map_state"] = mstate
        step, ck = CK.restore(args.checkpoint_dir, template=tmpl)
        state, start_frame = ck.odom_state, ck.frame_index
        if args.mapping and ck.map_state is not None:
            mstate = ck.map_state
        for m in ck.trajectory:
            m44 = np.eye(4)
            m44[:3, :4] = m
            poses.append(m44)
            stats.add_pose(m44)
        print(f"resumed from checkpoint step {step} (frame {start_frame})")
        if start_frame >= n:
            print(f"checkpoint already covers frame {start_frame} >= "
                  f"--frames {n}; nothing to do (pass a larger --frames "
                  "to extend the run)")
            return 0

    ring_dropped = 0          # points lost to the ring_width clamp (loader)
    last_odom_ms = float("nan")   # latest sampled device latency
    cbuf = []                 # staged frames awaiting a chained dispatch
    next_ck = start_frame + args.checkpoint_every
    next_timed = start_frame  # chunk-mode latency-sample schedule (chunk
    # boundaries rarely align with (i % time_every == 0), so sample on the
    # first flush AT/after each due point instead)
    scan_iter = seq.iter_images(cfg.scan_lines, cfg.ring_width,
                                cfg.min_range, cfg.max_range)
    for i, (img, counts, n_drop) in enumerate(scan_iter):
        if i < start_frame:
            continue
        if i >= n:
            break
        if n_drop and not ring_dropped:
            print(f"WARNING: frame {i}: {n_drop} points dropped by the "
                  f"ring_width={cfg.ring_width} clamp — raise --ring-width "
                  "(the reference never drops; counting continues)")
        ring_dropped += n_drop
        freq.tick_input(t=i * sensor_dt)
        t0 = time.perf_counter()
        # End-to-end frame latency pairing (stats.cc:55-71): start at ingest,
        # stop when the pose is fetched back to the host.
        stats.start_frame(t0)
        # explicit dtypes: the AOT executable path is shape/dtype-strict
        jx = jnp.asarray(img, jnp.float32)
        jc = jnp.asarray(counts, jnp.int32)
        # Feature prep as seen by the consumer: loader dequeue + host->device
        # transfer.  The split itself runs in native prefetch threads and the
        # smoothness/selection on-device inside the fused step (see
        # runtime/stats.py notes on the five-file contract).
        stats.add_feature_extraction_time((time.perf_counter() - t0) * 1e3)
        timed = args.time_every > 0 and \
            (i - start_frame) % args.time_every == 0
        if chunk == 1:
            if args.mapping:
                state, mstate, pose, n_edges = step_comb(
                    state, mstate, jx, jc, jnp.int32(i))
            else:
                state, pose, n_edges = step_image(state, jx, jc)
            if timed:
                # blocking fetch: the TRUE ingest->pose latency of THIS
                # frame (all earlier dispatches have completed — in-order
                # execution), sampled so steady-state pipelining survives
                # (stats.cc:97-131 writes real ms per frame; see
                # runtime/stats.py for the sampling contract)
                np.asarray(pose.t)
                last_odom_ms = (time.perf_counter() - t0) * 1e3
            elif args.time_every <= 0:
                last_odom_ms = (time.perf_counter() - t0) * 1e3  # dispatch
            pending.append((pose, n_edges))
            flushed = True
        else:
            # chained mode: accumulate K frames, one lax.scan dispatch per
            # chunk; the remainder tail falls back to the per-frame step
            cbuf.append((jx, jc, i))
            flushed = len(cbuf) == chunk or i == n - 1
            timed = args.time_every > 0 and flushed and i >= next_timed
            if flushed:
                t_c = time.perf_counter()
                if len(cbuf) == chunk:
                    xs = jnp.stack([b[0] for b in cbuf])
                    cs = jnp.stack([b[1] for b in cbuf])
                    if args.mapping:
                        state, mstate, cposes, cnes = step_comb_chunk(
                            state, mstate, xs, cs, jnp.int32(cbuf[0][2]))
                    else:
                        state, cposes, cnes = step_image_chunk(state, xs, cs)
                    for kk in range(chunk):
                        pending.append(
                            (jax.tree.map(lambda a, kk=kk: a[kk], cposes),
                             cnes[kk]))
                else:
                    for bx, bc, bi in cbuf:
                        if args.mapping:
                            state, mstate, p_, ne_ = step_comb(
                                state, mstate, bx, bc, jnp.int32(bi))
                        else:
                            state, p_, ne_ = step_image(state, bx, bc)
                        pending.append((p_, ne_))
                pose = pending[-1][0]
                if timed or args.time_every <= 0:
                    np.asarray(pose.t)
                    last_odom_ms = ((time.perf_counter() - t_c) * 1e3
                                    / len(cbuf))
                    next_timed = i + args.time_every
                cbuf.clear()
        ck_due = (args.checkpoint_dir is not None and flushed
                  and (i + 1) >= next_ck)
        if (timed or (i + 1) % args.sync_every == 0
                or i == n - 1 or ck_due
                or (flushed and t_compile is None)):
            for p_, ne_ in pending:
                mat = np.asarray(p_.matrix(), np.float64)
                stats.add_pose(mat)
                stats.add_num_feats(int(ne_))
                poses.append(mat)
                pub.publish(mat, stamp=len(poses) * sensor_dt)
                stats.stop_frame(time.perf_counter())
            pending.clear()
            dt = time.perf_counter() - t0
            if t_compile is None and flushed:
                t_compile = dt
            if ck_due:
                CK.save(args.checkpoint_dir, i + 1, CK.EngineCheckpoint(
                    state, mstate if args.mapping else None,
                    np.stack(poses)[:, :3, :4], i + 1))
                next_ck = i + 1 + args.checkpoint_every
            if (args.export_viz and args.viz_every
                    and (i + 1) % args.viz_every == 0):
                from liodom_tpu.runtime.viz import export_frame_debug
                export_frame_debug(args.export_viz, i)
        stats.add_laser_odometry_time(
            last_odom_ms, measured=timed or args.time_every <= 0)
        freq.tick_output(t=i * sensor_dt + (time.perf_counter() - t_start))

    wall = time.perf_counter() - t_start - (t_compile or 0.0)
    # throughput over the frames THIS session processed (a resumed run only
    # executes n - start_frame of them; minus the compile frame)
    done = max(n - start_frame - 1, 1)
    print(f"compile: {t_compile or 0.0:.1f} s; "
          f"{done} frames in {wall:.1f} s = {done / max(wall, 1e-9):.1f} "
          f"scans/s (sensor rate {1.0 / sensor_dt:.0f} Hz)")

    # No silent caps: every lossy truncation in the run gets reported.
    if ring_dropped:
        print(f"WARNING: {ring_dropped} points total dropped by the "
              f"ring_width={cfg.ring_width} clamp (raise --ring-width)")
    if args.mapping:
        from liodom_tpu.mapping.grid import get_local_map
        map_ovf = int(mstate.overflow)
        if map_ovf:
            print(f"WARNING: {map_ovf} map points dropped at "
                  f"map_capacity={mcfg.map_capacity} (raise it)")
        _, _, n_hits = get_local_map(mstate, pose.t, mcfg,
                                     capacity=mcfg.local_map_capacity)
        loc_ovf = max(int(n_hits) - mcfg.local_map_capacity, 0)
        if loc_ovf:
            print(f"WARNING: local map truncated by {loc_ovf} points at the "
                  f"final pose (raise MapConfig.local_map_capacity)")

    est = np.stack(poses)[:, :3, :4]
    if args.results_dir:
        stats.write_results(args.results_dir)
        print(f"results in {args.results_dir}")
    if args.export_viz:
        from liodom_tpu.runtime.viz import save_trajectory_ply
        save_trajectory_ply(
            os.path.join(args.export_viz, "trajectory.ply"), est)
        print(f"viz in {args.export_viz}")

    gt = seq.gt_velo()
    if gt is not None:
        gt = gt[:n, :3, :4]
        print(f"ATE (rmse, unaligned): {ate_rmse(est, gt):.3f} m")
        t_err, r_err = rpe(est, gt, delta=1)
        print(f"RPE @1 frame: {t_err:.4f} m, {np.degrees(r_err):.4f} deg")
        if len(est) > 100:
            t_err, r_err = rpe(est, gt, delta=100)
            print(f"RPE @100 frames: {t_err:.3f} m, "
                  f"{np.degrees(r_err):.3f} deg")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
