#!/usr/bin/env python
"""Long-trajectory full-stack run on the unbounded streaming world.

The reference's entire evaluation protocol is LONG sequences — KITTI 00 is
4,541 frames of map growth and capacity pressure (stats.cc:75-95 exists to
score them).  No KITTI data exists in this environment, so the procedurally
-tiled :class:`StreamWorld` carries the load: geometry is generated around
the vehicle as it drives, the course never exits the scene, and exact
ground truth is free.

Full stack per frame (the deployed configuration): window 15, fused
odometry + hash-grid mapping with the adaptive local-map feedback at the
async cadence, optional simulated IMU.  Renders run in a background thread
pool (the sensor's job); the engine thread consumes in order.

Reports: ATE / RPE@1 / RPE@100 / drift %, sustained scans/s (wall and
engine-only), map leaf growth + distinct-cell count, and EVERY loss
counter (ring clamp, map overflow, local-map truncation) — the no-silent-
caps contract at trajectory scale.

Usage:
    python apps/run_longcourse.py --frames 1000
    python apps/run_longcourse.py --frames 1000 --chunk 10   # chained
"""

import argparse
import json
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
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--world", choices=["stream", "box"], default="stream",
                    help="box = the finite arena (debug control; exits the "
                    "scene past ~115 frames)")
    ap.add_argument("--width", type=int, default=1800)
    ap.add_argument("--noise", type=float, default=0.01)
    ap.add_argument("--speed", type=float, default=1.2, help="m/frame")
    ap.add_argument("--yaw-rate", type=float, default=0.004)
    ap.add_argument("--ring-width", type=int, default=4096)
    ap.add_argument("--local-map-size", type=int, default=15,
                    help="deployed window (launch/liodom.launch:23)")
    ap.add_argument("--map-capacity", type=int, default=1 << 20,
                    help="hash table rows; sized for ~1k-frame courses "
                    "(leaf growth reported; overflow counted+warned)")
    ap.add_argument("--local-map-capacity", type=int, default=32768)
    ap.add_argument("--local-map-every", type=int, default=4)
    ap.add_argument("--imu", action="store_true")
    ap.add_argument("--imu-noise", type=float, default=0.005)
    ap.add_argument("--chunk", type=int, default=1,
                    help="frames per device dispatch (chained lax.scan)")
    ap.add_argument("--render-workers", type=int, default=2)
    ap.add_argument("--sample-every", type=int, default=100,
                    help="frames between map-growth / truncation samples")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="save a resumable checkpoint (odom + map state + "
                    "trajectory) every --checkpoint-every frames; resumes "
                    "automatically when one exists")
    ap.add_argument("--checkpoint-every", type=int, default=500)
    ap.add_argument("--results-dir", default=None)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from liodom_tpu import LiodomConfig, MapConfig
    from liodom_tpu.core import pose as se3
    from liodom_tpu.core.synth import (StreamWorld, drive_trajectory,
                                       quat_from_matrix_np, rpy_matrix,
                                       yaw_matrix)
    from liodom_tpu.mapping import grid as G
    from liodom_tpu.mapping.service import (chained_combined_image_step,
                                            combined_image_step,
                                            init_combined)
    from liodom_tpu.odometry import pipeline as P
    from liodom_tpu.runtime import native

    n = args.frames
    cfg = LiodomConfig(local_map_size=args.local_map_size,
                       ring_width=args.ring_width, mapping=True,
                       use_imu=args.imu)
    mcfg = MapConfig(map_capacity=args.map_capacity,
                     local_map_capacity=args.local_map_capacity)
    pos, yaws = drive_trajectory(n, speed=args.speed,
                                 yaw_rate=args.yaw_rate)
    if args.world == "box":
        from liodom_tpu.core.synth import BoxWorld
        world = BoxWorld(seed=0)
    else:
        world = StreamWorld(seed=0)
        # objects keep clear of the course (see-through-wall frames when
        # the vehicle transits a building are physically inconsistent)
        world.set_keepout(pos[:, :2])
    rots = [yaw_matrix(y) for y in yaws]
    quats = np.stack([quat_from_matrix_np(r) for r in rots])

    imu_quats = None
    if args.imu:
        rng = np.random.default_rng(42)
        imu_quats = []
        for i in range(n):
            dq = quat_from_matrix_np(rpy_matrix(
                *(rng.normal(scale=args.imu_noise, size=3))))
            q = np.asarray(se3.quat_mul(
                jnp.asarray(dq), jnp.asarray(quats[i], jnp.float64)))
            imu_quats.append(np.asarray(q, np.float32))

    def make_frame(i):
        r = world.render(pos[i], rots[i], width=args.width,
                         noise=args.noise, seed=100 + i)
        img, counts, n_drop = native.split_velodyne_np(
            r, cfg.scan_lines, cfg.ring_width, cfg.min_range, cfg.max_range)
        return img, counts, n_drop

    state, mstate = init_combined(cfg, mcfg)

    from liodom_tpu.runtime import checkpoint as CK
    start_frame = 0
    resumed_poses = []
    if args.checkpoint_dir and CK.latest_step(args.checkpoint_dir) is not None:
        step_no, ck = CK.restore(
            args.checkpoint_dir,
            template={"odom_state": state, "map_state": mstate})
        state, mstate, start_frame = ck.odom_state, ck.map_state, \
            ck.frame_index
        for m in ck.trajectory:
            m44 = np.eye(4)
            m44[:3, :4] = m
            resumed_poses.append(m44)
        print(f"resumed from checkpoint step {step_no} "
              f"(frame {start_frame})")
        if start_frame >= n:
            print(f"checkpoint already covers frame {start_frame} >= "
                  f"--frames {n}; nothing to do (pass a larger --frames "
                  "to extend the course)")
            return 0

    pool = ThreadPoolExecutor(max_workers=args.render_workers)
    depth = max(args.render_workers * 2, args.chunk + 2)
    futures = {i: pool.submit(make_frame, i)
               for i in range(start_frame, min(start_frame + depth, n))}

    def get_frame(i):
        img, counts, n_drop = futures.pop(i).result()
        j = i + depth
        if j < n:
            futures[j] = pool.submit(make_frame, j)
        return img, counts, n_drop

    poses, ring_dropped = list(resumed_poses), 0
    growth = []          # (frame, valid_slots, distinct_cells, loc_hits)
    engine_s = 0.0
    next_ck = start_frame + args.checkpoint_every
    cbuf, pose_buf = [], []
    mat_of = jax.jit(lambda p: p.matrix())

    def flush_poses():
        """Fetch pending poses in ONE host round trip (a per-frame fetch
        costs ~70 ms of tunnel RPC and would measure the link)."""
        if not pose_buf:
            return
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *pose_buf)
        poses.extend(np.asarray(mat_of(stacked), np.float64))
        pose_buf.clear()

    t_start = time.perf_counter()
    t_compile = None
    for i in range(start_frame, n):
        img, counts, n_drop = get_frame(i)
        ring_dropped += n_drop
        t0 = time.perf_counter()
        if args.chunk > 1:
            cbuf.append((img, counts, i))
            if len(cbuf) == args.chunk:
                xs = jnp.asarray(np.stack([b[0] for b in cbuf]), jnp.float32)
                cs = jnp.asarray(np.stack([b[1] for b in cbuf]), jnp.int32)
                qs = None
                if imu_quats is not None:
                    # per-frame IMU orientations ride the scan (each frame
                    # must see ITS quat, not the chunk's last)
                    qs = jnp.asarray(
                        np.stack([imu_quats[b[2]] for b in cbuf]))
                state, mstate, cps, _ = chained_combined_image_step(
                    state, mstate, xs, cs, cfg, mcfg, step0=cbuf[0][2],
                    local_map_every=args.local_map_every, imu_quats=qs)
                poses.extend(np.asarray(mat_of(cps), np.float64))
                cbuf.clear()
            elif i == n - 1:
                # remainder tail: per-frame step — a K'-sized chained trace
                # would recompile the heaviest program for a one-off chunk
                for bimg, bcounts, bi in cbuf:
                    if imu_quats is not None:
                        state = P.set_imu(state, jnp.asarray(imu_quats[bi]))
                    state, mstate, pose, _ = combined_image_step(
                        state, mstate, jnp.asarray(bimg, jnp.float32),
                        jnp.asarray(bcounts, jnp.int32), cfg, mcfg,
                        step=jnp.int32(bi),
                        local_map_every=args.local_map_every)
                    poses.append(np.asarray(mat_of(pose), np.float64))
                cbuf.clear()
        else:
            if imu_quats is not None:
                state = P.set_imu(state, jnp.asarray(imu_quats[i]))
            state, mstate, pose, _ = combined_image_step(
                state, mstate, jnp.asarray(img, jnp.float32),
                jnp.asarray(counts, jnp.int32), cfg, mcfg,
                step=jnp.int32(i),
                local_map_every=args.local_map_every)
            pose_buf.append(pose)
            if (i + 1) % 50 == 0 or i == n - 1 or i == 0:
                flush_poses()
        dt0 = time.perf_counter() - t0
        if t_compile is None and poses:
            t_compile = time.perf_counter() - t_start
        else:
            engine_s += dt0     # engine time excl. the compile frame
        if (args.checkpoint_dir is not None and len(cbuf) == 0
                and (i + 1) >= next_ck):
            flush_poses()
            CK.save(args.checkpoint_dir, i + 1, CK.EngineCheckpoint(
                state, mstate, np.stack(poses)[:, :3, :4], i + 1))
            next_ck = i + 1 + args.checkpoint_every
        if (i + 1) % args.sample_every == 0 or i == n - 1:
            flush_poses()
            p_t = jnp.asarray(poses[-1][:3, 3], jnp.float32) \
                if poses else jnp.zeros(3)
            _, _, n_hits = G.get_local_map(
                mstate, p_t, mcfg, capacity=mcfg.local_map_capacity)
            growth.append((i + 1, int(mstate.valid.sum()),
                           G.count_cells(mstate), int(n_hits)))
            print(f"frame {i + 1:5d}: map leaves {growth[-1][1]:8d} "
                  f"({100.0 * growth[-1][1] / mcfg.map_capacity:4.1f}% "
                  f"load), cells {growth[-1][2]:4d}, local-map hits "
                  f"{growth[-1][3]:6d}, overflow {int(mstate.overflow)}",
                  flush=True)
    pool.shutdown(wait=False)
    wall = time.perf_counter() - t_start

    est = np.stack(poses)                        # (n, 4, 4)
    gt = np.stack([np.block([[rots[i], pos[i][:, None]],
                             [np.zeros((1, 3)), np.ones((1, 1))]])
                   for i in range(n)])
    errs = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
    ate = float(np.sqrt(np.mean(errs ** 2)))

    from liodom_tpu.runtime.stats import rpe
    t1, r1 = rpe(est[:, :3, :4], gt[:, :3, :4], delta=1)
    drift_pct = None
    if n > 100:
        t100, r100 = rpe(est[:, :3, :4], gt[:, :3, :4], delta=100)
        dist100 = np.linalg.norm(gt[100:, :3, 3] - gt[:-100, :3, 3], axis=1)
        rel = np.linalg.norm((est[100:, :3, 3] - est[:-100, :3, 3])
                             - (gt[100:, :3, 3] - gt[:-100, :3, 3]), axis=1)
        drift_pct = float(100.0 * np.mean(rel / np.maximum(dist100, 1e-9)))

    map_overflow = int(mstate.overflow)
    # truncation gate over EVERY sample, not just the last — a mid-course
    # density peak must not pass silently
    loc_trunc = max((max(g[3] - mcfg.local_map_capacity, 0)
                     for g in growth), default=0)
    course_m = float(np.sum(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0),
                                           axis=1)))
    done = n - start_frame
    print(f"\nlong course: {n} frames ({done} this run), {course_m:.0f} m, "
          f"wall {wall:.0f} s = {done / wall:.1f} scans/s end-to-end "
          f"({done / max(engine_s, 1e-9):.1f} scans/s engine-only; "
          f"compile {t_compile or 0:.1f} s)")
    print(f"ATE {ate:.3f} m; RPE@1 {t1:.4f} m / {np.degrees(r1):.4f} deg"
          + (f"; RPE@100 {t100:.2f} m, drift {drift_pct:.2f} %"
             if drift_pct is not None else ""))
    print(f"map: {growth[-1][1]} leaves ({100.0 * growth[-1][1] / mcfg.map_capacity:.1f}% "
          f"load), {growth[-1][2]} cells; overflow {map_overflow}; "
          f"ring drops {ring_dropped}; local-map truncation {loc_trunc}")
    if args.results_dir:
        from liodom_tpu.runtime.stats import Stats
        st = Stats()
        for m in est:
            st.add_pose(m)
        st.write_results(args.results_dir)
    if args.json:
        print(json.dumps({
            "frames": n, "course_m": round(course_m, 1),
            "ate_m": round(ate, 4), "rpe1_m": round(float(t1), 5),
            "drift_pct": None if drift_pct is None else round(drift_pct, 3),
            "scans_per_s": round(done / wall, 2),
            "engine_scans_per_s": round(done / max(engine_s, 1e-9), 2),
            "map_leaves": growth[-1][1], "map_cells": growth[-1][2],
            "map_load_pct": round(
                100.0 * growth[-1][1] / mcfg.map_capacity, 2),
            "map_overflow": map_overflow, "ring_dropped": ring_dropped,
            "local_map_truncation": loc_trunc,
        }))
    # the gate: no uncounted loss, bounded drift
    ok = map_overflow == 0 and loc_trunc == 0
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
