#!/usr/bin/env python
"""Benchmark: full odometry pipeline throughput on one TPU chip.

Prints one JSON line PER CONFIG as soon as it is measured (flush=True), then
a final consolidated line — so a timeout still leaves the primary metric in
the tail (VERDICT r2 #1).  The final line carries every metric:
{"metric", "value", "unit", "vs_baseline", "combined_*"}.

Baseline: the reference runs on a desktop CPU and its own real-time criterion
is keeping up with the 10 Hz KITTI Velodyne stream (laser_odometry.cc:253-256
warns below 0.8x input rate; BASELINE.md).  The repo publishes no faster
number, so vs_baseline is measured scans/s divided by the 10 scans/s the
reference is engineered to sustain.

Compile discipline: the persistent compilation cache is enabled (warm
containers skip XLA entirely), and the two throughput configs share ONE
combined program — the `local_map_every=4` cadence program serves the
every-frame case too by pinning the step counter to 0 (step is a traced
operand, so no retrace).

Time discipline: the remote TPU compile/load service has high latency
variance (a cold combined-program compile was observed anywhere between
20 s and 580 s).  The bench runs under a wall budget
(``LIODOM_BENCH_BUDGET_S``, default 520 s): each phase starts only if the
remaining budget plausibly covers its worst warm-path cost, otherwise it is
skipped with a note — the process always exits 0 with a final consolidated
JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from liodom_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_SCANS_PER_S = 10.0  # reference real-time target (BASELINE.md)
BUDGET_S = float(os.environ.get("LIODOM_BENCH_BUDGET_S", "520"))
# chained lax.scan stepping is bit-exact vs the per-frame loop on TPU
# (tests/test_chained.py); anything past float32-reassociation scale means
# a carry bug and the chained throughput row must not be published
CHAIN_PARITY_TOL_M = 1e-3


def main():
    from liodom_tpu import LiodomConfig
    from liodom_tpu.core.config import MapConfig
    from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
    from liodom_tpu.odometry import pipeline as P
    from liodom_tpu.mapping.service import combined_image_step, init_combined

    from liodom_tpu.runtime import native

    t_start = time.perf_counter()
    # ring_width = the lossless 4096 default (config.py).  Through round 4
    # the bench ran 2048 and silently dropped ~4.5k points/frame — the
    # Velodyne elevation formulas merge adjacent laser rows into one ring,
    # so a ring can hold ~2x the azimuth width (run_synthetic's ring-width
    # note).  Zero-loss is now ASSERTED per frame; round-5+ numbers are
    # therefore measured on a strictly larger frame than rounds <= 4.
    cfg = LiodomConfig(local_map_size=5)
    # Right-size the received-local-map buffer to the course's neighbourhood
    # density (~6.5k leaf hits): padding rows beyond n_hits still pay the
    # per-frame spatial sort + kNN wrapper, and 65536 -> 16384 measured
    # 113 -> 130 scans/s (every-frame) / 124 -> 137 (async) with EXACT pose
    # parity and zero truncation (scripts/combined_capacity_sweep.py).
    # Losslessness is checked below at EVERY bench pose against the final
    # map (a superset of each frame's map, so a pass is a sound proof) and
    # a truncation emits a warning line — fixed-shape capacity planning is
    # a deployment decision, not a bench shortcut (the reference's
    # unbounded getLocalMap has no equivalent knob, map.cc:141-189).
    # map_capacity: the capacity curve is NON-monotonic (round 5, combined
    # context at the lossless frame width: 131072 -> 127.9, 262144 ->
    # 121.6, 524288 -> 132.0 scans/s; the isolated epilogue sweep shows
    # the same dip at 262k — scripts/map_epilogue_sweep.py).  524288 wins
    # outright AND carries 4x the long-course headroom, so it is adopted;
    # the round-4 "right-size to ~30% load" story (131072 beating 262144)
    # was real but read the wrong mechanism — probe-round count falls with
    # load and the C-sized passes are cheap, so BIGGER tables win except
    # at the 262k dip (NOT hash quality: a murmur3-finalizer mix
    # reproduces it bit-for-bit in time, scripts/hash_mix_probe.py).
    # Overflow is counted on-device, warned below.
    mcfg = MapConfig(local_map_capacity=16384, map_capacity=524288)
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
        img, counts, n_drop = native.split_velodyne(
            scan.astype(np.float32), cfg.scan_lines, cfg.ring_width,
            cfg.min_range, cfg.max_range)
        assert n_drop == 0, (
            f"bench ring_width={cfg.ring_width} dropped {n_drop} points")
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

    # the primary metric lands in the output NOW — a later timeout cannot
    # erase it
    print(json.dumps({
        "metric": "odometry_scans_per_s_1chip",
        "value": round(scans_per_s, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_s / BASELINE_SCANS_PER_S, 2),
        "partial": "odometry-only; combined configs follow",
    }), flush=True)

    remaining = lambda: BUDGET_S - (time.perf_counter() - t_start)

    # --- chained K-frames-per-dispatch odometry (VERDICT r4 #1): the same
    # sequentially-dependent per-frame math expressed as ONE lax.scan
    # dispatch per K frames, amortizing the ~1.1 ms host dispatch floor
    # (BENCH_STAGES.json) that is ~24% of the per-frame step on this
    # tunneled backend.  Parity vs the per-frame loop is GATED here on the
    # full course (divergence > CHAIN_PARITY_TOL_M drops the row from the
    # final line) and per-frame in tests/test_chained.py.
    chained_per_s = None
    chain_k = 12
    n_total = n_warm + n_bench
    if remaining() > 80.0:
        all_imgs = jnp.stack([s[0] for s in scans])
        all_cnts = jnp.stack([s[1] for s in scans])
        chunks = [(all_imgs[j:j + chain_k], all_cnts[j:j + chain_k])
                  for j in range(0, n_total, chain_k)]
        stc = P.init_state(cfg)
        for ch in chunks:      # compile+warm AND the parity pass
            stc, cps, _ = P.chained_image_step(stc, ch[0], ch[1], cfg)
        chain_err = float(np.linalg.norm(
            np.asarray(cps.t)[-1] - np.asarray(pose.t)))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            for ch in chunks:
                stc, cps, _ = P.chained_image_step(stc, ch[0], ch[1], cfg)
        np.asarray(cps.t)
        chained_per_s = reps * n_total / (time.perf_counter() - t0)
        row = {
            "metric": "odometry_scans_per_s_chained",
            "value": round(chained_per_s, 2),
            "unit": "scans/s",
            "vs_baseline": round(chained_per_s / BASELINE_SCANS_PER_S, 2),
            "chunk": chain_k,
            "final_pose_err_vs_per_frame_m": round(chain_err, 6),
            "partial": f"odometry-only, {chain_k} frames per device "
                       "dispatch (lax.scan)",
        }
        if chain_err > CHAIN_PARITY_TOL_M:
            # a numerically wrong program must not publish a throughput
            # win: flag the row and keep it out of the consolidated line
            row["parity_failed"] = True
            print(f"WARNING: chained odometry diverged from the per-frame "
                  f"loop by {chain_err:.4f} m (> {CHAIN_PARITY_TOL_M} m); "
                  "chained row excluded from the final line",
                  file=sys.stderr, flush=True)
            chained_per_s = None
        print(json.dumps(row), flush=True)

    # --- deployed-config odometry: the reference's SHIPPED window is
    # prev_frames=15 (launch/liodom.launch:23; params.cc:90-93 only
    # defaults to 5) and run_kitti.py defaults to 15 too — so the headline
    # number must exist for this window as well (VERDICT r3 #2).  Same
    # scans, one extra compile (the window shape changes the program).
    window15_per_s = None
    if remaining() > 90.0:
        cfg15 = cfg.replace(local_map_size=15)
        state15 = P.init_state(cfg15)
        for i in range(n_warm):
            state15, pose15, _ = P.image_step(state15, scans[i][0],
                                              scans[i][1], cfg15)
        np.asarray(pose15.t)
        t0 = time.perf_counter()
        for i in range(n_warm, n_warm + n_bench):
            state15, pose15, _ = P.image_step(state15, scans[i][0],
                                              scans[i][1], cfg15)
        np.asarray(pose15.t)
        window15_per_s = n_bench / (time.perf_counter() - t0)
        print(json.dumps({
            "metric": "odometry_scans_per_s_window15",
            "value": round(window15_per_s, 2),
            "unit": "scans/s",
            "vs_baseline": round(window15_per_s / BASELINE_SCANS_PER_S, 2),
            "partial": "odometry-only at the deployed local_map_size=15 "
                       "(launch/liodom.launch:23)",
        }), flush=True)

    # --- Ouster-mode odometry (liodom_ouster.launch:19-33): row-organized
    # clouds, loader-split via split_ouster_np (rows ARE rings,
    # feature_extractor.cc:158-175).  Same device program shape as the
    # Velodyne path (the split is the loader's job), but its own compile:
    # cfg carries lidar_type=1.  BoxWorld renders ring-major, so a reshape
    # IS the organized cloud an Ouster driver emits (apps/run_ouster.py).
    ouster_per_s = None
    if remaining() > 120.0:
        ocfg = cfg.replace(lidar_type=1, laser_frame="")
        oscans = []
        for i in range(n_warm + n_bench):
            org = world.render(pos[i], yaw_matrix(yaws[i]), width=1800,
                               noise=0.01, seed=i).reshape(64, 1800, 3)
            img, counts, n_drop = native.split_ouster_np(
                org, ocfg.ring_width, ocfg.min_range, ocfg.max_range)
            assert n_drop == 0
            oscans.append((jnp.asarray(img), jnp.asarray(counts)))
        ostate = P.init_state(ocfg)
        for i in range(n_warm):
            ostate, opose, _ = P.image_step(ostate, oscans[i][0],
                                            oscans[i][1], ocfg)
        np.asarray(opose.t)
        t0 = time.perf_counter()
        for i in range(n_warm, n_warm + n_bench):
            ostate, opose, _ = P.image_step(ostate, oscans[i][0],
                                            oscans[i][1], ocfg)
        np.asarray(opose.t)
        ouster_per_s = n_bench / (time.perf_counter() - t0)
        print(json.dumps({
            "metric": "ouster_scans_per_s",
            "value": round(ouster_per_s, 2),
            "unit": "scans/s",
            "vs_baseline": round(ouster_per_s / BASELINE_SCANS_PER_S, 2),
            "partial": "Ouster-mode (lidar_type=1, organized rows, "
                       "loader-split), odometry-only",
        }), flush=True)

    # --- fused odometry + mapping (liodom_node + liodom_mapping together).
    # ONE compiled program (local_map_every=4) serves both cadences:
    # step=0 every frame -> the cond always refreshes (per-message mapper);
    # step=i -> refresh every 4th frame (the reference's async-mapper
    # cadence: second process, latched topic, odometer consumes the map it
    # received last, laser_odometry.cc:276-279).
    def combined_run(every_frame: bool):
        from liodom_tpu.mapping import grid as G
        co, cm = init_combined(ccfg, mcfg)
        cposes = []
        for i in range(n_warm):
            co, cm, cpose, _ = combined_image_step(
                co, cm, scans[i][0], scans[i][1], ccfg, mcfg,
                step=0 if every_frame else i, local_map_every=4)
            cposes.append(cpose)
        np.asarray(cpose.t)
        t0 = time.perf_counter()
        for i in range(n_warm, n_warm + n_bench):
            co, cm, cpose, _ = combined_image_step(
                co, cm, scans[i][0], scans[i][1], ccfg, mcfg,
                step=0 if every_frame else i, local_map_every=4)
            cposes.append(cpose)
        np.asarray(cpose.t)
        dt = time.perf_counter() - t0
        # Losslessness of the right-sized buffer over the WHOLE run, not
        # just the final pose: n_hits(final map, pose_i) >= n_hits(map_i,
        # pose_i) for every i (the map only grows), so the max over all
        # poses against the final map is a sound upper bound on every
        # truncation the run could have hit.  Checked outside the timed
        # region.
        n_hits = max(int(G.get_local_map(cm, p.t, mcfg,
                                         capacity=mcfg.local_map_capacity)[2])
                     for p in cposes)
        if n_hits > mcfg.local_map_capacity:
            print(json.dumps({
                "warning": "local map truncated during combined bench",
                "max_hits": n_hits,
                "local_map_capacity": mcfg.local_map_capacity,
            }), flush=True)
        if int(cm.overflow) > 0:
            print(json.dumps({
                "warning": "map insert overflow during combined bench",
                "overflow": int(cm.overflow),
                "map_capacity": mcfg.map_capacity,
            }), flush=True)
        return n_bench / dt, n_hits, np.asarray(cpose.t)

    # Budget guard: the combined program's first call costs ~16 s on a
    # persistent-cache hit but has been observed at 580+ s on a cold remote
    # compile; only enter each phase with clear headroom so a slow backend
    # degrades the artifact (skipped combined lines) instead of killing it.
    combined_per_s = combined_async_per_s = None
    hits = None
    async_final_t = None
    if remaining() > 60.0:
        combined_per_s, hits, _ = combined_run(every_frame=True)
        print(json.dumps({
            "metric": "combined_scans_per_s_1chip",
            "value": round(combined_per_s, 2),
            "unit": "scans/s",
            "vs_baseline": round(combined_per_s / BASELINE_SCANS_PER_S, 2),
            "local_map_hits": hits,
            "local_map_capacity": mcfg.local_map_capacity,
            "lossless": hits <= mcfg.local_map_capacity,
            "partial": "odometry+mapping fused, local map every frame",
        }), flush=True)
    if combined_per_s is not None and remaining() > 20.0:
        # same compiled program — only the measurement loop remains
        combined_async_per_s, _, async_final_t = combined_run(
            every_frame=False)

    # --- chained combined (odometry+mapping, K frames per dispatch) at the
    # async local-map cadence; parity vs the per-frame async run asserted
    # on the final pose (step0 carries the cadence counter across chunks).
    # PROTOCOL: reps of (fresh init -> full course) for BOTH the chained
    # and a per-frame control — per-frame map cost depends on map load
    # (probe rounds + local-map density), so re-traversing a CONVERGED map
    # is a ~2x slower regime than the first traversal the other combined
    # rows measure; same-protocol control keeps the comparison honest
    # (scripts/chained_combined_probe.py, round 5).
    combined_chained_per_s = pf_same_proto = None
    if async_final_t is not None and remaining() > 70.0:
        from liodom_tpu.mapping.service import chained_combined_image_step
        all_imgs = jnp.stack([s[0] for s in scans])
        all_cnts = jnp.stack([s[1] for s in scans])
        chunks = [(all_imgs[j:j + chain_k], all_cnts[j:j + chain_k], j)
                  for j in range(0, n_total, chain_k)]

        def chained_course():
            co, cm = init_combined(ccfg, mcfg)
            for cx, cc, j in chunks:
                co, cm, cps, _ = chained_combined_image_step(
                    co, cm, cx, cc, ccfg, mcfg, step0=j, local_map_every=4)
            np.asarray(cps.t)
            return cps

        def per_frame_course():
            co, cm = init_combined(ccfg, mcfg)
            for i in range(n_total):
                co, cm, cp, _ = combined_image_step(
                    co, cm, scans[i][0], scans[i][1], ccfg, mcfg,
                    step=i, local_map_every=4)
            np.asarray(cp.t)

        cps = chained_course()          # compile+warm AND the parity pass
        chain_err = float(np.linalg.norm(
            np.asarray(cps.t)[-1] - async_final_t))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            chained_course()
        combined_chained_per_s = reps * n_total / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        for _ in range(reps):
            per_frame_course()          # program already compiled above
        pf_same_proto = reps * n_total / (time.perf_counter() - t0)
        row = {
            "metric": "combined_scans_per_s_chained",
            "value": round(combined_chained_per_s, 2),
            "unit": "scans/s",
            "vs_baseline": round(
                combined_chained_per_s / BASELINE_SCANS_PER_S, 2),
            "chunk": chain_k,
            "per_frame_same_protocol": round(pf_same_proto, 2),
            "final_pose_err_vs_per_frame_m": round(chain_err, 6),
            "partial": f"odometry+mapping fused, {chain_k} frames per "
                       "dispatch, async local-map cadence (every 4); "
                       "protocol = fresh init + full course per rep",
        }
        if chain_err > CHAIN_PARITY_TOL_M:
            row["parity_failed"] = True
            print(f"WARNING: chained combined course diverged from the "
                  f"per-frame loop by {chain_err:.4f} m "
                  f"(> {CHAIN_PARITY_TOL_M} m); row excluded from the "
                  "final line", file=sys.stderr, flush=True)
            combined_chained_per_s = None
        print(json.dumps(row), flush=True)

    # --- multi-sequence batched odometry (VERDICT r3 #1): B independent
    # sequences per step via the batched Pallas kernels (custom_vmap routes
    # — knn_coords_pallas_batched, ring-folded select/smoothness).  Round 3
    # ANTI-scaled (B=2 -> 0.75x aggregate, README dead end (b)); the honest
    # ceiling now is ~linear aggregate: the per-sequence frame is VPU-
    # compute-bound (the merge passes of the kNN kernel run near VPU peak;
    # see scripts/batch_stage_probe.py + README), so batching removes the
    # anti-scaling and the per-program overhead (~0.3 ms/frame), not the
    # compute.  Lanes all replay the bench sequence — identical compute per
    # lane, so aggregate scans/s is shape-honest.
    batched_agg = {}
    for bsz in (4, 8):
        if remaining() <= 90.0:
            break
        from liodom_tpu.parallel.sharded import init_batch_state
        states = init_batch_state(cfg, bsz)
        imgs_b = [jnp.broadcast_to(scans[i][0], (bsz,) + scans[i][0].shape)
                  for i in range(n_warm + n_bench)]
        cnts_b = [jnp.broadcast_to(scans[i][1], (bsz,) + scans[i][1].shape)
                  for i in range(n_warm + n_bench)]
        for i in range(n_warm):
            states, bposes, _ = P.batch_image_step(states, imgs_b[i],
                                                   cnts_b[i], cfg)
        np.asarray(bposes.t)
        t0 = time.perf_counter()
        for i in range(n_warm, n_warm + n_bench):
            states, bposes, _ = P.batch_image_step(states, imgs_b[i],
                                                   cnts_b[i], cfg)
        np.asarray(bposes.t)
        agg = bsz * n_bench / (time.perf_counter() - t0)
        batched_agg[bsz] = agg
        print(json.dumps({
            "metric": f"batched_odometry_scans_per_s_B{bsz}",
            "value": round(agg, 2),
            "unit": "scans/s aggregate",
            "vs_baseline": round(agg / BASELINE_SCANS_PER_S, 2),
            "x_over_solo": round(agg / scans_per_s, 2),
            "partial": f"{bsz} sequences per step, batched Pallas kernels",
        }), flush=True)

    final = {
        "metric": "odometry_scans_per_s_1chip",
        "value": round(scans_per_s, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_s / BASELINE_SCANS_PER_S, 2),
        "bench_wall_s": round(time.perf_counter() - t_start, 1),
        "note": "vs_baseline = measured scans/s over the 10 Hz sensor rate "
                "the reference CPU stack is engineered to sustain "
                "(laser_odometry.cc:253-256); the ROS stack itself cannot "
                "run in this environment. Per-stage device times: "
                "BENCH_STAGES.json / bench_stages.py.",
    }
    if window15_per_s is not None:
        final["window15_scans_per_s"] = round(window15_per_s, 2)
    if chained_per_s is not None:
        final["chained_scans_per_s"] = round(chained_per_s, 2)
    if ouster_per_s is not None:
        final["ouster_scans_per_s"] = round(ouster_per_s, 2)
    if combined_chained_per_s is not None:
        final["combined_chained_scans_per_s"] = round(
            combined_chained_per_s, 2)
        final["combined_chained_pf_control"] = round(pf_same_proto, 2)
    for bsz, agg in batched_agg.items():
        final[f"batched_B{bsz}_scans_per_s"] = round(agg, 2)
    if combined_per_s is not None:
        final["combined_scans_per_s"] = round(combined_per_s, 2)
        final["combined_vs_baseline"] = round(
            combined_per_s / BASELINE_SCANS_PER_S, 2)
    else:
        final["combined_skipped"] = "wall budget exhausted (slow backend)"
    if combined_async_per_s is not None:
        final["combined_async_scans_per_s"] = round(combined_async_per_s, 2)
    print(json.dumps(final), flush=True)


if __name__ == "__main__":
    main()
