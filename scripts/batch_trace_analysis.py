#!/usr/bin/env python
"""Settle the flat-batching question with device-trace evidence (VERDICT
r4 #2): is the ~linear batched aggregate VPU saturation or sequential-grid
serialization?

Method: capture ``jax.profiler`` traces of N solo odometry steps and N
B=8 batched steps, parse the XLA-op timeline out of the xplane protos
(tensorflow.tsl.profiler.protobuf), and compare per-op DEVICE time:

* if batched device-busy time ~= B x solo for the Pallas kernels, the
  batch is executed as B serialized grid programs — per-grid-step work is
  what it is, and flat aggregate follows REGARDLESS of occupancy;
* the kNN kernel's achieved op rate vs the VPU f32 anchor then says
  whether those serialized grid steps are themselves near peak (compute-
  bound — nothing left to take) or under-occupied (batch-folding into
  wider tiles would win).

VPU anchor derivation (public v5e specs; no FMA credit since the merge
passes are compare/select): 8x128 lanes x 4 ALUs x 0.94 GHz =
3.85e12 ops/s.

Writes BATCH_TRACE.json next to BENCH_STAGES.json; the README batching
section cites it.
"""

import glob
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from liodom_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp

VPU_F32_OPS = 8 * 128 * 4 * 0.94e9       # 3.85e12, see docstring
REPS = int(os.environ.get("TRACE_REPS", "10"))


def parse_xspace(logdir):
    """Aggregate device-side op durations (ps) by op name across all TPU
    planes: {op_name: total_ps}, plus the total busy ps."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    per_op = defaultdict(int)
    for p in paths:
        space = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                # XLA op lines carry per-op events; module/step/trace lines
                # would double-count the same time, so keep only op lines
                if line.name not in ("XLA Ops", "Ops"):
                    continue
                for ev in line.events:
                    per_op[meta.get(ev.metadata_id,
                                    str(ev.metadata_id))] += ev.duration_ps
    return dict(per_op)


def trace_run(tag, fn, close):
    td = tempfile.mkdtemp(prefix=f"trace_{tag}_")
    fn()          # warm outside the trace
    close()
    jax.profiler.start_trace(td)
    t0 = time.perf_counter()
    for _ in range(REPS):
        fn()
    close()
    wall_ms = (time.perf_counter() - t0) * 1e3 / REPS
    jax.profiler.stop_trace()
    ops = parse_xspace(td)
    return wall_ms, ops


def top(ops, n=12):
    rows = sorted(ops.items(), key=lambda kv: -kv[1])[:n]
    return [(name[:70], round(ps / 1e9 / REPS, 3)) for name, ps in rows]


def main():
    from liodom_tpu import LiodomConfig
    from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
    from liodom_tpu.odometry import pipeline as P
    from liodom_tpu.parallel.sharded import init_batch_state
    from liodom_tpu.runtime import native

    cfg = LiodomConfig(local_map_size=5)
    world = BoxWorld(seed=0)
    n = 10
    pos, yaws = drive_trajectory(n, speed=1.2, yaw_rate=0.01)
    scans = []
    for i in range(n):
        scan = world.render(pos[i], yaw_matrix(yaws[i]), width=1800,
                            noise=0.01, seed=i)
        img, counts, _ = native.split_velodyne_np(
            scan.astype(np.float32), cfg.scan_lines, cfg.ring_width,
            cfg.min_range, cfg.max_range)
        scans.append((jnp.asarray(img), jnp.asarray(counts)))

    # ---- solo ----
    st = {"s": P.init_state(cfg), "i": 0, "p": None}

    def solo():
        i = st["i"] % n
        st["s"], pose, _ = P.image_step(st["s"], scans[i][0], scans[i][1],
                                        cfg)
        st["i"] += 1
        st["p"] = pose

    solo_wall, solo_ops = trace_run("solo", solo,
                                    lambda: np.asarray(st["p"].t)
                                    if st["p"] is not None else None)

    # ---- batched B=8 ----
    B = 8
    bst = {"s": init_batch_state(cfg, B), "i": 0, "p": None}
    imgs_b = [jnp.broadcast_to(s[0], (B,) + s[0].shape) for s in scans]
    cnts_b = [jnp.broadcast_to(s[1], (B,) + s[1].shape) for s in scans]

    def batched():
        i = bst["i"] % n
        bst["s"], poses, _ = P.batch_image_step(bst["s"], imgs_b[i],
                                                cnts_b[i], cfg)
        bst["i"] += 1
        bst["p"] = poses

    bat_wall, bat_ops = trace_run("b8", batched,
                                  lambda: np.asarray(bst["p"].t)
                                  if bst["p"] is not None else None)

    solo_busy = sum(solo_ops.values()) / 1e9 / REPS     # ms per step
    bat_busy = sum(bat_ops.values()) / 1e9 / REPS

    def fused_time(ops, *keys):
        """Total ms/step of ops whose name contains any key."""
        tot = 0
        for name, ps in ops.items():
            if any(k in name.lower() for k in keys):
                tot += ps
        return tot / 1e9 / REPS

    knn_solo = fused_time(solo_ops, "knn")
    knn_bat = fused_time(bat_ops, "knn")
    out = {
        "reps": REPS, "batch": 8,
        "solo_wall_ms": round(solo_wall, 3),
        "batched_wall_ms": round(bat_wall, 3),
        "solo_device_busy_ms": round(solo_busy, 3),
        "batched_device_busy_ms": round(bat_busy, 3),
        "busy_ratio_b8_over_solo": round(bat_busy / max(solo_busy, 1e-9), 2),
        "knn_solo_ms": round(knn_solo, 3),
        "knn_b8_ms": round(knn_bat, 3),
        "knn_ratio": round(knn_bat / max(knn_solo, 1e-9), 2),
        "vpu_f32_anchor_ops_s": VPU_F32_OPS,
        "solo_top_ops_ms": top(solo_ops),
        "batched_top_ops_ms": top(bat_ops),
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "BATCH_TRACE.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
