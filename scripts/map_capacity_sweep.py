#!/usr/bin/env python
"""Hash-table capacity sweep for the combined (odometry + mapping) path.

update_map's cost has a C-sized component (the elementwise key/valid decode
over the probe table and the C-row scatter target), and the quadratic probe
degrades as load factor rises — so map_capacity has an interior optimum.
Measured round 4 (one v5e chip, bench course, 36 frames, ~39k occupied
leaves, step/cadence program local_map_every=4 pinned to every-frame):

    C=262144: 127.7 scans/s  (15% load — pays C-sized passes)
    C=131072: 142.5 scans/s  (30% load — the sweet spot, +12%)
    C= 65536: 123.8 scans/s  (59% load — probe rounds blow up)

with BIT-EXACT pose parity across all three and zero overflow.  bench.py
adopts 131072; deployments size C to the course (overflow is counted
on-device and must be reported — no silent caps).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from liodom_tpu.runtime.cache import enable_persistent_cache
enable_persistent_cache()
import numpy as np, jax, jax.numpy as jnp
from liodom_tpu import LiodomConfig
from liodom_tpu.core.config import MapConfig
from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
from liodom_tpu.mapping.service import combined_image_step, init_combined
from liodom_tpu.mapping import grid as G
from liodom_tpu.runtime import native

cfg = LiodomConfig(local_map_size=5, ring_width=2048).replace(mapping=True)
world = BoxWorld(seed=0)
n_warm, n_bench = 6, 30
pos, yaws = drive_trajectory(n_warm + n_bench, speed=1.2, yaw_rate=0.01)
scans = []
for i in range(n_warm + n_bench):
    scan = world.render(pos[i], yaw_matrix(yaws[i]), width=1800, noise=0.01, seed=i)
    img, counts, _ = native.split_velodyne(scan.astype(np.float32), cfg.scan_lines, cfg.ring_width, cfg.min_range, cfg.max_range)
    scans.append((jnp.asarray(img), jnp.asarray(counts)))

ref_traj = None
for cap_total in (262144, 131072, 65536):
    mcfg = MapConfig(local_map_capacity=16384, map_capacity=cap_total)
    co, cm = init_combined(cfg, mcfg)
    traj = []
    for i in range(n_warm):
        co, cm, cpose, _ = combined_image_step(co, cm, scans[i][0], scans[i][1], cfg, mcfg, step=0, local_map_every=4)
        traj.append(cpose)
    np.asarray(cpose.t)
    t0 = time.perf_counter()
    for i in range(n_warm, n_warm + n_bench):
        co, cm, cpose, _ = combined_image_step(co, cm, scans[i][0], scans[i][1], cfg, mcfg, step=0, local_map_every=4)
        traj.append(cpose)
    np.asarray(cpose.t)
    dt = time.perf_counter() - t0
    tr = np.stack([np.asarray(p.t) for p in traj])
    if ref_traj is None: ref_traj = tr
    err = float(np.abs(tr - ref_traj).max())
    print(f"C={cap_total}: {n_bench/dt:.1f} scans/s  overflow={int(cm.overflow)} valid={int(cm.valid.sum())} max|t-t_C262k|={err:.2e}", flush=True)
