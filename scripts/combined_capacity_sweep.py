#!/usr/bin/env python
"""Combined-path sweep: local_map_capacity sizing x local_map_every cadence.

The received local map is a FIXED-SHAPE buffer concatenated into the
matching map every frame; rows beyond n_hits are padding that still pays
spatial sort + kNN wrapper cost.  On the bench course n_hits ~ 6k, so the
default 65536 carries ~10x padding.  This measures right-sized capacities
(lossless while n_hits < capacity — asserted via the n_hits channel).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from liodom_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax.numpy as jnp

from liodom_tpu import LiodomConfig
from liodom_tpu.core.config import MapConfig
from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
from liodom_tpu.mapping.service import combined_image_step, init_combined
from liodom_tpu.mapping import grid as G
from liodom_tpu.runtime import native


def main():
    cfg = LiodomConfig(local_map_size=5, mapping=True, ring_width=2048)
    world = BoxWorld(seed=0)
    n_warm, n_bench = 6, 30
    n = n_warm + n_bench
    pos, yaws = drive_trajectory(n, speed=1.2, yaw_rate=0.01)
    scans = []
    for i in range(n):
        scan = world.render(pos[i], yaw_matrix(yaws[i]), width=1800,
                            noise=0.01, seed=i)
        img, counts, _ = native.split_velodyne(
            scan.astype(np.float32), cfg.scan_lines, cfg.ring_width,
            cfg.min_range, cfg.max_range)
        scans.append((jnp.asarray(img), jnp.asarray(counts)))

    def run(cap, every):
        mcfg = MapConfig(local_map_capacity=cap)
        co, cm = init_combined(cfg, mcfg)
        for i in range(n_warm):
            co, cm, cpose, _ = combined_image_step(
                co, cm, scans[i][0], scans[i][1], cfg, mcfg,
                step=i, local_map_every=every)
        np.asarray(cpose.t)
        t0 = time.perf_counter()
        for i in range(n_warm, n):
            co, cm, cpose, _ = combined_image_step(
                co, cm, scans[i][0], scans[i][1], cfg, mcfg,
                step=i, local_map_every=every)
        np.asarray(cpose.t)
        sps = n_bench / (time.perf_counter() - t0)
        # losslessness check: the neighbourhood never overflowed capacity
        _, _, n_hits = G.get_local_map(cm, cpose.t, mcfg, capacity=cap)
        return sps, int(n_hits), np.asarray(cpose.t)

    poses = {}
    for cap in (65536, 16384):
        for every in (1, 4):
            sps, hits, pt = run(cap, every)
            poses[(cap, every)] = pt
            print(json.dumps({
                "capacity": cap, "every": every,
                "scans_per_s": round(sps, 2), "final_n_hits": hits,
                "lossless": hits <= cap}), flush=True)
    # pose parity across capacities (same cadence)
    for every in (1, 4):
        err = float(np.linalg.norm(poses[(65536, every)]
                                   - poses[(16384, every)]))
        print(json.dumps({"every": every, "pose_err_m_65536_vs_16384":
                          round(err, 6)}), flush=True)


if __name__ == "__main__":
    main()
