#!/usr/bin/env python
"""Measure update_map epilogue variants vs table capacity (VERDICT r4 #7).

Variants:
  * dense — C-sized scatter-add accumulator + C-sized key/valid decode
            (grid.update_map — the keeper: faster at every capacity);
  * O(E)  — segment-reduce by slot + E-sized gather/scatter centroids +
            scatter-stamped key/valid (grid.update_map_sparse_epilogue,
            measured-rejected; table in update_map's docstring).

Protocol: real edges from the bench course, steady-state map (one full
pass pre-inserted), REPS passes timed, identical insert stream for both.
Run on the TPU; results go to the README dead-end/decision list.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from liodom_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp

from liodom_tpu import LiodomConfig
from liodom_tpu.core.config import MapConfig
from liodom_tpu.core.frame import RingImage
from liodom_tpu.core.pose import Pose
from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
from liodom_tpu.mapping import grid as G
from liodom_tpu.ops.features import select_edges, smoothness
from liodom_tpu.runtime import native

REPS = int(os.environ.get("SWEEP_REPS", "8"))
CAPS = [131072, 262144, 524288, 1048576]


def main():
    cfg = LiodomConfig(local_map_size=5, ring_width=2048)
    world = BoxWorld(seed=0)
    n = 12
    pos, yaws = drive_trajectory(n, speed=1.2, yaw_rate=0.01)

    @jax.jit
    def edges_of(x, c):
        img = RingImage(x, c)
        e = select_edges(img, smoothness(img, cfg), cfg)
        return e.xyz, e.valid

    frames = []
    for i in range(n):
        scan = world.render(pos[i], yaw_matrix(yaws[i]), width=1800,
                            noise=0.01, seed=i)
        img, counts, _ = native.split_velodyne_np(
            scan.astype(np.float32), cfg.scan_lines, cfg.ring_width,
            cfg.min_range, cfg.max_range)
        ex, ev = edges_of(jnp.asarray(img), jnp.asarray(counts))
        frames.append((ex, ev, Pose(jnp.asarray([1., 0., 0., 0.],
                                               jnp.float32),
                                    jnp.asarray(pos[i], jnp.float32))))

    for cap in CAPS:
        mcfg = MapConfig(map_capacity=cap)
        for name, fn in (("dense", G.update_map),
                         ("oE", G.update_map_sparse_epilogue)):
            m = G.init_map(cap)
            for ex, ev, p in frames:        # converge + compile
                m = fn(m, ex, ev, p, mcfg)
            np.asarray(m.overflow)
            t0 = time.perf_counter()
            for _ in range(REPS):
                for ex, ev, p in frames:
                    m = fn(m, ex, ev, p, mcfg)
            np.asarray(m.overflow)
            ms = (time.perf_counter() - t0) / (REPS * n) * 1e3
            print(f"C={cap:8d} {name:6s} {ms:6.2f} ms/frame  "
                  f"(overflow {int(m.overflow)})", flush=True)


if __name__ == "__main__":
    main()
