#!/usr/bin/env python
"""Does input-buffer donation close the host-loop vs lax.scan gap on
update_map? (round-5 follow-up to scripts/chained_combined_probe.py: the
scan carry ran the same insert at 3.85 vs 6.68 ms/frame steady-state.)

If yes, the per-frame production steps should donate their state operands
(they are consumed exactly once in every app loop).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from liodom_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from liodom_tpu import LiodomConfig
from liodom_tpu.core.config import MapConfig
from liodom_tpu.core.frame import RingImage
from liodom_tpu.core.pose import Pose
from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
from liodom_tpu.mapping.grid import MapState, init_map
from liodom_tpu.mapping import grid as G
from liodom_tpu.ops.features import select_edges, smoothness
from liodom_tpu.runtime import native

REPS = int(os.environ.get("PROBE_REPS", "8"))


def main():
    cfg = LiodomConfig(local_map_size=5, ring_width=2048)
    mcfg = MapConfig(map_capacity=131072)
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
        frames.append((ex, ev,
                       Pose(jnp.asarray([1., 0., 0., 0.], jnp.float32),
                            jnp.asarray(pos[i], jnp.float32))))

    upd_plain = jax.jit(partial(G.update_map, cfg=mcfg))
    upd_donate = jax.jit(partial(G.update_map, cfg=mcfg),
                         donate_argnums=(0,))

    def steady(fn):
        m = init_map(mcfg.map_capacity)
        for ex, ev, p in frames:
            m = fn(m, ex, ev, p)        # build + compile
        np.asarray(m.overflow)
        t0 = time.perf_counter()
        for _ in range(REPS):
            for ex, ev, p in frames:
                m = fn(m, ex, ev, p)
        np.asarray(m.overflow)
        return (time.perf_counter() - t0) / (REPS * n) * 1e3

    print(f"update_plain_ms:  {steady(upd_plain):.2f}", flush=True)
    print(f"update_donate_ms: {steady(upd_donate):.2f}", flush=True)


if __name__ == "__main__":
    main()
