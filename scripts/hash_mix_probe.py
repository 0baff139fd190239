#!/usr/bin/env python
"""Probe: does stronger hash mixing (murmur3 finalizer) cut probe rounds?

The capacity curve dips at 262144 (scripts/map_epilogue_sweep.py) and the
probe while_loop runs to the MAX chain length over ~5.6k inserts, so weak
avalanche costs rounds at every load.  Compare the production two-multiply
mix against the murmur3 fmix32 finalizer on the real insert stream, via a
monkeypatched grid._hash_pair.
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

REPS = int(os.environ.get("PROBE_REPS", "8"))


def mix_prod(k1, k2, table_size):
    h = (k1 * jnp.uint32(0x9E3779B1)) ^ (k2 * jnp.uint32(0x85EBCA77))
    h = h ^ (h >> 15)
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


def mix_murmur(k1, k2, table_size):
    h = (k1 * jnp.uint32(0x9E3779B1)) ^ (k2 * jnp.uint32(0x85EBCA77))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


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
        frames.append((ex, ev,
                       Pose(jnp.asarray([1., 0., 0., 0.], jnp.float32),
                            jnp.asarray(pos[i], jnp.float32))))

    for name, mix in (("prod", mix_prod), ("murmur", mix_murmur)):
        G._hash_pair = mix
        for cap in (131072, 262144, 524288):
            mcfg = MapConfig(map_capacity=cap)
            upd = jax.jit(lambda m, x, v, p, _c=mcfg: G.update_map.__wrapped__(
                m, x, v, p, _c))
            m = G.init_map(cap)
            for ex, ev, p in frames:
                m = upd(m, ex, ev, p)
            np.asarray(m.overflow)
            t0 = time.perf_counter()
            for _ in range(REPS):
                for ex, ev, p in frames:
                    m = upd(m, ex, ev, p)
            np.asarray(m.overflow)
            ms = (time.perf_counter() - t0) / (REPS * n) * 1e3
            print(f"{name:6s} C={cap:7d}: {ms:5.2f} ms/frame "
                  f"(overflow {int(m.overflow)}, "
                  f"slots {int(np.asarray(m.valid).sum())})", flush=True)


if __name__ == "__main__":
    main()
