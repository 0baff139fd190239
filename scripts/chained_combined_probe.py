#!/usr/bin/env python
"""Probe: why is the chained (lax.scan) combined step slower than the
per-frame host loop? (BENCH r5: 74.6 vs 146.6 scans/s at K=12, every=4.)

Suspects:
  a. the ``lax.cond`` local-map refresh lowering worse under scan
     (-> compare every=1, which removes the cond entirely);
  b. the probe-insert ``lax.while_loop`` / C-sized scatters losing in-place
     updates under the scan carry (-> compare update-only scan);
  c. chunk-size effects (K=4 vs K=12).
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
from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
from liodom_tpu.odometry import pipeline as P
from liodom_tpu.mapping.service import (chained_combined_image_step,
                                        combined_image_step, init_combined)
from liodom_tpu.mapping.grid import update_map
from liodom_tpu.core.pose import Pose
from liodom_tpu.runtime import native


def main():
    cfg = LiodomConfig(local_map_size=5, ring_width=2048)
    mcfg = MapConfig(local_map_capacity=16384, map_capacity=131072)
    ccfg = cfg.replace(mapping=True)
    world = BoxWorld(seed=0)
    n = 12
    pos, yaws = drive_trajectory(n, speed=1.2, yaw_rate=0.01)
    scans = []
    for i in range(n):
        scan = world.render(pos[i], yaw_matrix(yaws[i]), width=1800,
                            noise=0.01, seed=i)
        img, counts, _ = native.split_velodyne(
            scan.astype(np.float32), cfg.scan_lines, cfg.ring_width,
            cfg.min_range, cfg.max_range)
        scans.append((jnp.asarray(img), jnp.asarray(counts)))
    imgs = jnp.stack([s[0] for s in scans])
    cnts = jnp.stack([s[1] for s in scans])

    REPS = int(os.environ.get("PROBE_REPS", "3"))

    def time_loop(fn, reps=None):
        reps = REPS if reps is None else reps
        fn()                      # warm/compile
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / (reps * n) * 1e3  # ms/frame

    # 1. per-frame host loop, every=4 cadence (the bench async config)
    def per_frame():
        co, cm = init_combined(ccfg, mcfg)
        for i in range(n):
            co, cm, pose, _ = combined_image_step(
                co, cm, scans[i][0], scans[i][1], ccfg, mcfg, step=i,
                local_map_every=4)
        np.asarray(pose.t)
    print(f"per_frame_every4_ms: {time_loop(per_frame):.2f}", flush=True)

    # 2. chained K=12, every=4 (the slow bench row)
    def chained_e4():
        co, cm = init_combined(ccfg, mcfg)
        co, cm, poses, _ = chained_combined_image_step(
            co, cm, imgs, cnts, ccfg, mcfg, step0=0, local_map_every=4)
        np.asarray(poses.t)
    print(f"chained_k12_every4_ms: {time_loop(chained_e4):.2f}", flush=True)

    # 3. chained K=12, every=1 (no cond in the refresh)
    def chained_e1():
        co, cm = init_combined(ccfg, mcfg)
        co, cm, poses, _ = chained_combined_image_step(
            co, cm, imgs, cnts, ccfg, mcfg, step0=0, local_map_every=1)
        np.asarray(poses.t)
    print(f"chained_k12_every1_ms: {time_loop(chained_e1):.2f}", flush=True)

    # 4. chained K=4, every=4
    def chained_k4():
        co, cm = init_combined(ccfg, mcfg)
        for j in range(0, n, 4):
            co, cm, poses, _ = chained_combined_image_step(
                co, cm, imgs[j:j + 4], cnts[j:j + 4], ccfg, mcfg,
                step0=j, local_map_every=4)
        np.asarray(poses.t)
    print(f"chained_k4_every4_ms: {time_loop(chained_k4):.2f}", flush=True)

    # 4b. STEADY-STATE comparison: build the map once (one full pass), then
    # time repeated passes with state carried — both paths see the same
    # converged map (the bench's chained row re-traverses a built map while
    # its per-frame row measures a GROWING map; this removes that skew)
    co0, cm0 = init_combined(ccfg, mcfg)
    for i in range(n):
        co0, cm0, _p, _ = combined_image_step(
            co0, cm0, scans[i][0], scans[i][1], ccfg, mcfg, step=i,
            local_map_every=4)
    np.asarray(_p.t)
    st = {"pf": (co0, cm0), "ch": (co0, cm0)}

    def pf_steady():
        co, cm = st["pf"]
        for i in range(n):
            co, cm, pose, _ = combined_image_step(
                co, cm, scans[i][0], scans[i][1], ccfg, mcfg, step=i,
                local_map_every=4)
        np.asarray(pose.t)
        st["pf"] = (co, cm)
    print(f"per_frame_steady_ms: {time_loop(pf_steady):.2f}", flush=True)

    def ch_steady():
        co, cm = st["ch"]
        co, cm, poses, _ = chained_combined_image_step(
            co, cm, imgs, cnts, ccfg, mcfg, step0=0, local_map_every=4)
        np.asarray(poses.t)
        st["ch"] = (co, cm)
    print(f"chained_steady_ms: {time_loop(ch_steady):.2f}", flush=True)

    # 4c. steady-state at every=1 — no lax.cond in the refresh: if the
    # chained-vs-per-frame gap closes here, the cond lowers to
    # both-branches-execute under scan; if it persists, the cost is in the
    # probe/update path at a converged map.
    st1 = {"pf": (co0, cm0), "ch": (co0, cm0)}

    def pf_steady_e1():
        co, cm = st1["pf"]
        for i in range(n):
            co, cm, pose, _ = combined_image_step(
                co, cm, scans[i][0], scans[i][1], ccfg, mcfg,
                step=None, local_map_every=1)
        np.asarray(pose.t)
        st1["pf"] = (co, cm)
    print(f"per_frame_steady_e1_ms: {time_loop(pf_steady_e1):.2f}",
          flush=True)

    def ch_steady_e1():
        co, cm = st1["ch"]
        co, cm, poses, _ = chained_combined_image_step(
            co, cm, imgs, cnts, ccfg, mcfg, step0=0, local_map_every=1)
        np.asarray(poses.t)
        st1["ch"] = (co, cm)
    print(f"chained_steady_e1_ms: {time_loop(ch_steady_e1):.2f}", flush=True)

    # 5. update_map alone under scan vs host loop, with REAL edges and a
    # CONVERGED map (the previous all-invalid probe short-circuited the
    # probe loop and only measured the C-sized epilogue)
    from liodom_tpu.core.frame import RingImage
    from liodom_tpu.ops.features import select_edges, smoothness

    @jax.jit
    def _edges(x, c):
        img = RingImage(x, c)
        e = select_edges(img, smoothness(img, cfg), cfg)
        return e.xyz, e.valid

    ed = [_edges(*scans[i]) for i in range(n)]
    edges_x = jnp.stack([e[0] for e in ed])
    edges_v = jnp.stack([e[1] for e in ed])

    @jax.jit
    def upd_host(m, x, v):
        return update_map(m, x, v, Pose.identity(), mcfg)

    @jax.jit
    def upd_scan(m, xs, vs):
        def body(m, xv):
            x, v = xv
            return update_map(m, x, v, Pose.identity(), mcfg), ()
        m, _ = jax.lax.scan(body, m, (xs, vs))
        return m

    m0 = init_combined(ccfg, mcfg)[1]
    for i in range(n):
        m0 = upd_host(m0, edges_x[i], edges_v[i])
    np.asarray(m0.overflow)

    stm = {"h": m0, "s": m0}

    def upd_loop():
        m = stm["h"]
        for i in range(n):
            m = upd_host(m, edges_x[i], edges_v[i])
        np.asarray(m.overflow)
        stm["h"] = m
    print(f"update_host_steady_ms: {time_loop(upd_loop):.2f}", flush=True)

    def upd_scan_loop():
        m = upd_scan(stm["s"], edges_x, edges_v)
        np.asarray(m.overflow)
        stm["s"] = m
    print(f"update_scan_steady_ms: {time_loop(upd_scan_loop):.2f}",
          flush=True)

    # 6. does jax.profiler work on this backend? (needed for the batching
    # occupancy question, VERDICT r4 #2)
    import tempfile
    from liodom_tpu.runtime.tracer import DeviceTrace
    with tempfile.TemporaryDirectory() as td:
        with DeviceTrace(td) as tr:
            m = upd_host(m0, edges_x[0], edges_v[0])
            np.asarray(m.overflow)
        import glob as _g
        files = _g.glob(os.path.join(td, "**", "*"), recursive=True)
        print(f"profiler_active: {tr._active}, trace_files: {len(files)}",
              flush=True)


if __name__ == "__main__":
    main()
