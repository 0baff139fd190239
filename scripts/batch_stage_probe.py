#!/usr/bin/env python
"""Per-stage device times of the BATCHED odometry step at B in {1, 4, 8}.

Companion to bench_stages.py for the multi-sequence path: times each stage
of batch_image_step in isolation (chained 20x between host fetches, so the
~1.1 ms isolated-dispatch floor amortizes away) to find which stages scale
linearly with B and which amortize.  Informs the batched-kernel tuning
(VERDICT r3 #1).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from liodom_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # host fetch barrier
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from liodom_tpu import LiodomConfig
    from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
    from liodom_tpu.core.frame import RingImage
    from liodom_tpu.odometry import pipeline as P
    from liodom_tpu.odometry import local_map
    from liodom_tpu.ops import features as F
    from liodom_tpu.ops.knn_pallas import (knn_coords_pallas,
                                           knn_coords_pallas_batched,
                                           spatial_sort_points)
    from liodom_tpu.ops.solver import lm_solve
    from liodom_tpu.ops.neighbors import _line_fit
    from liodom_tpu.parallel.sharded import init_batch_state
    from liodom_tpu.runtime import native

    cfg = LiodomConfig(local_map_size=5, ring_width=2048)
    B = int(os.environ.get("B", "8"))

    world = BoxWorld(seed=0)
    pos, yaws = drive_trajectory(8, speed=1.2, yaw_rate=0.01)
    frames = []
    for i in range(8):
        scan = world.render(pos[i], yaw_matrix(yaws[i]), width=1800,
                            noise=0.01, seed=i)
        img, counts, _ = native.split_velodyne(
            scan.astype(np.float32), cfg.scan_lines, cfg.ring_width,
            cfg.min_range, cfg.max_range)
        frames.append((img, counts))

    # build a realistic warm state by running 6 solo steps, then tile to B
    st = P.init_state(cfg)
    for i in range(6):
        st, pose, _ = P.image_step(st, jnp.asarray(frames[i][0]),
                                   jnp.asarray(frames[i][1]), cfg)
    np.asarray(pose.t)

    xb = jnp.asarray(np.broadcast_to(frames[6][0],
                                     (B,) + frames[6][0].shape).copy())
    cb = jnp.asarray(np.broadcast_to(frames[6][1],
                                     (B,) + frames[6][1].shape).copy())
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy() if B > 1 else
        x[None], st)

    img1 = RingImage(xb[0], cb[0])

    # stage: smoothness
    sm1 = jax.jit(lambda x, c: F._smoothness_tpu()(x, c))
    smB = jax.jit(jax.vmap(lambda x, c: F._smoothness_tpu()(x, c)))
    t1 = timeit(sm1, xb[0], cb[0])
    tB = timeit(smB, xb, cb)
    print(json.dumps({"stage": "smoothness", "B1_ms": round(t1, 3),
                      f"B{B}_ms": round(tB, 3)}), flush=True)
    smooth_b = smB(xb, cb)

    # stage: select
    se1 = jax.jit(lambda x, c, s: F._select_edges_tpu(cfg)(x, c, s))
    seB = jax.jit(jax.vmap(lambda x, c, s: F._select_edges_tpu(cfg)(x, c, s)))
    t1 = timeit(se1, xb[0], cb[0], smooth_b[0])
    tB = timeit(seB, xb, cb, smooth_b)
    print(json.dumps({"stage": "select", "B1_ms": round(t1, 3),
                      f"B{B}_ms": round(tB, 3)}), flush=True)
    ec_b = seB(xb, cb, smooth_b)

    # matching map: the warm window
    map_xyz, map_valid = local_map.flatten(st.window)
    mxb = jnp.broadcast_to(map_xyz, (B,) + map_xyz.shape)
    mvb = jnp.broadcast_to(map_valid, (B,) + map_valid.shape)

    # stage: spatial sort of the matching map
    ss1 = jax.jit(spatial_sort_points)
    ssB = jax.jit(jax.vmap(lambda x, v: spatial_sort_points(x, v)))
    t1 = timeit(ss1, map_xyz, map_valid)
    tB = timeit(ssB, mxb, mvb)
    print(json.dumps({"stage": "spatial_sort", "B1_ms": round(t1, 3),
                      f"B{B}_ms": round(tB, 3)}), flush=True)
    msx, msv = ssB(mxb, mvb)

    # stage: kNN (coords kernel, presorted map)
    k1 = jax.jit(lambda q, qm, r, rm: knn_coords_pallas(
        q, qm, r, rm, k=5, max_radius=1.0, ref_presorted=True))
    kB = jax.jit(lambda q, qm, r, rm: knn_coords_pallas_batched(
        q, qm, r, rm, k=5, max_radius=1.0, ref_presorted=True))
    eq = ec_b.xyz
    em = ec_b.valid
    t1 = timeit(k1, eq[0], em[0], msx[0], msv[0])
    tB = timeit(kB, eq, em, msx, msv)
    print(json.dumps({"stage": "knn_coords", "B1_ms": round(t1, 3),
                      f"B{B}_ms": round(tB, 3)}), flush=True)
    d2b, nearb = kB(eq, em, msx, msv)

    # stage: line fit + LM solve (pure XLA, vmapped)
    def fit_solve(pose_q, pose_t, exyz, evalid, d2, near):
        from liodom_tpu.core.pose import Pose
        corr = _line_fit(near, d2[:, 4], evalid, 1.0, 3.0, 0.01)
        return lm_solve(Pose(pose_q, pose_t), exyz, corr.lpa, corr.lpb,
                        corr.valid, min_range=cfg.min_range,
                        max_range=cfg.max_range,
                        huber_delta=cfg.huber_delta, iters=cfg.inner_iters)
    f1 = jax.jit(fit_solve)
    fB = jax.jit(jax.vmap(fit_solve))
    qb = jnp.broadcast_to(st.odom.q, (B, 4))
    tb_ = jnp.broadcast_to(st.odom.t, (B, 3))
    t1 = timeit(f1, st.odom.q, st.odom.t, eq[0], em[0], d2b[0], nearb[0])
    tB = timeit(fB, qb, tb_, eq, em, d2b, nearb)
    print(json.dumps({"stage": "linefit_lm", "B1_ms": round(t1, 3),
                      f"B{B}_ms": round(tB, 3)}), flush=True)

    # stage: front-compaction of edges + window push (vmapped XLA)
    def compact_push(win, exyz, evalid):
        order = jnp.argsort(~evalid, stable=True)
        ev = evalid[order]
        ex = jnp.where(ev[:, None], exyz[order], 0.0)
        return local_map.push(win, ex, ev)
    c1 = jax.jit(compact_push)
    cB = jax.jit(jax.vmap(compact_push))
    winB = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                        st.window)
    t1 = timeit(c1, st.window, eq[0], em[0])
    tB = timeit(cB, winB, eq, em)
    print(json.dumps({"stage": "compact_push", "B1_ms": round(t1, 3),
                      f"B{B}_ms": round(tB, 3)}), flush=True)

    # whole step for reference
    w1 = jax.jit(lambda s, x, c: P.image_step(s, x, c, cfg))
    wB = jax.jit(lambda s, x, c: P.batch_image_step(s, x, c, cfg))
    t1 = timeit(w1, st, xb[0], cb[0])
    tB = timeit(wB, states, xb, cb)
    print(json.dumps({"stage": "full_step", "B1_ms": round(t1, 3),
                      f"B{B}_ms": round(tB, 3)}), flush=True)


if __name__ == "__main__":
    main()
