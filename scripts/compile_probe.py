#!/usr/bin/env python
"""Decompose compile time of the big jitted programs (round-3 VERDICT #2).

For each stage: time .lower() (JAX trace + StableHLO emit) and .compile()
(XLA) separately, on the current default backend.  Run with a FRESH cache
dir to measure true compile cost:

    JAX_COMPILATION_CACHE_DIR=/tmp/nocache python scripts/compile_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def probe(name, fn, *args, **kw):
    t0 = time.perf_counter()
    lowered = jax.jit(fn, **kw).lower(*args)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    hlo_lines = len(lowered.as_text().splitlines())
    print(f"{name:32s} lower {t1-t0:7.2f}s  compile {t2-t1:7.2f}s  "
          f"hlo_lines {hlo_lines}", flush=True)
    return compiled


def main():
    from liodom_tpu import LiodomConfig
    from liodom_tpu.core.config import MapConfig
    from liodom_tpu.core.frame import RingImage
    from liodom_tpu.odometry import pipeline as P
    from liodom_tpu.odometry.local_map import flatten
    from liodom_tpu.ops.features import smoothness, select_edges
    from liodom_tpu.ops.neighbors import line_correspondences
    from liodom_tpu.ops.solver import lm_solve
    from liodom_tpu.mapping.grid import init_map, update_map, get_local_map
    from liodom_tpu.core.pose import Pose

    cfg = LiodomConfig(local_map_size=5, ring_width=2048)
    mcfg = MapConfig()
    print("backend:", jax.default_backend(), flush=True)

    img_xyz = jnp.zeros((cfg.scan_lines, cfg.ring_width, 3))
    img_cnt = jnp.full((cfg.scan_lines,), cfg.ring_width, jnp.int32)
    img = RingImage(img_xyz, img_cnt)

    sm = probe("smoothness", lambda i: smoothness(i, cfg), img)
    probe("select_edges", lambda i, s: select_edges(i, s, cfg), img,
          smoothness(img, cfg))

    state = P.init_state(cfg)
    from liodom_tpu.core.frame import EdgeCloud
    edges = EdgeCloud(jnp.zeros((cfg.max_edges, 3)),
                      jnp.zeros((cfg.max_edges,), bool))
    map_xyz, map_valid = flatten(state.window)
    probe("line_correspondences",
          lambda e, v, m, mv: line_correspondences(
              e, v, m, mv, k=cfg.knn_k, max_sq_dist=cfg.knn_max_sq_dist,
              eig_ratio=cfg.eig_ratio, min_line_sep=cfg.min_line_sep),
          edges.xyz, edges.valid, map_xyz, map_valid)
    corr_lpa = jnp.zeros((cfg.max_edges, 3))
    probe("lm_solve",
          lambda p, e, a, b, v: lm_solve(
              p, e, a, b, v, min_range=cfg.min_range, max_range=cfg.max_range,
              huber_delta=cfg.huber_delta, iters=cfg.inner_iters),
          Pose.identity(jnp.float32), edges.xyz, corr_lpa, corr_lpa,
          edges.valid)
    probe("odometry_step",
          lambda s, e: P.odometry_step(s, e, cfg), state, edges)
    probe("image_step",
          lambda s, x, c: P.image_step(s, x, c, cfg), state, img_xyz, img_cnt)

    ms = init_map(mcfg.map_capacity)
    pose = Pose.identity(jnp.float32)
    probe("update_map",
          lambda m, p, v, po: update_map(m, p, v, po, mcfg),
          ms, edges.xyz, edges.valid, pose)
    probe("get_local_map",
          lambda m, t: get_local_map(m, t, mcfg,
                                     capacity=mcfg.local_map_capacity),
          ms, pose.t)

    from liodom_tpu.mapping.service import combined_image_step, init_combined
    ccfg = cfg.replace(mapping=True)
    co, cm = init_combined(ccfg, mcfg)
    probe("combined_image_step(every=4)",
          lambda a, b, x, c, s: combined_image_step(
              a, b, x, c, ccfg, mcfg, step=s, local_map_every=4),
          co, cm, img_xyz, img_cnt, jnp.int32(0))


if __name__ == "__main__":
    main()
