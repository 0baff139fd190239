#!/usr/bin/env python
"""Hardware tile sweep + parity check for the kNN coords kernel (ADVICE r2):
the production 'auto' path dispatches knn_coords_pallas, whose tile choice
was inherited from the index kernel's sweep — this measures the coords
kernel itself at the production working set, verifies parity against the
XLA oracle, and splits line_correspondences into kernel vs line-fit time.

Run on the real TPU:  python scripts/knn_sweep.py
"""

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


def timeit(fn, fetch, reps=30, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) * 1e3 / reps


def main():
    from liodom_tpu import LiodomConfig
    from liodom_tpu.core.frame import RingImage
    from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
    from liodom_tpu.odometry import pipeline as P
    from liodom_tpu.odometry import local_map as LM
    from liodom_tpu.ops.features import smoothness, select_edges
    from liodom_tpu.ops.neighbors import knn, line_correspondences, _line_fit
    from liodom_tpu.ops.knn_pallas import knn_coords_pallas
    from liodom_tpu.runtime import native
    from liodom_tpu.core import pose as se3

    # ---- production working set: same capture as bench_stages.py ----
    cfg = LiodomConfig(local_map_size=5, ring_width=2048)
    world = BoxWorld(seed=0)
    n_frames = 8
    pos, yaws = drive_trajectory(n_frames, speed=1.2, yaw_rate=0.01)
    scans = []
    for i in range(n_frames):
        scan = world.render(pos[i], yaw_matrix(yaws[i]), width=1800,
                            noise=0.01, seed=i)
        img, counts, _ = native.split_velodyne(
            scan.astype(np.float32), cfg.scan_lines, cfg.ring_width,
            cfg.min_range, cfg.max_range)
        scans.append((jnp.asarray(img), jnp.asarray(counts)))
    state = P.init_state(cfg)
    for i in range(n_frames - 1):
        state, pose, _ = P.image_step(state, scans[i][0], scans[i][1], cfg)
    np.asarray(pose.t)
    img = RingImage(scans[-1][0], scans[-1][1])
    sm = jax.jit(lambda x, c: smoothness(RingImage(x, c), cfg))(
        img.xyz, img.count)
    edges = select_edges(img, sm, cfg)
    map_xyz, map_valid = LM.flatten(state.window)
    pred = se3.compose(state.odom,
                       se3.compose(se3.inverse(state.prev_odom), state.odom))
    ew = se3.transform(pred, edges.xyz)
    ev = edges.valid
    E, M = ew.shape[0], map_xyz.shape[0]
    print(f"working set: E={E} ({int(ev.sum())} valid) x "
          f"M={M} ({int(map_valid.sum())} valid)", file=sys.stderr)

    radius = float(cfg.knn_max_sq_dist) ** 0.5

    # ---- parity vs the XLA oracle (hardware, not interpret) ----
    d_ref, idx = jax.jit(lambda a, b, c, d: knn(a, b, c, d, k=5))(
        ew, ev, map_xyz, map_valid)
    near_ref = np.asarray(map_xyz[idx])
    d_ref = np.asarray(d_ref)
    d2, near = knn_coords_pallas(ew, ev, map_xyz, map_valid, k=5,
                                 max_radius=radius)
    d2, near = np.asarray(d2), np.asarray(near)
    in_gate = (d_ref[:, 4] < cfg.knn_max_sq_dist) & np.asarray(ev)
    dd = np.abs(d2[in_gate] - d_ref[in_gate])
    # coords contract: near-tie neighbours may reorder between the kernel's
    # elementwise distances and the oracle's matmul form, so compare the
    # distance each picked coord sits at, not coord identity
    d_of = np.sum((np.asarray(ew)[in_gate][:, None, :]
                   - near[in_gate]) ** 2, axis=-1)
    nd = np.abs(np.sqrt(d_of) - np.sqrt(d_ref[in_gate]))
    print(f"parity (within accept gate, {int(in_gate.sum())} rows): "
          f"max |d2 diff| = {dd.max():.3e}, "
          f"max |dist-of-coord diff| = {nd.max():.3e} m", file=sys.stderr)
    # tolerance anchored to the ORACLE's error, not the kernel's: the XLA
    # path computes |q|^2 - 2 q.r + |r|^2, whose f32 cancellation at |coord|
    # ~ 80 m is ~|c|^2 * eps ~ 1e-3 in d2 (the kernel's (q-r)^2 form is the
    # accurate one); near-duplicate map points within that band may swap.
    assert dd.max() < 1e-2 and nd.max() < 2e-2, "coords kernel parity broke"

    # ---- tile sweep at the production working set ----
    print("tile_e tile_m   ms", file=sys.stderr)
    results = {}
    for te in (32, 64, 128):
        for tm in (1024, 2048, 4096):
            try:
                f = jax.jit(lambda q, qm, r, rm, te=te, tm=tm:
                            knn_coords_pallas(q, qm, r, rm, k=5,
                                              tile_e=te, tile_m=tm,
                                              max_radius=radius))
                ms = timeit(lambda: f(ew, ev, map_xyz, map_valid),
                            lambda o: np.asarray(o[0][0, 0]))
                results[(te, tm)] = ms
                print(f"{te:6d} {tm:6d} {ms:6.3f}", file=sys.stderr)
            except Exception as e:  # VMEM OOM at big tiles etc.
                print(f"{te:6d} {tm:6d}   FAIL ({type(e).__name__})",
                      file=sys.stderr)

    # ---- stage split: kernel alone vs full line_correspondences ----
    f_kern = jax.jit(lambda q, qm, r, rm: knn_coords_pallas(
        q, qm, r, rm, k=5, max_radius=radius))
    ms_kern = timeit(lambda: f_kern(ew, ev, map_xyz, map_valid),
                     lambda o: np.asarray(o[0][0, 0]))
    f_coords = jax.jit(lambda q, qm, r, rm: line_correspondences(
        q, qm, r, rm, k=cfg.knn_k, max_sq_dist=cfg.knn_max_sq_dist,
        eig_ratio=cfg.eig_ratio, min_line_sep=cfg.min_line_sep,
        knn_impl="pallas_coords"))
    ms_coords = timeit(lambda: f_coords(ew, ev, map_xyz, map_valid),
                       lambda o: np.asarray(o.valid[0]))
    f_lines = jax.jit(lambda q, qm, r, rm: line_correspondences(
        q, qm, r, rm, k=cfg.knn_k, max_sq_dist=cfg.knn_max_sq_dist,
        eig_ratio=cfg.eig_ratio, min_line_sep=cfg.min_line_sep,
        knn_impl="pallas_lines"))
    ms_lines = timeit(lambda: f_lines(ew, ev, map_xyz, map_valid),
                      lambda o: np.asarray(o.valid[0]))
    # gate parity lines vs coords on hardware
    va = np.asarray(f_coords(ew, ev, map_xyz, map_valid).valid)
    vb = np.asarray(f_lines(ew, ev, map_xyz, map_valid).valid)
    best = min(results, key=results.get)
    print(f"coords kernel alone: {ms_kern:.3f} ms; "
          f"coords + XLA line fit: {ms_coords:.3f} ms; "
          f"fused lines kernel: {ms_lines:.3f} ms; "
          f"gate agreement lines vs coords: "
          f"{(va == vb).mean() * 100:.2f} % ({int(va.sum())} vs "
          f"{int(vb.sum())} accepted)", file=sys.stderr)
    print(f"best tile: {best} @ {results[best]:.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
