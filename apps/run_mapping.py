#!/usr/bin/env python
"""Standalone mapping service — the ``liodom_mapping`` process equivalent.

The reference's second executable (liodom_mapping_node.cc) consumes the edge
clouds published by the odometry node plus the TF pose it broadcast, inserts
them into the hash-grid map, and (re-)publishes the full map and the local
map around the pose.  Without ROS, the equivalent offline deployment is:
replay a KITTI sequence's edges at poses from a ``poses.txt`` (produced by
apps/run_kitti.py with --results-dir), build the map, and export it.

Usage:
    python apps/run_kitti.py --root $K --seq 00 --results-dir out/
    python apps/run_mapping.py --root $K --seq 00 --poses out/poses.txt \
        --out map_out/
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from liodom_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="KITTI odometry root")
    ap.add_argument("--seq", default="00")
    ap.add_argument("--poses", required=True,
                    help="KITTI-format poses.txt of the trajectory (laser "
                    "frame), e.g. from run_kitti --results-dir")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--out", default=None, help="export directory (PLY)")
    ap.add_argument("--ring-width", type=int, default=4096)
    # liodom_mapping.launch defaults: 20/25 m voxels (SURVEY.md §2)
    ap.add_argument("--voxel-xysize", type=float, default=20.0)
    ap.add_argument("--voxel-zsize", type=float, default=25.0)
    ap.add_argument("--resolution", type=float, default=0.4)
    args = ap.parse_args()

    from liodom_tpu import LiodomConfig, MapConfig
    from liodom_tpu.core.io import KittiSequence
    from liodom_tpu.core.pose import Pose
    from liodom_tpu.mapping.service import MappingService
    from liodom_tpu.ops.features import select_edges, smoothness
    from liodom_tpu.core.frame import RingImage
    from liodom_tpu.runtime.stats import load_kitti_poses

    cfg = LiodomConfig(ring_width=args.ring_width)
    mcfg = MapConfig(voxel_xysize=args.voxel_xysize,
                     voxel_zsize=args.voxel_zsize,
                     resolution=args.resolution)
    seq = KittiSequence(args.root, args.seq)
    traj = load_kitti_poses(args.poses)
    n = min(len(seq), len(traj))
    if args.frames is not None:
        n = min(n, args.frames)
    print(f"mapping sequence {args.seq}: {n} frames")

    svc = MappingService(mcfg)
    t0 = time.perf_counter()
    ring_dropped = 0
    for i, (img, counts, n_drop) in enumerate(seq.iter_images(
            cfg.scan_lines, cfg.ring_width, cfg.min_range, cfg.max_range)):
        if i >= n:
            break
        ring_dropped += n_drop
        # the mapper consumes EDGES (remapped /liodom/edges,
        # liodom_mapping_node.cc:139) — extract them like the odometer did
        rimg = RingImage(jnp.asarray(img), jnp.asarray(counts))
        edges = select_edges(rimg, smoothness(rimg, cfg), cfg)
        m = traj[i]
        q = _quat_from_matrix(m[:3, :3])
        pose = Pose(jnp.asarray(q, jnp.float32),
                    jnp.asarray(m[:3, 3], jnp.float32))
        svc.update(edges.xyz, edges.valid, pose)
    wall = time.perf_counter() - t0
    print(f"{n} updates in {wall:.1f} s = {n / max(wall, 1e-9):.1f} scans/s")
    print(f"map entropy: {svc.entropy():.3f}")
    if ring_dropped:
        print(f"WARNING: {ring_dropped} points dropped by the "
              f"ring_width={cfg.ring_width} clamp (raise --ring-width)")
    if int(svc.state.overflow):
        print(f"WARNING: {int(svc.state.overflow)} map points dropped at "
              f"map_capacity={mcfg.map_capacity}")

    xyz, valid = svc.full_map()
    print(f"map points: {int(valid.sum())}")
    if args.out:
        from liodom_tpu.runtime.viz import save_ply
        os.makedirs(args.out, exist_ok=True)
        save_ply(os.path.join(args.out, "map.ply"), xyz, valid)
        lx, lv = svc.local_map(traj[n - 1][:3, 3])
        save_ply(os.path.join(args.out, "map_local.ply"),
                 np.asarray(lx), np.asarray(lv), color=(40, 200, 40))
        print(f"exported to {args.out}")
    return 0


def _quat_from_matrix(R):
    """wxyz quaternion from a 3x3 rotation matrix (numerically safe)."""
    R = np.asarray(R, float)
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 0.0)) * 2
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


if __name__ == "__main__":
    raise SystemExit(main())
