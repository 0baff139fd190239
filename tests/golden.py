"""NumPy golden implementations used to validate the JAX ops.

These transcribe the *behaviour* of the reference pipeline
(/root/reference/src/feature_extractor.cc, laser_odometry.cc, map.cc) as
straightforward sequential NumPy, so unit tests can compare the vectorised
TPU formulations against the exact sequential semantics on random inputs.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np


def golden_ring_split(points: np.ndarray, scan_lines: int,
                      min_range: float, max_range: float) -> List[List[int]]:
    """Velodyne-mode splitPointCloud (feature_extractor.cc:113-157).
    Returns per-ring lists of input indices, in input order."""
    rings: List[List[int]] = [[] for _ in range(scan_lines)]
    for i, (x, y, z) in enumerate(points):
        if not (np.isfinite(x) and np.isfinite(y) and np.isfinite(z)):
            continue
        d = math.sqrt(x * x + y * y)
        if d > max_range or d < min_range:
            continue
        angle = math.atan(z / d) * 180.0 / math.pi
        if scan_lines == 64:
            if angle >= -8.83:
                sid = int((2 - angle) * 3.0 + 0.5)
            else:
                sid = scan_lines // 2 + int((-8.83 - angle) * 2.0 + 0.5)
            if angle > 2 or angle < -24.33 or sid > 63 or sid < 0:
                continue
        elif scan_lines == 32:
            sid = int((angle + 92.0 / 3.0) * 3.0 / 4.0)
            if sid > scan_lines - 1 or sid < 0:
                continue
        elif scan_lines == 16:
            sid = int((angle + 15) / 2 + 0.5)
            if sid > scan_lines - 1 or sid < 0:
                continue
        else:
            raise ValueError(scan_lines)
        rings[sid].append(i)
    return rings


def golden_smoothness(ring_pts: np.ndarray) -> np.ndarray:
    """Per-ring smoothness (feature_extractor.cc:195-232); borders are 0."""
    n = len(ring_pts)
    s = np.zeros(n)
    for j in range(5, n - 5):
        diff = -10.0 * ring_pts[j] + (ring_pts[j - 5:j].sum(axis=0)
                                      + ring_pts[j + 1:j + 6].sum(axis=0))
        s[j] = float(diff @ diff)
    return s


def golden_select_edges(ring_pts: np.ndarray, scan_regions: int,
                        edges_per_region: int, min_points_per_scan: int,
                        smooth: np.ndarray | None = None) -> List[int]:
    """extractFeatures region loop + extractFeaturesFromRegion greedy pick
    (feature_extractor.cc:181-313).  Returns picked point indices (ring-local)
    in pick order.  ``smooth`` may be supplied to decouple selection-semantics
    testing from float-precision differences in the smoothness kernel."""
    n = len(ring_pts)
    out: List[int] = []
    if n < min_points_per_scan:
        return out
    if smooth is None:
        smooth = golden_smoothness(ring_pts)
    picked = np.zeros(n, dtype=bool)
    total = n - 10
    sector = total // scan_regions
    for j in range(scan_regions):
        r0 = sector * j
        r1 = total if j == scan_regions - 1 else sector * (j + 1)
        # candidates are interior indices [5+r0, 5+r1), sorted by smoothness desc
        idxs = np.arange(5 + r0, 5 + r1)
        order = idxs[np.argsort(-smooth[idxs], kind="stable")]
        picked_edges = 0
        for pi in order:
            if picked[pi]:
                continue
            if smooth[pi] < 0.1 or picked_edges > edges_per_region:
                break
            out.append(int(pi))
            picked_edges += 1
            picked[pi] = True
            for l in range(1, 6):
                dv = ring_pts[pi + l] - ring_pts[pi + l - 1]
                if float(dv @ dv) > 0.05:
                    break
                picked[pi + l] = True
            for l in range(-1, -6, -1):
                dv = ring_pts[pi + l] - ring_pts[pi + l + 1]
                if float(dv @ dv) > 0.05:
                    break
                picked[pi + l] = True
    return out


def golden_point_to_line_residual(q_wxyz, t, cp, lpa, lpb,
                                  min_range, max_range) -> np.ndarray:
    """Point2LineFactor residual (factors.hpp:71-105)."""
    w_, x, y, z = q_wxyz
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w_ * z), 2 * (x * z + w_ * y)],
        [2 * (x * y + w_ * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w_ * x)],
        [2 * (x * z - w_ * y), 2 * (y * z + w_ * x), 1 - 2 * (x * x + y * y)],
    ])
    lp = R @ cp + t
    nu = np.cross(lp - lpa, lp - lpb)
    de = lpa - lpb
    cp_l = cp - t
    d = math.sqrt(cp_l[0] ** 2 + cp_l[1] ** 2)
    d = (d - min_range) / (max_range - min_range)
    w = 1.01 - d
    return w * nu / np.linalg.norm(de)


def golden_voxel_centroids(points: np.ndarray, leaf: float) -> np.ndarray:
    """PCL VoxelGrid semantics: centroid of points per occupied leaf
    (used at laser_odometry.cc:286-295 and map.cc:56-60)."""
    keys = np.floor(points / leaf).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    out = np.zeros((len(uniq), 3))
    cnt = np.zeros(len(uniq))
    for i, g in enumerate(inv):
        out[g] += points[i]
        cnt[g] += 1
    return out / cnt[:, None]


def golden_map_cell_key(p: np.ndarray, xy: float, zs: float) -> Tuple[int, int, int]:
    """Hash-grid cell quantisation (map.cc:103-105): int(floor(p/size)*size +
    size/2) per axis, XY sharing one size."""
    vx = int(math.floor(p[0] / xy) * xy + xy / 2.0)
    vy = int(math.floor(p[1] / xy) * xy + xy / 2.0)
    vz = int(math.floor(p[2] / zs) * zs + zs / 2.0)
    return vx, vy, vz
