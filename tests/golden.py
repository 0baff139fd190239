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


# ----------------------------------------------------------- SE(3), float64

def golden_quat_mul(a, b):
    """Hamilton product, wxyz (core/pose.py quat_mul)."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def golden_quat_rotate(q, v):
    qw, qv = q[0], q[1:]
    v = np.asarray(v, np.float64)
    uv = np.cross(qv, v)
    uuv = np.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def golden_quat_conj(q):
    return q * np.array([1.0, -1.0, -1.0, -1.0])


def golden_so3_exp(phi):
    theta = float(np.linalg.norm(phi))
    if theta < 1e-6:
        w = 1.0 - theta * theta / 8.0
        s = 0.5 - theta * theta / 48.0
    else:
        w = math.cos(theta / 2.0)
        s = math.sin(theta / 2.0) / theta
    q = np.concatenate([[w], s * np.asarray(phi)])
    return q / np.linalg.norm(q)


class GoldenPose:
    """(q wxyz, t), float64 — mirrors core/pose.Pose semantics."""

    def __init__(self, q=None, t=None):
        self.q = np.array([1.0, 0, 0, 0]) if q is None else np.asarray(q, np.float64)
        self.t = np.zeros(3) if t is None else np.asarray(t, np.float64)

    def compose(self, other: "GoldenPose") -> "GoldenPose":
        q = golden_quat_mul(self.q, other.q)
        return GoldenPose(q / np.linalg.norm(q),
                          golden_quat_rotate(self.q, other.t) + self.t)

    def inverse(self) -> "GoldenPose":
        qi = golden_quat_conj(self.q)
        return GoldenPose(qi, -golden_quat_rotate(qi, self.t))

    def transform(self, pts: np.ndarray) -> np.ndarray:
        if len(pts) == 0:
            return np.asarray(pts, np.float64)
        # golden_quat_rotate broadcasts over (N, 3) with the identical
        # per-element expression the scalar call evaluates (np.cross
        # broadcasts), so this is bit-equal to the former per-point loop
        return golden_quat_rotate(self.q, np.asarray(pts, np.float64)) \
            + self.t

    def retract(self, delta: np.ndarray) -> "GoldenPose":
        dq = golden_so3_exp(delta[:3])
        q = golden_quat_mul(dq, self.q)
        return GoldenPose(q / np.linalg.norm(q), self.t + delta[3:])


# ------------------------------------------------- whole-pipeline frame loop

def _golden_stable_topk(d2, k):
    """Exactly ``np.argsort(d2, kind="stable")[:k]`` via an O(M) partition:
    take every index whose value <= the k-th smallest value (a superset of
    the answer that includes all boundary ties), stable-sort only those, cut
    to k.  ``np.flatnonzero`` returns ascending indices, so the stable sort
    breaks value ties by lowest index — identical to the full stable
    argsort.  (The full per-edge argsort was 40% of the oracle's runtime.)"""
    kth = np.partition(d2, k - 1)[k - 1]
    cand = np.flatnonzero(d2 <= kth)
    return cand[np.argsort(d2[cand], kind="stable")][:k]


def golden_line_correspondences(edges_world, window_pts, k=5,
                                max_sq_dist=1.0, eig_ratio=3.0,
                                min_line_sep=0.01):
    """Brute 5-NN + PCA line gate (laser_odometry.cc:318-362).
    Returns (lpa, lpb, valid) over the edges."""
    e = len(edges_world)
    lpa = np.zeros((e, 3))
    lpb = np.zeros((e, 3))
    ok = np.zeros(e, bool)
    if len(window_pts) < k:
        return lpa, lpb, ok
    for i, p in enumerate(edges_world):
        d2 = np.sum((window_pts - p) ** 2, axis=1)
        idx = _golden_stable_topk(d2, k)
        if d2[idx[-1]] >= max_sq_dist:
            continue
        near = window_pts[idx]
        center = near.mean(axis=0)
        zm = near - center
        cov = zm.T @ zm                       # un-normalised, like the ref
        eigs = np.linalg.eigvalsh(cov)
        if eigs[2] <= eig_ratio * eigs[1]:
            continue
        a, b = window_pts[idx[0]], window_pts[idx[1]]
        if np.sum((a - b) ** 2) <= min_line_sep ** 2:
            continue
        lpa[i], lpb[i], ok[i] = a, b, True
    return lpa, lpb, ok


def _golden_residual_jacobian(pose: GoldenPose, cp, lpa, lpb,
                              min_range, max_range):
    """Residual + analytic Jacobian of the weighted point-to-line factor
    w.r.t. the 6-dim tangent (ops/solver.py point_to_line_jacobian)."""
    u = golden_quat_rotate(pose.q, cp)
    lp = u + pose.t
    nu = np.cross(lp - lpa, lp - lpb)
    de = lpa - lpb
    de_norm = max(np.linalg.norm(de), 1e-12)
    f = nu / de_norm
    cp_l = cp - pose.t
    d = math.sqrt(max(cp_l[0] ** 2 + cp_l[1] ** 2, 1e-12))
    inv_span = 1.0 / (max_range - min_range)
    w = 1.01 - (d - min_range) * inv_span
    r = w * f

    def skew(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])

    df_dlp = skew(lpb - lpa) / de_norm
    dr_dtheta = w * (df_dlp @ (-skew(u)))
    dw_dt = np.array([cp_l[0] / d * inv_span, cp_l[1] / d * inv_span, 0.0])
    dr_dt = w * df_dlp + np.outer(f, dw_dt)
    return r, np.concatenate([dr_dtheta, dr_dt], axis=1)


def _golden_residuals_jacobians(pose: GoldenPose, cps, lpas, lpbs,
                                min_range, max_range):
    """Vectorised :func:`_golden_residual_jacobian` over N correspondences
    — the same per-element float64 expressions evaluated array-wise
    (returns r (N, 3), J (N, 3, 6)).  Cross-checked element-for-element
    against the sequential transcription in
    test_golden_fastpaths.py; the per-edge original stays as the
    transcription of record."""
    cps = np.asarray(cps, np.float64)
    lpas = np.asarray(lpas, np.float64)
    lpbs = np.asarray(lpbs, np.float64)
    n = len(cps)
    u = golden_quat_rotate(pose.q, cps)               # (N, 3)
    lp = u + pose.t
    nu = np.cross(lp - lpas, lp - lpbs)
    de = lpas - lpbs
    de_norm = np.maximum(np.linalg.norm(de, axis=1), 1e-12)
    f = nu / de_norm[:, None]
    cp_l = cps - pose.t
    d = np.sqrt(np.maximum(cp_l[:, 0] ** 2 + cp_l[:, 1] ** 2, 1e-12))
    inv_span = 1.0 / (max_range - min_range)
    w = 1.01 - (d - min_range) * inv_span
    r = w[:, None] * f

    def skew_many(v):
        z = np.zeros(n)
        return np.stack([
            np.stack([z, -v[:, 2], v[:, 1]], axis=1),
            np.stack([v[:, 2], z, -v[:, 0]], axis=1),
            np.stack([-v[:, 1], v[:, 0], z], axis=1)], axis=1)  # (N, 3, 3)

    df_dlp = skew_many(lpbs - lpas) / de_norm[:, None, None]
    dr_dtheta = w[:, None, None] * (df_dlp @ (-skew_many(u)))
    dw_dt = np.stack([cp_l[:, 0] / d * inv_span,
                      cp_l[:, 1] / d * inv_span,
                      np.zeros(n)], axis=1)
    dr_dt = w[:, None, None] * df_dlp + f[:, :, None] * dw_dt[:, None, :]
    return r, np.concatenate([dr_dtheta, dr_dt], axis=2)


def _golden_huber_weight(s, delta):
    return 1.0 if s <= delta * delta else delta / math.sqrt(max(s, 1e-20))


def _golden_huber_cost(s, delta):
    d2 = delta * delta
    return s if s <= d2 else 2.0 * delta * math.sqrt(max(s, 0.0)) - d2


def _golden_robust_cost(pose, cps, lpas, lpbs, min_range, max_range, delta):
    r, _ = _golden_residuals_jacobians(pose, cps, lpas, lpbs,
                                       min_range, max_range)
    s = np.sum(r * r, axis=1)
    d2 = delta * delta
    costs = np.where(s <= d2, s,
                     2.0 * delta * np.sqrt(np.maximum(s, 0.0)) - d2)
    return 0.5 * float(np.sum(costs))


def golden_lm_solve(pose: GoldenPose, cps, lpas, lpbs, *, min_range,
                    max_range, huber_delta=0.2, iters=4, init_lambda=1e-4):
    """Damped accept/reject LM over the tangent — the exact algorithm of
    ops/solver.lm_solve, float64 (normal equations accumulated array-wise;
    float64 reassociation noise ~1e-15, orders below every tolerance the
    oracle is consumed at)."""
    lam = init_lambda
    cost = _golden_robust_cost(pose, cps, lpas, lpbs, min_range, max_range,
                               huber_delta)
    for _ in range(iters):
        r, J = _golden_residuals_jacobians(pose, cps, lpas, lpbs,
                                           min_range, max_range)
        s = np.sum(r * r, axis=1)
        d2 = huber_delta * huber_delta
        wi = np.where(s <= d2, 1.0,
                      huber_delta / np.sqrt(np.maximum(s, 1e-20)))
        Jw = J * wi[:, None, None]
        JtJ = np.einsum("nja,njb->ab", Jw, J)
        Jtr = np.einsum("nja,nj->a", Jw, r)
        damped = JtJ + lam * np.diag(np.diag(JtJ)) + 1e-8 * np.eye(6)
        delta = np.linalg.solve(damped, -Jtr)
        cand = pose.retract(delta)
        new_cost = _golden_robust_cost(cand, cps, lpas, lpbs, min_range,
                                       max_range, huber_delta)
        if new_cost < cost:
            pose, cost, lam = cand, new_cost, lam * 0.5
        else:
            lam = lam * 4.0
    return pose


def golden_frame_loop(scans, *, scan_lines=64, min_range=3.0, max_range=75.0,
                      scan_regions=8, edges_per_region=10,
                      local_map_size=5, outer_iters=2, inner_iters=4,
                      huber_delta=0.2, knn_k=5, knn_max_sq_dist=1.0,
                      eig_ratio=3.0, min_line_sep=0.01,
                      smooth_fn=None):
    """The ENTIRE reference frame loop (laser_odometry.cc:100-272 +
    feature_extractor.cc), sequential NumPy float64: split -> smoothness ->
    greedy select -> [predict -> 2x (brute 5-NN + line gate -> 4-iter
    Huber-LM)] -> window push.  Returns the per-frame GoldenPose list —
    the end-to-end semantics oracle for the fused XLA ``full_step``.

    ``smooth_fn(scan) -> list of per-ring smoothness arrays`` optionally
    substitutes the smoothness values (e.g. the engine's float32 kernel
    output, which has its own bit-level golden test) so the rest of the
    loop can be pinned without float32-reordering tie noise in the greedy
    pick order."""
    window: List[np.ndarray] = []
    odom = GoldenPose()
    prev = GoldenPose()
    poses = []
    for scan in scans:
        scan = np.asarray(scan, np.float64)
        rings = golden_ring_split(scan, scan_lines, min_range, max_range)
        ring_smooth = smooth_fn(scan) if smooth_fn is not None else None
        edges_idx: List[int] = []
        for ri, ring in enumerate(rings):
            ring_pts = scan[ring]
            picks = golden_select_edges(
                ring_pts, scan_regions, edges_per_region,
                scan_regions * edges_per_region + 10,
                smooth=(None if ring_smooth is None
                        else ring_smooth[ri][:len(ring)]))
            edges_idx.extend(ring[p] for p in picks)
        edges = scan[edges_idx] if edges_idx else np.zeros((0, 3))

        pred = odom.compose(prev.inverse().compose(odom))
        prev = odom
        pose = pred
        map_pts = (np.concatenate(window, axis=0) if window
                   else np.zeros((0, 3)))
        for _ in range(outer_iters):
            ew = pose.transform(edges)
            lpa, lpb, ok = golden_line_correspondences(
                ew, map_pts, k=knn_k, max_sq_dist=knn_max_sq_dist,
                eig_ratio=eig_ratio, min_line_sep=min_line_sep)
            if ok.sum() > 0:
                pose = golden_lm_solve(
                    pose, edges[ok], lpa[ok], lpb[ok],
                    min_range=min_range, max_range=max_range,
                    huber_delta=huber_delta, iters=inner_iters)
        odom = pose
        window.append(pose.transform(edges))
        if len(window) > local_map_size:
            window.pop(0)
        poses.append(pose)
    return poses
