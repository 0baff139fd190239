"""Synthetic LiDAR scene generation — for tests, the demo app, and bench.

The reference has no test data generator (or tests at all — SURVEY.md §4);
KITTI bags are external.  This module simulates an HDL-64-like scanner in a
structured world (ground plane, building walls, poles) so the full pipeline
can be exercised and scored against exact ground truth anywhere.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def hdl64_directions(width: int = 1800) -> Tuple[np.ndarray, np.ndarray]:
    """Unit ray directions for a 64-ring spin: (64*width, 3) and elevations."""
    az = np.linspace(-np.pi, np.pi, width, endpoint=False)
    elevs = np.deg2rad(np.linspace(2.0, -24.3, 64))
    e, a = np.meshgrid(elevs, az, indexing="ij")
    d = np.stack([np.cos(e) * np.cos(a), np.cos(e) * np.sin(a), np.sin(e)],
                 axis=-1)
    return d.reshape(-1, 3), elevs


class BoxWorld:
    """Axis-aligned world: ground plane at z, a ring of walls, random poles."""

    def __init__(self, seed: int = 0, extent: float = 60.0, n_poles: int = 60,
                 ground_z: float = -1.8):
        rng = np.random.default_rng(seed)
        self.extent = extent
        self.ground_z = ground_z
        ang = rng.uniform(0, 2 * np.pi, n_poles)
        rad = rng.uniform(8.0, extent * 0.9, n_poles)
        self.poles = np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1)
        self.pole_r = rng.uniform(0.15, 0.5, n_poles)

    def render(self, sensor_xyz: np.ndarray, R: np.ndarray,
               width: int = 1800, noise: float = 0.01,
               seed: int = 0) -> np.ndarray:
        """Ray-cast a scan from pose (R, sensor_xyz). Returns (N, 3) points in
        the SENSOR frame (what the device would output)."""
        dirs_s, _ = hdl64_directions(width)
        dirs_w = dirs_s @ R.T                     # world-frame ray directions
        o = sensor_xyz

        t_best = np.full(len(dirs_w), np.inf)
        # ground plane z = ground_z
        dz = dirs_w[:, 2]
        tg = np.where(dz < -1e-6, (self.ground_z - o[2]) / np.minimum(dz, -1e-6),
                      np.inf)
        t_best = np.minimum(t_best, tg)
        # four walls at +-extent in x and y
        for axis, sign in ((0, 1), (0, -1), (1, 1), (1, -1)):
            da = dirs_w[:, axis]
            denom = np.where(np.abs(da) > 1e-6, da, 1e-6)
            tw = (sign * self.extent - o[axis]) / denom
            hit = (tw > 0.1) & (np.sign(da) == sign)
            t_best = np.where(hit, np.minimum(t_best, tw), t_best)
        # poles: infinite vertical cylinders
        d2 = dirs_w[:, :2]
        for (px, py), pr in zip(self.poles, self.pole_r):
            rel = np.array([px, py]) - o[:2]
            a = np.sum(d2 * d2, -1)
            b = -2.0 * (d2 @ rel)
            c = rel @ rel - pr * pr
            disc = b * b - 4 * a * c
            ok = (disc > 0) & (a > 1e-9)
            sq = np.sqrt(np.maximum(disc, 0))
            t0 = (-b - sq) / np.maximum(2 * a, 1e-9)
            hit = ok & (t0 > 0.1)
            t_best = np.where(hit, np.minimum(t_best, t0), t_best)

        t_best = np.where(np.isfinite(t_best), t_best, 1e4)
        pts_w = o[None, :] + t_best[:, None] * dirs_w
        # back to sensor frame
        pts_s = (pts_w - o[None, :]) @ R
        rng = np.random.default_rng(seed)
        pts_s = pts_s + rng.normal(size=pts_s.shape) * noise
        return pts_s.astype(np.float32)


def drive_trajectory(n_frames: int, speed: float = 1.0,
                     yaw_rate: float = 0.01,
                     accel_frames: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """A gently curving trajectory accelerating from rest (vehicles start at
    rest — the constant-velocity predictor, like the reference's, needs
    motion to build gradually, laser_odometry.cc:148-150).
    Returns (positions (F, 3), yaws (F,))."""
    yaws = np.cumsum(np.full(n_frames, yaw_rate)) - yaw_rate
    pos = np.zeros((n_frames, 3))
    for i in range(1, n_frames):
        v = speed * min(1.0, i / max(accel_frames, 1))
        pos[i] = pos[i - 1] + v * np.array(
            [np.cos(yaws[i - 1]), np.sin(yaws[i - 1]), 0.0])
    return pos, yaws


def yaw_matrix(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
