"""Sliding-window local map as a fixed-shape ring buffer.

The reference's ``LocalMapManager`` (laser_odometry.cc:24-69) keeps a
concatenated cloud of the last N feature frames and evicts the oldest frame's
points with an ExtractIndices negative filter.  Functionally that's a ring
buffer: here eviction is just overwriting the slot — pure index arithmetic,
no data movement.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class WindowState(NamedTuple):
    xyz: jax.Array      # (K, E, 3) per-frame edge clouds
    valid: jax.Array    # (K, E) bool
    next_slot: jax.Array  # () int32 — ring write pointer
    nframes: jax.Array    # () int32 — frames currently held (<= K)

    @staticmethod
    def create(max_frames: int, capacity: int, dtype=jnp.float32) -> "WindowState":
        return WindowState(
            jnp.zeros((max_frames, capacity, 3), dtype),
            jnp.zeros((max_frames, capacity), bool),
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
        )

    @property
    def max_frames(self) -> int:
        return self.xyz.shape[0]


def push(state: WindowState, xyz: jax.Array, valid: jax.Array) -> WindowState:
    """Add a frame, evicting the oldest when full (LocalMapManager::
    addPointCloud, laser_odometry.cc:34-60).

    The frame is **compacted** (valid points moved to the front, stable) on
    the way in: edge slots arrive ring-scattered and mostly empty, and a
    front-packed layout lets the kNN kernel skip whole all-padding tiles
    (ops/knn_pallas.py per-tile validity prefetch).  Point set and relative
    order are unchanged, so results are identical.  (Round-4 note: sorting
    each frame SPATIALLY here so the matching map could skip its global
    per-frame sort was measured and rejected — per-frame segments overlap
    in space, which doubles the kNN's prune-flagged tiles; see
    odometry_step's map_presorted comment.)"""
    k = state.max_frames
    slot = state.next_slot
    order = jnp.argsort(~valid, stable=True)
    xyz_c = jnp.where(valid[order][:, None], xyz[order], 0.0)
    valid_c = valid[order]
    return WindowState(
        jax.lax.dynamic_update_index_in_dim(state.xyz, xyz_c, slot, axis=0),
        jax.lax.dynamic_update_index_in_dim(state.valid, valid_c, slot, axis=0),
        (slot + 1) % k,
        jnp.minimum(state.nframes + 1, k),
    )


def flatten(state: WindowState) -> Tuple[jax.Array, jax.Array]:
    """Concatenated window cloud (K*E, 3) + mask (slots beyond nframes off)."""
    k, e, _ = state.xyz.shape
    slot_live = jnp.arange(k, dtype=jnp.int32) < state.nframes
    mask = state.valid & slot_live[:, None]
    return state.xyz.reshape(k * e, 3), mask.reshape(k * e)
