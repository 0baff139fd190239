"""Voxel-grid downsampling (centroid per occupied leaf).

Replaces ``pcl::VoxelGrid`` (used for the optional local-map filter,
laser_odometry.cc:286-295, and per-cell map re-voxelisation, map.cc:56-60)
with a sort + segment-mean over fixed-shape padded arrays: quantise each
point to its leaf, pack the leaf coordinate into one int32 key, sort, and
average each key-run.  Output has the same padded capacity with a validity
mask; order is leaf-key order (consumers — kNN, map cells — are
order-insensitive).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# 10 bits per axis: up to 1024 leaves per axis per call.  At the reference's
# 0.4 m leaf that spans 409 m — comfortably beyond the 75 m range gate plus
# window motion; inputs are re-centred to their minimum before quantising.
_BITS = 10
_SPAN = 1 << _BITS
_INVALID_KEY = jnp.int32(1 << 30)


@partial(jax.jit, static_argnames=("leaf",))
def voxel_downsample(xyz: jax.Array, valid: jax.Array,
                     leaf: float) -> Tuple[jax.Array, jax.Array]:
    """Centroid-per-leaf downsample.

    xyz: (N, 3), valid: (N,) bool -> (out_xyz (N, 3), out_valid (N,)).
    Matches PCL VoxelGrid semantics: leaf index = floor(p / leaf), output =
    mean of the points in each occupied leaf.
    """
    n = xyz.shape[0]
    big = jnp.asarray(jnp.inf, xyz.dtype)
    anchor = jnp.min(jnp.where(valid[:, None], xyz, big), axis=0)
    anchor = jnp.where(jnp.isfinite(anchor), anchor, 0.0)
    # floor against the global grid, then offset by the anchor's leaf index so
    # leaf membership is identical to floor(p / leaf) regardless of anchor
    q_abs = jnp.floor(xyz / leaf).astype(jnp.int32)
    q0 = jnp.floor(anchor / leaf).astype(jnp.int32)
    q = jnp.clip(q_abs - q0[None, :], 0, _SPAN - 1)
    key = (q[:, 0] << (2 * _BITS)) | (q[:, 1] << _BITS) | q[:, 2]
    key = jnp.where(valid, key, _INVALID_KEY)

    order = jnp.argsort(key)
    key_s = key[order]
    xyz_s = xyz[order]
    valid_s = valid[order]

    head = jnp.concatenate([jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1          # (N,) segment ids
    ones = valid_s.astype(xyz.dtype)
    sums = jax.ops.segment_sum(xyz_s * ones[:, None], seg, num_segments=n)
    cnts = jax.ops.segment_sum(ones, seg, num_segments=n)
    means = sums / jnp.maximum(cnts, 1.0)[:, None]

    nseg_valid = jnp.sum((head & valid_s).astype(jnp.int32))
    out_valid = jnp.arange(n, dtype=jnp.int32) < nseg_valid
    out_xyz = jnp.where(out_valid[:, None], means, 0.0)
    return out_xyz, out_valid
