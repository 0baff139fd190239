"""Fixed-shape scan containers.

The reference moves variable-size ``pcl::PointCloud::Ptr`` objects between
threads (shared_data.h:42-52).  On TPU everything is a padded fixed-shape
tensor + mask so the whole pipeline stays inside one compiled program:

* :class:`RawScan` — padded (N, 3) points straight from the sensor/loader.
* :class:`RingImage` — points routed into rings, padded to (rings, width, 3),
  the canonical layout every downstream op consumes.
* :class:`EdgeCloud` — extracted edge features, padded (E, 3) + mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RawScan(NamedTuple):
    xyz: jax.Array    # (N, 3) padded point coordinates
    valid: jax.Array  # (N,) bool — padding mask from the loader

    @staticmethod
    def from_points(xyz, capacity: int) -> "RawScan":
        xyz = jnp.asarray(xyz)
        n = xyz.shape[0]
        if n > capacity:
            raise ValueError(f"scan has {n} points > capacity {capacity}")
        pad = capacity - n
        out = jnp.pad(xyz, ((0, pad), (0, 0)))
        valid = jnp.pad(jnp.ones((n,), dtype=bool), (0, pad))
        return RawScan(out, valid)


class RingImage(NamedTuple):
    """Scan split into rings (reference: splitPointCloud,
    feature_extractor.cc:104-179), as a dense padded image.

    Within a ring, points keep their input order — the smoothness stencil and
    neighbour suppression depend on it."""

    xyz: jax.Array     # (rings, width, 3)
    count: jax.Array   # (rings,) int32 — points routed into each ring
    # mask is derivable: col < count


def ring_mask(img: RingImage) -> jax.Array:
    w = img.xyz.shape[1]
    cols = jnp.arange(w, dtype=img.count.dtype)
    return cols[None, :] < img.count[:, None]


class EdgeCloud(NamedTuple):
    xyz: jax.Array    # (E, 3)
    valid: jax.Array  # (E,) bool

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def num_valid(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32))
