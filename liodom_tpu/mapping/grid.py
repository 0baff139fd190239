"""Global hash-grid map — device-resident, fixed shape.

TPU-first re-design of the reference's ``Map``/``Cell``/``HashKey``
(/root/reference/include/liodom/map.h, /root/reference/src/map.cc):

* The reference keeps an ``unordered_map<HashKey, Cell*>`` of PCL clouds and,
  per update, transforms the incoming cloud to world, routes every point into
  its cell (map.cc:97-121), then re-voxelises every *modified* cell at
  ``resolution_`` with ``pcl::VoxelGrid`` (map.cc:124-128).
* Here the map is a flat **point soup**: padded arrays ``xyz (C,3)``,
  ``key (C,3) int32`` (the cell key of each point), ``valid (C,)``.  An update
  concatenates the incoming world points with the soup, sorts by
  ``(cell key, resolution-leaf index)`` and takes one segment-mean — which is
  simultaneously the hash-insert *and* the per-cell re-voxelisation.  This is
  exact w.r.t. the reference because (a) PCL's VoxelGrid leaves live on the
  *global* grid ``floor(p / leaf)`` (only leaf membership matters, not the
  cell's bounding box), and (b) centroid filtering is idempotent — an
  unmodified (already filtered) cell has one point per leaf, so re-filtering
  it returns it unchanged.  Filtering everything every update therefore
  equals the reference's modified-only filtering, as a single wide sort
  instead of per-cell FLANN-free loops.

Cell keys replicate ``updateMap``'s quantisation *exactly*, including the
C++ ``int`` truncation-toward-zero (map.cc:103-105):

    key_axis = trunc(floor(p / size) * size + size / 2)

with XY sharing one size and Z its own.  ``getLocalMap``'s neighbourhood —
including its quirk of computing the Z column bounds with the *XY* size but
stepping by the Z size (map.cc:175-178) — is replicated behaviourally via
statically precomputed key offsets (SURVEY.md: "replicate behavior, not the
likely bug").
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from liodom_tpu.core.config import MapConfig
from liodom_tpu.core.pose import Pose
from liodom_tpu.core import pose as se3


class MapState(NamedTuple):
    xyz: jax.Array       # (C, 3) map points (filtered soup), world frame
    key: jax.Array       # (C, 3) int32 cell key of each point
    valid: jax.Array     # (C,) bool
    n_cells: jax.Array   # () int32 — distinct occupied cells
    overflow: jax.Array  # () int32 — points dropped at capacity, cumulative


def init_map(capacity: int, dtype=jnp.float32) -> MapState:
    return MapState(
        jnp.zeros((capacity, 3), dtype),
        jnp.zeros((capacity, 3), jnp.int32),
        jnp.zeros((capacity,), bool),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
    )


def cell_keys(xyz: jax.Array, cfg: MapConfig) -> jax.Array:
    """Per-point cell key, replicating map.cc:103-105 exactly:
    ``int(floor(p/size)*size + size/2)`` per axis (trunc-toward-zero)."""
    xy, z = cfg.voxel_xysize, cfg.voxel_zsize
    kx = jnp.trunc(jnp.floor(xyz[..., 0] / xy) * xy + xy / 2.0)
    ky = jnp.trunc(jnp.floor(xyz[..., 1] / xy) * xy + xy / 2.0)
    kz = jnp.trunc(jnp.floor(xyz[..., 2] / z) * z + z / 2.0)
    return jnp.stack([kx, ky, kz], axis=-1).astype(jnp.int32)


def _leaf_index(xyz: jax.Array, res: float) -> jax.Array:
    """Global-grid leaf index per axis (PCL VoxelGrid semantics:
    ``floor(p / leaf)``)."""
    return jnp.floor(xyz / res).astype(jnp.int32)


def _lex_order(cols: Sequence[jax.Array]) -> jax.Array:
    """Row order sorting lexicographically by cols[0] (major) .. cols[-1].

    Implemented as repeated stable sorts from minor to major key (the
    classic radix-over-columns construction; jnp sorts are stable)."""
    order = jnp.argsort(cols[-1], stable=True)
    for c in cols[-2::-1]:
        order = order[jnp.argsort(c[order], stable=True)]
    return order


# Packed sort path: bits per cell-index / per-cell leaf offset (see
# _packed_order).  12 cell bits = ±2^11 cells per axis (±82 km at 40 m
# cells); 7 leaf bits require ceil(size/res) + 2 <= 128.
_CELL_BITS = 12
_LEAF_BITS = 7


def packable(cfg: MapConfig) -> bool:
    """True when (cell, leaf) codes fit the packed 58-bit key layout."""
    per_leaf = max(cfg.voxel_xysize, cfg.voxel_zsize) / cfg.resolution
    return (per_leaf + 2.0) <= float(1 << _LEAF_BITS) and \
        min(cfg.voxel_xysize, cfg.voxel_zsize, cfg.resolution) >= 0.01


def _packed_order(xyz: jax.Array, ok: jax.Array, cfg: MapConfig
                  ) -> jax.Array:
    """Sort order equivalent to the 6-column (cell key, leaf index) lex sort
    of ``update_map`` — but via TWO uint32 stable argsorts instead of six.

    The 57-bit code is CELL-MAJOR — ``[cx | cy | cz | lrx | lry | lrz]``
    (12b offset-unsigned cell indices, 7b per-cell leaf offsets) — so all
    points of a cell stay contiguous (n_cells counting depends on that).
    cell_index = floor(p/size) is a strictly monotonic relabeling of the
    reference's meter-valued cell key (injective for size >= 1), and
    leaf_within_cell = leaf - base_leaf(cell) is bijective to the global
    leaf inside one cell, so the induced grouping matches the 6-column sort
    exactly (cells with clamped out-of-range indices, ±82 km out, alias).
    Invalid rows carry a dedicated top bit and sort last."""
    sx, sz, res = cfg.voxel_xysize, cfg.voxel_zsize, cfg.resolution
    half_cells = 1 << (_CELL_BITS - 1)

    def axis_codes(p, size):
        c = jnp.floor(p / size)
        leaf = jnp.floor(p / res)
        base = jnp.floor(c * size / res)
        rel = jnp.clip((leaf - base).astype(jnp.int32), 0,
                       (1 << _LEAF_BITS) - 1).astype(jnp.uint32)
        cu = jnp.clip(c.astype(jnp.int32) + half_cells, 0,
                      (1 << _CELL_BITS) - 1).astype(jnp.uint32)
        return cu, rel

    cux, lrx = axis_codes(xyz[:, 0], sx)
    cuy, lry = axis_codes(xyz[:, 1], sx)
    cuz, lrz = axis_codes(xyz[:, 2], sz)
    inval = (~ok).astype(jnp.uint32)
    # [inval(1) | cx(12) | cy(12) | cz(12) | lrx(7) | lry(7) | lrz(7)]:
    # K1 = top 32 bits, K2 = bottom 26
    k1 = (inval << 31) | (cux << 19) | (cuy << 7) | (cuz >> 5)
    k2 = ((cuz & jnp.uint32(0x1F)) << 21) | (lrx << 14) | (lry << 7) | lrz
    order = jnp.argsort(k2, stable=True)
    return order[jnp.argsort(k1[order], stable=True)]


@partial(jax.jit, static_argnames=("cfg",))
def update_map(state: MapState, pts: jax.Array, valid: jax.Array,
               pose: Pose, cfg: MapConfig) -> MapState:
    """Insert a (sensor-frame) cloud at ``pose`` and re-voxelise
    (``Map::updateMap``, map.cc:90-129).

    One fused pass: world transform -> cell keys -> merge with the existing
    soup -> sort by (cell, leaf) -> segment centroid -> recompacted soup.
    Overflow beyond the soup capacity is counted, and the points kept are the
    lexicographically-smallest keys (deterministic, spatially coherent)."""
    cap = state.xyz.shape[0]
    dtype = state.xyz.dtype

    new_xyz = se3.transform(pose, pts.astype(dtype))
    new_key = cell_keys(new_xyz, cfg)
    new_valid = valid

    xyz = jnp.concatenate([state.xyz, new_xyz], axis=0)
    key = jnp.concatenate([state.key, new_key], axis=0)
    ok = jnp.concatenate([state.valid, new_valid], axis=0)
    n = xyz.shape[0]

    leaf = _leaf_index(xyz, cfg.resolution)
    if packable(cfg):
        # 2-sort packed path (3x fewer argsorts; identical grouping)
        order = _packed_order(xyz, ok, cfg)
    else:
        # generic 6-column lex sort; invalid rows last via a bumped major key
        inval = (~ok).astype(jnp.int32)
        cols = [key[:, 0] + inval * jnp.int32(2 ** 30),
                key[:, 1], key[:, 2],
                leaf[:, 0], leaf[:, 1], leaf[:, 2]]
        order = _lex_order(cols)
    xyz_s = xyz[order]
    key_s = key[order]
    leaf_s = leaf[order]
    ok_s = ok[order]

    same = jnp.ones((n - 1,), bool)
    for c_s in (key_s, leaf_s):
        for a in range(3):
            same = same & (c_s[1:, a] == c_s[:-1, a])
    head = jnp.concatenate([jnp.ones((1,), bool), ~same])
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1
    w = ok_s.astype(dtype)
    sums = jax.ops.segment_sum(xyz_s * w[:, None], seg, num_segments=n)
    cnts = jax.ops.segment_sum(w, seg, num_segments=n)
    means = sums / jnp.maximum(cnts, 1.0)[:, None]
    # segment -> representative row (its head); keys are constant per segment
    head_rows = jnp.where(head, jnp.arange(n, dtype=jnp.int32), n - 1)
    seg_first = jax.ops.segment_min(head_rows, seg, num_segments=n)
    seg_key = key_s[seg_first]

    n_seg = jnp.sum((head & ok_s).astype(jnp.int32))
    live = jnp.arange(n, dtype=jnp.int32) < n_seg
    out_xyz = jnp.where(live[:, None], means, 0.0)[:cap]
    out_key = jnp.where(live[:, None], seg_key, 0)[:cap]
    out_valid = live[:cap]
    dropped = jnp.maximum(n_seg - cap, 0)

    # distinct cells among surviving rows (cell key change marks a new cell)
    cell_head = jnp.concatenate(
        [jnp.ones((1,), bool),
         jnp.any(seg_key[1:cap] != seg_key[:cap - 1], axis=-1)])
    n_cells = jnp.sum((cell_head & out_valid).astype(jnp.int32))

    return MapState(out_xyz, out_key, out_valid, n_cells,
                    state.overflow + dropped)


def get_map(state: MapState) -> Tuple[jax.Array, jax.Array]:
    """Full map cloud + mask (``Map::getMap``, map.cc:131-139)."""
    return state.xyz, state.valid


def local_map_offsets(cfg: MapConfig, cells_xy: int | None = None,
                      cells_z: int | None = None) -> np.ndarray:
    """Static neighbour-key OFFSETS for getLocalMap (map.cc:141-189).

    The reference iterates an XY block ``(2*cells_xy+1)^2`` at the pose's
    z-level plus a vertical column — whose loop bounds use ``voxel_xysize_``
    but whose step is ``voxel_zsize_`` (map.cc:175-178); replicated verbatim.
    All loop arithmetic is C++ int truncation of double increments; since the
    base voxel key is integral, the offsets are independent of the pose and
    can be precomputed here (host, numpy)."""
    cxy = cfg.cells_xy if cells_xy is None else cells_xy
    cz = cfg.cells_z if cells_z is None else cells_z
    xy, zs = cfg.voxel_xysize, cfg.voxel_zsize
    offs = []

    def int_range(init: float, end: float, step: float):
        vals, i = [], float(init)
        while int(i) <= int(end):
            vals.append(int(i))
            i = int(i) + step
        return vals

    for dx in int_range(-cxy * xy, cxy * xy, xy):
        for dy in int_range(-cxy * xy, cxy * xy, xy):
            offs.append((dx, dy, 0))
    # z column: bounds with the XY size, step with the Z size (the quirk)
    for dz in int_range(-cz * xy, cz * xy, zs):
        offs.append((0, 0, dz))
    return np.asarray(offs, dtype=np.int32)


@partial(jax.jit, static_argnames=("cfg", "cells_xy", "cells_z", "capacity"))
def get_local_map(state: MapState, position: jax.Array, cfg: MapConfig,
                  cells_xy: int | None = None, cells_z: int | None = None,
                  capacity: int | None = None
                  ) -> Tuple[jax.Array, jax.Array]:
    """Neighbourhood extraction (``Map::getLocalMap``, map.cc:141-189):
    all map points whose cell key lies in the XY block / Z column around
    ``position``, compacted to ``capacity`` rows (+ mask).

    The reference truncates the pose translation to ``int`` *before*
    quantising (map.cc:146-154) — replicated."""
    cap = capacity if capacity is not None else state.xyz.shape[0]
    base = cell_keys(jnp.trunc(position), cfg)             # (3,)
    offs = jnp.asarray(local_map_offsets(cfg, cells_xy, cells_z))  # (K, 3)
    targets = base[None, :] + offs                         # (K, 3)
    # (C, K) membership: point's cell key equals any target key
    eq = jnp.all(state.key[:, None, :] == targets[None, :, :], axis=-1)
    hit = jnp.any(eq, axis=-1) & state.valid               # (C,)
    # compact hits to the front (stable: keeps soup order)
    order = jnp.argsort(~hit, stable=True)[:cap]
    out_xyz = state.xyz[order]
    out_valid = hit[order]
    return jnp.where(out_valid[:, None], out_xyz, 0.0), out_valid


def map_entropy(state: MapState, bucket_count: int | None = None) -> float:
    """Shannon entropy of hash-bucket occupancy (``Map::getMapEntropy``,
    map.cc:191-211) — host-side diagnostic.

    The reference hashes cell keys with ``(h1 ^ h2<<1) ^ h3<<2`` into
    ``unordered_map`` buckets; the bucket count is implementation-defined, so
    (documented deviation) we default to the smallest libstdc++-style prime
    >= the cell count."""
    key = np.asarray(state.key)[np.asarray(state.valid)]
    if key.size == 0:
        return 0.0
    cells = np.unique(key, axis=0).astype(np.int64)
    n = len(cells)
    if bucket_count is None:
        bucket_count = int(_next_prime(max(n, 2)))
    h = (cells[:, 0] ^ (cells[:, 1] << 1)) ^ (cells[:, 2] << 2)
    buckets = h % bucket_count
    _, counts = np.unique(buckets, return_counts=True)
    p = counts / float(n)
    return float(-(p * np.log(p)).sum())


def _next_prime(n: int) -> int:
    def is_prime(k):
        if k < 2:
            return False
        for d in range(2, int(k ** 0.5) + 1):
            if k % d == 0:
                return False
        return True

    while not is_prime(n):
        n += 1
    return n
