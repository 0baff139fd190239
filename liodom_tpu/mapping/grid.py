"""Global hash-grid map — device-resident, fixed shape.

TPU-first re-design of the reference's ``Map``/``Cell``/``HashKey``
(/root/reference/include/liodom/map.h, /root/reference/src/map.cc):

* The reference keeps an ``unordered_map<HashKey, Cell*>`` of PCL clouds and,
  per update, transforms the incoming cloud to world, routes every point into
  its cell (map.cc:97-121), then re-voxelises every *modified* cell at
  ``resolution_`` with ``pcl::VoxelGrid`` (map.cc:124-128).
* Here the map is a device-resident **open-addressing hash table over
  resolution leaves** — the TPU shape of the same idea.  Each slot holds one
  filtered point (the centroid of its 0.4 m leaf), its cell key, and a packed
  (cell, leaf) identity code.  An update inserts the frame's points with a
  data-parallel linear-probe loop (E-sized gathers/scatters only — nothing
  ever touches all C rows), then folds the per-slot sums into the stored
  centroids.  This is exact w.r.t. the reference because (a) PCL's VoxelGrid
  leaves live on the *global* grid ``floor(p / leaf)`` (only leaf membership
  matters, not the cell's bounding box), and (b) a previously-filtered leaf
  holds exactly one point, so re-filtering a modified cell means averaging
  the stored centroid (weight 1) with the new points — precisely the fold.
* :func:`update_map_full` keeps the alternative formulation — merge + global
  sort by (cell key, leaf) + segment mean — as the semantic oracle the hash
  path is tested against (same point sets, same cell/filter semantics; row
  order is an internal layout detail).

Cell keys replicate ``updateMap``'s quantisation *exactly*, including the
C++ ``int`` truncation-toward-zero (map.cc:103-105):

    key_axis = trunc(floor(p / size) * size + size / 2)

with XY sharing one size and Z its own.  ``getLocalMap``'s neighbourhood —
including its quirk of computing the Z column bounds with the *XY* size but
stepping by the Z size (map.cc:175-178) — is replicated behaviourally via
statically precomputed key offsets (SURVEY.md: "replicate behavior, not the
likely bug").

Why a hash table and not a sorted soup: on TPU, XLA-level random data
movement over the full map (argsort + apply-permutation gathers, or
insertion-shift scatters of C rows) costs milliseconds per frame at
C = 262k, while E-sized (~5k) gathers/scatters and elementwise passes are
~100 µs-scale.  The probe loop does O(E) work per frame regardless of map
size — the same sparsity the reference exploits by re-filtering only
modified cells.
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
    xyz: jax.Array       # (C, 3) slot centroid (world frame); 0 when empty
    key: jax.Array       # (C, 3) int32 cell key of the slot
    valid: jax.Array     # (C,) bool — slot occupied
    overflow: jax.Array  # () int32 — points dropped (probe/capacity), cum.
    code1: jax.Array     # (C,) uint32 — packed (cell, leaf) identity, major
    code2: jax.Array     # (C,) uint32 — minor word; empty slots hold MAX


_MAXU32 = jnp.uint32(0xFFFFFFFF)
_MAX_PROBES = 64


def init_map(capacity: int, dtype=jnp.float32) -> MapState:
    return MapState(
        jnp.zeros((capacity, 3), dtype),
        jnp.zeros((capacity, 3), jnp.int32),
        jnp.zeros((capacity,), bool),
        jnp.zeros((), jnp.int32),
        jnp.full((capacity,), _MAXU32),
        jnp.full((capacity,), _MAXU32),
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


# Packed code path: bits per cell-index / per-cell leaf offset (see
# _packed_codes).  12 cell bits = ±2^11 cells per axis (±82 km at 40 m
# cells); 7 leaf bits require ceil(size/res) + 2 <= 128.
_CELL_BITS = 12
_LEAF_BITS = 7


def packable(cfg: MapConfig) -> bool:
    """True when (cell, leaf) codes fit the packed 57-bit key layout."""
    per_leaf = max(cfg.voxel_xysize, cfg.voxel_zsize) / cfg.resolution
    return (per_leaf + 2.0) <= float(1 << _LEAF_BITS) and \
        min(cfg.voxel_xysize, cfg.voxel_zsize, cfg.resolution) >= 0.01


def _packed_codes(xyz: jax.Array, ok: jax.Array, cfg: MapConfig
                  ) -> Tuple[jax.Array, jax.Array]:
    """Packed (cell, leaf) identity code per point, as a uint32 pair
    ``(k1 major, k2 minor)`` — ordering by it is equivalent to the 6-column
    (cell key, leaf index) lex sort of ``update_map_full``.

    The 57-bit code is CELL-MAJOR — ``[cx | cy | cz | lrx | lry | lrz]``
    (12b offset-unsigned cell indices, 7b per-cell leaf offsets).
    cell_index = floor(p/size) is a strictly monotonic relabeling of the
    reference's meter-valued cell key (injective for size >= 1), and
    leaf_within_cell = leaf - base_leaf(cell) is bijective to the global
    leaf inside one cell, so code equality == same (cell, leaf) exactly
    (cells with clamped out-of-range indices, ±82 km out, alias).  Invalid
    rows get the all-ones code (valid codes always have the k1 top bit
    clear — it doubles as the empty-slot sentinel)."""
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
    # [0(1) | cx(12) | cy(12) | cz(12) | lrx(7) | lry(7) | lrz(7)]:
    # K1 = top 32 bits, K2 = bottom 26
    k1 = (cux << 19) | (cuy << 7) | (cuz >> 5)
    k2 = ((cuz & jnp.uint32(0x1F)) << 21) | (lrx << 14) | (lry << 7) | lrz
    k1 = jnp.where(ok, k1, _MAXU32)
    k2 = jnp.where(ok, k2, _MAXU32)
    return k1, k2


def _order_by_codes(k1: jax.Array, k2: jax.Array) -> jax.Array:
    """Stable ascending order by the (k1, k2) pair — two uint32 argsorts."""
    order = jnp.argsort(k2, stable=True)
    return order[jnp.argsort(k1[order], stable=True)]


def _decode_cell_keys(k1: jax.Array, k2: jax.Array, cfg: MapConfig
                      ) -> jax.Array:
    """Inverse of the cell part of :func:`_packed_codes`: the reference's
    meter-valued cell key (map.cc:103-105) recovered elementwise from the
    packed code — bit-exact for non-aliased cells, because
    ``floor(p/size)`` is stored losslessly as the cell index and the key is
    the same f32 expression ``trunc(c*size + size/2)`` evaluated on it."""
    sx, sz = cfg.voxel_xysize, cfg.voxel_zsize
    half = 1 << (_CELL_BITS - 1)
    cux = (k1 >> 19) & jnp.uint32(0xFFF)
    cuy = (k1 >> 7) & jnp.uint32(0xFFF)
    cuz = ((k1 & jnp.uint32(0x7F)) << 5) | ((k2 >> 21) & jnp.uint32(0x1F))

    def axis_key(cu, size):
        c = (cu.astype(jnp.int32) - half).astype(jnp.float32)
        return jnp.trunc(c * size + size / 2.0).astype(jnp.int32)

    return jnp.stack([axis_key(cux, sx), axis_key(cuy, sx),
                      axis_key(cuz, sz)], axis=-1)


def _hash_pair(k1: jax.Array, k2: jax.Array, table_size: int) -> jax.Array:
    """Slot hash of a (k1, k2) code pair — two odd-constant multiplies mixed
    (Fibonacci/Murmur-style), mod table size."""
    h = (k1 * jnp.uint32(0x9E3779B1)) ^ (k2 * jnp.uint32(0x85EBCA77))
    h = h ^ (h >> 15)
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


def _probe_insert(tab1: jax.Array, tab2: jax.Array, k1: jax.Array,
                  k2: jax.Array, active: jax.Array
                  ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array,
                             jax.Array]:
    """Data-parallel find-or-insert of codes ``(k1, k2)`` into the
    open-addressing table ``(tab1, tab2)`` (empty slots hold the all-ones
    sentinel; valid codes always have the k1 top bit clear).

    Quadratic probing with triangular increments (slot += round) — visits
    every slot when the table size is a power of two (recommended), and
    avoids the primary clustering that makes linear probe chains blow up
    past ~60% load.  Claim races resolve by lexicographic-min scatter, so
    the outcome is deterministic and duplicate codes converge on one slot.

    Probing one slot per iteration is deliberate: a windowed variant that
    gathered 8 candidates per iteration (cutting the steady-state loop from
    ~5 rounds to ~2) measured 46% SLOWER on TPU (2.1 -> 3.0 ms isolated) —
    gather cost scales with total gathered elements, so one (N, 8) gather
    costs more than five (N, 1) rounds.  Returns (tab1, tab2, slot (N,),
    claimed (N,), failed (N,)):
    ``slot`` is each code's home (undefined where ``failed``), ``claimed``
    marks codes that created their slot this call."""
    n = tab1.shape[0]

    def body(carry):
        tab1, tab2, slot, done, claimed, probe = carry
        s = jnp.where(done, 0, slot)               # parked index for done rows
        g1, g2 = tab1[s], tab2[s]
        match = ~done & (g1 == k1) & (g2 == k2)
        empty = ~done & (g1 == _MAXU32) & (g2 == _MAXU32)

        # claim attempt: lexicographic-min wins the slot.  (Gating this
        # behind a lax.cond when nothing is empty was measured SLOWER —
        # the in-loop control flow costs more than the skipped scatters.)
        t1 = tab1.at[jnp.where(empty, slot, n)].min(k1, mode="drop")
        won1 = empty & (t1[s] == k1)
        t2 = tab2.at[jnp.where(won1, slot, n)].min(k2, mode="drop")
        won = won1 & (t2[s] == k2)
        done_now = match | won
        claimed = claimed | won
        done = done | done_now
        # triangular quadratic step: slot_r = h0 + r(r+1)/2 mod n
        slot = jnp.where(done, slot, (slot + probe + 1) % n)
        return t1, t2, slot, done, claimed, probe + 1

    def cond(carry):
        *_, done, _claimed, probe = carry
        return jnp.any(~done) & (probe < _MAX_PROBES)

    slot0 = _hash_pair(k1, k2, n)
    done0 = ~active
    claimed0 = jnp.zeros_like(active)
    tab1, tab2, slot, done, claimed, _ = jax.lax.while_loop(
        cond, body, (tab1, tab2, slot0, done0, claimed0, jnp.int32(0)))
    failed = active & ~done
    return tab1, tab2, slot, claimed, failed


@partial(jax.jit, static_argnames=("cfg",))
def update_map(state: MapState, pts: jax.Array, valid: jax.Array,
               pose: Pose, cfg: MapConfig) -> MapState:
    """Hash-grid ``Map::updateMap`` — the production fast path.

    Mirrors map.cc:90-129 the way the reference's own data structure does:
    transform to world, route each point to its (cell, leaf), insert-or-get
    the slot (the reference's ``unordered_map`` insert, map.cc:108-118),
    then fold the new points into the slot centroid — the re-voxelisation of
    modified cells (map.cc:124-128; a previously-filtered leaf is a single
    stored centroid of weight 1, so the fold IS VoxelGrid over {stored
    centroid} ∪ {new points}).

    Point-set semantics equal :func:`update_map_full` (tested); layout
    differs (hash slots vs sorted rows).  Deviations, both counted in
    ``overflow``: points are dropped when linear probing exhausts
    ``_MAX_PROBES`` slots or the table is effectively full — the reference
    grows without bound instead.  Non-packable configs (see
    :func:`packable`) fall back to the full path.

    Cost discipline (round 5 measurement): beyond the probe loop the update
    is ONE E-sized scatter-add (the 4-wide ``[x y z 1]`` payload) plus
    C-sized elementwise passes — ``key``/``valid`` decoded from the probe
    table.  VERDICT r4 #7 asked whether stamping key/valid with E-sized
    scatters (plus segment-reducing the centroid fold to O(E)) would beat
    these C-sized passes; MEASURED ANSWER: no, at every capacity.
    scripts/map_epilogue_sweep.py, steady state, real edges, ms/frame:

        C        this (dense)   O(E) epilogue
        131072        1.77          2.64
        262144        2.24          2.96
        524288        1.30          1.93
        1048576       1.37          1.96

    The C-sized passes are cheap HBM streaming; the O(E) variant pays an
    E-sized argsort + segment ops + three scattered writes that cost more
    at every C, and update cost is dominated by the PROBE loop — which gets
    cheaper at lower load, so 524k/1M-row tables run FASTER than 131k.
    KITTI-scale capacities are therefore affordable as-is (the long-course
    app defaults to 2^20 rows).  The rejected variant is kept as
    :func:`update_map_sparse_epilogue` with the same tested semantics."""
    if not packable(cfg):
        return update_map_full(state, pts, valid, pose, cfg)

    cap = state.xyz.shape[0]
    dtype = state.xyz.dtype

    new_xyz = se3.transform(pose, pts.astype(dtype))
    k1, k2 = _packed_codes(new_xyz, valid, cfg)

    tab1, tab2, slot, _claimed, failed = _probe_insert(
        state.code1, state.code2, k1, k2, valid)
    ok = valid & ~failed
    slot_c = jnp.where(ok, slot, cap)               # cap -> dropped

    payload = jnp.concatenate(
        [jnp.where(ok[:, None], new_xyz, 0.0),
         ok[:, None].astype(dtype)], axis=1)        # (E, 4)
    acc = jnp.zeros((cap, 4), dtype).at[slot_c].add(payload, mode="drop")
    add_sum, add_cnt = acc[:, :3], acc[:, 3]
    base_w = state.valid.astype(dtype)              # stored centroid weight
    touched = add_cnt > 0
    out_xyz = jnp.where(touched[:, None],
                        (state.xyz * base_w[:, None] + add_sum)
                        / (base_w + add_cnt)[:, None],
                        state.xyz)
    out_valid = tab1 != _MAXU32
    out_key = jnp.where(out_valid[:, None],
                        _decode_cell_keys(tab1, tab2, cfg), 0)

    dropped = jnp.sum((valid & failed).astype(jnp.int32))
    return MapState(out_xyz, out_key, out_valid,
                    state.overflow + dropped, tab1, tab2)


@partial(jax.jit, static_argnames=("cfg",))
def update_map_sparse_epilogue(state: MapState, pts: jax.Array,
                               valid: jax.Array, pose: Pose,
                               cfg: MapConfig) -> MapState:
    """MEASURED-REJECTED variant of :func:`update_map` (kept for the
    comparison record, scripts/map_epilogue_sweep.py — see the table in
    update_map's docstring): every non-probe pass is O(E) — the frame is
    segment-reduced BY SLOT (E-sized sort + segment sums), centroids are
    updated through an E-sized gather + scatter, and key/valid are stamped
    only at slots CLAIMED this call.  Semantically identical to
    :func:`update_map` (tested); slower at every capacity because the
    extra E-sized sort/segment machinery costs more than streaming the
    C-sized elementwise passes it avoids."""
    if not packable(cfg):
        return update_map_full(state, pts, valid, pose, cfg)

    cap = state.xyz.shape[0]
    dtype = state.xyz.dtype
    e = pts.shape[0]

    new_xyz = se3.transform(pose, pts.astype(dtype))
    k1, k2 = _packed_codes(new_xyz, valid, cfg)

    tab1, tab2, slot, claimed, failed = _probe_insert(
        state.code1, state.code2, k1, k2, valid)
    ok = valid & ~failed
    slot_c = jnp.where(ok, slot, cap)               # cap -> dropped

    # segment-reduce the frame by destination slot: invalid rows sort last
    order = jnp.argsort(slot_c)
    slot_s = slot_c[order]
    xyz_s = jnp.where(ok[order][:, None], new_xyz[order], 0.0)
    w_s = ok[order].astype(dtype)
    head = jnp.concatenate(
        [jnp.ones((1,), bool), slot_s[1:] != slot_s[:-1]])
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1
    sums = jax.ops.segment_sum(xyz_s * w_s[:, None], seg, num_segments=e)
    cnts = jax.ops.segment_sum(w_s, seg, num_segments=e)
    seg_slot = jax.ops.segment_min(slot_s, seg, num_segments=e)

    # new centroid per touched slot = VoxelGrid over {stored centroid
    # (weight = valid)} ∪ {this frame's points in the leaf}
    tgt = jnp.where((cnts > 0) & (seg_slot < cap), seg_slot, cap)
    g = jnp.minimum(tgt, cap - 1)                   # safe gather index
    w0 = state.valid[g].astype(dtype)
    base = state.xyz[g] * w0[:, None]
    cent = (base + sums) / jnp.maximum(w0 + cnts, 1.0)[:, None]
    out_xyz = state.xyz.at[tgt].set(cent.astype(dtype), mode="drop")

    # key/valid stamped only at slots CLAIMED this call (E-sized scatters;
    # a matched slot already carries them).  The key is the reference
    # expression evaluated on the claiming point (map.cc:103-105) —
    # identical to the packed-code decode for non-aliased cells.
    claim_tgt = jnp.where(claimed, slot, cap)
    out_key = state.key.at[claim_tgt].set(
        cell_keys(new_xyz, cfg), mode="drop")
    out_valid = state.valid.at[claim_tgt].set(True, mode="drop")

    dropped = jnp.sum((valid & failed).astype(jnp.int32))
    return MapState(out_xyz, out_key, out_valid,
                    state.overflow + dropped, tab1, tab2)


@partial(jax.jit, static_argnames=("cfg",))
def update_map_full(state: MapState, pts: jax.Array, valid: jax.Array,
                    pose: Pose, cfg: MapConfig) -> MapState:
    """Sorted-soup ``Map::updateMap`` — the semantic oracle.

    One fused pass: world transform -> cell keys -> merge with the existing
    points -> sort by (cell, leaf) -> segment centroid -> recompacted rows
    (ascending by packed code).  Overflow beyond capacity is counted, and
    the points kept are the lexicographically-smallest keys.

    O((C+E) log (C+E)) data movement per call — use :func:`update_map` in
    production; this exists to pin the semantics (tests assert point-set
    equality between the two).  NOTE: output states follow the sorted-rows
    layout; feed them back to ``update_map_full`` only (the hash path
    requires its own probe-table layout)."""
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
        k1, k2 = _packed_codes(xyz, ok, cfg)
        order = _order_by_codes(k1, k2)
        k1_s, k2_s = k1[order], k2[order]
    else:
        # generic 6-column lex sort; invalid rows last via a bumped major key
        inval = (~ok).astype(jnp.int32)
        cols = [key[:, 0] + inval * jnp.int32(2 ** 30),
                key[:, 1], key[:, 2],
                leaf[:, 0], leaf[:, 1], leaf[:, 2]]
        order = _lex_order(cols)
        k1_s = k2_s = jnp.full((n,), _MAXU32)
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
    out_k1 = jnp.where(live, k1_s[seg_first], _MAXU32)[:cap]
    out_k2 = jnp.where(live, k2_s[seg_first], _MAXU32)[:cap]
    dropped = jnp.maximum(n_seg - cap, 0)

    return MapState(out_xyz, out_key, out_valid,
                    state.overflow + dropped, out_k1, out_k2)


def count_cells(state: MapState) -> int:
    """Exact distinct-cell count — the reference's ``map_.size()`` over its
    ``unordered_map`` of cells (map.h/map.cc), a logging/diagnostic value.

    Host-side and lazy by design: the former per-frame on-device counter
    cost a second probe-insert pass (~half of ``update_map``); nothing on
    the hot path consumes the count, so it is computed here on demand from
    either map layout."""
    key = np.asarray(state.key)[np.asarray(state.valid)]
    if key.size == 0:
        return 0
    return int(len(np.unique(key, axis=0)))


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
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Neighbourhood extraction (``Map::getLocalMap``, map.cc:141-189):
    all map points whose cell key lies in the XY block / Z column around
    ``position``, compacted to ``capacity`` rows (+ mask).

    Returns ``(xyz (cap, 3), valid (cap,), n_hits ())`` — ``n_hits`` is the
    neighbourhood size BEFORE capacity truncation, so callers can detect
    (and must report) a lossy extraction: the reference returns everything
    (map.cc:141-189), here hits beyond ``capacity`` are dropped (a
    deterministic, layout-dependent subset).

    The reference truncates the pose translation to ``int`` *before*
    quantising (map.cc:146-154) — replicated.  Works on either map layout
    (hash slots or sorted rows) — membership is by stored cell key.

    Measured design record (round 4): maintaining per-cell slot lists at
    insert so this gathers ~n_hits rows instead of touching C was declined
    — the add side is a second per-frame probe-insert (the removed round-2
    cell counter measured ~half of ``update_map``) against ~0.7 ms net
    here; a ``top_k`` partial-selection compaction is within ±0.3 ms of
    the argsort either way.  The lever that pays is sizing C itself:
    ``update_map`` carries C-sized elementwise decode passes, so a
    right-sized table (~30% load) wins — see
    scripts/map_capacity_sweep.py and the README dead-end list."""
    c = state.xyz.shape[0]
    cap = capacity if capacity is not None else c
    base = cell_keys(jnp.trunc(position), cfg)             # (3,)
    offs = jnp.asarray(local_map_offsets(cfg, cells_xy, cells_z))  # (K, 3)
    targets = base[None, :] + offs                         # (K, 3)
    # (C, K) membership: point's cell key equals any target key
    eq = jnp.all(state.key[:, None, :] == targets[None, :, :], axis=-1)
    hit = jnp.any(eq, axis=-1) & state.valid               # (C,)
    n_hits = jnp.sum(hit.astype(jnp.int32))
    # compact hits to the front, preserving row order: select the
    # ``capacity`` smallest keys (hit rows keep their unique ascending row
    # index, non-hits share a big constant) with top_k — a PARTIAL
    # selection, measured 1.14 vs 1.70 ms for the full argsort at
    # C=131072 with identical output (keys are unique over hits, so the
    # tie-order of the shared non-hit key never reaches the output mask).
    # A cumsum+scatter compaction of all C rows measured ~2x slower still.
    key = jnp.where(hit, jnp.arange(c, dtype=jnp.int32),
                    jnp.int32(1) << 30)
    _, order = jax.lax.top_k(-key, min(cap, c))
    if cap > c:           # capacity can exceed the map row count
        order = jnp.pad(order, (0, cap - c))   # pad rows masked out below
    out_valid = jnp.arange(cap, dtype=jnp.int32) < n_hits
    out_xyz = jnp.where(out_valid[:, None], state.xyz[order], 0.0)
    return out_xyz, out_valid, n_hits


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
