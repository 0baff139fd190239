"""Pallas TPU kernel for exact brute-force k-nearest-neighbours.

This is the #1 hot op of the frame loop (SURVEY.md §3.1: the reference
rebuilds a ``pcl::KdTreeFLANN`` and runs 5-NN per edge twice per frame,
laser_odometry.cc:318-323).  The XLA fallback (:func:`liodom_tpu.ops.
neighbors.knn`) scans reference chunks with ``lax.top_k`` — which lowers to a
sort on TPU and streams every (E, chunk) distance tile through HBM.  This
kernel instead:

* tiles queries over the grid and loops reference tiles sequentially
  (TPU grids iterate the minor axis in order, so VMEM scratch carries the
  running best-k across reference tiles);
* computes the (TILE_E, TILE_M) squared-distance tile on the VPU from
  coordinate planes — with K=3 there is nothing for the MXU to chew on, and
  the elementwise form skips the ``|q|^2 - 2 q.r + |r|^2`` cancellation error
  (which on TPU default-precision matmuls is metres large);
* selects k minima by k masked argmin passes (k=5 ≪ log-sort cost) entirely
  in VMEM — the distance tile never touches HBM;
* **skips all-padding reference tiles**: a scalar-prefetched per-tile flag
  (SMEM) gates the whole distance+selection body with ``pl.when``.  The
  sliding-window local map is ≳80% padding (frames are front-compacted by
  ``local_map.push``), so this is most of the win.

Invalid reference points are encoded by the host wrapper as coordinates
pushed ``FAR`` away (distance ~1e8, far beyond any accept gate but finite),
so the kernel compute itself is maskless and branch-free.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
_FAR = 1.0e4  # invalid-point displacement (d2 >= ~9.7e7 >> max real d2)
_KPAD = 128   # lane-aligned storage for the running best-k


def _knn_kernel(flags_ref, q_ref, r_ref, out_d_ref, out_i_ref, best_d,
                best_i, *, k: int, tile_m: int):
    """One (query-tile, ref-tile) grid step.

    flags_ref: (n_e_tiles * n_m_tiles,) int32 scalar-prefetch — 1 if this
    (query tile, ref tile) pair needs computing (both non-empty and, under
    radius pruning, their AABBs within the accept radius);  q_ref:
    (TILE_E, 4) query coords [x y z 0];  r_ref: (4, TILE_M) ref coords;
    best_d/best_i: (TILE_E, KPAD) VMEM scratch carried across ref tiles.
    """
    e_idx = pl.program_id(0)
    m_idx = pl.program_id(1)
    n_m = pl.num_programs(1)
    tile_e = q_ref.shape[0]

    @pl.when(m_idx == 0)
    def _():
        best_d[:] = jnp.full((tile_e, _KPAD), _BIG, jnp.float32)
        best_i[:] = jnp.zeros((tile_e, _KPAD), jnp.int32)

    @pl.when(flags_ref[e_idx * n_m + m_idx] != 0)
    def _():
        # (TILE_E, TILE_M) squared distances, pure VPU broadcasts.
        dx = q_ref[:, 0:1] - r_ref[0:1, :]
        dy = q_ref[:, 1:2] - r_ref[1:2, :]
        dz = q_ref[:, 2:3] - r_ref[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz

        # merge candidates with the carried best: width KPAD + TILE_M
        # (a two-phase tile-local-then-merge variant measured ~1.5x slower
        # here — the extra concats/passes cost more than the narrower width
        # saves)
        col0 = jax.lax.broadcasted_iota(jnp.int32, (tile_e, tile_m), 1)
        cand_i = col0 + m_idx * tile_m
        comb_d = jnp.concatenate([best_d[:], d2], axis=1)
        comb_i = jnp.concatenate([best_i[:], cand_i], axis=1)
        width = _KPAD + tile_m
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile_e, width), 1)

        new_d = []
        new_i = []
        for _ in range(k):
            am = jnp.argmin(comb_d, axis=1).astype(jnp.int32)   # (TILE_E,)
            onehot = cols == am[:, None]
            new_d.append(jnp.min(comb_d, axis=1))
            new_i.append(jnp.sum(jnp.where(onehot, comb_i, 0), axis=1))
            comb_d = jnp.where(onehot, _BIG, comb_d)

        pad_d = jnp.full((tile_e, _KPAD - k), _BIG, jnp.float32)
        pad_i = jnp.zeros((tile_e, _KPAD - k), jnp.int32)
        best_d[:] = jnp.concatenate(
            [jnp.stack(new_d, axis=1), pad_d], axis=1)
        best_i[:] = jnp.concatenate(
            [jnp.stack(new_i, axis=1), pad_i], axis=1)

    @pl.when(m_idx == n_m - 1)
    def _():
        out_d_ref[:] = best_d[:]
        out_i_ref[:] = best_i[:]


def _spatial_order(xyz: jax.Array, mask: jax.Array,
                   cell: float = 4.0) -> jax.Array:
    """Permutation grouping valid points by coarse spatial cell (x-major
    lexicographic; 64-cell wrap per axis).  Wrap aliasing only weakens tile
    locality — correctness never depends on the key, only on the per-tile
    AABBs computed from real coordinates.  Invalid points sort last."""
    c = jnp.clip(jnp.floor(xyz / cell).astype(jnp.int32) & 63, 0, 63)
    key = (c[:, 0] << 12) | (c[:, 1] << 6) | c[:, 2]
    key = jnp.where(mask, key, jnp.int32(1 << 20))
    return jnp.argsort(key, stable=True)


def _tile_aabbs(xyz: jax.Array, mask: jax.Array, tile: int):
    """Per-tile axis-aligned bounding boxes over valid points + non-empty
    flag.  xyz (N, 3) with N % tile == 0."""
    n = xyz.shape[0] // tile
    x = xyz.reshape(n, tile, 3)
    v = mask.reshape(n, tile, 1)
    lo = jnp.min(jnp.where(v, x, _BIG), axis=1)    # (n, 3)
    hi = jnp.max(jnp.where(v, x, -_BIG), axis=1)
    return lo, hi, jnp.any(v[:, :, 0], axis=1)


def _pair_flags(qlo, qhi, qne, rlo, rhi, rne, max_radius):
    """(n_e, n_m) int32: 1 where the tile AABBs are within ``max_radius``
    (None -> all non-empty pairs)."""
    ne = qne[:, None] & rne[None, :]
    if max_radius is None:
        return ne.astype(jnp.int32)
    gap = jnp.maximum(
        0.0, jnp.maximum(qlo[:, None, :] - rhi[None, :, :],
                         rlo[None, :, :] - qhi[:, None, :]))  # (ne, nm, 3)
    d2 = jnp.sum(gap * gap, axis=-1)
    return (ne & (d2 <= max_radius * max_radius)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "tile_e", "tile_m",
                                             "interpret", "max_radius",
                                             "sort_cell", "ref_presorted"))
def knn_pallas(query: jax.Array, qmask: jax.Array, ref: jax.Array,
               rmask: jax.Array, k: int = 5, tile_e: int = 64,
               tile_m: int = 2048, interpret: bool = False,
               max_radius: float | None = None,
               sort_cell: float = 2.0,
               ref_presorted: bool = False
               ) -> Tuple[jax.Array, jax.Array]:
    """Exact kNN with the same contract as :func:`liodom_tpu.ops.neighbors.knn`:

    query (E, 3), qmask (E,), ref (M, 3), rmask (M,) ->
    (sq_dists (E, k) ascending, indices (E, k) into ref).

    ``max_radius``: optional radius pruning.  Both sides are sorted by a
    coarse spatial key and (query-tile, ref-tile) pairs whose AABBs are more
    than ``max_radius`` apart are skipped.  Neighbours *within* the radius
    are exact; beyond it distances may be reported as ``_BIG`` instead of
    their true value.  This matches the odometry consumer exactly: the
    correspondence gate drops any edge whose k-th neighbour exceeds the
    radius (laser_odometry.cc:324), so values past the gate are
    interchangeable.

    Tile defaults were swept on hardware at the production working set
    (5.6k edges x 28k window points): small query tiles x wide ref tiles
    win because the carried-best merge pays a fixed KPAD-wide selection
    pass per (query, ref) tile pair — fewer, wider ref tiles amortize it
    (64x2048: 2.4 ms vs 4.2 ms at the old 256x512 on one v5e chip).

    ``ref_presorted``: the caller promises the reference side is already
    spatially ordered (e.g. by :func:`spatial_sort_points` applied once for
    several kNN calls over the same map), so the M-sized ref permutation —
    the most expensive part of this wrapper — is skipped and returned
    indices address ``ref`` as given.  Exactness never depends on the
    ordering (tile AABBs come from actual coordinates); a badly-ordered ref
    only loses pruning efficiency.
    """
    e, m = query.shape[0], ref.shape[0]
    dtype = jnp.float32

    if max_radius is not None:
        qperm = _spatial_order(query, qmask, cell=sort_cell)
        query, qmask = query[qperm], qmask[qperm]
        if not ref_presorted:
            rperm = _spatial_order(ref, rmask, cell=sort_cell)
            ref, rmask = ref[rperm], rmask[rperm]

    # invalid refs -> pushed FAR out; distances stay finite but un-pickable
    ref_enc = jnp.where(rmask[:, None], ref.astype(dtype),
                        ref.astype(dtype) + 2.0 * _FAR)
    e_pad = (-e) % tile_e
    m_pad = (-m) % tile_m
    q4 = jnp.pad(query.astype(dtype), ((0, e_pad), (0, 1)))        # (Ep, 4)
    r4 = jnp.pad(ref_enc, ((0, m_pad), (0, 1)),
                 constant_values=_FAR).T                            # (4, Mp)
    ep, mp = q4.shape[0], r4.shape[1]
    n_e_tiles = ep // tile_e
    n_m_tiles = mp // tile_m

    # (n_e, n_m) pair flags (scalar-prefetched to SMEM)
    qm_p = jnp.pad(qmask, (0, e_pad))
    rm_p = jnp.pad(rmask, (0, m_pad))
    qlo, qhi, qne = _tile_aabbs(q4[:, :3], qm_p, tile_e)
    rlo, rhi, rne = _tile_aabbs(r4.T[:, :3], rm_p, tile_m)
    flags = _pair_flags(qlo, qhi, qne, rlo, rhi, rne, max_radius).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_e_tiles, n_m_tiles),
        in_specs=[
            pl.BlockSpec((tile_e, 4), lambda i, j, flags: (i, 0)),
            # pruned steps alias ref block 0: consecutive equal index-map
            # results let the pipeline elide the block DMA for skipped tiles
            pl.BlockSpec(
                (4, tile_m),
                lambda i, j, flags, n_m=n_m_tiles: (
                    0, jnp.where(flags[i * n_m + j] != 0, j, 0)),
            ),
        ],
        out_specs=[
            pl.BlockSpec((tile_e, _KPAD), lambda i, j, flags: (i, 0)),
            pl.BlockSpec((tile_e, _KPAD), lambda i, j, flags: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_e, _KPAD), dtype),
            pltpu.VMEM((tile_e, _KPAD), jnp.int32),
        ],
    )
    out_d, out_i = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, tile_m=tile_m),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ep, _KPAD), dtype),
            jax.ShapeDtypeStruct((ep, _KPAD), jnp.int32),
        ],
        interpret=interpret,
    )(flags, q4, r4)

    best_d = out_d[:e, :k]
    best_i = out_i[:e, :k]
    # Contract parity with neighbors.knn: invalid refs / invalid queries get
    # _BIG distances; pad indices clamp into range.
    picked_invalid = ~rmask[jnp.minimum(best_i, m - 1)]
    best_d = jnp.where(picked_invalid, _BIG, best_d)
    best_d = jnp.where(qmask[:, None], best_d, _BIG)
    best_i = jnp.minimum(best_i, m - 1)
    best_d = jnp.maximum(best_d, 0.0)
    if max_radius is not None:
        # translate sorted-space results back to the caller's ordering
        if not ref_presorted:
            best_i = rperm[best_i]
        inv_q = jnp.argsort(qperm)
        best_d = best_d[inv_q]
        best_i = best_i[inv_q]
    return best_d, best_i


def _knn_coords_kernel(flags_ref, q_ref, r_ref, out_d_ref, out_x_ref,
                       out_y_ref, out_z_ref, best_d, best_x, best_y, best_z,
                       *, k: int, tile_m: int, batched: bool = False):
    """Like :func:`_knn_kernel`, but carries the neighbour COORDINATES through
    VMEM instead of indices.  The line-fit consumer (neighbors.
    line_correspondences) only ever uses ``ref[idx]`` — never ``idx`` itself
    (laser_odometry.cc:325-357 reads the neighbour points) — so emitting the
    coordinates here removes the (E, k, 3) HBM gather *and* both
    index back-permutations from the wrapper.

    ``batched``: the grid carries a leading batch axis (b, e, m) — each
    batch element is an independent (query set, ref set) pair whose rows are
    folded into the operand arrays (see :func:`knn_coords_pallas_batched`).
    The compute body is identical; only grid-index decoding changes, and the
    m axis stays innermost so the VMEM running-best scratch still carries
    correctly across ref tiles of one (b, e) pair."""
    if batched:
        e_idx = pl.program_id(1)
        m_idx = pl.program_id(2)
        n_m = pl.num_programs(2)
        flag_row = pl.program_id(0) * pl.num_programs(1) + e_idx
    else:
        e_idx = pl.program_id(0)
        m_idx = pl.program_id(1)
        n_m = pl.num_programs(1)
        flag_row = e_idx
    tile_e = q_ref.shape[0]

    @pl.when(m_idx == 0)
    def _():
        best_d[:] = jnp.full((tile_e, _KPAD), _BIG, jnp.float32)
        zero = jnp.zeros((tile_e, _KPAD), jnp.float32)
        best_x[:] = zero
        best_y[:] = zero
        best_z[:] = zero

    @pl.when(flags_ref[flag_row * n_m + m_idx] != 0)
    def _():
        rx = jnp.broadcast_to(r_ref[0:1, :], (tile_e, tile_m))
        ry = jnp.broadcast_to(r_ref[1:2, :], (tile_e, tile_m))
        rz = jnp.broadcast_to(r_ref[2:3, :], (tile_e, tile_m))
        dx = q_ref[:, 0:1] - rx
        dy = q_ref[:, 1:2] - ry
        dz = q_ref[:, 2:3] - rz
        d2 = dx * dx + dy * dy + dz * dz

        comb_d = jnp.concatenate([best_d[:], d2], axis=1)
        comb_x = jnp.concatenate([best_x[:], rx], axis=1)
        comb_y = jnp.concatenate([best_y[:], ry], axis=1)
        comb_z = jnp.concatenate([best_z[:], rz], axis=1)
        width = _KPAD + tile_m
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile_e, width), 1)

        new_d, new_x, new_y, new_z = [], [], [], []
        for _ in range(k):
            am = jnp.argmin(comb_d, axis=1).astype(jnp.int32)
            onehot = cols == am[:, None]
            new_d.append(jnp.min(comb_d, axis=1))
            new_x.append(jnp.sum(jnp.where(onehot, comb_x, 0.0), axis=1))
            new_y.append(jnp.sum(jnp.where(onehot, comb_y, 0.0), axis=1))
            new_z.append(jnp.sum(jnp.where(onehot, comb_z, 0.0), axis=1))
            comb_d = jnp.where(onehot, _BIG, comb_d)

        pad_d = jnp.full((tile_e, _KPAD - k), _BIG, jnp.float32)
        pad_0 = jnp.zeros((tile_e, _KPAD - k), jnp.float32)
        best_d[:] = jnp.concatenate([jnp.stack(new_d, 1), pad_d], axis=1)
        best_x[:] = jnp.concatenate([jnp.stack(new_x, 1), pad_0], axis=1)
        best_y[:] = jnp.concatenate([jnp.stack(new_y, 1), pad_0], axis=1)
        best_z[:] = jnp.concatenate([jnp.stack(new_z, 1), pad_0], axis=1)

    @pl.when(m_idx == n_m - 1)
    def _():
        out_d_ref[:] = best_d[:]
        out_x_ref[:] = best_x[:]
        out_y_ref[:] = best_y[:]
        out_z_ref[:] = best_z[:]


# Invalid refs are displaced by 2*_FAR, so any picked-invalid distance is at
# least ~(2e4 - 240)^2 ≈ 3.9e8, while real squared ranges top out around
# (2 * max_range)^2 ≈ 5.8e4.  Anything past this threshold is a FAR pick.
# ASSUMPTION (differs from knn_pallas's explicit ~rmask[best_i] check): this
# encoding is only sound while |world coordinate| << _FAR on every axis —
# a real point at z ~ 20 km would cross the threshold and be misread as an
# invalid pick.  LiDAR odometry coordinates are bounded by trajectory length
# (km-scale at most), so the margin is ~3 orders of magnitude; revisit only
# if query/ref frames ever leave a local world frame.
_FAR_PICK_D2 = 1.0e6


@functools.partial(jax.jit, static_argnames=("k", "tile_e", "tile_m",
                                             "interpret", "max_radius",
                                             "sort_cell", "ref_presorted"))
def knn_coords_pallas(query: jax.Array, qmask: jax.Array, ref: jax.Array,
                      rmask: jax.Array, k: int = 5, tile_e: int = 64,
                      tile_m: int = 2048, interpret: bool = False,
                      max_radius: float | None = None,
                      sort_cell: float = 2.0,
                      ref_presorted: bool = False
                      ) -> Tuple[jax.Array, jax.Array]:
    """Exact kNN returning neighbour COORDINATES instead of indices:

    query (E, 3), qmask (E,), ref (M, 3), rmask (M,) ->
    (sq_dists (E, k) ascending, coords (E, k, 3)).

    Same selection semantics and pruning contract as :func:`knn_pallas`;
    coords rows whose distance is ``_BIG`` (invalid query / invalid or pruned
    ref) carry no meaning and must be gated by the caller — exactly what the
    line-fit gate already does (neighbors.line_correspondences).  Fusing the
    coordinate extraction into the kernel epilogue removes the (E, k, 3)
    HBM gather plus the rperm/inv_q index translations the index variant
    needs (VERDICT r1 #9; ref: laser_odometry.cc:318-362)."""
    e, m = query.shape[0], ref.shape[0]
    dtype = jnp.float32

    if max_radius is not None:
        qperm = _spatial_order(query, qmask, cell=sort_cell)
        query, qmask = query[qperm], qmask[qperm]
        if not ref_presorted:
            rperm = _spatial_order(ref, rmask, cell=sort_cell)
            ref, rmask = ref[rperm], rmask[rperm]

    ref_enc = jnp.where(rmask[:, None], ref.astype(dtype),
                        ref.astype(dtype) + 2.0 * _FAR)
    e_pad = (-e) % tile_e
    m_pad = (-m) % tile_m
    q4 = jnp.pad(query.astype(dtype), ((0, e_pad), (0, 1)))
    r4 = jnp.pad(ref_enc, ((0, m_pad), (0, 1)), constant_values=_FAR).T
    ep, mp = q4.shape[0], r4.shape[1]
    n_e_tiles = ep // tile_e
    n_m_tiles = mp // tile_m

    qm_p = jnp.pad(qmask, (0, e_pad))
    rm_p = jnp.pad(rmask, (0, m_pad))
    qlo, qhi, qne = _tile_aabbs(q4[:, :3], qm_p, tile_e)
    rlo, rhi, rne = _tile_aabbs(r4.T[:, :3], rm_p, tile_m)
    flags = _pair_flags(qlo, qhi, qne, rlo, rhi, rne, max_radius).reshape(-1)

    out_block = pl.BlockSpec((tile_e, _KPAD), lambda i, j, flags: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_e_tiles, n_m_tiles),
        in_specs=[
            pl.BlockSpec((tile_e, 4), lambda i, j, flags: (i, 0)),
            pl.BlockSpec(
                (4, tile_m),
                lambda i, j, flags, n_m=n_m_tiles: (
                    0, jnp.where(flags[i * n_m + j] != 0, j, 0)),
            ),
        ],
        out_specs=[out_block, out_block, out_block, out_block],
        scratch_shapes=[pltpu.VMEM((tile_e, _KPAD), dtype)] * 4,
    )
    shape = jax.ShapeDtypeStruct((ep, _KPAD), dtype)
    out_d, out_x, out_y, out_z = pl.pallas_call(
        functools.partial(_knn_coords_kernel, k=k, tile_m=tile_m),
        grid_spec=grid_spec,
        out_shape=[shape, shape, shape, shape],
        interpret=interpret,
    )(flags, q4, r4)

    best_d = out_d[:e, :k]
    coords = jnp.stack([out_x[:e, :k], out_y[:e, :k], out_z[:e, :k]], axis=-1)
    # FAR-displaced (invalid-ref) picks and invalid queries -> _BIG, matching
    # the index variant's picked_invalid / qmask handling.
    best_d = jnp.where(best_d > _FAR_PICK_D2, _BIG, best_d)
    best_d = jnp.where(qmask[:, None], best_d, _BIG)
    best_d = jnp.maximum(best_d, 0.0)
    if max_radius is not None:
        inv_q = jnp.argsort(qperm)
        best_d = best_d[inv_q]
        coords = coords[inv_q]
    return best_d, coords


@functools.partial(jax.jit, static_argnames=("k", "tile_e", "tile_m",
                                             "interpret", "max_radius",
                                             "sort_cell", "ref_presorted"))
def knn_coords_pallas_batched(query: jax.Array, qmask: jax.Array,
                              ref: jax.Array, rmask: jax.Array, k: int = 5,
                              tile_e: int = 64, tile_m: int = 2048,
                              interpret: bool = False,
                              max_radius: float | None = None,
                              sort_cell: float = 2.0,
                              ref_presorted: bool = False
                              ) -> Tuple[jax.Array, jax.Array]:
    """Batched :func:`knn_coords_pallas` over B independent (query, ref)
    pairs, as ONE kernel launch with batch as the outermost grid axis:

    query (B, E, 3), qmask (B, E), ref (B, M, 3), rmask (B, M) ->
    (sq_dists (B, E, k), coords (B, E, k, 3)).

    This is the multi-sequence scaling kernel (VERDICT r3 #1): ``vmap`` of
    the single-sequence kernel falls off the tuned Mosaic path, so
    ``neighbors.line_correspondences`` routes vmapped calls here via a
    ``custom_vmap`` rule instead.  Grid = (B, n_e_tiles, n_m_tiles) — the m
    axis stays innermost, so the VMEM running-best scratch carries exactly
    as in the solo kernel; batch rows are folded into the operand arrays so
    the kernel body is byte-for-byte the solo body.  Same radius-pruning
    contract per batch element (each gets its own spatial sort + AABB pair
    flags).  Ref anchor: SURVEY §2 "multi-sequence batch DP via vmap/mesh
    data axis" — the degree of freedom the CPU reference lacks."""
    b, e, m = query.shape[0], query.shape[1], ref.shape[1]
    dtype = jnp.float32

    if max_radius is not None:
        qperm = jax.vmap(
            lambda x, v: _spatial_order(x, v, cell=sort_cell))(query, qmask)
        query = jnp.take_along_axis(query, qperm[:, :, None], axis=1)
        qmask = jnp.take_along_axis(qmask, qperm, axis=1)
        if not ref_presorted:
            rperm = jax.vmap(
                lambda x, v: _spatial_order(x, v, cell=sort_cell))(ref, rmask)
            ref = jnp.take_along_axis(ref, rperm[:, :, None], axis=1)
            rmask = jnp.take_along_axis(rmask, rperm, axis=1)

    ref_enc = jnp.where(rmask[:, :, None], ref.astype(dtype),
                        ref.astype(dtype) + 2.0 * _FAR)
    e_pad = (-e) % tile_e
    m_pad = (-m) % tile_m
    q4 = jnp.pad(query.astype(dtype), ((0, 0), (0, e_pad), (0, 1)))
    r4 = jnp.pad(ref_enc, ((0, 0), (0, m_pad), (0, 1)),
                 constant_values=_FAR).transpose(0, 2, 1)   # (B, 4, Mp)
    ep, mp = q4.shape[1], r4.shape[2]
    n_e_tiles = ep // tile_e
    n_m_tiles = mp // tile_m

    qm_p = jnp.pad(qmask, ((0, 0), (0, e_pad)))
    rm_p = jnp.pad(rmask, ((0, 0), (0, m_pad)))
    qlo, qhi, qne = jax.vmap(lambda x, v: _tile_aabbs(x, v, tile_e))(
        q4[:, :, :3], qm_p)
    rlo, rhi, rne = jax.vmap(lambda x, v: _tile_aabbs(x, v, tile_m))(
        r4.transpose(0, 2, 1)[:, :, :3], rm_p)
    flags = jax.vmap(lambda a, bq, c, d, f, g: _pair_flags(
        a, bq, c, d, f, g, max_radius))(
        qlo, qhi, qne, rlo, rhi, rne).reshape(-1)   # (B * n_e * n_m,)

    # fold batch into block-index arithmetic so the kernel body stays 2-D:
    # queries stack along rows ((B*Ep, 4) — row-dim blocks of tile_e align
    # per batch), refs stack along COLUMNS ((4, B*Mp) — the row dim must
    # stay equal to the overall array's 4, per the Mosaic block rule that
    # a sublane block dim be divisible by 8 or span the array)
    q4f = q4.reshape(b * ep, 4)
    r4f = r4.transpose(1, 0, 2).reshape(4, b * mp)

    out_block = pl.BlockSpec(
        (tile_e, _KPAD),
        lambda bb, i, j, flags, n_e=n_e_tiles: (bb * n_e + i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_e_tiles, n_m_tiles),
        in_specs=[
            pl.BlockSpec((tile_e, 4),
                         lambda bb, i, j, flags, n_e=n_e_tiles: (
                             bb * n_e + i, 0)),
            pl.BlockSpec(
                (4, tile_m),
                lambda bb, i, j, flags, n_e=n_e_tiles, n_m=n_m_tiles: (
                    0,
                    bb * n_m + jnp.where(
                        flags[(bb * n_e + i) * n_m + j] != 0, j, 0)),
            ),
        ],
        out_specs=[out_block, out_block, out_block, out_block],
        scratch_shapes=[pltpu.VMEM((tile_e, _KPAD), dtype)] * 4,
    )
    shape = jax.ShapeDtypeStruct((b * ep, _KPAD), dtype)
    out_d, out_x, out_y, out_z = pl.pallas_call(
        functools.partial(_knn_coords_kernel, k=k, tile_m=tile_m,
                          batched=True),
        grid_spec=grid_spec,
        out_shape=[shape, shape, shape, shape],
        interpret=interpret,
    )(flags, q4f, r4f)

    best_d = out_d.reshape(b, ep, _KPAD)[:, :e, :k]
    coords = jnp.stack([out_x.reshape(b, ep, _KPAD)[:, :e, :k],
                        out_y.reshape(b, ep, _KPAD)[:, :e, :k],
                        out_z.reshape(b, ep, _KPAD)[:, :e, :k]], axis=-1)
    best_d = jnp.where(best_d > _FAR_PICK_D2, _BIG, best_d)
    best_d = jnp.where(qmask[:, :, None], best_d, _BIG)
    best_d = jnp.maximum(best_d, 0.0)
    if max_radius is not None:
        inv_q = jnp.argsort(qperm, axis=1)
        best_d = jnp.take_along_axis(best_d, inv_q[:, :, None], axis=1)
        coords = jnp.take_along_axis(coords, inv_q[:, :, None, None], axis=1)
    return best_d, coords


@functools.partial(jax.jit, static_argnames=("cell",))
def spatial_sort_points(xyz: jax.Array, mask: jax.Array, cell: float = 2.0
                        ) -> Tuple[jax.Array, jax.Array]:
    """Spatially order a padded point set (valid rows front-compacted,
    grouped by coarse spatial cell) so repeated ``knn_pallas`` calls over it
    can pass ``ref_presorted=True`` — the M-sized sort is paid once instead
    of per call.  Point SET is unchanged; ordering of the matching map
    carries no semantics (the reference iterates PCL containers in storage
    order)."""
    perm = _spatial_order(xyz, mask, cell=cell)
    ok = mask[perm]
    return jnp.where(ok[:, None], xyz[perm], 0.0), ok


# Abramowitz & Stegun 4.4.46 arccos polynomial (|error| <= 2e-8 over [0, 1])
# — Mosaic has no acos lowering; cos/sqrt are native, so only this tiny poly
# is needed to run Cardano fully inside the kernel.
_ACOS_COEFFS = (1.5707963050, -0.2145988016, 0.0889789874, -0.0501743046,
                0.0308918810, -0.0170881256, 0.0066700901, -0.0012624911)


def _acos(x: jax.Array) -> jax.Array:
    """arccos for x in [-1, 1]; 2e-8 absolute error — far below the f32
    resolution of the downstream eigenvalue gate."""
    ax = jnp.abs(x)
    p = jnp.full_like(ax, _ACOS_COEFFS[-1])
    for c in _ACOS_COEFFS[-2::-1]:
        p = p * ax + c
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x < 0, jnp.pi - r, r)


def _knn_lines_kernel(flags_ref, q_ref, r_ref, out_ref, best_d, best_x,
                      best_y, best_z, *, k: int, tile_m: int,
                      max_sq_dist: float, eig_ratio: float,
                      min_line_sep: float):
    """Coords kernel + the whole line-fit gate as the epilogue (VERDICT r2
    #9): centroid, un-normalised covariance, Cardano eigenvalues,
    ``lambda_max > eig_ratio * lambda_mid``, endpoint separation and the
    k-th-distance accept gate (laser_odometry.cc:325-357) — all computed on
    the VMEM-resident best-k planes in the final grid step, so the (E, k)
    neighbour planes never leave the chip at all.  One output plane per
    query row: lanes [0:3] = lpa, [3:6] = lpb, [6] = gate (1.0 / 0.0).
    Gate math is the same f32 expression chain as neighbors._line_fit /
    sym3_eigenvalues."""
    e_idx = pl.program_id(0)
    m_idx = pl.program_id(1)
    n_m = pl.num_programs(1)
    tile_e = q_ref.shape[0]

    @pl.when(m_idx == 0)
    def _():
        best_d[:] = jnp.full((tile_e, _KPAD), _BIG, jnp.float32)
        zero = jnp.zeros((tile_e, _KPAD), jnp.float32)
        best_x[:] = zero
        best_y[:] = zero
        best_z[:] = zero

    @pl.when(flags_ref[e_idx * n_m + m_idx] != 0)
    def _():
        rx = jnp.broadcast_to(r_ref[0:1, :], (tile_e, tile_m))
        ry = jnp.broadcast_to(r_ref[1:2, :], (tile_e, tile_m))
        rz = jnp.broadcast_to(r_ref[2:3, :], (tile_e, tile_m))
        dx = q_ref[:, 0:1] - rx
        dy = q_ref[:, 1:2] - ry
        dz = q_ref[:, 2:3] - rz
        d2 = dx * dx + dy * dy + dz * dz

        comb_d = jnp.concatenate([best_d[:], d2], axis=1)
        comb_x = jnp.concatenate([best_x[:], rx], axis=1)
        comb_y = jnp.concatenate([best_y[:], ry], axis=1)
        comb_z = jnp.concatenate([best_z[:], rz], axis=1)
        width = _KPAD + tile_m
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile_e, width), 1)

        new_d, new_x, new_y, new_z = [], [], [], []
        for _ in range(k):
            am = jnp.argmin(comb_d, axis=1).astype(jnp.int32)
            onehot = cols == am[:, None]
            new_d.append(jnp.min(comb_d, axis=1))
            new_x.append(jnp.sum(jnp.where(onehot, comb_x, 0.0), axis=1))
            new_y.append(jnp.sum(jnp.where(onehot, comb_y, 0.0), axis=1))
            new_z.append(jnp.sum(jnp.where(onehot, comb_z, 0.0), axis=1))
            comb_d = jnp.where(onehot, _BIG, comb_d)

        pad_d = jnp.full((tile_e, _KPAD - k), _BIG, jnp.float32)
        pad_0 = jnp.zeros((tile_e, _KPAD - k), jnp.float32)
        best_d[:] = jnp.concatenate([jnp.stack(new_d, 1), pad_d], axis=1)
        best_x[:] = jnp.concatenate([jnp.stack(new_x, 1), pad_0], axis=1)
        best_y[:] = jnp.concatenate([jnp.stack(new_y, 1), pad_0], axis=1)
        best_z[:] = jnp.concatenate([jnp.stack(new_z, 1), pad_0], axis=1)

    @pl.when(m_idx == n_m - 1)
    def _():
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_e, _KPAD), 1)
        mk = (col < k).astype(jnp.float32)
        bd, bx, by, bz = best_d[:], best_x[:], best_y[:], best_z[:]

        def lane(plane, i):
            return jnp.sum(jnp.where(col == i, plane, 0.0), axis=1)

        dk = lane(bd, k - 1)
        inv_k = 1.0 / float(k)
        mx = jnp.sum(bx * mk, axis=1) * inv_k
        my = jnp.sum(by * mk, axis=1) * inv_k
        mz = jnp.sum(bz * mk, axis=1) * inv_k
        cx = (bx - mx[:, None]) * mk
        cy = (by - my[:, None]) * mk
        cz = (bz - mz[:, None]) * mk
        a00 = jnp.sum(cx * cx, axis=1)
        a01 = jnp.sum(cx * cy, axis=1)
        a02 = jnp.sum(cx * cz, axis=1)
        a11 = jnp.sum(cy * cy, axis=1)
        a12 = jnp.sum(cy * cz, axis=1)
        a22 = jnp.sum(cz * cz, axis=1)

        # Cardano, same chain as neighbors.sym3_eigenvalues
        p1 = a01 * a01 + a02 * a02 + a12 * a12
        q = (a00 + a11 + a22) / 3.0
        p2 = ((a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1)
        p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
        safe_p = jnp.where(p > 0, p, 1.0)
        b00 = (a00 - q) / safe_p
        b11 = (a11 - q) / safe_p
        b22 = (a22 - q) / safe_p
        b01 = a01 / safe_p
        b02 = a02 / safe_p
        b12 = a12 / safe_p
        detB = (b00 * (b11 * b22 - b12 * b12)
                - b01 * (b01 * b22 - b12 * b02)
                + b02 * (b01 * b12 - b11 * b02))
        r = jnp.clip(detB / 2.0, -1.0, 1.0)
        phi = _acos(r) / 3.0
        e_max = q + 2.0 * p * jnp.cos(phi)
        e_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
        e_mid = 3.0 * q - e_max - e_min
        # p == 0 -> A = qI: all eigenvalues q (ratio gate then fails for
        # q > 0, exactly like sym3_eigenvalues' equal-eigs branch)
        e_max = jnp.where(p > 0, e_max, q)
        e_mid = jnp.where(p > 0, e_mid, q)

        ax, ay, az = lane(bx, 0), lane(by, 0), lane(bz, 0)
        bx1, by1, bz1 = lane(bx, 1), lane(by, 1), lane(bz, 1)
        sep_sq = ((ax - bx1) ** 2 + (ay - by1) ** 2 + (az - bz1) ** 2)
        ok = ((dk < max_sq_dist) & (e_max > eig_ratio * e_mid)
              & (sep_sq > min_line_sep * min_line_sep))

        out = jnp.zeros((tile_e, _KPAD), jnp.float32)
        for i, v in enumerate((ax, ay, az, bx1, by1, bz1,
                               ok.astype(jnp.float32))):
            out = jnp.where(col == i, v[:, None], out)
        out_ref[:] = out


@functools.partial(jax.jit, static_argnames=(
    "k", "tile_e", "tile_m", "interpret", "max_sq_dist", "eig_ratio",
    "min_line_sep", "sort_cell", "ref_presorted"))
def knn_lines_pallas(query: jax.Array, qmask: jax.Array, ref: jax.Array,
                     rmask: jax.Array, k: int = 5,
                     max_sq_dist: float = 1.0, eig_ratio: float = 3.0,
                     min_line_sep: float = 0.01, tile_e: int = 64,
                     tile_m: int = 2048, interpret: bool = False,
                     sort_cell: float = 2.0, ref_presorted: bool = False
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """kNN + the full line-fit gate in ONE kernel:

    query (E, 3), qmask (E,), ref (M, 3), rmask (M,) ->
    (lpa (E, 3), lpb (E, 3), valid (E,)) — exactly the
    neighbors.LineCorrespondences contract (laser_odometry.cc:318-362)
    minus the emask AND, which the caller applies.

    Radius pruning always uses sqrt(max_sq_dist) — the correspondence gate
    drops any farther edge anyway, so pruning is gate-exact.  FAR-displaced
    (invalid-ref) picks fail the same gate (their distance >= ~3.9e8, see
    _FAR_PICK_D2 note).  Endpoint coords of gated-out rows are zero.

    MEASURED OUTCOME (scripts/knn_sweep.py, production working set 5.6k x
    28k, one v5e chip): 2.53 ms vs 2.30 ms for the coords kernel + XLA line
    fit — XLA fuses the (E, k) epilogue into ~0.04 ms, while pushing the
    same math into the kernel's final grid step serializes it against the
    merge loop.  Kept as a tested opt-in (LIODOM_KNN_IMPL=pallas_lines /
    knn_impl="pallas_lines"); the default TPU path stays on the coords
    kernel."""
    e, m = query.shape[0], ref.shape[0]
    dtype = jnp.float32
    max_radius = float(max_sq_dist) ** 0.5

    qperm = _spatial_order(query, qmask, cell=sort_cell)
    query, qmask = query[qperm], qmask[qperm]
    if not ref_presorted:
        rperm = _spatial_order(ref, rmask, cell=sort_cell)
        ref, rmask = ref[rperm], rmask[rperm]

    ref_enc = jnp.where(rmask[:, None], ref.astype(dtype),
                        ref.astype(dtype) + 2.0 * _FAR)
    e_pad = (-e) % tile_e
    m_pad = (-m) % tile_m
    q4 = jnp.pad(query.astype(dtype), ((0, e_pad), (0, 1)))
    r4 = jnp.pad(ref_enc, ((0, m_pad), (0, 1)), constant_values=_FAR).T
    ep, mp = q4.shape[0], r4.shape[1]
    n_e_tiles = ep // tile_e
    n_m_tiles = mp // tile_m

    qm_p = jnp.pad(qmask, (0, e_pad))
    rm_p = jnp.pad(rmask, (0, m_pad))
    qlo, qhi, qne = _tile_aabbs(q4[:, :3], qm_p, tile_e)
    rlo, rhi, rne = _tile_aabbs(r4.T[:, :3], rm_p, tile_m)
    flags = _pair_flags(qlo, qhi, qne, rlo, rhi, rne, max_radius).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_e_tiles, n_m_tiles),
        in_specs=[
            pl.BlockSpec((tile_e, 4), lambda i, j, flags: (i, 0)),
            pl.BlockSpec(
                (4, tile_m),
                lambda i, j, flags, n_m=n_m_tiles: (
                    0, jnp.where(flags[i * n_m + j] != 0, j, 0)),
            ),
        ],
        out_specs=[pl.BlockSpec((tile_e, _KPAD),
                                lambda i, j, flags: (i, 0))],
        scratch_shapes=[pltpu.VMEM((tile_e, _KPAD), dtype)] * 4,
    )
    (plane,) = pl.pallas_call(
        functools.partial(_knn_lines_kernel, k=k, tile_m=tile_m,
                          max_sq_dist=float(max_sq_dist),
                          eig_ratio=float(eig_ratio),
                          min_line_sep=float(min_line_sep)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ep, _KPAD), dtype)],
        interpret=interpret,
    )(flags, q4, r4)

    plane = plane[:e]
    lpa = plane[:, 0:3]
    lpb = plane[:, 3:6]
    ok = (plane[:, 6] > 0.5) & qmask
    inv_q = jnp.argsort(qperm)
    return lpa[inv_q], lpb[inv_q], ok[inv_q]
