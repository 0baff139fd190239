"""Pallas TPU kernel for region-wise greedy edge selection.

The pick chain of ``extractFeaturesFromRegion`` (reference
feature_extractor.cc:256-313) is serial by construction: each pick is the
highest-smoothness unpicked point, and suppresses up to 5 neighbours per
side (early-stopping at a point gap^2 > 0.05).  The XLA formulation
(ops/features.py select_edges) runs that chain as scan(regions) x
fori_loop(picks) — 88 dependent argmax+scatter iterations whose per-
iteration XLA overhead dominates the frame (7+ ms measured round 3).

This kernel runs the WHOLE chain in one Mosaic program with every plane
VMEM-resident: all rings advance in lockstep, each pick is a masked
row-max + first-index reduction, and suppression/recording are pure
vector selects (no scatters, no gathers).  The kernel emits the picked
COLUMN INDEX per (ring, slot); the wrapper gathers coordinates with one
XLA take_along_axis.  Results are bit-identical to the XLA path (same
argmax tie-breaking — lowest column first, matching the reference's
stable descending sort; same budget+1 quirk; same cross-region carry of
the picked mask).  Unlike the windowed XLA path, backward suppression
spilling into the previous region is applied too (it cannot affect edges
— earlier regions are finalised — but keeps the picked mask faithful to
the reference's ``picked_`` array; see ADVICE r2 #3).

Suppression reach is precomputed OUTSIDE the kernel as lane-aligned
planes: column j is suppressed by a pick at j-l iff all gaps in
(j-l, j] are small (``fwd``), and by a pick at j+l iff all gaps in
(j-l', j+? ] — concretely gaps (j, j+l] — are small (``bwd``); both are
ANDs of shifted gap masks, packed into one int32 bit-plane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from liodom_tpu.core.config import LiodomConfig
from liodom_tpu.core.frame import EdgeCloud, RingImage

_SLOT_PAD = 128  # output slot lane padding (n_regions * max_picks <= 128)


def _reach_plane(xyz: jax.Array, gap_thr: float) -> jax.Array:
    """int32 (R, W) plane; bit (l-1) at column j = "a pick at j-l suppresses
    j" (l in 1..5), bit (l+4) at column j = "a pick at j+l suppresses j".

    Derivation: the reference walks outward from the pick b, stopping at the
    first consecutive-point gap^2 > thr (feature_extractor.cc:280-310).
    Forward neighbour j = b+l needs gaps at columns b+1..b+l == (j-l, j] all
    small; backward neighbour j = b-l needs gaps at columns j+1..j+l all
    small (gap[m] = ||p[m] - p[m-1]||^2)."""
    r, w = xyz.shape[0], xyz.shape[1]
    diff = xyz - jnp.roll(xyz, 1, axis=1)
    gap_ok = jnp.sum(diff * diff, axis=-1) <= gap_thr        # (R, W)

    plane = jnp.zeros((r, w), jnp.int32)
    fwd = jnp.ones_like(gap_ok)   # fwd[j] = gaps j+1..j+l all ok
    for l in range(1, 6):
        fwd = fwd & jnp.roll(gap_ok, -l, axis=1)
        # pick at j-l: gaps (j-l, j] ok <=> fwd_{l}[j-l] -> roll right by l
        plane = plane | (jnp.roll(fwd, l, axis=1).astype(jnp.int32)
                         << (l - 1))
        # pick at j+l: gaps (j, j+l] ok <=> fwd_{l}[j]
        plane = plane | (fwd.astype(jnp.int32) << (l + 4))
    return plane


def _select_kernel(sm_ref, reach_ref, meta_ref, bidx_ref, bval_ref,
                   *, n_regions: int, max_picks: int, thr: float):
    r, w = sm_ref.shape
    sm = sm_ref[:]
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
    total = meta_ref[:, 0:1]                       # (R, 1) int32
    sector = meta_ref[:, 1:2]
    active = meta_ref[:, 2:3] > 0
    # unpack the 10 reach bits once; reused by all picks
    reach = reach_ref[:]
    fwd_bits = [(reach >> (l - 1)) & 1 != 0 for l in range(1, 6)]
    bwd_bits = [(reach >> (l + 4)) & 1 != 0 for l in range(1, 6)]

    neg_inf = jnp.float32(-jnp.inf)
    scols = jax.lax.broadcasted_iota(jnp.int32, (r, _SLOT_PAD), 1)

    def body(k, carry):
        picked_i, done_i, bidx, bval = carry
        picked = picked_i > 0
        done = done_i > 0
        j = k // max_picks
        p = k - j * max_picks
        start = 5 + sector * j                                 # (R, 1)
        end = 5 + jnp.where(j == n_regions - 1, total, sector * (j + 1))
        done = done & (p > 0)                # fresh region resets the break
        cand = ((cols >= start) & (cols < end) & ~picked
                & active & ~done)
        masked = jnp.where(cand, sm, neg_inf)
        bv = jnp.max(masked, axis=1, keepdims=True)            # (R, 1)
        # first (lowest-column) argmax — the reference's stable descending
        # sort picks the earliest index among ties
        bi = jnp.min(jnp.where(cand & (masked == bv), cols, w),
                     axis=1, keepdims=True)                    # (R, 1)
        do_pick = (bv >= thr) & (bv > neg_inf)                 # (R, 1)
        done = done | ~do_pick

        # record the pick at static slot k
        bidx = jnp.where((scols == k) & do_pick, bi, bidx)
        bval = jnp.where((scols == k) & do_pick,
                         jnp.int32(1), bval)

        # suppression: self + gap-gated ±5 neighbours
        newly = cols == bi
        for l in range(1, 6):
            newly = newly | ((cols - bi == l) & fwd_bits[l - 1])
            newly = newly | ((bi - cols == l) & bwd_bits[l - 1])
        picked = picked | (newly & do_pick)
        return (picked.astype(jnp.int32), done.astype(jnp.int32),
                bidx, bval)

    picked0 = jnp.zeros((r, w), jnp.int32)
    done0 = jnp.zeros((r, 1), jnp.int32)
    bidx0 = jnp.zeros((r, _SLOT_PAD), jnp.int32)
    bval0 = jnp.zeros((r, _SLOT_PAD), jnp.int32)
    _, _, bidx, bval = jax.lax.fori_loop(
        0, n_regions * max_picks, body, (picked0, done0, bidx0, bval0))
    bidx_ref[:] = bidx
    bval_ref[:] = bval


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def select_edges_pallas(img: RingImage, smooth: jax.Array,
                        cfg: LiodomConfig, interpret: bool = False
                        ) -> EdgeCloud:
    """Drop-in Pallas implementation of ops.features.select_edges.

    Same contract and bit-identical output layout: (R * n_regions *
    (edges_per_region+1)) edge slots, slot = ring * S + region * max_picks
    + pick."""
    r, w = img.xyz.shape[0], img.xyz.shape[1]
    n_regions = cfg.scan_regions
    max_picks = cfg.max_edges_per_region
    s = n_regions * max_picks
    if s > _SLOT_PAD:
        from liodom_tpu.ops.features import select_edges_xla
        return select_edges_xla(img, smooth, cfg)

    # Ring tiling: the pick chain never crosses rings, so the grid walks
    # ring blocks.  Block height is VMEM-budgeted — the kernel holds ~16
    # (rt, W) int32/f32 planes live (inputs, picked mask, 10 unpacked reach
    # bits, temporaries), and the scoped-vmem limit is 16 MB.
    _VMEM_BUDGET = 10 * 1024 * 1024
    rt = r
    while rt > 8 and 16 * rt * w * 4 > _VMEM_BUDGET:
        rt //= 2
    if 16 * rt * w * 4 > _VMEM_BUDGET or r % rt != 0:
        from liodom_tpu.ops.features import select_edges_xla
        return select_edges_xla(img, smooth, cfg)

    count = img.count.astype(jnp.int32)
    total = jnp.maximum(count - 10, 0)
    meta = jnp.stack([
        total,
        total // n_regions,
        (count >= cfg.min_points_per_scan).astype(jnp.int32),
    ], axis=1)                                         # (R, 3)
    meta = jnp.pad(meta, ((0, 0), (0, 128 - meta.shape[1])))
    reach = _reach_plane(img.xyz, cfg.neighbor_gap_sq)

    kernel = functools.partial(_select_kernel, n_regions=n_regions,
                               max_picks=max_picks,
                               thr=float(cfg.smoothness_threshold))
    full = pl.BlockSpec((rt, w), lambda i: (i, 0))
    small = pl.BlockSpec((rt, 128), lambda i: (i, 0))
    bidx, bval = pl.pallas_call(
        kernel,
        grid=(r // rt,),
        in_specs=[full, full, small],
        out_specs=(small, small),
        out_shape=(jax.ShapeDtypeStruct((r, _SLOT_PAD), jnp.int32),
                   jax.ShapeDtypeStruct((r, _SLOT_PAD), jnp.int32)),
        interpret=interpret,
    )(smooth.astype(jnp.float32), reach, meta)

    bidx = bidx[:, :s]
    valid = bval[:, :s] > 0
    idx = jnp.clip(bidx, 0, w - 1)
    pts = jnp.take_along_axis(img.xyz, idx[:, :, None], axis=1)  # (R, S, 3)
    pts = jnp.where(valid[:, :, None], pts, 0.0)
    return EdgeCloud(pts.reshape(-1, 3), valid.reshape(-1))
