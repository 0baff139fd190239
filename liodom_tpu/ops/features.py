"""Feature extraction: ring routing, smoothness, region-wise edge selection.

TPU-first re-design of the reference extractor
(/root/reference/src/feature_extractor.cc):

* ``splitPointCloud`` (:104-179) — a per-point Python-free classifier +
  one device sort routes every point into its ring of a dense padded
  ``(rings, width)`` image, preserving input order within a ring.
* the 11-tap smoothness kernel (:195-229) — a vectorised stencil over the
  whole image at once (the reference OpenMP-parallelises one ring at a time).
* ``extractFeaturesFromRegion`` (:256-313) — the greedy sort+pick+suppress
  loop becomes a masked argmax iteration, *vectorised across all rings* and
  scanned over regions, reproducing the sequential semantics exactly
  (cross-region suppression included — region ``j`` marks neighbours that can
  fall inside region ``j+1``).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp

from liodom_tpu.core.config import LiodomConfig
from liodom_tpu.core.frame import EdgeCloud, RawScan, RingImage

_RAD2DEG = 180.0 / jnp.pi


def _bcast_unbatched(axis_size, in_batched, *args):
    """Broadcast any unbatched operand to the vmap batch (custom_vmap
    rules below; a shared operand across the batch is rare but legal)."""
    return tuple(a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                 for a, b in zip(args, in_batched))


@lru_cache(maxsize=None)
def _smoothness_tpu(interpret: bool = False):
    """Pallas smoothness with a batch rule: rings are independent, so
    ``vmap`` folds the batch into the ring axis and runs the SAME solo
    kernel — one launch, bigger grid — instead of JAX's default pallas
    batching (VERDICT r3 #1: vmapped pallas fell off the tuned path)."""
    from jax.custom_batching import custom_vmap
    from liodom_tpu.ops.smoothness_pallas import smoothness_pallas

    @custom_vmap
    def f(xyz, count):
        return smoothness_pallas(xyz, count, interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, xyz, count):
        xyz, count = _bcast_unbatched(axis_size, in_batched, xyz, count)
        b, r, w, _ = xyz.shape
        out = f(xyz.reshape(b * r, w, 3), count.reshape(b * r))
        return out.reshape(b, r, w), True

    return f


@lru_cache(maxsize=None)
def _select_edges_tpu(cfg: LiodomConfig, interpret: bool = False):
    """Pallas edge selection with the same ring-fold batch rule as
    :func:`_smoothness_tpu`.  The pick chain never crosses rings
    (feature_extractor.cc:181-313 is per-scan-line), so a batch of B images
    is exactly a (B*R)-ring image; the kernel's ring-block grid then walks
    all batches in one launch and every batch element still matches the
    solo output bit-for-bit."""
    from jax.custom_batching import custom_vmap
    from liodom_tpu.ops.select_pallas import select_edges_pallas

    @custom_vmap
    def f(xyz, count, smooth):
        return select_edges_pallas(RingImage(xyz, count), smooth, cfg,
                                   interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, xyz, count, smooth):
        xyz, count, smooth = _bcast_unbatched(axis_size, in_batched,
                                              xyz, count, smooth)
        b, r, w, _ = xyz.shape
        ec = f(xyz.reshape(b * r, w, 3), count.reshape(b * r),
               smooth.reshape(b * r, w))
        out = EdgeCloud(ec.xyz.reshape(b, -1, 3), ec.valid.reshape(b, -1))
        return out, EdgeCloud(True, True)

    return f


def xy_range(xyz: jax.Array) -> jax.Array:
    """Horizontal (XY) range — the reference gates and weights by this, not by
    3-D range (feature_extractor.cc:96, factors.hpp:91-93)."""
    return jnp.sqrt(xyz[..., 0] ** 2 + xyz[..., 1] ** 2)


def valid_points(xyz: jax.Array, cfg: LiodomConfig) -> jax.Array:
    """isValidPoint (feature_extractor.cc:84-102): finite and XY-range gated."""
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    d = xy_range(xyz)
    return finite & (d >= cfg.min_range) & (d <= cfg.max_range)


def ring_id_velodyne(xyz: jax.Array, cfg: LiodomConfig) -> Tuple[jax.Array, jax.Array]:
    """Ring index from elevation angle — the hard-coded 64/32/16-line formulas
    of feature_extractor.cc:127-151 (adapted from F-LOAM).

    Returns (ring_id int32, in_fov bool)."""
    d = xy_range(xyz)
    # Guard the divide for padded zeros; gated out by valid_points anyway.
    angle = jnp.arctan(xyz[..., 2] / jnp.maximum(d, 1e-9)) * _RAD2DEG
    n = cfg.scan_lines
    if n == 64:
        upper = (angle >= -8.83)
        rid = jnp.where(
            upper,
            ((2.0 - angle) * 3.0 + 0.5).astype(jnp.int32),
            n // 2 + ((-8.83 - angle) * 2.0 + 0.5).astype(jnp.int32),
        )
        ok = (angle <= 2.0) & (angle >= -24.33) & (rid >= 0) & (rid <= 63)
    elif n == 32:
        rid = ((angle + 92.0 / 3.0) * 3.0 / 4.0).astype(jnp.int32)
        ok = (rid >= 0) & (rid <= n - 1)
    elif n == 16:
        rid = ((angle + 15.0) / 2.0 + 0.5).astype(jnp.int32)
        ok = (rid >= 0) & (rid <= n - 1)
    else:
        raise ValueError(f"unsupported scan_lines: {n}")
    return rid, ok


def _pack_rings(xyz: jax.Array, ring: jax.Array, ok: jax.Array,
                cfg: LiodomConfig) -> RingImage:
    """Stable-sort points by ring and scatter into the (rings, width) image.

    Equivalent to the reference's sequential push_back routing
    (feature_extractor.cc:153-156): within a ring, input order is preserved
    (the sort key is ``ring * N + index`` and invalid points go last)."""
    n = xyz.shape[0]
    r, w = cfg.scan_lines, cfg.ring_width
    idx = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(r) * n  # all valid keys are < r*n
    key = jnp.where(ok, ring * n + idx, big + idx)
    order = jnp.argsort(key)  # jnp.argsort is stable
    ring_s = jnp.where(ok, ring, r)[order]
    ok_s = ok[order]
    xyz_s = xyz[order]
    raw_counts = jnp.bincount(jnp.where(ok, ring, r), length=r + 1)[:r]
    raw_counts = raw_counts.astype(jnp.int32)
    counts = jnp.minimum(raw_counts, w)
    # Offsets over the *unclamped* counts: a ring that overflows the padded
    # width must not shift the packing of the rings after it.
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(raw_counts).astype(jnp.int32)])[:-1]
    # position of each sorted point within its ring
    pos = jnp.arange(n, dtype=jnp.int32) - offsets[jnp.clip(ring_s, 0, r - 1)]
    keep = ok_s & (pos < w)
    flat_idx = jnp.where(keep, ring_s * w + pos, r * w)  # overflow slot
    out = jnp.zeros((r * w + 1, 3), dtype=xyz.dtype)
    out = out.at[flat_idx].set(xyz_s, mode="drop")
    return RingImage(out[:-1].reshape(r, w, 3), counts)


def split_scan(raw: RawScan, cfg: LiodomConfig) -> RingImage:
    """Velodyne-mode splitPointCloud (feature_extractor.cc:113-157)."""
    ok = raw.valid & valid_points(raw.xyz, cfg)
    rid, in_fov = ring_id_velodyne(raw.xyz, cfg)
    return _pack_rings(raw.xyz, rid, ok & in_fov, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def split_overflow(raw: RawScan, cfg: LiodomConfig) -> jax.Array:
    """Routed points DROPPED by the ``ring_width`` clamp for this scan
    (scalar int32).  The elevation formulas can route two laser rows into
    one ring id, so a ring can legitimately exceed the per-laser width; the
    reference's ring vectors are unbounded (feature_extractor.cc:153-156),
    so any non-zero value here is a lossy deviation the app must report
    (host loader drops are counted by runtime.native.split_velodyne)."""
    ok = raw.valid & valid_points(raw.xyz, cfg)
    rid, in_fov = ring_id_velodyne(raw.xyz, cfg)
    ok = ok & in_fov
    r, w = cfg.scan_lines, cfg.ring_width
    raw_counts = jnp.bincount(jnp.where(ok, rid, r), length=r + 1)[:r]
    return jnp.sum(jnp.maximum(raw_counts.astype(jnp.int32) - w, 0))


def split_scan_ouster(organized_xyz: jax.Array, cfg: LiodomConfig) -> RingImage:
    """Ouster-mode splitPointCloud (feature_extractor.cc:158-175): the cloud is
    row-organised and the row index *is* the ring; invalid points are dropped
    and rows are left-compacted."""
    h, w0, _ = organized_xyz.shape
    flat = organized_xyz.reshape(h * w0, 3)
    ok = valid_points(flat, cfg)
    rid = (jnp.arange(h * w0, dtype=jnp.int32) // w0)
    return _pack_rings(flat, rid, ok, cfg)


def smoothness(img: RingImage, cfg: LiodomConfig) -> jax.Array:
    """11-tap second-difference smoothness (feature_extractor.cc:195-232).

    smooth[j] = || sum_{l=-5..5} p[j+l] - 11 p[j] ||^2 over the interior
    ``j in [5, count-5)``; non-interior entries are 0 (matching the default-
    constructed SmoothnessItem the reference leaves at the borders).

    On TPU this dispatches to the fused Pallas stencil
    (ops/smoothness_pallas.py); the XLA form below is the portable path."""
    if jax.default_backend() == "tpu":
        return _smoothness_tpu()(img.xyz, img.count)
    x = img.xyz  # (R, W, 3)
    w = x.shape[1]
    acc = -11.0 * x
    for l in range(-5, 6):
        acc = acc + jnp.roll(x, -l, axis=1)
    s = jnp.sum(acc * acc, axis=-1)  # (R, W)
    cols = jnp.arange(w, dtype=jnp.int32)
    interior = (cols[None, :] >= 5) & (cols[None, :] < img.count[:, None] - 5)
    return jnp.where(interior, s, 0.0)


def select_edges(img: RingImage, smooth: jax.Array,
                 cfg: LiodomConfig) -> EdgeCloud:
    """Region-wise greedy edge selection — backend dispatcher.

    On TPU the whole pick chain runs as ONE Mosaic kernel
    (ops/select_pallas.py — the 88 dependent argmax iterations are VMEM
    register math there, vs 88 XLA loop iterations each paying fixed
    overhead); elsewhere the XLA formulation below.  Bit-identical edge
    output either way (tested)."""
    if jax.default_backend() == "tpu":
        return _select_edges_tpu(cfg)(img.xyz, img.count, smooth)
    return select_edges_xla(img, smooth, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def select_edges_xla(img: RingImage, smooth: jax.Array,
                     cfg: LiodomConfig) -> EdgeCloud:
    """Region-wise greedy edge selection with neighbour suppression.

    Exact reformulation of extractFeatures + extractFeaturesFromRegion
    (feature_extractor.cc:181-313):

    * rings with fewer than ``min_points_per_scan`` points don't participate
      (:188);
    * each ring's interior is split into ``scan_regions`` sectors of
      ``(count-10)//regions`` points, the last absorbing the remainder
      (:238-247);
    * per sector: repeatedly take the highest-smoothness unpicked point while
      its smoothness >= 0.1 and at most ``edges_per_region+1`` picks (the
      reference's ``picked_edges > edges_per_region`` post-increment break
      admits budget+1, :264-277);
    * each pick suppresses up to 5 neighbours on each side, stopping early at
      a consecutive-point gap^2 > 0.05 (:280-310).  Suppression is written
      into a ring-global mask, so it carries across sector boundaries exactly
      like the reference's ``picked_`` array.

    Sectors are processed sequentially (lax.scan) but all rings advance in
    lockstep.  The pick chain is the serial core of the whole frame
    (regions x (budget+1) dependent argmaxes), so each region's columns are
    GATHERED into a fixed (rings, window) slab once per region and the
    argmax/suppression chain runs over the window — ~width/regions the
    vector work of scanning the full image per pick, with bit-identical
    results (the argmax was region-masked anyway, and suppression is merged
    back into the ring-global mask between regions, preserving the
    cross-sector carry of the reference's ``picked_`` array).

    Known divergence (edges unaffected): backward suppression reaching
    BEFORE the window start (into the previous, already-finalised region) is
    dropped, so the internal ``picked`` mask may miss bits the reference's
    ``picked_`` array would set.  Edge OUTPUT is bit-identical because
    earlier regions never re-pick, but do not grow a new consumer of the
    mask (e.g. surface features) without first extending the window 5
    columns before ``start``."""
    r, w = img.xyz.shape[0], img.xyz.shape[1]
    xyz = img.xyz
    count = img.count
    n_regions = cfg.scan_regions
    max_picks = cfg.max_edges_per_region

    active = count >= cfg.min_points_per_scan            # (R,)
    total = jnp.maximum(count - 10, 0)                   # interior length
    sector_len = total // n_regions                      # (R,)

    # Window width: the longest region is sector_len + remainder
    # (< n_regions), sector_len <= (w-10)//n_regions; +5 forward-suppression
    # spill into the next region.
    wl = (w - 10) // n_regions + n_regions - 1 + 5
    wcols = jnp.arange(wl, dtype=jnp.int32)[None, :]     # (1, WL)

    # Consecutive-point squared gaps, gap[j] = ||p[j] - p[j-1]||^2.
    diff = xyz - jnp.roll(xyz, 1, axis=1)
    gap_sq = jnp.sum(diff * diff, axis=-1)               # (R, W)
    gap_ok = gap_sq <= cfg.neighbor_gap_sq

    # Forward suppression reach from a picked index b: neighbours b+1..b+l are
    # suppressed while all gaps up to them are small.  fwd_ok[j, l-1] is true
    # iff gaps j+1..j+l are all <= thr.  (5 static shifts — cheap.)
    fwd_ok = []
    acc = jnp.ones_like(gap_ok)
    for l in range(1, 6):
        acc = acc & jnp.roll(gap_ok, -l, axis=1)
        fwd_ok.append(acc)
    bwd_ok = []
    acc = jnp.ones_like(gap_ok)
    for l in range(1, 6):
        # gap between b-l and b-l+1 is gap_sq[b-l+1]
        acc = acc & jnp.roll(gap_ok, l - 1, axis=1)
        bwd_ok.append(acc)
    # pack the 10 reach planes as bits so the window gather moves ONE int32
    # plane instead of ten bool planes
    reach = jnp.zeros((r, w), jnp.int32)
    for l in range(5):
        reach = reach | (fwd_ok[l].astype(jnp.int32) << l)
        reach = reach | (bwd_ok[l].astype(jnp.int32) << (l + 5))

    neg_inf = jnp.array(-jnp.inf, dtype=smooth.dtype)
    rows = jnp.arange(r, dtype=jnp.int32)[:, None]

    def region_step(carry, j):
        picked, edges, evalid = carry
        start = 5 + sector_len * j                       # (R,)
        end = jnp.where(j == n_regions - 1, 5 + total, 5 + sector_len * (j + 1))
        # gather this region's window (clipped at the image edge; clipped
        # columns are masked out of candidacy and suppression write-back)
        idx = start[:, None] + wcols                     # (R, WL)
        in_image = idx < w
        idx_c = jnp.minimum(idx, w - 1)
        sm_w = jnp.take_along_axis(smooth, idx_c, axis=1)
        pk_w = jnp.take_along_axis(picked, idx_c, axis=1)
        reach_w = jnp.take_along_axis(reach, idx_c, axis=1)
        xyz_w = jnp.take_along_axis(xyz, idx_c[:, :, None], axis=1)  # (R,WL,3)
        in_region = wcols < (end - start)[:, None]       # (R, WL)

        def pick_step(p, inner):
            pk_w, supp_w, edges, evalid, done = inner
            cand = in_region & ~pk_w & active[:, None] & ~done[:, None]
            masked = jnp.where(cand, sm_w, neg_inf)
            best_val = jnp.max(masked, axis=1)                    # (R,)
            best = jnp.argmax(masked, axis=1).astype(jnp.int32)   # (R,)
            do_pick = (best_val >= cfg.smoothness_threshold) & jnp.any(cand, axis=1)
            done = done | ~do_pick
            # record edge at static slot layout (ring, region*max_picks + p)
            slot = j * max_picks + p
            pt = jnp.take_along_axis(xyz_w, best[:, None, None].repeat(3, -1),
                                     axis=1)[:, 0, :]             # (R, 3)
            edges = jax.lax.dynamic_update_index_in_dim(
                edges, jnp.where(do_pick[:, None], pt, 0.0), slot, axis=1)
            evalid = jax.lax.dynamic_update_index_in_dim(
                evalid, do_pick, slot, axis=1)
            # suppression (window coords; reach bits looked up at the pick)
            bits = jnp.take_along_axis(reach_w, best[:, None], axis=1)  # (R,1)
            newly = (wcols == best[:, None]) & do_pick[:, None]
            for l in range(1, 6):
                okf = (bits >> (l - 1)) & 1
                newly = newly | ((wcols == best[:, None] + l) & (okf != 0)
                                 & do_pick[:, None])
                okb = (bits >> (l + 4)) & 1
                newly = newly | ((wcols == best[:, None] - l) & (okb != 0)
                                 & do_pick[:, None])
            pk_w = pk_w | newly
            supp_w = supp_w | newly
            return pk_w, supp_w, edges, evalid, done

        done0 = jnp.zeros((r,), dtype=bool)
        supp0 = jnp.zeros((r, wl), dtype=bool)
        pk_w, supp_w, edges, evalid, _ = jax.lax.fori_loop(
            0, max_picks, pick_step, (pk_w, supp0, edges, evalid, done0))
        # merge window suppression back into the ring-global mask so the next
        # region (and its +5 spill-over) sees it
        picked = picked.at[rows, idx_c].max(supp_w & in_image)
        return (picked, edges, evalid), None

    picked0 = jnp.zeros((r, w), dtype=bool)
    edges0 = jnp.zeros((r, n_regions * max_picks, 3), dtype=xyz.dtype)
    evalid0 = jnp.zeros((r, n_regions * max_picks), dtype=bool)
    (picked, edges, evalid), _ = jax.lax.scan(
        region_step, (picked0, edges0, evalid0),
        jnp.arange(n_regions, dtype=jnp.int32))

    return EdgeCloud(edges.reshape(-1, 3), evalid.reshape(-1))


@partial(jax.jit, static_argnames=("cfg",))
def extract_features(raw: RawScan, cfg: LiodomConfig) -> EdgeCloud:
    """Full Velodyne-mode extractor: split -> smoothness -> select."""
    img = split_scan(raw, cfg)
    s = smoothness(img, cfg)
    return select_edges(img, s, cfg)
