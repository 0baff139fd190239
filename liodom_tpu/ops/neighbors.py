"""Correspondence search: exact kNN + PCA line fit.

The reference rebuilds a ``pcl::KdTreeFLANN`` over the local map every solver
iteration and runs per-edge 5-NN queries (laser_odometry.cc:318-323).  A tree
is the wrong shape for a TPU; instead we do **exact brute-force kNN** — a
distance matrix in tiles with a running top-k merge.  For the sizes LiODOM
works at (~5k edges x ~30-90k map points) this is a few hundred MFLOPs of
regular vector math: microseconds of MXU/VPU time, no build phase, exactly
the same answers as FLANN's exact search.

The line test (laser_odometry.cc:325-357) — centroid + covariance of the 5
neighbours, accept when the largest eigenvalue dominates (lambda_max >
3 * lambda_mid), endpoints = 2 nearest neighbours — uses a closed-form
symmetric 3x3 eigenvalue solve instead of an iterative eigensolver.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_BIG = 1e30


@lru_cache(maxsize=None)
def _knn_coords_batchable(k: int, max_radius: float | None,
                          ref_presorted: bool, interpret: bool):
    """The coords kNN kernel wrapped with a ``custom_vmap`` rule: a direct
    call is the solo Pallas kernel, while ``jax.vmap`` of it dispatches to
    :func:`knn_pallas.knn_coords_pallas_batched` — batch folded into the
    Pallas grid — instead of JAX's default pallas batching, which falls off
    the tuned Mosaic path (measured round 3: batch=2 ANTI-scaled, 166
    aggregate scans/s < 222 solo; the batched kernel is the fix, VERDICT r3
    #1).  Cached per static-arg tuple so repeated traces reuse one object."""
    from jax.custom_batching import custom_vmap
    from liodom_tpu.ops.knn_pallas import (knn_coords_pallas,
                                           knn_coords_pallas_batched)

    @custom_vmap
    def f(q, qm, r, rm):
        return knn_coords_pallas(q, qm, r, rm, k=k, max_radius=max_radius,
                                 ref_presorted=ref_presorted,
                                 interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, q, qm, r, rm):
        qb, qmb, rb, rmb = in_batched
        # broadcast any unbatched operand (e.g. one map shared across the
        # batch) so every element is an independent (query, ref) pair
        if not qb:
            q = jnp.broadcast_to(q, (axis_size,) + q.shape)
        if not qmb:
            qm = jnp.broadcast_to(qm, (axis_size,) + qm.shape)
        if not rb:
            r = jnp.broadcast_to(r, (axis_size,) + r.shape)
        if not rmb:
            rm = jnp.broadcast_to(rm, (axis_size,) + rm.shape)
        d2, coords = knn_coords_pallas_batched(
            q, qm, r, rm, k=k, max_radius=max_radius,
            ref_presorted=ref_presorted, interpret=interpret)
        return (d2, coords), (True, True)

    return f


def knn_auto(query, qmask, ref, rmask, k: int = 5, chunk: int = 4096,
             max_radius: float | None = None, ref_presorted: bool = False):
    """Backend-dispatched exact kNN: the Pallas VMEM-resident kernel on TPU
    (ops/knn_pallas.py), the XLA chunked-top-k path elsewhere.  Identical
    contract and results.

    ``max_radius`` (TPU only): spatial-sort + AABB tile pruning — exact
    within the radius, far candidates may report _BIG (see knn_pallas).
    ``ref_presorted``: the ref side is already spatially ordered, skip its
    per-call permutation (see knn_pallas)."""
    if jax.default_backend() == "tpu":
        from liodom_tpu.ops.knn_pallas import knn_pallas
        return knn_pallas(query, qmask, ref, rmask, k=k,
                          max_radius=max_radius, ref_presorted=ref_presorted)
    return knn(query, qmask, ref, rmask, k=k, chunk=chunk)


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn(query: jax.Array, qmask: jax.Array, ref: jax.Array, rmask: jax.Array,
        k: int = 5, chunk: int = 4096) -> Tuple[jax.Array, jax.Array]:
    """Exact k-nearest-neighbours by squared Euclidean distance.

    query: (E, 3), qmask: (E,) bool, ref: (M, 3), rmask: (M,) bool.
    Returns (sq_dists (E, k) ascending, indices (E, k) into ref).
    Invalid ref points never appear as neighbours (distance _BIG); invalid
    queries get _BIG distances.
    """
    e = query.shape[0]
    m = ref.shape[0]
    pad = (-m) % chunk
    if pad:
        ref = jnp.pad(ref, ((0, pad), (0, 0)))
        rmask = jnp.pad(rmask, (0, pad))
    mm = ref.shape[0]
    n_chunks = mm // chunk
    ref_c = ref.reshape(n_chunks, chunk, 3)
    rmask_c = rmask.reshape(n_chunks, chunk)

    q_sq = jnp.sum(query * query, axis=-1, keepdims=True)  # (E, 1)

    def body(carry, inp):
        best_d, best_i = carry
        rc, rm, off = inp
        r_sq = jnp.sum(rc * rc, axis=-1)  # (chunk,)
        # d2 = |q|^2 - 2 q.r + |r|^2 ; the q.r term rides the MXU.
        # HIGHEST precision is required: the default bf16 MXU passes corrupt
        # the cancellation by O(|q||r| * 2^-8) — metres of distance error.
        d2 = (q_sq
              - 2.0 * jnp.dot(query, rc.T,
                              precision=jax.lax.Precision.HIGHEST)
              + r_sq[None, :])
        d2 = jnp.where(rm[None, :], d2, _BIG)
        cd, ci = jax.lax.top_k(-d2, k)  # (E, k) largest of -d2 = smallest d2
        cd = -cd
        ci = ci + off
        # merge with running best
        alld = jnp.concatenate([best_d, cd], axis=1)   # (E, 2k)
        alli = jnp.concatenate([best_i, ci], axis=1)
        md, sel = jax.lax.top_k(-alld, k)
        best_d = -md
        best_i = jnp.take_along_axis(alli, sel, axis=1)
        return (best_d, best_i), None

    init = (jnp.full((e, k), _BIG, dtype=query.dtype),
            jnp.zeros((e, k), dtype=jnp.int32))
    offs = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (best_d, best_i), _ = jax.lax.scan(body, init, (ref_c, rmask_c, offs))
    best_d = jnp.where(qmask[:, None], best_d, _BIG)
    # clamp out-of-range pad indices (only reachable when everything invalid)
    best_i = jnp.minimum(best_i, m - 1)
    return jnp.maximum(best_d, 0.0), best_i


def sym3_eigenvalues(A: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric 3x3 matrices (..., 3, 3), ascending.

    Closed-form trigonometric (Cardano) method — the TPU-friendly replacement
    for Eigen::SelfAdjointEigenSolver (laser_odometry.cc:342-344).
    """
    a00 = A[..., 0, 0]
    a11 = A[..., 1, 1]
    a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a12 = A[..., 1, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = ((a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.where(p > 0, p, 1.0)

    b00, b11, b22 = (a00 - q) / safe_p, (a11 - q) / safe_p, (a22 - q) / safe_p
    b01, b02, b12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
    detB = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_max = q + 2.0 * p * jnp.cos(phi)
    e_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_max - e_min
    eigs = jnp.stack([e_min, e_mid, e_max], axis=-1)
    # p == 0: A = q I, all eigenvalues equal q
    return jnp.where((p > 0)[..., None], eigs, jnp.broadcast_to(q[..., None], eigs.shape))


class LineCorrespondences(NamedTuple):
    """Per-edge line-correspondence data for the point-to-line factors."""

    lpa: jax.Array    # (E, 3) first line point (nearest neighbour)
    lpb: jax.Array    # (E, 3) second line point (2nd nearest)
    valid: jax.Array  # (E,) bool — edge passed distance + eigenvalue gates


def _line_fit(near: jax.Array, dk: jax.Array, emask: jax.Array,
              max_sq_dist: float, eig_ratio: float,
              min_line_sep: float) -> LineCorrespondences:
    """Line acceptance + endpoint extraction from the (E, k, 3) neighbour
    coordinates (laser_odometry.cc:325-357): centroid + un-normalised
    covariance, Cardano eigenvalues, lambda_max > eig_ratio * lambda_mid,
    endpoints = 2 nearest neighbours.  ``dk`` is the k-th (worst) squared
    neighbour distance; coords of gated-out rows may be garbage — they are
    never consumed (the solver masks by ``valid``)."""
    center = jnp.mean(near, axis=1, keepdims=True)
    zm = near - center
    cov = jnp.einsum("eki,ekj->eij", zm, zm)   # un-normalised, like the ref
    eigs = sym3_eigenvalues(cov)
    sep_sq = jnp.sum((near[:, 0, :] - near[:, 1, :]) ** 2, axis=-1)
    ok = (dk < max_sq_dist) & (eigs[:, 2] > eig_ratio * eigs[:, 1])
    ok = ok & emask & (sep_sq > min_line_sep * min_line_sep)
    return LineCorrespondences(near[:, 0, :], near[:, 1, :], ok)


@partial(jax.jit, static_argnames=("k", "max_sq_dist", "eig_ratio", "chunk",
                                   "min_line_sep", "map_presorted",
                                   "knn_impl"))
def line_correspondences(edges_world: jax.Array, emask: jax.Array,
                         map_pts: jax.Array, mmask: jax.Array,
                         k: int = 5, max_sq_dist: float = 1.0,
                         eig_ratio: float = 3.0,
                         min_line_sep: float = 0.01,
                         chunk: int = 4096,
                         map_presorted: bool = False,
                         knn_impl: str = "auto") -> LineCorrespondences:
    """Full correspondence stage (laser_odometry.cc:318-362):

    per transformed edge: 5-NN in the matching map; accept when the 5th NN is
    within ``max_sq_dist``; fit the neighbourhood covariance; require
    lambda_max > eig_ratio * lambda_mid; line endpoints = 2 nearest
    neighbours.  Additionally requires the endpoints to be at least
    ``min_line_sep`` apart (see LiodomConfig.min_line_sep — degenerate
    duplicate-point "lines" are numerically meaningless).

    ``knn_impl``: "auto" uses the fully-fused Pallas lines kernel on TPU
    (kNN + this whole line-fit gate in one kernel — the (E, k) neighbour
    planes never leave VMEM) and the XLA chunked top-k elsewhere; "xla"
    forces the XLA path; "pallas_coords" the coords-epilogue kernel + XLA
    line fit; "pallas_interpret"/"pallas_lines_interpret" run the
    respective kernels in interpreter mode (CPU parity tests)."""
    # Radius pruning is gate-exact: edges whose k-th NN exceeds
    # sqrt(max_sq_dist) are rejected either way (laser_odometry.cc:324).
    if knn_impl == "auto":
        # trace-time resolution; LIODOM_KNN_IMPL overrides the default TPU
        # path (benchmarking / A-B runs without editing call sites).
        # Default = the coords-epilogue kernel (hardware-swept r2 path); the
        # fully-fused lines kernel is opt-in until its production-working-set
        # numbers beat it (scripts/knn_sweep.py).
        import os
        knn_impl = os.environ.get("LIODOM_KNN_IMPL", "pallas_coords")
    use_lines = (knn_impl == "pallas_lines_interpret" or
                 (knn_impl == "pallas_lines"
                  and jax.default_backend() == "tpu"))
    if use_lines:
        from liodom_tpu.ops.knn_pallas import knn_lines_pallas
        lpa, lpb, ok = knn_lines_pallas(
            edges_world, emask, map_pts, mmask, k=k,
            max_sq_dist=float(max_sq_dist), eig_ratio=float(eig_ratio),
            min_line_sep=float(min_line_sep),
            ref_presorted=map_presorted,
            interpret=(knn_impl == "pallas_lines_interpret"))
        return LineCorrespondences(lpa, lpb, ok & emask)
    use_coords = (knn_impl == "pallas_interpret" or
                  (knn_impl == "pallas_coords"
                   and jax.default_backend() == "tpu"))
    if use_coords:
        knn_fn = _knn_coords_batchable(
            k, float(max_sq_dist) ** 0.5, map_presorted,
            knn_impl == "pallas_interpret")
        d2, near = knn_fn(edges_world, emask, map_pts, mmask)
    else:
        d2, idx = knn(edges_world, emask, map_pts, mmask, k=k, chunk=chunk)
        near = map_pts[idx]                    # (E, k, 3)
    return _line_fit(near, d2[:, k - 1], emask,
                     max_sq_dist, eig_ratio, min_line_sep)
