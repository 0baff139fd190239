"""MEASURED DEAD END (kept as the experiment record, NOT wired in).

Pallas TPU kernel: masked stream compaction (order-preserving), built to
replace ``get_local_map``'s argsort-based hit compaction.  Outcome on
hardware (C=262k, cap=16k, ~6.5k hits): **2.37-2.66 ms vs 1.461 ms for
the XLA argsort path** — and the argsort number includes the ~1.1 ms
isolated-dispatch floor, so the real compaction cost it targets is only
~0.36 ms.  The one-hot-matmul rank/permute (2 TxT MXU ops per tile, 512
tiles) costs far more than the sort it replaces.  Additionally the
dynamic sublane store at arbitrary (unaligned) running offsets returns
wrong rows on hardware while interpret mode is exact — an alignment
hazard that would need offset-rounding to 8-row boundaries to fix.
Conclusion: the argsort path stays; this file documents why.

Original design notes:

Backs ``mapping.grid.get_local_map``'s hit-row compaction
(``Map::getLocalMap``'s output assembly, /root/reference/src/map.cc:141-189
— the reference just appends matching cells' points to a PCL cloud).  The
XLA path pays a full C-row argsort (~0.9 ms at C = 262k net of dispatch);
this kernel makes one linear pass instead:

* sequential grid over row tiles; per tile, rank the hit rows with an
  in-tile cumsum and gather them to the tile front with a one-hot matmul
  (MXU; T-deep contraction) — no scatter, no sort;
* the full padded (T, 4) tile is stored at a running output offset carried
  in SMEM; the NEXT tile's store overwrites this tile's junk tail, so only
  rows past the final total are garbage — and those are exactly the rows
  the caller masks with ``row < n_hits``.

Output row order equals the XLA argsort path exactly (hits in ascending
row order), so the two paths are interchangeable, not just set-equal.

Deviation (documented): when the output buffer is within one tile of full
(``offset + T > capacity``) the tile's store is skipped, so truncation can
begin up to T rows earlier than the argsort path's exact-capacity cut.
Both paths are already lossy there; ``n_hits`` reporting is unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _compact_kernel(x_ref, h_ref, out_ref, off_ref, *, cap):
    t = pl.program_id(0)
    tile_rows = x_ref.shape[0]

    @pl.when(t == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)
        off_ref[0] = 0

    h = h_ref[:]                                   # (T, 1) f32 0/1
    # inclusive prefix sum as a lower-triangular matmul (Mosaic has no
    # cumsum lowering; the MXU does a T-deep contraction anyway)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, tile_rows), 0)
    cols_k = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, tile_rows), 1)
    lower = (cols_k <= rows_i).astype(jnp.float32)
    pos = jax.lax.dot(lower, h,
                      preferred_element_type=jnp.float32)  # 1-based rank
    posh = pos * h                                 # 0 for non-hits
    # one-hot[j, i] = 1 iff input row i is the (j+1)-th hit of the tile
    ranks = posh.reshape(1, tile_rows)             # (1, T) lane layout
    rows = rows_i.astype(jnp.float32)              # output row j (int iota
                                                   # cast — Mosaic rejects
                                                   # float iota directly)
    onehot = (rows + 1.0 == ranks).astype(jnp.float32)
    compacted = jax.lax.dot(onehot, x_ref[:],
                            preferred_element_type=jnp.float32)  # (T, 4)

    off = off_ref[0]

    @pl.when(off + tile_rows <= cap)
    def _store():
        out_ref[pl.ds(off, tile_rows), :] = compacted

    off_ref[0] = off + jnp.sum(h).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("capacity", "tile_rows", "interpret"))
def compact_rows_pallas(xyz: jax.Array, hit: jax.Array, capacity: int,
                        tile_rows: int = 512,
                        interpret: bool = False) -> jax.Array:
    """Gather rows of ``xyz (C, 3)`` where ``hit (C,)`` is set, in ascending
    row order, into a ``(capacity, 3)`` buffer (zero-padded, rows beyond the
    hit count undefined-but-finite — mask with the hit count).

    C must divide by ``tile_rows``; capacity must be a multiple of 8
    (sublane-aligned dynamic store)."""
    c = xyz.shape[0]
    if c % tile_rows:
        raise ValueError(f"rows {c} not divisible by tile {tile_rows}")
    if capacity % 8:
        raise ValueError("capacity must be a multiple of 8")
    x4 = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, 1)))     # (C, 4)
    h = hit.astype(jnp.float32)[:, None]                        # (C, 1)
    out = pl.pallas_call(
        functools.partial(_compact_kernel, cap=capacity),
        grid=(c // tile_rows,),
        in_specs=[pl.BlockSpec((tile_rows, 4), lambda i: (i, 0)),
                  pl.BlockSpec((tile_rows, 1), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((capacity, 4), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((capacity, 4), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(x4, h)
    return out[:, :3]
