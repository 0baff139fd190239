"""Pallas TPU kernel for the 11-tap smoothness stencil.

Hot op #3 of the frame loop (SURVEY.md §3.1): per point j of each ring,
``smooth[j] = || sum_{l=-5..5} p[j+l] - 11 p[j] ||^2`` over the interior
``j in [5, count-5)`` (feature_extractor.cc:195-232, the reference
OpenMP-parallelises this).  The XLA fallback materialises 11 rolled copies
of the (R, W, 3) image; this kernel keeps one coordinate plane set in VMEM,
does the 10 shifted adds in registers, and fuses the squared norm and the
interior mask into the same pass — one HBM read per plane, one write total.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _smooth_kernel(x_ref, y_ref, z_ref, cnt_ref, out_ref):
    r, w = x_ref.shape

    def tap_sum(p):
        acc = -11.0 * p
        for l in range(-5, 6):
            # pltpu.roll wants a non-negative shift; (-l) % w == roll by -l
            acc = acc + pltpu.roll(p, (-l) % w, 1)
        return acc

    ax = tap_sum(x_ref[:])
    ay = tap_sum(y_ref[:])
    az = tap_sum(z_ref[:])
    s = ax * ax + ay * ay + az * az
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
    interior = (cols >= 5) & (cols < cnt_ref[:] - 5)
    out_ref[:] = jnp.where(interior, s, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def smoothness_pallas(img_xyz: jax.Array, count: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """img_xyz (R, W, 3), count (R,) -> smoothness (R, W).

    Bit-compatible with ops.features.smoothness (same tap order, same
    masking; roll wrap-around only touches non-interior columns).

    Tiled over RINGS (rows are independent; the stencil runs along width),
    so VMEM use is bounded at any ring width — a monolithic (64, 4096)
    block plus its shift temporaries overflows the ~16 MB scoped VMEM.
    The ring-tile height adapts to the width: as tall as a ~14 MB budget
    for ~24 live (tile_r, W) planes allows (Mosaic keeps the 11 rolled
    copies plus accumulators on the VMEM stack — a (128, 2048) tile
    measured 23.09 MB of scoped vmem).  Batched images fold B into the
    ring axis — features._smoothness_tpu — so tall tiles keep the grid
    short instead of walking B*64/8 tiny DMA-bound steps."""
    r, w = img_xyz.shape[0], img_xyz.shape[1]
    budget_rows = max(8, (14 * 1024 * 1024) // (24 * 4 * w))
    tile_r = r
    while tile_r > budget_rows or (tile_r > 8 and r % tile_r != 0):
        tile_r //= 2
    if r % tile_r != 0:
        tile_r = r
    planes = jnp.moveaxis(img_xyz, -1, 0)  # (3, R, W)
    cnt = jnp.broadcast_to(count[:, None], (r, w)).astype(jnp.int32)
    row_spec = pl.BlockSpec((tile_r, w), lambda i: (i, 0))
    return pl.pallas_call(
        _smooth_kernel,
        grid=(r // tile_r,),
        in_specs=[row_spec, row_spec, row_spec, row_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((r, w), img_xyz.dtype),
        interpret=interpret,
    )(planes[0], planes[1], planes[2], cnt)
