"""Pallas smoothness stencil vs. the XLA reference implementation."""

import numpy as np
import jax.numpy as jnp

from liodom_tpu import LiodomConfig
from liodom_tpu.core.frame import RingImage
from liodom_tpu.ops.smoothness_pallas import smoothness_pallas


def _xla_smoothness(img: RingImage) -> jnp.ndarray:
    """The portable formulation (ops/features.py smoothness, XLA branch)."""
    x = img.xyz
    w = x.shape[1]
    acc = -11.0 * x
    for l in range(-5, 6):
        acc = acc + jnp.roll(x, -l, axis=1)
    s = jnp.sum(acc * acc, axis=-1)
    cols = jnp.arange(w, dtype=jnp.int32)
    interior = (cols[None, :] >= 5) & (cols[None, :] < img.count[:, None] - 5)
    return jnp.where(interior, s, 0.0)


def test_matches_xla():
    rng = np.random.default_rng(0)
    img = RingImage(
        jnp.asarray(rng.standard_normal((16, 256, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(20, 256, 16).astype(np.int32)))
    ref = _xla_smoothness(img)
    got = smoothness_pallas(img.xyz, img.count, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_borders_zero():
    rng = np.random.default_rng(1)
    cnt = jnp.asarray(np.full(8, 100, np.int32))
    img = RingImage(
        jnp.asarray(rng.standard_normal((8, 128, 3)).astype(np.float32)),
        cnt)
    got = np.asarray(smoothness_pallas(img.xyz, img.count, interpret=True))
    assert (got[:, :5] == 0).all()
    assert (got[:, 95:] == 0).all()
    assert (got[:, 5:95] != 0).any()


def test_empty_ring():
    img = RingImage(jnp.zeros((4, 64, 3)), jnp.zeros((4,), jnp.int32))
    got = np.asarray(smoothness_pallas(img.xyz, img.count, interpret=True))
    assert (got == 0).all()
