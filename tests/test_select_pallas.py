"""Parity tests for the Pallas edge-selection kernel (interpret mode).

The kernel (ops/select_pallas.py) must be bit-identical to the XLA
formulation (ops/features.select_edges_xla) — both reformulate the
reference's greedy region-wise selection (feature_extractor.cc:256-313).
Hardware parity/timing is exercised separately on the real chip (the CPU
suite runs the kernel through the Pallas interpreter).
"""

import numpy as np
import jax.numpy as jnp

from liodom_tpu.core.config import LiodomConfig
from liodom_tpu.core.frame import RawScan, RingImage
from liodom_tpu.ops import features as F
from liodom_tpu.ops.select_pallas import select_edges_pallas

from test_features import synth_scan


def _parity_case(cfg, pts):
    raw = RawScan.from_points(jnp.array(pts, jnp.float32), cfg.max_points)
    img = F.split_scan(raw, cfg)
    sm = F.smoothness(img, cfg)
    ref = F.select_edges_xla(img, sm, cfg)
    got = select_edges_pallas(img, sm, cfg, interpret=True)
    rv, gv = np.asarray(ref.valid), np.asarray(got.valid)
    assert (rv == gv).all()
    np.testing.assert_array_equal(np.asarray(got.xyz)[gv],
                                  np.asarray(ref.xyz)[rv])
    assert gv.sum() > 0


def test_pallas_select_matches_xla_bit_exact():
    rng = np.random.default_rng(3)
    cfg = LiodomConfig(max_points=8192, ring_width=512)
    _parity_case(cfg, synth_scan(rng, 6000))


def test_pallas_select_matches_xla_wide_rings():
    # wide image forces the ring-tiled grid (several blocks)
    rng = np.random.default_rng(4)
    cfg = LiodomConfig(max_points=65536, ring_width=4096)
    _parity_case(cfg, synth_scan(rng, 40000))


def test_pallas_select_empty_scan():
    cfg = LiodomConfig(max_points=2048, ring_width=256)
    raw = RawScan.from_points(jnp.zeros((16, 3), jnp.float32),
                              cfg.max_points)
    img = F.split_scan(raw, cfg)
    sm = F.smoothness(img, cfg)
    got = select_edges_pallas(img, sm, cfg, interpret=True)
    assert int(np.asarray(got.valid).sum()) == 0
    assert np.isfinite(np.asarray(got.xyz)).all()
