"""AOT executable warm start (runtime/aot.py).

The serialize/deserialize roundtrip must return a callable with identical
results, tags must separate configs that share shapes, and a stale/corrupt
blob must fall back to jit instead of failing.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from liodom_tpu.runtime import aot


def test_roundtrip_and_tag_separation(tmp_path, monkeypatch):
    monkeypatch.setenv("LIODOM_AOT_CACHE", str(tmp_path))

    def f(x, y):
        return x @ y + 1.0

    def g(x, y):
        return x @ y - 1.0

    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((8, 8)).astype(np.float32))
    y = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((8, 8)).astype(np.float32))

    c1 = aot.get_or_compile("t", f, (x, y), extra="plus")
    out1 = np.asarray(c1(x, y))
    # a second resolve must come from the blob (delete would break it)
    files = list(os.listdir(tmp_path))
    assert len(files) == 1
    c2 = aot.get_or_compile("t", f, (x, y), extra="plus")
    np.testing.assert_array_equal(np.asarray(c2(x, y)), out1)

    # same name + shapes but different static config -> different blob
    c3 = aot.get_or_compile("t", g, (x, y), extra="minus")
    assert len(os.listdir(tmp_path)) == 2
    np.testing.assert_allclose(np.asarray(c3(x, y)), out1 - 2.0,
                               rtol=0, atol=1e-6)


def test_corrupt_blob_falls_back(tmp_path, monkeypatch):
    monkeypatch.setenv("LIODOM_AOT_CACHE", str(tmp_path))

    def f(x):
        return x * 2.0

    x = jnp.ones((4,), jnp.float32)
    aot.get_or_compile("c", f, (x,), extra="")
    (blob,) = [tmp_path / p for p in os.listdir(tmp_path)]
    blob.write_bytes(b"garbage")
    c = aot.get_or_compile("c", f, (x,), extra="")
    np.testing.assert_array_equal(np.asarray(c(x)), np.full(4, 2.0,
                                                            np.float32))


def test_image_step_aot_matches_jit(tmp_path, monkeypatch):
    """The production program through the AOT path == the jitted path."""
    monkeypatch.setenv("LIODOM_AOT_CACHE", str(tmp_path))
    from liodom_tpu import LiodomConfig
    from liodom_tpu.core.synth import BoxWorld, yaw_matrix
    from liodom_tpu.odometry import pipeline as P
    from liodom_tpu.runtime import native

    cfg = LiodomConfig(ring_width=512, scan_lines=64, local_map_size=2)
    world = BoxWorld(seed=0)
    scan = world.render(np.zeros(3), yaw_matrix(0.0), width=400,
                        noise=0.005, seed=0)
    img, counts, _ = native.split_velodyne_np(
        scan, cfg.scan_lines, cfg.ring_width, cfg.min_range, cfg.max_range)
    img = jnp.asarray(img, jnp.float32)
    counts = jnp.asarray(counts, jnp.int32)
    state = P.init_state(cfg)

    step = aot.get_or_compile(
        "test_image_step", lambda s, x, c: P.image_step(s, x, c, cfg),
        (state, img, counts), extra=str(cfg))
    s_a, pose_a, ne_a = step(state, img, counts)
    s_j, pose_j, ne_j = P.image_step(state, img, counts, cfg)
    np.testing.assert_array_equal(np.asarray(pose_a.t), np.asarray(pose_j.t))
    assert int(ne_a) == int(ne_j)
    # and the blob-restored executable agrees too
    step2 = aot.load_compiled("test_image_step", (state, img, counts),
                              extra=str(cfg))
    assert step2 is not None
    _, pose_b, _ = step2(state, img, counts)
    np.testing.assert_array_equal(np.asarray(pose_b.t), np.asarray(pose_a.t))
