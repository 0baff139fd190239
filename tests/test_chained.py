"""Chained K-frames-per-dispatch steps: parity with the per-frame loop.

The chained step (pipeline.chained_image_step / service.chained_
combined_image_step) is a pure re-expression of the per-frame host loop as
``lax.scan`` — the math is identical, so poses must match the unchained
loop to float-reassociation tolerance over a real multi-frame course.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from liodom_tpu import LiodomConfig
from liodom_tpu.core.config import MapConfig
from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
from liodom_tpu.odometry import pipeline as P
from liodom_tpu.runtime import native

N_FRAMES = 6
CFG = LiodomConfig(max_points=16384, ring_width=256, local_map_size=3)


@pytest.fixture(scope="module")
def images():
    world = BoxWorld(seed=0)
    pos, yaws = drive_trajectory(N_FRAMES, speed=0.8, yaw_rate=0.02)
    out = []
    for f in range(N_FRAMES):
        scan = world.render(pos[f], yaw_matrix(yaws[f]), width=256,
                            noise=0.005, seed=f)
        img, counts, _ = native.split_velodyne_np(
            scan.astype(np.float32), CFG.scan_lines, CFG.ring_width,
            CFG.min_range, CFG.max_range)
        out.append((jnp.asarray(img), jnp.asarray(counts)))
    return out


def _stack(images):
    return (jnp.stack([im for im, _ in images]),
            jnp.stack([ct for _, ct in images]))


def test_chained_image_step_matches_per_frame(images):
    state = P.init_state(CFG)
    ref_poses = []
    for im, ct in images:
        state, pose, ne = P.image_step(state, im, ct, CFG)
        ref_poses.append(np.asarray(pose.t))
    ref_final_window = np.asarray(state.window.nframes)

    imgs, cnts = _stack(images)
    cstate, poses, nedges = P.chained_image_step(
        P.init_state(CFG), imgs, cnts, CFG)
    ct_ = np.asarray(poses.t)
    assert ct_.shape == (N_FRAMES, 3)
    assert nedges.shape == (N_FRAMES,)
    for f in range(N_FRAMES):
        err = np.linalg.norm(ct_[f] - ref_poses[f])
        assert err < 1e-4, f"frame {f}: chained diverged {err} m"
    assert int(cstate.window.nframes) == ref_final_window
    # state must be resumable: one more per-frame step from chained state
    # equals running the whole course per-frame plus that frame
    im, ct = images[-1]
    s2, p2, _ = P.image_step(cstate, im, ct, CFG)
    s1 = P.init_state(CFG)
    for imx, ctx in images:
        s1, _, _ = P.image_step(s1, imx, ctx, CFG)
    s1, p1, _ = P.image_step(s1, im, ct, CFG)
    assert np.linalg.norm(np.asarray(p2.t) - np.asarray(p1.t)) < 1e-4


def test_chained_combined_matches_per_frame(images):
    from liodom_tpu.mapping.service import (chained_combined_image_step,
                                            combined_image_step,
                                            init_combined)
    ccfg = CFG.replace(mapping=True)
    mcfg = MapConfig(map_capacity=8192, local_map_capacity=2048)

    co, cm = init_combined(ccfg, mcfg)
    ref_poses = []
    for i, (im, ct) in enumerate(images):
        co, cm, pose, _ = combined_image_step(
            co, cm, im, ct, ccfg, mcfg, step=jnp.int32(i),
            local_map_every=2)
        ref_poses.append(np.asarray(pose.t))

    imgs, cnts = _stack(images)
    co2, cm2, poses, _ = chained_combined_image_step(
        init_combined(ccfg, mcfg)[0], init_combined(ccfg, mcfg)[1],
        imgs, cnts, ccfg, mcfg, step0=0, local_map_every=2)
    ct_ = np.asarray(poses.t)
    for f in range(N_FRAMES):
        err = np.linalg.norm(ct_[f] - ref_poses[f])
        assert err < 1e-4, f"frame {f}: chained combined diverged {err} m"
    # map state parity: same occupied-slot count and overflow counter
    assert int(cm2.valid.sum()) == int(cm.valid.sum())
    assert int(cm2.overflow) == int(cm.overflow)


def test_chained_with_per_frame_imu_matches(images):
    """cfg.use_imu in the chained step: each scanned frame must see ITS
    IMU quat (passed as a (K, 4) scan input), matching the per-frame
    set_imu-then-step loop exactly."""
    cfg = CFG.replace(use_imu=True)
    rng = np.random.default_rng(3)
    quats = rng.normal(size=(N_FRAMES, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    quats = jnp.asarray(quats, jnp.float32)

    state = P.init_state(cfg)
    ref = []
    for f, (im, ct) in enumerate(images):
        state = P.set_imu(state, quats[f])
        state, pose, _ = P.image_step(state, im, ct, cfg)
        ref.append(np.asarray(pose.t))

    imgs, cnts = _stack(images)
    _, poses, _ = P.chained_image_step(
        P.init_state(cfg), imgs, cnts, cfg, imu_quats=quats)
    got = np.asarray(poses.t)
    for f in range(N_FRAMES):
        assert np.linalg.norm(got[f] - ref[f]) < 1e-4, f
    # and the guard: use_imu without quats is an error, not silent reuse
    with pytest.raises(ValueError):
        P.chained_image_step(P.init_state(cfg), imgs, cnts, cfg)


def test_chained_chunked_resume_parity(images):
    """Two chained chunks of K/2 == one chunk of K (step0 carries the
    cadence counter across chunks)."""
    from liodom_tpu.mapping.service import (chained_combined_image_step,
                                            init_combined)
    ccfg = CFG.replace(mapping=True)
    mcfg = MapConfig(map_capacity=8192, local_map_capacity=2048)
    imgs, cnts = _stack(images)
    h = N_FRAMES // 2

    co_a, cm_a, poses_a, _ = chained_combined_image_step(
        *init_combined(ccfg, mcfg), imgs, cnts, ccfg, mcfg,
        step0=0, local_map_every=2)

    co, cm = init_combined(ccfg, mcfg)
    co, cm, p1, _ = chained_combined_image_step(
        co, cm, imgs[:h], cnts[:h], ccfg, mcfg, step0=0, local_map_every=2)
    co, cm, p2, _ = chained_combined_image_step(
        co, cm, imgs[h:], cnts[h:], ccfg, mcfg, step0=h, local_map_every=2)
    got = np.concatenate([np.asarray(p1.t), np.asarray(p2.t)])
    want = np.asarray(poses_a.t)
    assert np.allclose(got, want, atol=1e-5), (
        f"chunked resume diverged: {np.abs(got - want).max()}")
