"""Batched multi-sequence odometry: vmap batch == independent runs."""

import numpy as np
import jax
import jax.numpy as jnp

from liodom_tpu import LiodomConfig
from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
from liodom_tpu.odometry import pipeline as P
from liodom_tpu.parallel.sharded import init_batch_state
from liodom_tpu.runtime import native


def _image_seq(seed, n, cfg):
    world = BoxWorld(seed=seed)
    pos, yaws = drive_trajectory(n, speed=0.8, yaw_rate=0.02 * (seed + 1))
    out = []
    for i in range(n):
        pts = world.render(pos[i], yaw_matrix(yaws[i]), width=400,
                           noise=0.005, seed=seed * 100 + i)
        out.append(native.split_velodyne_np(
            pts, cfg.scan_lines, cfg.ring_width, cfg.min_range,
            cfg.max_range))
    return out


def test_batch_matches_individual():
    cfg = LiodomConfig(ring_width=512, scan_lines=64, local_map_size=2,
                       max_points=32768)
    n_frames, batch = 3, 2
    seqs = [_image_seq(s, n_frames, cfg) for s in range(batch)]

    # individual runs
    solo_poses = []
    for s in range(batch):
        st = P.init_state(cfg)
        traj = []
        for img, cnt, _ in seqs[s]:
            st, pose, _ = P.image_step(st, jnp.asarray(img),
                                       jnp.asarray(cnt), cfg)
            traj.append(np.asarray(pose.t))
        solo_poses.append(np.stack(traj))

    # batched run
    states = init_batch_state(cfg, batch)
    batch_traj = [[] for _ in range(batch)]
    for f in range(n_frames):
        imgs = jnp.stack([jnp.asarray(seqs[s][f][0]) for s in range(batch)])
        cnts = jnp.stack([jnp.asarray(seqs[s][f][1]) for s in range(batch)])
        states, poses, _ = P.batch_image_step(states, imgs, cnts, cfg)
        for s in range(batch):
            batch_traj[s].append(np.asarray(poses.t)[s])

    for s in range(batch):
        # vmap batches the einsums -> different reduction order; tiny noise
        np.testing.assert_allclose(np.stack(batch_traj[s]), solo_poses[s],
                                   rtol=0, atol=5e-4)
