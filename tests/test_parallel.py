"""Multi-device SPMD tests on the 8-virtual-CPU-device mesh (SURVEY.md §4d)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from liodom_tpu.core.config import LiodomConfig
from liodom_tpu.core.frame import RawScan
from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
from liodom_tpu.odometry import pipeline as P
from liodom_tpu.ops.features import extract_features
from liodom_tpu.parallel.mesh import make_mesh
from liodom_tpu.parallel import sharded

CFG = LiodomConfig(max_points=65536, ring_width=1024, local_map_size=3)


@pytest.fixture(scope="module")
def scans():
    world = BoxWorld(seed=0)
    pos, yaws = drive_trajectory(4, speed=0.5, yaw_rate=0.01)
    out = []
    for i in range(4):
        scan = world.render(pos[i], yaw_matrix(yaws[i]), width=900,
                            noise=0.0, seed=i)
        out.append(scan)
    return out, pos


def test_mesh_construction():
    m = make_mesh(data=2, map_=4)
    assert m.shape == {"data": 2, "map": 4}
    m2 = make_mesh(data=2)
    assert m2.shape["map"] == len(jax.devices()) // 2


def test_sharded_step_matches_single_device(scans):
    scan_list, pos = scans
    cfg = CFG
    mesh = make_mesh(data=2, map_=4)
    batch = 2
    step = sharded.make_sharded_step(mesh, cfg)

    # reference single-device states (both sequences identical input here)
    ref_state = P.init_state(cfg)
    bstate = sharded.init_batch_state(cfg, batch)

    for i, scan in enumerate(scan_list):
        raw = RawScan.from_points(jnp.array(scan), cfg.max_points)
        edges = extract_features(raw, cfg)
        ref_state, ref_pose = P.odometry_step(ref_state, edges, cfg)
        bx = jnp.broadcast_to(edges.xyz, (batch,) + edges.xyz.shape)
        bv = jnp.broadcast_to(edges.valid, (batch,) + edges.valid.shape)
        bstate, bpose = step(bstate, bx, bv)

    t_ref = np.asarray(ref_pose.t)
    for b in range(batch):
        np.testing.assert_allclose(np.asarray(bpose.t)[b], t_ref, atol=2e-2)
        np.testing.assert_allclose(np.asarray(bpose.q)[b],
                                   np.asarray(ref_pose.q), atol=1e-3)
    # and it actually tracked the motion
    assert np.linalg.norm(t_ref - pos[3]) < 0.1


def test_sharded_step_data_axis_independent(scans):
    """Different sequences in the batch evolve independently."""
    scan_list, _ = scans
    cfg = CFG
    mesh = make_mesh(data=4, map_=2)
    step = sharded.make_sharded_step(mesh, cfg)
    bstate = sharded.init_batch_state(cfg, 4)
    raw = RawScan.from_points(jnp.array(scan_list[0]), cfg.max_points)
    edges = extract_features(raw, cfg)
    # batch entries 0..3 get scans of different frames -> different poses
    xs, vs = [], []
    for b in range(4):
        r = RawScan.from_points(jnp.array(scan_list[b]), cfg.max_points)
        e = extract_features(r, cfg)
        xs.append(e.xyz)
        vs.append(e.valid)
    bx, bv = jnp.stack(xs), jnp.stack(vs)
    # frame 1: everyone sees frame0 (seed window)
    bstate, _ = step(bstate, jnp.broadcast_to(edges.xyz, bx.shape),
                     jnp.broadcast_to(edges.valid, bv.shape))
    # frame 2: each sequence sees its own scan
    bstate, bpose = step(bstate, bx, bv)
    t = np.asarray(bpose.t)
    assert np.linalg.norm(t[0]) < 0.05           # static sequence
    assert np.linalg.norm(t[2]) > 0.2            # moved sequence (gt ~0.37 m)
