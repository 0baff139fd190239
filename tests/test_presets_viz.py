"""Presets (launch-file equivalents), viz export, logging config."""

import logging
import os

import numpy as np

from liodom_tpu.core.presets import kitti_preset, ouster_preset, \
    mapping_preset
from liodom_tpu.runtime.viz import save_ply, save_trajectory_ply, \
    export_frame_debug
from liodom_tpu.runtime.logging_config import configure


def test_kitti_preset_matches_launch_values():
    cfg, mcfg = kitti_preset(mapping=True)
    # launch/liodom.launch:17-34, :46-52
    assert cfg.scan_lines == 64 and cfg.local_map_size == 15
    assert cfg.lidar_type == 0 and cfg.mapping
    assert cfg.laser_frame == "velodyne"
    assert (mcfg.voxel_xysize, mcfg.voxel_zsize) == (30.0, 35.0)
    assert (mcfg.cells_xy, mcfg.cells_z) == (3, 2)


def test_ouster_preset():
    cfg, _ = ouster_preset(scan_lines=128)
    assert cfg.lidar_type == 1 and cfg.scan_lines == 128
    assert cfg.laser_frame == ""  # taken from header (laser_odometry.cc:111)


def test_mapping_preset():
    mcfg = mapping_preset()
    assert (mcfg.voxel_xysize, mcfg.voxel_zsize) == (20.0, 25.0)


def test_save_ply_roundtrip(tmp_path):
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    valid = np.zeros(10, bool)
    valid[:4] = True
    n = save_ply(str(tmp_path / "a.ply"), pts, valid, color=(255, 0, 0))
    assert n == 4
    text = (tmp_path / "a.ply").read_text()
    assert "element vertex 4" in text
    assert text.strip().splitlines()[-1].endswith("255 0 0")


def test_trajectory_ply(tmp_path):
    poses = np.tile(np.eye(4), (5, 1, 1))
    poses[:, 0, 3] = np.arange(5)
    n = save_trajectory_ply(str(tmp_path / "traj.ply"), poses)
    assert n == 5
    assert "element edge 4" in (tmp_path / "traj.ply").read_text()


def test_export_frame_debug(tmp_path):
    export_frame_debug(str(tmp_path), 3,
                       raw_xyz=np.zeros((5, 3)),
                       edges_xyz=np.ones((2, 3)))
    d = tmp_path / "frame_000003"
    assert (d / "cloud.ply").exists() and (d / "edges.ply").exists()


def test_logging_configure(tmp_path, capsys):
    configure({"liodom_tpu.test": "DEBUG"}, logfile=str(tmp_path / "log.txt"))
    log = logging.getLogger("liodom_tpu.test")
    assert log.level == logging.DEBUG
    logging.getLogger("liodom_tpu").warning("hello")
    assert os.path.getsize(tmp_path / "log.txt") > 0


def test_mapping_service_entropy():
    import jax.numpy as jnp
    from liodom_tpu.core.config import MapConfig
    from liodom_tpu.core.pose import Pose
    from liodom_tpu.mapping.service import MappingService
    svc = MappingService(MapConfig(map_capacity=2048,
                                   local_map_capacity=512))
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-100, 100, (256, 3)).astype(np.float32))
    svc.update(pts, jnp.ones((256,), bool), Pose.identity())
    assert svc.entropy() > 0.0
