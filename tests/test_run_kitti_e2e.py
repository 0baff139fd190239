"""End-to-end KITTI-layout run of apps/run_kitti.py on a synthetic sequence:
results files, checkpoint/resume, viz export, and a sane trajectory."""

import os
import sys

import numpy as np
import pytest

APPS = os.path.join(os.path.dirname(__file__), "..", "apps")


def _make_kitti(tmp_path, n_scans=6, width=500):
    from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
    seq_dir = tmp_path / "sequences" / "00"
    velo = seq_dir / "velodyne"
    velo.mkdir(parents=True)
    world = BoxWorld(seed=0)
    pos, yaws = drive_trajectory(n_scans, speed=1.0, yaw_rate=0.01)
    Tr = np.eye(4)[:3]
    gt = np.tile(np.eye(4), (n_scans, 1, 1))
    for i in range(n_scans):
        pts = world.render(pos[i], yaw_matrix(yaws[i]), width=width,
                           noise=0.005, seed=i)
        rec = np.zeros((len(pts), 4), np.float32)
        rec[:, :3] = pts
        rec.tofile(str(velo / f"{i:06d}.bin"))
        gt[i, :3, :3] = yaw_matrix(yaws[i])
        gt[i, :3, 3] = pos[i]
    np.savetxt(seq_dir / "times.txt", np.arange(n_scans) * 0.1)
    with open(seq_dir / "calib.txt", "w") as f:
        f.write("Tr: " + " ".join(str(v) for v in Tr.reshape(-1)) + "\n")
    poses_dir = tmp_path / "poses"
    poses_dir.mkdir()
    np.savetxt(poses_dir / "00.txt", gt[:, :3, :].reshape(n_scans, 12))
    return pos


def _run(argv):
    sys.path.insert(0, APPS)
    import importlib
    import run_kitti
    importlib.reload(run_kitti)
    old = sys.argv
    sys.argv = ["run_kitti.py"] + argv
    try:
        return run_kitti.main()
    finally:
        sys.argv = old


def test_run_and_resume(tmp_path):
    pos = _make_kitti(tmp_path)
    res = tmp_path / "results"
    ck = tmp_path / "ck"
    viz = tmp_path / "viz"
    rc = _run(["--root", str(tmp_path), "--seq", "00",
               "--local-map-size", "3", "--ring-width", "512",
               "--results-dir", str(res),
               "--checkpoint-dir", str(ck), "--checkpoint-every", "4",
               "--export-viz", str(viz)])
    assert rc == 0
    est = np.loadtxt(res / "poses.txt").reshape(-1, 3, 4)
    assert len(est) == 6
    # trajectory tracks ground truth loosely (synthetic, few frames)
    err = np.linalg.norm(est[:, :3, 3] - pos, axis=1)
    assert err.max() < 1.0, err
    # laser_odom_times self-describes measured vs carried rows: a header
    # comment + a 0/1 second column, single-column loadtxt still works
    lot_lines = (res / "laser_odom_times.txt").read_text().splitlines()
    assert lot_lines[0].startswith("#") and "measured" in lot_lines[0]
    lot = np.loadtxt(res / "laser_odom_times.txt")
    assert lot.ndim == 2 and lot.shape[1] == 2
    assert set(np.unique(lot[:, 1])) <= {0.0, 1.0}
    assert lot[:, 1].max() == 1.0   # at least one real sample in the run
    assert (res / "nfeats.txt").exists()
    assert (viz / "trajectory.ply").exists()

    # a checkpoint was written at frame 4; resuming must skip those frames
    from liodom_tpu.runtime import checkpoint as CK
    assert CK.latest_step(str(ck)) == 4
    res2 = tmp_path / "results2"
    rc = _run(["--root", str(tmp_path), "--seq", "00",
               "--local-map-size", "3", "--ring-width", "512",
               "--results-dir", str(res2),
               "--checkpoint-dir", str(ck)])
    assert rc == 0
    est2 = np.loadtxt(res2 / "poses.txt").reshape(-1, 3, 4)
    assert len(est2) == 6
    np.testing.assert_allclose(est2[:, :3, 3], est[:, :3, 3], atol=5e-3)


def test_run_chunked_matches_per_frame(tmp_path):
    """--chunk K (chained lax.scan dispatch) reproduces the per-frame
    trajectory, including the remainder-tail fallback (6 frames, chunk 4 ->
    one chained dispatch + 2 per-frame steps)."""
    _make_kitti(tmp_path)
    res1 = tmp_path / "res_frame"
    res2 = tmp_path / "res_chunk"
    base = ["--root", str(tmp_path), "--seq", "00",
            "--local-map-size", "3", "--ring-width", "512"]
    assert _run(base + ["--results-dir", str(res1)]) == 0
    assert _run(base + ["--results-dir", str(res2), "--chunk", "4"]) == 0
    est1 = np.loadtxt(res1 / "poses.txt").reshape(-1, 3, 4)
    est2 = np.loadtxt(res2 / "poses.txt").reshape(-1, 3, 4)
    assert len(est2) == len(est1) == 6
    np.testing.assert_allclose(est2[:, :3, 3], est1[:, :3, 3], atol=1e-4)


def test_run_mapping_standalone(tmp_path):
    """apps/run_mapping.py: the second-process equivalent — build a map from
    edges + a poses.txt trajectory, export PLYs, report entropy."""
    _make_kitti(tmp_path, n_scans=4)
    # ground-truth trajectory as the poses input (velodyne frame == cam0
    # here: calib Tr = identity)
    poses = np.loadtxt(tmp_path / "poses" / "00.txt")
    ptxt = tmp_path / "poses_in.txt"
    np.savetxt(ptxt, poses)
    out = tmp_path / "map_out"

    sys.path.insert(0, APPS)
    import importlib
    import run_mapping
    importlib.reload(run_mapping)
    old = sys.argv
    sys.argv = ["run_mapping.py", "--root", str(tmp_path), "--seq", "00",
                "--poses", str(ptxt), "--out", str(out),
                "--ring-width", "512"]
    try:
        rc = run_mapping.main()
    finally:
        sys.argv = old
    assert rc == 0
    assert (out / "map.ply").exists()
    assert (out / "map_local.ply").exists()
    head = (out / "map.ply").read_text().splitlines()[:4]
    n_pts = int([l for l in head if l.startswith("element vertex")][0]
                .split()[-1])
    assert n_pts > 100
