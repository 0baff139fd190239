"""E2E smokes for the two apps without dedicated tests (VERDICT r2 weak #4):

* ``apps/run_ouster.py --synthetic`` — the Ouster-style organized-cloud
  entry (the reference's liodom_ouster.launch:19-33 deployment), asserting
  motion and the results-file contract;
* ``liodom_tpu/parallel/launch.py`` single-process smoke — the multi-host
  entry's mesh construction + sharded solve on the CPU test mesh.

Both previously relied on manual runs; a regression shipped silently.
"""

import os
import sys

import numpy as np

APPS = os.path.join(os.path.dirname(__file__), "..", "apps")


def _run_ouster(argv):
    sys.path.insert(0, APPS)
    import importlib
    import run_ouster
    importlib.reload(run_ouster)
    old = sys.argv
    sys.argv = ["run_ouster.py"] + argv
    try:
        return run_ouster.main()
    finally:
        sys.argv = old


def test_run_ouster_synthetic_e2e(tmp_path, capsys):
    res = tmp_path / "results"
    rc = _run_ouster(["--synthetic", "--frames", "4", "--width", "256",
                      "--local-map-size", "3", "--results-dir", str(res)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "scans/s" in out
    # trajectory moved (drive_trajectory speed=1.0 over 4 frames)
    poses = np.loadtxt(res / "poses.txt").reshape(-1, 3, 4)
    assert poses.shape[0] == 4
    assert np.isfinite(poses).all()
    assert np.linalg.norm(poses[-1, :, 3]) > 0.1, "odometry did not move"
    # the 5-file stats contract (stats.cc:97-131)
    for name in ("feat_ext_times.txt", "laser_odom_times.txt",
                 "nfeats.txt", "frame_times.txt"):
        assert (res / name).exists(), name
    nfeats = np.loadtxt(res / "nfeats.txt")
    assert (nfeats > 50).all(), "edge extraction collapsed"


def test_run_ouster_chunked_and_resume(tmp_path, capsys):
    """--chunk chained dispatch reproduces the per-frame trajectory, and a
    checkpoint written mid-run resumes to the same poses (production
    parity with run_kitti, VERDICT r4 #8)."""
    res1 = tmp_path / "r1"
    res2 = tmp_path / "r2"
    base = ["--synthetic", "--frames", "6", "--width", "256",
            "--local-map-size", "3"]
    assert _run_ouster(base + ["--results-dir", str(res1)]) == 0
    assert _run_ouster(base + ["--results-dir", str(res2),
                               "--chunk", "4"]) == 0
    p1 = np.loadtxt(res1 / "poses.txt").reshape(-1, 3, 4)
    p2 = np.loadtxt(res2 / "poses.txt").reshape(-1, 3, 4)
    assert len(p1) == len(p2) == 6
    np.testing.assert_allclose(p2[:, :, 3], p1[:, :, 3], atol=1e-4)

    ck = tmp_path / "ck"
    res3 = tmp_path / "r3"
    assert _run_ouster(base + ["--checkpoint-dir", str(ck),
                               "--checkpoint-every", "4"]) == 0
    from liodom_tpu.runtime import checkpoint as CK
    assert CK.latest_step(str(ck)) == 4
    assert _run_ouster(base + ["--checkpoint-dir", str(ck),
                               "--results-dir", str(res3)]) == 0
    p3 = np.loadtxt(res3 / "poses.txt").reshape(-1, 3, 4)
    assert len(p3) == 6
    np.testing.assert_allclose(p3[:, :, 3], p1[:, :, 3], atol=5e-3)


def test_run_ouster_checkpoint_unaligned_with_chunk(tmp_path, capsys):
    """Checkpoints must land when --checkpoint-every is NOT a multiple of
    --chunk: flushes only happen at chunk boundaries, so a modulo test
    never fires (regression: the old `(i+1) % every == 0` wrote ZERO
    checkpoints for e.g. chunk=4/every=5 — save at the first flush at/after
    each due point instead, like run_kitti's next_ck pattern)."""
    ck = tmp_path / "ck"
    base = ["--synthetic", "--frames", "6", "--width", "256",
            "--local-map-size", "3"]
    assert _run_ouster(base + ["--chunk", "4",
                               "--checkpoint-dir", str(ck),
                               "--checkpoint-every", "5"]) == 0
    from liodom_tpu.runtime import checkpoint as CK
    # due at frame 5; first flush at/after it is the final one (frame 6)
    assert CK.latest_step(str(ck)) == 6


def test_launch_single_process_smoke(monkeypatch, capsys):
    """`python -m liodom_tpu.parallel.launch -- smoke` on this host: no
    coordinator -> single process, mesh over all (virtual CPU) devices,
    sharded solve must move (launch.py raises on a vacuous checksum)."""
    from liodom_tpu.parallel import launch
    monkeypatch.setattr(sys, "argv", ["launch.py", "smoke"])
    rc = launch.main()
    assert rc == 0
    out = capsys.readouterr().out
    assert "smoke step OK" in out
    assert "mesh=" in out
