"""Host runtime tests: channels, latest-value slots, rate watchdog, and a
smoke run of the KITTI app on a synthetic mini-sequence."""

import subprocess
import sys
import threading
import os

import numpy as np
import pytest

from liodom_tpu.runtime.channels import (Channel, Closed, FrequencyMonitor,
                                         LatestValue)


def test_channel_fifo_and_backpressure():
    ch = Channel(maxsize=2)
    ch.push(1)
    ch.push(2)
    assert not ch.push(3, timeout=0.05)       # full -> timed out
    assert ch.pop() == 1
    assert ch.push(3, timeout=0.05)
    assert ch.pop() == 2 and ch.pop() == 3
    with pytest.raises(TimeoutError):
        ch.pop(timeout=0.05)


def test_channel_threaded_producer_consumer():
    ch = Channel(maxsize=4)
    got = []

    def consumer():
        while True:
            try:
                got.append(ch.pop())
            except Closed:
                return

    t = threading.Thread(target=consumer)
    t.start()
    for i in range(100):
        ch.push(i)
    ch.close()
    t.join(timeout=5)
    assert got == list(range(100))


def test_channel_close_unblocks():
    ch = Channel(maxsize=1)
    errs = []

    def popper():
        try:
            ch.pop()
        except Closed as e:
            errs.append(e)

    t = threading.Thread(target=popper)
    t.start()
    ch.close()
    t.join(timeout=5)
    assert len(errs) == 1
    with pytest.raises(Closed):
        ch.push(1)


def test_latest_value():
    lv = LatestValue()
    assert lv.get() is None
    lv.set(5)
    lv.set(7)
    assert lv.get() == 7
    assert lv.take() == 7
    assert lv.get() is None


def test_frequency_monitor_warns_when_lagging():
    fm = FrequencyMonitor()
    # inputs at 10 Hz, outputs at 5 Hz -> should warn once averages settle
    warned = False
    for k in range(20):
        fm.tick_input(t=k * 0.1)
    for k in range(20):
        w = fm.tick_output(t=k * 0.2)
        warned = warned or (w is not None)
    assert warned
    assert fm.input_hz() == pytest.approx(10.0, rel=0.01)
    assert fm.output_hz() == pytest.approx(5.0, rel=0.01)


def test_frequency_monitor_quiet_at_rate():
    fm = FrequencyMonitor()
    for k in range(20):
        fm.tick_input(t=k * 0.1)
        assert fm.tick_output(t=k * 0.1 + 0.02) is None


@pytest.mark.slow
def test_run_kitti_app_smoke(tmp_path):
    """End-to-end: synthetic world rendered into KITTI .bin layout, the app
    must track it and print a finite ATE."""
    from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix

    world = BoxWorld(seed=0, extent=40.0, n_poles=30)
    nf = 5
    pos, yaws = drive_trajectory(nf, speed=0.8, yaw_rate=0.01)
    velo = tmp_path / "sequences" / "07" / "velodyne"
    velo.mkdir(parents=True)
    gt = np.tile(np.eye(4), (nf, 1, 1))
    for i in range(nf):
        pts = world.render(pos[i], yaw_matrix(yaws[i]), width=512,
                           noise=0.0, seed=i)
        rec = np.concatenate(
            [pts, np.zeros((len(pts), 1), np.float32)], axis=1)
        rec.astype(np.float32).tofile(velo / f"{i:06d}.bin")
        gt[i, :3, :3] = yaw_matrix(yaws[i])
        gt[i, :3, 3] = pos[i]
    with open(tmp_path / "sequences" / "07" / "calib.txt", "w") as f:
        f.write("Tr: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    (tmp_path / "poses").mkdir()
    np.savetxt(tmp_path / "poses" / "07.txt", gt[:, :3, :].reshape(nf, 12))

    out_dir = tmp_path / "results"
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "apps", "run_kitti.py"),
         "--root", str(tmp_path), "--seq", "07", "--local-map-size", "3",
         "--results-dir", str(out_dir)],
        capture_output=True, text=True, env=env, timeout=500)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ATE" in r.stdout
    poses = np.loadtxt(out_dir / "poses.txt")
    assert poses.shape == (nf, 12)
    assert np.isfinite(poses).all()
