"""Live-stream deployment shape (apps/run_stream.py): paced ingest through
the bounded drop-oldest channel, watchdog under lag, mapper feedback through
LatestValue — the reference's actual runtime (liodom_node.cc:40-55, :98-103;
laser_odometry.cc:253-256) exercised end-to-end.

These tests pin the ACCOUNTING contract: every sensor frame is processed,
still queued, or counted dropped — loss under lag is deployment policy
(queue size 1), never silent.
"""

import importlib
import json
import os
import sys

import numpy as np

APPS = os.path.join(os.path.dirname(__file__), "..", "apps")


def _run(argv, capsys):
    sys.path.insert(0, APPS)
    import run_stream
    importlib.reload(run_stream)
    old = sys.argv
    sys.argv = ["run_stream.py"] + argv
    try:
        rc = run_stream.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    summary = json.loads([l for l in out.splitlines()
                          if l.startswith("{")][-1])
    return rc, summary, out


def test_overload_drops_counted_and_watchdog_fires(capsys):
    """Sensor paced far above engine rate: drop-oldest evicts frames, every
    eviction is counted, and the 0.8x watchdog warns."""
    rc, s, out = _run([
        "--frames", "15", "--rate", "100", "--width", "400",
        "--ring-width", "512", "--engine-delay", "0.2", "--json"], capsys)
    assert rc == 0
    assert s["accounted"] == 15, s          # nothing lost uncounted
    assert s["dropped"] > 0, s              # overload really dropped frames
    assert s["processed"] >= 1, s
    assert s["warn_count"] >= 1, s          # watchdog fired
    assert s["output_hz"] < 0.8 * s["input_hz"], s


def test_paced_keepup_no_drops(capsys):
    """Sensor paced below the engine rate: every frame processed, no drops,
    no watchdog warnings, and the trajectory tracks ground truth."""
    rc, s, out = _run([
        "--frames", "6", "--rate", "0.5", "--width", "400",
        "--ring-width", "512", "--world", "box", "--local-map-size", "3",
        "--json"], capsys)
    assert rc == 0
    assert s["processed"] == 6, s
    assert s["dropped"] == 0, s
    assert s["ate_m"] is not None and s["ate_m"] < 1.5, s


def test_stream_kitti_layout(tmp_path, capsys):
    """--root: the rosbag-replay deployment over a KITTI-layout sequence
    (synthesized), paced through the same channel machinery with GT ATE."""
    from test_run_kitti_e2e import _make_kitti
    _make_kitti(tmp_path, n_scans=6, width=400)
    rc, s, out = _run([
        "--root", str(tmp_path), "--seq", "00", "--frames", "6",
        "--rate", "0.5", "--ring-width", "512", "--local-map-size", "3",
        "--json"], capsys)
    assert rc == 0
    assert s["accounted"] == 6, s
    assert s["processed"] == 6, s
    assert s["ate_m"] is not None and s["ate_m"] < 1.5, s


def test_mapping_feedback_loop(capsys):
    """Mapper thread folds solved frames and publishes the local map back;
    overflow counters stay zero at test scale."""
    rc, s, out = _run([
        "--frames", "8", "--rate", "0.5", "--width", "400",
        "--ring-width", "512", "--world", "box", "--mapping",
        "--local-map-size", "3", "--local-map-every", "2",
        "--map-capacity", "65536", "--local-map-capacity", "4096",
        "--json"], capsys)
    assert rc == 0
    assert s["accounted"] == 8, s
    assert s["mapper_processed"] >= 1, s    # the feedback loop really ran
    assert s["map_overflow"] == 0, s
