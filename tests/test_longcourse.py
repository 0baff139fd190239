"""Long-course gate (VERDICT r4 #3): the streaming-world full stack holds
its loss accounting and a bounded drift rate over a trajectory that the
finite BoxWorld could not sustain.

The REAL trajectory-scale run is apps/run_longcourse.py --frames 1000 on
the TPU (README long-course table); this gate pins the contract at CPU
scale: zero uncounted loss (ring clamp, map overflow, local-map
truncation all zero or counted) and drift within the engine's measured
synthetic-course envelope.
"""

import importlib
import json
import os
import sys

import pytest

APPS = os.path.join(os.path.dirname(__file__), "..", "apps")


def _run(argv, capsys):
    sys.path.insert(0, APPS)
    import run_longcourse
    importlib.reload(run_longcourse)
    old = sys.argv
    sys.argv = ["run_longcourse.py"] + argv
    try:
        rc = run_longcourse.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    summary = json.loads([l for l in out.splitlines()
                          if l.startswith("{")][-1])
    return rc, summary


def test_streamworld_keepout_clears_the_course():
    """set_keepout drops tile objects within clearance of the trajectory —
    the vehicle never drives through a building/pole (see-through-wall
    frames are physically inconsistent)."""
    import numpy as np
    from liodom_tpu.core.synth import StreamWorld, drive_trajectory

    pos, _ = drive_trajectory(300, speed=1.2, yaw_rate=0.004)
    w = StreamWorld(seed=0)
    w.set_keepout(pos[:, :2], clearance=3.0)
    poles, boxes = w._gather(pos[150])
    if len(poles):
        d = np.linalg.norm(poles[:, None, :2] - pos[None, :, :2], axis=-1)
        assert (d.min(axis=1) > 3.0).all(), "pole inside the corridor"
    for b in boxes:
        inside = ((pos[:, 0] >= b[0] - 3.0) & (pos[:, 0] <= b[1] + 3.0)
                  & (pos[:, 1] >= b[2] - 3.0) & (pos[:, 1] <= b[3] + 3.0))
        assert not inside.any(), "building overlaps the corridor"
    # determinism with the same keepout
    w2 = StreamWorld(seed=0)
    w2.set_keepout(pos[:, :2], clearance=3.0)
    p2, b2 = w2._gather(pos[150])
    assert np.array_equal(poles, p2) and np.array_equal(boxes, b2)


def test_streamworld_tile_cache_thread_safe():
    """Render workers share one StreamWorld (run_longcourse/run_stream
    thread pools); past 4096 cached tiles the bounded-cache eviction must
    not race concurrent inserts/reads (regression: unlocked dict eviction
    raised 'dictionary changed size during iteration' / KeyError on long
    multi-worker courses)."""
    import threading

    import numpy as np
    from liodom_tpu.core.synth import StreamWorld

    w = StreamWorld(seed=0)
    errors = []

    def worker(base):
        try:
            # 4 workers x 1500 tiles = 6000 distinct tiles > the 4096 bound,
            # with an overlapping band so reads race evictions
            for k in range(1500):
                w._tile_objects(base + k, 0)
                if k % 7 == 0:
                    w._tile_objects(k % 100, 1)   # shared hot band
        except Exception as e:          # noqa: BLE001 — recorded for assert
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(1000 * t,))
               for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    # determinism survives eviction: regenerated tiles equal a fresh world's
    w2 = StreamWorld(seed=0)
    p1, b1 = w._tile_objects(3, 0)
    p2, b2 = w2._tile_objects(3, 0)
    assert np.array_equal(p1, p2) and np.array_equal(b1, b2)


@pytest.mark.slow
def test_longcourse_stream_no_uncounted_loss_bounded_drift(capsys):
    rc, s = _run([
        "--frames", "30", "--width", "1000", "--ring-width", "2048",
        "--local-map-size", "3", "--map-capacity", "65536",
        "--local-map-capacity", "8192", "--sample-every", "15",
        "--json"], capsys)
    assert rc == 0, s                      # rc gates overflow/truncation
    assert s["ring_dropped"] == 0, s       # lossless ring width
    assert s["map_overflow"] == 0, s
    assert s["local_map_truncation"] == 0, s
    assert s["map_leaves"] > 10000, s      # the map really grew
    # drift bounded: the engine's synthetic-course envelope (BoxWorld
    # full-stack measures RPE@1 ~0.09 m on TPU; CPU small-width course
    # runs looser but must stay an order below the 1.2 m/frame motion)
    assert s["rpe1_m"] < 0.4, s
    assert s["ate_m"] < 4.0, s


@pytest.mark.slow
def test_longcourse_chunk_remainder_matches_per_frame(capsys):
    """--chunk with frames % chunk != 0 routes the tail through the
    per-frame step (a K'-sized chained trace would recompile the heaviest
    program for a one-off chunk) and the trajectory matches the unchunked
    run — every frame, including the remainder, must be stepped."""
    base = ["--frames", "5", "--width", "600", "--ring-width", "1280",
            "--local-map-size", "3", "--map-capacity", "65536",
            "--local-map-capacity", "8192", "--sample-every", "5",
            "--json"]
    rc, s_pf = _run(base, capsys)
    assert rc == 0
    rc, s_ch = _run(base + ["--chunk", "3"], capsys)   # remainder of 2
    assert rc == 0
    assert s_ch["frames"] == s_pf["frames"] == 5
    assert abs(s_ch["ate_m"] - s_pf["ate_m"]) < 5e-3, (s_ch, s_pf)
    assert s_ch["map_leaves"] == s_pf["map_leaves"], (s_ch, s_pf)


@pytest.mark.slow
def test_longcourse_checkpoint_resume(tmp_path, capsys):
    """A long course interrupted mid-run resumes from the checkpoint (odom
    + MAP state + trajectory) and lands near the uninterrupted run."""
    base = ["--frames", "10", "--width", "600", "--ring-width", "1280",
            "--local-map-size", "3", "--map-capacity", "65536",
            "--local-map-capacity", "8192", "--sample-every", "10",
            "--json"]
    rc, s_full = _run(base, capsys)
    assert rc == 0

    ck = str(tmp_path / "ck")
    rc, s_a = _run(base[:4] + ["--frames", "6"] + base[4:]
                   + ["--checkpoint-dir", ck, "--checkpoint-every", "6"],
                   capsys)
    assert rc == 0
    from liodom_tpu.runtime import checkpoint as CK
    assert CK.latest_step(ck) == 6
    rc, s_b = _run(base + ["--checkpoint-dir", ck,
                           "--checkpoint-every", "100"], capsys)
    assert rc == 0
    # resumed run covers all 10 frames and matches the uninterrupted ATE
    # closely (float32 state round-trips bit-exact through orbax)
    assert abs(s_b["ate_m"] - s_full["ate_m"]) < 5e-3, (s_b, s_full)
    assert s_b["map_leaves"] == s_full["map_leaves"], (s_b, s_full)
