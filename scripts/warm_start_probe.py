#!/usr/bin/env python
"""Cold-start mitigation experiments (VERDICT r3 #7).

Round-3 decomposition of a warm-container first pose: ~2 s trace/lower,
~12.5 s persistent-cache hit (deserialize + backend load), 30-67 s FIRST
execution — the tunneled backend uploads the program to the chip lazily at
first run.  This script measures three candidate mitigations, each in a
fresh subprocess (so no in-process caches bleed between phases):

  baseline  enable_persistent_cache() (the shipped path): time from process
            start to the first fetched pose.
  aot       jax.experimental.serialize_executable: serialize the COMPILED
            image_step executable to disk in a parent run, then time a fresh
            process that deserializes and runs it — does skipping
            trace+lower+cache-lookup beat the persistent cache?
  overlap   dispatch a dummy warmup step (async) the moment the program is
            compiled, do the loader's host work (render + native ring
            split) while the backend uploads, then run the real first
            frame — does the lazy upload overlap host work?

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/warm_start_probe.py
Results are recorded in the README cold-start row.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r'''
import os, sys, time, pickle
t_start = time.perf_counter()
sys.path.insert(0, os.environ["LIODOM_REPO"])
from liodom_tpu.runtime.cache import enable_persistent_cache
enable_persistent_cache()
import numpy as np
import jax, jax.numpy as jnp
from liodom_tpu import LiodomConfig
from liodom_tpu.core.synth import BoxWorld, yaw_matrix
from liodom_tpu.odometry import pipeline as P
from liodom_tpu.runtime import native

mode = os.environ["PHASE"]
cfg = LiodomConfig(local_map_size=5, ring_width=2048)
t_import = time.perf_counter()

def host_loader_work():
    world = BoxWorld(seed=0)
    scan = world.render(np.zeros(3), yaw_matrix(0.0), width=1800,
                        noise=0.01, seed=0)
    img, counts, _ = native.split_velodyne(
        scan.astype(np.float32), cfg.scan_lines, cfg.ring_width,
        cfg.min_range, cfg.max_range)
    return jnp.asarray(img), jnp.asarray(counts)

state = P.init_state(cfg)
if mode == "baseline":
    img, counts = host_loader_work()
    t_data = time.perf_counter()
    state, pose, _ = P.image_step(state, img, counts, cfg)
    np.asarray(pose.t)
    t_pose = time.perf_counter()
    print(json.dumps({"phase": mode,
                      "import_s": round(t_import - t_start, 1),
                      "data_s": round(t_data - t_import, 1),
                      "first_pose_s": round(t_pose - t_data, 1),
                      "total_s": round(t_pose - t_start, 1)}))
elif mode == "aot_save":
    from jax.experimental import serialize_executable as SE
    img, counts = host_loader_work()
    lowered = jax.jit(
        lambda s, x, c: P.image_step(s, x, c, cfg)).lower(state, img, counts)
    compiled = lowered.compile()
    blob = SE.serialize(compiled)
    with open(os.environ["AOT_PATH"], "wb") as f:
        pickle.dump(blob, f)
    print(json.dumps({"phase": mode, "bytes": os.path.getsize(
        os.environ["AOT_PATH"])}))
elif mode == "aot_load":
    from jax.experimental import serialize_executable as SE
    with open(os.environ["AOT_PATH"], "rb") as f:
        blob = pickle.load(f)
    t_blob = time.perf_counter()
    compiled = SE.deserialize_and_load(*blob)
    t_deser = time.perf_counter()
    img, counts = host_loader_work()
    t_data = time.perf_counter()
    out = compiled(state, img, counts)
    np.asarray(out[1].t)
    t_pose = time.perf_counter()
    print(json.dumps({"phase": mode,
                      "import_s": round(t_blob - t_start, 1),
                      "deserialize_s": round(t_deser - t_blob, 1),
                      "data_s": round(t_data - t_deser, 1),
                      "first_exec_s": round(t_pose - t_data, 1),
                      "total_s": round(t_pose - t_start, 1)}))
elif mode == "overlap":
    # dispatch the warmup on ZERO inputs immediately (async — jax returns
    # before execution), then do the loader host work while the backend
    # uploads the program, then run the real frame
    z_img = jnp.zeros((cfg.scan_lines, cfg.ring_width, 3), jnp.float32)
    z_cnt = jnp.zeros((cfg.scan_lines,), jnp.int32)
    t0 = time.perf_counter()
    wstate, wpose, _ = P.image_step(state, z_img, z_cnt, cfg)
    t_dispatch = time.perf_counter()
    img, counts = host_loader_work()
    t_data = time.perf_counter()
    state, pose, _ = P.image_step(state, img, counts, cfg)
    np.asarray(pose.t)
    t_pose = time.perf_counter()
    print(json.dumps({"phase": mode,
                      "import_s": round(t0 - t_start, 1),
                      "dispatch_s": round(t_dispatch - t0, 1),
                      "loader_s": round(t_data - t_dispatch, 1),
                      "first_pose_after_loader_s": round(t_pose - t_data, 1),
                      "total_s": round(t_pose - t_start, 1)}))
'''


def run_phase(phase, extra_env=None):
    env = dict(os.environ)
    env["LIODOM_REPO"] = REPO
    env["PHASE"] = phase
    env["AOT_PATH"] = "/tmp/liodom_aot_image_step.pkl"
    if extra_env:
        env.update(extra_env)
    p = subprocess.run([sys.executable, "-c",
                        "import json\n" + CHILD],
                       env=env, capture_output=True, text=True, timeout=900)
    for line in p.stdout.splitlines():
        if line.startswith("{"):
            print(line, flush=True)
    if p.returncode != 0:
        print(json.dumps({"phase": phase, "error": p.stderr[-600:]}),
              flush=True)


if __name__ == "__main__":
    run_phase("baseline")
    run_phase("aot_save")
    run_phase("aot_load")
    run_phase("overlap")
