#!/usr/bin/env python
"""Pre-build AOT executable blobs for the production step programs.

Run once at container boot / deploy time; afterwards ``run_kitti --aot``
(and anything using ``runtime.aot.get_or_compile`` with the same tags)
reaches its first pose in seconds instead of minutes (measured 8.4 s vs
190.6 s on the tunneled v5e backend — scripts/warm_start_probe.py, recorded
in README).  Blobs land in ``.jax_cache/aot/`` keyed by
(program, jax version, backend, shapes); stale blobs are skipped at load
time and fall back to jit.

Programs built (the production set):
  * image_step  @ window 5   (bench / params.cc default)
  * image_step  @ window 15  (the deployed launch config, liodom.launch:23)
  * combined    @ window 15  (run_kitti --mapping defaults)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from liodom_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp

from liodom_tpu import LiodomConfig, MapConfig
from liodom_tpu.odometry import pipeline as P
from liodom_tpu.runtime import aot


def main():
    # ring width must match the deployed run exactly (AOT blobs are
    # shape-keyed): default to the lossless 4096 config default; run_kitti
    # auto-sizes from the first scan, so pass the same value it prints
    rw = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    ex_img = jnp.zeros((64, rw, 3), jnp.float32)
    ex_cnt = jnp.zeros((64,), jnp.int32)

    for window in (5, 15):
        cfg = LiodomConfig(local_map_size=window, ring_width=rw)
        state = P.init_state(cfg)
        t0 = time.perf_counter()
        aot.get_or_compile(
            "kitti_image_step",
            lambda s, x, c, cfg=cfg: P.image_step(s, x, c, cfg),
            (state, ex_img, ex_cnt), extra=str(cfg))
        print(f"image_step window={window}: "
              f"{time.perf_counter() - t0:.1f} s", flush=True)

    cfg = LiodomConfig(local_map_size=15, mapping=True, ring_width=rw)
    from liodom_tpu.mapping import init_combined
    from liodom_tpu.mapping.service import combined_image_step
    mcfg = MapConfig(voxel_xysize=40.0, voxel_zsize=50.0, resolution=0.4,
                     cells_xy=3, cells_z=2, local_map_capacity=65536)
    state, mstate = init_combined(cfg, mcfg)
    t0 = time.perf_counter()
    aot.get_or_compile(
        "kitti_combined",
        lambda s, m, x, c, i: combined_image_step(
            s, m, x, c, cfg, mcfg, step=i, local_map_every=1),
        (state, mstate, ex_img, ex_cnt, jnp.int32(0)),
        extra=f"{cfg}|{mcfg}|every=1")
    print(f"combined window=15: {time.perf_counter() - t0:.1f} s",
          flush=True)
    print(f"blobs in {aot.default_dir()}", flush=True)


if __name__ == "__main__":
    main()
