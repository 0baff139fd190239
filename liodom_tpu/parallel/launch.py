"""Multi-host launch: ``jax.distributed`` initialisation + mesh construction.

The reference's "multi-node" story is two OS processes on one machine bridged
by ROS topics (SURVEY.md §5 "distributed communication backend").  The TPU
equivalent is SPMD: every host runs this same program, connects to a
coordinator, and the engine's sharded step (parallel/sharded.py) runs over
the global device mesh with XLA collectives on ICI/DCN.

Usage (one command per host)::

    python -m liodom_tpu.parallel.launch \
        --coordinator 10.0.0.1:8476 --num-processes 4 --process-id $I \
        -- smoke

On a TPU pod slice the three flags can usually be omitted —
``jax.distributed.initialize()`` auto-detects from the TPU environment.
"""

from __future__ import annotations

import argparse
from typing import Optional, Tuple

import numpy as np

import jax


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the jax.distributed runtime (idempotent).

    Without an explicit ``coordinator``, auto-initialisation only works in a
    managed environment (TPU pod metadata, SLURM, ...); anywhere else JAX
    raises — in that case run single-process, which is exactly what a local
    smoke invocation wants."""
    kw = {}
    if coordinator is not None:
        kw = dict(coordinator_address=coordinator,
                  num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError as e:
        # tolerated single-process cases: already initialised, or the
        # backend was already touched (auto-init is then impossible but a
        # coordinator-less run is single-process anyway)
        if coordinator is not None:
            raise
        if "already" not in str(e) and "before" not in str(e):
            raise
    except ValueError:
        if coordinator is not None:
            raise
        # no coordinator and no cluster auto-detection: single process


def make_global_mesh(data: Optional[int] = None,
                     map_: Optional[int] = None) -> "jax.sharding.Mesh":
    """(data, map) mesh over ALL global devices.

    Defaults: 'map' spans the devices of one host (collectives ride ICI),
    'data' spans hosts (independent sequences, DCN-friendly — they never
    communicate)."""
    from jax.sharding import Mesh

    devices = np.array(jax.devices())
    n = len(devices)
    if data is None or map_ is None:
        per_host = max(1, jax.local_device_count())
        map_ = min(per_host, n)
        data = n // map_
    if data * map_ != n:
        raise ValueError(f"mesh {data}x{map_} != {n} devices")
    return Mesh(devices.reshape(data, map_), ("data", "map"))


def smoke(mesh) -> float:
    """Two sharded odometry steps on synthetic data; returns a checksum.
    Proves the mesh + collectives compile, execute AND track motion on this
    topology: the second frame is the first shifted by 0.2 m, so the solved
    pose must be non-zero (a zero checksum means a vacuous run)."""
    import jax.numpy as jnp
    from liodom_tpu.core.config import LiodomConfig
    from liodom_tpu.parallel.sharded import (init_batch_state,
                                             make_sharded_step)

    cfg = LiodomConfig(max_points=4096, ring_width=128, local_map_size=2,
                       scan_lines=16, scan_regions=4, edges_per_region=4)
    batch = mesh.shape["data"]
    state = init_batch_state(cfg, batch)
    step = make_sharded_step(mesh, cfg)
    rng = np.random.default_rng(0)
    # edge points sampled on vertical lines (poles): point-to-LINE residuals
    # need collinear neighbourhoods — uniform random points fail both the
    # 1 m 5-NN gate and the eigenvalue line test, solving nothing
    n_poles = 32
    per = cfg.max_edges // n_poles
    base = rng.uniform(-15, 15, (n_poles, 1, 2))
    z = rng.uniform(-2, 2, (n_poles, per, 1))
    pts = np.concatenate(
        [np.broadcast_to(base, (n_poles, per, 2)),
         z], axis=-1).reshape(-1, 3) + rng.normal(scale=0.01, size=(n_poles * per, 3))
    pad = cfg.max_edges - len(pts)
    exyz = jnp.asarray(np.pad(pts, ((0, pad), (0, 0))).astype(np.float32))
    exyz = jnp.broadcast_to(exyz, (batch,) + exyz.shape)
    evalid = jnp.broadcast_to(
        jnp.asarray(np.arange(cfg.max_edges) < len(pts)),
        (batch, cfg.max_edges))
    state, poses = step(state, exyz, evalid)           # seeds the window
    shift = jnp.asarray([0.2, 0.0, 0.0], exyz.dtype)
    state, poses = step(state, exyz - shift, evalid)   # solve: ~+0.2 m in x
    chk = float(jnp.sum(jnp.abs(poses.t)))
    if not np.isfinite(chk) or chk < 1e-3:
        raise RuntimeError(f"smoke solve did not move (checksum {chk})")
    return chk


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (omit on TPU pods)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--data", type=int, default=None, help="mesh data axis")
    ap.add_argument("--map", dest="map_", type=int, default=None,
                    help="mesh map axis")
    ap.add_argument("cmd", nargs="?", default="smoke", choices=["smoke"])
    args = ap.parse_args()

    initialize(args.coordinator, args.num_processes, args.process_id)
    mesh = make_global_mesh(args.data, args.map_)
    print(f"process {jax.process_index()}/{jax.process_count()}: "
          f"mesh={dict(mesh.shape)} devices={len(jax.devices())}")
    if args.cmd == "smoke":
        chk = smoke(mesh)
        print(f"smoke step OK, checksum={chk:.6f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
