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


def combined_smoke(mesh) -> float:
    """The FLAGSHIP multi-chip program — the fully-sharded composed
    odometry+mapping step (parallel/combined.py: ring-sliced features,
    per-shard window ownership, sharded kNN + psum'd LM, shard-local map
    insert and feedback) — on this mesh topology, with per-process parity
    against the single-device fused dataflow.  Returns a checksum every
    process must agree on (SPMD).

    This is the DCN-path coverage of the reference's actual two-process
    deployment (launch/liodom.launch:39-57): run it under a 2-process
    ``jax.distributed`` coordinator (tests/test_distributed_two_process.py)
    and the mapper<->odometer loop executes across process boundaries."""
    import jax.numpy as jnp
    from liodom_tpu.core.config import LiodomConfig, MapConfig
    from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
    from liodom_tpu.mapping.service import combined_image_step, init_combined
    from liodom_tpu.parallel import combined as CB
    from liodom_tpu.runtime import native

    batch, n_map = mesh.shape["data"], mesh.shape["map"]
    n_dev = batch * n_map
    cfg = LiodomConfig(max_points=16384, ring_width=256, local_map_size=3,
                       mapping=True)
    # sized so NO local-map truncation occurs: under truncation the mono
    # path keeps row-order hits while shards keep their own cells, and the
    # matched point SETS legitimately diverge (__graft_entry__ note)
    mcfg = MapConfig(map_capacity=1024 * n_dev,
                     local_map_capacity=(2048 // n_map) * n_map)

    world = BoxWorld(seed=0)
    n_frames = 3
    pos, yaws = drive_trajectory(n_frames, speed=0.8, yaw_rate=0.02)
    frames = []
    for f in range(n_frames):
        scan = world.render(pos[f], yaw_matrix(yaws[f]), width=256,
                            noise=0.005, seed=f)
        img, counts, _ = native.split_velodyne_np(
            scan.astype(np.float32), cfg.scan_lines, cfg.ring_width,
            cfg.min_range, cfg.max_range)
        frames.append((img, counts))

    step = CB.make_sharded_combined_image_step(mesh, cfg, mcfg)
    st, ms = CB.init_combined_image_sharded(cfg, mcfg, mesh)
    for img, counts in frames:
        bx = jnp.broadcast_to(jnp.asarray(img, jnp.float32),
                              (batch,) + img.shape)
        bc = jnp.broadcast_to(jnp.asarray(counts, jnp.int32),
                              (batch,) + counts.shape)
        st, ms, cpose = step(st, ms, bx, bc)
    # this process's data row (every row carries the same sequence)
    t_sharded = np.asarray(
        jax.tree.map(lambda x: x.addressable_data(0), cpose).t).reshape(3)

    # per-process parity: the single-device fused combined dataflow on the
    # same frames (mapping.service.combined_image_step)
    co, cm = init_combined(cfg, mcfg)
    for img, counts in frames:
        co, cm, p1, _ = combined_image_step(
            co, cm, jnp.asarray(img, jnp.float32),
            jnp.asarray(counts, jnp.int32), cfg, mcfg)
    t_mono = np.asarray(p1.t)
    err = float(np.linalg.norm(t_sharded - t_mono))
    if not np.isfinite(t_sharded).all():
        raise RuntimeError(f"composed pose not finite: {t_sharded}")
    if np.linalg.norm(t_sharded) < 0.3:
        raise RuntimeError(f"composed pose did not move: {t_sharded}")
    if err > 5e-3:
        raise RuntimeError(
            f"sharded combined diverged from single-device: {err} m")
    return float(np.sum(np.abs(t_sharded)))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (omit on TPU pods)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--data", type=int, default=None, help="mesh data axis")
    ap.add_argument("--map", dest="map_", type=int, default=None,
                    help="mesh map axis")
    ap.add_argument("cmd", nargs="?", default="smoke",
                    choices=["smoke", "combined-smoke"])
    args = ap.parse_args()

    initialize(args.coordinator, args.num_processes, args.process_id)
    mesh = make_global_mesh(args.data, args.map_)
    print(f"process {jax.process_index()}/{jax.process_count()}: "
          f"mesh={dict(mesh.shape)} devices={len(jax.devices())}")
    if args.cmd == "smoke":
        chk = smoke(mesh)
        print(f"smoke step OK, checksum={chk:.6f}")
    elif args.cmd == "combined-smoke":
        chk = combined_smoke(mesh)
        print(f"combined smoke OK, checksum={chk:.6f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
