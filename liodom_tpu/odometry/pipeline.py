"""The odometry engine: one fully-jitted per-frame step.

Re-design of ``LaserOdometer::operator()`` (laser_odometry.cc:100-272).  The
reference is a poll loop over mutex queues calling PCL/Ceres; here the whole
per-frame computation — local-map assembly, constant-velocity prediction,
optional IMU roll/pitch override, 2x (re-associate -> LM solve), window
update — is ONE compiled XLA program over fixed-shape arrays.  The host loop
only feeds scans and reads poses.

First-frame behaviour falls out naturally: an empty window yields zero
correspondences, the solver holds the (identity) prediction, and the frame's
edges seed the window — the same observable behaviour as the reference's
explicit init branch (laser_odometry.cc:108-137).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from liodom_tpu.core import pose as se3
from liodom_tpu.core.config import LiodomConfig
from liodom_tpu.core.frame import EdgeCloud
from liodom_tpu.core.pose import Pose
from liodom_tpu.odometry import local_map
from liodom_tpu.ops.neighbors import line_correspondences
from liodom_tpu.ops.solver import lm_solve
from liodom_tpu.ops.voxel import voxel_downsample


class OdomState(NamedTuple):
    window: local_map.WindowState
    odom: Pose        # latest pose (laser frame, like the reference's odom_)
    prev_odom: Pose   # previous frame's pose
    # Latest local map received from the mapping service (adaptive local
    # mapping feedback, liodom_node.cc:57-64). Zero-masked when absent.
    received_xyz: jax.Array    # (Mr, 3)
    received_valid: jax.Array  # (Mr,)
    # Latest IMU orientation (base frame), wxyz. Identity when unused.
    imu_ori: jax.Array         # (4,)


def init_state(cfg: LiodomConfig, received_capacity: int = 0) -> OdomState:
    dtype = jnp.dtype(cfg.dtype)
    mr = received_capacity if cfg.mapping else 0
    return OdomState(
        local_map.WindowState.create(cfg.local_map_size, cfg.max_edges, dtype),
        Pose.identity(dtype),
        Pose.identity(dtype),
        jnp.zeros((mr, 3), dtype),
        jnp.zeros((mr,), bool),
        jnp.array([1.0, 0.0, 0.0, 0.0], dtype),
    )


def set_imu(state: OdomState, quat_wxyz: jax.Array) -> OdomState:
    """Record the latest IMU orientation (SharedData::setLastIMUOri,
    shared_data.cc:107-112; consumed when cfg.use_imu)."""
    return state._replace(imu_ori=jnp.asarray(quat_wxyz,
                                              state.imu_ori.dtype))


def set_received_map(state: OdomState, xyz: jax.Array,
                     valid: jax.Array) -> OdomState:
    """Record the latest local map received from the mapping service
    (SharedData::setLocalMap, shared_data.cc:91-105; merged into the
    matching map when cfg.mapping)."""
    return state._replace(received_xyz=jnp.asarray(xyz, state.odom.t.dtype),
                          received_valid=jnp.asarray(valid, bool))


def _matching_map(state: OdomState, cfg: LiodomConfig) -> Tuple[jax.Array, jax.Array]:
    """computeLocalMap + map merge (laser_odometry.cc:274-298, 310-314):
    the generated window cloud (optionally 0.4 m voxel-filtered once the
    window is full) plus, when mapping, the received map cells."""
    gen_xyz, gen_valid = local_map.flatten(state.window)
    if cfg.filter_local_map and not cfg.mapping:
        full = state.window.nframes == cfg.local_map_size

        def filt(args):
            x, v = args
            return voxel_downsample(x, v, cfg.local_map_voxel)

        gen_xyz, gen_valid = jax.lax.cond(
            full, filt, lambda a: a, (gen_xyz, gen_valid))
    if cfg.mapping and state.received_xyz.shape[0] > 0:
        gen_xyz = jnp.concatenate([gen_xyz, state.received_xyz], axis=0)
        gen_valid = jnp.concatenate([gen_valid, state.received_valid], axis=0)
    return gen_xyz, gen_valid


def _imu_override(pose: Pose, imu_ori: jax.Array, t_laser_base: Pose) -> Pose:
    """Overwrite predicted roll/pitch with the IMU's, keeping yaw
    (laser_odometry.cc:152-183).  ``t_laser_base`` is the laser->base
    transform the reference caches at init (getBaseToLaserTf)."""
    imu_rpy = se3.rpy_from_quat(imu_ori)
    odom_bl = se3.compose(pose, t_laser_base)
    rpy = se3.rpy_from_quat(odom_bl.q)
    new_rpy = jnp.stack([imu_rpy[0], imu_rpy[1], rpy[2]])
    q_new = se3.quat_from_rpy(new_rpy)
    odom_bl = Pose(q_new, odom_bl.t)
    return se3.compose(odom_bl, se3.inverse(t_laser_base))


@partial(jax.jit, static_argnames=("cfg",))
def odometry_step(state: OdomState, edges: EdgeCloud, cfg: LiodomConfig,
                  t_laser_base: Optional[Pose] = None,
                  ) -> Tuple[OdomState, Pose]:
    """Process one feature frame; returns (new_state, pose).

    Mirrors the steady-state branch of LaserOdometer::operator()
    (laser_odometry.cc:138-267) with the solve loop of :196-228."""
    # Front-compact the edge cloud (stable; point set unchanged): edge slots
    # arrive ring-scattered and mostly empty, and a packed layout lets the
    # Pallas kNN skip all-padding query tiles (ops/knn_pallas.py).
    eorder = jnp.argsort(~edges.valid, stable=True)
    evalid = edges.valid[eorder]
    edges = EdgeCloud(
        jnp.where(evalid[:, None], edges.xyz[eorder], 0.0), evalid)

    map_xyz, map_valid = _matching_map(state, cfg)
    map_presorted = False
    if jax.default_backend() == "tpu":
        # Spatially order the matching map ONCE per frame: both solver
        # iterations query the same map, so paying the M-sized sort here and
        # passing ref_presorted to the kNN kernel halves its most expensive
        # wrapper step.  Point set unchanged; matching-map order carries no
        # semantics (the reference iterates PCL containers in storage order).
        # MEASURED ALTERNATIVE (round 4, rejected): sorting each frame once
        # at window push and skipping this global sort — per-frame segments
        # overlap spatially (consecutive scans see the same scene), so kNN
        # prune-flagged tiles nearly double (2.19 -> 3.09 ms per call at the
        # bench working set) and the loss exceeds the sort's ~0.36 ms net
        # cost twice over.  The GLOBAL sort is what merges the frames'
        # co-located points into shared tiles; keep it.
        from liodom_tpu.ops.knn_pallas import spatial_sort_points
        map_xyz, map_valid = spatial_sort_points(map_xyz, map_valid)
        map_presorted = True

    # constant-velocity prediction (laser_odometry.cc:148-150)
    pred = se3.compose(state.odom,
                       se3.compose(se3.inverse(state.prev_odom), state.odom))
    new_prev = state.odom
    pose = pred
    if cfg.use_imu:
        tlb = t_laser_base if t_laser_base is not None else Pose.identity(
            state.odom.t.dtype)
        pose = _imu_override(pose, state.imu_ori, tlb)

    # 2x outer re-association, each: transform -> kNN/line fit -> 4-iter LM
    for _ in range(cfg.outer_iters):
        edges_world = se3.transform(pose, edges.xyz)
        corr = line_correspondences(
            edges_world, edges.valid, map_xyz, map_valid,
            k=cfg.knn_k, max_sq_dist=cfg.knn_max_sq_dist,
            eig_ratio=cfg.eig_ratio, min_line_sep=cfg.min_line_sep,
            map_presorted=map_presorted)
        pose = lm_solve(pose, edges.xyz, corr.lpa, corr.lpb, corr.valid,
                        min_range=cfg.min_range, max_range=cfg.max_range,
                        huber_delta=cfg.huber_delta, iters=cfg.inner_iters)

    # add the frame's edges (at the final pose) to the window
    # (laser_odometry.cc:231-235)
    edges_final = se3.transform(pose, edges.xyz)
    window = local_map.push(state.window,
                            jnp.where(edges.valid[:, None], edges_final, 0.0),
                            edges.valid)

    new_state = OdomState(window, pose, new_prev,
                          state.received_xyz, state.received_valid,
                          state.imu_ori)
    return new_state, pose


@partial(jax.jit, static_argnames=("cfg",))
def full_step(state: OdomState, raw_xyz: jax.Array, raw_valid: jax.Array,
              cfg: LiodomConfig,
              t_laser_base: Optional[Pose] = None,
              ) -> Tuple[OdomState, Pose, jax.Array]:
    """Scan in, pose out: feature extraction + odometry in one program.

    This is the flagship compiled step — the whole LiODOM frame path
    (both reference threads) fused into a single XLA invocation.
    Returns (state, pose, n_edges)."""
    from liodom_tpu.core.frame import RawScan
    from liodom_tpu.ops.features import extract_features, split_scan_ouster, \
        smoothness, select_edges

    if cfg.lidar_type == 0:
        edges = extract_features(RawScan(raw_xyz, raw_valid), cfg)
    else:
        img = split_scan_ouster(raw_xyz, cfg)
        edges = select_edges(img, smoothness(img, cfg), cfg)
    new_state, pose = odometry_step(state, edges, cfg, t_laser_base)
    return new_state, pose, edges.num_valid()


@partial(jax.jit, static_argnames=("cfg",))
def chained_image_step(state: OdomState, imgs_xyz: jax.Array,
                       imgs_count: jax.Array, cfg: LiodomConfig,
                       t_laser_base: Optional[Pose] = None,
                       imu_quats: Optional[jax.Array] = None,
                       ) -> Tuple[OdomState, Pose, jax.Array]:
    """K frames per device dispatch: ``lax.scan`` over the image_step body.

    Frames are sequentially dependent — each solves against the window the
    previous frame pushed (laser_odometry.cc:231-235) — which is exactly
    what ``lax.scan`` expresses: the K iterations run back-to-back on
    device, so the per-dispatch host cost (~1.1 ms measured on the tunneled
    backend, BENCH_STAGES.json ``_dispatch_floor``) is paid once per K
    frames instead of once per frame.  Identical math to K successive
    :func:`image_step` calls; poses match to float-reassociation tolerance
    (asserted in tests/test_chained.py).

    This trades pose LATENCY (a pose is only observable after its chunk
    completes) for throughput — the offline-replay trade the reference
    cannot make because its pipeline is host threads end-to-end.  Live
    paced apps (apps/run_stream.py) keep the per-frame step.

    ``imgs_xyz``: (K, R, W, 3); ``imgs_count``: (K, R).  With
    ``cfg.use_imu``, pass ``imu_quats`` (K, 4) so each scanned frame sees
    ITS sensor orientation (the per-frame loop's ``set_imu`` before each
    step) — without it every frame in the chunk would reuse the state's
    last quat.  Returns (state, poses stacked (K, ...), n_edges (K,))."""
    if cfg.use_imu and imu_quats is None:
        raise ValueError("cfg.use_imu requires per-frame imu_quats (K, 4) "
                         "in the chained step")

    def body(s, xc):
        if imu_quats is None:
            x, c = xc
        else:
            x, c, q = xc
            s = s._replace(imu_ori=q.astype(s.imu_ori.dtype))
        s2, pose, ne = image_step(s, x, c, cfg, t_laser_base)
        return s2, (pose, ne)

    xs = (imgs_xyz, imgs_count) if imu_quats is None else \
        (imgs_xyz, imgs_count, imu_quats)
    state, (poses, nedges) = jax.lax.scan(body, state, xs)
    return state, poses, nedges


@partial(jax.jit, static_argnames=("cfg",))
def batch_image_step(states: OdomState, imgs_xyz: jax.Array,
                     imgs_count: jax.Array, cfg: LiodomConfig
                     ) -> Tuple[OdomState, Pose, jax.Array]:
    """vmap of :func:`image_step` over a leading batch of independent
    sequences — single-chip multi-sequence throughput (dataset processing,
    fleet replay).  A degree of data parallelism the CPU reference has no
    analogue for (SURVEY.md §2); shard the batch over a mesh 'data' axis for
    multi-chip (parallel/sharded.py).

    The hot Pallas kernels carry ``custom_vmap`` rules, so this vmap lowers
    to DEDICATED batched kernels (batch folded into the Pallas grid:
    ops/knn_pallas.knn_coords_pallas_batched; ring-folded select/smoothness
    in ops/features) instead of JAX's default pallas batching, which fell
    off the tuned Mosaic path (round 3 anti-scaled: B=2 aggregate BELOW
    solo; round 4 measures ~linear aggregate — the frame is VPU-compute-
    bound, see README and scripts/batch_sweep.py).

    states: OdomState with a leading batch dim (init via
    ``jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))`` or
    parallel.sharded.init_batch_state)."""
    return jax.vmap(lambda s, x, c: image_step(s, x, c, cfg))(
        states, imgs_xyz, imgs_count)


@partial(jax.jit, static_argnames=("cfg",))
def image_step(state: OdomState, img_xyz: jax.Array, img_count: jax.Array,
               cfg: LiodomConfig,
               t_laser_base: Optional[Pose] = None,
               ) -> Tuple[OdomState, Pose, jax.Array]:
    """Ring-image in, pose out — the production hot path.

    Ring routing is a loader-stage job (the native prefetcher splits scans in
    worker threads, runtime/native_src/loader.cc split_velodyne — mirroring
    the reference's dedicated extraction thread, feature_extractor.cc:42-82),
    so the device program starts at the smoothness kernel.  Identical results
    to :func:`full_step`; it skips only the on-device re-split."""
    from liodom_tpu.core.frame import RingImage
    from liodom_tpu.ops.features import smoothness, select_edges

    img = RingImage(img_xyz, img_count)
    edges = select_edges(img, smoothness(img, cfg), cfg)
    new_state, pose = odometry_step(state, edges, cfg, t_laser_base)
    return new_state, pose, edges.num_valid()
