#!/usr/bin/env python
"""Measurement sweep for the two mapping hot stages (round-3 perf push).

Variants measured on the real chip with realistic state (a ~30-frame map):

* ``update_map`` probe-insert: baseline while_loop vs. K Python-unrolled
  rounds (no per-round ``any(~done)`` cond reduction) + while cleanup.
* ``get_local_map``: baseline 3-column key eq + argsort-compaction vs.
  packed-code 2-word membership, and vs. a hit-count-bounded top_k.

Prints one JSON line per measurement so a timeout still leaves data.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from liodom_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp

from liodom_tpu import LiodomConfig
from liodom_tpu.core.config import MapConfig
from liodom_tpu.core.synth import BoxWorld, drive_trajectory, yaw_matrix
from liodom_tpu.core.pose import Pose
from liodom_tpu.core import pose as se3
from liodom_tpu.mapping import grid as G
from liodom_tpu.runtime import native
from liodom_tpu.ops.features import smoothness, select_edges
from liodom_tpu.core.frame import RingImage

_MAXU32 = jnp.uint32(0xFFFFFFFF)


def timeit(fn, fetch, reps=30, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) * 1e3 / reps


def emit(name, ms):
    print(json.dumps({"variant": name, "ms": round(ms, 3)}), flush=True)


# ---------------------------------------------------------------- variants
def _probe_insert_unrolled(tab1, tab2, k1, k2, active, unroll):
    """_probe_insert with the first `unroll` rounds Python-unrolled (no
    cond reduction between them), then the while_loop cleanup."""
    n = tab1.shape[0]

    def body(carry):
        tab1, tab2, slot, done, claimed, probe = carry
        s = jnp.where(done, 0, slot)
        g1, g2 = tab1[s], tab2[s]
        match = ~done & (g1 == k1) & (g2 == k2)
        empty = ~done & (g1 == _MAXU32) & (g2 == _MAXU32)
        t1 = tab1.at[jnp.where(empty, slot, n)].min(k1, mode="drop")
        won1 = empty & (t1[s] == k1)
        t2 = tab2.at[jnp.where(won1, slot, n)].min(k2, mode="drop")
        won = won1 & (t2[s] == k2)
        done_now = match | won
        claimed = claimed | won
        done = done | done_now
        slot = jnp.where(done, slot, (slot + probe + 1) % n)
        return t1, t2, slot, done, claimed, probe + 1

    def cond(carry):
        *_, done, _claimed, probe = carry
        return jnp.any(~done) & (probe < G._MAX_PROBES)

    slot0 = G._hash_pair(k1, k2, n)
    carry = (tab1, tab2, slot0, ~active, jnp.zeros_like(active), jnp.int32(0))
    for _ in range(unroll):
        carry = body(carry)
    tab1, tab2, slot, done, claimed, _ = jax.lax.while_loop(cond, body, carry)
    failed = active & ~done
    return tab1, tab2, slot, claimed, failed


def make_update_variant(unroll):
    @partial(jax.jit, static_argnames=("cfg",))
    def update(state, pts, valid, pose, cfg):
        cap = state.xyz.shape[0]
        dtype = state.xyz.dtype
        new_xyz = se3.transform(pose, pts.astype(dtype))
        k1, k2 = G._packed_codes(new_xyz, valid, cfg)
        tab1, tab2, slot, _c, failed = _probe_insert_unrolled(
            state.code1, state.code2, k1, k2, valid, unroll)
        ok = valid & ~failed
        slot_c = jnp.where(ok, slot, cap)
        payload = jnp.concatenate(
            [jnp.where(ok[:, None], new_xyz, 0.0),
             ok[:, None].astype(dtype)], axis=1)
        acc = jnp.zeros((cap, 4), dtype).at[slot_c].add(payload, mode="drop")
        add_sum, add_cnt = acc[:, :3], acc[:, 3]
        base_w = state.valid.astype(dtype)
        touched = add_cnt > 0
        out_xyz = jnp.where(touched[:, None],
                            (state.xyz * base_w[:, None] + add_sum)
                            / (base_w + add_cnt)[:, None],
                            state.xyz)
        out_valid = tab1 != _MAXU32
        out_key = jnp.where(out_valid[:, None],
                            G._decode_cell_keys(tab1, tab2, cfg), 0)
        dropped = jnp.sum((valid & failed).astype(jnp.int32))
        return G.MapState(out_xyz, out_key, out_valid,
                          state.overflow + dropped, tab1, tab2)
    return update


def _cell_words(k1, k2):
    """(cell-only) identity words: k1 holds cux|cuy|cuz_hi; mask the leaf
    bits out of k2 so equality means same CELL."""
    return k1, (k2 >> jnp.uint32(21))


@partial(jax.jit, static_argnames=("cfg", "capacity"))
def get_local_map_codes(state, position, cfg, capacity):
    """Membership via packed-code cell words (2 compares) instead of the
    3-column int key eq."""
    c = state.xyz.shape[0]
    base = G.cell_keys(jnp.trunc(position), cfg)
    offs = jnp.asarray(G.local_map_offsets(cfg))
    targets = base[None, :] + offs
    # encode targets to cell words: reconstruct cell indices from meter keys
    sx, sz = cfg.voxel_xysize, cfg.voxel_zsize
    half = 1 << (G._CELL_BITS - 1)

    def enc(kv, size):
        cidx = jnp.floor(kv.astype(jnp.float32) / size).astype(jnp.int32)
        return jnp.clip(cidx + half, 0, (1 << G._CELL_BITS) - 1
                        ).astype(jnp.uint32)

    cux = enc(targets[:, 0], sx)
    cuy = enc(targets[:, 1], sx)
    cuz = enc(targets[:, 2], sz)
    t1 = (cux << 19) | (cuy << 7) | (cuz >> 5)
    t2 = cuz & jnp.uint32(0x1F)
    s1, s2 = _cell_words(state.code1, state.code2)
    eq = (s1[:, None] == t1[None, :]) & (s2[:, None] == t2[None, :])
    hit = jnp.any(eq, axis=-1) & state.valid
    n_hits = jnp.sum(hit.astype(jnp.int32))
    key = jnp.where(hit, jnp.arange(c, dtype=jnp.uint32), jnp.uint32(1) << 31)
    order = jnp.argsort(key)[:capacity]
    out_valid = jnp.arange(capacity, dtype=jnp.int32) < n_hits
    out_xyz = jnp.where(out_valid[:, None], state.xyz[order], 0.0)
    return out_xyz, out_valid, n_hits


def main():
    cfg = LiodomConfig(local_map_size=5, mapping=True, ring_width=2048)
    mcfg = MapConfig()
    world = BoxWorld(seed=0)
    n = 32
    pos, yaws = drive_trajectory(n, speed=1.2, yaw_rate=0.01)
    edges_seq = []
    for i in range(n):
        scan = world.render(pos[i], yaw_matrix(yaws[i]), width=1800,
                            noise=0.01, seed=i)
        img, counts, _ = native.split_velodyne(
            scan.astype(np.float32), cfg.scan_lines, cfg.ring_width,
            cfg.min_range, cfg.max_range)
        img, counts = jnp.asarray(img), jnp.asarray(counts)
        e = select_edges(RingImage(img, counts), smoothness(
            RingImage(img, counts), cfg), cfg)
        edges_seq.append(e)

    # build a realistic map: insert the first 30 frames at ground truth
    state = G.init_map(mcfg.map_capacity)
    for i in range(n - 2):
        p = Pose(se3.matrix_to_quat(jnp.asarray(yaw_matrix(yaws[i]), jnp.float32)), jnp.asarray(pos[i], jnp.float32))
        state = G.update_map(state, edges_seq[i].xyz, edges_seq[i].valid,
                             p, mcfg)
    state = jax.tree.map(jnp.asarray, state)
    jax.block_until_ready(state)
    nvalid = int(jnp.sum(state.valid))
    print(json.dumps({"map_valid_slots": nvalid,
                      "capacity": mcfg.map_capacity}), flush=True)

    e = edges_seq[n - 1]
    p = Pose(se3.matrix_to_quat(jnp.asarray(yaw_matrix(yaws[n - 1]), jnp.float32)), jnp.asarray(pos[n - 1], jnp.float32))

    # --- update_map variants ---
    ms = timeit(lambda: G.update_map(state, e.xyz, e.valid, p, mcfg),
                lambda s: np.asarray(s.overflow))
    emit("update_map/while(baseline)", ms)
    for unroll in (4, 6, 8):
        up = make_update_variant(unroll)
        ms = timeit(lambda: up(state, e.xyz, e.valid, p, mcfg),
                    lambda s: np.asarray(s.overflow))
        emit(f"update_map/unroll{unroll}+while", ms)
        # parity with baseline
        a = G.update_map(state, e.xyz, e.valid, p, mcfg)
        b = up(state, e.xyz, e.valid, p, mcfg)
        same = bool(jnp.all(a.valid == b.valid) &
                    jnp.allclose(a.xyz, b.xyz) &
                    jnp.all(a.code1 == b.code1))
        print(json.dumps({"variant": f"unroll{unroll}", "parity": same}),
              flush=True)

    # --- get_local_map variants ---
    cap = mcfg.local_map_capacity
    ms = timeit(lambda: G.get_local_map(state, p.t, mcfg, capacity=cap),
                lambda o: np.asarray(o[2]))
    emit("get_local_map/keys3+argsort(baseline)", ms)
    ms = timeit(lambda: get_local_map_codes(state, p.t, mcfg, capacity=cap),
                lambda o: np.asarray(o[2]))
    emit("get_local_map/codes2+argsort", ms)
    a = G.get_local_map(state, p.t, mcfg, capacity=cap)
    b = get_local_map_codes(state, p.t, mcfg, capacity=cap)
    same = bool((a[2] == b[2]) & jnp.allclose(
        jnp.sort(a[0], axis=0), jnp.sort(b[0], axis=0)))
    print(json.dumps({"variant": "codes2", "parity": same,
                      "n_hits": int(a[2])}), flush=True)


if __name__ == "__main__":
    main()
