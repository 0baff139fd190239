#!/usr/bin/env python
"""Decompose update_map's ~3.4 ms: probe loop vs fold vs while overhead.

Variants: probe-only, fold-only (precomputed slots), fixed-round fori_loop
probe (no `any(~done)` cond), and probe-round census (how many rounds the
while actually runs on realistic data).
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


@jax.jit
def probe_only(tab1, tab2, k1, k2, active):
    t1, t2, slot, claimed, failed = G._probe_insert(tab1, tab2, k1, k2, active)
    return slot, failed, t1, t2


def make_probe_fixed(rounds):
    @jax.jit
    def probe_fixed(tab1, tab2, k1, k2, active):
        n = tab1.shape[0]

        def body(_, carry):
            tab1, tab2, slot, done, claimed, probe = carry
            s = jnp.where(done, 0, slot)
            g1, g2 = tab1[s], tab2[s]
            match = ~done & (g1 == k1) & (g2 == k2)
            empty = ~done & (g1 == _MAXU32) & (g2 == _MAXU32)
            t1 = tab1.at[jnp.where(empty, slot, n)].min(k1, mode="drop")
            won1 = empty & (t1[s] == k1)
            t2 = tab2.at[jnp.where(won1, slot, n)].min(k2, mode="drop")
            won = won1 & (t2[s] == k2)
            done = done | match | won
            claimed = claimed | won
            slot = jnp.where(done, slot, (slot + probe + 1) % n)
            return t1, t2, slot, done, claimed, probe + 1

        slot0 = G._hash_pair(k1, k2, n)
        carry = (tab1, tab2, slot0, ~active, jnp.zeros_like(active),
                 jnp.int32(0))
        t1, t2, slot, done, claimed, _ = jax.lax.fori_loop(
            0, rounds, body, carry)
        return slot, active & ~done, t1, t2
    return probe_fixed


@jax.jit
def fold_only(state_xyz, state_valid, slot, ok, new_xyz):
    cap = state_xyz.shape[0]
    dtype = state_xyz.dtype
    slot_c = jnp.where(ok, slot, cap)
    payload = jnp.concatenate(
        [jnp.where(ok[:, None], new_xyz, 0.0),
         ok[:, None].astype(dtype)], axis=1)
    acc = jnp.zeros((cap, 4), dtype).at[slot_c].add(payload, mode="drop")
    add_sum, add_cnt = acc[:, :3], acc[:, 3]
    base_w = state_valid.astype(dtype)
    touched = add_cnt > 0
    return jnp.where(touched[:, None],
                     (state_xyz * base_w[:, None] + add_sum)
                     / (base_w + add_cnt)[:, None],
                     state_xyz)


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

    state = G.init_map(mcfg.map_capacity)
    for i in range(n - 2):
        p = Pose(se3.matrix_to_quat(jnp.asarray(yaw_matrix(yaws[i]),
                                                jnp.float32)),
                 jnp.asarray(pos[i], jnp.float32))
        state = G.update_map(state, edges_seq[i].xyz, edges_seq[i].valid,
                             p, mcfg)
    jax.block_until_ready(state)

    e = edges_seq[n - 1]
    p = Pose(se3.matrix_to_quat(jnp.asarray(yaw_matrix(yaws[n - 1]),
                                            jnp.float32)),
             jnp.asarray(pos[n - 1], jnp.float32))
    new_xyz = se3.transform(p, e.xyz)
    k1, k2 = G._packed_codes(new_xyz, e.valid, mcfg)
    jax.block_until_ready((k1, k2))

    # probe-round census: run with increasing fixed rounds until no failures
    pf = make_probe_fixed(G._MAX_PROBES)
    slot, failed, t1, t2 = probe_only(state.code1, state.code2, k1, k2,
                                      e.valid)
    print(json.dumps({"E": int(e.valid.shape[0]),
                      "valid": int(jnp.sum(e.valid)),
                      "fail_while": int(jnp.sum(failed))}), flush=True)
    for r in (2, 3, 4, 6, 8, 12):
        pr = make_probe_fixed(r)
        _, f, *_ = pr(state.code1, state.code2, k1, k2, e.valid)
        print(json.dumps({"rounds": r, "unresolved": int(jnp.sum(f))}),
              flush=True)

    ms = timeit(lambda: probe_only(state.code1, state.code2, k1, k2, e.valid),
                lambda o: np.asarray(o[1][:1]))
    emit("probe/while", ms)
    for r in (3, 4, 6):
        pr = make_probe_fixed(r)
        ms = timeit(lambda: pr(state.code1, state.code2, k1, k2, e.valid),
                    lambda o: np.asarray(o[1][:1]))
        emit(f"probe/fori{r}", ms)

    ok = e.valid & ~failed
    ms = timeit(lambda: fold_only(state.xyz, state.valid, slot, ok, new_xyz),
                lambda o: np.asarray(o[:1]))
    emit("fold_only", ms)

    # decode-only cost (key/valid reconstruction)
    @jax.jit
    def decode_only(t1, t2):
        out_valid = t1 != _MAXU32
        return jnp.where(out_valid[:, None],
                         G._decode_cell_keys(t1, t2, mcfg), 0)
    ms = timeit(lambda: decode_only(t1, t2), lambda o: np.asarray(o[:1]))
    emit("decode_only", ms)


if __name__ == "__main__":
    main()
