"""Global hash-grid map tests against a NumPy golden replica of the
reference ``Map`` (map.cc) semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from liodom_tpu.core.config import MapConfig
from liodom_tpu.core.pose import Pose
from liodom_tpu.mapping import (init_map, update_map, get_map, get_local_map,
                                count_cells,
                                local_map_offsets, map_entropy, cell_keys)


# ---------------------------------------------------------------- golden ref

def ref_cell_key(p, xy, z):
    """map.cc:103-105: int(floor(p/size)*size + size/2), trunc toward 0."""
    return (int(np.floor(p[0] / xy) * xy + xy / 2.0),
            int(np.floor(p[1] / xy) * xy + xy / 2.0),
            int(np.floor(p[2] / z) * z + z / 2.0))


class RefMap:
    """Literal NumPy re-enactment of Map::updateMap/getMap/getLocalMap."""

    def __init__(self, xy, z, res):
        self.xy, self.z, self.res = xy, z, res
        self.cells = {}  # key -> list of points (filtered)

    def update(self, pts, T):
        w = pts @ T[:3, :3].T + T[:3, 3]
        modified = set()
        for p in w:
            k = ref_cell_key(p, self.xy, self.z)
            self.cells.setdefault(k, []).append(np.asarray(p, np.float64))
            modified.add(k)
        for k in modified:
            self.cells[k] = self._voxel_filter(self.cells[k])

    def _voxel_filter(self, pts):
        """PCL VoxelGrid: centroid per global-grid leaf floor(p/res)."""
        leaves = {}
        for p in pts:
            li = tuple(np.floor(p / self.res).astype(int))
            leaves.setdefault(li, []).append(p)
        return [np.mean(v, axis=0) for v in leaves.values()]

    def get_map(self):
        out = []
        for v in self.cells.values():
            out.extend(v)
        return np.asarray(out) if out else np.zeros((0, 3))

    def get_local_map(self, t, cells_xy=2, cells_z=1):
        """map.cc:141-189 with its int-loop arithmetic, incl. the z-column
        bounds-with-xy-size quirk."""
        vx, vy, vz = ref_cell_key((int(t[0]), int(t[1]), int(t[2])),
                                  self.xy, self.z)
        out = []
        init_x = int(vx - cells_xy * self.xy)
        end_x = int(vx + cells_xy * self.xy)
        i = init_x
        while i <= end_x:
            j = int(vy - cells_xy * self.xy)
            end_y = int(vy + cells_xy * self.xy)
            while j <= end_y:
                out.extend(self.cells.get((i, j, vz), []))
                j = int(j + self.xy)
            i = int(i + self.xy)
        init_z = int(vz - cells_z * self.xy)
        end_z = int(vz + cells_z * self.xy)
        i = init_z
        while i <= end_z:
            out.extend(self.cells.get((vx, vy, i), []))
            i = int(i + self.z)
        return np.asarray(out) if out else np.zeros((0, 3))


def as_set(a, tol=1e-4):
    return {tuple(np.round(r / tol).astype(np.int64)) for r in np.asarray(a)}


def assert_same_cloud(got, want, tol=1e-2):
    """Order-insensitive cloud equality: exact bijective nearest matching."""
    got, want = np.asarray(got), np.asarray(want)
    assert len(got) == len(want)
    if len(got) == 0:
        return
    d = np.linalg.norm(got[:, None, :] - want[None, :, :], axis=-1)
    rows = d.min(axis=1)
    cols = d.min(axis=0)
    assert rows.max() < tol, f"unmatched got point, dist {rows.max()}"
    assert cols.max() < tol, f"unmatched want point, dist {cols.max()}"


def pad_cloud(pts, cap):
    n = len(pts)
    xyz = np.zeros((cap, 3), np.float32)
    xyz[:n] = pts
    v = np.zeros((cap,), bool)
    v[:n] = True
    return jnp.asarray(xyz), jnp.asarray(v)


# ----------------------------------------------------------------- fixtures

CFG = MapConfig(voxel_xysize=40.0, voxel_zsize=50.0, resolution=0.4,
                map_capacity=4096)


def random_cloud(rng, n, scale=60.0):
    return rng.uniform(-scale, scale, (n, 3)).astype(np.float32)


# -------------------------------------------------------------------- tests

def test_cell_keys_match_reference_including_negatives():
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        random_cloud(rng, 200, 90.0),
        np.array([[0.0, 0.0, 0.0], [-0.1, -0.1, -0.1],
                  [39.99, -40.0, 25.0], [-79.9, 80.0, -25.0]], np.float32),
    ])
    got = np.asarray(cell_keys(jnp.asarray(pts), CFG))
    for p, g in zip(pts, got):
        assert tuple(g) == ref_cell_key(p.astype(np.float64),
                                        CFG.voxel_xysize, CFG.voxel_zsize)


def test_cell_keys_odd_sizes_truncation():
    # 35/2 = 17.5 -> truncation toward zero matters on both signs
    cfg = MapConfig(voxel_xysize=35.0, voxel_zsize=25.0)
    pts = np.array([[1.0, -1.0, 3.0], [-36.0, 36.0, -26.0],
                    [70.1, -70.1, 12.4]], np.float32)
    got = np.asarray(cell_keys(jnp.asarray(pts), cfg))
    for p, g in zip(pts, got):
        assert tuple(g) == ref_cell_key(p.astype(np.float64), 35.0, 25.0)


def test_update_map_matches_reference_point_set():
    rng = np.random.default_rng(1)
    ref = RefMap(CFG.voxel_xysize, CFG.voxel_zsize, CFG.resolution)
    state = init_map(CFG.map_capacity)
    pose_np = np.eye(4)
    for frame in range(3):
        pts = random_cloud(rng, 500)
        pose_np[:3, 3] = frame * np.array([5.0, 1.0, 0.2])
        ref.update(pts.astype(np.float64), pose_np)
        xyz, valid = pad_cloud(pts, 600)
        pose = Pose(jnp.array([1.0, 0, 0, 0], jnp.float32),
                    jnp.asarray(pose_np[:3, 3], jnp.float32))
        state = update_map(state, xyz, valid, pose, CFG)

    got_xyz, got_valid = get_map(state)
    got = np.asarray(got_xyz)[np.asarray(got_valid)]
    want = ref.get_map()
    assert_same_cloud(got, want)
    assert count_cells(state) == len(ref.cells)
    assert int(state.overflow) == 0


def test_update_map_refilter_idempotent():
    """Re-inserting an empty cloud (or the same points) must keep the soup
    at one point per (cell, leaf)."""
    rng = np.random.default_rng(2)
    pts = random_cloud(rng, 400, 10.0)  # dense: many leaf collisions
    state = init_map(2048)
    pose = Pose.identity()
    xyz, valid = pad_cloud(pts, 512)
    state = update_map(state, xyz, valid, pose, CFG)
    n1 = int(jnp.sum(state.valid))
    state2 = update_map(state, xyz * 0.0, jnp.zeros(512, bool), pose, CFG)
    assert int(jnp.sum(state2.valid)) == n1
    assert as_set(np.asarray(state2.xyz)[np.asarray(state2.valid)]) == \
        as_set(np.asarray(state.xyz)[np.asarray(state.valid)])


def test_local_map_matches_reference():
    rng = np.random.default_rng(3)
    ref = RefMap(CFG.voxel_xysize, CFG.voxel_zsize, CFG.resolution)
    state = init_map(CFG.map_capacity)
    pts = random_cloud(rng, 800, 100.0)
    ref.update(pts.astype(np.float64), np.eye(4))
    xyz, valid = pad_cloud(pts, 1024)
    state = update_map(state, xyz, valid, Pose.identity(), CFG)

    for t in ([0.0, 0.0, 0.0], [33.3, -21.7, 4.2], [-75.0, 60.0, -12.0]):
        want = ref.get_local_map(np.asarray(t))
        got_xyz, got_valid, _ = get_local_map(
            state, jnp.asarray(t, jnp.float32), CFG, capacity=1024)
        got = np.asarray(got_xyz)[np.asarray(got_valid)]
        assert_same_cloud(got, want)


def test_local_map_offsets_z_quirk():
    """With 40/50 sizes the z-column bounds (+-40) never hit the 50-step
    lattice; the column contributes exactly the reference's two keys."""
    offs = local_map_offsets(CFG)
    zcol = offs[(offs[:, 0] == 0) & (offs[:, 1] == 0) & (offs[:, 2] != 0)]
    assert {tuple(o) for o in zcol} == {(0, 0, -40), (0, 0, 10)}


def test_overflow_counted():
    cfg = MapConfig(map_capacity=64)
    rng = np.random.default_rng(4)
    pts = random_cloud(rng, 500, 90.0)  # sparse: ~500 distinct leaves
    state = init_map(cfg.map_capacity)
    xyz, valid = pad_cloud(pts, 512)
    state = update_map(state, xyz, valid, Pose.identity(), cfg)
    assert int(state.overflow) > 0
    assert int(jnp.sum(state.valid)) == 64


def test_map_entropy_positive_and_finite():
    rng = np.random.default_rng(5)
    state = init_map(2048)
    xyz, valid = pad_cloud(random_cloud(rng, 600, 120.0), 1024)
    state = update_map(state, xyz, valid, Pose.identity(), CFG)
    h = map_entropy(state)
    assert np.isfinite(h) and h > 0.0
    assert map_entropy(init_map(16)) == 0.0


# ------------------------------------------- incremental == full equivalence

def _rand_pose(rng, i):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3) * 5 + np.array([i * 2.0, 0.0, 0.0])
    return Pose(jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32))


def _assert_states_equivalent(a, b, i):
    """Hash-layout state ``a`` vs sorted-layout state ``b``: same point
    SETS (layout is an internal detail), same keys per point, same cell
    count and overflow."""
    av = np.asarray(a.valid)
    bv = np.asarray(b.valid)
    assert av.sum() == bv.sum(), i
    assert count_cells(a) == count_cells(b), i
    assert int(a.overflow) == int(b.overflow), i
    # match rows by (cell key, rounded centroid): every hash slot must have
    # exactly one sorted-row counterpart (centroids agree up to float-sum
    # reassociation — documented-equal)
    a_rows = np.concatenate([np.asarray(a.key)[av],
                             np.round(np.asarray(a.xyz)[av] * 1e4)], axis=1)
    b_rows = np.concatenate([np.asarray(b.key)[bv],
                             np.round(np.asarray(b.xyz)[bv] * 1e4)], axis=1)
    sa = {tuple(r) for r in a_rows.astype(np.int64)}
    sb = {tuple(r) for r in b_rows.astype(np.int64)}
    assert sa == sb, (i, len(sa - sb), len(sb - sa))


def test_hash_equals_full_multiframe():
    """update_map (hash probe) == update_map_full (re-sort oracle) over a
    multi-frame sequence with rotations and invalid points."""
    from liodom_tpu.mapping import update_map_full

    rng = np.random.default_rng(10)
    # ~3.6k distinct leaves over 8 frames -> ~45% final load factor; local
    # capacity sized to never truncate (truncation keeps a deterministic but
    # layout-dependent subset, so the two paths would diverge there)
    mcfg = MapConfig(map_capacity=8192, local_map_capacity=4096)
    a = init_map(mcfg.map_capacity)
    b = init_map(mcfg.map_capacity)
    for i in range(8):
        pts = jnp.asarray(
            rng.normal(size=(500, 3)) * np.array([30, 30, 5]), jnp.float32)
        valid = jnp.asarray(rng.random(500) > 0.1)
        pose = _rand_pose(rng, i)
        a = update_map(a, pts, valid, pose, mcfg)
        b = update_map_full(b, pts, valid, pose, mcfg)
        _assert_states_equivalent(a, b, i)
        la = get_local_map(a, pose.t, mcfg, capacity=mcfg.local_map_capacity)
        lb = get_local_map(b, pose.t, mcfg, capacity=mcfg.local_map_capacity)
        assert int(np.asarray(la[1]).sum()) == int(np.asarray(lb[1]).sum())
        assert_same_cloud(np.asarray(la[0])[np.asarray(la[1])],
                          np.asarray(lb[0])[np.asarray(lb[1])])
    assert int(jnp.sum(a.valid)) > 1000  # the sequence actually filled it


def test_hash_overflow_counted_and_bounded():
    """At capacity the hash path drops and counts instead of growing (the
    reference grows unbounded; documented deviation — drop choice is
    probe-order dependent rather than largest-key)."""
    rng = np.random.default_rng(11)
    mcfg = MapConfig(map_capacity=256, local_map_capacity=128)
    a = init_map(mcfg.map_capacity)
    total = 0
    for i in range(4):
        pts = jnp.asarray(rng.normal(size=(300, 3)) * 20, jnp.float32)
        valid = jnp.ones(300, bool)
        pose = _rand_pose(rng, i)
        a = update_map(a, pts, valid, pose, mcfg)
        total += 300
    assert int(a.overflow) > 0
    assert int(jnp.sum(a.valid)) <= 256


def test_hash_matches_numpy_reference():
    """The hash path against the literal RefMap re-enactment —
    the same oracle the full path is pinned to."""
    rng = np.random.default_rng(12)
    ref = RefMap(CFG.voxel_xysize, CFG.voxel_zsize, CFG.resolution)
    state = init_map(CFG.map_capacity)
    pose = Pose.identity()
    for i in range(3):
        pts = random_cloud(rng, 400, 80.0)
        ref.update(pts.astype(np.float64), np.eye(4))
        xyz, valid = pad_cloud(pts, 512)
        state = update_map(state, xyz, valid, pose, CFG)
    got = np.asarray(state.xyz)[np.asarray(state.valid)]
    assert_same_cloud(got, ref.get_map())
    assert count_cells(state) == len(ref.cells)


def test_local_map_truncation_reported():
    """get_local_map returns the pre-truncation hit count so callers can
    honour the no-silent-caps contract."""
    rng = np.random.default_rng(13)
    state = init_map(4096)
    # 600 points in one cell neighbourhood, capacity 128 -> hits > capacity
    pts = (rng.uniform(-15, 15, (600, 3))).astype(np.float32)
    xyz, valid = pad_cloud(pts, 1024)
    state = update_map(state, xyz, valid, Pose.identity(), CFG)
    got_xyz, got_valid, n_hits = get_local_map(
        state, jnp.zeros(3, jnp.float32), CFG, capacity=128)
    assert int(n_hits) > 128
    assert int(np.asarray(got_valid).sum()) == 128


def test_local_map_capacity_exceeds_map_rows():
    """capacity > map row count must pad, not crash (regression: the
    argsort-slice compaction yields at most C entries)."""
    mcfg = MapConfig(map_capacity=512, local_map_capacity=1024)
    st = init_map(512)
    rng = np.random.default_rng(14)
    pts = jnp.asarray(rng.uniform(-15, 15, (200, 3)), jnp.float32)
    st = update_map(st, pts, jnp.ones(200, bool), Pose.identity(), mcfg)
    xyz, valid, n = get_local_map(st, jnp.zeros(3, jnp.float32), mcfg,
                                  capacity=1024)
    assert xyz.shape == (1024, 3) and valid.shape == (1024,)
    assert int(valid.sum()) == int(n) > 0


def test_sparse_epilogue_matches_update_map():
    """The measured-rejected O(E) epilogue (kept as a documented variant)
    stays semantically identical to update_map: same point sets, same
    keys/valid, same overflow over a multi-frame sequence."""
    from liodom_tpu.mapping.grid import update_map_sparse_epilogue

    rng = np.random.default_rng(21)
    mcfg = MapConfig(map_capacity=8192, local_map_capacity=4096)
    a = init_map(mcfg.map_capacity)
    b = init_map(mcfg.map_capacity)
    for i in range(6):
        pts = jnp.asarray(
            rng.normal(size=(500, 3)) * np.array([30, 30, 5]), jnp.float32)
        valid = jnp.asarray(rng.random(500) > 0.1)
        pose = _rand_pose(rng, i)
        a = update_map(a, pts, valid, pose, mcfg)
        b = update_map_sparse_epilogue(b, pts, valid, pose, mcfg)
        # identical layout too: both share the probe-table slot assignment
        assert np.array_equal(np.asarray(a.valid), np.asarray(b.valid)), i
        va = np.asarray(a.valid)
        assert np.allclose(np.asarray(a.xyz)[va], np.asarray(b.xyz)[va],
                           atol=1e-5), i
        assert np.array_equal(np.asarray(a.key)[va],
                              np.asarray(b.key)[va]), i
        assert int(a.overflow) == int(b.overflow), i
