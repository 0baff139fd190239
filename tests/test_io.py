"""IO layer tests: KITTI .bin parsing, native loader/prefetcher, calib."""

import os

import numpy as np
import pytest

from liodom_tpu.core import io as lio
from liodom_tpu.runtime import native


def write_bin(path, n, seed):
    rng = np.random.default_rng(seed)
    rec = rng.uniform(-50, 50, (n, 4)).astype(np.float32)
    rec.tofile(path)
    return rec


def make_sequence(tmp_path, n_scans=5, n_pts=1000):
    seq_dir = tmp_path / "sequences" / "00"
    velo = seq_dir / "velodyne"
    velo.mkdir(parents=True)
    recs = [write_bin(str(velo / f"{i:06d}.bin"), n_pts + i * 10, i)
            for i in range(n_scans)]
    np.savetxt(seq_dir / "times.txt", np.arange(n_scans) * 0.1)
    Tr = np.array([[0, -1, 0, 0.1], [0, 0, -1, -0.05], [1, 0, 0, 0.2]],
                  float)
    with open(seq_dir / "calib.txt", "w") as f:
        f.write("P0: " + " ".join(["0"] * 12) + "\n")
        f.write("Tr: " + " ".join(str(v) for v in Tr.reshape(-1)) + "\n")
    poses_dir = tmp_path / "poses"
    poses_dir.mkdir()
    gt = np.tile(np.eye(4), (n_scans, 1, 1))
    gt[:, 0, 3] = np.arange(n_scans) * 1.5
    np.savetxt(poses_dir / "00.txt",
               gt[:, :3, :].reshape(n_scans, 12))
    return recs, gt, Tr


def test_native_lib_compiles():
    assert native.native_available(), "native loader failed to build"


def test_read_bin_matches_numpy(tmp_path):
    rec = write_bin(str(tmp_path / "a.bin"), 1234, 0)
    got = native.read_bin(str(tmp_path / "a.bin"))
    np.testing.assert_array_equal(got, rec)


def test_prefetcher_order_and_contents(tmp_path):
    paths, recs = [], []
    for i in range(12):
        p = str(tmp_path / f"{i:06d}.bin")
        recs.append(write_bin(p, 500 + i, i))
        paths.append(p)
    out = list(native.iter_padded(paths, capacity=600, prefetch=3))
    assert len(out) == 12
    for i, (xyz, valid) in enumerate(out):
        n = 500 + i
        assert valid.sum() == n
        np.testing.assert_array_equal(xyz[:n], recs[i][:, :3])
        assert np.all(xyz[n:] == 0)


def test_prefetcher_capacity_clamp(tmp_path):
    p = str(tmp_path / "big.bin")
    rec = write_bin(p, 1000, 7)
    out = list(native.iter_padded([p], capacity=256))
    xyz, valid = out[0]
    assert valid.sum() == 256
    np.testing.assert_array_equal(xyz, rec[:256, :3])


def test_kitti_sequence(tmp_path):
    recs, gt, Tr = make_sequence(tmp_path)
    seq = lio.KittiSequence(str(tmp_path), "00")
    assert len(seq) == 5
    np.testing.assert_array_equal(seq.scan(2), recs[2][:, :3])
    assert seq.times is not None and len(seq.times) == 5
    gv = seq.gt_velo()
    assert gv is not None
    # velo-frame gt: T_w_velo = Tr^-1 T_w_cam Tr
    T4 = np.eye(4)
    T4[:3, :4] = Tr
    want = np.linalg.inv(T4) @ gt[3] @ T4
    np.testing.assert_allclose(gv[3], want, atol=1e-12)
    # iter_padded streams every scan
    clouds = list(seq.iter_padded(capacity=2048))
    assert len(clouds) == 5
    assert clouds[4][1].sum() == len(recs[4])


def test_organized_from_unorganized_roundtrip():
    rng = np.random.default_rng(0)
    # points on distinct elevation rows
    xyz = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
    img = lio.organized_from_unorganized(xyz, rings=32, width=512)
    assert img.shape == (32, 512, 3)
    # every nonzero pixel is one of the inputs
    nz = img[np.any(img != 0, axis=-1)]
    src = {tuple(np.round(p, 4)) for p in xyz}
    for p in nz:
        assert tuple(np.round(p, 4)) in src


def test_iter_images_matches_host_split(tmp_path):
    """KittiSequence.iter_images (native split prefetcher) must equal the
    per-scan host split of the same files."""
    recs, _, _ = make_sequence(tmp_path, n_scans=4, n_pts=4000)
    seq = lio.KittiSequence(str(tmp_path), "00")
    got = list(seq.iter_images(64, 512, 3.0, 75.0))
    assert len(got) == 4
    for rec, (img, counts, n_drop) in zip(recs, got):
        ref_img, ref_counts, _ = native.split_velodyne(rec, 64, 512, 3.0, 75.0)
        np.testing.assert_array_equal(counts, ref_counts)
        np.testing.assert_array_equal(img, ref_img)
        assert n_drop == 0
