"""Dataset loader tests against synthetic fixture files."""
import numpy as np
import pytest

from esvo_tpu.io import datasets


def test_mvsec_loader_roundtrip(tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(0)
    n = 300
    ev = np.zeros((n, 4))
    ev[:, 0] = rng.integers(0, 346, n)
    ev[:, 1] = rng.integers(0, 260, n)
    ev[:, 2] = np.sort(rng.uniform(100.0, 101.0, n))
    ev[:, 3] = rng.choice([-1.0, 1.0], n)
    path = str(tmp_path / "data.hdf5")
    with h5py.File(path, "w") as f:
        f.create_dataset("davis/left/events", data=ev)
    out = datasets.load_mvsec_events(path)
    np.testing.assert_array_equal(out.x, ev[:, 0].astype(np.int32))
    np.testing.assert_allclose(out.t, ev[:, 2])
    np.testing.assert_array_equal(out.p, ev[:, 3] > 0)

    gt = str(tmp_path / "gt.hdf5")
    poses = np.tile(np.eye(4), (5, 1, 1))
    with h5py.File(gt, "w") as f:
        f.create_dataset("davis/left/pose", data=poses)
        f.create_dataset("davis/left/pose_ts", data=np.arange(5.0))
    t, P = datasets.load_mvsec_gt_poses(gt)
    assert P.shape == (5, 4, 4) and len(t) == 5


def test_dsec_loader(tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(1)
    n = 200
    path = str(tmp_path / "events.h5")
    t_us = np.sort(rng.integers(0, 1_000_000, n)).astype(np.int64)
    with h5py.File(path, "w") as f:
        f.create_dataset("events/x", data=rng.integers(0, 640, n))
        f.create_dataset("events/y", data=rng.integers(0, 480, n))
        f.create_dataset("events/t", data=t_us)
        f.create_dataset("events/p", data=rng.integers(0, 2, n))
        f.create_dataset("t_offset", data=np.int64(5_000_000))
    out = datasets.load_dsec_events(path, max_events=150)
    assert len(out) == 150
    np.testing.assert_allclose(out.t, (t_us[:150] + 5_000_000) * 1e-6)


def test_rpg_dataset_dir(tmp_path):
    rng = np.random.default_rng(2)
    for side in ("left", "right"):
        with open(tmp_path / f"events_{side}.txt", "w") as f:
            t = np.sort(rng.uniform(0, 1, 50))
            for ti in t:
                f.write(f"{ti:.9f} {rng.integers(0,240)} "
                        f"{rng.integers(0,180)} {rng.integers(0,2)}\n")
    with open(tmp_path / "groundtruth.txt", "w") as f:
        f.write("0.0 0 0 0 0 0 0 1\n1.0 1 0 0 0 0 0 1\n")
    ev_l, ev_r, gt_t, gt_T = datasets.load_rpg_dataset(str(tmp_path))
    assert len(ev_l) == 50 and len(ev_r) == 50
    assert len(gt_t) == 2
    np.testing.assert_allclose(gt_T[1, :3, 3], [1, 0, 0])

    # cache=True: writes .npz bundles, reloads identically (incl. a
    # max_events cap applied after the cache read)
    c_l, c_r, _, _ = datasets.load_rpg_dataset(str(tmp_path), cache=True)
    assert (tmp_path / "events_left.txt.npz").exists()
    c2_l, _, _, _ = datasets.load_rpg_dataset(str(tmp_path), cache=True,
                                              max_events=20)
    np.testing.assert_array_equal(c_l.t, ev_l.t)
    np.testing.assert_array_equal(c_l.x, ev_l.x)
    np.testing.assert_array_equal(c_l.p, ev_l.p)
    assert len(c2_l) == 20
    np.testing.assert_array_equal(c2_l.t, ev_l.t[:20])
