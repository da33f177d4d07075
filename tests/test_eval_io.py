"""Tests for trajectory evaluation, TUM IO, event framing, native loader,
visualization, and YAML config loading."""
import os

import numpy as np
import jax.numpy as jnp

from esvo_tpu.eval.trajectory import (ate_rmse, rpe_stats, save_tum,
                                      load_tum, umeyama_alignment)
from esvo_tpu.io.events import EventArray, frame_events, load_events_txt
from esvo_tpu.geometry.se3 import cayley_to_rot


def random_trajectory(rng, n=50):
    times = np.cumsum(rng.uniform(0.005, 0.02, n))
    poses = np.tile(np.eye(4), (n, 1, 1))
    for i in range(n):
        c = 0.1 * rng.standard_normal(3)
        poses[i, :3, :3] = np.asarray(cayley_to_rot(jnp.asarray(c)))
        poses[i, :3, 3] = rng.standard_normal(3)
    return times, poses


def test_tum_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    times, poses = random_trajectory(rng)
    path = str(tmp_path / "traj.txt")
    save_tum(path, times, poses)
    t2, p2 = load_tum(path)
    np.testing.assert_allclose(t2, times, atol=1e-8)
    np.testing.assert_allclose(p2, poses, atol=1e-6)


def test_ate_zero_for_rigidly_transformed_copy():
    rng = np.random.default_rng(1)
    times, poses = random_trajectory(rng)
    R = np.asarray(cayley_to_rot(jnp.asarray([0.2, -0.1, 0.3])))
    t = np.array([1.0, -2.0, 0.5])
    moved = poses.copy()
    moved[:, :3, 3] = (R @ poses[:, :3, 3].T).T + t
    moved[:, :3, :3] = np.einsum("ij,njk->nik", R, poses[:, :3, :3])
    assert ate_rmse(times, moved, times, poses, align=True) < 1e-9
    # without alignment the error is the offset magnitude scale
    assert ate_rmse(times, moved, times, poses, align=False) > 0.5


def test_rpe_zero_for_identical():
    rng = np.random.default_rng(2)
    times, poses = random_trajectory(rng)
    dt, dr = rpe_stats(times, poses, times, poses)
    assert dt < 1e-12 and dr < 1e-6  # arccos near 1 is sqrt-noisy


def test_umeyama_with_scale():
    rng = np.random.default_rng(3)
    src = rng.standard_normal((40, 3))
    R = np.asarray(cayley_to_rot(jnp.asarray([0.05, 0.1, -0.2])))
    dst = 2.5 * (R @ src.T).T + np.array([3.0, 1.0, -1.0])
    s, R2, t2 = umeyama_alignment(src, dst, with_scale=True)
    np.testing.assert_allclose(s, 2.5, rtol=1e-9)
    np.testing.assert_allclose(R2, R, atol=1e-9)


def test_frame_events_and_txt_loader(tmp_path):
    rng = np.random.default_rng(4)
    n = 200
    t = np.sort(rng.uniform(0, 0.1, n))
    x = rng.integers(0, 100, n).astype(np.int32)
    y = rng.integers(0, 80, n).astype(np.int32)
    p = rng.random(n) > 0.5
    path = str(tmp_path / "events.txt")
    with open(path, "w") as f:
        for i in range(n):
            f.write(f"{t[i]:.9f} {x[i]} {y[i]} {int(p[i])}\n")
    ev = load_events_txt(path)
    np.testing.assert_allclose(ev.t, t, atol=1e-8)
    np.testing.assert_array_equal(ev.x, x)
    np.testing.assert_array_equal(ev.p, p)

    sync = np.asarray([0.03, 0.06, 0.2])
    frames = frame_events(ev, sync, capacity=300)
    total = frames["valid"].sum() + frames["dropped"].sum()
    assert total == n
    # frame boundaries: (prev, sync] semantics
    k0 = frames["valid"][0].sum()
    assert k0 == (t <= 0.03).sum()
    assert frames["t"][1, :frames["valid"][1].sum()].max() <= 0.06 + 1e-6


def _native_lib_or_skip():
    """get_lib() returns None only when g++ is absent; a broken build with
    a present toolchain raises (must FAIL the test, not skip)."""
    import shutil
    from esvo_tpu.io.native import get_lib
    lib = get_lib()  # raises RuntimeError on compile failure
    if lib is None:
        assert shutil.which("g++") is None, \
            "get_lib() returned None despite g++ being on PATH"
        import pytest
        pytest.skip("g++ not installed")
    return lib


def test_native_loader_matches_python(tmp_path):
    from esvo_tpu.io.native import (load_events_native, frame_events_native)
    _native_lib_or_skip()
    rng = np.random.default_rng(5)
    n = 500
    t = np.sort(rng.uniform(0, 0.5, n))
    x = rng.integers(0, 346, n).astype(np.int32)
    y = rng.integers(0, 260, n).astype(np.int32)
    p = rng.random(n) > 0.5
    path = str(tmp_path / "events.txt")
    with open(path, "w") as f:
        for i in range(n):
            f.write(f"{t[i]:.9f} {x[i]} {y[i]} {int(p[i])}\n")
    ev_py = load_events_txt(path)
    ev_c = load_events_native(path)
    np.testing.assert_allclose(ev_c.t, ev_py.t, atol=1e-9)
    np.testing.assert_array_equal(ev_c.x, ev_py.x)
    np.testing.assert_array_equal(ev_c.y, ev_py.y)
    np.testing.assert_array_equal(ev_c.p, ev_py.p)

    sync = np.arange(0.05, 0.5, 0.05)
    f_py = frame_events(ev_py, sync, 64)
    f_c = frame_events_native(ev_c, sync, 64)
    for k in ("x", "y", "p", "valid", "dropped"):
        np.testing.assert_array_equal(f_py[k], f_c[k], err_msg=k)
    np.testing.assert_allclose(f_py["t"], f_c["t"], atol=1e-6)


def test_native_loader_no_trailing_newline(tmp_path):
    """The last line must not be dropped when the file lacks a final \\n
    (ADVICE r1: carry buffer was discarded at EOF)."""
    from esvo_tpu.io.native import load_events_native
    _native_lib_or_skip()
    path = str(tmp_path / "events.txt")
    with open(path, "w") as f:
        f.write("0.100 1 2 1\n0.200 3 4 0\n0.300 5 6 1")  # no trailing \n
    ev = load_events_native(path)
    assert len(ev) == 3
    np.testing.assert_allclose(ev.t, [0.1, 0.2, 0.3], atol=1e-9)
    np.testing.assert_array_equal(ev.x, [1, 3, 5])
    np.testing.assert_array_equal(ev.p, [True, False, True])


def test_native_loader_signed_polarity_and_malformed_line(tmp_path):
    """-1/+1 polarity files must decode like the Python parser (-1 is
    negative), and a malformed mid-file line must not steal the next
    line's leading number as its polarity."""
    from esvo_tpu.io.native import load_events_native
    _native_lib_or_skip()
    path = str(tmp_path / "events.txt")
    with open(path, "w") as f:
        f.write("0.100 1 2 -1\n0.150 9 9\n0.200 3 4 1\n")
    ev = load_events_native(path)
    # the 3-field line is dropped; the -1 polarity is negative
    assert len(ev) == 2
    np.testing.assert_allclose(ev.t, [0.1, 0.2], atol=1e-9)
    np.testing.assert_array_equal(ev.p, [False, True])


def test_native_loader_truncated_last_line(tmp_path):
    """A last line truncated mid-write (fewer than 4 fields) must be
    dropped, not fabricated with zeroed fields."""
    from esvo_tpu.io.native import load_events_native
    _native_lib_or_skip()
    path = str(tmp_path / "events.txt")
    with open(path, "w") as f:
        f.write("0.100 1 2 1\n0.300 5")  # truncated: t and x only
    ev = load_events_native(path)
    assert len(ev) == 1
    np.testing.assert_allclose(ev.t, [0.1], atol=1e-9)


def test_visualization_maps():
    from esvo_tpu.utils.visualization import (plot_inv_depth_map,
                                              plot_event_map, jet_colormap)
    jet = jet_colormap()
    assert jet.shape == (256, 3) and jet.dtype == np.uint8
    inv = np.full((10, 12), 0.5)
    valid = np.zeros((10, 12), bool)
    valid[3, 4] = True
    img = plot_inv_depth_map(inv, valid, 0.2, 2.0)
    assert img.shape == (10, 12, 3)
    assert (img[0, 0] == 255).all()          # background
    assert not (img[3, 4] == 255).all()      # colored point

    em = plot_event_map(np.asarray([2, 100]), np.asarray([3, 4]),
                        np.asarray([True, True]), 10, 12)
    assert em[3, 2] == 0 and em[0, 0] == 255


def test_config_from_reference_yaml(tmp_path):
    from esvo_tpu.runtime.config import SystemConfig
    mapping = tmp_path / "mapping.yaml"
    mapping.write_text("""
invDepth_min_range: 0.3
invDepth_max_range: 1.5
patch_size_X: 11
patch_size_Y: 5
Lnorm: Tdist
Tdist_nu: 2.5
Tdist_scale: 20.0
BM_max_disparity: 60
PROCESS_EVENT_NUM: 2000
fusion_radius: 1
Denoising: false
""")
    tracking = tmp_path / "tracking.yaml"
    tracking.write_text("""
patch_size_X: 1
patch_size_Y: 1
kernelSize: 7
MAX_REGISTRATION_POINTS: 1500
BATCH_SIZE: 200
LSnorm: Huber
huber_threshold: 40
""")
    ts = tmp_path / "ts.yaml"
    ts.write_text("""
decay_ms: 20
ignore_polarity: true
median_blur_kernel_size: 1
time_surface_mode: 0
""")
    cfg = SystemConfig.from_yaml(str(mapping), str(tracking), str(ts))
    assert cfg.depth.patch_size_x == 11 and cfg.depth.td_nu == 2.5
    assert cfg.bm.max_disparity == 60
    assert cfg.fusion.fusion_radius == 1 and cfg.fusion.ls_norm == "Tdist"
    assert cfg.mapping.process_event_num == 2000
    assert not cfg.mapping.denoising
    assert cfg.tracker.kernel_size == 7 and cfg.tracker.batch_size == 200
    assert abs(cfg.surface.decay_sec - 0.02) < 1e-9
    assert cfg.surface.mode == "backward"
    assert cfg.cost_vis_threshold == 20.0 ** 2 * 55


def test_rigid_mask_and_robust_metrics():
    """ate_rmse/rpe_stats must score around degenerate poses instead of
    raising LinAlgError (observed: a collapsed-map tracker step emitted a
    singular pose mid-run)."""
    from esvo_tpu.eval.trajectory import ate_rmse, rpe_stats, rigid_mask
    rng = np.random.default_rng(0)
    K = 30
    t = np.arange(K) * 0.01
    T = np.broadcast_to(np.eye(4), (K, 4, 4)).copy()
    T[:, :3, 3] = rng.normal(size=(K, 3)) * 0.01 + t[:, None]
    bad = T.copy()
    bad[7] = 0.0                      # singular
    bad[19, 0, 0] = np.nan            # non-finite
    mask = rigid_mask(bad)
    assert not mask[7] and not mask[19] and mask.sum() == K - 2
    ate = ate_rmse(t, bad, t, T)
    assert np.isfinite(ate) and ate < 0.05
    rt, rr = rpe_stats(t, bad, t, T)
    assert np.isfinite(rt) and np.isfinite(rr)
