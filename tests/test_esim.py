"""Sensor-model tests for the ESIM-style event simulator (io/esim.py).

The simulator is the accuracy campaign's data source (the reference
validates on recorded rosbags, README.md:86, which don't exist here), so
its physics — contrast crossings, refractory period, budget overflow
accounting, dataset export — must be pinned by tests before any campaign
number is trusted.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from esvo_tpu.io import esim
from esvo_tpu.io.esim import (PlaneScene, SensorConfig, make_room_scene,
                              loop_trajectory_pose, render_log_intensity,
                              simulate_camera, simulate_stereo,
                              export_dataset)

W, H = 96, 72
K = np.array([[80.0, 0.0, W / 2 - 0.5],
              [0.0, 80.0, H / 2 - 0.5],
              [0.0, 0.0, 1.0]])


@pytest.fixture(scope="module")
def scene():
    return make_room_scene(np.random.default_rng(11))


def linear_pose(t):
    """Slow sideways translation — smooth, monotone intensity drift."""
    T = np.eye(4)
    T[0, 3] = 0.35 * t
    T[1, 3] = 0.1 * t
    return T


class TestRender:
    def test_depth_is_analytic(self, scene):
        logI, depth = render_log_intensity(
            scene, jnp.eye(4), jnp.asarray(K, jnp.float32), W, H)
        d = np.asarray(depth)
        assert d.shape == (H, W)
        assert np.isfinite(d).all() and (d > 0).all()
        # the centre ray is +z and hits the back wall (make_room_scene
        # places it at z = depth = 4.0)
        assert d[H // 2, W // 2] == pytest.approx(4.0, abs=1e-3)
        # off-centre rays hit side walls/floor closer than the back wall
        assert d.min() < d[H // 2, W // 2] - 0.3

    def test_render_moves_with_pose(self, scene):
        Kj = jnp.asarray(K, jnp.float32)
        L0, _ = render_log_intensity(scene, jnp.eye(4), Kj, W, H)
        L1, _ = render_log_intensity(
            scene, jnp.asarray(linear_pose(0.5), jnp.float32), Kj, W, H)
        assert float(jnp.mean(jnp.abs(L1 - L0))) > 1e-3


class TestSensorModel:
    @pytest.fixture(scope="class")
    def run(self, scene):
        cfg = SensorConfig(background_rate_hz=0.0, num_hot_pixels=0,
                           threshold_fpn_sigma=0.0, refractory_us=50.0)
        rng = np.random.default_rng(0)
        ev, stats = simulate_camera(scene, K, W, H, linear_pose, 0.0, 0.3,
                                    cfg, rng)
        return ev, stats, cfg

    def test_counts_match_contrast_crossings(self, run, scene):
        """Total events ~= sum over pixels of |delta logI| / C along the
        render schedule (each crossing of C emits exactly one event when
        noise/FPN/refractory losses are off)."""
        ev, stats, cfg = run
        assert stats["overflow_dropped"] == 0
        Kj = jnp.asarray(K, jnp.float32)
        steps = np.arange(0.0, 0.3 + 1e-9, cfg.substep_dt)
        expected = np.zeros((H, W))
        ref = np.asarray(render_log_intensity(
            scene, jnp.asarray(linear_pose(0.0), jnp.float32), Kj, W, H)[0])
        # replicate the quantized reference-level update: per substep the
        # pixel absorbs floor(|L - ref| / C) crossings
        for t in steps[1:]:
            L = np.asarray(render_log_intensity(
                scene, jnp.asarray(linear_pose(float(t)), jnp.float32),
                Kj, W, H)[0])
            n = np.floor(np.abs(L - ref) / cfg.contrast_threshold)
            n = np.minimum(n, cfg.max_events_per_px_step)
            expected += n
            ref = ref + np.sign(L - ref) * n * cfg.contrast_threshold
        n_expected = expected.sum()
        assert n_expected > 500, "scene too static for the test"
        # refractory (50 us) loses almost nothing at these rates
        assert abs(len(ev) - n_expected) / n_expected < 0.02

    def test_polarity_tracks_intensity_change(self, run, scene):
        """Each event's polarity must match the sign of the local log-
        intensity change across its substep."""
        ev, stats, cfg = run
        Kj = jnp.asarray(K, jnp.float32)
        sub = np.random.default_rng(1).choice(len(ev), size=400,
                                              replace=False)
        agree = 0
        for i in sub:
            t = ev.t[i]
            t0 = np.floor(t / cfg.substep_dt) * cfg.substep_dt
            L0 = np.asarray(render_log_intensity(
                scene, jnp.asarray(linear_pose(float(t0)), jnp.float32),
                Kj, W, H)[0])[ev.y[i], ev.x[i]]
            L1 = np.asarray(render_log_intensity(
                scene, jnp.asarray(linear_pose(float(t0 + cfg.substep_dt)),
                                   jnp.float32), Kj, W, H)[0])[
                ev.y[i], ev.x[i]]
            if (L1 - L0 >= 0) == bool(ev.p[i]):
                agree += 1
        assert agree / len(sub) > 0.9

    def test_refractory_period_enforced(self, scene):
        cfg = SensorConfig(background_rate_hz=0.0, num_hot_pixels=0,
                           threshold_fpn_sigma=0.0, refractory_us=5000.0)
        ev, _ = simulate_camera(scene, K, W, H, linear_pose, 0.0, 0.25,
                                cfg, np.random.default_rng(0))
        pix = ev.y.astype(np.int64) * W + ev.x
        order = np.lexsort((ev.t, pix))
        same = pix[order][1:] == pix[order][:-1]
        dt = np.diff(ev.t[order])[same]
        assert len(dt) > 50, "need repeated-pixel events to test refractory"
        assert dt.min() >= 5000e-6 - 1e-9

    def test_reproducible_with_same_seed(self, scene):
        cfg = SensorConfig()
        ev1, s1 = simulate_camera(scene, K, W, H, linear_pose, 0.0, 0.1,
                                  cfg, np.random.default_rng(5))
        ev2, s2 = simulate_camera(scene, K, W, H, linear_pose, 0.0, 0.1,
                                  cfg, np.random.default_rng(5))
        assert s1 == s2
        np.testing.assert_array_equal(ev1.t, ev2.t)
        np.testing.assert_array_equal(ev1.x, ev2.x)
        np.testing.assert_array_equal(ev1.p, ev2.p)

    def test_hot_pixels_fire_at_high_rate(self, scene):
        cfg = SensorConfig(background_rate_hz=0.0, num_hot_pixels=2,
                           hot_pixel_rate_hz=1000.0,
                           threshold_fpn_sigma=0.0)
        # static camera: the only activity is the hot pixels
        ev, _ = simulate_camera(scene, K, W, H, lambda t: np.eye(4),
                                0.0, 0.2, cfg, np.random.default_rng(2))
        assert len(ev) > 0
        pix, counts = np.unique(ev.y.astype(np.int64) * W + ev.x,
                                return_counts=True)
        assert len(pix) == 2
        # 1000 Hz cap at 1 kHz substeps => ~one event per substep
        assert counts.min() > 0.5 * 0.2 / cfg.substep_dt

    def test_overflow_counted_and_warned(self, scene):
        cfg = SensorConfig(event_budget_per_step=16,
                           background_rate_hz=0.0, num_hot_pixels=0)
        with pytest.warns(UserWarning, match="budget dropped"):
            ev, stats = simulate_camera(scene, K, W, H, linear_pose,
                                        0.0, 0.2, cfg,
                                        np.random.default_rng(0))
        assert stats["overflow_dropped"] > 0
        assert stats["events"] == len(ev)


class TestTrajectoryAndExport:
    def test_loop_trajectory_closes(self):
        dur = 32.0
        T0 = loop_trajectory_pose(0.0, dur, laps=2)
        np.testing.assert_allclose(T0, np.eye(4), atol=1e-12)
        for t in (dur / 2, dur):  # lap boundary and end
            np.testing.assert_allclose(loop_trajectory_pose(t, dur, laps=2),
                                       T0, atol=1e-9)
        # mid-lap the camera is genuinely away from the start
        Tm = loop_trajectory_pose(dur / 8, dur, laps=2)
        assert np.linalg.norm(Tm[:3, 3]) > 0.3

    def test_export_dataset_roundtrip(self, scene, tmp_path):
        from esvo_tpu.io.datasets import load_rpg_dataset
        from esvo_tpu.geometry.camera import load_rig
        cfg = SensorConfig()
        rng = np.random.default_rng(3)
        baseline = 0.1
        ev_l, ev_r, stats = simulate_stereo(
            scene, K, W, H, baseline, linear_pose, 0.0, 0.1, cfg, rng)
        assert stats["left"]["events"] > 0 and stats["right"]["events"] > 0
        gt_t = np.linspace(0.0, 0.1, 11)
        gt_T = np.stack([linear_pose(t) for t in gt_t])
        out = str(tmp_path / "sim")
        export_dataset(out, scene, K, W, H, baseline, ev_l, ev_r,
                       gt_t, gt_T, meta={"note": "test"})

        l2, r2, t2, T2 = load_rpg_dataset(out)
        assert len(l2) == len(ev_l) and len(r2) == len(ev_r)
        np.testing.assert_array_equal(l2.x, ev_l.x)
        np.testing.assert_allclose(l2.t, ev_l.t, atol=1e-9)
        np.testing.assert_allclose(t2, gt_t, atol=1e-9)
        np.testing.assert_allclose(T2, gt_T, atol=1e-6)

        rig = load_rig(os.path.join(out, "calib"))
        assert float(rig.baseline) == pytest.approx(baseline, abs=1e-6)
        assert rig.left.width == W and rig.left.height == H
        np.testing.assert_allclose(np.asarray(rig.left.params.P)[:, :3], K,
                                   atol=1e-5)
        scene2 = PlaneScene.load(os.path.join(out, "scene.npz"))
        np.testing.assert_allclose(scene2.p0, scene.p0)
