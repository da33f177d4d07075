import numpy as np
import jax
import jax.numpy as jnp

from esvo_tpu.geometry import make_ideal_camera
from esvo_tpu.surface import (
    EventBatch, TimeSurfaceConfig, init_state, insert_events,
    render_backward, render_forward, roll_ticks, median_blur_3x3,
    gaussian_blur, sobel_x, sobel_y,
)
from tests.golden.time_surface_np import (
    golden_backward_surface, median_3x3_replicate,
)

H, W = 24, 32
CAM = make_ideal_camera(W, H, 30.0, 30.0, W / 2, H / 2, dtype=jnp.float64)


def _random_events(rng, n, t_max=0.1):
    t = np.sort(rng.uniform(0, t_max, n))
    x = rng.integers(0, W, n)
    y = rng.integers(0, H, n)
    p = rng.random(n) > 0.5
    return t, x, y, p


class TestBackwardGolden:
    def _run_both(self, ignore_polarity, seed=0, n=400):
        rng = np.random.default_rng(seed)
        t, x, y, p = _random_events(rng, n)
        t_sync = 0.1
        cfg = TimeSurfaceConfig(decay_sec=0.03,
                                ignore_polarity=ignore_polarity,
                                median_blur_kernel_size=1)
        st = init_state(H, W)
        st = insert_events(st, EventBatch.from_arrays(x, y, t, p))
        ours = np.asarray(render_backward(st, t_sync, CAM, cfg))
        golden = golden_backward_surface(
            list(zip(t, x, y, p)), t_sync, H, W, 0.03,
            ignore_polarity=ignore_polarity, median_blur=True,
            inv_map=np.asarray(CAM.inv_map))
        return ours, golden

    def test_matches_golden_ignore_polarity(self):
        ours, golden = self._run_both(True)
        np.testing.assert_allclose(ours, golden, atol=1e-6)

    def test_matches_golden_with_polarity(self):
        ours, golden = self._run_both(False, seed=1)
        np.testing.assert_allclose(ours, golden, atol=1e-6)

    def test_masked_events_ignored(self):
        cfg = TimeSurfaceConfig()
        st = init_state(H, W)
        ev = EventBatch.from_arrays([5, 6], [5, 6], [0.05, 0.05],
                                    [True, True], valid=[True, False])
        st = insert_events(st, ev)
        surf = np.asarray(render_backward(st, 0.05, CAM,
                                          TimeSurfaceConfig(
                                              median_blur_kernel_size=0)))
        np.testing.assert_allclose(surf[5, 5], 255.0, atol=1e-6)
        np.testing.assert_allclose(surf[6, 6], 0.0, atol=1e-6)

    def test_out_of_bounds_events_ignored(self):
        st = init_state(H, W)
        ev = EventBatch.from_arrays([-1, W, 3], [0, 0, 3],
                                    [0.05, 0.05, 0.05],
                                    [True, True, True])
        st = insert_events(st, ev)
        surf = np.asarray(render_backward(
            st, 0.05, CAM, TimeSurfaceConfig(median_blur_kernel_size=0)))
        np.testing.assert_allclose(surf.sum(), surf[3, 3], atol=1e-6)

    def test_decay_value(self):
        st = init_state(H, W)
        st = insert_events(st, EventBatch.from_arrays([10], [10], [0.0],
                                                      [True]))
        cfg = TimeSurfaceConfig(decay_sec=0.03, median_blur_kernel_size=0)
        surf = np.asarray(render_backward(st, 0.03, CAM, cfg))
        np.testing.assert_allclose(surf[10, 10],
                                   np.rint(255 * np.exp(-1.0)), atol=1e-6)

    def test_latest_event_wins(self):
        st = init_state(H, W)
        st = insert_events(st, EventBatch.from_arrays(
            [7, 7], [7, 7], [0.01, 0.02], [False, True]))
        cfg = TimeSurfaceConfig(decay_sec=0.03, ignore_polarity=False,
                                median_blur_kernel_size=0)
        surf = np.asarray(render_backward(st, 0.02, CAM, cfg))
        # latest is positive: value = 255*(exp(0)+1)/2 = 255
        np.testing.assert_allclose(surf[7, 7], 255.0, atol=1e-6)


class TestRollTicks:
    def test_scan_equals_sequential(self):
        rng = np.random.default_rng(2)
        K, N = 4, 64
        t = np.sort(rng.uniform(0, 0.04, (K, N)), axis=1)
        # force frame k's events into (0.01k, 0.01(k+1)]
        t = 0.01 * (np.arange(K)[:, None] + t / 0.04 * 0.99)
        x = rng.integers(0, W, (K, N))
        y = rng.integers(0, H, (K, N))
        p = rng.random((K, N)) > 0.5
        sync = jnp.asarray(0.01 * (np.arange(K) + 1))
        frames = EventBatch.from_arrays(x, y, t, p)
        cfg = TimeSurfaceConfig()
        st0 = init_state(H, W)
        _, surfs = roll_ticks(st0, frames, sync, CAM, cfg)
        st = st0
        for k in range(K):
            fk = EventBatch.from_arrays(x[k], y[k], t[k], p[k])
            st = insert_events(st, fk)
            expected = render_backward(st, sync[k], CAM, cfg)
            np.testing.assert_allclose(np.asarray(surfs[k]),
                                       np.asarray(expected), atol=0)


class TestFilters:
    def test_median_blur_matches_golden(self):
        rng = np.random.default_rng(3)
        img = rng.uniform(0, 255, (H, W))
        ours = np.asarray(median_blur_3x3(jnp.asarray(img)))
        np.testing.assert_allclose(ours, median_3x3_replicate(img), atol=0)

    def test_gaussian_kernel_binomial5(self):
        # impulse response of the 5-tap OpenCV small kernel
        img = np.zeros((11, 11))
        img[5, 5] = 16.0
        out = np.asarray(gaussian_blur(jnp.asarray(img), 5))
        expected_row = np.array([1, 4, 6, 4, 1]) / 16.0
        np.testing.assert_allclose(out[5, 3:8], 16 * expected_row * 0.375,
                                   atol=1e-12)
        np.testing.assert_allclose(out.sum(), 16.0, atol=1e-9)

    def test_sobel_gradient_of_ramp(self):
        # horizontal ramp: sobel_x = 8*slope, sobel_y = 0 (interior)
        xs = np.arange(W, dtype=float)
        img = np.tile(3.0 * xs, (H, 1))
        gx = np.asarray(sobel_x(jnp.asarray(img)))
        gy = np.asarray(sobel_y(jnp.asarray(img)))
        np.testing.assert_allclose(gx[2:-2, 2:-2], 8 * 3.0, atol=1e-9)
        np.testing.assert_allclose(gy[2:-2, 2:-2], 0.0, atol=1e-9)


class TestForward:
    def test_single_event_integer_lut(self):
        st = init_state(H, W)
        st = insert_events(st, EventBatch.from_arrays([9], [11], [0.05],
                                                      [True]))
        cfg = TimeSurfaceConfig(mode="forward", median_blur_kernel_size=0)
        surf = np.asarray(render_forward(st, 0.05, CAM, cfg))
        # ideal camera: LUT is identity, whole weight lands on (11, 9)
        np.testing.assert_allclose(surf[11, 9], 255.0, atol=1e-6)
        np.testing.assert_allclose(surf.sum(), 255.0, atol=1e-5)

    def test_clamp_at_one(self):
        # two raw pixels whose rectified coords coincide cannot exceed 255
        st = init_state(H, W)
        st = insert_events(st, EventBatch.from_arrays(
            [4, 5], [4, 4], [0.05, 0.05], [True, True]))
        cfg = TimeSurfaceConfig(mode="forward", median_blur_kernel_size=0)
        surf = np.asarray(render_forward(st, 0.05, CAM, cfg))
        assert surf.max() <= 255.0


class TestJit:
    def test_insert_render_jits(self):
        cfg = TimeSurfaceConfig()

        @jax.jit
        def go(st, ev, ts):
            st = insert_events(st, ev)
            return st, render_backward(st, ts, CAM, cfg)

        st = init_state(H, W)
        ev = EventBatch.from_arrays([1], [1], [0.01], [True])
        st, surf = go(st, ev, 0.02)
        assert surf.shape == (H, W)
