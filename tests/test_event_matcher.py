"""Tests for temporal event-to-event matching (GTS)."""
import numpy as np
import jax.numpy as jnp

from esvo_tpu.geometry.camera import make_ideal_rig
from esvo_tpu.mapping.event_matcher import (EventMatcherConfig,
                                            match_events_temporal)

W, H = 128, 96
FX = 100.0
BASELINE = 0.1


def rig():
    return make_ideal_rig(W, H, FX, FX, W / 2 - 0.5, H / 2 - 0.5, BASELINE,
                          dtype=jnp.float64)


def test_matches_correct_disparity_candidate():
    rng = np.random.default_rng(0)
    r = rig()
    disp_true = 8.0
    depth = BASELINE * FX / disp_true

    # textured surfaces consistent with that depth
    base = rng.uniform(0, 255, size=(H, W + 32))
    k = np.ones(3) / 3
    base = np.apply_along_axis(lambda q: np.convolve(q, k, "same"), 1, base)
    ts_l = base[:, 16:16 + W]
    ts_r = base[:, 16 + int(disp_true):16 + int(disp_true) + W]

    N = 40
    lx = np.stack([rng.uniform(30, W - 20, N), rng.uniform(20, H - 20, N)],
                  axis=1)
    lt = np.sort(rng.uniform(0.0, 1e-3, N))
    lp = rng.random(N) > 0.5

    # right candidates: one true correspondence per left event (same time,
    # same polarity, correct disparity) + decoys at wrong rows/disparities
    rx, rt, rp = [], [], []
    for i in range(N):
        rx.append([lx[i, 0] - disp_true, lx[i, 1]])
        rt.append(lt[i])
        rp.append(lp[i])
        rx.append([lx[i, 0] - disp_true - 14.0, lx[i, 1] + 3.0])  # decoy
        rt.append(lt[i])
        rp.append(lp[i])
    order = np.argsort(rt, kind="stable")
    rx = np.asarray(rx)[order]
    rt = np.asarray(rt)[order]
    rp = np.asarray(rp)[order]

    cfg = EventMatcherConfig(time_threshold=1e-4, epipolar_threshold=0.5,
                             ts_ncc_threshold=0.2, patch_size_x=15,
                             patch_size_y=15, max_candidates=16)
    T_lv = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float64), (N, 4, 4))
    out = match_events_temporal(
        jnp.asarray(ts_l), jnp.asarray(ts_r), jnp.asarray(lx),
        jnp.asarray(lt), jnp.asarray(lp), jnp.ones(N, bool), T_lv,
        jnp.asarray(rx), jnp.asarray(rt), jnp.asarray(rp),
        jnp.ones(len(rt), bool), r, cfg)

    v = np.asarray(out.valid)
    assert v.mean() > 0.7, f"only {v.mean():.2f} matched"
    want_inv = 1.0 / depth
    got = np.asarray(out.inv_depth)[v]
    np.testing.assert_allclose(got, want_inv, rtol=1e-6)


def test_padded_tail_and_mixed_polarity_buffers():
    """Runtime frames are zero-padded at the tail (valid=False, t=0) and
    mix polarities: padding must not shift the temporal window
    (searchsorted over the raw t would count every padding zero), and
    wrong-polarity events must not consume candidate slots."""
    rng = np.random.default_rng(3)
    r = rig()
    disp_true = 8.0
    base = rng.uniform(0, 255, size=(H, W + 32))
    k = np.ones(3) / 3
    base = np.apply_along_axis(lambda q: np.convolve(q, k, "same"), 1, base)
    ts_l = base[:, 16:16 + W]
    ts_r = base[:, 16 + int(disp_true):16 + int(disp_true) + W]

    N = 16
    lx = np.stack([rng.uniform(30, W - 20, N), rng.uniform(20, H - 20, N)],
                  axis=1)
    lt = np.sort(rng.uniform(1e-4, 1e-3, N))
    lp = np.ones(N, bool)
    # true correspondences, PRECEDED (in slot order after sorting) by a
    # burst of wrong-polarity events at the same times — with
    # max_candidates=2 they would exhaust the window if counted
    rx, rt, rp = [], [], []
    for i in range(N):
        for _ in range(4):  # wrong-polarity burst
            rx.append([lx[i, 0] - 30.0, lx[i, 1]])
            rt.append(lt[i] - 1e-6)
            rp.append(False)
        rx.append([lx[i, 0] - disp_true, lx[i, 1]])
        rt.append(lt[i])
        rp.append(True)
    order = np.argsort(rt, kind="stable")
    rx = np.asarray(rx)[order]
    rt = np.asarray(rt)[order]
    rp = np.asarray(rp)[order]
    # zero-padded tail like io.events.frame_events
    M = len(rt)
    pad = 64
    rx = np.concatenate([rx, np.zeros((pad, 2))])
    rt = np.concatenate([rt, np.zeros(pad)])
    rp = np.concatenate([rp, np.zeros(pad, bool)])
    rv = np.concatenate([np.ones(M, bool), np.zeros(pad, bool)])

    cfg = EventMatcherConfig(time_threshold=1e-4, epipolar_threshold=0.5,
                             ts_ncc_threshold=0.2, patch_size_x=15,
                             patch_size_y=15, max_candidates=2)
    T_lv = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float64), (N, 4, 4))
    out = match_events_temporal(
        jnp.asarray(ts_l), jnp.asarray(ts_r), jnp.asarray(lx),
        jnp.asarray(lt), jnp.asarray(lp), jnp.ones(N, bool), T_lv,
        jnp.asarray(rx), jnp.asarray(rt), jnp.asarray(rp),
        jnp.asarray(rv), r, cfg)
    v = np.asarray(out.valid)
    assert v.mean() > 0.7, f"only {v.mean():.2f} matched"
    np.testing.assert_allclose(np.asarray(out.disparity)[v], disp_true,
                               rtol=1e-6)


def test_window_overflow_counted():
    from esvo_tpu.mapping.event_matcher import match_events_temporal_stats
    r = rig()
    ts = jnp.zeros((H, W), jnp.float64)
    lx = jnp.asarray([[60.0, 40.0]])
    lt = jnp.asarray([5e-4])
    T_lv = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float64), (1, 4, 4))
    cfg = EventMatcherConfig(time_threshold=1e-3, max_candidates=4)
    # 10 same-polarity in-window candidates, all in ONE row band; the
    # K=4 slots split over NB=2 epipolar bands -> 2 slots in the
    # populated band -> 8 dropped and counted
    M = 10
    rx = jnp.tile(jnp.asarray([[50.0, 40.0]]), (M, 1))
    rt = jnp.linspace(1e-4, 9e-4, M)
    _, stats = match_events_temporal_stats(
        ts, ts, lx, lt, jnp.asarray([True]), jnp.ones(1, bool), T_lv,
        rx, rt, jnp.ones(M, bool), jnp.ones(M, bool), r, cfg)
    assert int(stats["window_overflow"]) == 8


def test_band_window_ignores_off_row_clutter():
    """Dense same-polarity clutter on OTHER rows must consume no
    candidate slots: the (row-band, time) windowing admits only events
    that can pass the epipolar gate (r5; a purely temporal window
    dropped 88% of in-window candidates on the 480k ev/s campaign
    stream, scripts/measure_em_overflow.py)."""
    from esvo_tpu.mapping.event_matcher import match_events_temporal_stats
    r = rig()
    base = np.zeros((H, W))
    base[:, ::6] = 200.0          # vertical stripes: textured patches
    ts_l = jnp.asarray(base)
    ts_r = jnp.asarray(np.roll(base, -10, axis=1))
    lx = jnp.asarray([[60.0, 40.0]])
    lt = jnp.asarray([5e-4])
    T_lv = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float64), (1, 4, 4))
    cfg = EventMatcherConfig(time_threshold=1e-3, max_candidates=8,
                             ts_ncc_threshold=0.6, patch_size_x=9,
                             patch_size_y=9)
    # one true candidate on the epipolar row + 500 clutter events spread
    # over distant rows, ALL inside the temporal window and earlier in
    # time (a temporal-only window would fill every slot with clutter)
    rng = np.random.default_rng(0)
    M = 501
    rx = np.stack([rng.uniform(20, 100, M),
                   rng.uniform(60, 80, M)], axis=1)
    rx[0] = [50.0, 40.0]                        # the genuine match
    rt = np.full(M, 4e-4)
    rt[0] = 5e-4
    order = np.argsort(rt, kind="stable")
    matches, stats = match_events_temporal_stats(
        ts_l, ts_r, lx, lt, jnp.asarray([True]), jnp.ones(1, bool), T_lv,
        jnp.asarray(rx[order]), jnp.asarray(rt[order]),
        jnp.ones(M, bool), jnp.ones(M, bool), r, cfg)
    assert bool(matches.valid[0])
    assert abs(float(matches.disparity[0]) - 10.0) < 1e-6
    assert int(stats["window_overflow"]) == 0


def test_polarity_and_epipolar_rejection():
    r = rig()
    ts = jnp.zeros((H, W), jnp.float64) + 100.0
    lx = jnp.asarray([[60.0, 40.0]])
    lt = jnp.asarray([0.0])
    T_lv = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float64), (1, 4, 4))
    cfg = EventMatcherConfig(time_threshold=1e-4, epipolar_threshold=0.5,
                             ts_ncc_threshold=0.9, patch_size_x=5,
                             patch_size_y=5, max_candidates=8)

    def run(rx, rp):
        return match_events_temporal(
            ts, ts, lx, lt, jnp.asarray([True]), jnp.ones(1, bool), T_lv,
            jnp.asarray(rx), jnp.zeros(len(rx)), jnp.asarray(rp),
            jnp.ones(len(rx), bool), r, cfg)

    # wrong polarity -> no match
    out = run([[52.0, 40.0]], [False])
    assert not bool(out.valid[0])
    # epipolar violation (|dy| > threshold) -> no match
    out = run([[52.0, 43.0]], [True])
    assert not bool(out.valid[0])
    # right-of-left (negative disparity) -> no match
    out = run([[70.0, 40.0]], [True])
    assert not bool(out.valid[0])
