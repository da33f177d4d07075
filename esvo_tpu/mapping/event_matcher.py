"""Temporal event-to-event stereo matching (GTS, Ieng et al. 2018).

Re-designs the reference's ``EventMatcher``
(esvo_core/src/core/EventMatcher.cpp) — the comparison method used by
MVStereo modes 0 and 2 (esvo_MVStereo.h:43-50). For each left event the
reference scans right events inside a +-Time_THRESHOLD/2 window, filters
by polarity and epipolar distance, then picks the candidate whose
triangulated depth best explains both time surfaces (ZNCC motion check,
EventMatcher.cpp:66-162).

TPU design: right events are sorted by (epipolar row band, time) per
polarity, so each left event's candidates form a small set of contiguous
index ranges — one temporal window per row band its epipolar interval
touches. Windowing on time alone collapses on dense/bursty streams: at
the campaign's 480k ev/s the +-25 us window holds ~270 same-polarity
candidates (mean; p99 470), so a K=32 temporal window silently dropped
88 % of them (r5 measurement, scripts/measure_em_overflow.py) — while
after the row-band split the same window holds only the 2-3 candidates
that can actually pass the |dy| <= 0.5 px epipolar gate
(EventMatcher.cpp:91-106 applies the same gate per candidate). Overflow
beyond the K slots is still counted, not silently ignored. All N x K
candidate checks, warpings and patch ZNCCs evaluate as one batched
program.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from esvo_tpu.geometry.camera import StereoRig, cam_to_world
from esvo_tpu.mapping.block_matching import EventMatches
from esvo_tpu.ops.interp import patch_interpolate


@struct.dataclass
class EventMatcherConfig:
    """Defaults: esvo_MVStereo.cpp EventMatcher construction params."""
    time_threshold: float = struct.field(pytree_node=False, default=5e-5)
    epipolar_threshold: float = struct.field(pytree_node=False, default=0.5)
    ts_ncc_threshold: float = struct.field(pytree_node=False, default=0.1)
    patch_size_x: int = struct.field(pytree_node=False, default=25)
    patch_size_y: int = struct.field(pytree_node=False, default=25)
    # candidate slots per left event, split over the NB epipolar row
    # bands. Measured on the 480k ev/s campaign stream
    # (scripts/measure_em_overflow.py): in-band in-window candidates
    # mean 1.7 / p99 6; 64 slots (32/band) lose 0.5 % of candidates to
    # hot-row bursts (32 slots: 1.3 %)
    max_candidates: int = struct.field(pytree_node=False, default=64)


def match_events_temporal(*args, **kwargs) -> EventMatches:
    """match_events_temporal_stats without the stats dict."""
    return match_events_temporal_stats(*args, **kwargs)[0]


def match_events_temporal_stats(
        ts_left: jax.Array, ts_right: jax.Array,
        left_x_rect: jax.Array, left_t: jax.Array, left_p: jax.Array,
        left_valid: jax.Array, T_left_rv: jax.Array,
        right_x_rect: jax.Array, right_t: jax.Array, right_p: jax.Array,
        right_valid: jax.Array, rig: StereoRig,
        cfg: EventMatcherConfig):
    """Match N left events against M time-sorted right events.

    Args:
      left_x_rect: (N, 2) rectified left event coords.
      T_left_rv: (N, 4, 4) per-event transform virtual frame -> left cam
        frame at TS time.
      right_x_rect/right_t/right_p: (M,) sorted-by-time right events
        (invalid lanes at the tail, io/events.frame_events layout).
    Returns (EventMatches (N,) with triangulated inverse depth,
    stats dict with 'window_overflow' — same-polarity in-window
    candidates lost to the fixed K-slot window).
    """
    N = left_x_rect.shape[0]
    K = cfg.max_candidates
    H, W = ts_left.shape
    dtype = ts_left.dtype
    wx, wy = cfg.patch_size_x, cfg.patch_size_y

    # (band, time) window -> candidate indices (EventMatcher.cpp:66-89
    # + the |dy| epipolar gate of :91-106 folded into the windowing).
    # Wrinkles vs a raw searchsorted:
    # (a) invalid lanes of the fixed-capacity frame hold t=0 at the
    #     tail (io/events.frame_events) and would inflate lo;
    # (b) wrong-polarity events would consume candidate slots;
    # (c) on dense streams the temporal window alone holds hundreds of
    #     candidates, nearly all of which fail the epipolar gate.
    # So build one (row-band, time)-sorted ordering PER POLARITY
    # (invalid/other-polarity keys pushed past the end) and window
    # inside each row band the left event's epipolar interval touches.
    # Composite int32 sort key: band << T_BITS | rel-time microseconds
    # (exact ordering — no float-precision aliasing between bands).
    t_lo = left_t - cfg.time_threshold / 2
    t_hi = left_t + cfg.time_threshold / 2
    M = right_t.shape[0]
    e = cfg.epipolar_threshold
    # row bands touched by [y - e, y + e]: floor(y - e) .. floor(y + e);
    # floor(y + 2e') - floor(y) <= ceil(2e) for any y, so NB bands
    # starting at floor(y - e) always cover the interval
    NB = int(np.ceil(2 * e)) + 1
    Kb = max(K // NB, 1)                 # slots per band
    T_BITS = 21                          # rel-time in us < 2^21 (~2.1 s)
    t0 = jnp.minimum(jnp.min(jnp.where(right_valid, right_t, jnp.inf)),
                     jnp.min(t_lo))
    t0 = jnp.where(jnp.isfinite(t0), t0, 0.0)

    def us(t):
        return jnp.clip(((t - t0) * 1e6).astype(jnp.int32), 0,
                        (1 << T_BITS) - 1)

    band_r = jnp.floor(right_x_rect[:, 1]).astype(jnp.int32)
    band_r = jnp.clip(band_r, 0, H)
    BIG = jnp.int32((H + 2) << T_BITS)

    def polarity_order(sel):
        key = jnp.where(sel, (band_r << T_BITS) | us(right_t), BIG)
        order = jnp.argsort(key)                 # stable; BIG tail
        return order, key[order]

    ord_pos, key_pos = polarity_order(right_valid & right_p)
    ord_neg, key_neg = polarity_order(right_valid & ~right_p)

    bands_l = (jnp.floor(left_x_rect[:, 1] - e).astype(jnp.int32)[:, None]
               + jnp.arange(NB, dtype=jnp.int32)[None, :])      # (N, NB)
    bands_l = jnp.clip(bands_l, 0, H)
    q_lo = (bands_l << T_BITS) | us(t_lo)[:, None]              # (N, NB)
    q_hi = (bands_l << T_BITS) | us(t_hi)[:, None]

    def bounds(keys):
        lo = jnp.searchsorted(keys, q_lo.reshape(-1), side="left",
                              method="sort").reshape(q_lo.shape)
        hi = jnp.searchsorted(keys, q_hi.reshape(-1), side="right",
                              method="sort").reshape(q_hi.shape)
        return lo, hi

    lo_p, hi_p = bounds(key_pos)
    lo_n, hi_n = bounds(key_neg)
    lo = jnp.where(left_p[:, None], lo_p, lo_n)                 # (N, NB)
    hi = jnp.where(left_p[:, None], hi_p, hi_n)
    # candidates lost to the fixed per-band slot budget (docstring
    # contract; the overflow counter keeps the truncation observable)
    window_overflow = jnp.sum(
        jnp.where(left_valid[:, None], jnp.maximum(hi - lo - Kb, 0), 0))

    # gather Kb slots per band, concatenated to (N, NB*Kb <= K)
    win = (lo[:, :, None]
           + jnp.arange(Kb, dtype=lo.dtype)[None, None, :])    # (N, NB, Kb)
    in_range = win < hi[:, :, None]
    win = win.reshape(N, NB * Kb)
    in_range = in_range.reshape(N, NB * Kb)
    win_c = jnp.clip(win, 0, M - 1)
    idx_c = jnp.where(left_p[:, None], ord_pos[win_c], ord_neg[win_c])
    c_t = right_t[idx_c]
    c_ok = (in_range
            & (c_t >= t_lo[:, None]) & (c_t <= t_hi[:, None])
            & left_valid[:, None])

    # epipolar check (EventMatcher.cpp:91-106)
    c_xr = right_x_rect[idx_c]                                   # (N, K, 2)
    xl = left_x_rect
    c_ok = c_ok & (jnp.abs(xl[:, None, 1] - c_xr[..., 1])
                   <= cfg.epipolar_threshold) \
        & (c_xr[..., 0] < xl[:, None, 0])

    # motion-consistency check: triangulate, warp into both TS, ZNCC
    # (EventMatcher.cpp:110-162)
    b = rig.baseline
    f = rig.left.params.P[0, 0]
    disp = xl[:, None, 0] - c_xr[..., 0]
    depth = b * f / jnp.maximum(disp, 1e-6)
    inv_depth = 1.0 / depth

    P_left = rig.left.params.P
    P_right = rig.right.params.P

    def warp_one(x, d, T):
        p_rv = cam_to_world(P_left, x, d)
        p_left = T[:3, :3] @ p_rv + T[:3, 3]
        x1h = P_left[:, :3] @ p_left + P_left[:, 3]
        x2h = P_right[:, :3] @ p_left + P_right[:, 3]
        return x1h[:2] / x1h[2], x2h[:2] / x2h[2]

    x1, x2 = jax.vmap(jax.vmap(warp_one, in_axes=(None, 0, None)),
                      in_axes=(0, 0, 0))(xl, inv_depth, T_left_rv)

    # patch_interpolate's containment check (ul >= 0, ul + w < size) is
    # strictly tighter than any separate warp-bounds test
    p1, ok1 = patch_interpolate(ts_left, x1, wy, wx)    # (N, K, wy, wx)
    p2, ok2 = patch_interpolate(ts_right, x2, wy, wx)
    c_ok = c_ok & ok1 & ok2

    def znorm(p):
        mu = jnp.mean(p, axis=(-2, -1), keepdims=True)
        sd = jnp.sqrt(jnp.mean((p - mu) ** 2, axis=(-2, -1),
                               keepdims=True)) + 1e-6
        return (p - mu) / sd

    ncc = jnp.mean(znorm(p1) * znorm(p2), axis=(-2, -1))
    cost = 0.5 * (1.0 - ncc)                                    # (N, K)
    cost = jnp.where(c_ok, cost, 1.0)

    best = jnp.argmin(cost, axis=1)
    best_cost = jnp.take_along_axis(cost, best[:, None], axis=1)[:, 0]
    best_ok = jnp.take_along_axis(c_ok, best[:, None], axis=1)[:, 0]
    matched = best_ok & (best_cost <= cfg.ts_ncc_threshold)

    take = lambda a: jnp.take_along_axis(a, best[:, None, None], axis=1)[:, 0]
    x_right = take(c_xr)
    best_inv = jnp.take_along_axis(inv_depth, best[:, None], axis=1)[:, 0]
    disp_best = jnp.take_along_axis(disp, best[:, None], axis=1)[:, 0]

    matches = EventMatches(
        x_left=xl, x_left_raw=xl, x_right=x_right, t=left_t,
        inv_depth=jnp.where(matched, best_inv, 0.0),
        cost=jnp.where(matched, best_cost, 1.0).astype(dtype),
        disparity=jnp.where(matched, disp_best, 0.0).astype(dtype),
        valid=matched)
    return matches, {"window_overflow": window_overflow.astype(jnp.int32)}
