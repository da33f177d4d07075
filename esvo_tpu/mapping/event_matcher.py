"""Temporal event-to-event stereo matching (GTS, Ieng et al. 2018).

Re-designs the reference's ``EventMatcher``
(esvo_core/src/core/EventMatcher.cpp) — the comparison method used by
MVStereo modes 0 and 2 (esvo_MVStereo.h:43-50). For each left event the
reference scans right events inside a +-Time_THRESHOLD/2 window, filters
by polarity and epipolar distance, then picks the candidate whose
triangulated depth best explains both time surfaces (ZNCC motion check,
EventMatcher.cpp:66-162).

TPU design: right events are sorted by time, so the temporal window is a
contiguous index range — each left event gathers a fixed window of K
candidate slots around its searchsorted position (overflow beyond K is
dropped and counted, not silently ignored). All N x K candidate checks,
warpings and patch ZNCCs evaluate as one batched program.
"""
from __future__ import annotations

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
    max_candidates: int = struct.field(pytree_node=False, default=32)


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

    # temporal window -> contiguous candidate indices
    # (EventMatcher.cpp:66-89). Two wrinkles vs a raw searchsorted:
    # (a) invalid lanes of the fixed-capacity frame hold t=0 at the
    #     tail (io/events.frame_events) and would inflate lo;
    # (b) wrong-polarity events would consume candidate slots.
    # So build one time-sorted ordering PER POLARITY (invalid/other-
    # polarity keys pushed to +inf) and window inside the matching one.
    t_lo = left_t - cfg.time_threshold / 2
    t_hi = left_t + cfg.time_threshold / 2
    M = right_t.shape[0]

    def polarity_order(sel):
        key = jnp.where(sel, right_t, jnp.inf)
        order = jnp.argsort(key)                 # stable; inf tail
        return order, key[order], jnp.sum(sel)

    ord_pos, key_pos, n_pos = polarity_order(right_valid & right_p)
    ord_neg, key_neg, n_neg = polarity_order(right_valid & ~right_p)
    lo_pos = jnp.searchsorted(key_pos, t_lo, side="left", method="sort")
    lo_neg = jnp.searchsorted(key_neg, t_lo, side="left", method="sort")
    hi_pos = jnp.searchsorted(key_pos, t_hi, side="right", method="sort")
    hi_neg = jnp.searchsorted(key_neg, t_hi, side="right", method="sort")
    lo = jnp.where(left_p, lo_pos, lo_neg)
    hi = jnp.where(left_p, hi_pos, hi_neg)
    n_same = jnp.where(left_p, n_pos, n_neg)
    # candidates lost to the fixed K-slot window (docstring contract)
    window_overflow = jnp.sum(
        jnp.where(left_valid, jnp.maximum(hi - lo - K, 0), 0))

    win = lo[:, None] + jnp.arange(K, dtype=lo.dtype)[None, :]   # (N, K)
    in_range = win < n_same[:, None]
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
