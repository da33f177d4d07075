"""Stereo block matching over time surfaces — dense, batched, TPU-first.

Re-designs the reference's ``EventBM`` (esvo_core/src/core/EventBM.cpp).
The reference walks each event through a coarse-to-fine scalar epipolar
search with per-patch ZNCC (EventBM.cpp:119-138,170-226), striped over CPU
threads. Here *all* events evaluate *all* disparities simultaneously:

- one gather produces, per event, a (wy, wx + D - 1) strip of the right
  time surface covering every candidate patch;
- each disparity's patch is a static slice of the strip, so the cost
  volume (N, D) is pure vector compute with no data-dependent control flow;
- the coarse+fine two-pass search collapses to a masked argmin (with the
  reference's default step=1 the passes are equivalent; for step>1 our
  dense search is a strict superset of the sampled search).

Matching rules preserved from the reference:
- rectified coordinate bounds + valid-pixel mask test (EventBM.cpp:88-95),
- patch-interior test keeping one pixel margin for later interpolation
  (EventBM.cpp:251-267),
- low "info-noise ratio" rejection: >95% of left patch below 1
  (EventBM.cpp:104-109),
- ZNCC cost 0.5*(1 - ncc) on mean/sigma-normalized patches
  (EventBM.cpp:317-333, tools/utils.h:74-92),
- acceptance threshold on min cost, disparity -> depth via b*f/d
  (EventBM.cpp:141-152),
- optional vertical-baseline configuration (bUpDownConfiguration,
  EventBM.cpp:181-184) via a transposed search axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from esvo_tpu.geometry.camera import StereoRig
from esvo_tpu.surface.time_surface import gaussian_blur
from esvo_tpu.ops.interp import gather2d, slice_patches


@struct.dataclass
class BlockMatchConfig:
    patch_size_x: int = struct.field(pytree_node=False, default=15)
    patch_size_y: int = struct.field(pytree_node=False, default=7)
    min_disparity: int = struct.field(pytree_node=False, default=1)
    max_disparity: int = struct.field(pytree_node=False, default=40)
    step: int = struct.field(pytree_node=False, default=1)
    zncc_threshold: float = struct.field(pytree_node=False, default=0.1)
    up_down: bool = struct.field(pytree_node=False, default=False)
    smooth_time_surface: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class EventMatches:
    """Fixed-capacity result of stereo matching (reference EventMatchPair,
    esvo_core/container/EventMatchPair.h:16-38)."""
    x_left: jax.Array       # (N, 2) rectified left coordinate (f32)
    x_left_raw: jax.Array   # (N, 2) raw left coordinate
    x_right: jax.Array      # (N, 2) rectified right coordinate (integer pos)
    t: jax.Array            # (N,) event timestamps
    inv_depth: jax.Array    # (N,) triangulated inverse depth (BM init)
    cost: jax.Array         # (N,) ZNCC cost of the best match
    disparity: jax.Array    # (N,) best disparity
    valid: jax.Array        # (N,) bool


def derive_disparity_bounds(rig: StereoRig, inv_depth_min: float,
                            inv_depth_max: float,
                            cfg: BlockMatchConfig) -> tuple[int, int]:
    """Disparity search range from the inverse-depth range:
    d = f*b*invDepth, clamped to the configured bounds
    (reference: esvo_core/src/esvo_Mapping.cpp:110-116)."""
    import numpy as np
    P = np.asarray(rig.left.params.P, dtype=np.float64)
    f = 0.5 * (P[0, 0] + P[1, 1])
    b = float(rig.baseline)
    lo = max(int(np.floor(f * b * inv_depth_min)), 0)
    hi = int(np.ceil(f * b * inv_depth_max))
    lo = max(lo, cfg.min_disparity)
    hi = min(hi, cfg.max_disparity)
    return lo, hi


def _normalize(patch: jax.Array, axis) -> jax.Array:
    """Mean/sigma patch normalization with the reference's +1e-6 sigma
    epsilon (tools/utils.h:74-92)."""
    mean = jnp.mean(patch, axis=axis, keepdims=True)
    centered = patch - mean
    sigma = jnp.sqrt(jnp.mean(centered * centered, axis=axis,
                              keepdims=True)) + 1e-6
    return centered / sigma


def match_events(ts_left: jax.Array, ts_right: jax.Array,
                 x_rect: jax.Array, x_raw: jax.Array, t: jax.Array,
                 valid: jax.Array, mask: jax.Array, rig: StereoRig,
                 cfg: BlockMatchConfig) -> EventMatches:
    """Match N events against the right time surface over the full disparity
    range in one batched program.

    Args:
      ts_left/ts_right: (H, W) f32 time surfaces (0..255).
      x_rect: (N, 2) rectified left event coords (from the LUT).
      x_raw: (N, 2) raw event coords (carried through for parity with
        EventMatchPair.x_left_raw_).
      t: (N,) event timestamps.
      valid: (N,) input mask.
      mask: (H, W) bool valid-pixel mask of the left camera.
    """
    if cfg.up_down:
        # vertical baseline: search along y by transposing the problem
        ts_left = ts_left.T
        ts_right = ts_right.T
        mask = mask.T
        x_rect = x_rect[:, ::-1]
        out = _match_horizontal(ts_left, ts_right, x_rect, t, valid, mask,
                                rig, cfg, swap_patch=True)
        return EventMatches(
            x_left=x_rect[:, ::-1], x_left_raw=x_raw,
            x_right=out.x_right[:, ::-1], t=t, inv_depth=out.inv_depth,
            cost=out.cost, disparity=out.disparity, valid=out.valid)
    out = _match_horizontal(ts_left, ts_right, x_rect, t, valid, mask, rig,
                            cfg, swap_patch=False)
    return EventMatches(x_left=x_rect, x_left_raw=x_raw, x_right=out.x_right,
                        t=t, inv_depth=out.inv_depth, cost=out.cost,
                        disparity=out.disparity, valid=out.valid)


def _match_horizontal(ts_left, ts_right, x_rect, t, valid, mask, rig, cfg,
                      swap_patch: bool) -> EventMatches:
    H, W = ts_left.shape
    wx = cfg.patch_size_y if swap_patch else cfg.patch_size_x
    wy = cfg.patch_size_x if swap_patch else cfg.patch_size_y
    hx, hy = (wx - 1) // 2, (wy - 1) // 2
    dmin, dmax = cfg.min_disparity, cfg.max_disparity
    D = dmax - dmin + 1
    dtype = ts_left.dtype

    if cfg.smooth_time_surface:
        # reference: optional 5x5 Gaussian pre-smoothing
        # (EventBM.cpp:68-72 via GaussianBlurTS)
        ts_left = gaussian_blur(ts_left, 5)
        ts_right = gaussian_blur(ts_right, 5)

    u = x_rect[:, 0]
    v = x_rect[:, 1]
    # rectified-coordinate bounds + mask (EventBM.cpp:88-95)
    inb = valid & (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    ui = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 1)
    inb = inb & gather2d(mask, vi, ui)
    # patch interior with 1-pixel margin (EventBM.cpp:251-267)
    inb = inb & (ui - hx >= 1) & (vi - hy >= 1) \
        & (ui + hx < W - 1) & (vi + hy < H - 1)

    n = x_rect.shape[0]
    patch_l = slice_patches(ts_left, vi - hy, ui - hx, wy, wx)  # (N, wy, wx)

    # low info-noise-ratio rejection (EventBM.cpp:104-109)
    dark = jnp.sum((patch_l < 1.0).astype(dtype), axis=(1, 2))
    inb = inb & (dark <= 0.95 * wx * wy)

    patch_l_n = _normalize(patch_l, axis=(1, 2))

    # strip covering all disparity candidates: columns
    # [u - hx - dmax, u + hx - dmin]
    S = wx + D - 1
    cols_s = ui[:, None] - dmax - hx + jnp.arange(S, dtype=jnp.int32)
    strip_ok = (cols_s >= 0) & (cols_s < W)
    # contiguous (wy, S) block per event; dynamic_slice clamps, so shift
    # the requested start and mask the shifted-in columns
    start_x = jnp.clip(ui - dmax - hx, 0, max(W - S, 0))
    strip = slice_patches(ts_right, vi - hy, start_x, wy, S)
    # columns may be shifted when the start clamped; rebuild alignment by
    # rolling each row by the clamp offset
    off = (ui - dmax - hx) - start_x            # (N,) <= 0 or >= 0
    strip = jax.vmap(lambda s_, o: jnp.roll(s_, -o, axis=-1))(strip, off)
    strip = jnp.where(strip_ok[:, None, :], strip, 0.0)   # (N, wy, S)

    # per-disparity ZNCC cost, all disparities at once: disparity d
    # occupies strip columns [dmax - d, dmax - d + wx). With the left
    # patch zero-mean normalized, mean(pl_n * zn(w)) reduces to
    # (sum pl_n . w) / (P * sigma_w) — one einsum for the numerator plus
    # windowed moment sums; no per-disparity loop bodies.
    P_area = wx * wy
    windows = jnp.stack([strip[:, :, dmax - d:dmax - d + wx]
                         for d in range(dmin, dmax + 1)], axis=1)
    # (N, D, wy, wx)
    sum_r = jnp.sum(windows, axis=(-2, -1))
    sumsq_r = jnp.sum(windows * windows, axis=(-2, -1))
    mean_r = sum_r / P_area
    var_r = jnp.maximum(sumsq_r / P_area - mean_r * mean_r, 0.0)
    sigma_r = jnp.sqrt(var_r) + 1e-6
    num = jnp.einsum("nyx,ndyx->nd", patch_l_n, windows,
                     preferred_element_type=dtype)
    ncc = num / (P_area * sigma_r)
    cost_raw = 0.5 * (1.0 - ncc)
    ds = jnp.arange(dmin, dmax + 1, dtype=jnp.int32)[None, :]
    ok_vol = (ui[:, None] - ds - hx >= 1) & (ui[:, None] - ds + hx < W - 1)
    cost_vol = jnp.where(ok_vol, cost_raw, 1.0)       # (N, D)

    best = jnp.argmin(cost_vol, axis=1)
    best_cost = jnp.take_along_axis(cost_vol, best[:, None], axis=1)[:, 0]
    best_disp = (best + dmin).astype(dtype)
    best_ok = jnp.take_along_axis(ok_vol, best[:, None], axis=1)[:, 0]

    matched = inb & best_ok & (best_cost <= cfg.zncc_threshold)

    # triangulate: depth = b * f / d (EventBM.cpp:141-152)
    fx = rig.left.params.P[0, 0]
    depth = rig.baseline * fx / jnp.maximum(best_disp, 1e-6)
    inv_depth = jnp.where(matched, 1.0 / depth, 0.0)

    x_right = jnp.stack([(ui - best_disp.astype(jnp.int32)).astype(dtype),
                         vi.astype(dtype)], axis=1)
    return EventMatches(
        x_left=x_rect, x_left_raw=x_rect, x_right=x_right, t=t,
        inv_depth=inv_depth, cost=jnp.where(matched, best_cost, 1.0),
        disparity=jnp.where(matched, best_disp, 0.0), valid=matched)
