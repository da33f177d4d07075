"""Bootstrap depth initialization: semi-global stereo matching on the TS pair.

The reference seeds its depth map with OpenCV's ``cv::StereoSGBM`` on the
first time-surface pair (esvo_core/src/esvo_Mapping.cpp:101-108,433-492):
48 disparities, block 11, P1 = 8*11*11, P2 = 32*11*11, uniqueness 11, then
masks the disparity map with an event edge mask and converts to inverse
depth with fixed variance 0.001^2.

OpenCV has no TPU analogue, so this is a ground-up SGM:

- cost volume: absolute difference box-filtered over the block (SAD) —
  (H, W, D) dense tensor, one vectorized expression;
- path aggregation along 4 directions (left/right/up/down) via
  ``lax.scan`` over image columns/rows with the standard SGM recurrence
  L(p,d) = C(p,d) + min(L(p-1,d), L(p-1,d+-1)+P1, min_d' L(p-1,d')+P2)
  - min_d' L(p-1,d')   [deviation: OpenCV MODE_SGBM aggregates 5 paths];
- winner-take-all + uniqueness-ratio test + parabola sub-pixel refinement
  (OpenCV emits fixed-point disparity*16; we keep float).

The edge mask / event denoising logic matches
esvo_Mapping::createEdgeMask/createDenoisingMask/extractDenoisedEvents
(esvo_Mapping.cpp:1000-1072).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from esvo_tpu.geometry.camera import StereoRig, cam_to_world
from esvo_tpu.mapping.depth_refinement import DepthEstimates
from esvo_tpu.surface.time_surface import median_blur_3x3
from esvo_tpu.ops.interp import gather2d


@struct.dataclass
class SGMConfig:
    """Reference values: esvo_Mapping.cpp:101-108."""
    num_disparities: int = struct.field(pytree_node=False, default=48)
    block_size: int = struct.field(pytree_node=False, default=11)
    p1: float = struct.field(pytree_node=False, default=8.0 * 11 * 11)
    p2: float = struct.field(pytree_node=False, default=32.0 * 11 * 11)
    uniqueness_ratio: float = struct.field(pytree_node=False, default=11.0)
    init_variance: float = struct.field(pytree_node=False, default=0.001 ** 2)


def _box_sum(img: jax.Array, k: int) -> jax.Array:
    """(..., H, W) separable block SUM with zero padding, window k x k.

    A SUM, not a mean: OpenCV StereoSGBM's matching cost is summed over
    the block, and the reference's P1/P2 (8*11^2, 32*11^2 —
    esvo_Mapping.cpp:101-108) are calibrated against that scale. A mean
    here would make the smoothness penalties ~block^2 too strong and
    flatten the bootstrap disparity map."""
    r = k // 2
    H, W = img.shape[-2], img.shape[-1]
    p = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(r, r), (0, 0)])
    out = jnp.zeros_like(img)
    for dy in range(k):
        out = out + jax.lax.slice_in_dim(p, dy, dy + H, axis=img.ndim - 2)
    p = jnp.pad(out, [(0, 0)] * (img.ndim - 2) + [(0, 0), (r, r)])
    out = jnp.zeros_like(img)
    for dx in range(k):
        out = out + jax.lax.slice_in_dim(p, dx, dx + W, axis=img.ndim - 1)
    return out


def cost_volume(ts_left: jax.Array, ts_right: jax.Array,
                cfg: SGMConfig) -> jax.Array:
    """(H, W, D) SAD block cost. Disparity d matches left (y, x) with
    right (y, x - d); out-of-image candidates get a high cost."""
    H, W = ts_left.shape
    D = cfg.num_disparities
    ads = []
    big = 255.0
    for d in range(D):
        shifted = jnp.roll(ts_right, d, axis=1)
        ad = jnp.abs(ts_left - shifted)
        ad = ad.at[:, :d].set(big)
        ads.append(ad)
    vol = jnp.stack(ads, axis=0)            # (D, H, W)
    vol = _box_sum(vol, cfg.block_size)
    return jnp.transpose(vol, (1, 2, 0))    # (H, W, D)


def _aggregate_dir(cost_t: jax.Array, p1: float, p2: float) -> jax.Array:
    """SGM recurrence along the leading axis of cost_t (S, L, D):
    scan position s in 0..S-1 over lines L."""
    def step(Lprev, c):
        m = jnp.min(Lprev, axis=-1, keepdims=True)         # (L, 1)
        same = Lprev
        up = jnp.pad(Lprev[:, 1:], ((0, 0), (0, 1)),
                     constant_values=jnp.inf) + p1
        down = jnp.pad(Lprev[:, :-1], ((0, 0), (1, 0)),
                       constant_values=jnp.inf) + p1
        far = m + p2
        L = c + jnp.minimum(jnp.minimum(same, up),
                            jnp.minimum(down, far)) - m
        return L, L

    L0 = cost_t[0]
    _, rest = jax.lax.scan(step, L0, cost_t[1:])
    return jnp.concatenate([L0[None], rest], axis=0)


def semi_global_matching(ts_left: jax.Array, ts_right: jax.Array,
                         cfg: SGMConfig):
    """Returns (disparity (H, W) float, valid (H, W) bool)."""
    H, W = ts_left.shape
    D = cfg.num_disparities
    C = cost_volume(ts_left, ts_right, cfg)

    # 4-path aggregation
    agg = jnp.zeros_like(C)
    # left -> right: scan over columns; lines = rows
    agg += jnp.transpose(_aggregate_dir(jnp.transpose(C, (1, 0, 2)),
                                        cfg.p1, cfg.p2), (1, 0, 2))
    # right -> left
    agg += jnp.transpose(_aggregate_dir(jnp.transpose(C, (1, 0, 2))[::-1],
                                        cfg.p1, cfg.p2)[::-1], (1, 0, 2))
    # top -> bottom: scan over rows; lines = columns
    agg += _aggregate_dir(C, cfg.p1, cfg.p2)
    # bottom -> top
    agg += _aggregate_dir(C[::-1], cfg.p1, cfg.p2)[::-1]

    best = jnp.argmin(agg, axis=-1)                          # (H, W)
    ar = jnp.arange(D)
    best_cost = jnp.min(agg, axis=-1)
    # uniqueness (OpenCV SGBM computeDisparitySGBM): invalid when any
    # other disparity (excluding neighbours of best) satisfies
    # cost*(100 - ratio) < best*100, i.e. valid requires
    # second*(100 - ratio) >= best*100
    masked = jnp.where(jnp.abs(ar[None, None, :] - best[..., None]) <= 1,
                       jnp.inf, agg)
    second = jnp.min(masked, axis=-1)
    unique = second * (100.0 - cfg.uniqueness_ratio) >= best_cost * 100.0

    # parabola sub-pixel refinement
    bl = jnp.clip(best - 1, 0, D - 1)
    br = jnp.clip(best + 1, 0, D - 1)
    cl = jnp.take_along_axis(agg, bl[..., None], axis=-1)[..., 0]
    cr = jnp.take_along_axis(agg, br[..., None], axis=-1)[..., 0]
    denom = cl + cr - 2.0 * best_cost
    offset = jnp.where(denom > 1e-9, 0.5 * (cl - cr) / jnp.maximum(denom,
                                                                   1e-9),
                       0.0)
    offset = jnp.clip(offset, -0.5, 0.5)
    disp = best.astype(ts_left.dtype) + offset

    valid = unique & (best > 0) & (best < D - 1)
    return disp, valid


def event_edge_mask(x_rect: jax.Array, valid: jax.Array, height: int,
                    width: int, radius: int = 0) -> jax.Array:
    """Binary edge mask from rectified event coordinates with optional
    dilation (createEdgeMask, esvo_Mapping.cpp:1000-1044)."""
    xi = jnp.floor(x_rect[:, 0]).astype(jnp.int32)
    yi = jnp.floor(x_rect[:, 1]).astype(jnp.int32)
    mask = jnp.zeros((height, width), bool)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            x = xi + dx
            y = yi + dy
            ok = valid & (x >= 0) & (x < width) & (y >= 0) & (y < height)
            mask = mask.at[jnp.clip(y, 0, height - 1),
                           jnp.clip(x, 0, width - 1)].max(ok)
    return mask


def denoising_mask(x_raw: jax.Array, y_raw: jax.Array, valid: jax.Array,
                   height: int, width: int) -> jax.Array:
    """Median-blurred binary event map: flicker/isolated-event rejection
    (createDenoisingMask, esvo_Mapping.cpp:1046-1057)."""
    ok = valid & (x_raw >= 0) & (x_raw < width) & (y_raw >= 0) \
        & (y_raw < height)
    emap = jnp.zeros((height, width), jnp.float32)
    emap = emap.at[jnp.clip(y_raw, 0, height - 1),
                   jnp.clip(x_raw, 0, width - 1)].max(
                       jnp.where(ok, 255.0, 0.0))
    return median_blur_3x3(emap) >= 128.0


def select_denoised(x_raw: jax.Array, y_raw: jax.Array, valid: jax.Array,
                    mask: jax.Array, max_num: int) -> jax.Array:
    """Keep the first `max_num` events whose raw pixel survives the mask
    (extractDenoisedEvents, esvo_Mapping.cpp:1059-1072)."""
    H, W = mask.shape
    ok = valid & gather2d(mask, jnp.clip(y_raw, 0, H - 1),
                          jnp.clip(x_raw, 0, W - 1))
    rank = jnp.cumsum(ok.astype(jnp.int32))
    return ok & (rank <= max_num)


def sgm_depth_points(ts_left: jax.Array, ts_right: jax.Array,
                     x_rect: jax.Array, ev_valid: jax.Array,
                     T_world_frame: jax.Array, rig: StereoRig,
                     cfg: SGMConfig, inv_depth_min: float,
                     inv_depth_max: float,
                     init_age: int = 0) -> DepthEstimates:
    """SGM disparity at each event's rectified pixel -> DepthEstimates
    (InitializationAtTime, esvo_Mapping.cpp:433-492). One estimate per
    event (duplicates at a pixel are harmless — fusion canonicalizes)."""
    H, W = ts_left.shape
    disp, dvalid = semi_global_matching(ts_left, ts_right, cfg)

    xi = jnp.clip(jnp.floor(x_rect[:, 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.floor(x_rect[:, 1]).astype(jnp.int32), 0, H - 1)
    inb = ev_valid & (x_rect[:, 0] >= 0) & (x_rect[:, 0] < W) \
        & (x_rect[:, 1] >= 0) & (x_rect[:, 1] < H)
    d = gather2d(disp, yi, xi)
    ok = inb & gather2d(dvalid, yi, xi) & (d > 0)

    fx = rig.left.params.P[0, 0]
    inv_depth = d / (fx * rig.baseline)
    ok = ok & (inv_depth >= inv_depth_min) & (inv_depth <= inv_depth_max)
    inv_depth = jnp.where(ok, inv_depth, 1.0)

    x_img = jnp.stack([xi, yi], axis=1).astype(ts_left.dtype)
    p_cam = jax.vmap(lambda c, dd: cam_to_world(rig.left.params.P, c, dd))(
        x_img, inv_depth)
    n = x_rect.shape[0]
    dt = ts_left.dtype
    return DepthEstimates(
        x=x_img,
        inv_depth=jnp.where(ok, inv_depth, -1.0),
        variance=jnp.full((n,), cfg.init_variance, dt),
        scale2=jnp.full((n,), cfg.init_variance, dt),
        nu=jnp.full((n,), jnp.inf, dt),
        residual=jnp.zeros((n,), dt),
        age=jnp.full((n,), init_age, jnp.int32),
        p_cam=p_cam,
        T_world_cam=jnp.broadcast_to(T_world_frame, (n, 4, 4)),
        valid=ok,
    )
