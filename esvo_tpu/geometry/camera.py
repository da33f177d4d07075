"""Camera models, rectification LUTs and projections as pure JAX functions.

Re-implements (from the camera-model math, not by translation) the
capabilities of the reference's ``PerspectiveCamera`` / ``CameraSystem``
(esvo_core/src/container/CameraSystem.cpp):

- per-pixel undistort+rectify look-up table (reference
  ``preComputeRectifiedCoordinate``, CameraSystem.cpp:36-111),
- inverse map + valid-pixel mask (the mask of pixels reachable from the raw
  sensor after rectification; reference builds it by remapping an all-ones
  image, CameraSystem.cpp:67-72),
- ``cam2World`` back-projection at a given inverse depth
  (CameraSystem.cpp:120-139) and ``world2Cam`` pinhole projection
  (CameraSystem.cpp:141-148),
- stereo baseline from the right projection matrix (CameraSystem.cpp:161-166).

Supported distortion models: ``plumb_bob`` (radial-tangential, 4 coeffs) and
``equidistant`` (fisheye, 4 coeffs), matching the reference's calib files.

Cameras are ``flax.struct`` pytrees: array fields flow through jit, shape
and model-name fields are static.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


# ---------------------------------------------------------------------------
# parameter containers
# ---------------------------------------------------------------------------

@struct.dataclass
class PinholeParams:
    K: jax.Array          # (3, 3) intrinsics of the raw sensor
    D: jax.Array          # (4,) or (5,) distortion coefficients
                          # (plumb_bob: k1 k2 p1 p2 [k3]; equidistant:
                          # k1..k4)
    R: jax.Array          # (3, 3) rectification rotation
    P: jax.Array          # (3, 4) projection matrix of the rectified camera
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)
    model: str = struct.field(pytree_node=False, default="plumb_bob")


@struct.dataclass
class Camera:
    params: PinholeParams
    lut: jax.Array        # (H, W, 2) raw pixel -> rectified (x, y)
    inv_map: jax.Array    # (H, W, 2) rectified pixel -> raw (x, y)
    mask: jax.Array       # (H, W) bool; valid rectified pixels

    @property
    def width(self) -> int:
        return self.params.width

    @property
    def height(self) -> int:
        return self.params.height


@struct.dataclass
class StereoRig:
    left: Camera
    right: Camera
    T_right_left: jax.Array   # (4, 4)
    baseline: jax.Array       # scalar


# ---------------------------------------------------------------------------
# distortion models
# ---------------------------------------------------------------------------

def _distort_normalized(model: str, D: jax.Array, xy: jax.Array) -> jax.Array:
    """Apply lens distortion to normalized coords (..., 2)."""
    x, y = xy[..., 0], xy[..., 1]
    if model == "plumb_bob":
        k1, k2, p1, p2 = D[0], D[1], D[2], D[3]
        k3 = D[4] if D.shape[0] > 4 else 0.0  # optional 5-coeff form
        r2 = x * x + y * y
        cdist = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = x * cdist + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yd = y * cdist + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return jnp.stack([xd, yd], axis=-1)
    elif model == "equidistant":
        k1, k2, k3, k4 = D[0], D[1], D[2], D[3]
        r = jnp.sqrt(x * x + y * y)
        theta = jnp.arctan(r)
        t2 = theta * theta
        theta_d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
        scale = jnp.where(r > 1e-8, theta_d / jnp.maximum(r, 1e-8), 1.0)
        return jnp.stack([x * scale, y * scale], axis=-1)
    raise ValueError(f"unsupported distortion model: {model}")


def _undistort_normalized(model: str, D: jax.Array, xy: jax.Array,
                          iters: int = 10) -> jax.Array:
    """Invert lens distortion on normalized coords (fixed-point / Newton)."""
    x0, y0 = xy[..., 0], xy[..., 1]
    if model == "plumb_bob":
        k1, k2, p1, p2 = D[0], D[1], D[2], D[3]
        k3 = D[4] if D.shape[0] > 4 else 0.0
        x, y = x0, y0
        for _ in range(iters):
            r2 = x * x + y * y
            icdist = 1.0 / (1.0 + r2 * (k1 + r2 * (k2 + r2 * k3)))
            dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
            dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
            x = (x0 - dx) * icdist
            y = (y0 - dy) * icdist
        return jnp.stack([x, y], axis=-1)
    elif model == "equidistant":
        k1, k2, k3, k4 = D[0], D[1], D[2], D[3]
        theta_d = jnp.sqrt(x0 * x0 + y0 * y0)
        theta = theta_d
        for _ in range(iters):  # Newton on f(t) = t(1+k1 t^2+...) - theta_d
            t2 = theta * theta
            f = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) \
                - theta_d
            df = 1.0 + t2 * (3 * k1 + t2 * (5 * k2 + t2 * (7 * k3
                                                           + t2 * 9 * k4)))
            theta = theta - f / df
        scale = jnp.where(theta_d > 1e-8,
                          jnp.tan(theta) / jnp.maximum(theta_d, 1e-8), 1.0)
        return jnp.stack([x0 * scale, y0 * scale], axis=-1)
    raise ValueError(f"unsupported distortion model: {model}")


# ---------------------------------------------------------------------------
# point rectification
# ---------------------------------------------------------------------------

def undistort_points(params: PinholeParams, pts: jax.Array) -> jax.Array:
    """Raw pixel coords (..., 2) -> rectified pixel coords (..., 2).

    Equivalent to cv::undistortPoints(.., K, D, R, P): normalize with K,
    invert distortion, rotate into the rectified frame with R, project with
    the left 3x3 of P.
    """
    K, D, R, P = params.K, params.D, params.R, params.P
    x = (pts[..., 0] - K[0, 2]) / K[0, 0]
    y = (pts[..., 1] - K[1, 2]) / K[1, 1]
    xy = _undistort_normalized(params.model, D, jnp.stack([x, y], axis=-1))
    ones = jnp.ones_like(xy[..., :1])
    h = jnp.concatenate([xy, ones], axis=-1)
    r = jnp.einsum("ij,...j->...i", R, h, precision="highest")
    xn = r[..., 0] / r[..., 2]
    yn = r[..., 1] / r[..., 2]
    u = P[0, 0] * xn + P[0, 1] * yn + P[0, 2]
    v = P[1, 0] * xn + P[1, 1] * yn + P[1, 2]
    return jnp.stack([u, v], axis=-1)


def distort_points(params: PinholeParams, pts_rect: jax.Array) -> jax.Array:
    """Rectified pixel coords (..., 2) -> raw pixel coords (..., 2).

    Equivalent to the per-pixel map of cv::initUndistortRectifyMap:
    back-rotate through (P[:, :3] R)^-1, apply distortion, project with K.
    """
    K, D, R, P = params.K, params.D, params.R, params.P
    PR = P[:, :3] @ R
    iR = jnp.linalg.inv(PR)
    ones = jnp.ones_like(pts_rect[..., :1])
    h = jnp.concatenate([pts_rect, ones], axis=-1)
    r = jnp.einsum("ij,...j->...i", iR, h, precision="highest")
    xy = r[..., :2] / r[..., 2:3]
    xyd = _distort_normalized(params.model, D, xy)
    u = K[0, 0] * xyd[..., 0] + K[0, 2]
    v = K[1, 1] * xyd[..., 1] + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def _pixel_grid(width: int, height: int, dtype) -> jax.Array:
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)          # (H, W)
    return jnp.stack([gx, gy], axis=-1)    # (H, W, 2)


def rectification_lut(params: PinholeParams) -> jax.Array:
    """(H, W, 2): for every raw pixel, its rectified coordinate.

    Reference: precomputed_rectified_points_ (CameraSystem.cpp:36-111).
    """
    grid = _pixel_grid(params.width, params.height, params.K.dtype)
    return undistort_points(params, grid)


def inverse_rectification_map(params: PinholeParams) -> jax.Array:
    """(H, W, 2): for every rectified pixel, the raw coordinate to sample.

    Reference: undistort_map1_/2_ from cv::initUndistortRectifyMap.
    """
    grid = _pixel_grid(params.width, params.height, params.K.dtype)
    return distort_points(params, grid)


def remap_bilinear(img: jax.Array, map_xy: jax.Array,
                   fill: float = 0.0) -> jax.Array:
    """Bilinear resampling img (H, W) at map_xy (..., 2); out-of-bounds
    samples produce `fill` (cv::remap BORDER_CONSTANT semantics).

    On TPU with a concrete full-image map (the per-camera rectification
    LUT — static across calls) this routes to the Pallas fixed-map
    kernel: XLA's arbitrary per-element gather runs at ~9 ns/element
    (11.5 ms at 640x480), the planned kernel at band-load speed."""
    H, W = img.shape
    if (fill == 0.0 and img.dtype == jnp.float32
            and not isinstance(map_xy, jax.core.Tracer)
            and map_xy.shape == (H, W, 2)
            and jax.default_backend() == "tpu"):
        from esvo_tpu.ops.pallas_remap import (plan_is_banded,
                                               remap_fixed_map)
        if plan_is_banded(map_xy, H, W):
            return remap_fixed_map(img, map_xy)
    x = map_xy[..., 0]
    y = map_xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = img.reshape(-1)

    # flat 1D gathers: XLA TPU lowers multi-axis advanced indexing of
    # image-sized index arrays into a pathological gather (minutes of
    # compile); a single-offset-dim gather is fast.
    def tap(yi, xi, w):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        v = jnp.take(flat, idx, mode="clip")
        return jnp.where(inb, v, fill) * w

    out = (tap(y0i, x0i, (1 - fx) * (1 - fy))
           + tap(y0i, x0i + 1, fx * (1 - fy))
           + tap(y0i + 1, x0i, (1 - fx) * fy)
           + tap(y0i + 1, x0i + 1, fx * fy))
    return out


def valid_pixel_mask(params: PinholeParams,
                     inv_map: jax.Array | None = None) -> jax.Array:
    """(H, W) bool: rectified pixels fully covered by the raw sensor.

    Mirrors the reference's trick of remapping an all-ones image and
    thresholding (CameraSystem.cpp:67-72: threshold 0.999 for plumb_bob,
    :90: 0.1 for equidistant). Pass the already-computed inverse map to
    skip recomputing the full-grid undistortion (make_camera does)."""
    inv = (inverse_rectification_map(params) if inv_map is None
           else inv_map)
    ones = jnp.ones((params.height, params.width), dtype=inv.dtype)
    remapped = remap_bilinear(ones, inv, fill=0.0)
    thr = 0.999 if params.model == "plumb_bob" else 0.1
    return remapped > thr


def make_camera(params: PinholeParams) -> Camera:
    inv = inverse_rectification_map(params)
    return Camera(
        params=params,
        lut=rectification_lut(params),
        inv_map=inv,
        mask=valid_pixel_mask(params, inv),
    )


# ---------------------------------------------------------------------------
# projection (rectified frame)
# ---------------------------------------------------------------------------

def inv3(A: jax.Array) -> jax.Array:
    """Closed-form adjugate inverse of a 3x3 matrix.

    jnp.linalg.inv lowers to an LU custom call on TPU that cannot fuse and
    costs a kernel launch per use — on the hot path (cam_to_world inside
    the fusion fold) that dominated the whole stage.
    """
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    d, e, f = A[1, 0], A[1, 1], A[1, 2]
    g, h, i = A[2, 0], A[2, 1], A[2, 2]
    co = jnp.array([
        [e * i - f * h, c * h - b * i, b * f - c * e],
        [f * g - d * i, a * i - c * g, c * d - a * f],
        [d * h - e * g, b * g - a * h, a * e - b * d],
    ])
    det = a * co[0, 0] + b * co[1, 0] + c * co[2, 0]
    return co / det


def cam_to_world(P: jax.Array, x: jax.Array, inv_depth) -> jax.Array:
    """Back-project rectified pixels x (..., 2) at inverse depth (...,) to
    3D points (..., 3) in the camera frame.

    Solves P [p; 1] ~ z [u, v, 1] with p_z = z, i.e.
    p = A^-1 (z [u, v, 1] - b) with P = [A | b]
    (closed form of the reference's P-tilde inverse,
    CameraSystem.cpp:120-139).
    """
    inv_depth = jnp.asarray(inv_depth, dtype=x.dtype)
    z = 1.0 / inv_depth
    A = P[:, :3]
    b = P[:, 3]
    ones = jnp.ones_like(x[..., :1])
    xh = jnp.concatenate([x, ones], axis=-1)
    rhs = z[..., None] * xh - b
    Ainv = inv3(A)
    return jnp.einsum("ij,...j->...i", Ainv, rhs, precision="highest")


def world_to_cam(P: jax.Array, p: jax.Array) -> jax.Array:
    """Project 3D points (..., 3) in the rectified camera frame to pixels
    (..., 2). Reference: CameraSystem.cpp:141-148."""
    h = jnp.einsum("ij,...j->...i", P[:, :3], p, precision="highest") + P[:, 3]
    return h[..., :2] / h[..., 2:3]


# ---------------------------------------------------------------------------
# constructors / loaders
# ---------------------------------------------------------------------------

def make_ideal_camera(width: int, height: int, fx: float, fy: float,
                      cx: float, cy: float, tx: float = 0.0,
                      dtype=jnp.float32) -> Camera:
    """Distortion-free camera whose raw and rectified frames coincide.

    tx is the 4th-column entry P[0, 3] = -fx * baseline for the right
    camera of an ideal rectified stereo pair.
    """
    K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=dtype)
    D = jnp.zeros((4,), dtype=dtype)
    R = jnp.eye(3, dtype=dtype)
    P = jnp.array([[fx, 0, cx, tx], [0, fy, cy, 0], [0, 0, 1, 0]],
                  dtype=dtype)
    params = PinholeParams(K=K, D=D, R=R, P=P, width=width, height=height,
                           model="plumb_bob")
    return make_camera(params)


def make_ideal_rig(width: int, height: int, fx: float, fy: float,
                   cx: float, cy: float, baseline: float,
                   dtype=jnp.float32) -> StereoRig:
    left = make_ideal_camera(width, height, fx, fy, cx, cy, dtype=dtype)
    right = make_ideal_camera(width, height, fx, fy, cx, cy,
                              tx=-fx * baseline, dtype=dtype)
    T_rl = jnp.eye(4, dtype=dtype).at[0, 3].set(-baseline)
    return StereoRig(left=left, right=right, T_right_left=T_rl,
                     baseline=jnp.asarray(baseline, dtype=dtype))


def load_camera_yaml(path: str, dtype=jnp.float32) -> Camera:
    """Load an ESVO-format calibration yaml (e.g. esvo_core/calib/rpg/left.yaml)."""
    import yaml
    with open(path) as f:
        info = yaml.safe_load(f)
    width = int(info["image_width"])
    height = int(info["image_height"])
    K = jnp.asarray(np.array(info["camera_matrix"]["data"],
                             dtype=np.float64).reshape(3, 3), dtype=dtype)
    D = np.array(info["distortion_coefficients"]["data"],
                 dtype=np.float64).reshape(-1)
    # zero-PAD short coefficient lists (np.resize would repeat them
    # cyclically, inventing tangential terms from radial ones); a 5th
    # plumb_bob coefficient (k3) is kept — _distort_normalized models it
    D = np.pad(D[:5], (0, max(0, 5 - len(D))))
    D = jnp.asarray(D, dtype=dtype)
    R = jnp.asarray(np.array(info["rectification_matrix"]["data"],
                             dtype=np.float64).reshape(3, 3), dtype=dtype)
    P = jnp.asarray(np.array(info["projection_matrix"]["data"],
                             dtype=np.float64).reshape(3, 4), dtype=dtype)
    model = str(info["distortion_model"])
    params = PinholeParams(K=K, D=D, R=R, P=P, width=width, height=height,
                           model=model)
    return make_camera(params)


def load_rig(calib_dir: str, dtype=jnp.float32) -> StereoRig:
    """Load a stereo rig from an ESVO calib directory holding left.yaml /
    right.yaml (reference: CameraSystem::loadCalibInfo,
    CameraSystem.cpp:168-212)."""
    import os
    import yaml
    left = load_camera_yaml(os.path.join(calib_dir, "left.yaml"), dtype)
    right = load_camera_yaml(os.path.join(calib_dir, "right.yaml"), dtype)
    with open(os.path.join(calib_dir, "left.yaml")) as f:
        info = yaml.safe_load(f)
    T34 = np.array(info["T_right_left"]["data"],
                   dtype=np.float64).reshape(3, 4)
    T = np.eye(4)
    T[:3, :] = T34
    # baseline = |P_right[:, :3]^-1 P_right[:, 3]|  (CameraSystem.cpp:161-166)
    Pr = np.asarray(right.params.P, dtype=np.float64)
    baseline = float(np.linalg.norm(np.linalg.inv(Pr[:, :3]) @ Pr[:, 3]))
    return StereoRig(left=left, right=right,
                     T_right_left=jnp.asarray(T, dtype=dtype),
                     baseline=jnp.asarray(baseline, dtype=dtype))
