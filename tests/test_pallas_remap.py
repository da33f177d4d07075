"""Parity tests for the Pallas fixed-map remap kernel (interpret mode).

The kernel replaces the XLA gather path of
`geometry.camera.remap_bilinear` for concrete full-image maps on TPU
(reference capability: cv::remap in
esvo_time_surface/src/TimeSurface.cpp:144-151). On-chip parity and
timing are exercised by scripts/verify_pallas_chip.py; here we run the
kernel in Pallas interpret mode on CPU against the plain XLA bilinear
path, which the same tests' golden suite already pins to OpenCV
semantics.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from esvo_tpu.geometry import camera as cam
from esvo_tpu.ops.pallas_remap import RemapPlan, remap_fixed_map


def _xla_remap(img, map_xy):
    # force the non-Pallas path regardless of backend
    H, W = img.shape
    x, y = map_xy[..., 0], map_xy[..., 1]
    x0, y0 = jnp.floor(x), jnp.floor(y)
    fx, fy = x - x0, y - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    flat = img.reshape(-1).astype(jnp.float32)

    def tap(yy, xx):
        ok = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        idx = jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)
        return jnp.where(ok, jnp.take(flat, idx), 0.0)

    v00, v01 = tap(y0i, x0i), tap(y0i, x0i + 1)
    v10, v11 = tap(y0i + 1, x0i), tap(y0i + 1, x0i + 1)
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11)).astype(img.dtype)


def _rot_map(H, W, angle=0.04, scale=1.02, shift=(0.3, -0.7)):
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    cx, cy = W / 2, H / 2
    ca, sa = np.cos(angle), np.sin(angle)
    xs = scale * (ca * (xx - cx) - sa * (yy - cy)) + cx + shift[0]
    ys = scale * (sa * (xx - cx) + ca * (yy - cy)) + cy + shift[1]
    return np.stack([xs, ys], -1).astype(np.float32)


class TestRemapPlan:
    def test_plan_bounds(self):
        m = _rot_map(48, 64)
        plan = RemapPlan(m, 48, 64)
        assert plan.v.min() >= 0 and plan.v.max() <= plan.BH - 2
        assert plan.u.min() >= 0 and plan.u.max() <= plan.U - 1

    def test_identity_map_is_tight(self):
        H, W = 40, 128
        yy, xx = np.meshgrid(np.arange(H, dtype=np.float64),
                             np.arange(W, dtype=np.float64), indexing="ij")
        plan = RemapPlan(np.stack([xx, yy], -1), H, W)
        assert plan.U <= 2 and plan.BH <= 10


@pytest.mark.parametrize("shape", [(40, 56), (48, 128), (37, 61)])
def test_interpret_parity_rotation(shape):
    H, W = shape
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((H, W)), jnp.float32)
    m = _rot_map(H, W)
    ref = np.asarray(_xla_remap(img, jnp.asarray(m)))
    out = np.asarray(remap_fixed_map(img, m, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_interpret_parity_out_of_bounds():
    """Maps sampling outside the image must produce exact zeros."""
    H, W = 32, 48
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((H, W)) + 0.5, jnp.float32)
    m = _rot_map(H, W, angle=0.3, scale=1.6)  # large chunk out of range
    ref = np.asarray(_xla_remap(img, jnp.asarray(m)))
    out = np.asarray(remap_fixed_map(img, m, interpret=True))
    assert (np.abs(m[..., 0] + 10) > 1e-6).any()
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # fully-outside rows are exactly zero
    outside = ((m[..., 0] <= -1) | (m[..., 0] >= W)
               | (m[..., 1] <= -1) | (m[..., 1] >= H))
    assert outside.any()
    assert np.all(out[outside] == 0.0)


def test_pathological_map_rejected():
    """Non-smooth maps (here: a transpose-like warp) must be refused by
    the banded kernel and flagged for the XLA gather fallback."""
    from esvo_tpu.ops.pallas_remap import plan_is_banded, remap_fixed_map
    H, W = 64, 256
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    m = np.stack([(yy * 3.9) % W, (xx / 4.0) % H], -1).astype(np.float32)
    assert not plan_is_banded(m, H, W)
    img = jnp.zeros((H, W), jnp.float32)
    with pytest.raises(ValueError, match="bands too wide"):
        remap_fixed_map(img, m, interpret=True)


def test_real_rectification_lut_parity():
    """Use the real rpg calibration inverse map if the plan-building path
    handles a genuine distortion+rectification LUT."""
    rng = np.random.default_rng(5)
    H, W = 36, 44
    # synthetic plumb-bob camera, same code path as the real rigs
    params = cam.PinholeParams(
        K=jnp.array([[40.0, 0, W / 2 - 0.5],
                     [0, 40.0, H / 2 - 0.5],
                     [0, 0, 1.0]]),
        D=jnp.array([-0.3, 0.1, 1e-3, -1e-3]),
        R=jnp.eye(3),
        P=jnp.array([[38., 0, W / 2, 0],
                     [0, 38., H / 2, 0],
                     [0, 0, 1, 0]]),
        width=W, height=H, model="plumb_bob")
    inv = np.asarray(cam.inverse_rectification_map(params))
    img = jnp.asarray(rng.random((H, W)), jnp.float32)
    ref = np.asarray(_xla_remap(img, jnp.asarray(inv)))
    out = np.asarray(remap_fixed_map(img, inv.astype(np.float32),
                                     interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)
