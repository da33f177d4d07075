"""Parity: the fused Pallas LM solve vs the XLA scan path.

The kernel (ops/pallas_lm.py) re-implements the windowed depth-LM solve
with shift-select sampling and an analytic depth Jacobian; it must
reproduce the XLA path's solutions (same windows, same norms, same LM
schedule) to float tolerance. Runs in Pallas interpret mode on CPU.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from esvo_tpu.geometry.camera import make_ideal_rig
from esvo_tpu.geometry.se3 import interpolate_pose_table, se3_exp
from esvo_tpu.mapping import depth_refinement as dr

W, H, N, DISP = 240, 180, 256, 8


def make_world(seed=0):
    rng = np.random.default_rng(seed)
    rig = make_ideal_rig(W, H, 200.0, 200.0, W / 2 - 0.5, H / 2 - 0.5,
                         0.1, dtype=jnp.float32)
    base = rng.uniform(0, 255, size=(H, W + 64)).astype(np.float32)
    k = np.ones(5) / 5
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1,
                               base)
    ts_l = jnp.asarray(base[:, 32:32 + W])
    ts_r = jnp.asarray(base[:, 32 + DISP:32 + DISP + W])
    coords = jnp.stack(
        [jnp.asarray(rng.uniform(30, W - 30, N), jnp.float32),
         jnp.asarray(rng.uniform(20, H - 20, N), jnp.float32)], axis=1)
    d_true = DISP / (0.1 * 200.0)
    d_init = jnp.asarray(d_true * rng.uniform(0.85, 1.15, N), jnp.float32)
    # mildly non-trivial per-event virtual views
    xi = jnp.asarray(rng.normal(0, 2e-3, (N, 6)), jnp.float32)
    T_wv = se3_exp(xi).astype(jnp.float32)
    valid = jnp.asarray(rng.random(N) > 0.1)
    return rig, ts_l, ts_r, coords, d_init, T_wv, valid, d_true


@pytest.mark.parametrize("ls_norm", ["Tdist", "l2"])
def test_pallas_lm_matches_xla(ls_norm):
    rig, ts_l, ts_r, coords, d_init, T_wv, valid, d_true = make_world()
    t_ev = jnp.zeros(N, jnp.float32)
    outs = {}
    for kern in ("xla", "pallas"):
        cfg = dr.DepthProblemConfig(max_iteration=10, ls_norm=ls_norm,
                                    lm_kernel=kern)
        outs[kern] = dr.solve(coords, T_wv, T_wv, d_init, valid, t_ev,
                              ts_l, ts_r, rig, cfg)
    a, b = outs["xla"], outs["pallas"]
    ok = np.asarray(a.valid) & np.asarray(b.valid)
    assert ok.sum() > 0.8 * int(np.asarray(valid).sum())
    # identical algorithm, different op order: float32-tight agreement
    np.testing.assert_allclose(np.asarray(a.inv_depth)[ok],
                               np.asarray(b.inv_depth)[ok],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a.variance)[ok],
                               np.asarray(b.variance)[ok], rtol=2e-2)
    np.testing.assert_allclose(np.asarray(a.residual)[ok],
                               np.asarray(b.residual)[ok], rtol=2e-2)
    # same validity decisions on nearly every lane (accept/reject races
    # at float tolerance may flip a borderline event)
    agree = (np.asarray(a.valid) == np.asarray(b.valid)).mean()
    assert agree > 0.98


def test_pallas_lm_converges_to_truth():
    rig, ts_l, ts_r, coords, d_init, T_wv, valid, d_true = make_world(3)
    cfg = dr.DepthProblemConfig(max_iteration=10, lm_kernel="pallas")
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (N, 4, 4))
    est = dr.solve(coords, eye, eye, d_init, jnp.ones(N, bool),
                   jnp.zeros(N, jnp.float32), ts_l, ts_r, rig, cfg)
    ok = np.asarray(est.valid)
    d = np.asarray(est.inv_depth)[ok]
    rel = np.abs(d - d_true) / d_true
    assert ok.mean() > 0.9
    assert np.median(rel) < 5e-3
