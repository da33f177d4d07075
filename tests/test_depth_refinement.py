"""Tests for batched inverse-depth refinement vs the golden reference model."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from esvo_tpu.geometry.camera import make_ideal_rig
from esvo_tpu.mapping import depth_refinement as dr
from tests.golden import depth_problem_np as gold

W, H = 240, 180
FX = 200.0
BASELINE = 0.1


def make_rig():
    return make_ideal_rig(W, H, FX, FX, W / 2 - 0.5, H / 2 - 0.5, BASELINE,
                          dtype=jnp.float64)


def smooth_image(rng, h, w):
    img = rng.uniform(0, 255, size=(h + 16, w + 16))
    k = np.ones(9) / 9
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, img)
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    return img[8:8 + h, 8:8 + w]


def shifted_stereo_pair(rng, disp):
    """Left/right surfaces with right = left shifted so that a point at
    disparity `disp` matches perfectly (fronto-parallel plane)."""
    base = smooth_image(rng, H, W + 64)
    left = base[:, 32:32 + W]
    right = base[:, 32 + disp:32 + disp + W]
    return left, right


@pytest.mark.parametrize("ls_norm", ["l2", "zncc", "Tdist"])
def test_residuals_match_golden(ls_norm):
    rng = np.random.default_rng(0)
    rig = make_rig()
    ts_l = smooth_image(rng, H, W)
    ts_r = smooth_image(rng, H, W)
    cfg = dr.DepthProblemConfig(patch_size_x=15, patch_size_y=7,
                                ls_norm=ls_norm, td_fixed_point_iters=50)
    P_l = np.asarray(rig.left.params.P)
    P_r = np.asarray(rig.right.params.P)

    # random small pose offset virtual->left
    c = 0.02 * rng.standard_normal(3)
    from esvo_tpu.geometry.se3 import cayley_to_rot
    R = np.asarray(cayley_to_rot(jnp.asarray(c)))
    t = 0.01 * rng.standard_normal(3)
    T_lv = np.eye(4)
    T_lv[:3, :3] = R
    T_lv[:3, 3] = t

    for trial in range(20):
        coord = np.array([rng.uniform(20, W - 20), rng.uniform(15, H - 15)])
        d = rng.uniform(0.3, 2.0)
        want = gold.residuals(d, coord, T_lv, ts_l, ts_r, P_l, P_r,
                              15, 7, ls_norm=ls_norm)
        got, _ = dr.residuals(jnp.asarray(d), jnp.asarray(coord),
                              jnp.asarray(T_lv), jnp.asarray(ts_l),
                              jnp.asarray(ts_r), rig.left.params.P,
                              rig.right.params.P, W, H, cfg)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6,
                                   atol=1e-8, err_msg=f"trial {trial}")


@pytest.mark.parametrize("ls_norm", ["l2", "Tdist"])
def test_solve_converges_to_true_depth(ls_norm):
    rng = np.random.default_rng(1)
    rig = make_rig()
    disp = 8
    true_depth = BASELINE * FX / disp
    ts_l, ts_r = shifted_stereo_pair(rng, disp)

    cfg = dr.DepthProblemConfig(ls_norm=ls_norm, max_iteration=15)
    N = 64
    coords = np.stack([rng.uniform(30, W - 30, N),
                       rng.uniform(20, H - 20, N)], axis=1)
    d_true = 1.0 / true_depth
    d_init = d_true * rng.uniform(0.85, 1.15, N)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float64), (N, 4, 4))

    est = jax.jit(dr.solve, static_argnames=())(
        jnp.asarray(coords), eye, eye, jnp.asarray(d_init),
        jnp.ones(N, bool), jnp.zeros(N), jnp.asarray(ts_l),
        jnp.asarray(ts_r), rig, cfg)

    d = np.asarray(est.inv_depth)
    ok = np.asarray(est.valid)
    assert ok.mean() > 0.9
    err = np.abs(d[ok] - d_true) / d_true
    # majority of points should land very close to the true inverse depth
    assert np.median(err) < 0.01, f"median rel err {np.median(err)}"
    assert np.asarray(est.variance)[ok].min() > 0


def test_point_culling():
    N = 8
    est = dr.DepthEstimates(
        x=jnp.zeros((N, 2)),
        inv_depth=jnp.asarray([0.5, 0.5, 0.5, 5.0, 0.05, 0.5, 0.5, 0.5]),
        variance=jnp.asarray([1e-4, 1.0, 1e-4, 1e-4, 1e-4, 1e-4, 1e-4, 1e-4]),
        scale2=jnp.ones(N), nu=jnp.ones(N) * 3,
        residual=jnp.asarray([1., 1., 1e9, 1., 1., 1., 1., 1.]),
        age=jnp.zeros(N, jnp.int32), p_cam=jnp.zeros((N, 3)),
        T_world_cam=jnp.broadcast_to(jnp.eye(4), (N, 4, 4)),
        valid=jnp.asarray([True, True, True, True, True, False, True, True]))
    out = dr.point_culling(est, std_variance_threshold=0.015,
                           cost_threshold=2000.0, inv_depth_min=0.2,
                           inv_depth_max=2.0)
    np.testing.assert_array_equal(
        np.asarray(out.valid),
        [True, False, False, False, False, False, True, True])


def test_variance_formula_tdist():
    """Tdist variance = td_stdvar^2 / (J^T J) with the final Jacobian."""
    rng = np.random.default_rng(2)
    rig = make_rig()
    disp = 8
    ts_l, ts_r = shifted_stereo_pair(rng, disp)
    cfg = dr.DepthProblemConfig(ls_norm="Tdist", max_iteration=5)
    N = 4
    coords = np.stack([rng.uniform(30, W - 30, N),
                       rng.uniform(20, H - 20, N)], axis=1)
    d_init = np.full(N, disp / (BASELINE * FX))
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float64), (N, 4, 4))
    est = dr.solve(jnp.asarray(coords), eye, eye, jnp.asarray(d_init),
                   jnp.ones(N, bool), jnp.zeros(N), jnp.asarray(ts_l),
                   jnp.asarray(ts_r), rig, cfg)
    # scale2 relation (DepthProblemSolver.cpp:125)
    np.testing.assert_allclose(
        np.asarray(est.scale2),
        np.asarray(est.variance) * (cfg.td_nu - 2) / cfg.td_nu, rtol=1e-6)
