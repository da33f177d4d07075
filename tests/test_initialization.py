"""Tests for SGM bootstrap, edge mask, and event denoising."""
import numpy as np
import jax.numpy as jnp

from esvo_tpu.geometry.camera import make_ideal_rig
from esvo_tpu.mapping import initialization as init

W, H = 128, 96
FX = 100.0
BASELINE = 0.1


def rig():
    return make_ideal_rig(W, H, FX, FX, W / 2 - 0.5, H / 2 - 0.5, BASELINE,
                          dtype=jnp.float64)


def textured_pair(disp, rng):
    base = rng.uniform(0, 255, size=(H, W + 64))
    k = np.ones(3) / 3
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    left = base[:, 32:32 + W]
    right = base[:, 32 + disp:32 + disp + W]
    return left, right


def test_sgm_constant_disparity():
    rng = np.random.default_rng(0)
    disp_true = 7
    left, right = textured_pair(disp_true, rng)
    cfg = init.SGMConfig(num_disparities=32)
    disp, valid = init.semi_global_matching(jnp.asarray(left),
                                            jnp.asarray(right), cfg)
    d = np.asarray(disp)
    v = np.asarray(valid)
    inner = np.zeros_like(v)
    inner[10:-10, 40:-10] = True  # away from borders & occluded strip
    sel = v & inner
    assert sel.mean() > 0.3
    err = np.abs(d[sel] - disp_true)
    assert np.median(err) < 0.5
    assert (err < 1.0).mean() > 0.9


def test_sgm_two_planes():
    rng = np.random.default_rng(1)
    base = rng.uniform(0, 255, size=(H, W + 64))
    k = np.ones(3) / 3
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    left = base[:, 32:32 + W].copy()
    right = np.empty_like(left)
    right[:H // 2] = base[:H // 2, 32 + 4:32 + 4 + W]
    right[H // 2:] = base[H // 2:, 32 + 12:32 + 12 + W]
    cfg = init.SGMConfig(num_disparities=32)
    disp, valid = init.semi_global_matching(jnp.asarray(left),
                                            jnp.asarray(right), cfg)
    d = np.asarray(disp)
    v = np.asarray(valid)
    top = d[10:H // 2 - 8, 40:-10][v[10:H // 2 - 8, 40:-10]]
    bot = d[H // 2 + 8:-10, 40:-10][v[H // 2 + 8:-10, 40:-10]]
    assert np.median(np.abs(top - 4)) < 0.5
    assert np.median(np.abs(bot - 12)) < 0.5


def test_edge_mask_and_denoise():
    xs = jnp.asarray([[3.2, 4.7], [10.0, 10.0], [127.9, 95.2]])
    m = init.event_edge_mask(xs, jnp.ones(3, bool), H, W, radius=0)
    m = np.asarray(m)
    assert m[4, 3] and m[10, 10] and m[95, 127]
    assert m.sum() == 3
    # dilation radius 1 -> 3x3 footprints (clipped at the border)
    m1 = np.asarray(init.event_edge_mask(xs, jnp.ones(3, bool), H, W,
                                         radius=1))
    assert m1[3:6, 2:5].all() and m1.sum() == 9 + 9 + 4

    # denoising: a dense 3x3 block survives the median filter, a lone
    # pixel does not
    xr = [20, 20, 20, 21, 21, 21, 22, 22, 22, 60]
    yr = [30, 31, 32, 30, 31, 32, 30, 31, 32, 70]
    mask = init.denoising_mask(jnp.asarray(xr), jnp.asarray(yr),
                               jnp.ones(10, bool), H, W)
    mask = np.asarray(mask)
    assert mask[31, 21]
    assert not mask[70, 60]
    # median blur rejects the block's corner pixels (4/9 neighbours set)
    assert not mask[30, 20]

    keep = init.select_denoised(jnp.asarray(xr), jnp.asarray(yr),
                                jnp.ones(10, bool), jnp.asarray(mask),
                                max_num=3)
    k = np.asarray(keep)
    # survivors are the non-corner block events: indices 1, 3, 4, 5, 7;
    # the cap keeps the first 3 of them
    np.testing.assert_array_equal(np.nonzero(k)[0], [1, 3, 4])


def test_sgm_depth_points_roundtrip():
    rng = np.random.default_rng(2)
    disp_true = 8
    left, right = textured_pair(disp_true, rng)
    cfg = init.SGMConfig(num_disparities=32)
    n = 200
    coords = np.stack([rng.uniform(45, W - 12, n),
                       rng.uniform(12, H - 12, n)], axis=1)
    est = init.sgm_depth_points(
        jnp.asarray(left), jnp.asarray(right), jnp.asarray(coords),
        jnp.ones(n, bool), jnp.eye(4, dtype=jnp.float64), rig(), cfg,
        inv_depth_min=0.2, inv_depth_max=2.0, init_age=1)
    v = np.asarray(est.valid)
    assert v.mean() > 0.3
    want = disp_true / (FX * BASELINE)
    got = np.asarray(est.inv_depth)[v]
    assert np.median(np.abs(got - want)) < 0.05 * want
    assert (np.asarray(est.age)[v] == 1).all()
    np.testing.assert_allclose(np.asarray(est.variance)[v], 1e-6)
