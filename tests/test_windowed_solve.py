"""Windowed vs direct depth-LM consistency + real-calibration loading."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from esvo_tpu.geometry.camera import make_ideal_rig, load_rig
from esvo_tpu.mapping import depth_refinement as dr

W, H = 240, 180
FX = 200.0
BASELINE = 0.1


def test_windowed_solve_matches_direct_sampling():
    """The window-sampled LM must agree with the direct full-image
    sampling path wherever the solution stays within the margin."""
    rng = np.random.default_rng(0)
    rig = make_ideal_rig(W, H, FX, FX, W / 2 - 0.5, H / 2 - 0.5, BASELINE,
                         dtype=jnp.float64)
    disp = 8
    base = rng.uniform(0, 255, size=(H, W + 64))
    k = np.ones(9) / 9
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, base)
    ts_l = jnp.asarray(base[:, 32:32 + W])
    ts_r = jnp.asarray(base[:, 32 + disp:32 + disp + W])

    N = 64
    coords = jnp.asarray(np.stack([rng.uniform(40, W - 40, N),
                                   rng.uniform(20, H - 20, N)], 1))
    d_true = disp / (FX * BASELINE)
    d_init = jnp.asarray(d_true * rng.uniform(0.9, 1.1, N))
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float64), (N, 4, 4))

    win = dr.solve(coords, eye, eye, d_init, jnp.ones(N, bool),
                   jnp.zeros(N), ts_l, ts_r, rig,
                   dr.DepthProblemConfig(max_iteration=10, window_margin=8))
    direct = dr.solve(coords, eye, eye, d_init, jnp.ones(N, bool),
                      jnp.zeros(N), ts_l, ts_r, rig,
                      dr.DepthProblemConfig(max_iteration=10,
                                            window_margin=-1))
    vw = np.asarray(win.valid)
    vd = np.asarray(direct.valid)
    both = vw & vd
    assert both.mean() > 0.9
    np.testing.assert_allclose(np.asarray(win.inv_depth)[both],
                               np.asarray(direct.inv_depth)[both],
                               rtol=1e-6, atol=1e-9)
    # variances come from the final-iteration Jacobian; events whose LM
    # trajectory brushed the window margin freeze at a slightly different
    # iteration, so compare at distribution level
    ratio = (np.asarray(win.variance)[both]
             / np.asarray(direct.variance)[both])
    assert np.median(np.abs(np.log(ratio))) < 0.05
    assert (np.abs(np.log(ratio)) < np.log(3)).mean() > 0.9


REF_CALIB = "/root/reference/esvo_core/calib"


@pytest.mark.skipif(not os.path.isdir(REF_CALIB),
                    reason="reference calib not mounted")
@pytest.mark.parametrize("name,baseline,model", [
    ("rpg", 0.1480, "plumb_bob"),
    ("upenn", 0.0999, "equidistant"),
    ("hkust", 0.0731, "plumb_bob"),
])
def test_load_real_calibration(name, baseline, model):
    """load_rig parses the reference's shipped calibration YAMLs and
    reproduces the published stereo baselines (CameraSystem.cpp:161-166)."""
    rig = load_rig(os.path.join(REF_CALIB, name), dtype=jnp.float64)
    assert rig.left.params.model == model
    np.testing.assert_allclose(float(rig.baseline), baseline, atol=5e-4)
    # rectification roundtrip at the image centre
    from esvo_tpu.geometry.camera import cam_to_world, world_to_cam
    x = jnp.asarray([[rig.left.width / 2.0, rig.left.height / 2.0]])
    back = world_to_cam(rig.left.params.P,
                        cam_to_world(rig.left.params.P, x, 0.5))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-8)
