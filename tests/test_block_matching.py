"""Tests for dense stereo block matching (reference EventBM)."""
import numpy as np
import jax.numpy as jnp

from esvo_tpu.geometry.camera import make_ideal_rig
from esvo_tpu.mapping import block_matching as bm

W, H = 240, 180
FX = 200.0
BASELINE = 0.1


def rig():
    return make_ideal_rig(W, H, FX, FX, W / 2 - 0.5, H / 2 - 0.5, BASELINE,
                          dtype=jnp.float64)


def shifted_pair(rng, disp):
    base = rng.uniform(0, 255, size=(H, W + 64))
    k = np.ones(5) / 5
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    return base[:, 32:32 + W], base[:, 32 + disp:32 + disp + W]


def test_recovers_constant_disparity():
    rng = np.random.default_rng(0)
    disp = 9
    ts_l, ts_r = shifted_pair(rng, disp)
    r = rig()
    cfg = bm.BlockMatchConfig(zncc_threshold=0.1)
    N = 300
    x = np.stack([rng.uniform(60, W - 20, N), rng.uniform(10, H - 10, N)],
                 axis=1)
    out = bm.match_events(jnp.asarray(ts_l), jnp.asarray(ts_r),
                          jnp.asarray(x), jnp.asarray(x),
                          jnp.zeros(N), jnp.ones(N, bool), r.left.mask,
                          r, cfg)
    v = np.asarray(out.valid)
    assert v.mean() > 0.9
    np.testing.assert_array_equal(np.asarray(out.disparity)[v], disp)
    want = disp / (FX * BASELINE)
    np.testing.assert_allclose(np.asarray(out.inv_depth)[v], want,
                               rtol=1e-9)
    # matched right coordinate
    xr = np.asarray(out.x_right)[v]
    np.testing.assert_array_equal(xr[:, 0],
                                  np.floor(x[v][:, 0]) - disp)


def test_boundary_minimum_accepted_at_step_1():
    """With step=1 the reference's fine pass accepts on threshold alone
    (EventBM.cpp:222-227 — the neighbour-validity test only guards the
    coarse pass), so a minimum at the disparity-range boundary must
    match; with step>1 the coarse-pass test rejects it."""
    rng = np.random.default_rng(4)
    disp = 1
    ts_l, ts_r = shifted_pair(rng, disp)
    r = rig()
    N = 200
    x = np.stack([rng.uniform(60, W - 20, N), rng.uniform(10, H - 10, N)],
                 axis=1)
    args = (jnp.asarray(ts_l), jnp.asarray(ts_r), jnp.asarray(x),
            jnp.asarray(x), jnp.zeros(N), jnp.ones(N, bool), r.left.mask, r)
    # true disparity == min_disparity: boundary minimum
    fine = bm.match_events(*args, bm.BlockMatchConfig(min_disparity=1))
    v = np.asarray(fine.valid)
    assert v.mean() > 0.9
    np.testing.assert_array_equal(np.asarray(fine.disparity)[v], disp)
    coarse = bm.match_events(*args, bm.BlockMatchConfig(min_disparity=1,
                                                        step=2))
    assert np.asarray(coarse.valid).mean() < 0.1


def test_zncc_cost_matches_reference_formula():
    """Cost at the winning disparity equals 0.5*(1 - ncc) of the
    mean/sigma-normalized integer-aligned patches
    (EventBM.cpp:317-333, tools/utils.h:74-92)."""
    rng = np.random.default_rng(1)
    disp = 5
    ts_l, ts_r = shifted_pair(rng, disp)
    # corrupt the right image so the match is imperfect
    ts_r = ts_r + rng.normal(0, 10, ts_r.shape)
    r = rig()
    cfg = bm.BlockMatchConfig(zncc_threshold=1.0)
    x = np.asarray([[100.3, 60.7]])
    out = bm.match_events(jnp.asarray(ts_l), jnp.asarray(ts_r),
                          jnp.asarray(x), jnp.asarray(x), jnp.zeros(1),
                          jnp.ones(1, bool), r.left.mask, r, cfg)
    d = int(np.asarray(out.disparity)[0])
    ui, vi = int(np.floor(x[0, 0])), int(np.floor(x[0, 1]))
    hl = ts_l[vi - 3:vi + 4, ui - 7:ui + 8]
    hr = ts_r[vi - 3:vi + 4, ui - d - 7:ui - d + 8]

    def norm(p):
        c = p - p.mean()
        return c / (np.sqrt((c ** 2).mean()) + 1e-6)

    ncc = (norm(hl) * norm(hr)).mean()
    np.testing.assert_allclose(float(out.cost[0]), 0.5 * (1 - ncc),
                               rtol=1e-9)


def test_low_texture_rejection():
    r = rig()
    cfg = bm.BlockMatchConfig()
    ts = jnp.zeros((H, W), jnp.float64)   # black surfaces -> no info
    x = jnp.asarray([[100.0, 60.0]])
    out = bm.match_events(ts, ts, x, x, jnp.zeros(1), jnp.ones(1, bool),
                          r.left.mask, r, cfg)
    assert not bool(out.valid[0])


def test_up_down_configuration():
    """Vertical-baseline search (bUpDownConfiguration,
    EventBM.cpp:181-184): right surface shifted vertically."""
    rng = np.random.default_rng(2)
    disp = 6
    base = rng.uniform(0, 255, size=(H + 64, W))
    k = np.ones(5) / 5
    base = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, base)
    ts_l = base[32:32 + H, :]
    ts_r = base[32 + disp:32 + disp + H, :]
    r = rig()
    cfg = bm.BlockMatchConfig(up_down=True, zncc_threshold=0.1)
    N = 100
    x = np.stack([rng.uniform(20, W - 20, N), rng.uniform(40, H - 20, N)],
                 axis=1)
    out = bm.match_events(jnp.asarray(ts_l), jnp.asarray(ts_r),
                          jnp.asarray(x), jnp.asarray(x), jnp.zeros(N),
                          jnp.ones(N, bool), r.left.mask, r, cfg)
    v = np.asarray(out.valid)
    assert v.mean() > 0.8
    np.testing.assert_array_equal(np.asarray(out.disparity)[v], disp)
    # vertical baseline: matched coordinate moves along y
    xr = np.asarray(out.x_right)[v]
    np.testing.assert_array_equal(xr[:, 1], np.floor(x[v][:, 1]) - disp)


def test_matmul_strategy_matches_slice():
    """The MXU cost-volume path (banded-ones matmul horizontal box) must
    produce the same matches as the slice-add path — the box sums have
    identical zero-padding semantics, so any divergence is a bug."""
    rng = np.random.default_rng(3)
    disp = 7
    ts_l, ts_r = shifted_pair(rng, disp)
    ts_r = ts_r + rng.normal(0, 10, ts_r.shape)
    r = rig()
    N = 256
    x = np.stack([rng.uniform(60, W - 20, N), rng.uniform(10, H - 10, N)],
                 axis=1)
    args = (jnp.asarray(ts_l, jnp.float32), jnp.asarray(ts_r, jnp.float32),
            jnp.asarray(x, jnp.float32), jnp.asarray(x, jnp.float32),
            jnp.zeros(N), jnp.ones(N, bool), r.left.mask, r)
    a = bm.match_events(*args, bm.BlockMatchConfig(cost_strategy="slice",
                                                   zncc_threshold=1.0))
    b = bm.match_events(*args, bm.BlockMatchConfig(cost_strategy="matmul",
                                                   zncc_threshold=1.0))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_array_equal(np.asarray(a.disparity),
                                  np.asarray(b.disparity))
    # argmin agreement (asserted exactly above) is the real invariant;
    # on TPU the matmul path (bf16x3 Precision.HIGH) deviates up to
    # ~6e-5 on [0,1] costs depending on the disparity range
    np.testing.assert_allclose(np.asarray(a.cost), np.asarray(b.cost),
                               atol=2e-4)
