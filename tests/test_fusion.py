"""Tests for dense-grid propagation, fusion and regularization."""
import numpy as np
import jax
import jax.numpy as jnp

from esvo_tpu.geometry.camera import make_ideal_rig
from esvo_tpu.mapping.depth_refinement import DepthEstimates
from esvo_tpu.mapping import fusion as fu
from esvo_tpu.mapping.regularization import RegularizationConfig, regularize

W, H = 64, 48
FX = 50.0


def rig():
    return make_ideal_rig(W, H, FX, FX, W / 2 - 0.5, H / 2 - 0.5, 0.1,
                          dtype=jnp.float64)


def make_estimates(xs, invds, variances, residuals=None, ages=None,
                   T=None, nu=3.0):
    n = len(xs)
    xs = np.asarray(xs, float)
    invds = np.asarray(invds, float)
    variances = np.asarray(variances, float)
    residuals = np.zeros(n) if residuals is None else np.asarray(residuals,
                                                                 float)
    ages = np.zeros(n, np.int32) if ages is None else np.asarray(ages,
                                                                 np.int32)
    P = np.asarray(rig().left.params.P)
    A = P[:, :3]
    p_cam = np.stack([np.linalg.inv(A) @ ((1.0 / invds[i])
                                          * np.array([xs[i, 0], xs[i, 1], 1.0])
                                          - P[:, 3]) for i in range(n)])
    if T is None:
        T = np.broadcast_to(np.eye(4), (n, 4, 4))
    nu_arr = np.full(n, nu)
    scale2 = variances * (nu_arr - 2) / nu_arr
    return DepthEstimates(
        x=jnp.asarray(xs), inv_depth=jnp.asarray(invds),
        variance=jnp.asarray(variances), scale2=jnp.asarray(scale2),
        nu=jnp.asarray(nu_arr), residual=jnp.asarray(residuals),
        age=jnp.asarray(ages), p_cam=jnp.asarray(p_cam),
        T_world_cam=jnp.asarray(T, dtype=jnp.float64),
        valid=jnp.ones(n, bool))


def test_propagate_identity_preserves_depth():
    est = make_estimates([[20.3, 10.7]], [0.5], [1e-4])
    cfg = fu.FusionConfig(ls_norm="Tdist")
    cand = fu.propagate_points(est, jnp.eye(4, dtype=jnp.float64),
                               rig().left, cfg)
    assert bool(cand.valid[0])
    np.testing.assert_allclose(float(cand.inv_depth[0]), 0.5, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(cand.x[0]), [20.3, 10.7],
                               rtol=1e-9)
    # identity transform: J = 1, stats unchanged
    np.testing.assert_allclose(float(cand.scale2[0]),
                               float(est.scale2[0]), rtol=1e-10)


def test_propagate_uncertainty_jacobian():
    """Translation along z changes invDepth by J = z_prior^2/z_prop^2."""
    est = make_estimates([[31.5, 23.5]], [0.5], [1e-4])  # principal point
    T = np.eye(4)
    T[2, 3] = -0.5  # move camera forward 0.5m -> point at z=1.5
    cfg = fu.FusionConfig(ls_norm="l2")
    cand = fu.propagate_points(est, jnp.asarray(T), rig().left, cfg)
    np.testing.assert_allclose(float(cand.inv_depth[0]), 1.0 / 1.5,
                               rtol=1e-9)
    J = 1.0 / (1.5 / 2.0) ** 2 * 1.0  # T22=1, denom = (0 + t_z)/z + 1
    np.testing.assert_allclose(float(cand.variance[0]), J * J * 1e-4,
                               rtol=1e-9)


def test_fuse_insert_empty():
    grid = fu.empty_grid(H, W, jnp.float64)
    est = make_estimates([[20.3, 10.7]], [0.5], [1e-4], residuals=[7.0],
                         ages=[3])
    cfg = fu.FusionConfig(ls_norm="Tdist")
    cand = fu.propagate_points(est, jnp.eye(4, dtype=jnp.float64),
                               rig().left, cfg)
    grid, nfused, ndrop = fu.fuse_frame(grid, cand, rig().left, cfg)
    assert int(nfused) == 0 and int(ndrop) == 0
    occ = np.asarray(grid.occupied)
    # 2x2 footprint at floor coords (10..11, 20..21)
    assert occ[10:12, 20:22].all()
    assert occ.sum() == 4
    np.testing.assert_allclose(np.asarray(grid.inv_depth)[10:12, 20:22],
                               0.5, rtol=1e-9)
    assert (np.asarray(grid.age)[10:12, 20:22] == 3).all()
    np.testing.assert_allclose(np.asarray(grid.residual)[10:12, 20:22], 7.0)
    # inserted p_cam is back-projected at the pixel centre
    P = np.asarray(rig().left.params.P)
    A = P[:, :3]
    want = np.linalg.inv(A) @ (2.0 * np.array([20.5, 10.5, 1.0]) - P[:, 3])
    np.testing.assert_allclose(np.asarray(grid.p_cam)[10, 20], want,
                               rtol=1e-9)


def test_fuse_compatible_tdist_matches_pairwise():
    cfg = fu.FusionConfig(ls_norm="Tdist")
    grid = fu.empty_grid(H, W, jnp.float64)
    est0 = make_estimates([[20.3, 10.7]], [0.5], [1e-4], nu=3.0)
    cand0 = fu.propagate_points(est0, jnp.eye(4, dtype=jnp.float64),
                                rig().left, cfg)
    grid, _, _ = fu.fuse_frame(grid, cand0, rig().left, cfg)
    # compatible second point (within 2 sigma)
    est1 = make_estimates([[20.3, 10.7]], [0.505], [1e-4], nu=4.0)
    cand1 = fu.propagate_points(est1, jnp.eye(4, dtype=jnp.float64),
                                rig().left, cfg)
    grid, nfused, _ = fu.fuse_frame(grid, cand1, rig().left, cfg)
    assert int(nfused) == 4

    # manual pairwise Student-t posterior (DepthPoint.cpp:167-188)
    s2_a = 1e-4 * (3 - 2) / 3
    s2_b = 1e-4 * (4 - 2) / 4
    nu_u = min(4.0, 3.0)
    invD = (s2_b * 0.5 + s2_a * 0.505) / (s2_a + s2_b)
    s2 = (nu_u + (0.5 - 0.505) ** 2 / (s2_a + s2_b)) / (nu_u + 1) \
        * (s2_a * s2_b) / (s2_a + s2_b)
    nu_post = nu_u + 1
    var = nu_post / (nu_post - 2) * s2
    g = np.asarray(grid.inv_depth)
    np.testing.assert_allclose(g[10, 20], invD, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(grid.scale2)[10, 20], s2,
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(grid.variance)[10, 20], var,
                               rtol=1e-9)
    assert int(np.asarray(grid.age)[10, 20]) == 2  # +2 per Tdist fusion
    np.testing.assert_allclose(np.asarray(grid.nu)[10, 20], nu_post)


def test_fuse_gaussian_points_under_tdist_no_nan():
    """nu=inf marks Gaussian-statistics points (SGM bootstrap emits
    duplicates per pixel); fusing two of them under the default Tdist
    norm must produce the Gaussian-product posterior, not inf/inf=NaN
    (which clean_grid would then silently drop)."""
    cfg = fu.FusionConfig(ls_norm="Tdist")
    grid = fu.empty_grid(H, W, jnp.float64)
    for d in (0.5, 0.505):
        est = make_estimates([[20.3, 10.7]], [d], [1e-4], nu=np.inf)
        cand = fu.propagate_points(est, jnp.eye(4, dtype=jnp.float64),
                                   rig().left, cfg)
        grid, nfused, _ = fu.fuse_frame(grid, cand, rig().left, cfg)
    assert int(nfused) == 4
    g = np.asarray(grid.inv_depth)
    assert np.isfinite(g[10, 20])
    # Gaussian product: equal variances -> mean of the two estimates
    np.testing.assert_allclose(g[10, 20], 0.5025, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(grid.variance)[10, 20], 5e-5,
                               rtol=1e-9)
    assert np.isinf(np.asarray(grid.nu)[10, 20])
    # and the fused cell survives the validity clean
    cleaned = fu.clean_grid(grid, var_threshold=1e-3, age_threshold=0,
                            inv_depth_max=2.0, inv_depth_min=0.1)
    assert bool(np.asarray(cleaned.occupied)[10, 20])


def test_clean_grid_resets_subpixel_x():
    """Emptied cells must forget their point's propagated sub-pixel
    coordinate (the reference's clean removes the DepthPoint; a new
    insert back-projects at the pixel centre)."""
    grid = fu.empty_grid(H, W, jnp.float64)
    # an occupied cell whose x was moved off-centre by the replace rule
    grid = grid.replace(
        inv_depth=grid.inv_depth.at[10, 20].set(0.5),
        variance=grid.variance.at[10, 20].set(1e-4),
        x=grid.x.at[10, 20].set(jnp.asarray([20.3, 10.7])))
    cleaned = fu.clean_grid(grid, var_threshold=1e-9, age_threshold=5,
                            inv_depth_max=2.0, inv_depth_min=0.1)
    assert not np.asarray(cleaned.occupied)[10, 20]
    np.testing.assert_allclose(np.asarray(cleaned.x)[10, 20], [20.5, 10.5])
    # surviving cells keep their coordinate
    grid2 = grid.replace(age=grid.age.at[10, 20].set(9),
                         variance=grid.variance.at[10, 20].set(1e-10))
    kept = fu.clean_grid(grid2, var_threshold=1e-9, age_threshold=5,
                         inv_depth_max=2.0, inv_depth_min=0.1)
    assert bool(np.asarray(kept.occupied)[10, 20])
    np.testing.assert_allclose(np.asarray(kept.x)[10, 20], [20.3, 10.7])


def test_fuse_occlusion_keeps_closer_point():
    cfg = fu.FusionConfig(ls_norm="l2")
    grid = fu.empty_grid(H, W, jnp.float64)
    near = make_estimates([[20.3, 10.7]], [1.0], [1e-6], residuals=[1.0])
    cand = fu.propagate_points(near, jnp.eye(4, dtype=jnp.float64),
                               rig().left, cfg)
    grid, _, _ = fu.fuse_frame(grid, cand, rig().left, cfg)
    # far incompatible point with better stats must NOT replace (occluded)
    far = make_estimates([[20.3, 10.7]], [0.2], [1e-8], residuals=[0.1])
    cand = fu.propagate_points(far, jnp.eye(4, dtype=jnp.float64),
                               rig().left, cfg)
    grid, nfused, _ = fu.fuse_frame(grid, cand, rig().left, cfg)
    assert int(nfused) == 0
    np.testing.assert_allclose(np.asarray(grid.inv_depth)[10, 20], 1.0,
                               rtol=1e-9)


def test_fuse_replace_on_better_incompatible():
    cfg = fu.FusionConfig(ls_norm="l2")
    grid = fu.empty_grid(H, W, jnp.float64)
    far = make_estimates([[20.3, 10.7]], [0.2], [1e-4], residuals=[5.0])
    cand = fu.propagate_points(far, jnp.eye(4, dtype=jnp.float64),
                               rig().left, cfg)
    grid, _, _ = fu.fuse_frame(grid, cand, rig().left, cfg)
    # closer point, incompatible, better variance & residual -> replace
    near = make_estimates([[20.3, 10.7]], [1.0], [1e-5], residuals=[0.5])
    cand = fu.propagate_points(near, jnp.eye(4, dtype=jnp.float64),
                               rig().left, cfg)
    grid, nfused, _ = fu.fuse_frame(grid, cand, rig().left, cfg)
    assert int(nfused) == 0
    np.testing.assert_allclose(np.asarray(grid.inv_depth)[10, 20], 1.0,
                               rtol=1e-9)
    # replace adopts the candidate's sub-pixel coordinate
    np.testing.assert_allclose(np.asarray(grid.x)[10, 20], [20.3, 10.7],
                               rtol=1e-9)


def test_clean_grid():
    grid = fu.empty_grid(H, W, jnp.float64)
    grid = grid.replace(
        inv_depth=grid.inv_depth.at[5, 5].set(0.5).at[6, 6].set(0.5),
        variance=grid.variance.at[5, 5].set(1e-6).at[6, 6].set(1.0),
        age=grid.age.at[5, 5].set(3).at[6, 6].set(3))
    out = fu.clean_grid(grid, var_threshold=1e-4, age_threshold=1,
                        inv_depth_max=2.0, inv_depth_min=0.2)
    occ = np.asarray(out.occupied)
    assert occ[5, 5] and not occ[6, 6]


def _grid_with_cluster(ls_norm):
    grid = fu.empty_grid(H, W, jnp.float64)
    rng = np.random.default_rng(3)
    invD = np.array(grid.inv_depth)
    var = np.array(grid.variance)
    s2 = np.array(grid.scale2)
    nu = np.array(grid.nu)
    coords = [(20 + dy, 30 + dx) for dy in range(-2, 3) for dx in range(-2, 3)]
    vals = 0.5 + 0.001 * rng.standard_normal(len(coords))
    for (r, c), v in zip(coords, vals):
        invD[r, c] = v
        var[r, c] = 1e-4
        s2[r, c] = 1e-4 * (3 - 2) / 3
        nu[r, c] = 3.0
    # isolated point far away
    invD[40, 50] = 0.7
    var[40, 50] = 1e-4
    s2[40, 50] = 1e-4 / 3
    nu[40, 50] = 3.0
    return grid.replace(inv_depth=jnp.asarray(invD),
                        variance=jnp.asarray(var), scale2=jnp.asarray(s2),
                        nu=jnp.asarray(nu)), coords, vals


def test_regularize_l2():
    grid, coords, vals = _grid_with_cluster("l2")
    cfg = RegularizationConfig(ls_norm="l2", radius=5, min_neighbours=8,
                               min_close_neighbours=8)
    out = regularize(grid, cfg)
    inv = np.asarray(out.inv_depth)
    # equal variances -> plain mean of close neighbours (all 25 for centre)
    np.testing.assert_allclose(inv[20, 30], vals.mean(), rtol=1e-9)
    # isolated point is invalidated
    assert inv[40, 50] == fu.EMPTY
    # untouched empty cells stay empty
    assert inv[0, 0] == fu.EMPTY


def test_regularize_tdist_matches_sequential_fold():
    grid, coords, vals = _grid_with_cluster("Tdist")
    cfg = RegularizationConfig(ls_norm="Tdist", radius=5, min_neighbours=8,
                               min_close_neighbours=8)
    out = regularize(grid, cfg)
    inv = np.asarray(out.inv_depth)

    # golden: sequential pairwise posterior in row-major window order for
    # the centre pixel (DepthRegularization.cpp:66-88)
    centre = (20, 30)
    neigh = sorted(coords)  # row-major == sorted for this block
    nu_p, d_p, s_p = None, None, None
    for (r, c) in neigh:
        v = vals[coords.index((r, c))]
        s2 = 1e-4 / 3
        if nu_p is None:
            nu_p, d_p, s_p = 3.0, v, s2
            continue
        nu_u = min(nu_p, 3.0)
        d_new = (s2 * d_p + s_p * v) / (s_p + s2)
        s_new = (nu_u + (d_p - v) ** 2 / (s_p + s2)) / (nu_u + 1) \
            * (s_p * s2) / (s_p + s2)
        # regularization keeps nu_post = min (NO +1 — that increment is
        # fusion's update_studentT, DepthPoint.cpp:177; the fold is
        # DepthRegularization.cpp:82-85)
        nu_p, d_p, s_p = nu_u, d_new, s_new
    np.testing.assert_allclose(inv[centre], d_p, rtol=1e-9)


def test_regularize_tdist_no_nu_increment():
    """Mixed-nu neighbourhoods distinguish the regularization fold from
    fusion's update_studentT: the carried nu must stay min() of what was
    folded, never incremented (DepthRegularization.cpp:82)."""
    from esvo_tpu.mapping.regularization import _reg_tdist_posterior
    # fold three estimates with ASCENDING nu: 2.2, 5.0, 9.0
    d, s2, nu = 0.5, 1e-4, 2.2
    d, s2, nu = [float(x) for x in
                 _reg_tdist_posterior(d, s2, nu, 0.52, 2e-4, 5.0)]
    assert nu == 2.2  # min(2.2, 5.0), no +1
    d2, s22, nu2 = [float(x) for x in
                    _reg_tdist_posterior(d, s2, nu, 0.48, 1.5e-4, 9.0)]
    assert nu2 == 2.2
    # manual recursion (reference formulas)
    dd = (2e-4 * 0.5 + 1e-4 * 0.52) / 3e-4
    ss = (2.2 + (0.5 - 0.52) ** 2 / 3e-4) / 3.2 * (1e-4 * 2e-4) / 3e-4
    np.testing.assert_allclose(d, dd, rtol=1e-12)
    np.testing.assert_allclose(s2, ss, rtol=1e-12)


def _random_candidates(rng, n, dense=False):
    """Random propagated candidates; dense=True concentrates them on a
    few pixels so slots overflow (num_dropped > 0)."""
    hi_x, hi_y = (8.0, 6.0) if dense else (W - 2.0, H - 2.0)
    xs = np.stack([rng.uniform(0.5, hi_x, n),
                   rng.uniform(0.5, hi_y, n)], 1)
    return fu.Candidates(
        inv_depth=jnp.asarray(rng.uniform(0.2, 2.0, n)),
        variance=jnp.asarray(rng.uniform(1e-5, 1e-2, n)),
        scale2=jnp.asarray(rng.uniform(1e-5, 1e-2, n)),
        nu=jnp.asarray(rng.choice([3.0, 5.0, np.inf], n)),
        residual=jnp.asarray(rng.uniform(0, 30, n)),
        age=jnp.asarray(rng.integers(0, 5, n), jnp.int32),
        x=jnp.asarray(xs),
        p_cam=jnp.asarray(rng.normal(size=(n, 3)) + [0, 0, 2.0]),
        valid=jnp.asarray(rng.random(n) > 0.2))


def test_slot_assignment_deterministic_and_overflow_counted():
    """The best-K-per-pixel slot assignment must be deterministic (stable
    sort: ties break by original index) and count per-pixel overflow
    drops when candidates exceed max_candidates_per_pixel (the reference
    fuses every propagated point sequentially; the batched fold caps K
    per pixel and the count keeps the truncation observable)."""
    rng = np.random.default_rng(11)
    r = rig()
    for dense in (False, True):
        cand = _random_candidates(rng, 600, dense=dense)
        for ls_norm in ("Tdist", "l2"):
            cfg = fu.FusionConfig(ls_norm=ls_norm,
                                  max_candidates_per_pixel=4)
            g0 = fu.empty_grid(H, W, jnp.float64)
            g1, nf1, nd1 = fu.fuse_frame(g0, cand, r.left, cfg)
            g2, nf2, nd2 = fu.fuse_frame(g0, cand, r.left, cfg)
            assert (int(nf1), int(nd1)) == (int(nf2), int(nd2))
            if dense:
                assert int(nd1) > 0  # overflow actually exercised
            for a, b in zip(jax.tree_util.tree_leaves(g1),
                            jax.tree_util.tree_leaves(g2)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
