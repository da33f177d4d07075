"""Tests for 6-DoF registration tracking."""
import numpy as np
import jax
import jax.numpy as jnp

from esvo_tpu.geometry.camera import make_ideal_rig, world_to_cam
from esvo_tpu.geometry.se3 import cayley_to_rot, se3_matrix
from esvo_tpu.tracking import registration as reg

W, H = 240, 180
FX = 200.0


def rig():
    return make_ideal_rig(W, H, FX, FX, W / 2 - 0.5, H / 2 - 0.5, 0.1,
                          dtype=jnp.float64)


def linear_image(a=0.7, b=-0.3, c=100.0):
    u = np.arange(W)[None, :]
    v = np.arange(H)[None, :].T
    return (a * u + b * v + c).astype(np.float64)


def test_analytic_jacobian_matches_finite_differences():
    """On a linear image both the Sobel gradient and the in-cell bilinear
    gradient are exact, so the analytic Jacobian must equal central
    finite differences of the raw residual."""
    rng = np.random.default_rng(0)
    cam = rig().left
    cfg = reg.RegProblemConfig(kernel_size=0)

    # a non-trivial T_ref_left
    Rm = np.asarray(cayley_to_rot(jnp.asarray([0.02, -0.01, 0.015])))
    t = np.array([0.05, -0.02, 0.1])
    T_world_ref = np.eye(4)
    T_world_cur = np.asarray(se3_matrix(jnp.asarray(Rm), jnp.asarray(t)))

    M = 50
    pts_ref = np.stack([rng.uniform(-0.4, 0.4, M),
                        rng.uniform(-0.3, 0.3, M),
                        rng.uniform(1.5, 3.0, M)], axis=1)
    pts_world = pts_ref  # ref frame == world
    # ts_left so that negative = 255 - img is linear too
    img = linear_image()
    prob = reg.make_problem(jnp.asarray(T_world_ref),
                            jnp.asarray(T_world_cur),
                            jnp.asarray(pts_world), jnp.ones(M, bool),
                            jnp.asarray(img), cfg)

    J = np.asarray(reg.analytic_jacobian(prob, prob.points,
                                         prob.point_valid, cam, cfg))

    eps = 1e-7
    J_fd = np.zeros((M, 6))
    for k in range(6):
        xp = np.zeros(6)
        xp[k] = eps
        _, rp, okp = reg.residuals_and_weights(prob, jnp.asarray(xp),
                                               prob.points, prob.point_valid,
                                               cam, cfg)
        _, rm, okm = reg.residuals_and_weights(prob, jnp.asarray(-xp),
                                               prob.points, prob.point_valid,
                                               cam, cfg)
        J_fd[:, k] = (np.asarray(rp)[:, 0] - np.asarray(rm)[:, 0]) / (2 * eps)
    ok = np.asarray(okp) & np.asarray(okm) & (np.abs(J).sum(1) > 0)
    assert ok.sum() > 30
    np.testing.assert_allclose(J[ok], J_fd[ok], rtol=1e-4, atol=1e-6)


def _render_edge_surface(pts_world, T_world_cam, cam):
    """TS with bright (255) blurred blobs at the projections of the points
    seen from T_world_cam — the time-surface edge pattern the tracker
    aligns to."""
    Tinv = np.linalg.inv(np.asarray(T_world_cam))
    p_cam = (Tinv[:3, :3] @ pts_world.T).T + Tinv[:3, 3]
    uv = np.asarray(world_to_cam(cam.params.P, jnp.asarray(p_cam)))
    # time-surface-like profile: 255 at each (sub-pixel) edge location,
    # smooth falloff with distance to the nearest edge
    gu, gv = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    d2min = np.full((H, W), np.inf, np.float32)
    for u, v in uv.astype(np.float32):
        if -5 <= u < W + 5 and -5 <= v < H + 5:
            d2 = (gu - u) ** 2 + (gv - v) ** 2
            np.minimum(d2min, d2, out=d2min)
    return (255.0 * np.exp(-d2min / (2 * 2.5 ** 2))).astype(np.float64)


def test_solver_recovers_pose():
    rng = np.random.default_rng(1)
    cam = rig().left
    cfg = reg.RegProblemConfig(kernel_size=0, batch_size=500,
                               max_iteration=30, lm_damping=1e-3,
                               huber_threshold=50.0)

    M = 2000
    pts_world = np.stack([rng.uniform(-0.3, 0.3, M),
                          rng.uniform(-0.22, 0.22, M),
                          rng.uniform(0.8, 1.6, M)], axis=1)

    # true current pose: small motion from identity
    R_true = np.asarray(cayley_to_rot(jnp.asarray([0.004, -0.003, 0.002])))
    t_true = np.array([0.015, -0.01, 0.02])
    T_true = np.eye(4)
    T_true[:3, :3] = R_true
    T_true[:3, 3] = t_true

    ts = _render_edge_surface(pts_world, T_true, cam)

    # initial guess: identity (previous frame pose)
    T_world_ref = np.eye(4)
    T_init = np.eye(4)
    prob = reg.make_problem(jnp.asarray(T_world_ref), jnp.asarray(T_init),
                            jnp.asarray(pts_world), jnp.ones(M, bool),
                            jnp.asarray(ts), cfg)
    prob, T_est, rms = jax.jit(
        lambda p: reg.solve(p, cam, cfg))(prob)

    T_est = np.asarray(T_est)
    t_err = np.linalg.norm(T_est[:3, 3] - t_true)
    R_err = np.arccos(np.clip((np.trace(T_est[:3, :3] @ R_true.T) - 1) / 2,
                              -1, 1))
    # initial offset |t_true| = 0.0269 m, 0.0054 rad; require most of it
    # to be recovered (per-frame precision; drift is bounded by the runtime
    # loop re-anchoring every cycle)
    assert t_err < 0.008, f"translation error {t_err}"
    assert R_err < 0.003, f"rotation error {R_err}"
    # cost decreased
    r = np.asarray(rms)
    assert r[-1] < r[0]


def test_pose_of_roundtrip():
    cfg = reg.RegProblemConfig()
    Rm = cayley_to_rot(jnp.asarray([0.1, -0.05, 0.02]))
    t = jnp.asarray([0.3, 0.1, -0.2])
    T_world_ref = se3_matrix(cayley_to_rot(jnp.asarray([0.05, 0.0, -0.01])),
                             jnp.asarray([1.0, 2.0, 3.0]))
    T_world_cur = T_world_ref @ se3_matrix(Rm, t)
    prob = reg.make_problem(T_world_ref, T_world_cur,
                            jnp.zeros((4, 3), jnp.float64),
                            jnp.ones(4, bool),
                            jnp.zeros((H, W), jnp.float64), cfg)
    np.testing.assert_allclose(np.asarray(reg.pose_of(prob)),
                               np.asarray(T_world_cur), atol=1e-12)


def test_solve_spd_matches_dense_solve():
    from esvo_tpu.ops.linalg import solve_spd
    rng = np.random.default_rng(7)
    for n in (3, 6, 9):
        A = rng.standard_normal((n, n))
        A = A @ A.T + n * np.eye(n)
        b = rng.standard_normal(n)
        x = solve_spd(jnp.asarray(A), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                                   rtol=1e-5, atol=1e-8)


def test_numerical_jacobian_matches_analytic_1x1():
    """jacfwd path == analytic path for the 1x1 reference default
    (RegProblemSolverLM.cpp:76-145 vs :148-217)."""
    rng = np.random.default_rng(3)
    cam = rig().left
    cfg = reg.RegProblemConfig(kernel_size=0)
    Rm = np.asarray(cayley_to_rot(jnp.asarray([0.02, -0.01, 0.015])))
    t = np.array([0.05, -0.02, 0.1])
    T_world_cur = np.asarray(se3_matrix(jnp.asarray(Rm), jnp.asarray(t)))
    M = 50
    pts_world = np.stack([rng.uniform(-0.4, 0.4, M),
                          rng.uniform(-0.3, 0.3, M),
                          rng.uniform(1.5, 3.0, M)], axis=1)
    img = linear_image()
    prob = reg.make_problem(jnp.eye(4, dtype=jnp.float64),
                            jnp.asarray(T_world_cur),
                            jnp.asarray(pts_world), jnp.ones(M, bool),
                            jnp.asarray(img), cfg)
    Ja = np.asarray(reg.analytic_jacobian(prob, prob.points,
                                          prob.point_valid, cam, cfg))
    Jn = np.asarray(reg.numerical_jacobian(prob, prob.points,
                                           prob.point_valid, cam, cfg))
    ok = np.abs(Ja).sum(1) > 0
    assert ok.sum() > 30
    # linear image: the Sobel gradient (/8) equals the bilinear in-cell
    # gradient exactly, so both Jacobians agree to numerical precision
    np.testing.assert_allclose(Jn[ok], Ja[ok], rtol=1e-6, atol=1e-9)


def test_solver_recovers_pose_patch3x3():
    """Patch sizes > 1x1 (reference RegProblemLM.cpp:418-487 supports
    arbitrary patches through the numerical-diff solver)."""
    rng = np.random.default_rng(4)
    cam = rig().left
    cfg = reg.RegProblemConfig(kernel_size=0, batch_size=500,
                               max_iteration=30, patch_size_x=3,
                               patch_size_y=3)
    M = 2000
    pts_world = np.stack([rng.uniform(-0.3, 0.3, M),
                          rng.uniform(-0.22, 0.22, M),
                          rng.uniform(0.8, 1.6, M)], axis=1)
    R_true = np.asarray(cayley_to_rot(jnp.asarray([0.004, -0.003, 0.002])))
    t_true = np.array([0.015, -0.01, 0.02])
    T_true = np.eye(4)
    T_true[:3, :3] = R_true
    T_true[:3, 3] = t_true
    ts = _render_edge_surface(pts_world, T_true, cam)
    prob = reg.make_problem(jnp.eye(4, dtype=jnp.float64),
                            jnp.eye(4, dtype=jnp.float64),
                            jnp.asarray(pts_world), jnp.ones(M, bool),
                            jnp.asarray(ts), cfg)
    prob, T_est, rms = jax.jit(lambda p: reg.solve(p, cam, cfg))(prob)
    T_est = np.asarray(T_est)
    t_err = np.linalg.norm(T_est[:3, 3] - t_true)
    R_err = np.arccos(np.clip((np.trace(T_est[:3, :3] @ R_true.T) - 1) / 2,
                              -1, 1))
    assert t_err < 0.010, f"translation error {t_err}"
    assert R_err < 0.004, f"rotation error {R_err}"
