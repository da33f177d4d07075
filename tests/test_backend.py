"""Tests for the Schur-complement bundle-adjustment backend."""
import numpy as np
import jax
import jax.numpy as jnp

from esvo_tpu.backend.bundle_adjustment import (BAProblem, BAConfig,
                                                bundle_adjust,
                                                reprojection_residuals)
from esvo_tpu.backend.keyframes import KeyframeGraph, build_ba_problem
from esvo_tpu.geometry.se3 import cayley_to_rot

FX = FY = 200.0
CX, CY = 120.0, 90.0


def synthetic_problem(rng, K=5, P=150, pose_noise=0.01, point_noise=0.02,
                      pix_noise=0.0):
    """GT scene + noisy initialization. Returns (problem, gt_poses,
    gt_points)."""
    gt_points = np.stack([rng.uniform(-0.8, 0.8, P),
                          rng.uniform(-0.6, 0.6, P),
                          rng.uniform(1.5, 3.0, P)], axis=1)
    gt_poses = []
    for k in range(K):
        c = 0.02 * rng.standard_normal(3)
        T = np.eye(4)
        T[:3, :3] = np.asarray(cayley_to_rot(jnp.asarray(c)))
        T[:3, 3] = [0.1 * k + 0.02 * rng.standard_normal(),
                    0.02 * rng.standard_normal(),
                    0.02 * rng.standard_normal()]
        gt_poses.append(T)
    gt_poses = np.stack(gt_poses)

    obs_kf, obs_pt, obs_uv = [], [], []
    for k in range(K):
        Tinv = np.linalg.inv(gt_poses[k])
        pc = gt_points @ Tinv[:3, :3].T + Tinv[:3, 3]
        u = FX * pc[:, 0] / pc[:, 2] + CX
        v = FY * pc[:, 1] / pc[:, 2] + CY
        ok = (pc[:, 2] > 0.1) & (u > 0) & (u < 240) & (v > 0) & (v < 180)
        for i in np.nonzero(ok)[0]:
            obs_kf.append(k)
            obs_pt.append(i)
            obs_uv.append([u[i] + pix_noise * rng.standard_normal(),
                           v[i] + pix_noise * rng.standard_normal()])

    # noisy init (first two poses fixed: SE(3) + scale gauge)
    init_poses = gt_poses.copy()
    for k in range(2, K):
        c = pose_noise * rng.standard_normal(3)
        dR = np.asarray(cayley_to_rot(jnp.asarray(c)))
        init_poses[k, :3, :3] = dR @ init_poses[k, :3, :3]
        init_poses[k, :3, 3] += pose_noise * rng.standard_normal(3)
    init_points = gt_points + point_noise * rng.standard_normal(
        gt_points.shape)

    prob = BAProblem(
        T_world_kf=jnp.asarray(init_poses),
        points=jnp.asarray(init_points),
        obs_kf=jnp.asarray(obs_kf, jnp.int32),
        obs_point=jnp.asarray(obs_pt, jnp.int32),
        obs_uv=jnp.asarray(np.asarray(obs_uv)),
        obs_valid=jnp.ones(len(obs_kf), bool),
        fx=jnp.asarray(FX), fy=jnp.asarray(FY),
        cx=jnp.asarray(CX), cy=jnp.asarray(CY))
    return prob, gt_poses, gt_points


def test_residuals_zero_at_ground_truth():
    rng = np.random.default_rng(0)
    prob, gt_poses, gt_points = synthetic_problem(rng, pose_noise=0.0,
                                                  point_noise=0.0)
    r, Jc, Jp, ok = reprojection_residuals(prob)
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)


def test_jacobians_match_finite_differences():
    rng = np.random.default_rng(1)
    prob, *_ = synthetic_problem(rng, K=2, P=10)
    r0, Jc, Jp, ok = reprojection_residuals(prob)
    eps = 1e-7

    # point jacobian
    for axis in range(3):
        dp = jnp.zeros_like(prob.points).at[:, axis].add(eps)
        r1, *_ = reprojection_residuals(prob.replace(points=prob.points
                                                     + dp))
        fd = (np.asarray(r1) - np.asarray(r0)) / eps
        np.testing.assert_allclose(np.asarray(Jp)[:, :, axis], fd,
                                   rtol=1e-4, atol=1e-5)

    # pose jacobian (translation part): moving t changes pc by -R^T dt
    from esvo_tpu.backend import bundle_adjustment as BA
    for axis in range(3):
        T2 = prob.T_world_kf.at[:, axis, 3].add(eps)
        r1, *_ = reprojection_residuals(prob.replace(T_world_kf=T2))
        fd = (np.asarray(r1) - np.asarray(r0)) / eps
        np.testing.assert_allclose(np.asarray(Jc)[:, :, 3 + axis], fd,
                                   rtol=1e-4, atol=1e-5)


def test_ba_recovers_ground_truth():
    rng = np.random.default_rng(2)
    prob, gt_poses, gt_points = synthetic_problem(rng, pose_noise=0.01,
                                                  point_noise=0.02)
    cfg = BAConfig(max_iterations=15, damping=1e-4, num_fixed_poses=2)
    out, costs = jax.jit(lambda p: bundle_adjust(p, cfg))(prob)
    costs = np.asarray(costs)
    assert costs[-1] < 1e-4 * costs[0], f"costs {costs[[0,-1]]}"

    T_est = np.asarray(out.T_world_kf)
    t_err = np.linalg.norm(T_est[:, :3, 3] - gt_poses[:, :3, 3], axis=1)
    assert t_err.max() < 1e-4, f"pose errors {t_err}"
    p_err = np.linalg.norm(np.asarray(out.points) - gt_points, axis=1)
    assert np.median(p_err) < 1e-4


def test_ba_with_pixel_noise_stays_stable():
    rng = np.random.default_rng(3)
    prob, gt_poses, _ = synthetic_problem(rng, pose_noise=0.02,
                                          point_noise=0.05, pix_noise=0.3)
    cfg = BAConfig(max_iterations=15, num_fixed_poses=2)
    out, costs = bundle_adjust(prob, cfg)
    T_est = np.asarray(out.T_world_kf)
    t_err = np.linalg.norm(T_est[:, :3, 3] - gt_poses[:, :3, 3], axis=1)
    # initial pose error ~2 cm; BA should cut it well below measurement
    # noise scale
    assert t_err.max() < 0.01, f"pose errors {t_err}"


def test_keyframe_graph_association():
    rng = np.random.default_rng(4)
    g = KeyframeGraph(fx=FX, fy=FY, cx=CX, cy=CY, voxel_size=0.05)
    pts = np.stack([rng.uniform(-0.5, 0.5, 50),
                    rng.uniform(-0.4, 0.4, 50),
                    rng.uniform(1.5, 2.5, 50)], axis=1)
    uv = rng.uniform(0, 100, (50, 2))
    g.add_keyframe(np.eye(4), pts, uv, np.ones(50, bool))
    # same points slightly moved -> same voxels -> associated
    g.add_keyframe(np.eye(4), pts + 0.001, uv, np.ones(50, bool))
    assert g.num_keyframes == 2
    # voxel hashing re-associates almost all points (a few land on voxel
    # boundaries and split)
    assert 50 <= g.num_points <= 55
    assert g.multiview_fraction() > 0.85

    prob = build_ba_problem(g)
    assert prob.points.shape == (g.num_points, 3)
    # observations pad to a 1024 bucket (shape-stable jit; r5) with the
    # real rows valid-masked at the front
    assert prob.obs_uv.shape == (1024, 2)
    assert int(prob.obs_valid.sum()) == 100
    assert bool(prob.obs_valid[:100].all())
