"""Tests: SE(3) exp/log maps and pose-graph optimization."""
import numpy as np
import jax
import jax.numpy as jnp

from esvo_tpu.geometry import se3
from esvo_tpu.backend import pose_graph as pg


def rand_twists(rng, n, rot_scale=1.0, trans_scale=1.0):
    w = rng.normal(size=(n, 3)) * rot_scale
    v = rng.normal(size=(n, 3)) * trans_scale
    return jnp.asarray(np.concatenate([w, v], 1))


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    # generic, tiny, and near-pi twists
    xi = np.concatenate([
        np.asarray(rand_twists(rng, 16)),
        np.asarray(rand_twists(rng, 8, rot_scale=1e-8, trans_scale=1e-8)),
        np.asarray(rand_twists(rng, 8, rot_scale=0.0)),
    ])
    # near-pi rotations
    axes = rng.normal(size=(8, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    xi_pi = np.concatenate([axes * (np.pi - 1e-4),
                            rng.normal(size=(8, 3))], 1)
    xi = jnp.asarray(np.concatenate([xi, xi_pi]))
    T = se3.se3_exp(xi)
    # T is a valid rigid transform
    R = np.asarray(T[..., :3, :3])
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2),
                               np.broadcast_to(np.eye(3), R.shape),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(T[..., 3, :]),
                               np.broadcast_to([0, 0, 0, 1],
                                               T.shape[:-2] + (4,)),
                               atol=0)
    back = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(back, np.asarray(xi), atol=1e-8)


def test_se3_log_exp_roundtrip_matrices():
    rng = np.random.default_rng(1)
    xi = rand_twists(rng, 32)
    T = se3.se3_exp(xi)
    T2 = se3.se3_exp(se3.se3_log(T))
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-10)


def test_se3_exp_jacobian_finite():
    """jacfwd through exp/log must be NaN-free at xi = 0 (the pose-graph
    linearization point sits exactly on the Taylor branch)."""
    T_i = se3.se3_exp(rand_twists(np.random.default_rng(2), 1)[0])
    T_j = se3.se3_exp(rand_twists(np.random.default_rng(3), 1)[0])
    T_ij_inv = se3.se3_inverse(se3.se3_inverse(T_i) @ T_j)

    def res(xi2):
        Ti = se3.se3_exp(xi2[:6]) @ T_i
        Tj = se3.se3_exp(xi2[6:]) @ T_j
        return se3.se3_log(T_ij_inv @ se3.se3_inverse(Ti) @ Tj)

    J = jax.jacfwd(res)(jnp.zeros(12))
    assert np.isfinite(np.asarray(J)).all()
    # finite-difference check
    eps = 1e-6
    Jfd = np.zeros((6, 12))
    for k in range(12):
        e = np.zeros(12)
        e[k] = eps
        Jfd[:, k] = (np.asarray(res(jnp.asarray(e)))
                     - np.asarray(res(jnp.asarray(-e)))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(J), Jfd, atol=1e-5)


def noisy_circle_graph(rng, K=24, loop_slots=1, drift=0.02):
    """Ground-truth circle trajectory; odometry chain integrated from
    noisy relative measurements (accumulating drift)."""
    gt = []
    for k in range(K):
        a = 2 * np.pi * k / K
        Rz = np.asarray(se3.so3_exp(jnp.asarray([0.0, 0.0, a])))
        t = np.array([np.cos(a), np.sin(a), 0.0])
        gt.append(np.block([[Rz, t[:, None]], [np.zeros((1, 3)), 1.0]]))
    gt = np.stack(gt)

    # noisy odometry measurements
    T_meas = []
    for k in range(K - 1):
        rel = np.linalg.inv(gt[k]) @ gt[k + 1]
        noise = np.asarray(se3.se3_exp(jnp.asarray(
            np.concatenate([rng.normal(size=3) * drift * 0.3,
                            rng.normal(size=3) * drift]))))
        T_meas.append(rel @ noise)
    # integrate the drifting trajectory
    est = [gt[0]]
    for k in range(K - 1):
        est.append(est[-1] @ T_meas[k])
    est = np.stack(est)

    graph = pg.odometry_graph(jnp.asarray(est), extra_capacity=loop_slots)
    # odometry edges measure the noisy relative poses (not the current
    # trajectory's exact chain — identical here since est integrates them)
    return graph, gt, est


def test_pose_graph_loop_closure_reduces_error():
    rng = np.random.default_rng(7)
    graph, gt, est = noisy_circle_graph(rng, K=24, loop_slots=1)
    # exact loop-closure edge K-1 -> 0
    rel = np.linalg.inv(gt[-1]) @ gt[0]
    graph = pg.add_edge(graph, graph.edge_i.shape[0] - 1,
                        graph.T_world.shape[0] - 1, 0, rel,
                        w_rot=400.0, w_trans=400.0)
    cfg = pg.PoseGraphConfig(max_iterations=25)
    opt, costs = pg.optimize_pose_graph(graph, cfg)

    err0 = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
    err1 = np.linalg.norm(np.asarray(opt.T_world)[:, :3, 3]
                          - gt[:, :3, 3], axis=1)
    # drift redistributes: max error roughly halves (one loop edge can't
    # fix mid-chain noise), and the loop point itself snaps to GT
    assert float(costs[-1]) < float(costs[0])
    assert err1.max() < 0.6 * err0.max(), (err0.max(), err1.max())
    assert err1[-1] < 0.1 * err0[-1], (err0[-1], err1[-1])
    # gauge: first pose untouched
    np.testing.assert_array_equal(np.asarray(opt.T_world[0]), gt[0])


def test_pose_graph_consistent_graph_stays_put():
    """With consistent measurements (edges = exact current chain), the
    optimum is the initial trajectory: cost stays ~0, poses unchanged."""
    rng = np.random.default_rng(8)
    graph, gt, est = noisy_circle_graph(rng, K=12, loop_slots=0)
    opt, costs = pg.optimize_pose_graph(
        graph, pg.PoseGraphConfig(max_iterations=5))
    assert float(costs[0]) < 1e-12
    np.testing.assert_allclose(np.asarray(opt.T_world), est, atol=1e-6)


def test_pose_graph_huber_downweights_false_loop():
    """A wrong loop edge under Huber must distort the solution less than
    under plain least squares."""
    rng = np.random.default_rng(9)

    def run(huber):
        graph, gt, est = noisy_circle_graph(
            np.random.default_rng(9), K=16, loop_slots=1, drift=0.005)
        # FALSE loop edge: claims pose 15 == pose 8's relative position
        bogus = np.linalg.inv(gt[8]) @ gt[0]
        graph = pg.add_edge(graph, graph.edge_i.shape[0] - 1,
                            15, 0, bogus, w_rot=50.0, w_trans=50.0)
        cfg = pg.PoseGraphConfig(max_iterations=20, huber_threshold=huber)
        opt, _ = pg.optimize_pose_graph(graph, cfg)
        return np.linalg.norm(np.asarray(opt.T_world)[:, :3, 3]
                              - gt[:, :3, 3], axis=1).max()

    err_huber = run(1.0)
    err_l2 = run(np.inf)
    assert err_huber < err_l2
