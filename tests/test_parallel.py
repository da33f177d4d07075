"""Multi-device sharding tests on the virtual 8-device CPU mesh:
the sharded programs must match their serial counterparts exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from esvo_tpu.geometry.camera import make_ideal_rig
from esvo_tpu.surface import time_surface as tsf
from esvo_tpu.mapping import block_matching as bm
from esvo_tpu.mapping import depth_refinement as dr
from esvo_tpu.tracking import registration as reg
from esvo_tpu.parallel import sharding as ps

W, H = 64, 48
N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV, "conftest must provide 8 devices"
    return ps.make_mesh(N_DEV)


def rig():
    return make_ideal_rig(W, H, 50.0, 50.0, W / 2 - 0.5, H / 2 - 0.5, 0.1,
                          dtype=jnp.float32)


def test_sharded_surface_update_matches_serial(mesh):
    rng = np.random.default_rng(0)
    N = 64 * N_DEV
    ev = tsf.EventBatch.from_arrays(
        rng.integers(0, W, N), rng.integers(0, H, N),
        np.sort(rng.uniform(0, 0.01, N)).astype(np.float32),
        rng.random(N) > 0.5)
    state = tsf.init_state(H, W)
    serial = tsf.insert_events(state, ev)
    shard = ps.sharded_surface_update(mesh, state, ev)
    np.testing.assert_array_equal(np.asarray(serial.last_t_pos),
                                  np.asarray(shard.last_t_pos))
    np.testing.assert_array_equal(np.asarray(serial.last_t_neg),
                                  np.asarray(shard.last_t_neg))


def test_sharded_map_estimate_matches_serial(mesh):
    rng = np.random.default_rng(1)
    r = rig()
    N = 32 * N_DEV
    base = rng.uniform(0, 255, size=(H, W + 16)).astype(np.float32)
    ts_l = jnp.asarray(base[:, 8:8 + W])
    ts_r = jnp.asarray(base[:, 12:12 + W])
    x_rect = jnp.asarray(np.stack([rng.uniform(10, W - 10, N),
                                   rng.uniform(10, H - 10, N)], 1),
                         jnp.float32)
    t = jnp.asarray(np.sort(rng.uniform(0, 0.01, N)), jnp.float32)
    v = jnp.ones(N, bool)
    T = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (N, 4, 4))
    bm_cfg = bm.BlockMatchConfig(patch_size_x=5, patch_size_y=5,
                                 max_disparity=8)
    dp_cfg = dr.DepthProblemConfig(patch_size_x=5, patch_size_y=5,
                                   max_iteration=3, td_fixed_point_iters=5)

    matches = bm.match_events(ts_l, ts_r, x_rect, x_rect, t, v,
                              r.left.mask, r, bm_cfg)
    serial = dr.solve(matches.x_left, T, T, matches.inv_depth,
                      matches.valid, t, ts_l, ts_r, r, dp_cfg)

    fn = ps.sharded_map_estimate(mesh, r, bm_cfg, dp_cfg)
    shard = fn(ts_l, ts_r, x_rect, t, v, T, T)

    np.testing.assert_allclose(np.asarray(serial.inv_depth),
                               np.asarray(shard.inv_depth), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_array_equal(np.asarray(serial.valid),
                                  np.asarray(shard.valid))


def test_sharded_tracking_step_matches_serial(mesh):
    rng = np.random.default_rng(2)
    r = rig()
    M = 16 * N_DEV
    cfg = reg.RegProblemConfig(kernel_size=0, lm_damping=1e-3)
    img = (0.7 * np.arange(W)[None, :] - 0.3 * np.arange(H)[:, None]
           + 100.0).astype(np.float32)
    neg, gu, gv = reg.negative_time_surface(jnp.asarray(img), 0)
    pts = jnp.asarray(np.stack([rng.uniform(-0.2, 0.2, M),
                                rng.uniform(-0.15, 0.15, M),
                                rng.uniform(0.8, 1.5, M)], 1), jnp.float32)
    ok = jnp.ones(M, bool)
    R = jnp.eye(3, dtype=jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    Twr = jnp.eye(4, dtype=jnp.float32)

    # serial normal equations
    prob = reg.RegProblem(R=R, t=t, T_world_ref=Twr, points=pts,
                          point_valid=ok, ts_negative=neg, grad_u=gu,
                          grad_v=gv)
    fvec, _, _ = reg.residuals_and_weights(prob, jnp.zeros(3 + 3), pts, ok,
                                           r.left, cfg)
    J = reg.analytic_jacobian(prob, pts, ok, r.left, cfg)
    f = fvec.reshape(-1)
    Hm = J.T @ J
    g = J.T @ f
    damp = cfg.lm_damping * jnp.diag(jnp.diag(Hm)) \
        + 1e-12 * jnp.eye(6, dtype=jnp.float32)
    dx_serial = -jnp.linalg.solve(Hm + damp, g)

    fn = ps.sharded_tracking_step(mesh, r.left, cfg)
    dx_shard, cost = fn(R, t, Twr, neg, gu, gv, pts, ok)

    # the psum'd reductions match up to f32 summation-order noise; the
    # 6x6 solve amplifies that by the condition number, so dx gets a
    # correspondingly looser bound
    np.testing.assert_allclose(float(jnp.sum(f * f)), float(cost),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dx_serial), np.asarray(dx_shard),
                               rtol=0.1, atol=1e-3)


def test_sharded_ba_normal_equations_match_serial(mesh):
    from esvo_tpu.backend import bundle_adjustment as ba
    from tests.test_backend import synthetic_problem

    rng = np.random.default_rng(5)
    prob, *_ = synthetic_problem(rng, K=4, P=64)
    # pad observations to a multiple of the mesh size
    M = prob.obs_kf.shape[0]
    pad = (-M) % N_DEV
    if pad:
        prob = prob.replace(
            obs_kf=jnp.pad(prob.obs_kf, (0, pad)),
            obs_point=jnp.pad(prob.obs_point, (0, pad)),
            obs_uv=jnp.pad(prob.obs_uv, ((0, pad), (0, 0))),
            obs_valid=jnp.pad(prob.obs_valid, (0, pad)))

    cfg = ba.BAConfig()
    fn = ps.sharded_ba_normal_equations(mesh, cfg)
    B, C, gc, gp = fn(prob.T_world_kf, prob.points, prob.obs_kf,
                      prob.obs_point, prob.obs_uv, prob.obs_valid,
                      prob.fx, prob.fy, prob.cx, prob.cy)

    # serial reference blocks
    r, Jc, Jp, ok = ba.reprojection_residuals(prob)
    rn = jnp.linalg.norm(r, axis=1)
    w = jnp.where(rn > cfg.huber_threshold,
                  cfg.huber_threshold / jnp.maximum(rn, 1e-12), 1.0)
    w = jnp.where(ok, w, 0.0)
    wJc = Jc * w[:, None, None]
    K, P = prob.T_world_kf.shape[0], prob.points.shape[0]
    B_ref = jnp.zeros((K, 6, 6)).at[prob.obs_kf].add(
        jnp.einsum("nij,nik->njk", wJc, Jc))
    gc_ref = jnp.zeros((K, 6)).at[prob.obs_kf].add(
        jnp.einsum("nij,ni->nj", wJc, r))

    np.testing.assert_allclose(np.asarray(B), np.asarray(B_ref),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gc_ref),
                               rtol=1e-6, atol=1e-8)


def test_sharded_bundle_adjust_matches_serial(mesh):
    """Full sharded LM-Schur BA == serial bundle_adjust (the observation
    axis shards; poses/points stay replicated)."""
    from esvo_tpu.backend import bundle_adjustment as ba
    from tests.test_backend import synthetic_problem

    rng = np.random.default_rng(6)
    prob, *_ = synthetic_problem(rng, K=4, P=64)
    M = prob.obs_kf.shape[0]
    pad = (-M) % N_DEV
    if pad:
        prob = prob.replace(
            obs_kf=jnp.pad(prob.obs_kf, (0, pad)),
            obs_point=jnp.pad(prob.obs_point, (0, pad)),
            obs_uv=jnp.pad(prob.obs_uv, ((0, pad), (0, 0))),
            obs_valid=jnp.pad(prob.obs_valid, (0, pad)))

    cfg = ba.BAConfig(max_iterations=4)
    serial_prob, serial_costs = ba.bundle_adjust(prob, cfg)
    run = ps.sharded_bundle_adjust(mesh, cfg)
    shard_prob, shard_costs = run(prob)

    np.testing.assert_allclose(np.asarray(shard_costs),
                               np.asarray(serial_costs), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(shard_prob.T_world_kf),
                               np.asarray(serial_prob.T_world_kf),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(shard_prob.points),
                               np.asarray(serial_prob.points),
                               rtol=1e-4, atol=1e-5)


def test_sharded_system_closed_loop(mesh):
    """EsvoSystem(mesh=...) — the runtime with the mapping event axis
    sharded — must track the same synthetic scene as the serial system
    (same ATE envelope; the sharded depth solve is bitwise the serial
    one per shard, so only f32 reduction order differs)."""
    import sys
    sys.path.insert(0, "tests")
    from test_system import make_config, frame_at, W as SW, H as SH, \
        FX, BASELINE, TICK
    from esvo_tpu.io.events import frame_events
    from esvo_tpu.io.synthetic import (make_scene, simulate_stereo_events,
                                       interpolate_gt_pose)
    from esvo_tpu.runtime.system import EsvoSystem, SystemStatus
    from esvo_tpu.eval.trajectory import ate_rmse

    rng = np.random.default_rng(7)
    srig = make_ideal_rig(SW, SH, FX, FX, SW / 2 - 0.5, SH / 2 - 0.5,
                          BASELINE, dtype=jnp.float32)
    scene = make_scene(rng, num_points=4000, duration=0.5, steps=51,
                      motion_scale=0.6)
    ev_l, ev_r = simulate_stereo_events(
        scene, np.asarray(srig.left.params.P),
        np.asarray(srig.right.params.P), SW, SH, pixel_threshold=0.75,
        rng=rng)
    ticks = np.arange(TICK, 0.42, TICK)
    frames_l = frame_events(ev_l, ticks, 3000)
    frames_r = frame_events(ev_r, ticks, 3000)

    system = EsvoSystem(srig, make_config(), mesh=mesh)
    # 25 ticks / 5 mapping cycles: enough to cross WORKING and settle
    # the ATE envelope; the 8-device CPU mesh executes each sharded
    # program slowly, so every tick here is ~4 s of wall time
    for k in range(25):
        t = float(ticks[k])
        system.process_tick(t, frame_at(frames_l, k),
                            frame_at(frames_r, k),
                            do_mapping=(k % 5 == 4))
    assert system.status == SystemStatus.WORKING
    t_est, T_est = system.trajectory()
    gt = np.stack([interpolate_gt_pose(scene, t) for t in t_est])
    ate = ate_rmse(t_est, T_est, t_est, gt, align=True)
    print(f"sharded closed-loop ATE RMSE: {ate:.4f} m")
    assert ate < 0.08, f"ATE {ate}"


def test_sharded_pose_graph_matches_serial(mesh):
    """Edge-sharded pose-graph LM == serial (up to f32 psum ordering)."""
    from esvo_tpu.backend import pose_graph as pg
    from tests.test_pose_graph import noisy_circle_graph

    rng = np.random.default_rng(12)
    # 24 poses -> 23 odometry edges; pad edge slots to a mesh multiple
    graph, gt, est = noisy_circle_graph(rng, K=24, loop_slots=1)
    E = graph.edge_i.shape[0]
    pad = (-E) % N_DEV
    if pad:
        z4 = jnp.broadcast_to(jnp.eye(4, dtype=graph.T_ij.dtype),
                              (pad, 4, 4))
        graph = graph.replace(
            edge_i=jnp.pad(graph.edge_i, (0, pad)),
            edge_j=jnp.pad(graph.edge_j, (0, pad)),
            T_ij=jnp.concatenate([graph.T_ij, z4]),
            w_rot=jnp.pad(graph.w_rot, (0, pad)),
            w_trans=jnp.pad(graph.w_trans, (0, pad)),
            edge_valid=jnp.pad(graph.edge_valid, (0, pad)))
    # loop edge in the reserved slot (pre-padding index E-1)
    rel = np.linalg.inv(gt[-1]) @ gt[0]
    graph = pg.add_edge(graph, E - 1, graph.T_world.shape[0] - 1, 0,
                        rel, w_rot=400.0, w_trans=400.0)

    cfg = pg.PoseGraphConfig(max_iterations=10)
    serial, serial_costs = pg.optimize_pose_graph(graph, cfg)
    run = ps.sharded_pose_graph(mesh, cfg)
    shard, shard_costs = run(graph)

    np.testing.assert_allclose(np.asarray(shard_costs),
                               np.asarray(serial_costs), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(shard.T_world),
                               np.asarray(serial.T_world),
                               rtol=1e-4, atol=1e-6)


def test_sharded_pose_graph_loop_corrects_drift(mesh):
    """PoseGraphLoop(mesh=...) — the loop-closure runtime layer with the
    edge axis sharded — detects and corrects the same injected drift as
    the serial layer (same scenario as
    test_loop_closure.test_pose_graph_loop_corrects_drift)."""
    from esvo_tpu.backend import loop_closure as lc
    from esvo_tpu.geometry import se3
    from esvo_tpu.runtime.pose_graph_loop import PoseGraphLoop
    from tests.test_loop_closure import (_FakeSystem, volume_points,
                                         edge_surface, rig as lc_rig)

    r = lc_rig()
    pts = volume_points(3)
    K = 12
    gt = []
    for k in range(K + 1):
        a = 2 * np.pi * k / K
        xi = jnp.asarray([0.0, 0.0, 0.0,
                          0.03 * np.cos(a) - 0.03, 0.03 * np.sin(a), 0.0])
        gt.append(np.asarray(se3.se3_exp(xi), np.float64))
    drift = np.asarray(se3.se3_exp(jnp.asarray(
        [0.0, 0.0, 0.001, 0.004, 0.002, 0.0])), np.float64)
    est = [gt[0]]
    for k in range(K):
        rel = np.linalg.inv(gt[k]) @ gt[k + 1]
        est.append(est[-1] @ rel @ drift)

    sysf = _FakeSystem(r, pts)
    # min_gap 10: only the final revisits clear the temporal gate, so
    # the (slow on the CPU mesh) sharded optimization runs ~2x, not 6x
    pgl = PoseGraphLoop(
        sysf, keyframe_every=1, mesh=mesh,
        lc_config=lc.LoopClosureConfig(min_gap=10, min_similarity=0.9))

    def sample():
        Tinv = np.linalg.inv(sysf.gt_pose)
        p_cam = pts @ Tinv[:3, :3].T + Tinv[:3, 3]
        return (sysf.last_tick_time,
                np.asarray(sysf.T_world_frame, np.float64),
                p_cam, np.ones(len(pts), bool))
    pgl._sample_keyframe = sample

    rels = [np.linalg.inv(est[k]) @ est[k + 1] for k in range(K)]
    err_uncorrected = np.linalg.norm(est[K][:3, 3] - gt[K][:3, 3])
    for k in range(K + 1):
        sysf.last_tick_time = float(k)
        if k > 0:
            sysf.T_world_frame = sysf.T_world_frame @ rels[k - 1]
        sysf.gt_pose = gt[k]
        ts = edge_surface(pts, gt[k], r.left)
        pgl.maybe_update({"ts_left": jnp.asarray(ts), "bm_stats": {}})

    assert pgl.num_loop_closures >= 1
    err_after = np.linalg.norm(sysf.T_world_frame[:3, 3] - gt[K][:3, 3])
    assert err_after < 0.5 * err_uncorrected, (err_uncorrected, err_after)
