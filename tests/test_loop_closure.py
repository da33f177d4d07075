"""Tests: time-surface descriptors, loop detection, verification, and
the pose-graph runtime layer's drift correction."""
import numpy as np
import pytest
import jax.numpy as jnp

from esvo_tpu.backend import loop_closure as lc
from esvo_tpu.backend import pose_graph as pg
from esvo_tpu.geometry.camera import make_ideal_rig
from esvo_tpu.geometry import se3

W, H = 240, 180
FX = 200.0


def rig():
    return make_ideal_rig(W, H, FX, FX, W / 2 - 0.5, H / 2 - 0.5, 0.1,
                          dtype=jnp.float64)


def edge_surface(pts_world, T_world_cam, cam, sigma=2.5):
    """Smooth TS-like edge rendering (see tests/test_tracking.py)."""
    from esvo_tpu.geometry.camera import world_to_cam
    Tinv = np.linalg.inv(np.asarray(T_world_cam))
    p_cam = (Tinv[:3, :3] @ pts_world.T).T + Tinv[:3, 3]
    uv = np.asarray(world_to_cam(cam.params.P, jnp.asarray(p_cam)))
    gu, gv = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    d2min = np.full((H, W), np.inf, np.float32)
    for u, v in uv.astype(np.float32):
        if -5 <= u < W + 5 and -5 <= v < H + 5:
            np.minimum(d2min, (gu - u) ** 2 + (gv - v) ** 2, out=d2min)
    return (255.0 * np.exp(-d2min / (2 * sigma ** 2))).astype(np.float64)


def scene_points(seed, nseg=6, pts_per=25):
    """Structured edge scene: points along random 3D segments (a dense
    uniform point cloud saturates a 64x48 surface into an
    indistinguishable gray field — real scenes are edge-structured, like
    io.synthetic.make_scene)."""
    rng = np.random.default_rng(seed)
    pts = []
    for _ in range(nseg):
        a = np.array([rng.uniform(-0.4, 0.4), rng.uniform(-0.3, 0.3),
                      rng.uniform(0.9, 1.8)])
        b = a + rng.normal(0, 0.25, 3)
        t = np.linspace(0, 1, pts_per)[:, None]
        pts.append(a + t * (b - a))
    return np.concatenate(pts)


def test_descriptor_similarity():
    rng = np.random.default_rng(0)
    pts = scene_points(0)
    ts_a = edge_surface(pts, np.eye(4), rig().left)
    # same view, small sensor noise
    ts_b = ts_a + rng.normal(0, 4.0, ts_a.shape)
    # different scene
    ts_c = edge_surface(scene_points(105), np.eye(4), rig().left)
    da = lc.ts_descriptor(jnp.asarray(ts_a))
    db = lc.ts_descriptor(jnp.asarray(ts_b))
    dc = lc.ts_descriptor(jnp.asarray(ts_c))
    assert float(da @ db) > 0.97
    assert float(da @ dc) < 0.8
    np.testing.assert_allclose(float(jnp.linalg.norm(da)), 1.0, rtol=1e-5)
    # decay/event-rate invariance: scaling + offset don't change it
    d_scaled = lc.ts_descriptor(jnp.asarray(0.4 * ts_a + 20.0))
    np.testing.assert_allclose(np.asarray(d_scaled), np.asarray(da),
                               atol=1e-5)


def test_detector_finds_revisit_with_temporal_gate():
    rng = np.random.default_rng(1)
    cam = rig().left
    cfg = lc.LoopClosureConfig(min_gap=4, min_similarity=0.9)
    det = lc.LoopClosureDetector(cfg)
    scenes = [scene_points(s) for s in range(10)]
    for s in range(10):
        ts = edge_surface(scenes[s], np.eye(4), cam)
        # query before add, like the runtime does
        det.add(jnp.asarray(ts))
    # revisit scene 2 with noise
    ts_q = edge_surface(scenes[2], np.eye(4), cam) \
        + rng.normal(0, 3.0, (H, W))
    idx, sim = det.query(jnp.asarray(ts_q))
    assert idx == 2 and sim > 0.9
    # a revisit of the LAST scene is temporally gated away from itself
    ts_last = edge_surface(scenes[9], np.eye(4), cam)
    idx2, sim2 = det.query(jnp.asarray(ts_last))
    assert idx2 <= 10 - cfg.min_gap - 1
    assert idx2 != 9


def volume_points(seed, n=2000):
    """Volume-filling point field (the proven registration fixture from
    tests/test_tracking.py — every projection sits in a locally unique
    texture, so the pose is fully observable)."""
    rng = np.random.default_rng(seed)
    return np.stack([rng.uniform(-0.3, 0.3, n),
                     rng.uniform(-0.22, 0.22, n),
                     rng.uniform(0.8, 1.6, n)], 1)


def test_verify_loop_recovers_relative_pose():
    cam = rig().left
    pts = volume_points(2)
    # true revisit pose: small offset from the stored keyframe pose
    xi = jnp.asarray([0.004, -0.003, 0.002, 0.015, -0.01, 0.02])
    T_true = np.asarray(se3.se3_exp(xi), np.float64)
    ts_cur = edge_surface(pts, T_true, cam)

    from esvo_tpu.tracking import registration as reg
    cfg = lc.LoopClosureConfig(verify_max_rms=120.0, verify_min_points=100)
    reg_cfg = reg.RegProblemConfig(kernel_size=0, batch_size=500,
                                   max_iteration=25,
                                   huber_threshold=50.0, lm_damping=1e-3)
    ok, T_est, rms = lc.verify_loop(
        jnp.asarray(pts), jnp.ones(len(pts), bool), jnp.asarray(ts_cur),
        np.eye(4), cam, reg_cfg, cfg)
    assert ok, f"verification rejected, rms={rms}"
    assert np.linalg.norm(T_est[:3, 3] - T_true[:3, 3]) < 0.01
    # an unrelated (sparse, structured) surface must be REJECTED: the
    # dense candidate points cannot all land on its few edges
    ts_bad = edge_surface(scene_points(9), np.eye(4), cam)
    ok_bad, _, rms_bad = lc.verify_loop(
        jnp.asarray(pts), jnp.ones(len(pts), bool), jnp.asarray(ts_bad),
        np.eye(4), cam, reg_cfg, cfg)
    assert not ok_bad, f"bogus loop accepted, rms={rms_bad}"


class _FakeSystem:
    """Minimal stand-in for EsvoSystem: drifting keyframe poses over a
    loop trajectory with renderable views."""

    def __init__(self, rig_, pts):
        from esvo_tpu.runtime.system import SystemStatus
        self.rig = rig_
        self.status = SystemStatus.WORKING
        self.dtype = jnp.float64
        self.reset_count = 0
        self.pts = pts
        self.T_world_frame = np.eye(4)
        self.last_tick_time = 0.0
        self.corrections = []
        self.grid = None  # unused: _sample_keyframe is monkeypatched

    def apply_world_correction(self, corr):
        self.corrections.append(np.asarray(corr))
        self.T_world_frame = corr @ self.T_world_frame


def test_pose_graph_loop_corrects_drift():
    """Circle trajectory revisiting its start: injected odometry drift
    is detected via the TS descriptor match + registration and reduced
    by the pose-graph optimization."""
    from esvo_tpu.runtime.pose_graph_loop import PoseGraphLoop
    from esvo_tpu.tracking import registration as reg

    r = rig()
    pts = volume_points(3)
    K = 12
    # ground-truth poses: small circle in front of the scene (radius
    # 0.03 m = 1.5 px view shift, inside the registration basin),
    # returning to the start
    gt = []
    for k in range(K + 1):
        a = 2 * np.pi * k / K
        xi = jnp.asarray([0.0, 0.0, 0.0,
                          0.03 * np.cos(a) - 0.03, 0.03 * np.sin(a), 0.0])
        gt.append(np.asarray(se3.se3_exp(xi), np.float64))
    # drifted odometry: accumulate small bias
    drift = np.asarray(se3.se3_exp(jnp.asarray(
        [0.0, 0.0, 0.001, 0.004, 0.002, 0.0])), np.float64)
    est = [gt[0]]
    for k in range(K):
        rel = np.linalg.inv(gt[k]) @ gt[k + 1]
        est.append(est[-1] @ rel @ drift)

    sysf = _FakeSystem(r, pts)
    pgl = PoseGraphLoop(
        sysf, keyframe_every=1,
        lc_config=lc.LoopClosureConfig(min_gap=6, min_similarity=0.9,
                                       verify_min_points=100,
                                       verify_max_rms=120.0),
        reg_config=reg.RegProblemConfig(kernel_size=0, batch_size=500,
                                        max_iteration=25,
                                        huber_threshold=50.0,
                                        lm_damping=1e-3))

    # keyframe sampling: camera-LOCAL point geometry is what the sensor
    # actually measures (computed from the TRUE pose); the stored world
    # pose is the drifted estimate — exactly a drifting mapper's state
    def sample():
        Tinv = np.linalg.inv(sysf.gt_pose)
        p_cam = pts @ Tinv[:3, :3].T + Tinv[:3, 3]
        return (sysf.last_tick_time,
                np.asarray(sysf.T_world_frame, np.float64),
                p_cam, np.ones(len(pts), bool))
    pgl._sample_keyframe = sample

    # drive like the real runtime: odometry composes the drifted relative
    # motion onto the (possibly corrected) current pose — corrections
    # must persist instead of being overwritten by absolute estimates
    rels = [np.linalg.inv(est[k]) @ est[k + 1] for k in range(K)]
    err_uncorrected = np.linalg.norm(est[K][:3, 3] - gt[K][:3, 3])
    err_before = None
    for k in range(K + 1):
        sysf.last_tick_time = float(k)
        if k > 0:
            sysf.T_world_frame = sysf.T_world_frame @ rels[k - 1]
        sysf.gt_pose = gt[k]
        # the rendered view is the TRUE one (sensor sees reality)
        ts = edge_surface(pts, gt[k], r.left)
        if k == K:
            err_before = np.linalg.norm(sysf.T_world_frame[:3, 3]
                                        - gt[k][:3, 3])
        pgl.maybe_update({"ts_left": jnp.asarray(ts), "bm_stats": {}})

    assert pgl.num_loop_closures >= 1, "revisit not detected"
    assert sysf.corrections, "no correction applied"
    # the corrected live pose beats pure odometry at the loop point
    err_after = np.linalg.norm(sysf.T_world_frame[:3, 3] - gt[K][:3, 3])
    assert err_after < 0.5 * err_uncorrected, (err_uncorrected, err_after)

    times, T_opt = pgl.optimized_trajectory()
    assert len(times) == K + 1
    end_err = np.linalg.norm(T_opt[-1][:3, 3] - gt[K][:3, 3])
    assert end_err < 0.5 * err_uncorrected


def test_detector_compaction():
    """Database-full handling: drop_oldest evicts the prefix, keeps the
    rest queryable, and PoseGraphLoop._compact remaps loop edges."""
    cfg = lc.LoopClosureConfig(min_gap=2, capacity=8)
    det = lc.LoopClosureDetector(cfg)
    cam = rig().left
    surfaces = [edge_surface(scene_points(s), np.eye(4), cam)
                for s in range(8)]
    for ts in surfaces:
        det.add(jnp.asarray(ts))
    assert det.count == 8
    det.drop_oldest(4)
    assert det.count == 4
    # old index 6 is now index 2; querying its surface must find it
    idx, sim = det.query(jnp.asarray(surfaces[5]))
    assert idx == 1 and sim > 0.99
    # adding works again after eviction
    det.add(jnp.asarray(surfaces[0]))
    assert det.count == 5

    # PoseGraphLoop edge remapping
    from esvo_tpu.runtime.pose_graph_loop import PoseGraphLoop
    sysf = _FakeSystem(rig(), None)
    pgl = PoseGraphLoop(sysf, lc_config=cfg)
    pgl._kfs = [(float(k), np.eye(4), None, None) for k in range(8)]
    pgl.detector = det  # count=5 after the adds above
    pgl._loop_edges = [(0, 6, np.eye(4), 200.0, 200.0),
                   (5, 7, np.eye(4), 200.0, 200.0)]
    pgl._compact()
    assert len(pgl._kfs) == 4
    assert len(pgl._loop_edges) == 1
    assert pgl._loop_edges[0][:2] == (1, 3)


def test_icp_align_recovers_transform():
    """icp_align recovers a known relative transform between two noisy,
    partially overlapping views of the same cloud."""
    rng = np.random.default_rng(4)
    pts_w = volume_points(4, n=800)
    # view A at identity; view B offset (well beyond the drift scale)
    xi = jnp.asarray([0.01, -0.008, 0.012, 0.03, -0.02, 0.025])
    T_b = np.asarray(se3.se3_exp(xi), np.float64)
    p_a = pts_w.copy()
    Tinv = np.linalg.inv(T_b)
    p_b_full = pts_w @ Tinv[:3, :3].T + Tinv[:3, 3]
    # partial overlap: each view keeps a different random 70% subset,
    # plus small independent depth-ish noise
    keep_a = rng.random(len(p_a)) < 0.7
    keep_b = rng.random(len(p_a)) < 0.7
    p_a = p_a + rng.normal(0, 0.002, p_a.shape)
    p_b = p_b_full + rng.normal(0, 0.002, p_b_full.shape)

    # initial guess: drifted estimate (off by ~0.02 m)
    T0 = np.asarray(se3.se3_exp(jnp.asarray(
        [0.0, 0.0, 0.004, 0.015, -0.012, 0.008])), np.float64) @ T_b
    T, frac, mean_d = lc.icp_align(
        jnp.asarray(p_a), jnp.asarray(keep_a),
        jnp.asarray(p_b), jnp.asarray(keep_b),
        jnp.asarray(T0), 0.05, 15)
    T = np.asarray(T)
    # T maps B-local points into A-local: compare to the true T_b
    assert float(frac) > 0.6
    assert np.linalg.norm(T[:3, 3] - T_b[:3, 3]) < 0.005, T[:3, 3]
    R_err = np.arccos(np.clip(
        (np.trace(T[:3, :3] @ T_b[:3, :3].T) - 1) / 2, -1, 1))
    assert R_err < 0.01

    # disjoint clouds must NOT verify. The dual-start ICP's centroid
    # pre-alignment can overlap two dense clouds of different places and
    # reach a high inlier fraction, so the rejection now comes from the
    # composite gate (mean-distance + drift-plausibility: a 5 m
    # "correction" exceeds any physically accumulable drift).
    other = volume_points(99, n=800) + np.array([5.0, 0.0, 0.0])
    ok, T_bad, frac_bad, _, _ = lc.verify_loop_icp(
        jnp.asarray(p_a), jnp.asarray(keep_a),
        jnp.asarray(other), jnp.ones(len(other), bool),
        np.eye(4), np.eye(4), lc.LoopClosureConfig())
    assert not ok
    assert np.linalg.norm(T_bad[:3, 3]) > \
        lc.LoopClosureConfig().icp_max_correction_trans


def test_drift_proportional_correction_cap():
    """The translation-correction gate scales with the inter-visit gap:
    a correction plausible after a long gap is implausible after a short
    one (VERDICT r4: a flat 2 m cap sized for bootstrap drift admitted
    14/189 false edges)."""
    rng = np.random.default_rng(9)
    pts = volume_points(9, n=800)
    keep = jnp.asarray(rng.random(len(pts)) < 0.8)
    p = jnp.asarray(pts + rng.normal(0, 0.002, pts.shape))
    # current-pose estimate drifted 0.6 m from truth: the ICP recovers
    # the alignment, implying a 0.6 m correction
    T_true = np.eye(4)
    T_est = np.eye(4)
    T_est[:3, 3] = [0.6, 0.0, 0.0]
    cfg = lc.LoopClosureConfig(icp_max_corr_dist=0.05,
                               icp_max_mean_dist=0.05,
                               icp_max_correction_trans=1.0,
                               icp_drift_rate=0.05, icp_drift_floor=0.2)
    # short gap: cap = 0.2 + 0.05*2 = 0.3 < 0.6 -> rejected
    ok_short, _, frac_s, _, info_s = lc.verify_loop_icp(
        p, keep, p, keep, T_true, T_est, cfg, gap_s=2.0)
    assert not ok_short
    assert info_s["corr_t"] > info_s["cap_t"]
    assert frac_s > 0.5  # rejection came from the cap, not alignment
    # long gap: cap = min(1.0, 0.2 + 0.05*20) = 1.0 > 0.6 -> accepted
    ok_long, T_edge, frac_l, _, info_l = lc.verify_loop_icp(
        p, keep, p, keep, T_true, T_est, cfg, gap_s=20.0)
    assert ok_long
    # edge recovered the identity relative pose despite the drifted guess
    assert np.linalg.norm(T_edge[:3, 3]) < 0.02
    # reciprocal stats recorded on the accepted edge
    assert info_l["frac_rev"] > 0.5
    assert info_l["recip_t"] < cfg.reciprocal_tol_trans
    assert 0.05 <= info_l["quality"] <= 1.0
    # no gap information: flat ceiling applies
    ok_flat, _, _, _, info_f = lc.verify_loop_icp(
        p, keep, p, keep, T_true, T_est, cfg)
    assert ok_flat and info_f["cap_t"] == cfg.icp_max_correction_trans


def test_edge_quality_scales_with_inlier_stats():
    cfg = lc.LoopClosureConfig(icp_max_mean_dist=0.02)
    strong = lc.edge_quality(0.9, 0.9, 0.005, cfg)
    weak = lc.edge_quality(0.32, 0.30, 0.019, cfg)
    assert strong == pytest.approx(0.9)
    assert 0.05 <= weak < 0.4 < strong
    assert lc.edge_quality(0.31, -1.0, 0.02, cfg) == pytest.approx(0.31)
