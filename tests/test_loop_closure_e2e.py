"""End-to-end loop closure on the REAL system: EsvoSystem tracks a
synthetic stream whose trajectory returns to its start (make_scene's
sinusoidal motion is periodic); PoseGraphLoop detects the revisit from
the live mapper's time surfaces + depth maps, verifies it by aligning
the two keyframes' 3D clouds, and produces an optimized trajectory."""
import numpy as np
import jax.numpy as jnp

from esvo_tpu.geometry.camera import make_ideal_rig
from esvo_tpu.io.events import frame_events
from esvo_tpu.io.synthetic import (make_scene, simulate_stereo_events,
                                   interpolate_gt_pose)
from esvo_tpu.runtime.system import EsvoSystem, SystemStatus
from esvo_tpu.runtime.pose_graph_loop import PoseGraphLoop
from esvo_tpu.backend import loop_closure as lc
from esvo_tpu.eval.trajectory import ate_rmse

from tests.test_system import make_config, frame_at, W, H, FX, BASELINE, \
    TICK


def test_loop_closure_on_real_system():
    rng = np.random.default_rng(7)
    rig = make_ideal_rig(W, H, FX, FX, W / 2 - 0.5, H / 2 - 0.5, BASELINE,
                         dtype=jnp.float32)
    scene = make_scene(rng, num_points=4000, duration=0.5, steps=51,
                      motion_scale=0.6)
    ev_l, ev_r = simulate_stereo_events(
        scene, np.asarray(rig.left.params.P),
        np.asarray(rig.right.params.P), W, H, pixel_threshold=0.75,
        rng=rng)
    ticks = np.arange(TICK, 0.5, TICK)
    fl = frame_events(ev_l, ticks, 3000)
    fr = frame_events(ev_r, ticks, 3000)

    system = EsvoSystem(rig, make_config())
    pgl = PoseGraphLoop(
        system, keyframe_every=1,
        lc_config=lc.LoopClosureConfig(min_gap=4, min_similarity=0.88))
    for k in range(len(ticks)):
        t = float(ticks[k])
        # extra mapping on the final tick: the trajectory completes its
        # period at t = duration, so the last surface IS the revisit
        out = system.process_tick(
            t, frame_at(fl, k), frame_at(fr, k),
            do_mapping=(k % 5 == 4 or k == len(ticks) - 1))
        pgl.maybe_update(out)

    assert system.status == SystemStatus.WORKING
    assert pgl.num_loop_closures >= 1, "no loop accepted on the revisit"

    # accepted edges are geometrically sane: the edge error is bounded
    # by the depth noise of two independently-built event maps (~3%
    # inverse depth at 1.2-3 m scene depth -> up to ~0.1 m); the pose
    # graph's Huber absorbs that scale
    times = [kf[0] for kf in pgl._kfs]
    for (i, j, T_edge, _wr, _wt) in pgl._loop_edges:
        gt_i = interpolate_gt_pose(scene, times[i])
        gt_j = interpolate_gt_pose(scene, times[j])
        rel_gt = np.linalg.inv(gt_i) @ gt_j
        err = np.linalg.norm(T_edge[:3, 3] - rel_gt[:3, 3])
        assert err < 0.1, (i, j, T_edge[:3, 3], rel_gt[:3, 3])

    # the optimized keyframe trajectory stays at least as good as the
    # odometry chain (this short synthetic run drifts little, so the
    # closure's job is mainly to not hurt)
    t_est, T_est = system.trajectory()
    gt = np.stack([interpolate_gt_pose(scene, t) for t in t_est])
    ate_odo = ate_rmse(t_est, T_est, t_est, gt, align=True)
    pt, pT = pgl.optimized_trajectory()
    gt_kf = np.stack([interpolate_gt_pose(scene, t) for t in pt])
    ate_pg = ate_rmse(pt, pT, pt, gt_kf, align=True)
    print(f"odometry ATE {ate_odo:.4f}, pose-graph keyframe ATE "
          f"{ate_pg:.4f}, closures {pgl.num_loop_closures}")
    assert ate_pg < 1.2 * ate_odo
