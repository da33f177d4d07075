"""End-to-end demo: synthetic stereo events -> depth maps + trajectory.

Runs the full closed loop (SGM bootstrap -> mapping <-> tracking ->
optional BA / loop-closure backends) on a simulated scene and reports depth accuracy vs
ground truth and trajectory ATE. Works on TPU or CPU.

    python examples/run_synthetic.py [n_ticks] [--ba] [--loop-closure]
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

from esvo_tpu.geometry.camera import make_ideal_rig
from esvo_tpu.io.events import frame_events
from esvo_tpu.io.synthetic import (make_scene, simulate_stereo_events,
                                   interpolate_gt_pose)
from esvo_tpu.runtime.config import SystemConfig, MappingConfig
from esvo_tpu.runtime.system import EsvoSystem
from esvo_tpu.runtime.backend_loop import BackendLoop
from esvo_tpu.mapping.depth_refinement import DepthProblemConfig
from esvo_tpu.mapping.block_matching import BlockMatchConfig
from esvo_tpu.eval.trajectory import ate_rmse

W, H, FX, BASELINE, TICK = 240, 180, 150.0, 0.1, 0.01


def main():
    n_ticks = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    use_ba = "--ba" in sys.argv
    use_lc = "--loop-closure" in sys.argv
    rng = np.random.default_rng(7)
    rig = make_ideal_rig(W, H, FX, FX, W / 2 - 0.5, H / 2 - 0.5, BASELINE,
                         dtype=jnp.float32)
    duration = max((n_ticks + 2) * TICK, 0.2)
    scene = make_scene(rng, num_points=4000, duration=duration,
                       steps=int(duration * 100) + 1, motion_scale=0.6)
    ev_l, ev_r = simulate_stereo_events(
        scene, np.asarray(rig.left.params.P),
        np.asarray(rig.right.params.P), W, H, pixel_threshold=0.75, rng=rng)
    print(f"simulated events: L={len(ev_l)} R={len(ev_r)}")
    ticks = np.arange(TICK, duration, TICK)
    fl = frame_events(ev_l, ticks, 3000)
    fr = frame_events(ev_r, ticks, 3000)

    cfg = SystemConfig(
        depth=DepthProblemConfig(max_iteration=8),
        bm=BlockMatchConfig(zncc_threshold=0.25),
        mapping=MappingConfig(process_event_num=800,
                              init_sgm_num_threshold=300,
                              std_var_vis_threshold=0.05,
                              age_vis_threshold=0, denoising=False,
                              regularization=False))
    system = EsvoSystem(rig, cfg)
    backend = BackendLoop(system) if use_ba else None
    pose_graph = None
    if use_lc:
        from esvo_tpu.runtime.pose_graph_loop import PoseGraphLoop
        pose_graph = PoseGraphLoop(system, keyframe_every=1)

    t0 = time.perf_counter()
    for k in range(min(n_ticks, len(ticks))):
        t = float(ticks[k])
        frame = lambda f: {key: v[k] for key, v in f.items()
                           if key != "dropped"}
        out = system.process_tick(t, frame(fl), frame(fr),
                                  do_mapping=(k % 5 == 4))
        if backend:
            backend.maybe_update(out)
        if pose_graph:
            pg_stats = pose_graph.maybe_update(out)
            if pg_stats and "pg_cost_final" in pg_stats:
                print(f"tick {k}: loop closure -> kf "
                      f"{pg_stats['lc_candidate']} "
                      f"(sim {pg_stats['lc_similarity']:.3f})")
        if k % 10 == 9:
            print(f"tick {k}: {system.status.value} "
                  f"map_points={system.stats['map_points']}")
    wall = time.perf_counter() - t0

    t_est, T_est = system.trajectory()
    gt = np.stack([interpolate_gt_pose(scene, t) for t in t_est])
    ate = ate_rmse(t_est, T_est, t_est, gt, align=True)
    inv_d, occ = system.depth_map()
    print(f"ticks: {len(t_est)} in {wall:.1f}s "
          f"({len(t_est) / wall:.1f} ticks/s)")
    print(f"map points: {int(occ.sum())}")
    print(f"ATE RMSE: {ate:.4f} m")
    if backend:
        print(f"BA runs: {backend.num_ba_runs}")
    if pose_graph:
        print(f"loop closures: {pose_graph.num_loop_closures}")
    system.save_trajectory("/tmp/esvo_tpu_traj.txt")
    print("trajectory saved to /tmp/esvo_tpu_traj.txt")
    assert ate < 0.1, "trajectory diverged"
    print("E2E DEMO OK")


if __name__ == "__main__":
    main()
