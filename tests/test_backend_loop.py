"""BA backend integrated with the runtime loop on synthetic data."""
import numpy as np
import jax.numpy as jnp

from esvo_tpu.geometry.camera import make_ideal_rig
from esvo_tpu.io.events import frame_events
from esvo_tpu.io.synthetic import (make_scene, simulate_stereo_events,
                                   interpolate_gt_pose)
from esvo_tpu.runtime.system import EsvoSystem, SystemStatus
from esvo_tpu.runtime.backend_loop import BackendLoop
from tests.test_system import make_config, frame_at

W, H = 240, 180
FX = 150.0
TICK = 0.01


def test_backend_loop_runs_and_reduces_cost():
    rng = np.random.default_rng(9)
    rig = make_ideal_rig(W, H, FX, FX, W / 2 - 0.5, H / 2 - 0.5, 0.1,
                         dtype=jnp.float32)
    scene = make_scene(rng, num_points=4000, duration=0.6, steps=61,
                       motion_scale=0.6)
    ev_l, ev_r = simulate_stereo_events(
        scene, np.asarray(rig.left.params.P), np.asarray(rig.right.params.P),
        W, H, pixel_threshold=0.75, rng=rng)
    ticks = np.arange(TICK, 0.6, TICK)
    fl = frame_events(ev_l, ticks, 3000)
    fr = frame_events(ev_r, ticks, 3000)

    system = EsvoSystem(rig, make_config())
    backend = BackendLoop(system, keyframe_every=1, window=5,
                          voxel_size=0.08)
    stats = []
    for k in range(50):
        t = float(ticks[k])
        gt = interpolate_gt_pose(scene, t)
        out = system.process_tick(t, frame_at(fl, k), frame_at(fr, k),
                                  gt_pose=gt, do_mapping=(k % 5 == 4))
        s = backend.maybe_update(out)
        if s:
            stats.append(s)
    assert system.status == SystemStatus.WORKING
    assert backend.num_ba_runs >= 2, f"only {backend.num_ba_runs} BA runs"
    for s in stats:
        assert s["ba_cost_final"] <= s["ba_cost_initial"] * 1.001
        assert s["num_keyframes"] >= 3
    # with GT poses the correction reflects semi-dense map noise; it must
    # stay bounded (the window gauge is pinned by two fixed keyframes)
    corr = backend.last_correction
    assert np.linalg.norm(corr[:3, 3]) < 0.2
    ang = np.arccos(np.clip((np.trace(corr[:3, :3]) - 1) / 2, -1, 1))
    assert ang < 0.1
