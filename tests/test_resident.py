"""Device-resident closed loop (runtime/resident.py) vs the host path.

The resident program folds K-tick tracking rolls + the mapping cycle +
the pose table + the ref-map publish into one device dispatch; these
tests pin that its closed-loop semantics match the host-driven
process_ticks path (same guard, same one-roll publish latency).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from esvo_tpu.geometry.camera import make_ideal_rig
from esvo_tpu.io.events import frame_events
from esvo_tpu.io.synthetic import (make_scene, simulate_stereo_events,
                                   interpolate_gt_pose)
from esvo_tpu.runtime.config import SystemConfig, MappingConfig
from esvo_tpu.runtime.system import EsvoSystem, SystemStatus
from esvo_tpu.runtime.resident import ResidentLoop
from esvo_tpu.mapping.block_matching import BlockMatchConfig
from esvo_tpu.mapping.depth_refinement import DepthProblemConfig
from esvo_tpu.mapping.initialization import SGMConfig
from esvo_tpu.eval.trajectory import ate_rmse

W, H = 240, 180
FX = 150.0
BASELINE = 0.1
TICK = 0.01
ROLL = 5


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(7)
    rig = make_ideal_rig(W, H, FX, FX, W / 2 - 0.5, H / 2 - 0.5, BASELINE,
                         dtype=jnp.float32)
    scene = make_scene(rng, num_points=4000, duration=0.8, steps=81,
                       motion_scale=0.6)
    ev_l, ev_r = simulate_stereo_events(
        scene, np.asarray(rig.left.params.P),
        np.asarray(rig.right.params.P), W, H, pixel_threshold=0.75,
        rng=rng)
    ticks = np.arange(TICK, 0.8, TICK)
    frames_l = frame_events(ev_l, ticks, 3000)
    frames_r = frame_events(ev_r, ticks, 3000)
    return rig, scene, ticks, frames_l, frames_r


def make_config():
    return SystemConfig(
        depth=DepthProblemConfig(max_iteration=8),
        bm=BlockMatchConfig(zncc_threshold=0.25),
        sgm=SGMConfig(num_disparities=48),
        mapping=MappingConfig(process_event_num=800,
                              init_sgm_num_threshold=300,
                              std_var_vis_threshold=0.05,
                              age_vis_threshold=0,
                              denoising=False, regularization=False))


def pick(f, sl):
    return {k: v[sl] for k, v in f.items() if k != "dropped"}


def bootstrap(system, ticks, frames_l, frames_r):
    system.reset()
    k0 = 0
    while system.status != SystemStatus.WORKING and k0 + ROLL <= len(ticks):
        system.process_ticks(ticks[k0:k0 + ROLL],
                             pick(frames_l, slice(k0, k0 + ROLL)),
                             pick(frames_r, slice(k0, k0 + ROLL)),
                             do_mapping=True)
        k0 += ROLL
    assert system.status == SystemStatus.WORKING
    return k0


def run_resident(system, ticks, frames_l, frames_r, R, k0, stop=None):
    loop = ResidentLoop(system, ticks_per_roll=ROLL, rolls_per_dispatch=R)
    loop.start()
    RK = R * ROLL
    stop = stop or len(ticks)
    out = None
    while k0 + RK <= stop:
        sl = slice(k0, k0 + RK)
        loop.run(ticks[sl], pick(frames_l, sl), pick(frames_r, sl))
        out = loop.sync()
        k0 += RK
    loop.finish()
    return out, k0


def ate_of(system, scene):
    t_est, poses = system.trajectory()
    gt = np.stack([interpolate_gt_pose(scene, t) for t in t_est])
    return float(ate_rmse(t_est, poses, t_est, gt))


def test_resident_matches_host_path(world):
    rig, scene, ticks, frames_l, frames_r = world
    system = EsvoSystem(rig, make_config())

    # host-driven roll path
    k0 = bootstrap(system, ticks, frames_l, frames_r)
    for k in range(k0, len(ticks) - ROLL + 1, ROLL):
        sl = slice(k, k + ROLL)
        system.process_ticks(ticks[sl], pick(frames_l, sl),
                             pick(frames_r, sl), do_mapping=True)
    system.flush()
    ate_host = ate_of(system, scene)
    pts_host = system.stats["map_points"]

    # resident path (2 rolls per dispatch)
    k0 = bootstrap(system, ticks, frames_l, frames_r)
    out, _ = run_resident(system, ticks, frames_l, frames_r, R=2, k0=k0)
    assert system.status == SystemStatus.WORKING
    ate_res = ate_of(system, scene)
    pts_res = system.stats["map_points"]

    # same loop, same data: comparable accuracy and map density
    assert ate_res < max(2.0 * ate_host, 0.06), (ate_res, ate_host)
    assert pts_res > 0.5 * pts_host
    assert out["map_points"] == pts_res
    assert out["rolls_since_good"] == 0
    # trajectory covers every tick
    t_est, _ = system.trajectory()
    assert len(t_est) == len(ticks) - (len(ticks) - k0) % (2 * ROLL)


def test_resident_state_handoff_continues_on_host(world):
    """finish() must hand back a state the host path can continue from:
    ref maps, pose table, fusion history all live."""
    rig, scene, ticks, frames_l, frames_r = world
    system = EsvoSystem(rig, make_config())
    k0 = bootstrap(system, ticks, frames_l, frames_r)
    _, k0 = run_resident(system, ticks, frames_l, frames_r, R=2, k0=k0,
                         stop=k0 + 20)
    # continue on the host path
    for k in range(k0, len(ticks) - ROLL + 1, ROLL):
        sl = slice(k, k + ROLL)
        system.process_ticks(ticks[sl], pick(frames_l, sl),
                             pick(frames_r, sl), do_mapping=True)
    system.flush()
    assert system.status == SystemStatus.WORKING
    assert ate_of(system, scene) < 0.08
    # pose table stayed monotone through the handoff
    assert np.all(np.diff(system.pose_times) > 0)


def test_resident_world_correction_mirrors_to_device(world):
    rig, scene, ticks, frames_l, frames_r = world
    system = EsvoSystem(rig, make_config())
    k0 = bootstrap(system, ticks, frames_l, frames_r)
    loop = ResidentLoop(system, ticks_per_roll=ROLL, rolls_per_dispatch=1)
    loop.start()
    sl = slice(k0, k0 + ROLL)
    loop.run(ticks[sl], pick(frames_l, sl), pick(frames_r, sl))
    loop.sync()
    corr = np.eye(4)
    corr[:3, 3] = [1.0, -2.0, 0.5]
    T_before = np.asarray(loop.state.T_world_cur)
    system.apply_world_correction(corr)
    T_after = np.asarray(loop.state.T_world_cur)
    np.testing.assert_allclose(T_after[:3, 3], T_before[:3, 3]
                               + corr[:3, 3], atol=1e-5)
    # and the loop keeps tracking in the corrected frame
    sl = slice(k0 + ROLL, k0 + 2 * ROLL)
    loop.run(ticks[sl], pick(frames_l, sl), pick(frames_r, sl))
    out = loop.sync()
    assert np.linalg.norm(out["poses"][-1][:3, 3] - corr[:3, 3]) < 0.5
    loop.finish()
    # observer deregistered
    assert loop._on_world_correction not in \
        system._world_correction_observers


def test_resident_timestamp_watchdog_raises(world):
    rig, scene, ticks, frames_l, frames_r = world
    system = EsvoSystem(rig, make_config())
    k0 = bootstrap(system, ticks, frames_l, frames_r)
    loop = ResidentLoop(system, ticks_per_roll=ROLL, rolls_per_dispatch=1)
    loop.start()
    sl = slice(k0, k0 + ROLL)
    with pytest.raises(RuntimeError, match="discontinuity"):
        loop.run(ticks[sl] + 100.0, pick(frames_l, sl), pick(frames_r, sl))
