"""Tests for the MVStereo harness modes (reference esvo_MVStereo)."""
import numpy as np
import jax.numpy as jnp
import pytest

from esvo_tpu.geometry.camera import make_ideal_rig
from esvo_tpu.io.events import frame_events
from esvo_tpu.io.synthetic import (make_scene, simulate_stereo_events,
                                   interpolate_gt_pose)
from esvo_tpu.mapping.event_matcher import EventMatcherConfig
from esvo_tpu.runtime.mvstereo import MVStereoSystem, MVStereoMode
from tests.test_system import make_config, frame_at, gt_depth_check

W, H = 240, 180
FX = 150.0
BASELINE = 0.1
TICK = 0.01


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(11)
    rig = make_ideal_rig(W, H, FX, FX, W / 2 - 0.5, H / 2 - 0.5, BASELINE,
                         dtype=jnp.float32)
    scene = make_scene(rng, num_points=4000, duration=0.5, steps=51,
                       motion_scale=0.6)
    ev_l, ev_r = simulate_stereo_events(
        scene, np.asarray(rig.left.params.P), np.asarray(rig.right.params.P),
        W, H, pixel_threshold=0.75, rng=rng)
    ticks = np.arange(TICK, 0.5, TICK)
    frames_l = frame_events(ev_l, ticks, 3000)
    frames_r = frame_events(ev_r, ticks, 3000)
    return rig, scene, ticks, frames_l, frames_r


def run_mode(world, mode, n_ticks=30, em_config=None):
    rig, scene, ticks, frames_l, frames_r = world
    system = MVStereoSystem(rig, mode, make_config(), em_config=em_config)
    for k in range(n_ticks):
        t = float(ticks[k])
        gt = interpolate_gt_pose(scene, t)
        system.process_tick(t, frame_at(frames_l, k), frame_at(frames_r, k),
                            gt_pose=gt, do_mapping=(k % 5 == 4))
    return system


def test_mode_pure_bm(world):
    rig, scene, ticks, *_ = world
    system = run_mode(world, MVStereoMode.PURE_BLOCK_MATCHING)
    med = gt_depth_check(system, scene, float(ticks[29]), rig, tol=0.2,
                         min_pts=150)
    print(f"mode1 BM-only median err {med:.3f}")


def test_mode_pure_sgm(world):
    rig, scene, ticks, *_ = world
    system = run_mode(world, MVStereoMode.PURE_SGM)
    inv_d, occ = system.depth_map()
    assert occ.sum() > 150


def test_mode_em(world):
    rig, scene, ticks, *_ = world
    em_cfg = EventMatcherConfig(time_threshold=2e-3, epipolar_threshold=1.0,
                                ts_ncc_threshold=0.4, patch_size_x=15,
                                patch_size_y=15, max_candidates=32)
    system = run_mode(world, MVStereoMode.PURE_EVENT_MATCHING,
                      em_config=em_cfg)
    inv_d, occ = system.depth_map()
    assert occ.sum() > 100, f"EM mode produced {occ.sum()} points"


def test_mode_em_plus_estimation(world):
    rig, scene, ticks, *_ = world
    em_cfg = EventMatcherConfig(time_threshold=2e-3, epipolar_threshold=1.0,
                                ts_ncc_threshold=0.4, patch_size_x=15,
                                patch_size_y=15, max_candidates=32)
    system = run_mode(world, MVStereoMode.EM_PLUS_ESTIMATION,
                      em_config=em_cfg)
    inv_d, occ = system.depth_map()
    assert occ.sum() > 50
