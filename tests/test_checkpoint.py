"""Checkpoint/resume: a restored system must continue identically."""
import numpy as np
import jax.numpy as jnp

from esvo_tpu.geometry.camera import make_ideal_rig
from esvo_tpu.io.events import frame_events
from esvo_tpu.io.synthetic import (make_scene, simulate_stereo_events,
                                   interpolate_gt_pose)
from esvo_tpu.runtime.system import EsvoSystem
from esvo_tpu.runtime.checkpoint import save_checkpoint, load_checkpoint
from tests.test_system import make_config, frame_at

W, H = 240, 180
FX = 150.0
TICK = 0.01


def test_checkpoint_roundtrip_continues_identically(tmp_path):
    rng = np.random.default_rng(3)
    rig = make_ideal_rig(W, H, FX, FX, W / 2 - 0.5, H / 2 - 0.5, 0.1,
                         dtype=jnp.float32)
    scene = make_scene(rng, num_points=3000, duration=0.4, steps=41,
                       motion_scale=0.5)
    ev_l, ev_r = simulate_stereo_events(
        scene, np.asarray(rig.left.params.P), np.asarray(rig.right.params.P),
        W, H, pixel_threshold=0.75, rng=rng)
    ticks = np.arange(TICK, 0.4, TICK)
    fl = frame_events(ev_l, ticks, 2000)
    fr = frame_events(ev_r, ticks, 2000)

    def run(system, k0, k1):
        for k in range(k0, k1):
            t = float(ticks[k])
            gt = interpolate_gt_pose(scene, t)
            system.process_tick(t, frame_at(fl, k), frame_at(fr, k),
                                gt_pose=gt, do_mapping=(k % 5 == 4))

    a = EsvoSystem(rig, make_config(), seed=0)
    run(a, 0, 15)
    save_checkpoint(a, str(tmp_path / "ckpt"))

    b = EsvoSystem(rig, make_config(), seed=0)
    load_checkpoint(b, str(tmp_path / "ckpt"))
    assert b.status == a.status
    np.testing.assert_array_equal(np.asarray(a.grid.inv_depth),
                                  np.asarray(b.grid.inv_depth))

    run(a, 15, 25)
    run(b, 15, 25)
    np.testing.assert_allclose(np.asarray(a.grid.inv_depth),
                               np.asarray(b.grid.inv_depth), atol=1e-6)
    ta, Ta = a.trajectory()
    tb, Tb = b.trajectory()
    np.testing.assert_allclose(Ta, Tb, atol=1e-7)
