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


def test_backend_loops_checkpoint_roundtrip(tmp_path):
    """PoseGraphLoop and BackendLoop state survives save/load: ragged
    keyframe windows, loop edges, descriptor database, counters."""
    import numpy as np
    import jax.numpy as jnp
    from esvo_tpu.geometry.camera import make_ideal_rig
    from esvo_tpu.runtime.pose_graph_loop import PoseGraphLoop
    from esvo_tpu.runtime.backend_loop import BackendLoop
    from esvo_tpu.backend import loop_closure as lc
    from esvo_tpu.runtime.system import SystemStatus

    class Sys:
        rig = make_ideal_rig(64, 48, 50.0, 50.0, 31.5, 23.5, 0.1,
                             dtype=jnp.float32)
        status = SystemStatus.WORKING
        dtype = jnp.float32
        reset_count = 0
        T_world_frame = np.eye(4)
        last_tick_time = 1.0

    rng = np.random.default_rng(0)
    sysf = Sys()
    pgl = PoseGraphLoop(sysf)
    # ragged keyframes (different point counts)
    for k, n in enumerate((5, 9, 3)):
        T = np.eye(4); T[:3, 3] = [k * 0.1, 0, 0]
        pgl._kfs.append((float(k), T, rng.normal(size=(n, 3)),
                         np.ones(n, bool)))
        pgl.detector.add(jnp.asarray(rng.uniform(0, 255, (48, 64))))
    pgl._loop_edges = [(0, 2, np.linalg.inv(pgl._kfs[0][1])
                        @ pgl._kfs[2][1], 150.0, 120.0)]
    pgl._mapping_cycles = 7
    pgl.num_loop_closures = 1
    pgl.save(str(tmp_path))

    pgl2 = PoseGraphLoop(sysf)
    assert pgl2.load(str(tmp_path))
    assert len(pgl2._kfs) == 3
    for a, b in zip(pgl._kfs, pgl2._kfs):
        assert a[0] == b[0]
        np.testing.assert_array_equal(a[1], b[1])
        np.testing.assert_array_equal(a[2], b[2])
        np.testing.assert_array_equal(a[3], b[3])
    assert pgl2._loop_edges[0][:2] == (0, 2)
    np.testing.assert_array_equal(pgl2._loop_edges[0][2],
                                  pgl._loop_edges[0][2])
    assert pgl2._loop_edges[0][3:] == (150.0, 120.0)
    assert pgl2.detector.count == 3
    np.testing.assert_array_equal(np.asarray(pgl2.detector._D),
                                  np.asarray(pgl.detector._D))
    assert pgl2._mapping_cycles == 7 and pgl2.num_loop_closures == 1
    # the restored database answers queries identically
    q = jnp.asarray(rng.uniform(0, 255, (48, 64)))
    pgl.detector.cfg = pgl2.detector.cfg = lc.LoopClosureConfig(min_gap=1)
    assert pgl.detector.query(q) == pgl2.detector.query(q)
    # empty-state roundtrip
    pgl3 = PoseGraphLoop(sysf)
    pgl3.save(str(tmp_path))
    pgl4 = PoseGraphLoop(sysf)
    assert pgl4.load(str(tmp_path)) and pgl4._kfs == []

    # BackendLoop window
    class Sys2(Sys):
        pass
    bl = BackendLoop(Sys2())
    for k, n in enumerate((4, 6)):
        T = np.eye(4); T[:3, 3] = [0, k * 0.05, 0]
        bl._kfs.append((float(k), T, rng.normal(size=(n, 3)),
                        rng.uniform(0, 64, (n, 2)), np.ones(n, bool)))
    bl._mapping_cycles = 5
    bl.num_ba_runs = 2
    bl.last_correction = np.diag([1.0, 1, 1, 1])
    bl.save(str(tmp_path))
    bl2 = BackendLoop(Sys2())
    assert bl2.load(str(tmp_path))
    assert len(bl2._kfs) == 2 and bl2.num_ba_runs == 2
    for a, b in zip(bl._kfs, bl2._kfs):
        for x, y in zip(a[1:], b[1:]):
            np.testing.assert_array_equal(x, y)
