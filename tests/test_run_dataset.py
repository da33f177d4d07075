"""Fixture-scale test of the dataset-replay CLI (scripts/run_dataset.py).

Generates an rpg-format dataset directory (events_left.txt /
events_right.txt / groundtruth.txt) plus ESVO-format calibration and
parameter YAMLs, then drives the full pipeline through the CLI's main().
Real rpg/upenn data is a drop-in replacement (VERDICT Missing #1).
"""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from esvo_tpu.io.synthetic import make_scene, simulate_stereo_events
from esvo_tpu.eval.trajectory import save_tum, load_tum

W, H = 240, 180
FX = 150.0
BASELINE = 0.1


def _calib_yaml(path, name, width, height, fx, fy, cx, cy, tx):
    K = [fx, 0.0, cx, 0.0, fy, cy, 0.0, 0.0, 1.0]
    P = [fx, 0.0, cx, tx, 0.0, fy, cy, 0.0, 0.0, 0.0, 1.0, 0.0]
    R = [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
    Trl = [1.0, 0.0, 0.0, -BASELINE, 0.0, 1.0, 0.0, 0.0,
           0.0, 0.0, 1.0, 0.0]
    with open(path, "w") as f:
        f.write(f"""image_width: {width}
image_height: {height}
camera_name: {name}
camera_matrix:
  rows: 3
  cols: 3
  data: {K}
distortion_model: plumb_bob
distortion_coefficients:
  rows: 1
  cols: 4
  data: [0.0, 0.0, 0.0, 0.0]
rectification_matrix:
  rows: 3
  cols: 3
  data: {R}
projection_matrix:
  rows: 3
  cols: 4
  data: {P}
T_right_left:
  rows: 3
  cols: 4
  data: {Trl}
""")


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("rpg_fixture")
    rng = np.random.default_rng(3)
    scene = make_scene(rng, num_points=4000, duration=0.7, steps=71,
                       motion_scale=0.6)
    cx, cy = W / 2 - 0.5, H / 2 - 0.5
    P_l = np.array([[FX, 0, cx, 0], [0, FX, cy, 0], [0, 0, 1, 0]])
    P_r = P_l.copy()
    P_r[0, 3] = -FX * BASELINE
    ev_l, ev_r = simulate_stereo_events(scene, P_l, P_r, W, H,
                                        pixel_threshold=0.75, rng=rng)
    for name, ev in (("events_left.txt", ev_l), ("events_right.txt", ev_r)):
        with open(root / name, "w") as f:
            for i in range(len(ev)):
                f.write(f"{ev.t[i]:.9f} {ev.x[i]} {ev.y[i]} "
                        f"{int(ev.p[i])}\n")
    save_tum(str(root / "groundtruth.txt"), scene.traj_times,
             np.asarray(scene.traj_poses))

    calib = root / "calib"
    calib.mkdir()
    _calib_yaml(calib / "left.yaml", "fix_left", W, H, FX, FX, cx, cy, 0.0)
    _calib_yaml(calib / "right.yaml", "fix_right", W, H, FX, FX, cx, cy,
                -FX * BASELINE)

    cfg = root / "cfg"
    cfg.mkdir()
    # relaxed synthetic knobs in reference YAML schema
    (cfg / "mapping.yaml").write_text("""
invDepth_min_range: 0.2
invDepth_max_range: 2.0
patch_size_X: 15
patch_size_Y: 7
Lnorm: Tdist
BM_ZNCC_Threshold: 0.25
PROCESS_EVENT_NUM: 800
INIT_SGM_DP_NUM_THRESHOLD: 300
stdVar_vis_threshold: 0.05
age_vis_threshold: 0
Denoising: false
Regularization: false
mapping_rate_hz: 20
""")
    (cfg / "tracking.yaml").write_text("""
patch_size_X: 1
patch_size_Y: 1
MAX_REGISTRATION_POINTS: 2000
BATCH_SIZE: 300
MAX_ITERATION: 10
LSnorm: Huber
tracking_rate_hz: 100
""")
    (cfg / "ts.yaml").write_text("""
decay_ms: 30
ignore_polarity: true
median_blur_kernel_size: 1
time_surface_mode: 0
""")
    return root


def test_run_dataset_closed_loop(dataset_dir, tmp_path):
    import run_dataset
    out = str(tmp_path / "traj.txt")
    gm = str(tmp_path / "global_map.xyz")
    dm_dir = str(tmp_path / "depth_maps")
    result = run_dataset.main([
        "--dataset", str(dataset_dir),
        "--calib", str(dataset_dir / "calib"),
        "--mapping-yaml", str(dataset_dir / "cfg" / "mapping.yaml"),
        "--tracking-yaml", str(dataset_dir / "cfg" / "tracking.yaml"),
        "--ts-yaml", str(dataset_dir / "cfg" / "ts.yaml"),
        "--duration", "0.6",
        "--out", out,
        "--global-map-out", gm,
        "--save-depth-maps", dm_dir,
        "--loop-closure", "--loop-every", "2",
        "--quiet",
    ])
    # loop-closure layer ran end-to-end (the short non-revisiting
    # fixture trajectory usually yields zero closures — the point is
    # that the keyframe/descriptor path executes inside the CLI)
    assert "loop_closures" in result
    # per-cycle depth-map dumps (saveDepthMap, esvo_MVStereo.cpp:982-1000):
    # nanosecond-stamped txt files of "x y z" rows
    dumps = sorted(os.listdir(dm_dir))
    assert len(dumps) >= 5 and all(f.endswith(".txt") for f in dumps)
    rows = np.loadtxt(os.path.join(dm_dir, dumps[-1]))
    assert rows.ndim == 2 and rows.shape[1] == 3 and rows.shape[0] > 100
    assert (rows[:, 2] > 0).all()
    assert os.path.exists(out)
    t, T = load_tum(out)
    assert len(t) >= 50
    assert "ate_rmse_m" in result
    assert result["ate_rmse_m"] < 0.15, result
    assert result["rpe_trans_rmse_m"] < 0.05, result
    assert result["stats"]["map_points"] > 200
    # global map export (esvo_Mapping.cpp:909-978)
    gm_pts = np.loadtxt(gm)
    assert gm_pts.shape[0] > 200 and gm_pts.shape[1] == 3


def test_run_dataset_resident_loop(dataset_dir, tmp_path):
    """--resident 2 --roll 5: one device dispatch per 10 ticks with the
    pose table/ref map on device (runtime/resident.py); same dataset +
    accuracy bar as the host-path closed loop, with the loop-closure
    layer fed from the per-dispatch summaries."""
    import run_dataset
    out = str(tmp_path / "traj_res.txt")
    dm_dir = str(tmp_path / "depth_maps_res")
    result = run_dataset.main([
        "--dataset", str(dataset_dir),
        "--calib", str(dataset_dir / "calib"),
        "--mapping-yaml", str(dataset_dir / "cfg" / "mapping.yaml"),
        "--tracking-yaml", str(dataset_dir / "cfg" / "tracking.yaml"),
        "--ts-yaml", str(dataset_dir / "cfg" / "ts.yaml"),
        "--duration", "0.6",
        "--roll", "5",
        "--resident", "2",
        "--save-depth-maps", dm_dir,
        "--loop-closure", "--loop-every", "1",
        "--out", out,
        "--quiet",
    ])
    assert result["ate_rmse_m"] < 0.15, result
    assert result["stats"]["map_points"] > 200
    assert "loop_closures" in result
    t, T = load_tum(out)
    assert len(t) >= 50
    # depth dumps land once per dispatch while resident
    dumps = sorted(os.listdir(dm_dir))
    assert len(dumps) >= 3
    rows = np.loadtxt(os.path.join(dm_dir, dumps[-1]))
    assert rows.ndim == 2 and rows.shape[0] > 100


def test_run_dataset_sharded_rolls(dataset_dir, tmp_path):
    """--devices 2 --roll 5: the replay CLI drives EsvoSystem(mesh=...)
    — mapping event axis sharded over two virtual devices — through the
    fused multi-tick roll path."""
    import run_dataset
    out = str(tmp_path / "traj_sh.txt")
    result = run_dataset.main([
        "--dataset", str(dataset_dir),
        "--calib", str(dataset_dir / "calib"),
        "--mapping-yaml", str(dataset_dir / "cfg" / "mapping.yaml"),
        "--tracking-yaml", str(dataset_dir / "cfg" / "tracking.yaml"),
        "--ts-yaml", str(dataset_dir / "cfg" / "ts.yaml"),
        "--duration", "0.35",
        "--devices", "2",
        "--roll", "5",
        "--loop-closure", "--loop-every", "2",
        "--out", out,
        "--quiet",
    ])
    assert result["stats"]["map_points"] > 150
    assert result["ate_rmse_m"] < 0.15, result
    # sharded PoseGraphLoop ran inside the CLI (closures usually 0 on
    # this short non-revisiting fixture)
    assert "loop_closures" in result


def test_run_dataset_from_rosbag(dataset_dir, tmp_path):
    """Full pipeline from a rosbag: pack the fixture's events + GT into
    a bz2-chunked v2.0 bag (epoch-scale stamps like real rpg bags),
    replay it through --bag, check the closed-loop ATE."""
    import jax.numpy as jnp
    import run_dataset
    from esvo_tpu.io.datasets import load_rpg_dataset
    from esvo_tpu.eval.trajectory import load_tum
    from esvo_tpu.geometry.se3 import rot_to_quat
    from tests.test_rosbag import (_write_bag, _connection, _message,
                                   _event_array_msg, _pose_msg)

    ev_l, ev_r, gt_t, gt_T = load_rpg_dataset(str(dataset_dir))
    t0_abs = 1468941032.0  # epoch offset, like real bags
    qs = np.asarray(rot_to_quat(jnp.asarray(gt_T[:, :3, :3])))

    def ev_chunks(ev, conn, per=2000):
        out = []
        for s in range(0, len(ev.t), per):
            e = slice(s, s + per)
            out.append(_message(conn, _event_array_msg(
                ev.t[e] + t0_abs, ev.x[e], ev.y[e], ev.p[e])))
        return out

    inner = [_connection(0, "/davis/left/events", "dvs_msgs/EventArray")
             + _connection(1, "/davis/right/events",
                           "dvs_msgs/EventArray")
             + _connection(2, "/gt/pose", "geometry_msgs/PoseStamped")]
    inner += ev_chunks(ev_l, 0) + ev_chunks(ev_r, 1)
    inner += [_message(2, _pose_msg(float(gt_t[i]) + t0_abs,
                                    tuple(gt_T[i][:3, 3]), tuple(qs[i])))
              for i in range(len(gt_t))]
    bag_path = str(tmp_path / "fixture.bag")
    _write_bag(bag_path, inner, "bz2")

    out = str(tmp_path / "traj_bag.txt")
    result = run_dataset.main([
        "--bag", bag_path,
        "--bag-gt-topic", "/gt/pose",
        "--calib", str(dataset_dir / "calib"),
        "--mapping-yaml", str(dataset_dir / "cfg" / "mapping.yaml"),
        "--tracking-yaml", str(dataset_dir / "cfg" / "tracking.yaml"),
        "--ts-yaml", str(dataset_dir / "cfg" / "ts.yaml"),
        "--duration", "0.45",
        "--out", out,
        "--quiet",
    ])
    t_est, _ = load_tum(out)
    assert len(t_est) >= 40
    assert result["stats"]["map_points"] > 150
    assert result["ate_rmse_m"] < 0.15, result


def test_bag_event_cache(tmp_path):
    """--bag --cache: decoded streams persist as npz and reload
    identically (incl. the GT topic), with max_events applied after."""
    import argparse
    import run_dataset
    from tests.test_rosbag import (_write_bag, _connection, _message,
                                   _event_array_msg, _pose_msg)
    rng = np.random.default_rng(1)
    n = 300
    t = np.sort(1e9 + rng.uniform(0, 1, n))
    inner = (_connection(0, "/davis/left/events", "dvs_msgs/EventArray")
             + _connection(1, "/davis/right/events",
                           "dvs_msgs/EventArray")
             + _connection(2, "/gt", "geometry_msgs/PoseStamped")
             + _message(0, _event_array_msg(
                 t, rng.integers(0, 240, n), rng.integers(0, 180, n),
                 rng.random(n) > 0.5))
             + _message(1, _event_array_msg(
                 t + 0.001, rng.integers(0, 240, n),
                 rng.integers(0, 180, n), rng.random(n) > 0.5))
             + _message(2, _pose_msg(1e9 + 0.5, (1, 2, 3), (0, 0, 0, 1))))
    bag = str(tmp_path / "c.bag")
    _write_bag(bag, [inner], "bz2")
    args = argparse.Namespace(
        dataset=None, mvsec=None, dsec=None, bag=bag, cache=True,
        bag_left_topic="/davis/left/events",
        bag_right_topic="/davis/right/events", bag_gt_topic="/gt",
        max_events=None)
    ev_l1, ev_r1, gt_t1, gt_T1 = run_dataset.load_events(args)
    assert os.path.exists(bag + ".left.npz")
    ev_l2, ev_r2, gt_t2, gt_T2 = run_dataset.load_events(args)
    np.testing.assert_array_equal(ev_l1.t, ev_l2.t)
    np.testing.assert_array_equal(ev_r1.x, ev_r2.x)
    np.testing.assert_allclose(gt_t1, gt_t2)
    np.testing.assert_allclose(gt_T1, gt_T2)
    args.max_events = 50
    ev_l3, *_ = run_dataset.load_events(args)
    assert len(ev_l3) == 50


def test_run_dataset_mvstereo_mode(dataset_dir, tmp_path):
    import run_dataset
    out = str(tmp_path / "traj_mv.txt")
    result = run_dataset.main([
        "--dataset", str(dataset_dir),
        "--calib", str(dataset_dir / "calib"),
        "--mapping-yaml", str(dataset_dir / "cfg" / "mapping.yaml"),
        "--tracking-yaml", str(dataset_dir / "cfg" / "tracking.yaml"),
        "--ts-yaml", str(dataset_dir / "cfg" / "ts.yaml"),
        "--mode", "mvstereo",
        "--duration", "0.4",
        "--out", out,
        "--quiet",
    ])
    assert result["stats"]["map_points"] > 200


def test_run_dataset_checkpoint_resume(dataset_dir, tmp_path):
    """--checkpoint-every + --resume: the second invocation restores the
    system AND backend state and continues the stream (fast-forwarding
    past the checkpointed tick)."""
    import run_dataset
    ckpt = str(tmp_path / "ckpt")
    out1 = str(tmp_path / "traj_a.txt")
    out2 = str(tmp_path / "traj_b.txt")
    base = [
        "--dataset", str(dataset_dir),
        "--calib", str(dataset_dir / "calib"),
        "--mapping-yaml", str(dataset_dir / "cfg" / "mapping.yaml"),
        "--tracking-yaml", str(dataset_dir / "cfg" / "tracking.yaml"),
        "--ts-yaml", str(dataset_dir / "cfg" / "ts.yaml"),
        "--loop-closure", "--loop-every", "2",
        "--quiet",
    ]
    run_dataset.main(base + ["--duration", "0.3",
                             "--checkpoint-every", "0.1",
                             "--checkpoint-dir", ckpt,
                             "--out", out1])
    assert os.path.exists(os.path.join(ckpt, "state.npz"))
    assert os.path.exists(os.path.join(ckpt, "pose_graph.npz"))

    result = run_dataset.main(base + ["--duration", "0.6",
                                      "--resume", ckpt,
                                      "--out", out2])
    t, T = load_tum(out2)
    # the resumed run continues past the checkpoint to the full window
    assert t[-1] > 0.5
    assert result["ate_rmse_m"] < 0.2, result
