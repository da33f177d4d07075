"""Unit tests for the accuracy campaign's scoring machinery
(scripts/sim_campaign.py): loop-edge TP/FP classification against GT and
semi-dense depth scoring against the analytic scene, plus the cached
generation path."""
import json
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))
import sim_campaign  # noqa: E402
from esvo_tpu.io import esim  # noqa: E402


def _gt():
    t = np.linspace(0.0, 10.0, 101)
    T = np.broadcast_to(np.eye(4), (101, 4, 4)).copy()
    T[:, 0, 3] = np.sin(t)
    T[:, 2, 3] = 0.3 * t
    return t, T


def test_classify_loop_edges():
    from esvo_tpu.eval.trajectory import interpolate_pose
    gt_t, gt_T = _gt()
    Ti = interpolate_pose(gt_t, gt_T, 2.0)
    Tj = interpolate_pose(gt_t, gt_T, 8.0)
    true_edge = (2.0, 8.0, np.linalg.inv(Ti) @ Tj)
    bad = np.linalg.inv(Ti) @ Tj
    bad[:3, 3] += [0.8, 0.0, 0.0]          # 0.8 m off -> false positive
    false_edge = (2.0, 8.0, bad)
    tp, fp, det = sim_campaign.classify_loop_edges(
        [true_edge, false_edge], gt_t, gt_T)
    assert tp == 1 and fp == 1
    assert det[0]["true"] and not det[1]["true"]
    assert det[1]["trans_err_m"] == pytest.approx(0.8, abs=1e-3)


def test_eval_depth_maps_scores_analytic_depth(tmp_path):
    """A depth dump sampled straight from the analytic render must score
    ~zero inverse-depth error; a corrupted one must not."""
    args = sim_campaign.parse_args(
        ["--out", str(tmp_path), "--width", "64", "--height", "48",
         "--fx", "50", "--duration", "2.0", "--depth-eval-every", "1"])
    scene = esim.make_room_scene(np.random.default_rng(3))
    scene.save(str(tmp_path / "scene.npz"))
    K = sim_campaign.make_K(args)
    pose = lambda t: esim.loop_trajectory_pose(t, args.duration,
                                               laps=args.laps)
    gt_t = np.linspace(0.0, 2.0, 21)
    from esvo_tpu.eval.trajectory import save_tum
    save_tum(str(tmp_path / "groundtruth.txt"), gt_t,
             np.stack([pose(t) for t in gt_t]))

    depth_dir = tmp_path / "depth_maps"
    depth_dir.mkdir()
    rng = np.random.default_rng(0)
    for t in (0.5, 1.0):
        _, depth = esim.render_log_intensity(
            scene, jnp.asarray(pose(t), jnp.float32),
            jnp.asarray(K, jnp.float32), args.width, args.height)
        depth = np.asarray(depth)
        xs = rng.uniform(1, args.width - 2, 300)
        ys = rng.uniform(1, args.height - 2, 300)
        z = depth[ys.astype(int), xs.astype(int)]
        np.savetxt(str(depth_dir / f"{int(t * 1e9)}.txt"),
                   np.stack([xs.astype(int) + 0.0, ys.astype(int) + 0.0,
                             z], 1))
    res = sim_campaign.eval_depth_maps(args, str(depth_dir))
    assert res["frames"] == 2
    assert res["inv_depth_rel_err_median"] < 0.02
    assert res["frac_within_10pct"] > 0.9

    # corrupt: halve the depths -> ~100% relative inverse-depth error
    for name in os.listdir(depth_dir):
        pts = np.loadtxt(str(depth_dir / name), ndmin=2)
        pts[:, 2] *= 0.5
        np.savetxt(str(depth_dir / name), pts)
    res2 = sim_campaign.eval_depth_maps(args, str(depth_dir))
    assert res2["inv_depth_rel_err_median"] > 0.5


def test_generate_caches(tmp_path):
    args = sim_campaign.parse_args(
        ["--out", str(tmp_path), "--width", "40", "--height", "30",
         "--fx", "30", "--duration", "0.4", "--quick"])
    sim_campaign.generate(args)
    meta = json.load(open(tmp_path / "meta.json"))
    assert meta["contrast"] == args.contrast and meta["laps"] == args.laps
    mtime = os.path.getmtime(tmp_path / "events_left.npz")
    sim_campaign.generate(args)   # cache hit: no rewrite
    assert os.path.getmtime(tmp_path / "events_left.npz") == mtime
    # per-camera raw caches exist for crash resume
    assert os.path.exists(tmp_path / "raw_left.npz")
    assert os.path.exists(tmp_path / "raw_right.npz")
