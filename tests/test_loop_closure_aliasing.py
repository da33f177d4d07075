"""Loop-closure robustness under perceptual aliasing (repeated texture).

Builds an esim room scene whose four walls SHARE one texture — distinct
viewpoints render near-identical edge images, the classic loop-closure
failure mode — and drives the detector + ICP-verification pipeline
(backend/loop_closure.py, the same call sequence as
runtime/pose_graph_loop.maybe_update) over two laps of the closed
trajectory. Quantifies the false-positive rate: every accepted edge is
classified against the analytic ground truth.

The descriptor gate is deliberately loosened (min_similarity 0.45 vs the
0.90 default) so aliased candidates actually reach the geometric gate —
the property under test is that verify_loop_icp kills them.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from esvo_tpu.backend import loop_closure as lc
from esvo_tpu.io import esim

W, H, FX = 120, 90, 100.0
K = np.array([[FX, 0.0, W / 2 - 0.5],
              [0.0, FX, H / 2 - 0.5],
              [0.0, 0.0, 1.0]])
DUR = 16.0
LAPS = 2
N_KF = 40
N_PTS = 400


def aliased_scene():
    scene = esim.make_room_scene(np.random.default_rng(21))
    for f in ("tex_amp", "tex_freq", "tex_phase",
              "edge_amp", "edge_freq", "edge_phase"):
        a = getattr(scene, f)
        for p in (1, 2, 5):   # side + front walls copy the back wall
            a[p] = a[0]
    return scene


def orbit_pose(t):
    """Full-yaw orbit: the camera pans 360 deg per lap from near the room
    centre, so it faces each of the four IDENTICALLY-textured walls in
    turn — views a quarter-turn apart render near-identical texture on
    different walls (true perceptual aliasing), while the lap-2 revisit
    of the same yaw is the genuine loop. A small lap-periodic positional
    wobble gives ICP translational constraints."""
    yaw = 2 * np.pi * LAPS * t / DUR
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4)
    T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    # orbit centre (0, 0, 1.5): all four walls sit at a similar distance
    # (back/front 2.5 m, sides 2.0 m), so their shared texture renders at
    # a similar scale in every direction — maximal aliasing
    T[:3, 3] = [0.15 * np.sin(3 * yaw), 0.05 * np.cos(2 * yaw),
                0.15 * np.cos(3 * yaw) + 1.5]
    return T


def rel_gap(T_i, T_j):
    """(translation m, rotation rad) of the relative pose."""
    dT = np.linalg.inv(T_i) @ T_j
    ang = np.arccos(np.clip((np.trace(dT[:3, :3]) - 1) / 2, -1, 1))
    return float(np.linalg.norm(dT[:3, 3])), float(ang)


def render_keyframe(scene, T, rng):
    """(proxy time surface, semi-dense camera-frame cloud).

    A real time surface shows recently-active edges; the Sobel magnitude
    of the rendered log intensity is the analytic stand-in. The cloud
    back-projects the strongest-edge pixels through the analytic depth."""
    logI, depth = esim.render_log_intensity(
        scene, jnp.asarray(T, jnp.float32), jnp.asarray(K, jnp.float32),
        W, H)
    logI = np.asarray(logI)
    depth = np.asarray(depth)
    gx = np.abs(np.diff(logI, axis=1, prepend=logI[:, :1]))
    gy = np.abs(np.diff(logI, axis=0, prepend=logI[:1]))
    g = gx + gy
    ts = np.clip(g / (g.max() + 1e-9) * 255.0, 0, 255)
    ys, xs = np.unravel_index(np.argsort(g, axis=None)[::-1][:N_PTS],
                              g.shape)
    z = depth[ys, xs]
    p_cam = np.stack([(xs - K[0, 2]) / FX * z,
                      (ys - K[1, 2]) / FX * z, z], axis=1)
    p_cam += rng.normal(scale=0.004, size=p_cam.shape)  # ~sensor noise
    return jnp.asarray(ts, jnp.float32), p_cam


def test_aliasing_false_positive_rate():
    scene = aliased_scene()
    rng = np.random.default_rng(0)
    cfg = lc.LoopClosureConfig(min_similarity=0.45, min_gap=6)
    det = lc.LoopClosureDetector(cfg)

    times = np.linspace(0.0, DUR, N_KF, endpoint=False)
    kfs = []          # (t, T_gt, cloud)
    proposals = 0     # candidates clearing the descriptor gate
    accepted = []     # (t_i, t_j, T_edge)
    aliased_proposals = 0   # descriptor matches that are NOT revisits
    for t in times:
        T_gt = orbit_pose(t)
        ts, cloud = render_keyframe(scene, T_gt, rng)
        desc = lc.ts_descriptor(ts, cfg.desc_grid)
        cand, sim = det.query_descriptor(desc)
        if cand >= 0 and sim >= cfg.min_similarity and cand < len(kfs):
            proposals += 1
            t_c, T_c, cloud_c = kfs[cand]
            gt_t_gap, gt_r_gap = rel_gap(T_c, T_gt)
            if gt_t_gap > 0.25 or gt_r_gap > 0.35:
                aliased_proposals += 1
            # drifted current-pose estimate, as in the live system
            T_est = T_gt.copy()
            T_est[:3, 3] += rng.normal(scale=0.03, size=3)
            ok, T_edge, frac, mean_d, _ = lc.verify_loop_icp(
                jnp.asarray(cloud_c, jnp.float32),
                jnp.ones(len(cloud_c), bool),
                jnp.asarray(cloud, jnp.float32),
                jnp.ones(len(cloud), bool),
                T_c, T_est, cfg)
            if ok:
                accepted.append((t_c, t, T_c, T_gt, T_edge))
        det.add_descriptor(desc)
        kfs.append((t, T_gt, cloud))

    assert proposals >= 3, \
        f"aliasing scenario produced only {proposals} candidate loops"
    assert aliased_proposals >= 1, \
        "no aliased (wrong-place) proposal reached the geometric gate — " \
        "the scenario is not exercising perceptual aliasing"

    # classify accepted edges against analytic GT
    tp = fp = 0
    for (t_i, t_j, T_i, T_j, T_edge) in accepted:
        T_gt_rel = np.linalg.inv(T_i) @ T_j
        dT = np.linalg.inv(T_gt_rel) @ T_edge
        dt = np.linalg.norm(dT[:3, 3])
        ang = np.arccos(np.clip((np.trace(dT[:3, :3]) - 1) / 2, -1, 1))
        if dt <= 0.10 and ang <= 0.20:
            tp += 1
        else:
            fp += 1

    # the quantified robustness contract: the geometric gate admits at
    # least one genuine lap revisit and passes NO wrong-place edge
    assert tp >= 1, f"no true loop edges accepted ({len(accepted)} total)"
    assert fp == 0, f"{fp} false-positive loop edges accepted of " \
                    f"{len(accepted)} ({proposals} proposals, " \
                    f"{aliased_proposals} aliased)"
