"""Full pipeline on a REAL calibration (upenn/MVSEC DAVIS346 rig).

The ideal-rig e2e tests bypass distortion entirely (identity LUTs); this
test drives the system with the reference's shipped upenn calibration —
equidistant (fisheye) distortion, non-identity rectification LUTs,
non-trivial valid-pixel masks — with synthetic events generated in RAW
sensor coordinates (rectified projections pushed back through the lens
model), exactly what a real sensor would produce.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from esvo_tpu.geometry.camera import load_rig, distort_points
from esvo_tpu.io.events import EventArray, frame_events
from esvo_tpu.io.synthetic import make_scene, interpolate_gt_pose
from esvo_tpu.runtime.system import EsvoSystem, SystemStatus
from tests.test_system import make_config, frame_at, gt_depth_check

REF_CALIB = "/root/reference/esvo_core/calib/upenn"
TICK = 0.01


def simulate_raw_events(scene, rig, pixel_threshold=0.75):
    """Like io.synthetic.simulate_stereo_events but emitting RAW pixel
    coordinates through each camera's distortion model."""
    import jax.numpy as jnp

    streams = {0: [], 1: []}
    cams = {0: rig.left, 1: rig.right}
    Ps = {0: np.asarray(rig.left.params.P),
          1: np.asarray(rig.right.params.P)}
    last_uv = {}
    T0 = np.linalg.inv(scene.traj_poses[0])
    for c in (0, 1):
        pc = scene.points @ T0[:3, :3].T + T0[:3, 3]
        h = pc @ Ps[c][:, :3].T + Ps[c][:, 3]
        last_uv[c] = h[:, :2] / h[:, 2:3]

    for i in range(1, len(scene.traj_times)):
        t0, t1 = scene.traj_times[i - 1], scene.traj_times[i]
        Tinv = np.linalg.inv(scene.traj_poses[i])
        pc = scene.points @ Tinv[:3, :3].T + Tinv[:3, 3]
        front = pc[:, 2] > 0.1
        for c in (0, 1):
            h = pc @ Ps[c][:, :3].T + Ps[c][:, 3]
            uv = h[:, :2] / h[:, 2:3]
            d = uv - last_uv[c]
            dist = np.hypot(d[:, 0], d[:, 1])
            nev = np.where(front,
                           np.minimum((dist / pixel_threshold).astype(int),
                                      6), 0)
            idx = np.nonzero(nev > 0)[0]
            if len(idx):
                # vectorized sample positions along each track: event e of
                # a track with n events sits at fraction (e+1)/n
                reps = nev[idx]
                j_rep = np.repeat(idx, reps)
                starts = np.cumsum(reps) - reps
                e_in = np.arange(reps.sum()) - np.repeat(starts, reps)
                a = (e_in + 1) / (np.repeat(reps, reps) + 1e-9)
                samples = last_uv[c][j_rep] + a[:, None] * d[j_rep]
                times = t0 + a * (t1 - t0)
                # rectified -> raw through the lens model; pad to a
                # power-of-two bucket so distort_points compiles a
                # handful of shapes instead of one per step
                n = len(samples)
                nb = 1 << (n - 1).bit_length()
                pad = np.zeros((nb - n, 2))
                raw = np.asarray(distort_points(
                    cams[c].params,
                    jnp.asarray(np.concatenate([samples, pad]),
                                jnp.float64)))[:n]
                W, H = cams[c].width, cams[c].height
                inb = ((raw[:, 0] >= 0) & (raw[:, 0] < W)
                       & (raw[:, 1] >= 0) & (raw[:, 1] < H))
                streams[c].append((times[inb],
                                   raw[inb].astype(np.int32)))
            moved = nev > 0
            last_uv[c][moved] = uv[moved]

    out = []
    for c in (0, 1):
        ts_ = np.concatenate([s[0] for s in streams[c]])
        xy = np.concatenate([s[1] for s in streams[c]])
        order = np.argsort(ts_, kind="stable")
        out.append(EventArray(
            t=ts_[order], x=xy[order, 0], y=xy[order, 1],
            p=np.ones(len(order), bool)))
    return out[0], out[1]


@pytest.mark.skipif(not os.path.isdir(REF_CALIB),
                    reason="reference calib not mounted")
def test_mapping_on_real_upenn_rig():
    rng = np.random.default_rng(21)
    rig = load_rig(REF_CALIB, dtype=jnp.float32)
    assert rig.left.params.model == "equidistant"
    # MVSEC indoor-ish scene scale (baseline 0.1 m, depth 1-3 m)
    scene = make_scene(rng, num_points=4000, duration=0.45, steps=46,
                       motion_scale=0.5)
    ev_l, ev_r = simulate_raw_events(scene, rig)
    assert len(ev_l) > 3000
    ticks = np.arange(TICK, 0.45, TICK)
    fl = frame_events(ev_l, ticks, 3000)
    fr = frame_events(ev_r, ticks, 3000)

    system = EsvoSystem(rig, make_config())
    for k in range(40):
        t = float(ticks[k])
        gt = interpolate_gt_pose(scene, t)
        system.process_tick(t, frame_at(fl, k), frame_at(fr, k),
                            gt_pose=gt, do_mapping=(k % 5 == 4))
    assert system.status == SystemStatus.WORKING
    med = gt_depth_check(system, scene, float(ticks[39]), rig, tol=0.2,
                         min_pts=150)
    print(f"upenn-rig median inverse-depth error: {med:.4f}")
