"""Dataset loaders for the benchmark suites the reference evaluates on.

The reference consumes all data as ROS bags (README.md:86: rpg stereo DVS
bags, upenn/MVSEC bags, DSEC); ROS-free equivalents:

- rpg stereo DVS text exports: `events_left.txt`/`events_right.txt`
  (`t x y p` lines), `groundtruth.txt` (TUM `t x y z qx qy qz qw`),
  calib as ESVO-format left.yaml/right.yaml (geometry.camera.load_rig);
- MVSEC hdf5: /davis/{left,right}/events as (N, 4) [x, y, t, p] plus GT
  poses in the companion _gt.hdf5;
- DSEC hdf5: /events/{x,y,t,p} with t in microseconds offset by
  /t_offset.

Everything returns the framework's EventArray / NumPy pose tables.
"""
from __future__ import annotations

import os

import numpy as np

from esvo_tpu.io.events import EventArray


def load_rpg_dataset(path: str, max_events: int | None = None):
    """Load an rpg-format directory: events_left.txt / events_right.txt /
    groundtruth.txt. Returns (ev_left, ev_right, gt_times, gt_poses)."""
    from esvo_tpu.io.native import load_events_native
    ev_l = load_events_native(os.path.join(path, "events_left.txt"),
                              max_events)
    ev_r = load_events_native(os.path.join(path, "events_right.txt"),
                              max_events)
    gt_times, gt_poses = None, None
    gt_file = os.path.join(path, "groundtruth.txt")
    if os.path.exists(gt_file):
        from esvo_tpu.eval.trajectory import load_tum
        gt_times, gt_poses = load_tum(gt_file)
    return ev_l, ev_r, gt_times, gt_poses


def load_mvsec_events(h5_path: str, camera: str = "left",
                      max_events: int | None = None) -> EventArray:
    """MVSEC data hdf5: /davis/<cam>/events rows are [x, y, t, p(-1/1)]."""
    import h5py
    with h5py.File(h5_path, "r") as f:
        ds = f["davis"][camera]["events"]
        n = len(ds) if max_events is None else min(len(ds), max_events)
        ev = ds[:n]
    # MVSEC timestamps are absolute epoch seconds (~1.4e9): rebase so
    # downstream float32 framing keeps sub-ms resolution.
    return EventArray(t=ev[:, 2].astype(np.float64),
                      x=ev[:, 0].astype(np.int32),
                      y=ev[:, 1].astype(np.int32),
                      p=ev[:, 3] > 0).rebased()


def load_mvsec_gt_poses(gt_h5_path: str, camera: str = "left"):
    """MVSEC ground-truth hdf5: /davis/<cam>/pose (N, 4, 4) +
    pose_ts (N,). Returns (times, poses)."""
    import h5py
    with h5py.File(gt_h5_path, "r") as f:
        poses = np.asarray(f["davis"][camera]["pose"])
        times = np.asarray(f["davis"][camera]["pose_ts"])
    return times, poses


def load_dsec_events(h5_path: str,
                     max_events: int | None = None) -> EventArray:
    """DSEC event hdf5: /events/{x,y,t,p}, t in microseconds relative to
    /t_offset."""
    import h5py
    with h5py.File(h5_path, "r") as f:
        g = f["events"]
        n = len(g["t"]) if max_events is None else min(len(g["t"]),
                                                       max_events)
        t = g["t"][:n].astype(np.float64)
        if "t_offset" in f:
            t = t + float(np.asarray(f["t_offset"]))
        return EventArray(t=t * 1e-6,
                          x=g["x"][:n].astype(np.int32),
                          y=g["y"][:n].astype(np.int32),
                          p=g["p"][:n] > 0).rebased()
