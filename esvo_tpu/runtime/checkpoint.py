"""Checkpoint / resume of the full system state.

The reference has no checkpointing (SURVEY.md section 5: only terminal
trajectory/depth dumps). For long sequences and preemptible fleets the
TPU build saves the complete system state — per-pixel timestamp grids,
depth-fusion window, current depth frame, pose table, trajectory, state
machine — and restores it exactly.

Format: a flat .npz archive plus a JSON sidecar for host-side scalars.
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

from esvo_tpu.mapping import depth_refinement as dr
from esvo_tpu.mapping import fusion as fu
from esvo_tpu.surface import time_surface as tsf
from esvo_tpu.runtime.system import EsvoSystem, SystemStatus

_FIELDS_TS = ["last_t_pos", "last_t_neg"]


def _flatten(system: EsvoSystem) -> dict:
    out = {}
    for name in _FIELDS_TS:
        out[f"ts_l/{name}"] = np.asarray(getattr(system.ts_state_left, name))
        out[f"ts_r/{name}"] = np.asarray(getattr(system.ts_state_right,
                                                 name))
    for name in ("inv_depth", "variance", "scale2", "nu", "residual",
                 "age", "x", "p_cam"):
        out[f"grid/{name}"] = np.asarray(getattr(system.grid, name))
    hist = system.history
    for name in ("x", "inv_depth", "variance", "scale2", "nu", "residual",
                 "age", "p_cam", "T_world_cam", "valid"):
        out[f"hist/{name}"] = np.asarray(getattr(hist, name))
    out["pose/times"] = np.asarray(system.pose_times)
    out["pose/list"] = np.asarray(system.pose_list)
    out["traj/times"] = np.asarray(system.traj_times)
    out["traj/poses"] = (np.asarray(system.traj_poses)
                         if system.traj_poses else np.zeros((0, 4, 4)))
    out["T_world_frame"] = np.asarray(system.T_world_frame)
    out["T_world_cur"] = np.asarray(system.T_world_cur)
    # accumulated global cloud (packed int64 voxel keys + positions)
    if system._global_voxels:
        out["gmap/keys"] = np.fromiter(system._global_voxels.keys(),
                                       np.int64)
        out["gmap/pts"] = np.stack(list(system._global_voxels.values()))
    else:
        out["gmap/keys"] = np.zeros((0,), np.int64)
        out["gmap/pts"] = np.zeros((0, 3))
    out["rng_key"] = np.asarray(system._key)
    return out


def _meta(system: EsvoSystem) -> dict:
    return {
        "status": system.status.value,
        "hist_slot": system._hist_slot,
        "frames_filled": system._frames_filled,
        "last_tick_time": system.last_tick_time,
        "last_mapping_time": system.last_mapping_time,
        "events_since_last_obs": system.events_since_last_obs,
        "stats": system.stats,
    }


def save_checkpoint(system: EsvoSystem, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    arrays = _flatten(system)
    np.savez_compressed(os.path.join(path, "state.npz"), **arrays)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(_meta(system), f)


def load_checkpoint(system: EsvoSystem, path: str) -> EsvoSystem:
    """Restore state in place (system must be built with the same rig and
    config shapes). Returns the system."""
    data = np.load(os.path.join(path, "state.npz"))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)

    dt = system.dtype
    system.ts_state_left = tsf.TimeSurfaceState(
        last_t_pos=jnp.asarray(data["ts_l/last_t_pos"]),
        last_t_neg=jnp.asarray(data["ts_l/last_t_neg"]))
    system.ts_state_right = tsf.TimeSurfaceState(
        last_t_pos=jnp.asarray(data["ts_r/last_t_pos"]),
        last_t_neg=jnp.asarray(data["ts_r/last_t_neg"]))
    system.grid = fu.DepthGrid(
        **{k: jnp.asarray(data[f"grid/{k}"], dt if k != "age" else jnp.int32)
           for k in ("inv_depth", "variance", "scale2", "nu", "residual",
                     "age", "x", "p_cam")})
    kinds = dict(age=jnp.int32, valid=bool)
    system.history = dr.DepthEstimates(
        **{k: jnp.asarray(data[f"hist/{k}"], kinds.get(k, dt))
           for k in ("x", "inv_depth", "variance", "scale2", "nu",
                     "residual", "age", "p_cam", "T_world_cam", "valid")})
    system.pose_times = list(np.asarray(data["pose/times"]))
    system.pose_list = list(np.asarray(data["pose/list"]))
    system.traj_times = list(np.asarray(data["traj/times"]))
    system.traj_poses = list(np.asarray(data["traj/poses"]))
    system.T_world_frame = np.asarray(data["T_world_frame"])
    system.T_world_cur = np.asarray(data["T_world_cur"])
    system.status = SystemStatus(meta["status"])
    system._hist_slot = int(meta["hist_slot"])
    system._frames_filled = int(meta["frames_filled"])
    system.last_tick_time = meta["last_tick_time"]
    system.last_mapping_time = meta.get("last_mapping_time")
    system.events_since_last_obs = int(
        meta.get("events_since_last_obs", 0))
    system.stats = meta["stats"]
    if "gmap/keys" in data:
        system._global_voxels = dict(
            zip(data["gmap/keys"].tolist(), data["gmap/pts"]))
    if "rng_key" in data:
        system._key = jnp.asarray(data["rng_key"])
    # rebuild the tracker's map-point cache (and its REF_HISTORY head)
    # from the restored frame
    if system.status == SystemStatus.WORKING:
        system.grid, system._map_pts, system._map_ok, _, _ = \
            system._rebuild_frame(system.history,
                                  jnp.asarray(system.T_world_frame, dt))
        system._ref_maps = []
        system._push_ref_map(system._map_pts, system._map_ok,
                             int(jnp.sum(system._map_ok)))
    return system
