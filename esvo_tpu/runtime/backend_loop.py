"""Sliding-window bundle-adjustment layer over the runtime system.

A new capability beyond the reference (which has no backend — the
tracker's raw pose stream is the final trajectory): keyframes are sampled
from the mapper's depth frames, associated across views by voxel-hashed
world proximity (backend.keyframes), and a sliding window of recent
keyframes is refined with the Schur-complement BA (backend.bundle_adjustment).
The pose correction of the newest keyframe is folded back into the
system's current pose estimate, bounding tracker drift.

Usage:
    backend = BackendLoop(system, keyframe_every=5, window=6)
    ...
    out = system.process_tick(...)
    backend.maybe_update(out)     # after each mapping tick
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from esvo_tpu.backend.bundle_adjustment import BAConfig, bundle_adjust
from esvo_tpu.backend.keyframes import KeyframeGraph, build_ba_problem
from esvo_tpu.runtime.system import EsvoSystem, SystemStatus


class BackendLoop:
    def __init__(self, system: EsvoSystem, keyframe_every: int = 5,
                 window: int = 6, max_points_per_kf: int = 400,
                 ba_config: BAConfig | None = None,
                 voxel_size: float = 0.05, mesh=None):
        """mesh: optional jax.sharding.Mesh — BA then runs through
        parallel.sharding.sharded_bundle_adjust with the observation axis
        sharded across the mesh (psum-reduced Schur assembly)."""
        self.system = system
        self.mesh = mesh
        self._sharded_ba = None
        self.keyframe_every = keyframe_every
        self.window = window
        self.max_points_per_kf = max_points_per_kf
        # two fixed poses pin the SE(3) + scale gauge of the window
        self.ba_cfg = ba_config or BAConfig(max_iterations=8,
                                            num_fixed_poses=2)
        P = np.asarray(system.rig.left.params.P)
        self._intr = (float(P[0, 0]), float(P[1, 1]), float(P[0, 2]),
                      float(P[1, 2]))
        self.voxel_size = voxel_size
        self._mapping_cycles = 0
        self._last_kf_cycle = 0
        # sliding window of (time, T_world_kf, p_cam (frame-local), uv,
        # valid) — points are stored in keyframe-camera coordinates so a
        # refined pose automatically moves its points (a world-coordinate
        # copy would go stale the moment BA updates the pose)
        self._kfs: list[tuple] = []
        # jit keyed on the (now bucketed) problem shapes: without it
        # every window advance re-traced the LM scan
        import functools as _ft
        import jax as _jax
        from esvo_tpu.backend import bundle_adjustment as _ba
        self._ba_jit = _jax.jit(_ft.partial(_ba.bundle_adjust,
                                            cfg=self.ba_cfg))
        self.num_ba_runs = 0
        self.num_rejected_corrections = 0
        self.last_correction = np.eye(4)
        self._seen_reset = getattr(system, "reset_count", 0)
        # plausibility gate on the fold-back correction: between two BA
        # updates (a fraction of a second) genuine tracker drift is
        # millimetres/milliradians, so a large correction means the BA
        # solve itself diverged (bad associations off a collapsed map) —
        # folding it in would teleport the world frame and the error
        # COMPOUNDS across runs (observed: 93 ungated corrections moved
        # a +-1 m trajectory 1500 m). Reject instead of clamp: a diverged
        # solve carries no usable direction.
        self.max_correction_trans = 0.05   # m
        self.max_correction_rot = 0.05     # rad

    def _sample_keyframe(self):
        """Sample the current depth frame's best points + their pixels."""
        sys = self.system
        grid = sys.grid
        occ = np.asarray(grid.occupied)
        ys, xs = np.nonzero(occ)
        if len(ys) == 0:
            return None
        var = np.asarray(grid.variance)[ys, xs]
        order = np.argsort(var)[:self.max_points_per_kf]
        ys, xs = ys[order], xs[order]
        uv = np.asarray(grid.x)[ys, xs]                 # sub-pixel coords
        p_cam = np.asarray(grid.p_cam)[ys, xs]
        T = np.asarray(sys.T_world_frame)
        # FIXED-SHAPE keyframes (pad to capacity with valid=False): a
        # varying point count recompiles every downstream jitted program
        # (BA, ICP) on every call — each a multi-second remote compile
        # that dominated the r4 campaign wall (1.9 ticks/s end-to-end
        # while the loop alone ran orders of magnitude faster)
        cap = self.max_points_per_kf
        n = len(ys)
        ok = np.zeros(cap, bool)
        ok[:n] = True
        p_pad = np.zeros((cap, 3))
        p_pad[:n] = p_cam
        uv_pad = np.zeros((cap, 2))
        uv_pad[:n] = uv
        return (sys.last_tick_time, T, p_pad, uv_pad, ok)

    def maybe_update(self, tick_out: dict) -> dict | None:
        """Call after a mapping tick; runs BA when the window advances.
        Returns BA stats dict or None."""
        sys = self.system
        # a system reset re-zeroes the world frame: keyframes built in
        # the previous frame must not mix into the next BA window
        if getattr(sys, "reset_count", 0) != self._seen_reset:
            self._seen_reset = sys.reset_count
            self._last_kf_cycle = 0
            self._kfs = []
            self._mapping_cycles = 0
        # only a tick whose (finalized) mapping cycle actually ran counts
        # ("map_points" is set on EVERY tick; bm_stats/sgm_points only
        # appear when a cycle published)
        if sys.status != SystemStatus.WORKING \
                or not ("bm_stats" in tick_out or "sgm_points" in tick_out):
            return None
        # a device-resident dispatch covers several mapping cycles
        # (runtime/resident.py reports them in n_cycles); cadence is
        # counted in CYCLES, sampled at call granularity
        self._mapping_cycles += int(tick_out.get("n_cycles", 1))
        if self._mapping_cycles - self._last_kf_cycle < self.keyframe_every:
            return None
        self._last_kf_cycle = self._mapping_cycles
        kf = self._sample_keyframe()
        if kf is None:
            return None
        self._kfs.append(kf)
        if len(self._kfs) < 3:
            return None
        self._kfs = self._kfs[-self.window:]

        fx, fy, cx, cy = self._intr
        graph = KeyframeGraph(fx=fx, fy=fy, cx=cx, cy=cy,
                              voxel_size=self.voxel_size)
        for (t, T, p_cam, uv, ok) in self._kfs:
            pts_world = p_cam @ T[:3, :3].T + T[:3, 3]
            graph.add_keyframe(T, pts_world, uv, ok)
        if graph.multiview_fraction() < 0.1:
            return None
        prob = build_ba_problem(graph, max_points=2000)
        if self.mesh is not None:
            n_dev = self.mesh.size
            pad = (-prob.obs_kf.shape[0]) % n_dev
            if pad:
                prob = prob.replace(
                    obs_kf=jnp.pad(prob.obs_kf, (0, pad)),
                    obs_point=jnp.pad(prob.obs_point, (0, pad)),
                    obs_uv=jnp.pad(prob.obs_uv, ((0, pad), (0, 0))),
                    obs_valid=jnp.pad(prob.obs_valid, (0, pad)))
            if self._sharded_ba is None:
                from esvo_tpu.parallel.sharding import sharded_bundle_adjust
                self._sharded_ba = sharded_bundle_adjust(self.mesh,
                                                         self.ba_cfg)
            prob, costs = self._sharded_ba(prob)
        else:
            prob, costs = self._ba_jit(prob)
        self.num_ba_runs += 1

        # fold the newest keyframe's correction into the live state —
        # ALL of it (pose table, ref maps, history poses, global map):
        # correcting only T_world_cur would be undone by the next
        # tracking solve against uncorrected ref-map points
        T_old = self._kfs[-1][1]
        T_new = np.asarray(prob.T_world_kf[-1], np.float64)
        corr = T_new @ np.linalg.inv(T_old)
        c = np.asarray(costs)
        stats = {"ba_cost_initial": float(c[0]),
                 "ba_cost_final": float(c[-1]),
                 "num_keyframes": graph.num_keyframes,
                 "num_points": graph.num_points,
                 "multiview_fraction": graph.multiview_fraction()}
        if not self._accept_correction(corr, c):
            self.num_rejected_corrections += 1
            stats["ba_correction_rejected"] = True
            # drop the window: its associations produced a diverged
            # solve, and re-optimizing the same data would re-diverge
            self._kfs = self._kfs[-1:]
            return stats
        self.last_correction = corr
        sys.apply_world_correction(corr)
        # refresh stored keyframe poses with the refined ones (their
        # frame-local points follow automatically)
        self._kfs = [(t, np.asarray(Tk, np.float64), p_cam, uv, ok)
                     for (t, _, p_cam, uv, ok), Tk
                     in zip(self._kfs, np.asarray(prob.T_world_kf))]
        return stats

    def _accept_correction(self, corr: np.ndarray, costs: np.ndarray) \
            -> bool:
        """Plausibility gate (see __init__): finite, cost non-increasing,
        and within the drift bound a fraction-of-a-second window can
        physically accumulate."""
        if not np.isfinite(corr).all() or not np.isfinite(costs).all():
            return False
        if costs[-1] > costs[0]:
            return False
        dt = float(np.linalg.norm(corr[:3, 3]))
        ang = float(np.arccos(np.clip(
            (np.trace(corr[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)))
        return dt <= self.max_correction_trans \
            and ang <= self.max_correction_rot

    # -- checkpoint / resume (keyframes are ragged: concatenated + offsets)
    _CKPT_FILE = "backend_ba.npz"

    def save(self, path: str) -> None:
        """Write the BA-window state next to a system checkpoint."""
        import os
        K = len(self._kfs)
        pts = [k[2] for k in self._kfs] if K else [np.zeros((0, 3))]
        uvs = [k[3] for k in self._kfs] if K else [np.zeros((0, 2))]
        oks = [k[4] for k in self._kfs] if K else [np.zeros(0, bool)]
        np.savez_compressed(
            os.path.join(path, self._CKPT_FILE),
            times=np.asarray([k[0] for k in self._kfs]),
            poses=(np.stack([k[1] for k in self._kfs]) if K
                   else np.zeros((0, 4, 4))),
            pts=np.concatenate(pts), uvs=np.concatenate(uvs),
            oks=np.concatenate(oks),
            counts=np.asarray([len(p) for p in pts], np.int64)[:K],
            mapping_cycles=self._mapping_cycles,
            num_ba_runs=self.num_ba_runs,
            last_correction=self.last_correction)

    def load(self, path: str) -> bool:
        """Restore from a checkpoint dir; returns False if absent."""
        import os
        f = os.path.join(path, self._CKPT_FILE)
        if not os.path.exists(f):
            return False
        d = np.load(f)
        offs = np.concatenate([[0], np.cumsum(d["counts"])]).astype(int)
        self._kfs = [
            (float(d["times"][k]), d["poses"][k],
             d["pts"][offs[k]:offs[k + 1]],
             d["uvs"][offs[k]:offs[k + 1]],
             d["oks"][offs[k]:offs[k + 1]])
            for k in range(len(d["counts"]))]
        self._mapping_cycles = int(d["mapping_cycles"])
        self._last_kf_cycle = self._mapping_cycles
        self.num_ba_runs = int(d["num_ba_runs"])
        self.last_correction = d["last_correction"]
        self._seen_reset = getattr(self.system, "reset_count", 0)
        return True
