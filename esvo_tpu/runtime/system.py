"""The ESVO system loop: time surfaces -> mapping <-> tracking.

Replaces the reference's ROS node graph (launch/system/*.launch): two
TimeSurface nodes, esvo_Mapping and esvo_Tracking exchanging messages and
tf lookups (SURVEY.md section 5). Here each stage is a jit-compiled device
program and the loop is a host-side scheduler:

- per sync tick (100 Hz): insert the tick's events into both per-pixel
  timestamp grids, render both surfaces (one fused device program);
- tracking (every tick while WORKING): register the local map to the new
  negative left surface, append the pose to the pose table
  (esvo_Tracking.cpp:79-200);
- mapping (every `tick_rate/mapping_rate` ticks): denoise + rectify the
  tick's left events, look up per-event virtual-view poses from the pose
  table (device-side replacement of the reference's st_map_ + tf buffer,
  esvo_Mapping.cpp:581-599,630-667), block-match, refine inverse depth,
  cull, push into the fusion window, rebuild the depth frame by
  propagating + fusing the whole window, clean, regularize
  (esvo_Mapping.cpp:261-431);
- state machine INITIALIZATION -> WORKING with SGM bootstrap and
  tracking-failure fallback (esvo_Mapping.cpp:194-247,433-492;
  esvo_Tracking.cpp:91-168).

Deviations (all documented):
- virtual-view poses are interpolated per event timestamp instead of
  quantized to 0.05 * slice steps (strictly more accurate; the reference
  quantizes only to bound tf lookups, esvo_Mapping.cpp:581-599);
- the fusion window lives on device as a fixed (F, N) ring buffer;
  CONST_POINTS/CONST_FRAMES strategies control how many slots are active.
"""
from __future__ import annotations

import enum
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from esvo_tpu.geometry.camera import StereoRig
from esvo_tpu.geometry.se3 import interpolate_pose_table, se3_inverse
from esvo_tpu.surface import time_surface as tsf
from esvo_tpu.mapping import block_matching as bm
from esvo_tpu.mapping import depth_refinement as dr
from esvo_tpu.mapping import fusion as fu
from esvo_tpu.mapping import initialization as init
from esvo_tpu.mapping.regularization import regularize
from esvo_tpu.tracking import registration as reg
from esvo_tpu.runtime.config import SystemConfig


def _pose_is_rigid(T: np.ndarray, tol: float = 0.05) -> bool:
    """Finite + near-orthonormal rotation with det ~ 1 (see
    record_pose's rejection rationale)."""
    if T.shape != (4, 4) or not np.isfinite(T).all():
        return False
    R = T[:3, :3]
    return (abs(float(np.linalg.det(R)) - 1.0) < tol
            and float(np.linalg.norm(R @ R.T - np.eye(3))) < tol)


class SystemStatus(enum.Enum):
    """Reference: /ESVO_SYSTEM_STATUS parameter (esvo_Mapping.cpp:131-132,
    README.md:109)."""
    INITIALIZATION = "INITIALIZATION"
    WORKING = "WORKING"
    TERMINATE = "TERMINATE"


def _lut_lookup(lut, y, x, H, W):
    from esvo_tpu.ops.interp import gather2d
    yi = jnp.clip(y, 0, H - 1)
    xi = jnp.clip(x, 0, W - 1)
    return jnp.stack([gather2d(lut[..., 0], yi, xi),
                      gather2d(lut[..., 1], yi, xi)], axis=-1)


def _tree_stack_slot(history, est, slot):
    return jax.tree.map(
        lambda h, e: h.at[slot].set(e.astype(h.dtype)), history, est)


class EsvoSystem:
    """Host-side orchestrator of the jitted pipeline stages."""

    def __init__(self, rig: StereoRig, config: SystemConfig | None = None,
                 pose_table_size: int = 1024, seed: int = 0,
                 emit_debug_maps: bool = False, mesh=None):
        """mesh: optional jax.sharding.Mesh (single axis). The mapping
        cycle's event axis then shards across the mesh: the depth-LM
        solve (the cycle's dominant cost) runs one shard per device with
        all-gathered estimates, and the time-surface scatter runs
        per-shard with a pmax merge — the TPU-native equivalent of the
        reference's NUM_THREAD_MAPPING=4 event striping
        (core/EventBM.cpp:299-315, core/DepthProblemSolver.cpp:28-90).
        Block matching stays replicated (its dense cost volume is
        image-bound, independent of the event count) and so does
        tracking (the reference's NUM_THREAD_TRACKING=1,
        tools/utils.h:34-36)."""
        self.rig = rig
        self.cfg = config or SystemConfig()
        self.mesh = mesh
        if mesh is not None:
            n_dev = mesh.size
            n = (config or SystemConfig()).mapping.process_event_num
            if n % n_dev != 0:
                raise ValueError(
                    f"process_event_num {n} must be divisible by the "
                    f"mesh size {n_dev} for event-axis sharding")
        self.H = rig.left.height
        self.W = rig.left.width
        self.dtype = rig.left.lut.dtype
        self.status = SystemStatus.INITIALIZATION
        # per-cycle debug-map rendering (reference publishMappingResults,
        # esvo_Mapping.cpp:868-907 + reprojection map,
        # RegProblemSolverLM.cpp:106-136)
        self.emit_debug_maps = emit_debug_maps

        m = self.cfg.mapping
        self.N = m.process_event_num
        if m.fusion_strategy == "CONST_POINTS":
            # keep frames until ~1.5x maxNumFusionPoints total
            # (esvo_Mapping.cpp:342-368)
            self.F = max(int(np.ceil(1.5 * m.max_fusion_points / self.N)), 2)
        else:
            self.F = m.max_fusion_frames
        self.pose_table_size = pose_table_size

        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)
        # per-K cache of fused roll programs (process_ticks)
        self._roll_programs: dict = {}
        # deferred mapping-cycle outputs (consumed at the next roll —
        # the reference's 20 Hz mapper publishes to the 100 Hz tracker
        # with the same one-cycle latency, launch/system/system_rpg.launch)
        self._pending_mapping = None
        self.reset()
        self._build_programs()

    def reconfigure(self, config: SystemConfig, reset: bool = True):
        """Runtime parameter update — the reference's dynamic_reconfigure
        handler, whose change callback triggers a full system reset
        (esvo_Mapping.cpp:806-866, cfg/DVS_MappingStereo.cfg). Rebuilds
        every jitted pipeline program for the new configuration.
        `reset=False` preserves the live state when the change is
        shape-compatible (same event budget and fusion window); shape
        changes force the reset regardless, since the device buffers
        must be rebuilt."""
        old_N, old_F = self.N, self.F
        self.cfg = config
        m = config.mapping
        self.N = m.process_event_num
        if m.fusion_strategy == "CONST_POINTS":
            self.F = max(int(np.ceil(1.5 * m.max_fusion_points / self.N)),
                         2)
        else:
            self.F = m.max_fusion_frames
        if self.mesh is not None and self.N % self.mesh.size != 0:
            raise ValueError(
                f"process_event_num {self.N} must be divisible by the "
                f"mesh size {self.mesh.size} for event-axis sharding")
        self._roll_programs = {}
        self._build_programs()
        if reset or self.N != old_N or self.F != old_F:
            self.reset()

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------
    def reset(self):
        """Full state reset (reference reset(),
        esvo_Mapping.cpp:764-804)."""
        H, W, dt = self.H, self.W, self.dtype
        self.ts_state_left = tsf.init_state(H, W)
        self.ts_state_right = tsf.init_state(H, W)
        self.grid = fu.empty_grid(H, W, dt)
        self.T_world_frame = np.eye(4)
        F, N = self.F, self.N
        zero = jnp.zeros
        self.history = dr.DepthEstimates(
            x=zero((F, N, 2), dt), inv_depth=-jnp.ones((F, N), dt),
            variance=zero((F, N), dt), scale2=zero((F, N), dt),
            nu=zero((F, N), dt), residual=zero((F, N), dt),
            age=zero((F, N), jnp.int32), p_cam=zero((F, N, 3), dt),
            T_world_cam=jnp.broadcast_to(jnp.eye(4, dtype=dt), (F, N, 4, 4)),
            valid=zero((F, N), bool))
        self._hist_slot = 0
        self._frames_filled = 0
        # pose table (host): reference tf buffer, 100 s window
        self.pose_times = [0.0]
        self.pose_list = [np.eye(4)]
        self.T_world_cur = np.eye(4)
        self.traj_times: list[float] = []
        self.traj_poses: list[np.ndarray] = []
        self.status = SystemStatus.INITIALIZATION
        self.last_tick_time: float | None = None
        self.last_mapping_time: float | None = None
        self.events_since_last_obs = 0
        self.stats = {"fusions": 0, "dropped": 0, "map_points": 0,
                      "low_event_ticks": 0, "pose_miss_skips": 0,
                      "tracking_rejects": 0, "bm": {}}
        self._consec_rejects = 0
        # REF_HISTORY (esvo_Tracking.cpp:279-292): ring of the most recent
        # map exports so tracking can fall back when a cycle collapses
        self._ref_maps: list[tuple] = []   # (pts, ok, n_points)
        self._map_pts = None
        self._map_ok = None
        # accumulated voxel-downsampled global cloud
        # (esvo_Mapping.cpp:909-978)
        self._global_voxels: dict = {}
        self._pending_mapping = None
        # observers (e.g. BackendLoop) watch this to drop state built in
        # the pre-reset world frame
        self.reset_count = getattr(self, "reset_count", 0) + 1

    def apply_world_correction(self, corr: np.ndarray) -> None:
        """Left-multiply EVERY world-frame quantity of the live state by
        the 4x4 `corr` (used by the BA backend to fold a refined-pose
        correction in). Correcting only T_world_cur would be undone at
        the next tick: the tracker registers against the ref-map points
        and the mapper interpolates the pose table, so all of them must
        move to the new frame together. Frame-local state (grid.p_cam,
        time surfaces) is untouched."""
        corr = np.asarray(corr, np.float64)
        R, tr = corr[:3, :3], corr[:3, 3]
        self.T_world_cur = corr @ self.T_world_cur
        self.T_world_frame = corr @ self.T_world_frame
        self.pose_list = [corr @ T for T in self.pose_list]
        self.traj_poses = [corr @ T for T in self.traj_poses]
        cj = jnp.asarray(corr, self.dtype)

        def move_pts(pts):
            return jnp.einsum("ij,...j->...i", cj[:3, :3], pts) + cj[:3, 3]

        self._ref_maps = [(move_pts(p), ok, n)
                          for (p, ok, n) in self._ref_maps]
        if self._map_pts is not None:
            self._map_pts = move_pts(self._map_pts)
        # history frames carry world poses per point
        self.history = self.history.replace(
            T_world_cam=jnp.einsum("ij,fnjk->fnik", cj,
                                   self.history.T_world_cam,
                                   precision="highest"))
        if self._pending_mapping is not None:
            self._pending_mapping["pts"] = move_pts(
                self._pending_mapping["pts"])
        if self._global_voxels:
            pts = np.stack(list(self._global_voxels.values()))
            pts = pts @ R.T + tr
            self._global_voxels = dict(
                zip(self._global_voxels.keys(), pts))
        # observers (e.g. a live ResidentLoop holding the authoritative
        # state on device) mirror the correction into their own state
        for cb in getattr(self, "_world_correction_observers", []):
            cb(corr)

    # ------------------------------------------------------------------
    # compiled programs
    # ------------------------------------------------------------------
    def _build_programs(self):
        cfg = self.cfg
        rig = self.rig
        H, W = self.H, self.W
        mesh = self.mesh

        if mesh is not None:
            from jax.sharding import PartitionSpec as PS
            from jax import shard_map
            from esvo_tpu.parallel.sharding import (EVENT_AXIS,
                                                    sharded_surface_update)
            n_dev = mesh.size

            def insert_fn(st, ev):
                # pad the frame capacity up to a mesh multiple (padded
                # lanes carry valid=False and are scatter no-ops)
                pad = (-ev.x.shape[0]) % n_dev
                if pad:
                    ev = jax.tree.map(
                        lambda a: jnp.pad(
                            a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)), ev)
                return sharded_surface_update(mesh, st, ev)

            def solve_fn(mx, T_wv, T_lv, d0, v, tt, tsl, tsr):
                """Depth-LM with the event axis sharded — the striped
                DepthProblemSolver pool (DepthProblemSolver.cpp:28-90)."""
                body = lambda *a: dr.solve(*a, rig, cfg.depth)
                return shard_map(
                    body, mesh=mesh,
                    in_specs=(PS(EVENT_AXIS),) * 6 + (PS(), PS()),
                    # prefix spec: every estimate leaf sharded on events
                    out_specs=PS(EVENT_AXIS), check_vma=False)(
                        mx, T_wv, T_lv, d0, v, tt, tsl, tsr)
        else:
            insert_fn = tsf.insert_events

            def solve_fn(mx, T_wv, T_lv, d0, v, tt, tsl, tsr):
                return dr.solve(mx, T_wv, T_lv, d0, v, tt, tsl, tsr,
                                rig, cfg.depth)

        self._insert_fn = insert_fn
        self._solve_fn = solve_fn

        @jax.jit
        def render_tick(st_l, st_r, ev_l, ev_r, t_sync):
            st_l = insert_fn(st_l, ev_l)
            st_r = insert_fn(st_r, ev_r)
            render = (tsf.render_backward if cfg.surface.mode == "backward"
                      else tsf.render_forward)
            s_l = render(st_l, t_sync, rig.left, cfg.surface)
            s_r = render(st_r, t_sync, rig.right, cfg.surface)
            return st_l, st_r, s_l, s_r

        self._render_tick = render_tick

        @jax.jit
        def sgm_seed(ts_l, ts_r, ev_x, ev_y, ev_valid, T_world_frame):
            ev_valid, ev_x, ev_y = self._compact(ev_valid, ev_x, ev_y)
            x_rect = _lut_lookup(rig.left.lut, ev_y, ev_x, H, W)
            est = init.sgm_depth_points(
                ts_l, ts_r, x_rect, ev_valid, T_world_frame, rig, cfg.sgm,
                cfg.mapping.inv_depth_min_range,
                cfg.mapping.inv_depth_max_range,
                init_age=cfg.mapping.age_vis_threshold)
            return est, jnp.sum(est.valid)

        self._sgm_seed = sgm_seed
        self._map_estimate = jax.jit(self._mapping_estimate_body)
        self._rebuild_frame = jax.jit(self._rebuild_frame_body)

        @jax.jit
        def seed_frame(history, T_world_frame):
            """Naive fusion for the SGM bootstrap
            (esvo_Mapping.cpp:482-491)."""
            flat = jax.tree.map(
                lambda a: a.reshape((-1,) + a.shape[2:]), history)
            grid = fu.empty_grid(H, W, self.dtype)
            T_frame_world = se3_inverse(T_world_frame)
            cand = fu.propagate_points(flat, T_frame_world, rig.left,
                                       cfg.fusion)
            grid = fu.naive_fuse_frame(grid, cand, rig.left, cfg.fusion)
            pts_world, occ = fu.grid_points_world(grid, T_world_frame)
            return grid, pts_world, occ

        self._seed_frame = seed_frame

        @jax.jit
        def track(ts_l, T_world_ref, T_world_cur, pts_world, pt_valid, key):
            # stochastic point selection (RegProblemLM.cpp:45-55)
            pts, ok = self._select_ref_points(pts_world, pt_valid, key)
            prob = reg.make_problem(T_world_ref.astype(self.dtype),
                                    T_world_cur.astype(self.dtype),
                                    pts, ok, ts_l, cfg.tracker)
            prob, T_est, rms = reg.solve(prob, rig.left, cfg.tracker)
            return T_est, rms, jnp.sum(ok)

        self._track = track

    # -- traceable pipeline bodies (shared by the jitted per-stage
    # programs above and the device-resident loop, runtime/resident.py) --
    def _compact(self, valid, *arrays):
        """Move the first N valid lanes to the front (stable), so the
        expensive batched stages run at fixed width N regardless of
        the frame capacity."""
        order = jnp.argsort(~valid, stable=True)[:self.N]
        return (valid[order],) + tuple(a[order] for a in arrays)

    def _mapping_estimate_body(self, ts_l, ts_r, ev_x, ev_y, ev_t,
                               ev_valid, pose_times, pose_tab,
                               T_world_frame):
        """One WORKING mapping cycle's estimate stage: denoise ->
        compact -> rectify -> per-event virtual-view poses -> BM ->
        depth LM -> culling (esvo_Mapping.cpp:261-340)."""
        cfg, rig, H, W = self.cfg, self.rig, self.H, self.W
        # denoising mask (esvo_Mapping.cpp:282-304)
        if cfg.mapping.denoising:
            mask = init.denoising_mask(ev_x, ev_y, ev_valid, H, W)
            ev_valid = init.select_denoised(
                ev_x, ev_y, ev_valid, mask, cfg.mapping.process_event_num)
        ev_valid, ev_x, ev_y, ev_t = self._compact(ev_valid, ev_x, ev_y,
                                                   ev_t)
        x_rect = _lut_lookup(rig.left.lut, ev_y, ev_x, H, W)
        # per-event virtual-view pose
        T_wv = interpolate_pose_table(pose_times, pose_tab,
                                      ev_t.astype(pose_tab.dtype))
        matches, bm_stats = bm.match_events_stats(
            ts_l, ts_r, x_rect, x_rect, ev_t, ev_valid, rig.left.mask,
            rig, cfg.bm)
        T_left_world = se3_inverse(T_world_frame)
        T_lv = jnp.einsum("ij,njk->nik", T_left_world, T_wv,
                          precision="highest")
        est = self._solve_fn(matches.x_left, T_wv, T_lv,
                             matches.inv_depth, matches.valid, ev_t,
                             ts_l, ts_r)
        est = dr.point_culling(
            est, cfg.mapping.std_var_vis_threshold,
            cfg.cost_vis_threshold, cfg.mapping.inv_depth_min_range,
            cfg.mapping.inv_depth_max_range)
        return est, jnp.sum(est.valid), bm_stats

    def _rebuild_frame_body(self, history, T_world_frame):
        """Propagate + fuse the whole history window into a fresh depth
        frame, clean, regularize (esvo_Mapping.cpp:342-394)."""
        cfg, rig, H, W = self.cfg, self.rig, self.H, self.W
        flat = jax.tree.map(
            lambda a: a.reshape((-1,) + a.shape[2:]), history)
        grid = fu.empty_grid(H, W, self.dtype)
        T_frame_world = se3_inverse(T_world_frame)
        cand = fu.propagate_points(flat, T_frame_world, rig.left,
                                   cfg.fusion)
        grid, nfused, ndrop = fu.fuse_frame(grid, cand, rig.left,
                                            cfg.fusion)
        grid = fu.clean_grid(
            grid, cfg.mapping.std_var_vis_threshold ** 2,
            cfg.mapping.age_vis_threshold,
            cfg.mapping.inv_depth_max_range,
            cfg.mapping.inv_depth_min_range)
        if cfg.mapping.regularization:
            grid = regularize(grid, cfg.regularizer)
        pts_world, occ = fu.grid_points_world(grid, T_world_frame)
        return grid, pts_world, occ, nfused, ndrop

    def _select_ref_points(self, pts_world, pt_valid, key):
        """Stochastic selection of <=M registration points from a map
        export (RegProblemLM.cpp:45-55). Returns (pts (M, 3), ok (M,))."""
        M = self.cfg.tracker.max_registration_points
        flat_pts = pts_world.reshape(-1, 3)
        flat_ok = pt_valid.reshape(-1)
        score = jax.random.uniform(key, flat_ok.shape) \
            + jnp.where(flat_ok, 0.0, 1e3)
        idx = jnp.argsort(score)[:M]
        return flat_pts[idx], flat_ok[idx]

    def _track_tick_body(self, st_l, st_r, evl, evr, ts, T_world_ref,
                         T_ref_world, p_ref, ok, T_cur):
        """One sync tick of the WORKING loop: insert events, render the
        left surface, register the (pre-selected, ref-frame) map points
        to it (esvo_Tracking.cpp:79-160). Returns
        (st_l, st_r, s_l, T_est, rms)."""
        cfg, rig, dt = self.cfg, self.rig, self.dtype
        insert = self._insert_fn
        render = (tsf.render_backward if cfg.surface.mode == "backward"
                  else tsf.render_forward)
        st_l = insert(st_l, evl)
        st_r = insert(st_r, evr)
        s_l = render(st_l, ts, rig.left, cfg.surface).astype(dt)
        T_ref_left = jnp.matmul(T_ref_world, T_cur.astype(dt),
                                precision="highest")
        neg, gu, gv = reg.negative_time_surface(
            s_l, cfg.tracker.kernel_size)
        prob = reg.RegProblem(
            R=T_ref_left[:3, :3], t=T_ref_left[:3, 3],
            T_world_ref=T_world_ref, points=p_ref,
            point_valid=ok, ts_negative=neg, grad_u=gu, grad_v=gv)
        prob, T_est, rms = reg.solve(prob, rig.left, cfg.tracker)
        return st_l, st_r, s_l, T_est, rms

    def _get_roll_programs(self, K: int):
        """Fused K-tick device programs (cached per K).

        The reference hides latency by pipelining ROS nodes at different
        rates (100 Hz TS + tracking, 20 Hz mapping,
        launch/system/system_rpg.launch:5-63). The TPU equivalent: fuse
        the K surface renders and the K chained tracking solves between
        two mapping cycles into ONE device program (lax.scan over ticks),
        donate the timestamp grids, and dispatch the mapping program
        asynchronously afterwards — the host never blocks on mapping
        results inside the roll loop (stats are consumed one roll later,
        matching the reference's publish latency).
        """
        if K in self._roll_programs:
            return self._roll_programs[K]
        cfg = self.cfg
        rig = self.rig
        insert = self._insert_fn
        render = (tsf.render_backward if cfg.surface.mode == "backward"
                  else tsf.render_forward)
        dt = self.dtype

        @partial(jax.jit, donate_argnums=(0, 1))
        def roll_render(st_l, st_r, ev_l, ev_r, t_syncs):
            """K ticks of surface updates; returns the final surfaces."""
            def step(carry, inp):
                st_l, st_r = carry
                evl, evr, ts = inp
                st_l = insert(st_l, evl)
                st_r = insert(st_r, evr)
                return (st_l, st_r), None

            (st_l, st_r), _ = jax.lax.scan(
                step, (st_l, st_r), (ev_l, ev_r, t_syncs))
            s_l = render(st_l, t_syncs[-1], rig.left, cfg.surface)
            s_r = render(st_r, t_syncs[-1], rig.right, cfg.surface)
            return st_l, st_r, s_l.astype(dt), s_r.astype(dt)

        @partial(jax.jit, donate_argnums=(0, 1))
        def roll_track(st_l, st_r, ev_l, ev_r, t_syncs, T_world_ref,
                       T_world_cur0, pts_world, pt_valid, key):
            """K ticks of surface update + chained tracking solves.

            The reference map is fixed across the roll (the mapper
            publishes at the roll boundary); point selection happens once
            per roll (the reference reshuffles per cycle,
            RegProblemLM.cpp:45-55 — the solver still rotates batches
            every LM round, so the deterministic-fold semantics are
            unchanged).
            """
            T_world_ref = T_world_ref.astype(dt)
            key, sub = jax.random.split(key)
            pts, ok = self._select_ref_points(pts_world, pt_valid, sub)
            # ref-frame coordinates once per roll (make_problem's einsum)
            Rwr = T_world_ref[:3, :3]
            twr = T_world_ref[:3, 3]
            p_ref = jnp.einsum("ji,nj->ni", Rwr, pts - twr)
            T_ref_world = se3_inverse(T_world_ref)

            def step(carry, inp):
                st_l, st_r, T_cur = carry
                evl, evr, ts = inp
                # the tracker only needs the LEFT surface per tick; the
                # right surface (and the stacked per-tick copies) are
                # rendered once from the final state after the scan
                st_l, st_r, _, T_est, rms = self._track_tick_body(
                    st_l, st_r, evl, evr, ts, T_world_ref, T_ref_world,
                    p_ref, ok, T_cur)
                return (st_l, st_r, T_est), (T_est, rms[-1])

            (st_l, st_r, _), (poses, rms) = jax.lax.scan(
                step, (st_l, st_r, T_world_cur0.astype(dt)),
                (ev_l, ev_r, t_syncs))
            s_l = render(st_l, t_syncs[-1], rig.left, cfg.surface).astype(dt)
            s_r = render(st_r, t_syncs[-1], rig.right,
                         cfg.surface).astype(dt)
            return (st_l, st_r, poses, rms, s_l, s_r, jnp.sum(ok))

        self._roll_programs[K] = (roll_render, roll_track)
        return self._roll_programs[K]

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------
    def _event_batch(self, ev: dict, i: int | None = None) -> tsf.EventBatch:
        pick = (lambda a: a) if i is None else (lambda a: a[i])
        return tsf.EventBatch.from_arrays(pick(ev["x"]), pick(ev["y"]),
                                          pick(ev["t"]), pick(ev["p"]),
                                          pick(ev["valid"]))

    def _pose_table(self):
        """Fixed-size (pose_table_size,) stamped-pose table: the most
        recent poses, padded by repeating the last entry with strictly
        increasing timestamps. Constant shape -> no recompiles as the
        buffer fills (queries past the end clamp to the latest pose)."""
        S = self.pose_table_size
        times = np.asarray(self.pose_times[-S:], np.float64)
        poses = np.asarray(self.pose_list[-S:])
        n = len(times)
        if n < S:
            pad_t = times[-1] + 1e-5 * np.arange(1, S - n + 1)
            times = np.concatenate([times, pad_t])
            poses = np.concatenate(
                [poses, np.repeat(poses[-1:], S - n, axis=0)])
        return (jnp.asarray(times, self.dtype),
                jnp.asarray(poses, self.dtype))

    def record_pose(self, t: float, T_world_cam: np.ndarray):
        """Feed a pose into the tf-equivalent buffer (GT poses in MVStereo
        mode, tracker poses in closed loop).

        Non-rigid/non-finite poses are REJECTED (previous pose kept,
        counted in stats): a diverged tracker step — possible when the
        solve runs on a stale fallback ref map after a map collapse —
        must not enter the pose table, where interpolation would smear it
        over every virtual view of the next mapping cycle (the
        reference's equivalent guard is resetRegProblem returning false,
        RegProblemSolverLM.cpp:45-57)."""
        T = np.asarray(T_world_cam)
        if not _pose_is_rigid(T):
            self.stats["tracking_rejects"] += 1
            return
        # velocity-plausibility guard (TrackingNodeConfig.max_speed_mps):
        # a rigid-but-teleporting solve must not enter the pose table
        # either. The allowance scales with time since the last ACCEPTED
        # pose so catch-up after rejected ticks passes. After
        # max_consecutive_rejects rejections in a row the guard
        # re-anchors to the incoming pose (with a warning): sustained
        # true motion above the bound would otherwise freeze the anchor
        # and reject every subsequent pose forever.
        if self.pose_times:
            dt_s = max(float(t) - self.pose_times[-1],
                       1.0 / self.cfg.tracking.tracking_rate_hz)
            dist = float(np.linalg.norm(T[:3, 3] - self.T_world_cur[:3, 3]))
            dR = self.T_world_cur[:3, :3].T @ T[:3, :3]
            ang = float(np.arccos(np.clip((np.trace(dR) - 1.0) / 2.0,
                                          -1.0, 1.0)))
            too_fast = (
                dist > self.cfg.tracking.max_speed_mps * dt_s + 0.01
                or ang > self.cfg.tracking.max_ang_speed_rps * dt_s + 0.02)
            if too_fast:
                self.stats["tracking_rejects"] += 1
                self._consec_rejects += 1
                limit = self.cfg.tracking.max_consecutive_rejects
                if self._consec_rejects < limit:
                    return
                import warnings
                warnings.warn(
                    f"velocity guard re-anchoring after "
                    f"{self._consec_rejects} consecutive rejections "
                    f"(sustained motion above "
                    f"{self.cfg.tracking.max_speed_mps} m/s?)")
        self._consec_rejects = 0
        self.pose_times.append(float(t))
        self.pose_list.append(T)
        self.T_world_cur = T

    def _push_history(self, est: dr.DepthEstimates):
        self.history = _tree_stack_slot(self.history, est, self._hist_slot)
        self._hist_slot = (self._hist_slot + 1) % self.F
        self._frames_filled = min(self._frames_filled + 1, self.F)

    def _push_ref_map(self, pts, ok, n_points: int):
        """Append a map export to the REF_HISTORY ring
        (esvo_Tracking.cpp:279-292 keeps REF_HISTORY_LENGTH=10 maps)."""
        self._ref_maps.append((pts, ok, n_points))
        R = self.cfg.tracking.ref_history_length
        if len(self._ref_maps) > R:
            self._ref_maps = self._ref_maps[-R:]

    def _current_ref_map(self):
        """Newest history map with enough points for registration, or
        None. A collapsed newest cycle falls back to an older map instead
        of dropping the system to INITIALIZATION immediately."""
        need = self.cfg.tracker.batch_size
        for pts, ok, n in reversed(self._ref_maps):
            if n >= need:
                return pts, ok, n
        return None

    def _accumulate_global_map(self, pts_world, occ, leaf: float = 0.01):
        """Voxel-downsampled global cloud accumulation (the reference's
        voxel-filtered pc_global_, esvo_Mapping.cpp:909-978). Host-side:
        one representative point per occupied voxel, newest wins."""
        p = np.asarray(pts_world).reshape(-1, 3)
        m = np.asarray(occ).reshape(-1)
        p = p[m]
        if len(p) == 0:
            return
        keys = np.floor(p / leaf).astype(np.int64)
        # pack 3x int into one key (21 bits each, offset to positive)
        k = ((keys[:, 0] + (1 << 20)) << 42) \
            + ((keys[:, 1] + (1 << 20)) << 21) + (keys[:, 2] + (1 << 20))
        self._global_voxels.update(zip(k.tolist(), p))

    def global_map(self) -> np.ndarray:
        """(M, 3) accumulated voxel-downsampled world point cloud."""
        if not self._global_voxels:
            return np.zeros((0, 3))
        return np.stack(list(self._global_voxels.values()))

    # ------------------------------------------------------------------
    # pipeline stages
    # ------------------------------------------------------------------
    def process_tick(self, t_sync: float, ev_left: dict, ev_right: dict,
                     gt_pose: np.ndarray | None = None,
                     do_mapping: bool | None = None):
        """One sync tick. ev_*: dicts from io.events.frame_events (single
        frame: arrays shaped (N,)). gt_pose: if given, the system runs in
        MVStereo mode (known poses, esvo_MVStereo.cpp) — tracking is
        bypassed.

        do_mapping: True/False forces a mapping cycle on/off this tick;
        None (default) schedules mapping from cfg.mapping.mapping_rate_hz
        (the reference's 20 Hz mapper vs 100 Hz tracker,
        cfg/mapping/mapping_rpg.yaml:21).

        Returns dict of per-tick outputs.
        """
        # timestamp-inconsistency watchdog (esvo_Mapping.cpp:611-628)
        if self.last_tick_time is not None:
            dt = t_sync - self.last_tick_time
            if dt < 0 or dt >= 0.5:
                self.reset()
        self.last_tick_time = t_sync
        if do_mapping is None:
            period = 1.0 / self.cfg.mapping.mapping_rate_hz
            do_mapping = (self.last_mapping_time is None
                          or t_sync - self.last_mapping_time
                          >= period - 1e-9)

        out = {"t": t_sync, "status": self.status.value}
        # a fused roll may have parked an async mapping cycle
        # (process_ticks consumes it one roll later); finalize it here so
        # switching roll -> tick (e.g. a short final roll) cannot drop
        # that cycle's map publish and stats
        fin = self._finalize_pending_mapping()
        if fin:
            out.update(fin)
        self.ts_state_left, self.ts_state_right, ts_l, ts_r = \
            self._render_tick(self.ts_state_left, self.ts_state_right,
                              self._event_batch(ev_left),
                              self._event_batch(ev_right),
                              jnp.asarray(t_sync, jnp.float32))
        ts_l = ts_l.astype(self.dtype)
        ts_r = ts_r.astype(self.dtype)
        out["ts_left"] = ts_l
        out["ts_right"] = ts_r
        self.events_since_last_obs = int(np.sum(ev_left["valid"]))
        # too few fresh events: log-and-continue guard
        # (RegProblemSolverLM.cpp:47-51 — "the system remains to work")
        if self.events_since_last_obs < self.cfg.tracker.min_num_events:
            self.stats["low_event_ticks"] += 1
            out["low_events"] = True

        ref = self._current_ref_map()
        if gt_pose is not None:
            self.record_pose(t_sync, gt_pose)
        elif self.status == SystemStatus.WORKING and ref is not None:
            # ---- tracking (esvo_Tracking.cpp:79-160) ----
            ref_pts, ref_ok, ref_n = ref
            self._key, sub = jax.random.split(self._key)
            T_est, rms, nsel = self._track(
                ts_l, jnp.asarray(self.T_world_frame, self.dtype),
                jnp.asarray(self.T_world_cur, self.dtype),
                ref_pts, ref_ok, sub)
            self.record_pose(t_sync, np.asarray(T_est, np.float64))
            rms = np.asarray(rms)  # (max_iteration,) per-round rms
            out["tracking_rms"] = rms
            # LM_statics analogue (RegProblemSolverLM.h:26-31)
            out["lm_stats"] = {
                "n_points": int(nsel),
                "n_iter": self.cfg.tracker.max_iteration,
                "rms": float(rms[-1])}

        self.traj_times.append(t_sync)
        self.traj_poses.append(self.T_world_cur.copy())

        if not do_mapping:
            return out

        T_wf = self.T_world_cur.copy()
        if self.status == SystemStatus.INITIALIZATION:
            self._sgm_bootstrap(t_sync, ts_l, ts_r, ev_left, T_wf, out)
        else:
            if self._dispatch_mapping(t_sync, ts_l, ts_r, ev_left, T_wf,
                                      gt_mode=gt_pose is not None, out=out):
                fin = self._finalize_pending_mapping()
                if fin:
                    out.update(fin)
        out["map_points"] = self.stats["map_points"]
        if self.emit_debug_maps:
            out["maps"] = self.render_debug_maps()
        return out

    def _sgm_bootstrap(self, t_sync, ts_l, ts_r, ev_left, T_wf, out):
        """SGM bootstrap cycle (esvo_Mapping.cpp:433-492). Synchronous:
        the bootstrap decision gates the state machine."""
        est, n = self._sgm_seed(ts_l, ts_r,
                                jnp.asarray(ev_left["x"]),
                                jnp.asarray(ev_left["y"]),
                                jnp.asarray(ev_left["valid"]),
                                jnp.asarray(T_wf, self.dtype))
        n = int(n)
        out["sgm_points"] = n
        if n >= self.cfg.mapping.init_sgm_num_threshold:
            self._push_history(est)
            self.T_world_frame = T_wf
            self.grid, self._map_pts, self._map_ok = \
                self._seed_frame(self.history,
                                 jnp.asarray(T_wf, self.dtype))
            self.stats["map_points"] = int(jnp.sum(self._map_ok))
            self._push_ref_map(self._map_pts, self._map_ok,
                               self.stats["map_points"])
            self.status = SystemStatus.WORKING
            self.last_mapping_time = t_sync

    def _dispatch_mapping(self, t_sync, ts_l, ts_r, ev_left, T_wf,
                          gt_mode: bool, out: dict) -> bool:
        """Dispatch one WORKING mapping cycle (esvo_Mapping.cpp:261-431)
        without blocking on its results: device handles are parked in
        `_pending_mapping` and converted by `_finalize_pending_mapping`
        (immediately in the sequential path; one roll later in
        process_ticks, matching the reference's mapper->tracker publish
        latency). Returns False when the pose guard skipped the cycle."""
        # pose availability guard (getPoseAt returns false -> the
        # mapper skips the cycle, esvo_Mapping.cpp:630-667): when the
        # pose table's window no longer covers the oldest event in
        # this frame, skip rather than clamp to a wrong pose.
        ev_t_arr = np.asarray(ev_left["t"])
        ev_ok_arr = np.asarray(ev_left["valid"])
        if ev_ok_arr.any() and len(self.pose_times) > 1:
            oldest_needed = float(ev_t_arr[ev_ok_arr].min())
            oldest_avail = self.pose_times[
                max(len(self.pose_times) - self.pose_table_size, 0)]
            if oldest_needed < oldest_avail - 1e-9:
                self.stats["pose_miss_skips"] += 1
                out["pose_miss_skip"] = True
                return False
        pt_t, pt_T = self._pose_table()
        est, n, bm_stats = self._map_estimate(
            ts_l, ts_r, jnp.asarray(ev_left["x"]),
            jnp.asarray(ev_left["y"]),
            jnp.asarray(ev_left["t"], self.dtype),
            jnp.asarray(ev_left["valid"]), pt_t, pt_T,
            jnp.asarray(T_wf, self.dtype))
        self._push_history(est)
        self.T_world_frame = T_wf
        self.grid, self._map_pts, self._map_ok, nf, nd = \
            self._rebuild_frame(self.history,
                                jnp.asarray(T_wf, self.dtype))
        self.last_mapping_time = t_sync
        self._pending_mapping = {
            "n": n, "bm_stats": bm_stats, "nf": nf, "nd": nd,
            "pts": self._map_pts, "ok": self._map_ok, "gt_mode": gt_mode}
        return True

    def _finalize_pending_mapping(self) -> dict | None:
        """Convert the parked mapping outputs to host stats, publish the
        map to the tracker's REF_HISTORY ring, and run the degrade
        check. Host-blocking — called just before the next roll uses the
        map (the reference's pointcloud_local subscriber sees the same
        one-cycle-old map, esvo_Tracking.cpp:279-292)."""
        p = self._pending_mapping
        if p is None:
            return None
        self._pending_mapping = None
        out = {"map_estimates": int(p["n"])}
        bm_stats = {k: int(v) for k, v in p["bm_stats"].items()}
        out["bm_stats"] = bm_stats
        self.stats["bm"] = {
            k: self.stats["bm"].get(k, 0) + v
            for k, v in bm_stats.items()}
        self.stats["fusions"] += int(p["nf"])
        self.stats["dropped"] += int(p["nd"])
        self.stats["map_points"] = int(jnp.sum(p["ok"]))
        self._push_ref_map(p["pts"], p["ok"], self.stats["map_points"])
        self._accumulate_global_map(p["pts"], p["ok"])
        # degrade to INITIALIZATION only when no history map can
        # support registration (esvo_Tracking.cpp:163-168,
        # RegProblemSolverLM.cpp:52-57 + REF_HISTORY fallback)
        if not p["gt_mode"] and self._current_ref_map() is None:
            self._degrade()
        out["map_points"] = self.stats["map_points"]
        return out

    def _degrade(self):
        """Drop to INITIALIZATION and invalidate the fusion history: its
        frames were built under the (now untrusted) pre-failure poses,
        and the next SGM bootstrap's seed_frame flattens ALL ring slots —
        stale frames must not contaminate the restart map (the reference
        fully clears state on re-initialization,
        esvo_Tracking.cpp:163-168)."""
        self.status = SystemStatus.INITIALIZATION
        self._frames_filled = 0
        self._hist_slot = 0
        self.history = self.history.replace(
            valid=jnp.zeros_like(self.history.valid))

    def process_ticks(self, t_syncs, ev_left: dict, ev_right: dict,
                      gt_poses=None, do_mapping: bool | None = None):
        """Process K consecutive sync ticks with fused device programs.

        The batched analogue of K process_tick calls (the reference's
        pipeline parallelism across ROS nodes,
        launch/system/system_rpg.launch:5-63): one roll program performs
        all K surface updates and (while WORKING) the K chained tracking
        solves; a scheduled mapping cycle on the final tick is dispatched
        asynchronously and its stats/map hand-off are consumed at the
        START of the next call — the tracker works against the previous
        cycle's map exactly like the reference's subscriber.

        Args:
          t_syncs: (K,) tick times.
          ev_left/ev_right: dicts of (K, N) framed event arrays
            (io.events.frame_events output).
          gt_poses: optional (K, 4, 4) ground-truth poses (MVStereo mode).
          do_mapping: force a mapping cycle on the last tick; None
            schedules from cfg.mapping.mapping_rate_hz.

        Returns a dict: final surfaces, (K, 4, 4) poses, tracking rms,
        plus the finalized stats of the *previous* roll's mapping cycle.
        """
        t_syncs = np.asarray(t_syncs, float)
        K = len(t_syncs)
        # timestamp watchdog across the roll: fall back to the sequential
        # path so the reset lands on the exact offending tick
        prev = ([self.last_tick_time] if self.last_tick_time is not None
                else [])
        dts = np.diff(np.concatenate([prev, t_syncs]))
        if len(dts) and ((dts < 0).any() or (dts >= 0.5).any()):
            # preserve the caller's mapping request: in roll semantics a
            # forced mapping cycle lands on the final tick
            per_tick = [
                self.process_tick(
                    float(t),
                    {k: v[i] for k, v in ev_left.items()},
                    {k: v[i] for k, v in ev_right.items()},
                    gt_pose=None if gt_poses is None else gt_poses[i],
                    do_mapping=(do_mapping if i == len(t_syncs) - 1
                                else (None if do_mapping is None
                                      else False)))
                for i, t in enumerate(t_syncs)]
            out = dict(per_tick[-1])
            out["per_tick"] = per_tick
            out["status"] = self.status.value
            return out

        out = {"t": float(t_syncs[-1]), "status": self.status.value}
        fin = self._finalize_pending_mapping()
        if fin:
            out.update(fin)
        if do_mapping is None:
            period = 1.0 / self.cfg.mapping.mapping_rate_hz
            do_mapping = (self.last_mapping_time is None
                          or t_syncs[-1] - self.last_mapping_time
                          >= period - 1e-9)

        roll_render, roll_track = self._get_roll_programs(K)
        evb_l = self._event_batch(ev_left)
        evb_r = self._event_batch(ev_right)
        t_dev = jnp.asarray(t_syncs, jnp.float32)
        ref = self._current_ref_map()

        n_valid = np.sum(np.asarray(ev_left["valid"]), axis=1)
        self.stats["low_event_ticks"] += int(
            (n_valid < self.cfg.tracker.min_num_events).sum())
        self.events_since_last_obs = int(n_valid[-1])

        if gt_poses is None and self.status == SystemStatus.WORKING \
                and ref is not None:
            self._key, sub = jax.random.split(self._key)
            (self.ts_state_left, self.ts_state_right, poses, rms, s_l,
             s_r, nsel) = roll_track(
                self.ts_state_left, self.ts_state_right, evb_l, evb_r,
                t_dev, jnp.asarray(self.T_world_frame, self.dtype),
                jnp.asarray(self.T_world_cur, self.dtype),
                ref[0], ref[1], sub)
            poses_np = np.asarray(poses, np.float64)
            for i, t in enumerate(t_syncs):
                self.record_pose(float(t), poses_np[i])
                self.traj_times.append(float(t))
                # T_world_cur is the record_pose-guarded pose: a rejected
                # (non-rigid) tracker step records the carried-over pose
                self.traj_poses.append(self.T_world_cur.copy())
            rms = np.asarray(rms)
            out["tracking_rms"] = rms
            out["lm_stats"] = {"n_points": int(nsel),
                               "n_iter": self.cfg.tracker.max_iteration,
                               "rms": float(rms[-1])}
            out["poses"] = poses_np
        else:
            (self.ts_state_left, self.ts_state_right, s_l, s_r) = \
                roll_render(self.ts_state_left, self.ts_state_right,
                            evb_l, evb_r, t_dev)
            for i, t in enumerate(t_syncs):
                if gt_poses is not None:
                    self.record_pose(float(t), np.asarray(gt_poses[i]))
                self.traj_times.append(float(t))
                self.traj_poses.append(self.T_world_cur.copy())
        self.last_tick_time = float(t_syncs[-1])
        out["ts_left"] = s_l
        out["ts_right"] = s_r

        if do_mapping:
            ev_last = {k: np.asarray(v)[-1] for k, v in ev_left.items()}
            T_wf = self.T_world_cur.copy()
            if self.status == SystemStatus.INITIALIZATION:
                self._sgm_bootstrap(float(t_syncs[-1]), s_l, s_r, ev_last,
                                    T_wf, out)
            else:
                self._dispatch_mapping(float(t_syncs[-1]), s_l, s_r,
                                       ev_last, T_wf,
                                       gt_mode=gt_poses is not None,
                                       out=out)
            if self.emit_debug_maps:
                # the grid is already rebuilt by the dispatch (only its
                # stats hand-off is deferred), so the rendered maps show
                # this roll's mapping cycle
                out["maps"] = self.render_debug_maps()
        out["map_points"] = self.stats["map_points"]
        return out

    def flush(self):
        """Finalize any pending asynchronous mapping cycle (call once
        after the last process_ticks of a run)."""
        return self._finalize_pending_mapping()

    # ------------------------------------------------------------------
    # outputs
    # ------------------------------------------------------------------
    def trajectory(self):
        return np.asarray(self.traj_times), np.asarray(self.traj_poses)

    def save_trajectory(self, path: str):
        """TUM export (esvo_Tracking.cpp:430-462)."""
        from esvo_tpu.eval.trajectory import save_tum
        t, T = self.trajectory()
        save_tum(path, t, T)

    def depth_map(self):
        """(inv_depth (H, W), valid (H, W)) of the current frame."""
        return (np.asarray(self.grid.inv_depth),
                np.asarray(self.grid.occupied))

    def save_depth_map(self, save_dir: str, t: float | None = None) -> str:
        """Per-cycle depth-map txt dump for offline paper comparisons
        (saveDepthMap, esvo_MVStereo.cpp:982-1000): one line
        ``x y z`` per valid point — the sub-pixel rectified coordinate
        and the depth in the frame's camera — in a file named by the
        timestamp in nanoseconds, matching the reference. Returns the
        written path."""
        import os
        os.makedirs(save_dir, exist_ok=True)
        if t is None:
            t = self.last_tick_time or 0.0
        path = os.path.join(save_dir, f"{int(round(t * 1e9))}.txt")
        occ = np.asarray(self.grid.occupied)
        x = np.asarray(self.grid.x)[occ]
        z = np.asarray(self.grid.p_cam)[occ][:, 2]
        np.savetxt(path, np.column_stack([x, z]), fmt="%.9g")
        return path

    def render_debug_maps(self) -> dict:
        """The reference's per-cycle debug images (publishMappingResults,
        esvo_Mapping.cpp:868-907): invDepth / stdVar / age / cost false-
        color maps, plus the tracker's reprojection overlay
        (RegProblemSolverLM.cpp:106-136). Returns (H, W, 3) uint8 arrays."""
        from esvo_tpu.utils import visualization as vis
        m = self.cfg.mapping
        occ = np.asarray(self.grid.occupied)
        maps = {
            "inv_depth": vis.plot_inv_depth_map(
                self.grid.inv_depth, occ, m.inv_depth_min_range,
                m.inv_depth_max_range),
            "std_var": vis.plot_std_var_map(
                self.grid.variance, occ, m.std_var_vis_threshold),
            "age": vis.plot_age_map(self.grid.age, occ, m.age_max_range),
            "cost": vis.plot_cost_map(
                self.grid.residual, occ, self.cfg.cost_vis_threshold),
        }
        ref = self._current_ref_map()
        if ref is not None:
            maps["reprojection"] = vis.plot_reprojection_map(
                np.asarray(ref[0]).reshape(-1, 3),
                np.asarray(ref[1]).reshape(-1),
                np.linalg.inv(self.T_world_cur),
                np.asarray(self.rig.left.params.P),
                self.H, self.W)
        return maps
