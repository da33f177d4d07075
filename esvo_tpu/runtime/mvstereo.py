"""Multi-view stereo benchmark harness with known (GT) poses.

Re-designs the reference's ``esvo_MVStereo`` node
(esvo_core/src/esvo_MVStereo.cpp) — the mapper evaluation harness with its
5 selectable methods (esvo_core/include/esvo_core/esvo_MVStereo.h:43-50):

  0 PURE_EVENT_MATCHING  — temporal matching (GTS [26]) + naive fusion
  1 PURE_BLOCK_MATCHING  — BM + naive fusion
  2 EM_PLUS_ESTIMATION   — temporal matching + depth LM + fusion
  3 BM_PLUS_ESTIMATION   — BM + depth LM + fusion (= the ESVO mapper)
  4 PURE_SGM             — SGM [45] + edge mask + naive fusion

Mode dispatch mirrors MappingAtTime (esvo_MVStereo.cpp:239-550); the
match-pair -> depth-point conversion with pseudo variance 0 (bounded to
1e-6 by DepthPoint::boundVariance) matches vEMP2vDP
(esvo_MVStereo.cpp:1072-1094). Per-event virtual poses are interpolated at
event timestamps instead of per 1 ms slice medians
(eventSlicingForEM, esvo_MVStereo.cpp:1096-1125) — strictly finer.
"""
from __future__ import annotations

import enum

import numpy as np
import jax
import jax.numpy as jnp

from esvo_tpu.geometry.camera import StereoRig, cam_to_world
from esvo_tpu.geometry.se3 import interpolate_pose_table, se3_inverse
from esvo_tpu.surface import time_surface as tsf
from esvo_tpu.mapping import block_matching as bm
from esvo_tpu.mapping import depth_refinement as dr
from esvo_tpu.mapping import fusion as fu
from esvo_tpu.mapping import initialization as init
from esvo_tpu.mapping.event_matcher import (EventMatcherConfig,
                                            match_events_temporal)
from esvo_tpu.mapping.regularization import regularize
from esvo_tpu.runtime.config import SystemConfig
from esvo_tpu.runtime.system import EsvoSystem, _lut_lookup


class MVStereoMode(enum.IntEnum):
    """esvo_MVStereo.h:43-50."""
    PURE_EVENT_MATCHING = 0
    PURE_BLOCK_MATCHING = 1
    EM_PLUS_ESTIMATION = 2
    BM_PLUS_ESTIMATION = 3
    PURE_SGM = 4


def matches_to_estimates(matches: bm.EventMatches, T_world_virtual,
                         rig: StereoRig, age: int) -> dr.DepthEstimates:
    """EventMatchPair -> DepthPoint with pseudo variance
    (vEMP2vDP, esvo_MVStereo.cpp:1072-1094)."""
    n = matches.x_left.shape[0]
    dt = matches.x_left.dtype
    inv_d = matches.inv_depth
    p_cam = jax.vmap(lambda c, d: cam_to_world(rig.left.params.P, c, d))(
        matches.x_left, jnp.maximum(inv_d, 1e-6))
    var = jnp.full((n,), 1e-6, dt)    # var_pseudo 0 -> boundVariance 1e-6
    return dr.DepthEstimates(
        x=matches.x_left,
        inv_depth=jnp.where(matches.valid, inv_d, -1.0),
        variance=var, scale2=var, nu=jnp.full((n,), jnp.inf, dt),
        residual=matches.cost.astype(dt),
        age=jnp.full((n,), age, jnp.int32),
        p_cam=p_cam, T_world_cam=T_world_virtual, valid=matches.valid)


class MVStereoSystem(EsvoSystem):
    """EsvoSystem specialization: poses are given, mapping method selectable.

    Use process_tick(..., gt_pose=...) exactly as with EsvoSystem; the
    mapping path dispatches on `mode`.
    """

    def __init__(self, rig: StereoRig, mode: MVStereoMode,
                 config: SystemConfig | None = None,
                 em_config: EventMatcherConfig | None = None, **kw):
        self.mode = MVStereoMode(mode)
        self.em_cfg = em_config or EventMatcherConfig()
        super().__init__(rig, config, **kw)
        self._build_mv_programs()
        # ring of right events for temporal matching
        self._right_events = None

    def reconfigure(self, config: SystemConfig, reset: bool = True):
        """Runtime parameter update: rebuild the mode-specific programs
        too (the base class only rebuilds its own; stale closures would
        keep the old cfg/N — a shape change would then crash
        _push_history)."""
        super().reconfigure(config, reset=reset)
        self._build_mv_programs()

    def _build_mv_programs(self):
        cfg = self.cfg
        rig = self.rig
        H, W = self.H, self.W
        N = self.N

        @jax.jit
        def em_estimate(ts_l, ts_r, lx, ly, lt, lp, lvalid,
                        rx, ry, rt, rp, rvalid, pose_times, pose_tab,
                        T_world_frame):
            order = jnp.argsort(~lvalid, stable=True)[:N]
            lvalid, lx, ly, lt, lp = (lvalid[order], lx[order], ly[order],
                                      lt[order], lp[order])
            xl = _lut_lookup(rig.left.lut, ly, lx, H, W)
            xr = _lut_lookup(rig.right.lut, ry, rx, H, W)
            T_wv = interpolate_pose_table(pose_times, pose_tab,
                                          lt.astype(pose_tab.dtype))
            T_lw = se3_inverse(T_world_frame)
            T_lv = jnp.einsum("ij,njk->nik", T_lw, T_wv)
            matches = match_events_temporal(
                ts_l, ts_r, xl, lt, lp, lvalid, T_lv, xr,
                rt, rp, rvalid, rig, self.em_cfg)
            return matches, T_wv

        self._em_estimate = em_estimate

        @jax.jit
        def refine(matches, T_wv, ts_l, ts_r, T_world_frame):
            T_lw = se3_inverse(T_world_frame)
            T_lv = jnp.einsum("ij,njk->nik", T_lw, T_wv)
            est = dr.solve(matches.x_left, T_wv, T_lv, matches.inv_depth,
                           matches.valid, matches.t, ts_l, ts_r, rig,
                           cfg.depth)
            return dr.point_culling(
                est, cfg.mapping.std_var_vis_threshold,
                self.cfg.cost_vis_threshold,
                cfg.mapping.inv_depth_min_range,
                cfg.mapping.inv_depth_max_range)

        self._refine = refine

        @jax.jit
        def bm_match(ts_l, ts_r, ev_x, ev_y, ev_t, ev_valid,
                     pose_times, pose_tab):
            order = jnp.argsort(~ev_valid, stable=True)[:N]
            ev_valid, ev_x, ev_y, ev_t = (ev_valid[order], ev_x[order],
                                          ev_y[order], ev_t[order])
            x_rect = _lut_lookup(rig.left.lut, ev_y, ev_x, H, W)
            T_wv = interpolate_pose_table(pose_times, pose_tab,
                                          ev_t.astype(pose_tab.dtype))
            matches = bm.match_events(ts_l, ts_r, x_rect, x_rect, ev_t,
                                      ev_valid, rig.left.mask, rig, cfg.bm)
            return matches, T_wv

        self._bm_match = bm_match

        @jax.jit
        def to_estimates(matches, T_wv):
            return matches_to_estimates(matches, T_wv, rig,
                                        cfg.mapping.age_vis_threshold)

        self._to_estimates = to_estimates

        @jax.jit
        def naive_rebuild(history, T_world_frame):
            flat = jax.tree.map(
                lambda a: a.reshape((-1,) + a.shape[2:]), history)
            grid = fu.empty_grid(H, W, self.dtype)
            cand = fu.propagate_points(flat, se3_inverse(T_world_frame),
                                       rig.left, cfg.fusion)
            grid = fu.naive_fuse_frame(grid, cand, rig.left, cfg.fusion)
            pts_world, occ = fu.grid_points_world(grid, T_world_frame)
            return grid, pts_world, occ

        self._naive_rebuild = naive_rebuild

    def remember_right_events(self, ev_right: dict):
        self._right_events = ev_right

    def process_tick(self, t_sync, ev_left, ev_right, gt_pose=None,
                     do_mapping=True):
        assert gt_pose is not None, "MVStereo runs with known poses"
        self.remember_right_events(ev_right)
        mode = self.mode
        if mode in (MVStereoMode.BM_PLUS_ESTIMATION, MVStereoMode.PURE_SGM):
            if mode == MVStereoMode.PURE_SGM:
                # force the SGM path every mapping cycle
                self.status = type(self.status).INITIALIZATION
            return super().process_tick(t_sync, ev_left, ev_right,
                                        gt_pose=gt_pose,
                                        do_mapping=do_mapping)

        # modes 0/1/2 — custom dispatch. do_mapping=None keeps the base
        # class's rate scheduling (cfg.mapping.mapping_rate_hz), exactly
        # like modes 3/4 which forward the sentinel to super()
        if do_mapping is None:
            period = 1.0 / self.cfg.mapping.mapping_rate_hz
            do_mapping = (self.last_mapping_time is None
                          or t_sync - self.last_mapping_time
                          >= period - 1e-9)
        out = super().process_tick(t_sync, ev_left, ev_right,
                                   gt_pose=gt_pose, do_mapping=False)
        if not do_mapping:
            return out
        self.last_mapping_time = t_sync
        ts_l = out["ts_left"]
        ts_r = out["ts_right"]
        T_wf = np.asarray(gt_pose)
        pt_t, pt_T = self._pose_table()
        if mode == MVStereoMode.PURE_BLOCK_MATCHING:
            matches, T_wv = self._bm_match(
                ts_l, ts_r, jnp.asarray(ev_left["x"]),
                jnp.asarray(ev_left["y"]),
                jnp.asarray(ev_left["t"], self.dtype),
                jnp.asarray(ev_left["valid"]), pt_t, pt_T)
            est = self._to_estimates(matches, T_wv)
        else:   # EM-based
            r = self._right_events
            matches, T_wv = self._em_estimate(
                ts_l, ts_r, jnp.asarray(ev_left["x"]),
                jnp.asarray(ev_left["y"]),
                jnp.asarray(ev_left["t"], self.dtype),
                jnp.asarray(ev_left["p"]), jnp.asarray(ev_left["valid"]),
                jnp.asarray(r["x"]), jnp.asarray(r["y"]),
                jnp.asarray(r["t"], self.dtype), jnp.asarray(r["p"]),
                jnp.asarray(r["valid"]), pt_t, pt_T,
                jnp.asarray(T_wf, self.dtype))
            if mode == MVStereoMode.EM_PLUS_ESTIMATION:
                est = self._refine(matches, T_wv, ts_l, ts_r,
                                   jnp.asarray(T_wf, self.dtype))
            else:
                est = self._to_estimates(matches, T_wv)
        out["map_estimates"] = int(jnp.sum(est.valid))
        self._push_history(est)
        self.T_world_frame = T_wf
        if mode == MVStereoMode.EM_PLUS_ESTIMATION:
            self.grid, self._map_pts, self._map_ok, nf, nd = \
                self._rebuild_frame(self.history,
                                    jnp.asarray(T_wf, self.dtype))
        else:
            self.grid, self._map_pts, self._map_ok = \
                self._naive_rebuild(self.history,
                                    jnp.asarray(T_wf, self.dtype))
        self.stats["map_points"] = int(jnp.sum(self._map_ok))
        out["map_points"] = self.stats["map_points"]
        return out
