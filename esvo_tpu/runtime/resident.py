"""Device-resident closed loop: many mapping rolls per device dispatch.

The sequential `EsvoSystem.process_ticks` path dispatches 3+ device
programs per 5-tick roll (tracking roll, mapping estimate, frame rebuild)
and syncs poses/stats to the host between them. Over a remote-tunnel
backend the dispatch latency dominates: the r4 closed loop measured
9.5 ticks/s against the reference's 100 Hz laptop design point
(reference README.md:208-229) while the device compute itself summed to
~10 ms per roll.

This module folds the WHOLE WORKING-state loop into ONE jitted program:

    scan over R rolls:
        scan over K ticks:
            insert events -> render left surface -> tracking LM
            -> device-side pose guard -> pose-table shift-append
        mapping cycle on the roll's final tick:
            denoise -> BM -> depth LM -> cull -> history push
            -> window fusion rebuild -> ref-map publish (kept on device)

so the host dispatches once per R*K ticks and reads back only poses and
small counters. The pose table (the reference's tf buffer,
esvo_Mapping.cpp:630-667), the tracker's reference map
(esvo_Tracking.cpp:279-292) and the fusion window all live on device
between dispatches; state buffers are donated.

Semantics preserved vs the host-driven roll path:
- one-roll publish latency: the ref map rebuilt by roll r is first used
  by roll r+1's tracking (the reference's mapper->tracker pub/sub
  latency);
- the pose guard (rigidity + velocity plausibility + re-anchor
  recovery) mirrors EsvoSystem.record_pose exactly;
- a collapsed mapping cycle keeps the last good ref map (REF_HISTORY
  fallback); the host degrades to INITIALIZATION when
  `rolls_since_good` exceeds the ref-history length, matching
  esvo_Tracking.cpp:163-168.

The INITIALIZATION/bootstrap phase stays on the host path
(EsvoSystem._sgm_bootstrap): enter the resident loop once WORKING.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from esvo_tpu.geometry.se3 import se3_inverse
from esvo_tpu.surface import time_surface as tsf
from esvo_tpu.mapping import depth_refinement as dr  # noqa: F401 (typing)
from esvo_tpu.runtime.system import (EsvoSystem, SystemStatus,
                                     _tree_stack_slot)


@struct.dataclass
class ResidentState:
    """The complete device-side WORKING-loop state."""
    ts_left: tsf.TimeSurfaceState
    ts_right: tsf.TimeSurfaceState
    pose_times: jax.Array      # (S,) strictly increasing, newest last
    pose_tab: jax.Array        # (S, 4, 4)
    T_world_cur: jax.Array     # (4, 4)
    T_world_prev: jax.Array    # (4, 4) previous ACCEPTED pose (the
    #                            constant-velocity prior's anchor)
    T_world_frame: jax.Array   # (4, 4) frame of the current ref map
    history: object            # DepthEstimates (F, N, ...)
    hist_slot: jax.Array       # int32 scalar
    grid: object               # DepthGrid of the latest rebuilt frame
    ref_pts: jax.Array         # (H, W, 3) ref map in world coords
    ref_ok: jax.Array          # (H, W) bool
    rolls_since_good: jax.Array  # int32
    consec_rejects: jax.Array  # int32 (velocity-guard re-anchor counter)
    num_rejects: jax.Array     # int32 accumulated tracking rejections
    key: jax.Array             # PRNG key


def _det3(R):
    return (R[0, 0] * (R[1, 1] * R[2, 2] - R[1, 2] * R[2, 1])
            - R[0, 1] * (R[1, 0] * R[2, 2] - R[1, 2] * R[2, 0])
            + R[0, 2] * (R[1, 0] * R[2, 1] - R[1, 1] * R[2, 0]))


def _guard_append(T_est, T_cur, t_k, ptimes, ptab, consec, nrej, tr_cfg):
    """Device-side EsvoSystem.record_pose: rigidity + velocity
    plausibility with re-anchor recovery; on accept, shift-append into
    the fixed-size stamped-pose table. Returns
    (T_new, ptimes, ptab, consec, nrej, accepted)."""
    dt = T_est.dtype
    R = T_est[:3, :3]
    eye = jnp.eye(3, dtype=dt)
    finite = jnp.all(jnp.isfinite(T_est))
    RRt = jnp.matmul(R, R.T, precision="highest")
    rigid = (finite
             & (jnp.abs(_det3(R) - 1.0) < 0.05)
             & (jnp.sqrt(jnp.sum((RRt - eye) ** 2)) < 0.05))
    dt_s = jnp.maximum(t_k - ptimes[-1],
                       1.0 / tr_cfg.tracking_rate_hz).astype(dt)
    dist = jnp.linalg.norm(T_est[:3, 3] - T_cur[:3, 3])
    dR = jnp.matmul(T_cur[:3, :3].T, R, precision="highest")
    ang = jnp.arccos(jnp.clip((jnp.trace(dR) - 1.0) / 2.0, -1.0, 1.0))
    too_fast = ((dist > tr_cfg.max_speed_mps * dt_s + 0.01)
                | (ang > tr_cfg.max_ang_speed_rps * dt_s + 0.02))
    force = consec >= tr_cfg.max_consecutive_rejects
    accept = rigid & ((~too_fast) | force)
    consec = jnp.where(accept, 0,
                       jnp.where(rigid & too_fast, consec + 1, consec))
    nrej = nrej + jnp.int32(~accept)
    T_new = jnp.where(accept, T_est, T_cur)
    ptimes = jnp.where(
        accept, jnp.concatenate([ptimes[1:], t_k[None].astype(ptimes.dtype)]),
        ptimes)
    ptab = jnp.where(
        accept,
        jnp.concatenate([ptab[1:], T_new[None].astype(ptab.dtype)], axis=0),
        ptab)
    return T_new, ptimes, ptab, consec, nrej, accept


class ResidentLoop:
    """Owns the device-resident state while the system is WORKING.

    Usage:
        loop = ResidentLoop(system, ticks_per_roll=5, rolls_per_dispatch=10)
        loop.start()
        for batch in ...:
            out = loop.run(t_syncs, ev_left, ev_right)   # 1 dispatch
            loop.sync()          # fold outputs into host mirrors
        loop.finish()            # hand state back to the EsvoSystem

    `run` is fully asynchronous (returns device handles); `sync`
    converts pending outputs into the system's trajectory/stats and
    refreshes the host mirrors (grid, T_world_frame) that the BA /
    pose-graph layers read. World corrections applied through
    `EsvoSystem.apply_world_correction` while the loop is live are
    mirrored into the device state automatically (observer hook).
    """

    def __init__(self, system: EsvoSystem, ticks_per_roll: int,
                 rolls_per_dispatch: int, pose_table_size: int = 256):
        if system.mesh is not None:
            raise NotImplementedError(
                "resident loop currently targets a single chip; use the "
                "host roll path with mesh sharding")
        self.system = system
        self.K = int(ticks_per_roll)
        self.R = int(rolls_per_dispatch)
        self.S = int(pose_table_size)
        self.state: ResidentState | None = None
        self._pending: list = []
        self._program = self._build_program()
        self._correct = jax.jit(self._correct_body)
        self._started = False

    # ------------------------------------------------------------------
    def _build_program(self):
        system = self.system
        cfg = system.cfg
        rig = system.rig
        dt = system.dtype
        render = (tsf.render_backward if cfg.surface.mode == "backward"
                  else tsf.render_forward)
        tr_node = cfg.tracking

        @partial(jax.jit, donate_argnums=(0,))
        def run(state: ResidentState, ev_l, ev_r, t_syncs):
            """ev_l/ev_r: EventBatch with (R, K, C) leaves;
            t_syncs: (R, K) f32."""

            def one_roll(st: ResidentState, inp):
                evl, evr, ts = inp
                key, sub = jax.random.split(st.key)
                # stochastic registration-point selection once per roll
                pts, ok = system._select_ref_points(st.ref_pts, st.ref_ok,
                                                    sub)
                T_world_ref = st.T_world_frame.astype(dt)
                Rwr = T_world_ref[:3, :3]
                twr = T_world_ref[:3, 3]
                p_ref = jnp.einsum("ji,nj->ni", Rwr, pts - twr)
                T_ref_world = se3_inverse(T_world_ref)

                def tick(carry, tinp):
                    (ts_l, ts_r, T_cur, T_prev, ptimes, ptab, consec,
                     nrej) = carry
                    evl_k, evr_k, t_k = tinp
                    if tr_node.constant_velocity_prior:
                        # initial guess = last ACCEPTED step extrapolated
                        # once (left-delta); identity while frozen
                        step = jnp.matmul(T_cur, se3_inverse(T_prev),
                                          precision="highest")
                        guess = jnp.matmul(step, T_cur,
                                           precision="highest")
                    else:
                        guess = T_cur
                    ts_l, ts_r, _, T_est, rms = system._track_tick_body(
                        ts_l, ts_r, evl_k, evr_k, t_k, T_world_ref,
                        T_ref_world, p_ref, ok, guess)
                    (T_new, ptimes, ptab, consec, nrej,
                     accepted) = _guard_append(
                        T_est.astype(dt), T_cur, t_k, ptimes, ptab,
                        consec, nrej, tr_node)
                    T_prev = jnp.where(accepted, T_cur, T_prev)
                    return ((ts_l, ts_r, T_new, T_prev, ptimes, ptab,
                             consec, nrej), (T_new, rms[-1], accepted))

                carry0 = (st.ts_left, st.ts_right, st.T_world_cur,
                          st.T_world_prev, st.pose_times, st.pose_tab,
                          st.consec_rejects, st.num_rejects)
                (ts_l, ts_r, T_cur, T_prev, ptimes, ptab, consec,
                 nrej), (poses, rms, acc) = jax.lax.scan(
                    tick, carry0, (evl, evr, ts))

                # ---- mapping cycle on the roll's final tick ----
                s_l = render(ts_l, ts[-1], rig.left, cfg.surface).astype(dt)
                s_r = render(ts_r, ts[-1], rig.right,
                             cfg.surface).astype(dt)
                ev_last = jax.tree.map(lambda a: a[-1], evl)
                T_wf = T_cur.astype(dt)
                est, n_est, bm_stats = system._mapping_estimate_body(
                    s_l, s_r, ev_last.x, ev_last.y,
                    ev_last.t.astype(dt), ev_last.valid, ptimes, ptab,
                    T_wf)
                history = _tree_stack_slot(st.history, est, st.hist_slot)
                hist_slot = (st.hist_slot + 1) % system.F
                grid, pts_world, occ, nf, nd = system._rebuild_frame_body(
                    history, T_wf)
                n_pts = jnp.sum(occ)
                # ref-map publish: keep the last good map when this
                # cycle collapsed (REF_HISTORY fallback)
                good = n_pts >= cfg.tracker.batch_size
                st2 = st.replace(
                    ts_left=ts_l, ts_right=ts_r, pose_times=ptimes,
                    pose_tab=ptab, T_world_cur=T_cur,
                    T_world_prev=T_prev,
                    T_world_frame=jnp.where(good, T_wf, st.T_world_frame),
                    history=history, hist_slot=hist_slot, grid=grid,
                    ref_pts=jnp.where(good, pts_world, st.ref_pts),
                    ref_ok=jnp.where(good, occ, st.ref_ok),
                    rolls_since_good=jnp.where(
                        good, 0, st.rolls_since_good + 1),
                    consec_rejects=consec, num_rejects=nrej, key=key)
                out = {"poses": poses, "rms": rms, "accepted": acc,
                       "n_est": n_est, "map_points": n_pts, "nf": nf,
                       "nd": nd, "bm": bm_stats}
                return st2, out

            state, outs = jax.lax.scan(one_roll, state, (ev_l, ev_r,
                                                         t_syncs))
            s_l = render(state.ts_left, t_syncs[-1, -1], rig.left,
                         cfg.surface).astype(dt)
            return state, outs, s_l

        return run

    def _correct_body(self, state: ResidentState, corr):
        """Mirror EsvoSystem.apply_world_correction into the device
        state: left-multiply every world-frame quantity."""
        cj = jnp.asarray(corr, self.system.dtype)

        def mul(T):
            return jnp.matmul(cj, T, precision="highest")

        return state.replace(
            T_world_cur=mul(state.T_world_cur),
            T_world_prev=mul(state.T_world_prev),
            T_world_frame=mul(state.T_world_frame),
            pose_tab=jnp.einsum("ij,sjk->sik", cj, state.pose_tab,
                                precision="highest"),
            ref_pts=jnp.einsum("ij,hwj->hwi", cj[:3, :3], state.ref_pts,
                               precision="highest") + cj[:3, 3],
            history=state.history.replace(
                T_world_cam=jnp.einsum("ij,fnjk->fnik", cj,
                                       state.history.T_world_cam,
                                       precision="highest")))

    # ------------------------------------------------------------------
    def start(self):
        """Pack the system's host state into the device state. The
        system must be WORKING with a usable ref map."""
        system = self.system
        system.flush()
        if system.status != SystemStatus.WORKING:
            raise RuntimeError("resident loop requires WORKING status "
                               "(bootstrap on the host path first)")
        ref = system._current_ref_map()
        if ref is None:
            raise RuntimeError("no reference map available")
        dt = system.dtype
        S = self.S
        times = np.asarray(system.pose_times[-S:], np.float64)
        poses = np.asarray(system.pose_list[-S:])
        n = len(times)
        if n < S:
            # pad at the FRONT with the oldest pose at strictly
            # decreasing earlier times (the table shift-appends at the
            # back; interpolation clamps below the oldest entry)
            pad_t = times[0] - 1e-4 * np.arange(S - n, 0, -1)
            times = np.concatenate([pad_t, times])
            poses = np.concatenate(
                [np.repeat(poses[:1], S - n, axis=0), poses])
        ref_pts, ref_ok, _ = ref
        state = ResidentState(
            ts_left=system.ts_state_left,
            ts_right=system.ts_state_right,
            pose_times=jnp.asarray(times, dt),
            pose_tab=jnp.asarray(poses, dt),
            T_world_cur=jnp.asarray(system.T_world_cur, dt),
            T_world_prev=jnp.asarray(
                system.pose_list[-2] if len(system.pose_list) > 1
                else system.T_world_cur, dt),
            T_world_frame=jnp.asarray(system.T_world_frame, dt),
            history=system.history,
            hist_slot=jnp.asarray(system._hist_slot, jnp.int32),
            grid=system.grid,
            ref_pts=jnp.asarray(ref_pts, dt).reshape(system.H, system.W,
                                                     3),
            ref_ok=jnp.asarray(ref_ok, bool).reshape(system.H, system.W),
            rolls_since_good=jnp.asarray(0, jnp.int32),
            consec_rejects=jnp.asarray(system._consec_rejects, jnp.int32),
            num_rejects=jnp.asarray(0, jnp.int32),
            key=system._key)
        # deep-copy every leaf: the state is DONATED to the roll program,
        # and several leaves alias live system buffers (history, ref
        # maps, surfaces) that the host side must keep readable
        self.state = jax.tree.map(jnp.copy, state)
        system._key, _ = jax.random.split(system._key)
        obs = getattr(system, "_world_correction_observers", None)
        if obs is None:
            obs = system._world_correction_observers = []
        obs.append(self._on_world_correction)
        self._started = True

    def _on_world_correction(self, corr):
        if self.state is not None:
            self.state = self._correct(self.state, np.asarray(corr))

    # ------------------------------------------------------------------
    def run(self, t_syncs, ev_left: dict, ev_right: dict) -> dict:
        """Process R*K ticks in one device dispatch.

        t_syncs: (R*K,) tick times; ev_left/ev_right: dicts of framed
        event arrays with leading dim R*K (io.events.frame_events).
        Returns the raw device outputs (also queued for `sync`).
        """
        if not self._started:
            raise RuntimeError("call start() first")
        t_syncs = np.asarray(t_syncs, np.float64)
        RK = self.R * self.K
        if len(t_syncs) != RK:
            raise ValueError(f"expected {RK} ticks, got {len(t_syncs)}")
        # timestamp watchdog (esvo_Mapping.cpp:611-628): the resident
        # program has no reset path — the caller must drop to the host
        # loop across stream discontinuities
        prev = self.system.last_tick_time
        dts = np.diff(np.concatenate(
            [[prev] if prev is not None else [], t_syncs]))
        if len(dts) and ((dts < 0).any() or (dts >= 0.5).any()):
            raise RuntimeError("timestamp discontinuity: exit the "
                               "resident loop and reset on the host path")

        def batch(ev):
            b = tsf.EventBatch.from_arrays(ev["x"], ev["y"], ev["t"],
                                           ev["p"], ev.get("valid"))
            return jax.tree.map(
                lambda a: a.reshape((self.R, self.K) + a.shape[1:]), b)

        t_dev = jnp.asarray(t_syncs.reshape(self.R, self.K), jnp.float32)
        self.state, outs, s_l = self._program(self.state, batch(ev_left),
                                              batch(ev_right), t_dev)
        self.system.last_tick_time = float(t_syncs[-1])
        out = {"t_syncs": t_syncs, "outs": outs, "ts_left": s_l}
        self._pending.append(out)
        return out

    def sync(self) -> dict:
        """Convert pending dispatch outputs into host state: trajectory,
        stats, and the host mirrors (grid / T_world_frame /
        T_world_cur) the BA and pose-graph layers read. Returns a
        process_ticks-style summary dict for the LAST pending dispatch
        (empty if none)."""
        system = self.system
        summary: dict = {}
        for p in self._pending:
            outs = p["outs"]
            poses = np.asarray(outs["poses"], np.float64).reshape(-1, 4, 4)
            for i, t in enumerate(p["t_syncs"]):
                system.traj_times.append(float(t))
                system.traj_poses.append(poses[i])
            map_points = int(np.asarray(outs["map_points"])[-1])
            system.stats["map_points"] = map_points
            bm_sum = {k: int(np.asarray(v).sum())
                      for k, v in outs["bm"].items()}
            system.stats["bm"] = {
                k: system.stats["bm"].get(k, 0) + v
                for k, v in bm_sum.items()}
            system.stats["fusions"] += int(np.asarray(outs["nf"]).sum())
            system.stats["dropped"] += int(np.asarray(outs["nd"]).sum())
            summary = {
                "t": float(p["t_syncs"][-1]),
                "status": system.status.value,
                "n_cycles": self.R,
                "poses": poses,
                "map_points": map_points,
                "map_estimates": int(np.asarray(outs["n_est"])[-1]),
                "bm_stats": bm_sum,
                "tracking_rms": np.asarray(outs["rms"]).reshape(-1),
                "rolls_since_good": int(
                    np.asarray(self.state.rolls_since_good)),
                "ts_left": p["ts_left"],
            }
        self._pending = []
        if summary:
            st = self.state
            rejects = int(np.asarray(st.num_rejects))
            system.stats["tracking_rejects"] += rejects
            self.state = st.replace(
                num_rejects=jnp.zeros_like(st.num_rejects))
            system.T_world_cur = np.asarray(st.T_world_cur, np.float64)
            system.T_world_frame = np.asarray(st.T_world_frame,
                                              np.float64)
            # copy: the state grid is donated into the NEXT dispatch,
            # and host consumers (keyframe sampling, debug maps) must
            # stay readable after it
            system.grid = jax.tree.map(jnp.copy, st.grid)
            # degrade check: every recent cycle collapsed -> the host
            # must re-bootstrap (esvo_Tracking.cpp:163-168)
            if summary["rolls_since_good"] > \
                    system.cfg.tracking.ref_history_length:
                summary["degraded"] = True
        return summary

    def finish(self):
        """Drain outputs and hand the state back to the EsvoSystem so
        the host path (bootstrap, checkpointing, exports) can resume."""
        summary = self.sync()
        system = self.system
        st = self.state
        system.ts_state_left = st.ts_left
        system.ts_state_right = st.ts_right
        system.history = st.history
        system._hist_slot = int(np.asarray(st.hist_slot))
        system._frames_filled = system.F
        system.grid = st.grid
        system.T_world_cur = np.asarray(st.T_world_cur, np.float64)
        system.T_world_frame = np.asarray(st.T_world_frame, np.float64)
        system._consec_rejects = int(np.asarray(st.consec_rejects))
        # pose table: device ring back to host lists
        times = np.asarray(st.pose_times, np.float64)
        poses = np.asarray(st.pose_tab, np.float64)
        keep = times > (system.pose_times[-1] if system.pose_times
                        else -np.inf)
        system.pose_times.extend(times[keep].tolist())
        system.pose_list.extend(list(poses[keep]))
        # publish the final ref map into the host REF_HISTORY ring
        n_pts = int(np.asarray(jnp.sum(st.ref_ok)))
        system._map_pts = st.ref_pts
        system._map_ok = st.ref_ok
        system._push_ref_map(st.ref_pts, st.ref_ok, n_pts)
        system.stats["map_points"] = n_pts
        obs = getattr(system, "_world_correction_observers", [])
        if self._on_world_correction in obs:
            obs.remove(self._on_world_correction)
        self._started = False
        return summary
