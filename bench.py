"""Headline benchmark: events/sec through the full mapping pipeline.

Measures the per-chip throughput of the hot path — time-surface render +
stereo block matching + per-event inverse-depth LM + culling + window
fusion — on synthetic 240x180 (DAVIS240C geometry, the rpg benchmark
sensor) event data, with a per-stage breakdown (ts/bm/solve/fuse) and a
DSEC-scale (640x480, D=151, 8192 events) cycle time.

Baseline: reference ESVO's mapper processes PROCESS_EVENT_NUM=1000 events
per cycle at 20 Hz on a 6-thread i7-8750H (cfg/mapping/mapping_rpg.yaml:18,
:21) => 20,000 events/s for the same pipeline stages. The DSEC budget is
the 20 Hz mapping period: 50 ms/cycle (cfg/mapping/mapping_dsec.yaml).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "stages"}.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_EVENTS_PER_SEC = 20_000.0


def make_world(W, H, N, disp, rng):
    from esvo_tpu.geometry.camera import make_ideal_rig
    rig = make_ideal_rig(W, H, 200.0, 200.0, W / 2 - 0.5, H / 2 - 0.5,
                         0.1, dtype=jnp.float32)
    base = rng.uniform(0, 255, size=(H, W + 64)).astype(np.float32)
    k = np.ones(5) / 5
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    ts_l = jnp.asarray(base[:, 32:32 + W])
    ts_r = jnp.asarray(base[:, 32 + disp:32 + disp + W])
    ev_x = jnp.asarray(rng.integers(20, W - 20, N), jnp.int32)
    ev_y = jnp.asarray(rng.integers(10, H - 10, N), jnp.int32)
    ev_t = jnp.asarray(np.sort(rng.uniform(0.0, 0.01, N)), jnp.float32)
    ev_p = jnp.asarray(rng.random(N) > 0.5)
    return rig, ts_l, ts_r, ev_x, ev_y, ev_t, ev_p


def time_fn(fn, args, sync, reps):
    out = fn(*args)
    jax.block_until_ready(sync(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(sync(out))
    return (time.perf_counter() - t0) / reps, out


def build_cycle(rig, W, H, N, F, bm_cfg, dp_cfg, fu_cfg, surf_cfg, ts_tex_l,
                ts_tex_r):
    """Full mapping cycle (TS tick + BM + depth LM + cull + fuse) plus the
    individual stage programs for the breakdown."""
    from esvo_tpu.geometry.se3 import interpolate_pose_table
    from esvo_tpu.surface import time_surface as tsf
    from esvo_tpu.mapping import block_matching as bm
    from esvo_tpu.mapping import depth_refinement as dr
    from esvo_tpu.mapping import fusion as fu

    pose_t = jnp.asarray(np.linspace(-0.05, 0.05, 32), jnp.float32)
    pose_T = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (32, 4, 4))

    def stage_ts(ts_state, ev_x, ev_y, ev_t, ev_p, ev_valid):
        batch = tsf.EventBatch(x=ev_x, y=ev_y, t=ev_t, p=ev_p,
                               valid=ev_valid)
        ts_state = tsf.insert_events(ts_state, batch)
        surf = tsf.render_backward(ts_state, ev_t[-1], rig.left, surf_cfg)
        return ts_state, 0.5 * (surf + ts_tex_l)

    def stage_bm(ts_l, ev_x, ev_y, ev_t, ev_valid):
        x_rect = rig.left.lut[ev_y, ev_x]
        return bm.match_events(ts_l, ts_tex_r, x_rect, x_rect, ev_t,
                               ev_valid, rig.left.mask, rig, bm_cfg)

    def stage_solve(ts_l, matches, ev_t):
        T_wv = interpolate_pose_table(pose_t, pose_T, ev_t)
        est = dr.solve(matches.x_left, T_wv, T_wv, matches.inv_depth,
                       matches.valid, ev_t, ts_l, ts_tex_r, rig, dp_cfg)
        return dr.point_culling(est, 0.03, 20.0 ** 2 * dp_cfg.patch_area,
                                0.2, 2.0)

    def stage_fuse(history, slot, est):
        history = jax.tree.map(lambda h, e: h.at[slot].set(e), history, est)
        flat = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]),
                            history)
        grid = fu.empty_grid(H, W, jnp.float32)
        cand = fu.propagate_points(flat, jnp.eye(4, dtype=jnp.float32),
                                   rig.left, fu_cfg)
        grid, nfused, _ = fu.fuse_frame(grid, cand, rig.left, fu_cfg)
        return history, grid.inv_depth, nfused

    def cycle(ts_state, history, slot, ev_x, ev_y, ev_t, ev_p, ev_valid):
        ts_state, ts_l = stage_ts(ts_state, ev_x, ev_y, ev_t, ev_p, ev_valid)
        matches = stage_bm(ts_l, ev_x, ev_y, ev_t, ev_valid)
        est = stage_solve(ts_l, matches, ev_t)
        history, inv_d, nfused = stage_fuse(history, slot, est)
        return ts_state, history, inv_d, nfused

    def empty_history(dr):
        zeros = jnp.zeros
        return dr.DepthEstimates(
            x=zeros((F, N, 2), jnp.float32),
            inv_depth=-jnp.ones((F, N), jnp.float32),
            variance=zeros((F, N), jnp.float32),
            scale2=zeros((F, N), jnp.float32),
            nu=zeros((F, N), jnp.float32),
            residual=zeros((F, N), jnp.float32),
            age=zeros((F, N), jnp.int32),
            p_cam=zeros((F, N, 3), jnp.float32),
            T_world_cam=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                         (F, N, 4, 4)),
            valid=zeros((F, N), bool))

    return cycle, stage_ts, stage_bm, stage_solve, stage_fuse, empty_history


def bench_pipeline(W, H, N, disp, bm_cfg, dp_cfg, reps, rng):
    from esvo_tpu.surface import time_surface as tsf
    from esvo_tpu.mapping import depth_refinement as dr
    from esvo_tpu.mapping import fusion as fu

    rig, ts_l_tex, ts_r_tex, ev_x, ev_y, ev_t, ev_p = \
        make_world(W, H, N, disp, rng)
    F = 4
    surf_cfg = tsf.TimeSurfaceConfig()
    ev_valid = jnp.ones(N, bool)
    ts_state = tsf.init_state(H, W)

    # --- pick the faster fusion slot-assignment strategy on THIS device
    # (bitwise-identical results; see mapping/fusion._assign_slots) ---
    fuse_times = {}
    stage_cache = {}
    for strat in ("sort", "scatter_min"):
        fu_cfg = fu.FusionConfig(slot_strategy=strat)
        stages = build_cycle(rig, W, H, N, F, bm_cfg, dp_cfg, fu_cfg,
                             surf_cfg, ts_l_tex, ts_r_tex)
        stage_cache[strat] = (fu_cfg, stages)
        history = stages[5](dr)
        est0 = jax.tree.map(
            lambda a: a[0], history)  # empty estimates, right shapes
        t_f, _ = time_fn(jax.jit(stages[4]), (history, 0, est0),
                         lambda o: o[2], max(reps // 2, 3))
        fuse_times[strat] = t_f
    best = min(fuse_times, key=fuse_times.get)
    fu_cfg, (cycle, stage_ts, stage_bm, stage_solve, stage_fuse,
             empty_history) = stage_cache[best]
    history = empty_history(dr)

    # --- stage breakdown (each stage as its own program) ---
    jts = jax.jit(stage_ts)
    t_ts, (ts_state2, ts_l) = time_fn(
        jts, (ts_state, ev_x, ev_y, ev_t, ev_p, ev_valid),
        lambda o: o[1], reps)
    jbm = jax.jit(stage_bm)
    t_bm, matches = time_fn(jbm, (ts_l, ev_x, ev_y, ev_t, ev_valid),
                            lambda o: o.inv_depth, reps)
    jsolve = jax.jit(stage_solve)
    t_solve, est = time_fn(jsolve, (ts_l, matches, ev_t),
                           lambda o: o.inv_depth, reps)
    jfuse = jax.jit(stage_fuse)
    t_fuse, _ = time_fn(jfuse, (history, 0, est), lambda o: o[2], reps)

    # --- fused full cycle (throughput metric) ---
    cycle_jit = jax.jit(cycle)
    out = cycle_jit(ts_state, history, 0, ev_x, ev_y, ev_t, ev_p, ev_valid)
    jax.block_until_ready(out[3])
    t0 = time.perf_counter()
    for r in range(reps):
        out = cycle_jit(out[0], out[1], (r + 1) % F, ev_x, ev_y, ev_t,
                        ev_p, ev_valid)
    jax.block_until_ready(out[3])
    t_cycle = (time.perf_counter() - t0) / reps

    return {
        "ts_ms": round(t_ts * 1e3, 3),
        "bm_ms": round(t_bm * 1e3, 3),
        "solve_ms": round(t_solve * 1e3, 3),
        "fuse_ms": round(t_fuse * 1e3, 3),
        "cycle_ms": round(t_cycle * 1e3, 3),
        "fuse_strategy": best,
        "fuse_ab_ms": {k: round(v * 1e3, 3)
                       for k, v in fuse_times.items()},
    }


def main():
    from esvo_tpu.mapping import block_matching as bm
    from esvo_tpu.mapping import depth_refinement as dr

    rng = np.random.default_rng(0)

    # rpg scale: 240x180, 4096 events/cycle
    rpg = bench_pipeline(
        240, 180, 4096, 8, bm.BlockMatchConfig(),
        dr.DepthProblemConfig(max_iteration=8), reps=20, rng=rng)
    events_per_sec = 4096 / (rpg["cycle_ms"] * 1e-3)

    # DSEC scale: 640x480, disparity range 151, 8192 events
    # (cfg/mapping/mapping_dsec.yaml: PROCESS_EVENT_NUM=10000, disp 0-150)
    dsec = bench_pipeline(
        640, 480, 8192, 24,
        bm.BlockMatchConfig(min_disparity=0, max_disparity=150),
        dr.DepthProblemConfig(max_iteration=8), reps=10, rng=rng)

    print(json.dumps({
        "metric": "mapping_pipeline_events_per_sec",
        "value": round(events_per_sec, 1),
        "unit": "events/s",
        "vs_baseline": round(events_per_sec / BASELINE_EVENTS_PER_SEC, 3),
        "stages": {"rpg_240x180_n4096": rpg,
                   "dsec_640x480_n8192": dsec},
    }))


def _device_alive(timeout_s: float = 180.0) -> bool:
    """Probe the backend with a watchdog: during a tunnel outage the
    first device op hangs forever rather than erroring, which would
    leave the driver with no JSON line at all."""
    import threading
    ok = []

    def probe():
        try:
            jax.block_until_ready(jnp.ones(8).sum())
            ok.append(True)
        except Exception:
            pass

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    return bool(ok)


if __name__ == "__main__":
    if not _device_alive():
        print(json.dumps({
            "metric": "mapping_events_per_sec", "value": 0,
            "unit": "events/s", "vs_baseline": 0.0,
            "error": "device backend unreachable (tunnel outage); "
                     "last recorded: 336k ev/s (16.8x), see README"}))
        raise SystemExit(0)
    main()
