"""Headline benchmark: events/sec through the full mapping pipeline.

Measures the per-chip throughput of the hot path — time-surface render +
stereo block matching + per-event inverse-depth LM + culling + window
fusion — on synthetic 240x180 (DAVIS240C geometry, the rpg benchmark
sensor) event data, with a per-stage breakdown (ts/bm/solve/fuse), a
DSEC-scale (640x480, D=151, 8192 events) cycle time, an XLA-cost-model
roofline per stage (FLOPs / HBM bytes vs chip peaks), and a closed-loop
system metric (ticks/s + ATE of the fused process_ticks roll on a
synthetic scene, vs the reference's 100 Hz design point, README.md:221-226).

Baseline: reference ESVO's mapper processes PROCESS_EVENT_NUM=1000 events
per cycle at 20 Hz on a 6-thread i7-8750H (cfg/mapping/mapping_rpg.yaml:18,
:21) => 20,000 events/s for the same pipeline stages, with the reference
LM trip count max_iteration=10 (cfg/mapping/mapping_rpg.yaml:27). The DSEC
budget is the 20 Hz mapping period: 50 ms/cycle (cfg/mapping/mapping_dsec.yaml).

Fusion is timed on the REAL post-solve estimates with a steady-state full
history (not empty placeholders: an all-invalid candidate set is not
representative of scatter cost). The alternative "scatter_min" slot
strategy was deleted in r5 after losing its A/B 5x on every benched
shape (BENCH_r04 fuse_ab_ms).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "stages",
"roofline", "system"}.
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

# Persistent compilation cache: bench compiles happen server-side on the
# tunneled backend and dominate wall clock (~2 min for the rpg stage
# alone, cold). Cache executables locally so repeat runs — including the
# driver's end-of-round capture — replay them instead of recompiling.
_CACHE_DIR = os.environ.get("ESVO_BENCH_CACHE",
                            os.path.join(os.path.dirname(
                                os.path.abspath(__file__)), ".jax_cache"))
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
except Exception:  # older jax without the knobs: run uncached
    pass

BASELINE_EVENTS_PER_SEC = 20_000.0
# TPU v5e (1 chip): 197 TFLOP/s bf16 (f32 ops run through the same MXU via
# passes; elementwise VPU work is far below this), 819 GB/s HBM.
PEAK_FLOPS = 197e12
PEAK_HBM_BYTES = 819e9


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


def time_fn(fn, args, reps, passes=2):
    """Best-of-`passes` mean rep time; blocks on the FULL output tree
    (blocking on a single leaf under-measured scatter_min by 150x in r03)."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best, out


def xla_cost(jfn, args):
    """(flops, HBM bytes) from XLA's compiled cost model; (-1,-1) if the
    backend doesn't expose it."""
    try:
        c = jfn.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", -1.0)), float(c.get("bytes accessed",
                                                         -1.0))
    except Exception:
        return -1.0, -1.0


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

    fu_cfg = fu.FusionConfig()
    (cycle0, stage_ts, stage_bm, stage_solve, stage_fuse,
     empty_history) = build_cycle(rig, W, H, N, F, bm_cfg, dp_cfg, fu_cfg,
                                  surf_cfg, ts_l_tex, ts_r_tex)

    jts = jax.jit(stage_ts)
    t_ts, (ts_state2, ts_l) = time_fn(
        jts, (ts_state, ev_x, ev_y, ev_t, ev_p, ev_valid), reps)
    jbm = jax.jit(stage_bm)
    t_bm, matches = time_fn(jbm, (ts_l, ev_x, ev_y, ev_t, ev_valid), reps)
    jsolve = jax.jit(stage_solve)
    t_solve, est = time_fn(jsolve, (ts_l, matches, ev_t), reps)

    # --- fusion timed on the real post-solve estimates, with a
    # steady-state history (every slot holds a real frame's estimates,
    # the WORKING-phase worst case) ---
    history0 = empty_history(dr)
    history = jax.tree.map(
        lambda h, e: jnp.broadcast_to(e[None], h.shape).astype(h.dtype),
        history0, est)
    jfuse = jax.jit(stage_fuse)
    t_fuse, _ = time_fn(jfuse, (history, 0, est), max(reps, 10))

    # --- fused full cycle (throughput metric) ---
    cyc = jax.jit(cycle0)
    out = cyc(ts_state, history0, 0, ev_x, ev_y, ev_t, ev_p, ev_valid)
    jax.block_until_ready(out)
    t_cycle = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for r in range(reps):
            out = cyc(out[0], out[1], (r + 1) % F, ev_x, ev_y, ev_t,
                      ev_p, ev_valid)
        jax.block_until_ready(out)
        t_cycle = min(t_cycle, (time.perf_counter() - t0) / reps)

    # --- roofline per stage ---
    # Two byte counts: XLA's cost model ("xla_gb") counts LOGICAL
    # accesses of every HLO op before fusion — it over-states real HBM
    # traffic wherever the compiler keeps intermediates on-chip, and in
    # r4 it produced membw_frac > 1 for solve (physically impossible,
    # useless for guiding optimization). "min_hbm_gb" is the
    # algorithmic MINIMUM traffic (every input array read once + every
    # output written once), so membw_frac = min_bytes/time/peak is a
    # true lower bound on achieved-bandwidth fraction: a stage with low
    # membw_frac AND low mfu is latency/issue-bound, not roofline-bound.
    mg = dp_cfg.window_margin
    Wy = dp_cfg.patch_size_y + 1 + 2 * mg
    Wx = dp_cfg.patch_size_x + 1 + 2 * mg
    min_bytes = {
        # insert: 2 grids r+w; render: grid r, image w, remap r+w
        "ts": (8 * H * W + 4 * N) * 4,
        # both surfaces read once + per-event match outputs
        "bm": (2 * H * W + 16 * N) * 4,
        # both windows gathered once (from the surfaces) + outputs
        "solve": (2 * N * Wy * Wx + 2 * H * W + 16 * N) * 4,
        # history read once + 8-plane grid written once + points/poses
        "fuse": (30 * F * N + 9 * H * W) * 4,
    }
    costs = {
        "ts": (xla_cost(jts, (ts_state, ev_x, ev_y, ev_t, ev_p, ev_valid)),
               t_ts),
        "bm": (xla_cost(jbm, (ts_l, ev_x, ev_y, ev_t, ev_valid)), t_bm),
        "solve": (xla_cost(jsolve, (ts_l, matches, ev_t)), t_solve),
        "fuse": (xla_cost(jfuse, (history, 0, est)), t_fuse),
    }
    roofline = {}
    for name, ((flops, bts), t) in costs.items():
        if flops < 0 or t <= 0:
            continue
        roofline[name] = {
            "gflops": round(flops / 1e9, 3),
            "xla_gb": round(bts / 1e9, 4),
            "min_hbm_gb": round(min_bytes[name] / 1e9, 4),
            "mfu": round(flops / t / PEAK_FLOPS, 4),
            "membw_frac": round(min_bytes[name] / t / PEAK_HBM_BYTES, 4),
        }

    return {
        "ts_ms": round(t_ts * 1e3, 3),
        "bm_ms": round(t_bm * 1e3, 3),
        "solve_ms": round(t_solve * 1e3, 3),
        "fuse_ms": round(t_fuse * 1e3, 3),
        "cycle_ms": round(t_cycle * 1e3, 3),
        "roofline": roofline,
    }


def bench_closed_loop(roll=5, dispatch_ticks=(5, 10, 25, 50)):
    """System-level metric: ticks/s of the closed loop (100 Hz tracking /
    20 Hz mapping, reference README.md:221-226) on a synthetic scene.

    The device-resident loop (runtime/resident.py) folds tracking,
    mapping, the pose table and the ref-map publish into ONE device
    program covering `dispatch_ticks` ticks; the sweep reports ticks/s
    per dispatch size plus the legacy host-driven roll path for
    comparison. Mapping cadence is fixed at every `roll`-th tick in all
    configurations, so accuracy is dispatch-size independent (ATE is
    reported from the largest-dispatch run).
    """
    from esvo_tpu.geometry.camera import make_ideal_rig
    from esvo_tpu.io.events import frame_events
    from esvo_tpu.io.synthetic import (make_scene, simulate_stereo_events,
                                       interpolate_gt_pose)
    from esvo_tpu.runtime.config import SystemConfig, MappingConfig
    from esvo_tpu.runtime.system import EsvoSystem, SystemStatus
    from esvo_tpu.runtime.resident import ResidentLoop
    from esvo_tpu.mapping.block_matching import BlockMatchConfig
    from esvo_tpu.mapping.depth_refinement import DepthProblemConfig
    from esvo_tpu.mapping.initialization import SGMConfig
    from esvo_tpu.eval.trajectory import ate_rmse

    W, H, FX, BASE, TICK = 240, 180, 150.0, 0.1, 0.01
    DUR = 3.2
    rng = np.random.default_rng(7)
    rig = make_ideal_rig(W, H, FX, FX, W / 2 - 0.5, H / 2 - 0.5, BASE,
                         dtype=jnp.float32)
    scene = make_scene(rng, num_points=4000, duration=DUR,
                       steps=int(DUR * 100) + 1, motion_scale=0.6,
                       period=0.8)
    ev_l, ev_r = simulate_stereo_events(
        scene, np.asarray(rig.left.params.P), np.asarray(rig.right.params.P),
        W, H, pixel_threshold=0.75, rng=rng)
    ticks = np.arange(TICK, DUR, TICK)
    frames_l = frame_events(ev_l, ticks, 3000)
    frames_r = frame_events(ev_r, ticks, 3000)

    cfg = SystemConfig(
        depth=DepthProblemConfig(max_iteration=10),
        bm=BlockMatchConfig(zncc_threshold=0.25),
        sgm=SGMConfig(num_disparities=48),
        mapping=MappingConfig(process_event_num=800,
                              init_sgm_num_threshold=300,
                              std_var_vis_threshold=0.05,
                              age_vis_threshold=0,
                              denoising=False, regularization=False))
    system = EsvoSystem(rig, cfg)

    def pick(f, sl):
        return {k: v[sl] for k, v in f.items() if k != "dropped"}

    def bootstrap():
        system.reset()
        k0 = 0
        while system.status != SystemStatus.WORKING \
                and k0 + roll <= len(ticks):
            system.process_ticks(ticks[k0:k0 + roll],
                                 pick(frames_l, slice(k0, k0 + roll)),
                                 pick(frames_r, slice(k0, k0 + roll)),
                                 do_mapping=True)
            k0 += roll
        assert system.status == SystemStatus.WORKING
        return k0

    by_dispatch = {}
    ates = {}
    for RK in dispatch_ticks:
        R = RK // roll
        k0 = bootstrap()
        loop = ResidentLoop(system, ticks_per_roll=roll,
                            rolls_per_dispatch=R)
        loop.start()
        t0 = None
        timed = 0
        out = None
        while k0 + RK <= len(ticks):
            sl = slice(k0, k0 + RK)
            out = loop.run(ticks[sl], pick(frames_l, sl),
                           pick(frames_r, sl))
            if t0 is None:      # first dispatch = compile warmup
                jax.block_until_ready(out["outs"]["poses"])
                t0 = time.perf_counter()
            else:
                timed += RK     # subsequent dispatches pipeline freely
            k0 += RK
        jax.block_until_ready(out["outs"]["poses"])
        rate = timed / (time.perf_counter() - t0)
        loop.finish()
        assert system.status == SystemStatus.WORKING
        by_dispatch[RK] = round(rate, 1)
        t_est, poses_est = system.trajectory()
        gt = np.stack([interpolate_gt_pose(scene, t) for t in t_est])
        ates[RK] = round(float(ate_rmse(t_est, poses_est, t_est, gt)), 4)

    # legacy host-driven roll path (the r4 measurement) for comparison
    k0 = bootstrap()
    n_host = min(k0 + 50, len(ticks))
    t0 = None
    for k in range(k0, n_host, roll):
        if k >= k0 + roll and t0 is None:
            t0 = time.perf_counter()
        sl = slice(k, k + roll)
        system.process_ticks(ticks[sl], pick(frames_l, sl),
                             pick(frames_r, sl), do_mapping=True)
    system.flush()
    host_rate = (n_host - k0 - roll) / (time.perf_counter() - t0)

    best = max(by_dispatch.values())
    # ATE varies run-to-run with the stochastic point selection (the
    # reference is likewise non-deterministic, README.md:230) and is
    # dispatch-size independent by construction: report the median
    return {
        "ticks_per_sec": round(best, 1),
        "vs_design_point_100hz": round(best / 100.0, 3),
        "ate_m": round(float(np.median(list(ates.values()))), 4),
        "ate_by_dispatch": ates,
        "n_ticks": int(len(ticks)),
        "by_dispatch_ticks": by_dispatch,
        "host_roll_ticks_per_sec": round(host_rate, 1),
    }


def main():
    from esvo_tpu.mapping import block_matching as bm
    from esvo_tpu.mapping import depth_refinement as dr

    rng = np.random.default_rng(0)

    # rpg scale: 240x180, 4096 events/cycle, reference LM trip count
    # (max_iteration=10, cfg/mapping/mapping_rpg.yaml:27)
    rpg = bench_pipeline(
        240, 180, 4096, 8, bm.BlockMatchConfig(),
        dr.DepthProblemConfig(max_iteration=10), reps=20, rng=rng)
    events_per_sec = 4096 / (rpg["cycle_ms"] * 1e-3)

    # DSEC scale: 640x480, disparity range 151, 8192 events
    # (cfg/mapping/mapping_dsec.yaml: PROCESS_EVENT_NUM=10000, disp 0-150)
    dsec = bench_pipeline(
        640, 480, 8192, 24,
        bm.BlockMatchConfig(min_disparity=0, max_disparity=150),
        dr.DepthProblemConfig(max_iteration=10), reps=10, rng=rng)

    try:
        system = bench_closed_loop()
    except Exception as e:  # never lose the headline JSON to the extra metric
        system = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps({
        "metric": "mapping_pipeline_events_per_sec",
        "value": round(events_per_sec, 1),
        "unit": "events/s",
        "vs_baseline": round(events_per_sec / BASELINE_EVENTS_PER_SEC, 3),
        "stages": {"rpg_240x180_n4096": rpg,
                   "dsec_640x480_n8192": dsec},
        "system": system,
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
                     "last clean r5 run: 667k ev/s (33.4x), rpg cycle "
                     "6.14 ms, closed loop 588.4 ticks/s — see README"}))
        raise SystemExit(0)
    main()
