"""Headline benchmark: events/sec through the full mapping pipeline.

Measures the per-chip throughput of the hot path — time-surface render +
stereo block matching + per-event inverse-depth LM + culling + window
fusion — on synthetic 240x180 (DAVIS240C geometry, the rpg benchmark
sensor) event data.

Baseline: reference ESVO's mapper processes PROCESS_EVENT_NUM=1000 events
per cycle at 20 Hz on a 6-thread i7-8750H (cfg/mapping/mapping_rpg.yaml:18,
:21) => 20,000 events/s for the same pipeline stages.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_EVENTS_PER_SEC = 20_000.0


def main():
    from esvo_tpu.geometry.camera import make_ideal_rig
    from esvo_tpu.geometry.se3 import se3_inverse, interpolate_pose_table
    from esvo_tpu.surface import time_surface as tsf
    from esvo_tpu.mapping import block_matching as bm
    from esvo_tpu.mapping import depth_refinement as dr
    from esvo_tpu.mapping import fusion as fu

    W, H = 240, 180
    N = 4096              # events per mapping cycle
    FUSION_WINDOW = 4
    rng = np.random.default_rng(0)
    rig = make_ideal_rig(W, H, 200.0, 200.0, W / 2 - 0.5, H / 2 - 0.5,
                         0.1, dtype=jnp.float32)
    bm_cfg = bm.BlockMatchConfig()
    dp_cfg = dr.DepthProblemConfig(max_iteration=8)
    fu_cfg = fu.FusionConfig()

    # synthetic state: textured surfaces with a coherent disparity so the
    # pipeline does real work (matches succeed, LM iterates)
    disp = 8
    base = rng.uniform(0, 255, size=(H, W + 64)).astype(np.float32)
    k = np.ones(5) / 5
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    ts_l = jnp.asarray(base[:, 32:32 + W])
    ts_r = jnp.asarray(base[:, 32 + disp:32 + disp + W])

    ev_x = jnp.asarray(rng.integers(20, W - 20, N), jnp.int32)
    ev_y = jnp.asarray(rng.integers(10, H - 10, N), jnp.int32)
    ev_t = jnp.asarray(np.sort(rng.uniform(0.0, 0.01, N)), jnp.float32)
    ev_p = jnp.asarray(rng.random(N) > 0.5)
    ev_valid = jnp.ones(N, bool)
    pose_t = jnp.asarray(np.linspace(-0.05, 0.05, 32), jnp.float32)
    pose_T = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (32, 4, 4))

    surf_cfg = tsf.TimeSurfaceConfig()

    def cycle(ts_state, history, slot, ev_x, ev_y, ev_t, ev_p, ev_valid):
        """One mapping cycle: TS tick + BM + depth LM + cull + fuse."""
        batch = tsf.EventBatch(x=ev_x, y=ev_y, t=ev_t, p=ev_p,
                               valid=ev_valid)
        ts_state = tsf.insert_events(ts_state, batch)
        surf = tsf.render_backward(ts_state, ev_t[-1], rig.left, surf_cfg)
        ts_left = 0.5 * (surf + ts_l)   # keep texture for matching
        x_rect = rig.left.lut[ev_y, ev_x]
        T_wv = interpolate_pose_table(pose_t, pose_T, ev_t)
        matches = bm.match_events(ts_left, ts_r, x_rect, x_rect, ev_t,
                                  ev_valid, rig.left.mask, rig, bm_cfg)
        T_lv = T_wv
        est = dr.solve(matches.x_left, T_wv, T_lv, matches.inv_depth,
                       matches.valid, ev_t, ts_left, ts_r, rig, dp_cfg)
        est = dr.point_culling(est, 0.03, 20.0 ** 2 * dp_cfg.patch_area,
                               0.2, 2.0)
        history = jax.tree.map(lambda h, e: h.at[slot].set(e), history, est)
        flat = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]),
                            history)
        grid = fu.empty_grid(H, W, jnp.float32)
        cand = fu.propagate_points(flat, jnp.eye(4, dtype=jnp.float32),
                                   rig.left, fu_cfg)
        grid, nfused, _ = fu.fuse_frame(grid, cand, rig.left, fu_cfg)
        return ts_state, history, grid.inv_depth, nfused

    cycle_jit = jax.jit(cycle)

    ts_state = tsf.init_state(H, W)
    F = FUSION_WINDOW
    zeros = jnp.zeros
    history = dr.DepthEstimates(
        x=zeros((F, N, 2), jnp.float32),
        inv_depth=-jnp.ones((F, N), jnp.float32),
        variance=zeros((F, N), jnp.float32),
        scale2=zeros((F, N), jnp.float32), nu=zeros((F, N), jnp.float32),
        residual=zeros((F, N), jnp.float32),
        age=zeros((F, N), jnp.int32), p_cam=zeros((F, N, 3), jnp.float32),
        T_world_cam=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                     (F, N, 4, 4)),
        valid=zeros((F, N), bool))

    # warmup / compile
    ts_state, history, inv_d, nfused = cycle_jit(
        ts_state, history, 0, ev_x, ev_y, ev_t, ev_p, ev_valid)
    jax.block_until_ready(nfused)

    reps = 20
    t0 = time.perf_counter()
    for r in range(reps):
        ts_state, history, inv_d, nfused = cycle_jit(
            ts_state, history, (r + 1) % F, ev_x, ev_y, ev_t, ev_p,
            ev_valid)
    jax.block_until_ready(nfused)
    dt = time.perf_counter() - t0

    events_per_sec = N * reps / dt
    print(json.dumps({
        "metric": "mapping_pipeline_events_per_sec",
        "value": round(events_per_sec, 1),
        "unit": "events/s",
        "vs_baseline": round(events_per_sec / BASELINE_EVENTS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
