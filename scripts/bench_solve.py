"""Micro-benchmark for the depth-LM solver (the mapping cycle's hot stage).

Times dr.solve alone on the real chip at rpg scale (240x180, N=4096) and
DSEC scale (640x480, N=8192), sweeping max_iteration to separate the fixed
cost (window gather, initial eval, variance) from the per-iteration cost.

Usage: python scripts/bench_solve.py [--dsec] [--iters 0,1,4,8]
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dsec", action="store_true")
    ap.add_argument("--iters", default="0,1,8")
    ap.add_argument("--n", type=int, default=0)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    from esvo_tpu.geometry.camera import make_ideal_rig
    from esvo_tpu.mapping import depth_refinement as dr

    if args.dsec:
        W, H, N = 640, 480, 8192
    else:
        W, H, N = 240, 180, 4096
    if args.n:
        N = args.n

    rng = np.random.default_rng(0)
    rig = make_ideal_rig(W, H, 200.0, 200.0, W / 2 - 0.5, H / 2 - 0.5,
                         0.1, dtype=jnp.float32)
    disp = 8
    base = rng.uniform(0, 255, size=(H, W + 64)).astype(np.float32)
    k = np.ones(5) / 5
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    ts_l = jnp.asarray(base[:, 32:32 + W])
    ts_r = jnp.asarray(base[:, 32 + disp:32 + disp + W])

    coords = jnp.stack(
        [jnp.asarray(rng.uniform(30, W - 30, N), jnp.float32),
         jnp.asarray(rng.uniform(20, H - 20, N), jnp.float32)], axis=1)
    d_true = disp / (0.1 * 200.0)
    d_init = jnp.asarray(d_true * rng.uniform(0.85, 1.15, N), jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (N, 4, 4))
    valid = jnp.ones(N, bool)
    t_ev = jnp.zeros(N, jnp.float32)

    for iters in [int(s) for s in args.iters.split(",")]:
        cfg = dr.DepthProblemConfig(max_iteration=max(iters, 1))
        if iters == 0:
            cfg = dr.DepthProblemConfig(max_iteration=1)

        fn = jax.jit(lambda c, e1, e2, d, v, t, l, r, cfg=cfg:
                     dr.solve(c, e1, e2, d, v, t, l, r, rig, cfg))
        out = fn(coords, eye, eye, d_init, valid, t_ev, ts_l, ts_r)
        jax.block_until_ready(out.inv_depth)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(coords, eye, eye, d_init, valid, t_ev, ts_l, ts_r)
        jax.block_until_ready(out.inv_depth)
        dt = (time.perf_counter() - t0) / args.reps
        nvalid = int(np.asarray(out.valid).sum())
        print(f"iters={iters:2d}  {dt * 1e3:7.2f} ms   "
              f"({N / dt / 1e3:8.1f} k ev/s)  valid={nvalid}")


if __name__ == "__main__":
    main()
