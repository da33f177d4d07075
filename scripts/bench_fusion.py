"""A/B benchmark of the fusion slot-assignment strategies on the device.

Times fuse_frame with slot_strategy="sort" (one 2-key lexicographic sort
over all tiled candidates) vs "scatter_min" (K rounds of per-pixel
scatter-min) at the bench scales:

  rpg  : 240x180 grid, F=4 x 4096 estimates  -> M = 65k tiled candidates
  dsec : 640x480 grid, F=4 x 8192 estimates  -> M = 131k tiled candidates

Run:  python scripts/bench_fusion.py          (device backend)
      python scripts/bench_fusion.py --cpu    (host CPU, for smoke only)
"""
import sys
import time

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from esvo_tpu.geometry.camera import make_ideal_rig
from esvo_tpu.mapping import fusion as fu
from esvo_tpu.mapping.depth_refinement import DepthEstimates


def make_history(rng, W, H, F, N):
    n = F * N
    xs = np.stack([rng.uniform(1, W - 2, n), rng.uniform(1, H - 2, n)], 1)
    invd = rng.uniform(0.3, 1.5, n)
    return DepthEstimates(
        x=jnp.asarray(xs, jnp.float32),
        inv_depth=jnp.asarray(invd, jnp.float32),
        variance=jnp.asarray(rng.uniform(1e-5, 1e-3, n), jnp.float32),
        scale2=jnp.asarray(rng.uniform(1e-5, 1e-3, n), jnp.float32),
        nu=jnp.full((n,), 3.0, jnp.float32),
        residual=jnp.asarray(rng.uniform(0, 20, n), jnp.float32),
        age=jnp.zeros(n, jnp.int32),
        p_cam=jnp.asarray(rng.normal(size=(n, 3)) + [0, 0, 2.0],
                          jnp.float32),
        T_world_cam=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                     (n, 4, 4)),
        valid=jnp.asarray(rng.random(n) > 0.1))


def bench(W, H, F, N, reps=30):
    rng = np.random.default_rng(0)
    rig = make_ideal_rig(W, H, 200.0, 200.0, W / 2 - 0.5, H / 2 - 0.5,
                         0.1, dtype=jnp.float32)
    est = make_history(rng, W, H, F, N)
    out = {}
    for strat in ("sort", "scatter_min"):
        cfg = fu.FusionConfig(slot_strategy=strat)

        @jax.jit
        def rebuild(est):
            grid = fu.empty_grid(H, W, jnp.float32)
            cand = fu.propagate_points(est, jnp.eye(4, dtype=jnp.float32),
                                       rig.left, cfg)
            g, nf, nd = fu.fuse_frame(grid, cand, rig.left, cfg)
            return g.inv_depth, nf, nd

        r = rebuild(est)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = rebuild(est)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        out[strat] = dt * 1e3
        print(f"  {W}x{H} F={F} N={N} M={4*F*N//1000}k  {strat:12s} "
              f"{dt*1e3:7.2f} ms   (fused={int(r[1])}, dropped={int(r[2])})")
    return out


def main():
    print("platform:", jax.devices()[0].platform)
    print("rpg scale:")
    a = bench(240, 180, 4, 4096)
    print("dsec scale:")
    b = bench(640, 480, 4, 8192)
    for name, o in (("rpg", a), ("dsec", b)):
        win = min(o, key=o.get)
        print(f"{name}: winner = {win}  "
              f"(sort {o['sort']:.2f} ms, scatter_min "
              f"{o['scatter_min']:.2f} ms)")


if __name__ == "__main__":
    main()
