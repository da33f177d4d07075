"""System-level ticks/s: sequential process_tick vs fused process_ticks.

The reference hides latency by running its time-surface, mapping, and
tracking nodes as separate processes at different rates
(launch/system/system_rpg.launch:5-63). The TPU analogue is the
process_ticks roll: K surface updates + K chained tracking solves fused
into one device program with donated buffers, and the mapping cycle
dispatched asynchronously at the roll boundary. This script measures the
steady-state WORKING-phase tick rate both ways on the same synthetic
closed-loop workload (100 Hz tick schedule, mapping every 5th tick).

Usage: python scripts/bench_ticks.py [--ticks 60]
"""
import argparse
import time

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=60)
    ap.add_argument("--roll", type=int, default=5)
    args = ap.parse_args()

    import sys
    sys.path.insert(0, "tests")
    from test_system import make_config, frame_at, W, H, FX, BASELINE, TICK
    from esvo_tpu.geometry.camera import make_ideal_rig
    from esvo_tpu.io.events import frame_events
    from esvo_tpu.io.synthetic import make_scene, simulate_stereo_events
    from esvo_tpu.runtime.system import EsvoSystem, SystemStatus

    rng = np.random.default_rng(7)
    rig = make_ideal_rig(W, H, FX, FX, W / 2 - 0.5, H / 2 - 0.5, BASELINE,
                         dtype=jnp.float32)
    scene = make_scene(rng, num_points=4000, duration=0.8, steps=81,
                       motion_scale=0.6)
    ev_l, ev_r = simulate_stereo_events(
        scene, np.asarray(rig.left.params.P),
        np.asarray(rig.right.params.P), W, H, pixel_threshold=0.75,
        rng=rng)
    ticks = np.arange(TICK, 0.8, TICK)
    frames_l = frame_events(ev_l, ticks, 3000)
    frames_r = frame_events(ev_r, ticks, 3000)
    n_ticks = min(args.ticks, len(ticks))
    R = args.roll

    def run_sequential(system):
        system.reset()
        t0 = None
        for k in range(n_ticks):
            if k == R and t0 is None:
                t0 = time.perf_counter()   # skip bootstrap
            system.process_tick(float(ticks[k]), frame_at(frames_l, k),
                                frame_at(frames_r, k),
                                do_mapping=(k % R == R - 1))
        assert system.status == SystemStatus.WORKING
        return (n_ticks - R) / (time.perf_counter() - t0)

    def run_rolled(system):
        system.reset()
        t0 = None
        for k0 in range(0, n_ticks, R):
            if k0 == R and t0 is None:
                t0 = time.perf_counter()
            sl = slice(k0, k0 + R)
            evl = {key: v[sl] for key, v in frames_l.items()
                   if key != "dropped"}
            evr = {key: v[sl] for key, v in frames_r.items()
                   if key != "dropped"}
            system.process_ticks(ticks[sl], evl, evr, do_mapping=True)
        system.flush()
        assert system.status == SystemStatus.WORKING
        return (n_ticks - R) / (time.perf_counter() - t0)

    # one system per path (compiled programs persist across reset());
    # first pass warms the compiles, second pass is the measurement
    for name, fn in [("sequential", run_sequential), ("rolled", run_rolled)]:
        system = EsvoSystem(rig, make_config())
        fn(system)               # compile warmup
        rate = fn(system)        # measured
        print(f"{name:12s} {rate:8.1f} ticks/s")
        if name == "sequential":
            seq = rate
        else:
            print(f"speedup: {rate / seq:.2f}x")


if __name__ == "__main__":
    main()
