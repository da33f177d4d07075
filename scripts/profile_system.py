"""Per-stage wall-time profile of the system pipeline on CPU (test config).

Run:  python scripts/profile_system.py [n_ticks]
"""
import sys
import time

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from esvo_tpu.geometry.camera import make_ideal_rig
from esvo_tpu.io.events import frame_events
from esvo_tpu.io.synthetic import make_scene, simulate_stereo_events, \
    interpolate_gt_pose
from esvo_tpu.runtime.system import EsvoSystem
from esvo_tpu.utils.profiling import StageTimer

sys.path.insert(0, "tests")
from test_system import make_config, frame_at, W, H, FX, BASELINE, TICK


def main():
    n_ticks = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    rng = np.random.default_rng(7)
    t0 = time.perf_counter()
    rig = make_ideal_rig(W, H, FX, FX, W / 2 - 0.5, H / 2 - 0.5, BASELINE,
                         dtype=jnp.float32)
    print(f"rig: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    scene = make_scene(rng, num_points=1500, duration=0.8, steps=81,
                       motion_scale=0.6)
    ev_l, ev_r = simulate_stereo_events(
        scene, np.asarray(rig.left.params.P), np.asarray(rig.right.params.P),
        W, H, pixel_threshold=0.75, rng=rng)
    print(f"simulate: {time.perf_counter()-t0:.1f}s  "
          f"events L={len(ev_l)} R={len(ev_r)}")
    ticks = np.arange(TICK, 0.8, TICK)
    frames_l = frame_events(ev_l, ticks, 3000)
    frames_r = frame_events(ev_r, ticks, 3000)

    system = EsvoSystem(rig, make_config())
    timer = StageTimer()
    for k in range(n_ticks):
        t = float(ticks[k])
        gt = interpolate_gt_pose(scene, t)
        name = f"tick{'_map' if k % 5 == 4 else ''}"
        with timer.stage(name + ("_first" if k < 5 else "")):
            out = system.process_tick(t, frame_at(frames_l, k),
                                      frame_at(frames_r, k), gt_pose=gt,
                                      do_mapping=(k % 5 == 4))
        print(k, system.status.value, out.get("sgm_points"),
              out.get("map_estimates"), out.get("map_points"), flush=True)
    print(timer.summary())


if __name__ == "__main__":
    main()
