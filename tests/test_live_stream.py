"""Live TCP event ingestion (io/live.py + scripts/run_live.py).

The live path must produce BIT-IDENTICAL tick frames to the offline
framer on the same stream, survive pacing/EOF, and drive the full
closed loop end-to-end through the CLI."""
import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from esvo_tpu.io.events import EventArray, frame_events
from esvo_tpu.io.live import (LiveEventStream, serve_event_stream)


def make_stream(rng, n=20000, dur=0.5, W=240, H=180):
    t = np.sort(rng.uniform(0, dur, n))
    return EventArray(t=t, x=rng.integers(0, W, n).astype(np.int16),
                      y=rng.integers(0, H, n).astype(np.int16),
                      p=rng.random(n) > 0.5, t_offset=0.0)


def test_live_frames_match_offline_framer():
    rng = np.random.default_rng(0)
    ev = make_stream(rng)
    port, th = serve_event_stream(ev, port=0)
    stream = LiveEventStream("127.0.0.1", port)
    ticks = np.arange(0.01, 0.5, 0.01)
    ref = frame_events(ev, ticks, 600)
    for k, ts in enumerate(ticks):
        f = stream.next_frame(float(ts), 600)
        assert f is not None, f"timeout at tick {k}"
        for key in ("x", "y", "p", "valid"):
            np.testing.assert_array_equal(f[key], ref[key][k]), key
        np.testing.assert_allclose(f["t"], ref["t"][k], atol=1e-6)
        assert int(f["dropped"]) == int(ref["dropped"][k])
    th.join(timeout=5)
    stream.close()


def test_live_paced_stream_and_eof():
    rng = np.random.default_rng(1)
    ev = make_stream(rng, n=3000, dur=0.2)
    # 10x real time pacing: ~20 ms of wall clock
    port, th = serve_event_stream(ev, port=0, pace=10.0)
    stream = LiveEventStream("127.0.0.1", port)
    got = 0
    for ts in np.arange(0.05, 0.25, 0.05):
        f = stream.next_frame(float(ts), 4000)
        assert f is not None
        got += int(f["valid"].sum())
    assert got == len(ev.t)
    assert stream.eof
    stream.close()


def test_run_live_closed_loop(tmp_path):
    """Full closed loop through the live CLI on a synthetic stereo
    scene served over two local sockets."""
    import run_live
    from tests.test_run_dataset import _calib_yaml, W, H, FX, BASELINE
    from esvo_tpu.io.synthetic import make_scene, simulate_stereo_events

    rng = np.random.default_rng(3)
    scene = make_scene(rng, num_points=4000, duration=0.5, steps=51,
                       motion_scale=0.6)
    cx, cy = W / 2 - 0.5, H / 2 - 0.5
    P_l = np.array([[FX, 0, cx, 0], [0, FX, cy, 0], [0, 0, 1, 0]])
    P_r = P_l.copy()
    P_r[0, 3] = -FX * BASELINE
    ev_l, ev_r = simulate_stereo_events(scene, P_l, P_r, W, H,
                                        pixel_threshold=0.75, rng=rng)
    calib = tmp_path / "calib"
    calib.mkdir()
    _calib_yaml(calib / "left.yaml", "l", W, H, FX, FX, cx, cy, 0.0)
    _calib_yaml(calib / "right.yaml", "r", W, H, FX, FX, cx, cy,
                -FX * BASELINE)
    pl, _ = serve_event_stream(ev_l, port=0)
    pr, _ = serve_event_stream(ev_r, port=0)
    out = str(tmp_path / "traj_live.txt")
    result = run_live.main([
        "--left", f"127.0.0.1:{pl}", "--right", f"127.0.0.1:{pr}",
        "--calib", str(calib), "--duration", "0.45",
        "--set", "mapping.process_event_num=800",
        "--set", "mapping.init_sgm_num_threshold=300",
        "--set", "mapping.denoising=false",
        "--set", "mapping.regularization=false",
        "--set", "mapping.std_var_vis_threshold=0.05",
        "--set", "mapping.age_vis_threshold=0",
        "--set", "bm.zncc_threshold=0.25",
        "--out", out, "--quiet"])
    assert result["ticks"] >= 40
    assert result["status"] == "WORKING"
    assert result["stats"]["map_points"] > 200
    assert os.path.exists(out)
