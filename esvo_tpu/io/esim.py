"""Sensor-realistic contrast-threshold event-camera simulator.

The reference validates exclusively on recorded rosbags (README.md:86);
none exist in this environment, so long-sequence accuracy evidence needs a
simulator that reproduces the *sensor physics* the pipeline was designed
for, not just edge-point sweeps (io/synthetic.py). This module implements
the standard event-camera model (ESIM-style):

- a textured 3D scene rendered to per-pixel **log intensity**;
- per-pixel reference levels: an event fires each time log intensity
  crosses a contrast threshold C since the pixel's last event, with the
  event timestamp linearly interpolated inside the render step;
- per-pixel threshold fixed-pattern noise (C varies pixel to pixel);
- a **refractory period** during which a pixel cannot fire again;
- background/leak noise events, hot pixels firing at kHz rates (the
  artefacts the reference's denoiser targets, esvo_Mapping.cpp:1046-1072).

TPU-first design: rendering + event extraction run as one jitted
`lax.scan` over fixed-size substeps; variable event counts become a
fixed per-substep budget with counted overflow (`jnp.nonzero(size=...)`
compaction), and the host stitches the budgeted chunks into EventArrays.
The scene is analytic (textured planes), so ground-truth depth for any
pose is exact — the accuracy campaign uses it to score semi-dense depth.
"""
from __future__ import annotations

import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from esvo_tpu.io.events import EventArray


# ---------------------------------------------------------------------------
# scene: textured planes
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PlaneScene:
    """Bounded textured planes. Arrays over the plane axis:

    p0 (P, 3) corner, e1/e2 (P, 3) edge vectors (not unit: their length is
    the plane extent), n (P, 3) unit normal. Texture: per-plane band-limited
    log intensity  L(s) = sum_k a_k sin(2 pi f_k . s + phi_k)
    plus soft step edges  b tanh(s * sin(2 pi g . s + psi)) — edges are what
    drives ESVO's time surfaces.  s = (u, v) in plane-local [0, 1]^2.
    """
    p0: np.ndarray       # (P, 3)
    e1: np.ndarray       # (P, 3)
    e2: np.ndarray       # (P, 3)
    n: np.ndarray        # (P, 3) unit
    tex_amp: np.ndarray  # (P, K)
    tex_freq: np.ndarray  # (P, K, 2) cycles per plane
    tex_phase: np.ndarray  # (P, K)
    edge_amp: np.ndarray   # (P, E)
    edge_freq: np.ndarray  # (P, E, 2)
    edge_phase: np.ndarray  # (P, E)
    edge_sharp: float = 8.0

    def save(self, path: str) -> None:
        np.savez(path, **{f.name: getattr(self, f.name)
                          for f in dataclasses.fields(self)})

    @staticmethod
    def load(path: str) -> "PlaneScene":
        d = np.load(path)
        kw = {k: d[k] for k in d.files}
        kw["edge_sharp"] = float(kw["edge_sharp"])
        return PlaneScene(**kw)


def make_room_scene(rng: np.random.Generator,
                    half_width: float = 2.0,
                    half_height: float = 1.5,
                    depth: float = 4.0,
                    octaves: int = 6,
                    edges: int = 5) -> PlaneScene:
    """A box room seen from the origin looking down +z: back wall at
    z=depth, side walls, floor and ceiling. Every camera ray hits a plane,
    so rendering is total (no sky)."""
    W, Hh, D = half_width, half_height, depth
    # p0 + s1*e1 + s2*e2, s in [0,1]^2
    planes = [
        # back wall
        (np.array([-W, -Hh, D]), np.array([2 * W, 0, 0]),
         np.array([0, 2 * Hh, 0])),
        # left wall (x = -W)
        (np.array([-W, -Hh, -1.0]), np.array([0, 0, D + 1.0]),
         np.array([0, 2 * Hh, 0])),
        # right wall (x = +W)
        (np.array([W, -Hh, -1.0]), np.array([0, 0, D + 1.0]),
         np.array([0, 2 * Hh, 0])),
        # floor (y = +Hh: image y grows downward)
        (np.array([-W, Hh, -1.0]), np.array([2 * W, 0, 0]),
         np.array([0, 0, D + 1.0])),
        # ceiling (y = -Hh)
        (np.array([-W, -Hh, -1.0]), np.array([2 * W, 0, 0]),
         np.array([0, 0, D + 1.0])),
        # front wall behind the camera (closes the box)
        (np.array([-W, -Hh, -1.0]), np.array([2 * W, 0, 0]),
         np.array([0, 2 * Hh, 0])),
    ]
    P = len(planes)
    p0 = np.stack([p[0] for p in planes]).astype(np.float64)
    e1 = np.stack([p[1] for p in planes]).astype(np.float64)
    e2 = np.stack([p[2] for p in planes]).astype(np.float64)
    n = np.cross(e1, e2)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    K, E = octaves, edges
    amp = rng.uniform(0.05, 0.18, (P, K)) / np.sqrt(np.arange(1, K + 1))
    freq = rng.uniform(1.0, 3.0, (P, K, 2)) * \
        (2.0 ** np.arange(K))[None, :, None] * 0.5
    phase = rng.uniform(0, 2 * np.pi, (P, K))
    e_amp = rng.uniform(0.10, 0.25, (P, E))
    e_freq = rng.uniform(0.8, 5.0, (P, E, 2))
    e_phase = rng.uniform(0, 2 * np.pi, (P, E))
    return PlaneScene(p0=p0, e1=e1, e2=e2, n=n, tex_amp=amp, tex_freq=freq,
                      tex_phase=phase, edge_amp=e_amp, edge_freq=e_freq,
                      edge_phase=e_phase)


def render_log_intensity(scene: PlaneScene, T_world_cam: jax.Array,
                         K: jax.Array, width: int, height: int):
    """Render (log_intensity, depth) (H, W) for a pinhole camera at
    T_world_cam. Pure JAX; jit/vmap-able over poses. Depth is the
    camera-frame z of the nearest plane hit."""
    dtype = jnp.float32
    u = jnp.arange(width, dtype=dtype)[None, :]
    v = jnp.arange(height, dtype=dtype)[:, None]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    # camera-frame ray with dz = 1 so the ray parameter IS camera depth
    dx = (u - cx) / fx + 0.0 * v
    dy = (v - cy) / fy + 0.0 * u
    R = T_world_cam[:3, :3].astype(dtype)
    o = T_world_cam[:3, 3].astype(dtype)
    # world-frame direction per pixel (H, W, 3) kept as 3 planes (SoA)
    rx = R[0, 0] * dx + R[0, 1] * dy + R[0, 2]
    ry = R[1, 0] * dx + R[1, 1] * dy + R[1, 2]
    rz = R[2, 0] * dx + R[2, 1] * dy + R[2, 2]

    # all planes at once: (P, H, W) intermediates, vectorized over both
    # the plane axis and the texture-component axis (keeps the traced
    # graph small — a Python-loop formulation made `lax.scan` bodies with
    # minutes-long compiles)
    nrm = jnp.asarray(scene.n, dtype)                   # (P, 3)
    p0 = jnp.asarray(scene.p0, dtype)
    e1 = jnp.asarray(scene.e1, dtype)
    e2 = jnp.asarray(scene.e2, dtype)
    bx = lambda a: a[:, None, None]
    denom = bx(nrm[:, 0]) * rx + bx(nrm[:, 1]) * ry + bx(nrm[:, 2]) * rz
    num = jnp.sum(nrm * p0, axis=1) - nrm @ o           # (P,)
    t = bx(num) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    hx = o[0] + t * rx - bx(p0[:, 0])
    hy = o[1] + t * ry - bx(p0[:, 1])
    hz = o[2] + t * rz - bx(p0[:, 2])
    l1 = jnp.sum(e1 * e1, axis=1)
    l2 = jnp.sum(e2 * e2, axis=1)
    s1 = (bx(e1[:, 0]) * hx + bx(e1[:, 1]) * hy + bx(e1[:, 2]) * hz) \
        / bx(l1)
    s2 = (bx(e2[:, 0]) * hx + bx(e2[:, 1]) * hy + bx(e2[:, 2]) * hz) \
        / bx(l2)
    hit = (t > 1e-4) & (s1 >= -1e-4) & (s1 <= 1 + 1e-4) \
        & (s2 >= -1e-4) & (s2 <= 1 + 1e-4)
    # texture: (P, K, H, W) reduced over K
    amp = jnp.asarray(scene.tex_amp, dtype)             # (P, K)
    f1 = jnp.asarray(scene.tex_freq[:, :, 0], dtype)
    f2 = jnp.asarray(scene.tex_freq[:, :, 1], dtype)
    ph = jnp.asarray(scene.tex_phase, dtype)
    b2 = lambda a: a[:, :, None, None]
    L = jnp.sum(b2(amp) * jnp.sin(
        2 * np.pi * (b2(f1) * s1[:, None] + b2(f2) * s2[:, None])
        + b2(ph)), axis=1)
    ea = jnp.asarray(scene.edge_amp, dtype)
    g1 = jnp.asarray(scene.edge_freq[:, :, 0], dtype)
    g2 = jnp.asarray(scene.edge_freq[:, :, 1], dtype)
    ps = jnp.asarray(scene.edge_phase, dtype)
    L = L + jnp.sum(b2(ea) * jnp.tanh(scene.edge_sharp * jnp.sin(
        2 * np.pi * (b2(g1) * s1[:, None] + b2(g2) * s2[:, None])
        + b2(ps))), axis=1)
    t_masked = jnp.where(hit, t, jnp.inf)
    best = jnp.argmin(t_masked, axis=0)                 # (H, W)
    logI = jnp.take_along_axis(L, best[None], axis=0)[0]
    best_t = jnp.take_along_axis(t_masked, best[None], axis=0)[0]
    logI = jnp.where(jnp.isfinite(best_t), logI, 0.0)
    return logI, best_t


# ---------------------------------------------------------------------------
# trajectory: smooth closed loop
# ---------------------------------------------------------------------------

def loop_trajectory_pose(t, duration: float,
                         amp_t=(0.8, 0.35, 0.9),
                         amp_r=(0.10, 0.22, 0.06),
                         laps: int = 1) -> np.ndarray:
    """Analytic C-inf closed 6-DoF trajectory: the camera returns exactly
    to its start pose at t = duration (and at each lap boundary), giving
    the loop-closure backend genuine revisits. Units: meters / radians."""
    w = 2 * np.pi * laps / duration
    tx = amp_t[0] * np.sin(w * t)
    ty = amp_t[1] * np.sin(2 * w * t + 0.4) \
        - amp_t[1] * np.sin(0.4)
    tz = amp_t[2] * 0.5 * (1 - np.cos(w * t))
    rx = amp_r[0] * np.sin(w * t + 0.9) - amp_r[0] * np.sin(0.9)
    ry = amp_r[1] * np.sin(w * t)
    rz = amp_r[2] * np.sin(2 * w * t)
    cx_, sx_ = np.cos(rx), np.sin(rx)
    cy_, sy_ = np.cos(ry), np.sin(ry)
    cz_, sz_ = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx_, -sx_], [0, sx_, cx_]])
    Ry = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]])
    Rz = np.array([[cz_, -sz_, 0], [sz_, cz_, 0], [0, 0, 1]])
    T = np.eye(4)
    T[:3, :3] = Rz @ Ry @ Rx
    T[:3, 3] = [tx, ty, tz]
    return T


# ---------------------------------------------------------------------------
# sensor model
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SensorConfig:
    contrast_threshold: float = 0.18
    threshold_fpn_sigma: float = 0.03   # per-pixel fixed-pattern noise on C
    refractory_us: float = 100.0
    max_events_per_px_step: int = 3     # per substep (counted overflow)
    background_rate_hz: float = 0.3     # leak noise per pixel
    num_hot_pixels: int = 8
    hot_pixel_rate_hz: float = 1000.0   # capped at the substep rate
    substep_dt: float = 1e-3
    # per-substep compaction budget; <= 0 means auto (= H*W: one event per
    # pixel per substep on average, far above real sensor activity).
    # Overflow is counted AND warned about: the flat-index compaction
    # drops later per-pixel crossings and the noise slot first, a biased
    # loss that must never silently truncate a campaign's stream.
    event_budget_per_step: int = 0


def _make_camera_step(scene: PlaneScene, K: np.ndarray, width: int,
                      height: int, cfg: SensorConfig):
    """Build the jitted per-chunk simulation scan for one camera.

    Carry: (ref logI, last event time, first flag). Per substep: render,
    threshold-cross extraction with refractory + FPN thresholds, leak/hot
    noise, budgeted compaction. Emits (t, flat_code, polarity, count).
    """
    E = cfg.max_events_per_px_step
    B = cfg.event_budget_per_step
    HW = height * width
    Kj = jnp.asarray(K, jnp.float32)
    t_ref = cfg.refractory_us * 1e-6

    def chunk(carry, poses, t_starts, c_pos, c_neg, leak_p):
        """poses: (S, 12) row-major [R|t] rows; t_starts: (S,) substep start
        times; c_pos/c_neg: (H, W) thresholds; leak_p: (H, W) per-substep
        leak probability. The PRNG key rides in the carry."""

        def step(cr, inp):
            ref, last_t, key = cr
            pose12, t0 = inp
            T = jnp.concatenate(
                [pose12.reshape(3, 4),
                 jnp.asarray([[0., 0., 0., 1.]], jnp.float32)], axis=0)
            L, _ = render_log_intensity(scene, T, Kj, width, height)
            t1 = t0 + cfg.substep_dt
            delta = L - ref
            pol = delta >= 0
            c_px = jnp.where(pol, c_pos, c_neg)
            n = jnp.floor(jnp.abs(delta) / c_px).astype(jnp.int32)
            n_emit = jnp.minimum(n, E)
            # candidate slots i = 0..E-1: timestamps linearly interpolated
            # inside the substep; refractory drops (but still absorbs)
            ts = []
            oks = []
            lt = last_t
            for i in range(E):
                te = t0 + (i + 1.0) / (n_emit + 1.0) * cfg.substep_dt
                ok = (i < n_emit) & (te - lt >= t_ref)
                lt = jnp.where(ok, te, lt)
                ts.append(te)
                oks.append(ok)
            # reference always absorbs the emitted-or-refractory-dropped
            # crossings (the pixel reset happens regardless of readout)
            ref = ref + jnp.sign(delta) * n_emit.astype(jnp.float32) * c_px
            # leak / hot-pixel noise: one Bernoulli candidate per substep,
            # random polarity, does not move ref
            key, k1, k2 = jax.random.split(key, 3)
            fire = jax.random.uniform(k1, (height, width)) < leak_p
            fire = fire & (t1 - lt >= t_ref)
            npol = jax.random.uniform(k2, (height, width)) < 0.5
            tn = t0 + 0.5 * cfg.substep_dt
            lt = jnp.where(fire, tn, lt)

            cand_t = jnp.stack(ts + [jnp.full((height, width), tn)], 0)
            cand_ok = jnp.stack(oks + [fire], 0)
            cand_p = jnp.stack([pol] * E + [npol], 0)
            flat_ok = cand_ok.reshape(-1)
            count = jnp.sum(flat_ok.astype(jnp.int32))
            (idx,) = jnp.nonzero(flat_ok, size=B,
                                 fill_value=(E + 1) * HW)
            safe = jnp.minimum(idx, (E + 1) * HW - 1)
            out_t = jnp.where(idx < (E + 1) * HW,
                              cand_t.reshape(-1)[safe], jnp.inf)
            out_p = cand_p.reshape(-1)[safe]
            return (ref, lt, key), (out_t, idx.astype(jnp.int32),
                                    out_p, count)

        return jax.lax.scan(step, carry, (poses, t_starts))

    return jax.jit(chunk), E, B, HW


def simulate_camera(scene: PlaneScene, K: np.ndarray, width: int,
                    height: int, pose_fn, t_start: float, t_end: float,
                    cfg: SensorConfig, rng: np.random.Generator,
                    chunk_steps: int = 256, progress=None):
    """Simulate one camera over [t_start, t_end). pose_fn(t) -> (4, 4)
    T_world_cam. Returns (EventArray, stats dict)."""
    if cfg.event_budget_per_step <= 0:
        cfg = dataclasses.replace(cfg,
                                  event_budget_per_step=max(4096,
                                                            width * height))
    step_fn, E, B, HW = _make_camera_step(scene, K, width, height, cfg)
    # bound per-chunk output memory (t f32 + idx i32 + p bool = 9 B/slot)
    chunk_steps = max(8, min(chunk_steps, int(64e6 / (B * 9))))
    n_steps = int(round((t_end - t_start) / cfg.substep_dt))
    # per-pixel fixed-pattern thresholds
    c = cfg.contrast_threshold
    c_pos = c * (1 + cfg.threshold_fpn_sigma * rng.standard_normal(
        (height, width)))
    c_neg = c * (1 + cfg.threshold_fpn_sigma * rng.standard_normal(
        (height, width)))
    c_pos = jnp.asarray(np.clip(c_pos, 0.3 * c, 3 * c), jnp.float32)
    c_neg = jnp.asarray(np.clip(c_neg, 0.3 * c, 3 * c), jnp.float32)
    leak = np.full((height, width),
                   cfg.background_rate_hz * cfg.substep_dt)
    if cfg.num_hot_pixels > 0:
        hx = rng.integers(2, width - 2, cfg.num_hot_pixels)
        hy = rng.integers(2, height - 2, cfg.num_hot_pixels)
        leak[hy, hx] = min(cfg.hot_pixel_rate_hz * cfg.substep_dt, 1.0)
    leak = jnp.asarray(leak, jnp.float32)

    # initial reference = first frame (no event burst at t=0)
    T0 = pose_fn(t_start)
    L0, _ = jax.jit(lambda T: render_log_intensity(
        scene, T, jnp.asarray(K, jnp.float32), width, height))(
        jnp.asarray(T0, jnp.float32))
    ref = L0
    last_t = jnp.full((height, width), t_start - 1.0, jnp.float32)
    key = jax.random.PRNGKey(int(rng.integers(0, 2 ** 31)))
    carry = (ref, last_t, key)

    parts = []
    overflow = 0
    total = 0
    for s0 in range(0, n_steps, chunk_steps):
        s1 = min(s0 + chunk_steps, n_steps)
        S = s1 - s0
        if S < chunk_steps:  # pad the tail chunk to keep one compiled shape
            pad = chunk_steps - S
        else:
            pad = 0
        tt = t_start + (s0 + np.arange(S + pad)) * cfg.substep_dt
        poses = np.stack([np.asarray(pose_fn(float(t + cfg.substep_dt)),
                                     np.float32)[:3, :].reshape(12)
                          for t in tt])
        carry, (ot, oidx, op, ocnt) = step_fn(
            carry, jnp.asarray(poses), jnp.asarray(tt, jnp.float32),
            c_pos, c_neg, leak)
        ot = np.asarray(ot)[:S]
        oidx = np.asarray(oidx)[:S]
        op = np.asarray(op)[:S]
        ocnt = np.asarray(ocnt)[:S]
        for k in range(S):
            m = min(int(ocnt[k]), B)
            overflow += max(int(ocnt[k]) - B, 0)
            total += m
            parts.append((ot[k, :m], oidx[k, :m], op[k, :m]))
        if progress is not None:
            progress(s1, n_steps, total)

    t = np.concatenate([p[0] for p in parts]) if parts else np.zeros(0)
    idx = np.concatenate([p[1] for p in parts]) if parts else \
        np.zeros(0, np.int32)
    p = np.concatenate([p[2] for p in parts]) if parts else \
        np.zeros(0, bool)
    pix = idx % HW
    x = (pix % width).astype(np.int32)
    y = (pix // width).astype(np.int32)
    order = np.argsort(t, kind="stable")
    ev = EventArray(t=t[order].astype(np.float64), x=x[order], y=y[order],
                    p=p[order])
    stats = {"events": int(len(ev)), "overflow_dropped": int(overflow),
             "rate_ev_per_s": float(len(ev) / max(t_end - t_start, 1e-9))}
    produced = total + overflow
    if produced and overflow / produced > 0.01:
        import warnings
        warnings.warn(
            f"esim: budget dropped {overflow}/{produced} events "
            f"({100 * overflow / produced:.1f}%) — a biased loss (later "
            f"per-pixel crossings and leak/hot noise go first); raise "
            f"SensorConfig.event_budget_per_step (0 = auto H*W)")
    return ev, stats


def simulate_stereo(scene: PlaneScene, K: np.ndarray, width: int,
                    height: int, baseline: float, pose_fn, t_start: float,
                    t_end: float, cfg: SensorConfig,
                    rng: np.random.Generator, chunk_steps: int = 256,
                    progress=None):
    """Simulate both cameras of a rectified rig: the right camera sits at
    +baseline along x in the left frame (T_right_left translation
    -baseline, matching geometry.camera.make_ideal_rig). Returns
    (ev_left, ev_right, stats)."""
    T_lr = np.eye(4)
    T_lr[0, 3] = baseline  # T_world_right = T_world_left @ T_left_right

    def pose_right(t):
        return pose_fn(t) @ T_lr

    ev_l, st_l = simulate_camera(scene, K, width, height, pose_fn,
                                 t_start, t_end, cfg, rng, chunk_steps,
                                 progress)
    ev_r, st_r = simulate_camera(scene, K, width, height, pose_right,
                                 t_start, t_end, cfg, rng, chunk_steps,
                                 progress)
    return ev_l, ev_r, {"left": st_l, "right": st_r}


# ---------------------------------------------------------------------------
# dataset export (rpg directory layout consumed by scripts/run_dataset.py)
# ---------------------------------------------------------------------------

def write_calib_yaml(path: str, K: np.ndarray, width: int, height: int,
                     baseline: float, right: bool) -> None:
    """ESVO-format calibration yaml (CameraSystem::loadCalibInfo schema,
    CameraSystem.cpp:168-212): ideal rectified pinhole, zero distortion.

    All values are coerced to builtin float/int: yaml.safe_dump refuses
    numpy scalars (RepresenterError), and K almost always arrives as an
    ndarray."""
    fx, fy = float(K[0, 0]), float(K[1, 1])
    cx, cy = float(K[0, 2]), float(K[1, 2])
    baseline = float(baseline)
    tx = -fx * baseline if right else 0.0
    P = [fx, 0.0, cx, tx, 0.0, fy, cy, 0.0, 0.0, 0.0, 1.0, 0.0]
    T_rl = [1.0, 0.0, 0.0, -baseline,
            0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0]
    data = {
        "image_width": int(width), "image_height": int(height),
        "camera_matrix": {"rows": 3, "cols": 3,
                          "data": [fx, 0.0, cx, 0.0, fy, cy,
                                   0.0, 0.0, 1.0]},
        "distortion_model": "plumb_bob",
        "distortion_coefficients": {"rows": 1, "cols": 4,
                                    "data": [0.0, 0.0, 0.0, 0.0]},
        "rectification_matrix": {"rows": 3, "cols": 3,
                                 "data": [1.0, 0.0, 0.0, 0.0, 1.0, 0.0,
                                          0.0, 0.0, 1.0]},
        "projection_matrix": {"rows": 3, "cols": 4, "data": P},
        "T_right_left": {"rows": 3, "cols": 4, "data": T_rl},
    }
    import yaml
    with open(path, "w") as f:
        yaml.safe_dump(data, f, sort_keys=False)


def export_dataset(out_dir: str, scene: PlaneScene, K: np.ndarray,
                   width: int, height: int, baseline: float,
                   ev_l: EventArray, ev_r: EventArray,
                   gt_times: np.ndarray, gt_poses: np.ndarray,
                   meta: dict | None = None) -> None:
    """Write an rpg-layout dataset directory (events as packed npz — the
    loader accepts events_{left,right}.npz when no txt exists —
    groundtruth.txt in TUM format, calib/{left,right}.yaml, scene.npz +
    meta.json for analytic depth evaluation)."""
    from esvo_tpu.io.events import save_events_npz
    from esvo_tpu.eval.trajectory import save_tum
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "calib"), exist_ok=True)
    save_events_npz(os.path.join(out_dir, "events_left.npz"), ev_l)
    save_events_npz(os.path.join(out_dir, "events_right.npz"), ev_r)
    save_tum(os.path.join(out_dir, "groundtruth.txt"), gt_times, gt_poses)
    write_calib_yaml(os.path.join(out_dir, "calib", "left.yaml"),
                     K, width, height, baseline, right=False)
    write_calib_yaml(os.path.join(out_dir, "calib", "right.yaml"),
                     K, width, height, baseline, right=True)
    scene.save(os.path.join(out_dir, "scene.npz"))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"width": width, "height": height,
                   "baseline": baseline,
                   "K": np.asarray(K, float).tolist(),
                   **(meta or {})}, f, indent=1)
