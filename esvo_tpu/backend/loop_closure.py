"""Appearance-based loop-closure detection over time-surface keyframes.

A new capability beyond the reference (whose odometry drifts freely —
SURVEY.md section 5 lists no backend): keyframes carry a compact global
descriptor of their left time surface; revisits are detected by cosine
similarity against the keyframe database (one matmul on the MXU), gated
temporally, and verified geometrically by registering the candidate
keyframe's map points to the current time surface with the existing
tracking solver (tracking.registration). An accepted loop yields a
relative-pose edge for backend.pose_graph.

TPU structure: the descriptor is an average-pooled, mean-removed,
L2-normalized thumbnail (decay- and rate-invariant enough for time
surfaces, which are already photometry-free); the database is one
fixed-capacity (cap, dim) device matrix, so a query is a single
(cap, dim) @ (dim,) product — no trees, no host-side feature matching.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from esvo_tpu.tracking import registration as reg


@dataclasses.dataclass(frozen=True)
class LoopClosureConfig:
    desc_grid: tuple = (12, 16)         # thumbnail (rows, cols)
    min_similarity: float = 0.90        # cosine gate
    min_gap: int = 8                    # keyframes between query & match
    capacity: int = 512                 # keyframe database size
    verify_max_rms: float = 120.0       # TS-residual RMS gate (0..255)
    verify_min_points: int = 100
    # a point is an inlier when its negative-TS residual at the final
    # pose is below this (i.e. it lands on a bright edge)
    verify_inlier_threshold: float = 100.0
    verify_min_inlier_fraction: float = 0.6
    # information weights of an accepted loop edge (pose-graph units)
    w_rot: float = 200.0
    w_trans: float = 200.0


@functools.partial(jax.jit, static_argnames=("grid",))
def ts_descriptor(ts: jax.Array, grid: tuple = (12, 16)) -> jax.Array:
    """Time surface (H, W) -> normalized thumbnail descriptor (gh*gw,).

    Average-pool to the grid, remove the mean (decay-rate invariance),
    L2-normalize (event-rate invariance)."""
    gh, gw = grid
    d = jax.image.resize(ts.astype(jnp.float32), (gh, gw),
                         method="linear").reshape(-1)
    d = d - jnp.mean(d)
    n = jnp.linalg.norm(d)
    return d / jnp.where(n > 1e-6, n, 1.0)


class LoopClosureDetector:
    """Fixed-capacity keyframe descriptor database + query."""

    def __init__(self, cfg: LoopClosureConfig = LoopClosureConfig()):
        self.cfg = cfg
        dim = cfg.desc_grid[0] * cfg.desc_grid[1]
        self._D = jnp.zeros((cfg.capacity, dim), jnp.float32)
        self.count = 0

    def add_descriptor(self, d: jax.Array) -> int:
        """Register a precomputed descriptor; returns its index."""
        if self.count >= self.cfg.capacity:
            raise RuntimeError(
                "loop-closure database full — call drop_oldest() first")
        self._D = self._D.at[self.count].set(d)
        self.count += 1
        return self.count - 1

    def add(self, ts: jax.Array) -> int:
        """Register a keyframe's time surface; returns its index."""
        return self.add_descriptor(ts_descriptor(ts, self.cfg.desc_grid))

    def drop_oldest(self, n: int) -> None:
        """Evict the n oldest keyframes (callers must remap their own
        keyframe indices by -n)."""
        n = min(n, self.count)
        dim = self._D.shape[1]
        self._D = jnp.concatenate(
            [self._D[n:], jnp.zeros((n, dim), self._D.dtype)])
        self.count -= n

    def query_descriptor(self, d: jax.Array) -> tuple[int, float]:
        """Best temporally-distant match for a precomputed descriptor.

        Returns (keyframe index, cosine similarity); index -1 when no
        keyframe clears the temporal gap. Call before add()ing the
        current keyframe."""
        hi = self.count - self.cfg.min_gap
        if hi <= 0:
            return -1, 0.0
        sims = self._D @ d                       # (capacity,)
        mask = jnp.arange(self.cfg.capacity) < hi
        sims = jnp.where(mask, sims, -jnp.inf)
        idx = int(jnp.argmax(sims))
        return idx, float(sims[idx])

    def query(self, ts: jax.Array) -> tuple[int, float]:
        return self.query_descriptor(ts_descriptor(ts, self.cfg.desc_grid))


def verify_loop(points_world: jax.Array, point_valid: jax.Array,
                ts_cur: jax.Array, T_world_guess: np.ndarray,
                camera, reg_cfg: reg.RegProblemConfig,
                cfg: LoopClosureConfig):
    """Geometric verification: register the candidate keyframe's map
    points to the current time surface, starting from the candidate's
    own (drift-free) pose.

    Acceptance: final batch RMS below verify_max_rms AND a minimum
    fraction of ALL valid points landing on bright time-surface edges at
    the solved pose (inlier gate — RMS alone can look plausible when the
    Huber IRLS drags a subset onto unrelated structure).

    Returns (accepted, T_world_cur_corrected (4, 4), final_rms). The
    corrected pose is in the candidate's (old) world frame, so
    T_edge = inv(T_world_candidate) @ T_world_cur_corrected is the
    loop-edge measurement."""
    n_ok = int(jnp.sum(point_valid))
    if n_ok < cfg.verify_min_points:
        return False, np.asarray(T_world_guess), float("inf")
    Tg = jnp.asarray(T_world_guess, ts_cur.dtype)
    prob = reg.make_problem(Tg, Tg, points_world.astype(ts_cur.dtype),
                            point_valid, ts_cur, reg_cfg)
    prob, T_est, rms = reg.solve(prob, camera, reg_cfg)
    final_rms = float(np.asarray(rms)[-1])

    # inlier fraction at the solved pose over ALL valid points
    _, raw, proj_ok = reg.residuals_and_weights(
        prob, jnp.zeros(6, prob.points.dtype), prob.points,
        prob.point_valid, camera, reg_cfg)
    on_edge = (raw[:, 0] < cfg.verify_inlier_threshold) & proj_ok \
        & prob.point_valid
    inlier_frac = float(jnp.sum(on_edge)) / max(n_ok, 1)

    ok = (final_rms < cfg.verify_max_rms
          and inlier_frac >= cfg.verify_min_inlier_fraction)
    return ok, np.asarray(T_est, np.float64), final_rms
