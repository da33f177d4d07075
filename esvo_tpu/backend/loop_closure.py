"""Appearance-based loop-closure detection over time-surface keyframes.

A new capability beyond the reference (whose odometry drifts freely —
SURVEY.md section 5 lists no backend): keyframes carry a compact global
descriptor of their left time surface; revisits are detected by cosine
similarity against the keyframe database (one matmul on the MXU), gated
temporally, and verified geometrically. The default verification aligns
the candidate and current keyframes' local 3D clouds with a fixed-trip
masked ICP (icp_align / verify_loop_icp) — registering stale map points
against the CURRENT time surface (verify_loop, also provided) fails
across long gaps because a time surface only shows recently active
edges. An accepted loop yields a relative-pose edge for
backend.pose_graph.

TPU structure: the descriptor is an average-pooled, mean-removed,
L2-normalized thumbnail (decay- and rate-invariant enough for time
surfaces, which are already photometry-free); the database is one
fixed-capacity (cap, dim) device matrix, so a query is a single
(cap, dim) @ (dim,) product; the ICP nearest-neighbour search is one
(N, M) distance matmul per iteration — no trees, no host-side feature
matching.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from esvo_tpu.tracking import registration as reg
from esvo_tpu.utils.precision import highest_precision


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
    # 3D-3D (ICP) verification of candidate loops — the default path:
    # staleness-free, unlike registering stale map points against the
    # current (recently-active-edges-only) time surface
    icp_max_corr_dist: float = 0.05     # m; correspondence/inlier radius
    icp_iters: int = 10
    # cap on the adaptive coarse-to-fine start radius (x max_corr_dist):
    # the capture basin must cover realistic inter-visit drift (tens of
    # cm) but NOT be so wide that two dense clouds of different places
    # can be pseudo-aligned from far away
    icp_coarse_mult: float = 12.0
    # two event-camera keyframes of the same place still cover partially
    # DISJOINT edge subsets (whichever edges fired during each mapping
    # window), so the inlier gate must tolerate partial overlap
    # (disjoint-place clouds score < 0.2 on the same gate)
    icp_min_inlier_fraction: float = 0.30
    icp_max_mean_dist: float = 0.02     # m; mean inlier residual gate
    # drift-plausibility gate on the accepted edge: the ICP correction
    # relative to the odometry guess is bounded by the drift two visits
    # can physically accumulate — a larger "correction" means the
    # dual-start glued clouds of different places (dense clouds of the
    # same density can pseudo-align once the centroid start overlaps
    # them, with inlier stats near the accept region).
    # The translation bound is DRIFT-PROPORTIONAL when the caller passes
    # the elapsed time between the two visits (gap_s):
    #     cap = min(icp_max_correction_trans,
    #               icp_drift_floor + icp_drift_rate * gap_s)
    # so a 10 s revisit cannot claim the metre-scale correction that a
    # flat cap sized for worst-case bootstrap drift would admit (the r4
    # campaign's 2 m flat cap let 14/189 false edges through); without
    # gap_s the flat cap applies.
    icp_max_correction_trans: float = 1.0   # m (absolute ceiling)
    icp_max_correction_rot: float = 0.5     # rad
    icp_drift_rate: float = 0.05            # m of drift per elapsed second
    icp_drift_floor: float = 0.3            # m minimum allowance
    # forward-backward (reciprocal) consistency: re-run the ICP with the
    # clouds swapped, starting from the inverse of the forward estimate;
    # a genuine revisit converges to the inverse transform while a
    # pseudo-alignment of different places generally does not compose to
    # identity. Composition tolerances:
    reciprocal: bool = True
    reciprocal_tol_trans: float = 0.10      # m
    reciprocal_tol_rot: float = 0.10        # rad
    # information weights of an accepted loop edge (pose-graph units);
    # per-edge weights are scaled by the ICP inlier statistics (see
    # verify_loop_icp's edge_quality)
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


@functools.partial(jax.jit,
                   static_argnames=("iters", "centroid_init"))
@highest_precision
def icp_align(pts_a: jax.Array, valid_a: jax.Array, pts_b: jax.Array,
              valid_b: jax.Array, T_ab0: jax.Array,
              max_corr_dist: float, iters: int = 10,
              coarse_mult: float = 12.0, centroid_init: bool = False):
    """Point-to-point ICP: estimate T_ab with p_a ~ T_ab p_b.

    Verifying a loop by registering map points against the CURRENT time
    surface fails across long gaps — a time surface only shows edges
    active in the last few decay constants, so stale (perfectly valid)
    map points land on dark pixels and the solve slides. The two
    keyframes' 3D clouds have no such staleness: align them directly.

    TPU structure: the nearest-neighbour search each iteration is one
    (N, M) distance matrix via a single matmul (MXU); the pose update is
    a weighted Kabsch fit (3x3 SVD). Fixed trip count, masked
    correspondences — no data-dependent shapes.

    The correspondence radius anneals coarse-to-fine: the initial guess
    inv(T_a_est) T_b_est carries the tracker drift accumulated BETWEEN
    the two visits — routinely tens of centimetres on a minutes-long
    loop — and a fixed tight radius finds zero correspondences and never
    converges (observed: every genuine lap revisit of the 64 s campaign
    rejected with inlier_fraction 0.0). The start radius adapts to the
    measured initial misalignment (2x the median initial NN distance),
    so a well-initialized alignment anneals from ~max_corr_dist and
    behaves exactly like the fixed-radius ICP, while a drifted one gets
    a basin wide enough to capture. The inlier gate at the end still
    uses the tight final radius, so disjoint-place clouds are rejected
    exactly as before.

    Returns (T_ab (4, 4), inlier_fraction, mean_inlier_dist).
    """
    dt = pts_a.dtype
    T0 = T_ab0.astype(dt)
    a2 = jnp.sum(pts_a * pts_a, axis=1)
    big = jnp.asarray(1e30, dt)

    def nn(pb_t):
        """For each valid b point (transformed), nearest valid a point."""
        b2 = jnp.sum(pb_t * pb_t, axis=1)
        d2 = a2[:, None] + b2[None, :] - 2.0 * (pts_a @ pb_t.T)  # (N, M)
        d2 = jnp.where(valid_a[:, None], d2, big)
        idx = jnp.argmin(d2, axis=0)                             # (M,)
        d = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=0), 0.0))
        return idx, d

    def body(T, radius):
        pb_t = pts_b @ T[:3, :3].T + T[:3, 3]
        idx, d = nn(pb_t)
        w = (valid_b & (d < radius)).astype(dt)
        wsum = jnp.maximum(jnp.sum(w), 1e-6)
        tgt = pts_a[idx]                                  # (M, 3)
        ca = jnp.sum(w[:, None] * tgt, axis=0) / wsum
        cb = jnp.sum(w[:, None] * pb_t, axis=0) / wsum
        Hm = jnp.einsum("m,mi,mj->ij", w, pb_t - cb, tgt - ca) / wsum
        U, _, Vt = jnp.linalg.svd(Hm)
        det = jnp.linalg.det(Vt.T @ U.T)
        S = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], dt)).at[2, 2].set(det)
        R = Vt.T @ S @ U.T                                # b->a increment
        t = ca - R @ cb
        T_new = jnp.eye(4, dtype=dt).at[:3, :3].set(R).at[:3, 3].set(t)
        return T_new @ T, None

    if centroid_init:
        # centroid pre-alignment: a descriptor-verified revisit sees
        # (nearly) the same scene region, so the clouds' centroids
        # coincide up to overlap asymmetry — subtracting the centroid gap
        # removes the bulk of the inter-visit translation drift, which
        # routinely exceeds the NN capture radius of semi-dense clouds
        # (~0.1 m point spacing). Overlap asymmetry makes this WORSE than
        # a good odometry guess, so verify_loop_icp runs both starts and
        # keeps the better (dual-start).
        wa = valid_a.astype(dt)
        wb = valid_b.astype(dt)
        ca0 = jnp.sum(wa[:, None] * pts_a, axis=0) / jnp.maximum(
            jnp.sum(wa), 1e-6)
        pb_raw = pts_b @ T0[:3, :3].T + T0[:3, 3]
        cb0 = jnp.sum(wb[:, None] * pb_raw, axis=0) / jnp.maximum(
            jnp.sum(wb), 1e-6)
        T0 = T0.at[:3, 3].add(ca0 - cb0)

    # adaptive coarse-to-fine radius schedule (see docstring), capped so
    # clouds of genuinely different places stay uncapturable
    pb0 = pts_b @ T0[:3, :3].T + T0[:3, 3]
    _, d0 = nn(pb0)
    med0 = jnp.nanquantile(jnp.where(valid_b, d0, jnp.nan), 0.5)
    med0 = jnp.where(jnp.isfinite(med0), med0, 0.0)
    r0 = jnp.clip(2.0 * med0, max_corr_dist,
                  coarse_mult * max_corr_dist)
    radii = jnp.maximum(r0 * 0.5 ** jnp.arange(iters, dtype=dt),
                        max_corr_dist)
    T, _ = jax.lax.scan(body, T0, radii)
    pb_t = pts_b @ T[:3, :3].T + T[:3, 3]
    _, d = nn(pb_t)
    inl = valid_b & (d < max_corr_dist)
    n_b = jnp.maximum(jnp.sum(valid_b), 1)
    frac = jnp.sum(inl) / n_b.astype(dt)
    mean_d = jnp.sum(jnp.where(inl, d, 0.0)) \
        / jnp.maximum(jnp.sum(inl), 1).astype(dt)
    return T, frac, mean_d


def edge_quality(frac: float, frac_rev: float, mean_d: float,
                 cfg: LoopClosureConfig) -> float:
    """Scale factor in (0, 1] for an accepted edge's information weight.

    Information of a point-cloud alignment scales with the inlier count
    and inversely with the residual scale; normalizing against the gate
    values puts a just-barely-accepted edge well below a tight one, so
    the pose graph's Huber does not have to absorb weak edges at full
    weight (r4: 14 false edges at full weight cost 0.2+ m of pg ATE)."""
    f = min(frac, frac_rev) if frac_rev >= 0 else frac
    q = f * min(1.0, cfg.icp_max_mean_dist / max(mean_d, 1e-9))
    return float(np.clip(q, 0.05, 1.0))


def verify_loop_icp(p_cand: jax.Array, valid_cand: jax.Array,
                    p_cur: jax.Array, valid_cur: jax.Array,
                    T_world_cand, T_world_cur_est,
                    cfg: LoopClosureConfig, gap_s: float | None = None):
    """Geometric loop verification by aligning the candidate and current
    keyframes' local 3D clouds (see icp_align).

    Gates, in order: inlier fraction, mean inlier residual,
    drift-proportional correction plausibility (see LoopClosureConfig;
    `gap_s` is the elapsed time between the two keyframes), and
    forward-backward (reciprocal) consistency — the swapped-cloud ICP
    started from the inverse estimate must compose with the forward
    estimate to (near) identity.

    p_cand/p_cur: (N, 3)/(M, 3) points in each keyframe's CAMERA frame.
    Returns (accepted, T_edge (4, 4), inlier_fraction, mean_dist, info)
    with T_edge = T_cand^-1 T_cur such that p_cand = T_edge p_cur; info
    is a per-call diagnostics dict (gate-by-gate values + the edge
    quality for information weighting)."""
    Ta = np.asarray(T_world_cand, np.float64)
    Tb = np.asarray(T_world_cur_est, np.float64)
    T0 = jnp.asarray(np.linalg.inv(Ta) @ Tb, p_cand.dtype)
    # dual-start: the raw odometry guess wins when drift is small; the
    # centroid-pre-aligned start captures large inter-visit drift
    T, frac, mean_d = icp_align(p_cand, valid_cand, p_cur, valid_cur, T0,
                                cfg.icp_max_corr_dist, cfg.icp_iters,
                                cfg.icp_coarse_mult, centroid_init=False)
    T2, frac2, mean_d2 = icp_align(p_cand, valid_cand, p_cur, valid_cur,
                                   T0, cfg.icp_max_corr_dist,
                                   cfg.icp_iters, cfg.icp_coarse_mult,
                                   centroid_init=True)
    if float(frac2) > float(frac) or (float(frac2) == float(frac)
                                      and float(mean_d2) < float(mean_d)):
        T, frac, mean_d = T2, frac2, mean_d2
    frac = float(frac)
    mean_d = float(mean_d)
    # drift-plausibility gate, proportional to the inter-visit gap when
    # known (see LoopClosureConfig)
    cap_t = cfg.icp_max_correction_trans
    if gap_s is not None:
        cap_t = min(cap_t,
                    cfg.icp_drift_floor + cfg.icp_drift_rate * abs(gap_s))
    dT = np.linalg.inv(np.asarray(T0, np.float64)) @ np.asarray(
        T, np.float64)
    corr_t = float(np.linalg.norm(dT[:3, 3]))
    corr_r = float(np.arccos(np.clip(
        (np.trace(dT[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)))
    ok = (frac >= cfg.icp_min_inlier_fraction
          and mean_d <= cfg.icp_max_mean_dist
          and corr_t <= cap_t
          and corr_r <= cfg.icp_max_correction_rot)
    # reciprocal (forward-backward) consistency — only spent on edges
    # that cleared every cheap gate
    frac_rev, recip_t, recip_r = -1.0, -1.0, -1.0
    if ok and cfg.reciprocal:
        T_np = np.asarray(T, np.float64)
        T_rev, frac_rev, _ = icp_align(
            p_cur, valid_cur, p_cand, valid_cand,
            jnp.asarray(np.linalg.inv(T_np), p_cand.dtype),
            cfg.icp_max_corr_dist, cfg.icp_iters, cfg.icp_coarse_mult,
            centroid_init=False)
        frac_rev = float(frac_rev)
        comp = T_np @ np.asarray(T_rev, np.float64)    # ~ identity
        recip_t = float(np.linalg.norm(comp[:3, 3]))
        recip_r = float(np.arccos(np.clip(
            (np.trace(comp[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)))
        ok = (recip_t <= cfg.reciprocal_tol_trans
              and recip_r <= cfg.reciprocal_tol_rot
              and frac_rev >= cfg.icp_min_inlier_fraction)
    # per-call diagnostics returned to the caller (gate-by-gate values)
    info = {"frac": frac, "mean_d": mean_d, "corr_t": corr_t,
            "corr_r": corr_r, "cap_t": cap_t, "frac_rev": frac_rev,
            "recip_t": recip_t, "recip_r": recip_r,
            "quality": edge_quality(frac, frac_rev, mean_d, cfg)}
    return ok, np.asarray(T, np.float64), frac, mean_d, info
