"""6-DoF camera tracking: 3D-2D edge registration on negative time surfaces.

Re-designs the reference's ``RegProblemLM`` + ``RegProblemSolverLM``
(esvo_core/src/core/RegProblemLM.cpp, RegProblemSolverLM.cpp). The tracker
minimizes the negative-time-surface values at the reprojections of the
local map — edges of the scene align with recent events. The reference
evaluates residuals over CPU threads and hand-assembles an analytical
Jacobian; here both are single batched expressions over all points.

Preserved semantics:
- state is a Cayley-parameterized increment around (R, t) = T_ref_left
  decomposed from the pose guess (RegProblemLM.cpp:24-68),
- warping transform with SVD re-orthonormalization
  (getWarpingTransformation, RegProblemLM.cpp:322-346),
- residual = bilinear sample of 255 - TS(blurred) at the reprojection,
  255 where the reprojection leaves the image or the valid-pixel mask
  (thread(), RegProblemLM.cpp:138-176; isValidPatch :380-400),
- Huber IRLS weighting sqrt(w)*r with w = min(1, delta/r)
  (RegProblemLM.cpp:123-133),
- analytical Jacobian of the *raw* residual at x = 0 via Sobel-gradient
  lookup (df(), RegProblemLM.cpp:178-269) — the weights are not
  differentiated, matching the reference,
- the solver runs MAX_ITERATION one-step LM rounds over rotating
  deterministic batches of the shuffled point set, folding each increment
  into (R, t) (RegProblemSolverLM.cpp:148-217; addMotionUpdate,
  RegProblemLM.cpp:348-360).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from esvo_tpu.geometry.camera import Camera
from esvo_tpu.geometry.se3 import (cayley_to_rot, orthonormalize_rotation,
                                  orthonormalize_rotation_fast)


def _mv(M, v):
    """3x3 @ 3-vector at full f32 precision (TPU matmuls default to a
    single bf16 pass, which is fatal for pose arithmetic: the tracker's
    increments are ~1e-3 against ~1-scale rotations, below bf16's ~3
    significant digits — observed as wholesale tracker divergence on-chip
    while the identical CPU run converged)."""
    import jax.numpy as jnp
    return jnp.matmul(M, v, precision="highest")
from esvo_tpu.ops.interp import patch_interpolate, gather2d
from esvo_tpu.ops.linalg import solve_spd
from esvo_tpu.surface.time_surface import gaussian_blur, sobel_x, sobel_y


@struct.dataclass
class RegProblemConfig:
    """Defaults from cfg/tracking/tracking_rpg.yaml + RegProblemLM.h:24-45."""
    patch_size_x: int = struct.field(pytree_node=False, default=1)
    patch_size_y: int = struct.field(pytree_node=False, default=1)
    kernel_size: int = struct.field(pytree_node=False, default=5)
    huber_threshold: float = struct.field(pytree_node=False, default=50.0)
    max_registration_points: int = struct.field(pytree_node=False,
                                                default=2000)
    batch_size: int = struct.field(pytree_node=False, default=300)
    max_iteration: int = struct.field(pytree_node=False, default=10)
    ls_norm: str = struct.field(pytree_node=False, default="Huber")
    min_num_events: int = struct.field(pytree_node=False, default=1000)
    lm_damping: float = struct.field(pytree_node=False, default=1e-3)
    # reference RegProblemType (esvo_Tracking.cpp reads 0=numerical,
    # 1=analytical; RegProblemSolverLM.cpp:76-145 vs :148-217). The
    # analytical path requires 1x1 patches (the reference likewise only
    # uses the patch-centre gradient, RegProblemLM.cpp:219-223); the
    # numerical path supports arbitrary patch sizes via jacfwd.
    use_numerical_diff: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class RegProblem:
    """Problem data: map points in the ref frame + the current negative TS."""
    R: jax.Array            # (3, 3) rotation of T_ref_left
    t: jax.Array            # (3,)   translation of T_ref_left
    T_world_ref: jax.Array  # (4, 4)
    points: jax.Array       # (M, 3) map points in the ref camera frame
    point_valid: jax.Array  # (M,) bool
    ts_negative: jax.Array  # (H, W) 255 - blurred TS
    grad_u: jax.Array       # (H, W) Sobel d/du of ts_negative (unnormalized)
    grad_v: jax.Array       # (H, W)


def negative_time_surface(ts_left: jax.Array, kernel_size: int):
    """255 - (optionally Gaussian-blurred) TS + its Sobel gradients
    (TimeSurfaceObservation.h:107-147)."""
    if kernel_size > 0:
        blurred = gaussian_blur(ts_left, kernel_size)
    else:
        blurred = ts_left
    neg = 255.0 - blurred
    return neg, sobel_x(neg), sobel_y(neg)


def make_problem(T_world_ref: jax.Array, T_world_cur: jax.Array,
                 points_world: jax.Array, point_valid: jax.Array,
                 ts_left: jax.Array, cfg: RegProblemConfig) -> RegProblem:
    """Assemble the problem (reference setProblem, RegProblemLM.cpp:24-68).

    points_world: (M, 3) local-map points in world coordinates (already
    shuffled/subsampled to capacity M by the caller).
    """
    T_ref_left = jnp.linalg.solve(T_world_ref, T_world_cur)
    R = T_ref_left[:3, :3]
    t = T_ref_left[:3, 3]
    Rwr = T_world_ref[:3, :3]
    twr = T_world_ref[:3, 3]
    p_ref = jnp.einsum("ji,nj->ni", Rwr, points_world - twr,
                      precision="highest")
    neg, gu, gv = negative_time_surface(ts_left, cfg.kernel_size)
    return RegProblem(R=R, t=t, T_world_ref=T_world_ref, points=p_ref,
                      point_valid=point_valid, ts_negative=neg, grad_u=gu,
                      grad_v=gv)


def warping_transformation(R: jax.Array, t: jax.Array, x: jax.Array):
    """T_cur_ref from the 6-vector increment x = (cayley, dt)
    (getWarpingTransformation, RegProblemLM.cpp:322-346)."""
    dc = x[:3]
    dt = x[3:]
    dR = cayley_to_rot(dc)
    # products of two rotations are near-orthogonal: Newton-Schulz
    # replaces the SVD (an unfusable custom call inside every LM round)
    R_cur_ref = orthonormalize_rotation_fast(
        jnp.matmul(R.T, dR.T, precision="highest"))
    t_cur_ref = -_mv(R_cur_ref, dt + _mv(dR, t))
    return R_cur_ref, t_cur_ref


def _project_and_check(p_left: jax.Array, camera: Camera,
                       cfg: RegProblemConfig):
    """Pinhole projection + isValidPatch (RegProblemLM.cpp:380-416)."""
    P = camera.params.P
    W, H = camera.width, camera.height
    h = jnp.einsum("ij,nj->ni", P[:, :3], p_left,
                   precision="highest") + P[:, 3]
    x1 = h[:, :2] / h[:, 2:3]
    hx = (cfg.patch_size_x - 1) // 2
    hy = (cfg.patch_size_y - 1) // 2
    u = x1[:, 0]
    v = x1[:, 1]
    ok = (u >= hx) & (u <= W - hx - 1) & (v >= hy) & (v <= H - hy - 1) \
        & (h[:, 2] > 1e-9)
    ui = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 1)
    m = camera.mask
    # sorted sets deduplicate the corner offsets when hx or hy is 0
    # (1xN / Nx1 patches) — this runs inside the LM scan hot path
    for dy in sorted({-hy, hy}):
        for dx in sorted({-hx, hx}):
            ok = ok & gather2d(m, jnp.clip(vi + dy, 0, H - 1),
                               jnp.clip(ui + dx, 0, W - 1))
    return x1, ok


def residuals_and_weights(prob: RegProblem, x: jax.Array, points: jax.Array,
                          valid: jax.Array, camera: Camera,
                          cfg: RegProblemConfig):
    """Weighted residual vector over a point batch
    (operator(), RegProblemLM.cpp:91-176).

    Returns (fvec (B, P), raw residual (B, P), reprojection ok (B,)).
    """
    wx, wy = cfg.patch_size_x, cfg.patch_size_y
    Rw, tw = warping_transformation(prob.R, prob.t, x)
    p_left = jnp.einsum("ij,nj->ni", Rw, points,
                        precision="highest") + tw
    x1, ok = _project_and_check(p_left, camera, cfg)
    patch, ok_p = patch_interpolate(prob.ts_negative, x1, wy, wx)
    ok = ok & ok_p & valid
    r = jnp.where(ok[:, None], patch.reshape(patch.shape[0], -1), 255.0)
    if cfg.ls_norm == "Huber":
        w = jnp.where(r > cfg.huber_threshold,
                      cfg.huber_threshold / jnp.maximum(r, 1e-12), 1.0)
        fvec = jnp.sqrt(w) * r
    else:
        fvec = r
    return fvec, r, ok


def analytic_jacobian(prob: RegProblem, points: jax.Array, valid: jax.Array,
                      camera: Camera, cfg: RegProblemConfig) -> jax.Array:
    """Jacobian of the raw residual at x = 0 (df(), RegProblemLM.cpp:178-269).

    Derived directly: at x = 0 the warp is p_left = R^T (p - t) with
    d p_left / dc_k = -2 R^T [e_k]x p and d p_left / dt = -R^T (the
    reference reaches the same result through its J_G/dT_dG chain; the
    Cayley derivative at zero is dR/dc_k = -2 [e_k]x per computeJ_G,
    RegProblemLM.cpp:271-320). The TS gradient is the Sobel image
    bilinearly sampled and divided by 8 (RegProblemLM.cpp:219-223).
    Only 1x1 patches are supported — the reference likewise only uses the
    (0,0) gradient (RegProblemLM.cpp:223).
    """
    assert cfg.patch_size_x == 1 and cfg.patch_size_y == 1, \
        "analytic Jacobian implemented for 1x1 patches (reference default)"
    P = camera.params.P
    Rt = prob.R.T
    p_left = jnp.einsum("ij,nj->ni", Rt, points - prob.t,
                        precision="highest")
    x1, ok = _project_and_check(p_left, camera, cfg)
    gu, _ = patch_interpolate(prob.grad_u, x1, 1, 1)
    gv, okg = patch_interpolate(prob.grad_v, x1, 1, 1)
    grad = jnp.stack([gu[..., 0, 0], gv[..., 0, 0]], axis=-1) / 8.0  # (B, 2)
    ok = ok & okg & valid

    z = p_left[:, 2]
    z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    u_num = P[0, 0] * p_left[:, 0] + P[0, 1] * p_left[:, 1] + P[0, 3]
    v_num = P[1, 0] * p_left[:, 0] + P[1, 1] * p_left[:, 1] + P[1, 3]
    # dPi/dp_left (B, 2, 3) (RegProblemLM.cpp:225-230)
    dPi = jnp.stack([
        jnp.stack([P[0, 0] / z, P[0, 1] / z, -u_num / (z * z)], axis=-1),
        jnp.stack([P[1, 0] / z, P[1, 1] / z, -v_num / (z * z)], axis=-1),
    ], axis=-2)

    # dp_left/dc_k = -2 R^T (e_k x p); dp_left/dt = -R^T
    px, py, pz = points[:, 0], points[:, 1], points[:, 2]
    zero = jnp.zeros_like(px)
    cross = jnp.stack([
        jnp.stack([zero, -pz, py], axis=-1),
        jnp.stack([pz, zero, -px], axis=-1),
        jnp.stack([-py, px, zero], axis=-1),
    ], axis=-2)                                    # (B, 3, 3) = [p]x rows
    # e_k x p = -[p]x e_k -> stack over k gives +[p]x as columns... compute
    # directly: d/dc (B, 3, 3) with column k = -2 R^T (e_k x p) = 2 R^T [p]x e_k
    dp_dc = 2.0 * jnp.einsum("ij,njk->nik", Rt, cross,
                              precision="highest")
    dp_dt = -jnp.broadcast_to(Rt, dp_dc.shape)
    dp_dx = jnp.concatenate([dp_dc, dp_dt], axis=-1)  # (B, 3, 6)

    J = jnp.einsum("ni,nij,njk->nk", grad, dPi, dp_dx,
                   precision="highest")  # (B, 6)
    return jnp.where(ok[:, None], J, 0.0)


def numerical_jacobian(prob: RegProblem, points: jax.Array,
                       valid: jax.Array, camera: Camera,
                       cfg: RegProblemConfig) -> jax.Array:
    """Jacobian of the raw residual at x = 0 for arbitrary patch sizes.

    The reference's NumericalDiff solver path (solve_numerical,
    RegProblemSolverLM.cpp:76-145) finite-differences the full residual
    including every patch pixel. `jax.jacfwd` through the bilinear
    sampler gives the exact in-cell derivative that central differences
    estimate. Invalid reprojections contribute zero rows (their residual
    is the constant 255 sentinel).
    """
    dtype = prob.R.dtype

    def raw(x):
        _, r, _ = residuals_and_weights(prob, x, points, valid, camera, cfg)
        return r                                    # (B, P)

    J = jax.jacfwd(raw)(jnp.zeros(6, dtype=dtype))  # (B, P, 6)
    return J.reshape(-1, 6)


def add_motion_update(R: jax.Array, t: jax.Array, dx: jax.Array):
    """Fold an increment into (R, t) (addMotionUpdate,
    RegProblemLM.cpp:348-360)."""
    dR = cayley_to_rot(dx[:3])
    R_new = orthonormalize_rotation_fast(
        jnp.matmul(dR, R, precision="highest"))
    t_new = dx[3:] + _mv(dR, t)
    return R_new, t_new


def pose_of(prob: RegProblem) -> jax.Array:
    """T_world_cur from the current (R, t) (setPose,
    RegProblemLM.cpp:362-372)."""
    Rwr = prob.T_world_ref[:3, :3]
    twr = prob.T_world_ref[:3, 3]
    T = jnp.eye(4, dtype=prob.R.dtype)
    T = T.at[:3, :3].set(jnp.matmul(Rwr, prob.R,
                                    precision="highest"))
    T = T.at[:3, 3].set(_mv(Rwr, prob.t) + twr)
    return T


def solve(prob: RegProblem, camera: Camera, cfg: RegProblemConfig):
    """MAX_ITERATION one-step LM rounds over rotating point batches
    (solve_analytical, RegProblemSolverLM.cpp:148-217).

    Returns (problem with updated R/t, T_world_cur, rms (max_iteration,)):
    rms[i] is the post-update root-mean-square raw residual of round i's
    batch over VALID reprojections only (the 255 sentinel residuals of
    invalid/out-of-view points drive the LM cost, reference parity, but
    would swamp the diagnostic — LM_statics logs per-point residuals the
    same way, RegProblemSolverLM.h:26-31).
    """
    M = prob.points.shape[0]
    B = min(cfg.batch_size, M)
    num_batches = max(M // cfg.batch_size, 1)
    dtype = prob.R.dtype

    def batch_cost(R, t, pts, val):
        p = prob.replace(R=R, t=t)
        zero = jnp.zeros(6, dtype=dtype)
        fvec, r, ok = residuals_and_weights(p, zero, pts, val, camera, cfg)
        f = fvec.reshape(-1)
        n_res = jnp.maximum(jnp.sum(ok) * r.shape[1], 1)
        rms_valid = jnp.sqrt(
            jnp.sum(jnp.where(ok[:, None], r * r, 0.0)) / n_res)
        return f, jnp.sum(f * f), rms_valid

    def step(carry, it):
        R, t, lam = carry
        offset = (it % num_batches) * cfg.batch_size
        pts = jax.lax.dynamic_slice_in_dim(prob.points, offset, B, axis=0)
        val = jax.lax.dynamic_slice_in_dim(prob.point_valid, offset, B,
                                           axis=0)
        p = prob.replace(R=R, t=t)
        f, cost, rms_cur = batch_cost(R, t, pts, val)
        if cfg.use_numerical_diff or cfg.patch_size_x * cfg.patch_size_y > 1:
            J = numerical_jacobian(p, pts, val, camera, cfg)
        else:
            J = analytic_jacobian(p, pts, val, camera, cfg)
        g = jnp.matmul(J.T, f, precision="highest")
        H = jnp.matmul(J.T, J, precision="highest")
        damp = lam * jnp.diag(jnp.diag(H)) + 1e-12 * jnp.eye(6, dtype=dtype)
        # unrolled Cholesky fuses into the scan body (LU custom call won't)
        dx = -solve_spd(H + damp, g)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        R_try, t_try = add_motion_update(R, t, dx)
        _, cost_try, rms_try = batch_cost(R_try, t_try, pts, val)
        # Eigen LM's trust-region accept/reject
        # (RegProblemSolverLM.cpp:158-177 runs minimizeOneStep per batch)
        accept = cost_try < cost
        R_new = jnp.where(accept, R_try, R)
        t_new = jnp.where(accept, t_try, t)
        lam_new = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0),
                           1e-9, 1e6)
        return (R_new, t_new, lam_new), jnp.where(accept, rms_try, rms_cur)

    lam0 = jnp.asarray(cfg.lm_damping, dtype)
    (R, t, _), rms = jax.lax.scan(step, (prob.R, prob.t, lam0),
                                  jnp.arange(cfg.max_iteration))
    prob = prob.replace(R=R, t=t)
    return prob, pose_of(prob), rms
