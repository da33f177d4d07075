"""Local bundle adjustment with Schur-complement reduction, TPU-batched.

A new capability beyond the reference (SURVEY.md section 7, layer 6): the
reference's tracker drifts freely — there is no backend refining keyframe
poses against the map. This module implements the classic visual BA:

  min over poses {T_k} and points {p_i} of
     sum_obs rho( pi(T_k^-1 p_i) - uv_obs )

structured for TPU:
- every observation's 2-vector residual + its (2x6) pose and (2x3) point
  Jacobians evaluate in one batched expression (analytic, no autodiff in
  the loop);
- the normal equations are reduced by the Schur complement: point blocks
  C_i (3x3) invert in closed form (batched adjugate), the reduced camera
  system S = B - E C^-1 E^T assembles with segment-sums over observations,
  and only the small (6K x 6K) pose system is solved densely;
- points back-substitute in parallel;
- Huber IRLS on the reprojection residual, fixed GN trip count with
  per-iteration accept/reject damping (Levenberg-Marquardt);
- the observation axis shards across a device mesh with `psum` reductions
  (see esvo_tpu.parallel) — the assembly einsums are the only cross-shard
  traffic.

Pose increments are Cayley + translation around the current estimate,
matching the front-end tracker's parameterization
(esvo_core/src/core/RegProblemLM.cpp:322-346 for the reference math).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from esvo_tpu.geometry.se3 import cayley_to_rot, orthonormalize_rotation
from esvo_tpu.utils.precision import highest_precision


@struct.dataclass
class BAConfig:
    max_iterations: int = struct.field(pytree_node=False, default=10)
    huber_threshold: float = struct.field(pytree_node=False, default=2.0)
    damping: float = struct.field(pytree_node=False, default=1e-4)
    # gauge fixing: keep the first `num_fixed_poses` keyframes constant
    num_fixed_poses: int = struct.field(pytree_node=False, default=1)


@struct.dataclass
class BAProblem:
    """K keyframes, P points, M observations (fixed capacity, masked)."""
    T_world_kf: jax.Array   # (K, 4, 4) keyframe poses
    points: jax.Array       # (P, 3) world-space points
    obs_kf: jax.Array       # (M,) int32 keyframe index per observation
    obs_point: jax.Array    # (M,) int32 point index per observation
    obs_uv: jax.Array       # (M, 2) measured pixel
    obs_valid: jax.Array    # (M,) bool
    fx: jax.Array           # scalar intrinsics of the rectified camera
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array


def _inv3_batched(A):
    """(..., 3, 3) closed-form inverses (see geometry.camera.inv3)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co = jnp.stack([
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], -1),
        jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], -1),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], -1),
    ], -2)
    det = a * co[..., 0, 0] + b * co[..., 0, 1] + c * co[..., 0, 2]
    # note: co as built is the adjugate already (transposed cofactors)
    return co / det[..., None, None]


@highest_precision
def reprojection_residuals(prob: BAProblem):
    """(M, 2) residuals + per-observation Jacobians.

    Returns (r (M,2), Jc (M,2,6) wrt the obs's keyframe increment,
    Jp (M,2,3) wrt the obs's point, valid (M,)).

    Derivation mirrors the tracker's chain (p_cam = R^T (p - t);
    d p_cam/dc_k = -2 R^T [e_k]x p, d p_cam/dt = -R^T — see
    esvo_tpu/tracking/registration.py analytic_jacobian), with the extra
    d p_cam / d p = R^T for the point.
    """
    T = prob.T_world_kf[prob.obs_kf]          # (M, 4, 4)
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    p = prob.points[prob.obs_point]           # (M, 3)
    pc = jnp.einsum("nji,nj->ni", R, p - t)   # R^T (p - t)
    z = pc[:, 2]
    ok = prob.obs_valid & (z > 1e-6)
    zs = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    u = prob.fx * pc[:, 0] / zs + prob.cx
    v = prob.fy * pc[:, 1] / zs + prob.cy
    r = jnp.stack([u, v], axis=1) - prob.obs_uv

    # dPi/dpc (M, 2, 3)
    zero = jnp.zeros_like(z)
    dPi = jnp.stack([
        jnp.stack([prob.fx / zs, zero, -prob.fx * pc[:, 0] / zs ** 2], -1),
        jnp.stack([zero, prob.fy / zs, -prob.fy * pc[:, 1] / zs ** 2], -1),
    ], -2)

    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    cross = jnp.stack([
        jnp.stack([zero, -pz, py], -1),
        jnp.stack([pz, zero, -px], -1),
        jnp.stack([-py, px, zero], -1),
    ], -2)                                     # (M, 3, 3) = [p]x
    Rt = jnp.swapaxes(R, 1, 2)
    dpc_dc = 2.0 * jnp.einsum("nij,njk->nik", Rt, cross)   # (M, 3, 3)
    dpc_dt = -Rt
    dpc_dx = jnp.concatenate([dpc_dc, dpc_dt], axis=-1)    # (M, 3, 6)

    Jc = jnp.einsum("nij,njk->nik", dPi, dpc_dx)           # (M, 2, 6)
    Jp = jnp.einsum("nij,njk->nik", dPi, Rt)               # (M, 2, 3)
    mask = ok[:, None]
    return jnp.where(mask, r, 0.0), \
        jnp.where(mask[..., None], Jc, 0.0), \
        jnp.where(mask[..., None], Jp, 0.0), ok


@highest_precision
def assemble_normal_equations(prob: BAProblem, cfg: BAConfig,
                              axis_name=None):
    """Weighted GN normal-equation blocks via segment sums.

    Returns (B (K,6,6), C (P,3,3), gc (K,6), gp (P,3), E_obs (M,6,3),
    cost): fully observation-indexed — the dense per-(point, keyframe)
    cross tensor (P, K, 6, 3) is never materialized (E_obs stays on the
    observation axis; downstream Schur columns reduce it with further
    segment sums, see _gn_step). With `axis_name` the observation axis
    is sharded and every reduction psums over the mesh. Single site for
    the Huber weighting shared by the solver and the raw-block export
    (parallel.sharding.sharded_ba_normal_equations)."""
    K = prob.T_world_kf.shape[0]
    P = prob.points.shape[0]
    psum = ((lambda x: jax.lax.psum(x, axis_name)) if axis_name
            else (lambda x: x))
    r, Jc, Jp, ok = reprojection_residuals(prob)

    # Huber IRLS weights on the residual norm
    rn = jnp.linalg.norm(r, axis=1)
    w = jnp.where(rn > cfg.huber_threshold,
                  cfg.huber_threshold / jnp.maximum(rn, 1e-12), 1.0)
    w = jnp.where(ok, w, 0.0)
    cost = psum(jnp.sum(w * rn * rn))

    wJc = Jc * w[:, None, None]
    wJp = Jp * w[:, None, None]

    B = psum(jnp.zeros((K, 6, 6)).at[prob.obs_kf].add(
        jnp.einsum("nij,nik->njk", wJc, Jc)))            # (K, 6, 6)
    C = psum(jnp.zeros((P, 3, 3)).at[prob.obs_point].add(
        jnp.einsum("nij,nik->njk", wJp, Jp)))            # (P, 3, 3)
    gc = psum(jnp.zeros((K, 6)).at[prob.obs_kf].add(
        jnp.einsum("nij,ni->nj", wJc, r)))
    gp = psum(jnp.zeros((P, 3)).at[prob.obs_point].add(
        jnp.einsum("nij,ni->nj", wJp, r)))
    E_obs = jnp.einsum("nij,nik->njk", wJc, Jp)          # (M, 6, 3)
    return B, C, gc, gp, E_obs, cost


@highest_precision
def _gn_step(prob: BAProblem, cfg: BAConfig, lam, axis_name=None):
    """One damped Schur-complement GN step. Returns (dx_poses (K,6),
    dpoints (P,3), cost).

    Assembly is fully *observation-indexed*: the Schur cross-term
    S_{kl} = sum_p E_{p,k} C_p^-1 E_{p,l}^T never materializes the
    per-(point, keyframe) block tensor (P, K, 6, 3) — it is built
    column-by-column with segment sums over observations, so memory is
    O(M + P + K^2) and the window can grow past the local 6-keyframe
    case. With `axis_name` set, the observation axis is sharded across a
    device mesh (shard_map) and every segment-sum reduces with a psum —
    this is the distributed Schur reduction from SURVEY.md section 2
    (replacing the reference's thread striping, DepthProblemSolver.cpp:80-90).
    """
    K = prob.T_world_kf.shape[0]
    P = prob.points.shape[0]
    psum = ((lambda x: jax.lax.psum(x, axis_name)) if axis_name
            else (lambda x: x))
    B, C, gc, gp, E_obs, cost = assemble_normal_equations(
        prob, cfg, axis_name)

    # LM damping on the diagonals
    B = B + lam * jnp.eye(6)[None] * B + 1e-8 * jnp.eye(6)
    C = C + lam * jnp.eye(3)[None] * C + 1e-8 * jnp.eye(3)
    Cinv = _inv3_batched(C)                              # (P, 3, 3)

    # F_n = E_obs_n C_{p(n)}^-1
    F = jnp.einsum("nab,nbc->nac", E_obs, Cinv[prob.obs_point])  # (M, 6, 3)

    # Schur cross-term, one keyframe column at a time:
    # S_{kl} = sum_n [kf(n)=k] F_n A_{p(n),l}^T with
    # A_{p,l} = sum_{m: point(m)=p, kf(m)=l} E_obs_m
    def s_off_col(l):
        sel = (prob.obs_kf == l)[:, None, None]
        A = psum(jnp.zeros((P, 6, 3)).at[prob.obs_point].add(
            jnp.where(sel, E_obs, 0.0)))                 # (P, 6, 3)
        contrib = jnp.einsum("nab,ncb->nac", F, A[prob.obs_point])
        return psum(jnp.zeros((K, 6, 6)).at[prob.obs_kf].add(contrib))

    S_off_cols = jax.lax.map(s_off_col, jnp.arange(K))   # (l, k, 6, 6)
    S_blocks = -jnp.moveaxis(S_off_cols, 0, 1)           # (k, l, 6, 6)
    S_blocks = S_blocks.at[jnp.arange(K), jnp.arange(K)].add(B)
    # reduced gradient: g_k = gc_k - sum_n [kf(n)=k] F_n gp_{p(n)}
    g_red = gc - psum(jnp.zeros((K, 6)).at[prob.obs_kf].add(
        jnp.einsum("nab,nb->na", F, gp[prob.obs_point])))

    # gauge fixing: freeze the first num_fixed_poses keyframes
    fixed = jnp.arange(K) < cfg.num_fixed_poses
    S_mat = jnp.moveaxis(S_blocks, 2, 1).reshape(K * 6, K * 6)
    fixed_rows = jnp.repeat(fixed, 6)
    S_mat = jnp.where(fixed_rows[:, None] | fixed_rows[None, :], 0.0,
                      S_mat)
    S_mat = S_mat + jnp.diag(jnp.where(fixed_rows, 1.0, 0.0))
    g_vec = jnp.where(fixed_rows, 0.0, g_red.reshape(-1))

    dx = -jnp.linalg.solve(S_mat + 1e-9 * jnp.eye(K * 6), g_vec)
    dx_poses = dx.reshape(K, 6)

    # back-substitute: dp_p = -C_p^-1 (gp_p + sum_{n: p(n)=p} E_obs_n^T dx_{kf(n)})
    Edx = psum(jnp.zeros((P, 3)).at[prob.obs_point].add(
        jnp.einsum("nab,na->nb", E_obs, dx_poses[prob.obs_kf])))
    dpoints = -jnp.einsum("pij,pj->pi", Cinv, gp + Edx)
    return dx_poses, dpoints, cost


@highest_precision
def _apply(prob: BAProblem, dx_poses, dpoints, cfg: BAConfig):
    def upd_pose(T, dx):
        dR = cayley_to_rot(dx[:3])
        R = orthonormalize_rotation(dR @ T[:3, :3])
        t = dx[3:] + dR @ T[:3, 3]
        return T.at[:3, :3].set(R).at[:3, 3].set(t)

    K = prob.T_world_kf.shape[0]
    fixed = jnp.arange(K) < cfg.num_fixed_poses
    T_new = jax.vmap(upd_pose)(prob.T_world_kf, dx_poses)
    T_new = jnp.where(fixed[:, None, None], prob.T_world_kf, T_new)
    return prob.replace(T_world_kf=T_new, points=prob.points + dpoints)


@highest_precision
def _cost_only(prob: BAProblem, cfg: BAConfig, axis_name=None):
    r, _, _, ok = reprojection_residuals(prob)
    rn = jnp.linalg.norm(r, axis=1)
    w = jnp.where(rn > cfg.huber_threshold,
                  cfg.huber_threshold / jnp.maximum(rn, 1e-12), 1.0)
    w = jnp.where(ok, w, 0.0)
    cost = jnp.sum(w * rn * rn)
    return jax.lax.psum(cost, axis_name) if axis_name else cost


def bundle_adjust(prob: BAProblem, cfg: BAConfig = BAConfig(),
                  axis_name=None):
    """Run LM-damped Schur GN. Returns (problem, cost history (iters,)).

    `axis_name`: when called inside shard_map with the observation axis
    sharded, every segment reduction psums over that axis; poses and
    points stay replicated (see sharded_bundle_adjust in
    esvo_tpu.parallel.sharding)."""

    def step(carry, _):
        prob, lam = carry
        dxp, dpt, cost = _gn_step(prob, cfg, lam, axis_name)
        trial = _apply(prob, dxp, dpt, cfg)
        new_cost = _cost_only(trial, cfg, axis_name)
        accept = new_cost < cost
        prob = jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(accept, (1,) * a.ndim), b, a)
            if a.dtype != jnp.int32 and a.dtype != bool else a,
            prob, trial)
        lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0), 1e-9, 1e3)
        return (prob, lam), cost

    (prob, _), costs = jax.lax.scan(
        step, (prob, jnp.asarray(cfg.damping)), None,
        length=cfg.max_iterations)
    return prob, costs
