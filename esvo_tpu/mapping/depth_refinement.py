"""Per-event inverse-depth refinement — batched 1-DoF Levenberg-Marquardt.

Re-designs the reference's ``DepthProblem`` + ``DepthProblemSolver``
(esvo_core/src/core/DepthProblem.cpp, DepthProblemSolver.cpp). The reference
runs one Eigen LevenbergMarquardt per matched event, numerically
differentiated, striped over 4 CPU threads. Here *all* events take the same
fixed number of masked LM steps simultaneously:

- the residual (one stereo patch difference per event) is pure gather +
  vector math, evaluated for all events at once;
- the scalar Jacobian comes from one `jax.jacfwd` — exact where the
  reference uses finite differences (bilinear interpolation is piecewise
  linear, so the in-cell derivative is what numerical diff estimates);
- the Student-t scale fixed-point loop (DepthProblem.cpp:96-124) becomes a
  fixed-trip loop with a convergence freeze mask — differentiable and
  jit-stable;
- Eigen LM's data-dependent termination (DepthProblemSolver.cpp:158-188)
  becomes MAX_ITERATION masked damped steps with per-event accept/reject.

Semantics preserved:
- warping of the event coordinate through the virtual view into both time
  surfaces (DepthProblem.cpp:162-191) with the same patch-boundary checks,
- residual norms l2 / zncc / Tdist incl. the out-of-bounds 255 penalty
  (DepthProblem.cpp:34-160),
- variance from the final Jacobian: l2 ``|r|^2/(m-1) / JtJ``, Tdist
  ``td_stdvar^2 / JtJ`` (DepthProblemSolver.cpp:195-212),
- rejection of solutions with inverse depth <= 0.001
  (DepthProblemSolver.cpp:190-193),
- conversion to depth-point statistics with
  ``scale2_rho = var * (nu - 2) / nu`` (DepthProblemSolver.cpp:114-134),
- point culling thresholds (DepthProblemSolver.cpp:216-244).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from esvo_tpu.geometry.camera import StereoRig, cam_to_world, inv3
from esvo_tpu.geometry.se3 import rows_apply, rows_from_matrices
from esvo_tpu.ops.interp import patch_interpolate, slice_patches


@struct.dataclass
class DepthProblemConfig:
    """Reference: DepthProblemConfig (esvo_core/core/DepthProblem.h:15-51);
    defaults from cfg/mapping/mapping_rpg.yaml."""
    patch_size_x: int = struct.field(pytree_node=False, default=15)
    patch_size_y: int = struct.field(pytree_node=False, default=7)
    ls_norm: str = struct.field(pytree_node=False, default="Tdist")
    td_nu: float = struct.field(pytree_node=False, default=2.1897)
    td_scale: float = struct.field(pytree_node=False, default=16.6397)
    max_iteration: int = struct.field(pytree_node=False, default=10)
    regularization_radius: int = struct.field(pytree_node=False, default=5)
    regularization_min_neighbours: int = struct.field(pytree_node=False,
                                                      default=8)
    regularization_min_close_neighbours: int = struct.field(
        pytree_node=False, default=8)
    # fixed trip count replacing the reference's data-dependent scale loop
    td_fixed_point_iters: int = struct.field(pytree_node=False, default=10)
    # LM patch sampling: events gather one (patch + 2*margin) window per
    # surface per cycle; every LM iteration then samples its patch from
    # the window with bilinear one-hot matmuls (MXU work) instead of
    # re-gathering from HBM. margin bounds how far the solution may move
    # from the BM initialization before the residual degrades to the
    # out-of-bounds penalty; < 0 disables windowing (direct gathers).
    window_margin: int = struct.field(pytree_node=False, default=8)
    # LM execution backend: "auto" runs the fused Pallas kernel
    # (ops/pallas_lm.py — all iterations in VMEM, shift-select patch
    # sampling, analytic depth Jacobian) on TPU for f32 Tdist/l2 and
    # the XLA scan elsewhere; "pallas" forces the kernel (interpret
    # mode off-TPU — CPU parity tests); "xla" forces the scan.
    lm_kernel: str = struct.field(pytree_node=False, default="auto")

    @property
    def td_scale_squared(self) -> float:
        return self.td_scale * self.td_scale

    @property
    def td_stdvar(self) -> float:
        # td_stdvar = sqrt(nu/(nu-2)) * scale (DepthProblem.h:34-36)
        return math.sqrt(self.td_nu / (self.td_nu - 2.0)) * self.td_scale

    @property
    def patch_area(self) -> int:
        return self.patch_size_x * self.patch_size_y


@struct.dataclass
class DepthEstimates:
    """Batched DepthPoint fields (reference container/DepthPoint.h:70-88)."""
    x: jax.Array           # (N, 2) sub-pixel rectified left coordinate
    inv_depth: jax.Array   # (N,)
    variance: jax.Array    # (N,)
    scale2: jax.Array      # (N,) Student-t scale^2 (Tdist only)
    nu: jax.Array          # (N,)
    residual: jax.Array    # (N,) |r|^2 at the solution
    age: jax.Array         # (N,) int32 fusion count
    p_cam: jax.Array       # (N, 3) 3D point in its own (virtual) camera frame
    T_world_cam: jax.Array  # (N, 4, 4) pose of that (virtual) camera
    # (solve() internally converts poses to the SoA (12, N) rows layout —
    # geometry/se3.py — but the container keeps the matrix layout that the
    # fusion/runtime/checkpoint consumers exchange)
    valid: jax.Array       # (N,) bool


def _tdist_weights(r: jax.Array, r2: jax.Array, nu: float, scale2_init,
                   iters: int):
    """Iteratively re-estimated Student-t scale^2 per event, then weights.

    Mirrors DepthProblem.cpp:88-135: fixed-point on
    scale2 <- mean_i( r_i^2 (nu+1) / (nu + r_i^2/scale2) ) (zeros excluded
    from the sum but not the mean), 5% relative-change stopping -> here a
    fixed-trip loop with a freeze mask. r: (..., P).

    The returned weights carry no tangent (stop_gradient): IRLS
    Gauss-Newton differentiates sqrt(w)*r with the weights frozen. The
    reference's NumericalDiff perturbation does include the weights'
    sensitivity to d, but that term is second-order in the residual and
    differentiating through the 10-trip fixed point tripled the jvp cost
    of every LM iteration; convergence and variance statistics are
    unchanged (test_solve_converges_to_true_depth).
    """
    r = jax.lax.stop_gradient(r)
    r2 = jax.lax.stop_gradient(r2)
    P = r.shape[-1]
    nonzero = r != 0.0

    def contribution(s2):
        c = r2 * (nu + 1.0) / (nu + r2 / s2[..., None])
        return jnp.sum(jnp.where(nonzero, c, 0.0), axis=-1) / P

    s2 = jnp.broadcast_to(jnp.asarray(scale2_init, r.dtype), r.shape[:-1])
    done = jnp.zeros(r.shape[:-1], dtype=bool)
    for _ in range(iters):
        s2_new = contribution(s2)
        degenerate = s2_new == 0.0
        s2_new = jnp.where(degenerate, scale2_init, s2_new)
        converged = jnp.abs(s2_new - s2) / jnp.maximum(s2, 1e-30) <= 0.05
        s2 = jnp.where(done, s2, s2_new)
        done = done | converged | degenerate
    w = (nu + 1.0) / (nu + r2 / s2[..., None])
    return w


def residuals(d, coord, T_left_virtual, ts_left, ts_right,
              P_left, P_right, width: int, height: int,
              cfg: DepthProblemConfig):
    """Residual vector of one event at inverse depth d (all args unbatched;
    batch via vmap). Returns (fvec (P,), ok scalar bool).

    Reference: DepthProblem::operator() + warping
    (esvo_core/src/core/DepthProblem.cpp:34-191).
    """
    wx, wy = cfg.patch_size_x, cfg.patch_size_y
    dtype = ts_left.dtype

    # warping: back-project at depth 1/d in the virtual view (left camera
    # intrinsics), move into the left camera frame at TS time, project into
    # both rectified cameras (DepthProblem.cpp:162-191).
    x1, x2 = _warp_positions(d, coord, T_left_virtual, P_left, P_right)
    ok_warp = _warp_in_bounds(x1, x2, width, height, cfg)

    tau1, ok1 = patch_interpolate(ts_left, x1, wy, wx)
    tau2, ok2 = patch_interpolate(ts_right, x2, wy, wx)
    ok = ok_warp & ok1 & ok2
    return _apply_norm(tau1, tau2, ok, cfg, dtype), ok


def _warp_in_bounds(x1, x2, width, height, cfg):
    """Both warped centres leave room for the patch (DepthProblem.cpp
    boundary guards)."""
    bx = (cfg.patch_size_x - 1) // 2
    by = (cfg.patch_size_y - 1) // 2
    return ((x1[0] >= bx) & (x1[0] <= width - bx)
            & (x1[1] >= by) & (x1[1] <= height - by)
            & (x2[0] >= bx) & (x2[0] <= width - bx)
            & (x2[1] >= by) & (x2[1] <= height - by))


def _apply_norm(tau1, tau2, ok, cfg: DepthProblemConfig, dtype):
    """fvec from the two sampled patches under cfg.ls_norm — the single
    site for the l2/zncc/Tdist weighting incl. the out-of-bounds
    sentinel residual 255 (DepthProblem.cpp:44-59,126-158).

    Batch-agnostic: tau1/tau2 are (..., wy, wx) with ok (...,); returns
    (..., P)."""
    P = cfg.patch_area
    lead = tau1.shape[:-2]
    r_raw = (tau1 - tau2).reshape(lead + (P,))
    okx = jnp.asarray(ok)[..., None]
    r = jnp.where(okx, r_raw, jnp.asarray(255.0, dtype))
    if cfg.ls_norm == "l2":
        return r
    if cfg.ls_norm == "zncc":
        mu1 = jnp.mean(tau1, axis=(-2, -1), keepdims=True)
        mu2 = jnp.mean(tau2, axis=(-2, -1), keepdims=True)
        s1 = jnp.sqrt(jnp.mean((tau1 - mu1) ** 2, axis=(-2, -1),
                               keepdims=True)) + 1e-6
        s2 = jnp.sqrt(jnp.mean((tau2 - mu2) ** 2, axis=(-2, -1),
                               keepdims=True)) + 1e-6
        z = ((tau1 - mu1) / s1 - (tau2 - mu2) / s2).reshape(lead + (P,)) \
            / math.sqrt(P)
        return jnp.where(okx, z, jnp.asarray(2.0 / math.sqrt(P), dtype))
    if cfg.ls_norm == "Tdist":
        nu = cfg.td_nu
        # valid branch: IRLS weights from the re-estimated scale
        w_valid = _tdist_weights(r_raw, r_raw * r_raw, nu,
                                 cfg.td_scale_squared,
                                 cfg.td_fixed_point_iters)
        # invalid branch: fixed weight of a 255 residual at the base scale
        w_oob = (nu + 1.0) / (nu + (255.0 / cfg.td_scale) ** 2)
        w = jnp.where(okx, w_valid, jnp.asarray(w_oob, dtype))
        return jnp.sqrt(w) * r
    raise ValueError(f"unsupported LSnorm: {cfg.ls_norm}")


def _warp_positions(d, coord, T_left_virtual, P_left, P_right):
    """Projections of the event into both surfaces at inverse depth d
    (DepthProblem::warping geometry, DepthProblem.cpp:162-191)."""
    p_rv = cam_to_world(P_left, coord, d)
    p_left = jnp.matmul(T_left_virtual[:3, :3], p_rv,
                        precision="highest") + T_left_virtual[:3, 3]
    x1h = jnp.matmul(P_left[:, :3], p_left, precision="highest") \
        + P_left[:, 3]
    x2h = jnp.matmul(P_right[:, :3], p_left, precision="highest") \
        + P_right[:, 3]
    return x1h[:2] / x1h[2], x2h[:2] / x2h[2]


def _window_patch(win, oy_org, ox_org, u, v, wy, wx, Wy, Wx):
    """Bilinearly sample a (wy, wx) patch centred at sub-pixel (u, v) from
    a pre-gathered (Wy, Wx) window whose origin is (oy_org, ox_org).

    The integer-aligned (wy+1, wx+1) source block is extracted with two
    tiny one-hot matmuls src = A @ win @ B^T — no gathers inside the LM
    loop — and the bilinear fractions are applied elementwise afterwards.
    Keeping fx/fy OUT of the one-hot matrices matters: A and B are then
    functions of integers only, so under `jax.jvp` their tangents are
    symbolic zeros and the matmuls run once (primal only); the tangent
    flows through the cheap elementwise combination. With the fractions
    folded into A/B (the previous layout) the jvp tripled the matmul
    count (dA @ win @ B^T + A @ win @ dB^T). Exactly equivalent to the
    reference's patchInterpolation while the source patch stays inside
    the window.
    """
    hy = (wy - 1) // 2
    hx = (wx - 1) // 2
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fx = u - u0
    fy = v - v0
    oy = v0.astype(jnp.int32) - hy - oy_org
    ox = u0.astype(jnp.int32) - hx - ox_org
    ok = (oy >= 0) & (ox >= 0) & (oy + wy + 1 <= Wy) & (ox + wx + 1 <= Wx)
    jr = jnp.arange(wy + 1, dtype=jnp.int32)[:, None]
    c = jnp.arange(Wy, dtype=jnp.int32)[None, :]
    A = (c == oy + jr).astype(win.dtype)                # (wy+1, Wy)
    ic = jnp.arange(wx + 1, dtype=jnp.int32)[:, None]
    c2 = jnp.arange(Wx, dtype=jnp.int32)[None, :]
    B = (c2 == ox + ic).astype(win.dtype)               # (wx+1, Wx)
    src = A @ win @ B.T                                 # (wy+1, wx+1)
    r = (1.0 - fx) * src[:, :wx] + fx * src[:, 1:]
    patch = (1.0 - fy) * r[:wy, :] + fy * r[1:, :]
    return patch, ok


def _warp_positions_rows(d, u, v, rows_lv, P_left, P_right, Ainv):
    """Batched warp in the SoA layout: inverse depth d (N,), raw rectified
    coordinates u/v (N,), per-event virtual->left transforms rows_lv
    (12, N). Returns (u1, v1, u2, v2) each (N,). Same geometry as
    `_warp_positions` (DepthProblem.cpp:162-191) but pure lane-parallel
    VPU math — no batched matvecs, no (N, 4, 4) traffic."""
    z = 1.0 / d
    r0 = z * u - P_left[0, 3]
    r1 = z * v - P_left[1, 3]
    r2 = z - P_left[2, 3]
    px = Ainv[0, 0] * r0 + Ainv[0, 1] * r1 + Ainv[0, 2] * r2
    py = Ainv[1, 0] * r0 + Ainv[1, 1] * r1 + Ainv[1, 2] * r2
    pz = Ainv[2, 0] * r0 + Ainv[2, 1] * r1 + Ainv[2, 2] * r2
    qx, qy, qz = rows_apply(rows_lv, px, py, pz)

    def proj(P):
        hx = P[0, 0] * qx + P[0, 1] * qy + P[0, 2] * qz + P[0, 3]
        hy = P[1, 0] * qx + P[1, 1] * qy + P[1, 2] * qz + P[1, 3]
        hz = P[2, 0] * qx + P[2, 1] * qy + P[2, 2] * qz + P[2, 3]
        return hx / hz, hy / hz

    (u1, v1) = proj(P_left)
    (u2, v2) = proj(P_right)
    return u1, v1, u2, v2


def _warp_in_bounds_batch(u1, v1, u2, v2, width, height,
                          cfg: DepthProblemConfig):
    bx = (cfg.patch_size_x - 1) // 2
    by = (cfg.patch_size_y - 1) // 2
    return ((u1 >= bx) & (u1 <= width - bx)
            & (v1 >= by) & (v1 <= height - by)
            & (u2 >= bx) & (u2 <= width - bx)
            & (v2 >= by) & (v2 <= height - by))


def solve(matches_x: jax.Array, T_world_virtual: jax.Array,
          T_left_virtual: jax.Array, d_init: jax.Array, valid: jax.Array,
          t_event: jax.Array, ts_left: jax.Array, ts_right: jax.Array,
          rig: StereoRig, cfg: DepthProblemConfig) -> DepthEstimates:
    """Refine inverse depth for N events in parallel with masked LM.

    Args:
      matches_x: (N, 2) rectified left event coordinates.
      T_world_virtual: (N, 4, 4) per-event virtual-view poses.
      T_left_virtual: (N, 4, 4) transform virtual frame -> left camera frame
        at the TS timestamp (precompute: T_left_world @ T_world_virtual).
      d_init: (N,) inverse depth init from block matching.
      valid: (N,) input mask.
      t_event: (N,) timestamps (carried through, unused in math).
      ts_left/ts_right: (H, W) time surfaces.
    """
    del t_event
    H, W = ts_left.shape
    P_left = rig.left.params.P
    P_right = rig.right.params.P
    m = cfg.patch_area
    dtype = ts_left.dtype

    wy, wx = cfg.patch_size_y, cfg.patch_size_x
    mg = cfg.window_margin
    Wy, Wx = wy + 1 + 2 * mg, wx + 1 + 2 * mg
    # the windowed fast path needs the window to fit inside the image:
    # on smaller images origin() clipping would silently sample
    # border-replicated rows, so fall back to full-image sampling
    if cfg.window_margin >= 0 and H >= Wy and W >= Wx:
        # Pre-gather one window per surface per event around the initial
        # warp positions; LM iterations then never touch HBM. The warp
        # itself runs in the SoA pose-rows layout: an (N, 4, 4) batch of
        # transforms pads each 4x4 to an (8, 128) tile and lowers the
        # per-event matvecs to tiny serialized dot_generals, while (12, N)
        # coefficient planes make the whole warp lane-parallel VPU math
        # (geometry/se3.py). One layout transpose at entry.
        rows_lv = rows_from_matrices(T_left_virtual)        # (12, N)
        Ainv = inv3(P_left[:, :3])
        u_ev = matches_x[:, 0]
        v_ev = matches_x[:, 1]

        def warp_batch(d):
            return _warp_positions_rows(d, u_ev, v_ev, rows_lv, P_left,
                                        P_right, Ainv)

        u1_0, v1_0, u2_0, v2_0 = warp_batch(jnp.asarray(d_init, dtype))

        def origin(u, v):
            oy = jnp.floor(v).astype(jnp.int32) - (wy - 1) // 2 - mg
            ox = jnp.floor(u).astype(jnp.int32) - (wx - 1) // 2 - mg
            return jnp.clip(oy, 0, H - Wy), jnp.clip(ox, 0, W - Wx)

        oy1, ox1 = origin(u1_0, v1_0)
        oy2, ox2 = origin(u2_0, v2_0)
        win1 = slice_patches(ts_left, oy1, ox1, Wy, Wx)
        win2 = slice_patches(ts_right, oy2, ox2, Wy, Wx)

        use_pallas = (cfg.lm_kernel != "xla"
                      and cfg.ls_norm in ("Tdist", "l2")
                      and dtype == jnp.float32
                      and (cfg.lm_kernel == "pallas"
                           or jax.default_backend() == "tpu"))
        if use_pallas:
            from esvo_tpu.ops.pallas_lm import pallas_lm_solve
            d, cost, jtj = pallas_lm_solve(
                P_left, P_right, Ainv, u_ev, v_ev,
                jnp.asarray(d_init, dtype), oy1, ox1, oy2, ox2, rows_lv,
                win1, win2, wy=wy, wx=wx, Wy=Wy, Wx=Wx, H=H, W=W,
                ls_norm=cfg.ls_norm, nu=float(cfg.td_nu),
                scale2_init=float(cfg.td_scale_squared),
                td_iters=cfg.td_fixed_point_iters,
                max_iteration=cfg.max_iteration,
                interpret=jax.default_backend() != "tpu")
            return _finalize(d, cost, jtj, matches_x, T_world_virtual,
                             valid, P_left, cfg, dtype)

        sample = jax.vmap(_window_patch,
                          in_axes=(0, 0, 0, 0, 0) + (None,) * 4)

        def fvec_batch(d):
            """Batched windowed residuals. Identical to the reference
            semantics while the patch stays within the window; a solution
            that wanders past the margin gets the out-of-bounds penalty
            (DepthProblem.cpp:44-59) — in the reference such far
            excursions are instead sampled from the full image, but they
            only occur on diverging events that culling drops either way.
            """
            u1, v1, u2, v2 = warp_batch(d)
            ok_warp = _warp_in_bounds_batch(u1, v1, u2, v2, W, H, cfg)
            tau1, ok1 = sample(win1, oy1, ox1, u1, v1, wy, wx, Wy, Wx)
            tau2, ok2 = sample(win2, oy2, ox2, u2, v2, wy, wx, Wy, Wx)
            ok = ok_warp & ok1 & ok2
            return _apply_norm(tau1, tau2, ok, cfg, dtype), ok

        def batch_fj(d, xc, T):
            del xc, T
            (f, ok), (jf, _) = jax.jvp(fvec_batch, (d,),
                                       (jnp.ones_like(d),))
            return f, jf, ok
    else:
        def fvec_of(d, coord, T_lv):
            f, ok = residuals(d, coord, T_lv, ts_left, ts_right, P_left,
                              P_right, W, H, cfg)
            return f, ok

        def fvec_and_jac(d, coord, T_lv):
            (f, ok), (jf, _) = jax.jvp(lambda dd: fvec_of(dd, coord, T_lv),
                                       (d,), (jnp.ones_like(d),))
            return f, jf, ok

        batch_fj = jax.vmap(fvec_and_jac, in_axes=(0, 0, 0))

    d = jnp.asarray(d_init, dtype)
    lam = jnp.full(d.shape, 1e-3, dtype)
    strikes = jnp.zeros(d.shape, jnp.int32)

    f, jac, _ = batch_fj(d, matches_x, T_left_virtual)
    cost = jnp.sum(f * f, axis=-1)

    def step(carry, _):
        d, lam, strikes, f, jac, cost = carry
        g = jnp.sum(jac * f, axis=-1)
        h = jnp.sum(jac * jac, axis=-1)
        delta = -g / (h * (1.0 + lam) + 1e-12)
        d_try = d + delta
        # single jvp evaluation per iteration: the trial's (f, J) is
        # reused as the new state when accepted
        f_try, jac_try, _ = batch_fj(d_try, matches_x, T_left_virtual)
        cost_try = jnp.sum(f_try * f_try, axis=-1)
        accept = cost_try < cost
        frozen = strikes >= 2
        do = accept & ~frozen
        # two-strike convergence: tiny relative cost reduction or tiny step
        # (mirrors ftol/xtol + the state machine at
        # DepthProblemSolver.cpp:158-188)
        small = (jnp.abs(cost - cost_try) <= 1e-6 * cost) \
            | (jnp.abs(delta) <= 1e-6 * (jnp.abs(d) + 1e-6))
        strikes = jnp.where(frozen, strikes,
                            jnp.where(small, strikes + 1, 0))
        d_new = jnp.where(do, d_try, d)
        f_new = jnp.where(do[:, None], f_try, f)
        jac_new = jnp.where(do[:, None], jac_try, jac)
        cost_new = jnp.where(do, cost_try, cost)
        lam_new = jnp.where(frozen, lam,
                            jnp.where(accept, lam * 0.3, lam * 4.0))
        lam_new = jnp.clip(lam_new, 1e-9, 1e9)
        return (d_new, lam_new, strikes, f_new, jac_new, cost_new), None

    (d, lam, strikes, f, jac, cost), _ = jax.lax.scan(
        step, (d, lam, strikes, f, jac, cost), None,
        length=cfg.max_iteration)

    jtj = jnp.sum(jac * jac, axis=-1)
    return _finalize(d, cost, jtj, matches_x, T_world_virtual, valid,
                     P_left, cfg, dtype)


def _finalize(d, cost, jtj, matches_x, T_world_virtual, valid, P_left,
              cfg: DepthProblemConfig, dtype) -> DepthEstimates:
    """Variance from the final Jacobian + DepthPoint conversion — the
    shared tail of the XLA-scan and Pallas LM paths
    (DepthProblemSolver.cpp:114-134,195-212)."""
    m = cfg.patch_area
    inv_jtj = jnp.where(jtj > 1e-20, 1.0 / jnp.maximum(jtj, 1e-20), 1e20)
    if cfg.ls_norm == "Tdist":
        variance = cfg.td_stdvar ** 2 * inv_jtj
    else:
        variance = cost / max(m - 1, 1) * inv_jtj
    variance = jnp.maximum(variance, 1e-6)   # boundVariance (DepthPoint.cpp:137-143)

    ok = valid & (d > 0.001)

    p_cam = jax.vmap(lambda c, dd: cam_to_world(P_left, c, dd))(matches_x, d)
    if cfg.ls_norm == "Tdist":
        scale2 = variance * (cfg.td_nu - 2.0) / cfg.td_nu
        nu = jnp.full(d.shape, cfg.td_nu, dtype)
    else:
        scale2 = variance
        nu = jnp.full(d.shape, jnp.inf, dtype)

    return DepthEstimates(
        x=matches_x,
        inv_depth=jnp.where(ok, d, -1.0),
        variance=variance,
        scale2=scale2,
        nu=nu,
        residual=cost,
        age=jnp.zeros(d.shape, jnp.int32),
        p_cam=p_cam,
        T_world_cam=T_world_virtual,
        valid=ok,
    )


def point_culling(est: DepthEstimates, std_variance_threshold: float,
                  cost_threshold: float, inv_depth_min: float,
                  inv_depth_max: float) -> DepthEstimates:
    """Masked equivalent of DepthProblemSolver::pointCulling
    (DepthProblemSolver.cpp:216-244)."""
    keep = (est.valid
            & (est.variance <= std_variance_threshold ** 2)
            & (est.residual <= cost_threshold)
            & (est.inv_depth >= inv_depth_min)
            & (est.inv_depth <= inv_depth_max))
    return est.replace(valid=keep)
