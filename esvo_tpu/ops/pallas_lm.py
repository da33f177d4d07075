"""Pallas TPU kernel: the ENTIRE per-event inverse-depth LM solve.

The XLA windowed path (mapping/depth_refinement.solve) evaluates each LM
iteration as a vmap of per-event one-hot matmuls (A @ win @ B^T): XLA
lowers that to thousands of tiny batched dot_generals per iteration —
~1 % MXU utilization, re-reading the (N, Wy, Wx) windows from HBM every
iteration. At rpg scale (4096 events, 10 iterations) the solve measured
5.4 ms, dominating the 8 ms mapping cycle (BENCH_r04; VERDICT r4 #3).

This kernel runs the WHOLE solver — initial residual evaluation plus all
max_iteration damped LM steps, each with the Student-t IRLS fixed-point
— inside one pallas_call with the windows resident in VMEM:

- windows live in PLANE layout (Wy, Wx, N): the event axis is the lane
  axis, so every per-event quantity is lane-parallel VPU math;
- per-event patch extraction at a dynamic integer window offset
  (ry, rx) uses BINARY SHIFT-SELECTS over the sublane/sublane-adjacent
  axes: for each bit b of the offset range, conditionally replace the
  block with its b-shifted copy (5 + 5 dense selects replace the
  per-event one-hot matmuls; no gathers, no batched dot_generals);
- the depth derivative of the residual is ANALYTIC: the warp
  u(d) = (A z + B) / (C z + D) with z = 1/d is projective-rational, and
  the bilinear in-cell derivative equals what jax.jvp computes through
  the sampler (floor() carries no tangent), so the kernel's Jacobian is
  algebraically identical to the XLA path's jvp.

Reference semantics preserved bit-for-bit-in-structure with
depth_refinement.solve (DepthProblemSolver.cpp:28-188 analogue): same
window origins, same out-of-bounds 255 sentinel and frozen-weight OOB
branch, same Tdist fixed point with freeze mask (stop-gradient IRLS
weights), same two-strike LM convergence/damping schedule, same final
J^T J for the variance. Parity is pinned by
tests/test_pallas_lm.py against the XLA path.

Supported: ls_norm in {"Tdist", "l2"}, f32, window path (margin >= 0).
Everything else falls back to the XLA path (depth_refinement.solve
dispatches).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_bits(max_shift: int) -> tuple:
    """Descending powers of two covering shifts in [0, max_shift]."""
    if max_shift <= 0:
        return ()
    return tuple(1 << k for k in range(max_shift.bit_length() - 1, -1, -1))


def _lm_kernel(pl_ref, pr_ref, ainv_ref, par_ref, win1_ref, win2_ref,
               out_ref, *, wy: int, wx: int, Wy: int, Wx: int, L: int,
               H: int, W: int, ls_norm: str, nu: float, scale2_init: float,
               td_iters: int, max_iteration: int):
    """Per-lane convention: every per-event scalar is a (1, L) vector
    (Mosaic's vector layouts want >= 2 dims; bare (L,) vectors crash the
    layout pass), broadcast to (1, 1, L) when combined with the
    (rows, cols, L) window/patch tensors."""
    f32 = jnp.float32
    # scalar-prefetched constants (SMEM)
    P0 = [pl_ref[k] for k in range(4)]          # P_left rows
    P1 = [pl_ref[4 + k] for k in range(4)]
    P2 = [pl_ref[8 + k] for k in range(4)]
    Q0 = [pr_ref[k] for k in range(4)]          # P_right rows
    Q1 = [pr_ref[4 + k] for k in range(4)]
    Q2 = [pr_ref[8 + k] for k in range(4)]
    Ai = [ainv_ref[k] for k in range(9)]        # inv(P_left[:, :3])

    par = par_ref[:]                             # (RPAR, L)

    def row(k):
        return par[k:k + 1, :]                   # (1, L)

    u_ev = row(0)
    v_ev = row(1)
    d0 = row(2)
    oy1 = row(3).astype(jnp.int32)
    ox1 = row(4).astype(jnp.int32)
    oy2 = row(5).astype(jnp.int32)
    ox2 = row(6).astype(jnp.int32)
    rows = [row(8 + k) for k in range(12)]       # T_left_virtual rows
    win1 = win1_ref[:]                           # (Wy, Wx, L)
    win2 = win2_ref[:]

    hy = (wy - 1) // 2
    hx = (wx - 1) // 2
    P = wy * wx

    # precompute the z-linear warp coefficients per lane:
    # p(z) = pa * z - pb with pa = Ainv [u, v, 1], pb = Ainv P_left[:, 3]
    pax = Ai[0] * u_ev + Ai[1] * v_ev + Ai[2]
    pay = Ai[3] * u_ev + Ai[4] * v_ev + Ai[5]
    paz = Ai[6] * u_ev + Ai[7] * v_ev + Ai[8]
    pbx = Ai[0] * P0[3] + Ai[1] * P1[3] + Ai[2] * P2[3]
    pby = Ai[3] * P0[3] + Ai[4] * P1[3] + Ai[5] * P2[3]
    pbz = Ai[6] * P0[3] + Ai[7] * P1[3] + Ai[8] * P2[3]
    # q(z) = R p(z) + t  (rows layout: rows[4i + j])
    qax = rows[0] * pax + rows[1] * pay + rows[2] * paz
    qay = rows[4] * pax + rows[5] * pay + rows[6] * paz
    qaz = rows[8] * pax + rows[9] * pay + rows[10] * paz
    qbx = rows[3] - (rows[0] * pbx + rows[1] * pby + rows[2] * pbz)
    qby = rows[7] - (rows[4] * pbx + rows[5] * pby + rows[6] * pbz)
    qbz = rows[11] - (rows[8] * pbx + rows[9] * pby + rows[10] * pbz)

    def proj_coeffs(R0, R1, R2):
        """u(z) = (Au z + Bu)/(Cz + D), v(z) = (Av z + Bv)/(Cz + D)."""
        Au = R0[0] * qax + R0[1] * qay + R0[2] * qaz
        Bu = R0[0] * qbx + R0[1] * qby + R0[2] * qbz + R0[3]
        Av = R1[0] * qax + R1[1] * qay + R1[2] * qaz
        Bv = R1[0] * qbx + R1[1] * qby + R1[2] * qbz + R1[3]
        C = R2[0] * qax + R2[1] * qay + R2[2] * qaz
        D = R2[0] * qbx + R2[1] * qby + R2[2] * qbz + R2[3]
        return Au, Bu, Av, Bv, C, D

    cl = proj_coeffs(P0, P1, P2)
    cr = proj_coeffs(Q0, Q1, Q2)

    def warp(coeff, z):
        Au, Bu, Av, Bv, C, D = coeff
        den = C * z + D
        inv = 1.0 / den
        u = (Au * z + Bu) * inv
        v = (Av * z + Bv) * inv
        # d/dz then chain dz/dd = -z^2
        du_dz = (Au * D - Bu * C) * inv * inv
        dv_dz = (Av * D - Bv * C) * inv * inv
        return u, v, du_dz, dv_dz

    vbits = _shift_bits(Wy - (wy + 1))
    hbits = _shift_bits(Wx - (wx + 1))

    def sample(win, oy_org, ox_org, u, v, du, dv):
        """(patch, jac_patch, ok): bilinear patch at (u, v) from the
        plane-layout window + its d-derivative. All per-lane args are
        (1, L)."""
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        fx = u - u0
        fy = v - v0
        ry = v0.astype(jnp.int32) - hy - oy_org
        rx = u0.astype(jnp.int32) - hx - ox_org
        ok = ((ry >= 0) & (rx >= 0) & (ry + wy + 1 <= Wy)
              & (rx + wx + 1 <= Wx))
        ryc = jnp.clip(ry, 0, Wy - (wy + 1))[:, None, :]   # (1, 1, L)
        rxc = jnp.clip(rx, 0, Wx - (wx + 1))[:, None, :]
        # binary shift-selects: move rows [ry : ry+wy+1] to the top
        A = win
        for b in vbits:
            bit = (ryc & b) > 0
            shifted = jnp.concatenate(
                [A[b:], jnp.zeros((b, Wx, L), f32)], axis=0)
            A = jnp.where(bit, shifted, A)
        V = A[: wy + 1]                          # (wy+1, Wx, L)
        for b in hbits:
            bit = (rxc & b) > 0
            shifted = jnp.concatenate(
                [V[:, b:], jnp.zeros((wy + 1, b, L), f32)], axis=1)
            V = jnp.where(bit, shifted, V)
        S = V[:, : wx + 1]                       # (wy+1, wx+1, L)
        fx_ = fx[:, None, :]                     # (1, 1, L)
        fy_ = fy[:, None, :]
        r = (1.0 - fx_) * S[:, :wx] + fx_ * S[:, 1:]        # (wy+1, wx, L)
        patch = (1.0 - fy_) * r[:wy] + fy_ * r[1:]          # (wy, wx, L)
        # in-cell bilinear derivative (== jvp through the sampler)
        dS = S[:, 1:] - S[:, :wx]                           # (wy+1, wx, L)
        dpat_du = (1.0 - fy_) * dS[:wy] + fy_ * dS[1:]
        dpat_dv = r[1:] - r[:wy]
        jac = dpat_du * du[:, None, :] + dpat_dv * dv[:, None, :]
        return patch, jac, ok

    def lane(x3):
        """(1, 1, L) -> (1, L)."""
        return x3.reshape(1, L)

    def eval_fj(d):
        """(f, jac, cost) at inverse depth d (1, L) — mirrors
        fvec_batch + jvp of depth_refinement.solve."""
        z = 1.0 / d
        u1, v1, du1z, dv1z = warp(cl, z)
        u2, v2, du2z, dv2z = warp(cr, z)
        dz = -z * z
        ok_warp = ((u1 >= hx) & (u1 <= W - hx) & (v1 >= hy)
                   & (v1 <= H - hy) & (u2 >= hx) & (u2 <= W - hx)
                   & (v2 >= hy) & (v2 <= H - hy))
        tau1, j1, ok1 = sample(win1, oy1, ox1, u1, v1, du1z * dz,
                               dv1z * dz)
        tau2, j2, ok2 = sample(win2, oy2, ox2, u2, v2, du2z * dz,
                               dv2z * dz)
        ok = ok_warp & ok1 & ok2                 # (1, L)
        okx = ok[:, None, :]                     # (1, 1, L)
        r_raw = tau1 - tau2                      # (wy, wx, L)
        dr = j1 - j2
        r = jnp.where(okx, r_raw, 255.0)
        if ls_norm == "l2":
            f = r
            jac = jnp.where(okx, dr, 0.0)
        else:                                    # Tdist
            # IRLS weights from the re-estimated scale (fixed point with
            # freeze mask; _tdist_weights semantics, weights carry no
            # tangent)
            r2 = r_raw * r_raw
            nonzero = r_raw != 0.0
            s2 = jnp.full((1, L), scale2_init, f32)
            done = jnp.zeros((1, L), bool)
            for _ in range(td_iters):
                c = r2 * (nu + 1.0) / (nu + r2 / s2[:, None, :])
                s2_new = lane(jnp.sum(jnp.where(nonzero, c, 0.0),
                                      axis=(0, 1), keepdims=True)) / P
                degenerate = s2_new == 0.0
                s2_new = jnp.where(degenerate, scale2_init, s2_new)
                conv = jnp.abs(s2_new - s2) / jnp.maximum(s2, 1e-30) \
                    <= 0.05
                s2 = jnp.where(done, s2, s2_new)
                done = done | conv | degenerate
            w_valid = (nu + 1.0) / (nu + r2 / s2[:, None, :])
            w_oob = (nu + 1.0) / (nu + (255.0 / np.sqrt(scale2_init)) ** 2)
            w = jnp.where(okx, w_valid, f32(w_oob))
            sq = jnp.sqrt(w)
            f = sq * r
            jac = jnp.where(okx, sq * dr, 0.0)
        cost = lane(jnp.sum(f * f, axis=(0, 1), keepdims=True))
        return f, jac, cost

    d = d0
    lam = jnp.full((1, L), 1e-3, f32)
    strikes = jnp.zeros((1, L), jnp.int32)
    f, jac, cost = eval_fj(d)

    def step(_, carry):
        d, lam, strikes, f, jac, cost = carry
        g = lane(jnp.sum(jac * f, axis=(0, 1), keepdims=True))
        h = lane(jnp.sum(jac * jac, axis=(0, 1), keepdims=True))
        delta = -g / (h * (1.0 + lam) + 1e-12)
        d_try = d + delta
        f_try, jac_try, cost_try = eval_fj(d_try)
        accept = cost_try < cost
        frozen = strikes >= 2
        do = accept & ~frozen
        small = (jnp.abs(cost - cost_try) <= 1e-6 * cost) \
            | (jnp.abs(delta) <= 1e-6 * (jnp.abs(d) + 1e-6))
        strikes = jnp.where(frozen, strikes,
                            jnp.where(small, strikes + 1, 0))
        d = jnp.where(do, d_try, d)
        dox = do[:, None, :]
        f = jnp.where(dox, f_try, f)
        jac = jnp.where(dox, jac_try, jac)
        cost = jnp.where(do, cost_try, cost)
        lam = jnp.where(frozen, lam,
                        jnp.where(accept, lam * 0.3, lam * 4.0))
        lam = jnp.clip(lam, 1e-9, 1e9)
        return d, lam, strikes, f, jac, cost

    # Python-unrolled: a lax.fori_loop here trips a Mosaic relayout gap
    # ("Not implemented: Sublane broadcast") when the (1, L) carries'
    # entry layouts (slices/reductions) differ from the body's select
    # outputs; unrolling lets the layout pass pick one layout per value
    # (the body is ~50 vector ops, so code size stays moderate)
    carry = (d, lam, strikes, f, jac, cost)
    for it in range(max_iteration):
        carry = step(it, carry)
    d, lam, strikes, f, jac, cost = carry

    jtj = lane(jnp.sum(jac * jac, axis=(0, 1), keepdims=True))
    out_ref[0:1, :] = d
    out_ref[1:2, :] = cost
    out_ref[2:3, :] = jtj
    out_ref[3:, :] = jnp.zeros((5, L), f32)


@functools.partial(
    jax.jit, static_argnames=("wy", "wx", "Wy", "Wx", "H", "W", "ls_norm",
                              "nu", "scale2_init", "td_iters",
                              "max_iteration", "block", "interpret"))
def pallas_lm_solve(P_left, P_right, Ainv, u_ev, v_ev, d_init,
                    oy1, ox1, oy2, ox2, rows_lv, win1, win2, *,
                    wy: int, wx: int, Wy: int, Wx: int, H: int, W: int,
                    ls_norm: str, nu: float, scale2_init: float,
                    td_iters: int, max_iteration: int, block: int = 128,
                    interpret: bool = False):
    """Run the fused LM solve. Inputs:
      u_ev/v_ev/d_init: (N,) f32; oy*/ox*: (N,) int32 window origins;
      rows_lv: (12, N) SoA T_left_virtual; win1/win2: (N, Wy, Wx) f32
      windows (slice_patches layout — transposed to planes internally).
    Returns (d, cost, jtj) each (N,) f32."""
    N = u_ev.shape[0]
    npad = -N % block
    f32 = jnp.float32

    def pad(a, axis=0):
        if npad == 0:
            return a
        cfg = [(0, 0)] * a.ndim
        cfg[axis] = (0, npad)
        return jnp.pad(a, cfg)

    par = jnp.zeros((20, N + npad), f32)
    par = par.at[0, :N].set(u_ev.astype(f32))
    par = par.at[1, :N].set(v_ev.astype(f32))
    par = par.at[2, :N].set(jnp.maximum(d_init.astype(f32), 1e-6))
    par = par.at[3, :N].set(oy1.astype(f32))
    par = par.at[4, :N].set(ox1.astype(f32))
    par = par.at[5, :N].set(oy2.astype(f32))
    par = par.at[6, :N].set(ox2.astype(f32))
    par = par.at[8:20, :N].set(rows_lv.astype(f32))
    # padded lanes: identity-ish transforms, d = 1 (kept finite; results
    # discarded)
    if npad:
        par = par.at[2, N:].set(1.0)
        par = par.at[8, N:].set(1.0)
        par = par.at[13, N:].set(1.0)
        par = par.at[18, N:].set(1.0)
    w1 = jnp.moveaxis(pad(win1.astype(f32)), 0, -1)   # (Wy, Wx, N+pad)
    w2 = jnp.moveaxis(pad(win2.astype(f32)), 0, -1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=((N + npad) // block,),
        in_specs=[
            pl.BlockSpec((20, block), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wy, Wx, block), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wy, Wx, block), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, block), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _lm_kernel, wy=wy, wx=wx, Wy=Wy, Wx=Wx, L=block, H=H, W=W,
            ls_norm=ls_norm, nu=nu, scale2_init=scale2_init,
            td_iters=td_iters, max_iteration=max_iteration),
        out_shape=jax.ShapeDtypeStruct((8, N + npad), f32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(P_left.reshape(-1).astype(f32), P_right.reshape(-1).astype(f32),
      Ainv.reshape(-1).astype(f32), par, w1, w2)
    return out[0, :N], out[1, :N], out[2, :N]
