"""Inverse-depth map regularization as dense windowed reductions.

Re-designs ``DepthRegularization`` (esvo_core/src/core/DepthRegularization.cpp).
The reference walks the sparse grid, gathers a (2r+1)^2 neighbourhood per
point and either smooths it (inverse-variance weighted mean for l2,
sequential pairwise Student-t posterior for Tdist) or invalidates it. Here
the window is processed as (2r+1)^2 shifted planes of the dense grid via a
single ``lax.scan`` over window offsets (an unrolled 121-step fold of
(H, W) ops compiles pathologically; the scan body compiles once).

Semantics preserved (DepthRegularization.cpp:19-110):
- neighbours = valid cells in the (2r+1)^2 window incl. the centre
  (SmartGrid::getNeighbourhood, container/SmartGrid.h:367-386),
- "close" neighbours within 2 sigma of either the centre or the neighbour,
- smoothing only if #neighbours > min_neighbours and
  #close > min_close_neighbours, else the point is invalidated,
- l2: inverse-variance weighted mean over close neighbours,
- Tdist: left fold of the pairwise Student-t posterior over close
  neighbours in window row-major order (the reference's iteration order).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from esvo_tpu.mapping.fusion import DepthGrid, EMPTY


def _reg_tdist_posterior(invD_a, s2_a, nu_a, invD_b, s2_b, nu_b):
    """Sequential pairwise posterior of the regularization fold
    (DepthRegularization.cpp:73-86). Unlike fusion's
    DepthPoint::update_studentT, nu_post = min(nu_prior, nu_obs) with
    NO +1 increment. nu=inf (Gaussian points) takes the Gaussian-product
    limit to avoid inf/inf."""
    nu_u = jnp.minimum(nu_a, nu_b)
    s_sum = s2_a + s2_b
    invD = (s2_b * invD_a + s2_a * invD_b) / s_sum
    d2 = (invD_a - invD_b) ** 2
    gauss = s2_a * s2_b / s_sum
    finite = jnp.isfinite(nu_u)
    nu_safe = jnp.where(finite, nu_u, 3.0)
    s2 = jnp.where(finite,
                   (nu_safe + d2 / s_sum) / (nu_safe + 1.0) * gauss, gauss)
    return invD, s2, nu_u


@struct.dataclass
class RegularizationConfig:
    ls_norm: str = struct.field(pytree_node=False, default="Tdist")
    radius: int = struct.field(pytree_node=False, default=5)
    min_neighbours: int = struct.field(pytree_node=False, default=8)
    min_close_neighbours: int = struct.field(pytree_node=False, default=8)


def regularize(grid: DepthGrid, cfg: RegularizationConfig) -> DepthGrid:
    r = cfg.radius
    H, W = grid.inv_depth.shape
    valid = grid.occupied
    invD = grid.inv_depth
    var = grid.variance
    std2 = 2.0 * jnp.sqrt(jnp.maximum(var, 0.0))
    zero = jnp.zeros_like(invD)

    # pad once; out-of-image neighbours are invalid
    def padded(a, fill):
        return jnp.pad(a, ((r, r), (r, r)), constant_values=fill)

    pv = padded(valid, False)
    pd = padded(invD, 0.0)
    pvar = padded(var, 1.0)
    ps2 = padded(grid.scale2, 1.0)
    pnu = padded(grid.nu, 1.0)

    offs = jnp.stack(jnp.meshgrid(jnp.arange(2 * r + 1),
                                  jnp.arange(2 * r + 1),
                                  indexing="ij"), axis=-1).reshape(-1, 2)

    def body(carry, off):
        (n_count, close_count, wsum, wmean,
         t_started, t_nu, t_invD, t_s2) = carry
        dy, dx = off[0], off[1]

        def sl(p):
            return jax.lax.dynamic_slice(p, (dy, dx), (H, W))

        v_n = sl(pv)
        d_n = sl(pd)
        var_n = sl(pvar)
        s2_n = sl(ps2)
        nu_n = sl(pnu)

        n_count = n_count + v_n
        diff = jnp.abs(invD - d_n)
        close = v_n & ((diff < std2)
                       | (diff < 2.0 * jnp.sqrt(jnp.maximum(var_n, 0.0))))
        close_count = close_count + close

        if cfg.ls_norm == "l2":
            w = jnp.where(close, 1.0 / jnp.maximum(var_n, 1e-20), 0.0)
            wsum = wsum + w
            wmean = wmean + w * d_n
        else:
            init = close & ~t_started
            f_invD, f_s2, f_nu = _reg_tdist_posterior(
                t_invD, t_s2, t_nu, d_n, s2_n, nu_n)
            upd = close & t_started
            t_invD = jnp.where(init, d_n, jnp.where(upd, f_invD, t_invD))
            t_s2 = jnp.where(init, s2_n, jnp.where(upd, f_s2, t_s2))
            t_nu = jnp.where(init, nu_n, jnp.where(upd, f_nu, t_nu))
            t_started = t_started | close
        return (n_count, close_count, wsum, wmean,
                t_started, t_nu, t_invD, t_s2), None

    carry0 = (zero, zero, zero, zero,
              jnp.zeros_like(valid), zero, zero, jnp.ones_like(invD))
    (n_count, close_count, wsum, wmean, _, _, t_invD, _), _ = \
        jax.lax.scan(body, carry0, offs)

    enough = (n_count > cfg.min_neighbours) \
        & (close_count > cfg.min_close_neighbours)
    if cfg.ls_norm == "l2":
        smoothed = wmean / jnp.maximum(wsum, 1e-20)
    else:
        smoothed = t_invD

    new_invD = jnp.where(valid & enough, smoothed,
                         jnp.where(valid, EMPTY, invD))
    return grid.replace(inv_depth=new_invD)
