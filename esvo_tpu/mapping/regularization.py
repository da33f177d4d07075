"""Inverse-depth map regularization as dense windowed reductions.

Re-designs ``DepthRegularization`` (esvo_core/src/core/DepthRegularization.cpp).
The reference walks the sparse grid, gathers a (2r+1)^2 neighbourhood per
point and either smooths it (inverse-variance weighted mean for l2,
sequential pairwise Student-t posterior for Tdist) or invalidates it. Here
the window is processed as (2r+1)^2 shifted planes of the dense grid —
each step is (H, W) elementwise math, no gathers.

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

from esvo_tpu.mapping.fusion import DepthGrid, EMPTY, _student_t_update


@struct.dataclass
class RegularizationConfig:
    ls_norm: str = struct.field(pytree_node=False, default="Tdist")
    radius: int = struct.field(pytree_node=False, default=5)
    min_neighbours: int = struct.field(pytree_node=False, default=8)
    min_close_neighbours: int = struct.field(pytree_node=False, default=8)


def _shift(a: jax.Array, dy: int, dx: int, fill):
    """View of `a` where out[y, x] = a[y + dy, x + dx], `fill` outside."""
    out = jnp.full_like(a, fill)
    H, W = a.shape[:2]
    ys_dst = slice(max(0, -dy), min(H, H - dy))
    xs_dst = slice(max(0, -dx), min(W, W - dx))
    ys_src = slice(max(0, dy), min(H, H + dy))
    xs_src = slice(max(0, dx), min(W, W + dx))
    return out.at[ys_dst, xs_dst].set(a[ys_src, xs_src])


def regularize(grid: DepthGrid, cfg: RegularizationConfig) -> DepthGrid:
    r = cfg.radius
    valid = grid.occupied
    invD = grid.inv_depth
    var = grid.variance
    std2 = 2.0 * jnp.sqrt(jnp.maximum(var, 0.0))

    offsets = [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)]

    n_count = jnp.zeros_like(invD)
    close_count = jnp.zeros_like(invD)
    wsum = jnp.zeros_like(invD)
    wmean = jnp.zeros_like(invD)
    # Tdist fold state
    t_started = jnp.zeros_like(valid)
    t_nu = jnp.zeros_like(invD)
    t_invD = jnp.zeros_like(invD)
    t_s2 = jnp.ones_like(invD)

    for dy, dx in offsets:
        v_n = _shift(valid, dy, dx, False)
        d_n = _shift(invD, dy, dx, 0.0)
        var_n = _shift(var, dy, dx, 1.0)
        s2_n = _shift(grid.scale2, dy, dx, 1.0)
        nu_n = _shift(grid.nu, dy, dx, 1.0)

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
            f_invD, f_s2, f_nu, _ = _student_t_update(
                t_invD, t_s2, t_nu, d_n, s2_n, nu_n)
            upd = close & t_started
            t_invD = jnp.where(init, d_n, jnp.where(upd, f_invD, t_invD))
            t_s2 = jnp.where(init, s2_n, jnp.where(upd, f_s2, t_s2))
            t_nu = jnp.where(init, nu_n, jnp.where(upd, f_nu, t_nu))
            t_started = t_started | close

    enough = (n_count > cfg.min_neighbours) \
        & (close_count > cfg.min_close_neighbours)
    if cfg.ls_norm == "l2":
        smoothed = wmean / jnp.maximum(wsum, 1e-20)
    else:
        smoothed = t_invD

    new_invD = jnp.where(valid & enough, smoothed,
                         jnp.where(valid, EMPTY, invD))
    return grid.replace(inv_depth=new_invD)
