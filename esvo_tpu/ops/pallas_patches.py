"""Pallas TPU kernel: batched window extraction from an image.

XLA's lowering of batched dynamic slices degenerates to a serial loop
(~1.2 us per window) whenever the slice is taller than one sublane row —
the window gather was the single largest fixed cost of the depth-LM
solver. This kernel keeps the whole image in VMEM (a DAVIS346 surface is
0.36 MB, DSEC 1.2 MB — far under the ~16 MB budget) and copies each
window with on-chip dynamic slices.

Grid: one program per block of B windows; window start coordinates are
scalar-prefetched (SMEM) so the inner loop indexes them directly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(uy_ref, ux_ref, img_ref, out_ref, *, h: int, w: int, B: int):
    """VMEM vector loads require sublane-aligned row starts, so each
    window loads an 8-row-aligned (h + 8)-tall slab of full image width,
    then rotates the target rows/columns to the origin with on-chip
    rolls and writes the (h, w) corner."""
    i = pl.program_id(0)

    def body(b, _):
        y = uy_ref[i * B + b]
        x = ux_ref[i * B + b]
        y_base = pl.multiple_of((y // 8) * 8, 8)
        slab = img_ref[pl.ds(y_base, h + 8), :]
        # non-negative roll shifts only: negative traced shifts can
        # abort (or worse, miscompile) the Mosaic vector-layout pass
        # depending on surrounding code (see ops/pallas_remap.py)
        Wp = slab.shape[1]
        slab = pltpu.roll(slab, (h + 8 - (y - y_base)) % (h + 8), axis=0)
        slab = pltpu.roll(slab, (Wp - x) % Wp, axis=1)
        out_ref[b] = slab[:h, :w]
        return 0

    jax.lax.fori_loop(0, B, body, 0)


@functools.partial(jax.jit, static_argnames=("h", "w", "block", "interpret"))
def pallas_slice_patches(img: jax.Array, ul_y: jax.Array, ul_x: jax.Array,
                         h: int, w: int, block: int = 256,
                         interpret: bool = False) -> jax.Array:
    """(N,) int32 upper-left corners -> (N, h, w) windows.

    Starts are clamped like lax.dynamic_slice. N is padded to a multiple
    of `block` internally. `interpret=True` runs the kernel in Pallas
    interpret mode (CPU parity tests).
    """
    H, W = img.shape
    n = ul_y.shape[0]
    npad = -n % block
    uy = jnp.clip(jnp.concatenate([ul_y, jnp.zeros(npad, ul_y.dtype)]),
                  0, H - h).astype(jnp.int32)
    ux = jnp.clip(jnp.concatenate([ul_x, jnp.zeros(npad, ul_x.dtype)]),
                  0, W - w).astype(jnp.int32)
    ntot = n + npad
    # 8 extra rows so the aligned (h + 8)-tall slab never leaves the
    # image; columns pad to a lane multiple (Mosaic requires 128-aligned
    # row widths for vector loads/rolls)
    Wp = -W % 128
    img = jnp.pad(img, ((0, 8), (0, Wp)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntot // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, h, w), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, B=block),
        out_shape=jax.ShapeDtypeStruct((ntot, h, w), img.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(uy, ux, img)
    return out[:n]
