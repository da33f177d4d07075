"""Parity tests for the Pallas window-extraction kernel (interpret mode).

The depth-LM solver's window gather routes through
`ops/pallas_patches.pallas_slice_patches` on TPU (8-row-aligned f32
windows; see ops/interp.py:slice_patches). These tests run the kernel in
Pallas interpret mode on CPU against the flat-gather fallback, so the
kernel's slab/roll logic is covered without the chip.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from esvo_tpu.ops.pallas_patches import pallas_slice_patches


def ref_patches(img, uy, ux, h, w):
    """lax.dynamic_slice semantics: starts clamped so windows stay
    in-bounds."""
    H, W = img.shape
    uy = np.clip(uy, 0, H - h)
    ux = np.clip(ux, 0, W - w)
    return np.stack([img[y:y + h, x:x + w] for y, x in zip(uy, ux)])


@pytest.mark.parametrize("shape,h,w", [
    ((48, 64), 8, 7),       # sub-lane-width image, h aligned
    ((180, 240), 16, 15),   # DAVIS240 geometry, taller window
    ((60, 130), 8, 8),      # width just over one 128-lane tile
])
def test_interpret_parity(shape, h, w):
    rng = np.random.default_rng(3)
    H, W = shape
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    n = 37
    uy = jnp.asarray(rng.integers(-2, H + 2, n), jnp.int32)  # incl. clamps
    ux = jnp.asarray(rng.integers(-2, W + 2, n), jnp.int32)
    out = np.asarray(pallas_slice_patches(img, uy, ux, h, w, block=16,
                                          interpret=True))
    ref = ref_patches(np.asarray(img), np.asarray(uy), np.asarray(ux), h, w)
    np.testing.assert_array_equal(out, ref)


def test_interpret_parity_block_padding():
    """n not a multiple of block: the padded tail must not leak into the
    first n outputs."""
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(0, 255, (48, 64)), jnp.float32)
    n = 5
    uy = jnp.asarray(rng.integers(0, 40, n), jnp.int32)
    ux = jnp.asarray(rng.integers(0, 56, n), jnp.int32)
    out = np.asarray(pallas_slice_patches(img, uy, ux, 8, 7, block=4,
                                          interpret=True))
    assert out.shape == (n, 8, 7)
    ref = ref_patches(np.asarray(img), np.asarray(uy), np.asarray(ux), 8, 7)
    np.testing.assert_array_equal(out, ref)
