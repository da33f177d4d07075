"""Shared low-level batched ops (patch interpolation, reductions)."""
from esvo_tpu.ops.interp import patch_interpolate, bilinear_sample, gather2d

__all__ = ["patch_interpolate", "bilinear_sample", "gather2d"]
