"""Matmul-precision guard for pose/optimization math.

TPU matmuls default to a single bf16 pass (~3 significant digits). For
throughput kernels over 0-255 time-surface values that is a fine trade;
for pose arithmetic and normal equations it is fatal — LM increments of
~1e-3 against ~1-scale rotations vanish below bf16 resolution (observed:
wholesale tracker divergence on-chip while the identical CPU run
converged). Decorate any function whose einsums/matmuls carry poses,
Jacobians, or normal equations; explicit per-op `precision=` settings
inside still win.
"""
from __future__ import annotations

import functools

import jax


def highest_precision(fn):
    """Run `fn` (and everything it traces) under
    jax.default_matmul_precision('highest')."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped
