"""Small fixed-size linear solves that fuse into surrounding XLA programs.

``jnp.linalg.solve`` lowers to an LU-decomposition custom call on TPU that
cannot fuse with its neighbors; inside an LM scan (tracker: 10 rounds of a
6x6 normal-equation solve, RegProblemSolverLM.cpp:148-217) the per-call
overhead dominates. For tiny SPD systems an unrolled Cholesky is a handful
of scalar FMAs/rsqrts that XLA fuses into the same kernel as the Gram
matrix that produced them.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_spd(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b for small symmetric positive-definite A (n static).

    Fully unrolled Cholesky factorization + forward/back substitution;
    n is taken from the static shape (intended for n <= ~12). Singular or
    indefinite A produces non-finite output — callers guard with
    ``jnp.isfinite`` exactly as they did around ``jnp.linalg.solve``.
    """
    n = A.shape[-1]
    assert A.shape[-2:] == (n, n) and b.shape[-1] == n
    # Cholesky: A = L L^T, unrolled over the static size.
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)
