"""Matmul precision policy.

On TPU, f32 matmuls/einsums lower to the MXU at bfloat16 input precision by
default — fine for the feature-matching matmuls, catastrophic for the small
3x3/6x6 geometry and normal-equation math (observed: 0.14 rad SE3 log errors
on-chip vs 2e-4 on CPU). All small-matrix math in this package goes through
these helpers, which pin `jax.lax.Precision.HIGHEST` (full f32 on MXU).
Deliberately-low-precision big matmuls (Hamming distance, BoW scoring) call
jnp directly with their own precision choice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def einsum_hp(subscripts: str, *operands):
    """jnp.einsum pinned to highest precision."""
    return jnp.einsum(subscripts, *operands, precision=HIGHEST)


def matmul_hp(a, b):
    """jnp.matmul pinned to highest precision."""
    return jnp.matmul(a, b, precision=HIGHEST)


def small_mv(A, x):
    """Batched tiny matrix-vector product (..., m, k) @ (..., k) -> (..., m)
    expanded as broadcast multiply + sum: exact f32 on the VPU. For
    contraction lengths of 3-4, a HIGHEST-precision dot lowers each batch
    element onto padded MXU tiles — measured ~60x slower at (65536, 2, 3)
    batches on TPU v5e than this elementwise form."""
    return jnp.sum(A * x[..., None, :], axis=-1)


def small_mm(A, B):
    """Batched tiny matmul (..., m, k) @ (..., k, n) -> (..., m, n) as
    broadcast multiply + sum over k (see `small_mv`). The (..., m, k, n)
    intermediate stays fused inside XLA."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def small_gram(A):
    """Batched tiny Gram matrix A^T A for (..., r, m) with small r: expanded
    outer-product sum over the r rows (see `small_mv` for why)."""
    return jnp.sum(A[..., :, :, None] * A[..., :, None, :], axis=-3)
