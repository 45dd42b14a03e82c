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
