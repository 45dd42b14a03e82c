"""Fused Hamming-distance + top-2 matcher as a Pallas TPU kernel.

The XLA path (`ops/matching.py`) materializes the full (N, M) distance
matrix in HBM, then runs two argmin passes over it. This kernel streams B
tiles through VMEM, feeds the MXU with the +-1 int8 matmul, and keeps only
the running (best, second-best, argbest) per query row in VMEM scratch —
O(N) memory traffic instead of O(N*M), which is what lets map-wide
association (N features x 20k+ landmarks) and loop-closure scoring run at
full MXU speed.

Falls back to interpret mode off-TPU so tests exercise identical code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1 << 20  # python int: jnp constants cannot be captured by kernels


def _kernel(a_ref, b_ref, bvalid_ref, d1_ref, d2_ref, idx_ref, best1, best2, bidx):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    TILE_M = b_ref.shape[0]

    @pl.when(j == 0)
    def _():
        best1[:] = jnp.full_like(best1, jnp.int32(_BIG))
        best2[:] = jnp.full_like(best2, jnp.int32(_BIG))
        bidx[:] = jnp.zeros_like(bidx)

    # (TILE_N, 256) x (256, TILE_M) int8 matmul on the MXU -> int32 dots
    dots = jax.lax.dot_general(
        a_ref[:],
        b_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dist = (256 - dots) >> 1  # (TILE_N, TILE_M)
    dist = jnp.where(bvalid_ref[:, 0][None, :] != 0, dist, _BIG)

    # top-2 within this tile. Mosaic's argmin lowering only supports f32 —
    # distances are small ints, exactly representable, so cast is lossless.
    dist_f = dist.astype(jnp.float32)
    t1 = jnp.min(dist_f, axis=1).astype(jnp.int32)  # (TILE_N,)
    col = jnp.argmin(dist_f, axis=1).astype(jnp.int32)
    # mask out the argmin column to get the tile's second-best
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    dist2 = jnp.where(cols == col[:, None], _BIG, dist)
    t2 = jnp.min(dist2, axis=1)
    gidx = j * TILE_M + col  # global B index of the tile best

    # merge running (best1, best2) with tile (t1, t2)
    b1 = best1[:, 0]
    b2 = best2[:, 0]
    gi = bidx[:, 0]
    new_b1 = jnp.minimum(b1, t1)
    new_gi = jnp.where(t1 < b1, gidx, gi)
    new_b2 = jnp.minimum(jnp.maximum(b1, t1), jnp.minimum(b2, t2))
    best1[:, 0] = new_b1
    best2[:, 0] = new_b2
    bidx[:, 0] = new_gi

    @pl.when(j == nj - 1)
    def _():
        d1_ref[:, 0] = best1[:, 0]
        d2_ref[:, 0] = best2[:, 0]
        idx_ref[:, 0] = bidx[:, 0]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "interpret"))
def hamming_top2(
    a_pm1: jnp.ndarray,
    b_pm1: jnp.ndarray,
    b_valid: jnp.ndarray,
    tile_n: int = 128,
    tile_m: int = 128,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-row (best_dist, second_dist, best_idx) of Hamming distances
    between a (N, 256) and b (M, 256) +-1 int8 descriptor sets. Invalid B
    columns are excluded. N, M padded to tile multiples internally.

    Default (128, 128) tiles are the validated configuration on the v5e
    remote-compile toolchain; larger tiles currently trip its VMEM
    accounting."""
    N, M = a_pm1.shape[0], b_pm1.shape[0]
    N_pad = -(-N // tile_n) * tile_n
    M_pad = -(-M // tile_m) * tile_m
    a = jnp.zeros((N_pad, 256), jnp.int8).at[:N].set(a_pm1.astype(jnp.int8))
    b = jnp.zeros((M_pad, 256), jnp.int8).at[:M].set(b_pm1.astype(jnp.int8))
    # 2D (M, 1): 1D int32 operands hit XLA/Mosaic tiled-layout mismatches
    bv = jnp.zeros((M_pad, 1), jnp.int32).at[:M, 0].set(b_valid.astype(jnp.int32))

    grid = (N_pad // tile_n, M_pad // tile_m)
    d1, d2, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, 256), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 256), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((N_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((N_pad, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_n, 1), jnp.int32),
            pltpu.VMEM((tile_n, 1), jnp.int32),
            pltpu.VMEM((tile_n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(a, b, bv)
    return d1[:N, 0], d2[:N, 0], idx[:N, 0]


def match_pallas(
    a_pm1, b_pm1, a_valid, b_valid, ratio: float = 0.85, max_dist: int = 256,
    cross_check: bool = False, interpret: bool = False,
):
    """Drop-in Lowe-ratio matcher on the fused kernel. Returns the same
    Matches tuple as ops.matching.match (cross_check computes the reverse
    direction with a second kernel pass)."""
    from monocular_slam_tpu.ops.matching import Matches

    d1, d2, idx = hamming_top2(a_pm1, b_pm1, b_valid, interpret=interpret)
    ok = (
        a_valid
        & (d1.astype(jnp.float32) < ratio * d2.astype(jnp.float32))
        & (d1 <= max_dist)
    )
    if cross_check:
        rd1, _, ridx = hamming_top2(b_pm1, a_pm1, a_valid, interpret=interpret)
        ok = ok & (ridx[idx] == jnp.arange(a_pm1.shape[0], dtype=jnp.int32))
    return Matches(idx=idx, dist=d1, ok=ok, n_matches=jnp.sum(ok))
