"""Fused FAST-9 corner score + 3x3 NMS as a row-tiled Pallas TPU kernel.

The XLA path (`ops/fast.py`) expresses the branch-free ring test as 16
`jnp.roll`s + min-doubling + an unrolled 3x3 max — correct, but each
intermediate is a whole-image array (the ring diffs alone are 16x the
image), so the op is HBM-bandwidth-bound whenever XLA's fuser gives up.
This kernel streams the image through VMEM in row slabs:

  - the (padded) image stays in HBM; each grid step DMAs a
    (TILE_H + 8, W) slab — 4 halo rows on each side (3 for the Bresenham
    ring + 1 for the NMS window) — into VMEM scratch;
  - ring diffs via in-register rolls (`pltpu.roll`); vertical wrap-around
    only corrupts halo rows, which are discarded; horizontal wrap lands in
    the zeroed 3-pixel border;
  - circular min-9 by index-doubling (the same log-trick as the XLA path);
  - score threshold + border mask + 3x3 NMS all fused, one (TILE_H, W)
    write per slab. HBM traffic = 1 read + 1 write of the image, period.

Semantics are identical to `fast.nms3(fast.corner_score(img, t))` (the
whole-image wrap-around of the XLA rolls is masked by the same border
zeroing). Replaces OpenCV FAST inside `OrbFeatureDetector` (reference
`src/FeatureExtractor.cpp:13-31`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monocular_slam_tpu.ops.fast import BORDER, RING_OFFSETS

HALO = 4  # 3 ring + 1 NMS


def _roll2(x, dy: int, dx: int):
    """Static 2D circular shift inside VMEM, matching
    jnp.roll(x, (-dy, -dx), axis=(0, 1)). pltpu.roll requires non-negative
    shifts, so negate modulo the axis length."""
    if dy:
        x = pltpu.roll(x, (-dy) % x.shape[0], 0)
    if dx:
        x = pltpu.roll(x, (-dx) % x.shape[1], 1)
    return x


def _kernel(h_ref, w_ref, img_hbm, out_ref, raw_ref, slab, sem, *, threshold: float, tile_h: int):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * tile_h, tile_h + 2 * HALO), :], slab, sem
    )
    dma.start()
    dma.wait()

    img = slab[:]
    S_H, W_pad = img.shape

    # ring diffs (16 live VMEM registers per slab — slabs are sized so the
    # ~35 live temporaries stay well under the VMEM budget)
    diffs = [_roll2(img, dy, dx) - img for (dy, dx) in RING_OFFSETS]

    def circular_min9(d):
        m = [jnp.minimum(d[i], d[(i + 1) % 16]) for i in range(16)]  # win 2
        m = [jnp.minimum(m[i], m[(i + 2) % 16]) for i in range(16)]  # win 4
        m = [jnp.minimum(m[i], m[(i + 4) % 16]) for i in range(16)]  # win 8
        m = [jnp.minimum(m[i], d[(i + 8) % 16]) for i in range(16)]  # win 9
        out = m[0]
        for i in range(1, 16):
            out = jnp.maximum(out, m[i])
        return out

    bright = circular_min9(diffs)
    dark = circular_min9([-d for d in diffs])
    raw = jnp.maximum(bright, dark)
    # raw (pre-threshold, pre-NMS) map for the sub-pixel parabola
    # (`fast.subpixel_from_raw`); only the interior matters — the outer
    # BORDER ring differs from the XLA path (zero-pad vs wrap) and is gated
    raw_ref[:] = raw[HALO : HALO + tile_h]
    score = jnp.where(raw > threshold, raw, 0.0)

    # border mask in IMAGE coordinates: slab row r is image row
    # i*tile_h + r - HALO (the HBM copy is of the HALO-padded image)
    h = h_ref[0]
    w = w_ref[0]
    ys = jax.lax.broadcasted_iota(jnp.int32, (S_H, W_pad), 0) + i * tile_h - HALO
    xs = jax.lax.broadcasted_iota(jnp.int32, (S_H, W_pad), 1)
    interior = (ys >= BORDER) & (ys < h - BORDER) & (xs >= BORDER) & (xs < w - BORDER)
    score = jnp.where(interior, score, 0.0)

    # 3x3 NMS (vertical wrap corrupts only halo rows; horizontal wrap only
    # the zeroed border)
    mx = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            mx = jnp.maximum(mx, _roll2(score, dy, dx))
    out_ref[:] = jnp.where(score >= mx, score, 0.0)[HALO : HALO + tile_h]


@functools.partial(jax.jit, static_argnames=("threshold", "tile_h", "interpret"))
def corner_maps(
    img: jnp.ndarray,
    threshold: float = 20.0,
    tile_h: int = 64,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(nms_score, raw_score) maps of a single (H, W) f32 image in one fused
    pass. nms equals `fast.nms3(fast.corner_score(img, threshold))`; raw
    equals `fast.corner_score_raw(img)` on the interior (outside the BORDER
    ring, where wrap-vs-zero-pad semantics differ and detection is masked
    anyway)."""
    H, W = img.shape
    W_pad = -(-W // 128) * 128
    # ~35 (slab_h, W_pad) f32 temporaries live at the peak; keep them inside
    # a conservative 10 MB VMEM budget (16 MB hardware limit) by shrinking
    # the slab for wide images (e.g. KITTI 1241-wide needs tile_h 32).
    budget_rows = int(10e6 / (35 * 4 * W_pad)) - 2 * HALO
    tile_h = max(8, min(tile_h, (budget_rows // 8) * 8))
    n_tiles = -(-H // tile_h)
    # HALO zero-rows above, image, zero-fill below to n_tiles*tile_h + 2*HALO
    H_hbm = n_tiles * tile_h + 2 * HALO
    imgp = (
        jnp.zeros((H_hbm, W_pad), jnp.float32)
        .at[HALO : HALO + H, :W]
        .set(img.astype(jnp.float32))
    )
    hw = (jnp.asarray([H], jnp.int32), jnp.asarray([W], jnp.int32))

    out, raw = pl.pallas_call(
        functools.partial(_kernel, threshold=float(threshold), tile_h=tile_h),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            # index_map receives (grid idx, *scalar-prefetch refs)
            out_specs=(
                pl.BlockSpec(
                    (tile_h, W_pad), lambda i, h, w: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tile_h, W_pad), lambda i, h, w: (i, 0), memory_space=pltpu.VMEM
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((tile_h + 2 * HALO, W_pad), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles * tile_h, W_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * tile_h, W_pad), jnp.float32),
        ),
        interpret=interpret,
    )(*hw, imgp)
    return out[:H, :W].astype(img.dtype), raw[:H, :W].astype(img.dtype)


def corner_score_nms(
    img: jnp.ndarray,
    threshold: float = 20.0,
    tile_h: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """NMS'd FAST-9 score map of a single (H, W) f32 image; equals
    `fast.nms3(fast.corner_score(img, threshold))`."""
    return corner_maps(img, threshold, tile_h, interpret)[0]


def detect(img: jnp.ndarray, max_corners: int, threshold: float = 20.0,
           interpret: bool = False):
    """Fixed-capacity FAST detection on the fused kernel; same contract as
    `fast.detect`."""
    from monocular_slam_tpu.ops.fast import Corners

    score = corner_score_nms(img, threshold, interpret=interpret)
    flat = score.reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_corners)
    W = img.shape[-1]
    yx = jnp.stack([idx // W, idx % W], axis=-1).astype(img.dtype)
    return Corners(yx=yx, score=vals, valid=vals > 0)
