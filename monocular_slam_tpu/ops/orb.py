"""Oriented BRIEF (ORB-style) descriptors, whole-batch vectorized.

Replaces OpenCV's `OrbDescriptorExtractor` (`src/FeatureExtractor.cpp:13-31`).
Orientation is the intensity-centroid angle over a radius-15 circular patch
(Rosin's moments, as in ORB); descriptors are 256 steered-BRIEF comparisons
bit-packed into 8 uint32 words — the same 32-byte binary layout the reference
stores in `Frame::Features::descriptors` (`src/Frame.h:22-34`) and DBoW2
popcounts over 8 int32 lanes (`ThirdParty/DBoW2/DBoW2/FORB.cpp:81-100`).

The sampling pattern: OpenCV ships a learned 256-pair pattern; we instead
draw a fixed pattern from a seeded Gaussian (sigma = patch/5, the original
BRIEF recipe) — statistically equivalent, deterministic, and original. A
descriptor is comparable only with descriptors produced by this module.

All gathers are batched: (K keypoints) x (256 pairs) index arithmetic into a
flattened image — one gather op per image, no per-keypoint loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

PATCH_RADIUS = 15  # orientation patch (ORB's HARRIS_K patch)
BRIEF_RADIUS = 13  # max test-point radius after rotation guard
N_BITS = 256
_PATTERN_SEED = 20160612  # fixed — descriptors must be reproducible forever


def _make_pattern() -> np.ndarray:
    """(256, 4) int8 test pairs (y1, x1, y2, x2), Gaussian sigma = r/2.5,
    clipped to the BRIEF radius. Fixed seed; generated once at import."""
    rng = np.random.RandomState(_PATTERN_SEED)
    sigma = BRIEF_RADIUS / 2.5
    pts = rng.randn(N_BITS, 4) * sigma
    pts = np.clip(pts, -BRIEF_RADIUS, BRIEF_RADIUS)
    return np.round(pts).astype(np.int8)


PATTERN = jnp.asarray(_make_pattern())  # (256, 4)


def _disc_offsets(radius: int) -> np.ndarray:
    """(M, 2) integer (dy, dx) offsets inside a disc."""
    ys, xs = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    m = ys**2 + xs**2 <= radius**2
    return np.stack([ys[m], xs[m]], axis=-1)


_DISC = _disc_offsets(PATCH_RADIUS)


def _disc_moment_masks() -> tuple[np.ndarray, np.ndarray]:
    """(31, 31) dy and dx weights, zero outside the orientation disc."""
    r = PATCH_RADIUS
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    m = (ys**2 + xs**2 <= r**2).astype(np.float32)
    return ys * m, xs * m


_WY, _WX = _disc_moment_masks()


def orientations(img: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle per keypoint. img: (H, W); yx: (K, 2) float.
    Returns (K,) angles in radians.

    Formulated as one vmapped 31x31 `dynamic_slice` per keypoint times two
    constant disc-weight masks — NOT a (K, 709) flat gather with a constant
    offset table, which sends the TPU backend into a pathological
    optimization pass (measured ~300 s XLA compile PER INSTANCE, ~2100 s
    for the 8-level extractor; this form compiles in seconds). Keypoints
    are border-suppressed upstream (`features.extract`), so the clamped
    slice origin never actually shifts a patch."""
    H, W = img.shape
    r = PATCH_RADIUS
    d = 2 * r + 1
    y0 = jnp.clip(yx[:, 0].astype(jnp.int32) - r, 0, H - d)
    x0 = jnp.clip(yx[:, 1].astype(jnp.int32) - r, 0, W - d)
    patches = jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(img, (y, x), (d, d))
    )(y0, x0)  # (K, d, d)
    wy = jnp.asarray(_WY, img.dtype)
    wx = jnp.asarray(_WX, img.dtype)
    m01 = jnp.sum(patches * wy[None], axis=(1, 2))
    m10 = jnp.sum(patches * wx[None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def descriptors(
    img: jnp.ndarray, yx: jnp.ndarray, angles: jnp.ndarray
) -> jnp.ndarray:
    """Steered-BRIEF descriptors. img should be pre-blurred (BRIEF noise
    sensitivity). Returns (K, 8) uint32 — 256 bits packed little-endian
    (bit b of word w = test index w*32+b)."""
    H, W = img.shape
    flat = img.reshape(-1)
    c, s = jnp.cos(angles), jnp.sin(angles)  # (K,)
    pat = PATTERN.astype(img.dtype)  # (256, 4)

    def rot_gather(py, px):
        # rotate (py, px) by angle: y' = s*px + c*py? Standard steering:
        # (x', y') = (x cos - y sin, x sin + y cos)
        ry = s[:, None] * px[None, :] + c[:, None] * py[None, :]
        rx = c[:, None] * px[None, :] - s[:, None] * py[None, :]
        yi = jnp.clip(jnp.round(yx[:, 0:1] + ry).astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(jnp.round(yx[:, 1:2] + rx).astype(jnp.int32), 0, W - 1)
        return flat[yi * W + xi]  # (K, 256)

    v1 = rot_gather(pat[:, 0], pat[:, 1])
    v2 = rot_gather(pat[:, 2], pat[:, 3])
    bits = (v1 < v2).astype(jnp.uint32)  # (K, 256)
    bits = bits.reshape(bits.shape[0], 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def unpack_pm1(desc: jnp.ndarray) -> jnp.ndarray:
    """(K, 8) uint32 packed bits -> (K, 256) int8 in {-1, +1}.

    The +-1 expansion turns Hamming distance into a 256-dim dot product:
    dist = (256 - a . b) / 2 — which the matcher runs on the MXU as one
    matmul instead of XOR+popcount loops (`FORB.cpp:81-100` equivalent).
    """
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[:-1] + (256,))
    return (bits.astype(jnp.int8) << 1) - jnp.int8(1)


def popcount_u32(x: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount on uint32 lanes — the exact trick DBoW2 uses for ORB
    distances (`FORB.cpp:87-99`), as a vectorized primitive for tests and
    the packed-descriptor path."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


def hamming_packed(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact Hamming distance between packed descriptors.
    a: (..., 8) uint32, b: (..., 8) uint32 -> (...,) int32."""
    return jnp.sum(popcount_u32(a ^ b), axis=-1).astype(jnp.int32)


class Features(NamedTuple):
    """Per-frame fixed-capacity feature set — the TPU analog of
    `Frame::Features` (`src/Frame.h:22-34`)."""

    uv: jnp.ndarray  # (N, 2) float (x, y) pixel positions at level 0 scale
    desc: jnp.ndarray  # (N, 8) uint32 packed ORB bits
    desc_pm1: jnp.ndarray  # (N, 256) int8 {-1,+1} for MXU matching
    angle: jnp.ndarray  # (N,)
    score: jnp.ndarray  # (N,) FAST score
    scale: jnp.ndarray  # (N,) pyramid scale (1.2^level) — `Features::scales`
    valid: jnp.ndarray  # (N,) bool
