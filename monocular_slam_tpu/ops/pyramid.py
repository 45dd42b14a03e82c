"""Image pyramid + separable Gaussian blur, XLA-native.

Replaces the pyramid inside OpenCV's ORB (used via `OrbFeatureDetector` in
`src/FeatureExtractor.cpp:13-31`). Images are (H, W) float32 grayscale in
[0, 255]. All shapes static: pyramid levels are a Python-level tuple of
fixed-size arrays (scale factor 1.2, like ORB's default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SCALE_FACTOR = 1.2
N_LEVELS = 8


def gaussian_blur(img: jnp.ndarray, sigma: float = 2.0, radius: int = 3) -> jnp.ndarray:
    """Separable Gaussian blur with reflect padding. (..., H, W)."""
    x = jnp.arange(-radius, radius + 1, dtype=img.dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)

    def conv1d(a, axis):
        a = jnp.moveaxis(a, axis, -1)
        pad = [(0, 0)] * (a.ndim - 1) + [(radius, radius)]
        ap = jnp.pad(a, pad, mode="reflect")
        out = jnp.zeros_like(a)
        for i in range(2 * radius + 1):
            out = out + k[i] * jax.lax.dynamic_slice_in_dim(ap, i, a.shape[-1], axis=-1)
        return jnp.moveaxis(out, -1, axis)

    return conv1d(conv1d(img, -1), -2)


def resize_level(img: jnp.ndarray, level: int) -> jnp.ndarray:
    """Downscale to pyramid level (1.2^-level) with bilinear resize."""
    if level == 0:
        return img
    s = SCALE_FACTOR**level
    h = max(int(round(img.shape[-2] / s)), 16)
    w = max(int(round(img.shape[-1] / s)), 16)
    return jax.image.resize(img, img.shape[:-2] + (h, w), method="bilinear")


def build_pyramid(img: jnp.ndarray, n_levels: int = N_LEVELS):
    """Tuple of (n_levels) arrays, level i at scale 1.2^-i."""
    return tuple(resize_level(img, i) for i in range(n_levels))


def level_scale(level) -> float:
    return SCALE_FACTOR ** float(level)
