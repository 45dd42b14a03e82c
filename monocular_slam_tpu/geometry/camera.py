"""Pinhole camera model: projection, undistortion, masks.

Replaces the reference's per-frame ``K`` (`src/Frame.h:67`), the pinhole
projection inside g2o's `cam_project` (`types_six_dof_expmap.cpp:141-147`),
and the radtan distortion the reference hardcodes for TUM-F1 in
`src/CameraPoseEstimator.cpp:462-469`. Intrinsics are a 4-vector
``(fx, fy, cx, cy)`` (not a 3x3 matrix) so the hot paths never multiply by a
mostly-zero K; helpers convert to/from 3x3 when interop needs it.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


def intrinsics_to_matrix(k: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) (fx, fy, cx, cy) -> (..., 3, 3) K."""
    fx, fy, cx, cy = k[..., 0], k[..., 1], k[..., 2], k[..., 3]
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    return jnp.stack(
        [
            jnp.stack([fx, z, cx], axis=-1),
            jnp.stack([z, fy, cy], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_intrinsics(K: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]], axis=-1)


def project(k: jnp.ndarray, X_cam: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> pixels (..., 2). Matches g2o
    ``cam_project`` (`types_six_dof_expmap.cpp:141-147`)."""
    z = X_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < _EPS, jnp.where(z < 0, -_EPS, _EPS), z)
    u = k[..., 0] * X_cam[..., 0] * inv_z + k[..., 2]
    v = k[..., 1] * X_cam[..., 1] * inv_z + k[..., 3]
    return jnp.stack([u, v], axis=-1)


def backproject(k: jnp.ndarray, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels + depth -> camera-frame 3D points. (Fixes the u/v swap bug the
    reference has in `src/PointCloudVisualizer.cpp:437-439`.)"""
    x = (uv[..., 0] - k[..., 2]) / k[..., 0] * depth
    y = (uv[..., 1] - k[..., 3]) / k[..., 1] * depth
    return jnp.stack([x, y, depth], axis=-1)


def normalize_points(k: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels -> normalized image coordinates (K^{-1} uv)."""
    x = (uv[..., 0] - k[..., 2]) / k[..., 0]
    y = (uv[..., 1] - k[..., 3]) / k[..., 1]
    return jnp.stack([x, y], axis=-1)


def distort_radtan(dist: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Apply radial-tangential distortion to normalized coords.

    dist = (k1, k2, p1, p2, k3) — OpenCV ordering, as used by the reference's
    solvePnPRansac distortion input (`src/CameraPoseEstimator.cpp:462-469`).
    """
    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_radtan(dist: jnp.ndarray, xy_d: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Invert radtan distortion by the compensated fixed-point iteration
    x <- (x_d - tangential(x)) / radial(x) (static trip count, jit-friendly;
    converges for the strong TUM-F1-grade coefficients the reference hardcodes
    at `src/CameraPoseEstimator.cpp:462-469`)."""
    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
    xy = xy_d
    for _ in range(iters):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        tx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        ty = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        radial = jnp.where(jnp.abs(radial) < 1e-6, 1e-6, radial)
        xy = jnp.stack(
            [(xy_d[..., 0] - tx) / radial, (xy_d[..., 1] - ty) / radial], axis=-1
        )
    return xy


def in_image(uv: jnp.ndarray, width: int, height: int, margin: float = 0.0) -> jnp.ndarray:
    """Boolean mask of pixels inside the image bounds."""
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] <= width - 1 - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] <= height - 1 - margin)
    )


def undistort_pixels(k: jnp.ndarray, dist: jnp.ndarray, uv: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Undistort pixel coordinates: normalize -> invert radtan -> reproject.
    The per-frame correction the reference never applies to its keypoints
    (it only feeds distortion to solvePnPRansac, `CameraPoseEstimator.cpp:462-469`)."""
    xy_u = undistort_radtan(dist, normalize_points(k, uv), iters=iters)
    u = xy_u[..., 0] * k[..., 0] + k[..., 2]
    v = xy_u[..., 1] * k[..., 1] + k[..., 3]
    return jnp.stack([u, v], axis=-1)
