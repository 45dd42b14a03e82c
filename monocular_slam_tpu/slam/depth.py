"""RGB-D depth utilities: back-projection to world clouds.

Replaces the reference's depth ingestion + visualization path
(`FrameLoader::loadDepthFileList`, `src/FrameLoader.cpp:69-95`, and
`PointCloudVisualizer::DepthToCloudRGB_{VOPose,GTPose}`,
`src/PointCloudVisualizer.cpp:411-528`) — and fixes its u/v axis swap
(row index used with cx/fx, `:437-439`, SURVEY.md 2.4).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from monocular_slam_tpu.geometry import camera as cam
from monocular_slam_tpu.geometry import se3


def depth_to_cloud(
    depth: jnp.ndarray,
    k: jnp.ndarray,
    T_wc: jnp.ndarray | None = None,
    stride: int = 4,
    min_depth: float = 0.05,
    max_depth: float = 10.0,
):
    """Back-project a depth image (H, W) meters to a 3D cloud.

    Returns (points (M, 3), valid (M,)) in the camera frame, or in world
    coordinates when the world->camera pose `T_wc` is given. `stride`
    subsamples the image grid (the reference subsamples too).
    """
    depth = jnp.asarray(depth)
    H, W = depth.shape
    ys, xs = jnp.mgrid[0:H:stride, 0:W:stride]
    d = depth[ys, xs]
    uv = jnp.stack([xs, ys], axis=-1).astype(jnp.float32).reshape(-1, 2)
    d = d.reshape(-1)
    valid = (d > min_depth) & (d < max_depth) & jnp.isfinite(d)
    Xc = cam.backproject(k, uv, d)
    if T_wc is not None:
        X = se3.apply(se3.inverse(T_wc), Xc)
    else:
        X = Xc
    return X, valid


def colored_cloud(img: np.ndarray, depth, k, T_wc=None, stride: int = 4):
    """(points, rgb uint8, valid) — grayscale image intensity as color."""
    X, valid = depth_to_cloud(depth, k, T_wc, stride=stride)
    H, W = np.asarray(depth).shape
    g = np.asarray(img)[::stride, ::stride].reshape(-1)
    rgb = np.stack([g, g, g], axis=-1).astype(np.uint8)
    return np.asarray(X), rgb, np.asarray(valid)
