"""Synthetic SLAM sequences with exact ground truth.

Two generators:
  - `feature_sequence`: a world point cloud with stable random ORB-like
    descriptors, projected into a camera trajectory with noise/dropout —
    feeds `SlamSession.add_frame_features` directly. This is the fixture
    path (the reference decouples BA tests from the frontend the same way
    via CSV state snapshots, `src/Util.cpp:384-612` / SURVEY.md 5.4).
  - `textured_sequence`: rendered images of a textured plane under camera
    motion, for end-to-end tests through the real feature extractor.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from monocular_slam_tpu.geometry import camera, se3, so3
from monocular_slam_tpu.ops import orb

TUM_K = jnp.array([517.3, 516.5, 318.6, 255.3])


class SyntheticSequence(NamedTuple):
    poses_gt: jnp.ndarray  # (F, 3, 4) world->camera
    points_gt: jnp.ndarray  # (P, 3)
    k: jnp.ndarray  # (4,)
    frames: list  # list of orb.Features
    timestamps: np.ndarray  # (F,)


def arc_trajectory(n_frames: int, radius: float = 4.0, dtype=jnp.float32, ang_step: float = 0.04):
    """Cameras orbiting a scene at the origin, always looking at it. A full
    revisit (loop) happens at ang_step * i = 2 pi."""
    poses = []
    for i in range(n_frames):
        ang = ang_step * i
        c = jnp.array(
            [radius * np.sin(ang), 0.15 * np.sin(0.3 * i), -radius * np.cos(ang)],
            dtype=dtype,
        )
        # look-at origin: z-axis towards -c
        z = -c / jnp.linalg.norm(c)
        x = jnp.cross(jnp.array([0.0, 1.0, 0.0], dtype=dtype), z)
        x = x / jnp.linalg.norm(x)
        y = jnp.cross(z, x)
        R_wc = jnp.stack([x, y, z], axis=0)  # rows = camera axes in world
        t = -R_wc @ c
        poses.append(jnp.concatenate([R_wc, t[:, None]], axis=1))
    return jnp.stack(poses)


def feature_sequence(
    key,
    n_frames: int = 30,
    n_world_points: int = 800,
    n_features: int = 400,
    pix_noise: float = 0.3,
    drop_prob: float = 0.1,
    desc_flip_bits: int = 8,
    image_wh=(640, 480),
    k=TUM_K,
    ang_step: float = 0.04,
) -> SyntheticSequence:
    """Project a fixed world point cloud into an arc trajectory.

    Each world point has a persistent random descriptor; per-frame
    observations flip `desc_flip_bits` random bits (descriptor noise) and
    drop out with `drop_prob`. Per frame the first `n_features` visible
    points fill the fixed-capacity Features struct.
    """
    kw, kd = jax.random.split(key)
    pts = jax.random.uniform(kw, (n_world_points, 3), minval=-2.0, maxval=2.0)
    pts = pts * jnp.array([2.0, 1.5, 2.0])
    poses = arc_trajectory(n_frames, ang_step=ang_step)
    W, H = image_wh

    desc_bits = jax.random.bernoulli(kd, 0.5, (n_world_points, 256))

    frames = []
    for i in range(n_frames):
        ki = jax.random.fold_in(key, 1000 + i)
        k1, k2, k3 = jax.random.split(ki, 3)
        Xc = se3.apply(poses[i], pts)
        uv = camera.project(k, Xc)
        if pix_noise > 0:
            uv = uv + pix_noise * jax.random.normal(k1, uv.shape)
        vis = (
            (Xc[:, 2] > 0.3)
            & camera.in_image(uv, W, H, margin=4.0)
            & (jax.random.uniform(k2, (n_world_points,)) > drop_prob)
        )
        # stable order: take first n_features visible points; if the world
        # has fewer points than feature capacity, pad with invalid slots
        order = jnp.argsort(~vis)  # visible first (False < True)
        if n_world_points < n_features:
            order = jnp.concatenate(
                [order, jnp.zeros(n_features - n_world_points, order.dtype)]
            )
        sel = order[:n_features]
        valid = vis[sel] & (jnp.arange(n_features) < n_world_points)
        bits = desc_bits[sel]
        if desc_flip_bits > 0:
            flip_idx = jax.random.randint(k3, (n_features, desc_flip_bits), 0, 256)
            flips = jax.nn.one_hot(flip_idx, 256, dtype=jnp.bool_).any(axis=1)
            bits = jnp.logical_xor(bits, flips)
        pm1 = (bits.astype(jnp.int8) << 1) - jnp.int8(1)
        packed = _pack_bits(bits)
        frames.append(
            orb.Features(
                uv=uv[sel].astype(jnp.float32),
                desc=packed,
                desc_pm1=pm1,
                angle=jnp.zeros(n_features, jnp.float32),
                score=jnp.ones(n_features, jnp.float32),
                scale=jnp.ones(n_features, jnp.float32),
                valid=valid,
            )
        )
    return SyntheticSequence(
        poses_gt=poses,
        points_gt=pts,
        k=k,
        frames=frames,
        timestamps=np.arange(n_frames, dtype=np.float64) * (1.0 / 30.0),
    )


def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., 256) bool -> (..., 8) uint32 little-endian per 32-bit word."""
    b = bits.reshape(bits.shape[:-1] + (8, 32)).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def textured_sequence(key, n_frames: int = 10, wh=(320, 240)):
    """Images of a textured fronto-parallel plane under lateral+yaw motion.

    Returns (images list[(H, W) f32], poses_gt (F, 3, 4), k). Texture depth
    is constant (planar scene) — fine for frontend smoke tests.
    """
    W, H = wh
    k = jnp.array([260.0, 260.0, W / 2.0, H / 2.0])
    tex = jax.random.uniform(key, (64, 64)) * 255.0
    tex = jnp.clip(jax.image.resize(tex, (512, 512), "cubic"), 0, 255)

    images, poses = [], []
    depth = 3.0
    for i in range(n_frames):
        R = so3.exp(jnp.array([0.0, 0.01 * i, 0.0]))
        t = jnp.array([-0.05 * i, 0.0, 0.0])
        T = se3.from_Rt(R, t)  # world->camera
        poses.append(T)
        # inverse-warp: for each pixel, ray -> plane z=depth (world), sample tex
        ys, xs = jnp.mgrid[0:H, 0:W]
        xy = camera.normalize_points(
            k, jnp.stack([xs, ys], axis=-1).astype(jnp.float32)
        )
        ray = jnp.concatenate([xy, jnp.ones((H, W, 1))], axis=-1)
        Rcw = T[:3, :3].T
        C = se3.camera_center(T)
        dirs = ray @ Rcw.T  # world-frame ray directions
        lam = (depth - C[2]) / dirs[..., 2]
        Xw = C + lam[..., None] * dirs
        # map world x, y in [-2, 2] to texture coords
        u = (Xw[..., 0] + 2.0) / 4.0 * 511.0
        v = (Xw[..., 1] + 2.0) / 4.0 * 511.0
        ui = jnp.clip(u.astype(jnp.int32), 0, 511)
        vi = jnp.clip(v.astype(jnp.int32), 0, 511)
        images.append(tex[vi, ui])
    return images, jnp.stack(poses), k
