"""SE(3) rigid transforms as (..., 3, 4) ``Rt`` arrays, plus exp/log.

The reference stores camera poses as 3x4 world->camera matrices ``Rt``
(`src/Frame.h:57-61`) and converts to/from g2o's SE3Quat for optimization
(`src/Converter.cpp:8-31`). Here the 3x4 array IS the canonical pose type, and
the 6-vector twist is ordered ``xi = (omega[3], upsilon[3])`` — rotation first,
matching g2o's ``SE3Quat::exp`` ordering used by the vertex update in
`types_six_dof_expmap.h:73-76`, so the analytic BA Jacobians keep their
classic 2x6 form.

All ops broadcast over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from monocular_slam_tpu.utils.precision import einsum_hp as _einsum, matmul_hp as _mm

from monocular_slam_tpu.geometry import so3
from monocular_slam_tpu.geometry.so3 import _small_thresh

_EPS = 1e-8


def identity(dtype=jnp.float32, batch_shape=()) -> jnp.ndarray:
    """Identity pose(s), shape batch_shape + (3, 4)."""
    eye = jnp.concatenate([jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype=dtype)], axis=-1)
    return jnp.broadcast_to(eye, tuple(batch_shape) + (3, 4))


def from_Rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3), (..., 3) -> (..., 3, 4)."""
    return jnp.concatenate([R, t[..., None]], axis=-1)


def rotation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """A then-applied-after B: returns A @ B as rigid transforms (both 3x4).

    compose(A, B) maps x -> A(B(x)). Matches the reference's
    ``concatenateRts`` chaining (`src/CameraPoseEstimator.cpp:248-255`).
    """
    Ra, ta = rotation(A), translation(A)
    Rb, tb = rotation(B), translation(B)
    return from_Rt(_mm(Ra, Rb), _einsum("...ij,...j->...i", Ra, tb) + ta)


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Rigid inverse: [R t] -> [R^T, -R^T t]. The reference's world<->camera
    flip `RtToWorldRT`/`WorldRtToRT` (`src/PointCloudVisualizer.cpp:198-231`)."""
    R, t = rotation(T), translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return from_Rt(Rt, -_einsum("...ij,...j->...i", Rt, t))


def apply(T: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Transform points: (..., 3, 4) x (..., 3) -> (..., 3). Expanded
    multiply+sum (`small_mv`): exact f32, stays on the VPU — this is the
    hottest op in BA linearization (one call per edge per LM iteration)."""
    from monocular_slam_tpu.utils.precision import small_mv

    return small_mv(rotation(T), X) + translation(T)


def camera_center(T_wc: jnp.ndarray) -> jnp.ndarray:
    """Camera center in world coords from a world->camera pose: -R^T t.
    Replaces the reference's `RtToWorldT` (`src/PointCloudVisualizer.cpp:198`)."""
    R, t = rotation(T_wc), translation(T_wc)
    return -_einsum("...ji,...j->...i", R, t)


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """exp: se(3) -> SE(3). xi = (..., 6) as (omega[3], upsilon[3]) -> (..., 3, 4).

    Rotation block first (g2o SE3Quat::exp ordering, `types/se3quat.h`).
    """
    omega, upsilon = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _small_thresh(xi.dtype)

    W = so3.hat(omega)
    W2 = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)

    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS * _EPS))
    # (theta - sin theta)/theta^3 with Taylor fallback 1/6 - theta^2/120
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS * _EPS * _EPS),
    )
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = _einsum("...ij,...j->...i", V, upsilon)
    return from_Rt(R, t)


def log(T: jnp.ndarray) -> jnp.ndarray:
    """log: SE(3) -> se(3), returns (..., 6) as (omega, upsilon)."""
    R, t = rotation(T), translation(T)
    omega = so3.log(R)
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _small_thresh(T.dtype)

    W = so3.hat(omega)
    W2 = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    half_theta = 0.5 * theta
    # V^{-1} = I - W/2 + (1 - theta cot(theta/2) / 2) / theta^2 * W^2
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.maximum(jnp.sin(half_theta), _EPS))
        / jnp.maximum(theta2, _EPS * _EPS),
    )
    Vinv = eye - 0.5 * W + cot_term[..., None, None] * W2
    upsilon = _einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([omega, upsilon], axis=-1)


def to_homogeneous(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) -> (..., 4, 4)."""
    bottom = jnp.zeros(T.shape[:-2] + (1, 4), dtype=T.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([T, bottom], axis=-2)


def normalize(T: jnp.ndarray) -> jnp.ndarray:
    """Re-project the rotation block onto SO(3) (for drift after updates)."""
    return from_Rt(so3.project_to_so3(rotation(T)), translation(T))
