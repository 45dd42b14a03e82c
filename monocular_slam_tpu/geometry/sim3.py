"""Sim(3) similarity transforms for monocular loop closure.

Replaces g2o's `types/sim3.h` (vendored in the reference for the never-
finished `LoopCloser::ComputeSim3`, `src/LoopCloser.cpp:147-150`). A Sim3 is
represented as a pytree-friendly tuple of arrays ``(R, t, s)`` packed into a
single (..., 3, 5) array: columns 0:3 = R, column 3 = t, column 4 row 0 = s
(rows 1, 2 of column 4 are zero padding). Helpers pack/unpack so downstream
code can treat Sim3 like the (3, 4) SE3 arrays.

exp/log follow the standard Sim(3) formulas (omega, upsilon, sigma) with
sigma = log s.
"""

from __future__ import annotations

import jax.numpy as jnp

from monocular_slam_tpu.utils.precision import einsum_hp as _einsum, matmul_hp as _mm

from monocular_slam_tpu.geometry import so3

_EPS = 1e-8


def pack(R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3), (...,3), (...,) -> (..., 3, 5)."""
    s_col = jnp.zeros(R.shape[:-2] + (3, 1), dtype=R.dtype)
    s_col = s_col.at[..., 0, 0].set(s)
    return jnp.concatenate([R, t[..., None], s_col], axis=-1)


def unpack(S: jnp.ndarray):
    return S[..., :3, :3], S[..., :3, 3], S[..., 0, 4]


def identity(dtype=jnp.float32, batch_shape=()) -> jnp.ndarray:
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), tuple(batch_shape) + (3, 3))
    t = jnp.zeros(tuple(batch_shape) + (3,), dtype=dtype)
    s = jnp.ones(tuple(batch_shape), dtype=dtype)
    return pack(R, t, s)


def from_se3(T: jnp.ndarray, s=None) -> jnp.ndarray:
    """Lift an SE3 (..., 3, 4) to Sim3 with scale s (default 1)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    if s is None:
        s = jnp.ones(T.shape[:-2], dtype=T.dtype)
    return pack(R, t, s)


def to_se3(S: jnp.ndarray) -> jnp.ndarray:
    """Project to SE3: keep R, scale the translation by 1/s (the ORB-SLAM
    convention for applying a loop-closure Sim3 correction to keyframe poses)."""
    R, t, s = unpack(S)
    return jnp.concatenate([R, (t / jnp.maximum(s, _EPS)[..., None])[..., None]], axis=-1)


def apply(S: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """x -> s R x + t."""
    R, t, s = unpack(S)
    return s[..., None] * _einsum("...ij,...j->...i", R, X) + t


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """A after B: (sA RA)(sB RB x + tB) + tA."""
    Ra, ta, sa = unpack(A)
    Rb, tb, sb = unpack(B)
    return pack(_mm(Ra, Rb), sa[..., None] * _einsum("...ij,...j->...i", Ra, tb) + ta, sa * sb)


def inverse(S: jnp.ndarray) -> jnp.ndarray:
    R, t, s = unpack(S)
    Rt = jnp.swapaxes(R, -1, -2)
    sinv = 1.0 / jnp.maximum(s, _EPS)
    return pack(Rt, -sinv[..., None] * _einsum("...ij,...j->...i", Rt, t), sinv)


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """exp: sim(3) -> Sim(3). xi = (..., 7) as (omega[3], upsilon[3], sigma)."""
    omega, upsilon, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3.exp(omega)

    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = so3.hat(omega)
    W2 = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)

    # W(sigma, theta) matrix coefficients (Strasdat's thesis / Sophus):
    # V = A*I + B*W + C*W2 with
    #   s = e^sigma;
    #   A = (s-1)/sigma                                     [-> 1 at sigma=0]
    #   B = (sigma*s*sin + (1 - s*cos)*theta)/(th*(s2+th2)) [-> (1-cos)/th2]
    #   C = (A - ((s*cos - 1)*sigma + s*sin*theta)/(s2+th2)) / th2
    small_sig = jnp.abs(sigma) < 1e-6
    small_th = theta2 < _EPS
    sig_safe = jnp.where(small_sig, 1.0, sigma)
    th_safe = jnp.where(small_th, 1.0, theta)
    s2t2 = sigma * sigma + theta2

    A = jnp.where(small_sig, 1.0 + sigma / 2.0 + sigma * sigma / 6.0, (s - 1.0) / sig_safe)

    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    B_gen = (sigma * s * sin_t + (1.0 - s * cos_t) * theta) / jnp.where(
        small_th, 1.0, th_safe * jnp.maximum(s2t2, _EPS)
    )
    # theta -> 0 limit of B: (sigma*s - s + 1 ... ) -> use ((sigma-1)*s+1)/sigma^2
    B_sig = jnp.where(
        small_sig,
        0.5 + sigma / 3.0,
        ((sig_safe - 1.0) * s + 1.0) / jnp.maximum(sig_safe * sig_safe, _EPS),
    )
    B = jnp.where(small_th, B_sig, B_gen)

    C_gen = (
        A - ((s * cos_t - 1.0) * sigma + s * sin_t * theta) / jnp.maximum(s2t2, _EPS)
    ) / jnp.maximum(theta2, _EPS)
    # theta -> 0 limit of C: (s*(0.5*sigma^2 - sigma + 1) - 1)/sigma^3
    C_sig = jnp.where(
        small_sig,
        1.0 / 6.0 + sigma / 8.0,
        (s * (0.5 * sig_safe * sig_safe - sig_safe + 1.0) - 1.0) / (sig_safe**3),
    )
    C = jnp.where(small_th, C_sig, C_gen)

    V = A[..., None, None] * eye + B[..., None, None] * W + C[..., None, None] * W2
    t = _einsum("...ij,...j->...i", V, upsilon)
    return pack(R, t, s)


def log(S: jnp.ndarray) -> jnp.ndarray:
    """log: Sim(3) -> sim(3) via a Newton-free closed form: invert V numerically.

    V is 3x3 and well conditioned for moderate (sigma, theta), so we solve
    V upsilon = t with a linear solve instead of hand-deriving V^{-1}.
    """
    R, t, s = unpack(S)
    omega = so3.log(R)
    sigma = jnp.log(jnp.maximum(s, _EPS))
    # Rebuild V from (omega, sigma) exactly as in exp, then solve.
    xi0 = jnp.concatenate(
        [omega, jnp.zeros_like(omega), sigma[..., None]], axis=-1
    )
    S0 = exp(xi0)  # has t = 0; we only need its V — recover via probing
    # Probe V columns: exp with upsilon = e_i gives t = V e_i.
    def col(i):
        up = jnp.zeros_like(omega).at[..., i].set(1.0)
        xi = jnp.concatenate([omega, up, sigma[..., None]], axis=-1)
        return unpack(exp(xi))[1]

    V = jnp.stack([col(0), col(1), col(2)], axis=-1)
    del S0
    upsilon = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([omega, upsilon, sigma[..., None]], axis=-1)
