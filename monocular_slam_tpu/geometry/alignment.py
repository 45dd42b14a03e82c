"""3D-3D similarity alignment (Horn/Umeyama) + RANSAC — the Sim3 solver.

The reference declared but never implemented `LoopCloser::ComputeSim3`
(`src/LoopCloser.cpp:147-150` returns false). This module supplies it:
closed-form weighted Sim(3) from 3D point pairs, vmappable for a batched
minimal-sample RANSAC (3-point hypotheses).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from monocular_slam_tpu.geometry import sim3 as sim3_mod
from monocular_slam_tpu.geometry import so3
from monocular_slam_tpu.utils.precision import einsum_hp as _einsum, matmul_hp as _mm

_EPS = 1e-12


def horn_sim3(
    X: jnp.ndarray, Y: jnp.ndarray, w: jnp.ndarray | None = None, with_scale: bool = True
) -> jnp.ndarray:
    """Weighted least-squares Sim3 S with Y ~ S(X) = s R X + t.

    X, Y: (..., N, 3); w: (..., N) nonnegative. Returns (..., 3, 5) packed
    Sim3 (see geometry.sim3). Batched/vmappable (used per RANSAC hypothesis).
    """
    if w is None:
        w = jnp.ones(X.shape[:-1], dtype=X.dtype)
    wn = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), _EPS)
    mu_x = jnp.sum(X * wn[..., None], axis=-2, keepdims=True)
    mu_y = jnp.sum(Y * wn[..., None], axis=-2, keepdims=True)
    xc = X - mu_x
    yc = Y - mu_y
    cov = _einsum("...ni,...nj,...n->...ij", yc, xc, wn)  # (..., 3, 3)
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(_mm(U, Vt))
    S_diag = jnp.ones(cov.shape[:-2] + (3,), dtype=X.dtype)
    S_diag = S_diag.at[..., 2].set(det)
    R = _mm(U * S_diag[..., None, :], Vt)
    var_x = jnp.sum(jnp.sum(xc * xc, axis=-1) * wn, axis=-1)
    if with_scale:
        s = jnp.sum(D * S_diag, axis=-1) / jnp.maximum(var_x, _EPS)
    else:
        s = jnp.ones(cov.shape[:-2], dtype=X.dtype)
    t = mu_y[..., 0, :] - s[..., None] * _einsum("...ij,...j->...i", R, mu_x[..., 0, :])
    return sim3_mod.pack(R, t, s)


class Sim3RansacResult(NamedTuple):
    S: jnp.ndarray  # (3, 5)
    inliers: jnp.ndarray  # (N,)
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


def ransac_sim3(
    key: jax.Array,
    X: jnp.ndarray,
    Y: jnp.ndarray,
    mask: jnp.ndarray,
    n_iters: int = 256,
    thresh: float = 0.1,
    min_inliers: int = 12,
) -> Sim3RansacResult:
    """RANSAC Sim3 from 3D-3D pairs: 3-point Horn hypotheses, inliers by
    Euclidean residual |Y - S(X)| < thresh (scene units), weighted refit."""
    from monocular_slam_tpu.geometry.epipolar import _sample_indices

    idx = _sample_indices(key, n_iters, 3, mask)  # (K, 3)
    S_h = horn_sim3(X[idx], Y[idx])  # (K, 3, 5)
    resid = jnp.linalg.norm(
        sim3_mod.apply(S_h[:, None], X[None]) - Y[None], axis=-1
    )  # (K, N)
    inl = (resid < thresh) & mask[None]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    # weighted refit on best inliers
    w = inl[best].astype(X.dtype)
    S_fit = horn_sim3(X, Y, w)
    resid_fit = jnp.linalg.norm(sim3_mod.apply(S_fit, X) - Y, axis=-1)
    inl_fit = (resid_fit < thresh) & mask
    use_fit = jnp.sum(inl_fit) >= scores[best]
    S_best = jnp.where(use_fit, S_fit, S_h[best])
    inliers = jnp.where(use_fit, inl_fit, inl[best])
    n = jnp.sum(inliers)
    return Sim3RansacResult(S_best, inliers, n, n >= min_inliers)
