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


def _dual_reproj_err(S, X, Y, uv_x, uv_y, k_x, k_y, T_x, T_y):
    """Per-pair reprojection errors of a Sim3 hypothesis in BOTH frames.

    S maps X-side world to Y-side world. Y-side check: project S(X) through
    frame y's camera against the observed pixels uv_y; X-side check: project
    S^{-1}(Y) through frame x's camera against uv_x. Returns
    (err_x (..., N), err_y (..., N), pos_depth (..., N) bool)."""
    from monocular_slam_tpu.geometry import camera as cam
    from monocular_slam_tpu.geometry import se3

    Y_pred = sim3_mod.apply(S, X)  # (..., N, 3) in Y-side world
    X_pred = sim3_mod.apply(sim3_mod.inverse(S), Y)
    Xc_y = se3.apply(T_y, Y_pred)
    Xc_x = se3.apply(T_x, X_pred)
    err_y = jnp.linalg.norm(cam.project(k_y, Xc_y) - uv_y, axis=-1)
    err_x = jnp.linalg.norm(cam.project(k_x, Xc_x) - uv_x, axis=-1)
    pos = (Xc_y[..., 2] > 1e-3) & (Xc_x[..., 2] > 1e-3)
    return err_x, err_y, pos


def ransac_sim3_reproj(
    key: jax.Array,
    X: jnp.ndarray,
    Y: jnp.ndarray,
    mask: jnp.ndarray,
    uv_x: jnp.ndarray,
    uv_y: jnp.ndarray,
    k_x: jnp.ndarray,
    k_y: jnp.ndarray,
    T_x: jnp.ndarray,
    T_y: jnp.ndarray,
    n_iters: int = 256,
    px_thresh: float = 10.0,
    min_inliers: int = 12,
    polish_iters: int = 4,
) -> Sim3RansacResult:
    """RANSAC Sim3 from matched 3D-3D pairs, gated by REPROJECTION error in
    PIXELS in both frames — scale-free, unlike a metric 3D radius: a
    monocular map's scale is arbitrary (bootstrap-normalization dependent),
    so the same scene reconstructed at 2x map scale would silently halve a
    metric gate's effective tightness. This is ORB-SLAM's Sim3 acceptance
    criterion (its `ComputeSim3` checks chi2 of the dual reprojections; the
    reference's own `LoopCloser::ComputeSim3` returns false,
    `src/LoopCloser.cpp:147-150`).

    X: (N, 3) X-side world points (matched to frame x's features at pixels
    uv_x); Y/uv_y the Y-side counterparts; T_x/T_y (3, 4) world->camera.
    After the RANSAC winner, a Gauss-Newton polish refines the Sim3 on the
    inlier dual-reprojection residuals (7-dof tangent, `polish_iters`
    steps)."""
    from monocular_slam_tpu.geometry.epipolar import _sample_indices

    idx = _sample_indices(key, n_iters, 3, mask)  # (K, 3)
    S_h = horn_sim3(X[idx], Y[idx])  # (K, 3, 5)
    err_x, err_y, pos = _dual_reproj_err(
        S_h[:, None], X[None], Y[None], uv_x[None], uv_y[None],
        k_x, k_y, T_x, T_y,
    )
    inl = (err_x < px_thresh) & (err_y < px_thresh) & pos & mask[None]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    S_best = S_h[best]
    inliers = inl[best]

    # Horn refit on the winner's inliers, re-gated by reprojection
    w = inliers.astype(X.dtype)
    S_fit = horn_sim3(X, Y, w)
    ex, ey, pos1 = _dual_reproj_err(S_fit, X, Y, uv_x, uv_y, k_x, k_y, T_x, T_y)
    inl_fit = (ex < px_thresh) & (ey < px_thresh) & pos1 & mask
    use_fit = jnp.sum(inl_fit) >= scores[best]
    S_best = jnp.where(use_fit, S_fit, S_best)
    inliers = jnp.where(use_fit, inl_fit, inliers)

    # Gauss-Newton polish on the inlier dual-reprojection residuals
    def resid_flat(xi, S0, w):
        S = sim3_mod.compose(sim3_mod.exp(xi), S0)
        ex, ey, _ = _dual_reproj_err(S, X, Y, uv_x, uv_y, k_x, k_y, T_x, T_y)
        # mask BEFORE the multiply: a masked pair projecting at z~0 yields
        # inf, and 0*inf = NaN would poison the residual vector, Jacobian,
        # and cost (turning the cost-decrease guard into a silent no-op)
        ex = jnp.where(w > 0, ex * w, 0.0)
        ey = jnp.where(w > 0, ey * w, 0.0)
        return jnp.concatenate([ex, ey])

    def gn_rounds(S_cur, w):
        for _ in range(polish_iters):
            J = jax.jacfwd(resid_flat)(jnp.zeros(7, X.dtype), S_cur, w)
            r = resid_flat(jnp.zeros(7, X.dtype), S_cur, w)
            H = _mm(J.T, J) + 1e-6 * jnp.eye(7, dtype=X.dtype)
            dxi = jnp.linalg.solve(H, -_einsum("ni,n->i", J, r))
            S_new = sim3_mod.compose(sim3_mod.exp(dxi), S_cur)
            # accept only if the inlier cost drops (cheap trust region)
            c_old = jnp.sum(r * r)
            ex, ey, _ = _dual_reproj_err(
                S_new, X, Y, uv_x, uv_y, k_x, k_y, T_x, T_y
            )
            ex = jnp.where(w > 0, ex * w, 0.0)
            ey = jnp.where(w > 0, ey * w, 0.0)
            c_new = jnp.sum(ex**2 + ey**2)
            S_cur = jnp.where(c_new < c_old, S_new, S_cur)
        return S_cur

    # Annealed polish: GN at the detection gate, then re-gate at half and
    # quarter thresholds and re-polish on the tightening core — the loose
    # gate gives the detector recall, the tight core gives the loop edge
    # precision (a 10 px-gated fit applied as a correction measurably
    # degraded near-drift-free trajectories: its rotation estimate carries
    # ~0.05 rad of RNG-sensitive noise that the tight core removes).
    S_cur = gn_rounds(S_best, inliers.astype(X.dtype))
    for anneal in (0.5, 0.25):
        ex, ey, pos2 = _dual_reproj_err(
            S_cur, X, Y, uv_x, uv_y, k_x, k_y, T_x, T_y
        )
        tight = (ex < anneal * px_thresh) & (ey < anneal * px_thresh) & pos2 & mask
        # fall back to the loose set if the core is too small to constrain
        use_tight = jnp.sum(tight) >= jnp.minimum(min_inliers, jnp.sum(inliers))
        w2 = jnp.where(
            use_tight, tight,
            (ex < px_thresh) & (ey < px_thresh) & pos2 & mask,
        )
        S_cur = gn_rounds(S_cur, w2.astype(X.dtype))
    ex, ey, pos3 = _dual_reproj_err(S_cur, X, Y, uv_x, uv_y, k_x, k_y, T_x, T_y)
    inl2 = (ex < px_thresh) & (ey < px_thresh) & pos3 & mask
    # accept the polished fit at a modest recall loss: trading a few
    # marginal loose-gate inliers for the tight-core precision is the point
    # of the anneal (requiring >= the raw count silently discarded the
    # polish whenever it shed one 10 px straggler)
    n0 = jnp.sum(inliers)
    better = jnp.sum(inl2) >= jnp.maximum(
        min_inliers, (9 * n0) // 10
    )
    S_best = jnp.where(better, S_cur, S_best)
    inliers = jnp.where(better, inl2, inliers)
    n = jnp.sum(inliers)
    return Sim3RansacResult(S_best, inliers, n, n >= min_inliers)


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
