"""Matrix-free preconditioned-CG bundle adjustment for large graphs.

The dense-S Schur path (`optim/ba.py:_schur_solve`) materializes the pose-
landmark cross term as an (F*6, P*3) matrix — O(F*P) memory, fine for the
windowed local BA the tracker runs, impossible at KITTI scale (10k keyframes,
SURVEY.md §5.7). This module solves the SAME damped Schur system

    S dxp = b_red,   S = Hpp_d − W Hll_d^{-1} W^T

without ever forming S: every application of S is three edge-batched
gathers/segment-sums (O(E) work, O(E) memory), which is also exactly the
shape that shards over a device mesh (`parallel/sharded_ba.py` reuses this
matvec with one psum per CG step).

The reference's analog is g2o's choice of linear solver behind the same
BlockSolver (`core/linear_solver.h`; Eigen sparse Cholesky in
`solvers/linear_solver_eigen.h` — the reference instantiates it at
`src/Util.cpp:18-19,43-52`). g2o ships a PCG option the reference never uses
(`core/block_solver.hpp` works with any `LinearSolver`); here PCG *is* the
scalable path, with a block-Jacobi (6x6 pose-block) preconditioner — the
standard choice for BA normal equations (cf. "Bundle Adjustment in the
Large"'s SCHUR_JACOBI).

Everything is fixed-trip-count with convergence freezing, so it jits and
scans cleanly.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from monocular_slam_tpu.optim import ba as ba_mod
from monocular_slam_tpu.utils.linalg import inv3x3
from monocular_slam_tpu.utils.precision import einsum_hp as _einsum, matmul_hp as _mm


class CGStats(NamedTuple):
    n_iters: jnp.ndarray  # iterations actually run (before freeze)
    rel_residual: jnp.ndarray  # final ||r|| / ||b||


def _gauge_mask(x, free):
    """Zero rows of x (F, 6) belonging to gauge-fixed poses."""
    return jnp.where(free[:, None], x, 0.0)


def schur_matvec(prob: ba_mod.BAProblem, lin, Hll_inv, lam, free, x):
    """y = S x with S the damped, gauge-masked Schur complement.

    x, y: (F, 6). Fixed poses behave as identity rows (y[fixed] = x[fixed]),
    matching the dense path's pinning (`optim/ba.py:_schur_solve`).

    Cost: two (E,) gathers + two segment_sums + batched small matmuls — no
    F*P term anywhere.
    """
    F = lin["Hpp"].shape[0]
    P = Hll_inv.shape[0]
    xf = _gauge_mask(x, free)

    # t1 = (Hpp + lam I) x
    t1 = _einsum("fij,fj->fi", lin["Hpp"], xf) + lam * xf

    # t2 = W Hll^{-1} W^T x, edge-batched:
    #   u_e = W_e^T x[cam(e)]           (E, 3)
    #   s_p = sum_{e: pt(e)=p} u_e      (P, 3)
    #   y_p = Hll^{-1} s_p              (P, 3)
    #   v_e = W_e y[pt(e)]              (E, 6)
    #   t2_f = sum_{e: cam(e)=f} v_e    (F, 6)
    u_e = _einsum("eij,ei->ej", lin["W_e"], xf[prob.cam_idx])  # (E, 3)
    s_p = jax.ops.segment_sum(u_e, prob.pt_idx, num_segments=P)
    y_p = _einsum("pij,pj->pi", Hll_inv, s_p)
    v_e = _einsum("eij,ej->ei", lin["W_e"], y_p[prob.pt_idx])  # (E, 6)
    t2 = jax.ops.segment_sum(v_e, prob.cam_idx, num_segments=F)

    y = _gauge_mask(t1 - t2, free)
    return y + jnp.where(free[:, None], 0.0, x)  # identity on fixed rows


def schur_diag_blocks(prob: ba_mod.BAProblem, lin, Hll_inv, lam):
    """Exact 6x6 diagonal blocks of the damped Schur complement:
    D_f = Hpp_d[f] − Σ_{e: cam(e)=f} W_e Hll_d^{-1}[pt(e)] W_e^T.

    (Each (frame, landmark) pair has at most one edge, so the per-edge sum
    equals the per-landmark-block sum.) This is the SCHUR_JACOBI
    preconditioner.
    """
    F = lin["Hpp"].shape[0]
    dtype = lin["Hpp"].dtype
    WHW_e = _mm(_mm(lin["W_e"], Hll_inv[prob.pt_idx]), jnp.swapaxes(lin["W_e"], -1, -2))
    D = lin["Hpp"] + lam * jnp.eye(6, dtype=dtype) - jax.ops.segment_sum(
        WHW_e, prob.cam_idx, num_segments=F
    )
    return D


def pcg(matvec, precond_apply, b, max_iters: int, rtol: float):
    """Fixed-trip-count preconditioned conjugate gradient with freeze-on-
    converge. b, x: (F, 6). Returns (x, CGStats)."""
    bnorm = jnp.sqrt(jnp.sum(b * b)) + 1e-30

    x0 = jnp.zeros_like(b)
    r0 = b  # x0 = 0
    z0 = precond_apply(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def body(carry, _):
        x, r, p, rz, it, done = carry

        def step(op):
            x, r, p, rz, it, _ = op
            Ap = matvec(p)
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.where(pAp == 0, 1e-30, pAp)
            x_n = x + alpha * p
            r_n = r - alpha * Ap
            z_n = precond_apply(r_n)
            rz_n = jnp.sum(r_n * z_n)
            beta = rz_n / jnp.where(rz == 0, 1e-30, rz)
            p_n = z_n + beta * p
            rel = jnp.sqrt(jnp.sum(r_n * r_n)) / bnorm
            done_n = (rel < rtol) | ~jnp.isfinite(rel)
            return x_n, r_n, p_n, rz_n, it + 1, done_n

        def frozen(op):
            return op

        out = jax.lax.cond(done, frozen, step, (x, r, p, rz, it, done))
        return out, None

    init = (x0, r0, p0, rz0, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    (x, r, _, _, it, _), _ = jax.lax.scan(body, init, None, length=max_iters)
    rel = jnp.sqrt(jnp.sum(r * r)) / bnorm
    return x, CGStats(it, rel)


def make_cg_solve_fn(max_cg_iters: int = 100, rtol: float = 1e-8):
    """Build a solve_fn(prob, lin, lam) -> (dxp, dxl, b_red) for
    `ba.bundle_adjust(..., solve_fn=...)` that uses block-Jacobi PCG on the
    Schur complement instead of a dense Cholesky."""

    def solve(prob: ba_mod.BAProblem, lin, lam):
        F = lin["Hpp"].shape[0]
        P = lin["Hll"].shape[0]
        dtype = lin["Hpp"].dtype
        free = ~prob.fixed

        Hll_d = lin["Hll"] + lam * jnp.eye(3, dtype=dtype)
        Hll_inv = inv3x3(Hll_d)

        # b_red = bp − W Hll^{-1} bl (gauge-masked), same reduction as the
        # dense path (`optim/ba.py:_schur_solve`).
        yb_p = _einsum("pij,pj->pi", Hll_inv, lin["bl"])  # (P, 3)
        wy_e = _einsum("eij,ej->ei", lin["W_e"], yb_p[prob.pt_idx])  # (E, 6)
        b_red = lin["bp"] - jax.ops.segment_sum(wy_e, prob.cam_idx, num_segments=F)
        b_red = _gauge_mask(b_red, free)

        D = schur_diag_blocks(prob, lin, Hll_inv, lam)
        # Fixed poses: identity preconditioner block. Zero-observation poses:
        # lam*I from damping keeps D invertible.
        D = jnp.where(free[:, None, None], D, jnp.eye(6, dtype=dtype)[None])
        D_inv = jnp.linalg.inv(D)

        matvec = partial(schur_matvec, prob, lin, Hll_inv, lam, free)
        precond = lambda r: _gauge_mask(_einsum("fij,fj->fi", D_inv, r), free)

        dxp, _stats = pcg(matvec, precond, b_red, max_cg_iters, rtol)

        # Landmark back-substitution: dxl = Hll^{-1} (bl − W^T dxp)
        wt_dxp_e = _einsum("eij,ei->ej", lin["W_e"], dxp[prob.cam_idx])  # (E, 3)
        rhs_l = lin["bl"] - jax.ops.segment_sum(wt_dxp_e, prob.pt_idx, num_segments=P)
        dxl = _einsum("pij,pj->pi", Hll_inv, rhs_l)
        return dxp, dxl, b_red

    return solve


def bundle_adjust_cg(
    prob: ba_mod.BAProblem,
    n_iters: int = ba_mod.FULL_BA_ITER,
    delta: float = ba_mod.THRESH_HUBER_FULL_BA,
    tau: float = 1e-5,
    max_cg_iters: int = 100,
    rtol: float = 1e-8,
) -> ba_mod.BAResult:
    """Large-scale bundle adjustment: the exact LM trust-region loop of
    `ba.bundle_adjust` with the dense Schur Cholesky swapped for matrix-free
    block-Jacobi PCG. Memory O(E + F + P); no (F*6, P*3) materialization."""
    return ba_mod.bundle_adjust(
        prob, n_iters=n_iters, delta=delta, tau=tau,
        solve_fn=make_cg_solve_fn(max_cg_iters, rtol),
    )
