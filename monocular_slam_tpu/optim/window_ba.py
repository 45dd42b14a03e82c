"""Scatter-free bundle adjustment for (frame x feature)-structured graphs.

Every BA problem in this system derives its edges from the per-frame feature
table `feat_point` (F, N), so each edge IS a (frame, feature) cell and each
(frame, landmark) pair has at most one edge. The generic engine in
`optim/ba.py` flattens that structure into arbitrary (cam_idx, pt_idx) edge
lists and pays for it with `segment_sum` scatters and per-edge gathers every
LM iteration — measured 88.6 ms of the 95 ms TPU frame step at the bench
workload (W=8, N=1000, P_slab=4096), i.e. scatters dominate the whole SLAM
frame.

This module keeps the (F, N) layout end-to-end so every reduction in the hot
loop is either a reshape-sum or a gather:

  camera-side reduction   sum over the feature axis of an (F, N, ...) array
  (g2o: per-edge JtWJ     (one fused einsum per block type)
   scatter into Hpp)
  landmark-side reduction an (P, F) observation table, built ONCE per solve
  (g2o: per-edge scatter  with a single scatter, turns landmark sums into
   into Hll / Schur        gather + sum over the F axis
   elimination loop,
   block_solver.hpp:373-439)
  pose gather per edge    broadcast poses[:, None] — free

The observation table also deduplicates edges: if two features of one frame
point at the same landmark (possible after `mapping.fuse`), exactly one edge
survives — g2o would have double-counted identical information.

The LM trust-region loop, lambda schedule, and gauge handling are shared with
`optim/ba.py` (`bundle_adjust(..., linearize_fn, chi2_fn, solve_fn)`), so the
two paths are numerically interchangeable (see tests/test_window_ba.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from monocular_slam_tpu.optim import ba as ba_mod
from monocular_slam_tpu.optim import residuals, robust
from monocular_slam_tpu.utils.linalg import inv3x3
from monocular_slam_tpu.utils.precision import einsum_hp as _einsum, matmul_hp as _mm


class WindowBAProblem(NamedTuple):
    """Structured BA graph: edge (f, n) observes landmark pt_slot[f, n].

    The same graph the reference builds by iterating MapPoint observation
    maps (`src/Util.cpp:87-169`), kept in its natural (frame, feature) form.
    """

    poses: jnp.ndarray  # (F, 3, 4) world->camera
    points: jnp.ndarray  # (P, 3)
    k: jnp.ndarray  # (F, 4)
    pt_slot: jnp.ndarray  # (F, N) int32 landmark slot, any value if invalid
    uv: jnp.ndarray  # (F, N, 2)
    info: jnp.ndarray  # (F, N)
    valid: jnp.ndarray  # (F, N) bool
    fixed: jnp.ndarray  # (F,) bool
    obs_table: jnp.ndarray  # (P, F) int32 flat edge id f*N+n, or -1


def build(poses, points, k, pt_slot, uv, info, valid, fixed) -> WindowBAProblem:
    """Assemble the problem + its observation table (the one scatter, done
    once per solve — LM iterations never scatter)."""
    F, N = pt_slot.shape
    P = points.shape[0]
    flat = jnp.arange(F * N, dtype=jnp.int32)
    cam_of = jnp.repeat(jnp.arange(F, dtype=jnp.int32), N)
    slot = jnp.where(valid.reshape(-1), pt_slot.reshape(-1), P)
    table = (
        jnp.full((P + 1, F), -1, jnp.int32)
        .at[slot, cam_of]
        .set(flat, mode="drop")[:P]
    )
    # Dedup: an edge survives iff the table points back at it (two features
    # of one frame on the same landmark -> one edge, arbitrary winner).
    slot_safe = jnp.minimum(slot, P - 1)
    valid = valid & (table[slot_safe, cam_of] == flat).reshape(F, N) & (slot < P).reshape(F, N)
    pt_slot = jnp.where(valid, pt_slot, 0).astype(jnp.int32)
    return WindowBAProblem(poses, points, k, pt_slot, uv, info, valid, fixed, table)


def _edge_terms(prob: WindowBAProblem, poses, points, delta: float):
    """Residual + robust IRLS weight per (f, n) edge — all broadcasting."""
    Xp = points[prob.pt_slot]  # (F, N, 3) gather from small P
    r = residuals.residual(poses[:, None], Xp, prob.k[:, None], prob.uv)
    e2 = jnp.sum(r * r, axis=-1) * prob.info
    rho, w_rob = robust.huber(e2, delta)
    w = jnp.where(prob.valid, prob.info * w_rob, 0.0)
    chi2 = jnp.sum(jnp.where(prob.valid, rho, 0.0))
    return r, w, chi2


def _chi2(prob: WindowBAProblem, poses, points, delta: float):
    _, _, chi2 = _edge_terms(prob, poses, points, delta)
    return chi2


def _gather_obs(prob: WindowBAProblem, x):
    """Gather an (F, N, ...) per-edge array into (P, F, ...) landmark rows
    via the observation table, zeroing absent cells."""
    F, N = prob.pt_slot.shape
    flat = x.reshape((F * N,) + x.shape[2:])
    g = flat[jnp.maximum(prob.obs_table, 0)]  # (P, F, ...)
    mask = (prob.obs_table >= 0).reshape(prob.obs_table.shape + (1,) * (g.ndim - 2))
    return jnp.where(mask, g, 0.0)


def _linearize(prob: WindowBAProblem, poses, points, delta: float):
    """Batched linearization -> the `lin` dict contract of `optim/ba.py`."""
    Xp = points[prob.pt_slot]
    r, Jp, Jl = residuals.linearize(poses[:, None], Xp, prob.k[:, None], prob.uv)
    e2 = jnp.sum(r * r, axis=-1) * prob.info
    rho, w_rob = robust.huber(e2, delta)
    w = jnp.where(prob.valid, prob.info * w_rob, 0.0)
    chi2 = jnp.sum(jnp.where(prob.valid, rho, 0.0))

    # camera-side: one reshape-sum einsum per block type (MXU-shaped)
    Hpp = _einsum("fnai,fnaj,fn->fij", Jp, Jp, w)  # (F, 6, 6)
    bp = -_einsum("fnai,fna,fn->fi", Jp, r, w)  # (F, 6)

    # landmark-side: gather rows of the observation table, sum over F
    wJl = Jl * w[..., None, None]  # (F, N, 2, 3)
    Jl_g = _gather_obs(prob, Jl)  # (P, F, 2, 3)
    wJl_g = _gather_obs(prob, wJl)  # (P, F, 2, 3)
    wr_g = _gather_obs(prob, r * w[..., None])  # (P, F, 2)
    Hll = _einsum("pfai,pfaj->pij", wJl_g, Jl_g)  # (P, 3, 3)
    bl = -_einsum("pfai,pfa->pi", Jl_g, wr_g)  # (P, 3)

    W_e = _einsum("fnai,fnaj,fn->fnij", Jp, Jl, w)  # (F, N, 6, 3)
    return dict(chi2=chi2, Hpp=Hpp, Hll=Hll, bp=bp, bl=bl, W_e=W_e)


def _schur_solve(prob: WindowBAProblem, lin, lam):
    """Dense Schur-reduced solve with gather-built cross terms. Same algebra
    as `optim/ba.py:_schur_solve` (g2o `block_solver.hpp:373-479`) minus the
    (F*6, P*3) scatter-adds: U comes straight off the observation table."""
    F, N = prob.pt_slot.shape
    P = lin["Hll"].shape[0]
    dtype = lin["Hpp"].dtype
    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    Hpp_d = lin["Hpp"] + lam * eye6
    Hll_d = lin["Hll"] + lam * eye3
    Hll_inv = inv3x3(Hll_d)  # (P, 3, 3)

    # Per-edge W gathered landmark-major: U_pf = W_e[table[p, f]] (6, 3)
    U_pf = _gather_obs(prob, lin["W_e"])  # (P, F, 6, 3)
    Y_pf = _einsum("pfij,pjk->pfik", U_pf, Hll_inv)  # (P, F, 6, 3)

    # b_red = bp - sum_p Y_pf bl_p
    b_red = lin["bp"] - _einsum("pfij,pj->fi", Y_pf, lin["bl"])

    # Schur cross term as ONE matmul: S -= Y U^T over the (P*3) axis.
    U = jnp.transpose(U_pf, (1, 2, 0, 3)).reshape(F * 6, P * 3)
    Y = jnp.transpose(Y_pf, (1, 2, 0, 3)).reshape(F * 6, P * 3)
    S = jnp.zeros((F, 6, F, 6), dtype=dtype)
    S = S.at[jnp.arange(F), :, jnp.arange(F), :].set(Hpp_d)
    S = S.reshape(F * 6, F * 6) - _mm(Y, U.T)

    # gauge pinning: identity rows/cols for fixed poses (`src/Util.cpp:69-77`)
    free = ~prob.fixed
    free6 = jnp.repeat(free, 6)
    mask2d = free6[:, None] & free6[None, :]
    S = jnp.where(mask2d, S, 0.0) + jnp.diag(jnp.where(free6, 0.0, 1.0))
    b_red = jnp.where(free[:, None], b_red, 0.0).reshape(F * 6)

    dxp = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(S, lower=True), b_red
    ).reshape(F, 6)

    # back-substitution: dxl = Hll^{-1}(bl - W^T dxp), landmark-major gather
    wt_dxp = _einsum("pfij,fi->pj", U_pf, dxp)  # (P, 3)
    dxl = _einsum("pij,pj->pi", Hll_inv, lin["bl"] - wt_dxp)
    return dxp, dxl, b_red.reshape(F, 6)


def bundle_adjust(
    prob: WindowBAProblem,
    n_iters: int = ba_mod.FULL_BA_ITER,
    delta: float = ba_mod.THRESH_HUBER_FULL_BA,
    tau: float = 1e-5,
) -> ba_mod.BAResult:
    """LM bundle adjustment on the structured layout — identical schedule and
    results to `ba.bundle_adjust`, ~6x faster per iteration on TPU."""
    return ba_mod.bundle_adjust(
        prob,
        n_iters=n_iters,
        delta=delta,
        tau=tau,
        solve_fn=_schur_solve,
        linearize_fn=_linearize,
        chi2_fn=_chi2,
    )
