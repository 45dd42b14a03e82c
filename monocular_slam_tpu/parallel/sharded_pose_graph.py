"""Distributed Sim(3) pose-graph optimization: edge-sharded CG.

The essential-graph optimization the reference declared but never implemented
(`ORBSLAM.png` Util.poseGraphOptimisation; g2o ships the Sim3 types at
`types/types_seven_dof_expmap.h:48-175`), scaled over a device mesh for
KITTI-length trajectories (BASELINE.json configs[3]):

  - edges (odometry + loop closures) are sharded over the mesh "model" axis;
    each device linearizes its edge slab — the 7x7 autodiff Jacobians are the
    FLOPs-heavy part and parallelize embarrassingly;
  - vertices (F, 3, 5) are replicated: at 10k keyframes that is ~600 KB,
    nothing against HBM;
  - each PCG matvec does its scatter-adds locally and psums ONE (F, 7)
    vector; the block-Jacobi preconditioner psums (F, 7, 7) once per LM
    iteration. Communication is O(F) — independent of edge count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from monocular_slam_tpu.geometry import sim3
from monocular_slam_tpu.optim import cg_ba, lm
from monocular_slam_tpu.optim import pose_graph as pg
from monocular_slam_tpu.utils.precision import einsum_hp as _einsum


def partition_edges(g: pg.PoseGraph, n_shards: int) -> pg.PoseGraph:
    """Pad the edge arrays to a multiple of n_shards (padding edges invalid).
    Edge order is irrelevant — any slab balance works; round-robin keeps
    odometry and loop edges mixed across devices."""
    E = g.i_idx.shape[0]
    E_pad = ((E + n_shards - 1) // n_shards) * n_shards

    def pad(arr, fill):
        arr = np.asarray(arr)
        out = np.full((E_pad,) + arr.shape[1:], fill, dtype=arr.dtype)
        out[:E] = arr
        return jnp.asarray(out)

    # Padding edges must carry a VALID Sim3 measurement (identity, s=1):
    # their weight is 0 but the residual log() still evaluates, and a
    # degenerate (scale-0) measurement would produce NaNs that 0-weighting
    # cannot cancel.
    ident = sim3.identity(dtype=g.meas.dtype)
    return g._replace(
        i_idx=pad(g.i_idx, 0),
        j_idx=pad(g.j_idx, 0),
        meas=pad(g.meas, 0.0).at[E:].set(ident),
        weight=pad(g.weight, 0.0),
        valid=pad(g.valid, False),
    )


def _sharded_pgo(
    verts, i_idx_l, j_idx_l, meas_l, weight_l, valid_l, fixed,
    *, n_iters: int, tau: float, max_cg_iters: int, rtol: float,
):
    dtype = verts.dtype
    F = verts.shape[0]
    free = ~fixed
    eye7 = jnp.eye(7, dtype=dtype)
    g_l = pg.PoseGraph(verts, i_idx_l, j_idx_l, meas_l, weight_l, valid_l, fixed)

    def lin_blocks(verts_c):
        lin = pg._linearize_blocks(g_l, verts_c)
        lin["chi2"] = jax.lax.psum(lin["chi2"], "model")
        lin["b"] = jax.lax.psum(lin["b"], "model")
        lin["D"] = jax.lax.psum(lin["D"], "model")
        return lin

    def chi2_graph(verts_c):
        return jax.lax.psum(pg._chi2(g_l, verts_c), "model")

    def matvec(lin, lam, x):
        xf = jnp.where(free[:, None], x, 0.0)
        ge = lin["w"][:, None] * (
            _einsum("eai,ei->ea", lin["Ji"], xf[i_idx_l])
            + _einsum("eai,ei->ea", lin["Jj"], xf[j_idx_l])
        )
        yi = _einsum("eai,ea->ei", lin["Ji"], ge)
        yj = _einsum("eai,ea->ei", lin["Jj"], ge)
        y_local = jnp.zeros_like(x).at[i_idx_l].add(yi).at[j_idx_l].add(yj)
        y = jax.lax.psum(y_local, "model") + lam * xf
        y = jnp.where(free[:, None], y, 0.0)
        return y + jnp.where(free[:, None], 0.0, x)

    def solve(lin, lam):
        D = lin["D"] + lam * eye7
        D = jnp.where(free[:, None, None], D, eye7[None])
        D_inv = jnp.linalg.inv(D)
        precond = lambda r: jnp.where(
            free[:, None], _einsum("fij,fj->fi", D_inv, r), 0.0
        )
        b = jnp.where(free[:, None], lin["b"], 0.0)
        dx, _ = cg_ba.pcg(partial(matvec, lin, lam), precond, b, max_cg_iters, rtol)
        return dx, b

    lin0 = lin_blocks(verts)
    lam0 = lm.init_lambda(jnp.diagonal(lin0["D"], axis1=-2, axis2=-1).reshape(-1), tau)

    def body(carry, _):
        verts_c, st = carry

        def step(op):
            verts_c, st = op
            lin = lin_blocks(verts_c)
            dx, b = solve(lin, st.lam)
            verts_n = sim3.compose(sim3.exp(dx), verts_c)
            chi2_n = chi2_graph(verts_n)
            rho = lm.gain_ratio(lin["chi2"], chi2_n, dx.reshape(-1), b.reshape(-1), st.lam)
            accept = (chi2_n < lin["chi2"]) & jnp.isfinite(chi2_n)
            lam_n, nu_n = lm.lm_step_accept(st.lam, st.nu, rho, accept)
            verts_o = jnp.where(accept, verts_n, verts_c)
            chi2_o = jnp.where(accept, chi2_n, lin["chi2"])
            stall = accept & (lin["chi2"] - chi2_n < 1e-9 * (lin["chi2"] + 1e-30))
            return verts_o, lm.LMState(lam_n, nu_n, chi2_o, st.it + 1, st.done | stall)

        def frozen(op):
            verts_c, st = op
            return verts_c, st._replace(it=st.it + 1)

        verts_c, st = jax.lax.cond(st.done, frozen, step, (verts_c, st))
        return (verts_c, st), st.chi2

    st0 = lm.LMState(lam0, jnp.asarray(2.0, dtype), lin0["chi2"], jnp.asarray(0, jnp.int32), jnp.asarray(False))
    (verts_f, st), chi2_h = jax.lax.scan(body, (verts, st0), None, length=n_iters)
    return verts_f, lin0["chi2"], chi2_h


def distributed_optimize(
    g: pg.PoseGraph,
    mesh: Mesh,
    n_iters: int = 20,
    tau: float = 1e-5,
    max_cg_iters: int = 100,
    rtol: float = 1e-8,
) -> pg.PoseGraphResult:
    """Pose-graph LM with edges sharded over mesh axis "model"."""
    n_shards = mesh.shape["model"]
    gp = partition_edges(g, n_shards)

    fn = jax.jit(
        jax.shard_map(
            partial(
                _sharded_pgo, n_iters=n_iters, tau=tau,
                max_cg_iters=max_cg_iters, rtol=rtol,
            ),
            mesh=mesh,
            in_specs=(
                P(),          # vertices replicated
                P("model"),   # edge endpoints
                P("model"),
                P("model"),   # measurements
                P("model"),   # weights
                P("model"),   # valid
                P(),          # fixed
            ),
            out_specs=(P(), P(), P()),
        )
    )
    verts, chi2_0, chi2_h = fn(
        gp.vertices, gp.i_idx, gp.j_idx, gp.meas, gp.weight, gp.valid, gp.fixed
    )
    return pg.PoseGraphResult(verts, chi2_0, chi2_h)
