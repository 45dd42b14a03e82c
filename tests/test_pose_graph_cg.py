"""Matrix-free CG pose-graph optimization: parity with the dense path and
the edge-sharded distributed variant on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monocular_slam_tpu.geometry import se3, sim3, so3
from monocular_slam_tpu.optim import pose_graph
from monocular_slam_tpu.parallel import mesh as mesh_mod
from monocular_slam_tpu.parallel import sharded_pose_graph


def make_drifted_loop(n=30, drift=0.03, seed=12):
    gt = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        R = so3.exp(jnp.array([0.0, ang, 0.0]))
        t = jnp.array([-2.0 * np.sin(ang), 0.0, 2.0 - 2.0 * np.cos(ang)])
        gt.append(sim3.from_se3(se3.from_Rt(R, -R @ t)))
    gt = jnp.stack(gt)
    est = [gt[0]]
    key = jax.random.PRNGKey(seed)
    for i in range(1, n):
        rel = sim3.compose(gt[i], sim3.inverse(gt[i - 1]))
        noise = sim3.exp(
            jnp.concatenate(
                [drift * jax.random.normal(jax.random.fold_in(key, i), (6,)), jnp.asarray([0.01])]
            )
        )
        est.append(sim3.compose(noise, sim3.compose(rel, est[i - 1])))
    return gt, jnp.stack(est)


def loop_graph(gt, est):
    n = gt.shape[0]
    loop_meas = sim3.compose(gt[n - 1], sim3.inverse(gt[0]))[None]
    return pose_graph.sequential_graph(
        est, jnp.ones(n, bool), extra_i=[n - 1], extra_j=[0],
        extra_meas=loop_meas, loop_weight=20.0,
    )


@pytest.fixture(scope="module")
def graph():
    gt, est = make_drifted_loop()
    return gt, loop_graph(gt, est)


class TestPoseGraphCG:
    def test_matches_dense(self, graph):
        _, g = graph
        res_d = pose_graph.optimize(g, n_iters=20)
        res_c = pose_graph.optimize_cg(g, n_iters=20, max_cg_iters=300, rtol=1e-13)
        np.testing.assert_allclose(
            np.asarray(res_c.chi2_history), np.asarray(res_d.chi2_history),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(res_c.vertices), np.asarray(res_d.vertices), atol=1e-5
        )

    def test_matvec_matches_dense_H(self, graph):
        _, g = graph
        lin_blocks = pose_graph._linearize_blocks(g, g.vertices)
        H, b, _ = pose_graph._linearize(g, g.vertices)
        F = g.vertices.shape[0]
        lam = jnp.asarray(1e-3, g.vertices.dtype)
        free = jnp.ones(F, bool)  # unmasked comparison
        x = jax.random.normal(jax.random.PRNGKey(0), (F, 7), dtype=g.vertices.dtype)
        y_mf = pose_graph._hessian_matvec(g, lin_blocks, lam, free, x)
        y_dense = (H.reshape(F * 7, F * 7) @ x.reshape(-1)).reshape(F, 7) + lam * x
        np.testing.assert_allclose(np.asarray(y_mf), np.asarray(y_dense), rtol=1e-7, atol=1e-8)
        np.testing.assert_allclose(np.asarray(lin_blocks["b"]), np.asarray(b), atol=1e-10)

    def test_fixed_vertex_pinned(self, graph):
        _, g = graph
        res = pose_graph.optimize_cg(g, n_iters=5)
        np.testing.assert_allclose(
            np.asarray(res.vertices[0]), np.asarray(g.vertices[0]), atol=1e-12
        )

    def test_loop_closure_quality(self, graph):
        gt, g = graph
        n = gt.shape[0]
        res = pose_graph.optimize_cg(g, n_iters=25)
        assert float(res.chi2_history[-1]) < 0.2 * float(res.chi2_initial)

        def endpoint_err(v):
            rel = sim3.compose(v[n - 1], sim3.inverse(v[0]))
            rel_gt = sim3.compose(gt[n - 1], sim3.inverse(gt[0]))
            return float(jnp.linalg.norm(sim3.log(sim3.compose(rel, sim3.inverse(rel_gt)))))

        assert endpoint_err(res.vertices) < 0.3 * endpoint_err(g.vertices)


class TestShardedPoseGraph:
    def test_matches_single_device(self, graph):
        _, g = graph
        mesh = mesh_mod.make_mesh(8)
        res_d = sharded_pose_graph.distributed_optimize(
            g, mesh, n_iters=20, max_cg_iters=300, rtol=1e-13
        )
        res_s = pose_graph.optimize_cg(g, n_iters=20, max_cg_iters=300, rtol=1e-13)
        np.testing.assert_allclose(
            np.asarray(res_d.chi2_history), np.asarray(res_s.chi2_history), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(res_d.vertices), np.asarray(res_s.vertices), atol=1e-5
        )

    def test_partition_padding_is_inert(self, graph):
        _, g = graph
        gp = sharded_pose_graph.partition_edges(g, 8)
        assert gp.i_idx.shape[0] % 8 == 0
        assert int(gp.valid.sum()) == int(g.valid.sum())
        # padded measurements are exact identities -> finite residuals
        r = pose_graph._res_batch(
            gp.vertices[gp.i_idx], gp.vertices[gp.j_idx], gp.meas
        )
        assert bool(jnp.isfinite(r).all())

    def test_long_trajectory_smoke(self):
        # 512 keyframes: dense H would be (3584)^2; CG never forms it.
        gt, est = make_drifted_loop(n=512, drift=0.01)
        g = loop_graph(gt, est)
        mesh = mesh_mod.make_mesh(8)
        res = sharded_pose_graph.distributed_optimize(
            g, mesh, n_iters=10, max_cg_iters=50
        )
        assert bool(jnp.isfinite(res.vertices).all())
        assert float(res.chi2_history[-1]) < float(res.chi2_initial)
