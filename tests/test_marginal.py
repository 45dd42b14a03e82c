"""Marginal covariance recovery vs a dense-inverse oracle.

The capability g2o vendors as `MarginalCovarianceCholesky`
(`ThirdParty/g2o/g2o/core/marginal_covariance_cholesky.{h,cpp}`): per-vertex
blocks of H^{-1} for the optimized graph. The oracle here builds the FULL
(F*6 + P*3) Hessian from the same linearization, deletes the gauge-fixed
rows/cols, inverts densely (f64), and compares every recovered block."""

import jax
import jax.numpy as jnp
import numpy as np

from monocular_slam_tpu.optim import ba, marginal
from tests.test_ba import K, build_problem, make_scene


def _dense_H(prob, delta):
    """Full (F*6 + P*3) Hessian from the shared linearization."""
    lin = ba._linearize_graph(prob, prob.poses, prob.points, delta)
    F = prob.poses.shape[0]
    P = prob.points.shape[0]
    n = F * 6 + P * 3
    H = np.zeros((n, n))
    Hpp = np.asarray(lin["Hpp"])
    Hll = np.asarray(lin["Hll"])
    W_e = np.asarray(lin["W_e"])
    cam = np.asarray(prob.cam_idx)
    pt = np.asarray(prob.pt_idx)
    for f in range(F):
        H[f * 6:(f + 1) * 6, f * 6:(f + 1) * 6] = Hpp[f]
    for p in range(P):
        o = F * 6 + p * 3
        H[o:o + 3, o:o + 3] = Hll[p]
    for e in range(len(cam)):
        r0 = cam[e] * 6
        c0 = F * 6 + pt[e] * 3
        H[r0:r0 + 6, c0:c0 + 3] += W_e[e]
        H[c0:c0 + 3, r0:r0 + 6] += W_e[e].T
    return H


class TestMarginalCovariance:
    def test_matches_dense_inverse(self):
        poses, X, uv = make_scene(
            jax.random.PRNGKey(8), n_frames=4, n_points=40, pix_noise=0.3
        )
        prob = build_problem(poses, X, uv, 0.0, 0.0, jax.random.PRNGKey(9),
                             pix_noise=0.3)
        # monocular gauge is 7-dof: fix TWO poses so the scale mode is
        # pinned and H is invertible (see marginal_covariance docstring)
        prob = prob._replace(fixed=prob.fixed.at[1].set(True))
        # optimize first — covariances are defined at the solution
        res = ba.bundle_adjust(prob, n_iters=10)
        prob = prob._replace(poses=res.poses, points=res.points)

        delta = ba.THRESH_HUBER_FULL_BA
        mc = marginal.marginal_covariance(prob, delta=delta, damping=0.0)

        F, P = 4, 40
        H = _dense_H(prob, delta)
        # gauge: delete the two fixed frames' rows/cols, invert the rest
        keep = np.ones(F * 6 + P * 3, bool)
        keep[:12] = False
        Hk = H[np.ix_(keep, keep)]
        Cov = np.zeros_like(H)
        Cov[np.ix_(keep, keep)] = np.linalg.inv(Hk)

        for f in range(1, F):
            oracle = Cov[f * 6:(f + 1) * 6, f * 6:(f + 1) * 6]
            got = np.asarray(mc.pose_cov[f])
            np.testing.assert_allclose(got, oracle, rtol=2e-4, atol=1e-10)
        for p in range(P):
            o = F * 6 + p * 3
            oracle = Cov[o:o + 3, o:o + 3]
            got = np.asarray(mc.point_cov[p])
            np.testing.assert_allclose(got, oracle, rtol=2e-4, atol=1e-10)
        # full pose-pose marginal (off-diagonal blocks too)
        for f in range(1, F):
            for g in range(1, F):
                oracle = Cov[f * 6:(f + 1) * 6, g * 6:(g + 1) * 6]
                got = np.asarray(mc.pose_cov_full[f, :, g, :])
                np.testing.assert_allclose(got, oracle, rtol=5e-4, atol=1e-10)

    def test_fixed_and_padding_blocks_zero(self):
        poses, X, uv = make_scene(
            jax.random.PRNGKey(10), n_frames=3, n_points=30
        )
        prob = build_problem(poses, X, uv, 0.0, 0.0, jax.random.PRNGKey(11))
        prob = prob._replace(fixed=prob.fixed.at[1].set(True))  # scale gauge
        # pad: append 10 unobserved landmark slots
        P0 = prob.points.shape[0]
        prob = prob._replace(
            points=jnp.concatenate([prob.points, jnp.zeros((10, 3))]),
        )
        mc = marginal.marginal_covariance(prob)
        assert not bool(mc.pose_ok[0])  # gauge-fixed
        np.testing.assert_array_equal(np.asarray(mc.pose_cov[0]), 0.0)
        assert not np.asarray(mc.point_ok[P0:]).any()
        np.testing.assert_array_equal(np.asarray(mc.point_cov[P0:]), 0.0)
        # free, observed blocks are PSD with positive diagonal
        d = np.asarray(mc.point_cov[:P0])
        assert (np.diagonal(d, axis1=1, axis2=2) > 0).all()

    def test_more_observations_shrink_covariance(self):
        """A landmark's positional uncertainty must shrink when more frames
        observe it (the statistical sanity g2o users rely on)."""
        poses, X, uv = make_scene(
            jax.random.PRNGKey(12), n_frames=6, n_points=20, pix_noise=0.2
        )
        prob_all = build_problem(poses, X, uv, 0.0, 0.0, jax.random.PRNGKey(13))
        prob_all = prob_all._replace(fixed=prob_all.fixed.at[1].set(True))
        # drop landmark 0's observations in frames 3..5
        valid = np.asarray(prob_all.valid).copy()
        pt = np.asarray(prob_all.pt_idx)
        cam = np.asarray(prob_all.cam_idx)
        valid_few = valid & ~((pt == 0) & (cam >= 3))
        prob_few = prob_all._replace(valid=jnp.asarray(valid_few))
        tr_all = float(jnp.trace(marginal.marginal_covariance(prob_all).point_cov[0]))
        tr_few = float(jnp.trace(marginal.marginal_covariance(prob_few).point_cov[0]))
        assert tr_all < tr_few
