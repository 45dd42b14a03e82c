"""Bundle adjustment tests: pose-only and full BA on synthetic graphs with
known ground truth. Mirrors the reference's golden-file regression strategy
(`UnitTest/g2o/UnitTestg2o.cpp:31-82`) but with exact synthetic oracles and
much tighter tolerances than its L2 < 1 bounds."""

import jax
import jax.numpy as jnp
import numpy as np

from monocular_slam_tpu.geometry import camera, se3, so3
from monocular_slam_tpu.optim import ba, pose_ba, residuals

K = jnp.array([517.3, 516.5, 318.6, 255.3])


def make_scene(key, n_frames=6, n_points=120, pix_noise=0.0):
    """Cameras on an arc looking at a point cloud; full visibility."""
    kp, kt = jax.random.split(key)
    X = jax.random.uniform(kp, (n_points, 3), minval=-2, maxval=2) + jnp.array([0, 0, 5.0])
    poses = []
    for i in range(n_frames):
        ang = 0.15 * i
        R = so3.exp(jnp.array([0.0, ang, 0.0]))
        t = jnp.array([-0.4 * i, 0.02 * i, 0.1 * i])
        poses.append(se3.from_Rt(R, t))
    poses = jnp.stack(poses)
    uv = camera.project(K, se3.apply(poses[:, None], X[None]))  # (F, N, 2)
    if pix_noise > 0:
        uv = uv + pix_noise * jax.random.normal(kt, uv.shape)
    return poses, X, uv


class TestResiduals:
    def test_analytic_jacobians_match_autodiff(self):
        key = jax.random.PRNGKey(0)
        T = se3.exp(jax.random.normal(key, (6,)) * 0.3)
        X = jnp.array([0.4, -0.2, 3.0])
        uv = jnp.array([300.0, 250.0])

        r, Jp, Jl = residuals.linearize(T, X, K, uv)

        Jp_ad = jax.jacobian(
            lambda xi: residuals.residual(se3.compose(se3.exp(xi), T), X, K, uv)
        )(jnp.zeros(6))
        Jl_ad = jax.jacobian(lambda x: residuals.residual(T, x, K, uv))(X)
        np.testing.assert_allclose(np.asarray(Jp), np.asarray(Jp_ad), atol=1e-7)
        np.testing.assert_allclose(np.asarray(Jl), np.asarray(Jl_ad), atol=1e-7)

    def test_batched_linearize(self):
        key = jax.random.PRNGKey(1)
        T = se3.exp(jax.random.normal(key, (10, 6)) * 0.2)
        X = jax.random.normal(jax.random.PRNGKey(2), (10, 3)) + jnp.array([0, 0, 4.0])
        uv = jnp.zeros((10, 2))
        r, Jp, Jl = residuals.linearize(T, X, jnp.broadcast_to(K, (10, 4)), uv)
        assert r.shape == (10, 2) and Jp.shape == (10, 2, 6) and Jl.shape == (10, 2, 3)


class TestPoseBA:
    def test_recovers_perturbed_pose(self):
        poses, X, uv = make_scene(jax.random.PRNGKey(3), n_frames=2)
        T_true = poses[1]
        T0 = se3.compose(se3.exp(jnp.array([0.03, -0.02, 0.04, 0.1, -0.05, 0.08])), T_true)
        res = pose_ba.refine_pose(T0, X, uv[1], K, jnp.ones(X.shape[0]))
        np.testing.assert_allclose(np.asarray(res.T), np.asarray(T_true), atol=1e-6)
        assert int(res.n_inliers) == X.shape[0]

    def test_outlier_rejection(self):
        poses, X, uv = make_scene(jax.random.PRNGKey(4), n_frames=2, pix_noise=0.3)
        T_true = poses[1]
        uv1 = uv[1].at[:20].add(80.0)  # 20 gross outliers
        T0 = se3.compose(se3.exp(jnp.array([0.02, 0.01, -0.03, 0.05, 0.02, -0.04])), T_true)
        res = pose_ba.refine_pose(T0, X, uv1, K, jnp.ones(X.shape[0]))
        # Outliers detected
        assert np.asarray(res.inliers)[:20].sum() == 0
        assert np.asarray(res.inliers)[20:].mean() > 0.95
        # Pose accurate despite outliers
        err = np.abs(np.asarray(res.T - T_true)).max()
        assert err < 5e-3

    def test_too_few_points_returns_input(self):
        poses, X, uv = make_scene(jax.random.PRNGKey(5), n_frames=2)
        T0 = se3.compose(se3.exp(jnp.full(6, 0.05)), poses[1])
        w = jnp.zeros(X.shape[0]).at[:2].set(1.0)  # only 2 valid < min 3
        res = pose_ba.refine_pose(T0, X, uv[1], K, w)
        np.testing.assert_allclose(np.asarray(res.T), np.asarray(T0))

    def test_vmapped_over_frames(self):
        poses, X, uv = make_scene(jax.random.PRNGKey(6), n_frames=4)
        T0 = se3.compose(se3.exp(0.05 * jax.random.normal(jax.random.PRNGKey(7), (4, 6))), poses)
        Xb = jnp.broadcast_to(X, (4,) + X.shape)
        w = jnp.ones((4, X.shape[0]))
        res = pose_ba.refine_poses_batched(T0, Xb, uv, K, w)
        np.testing.assert_allclose(np.asarray(res.T), np.asarray(poses), atol=1e-6)


def build_problem(poses, X, uv, noise_poses, noise_points, key, pix_noise=0.0):
    """Dense-visibility BAProblem with perturbed initial state."""
    F, N = uv.shape[0], uv.shape[1]
    cam_idx = jnp.repeat(jnp.arange(F), N)
    pt_idx = jnp.tile(jnp.arange(N), F)
    uv_flat = uv.reshape(F * N, 2)
    if pix_noise > 0:
        uv_flat = uv_flat + pix_noise * jax.random.normal(key, uv_flat.shape)
    k1, k2 = jax.random.split(jax.random.split(key)[0])
    poses0 = se3.compose(se3.exp(noise_poses * jax.random.normal(k1, (F, 6))), poses)
    # keep gauge: frame 0 at truth
    poses0 = poses0.at[0].set(poses[0])
    points0 = X + noise_points * jax.random.normal(k2, X.shape)
    return ba.BAProblem(
        poses=poses0,
        points=points0,
        k=jnp.broadcast_to(K, (F, 4)),
        cam_idx=cam_idx,
        pt_idx=pt_idx,
        uv=uv_flat,
        info=jnp.ones(F * N),
        valid=jnp.ones(F * N, dtype=bool),
        fixed=jnp.zeros(F, dtype=bool).at[0].set(True),
    )


class TestFullBA:
    def test_converges_to_truth(self):
        poses, X, uv = make_scene(jax.random.PRNGKey(8))
        prob = build_problem(poses, X, uv, 0.02, 0.05, jax.random.PRNGKey(9))
        res = ba.bundle_adjust(prob, n_iters=20)
        # chi2 decreased massively
        assert float(res.chi2_history[-1]) < 1e-10 * float(res.chi2_initial) + 1e-12
        # Monocular gauge: scale is observable here only because frame 0 is
        # fixed AND... it isn't - compare up to similarity via point distances?
        # With one pose fixed, remaining gauge freedom is global scale about
        # that camera. Check reprojection-consistency instead:
        Tc = res.poses[prob.cam_idx]
        r = residuals.residual(Tc, res.points[prob.pt_idx], prob.k[prob.cam_idx], prob.uv)
        assert float(jnp.abs(r).max()) < 1e-6

    def test_noisy_ba_beats_init(self):
        poses, X, uv = make_scene(jax.random.PRNGKey(10))
        prob = build_problem(
            poses, X, uv, 0.01, 0.03, jax.random.PRNGKey(11), pix_noise=0.5
        )
        res = ba.bundle_adjust(prob, n_iters=15)
        assert float(res.chi2_history[-1]) < 0.5 * float(res.chi2_initial)
        # ~0.5px noise, 120 points x 6 frames -> expect sub-pixel mean residual
        Tc = res.poses[prob.cam_idx]
        r = residuals.residual(Tc, res.points[prob.pt_idx], prob.k[prob.cam_idx], prob.uv)
        assert float(jnp.sqrt((r**2).mean())) < 0.6

    def test_fixed_pose_stays_fixed(self):
        poses, X, uv = make_scene(jax.random.PRNGKey(12))
        prob = build_problem(poses, X, uv, 0.02, 0.05, jax.random.PRNGKey(13))
        res = ba.bundle_adjust(prob, n_iters=10)
        np.testing.assert_allclose(np.asarray(res.poses[0]), np.asarray(prob.poses[0]))

    def test_masked_edges_ignored(self):
        poses, X, uv = make_scene(jax.random.PRNGKey(14), n_frames=4, n_points=60)
        prob = build_problem(poses, X, uv, 0.01, 0.02, jax.random.PRNGKey(15))
        # Poison half the observations but mask them out
        E = prob.uv.shape[0]
        uv_bad = prob.uv.at[: E // 2].add(500.0)
        valid = jnp.ones(E, dtype=bool).at[: E // 2].set(False)
        prob2 = prob._replace(uv=uv_bad, valid=valid)
        res = ba.bundle_adjust(prob2, n_iters=15)
        r = residuals.residual(
            res.poses[prob.cam_idx], res.points[prob.pt_idx], prob.k[prob.cam_idx], prob.uv
        )
        # valid half converges to (near) zero residual on the CLEAN uv
        r_valid = jnp.where(valid[:, None], r, 0.0)
        assert float(jnp.abs(r_valid).max()) < 1e-5

    def test_huber_downweights_outliers(self):
        poses, X, uv = make_scene(jax.random.PRNGKey(16))
        prob = build_problem(poses, X, uv, 0.01, 0.02, jax.random.PRNGKey(17))
        E = prob.uv.shape[0]
        n_out = E // 20
        uv_bad = prob.uv.at[:n_out].add(120.0)
        prob2 = prob._replace(uv=uv_bad)
        res = ba.bundle_adjust(prob2, n_iters=20)
        # Inlier edges stay sub-pixel despite 5% gross outliers. (Huber is
        # not redescending — outliers keep delta/|r| weight, same as g2o —
        # so a small bias remains; chi2 gating between BA runs removes it
        # at the mapping layer.)
        r = residuals.residual(
            res.poses[prob.cam_idx], res.points[prob.pt_idx], prob.k[prob.cam_idx], prob.uv
        )
        assert float(jnp.abs(r[n_out:]).mean()) < 0.5

    def test_jit_and_stats(self):
        poses, X, uv = make_scene(jax.random.PRNGKey(18), n_frames=3, n_points=40)
        prob = build_problem(poses, X, uv, 0.01, 0.02, jax.random.PRNGKey(19))
        res = jax.jit(lambda p: ba.bundle_adjust(p, n_iters=8))(prob)
        assert res.chi2_history.shape == (8,)
        assert bool(jnp.all(jnp.isfinite(res.chi2_history)))
        # chi2 history is non-increasing where accepted
        h = np.asarray(res.chi2_history)
        assert all(h[i + 1] <= h[i] + 1e-9 for i in range(len(h) - 1))


class TestAlternateAlgorithms:
    """Gauss-Newton and Powell dogleg on the shared linearization — the two
    g2o algorithms the vendored library ships beyond LM
    (`core/optimization_algorithm_gauss_newton.cpp`,
    `core/optimization_algorithm_dogleg.cpp:1-229`; the reference's src/
    only ever instantiates LM, `src/Util.cpp:43-52`)."""

    def _problem(self, key, noise_poses=0.01, noise_points=0.02):
        poses, X, uv = make_scene(key, n_frames=5, n_points=80)
        prob = build_problem(
            poses, X, uv, noise_poses, noise_points, jax.random.fold_in(key, 1)
        )
        # pin the full 7-dof monocular gauge (pose + scale) by fixing two
        # TRUE poses: GN/dogleg have no damping pulling the free scale mode
        # back toward the init, so truth-comparison needs the mode removed
        prob = prob._replace(
            poses=prob.poses.at[1].set(poses[1]),
            fixed=prob.fixed.at[1].set(True),
        )
        return poses, X, prob

    def test_gn_converges_to_truth(self):
        poses, X, prob = self._problem(jax.random.PRNGKey(40))
        res = ba.bundle_adjust_gn(prob, n_iters=10)
        np.testing.assert_allclose(np.asarray(res.poses[:5]), np.asarray(poses), atol=1e-5)
        assert float(res.chi2_history[-1]) < 1e-9 * float(res.chi2_initial)

    def test_gn_quadratic_tail(self):
        """Near the optimum GN converges in very few iterations (its whole
        point vs damped LM)."""
        _, _, prob = self._problem(jax.random.PRNGKey(41), 0.002, 0.005)
        res = ba.bundle_adjust_gn(prob, n_iters=6)
        h = np.asarray(res.chi2_history)
        assert h[2] < 1e-6 * float(res.chi2_initial)

    def test_dogleg_converges_to_truth(self):
        poses, X, prob = self._problem(jax.random.PRNGKey(42))
        res = ba.bundle_adjust_dogleg(prob, n_iters=15)
        np.testing.assert_allclose(np.asarray(res.poses[:5]), np.asarray(poses), atol=1e-5)

    def test_dogleg_respects_trust_region_from_bad_init(self):
        """From a rough init the dogleg step must stay bounded by the radius
        (GN alone can diverge); chi2 must still decrease monotonically over
        accepted steps."""
        poses, X, prob = self._problem(jax.random.PRNGKey(43), 0.08, 0.15)
        res = ba.bundle_adjust_dogleg(prob, n_iters=20, radius0=0.1)
        h = np.asarray(res.chi2_history)
        acc = np.asarray(res.accepted)
        prev = float(res.chi2_initial)
        for i in range(len(h)):
            if acc[i]:
                assert h[i] <= prev + 1e-9
                prev = h[i]
        assert prev < 0.01 * float(res.chi2_initial)

    def test_all_algorithms_agree_at_convergence(self):
        _, _, prob = self._problem(jax.random.PRNGKey(44))
        outs = {
            name: ba.bundle_adjust_with(name, prob, n_iters=20)
            for name in ("lm", "gn", "dogleg")
        }
        finals = {k: float(v.chi2_history[-1]) for k, v in outs.items()}
        floor = max(min(finals.values()), 1e-12)
        for k, v in finals.items():
            assert v <= 10 * floor + 1e-9, (k, finals)
