"""Tests for DLT triangulation and two-view epipolar geometry on synthetic
scenes with known ground truth (the oracle the reference lacks — it only had
eyeball checks, `src/SFMDebugging.cpp`)."""

import jax
import jax.numpy as jnp
import numpy as np

from monocular_slam_tpu.geometry import camera, epipolar, se3, so3, triangulate

K = jnp.array([517.3, 516.5, 318.6, 255.3])


def synthetic_pair(key, n=200, noise=0.0, outlier_frac=0.0):
    """Random 3D points in front of two cameras + projections."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    X = jax.random.uniform(k1, (n, 3), minval=-2.0, maxval=2.0) + jnp.array([0, 0, 6.0])
    T1 = se3.identity(jnp.float64)
    T2 = se3.from_Rt(so3.exp(jnp.array([0.02, -0.3, 0.01])), jnp.array([0.8, 0.05, 0.1]))
    uv1 = camera.project(K, se3.apply(T1, X))
    uv2 = camera.project(K, se3.apply(T2, X))
    if noise > 0:
        uv1 = uv1 + jax.random.normal(k2, uv1.shape) * noise
        uv2 = uv2 + jax.random.normal(k3, uv2.shape) * noise
    if outlier_frac > 0:
        n_out = int(n * outlier_frac)
        bad = jax.random.uniform(k4, (n_out, 2), minval=0, maxval=640)
        uv2 = uv2.at[:n_out].set(bad)
    return X, T1, T2, uv1, uv2


class TestTriangulate:
    def test_exact_recovery(self):
        X, T1, T2, uv1, uv2 = synthetic_pair(jax.random.PRNGKey(0))
        Xr = triangulate.triangulate_two_view(K, T1, K, T2, uv1, uv2)
        np.testing.assert_allclose(np.asarray(Xr), np.asarray(X), atol=1e-6)

    def test_noisy_recovery(self):
        X, T1, T2, uv1, uv2 = synthetic_pair(jax.random.PRNGKey(1), noise=0.5)
        Xr = triangulate.triangulate_two_view(K, T1, K, T2, uv1, uv2)
        err = np.linalg.norm(np.asarray(Xr - X), axis=-1)
        assert np.median(err) < 0.1

    def test_depths_and_reprojection(self):
        X, T1, T2, uv1, uv2 = synthetic_pair(jax.random.PRNGKey(2))
        z = triangulate.depths(T2, X)
        assert np.all(np.asarray(z) > 0)
        e = triangulate.reprojection_error(K, T2, X, uv2)
        np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-7)

    def test_batched_over_poses(self):
        """The 4-candidate cheirality use case: leading pose batch dim."""
        X, T1, T2, uv1, uv2 = synthetic_pair(jax.random.PRNGKey(3), n=50)
        T2b = jnp.stack([T2, se3.inverse(T2)])
        Xr = triangulate.triangulate_two_view(
            K, jnp.stack([T1, T1]), K, T2b, uv1[None], uv2[None]
        )
        assert Xr.shape == (2, 50, 3)
        np.testing.assert_allclose(np.asarray(Xr[0]), np.asarray(X), atol=1e-6)


class TestEightPoint:
    def test_exact_f(self):
        X, T1, T2, uv1, uv2 = synthetic_pair(jax.random.PRNGKey(4))
        F = epipolar.eight_point(uv1, uv2)
        d = epipolar.sampson_distance(F, uv1, uv2)
        assert float(jnp.max(d)) < 1e-8
        # Rank 2
        s = jnp.linalg.svd(F, compute_uv=False)
        assert float(s[2]) < 1e-12

    def test_epipolar_constraint_vs_opencv(self):
        import cv2

        X, T1, T2, uv1, uv2 = synthetic_pair(jax.random.PRNGKey(5), noise=0.3)
        F = np.asarray(epipolar.eight_point(uv1, uv2))
        F_cv, _ = cv2.findFundamentalMat(
            np.asarray(uv1), np.asarray(uv2), cv2.FM_8POINT
        )
        F_cv = F_cv / np.linalg.norm(F_cv)
        # Same matrix up to sign
        assert min(np.abs(F - F_cv).max(), np.abs(F + F_cv).max()) < 1e-3

    def test_weighted_refit_ignores_outliers(self):
        X, T1, T2, uv1, uv2 = synthetic_pair(jax.random.PRNGKey(6), outlier_frac=0.3)
        n = uv1.shape[0]
        w = jnp.ones(n).at[: int(n * 0.3)].set(0.0)
        F = epipolar.eight_point(uv1, uv2, weights=w)
        d = epipolar.sampson_distance(F, uv1, uv2)
        assert float(jnp.max(d * w)) < 1e-8


class TestRansac:
    def test_ransac_with_outliers(self):
        X, T1, T2, uv1, uv2 = synthetic_pair(
            jax.random.PRNGKey(7), n=300, noise=0.3, outlier_frac=0.3
        )
        mask = jnp.ones(300, dtype=bool)
        res = epipolar.ransac_fundamental(
            jax.random.PRNGKey(8), uv1, uv2, mask, n_iters=500, thresh=1.5
        )
        inl = np.asarray(res.inliers)
        # Outliers are the first 90 points
        assert inl[:90].mean() < 0.1
        assert inl[90:].mean() > 0.9

    def test_ransac_respects_mask(self):
        X, T1, T2, uv1, uv2 = synthetic_pair(jax.random.PRNGKey(9), n=100)
        mask = jnp.ones(100, dtype=bool).at[:50].set(False)
        res = epipolar.ransac_fundamental(
            jax.random.PRNGKey(10), uv1, uv2, mask, n_iters=200
        )
        assert not np.any(np.asarray(res.inliers[:50]))

    def test_jit_compiles(self):
        X, T1, T2, uv1, uv2 = synthetic_pair(jax.random.PRNGKey(11), n=100)
        f = jax.jit(
            lambda k: epipolar.ransac_fundamental(
                k, uv1, uv2, jnp.ones(100, dtype=bool), n_iters=100
            ),
            static_argnums=(),
        )
        res = f(jax.random.PRNGKey(12))
        assert int(res.num_inliers) > 90


class TestPoseRecovery:
    def test_full_two_view_pipeline(self):
        """8-point -> E -> decompose -> cheirality: recover the true relative
        pose (up to translation scale) — the reference's frame-1 bootstrap
        (`src/CameraPoseEstimator.cpp:264-376`)."""
        X, T1, T2, uv1, uv2 = synthetic_pair(jax.random.PRNGKey(13), n=200)
        mask = jnp.ones(200, dtype=bool)
        res = epipolar.ransac_fundamental(jax.random.PRNGKey(14), uv1, uv2, mask)
        E = epipolar.essential_from_fundamental(res.F, K, K)
        tv = epipolar.pose_from_essential(E, K, K, uv1, uv2, mask)
        # Rotation exact
        np.testing.assert_allclose(
            np.asarray(tv.T_21[:, :3]), np.asarray(T2[:, :3]), atol=1e-4
        )
        # Translation direction (scale is unobservable in monocular)
        t_est = np.asarray(tv.T_21[:, 3])
        t_true = np.asarray(T2[:, 3])
        cos = t_est @ t_true / (np.linalg.norm(t_est) * np.linalg.norm(t_true))
        assert cos > 0.9999
        assert int(tv.n_good) > 190
        # Structure recovered up to the same global scale
        scale = np.linalg.norm(t_true) / np.linalg.norm(t_est)
        np.testing.assert_allclose(
            np.asarray(tv.points[tv.good]) * scale, np.asarray(X[tv.good]), atol=1e-2
        )

    def test_decompose_essential_properties(self):
        X, T1, T2, uv1, uv2 = synthetic_pair(jax.random.PRNGKey(15), n=64)
        F = epipolar.eight_point(uv1, uv2)
        E = epipolar.essential_from_fundamental(F, K, K)
        R1, R2, t = epipolar.decompose_essential(E)
        for R in (R1, R2):
            np.testing.assert_allclose(float(jnp.linalg.det(R)), 1.0, atol=1e-9)
        np.testing.assert_allclose(float(jnp.linalg.norm(t)), 1.0, atol=1e-9)


def test_epipolar_line():
    X, T1, T2, uv1, uv2 = synthetic_pair(jax.random.PRNGKey(16), n=32)
    F = epipolar.eight_point(uv1, uv2)
    lines = epipolar.epipolar_line(F, uv1)
    # Corresponding points lie on their epipolar lines.
    x2h = jnp.concatenate([uv2, jnp.ones((32, 1))], axis=-1)
    resid = jnp.abs(jnp.sum(lines * x2h, axis=-1)) / jnp.linalg.norm(lines[:, :2], axis=-1)
    assert float(jnp.max(resid)) < 1e-6
