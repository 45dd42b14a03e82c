"""PnP tests: DLT minimal solver, RANSAC with outliers, OpenCV oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from monocular_slam_tpu.geometry import camera, pnp, se3, so3

K = jnp.array([517.3, 516.5, 318.6, 255.3])


def scene(key, n=100, noise=0.0, outlier_frac=0.0):
    k1, k2, k3 = jax.random.split(key, 3)
    X = jax.random.uniform(k1, (n, 3), minval=-2, maxval=2) + jnp.array([0, 0, 5.0])
    T = se3.from_Rt(so3.exp(jnp.array([0.1, -0.2, 0.05])), jnp.array([0.3, -0.1, 0.4]))
    uv = camera.project(K, se3.apply(T, X))
    if noise:
        uv = uv + noise * jax.random.normal(k2, uv.shape)
    if outlier_frac:
        n_out = int(n * outlier_frac)
        uv = uv.at[:n_out].set(jax.random.uniform(k3, (n_out, 2), minval=0, maxval=600))
    return X, T, uv


class TestPnPDLT:
    def test_exact(self):
        X, T, uv = scene(jax.random.PRNGKey(0), n=12)
        xy = camera.normalize_points(K, uv)
        T_est = pnp.pnp_dlt(X, xy)
        np.testing.assert_allclose(np.asarray(T_est), np.asarray(T), atol=1e-8)

    def test_batched(self):
        X, T, uv = scene(jax.random.PRNGKey(1), n=6)
        xy = camera.normalize_points(K, uv)
        T_est = pnp.pnp_dlt(jnp.stack([X, X]), jnp.stack([xy, xy]))
        assert T_est.shape == (2, 3, 4)
        np.testing.assert_allclose(np.asarray(T_est[0]), np.asarray(T), atol=1e-7)


class TestPnPRansac:
    def test_with_outliers(self):
        X, T, uv = scene(jax.random.PRNGKey(2), n=200, noise=0.5, outlier_frac=0.3)
        res = pnp.solve_pnp_ransac(
            jax.random.PRNGKey(3), X, uv, K, jnp.ones(200, dtype=bool)
        )
        assert bool(res.ok)
        assert np.abs(np.asarray(res.T - T)).max() < 5e-3
        inl = np.asarray(res.inliers)
        assert inl[:60].mean() < 0.1 and inl[60:].mean() > 0.9

    def test_matches_opencv(self):
        import cv2

        X, T, uv = scene(jax.random.PRNGKey(4), n=150, noise=0.3, outlier_frac=0.2)
        res = pnp.solve_pnp_ransac(
            jax.random.PRNGKey(5), X, uv, K, jnp.ones(150, dtype=bool)
        )
        Km = np.asarray(camera.intrinsics_to_matrix(K))
        ok, rvec, tvec, inl = cv2.solvePnPRansac(
            np.asarray(X), np.asarray(uv), Km, None,
            flags=cv2.SOLVEPNP_ITERATIVE, reprojectionError=3.0,
        )
        R_cv, _ = cv2.Rodrigues(rvec)
        T_cv = np.concatenate([R_cv, tvec], axis=1)
        assert ok
        np.testing.assert_allclose(np.asarray(res.T), T_cv, atol=2e-2)

    def test_respects_mask(self):
        X, T, uv = scene(jax.random.PRNGKey(6), n=100)
        # poison the masked-out half — must not affect the solution
        uv_bad = uv.at[:50].add(300.0)
        mask = jnp.ones(100, dtype=bool).at[:50].set(False)
        res = pnp.solve_pnp_ransac(jax.random.PRNGKey(7), X, uv_bad, K, mask)
        assert np.abs(np.asarray(res.T - T)).max() < 1e-4
        assert not np.any(np.asarray(res.inliers[:50]))

    def test_degenerate_too_few(self):
        X, T, uv = scene(jax.random.PRNGKey(8), n=30)
        mask = jnp.zeros(30, dtype=bool).at[:4].set(True)  # < 6 sample size
        res = pnp.solve_pnp_ransac(jax.random.PRNGKey(9), X, uv, K, mask)
        assert not bool(res.ok)
        assert bool(jnp.all(jnp.isfinite(res.T)))

    def test_jit(self):
        X, T, uv = scene(jax.random.PRNGKey(10), n=80)
        f = jax.jit(
            lambda key: pnp.solve_pnp_ransac(key, X, uv, K, jnp.ones(80, dtype=bool))
        )
        res = f(jax.random.PRNGKey(11))
        assert np.abs(np.asarray(res.T - T)).max() < 1e-5
