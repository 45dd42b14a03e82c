"""Robust-kernel semantics vs the g2o registry the reference vendors
(`ThirdParty/g2o/g2o/core/robust_kernel_impl.{h,cpp}`). For each kernel the
IRLS weight must equal g2o's rho[1]; for the differentiable kernels that is
d(rho)/d(e2) (checked numerically), for DCS it is the paper's scale^2."""

import jax.numpy as jnp
import numpy as np

from monocular_slam_tpu.optim import robust

E2 = jnp.array([0.0, 0.01, 0.5, 2.0, 5.0, 5.991, 8.0, 50.0, 1e4])
DELTA = 5.991**0.5


def _numeric_w(fn, e2, delta, h=1e-5):
    r1, _ = fn(e2 + h, delta)
    r0, _ = fn(e2 - h, delta)
    return (r1 - r0) / (2 * h)


class TestWeightIsDerivative:
    """g2o's rho[1] = d rho / d e2 for the classic kernels."""

    def test_huber(self):
        e2 = E2[1:]  # sqrt kink at 0
        _, w = robust.huber(e2, DELTA)
        np.testing.assert_allclose(w, _numeric_w(robust.huber, e2, DELTA), rtol=1e-3)

    def test_cauchy(self):
        _, w = robust.cauchy(E2, DELTA)
        np.testing.assert_allclose(w, _numeric_w(robust.cauchy, E2, DELTA), rtol=1e-3)

    def test_pseudo_huber(self):
        _, w = robust.pseudo_huber(E2, DELTA)
        np.testing.assert_allclose(
            w, _numeric_w(robust.pseudo_huber, E2, DELTA), rtol=1e-3
        )

    def test_tukey_inside(self):
        e2 = E2[E2 < DELTA**2]
        _, w = robust.tukey(e2, DELTA)
        np.testing.assert_allclose(w, _numeric_w(robust.tukey, e2, DELTA), rtol=1e-3, atol=1e-6)

    def test_tukey_saturated_outside(self):
        rho, w = robust.tukey(jnp.array([100.0, 1e6]), DELTA)
        np.testing.assert_allclose(rho, DELTA**2 / 3.0, rtol=1e-6)
        np.testing.assert_allclose(w, 0.0)

    def test_saturated(self):
        rho, w = robust.saturated(E2, DELTA)
        np.testing.assert_allclose(rho, np.minimum(np.asarray(E2), DELTA**2))
        np.testing.assert_allclose(w, (np.asarray(E2) <= DELTA**2).astype(float))


class TestDCS:
    """`RobustKernelDCS::robustify` (`robust_kernel_impl.cpp:152-162`):
    s = min(1, 2 phi/(phi+e2)), rho = s^2 e2, weight = s^2."""

    def test_matches_g2o_formula(self):
        phi = 1.0
        e2 = np.asarray(E2, float)
        s = np.minimum(1.0, 2 * phi / (phi + e2))
        rho, w = robust.dcs(jnp.asarray(e2), phi)
        np.testing.assert_allclose(rho, s * s * e2, rtol=1e-6)
        np.testing.assert_allclose(w, s * s, rtol=1e-6)

    def test_quadratic_inside_redescending_outside(self):
        phi = 2.0
        rho_in, w_in = robust.dcs(jnp.array([0.5 * phi]), phi)
        np.testing.assert_allclose(rho_in, 0.5 * phi)
        np.testing.assert_allclose(w_in, 1.0)
        # redescending: cost peaks at rho(phi) = phi, then decays ~4 phi^2/e2
        rho_peak, _ = robust.dcs(jnp.array([phi]), phi)
        np.testing.assert_allclose(rho_peak, phi, rtol=1e-6)
        rho_out, _ = robust.dcs(jnp.array([1e8]), phi)
        np.testing.assert_allclose(rho_out, 4 * phi**2 / 1e8, rtol=1e-3)

    def test_continuous_at_phi(self):
        phi = 3.0
        lo, _ = robust.dcs(jnp.array([phi - 1e-6]), phi)
        hi, _ = robust.dcs(jnp.array([phi + 1e-6]), phi)
        np.testing.assert_allclose(lo, hi, rtol=1e-4)


class TestScaleDelta:
    """`RobustKernelScaleDelta::robustify` (`robust_kernel_impl.cpp:50-63`):
    rho = d^2 * inner(e2/d^2), weight passes through."""

    def test_huber_rewindowed_is_huber(self):
        # scaling a unit-window Huber to delta reproduces Huber(delta)
        rho_s, w_s = robust.scale_delta(robust.huber, E2, DELTA, inner_delta=1.0)
        rho_h, w_h = robust.huber(E2, DELTA)
        np.testing.assert_allclose(rho_s, rho_h, rtol=1e-5)
        np.testing.assert_allclose(w_s, w_h, rtol=1e-5)

    def test_weight_unscaled(self):
        # g2o multiplies rho[0] by d^2 and rho[2] by 1/d^2, rho[1] untouched
        d = 2.5
        _, w_s = robust.scale_delta(robust.cauchy, E2, d, inner_delta=1.0)
        _, w_i = robust.cauchy(E2 / d**2, 1.0)
        np.testing.assert_allclose(w_s, w_i, rtol=1e-6)


def test_registry_complete():
    """COVERAGE.md claims the g2o kernel registry is covered; keep it honest
    (`robust_kernel_impl.cpp:166-171` registers Huber, Tukey, PseudoHuber,
    Cauchy, Saturated, DCS; ScaleDelta is the wrapper class)."""
    for name in ("huber", "tukey", "pseudo_huber", "cauchy", "saturated", "dcs"):
        assert name in robust.KERNELS
    assert callable(robust.scale_delta)
