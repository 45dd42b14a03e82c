"""Robust loss kernels as IRLS weights.

Replaces g2o's robust kernel family (`core/robust_kernel_impl.{h,cpp}`):
each kernel maps a squared error e2 to (rho, w) where rho is the robustified
cost and w = rho'(e2) is the IRLS weight applied to J and r. The BA engines
multiply J and r by sqrt(w), which reproduces g2o's corrected-jacobian
weighting to first order.

The reference uses Huber with delta = sqrt(5.99) for full BA and
sqrt(5.991) for pose-only BA (`src/ParamConfig.h:7-10`).
"""

from __future__ import annotations

import jax.numpy as jnp

# Chi-square 95% quantile for 2 DoF — the reference's inlier gate
# (`src/ParamConfig.h:12`).
CHI2_2DOF_95 = 5.991


def huber(e2: jnp.ndarray, delta: float):
    """Huber: rho = e2 if e2 <= d^2 else 2 d sqrt(e2) - d^2.
    Matches `robust_kernel_impl.h:76-85` (g2o works on squared errors)."""
    d2 = delta * delta
    e = jnp.sqrt(jnp.maximum(e2, 1e-18))
    rho = jnp.where(e2 <= d2, e2, 2.0 * delta * e - d2)
    w = jnp.where(e2 <= d2, jnp.ones_like(e2), delta / e)
    return rho, w


def cauchy(e2: jnp.ndarray, delta: float):
    """Cauchy: rho = d^2 log(1 + e2/d^2)."""
    d2 = delta * delta
    x = e2 / d2
    rho = d2 * jnp.log1p(x)
    w = 1.0 / (1.0 + x)
    return rho, w


def tukey(e2: jnp.ndarray, delta: float):
    """Tukey biweight: redescending — zero weight beyond delta."""
    d2 = delta * delta
    x = jnp.minimum(e2 / d2, 1.0)
    one_m = 1.0 - x
    rho = (d2 / 3.0) * (1.0 - one_m**3)
    w = jnp.where(e2 <= d2, one_m**2, jnp.zeros_like(e2))
    return rho, w


def pseudo_huber(e2: jnp.ndarray, delta: float):
    """Pseudo-Huber: smooth everywhere."""
    d2 = delta * delta
    s = jnp.sqrt(1.0 + e2 / d2)
    rho = 2.0 * d2 * (s - 1.0)
    w = 1.0 / s
    return rho, w


def saturated(e2: jnp.ndarray, delta: float):
    """Saturated: cost clamps at d^2 (hard outlier cut)."""
    d2 = delta * delta
    rho = jnp.minimum(e2, d2)
    w = jnp.where(e2 <= d2, jnp.ones_like(e2), jnp.zeros_like(e2))
    return rho, w


def dcs(e2: jnp.ndarray, delta: float):
    """Dynamic Covariance Scaling (Agarwal et al., ICRA 2013).

    delta plays the role of phi: s = min(1, 2*phi/(phi + e2)),
    rho = s^2 * e2, w = s^2 — matches g2o's `RobustKernelDCS::robustify`
    (`robust_kernel_impl.cpp:152-162`), whose rho[1] (the IRLS weight) is
    scale^2."""
    phi = delta
    s = jnp.minimum(2.0 * phi / (phi + e2), 1.0)
    return s * e2 * s, s * s


def scale_delta(inner, e2: jnp.ndarray, delta: float, inner_delta: float = 1.0):
    """Re-window an inner kernel to another delta: evaluate the inner kernel
    at e2/d^2 and scale the cost back by d^2 — g2o's
    `RobustKernelScaleDelta::robustify` (`robust_kernel_impl.cpp:50-63`).
    The IRLS weight (g2o's rho[1]) passes through unscaled.

    `inner` is one of the kernel functions above (operating at its own
    `inner_delta` window)."""
    d2 = delta * delta
    rho_i, w_i = inner(e2 / d2, inner_delta)
    return d2 * rho_i, w_i


def none_(e2: jnp.ndarray, delta: float = 0.0):
    """No robustification (quadratic loss)."""
    return e2, jnp.ones_like(e2)


KERNELS = {
    "huber": huber,
    "cauchy": cauchy,
    "tukey": tukey,
    "pseudo_huber": pseudo_huber,
    "saturated": saturated,
    "dcs": dcs,
    "none": none_,
}
