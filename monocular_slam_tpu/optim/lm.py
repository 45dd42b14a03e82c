"""Shared Levenberg-Marquardt trust-region machinery.

Reimplements g2o's LM schedule (`core/optimization_algorithm_levenberg.cpp`):
  - lambda init = tau * max diag(H)                     (:166-179)
  - on success: lambda *= max(1/3, 1 - (2 rho - 1)^3), nu = 2   (:134-147)
  - on failure: lambda *= nu, nu *= 2                   (:144-147)
as pure functions usable inside `lax.while_loop` bodies. Each BA flavour
(pose-only, full/Schur, pose graph) owns its loop; this module owns the
schedule so the trust-region behavior is identical everywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class LMState(NamedTuple):
    """Carries the trust-region state through a while_loop."""

    lam: jnp.ndarray  # current damping
    nu: jnp.ndarray  # failure growth factor
    chi2: jnp.ndarray  # current (accepted) robust chi2
    it: jnp.ndarray  # outer iteration counter
    done: jnp.ndarray  # termination flag


def init_lambda(H_diag: jnp.ndarray, tau: float = 1e-5) -> jnp.ndarray:
    """lambda_0 = tau * max(diag H) (`optimization_algorithm_levenberg.cpp:166-179`)."""
    return tau * jnp.max(H_diag)


def gain_ratio(chi2_old, chi2_new, dx, b, lam):
    """rho = (chi2_old - chi2_new) / (dx . (lam dx + b)) — predicted-vs-actual
    decrease; b is the negative gradient (rhs of the normal equations).
    Matches the scale term in `optimization_algorithm_levenberg.cpp:99-149`."""
    denom = jnp.sum(dx * (lam * dx + b)) + 1e-30
    return (chi2_old - chi2_new) / denom


def update_on_success(lam, nu, rho):
    factor = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
    return lam * factor, jnp.full_like(nu, 2.0)


def update_on_failure(lam, nu):
    return lam * nu, nu * 2.0


def lm_step_accept(lam, nu, rho, accepted):
    """Branch-free combined update."""
    lam_s, nu_s = update_on_success(lam, nu, rho)
    lam_f, nu_f = update_on_failure(lam, nu)
    lam_new = jnp.where(accepted, lam_s, lam_f)
    nu_new = jnp.where(accepted, nu_s, nu_f)
    return lam_new, nu_new
