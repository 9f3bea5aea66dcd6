"""Batched scalar Gauss-Newton solver for erf-model variance fitting.

Solves, independently per problem, min_s sum_i (erf(tau_i / (sqrt(2) s)) - p_i)^2
— the per-dimension scale-recovery problem of quantized covariance estimation
(`modules/cov_est_quant.py:31-88`, driver `modules/utils.py:651-697`).

TPU-first: one vmapped fixed-shape `lax.while_loop` handles every (component,
dimension) problem at once instead of the reference's nested Python loops with
per-problem random restarts. Restart perturbations use counter-based PRNG so
the whole solve is deterministic given the key.

Note (document-and-fix): the reference's Jacobian uses exp(-t^2/(2 s)) — a
typo for exp(-t^2/(2 s^2)) (`cov_est_quant.py:22`). The correct derivative
d/ds erf(t/(sqrt(2) s)) = -sqrt(2/pi) t exp(-t^2/(2 s^2)) / s^2 is used here;
the fixed point |dx| -> 0 is unchanged wherever the residual can be driven to
zero, and convergence is faster.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _residual(s, tau, probs):
    return jax.scipy.special.erf(tau / (jnp.sqrt(2.0) * s)) - probs


def _jacobian(s, tau):
    return -jnp.sqrt(2.0 / jnp.pi) * tau * jnp.exp(-tau ** 2 / (2.0 * s ** 2)) / s ** 2


def solve_erf_scale(tau: jax.Array, probs: jax.Array, x0: jax.Array,
                    key: jax.Array, tol: float = 1e-5,
                    max_iter: int = 100) -> jax.Array:
    """Fit the scale s of a zero-mean Gaussian to below-threshold probabilities.

    tau:   (..., R) positive thresholds (R residuals per problem)
    probs: (..., R) target probabilities P(|x| < tau)
    x0:    (...,) initial scales
    Returns (...,) converged scales. Batched over all leading axes.
    """
    batch_shape = x0.shape

    def cond(state):
        x, dx, i = state
        return jnp.logical_and(i < max_iter,
                               jnp.any(jnp.abs(dx) > tol))

    def body(state):
        x, dx, i = state
        # reference restart heuristic (`utils.py:684-690`) with counter-based
        # noise: out-of-range iterates are re-seeded near the initial guess
        active = jnp.abs(dx) > tol
        noise = 0.1 * jax.random.normal(jax.random.fold_in(key, i),
                                        batch_shape, dtype=x.dtype)
        x = jnp.where(active & (jnp.abs(x) < 0.1),
                      jnp.clip(x0 + noise, 0.1, 10.0), x)
        x = jnp.where(active & (jnp.abs(x) > 10.0), 1.0 + noise, x)
        f = _residual(x[..., None], tau, probs)
        j = _jacobian(x[..., None], tau)
        # 1-D least squares step: dx = -<J, f> / <J, J>
        jj = jnp.sum(j * j, axis=-1)
        step = -jnp.sum(j * f, axis=-1) / jnp.maximum(jj, 1e-30)
        # only update problems that have not yet converged
        step = jnp.where(active, step, 0.0)
        return x + step, jnp.where(active, step, dx), i + 1

    x0 = jnp.asarray(x0, tau.dtype)
    dx0 = jnp.full(batch_shape, jnp.inf, tau.dtype)
    x, _, _ = jax.lax.while_loop(cond, body, (x0, dx0, 0))
    return x
