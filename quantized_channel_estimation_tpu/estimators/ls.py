"""Bussgang least-squares estimator (reference `estimators/LS.py`).

h_est = argmin_h |A_eff h - r|^2 with A_eff = B A the Bussgang-linearized
observation matrix. Solved via normal equations + Cholesky (A_eff^H A_eff is
Hermitian PD whenever A has full column rank), replacing per-sample
`np.linalg.lstsq` calls with one batched solve.

Note: the reference's genie inf-bit path is broken (`LS.py:35` assigns the
full lstsq tuple) — here the inf-bit path simply solves with A_eff = A.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from quantized_channel_estimation_tpu.ops import linalg
from quantized_channel_estimation_tpu.ops.bussgang import bussgang_gain_diag
from quantized_channel_estimation_tpu.ops.precision import highest_precision
from quantized_channel_estimation_tpu.ops.quantizer import (
    ScalarQuantizer, is_inf_bits)


def _a_eff(cy: jax.Array, a: jax.Array, n_bits,
           q: Optional[ScalarQuantizer]) -> jax.Array:
    if is_inf_bits(n_bits):
        return jnp.broadcast_to(a, cy.shape[:-2] + a.shape)
    diag = jnp.diagonal(cy, axis1=-2, axis2=-1)
    gains = bussgang_gain_diag(diag, n_bits, q).astype(cy.dtype)
    return gains[..., :, None] * a


def _ls_solve(a_eff: jax.Array, r: jax.Array, jitter: float) -> jax.Array:
    """Least-squares via normal equations: (A^H A) h = A^H r; replaces NaN
    solutions with zeros (`LS.py:48-52` NaN guard)."""
    gram = jnp.einsum("...mn,...mk->...nk", jnp.conj(a_eff), a_eff)
    rhs = jnp.einsum("...mn,...m->...n", jnp.conj(a_eff), r)
    h = linalg.cho_solve_hermitian(gram, rhs, jitter=jitter)
    return jnp.where(jnp.any(jnp.isnan(h), axis=-1, keepdims=True),
                     jnp.zeros_like(h), h)


@highest_precision
def estimate_genie(r: jax.Array, t: jax.Array, snr_db, a: jax.Array, n_bits,
                   q: Optional[ScalarQuantizer] = None,
                   jitter: float = 1e-8) -> jax.Array:
    """Per-sample Bussgang LS with genie covariances for the Bussgang gain
    (`LS.py:21-53`). r: (B, M), t: (B, N)."""
    sigma2 = 10.0 ** (-snr_db / 10.0)
    c = linalg.toeplitz_from_first_row(t.astype(r.dtype))
    m = a.shape[0]
    cy = jnp.einsum("mn,...nk,pk->...mp", a, c, jnp.conj(a))
    cy = cy + jnp.asarray(sigma2, jnp.float32) * jnp.eye(m, dtype=r.dtype)
    a_eff = _a_eff(cy, a, n_bits, q)
    return _ls_solve(a_eff, r, jitter)


@highest_precision
def estimate_global(r: jax.Array, cov: jax.Array, snr_db, a: jax.Array,
                    n_bits, q: Optional[ScalarQuantizer] = None,
                    jitter: float = 1e-8) -> jax.Array:
    """Global Bussgang LS: shared covariance for the gain, one solve for the
    whole batch (`LS.py:55-74`)."""
    sigma2 = 10.0 ** (-snr_db / 10.0)
    m = a.shape[0]
    cy = a @ cov @ jnp.conj(a).T + jnp.asarray(sigma2, jnp.float32) * jnp.eye(m, dtype=cov.dtype)
    a_eff = _a_eff(cy, a, n_bits, q)
    gram = jnp.conj(a_eff).T @ a_eff
    rhs = r @ jnp.conj(a_eff)  # (B, N) rows = A_eff^H r_b
    h = linalg.cho_solve_hermitian(gram, rhs.T, jitter=jitter).T
    return jnp.where(jnp.any(jnp.isnan(h), axis=-1, keepdims=True),
                     jnp.zeros_like(h), h)
