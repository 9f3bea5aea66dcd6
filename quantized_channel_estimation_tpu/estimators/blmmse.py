"""Classical Bussgang-LMMSE estimators (reference `estimators/blmmse.py`).

Two variants:
  - genie: per-sample true Toeplitz covariance from the SCM first row
    (`blmmse.py:21-61`) — here one batched computation over all samples
    (batched Toeplitz build + batched Cholesky solves) instead of a Python
    loop per sample.
  - global: one shared sample covariance, filter precomputed once
    (`blmmse.py:64-97`).

Solves use Cholesky (`cho_solve_hermitian`) with a small diagonal jitter for
the near-singular 1-bit arcsine covariance, replacing the reference's pinv.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from quantized_channel_estimation_tpu.ops import linalg
from quantized_channel_estimation_tpu.ops.bussgang import (
    arcsine_cov, blmmse_quantized_cov, bussgang_gain_diag)
from quantized_channel_estimation_tpu.ops.precision import highest_precision
from quantized_channel_estimation_tpu.ops.quantizer import (
    ScalarQuantizer, is_inf_bits)


def _observation_cov(c: jax.Array, a: jax.Array, sigma2) -> jax.Array:
    """Cy = A C A^H + sigma^2 I for C (..., N, N), A (M, N)."""
    m = a.shape[0]
    cy = jnp.einsum("mn,...nk,pk->...mp", a, c, jnp.conj(a))
    return cy + jnp.asarray(sigma2, jnp.float32) * jnp.eye(m, dtype=c.dtype)


def _effective_matrix_and_cr(cy: jax.Array, a: jax.Array, n_bits,
                             q: Optional[ScalarQuantizer]):
    """(A_eff, Cr) = (B A, quantized-output covariance model) for the BLMMSE
    family; B diagonal Bussgang gain of Cy (`blmmse.py:26-60`)."""
    if is_inf_bits(n_bits):
        a_eff = jnp.broadcast_to(a, cy.shape[:-2] + a.shape)
        return a_eff, cy
    diag = jnp.diagonal(cy, axis1=-2, axis2=-1)
    gains = bussgang_gain_diag(diag, n_bits, q).astype(cy.dtype)
    a_eff = gains[..., :, None] * a
    if n_bits == 1:
        cr = arcsine_cov(cy)
    else:
        cr = blmmse_quantized_cov(cy, n_bits, q, beta="first")
    return a_eff, cr


@highest_precision
def estimate_genie_cov(r: jax.Array, c: jax.Array, snr_db, a: jax.Array,
                       n_bits, q: Optional[ScalarQuantizer] = None,
                       jitter: float = 1e-6) -> jax.Array:
    """Genie BLMMSE from explicit per-sample channel covariances:
    h_b = C_b A_eff^H Cr_b^{-1} r_b (`blmmse.py:21-61`, covariance-build
    step factored out).

    r: (B, M) quantized observations; c: (B, N, N) covariances.
    """
    sigma2 = 10.0 ** (-snr_db / 10.0)
    cy = _observation_cov(c, a, sigma2)
    a_eff, cr = _effective_matrix_and_cr(cy, a, n_bits, q)
    x = linalg.cho_solve_hermitian(cr, r, jitter=jitter)  # (B, M)
    cah = jnp.einsum("...nk,...mk->...nm", c, jnp.conj(a_eff))  # C A_eff^H
    return jnp.einsum("...nm,...m->...n", cah, x)


def estimate_genie(r: jax.Array, t: jax.Array, snr_db, a: jax.Array,
                   n_bits, q: Optional[ScalarQuantizer] = None,
                   jitter: float = 1e-6) -> jax.Array:
    """Genie BLMMSE: per-sample Toeplitz covariance C_b = toeplitz(t_b)
    (`blmmse.py:21-61`).

    r: (B, M) quantized observations; t: (B, N) covariance first rows.
    """
    c = linalg.toeplitz_from_first_row(t.astype(r.dtype))  # (B, N, N)
    return estimate_genie_cov(r, c, snr_db, a, n_bits, q, jitter)


@highest_precision
def estimate_genie_kron(r: jax.Array, t_bs: jax.Array, t_ms: jax.Array,
                        snr_db, a: jax.Array, n_bits,
                        q: Optional[ScalarQuantizer] = None,
                        jitter: float = 1e-6) -> jax.Array:
    """Genie BLMMSE for Kronecker MIMO channels (`ops/scm_mimo.py`):
    per-sample C_b = kron(toeplitz(t_ms,b), toeplitz(t_bs,b)) — the true
    covariance of the vectorized channel (layout i = i_ms*N_BS + i_bs).
    No reference counterpart (its MIMO model is dead code); the estimator
    math is `blmmse.py:21-61` with the kron covariance.
    """
    c_bs = linalg.toeplitz_from_first_row(t_bs.astype(r.dtype))
    c_ms = linalg.toeplitz_from_first_row(t_ms.astype(r.dtype))
    n_bs, n_ms = c_bs.shape[-1], c_ms.shape[-1]
    c = jnp.einsum("...ij,...kl->...ikjl", c_ms, c_bs).reshape(
        c_ms.shape[:-2] + (n_ms * n_bs, n_ms * n_bs))
    return estimate_genie_cov(r, c, snr_db, a, n_bits, q, jitter)


@highest_precision
def global_filter(cov: jax.Array, snr_db, a: jax.Array, n_bits,
                  q: Optional[ScalarQuantizer] = None,
                  jitter: float = 1e-6) -> jax.Array:
    """Precompute the global BLMMSE filter W = C A_eff^H Cr^{-1} (N, M)
    (`blmmse.py:64-94`)."""
    sigma2 = 10.0 ** (-snr_db / 10.0)
    cy = _observation_cov(cov, a, sigma2)
    a_eff, cr = _effective_matrix_and_cr(cy, a, n_bits, q)
    cah = cov @ jnp.conj(a_eff).T  # C A_eff^H, (N, M)
    # W = C A_eff^H Cr^{-1}; with Cr Hermitian, W = (Cr^{-1} (C A_eff^H)^H)^H
    w_h = linalg.cho_solve_hermitian(cr, jnp.conj(cah).T, jitter=jitter)
    return jnp.conj(w_h).T


@highest_precision
def estimate_global(r: jax.Array, cov: jax.Array, snr_db, a: jax.Array,
                    n_bits, q: Optional[ScalarQuantizer] = None,
                    jitter: float = 1e-6) -> jax.Array:
    """Global BLMMSE: shared sample covariance, one filter applied to the whole
    batch (`blmmse.py:64-97`)."""
    w = global_filter(cov, snr_db, a, n_bits, q, jitter)
    return r @ w.T
