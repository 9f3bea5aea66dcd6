"""Bussgang decomposition statistics for coarsely quantized Gaussian signals.

For r = Q(y) with y ~ CN(mu, Cy) and per-real-component scalar quantization,
the Bussgang decomposition r = B y + q gives a linear model with uncorrelated
distortion q. This module provides:

  - `bussgang_gain_diag`: the diagonal Bussgang gain B (closed form for any
    threshold/label quantizer; specializes to the reference's uniform
    `uniform_quantizer.py:60-72` and Lloyd `lloyd_max_quantizer.py:10-21`
    formulas, which are the same sum re-grouped by adjacent label differences)
  - `quantized_variance`: exact per-dim E[|Q(y)|^2] via Gaussian bin masses
    (`uniform_quantizer.py:114-128`, vectorized: no triple loop)
  - `arcsine_cov`: the 1-bit arcsine law (`uniform_quantizer.py:154-164`)
  - `quantized_cov`: quantized-output covariance Cr for any bit-width
    (`uniform_quantizer.py:149-173`)

All functions are batched over leading axes and jittable; `n_bits` is static.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from quantized_channel_estimation_tpu.ops.quantizer import (
    ScalarQuantizer, is_inf_bits)


def bussgang_gain_diag(diag_cy: jax.Array, n_bits,
                       q: Optional[ScalarQuantizer] = None) -> jax.Array:
    """Diagonal of the Bussgang gain matrix for y with per-dim variance diag_cy.

    Closed form: B_ii = sum_j (l_j - l_{j-1}) exp(-tau_j^2 / Cy_ii)
                        / (sqrt(pi) sqrt(Cy_ii)),
    the general threshold/label formula that reduces to the reference's
    uniform and Lloyd expressions. 1-bit: sqrt(2/pi)/sqrt(Cy_ii); inf: 1.

    diag_cy: (..., D) real (real part is taken if complex). Returns (..., D) real.
    """
    diag_cy = jnp.real(diag_cy)
    if is_inf_bits(n_bits):
        return jnp.ones_like(diag_cy)
    if n_bits == 1:
        return jnp.sqrt(2.0 / jnp.pi) / jnp.sqrt(diag_cy)
    label_steps = jnp.diff(q.labels)  # (2^b - 1,), aligns with thresholds
    expo = jnp.exp(-(q.thresholds ** 2)[..., :] / diag_cy[..., None])
    b = jnp.sum(label_steps * expo, axis=-1)
    return b / (jnp.sqrt(jnp.pi) * jnp.sqrt(diag_cy))


def bussgang_gain_matrix(cy: jax.Array, n_bits,
                         q: Optional[ScalarQuantizer] = None) -> jax.Array:
    """Full (diagonal) Bussgang gain matrix for covariance(s) cy (..., D, D)."""
    d = cy.shape[-1]
    if is_inf_bits(n_bits):
        return jnp.broadcast_to(jnp.eye(d, dtype=cy.dtype), cy.shape)
    diag = jnp.diagonal(cy, axis1=-2, axis2=-1)
    b = bussgang_gain_diag(diag, n_bits, q)
    return (b[..., None] * jnp.eye(d, dtype=b.dtype)).astype(cy.dtype)


def quantized_variance(sigma2: jax.Array, q: ScalarQuantizer) -> jax.Array:
    """Exact per-dim output power E[|Q(y)|^2] for y with complex variance sigma2.

    Each real component is N(0, sigma2/2); bin masses come from the Gaussian
    CDF at the thresholds. Returns real, same shape as sigma2.
    """
    s = jnp.sqrt(jnp.real(sigma2) / 2.0)[..., None]  # per-component std
    cdf = 0.5 * (1.0 + jax.scipy.special.erf(q.thresholds / (s * jnp.sqrt(2.0))))
    ones = jnp.ones_like(cdf[..., :1])
    masses = jnp.diff(jnp.concatenate([jnp.zeros_like(ones), cdf, ones], axis=-1))
    return 2.0 * jnp.sum(q.labels ** 2 * masses, axis=-1)


def arcsine_cov(cy: jax.Array) -> jax.Array:
    """1-bit arcsine law: Cr = 2/pi (arcsin(Re K) + j arcsin(Im K)) with
    K = Psi^{-1/2} Cy Psi^{-1/2}, Psi = diag(Cy); inputs (..., D, D) complex."""
    diag = jnp.real(jnp.diagonal(cy, axis1=-2, axis2=-1))
    inv_sqrt = 1.0 / jnp.sqrt(diag)
    scale = inv_sqrt[..., :, None] * inv_sqrt[..., None, :]
    inner_re = jnp.clip(jnp.real(cy) * scale, -1.0, 1.0)
    inner_im = jnp.clip(jnp.imag(cy) * scale, -1.0, 1.0)
    return (2.0 / jnp.pi) * (jnp.arcsin(inner_re) + 1j * jnp.arcsin(inner_im)).astype(cy.dtype)


def quantized_cov(cy: jax.Array, n_bits, q: Optional[ScalarQuantizer] = None,
                  beta: str = "mean") -> jax.Array:
    """Covariance Cr of the quantized output r = Q(y), y ~ CN(0, Cy).

    1-bit: arcsine law. inf: Cy. n-bit: beta^2 * Cy off-diagonal with the exact
    quantized variance on the diagonal, where beta is the (scalar) Bussgang
    gain summary — 'mean' of the diagonal gains (`uniform_quantizer.py:171`)
    or 'first' (gain of dim 0, the BLMMSE convention `estimators/blmmse.py:59`).

    Note: the reference's `get_Cr` n-bit branch multiplies the *whole batch*
    Cy into each Cr[i] (`uniform_quantizer.py:171`) — only correct for a
    single matrix. Here it is per-matrix (documented fix).
    """
    if is_inf_bits(n_bits):
        return cy
    if n_bits == 1:
        return arcsine_cov(cy)
    diag = jnp.real(jnp.diagonal(cy, axis1=-2, axis2=-1))
    gains = bussgang_gain_diag(diag, n_bits, q)
    if beta == "mean":
        b = jnp.mean(gains, axis=-1)
    elif beta == "first":
        b = gains[..., 0]
    else:
        raise ValueError(f"beta must be 'mean' or 'first', got {beta!r}")
    b2 = (b ** 2)[..., None, None].astype(cy.dtype)
    d = cy.shape[-1]
    eye = jnp.eye(d, dtype=cy.dtype)
    cr = b2 * cy * (1 - eye)  # off-diagonal part
    diag_cr = quantized_variance(diag, q).astype(cy.dtype)
    return cr + diag_cr[..., None] * eye


def bank_gains_and_cov(cy: jax.Array, n_bits,
                       q: Optional[ScalarQuantizer] = None,
                       exact_diag: bool = False):
    """(diagonal Bussgang gains, Cr) of a (batched) observation covariance —
    the shared estimator-bank model (`gmm_cplx_bussgang.py:274-307`):

      1-bit: gains = sqrt(2/pi) diag(Cy)^(-1/2), Cr = arcsine law
      inf:   gains = 1, Cr = Cy
      n-bit: Cr = beta^2 Cy + (1-beta^2) diag(diag(Cy)),
             beta = clip(mean(gains), 0, 1); with exact_diag=True the
             diagonal is the exact quantized variance instead
             (`gmm_cplx_quant.py:934-945`, the quantized-EM resynthesis).

    One implementation shared by GMM bank preparation, the VAE estimator,
    and the quantized-EM M-step, so a change to the Cr model propagates to
    every consumer.
    """
    diag_cy = jnp.real(jnp.diagonal(cy, axis1=-2, axis2=-1))
    if is_inf_bits(n_bits):
        return jnp.ones_like(diag_cy), cy
    if n_bits == 1:
        return bussgang_gain_diag(diag_cy, 1), arcsine_cov(cy)
    gains = bussgang_gain_diag(diag_cy, n_bits, q)
    beta = jnp.clip(jnp.mean(gains, axis=-1), 0.0, 1.0)
    b2 = (beta ** 2)[..., None, None].astype(cy.dtype)
    eye = jnp.eye(cy.shape[-1], dtype=cy.dtype)
    if exact_diag:
        diag_cr = quantized_variance(diag_cy, q).astype(cy.dtype)
        cr = b2 * cy * (1 - eye) + diag_cr[..., None] * eye
    else:
        diag_mat = jnp.diagonal(cy, axis1=-2, axis2=-1)[..., None] * eye
        cr = b2 * cy + (1 - b2) * diag_mat
    return gains, cr


def blmmse_quantized_cov(cy: jax.Array, n_bits,
                         q: Optional[ScalarQuantizer] = None,
                         beta: str = "first") -> jax.Array:
    """The n-bit Cr model used inside the BLMMSE/GMM estimators:
    Cr = beta^2 Cy + (1 - beta^2) diag(diag(Cy))
    (`estimators/blmmse.py:59`, `gmm_cplx_bussgang.py:305-307`).

    beta='first' for classical BLMMSE, beta='mean' (clipped to [0,1]) for the
    GMM component banks.
    """
    if is_inf_bits(n_bits):
        return cy
    if n_bits == 1:
        return arcsine_cov(cy)
    diag = jnp.real(jnp.diagonal(cy, axis1=-2, axis2=-1))
    gains = bussgang_gain_diag(diag, n_bits, q)
    if beta == "mean":
        b = jnp.clip(jnp.mean(gains, axis=-1), 0.0, 1.0)
    else:
        b = gains[..., 0]
    b2 = (b ** 2)[..., None, None].astype(cy.dtype)
    d = cy.shape[-1]
    eye = jnp.eye(d, dtype=cy.dtype)
    diag_mat = jnp.diagonal(cy, axis1=-2, axis2=-1)[..., None] * eye
    return b2 * cy + (1 - b2) * diag_mat
