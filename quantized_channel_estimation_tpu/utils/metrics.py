"""Evaluation metrics: normalized MSE and achievable-rate lower bound.

Reference formulas: MSE `Bussgang_GMM.py:144`; statistical rate lower bound
`Bussgang_GMM.py:146-163` (the "rstat" columns), evaluated against the global
Bussgang statistics Cq = Cr - B C B^H of the training sample covariance.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from quantized_channel_estimation_tpu.ops.bussgang import (
    bussgang_gain_matrix, quantized_cov)
from quantized_channel_estimation_tpu.ops.quantizer import ScalarQuantizer


def nmse(h_est: jax.Array, h: jax.Array) -> jax.Array:
    """sum(|h_est - h|^2) / h.size (`Bussgang_GMM.py:144`)."""
    return jnp.sum(jnp.abs(h_est - h) ** 2) / h.size


def global_bussgang_stats(cov: jax.Array, snr_db, n_bits,
                          q: Optional[ScalarQuantizer] = None):
    """(B_glob, Cq_glob) from the global channel covariance: Cy = C + sigma^2 I,
    B = Bussgang(Cy), Cq = Cr(Cy) - B C B^H (`Bussgang_GMM.py:148-151`)."""
    d = cov.shape[-1]
    sigma2 = 10.0 ** (-snr_db / 10.0)
    cy = cov + sigma2 * jnp.eye(d, dtype=cov.dtype)
    b = bussgang_gain_matrix(cy, n_bits, q)
    cr = quantized_cov(cy, n_bits, q, beta="mean")
    cq = cr - b @ cov @ jnp.conj(b).T
    return b, cq


def rate_mf_bound(h_est: jax.Array, h: jax.Array, b_glob: jax.Array,
                  cq_glob: jax.Array, jitter: float = 1e-9) -> jax.Array:
    """Per-sample matched-filter achievable-rate bound, averaged
    (`Bussgang_GMM.py:186-195`, the reference's second 'LS_glob' rate row):

      g = h_est^H B^H Cq^{-1};  rate_n = log2(1 + |g B h_est|^2 /
                                  (g Cq g^H + |g B (h - h_est)|^2))
    """
    from quantized_channel_estimation_tpu.ops import linalg
    cq_inv = linalg.psd_pinv(cq_glob + jitter * jnp.eye(
        cq_glob.shape[-1], dtype=cq_glob.dtype))
    # g_f = sum_e (h^H B^H)_e Cq^{-1}[e, f] — note 'ef', not 'fe': the
    # transposed inverse deviates by tenths of a bit for complex Cq
    g = jnp.einsum("nd,ed,ef->nf", jnp.conj(h_est), jnp.conj(b_glob), cq_inv)
    bh = jnp.einsum("de,ne->nd", b_glob, h_est)
    berr = jnp.einsum("de,ne->nd", b_glob, h - h_est)
    num = jnp.abs(jnp.einsum("nf,nf->n", g, bh)) ** 2
    den1 = jnp.real(jnp.einsum("nf,fe,ne->n", g, cq_glob, jnp.conj(g)))
    den2 = jnp.abs(jnp.einsum("nf,nf->n", g, berr)) ** 2
    return jnp.mean(jnp.real(jnp.log2(1.0 + num / (den1 + den2))))


def rate_lower_bound(h_est: jax.Array, h: jax.Array, b_glob: jax.Array,
                     cq_glob: jax.Array, norm_clip: Optional[float] = None) -> jax.Array:
    """Statistical achievable-rate lower bound log2(1 + num/(den1 + den2))
    (`Bussgang_GMM.py:153-163`).

    The estimates are normalized per sample by their power (the reference's
    in-place `res[i] /= norm_fac[i]`; for the GMM rows the norm is clipped
    below at 1e-1, `Bussgang_GMM.py:299` — pass norm_clip=0.1 for that path).
    """
    norm = jnp.sum(jnp.abs(h_est) ** 2, axis=-1)
    if norm_clip is not None:
        norm = jnp.clip(norm, norm_clip, None)
    g = h_est / norm[:, None]
    inner = jnp.einsum("nd,de,ne->n", jnp.conj(g), b_glob, h)
    num = jnp.abs(jnp.mean(inner)) ** 2
    den1 = jnp.var(inner)
    den2 = jnp.mean(jnp.real(jnp.einsum("nd,de,ne->n", jnp.conj(g), cq_glob, g)))
    return jnp.log2(1.0 + num / (den1 + den2))
