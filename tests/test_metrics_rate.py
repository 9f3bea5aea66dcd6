"""Rate-bound parity unit tests against a NumPy transcription oracle.

The oracle functions are literal transcriptions of the reference's rate
computation: global Bussgang statistics (`Bussgang_GMM.py:148-151` via
`modules/uniform_quantizer.py:60-72,114-128,149-173`), the statistical
lower bound (`Bussgang_GMM.py:153-163`, norm clip `:299`), and the
matched-filter bound (`Bussgang_GMM.py:186-195`). The full-reference-module
version of this check is tools/parity_rate.py; this test keeps a fast
self-contained oracle in the suite.
"""
import numpy as np
import pytest
from scipy.stats import norm

import jax.numpy as jnp

from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.utils import metrics


# --- oracle: literal reference transcriptions (float64) -------------------

def oracle_bussgang_matrix(snr_db, n_bits, cy):
    """`modules/uniform_quantizer.py:60-72`."""
    if n_bits == np.inf:
        return np.eye(cy.shape[-1])
    if n_bits == 1:
        return np.diag(np.sqrt(2 / np.pi) / np.sqrt(np.real(np.diag(cy))))
    delta = float(Q.uniform_step(snr_db, n_bits))
    cy_diag_inv = 1 / np.real(np.diag(cy))
    b = np.zeros(cy.shape[0])
    for i in range(1, int(2 ** n_bits)):
        b = b + np.exp(-delta ** 2 * (i - 2 ** n_bits / 2) ** 2 * cy_diag_inv)
    b = b * delta / np.sqrt(np.pi) / np.sqrt(np.real(np.diag(cy)))
    return np.diag(b)


def oracle_quantized_variance(sigma2, thresholds, labels):
    """`modules/uniform_quantizer.py:114-128` (per-dim loop)."""
    sigma2 = sigma2 / 2
    res = np.zeros_like(sigma2)
    for d in range(sigma2.shape[0]):
        s = np.sqrt(sigma2[d])
        res[d] += labels[0] ** 2 * norm.cdf(thresholds[0] / s)
        res[d] += labels[-1] ** 2 * (1 - norm.cdf(thresholds[-1] / s))
        for i in range(1, labels.shape[0] - 1):
            res[d] += labels[i] ** 2 * (norm.cdf(thresholds[i] / s)
                                        - norm.cdf(thresholds[i - 1] / s))
    return 2 * res


def oracle_cr(cy, n_bits, snr_db, thresholds, labels):
    """`modules/uniform_quantizer.py:149-173` (single-matrix case)."""
    if n_bits == np.inf:
        return cy
    if n_bits == 1:
        psi_12 = np.real(np.diag(1 / np.sqrt(np.diag(cy))))
        inner_re = np.clip(np.real(psi_12 @ np.real(cy) @ psi_12), -1, 1)
        inner_im = np.clip(np.real(psi_12 @ np.imag(cy) @ psi_12), -1, 1)
        return 2 / np.pi * (np.arcsin(inner_re) + 1j * np.arcsin(inner_im))
    a_buss = oracle_bussgang_matrix(snr_db, n_bits, cy)
    diag_cr = oracle_quantized_variance(np.real(np.diag(cy)), thresholds,
                                        labels)
    cr = np.mean(np.diag(a_buss)) ** 2 * cy
    np.fill_diagonal(cr, diag_cr)
    return cr


def oracle_rate_stat(res, h_val, buss, cq, norm_clip=None):
    """`Bussgang_GMM.py:153-163` (+ `:299` clip)."""
    res = res.copy()
    norm_fac = np.sum(np.abs(res) ** 2, axis=1)
    if norm_clip is not None:
        norm_fac = np.clip(norm_fac, norm_clip, np.inf)
    for i in range(res.shape[0]):
        res[i] /= norm_fac[i]
    inner = np.squeeze(np.expand_dims(res.conj(), 1) @ buss
                       @ np.expand_dims(h_val, 2))
    num = np.abs(np.mean(inner, axis=0)) ** 2
    den1 = np.var(inner, axis=0)
    den2 = np.mean(np.real(np.squeeze(
        np.expand_dims(res.conj(), 1) @ cq @ np.expand_dims(res, 2))),
        axis=0)
    return float(np.log2(1 + num / (den1 + den2)))


def oracle_rate_mf(res, h_val, buss, cq):
    """`Bussgang_GMM.py:186-195`."""
    cq_inv = np.linalg.pinv(cq)
    rate = 0.0
    for n in range(res.shape[0]):
        g = res[n].conj().T @ buss.conj().T @ cq_inv
        err = h_val[n] - res[n]
        rate += np.real(np.log2(1 + np.abs(g @ buss @ res[n]) ** 2
                                / (g @ cq @ g.conj().T
                                   + np.abs(g @ buss @ err) ** 2)))
    return float(rate / res.shape[0])


# --- fixtures --------------------------------------------------------------

D, N = 8, 300


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((4 * D, D))
         + 1j * rng.standard_normal((4 * D, D))) / np.sqrt(2)
    cov = x.conj().T @ x / (4 * D)
    h = (rng.standard_normal((N, D)) + 1j * rng.standard_normal((N, D)))
    h = h @ np.linalg.cholesky(cov).conj().T / np.sqrt(2)
    res = h + 0.3 * (rng.standard_normal((N, D))
                     + 1j * rng.standard_normal((N, D)))
    return cov, h, res


@pytest.mark.parametrize("n_bits,snr_db", [(1, 0.0), (2, 10.0), (2, -5.0),
                                           (3, 5.0), (np.inf, 10.0)])
def test_rate_stat_matches_oracle(data, n_bits, snr_db):
    cov, h, res = data
    q = (Q.design_quantizer(snr_db, n_bits, dtype=jnp.float64)
         if n_bits != np.inf else None)
    thr = np.asarray(q.thresholds) if q is not None else None
    lab = np.asarray(q.labels) if q is not None else None
    sigma2 = 10 ** (-snr_db / 10)
    cy = cov + sigma2 * np.eye(D)
    buss = oracle_bussgang_matrix(snr_db, n_bits, cy)
    cq = oracle_cr(cy, n_bits, snr_db, thr, lab) - buss @ cov @ buss.conj().T

    b_ours, cq_ours = metrics.global_bussgang_stats(
        jnp.asarray(cov), snr_db, n_bits, q)
    np.testing.assert_allclose(np.asarray(b_ours), buss, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(cq_ours), cq, rtol=1e-6, atol=1e-10)

    for clip in (None, 0.1):
        ours = float(metrics.rate_lower_bound(
            jnp.asarray(res), jnp.asarray(h), b_ours, cq_ours,
            norm_clip=clip))
        ref = oracle_rate_stat(res, h, buss, cq, norm_clip=clip)
        assert abs(ours - ref) / abs(ref) < 1e-8


def test_rate_stat_clip_active(data):
    """Shrunken estimates force every norm under the 1e-1 clip
    (`Bussgang_GMM.py:299`); clip on/off must then differ."""
    cov, h, res = data
    n_bits, snr_db = 2, 0.0
    q = Q.design_quantizer(snr_db, n_bits, dtype=jnp.float64)
    b, cq = metrics.global_bussgang_stats(jnp.asarray(cov), snr_db, n_bits, q)
    small = jnp.asarray(0.001 * res)
    ours = float(metrics.rate_lower_bound(small, jnp.asarray(h), b, cq,
                                          norm_clip=0.1))
    ref = oracle_rate_stat(0.001 * res, h, np.asarray(b), np.asarray(cq),
                           norm_clip=0.1)
    assert abs(ours - ref) / abs(ref) < 1e-8
    noclip = float(metrics.rate_lower_bound(small, jnp.asarray(h), b, cq))
    assert abs(ours - noclip) > 1e-6


def test_perfect_csi_anchor(data):
    """`Bussgang_GMM.py:244-262`: res = channels themselves, no clip; the
    anchor upper-bounds the estimator rows."""
    cov, h, res = data
    n_bits, snr_db = 2, 10.0
    q = Q.design_quantizer(snr_db, n_bits, dtype=jnp.float64)
    b, cq = metrics.global_bussgang_stats(jnp.asarray(cov), snr_db, n_bits, q)
    ours = float(metrics.rate_lower_bound(jnp.asarray(h), jnp.asarray(h),
                                          b, cq))
    ref = oracle_rate_stat(h.copy(), h, np.asarray(b), np.asarray(cq))
    assert abs(ours - ref) / abs(ref) < 1e-8
    est_rate = float(metrics.rate_lower_bound(jnp.asarray(res),
                                              jnp.asarray(h), b, cq))
    assert ours >= est_rate - 1e-9


@pytest.mark.parametrize("n_bits,snr_db", [(1, 0.0), (2, 10.0),
                                           (np.inf, 5.0)])
def test_rate_mf_matches_oracle(data, n_bits, snr_db):
    cov, h, res = data
    q = (Q.design_quantizer(snr_db, n_bits, dtype=jnp.float64)
         if n_bits != np.inf else None)
    b, cq = metrics.global_bussgang_stats(jnp.asarray(cov), snr_db, n_bits, q)
    ours = float(metrics.rate_mf_bound(jnp.asarray(res), jnp.asarray(h),
                                       b, cq))
    ref = oracle_rate_mf(res, h, np.asarray(b), np.asarray(cq))
    assert abs(ours - ref) / abs(ref) < 1e-6
