"""Combinatorial smoke tests: every supported configuration axis crossed at
tiny scale. The reference exposes these axes through its script constants
(`Bussgang_GMM.py:34-63`, `Bussgang_MFA.py:30-39`); targeted tests cover the
common combinations — this file guards the long tail (e.g. lloyd + MFA,
spherical + estimation, 1-bit + block-toeplitz, 'rand' pilots) against
combination crashes. Tiny shapes keep each case to a fraction of a second.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_channel_estimation_tpu.models import (
    gmm, gmm_estimator, gmm_quant, mfa)
from quantized_channel_estimation_tpu.ops import observation, pilots
from quantized_channel_estimation_tpu.ops import quantizer as Q

D = 8
N = 600


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(123)
    kr, ki = jax.random.split(key)
    # correlated complex Gaussian channels (cheap SCM stand-in)
    w = (jax.random.normal(kr, (N + 128, D))
         + 1j * jax.random.normal(ki, (N + 128, D))).astype(jnp.complex64)
    mix = jnp.exp(-0.4 * jnp.abs(jnp.arange(D)[:, None]
                                 - jnp.arange(D)[None, :])).astype(jnp.complex64)
    h = w @ mix
    h = h / jnp.sqrt(jnp.mean(jnp.abs(h) ** 2))
    return h[:N], h[N:]


@pytest.mark.parametrize("cov_type,blocks", [
    ("full", None), ("circulant", None), ("block-circulant", (2, 4)),
    ("toeplitz", None), ("block-toeplitz", (2, 4)), ("diag", None),
    ("spherical", None),
])
@pytest.mark.parametrize("n_bits", [1, 2, Q.INF_BITS])
def test_gmm_cov_type_by_bits(data, cov_type, blocks, n_bits):
    h_train, h_val = data
    cfg = gmm.GmmConfig(n_components=2, cov_type=cov_type, blocks=blocks,
                        max_iter=2, chunk_size=256)
    fit = gmm.fit(jax.random.PRNGKey(0), h_train, cfg)
    a = pilots.pilot_matrix(D, 1, n_bits)
    q = Q.design_quantizer(5.0, n_bits) if not Q.is_inf_bits(n_bits) else None
    bank = gmm_estimator.prepare_bank(fit.params, 5.0, a, n_bits, q)
    r = observation.observe(jax.random.PRNGKey(1), h_val, 5.0, a, n_bits, q)
    est = gmm_estimator.estimate(bank, r, "all")
    assert est.shape == h_val.shape
    assert np.all(np.isfinite(np.asarray(est).view(np.float32)))


@pytest.mark.parametrize("mode", ["all", 1, 2, 0.9])
@pytest.mark.parametrize("qtype", ["uniform", "lloyd"])
def test_selection_modes_by_quantizer(data, mode, qtype):
    h_train, h_val = data
    cfg = gmm.GmmConfig(n_components=3, max_iter=2, chunk_size=256)
    fit = gmm.fit(jax.random.PRNGKey(0), h_train, cfg)
    a = pilots.pilot_matrix(D, 1, 2)
    q = Q.design_quantizer(5.0, 2, qtype)
    bank = gmm_estimator.prepare_bank(fit.params, 5.0, a, 2, q)
    r = observation.observe(jax.random.PRNGKey(1), h_val, 5.0, a, 2, q)
    est = gmm_estimator.estimate(bank, r, mode)
    assert est.shape == h_val.shape
    assert np.all(np.isfinite(np.asarray(est).view(np.float32)))


@pytest.mark.parametrize("ptype", ["angle", "angle_amp", "rand", "ones"])
@pytest.mark.parametrize("n_pilots", [1, 2])
def test_pilot_types(data, ptype, n_pilots):
    h_train, h_val = data
    key = jax.random.PRNGKey(7)
    a = pilots.pilot_matrix(D, n_pilots, 2, ptype, key=key)
    assert a.shape == (n_pilots * D, D)
    cfg = gmm.GmmConfig(n_components=2, max_iter=2, chunk_size=256)
    fit = gmm.fit(jax.random.PRNGKey(0), h_train, cfg)
    q = Q.design_quantizer(5.0, 2)
    bank = gmm_estimator.prepare_bank(fit.params, 5.0, a, 2, q)
    r = observation.observe(jax.random.PRNGKey(1), h_val, 5.0, a, 2, q)
    est = gmm_estimator.estimate(bank, r, "all")
    assert est.shape == h_val.shape


@pytest.mark.parametrize("cov_type", ["full", "toeplitz", "diag",
                                      "spherical", "circulant"])
@pytest.mark.parametrize("n_bits", [1, 2, Q.INF_BITS])
def test_quant_gmm_matrix(data, cov_type, n_bits):
    h_train, _ = data
    snr = 5.0
    a = pilots.pilot_matrix(D, 1, n_bits)
    q = Q.design_quantizer(snr, n_bits) if not Q.is_inf_bits(n_bits) else None
    r = observation.observe(jax.random.PRNGKey(2), h_train, snr, a, n_bits, q)
    cfg = gmm.GmmConfig(n_components=2, cov_type=cov_type, zero_mean=True,
                        max_iter=2, chunk_size=256)
    if cov_type in ("diag", "spherical") and n_bits == 1:
        with pytest.raises(NotImplementedError, match="unidentifiable"):
            gmm_quant.fit(jax.random.PRNGKey(3), r, cfg, n_bits,
                          10 ** (-snr / 10), q)
        return
    fit = gmm_quant.fit(jax.random.PRNGKey(3), r, cfg, n_bits,
                        10 ** (-snr / 10), q)
    covs = np.asarray(fit.params.covariances)
    assert covs.shape == (2, D, D)
    assert np.all(np.isfinite(covs.view(np.float32)))


@pytest.mark.parametrize("ppca", [False, True])
@pytest.mark.parametrize("lock_psis", [False, True])
@pytest.mark.parametrize("zero_mean", [False, True])
def test_mfa_flag_matrix(data, ppca, lock_psis, zero_mean):
    h_train, h_val = data
    cfg = mfa.MfaConfig(n_components=2, latent_dim=2, ppca=ppca,
                        lock_psis=lock_psis, zero_mean=zero_mean,
                        rs_clip=1e-3, max_iter=3, kmeans_iter=3)
    fit = mfa.fit(jax.random.PRNGKey(4), h_train, cfg)
    params = mfa.to_gmm_params(fit.params, 1e-6)
    a = pilots.pilot_matrix(D, 1, 2)
    q = Q.design_quantizer(5.0, 2, "lloyd")  # lloyd + MFA: long-tail combo
    bank = gmm_estimator.prepare_bank(params, 5.0, a, 2, q)
    r = observation.observe(jax.random.PRNGKey(5), h_val, 5.0, a, 2, q)
    est = gmm_estimator.estimate(bank, r, "all")
    assert np.all(np.isfinite(np.asarray(est).view(np.float32)))
