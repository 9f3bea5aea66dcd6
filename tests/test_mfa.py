"""MFA EM tests: Woodbury identities, low-rank recovery, Bussgang estimation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_channel_estimation_tpu.models import gmm_estimator, mfa
from quantized_channel_estimation_tpu.estimators import blmmse
from quantized_channel_estimation_tpu.ops import observation, pilots, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.ops.cplx import crandn
from quantized_channel_estimation_tpu.utils.metrics import nmse


def test_woodbury_inverse_matches_dense(rng):
    k, d, m = 3, 8, 2
    lam = (rng.standard_normal((k, d, m)) + 1j * rng.standard_normal((k, d, m))).astype(np.complex128)
    psi = rng.uniform(0.5, 2.0, (k, d))
    inv = np.asarray(mfa.woodbury_inverse(jnp.asarray(lam), jnp.asarray(psi)))
    for i in range(k):
        dense = lam[i] @ lam[i].conj().T + np.diag(psi[i])
        np.testing.assert_allclose(inv[i] @ dense, np.eye(d), atol=1e-9)


def test_slogdet_from_woodbury(rng):
    k, d, m = 2, 6, 3
    lam = (rng.standard_normal((k, d, m)) + 1j * rng.standard_normal((k, d, m))).astype(np.complex128)
    psi = rng.uniform(0.5, 2.0, (k, d))
    ld = np.asarray(mfa._slogdet_from_woodbury(jnp.asarray(lam), jnp.asarray(psi)))
    for i in range(k):
        dense = lam[i] @ lam[i].conj().T + np.diag(psi[i])
        np.testing.assert_allclose(ld[i], np.linalg.slogdet(dense)[1], rtol=1e-9)


def test_mfa_fits_low_rank_data(rng, key):
    """Single-component PPCA on genuinely low-rank-plus-noise data must
    recover the covariance well."""
    d, m, n = 16, 3, 20000
    lam_true = (rng.standard_normal((d, m)) + 1j * rng.standard_normal((d, m))) / np.sqrt(2)
    psi_true = 0.1
    z = np.sqrt(0.5) * (rng.standard_normal((n, m)) + 1j * rng.standard_normal((n, m)))
    eps = np.sqrt(0.5 * psi_true) * (rng.standard_normal((n, d)) + 1j * rng.standard_normal((n, d)))
    x = (z @ lam_true.T + eps).astype(np.complex64)
    c_true = lam_true @ lam_true.conj().T + psi_true * np.eye(d)

    # the reference's loading init is tiny (scale 1/sqrt(2 max_cond)), so EM
    # ramps slowly; a smaller max_condition_number gives a practical start
    cfg = mfa.MfaConfig(n_components=1, latent_dim=m, ppca=True,
                        zero_mean=True, max_iter=150, chunk_size=4096,
                        max_condition_number=10.0)
    res = mfa.fit(key, jnp.asarray(x), cfg)
    assert np.isfinite(float(res.log_likelihood))
    c_fit = np.asarray(mfa.covariances(res.params))[0]
    rel = np.linalg.norm(c_fit - c_true) / np.linalg.norm(c_true)
    assert rel < 0.15, rel
    # noise floor recovered accurately
    assert abs(float(res.params.psis[0, 0]) - psi_true) < 0.05


def test_mfa_loglik_improves(rng, key):
    d, n = 8, 4000
    x = (rng.standard_normal((n, d)) + 1j * rng.standard_normal((n, d))).astype(np.complex64)
    lls = []
    for it in [2, 6, 15]:
        cfg = mfa.MfaConfig(n_components=2, latent_dim=2, max_iter=it, tol=0.0,
                            chunk_size=2048)
        res = mfa.fit(key, jnp.asarray(x), cfg)
        lls.append(float(res.log_likelihood))
    assert lls[0] <= lls[1] + 1e-2 and lls[1] <= lls[2] + 1e-2, lls


class TestMfaEstimation:
    N_ANT = 16

    def test_mfa_bussgang_estimation(self):
        key = jax.random.PRNGKey(11)
        cfg_scm = scm.ScmConfig(self.N_ANT, 3)  # reference MFA default n_path=3
        h, t = scm.generate_channels(key, 22000, cfg_scm)
        h_train, h_val, t_val = h[:20000], h[20000:], t[20000:]
        cfg = mfa.MfaConfig(n_components=8, latent_dim=self.N_ANT // 4,
                            ppca=True, zero_mean=True, max_iter=30,
                            chunk_size=4096)
        res = mfa.fit(jax.random.PRNGKey(12), h_train, cfg)
        params = mfa.to_gmm_params(res.params, reg=1e-6)

        snr, n_bits = 10.0, 2
        a = pilots.pilot_matrix(self.N_ANT, 1, n_bits)
        q = Q.design_quantizer(snr, n_bits)
        r = observation.observe(jax.random.PRNGKey(13), h_val, snr, a, n_bits, q)
        bank = gmm_estimator.prepare_bank(params, snr, a, n_bits, q)
        h_est = gmm_estimator.estimate(bank, r, "all")
        m_mfa = float(nmse(h_est, h_val))

        cov = jnp.einsum("nd,ne->de", h_train, jnp.conj(h_train)) / h_train.shape[0]
        h_glob = blmmse.estimate_global(r, cov, snr, a, n_bits, q)
        m_glob = float(nmse(h_glob, h_val))
        assert np.isfinite(m_mfa) and m_mfa < 1.0
        assert m_mfa <= m_glob * 1.1, (m_mfa, m_glob)

    def test_mfa_bank_coherent_estimation(self):
        """estimate_coherent is model-agnostic over PreparedBank: an
        MFA-derived bank pools block posteriors the same way — joint must
        not lose to independent snapshots at low SNR (blocks share one
        angular PSD)."""
        key = jax.random.PRNGKey(21)
        h_train, _ = scm.generate_channels(key, 20000,
                                           scm.ScmConfig(self.N_ANT, 3))
        cfg = mfa.MfaConfig(n_components=8, latent_dim=self.N_ANT // 4,
                            ppca=True, zero_mean=True, max_iter=30,
                            chunk_size=4096)
        res = mfa.fit(jax.random.PRNGKey(22), h_train, cfg)
        params = mfa.to_gmm_params(res.params, reg=1e-6)

        n_coh = 8
        hb, _ = scm.generate_channels(
            jax.random.PRNGKey(23), 1500,
            scm.ScmConfig(self.N_ANT, 3, n_coherence=n_coh))
        snr, n_bits = 0.0, 2
        a = pilots.pilot_matrix(self.N_ANT, 1, n_bits)
        q = Q.design_quantizer(snr, n_bits)
        r = observation.observe(jax.random.PRNGKey(24), hb, snr, a,
                                n_bits, q)
        bank = gmm_estimator.prepare_bank(params, snr, a, n_bits, q)
        h_flat = hb.reshape(-1, self.N_ANT)
        m_indep = float(nmse(gmm_estimator.estimate(
            bank, r.reshape(h_flat.shape[0], -1), "all"), h_flat))
        m_joint = float(nmse(gmm_estimator.estimate_coherent(
            bank, r, "all").reshape(-1, self.N_ANT), h_flat))
        assert m_joint <= m_indep * 1.01, (m_joint, m_indep)


def test_rs_clip_fires_exact_reference_semantics():
    """When a component's responsibility mass falls below rs_clip, every
    sample's responsibility for it is set to rs_clip
    (`mofa_cplx_bussgang.py:338`), so its M-step weight is EXACTLY rs_clip
    (reference `amps[k] = sumrs[k] / N`; weights then intentionally do NOT
    sum to 1). Force the branch for every component with rs_clip > n so the
    final weights are deterministic."""
    key = jax.random.PRNGKey(11)
    x = 0.01 * crandn(key, (400, 8)) + 1.0
    rc = 500.0  # > n: every component mass (<= n = 400) clips
    cfg = mfa.MfaConfig(n_components=8, latent_dim=2, ppca=True,
                        rs_clip=rc, max_iter=1, kmeans_iter=5)
    res = mfa.fit(jax.random.PRNGKey(12), x, cfg)
    w = np.asarray(res.params.weights)
    np.testing.assert_allclose(w, rc, rtol=1e-6)
    assert np.isfinite(float(res.log_likelihood))
    leaves = jax.tree_util.tree_leaves(res.params)
    assert all(np.all(np.isfinite(np.asarray(l).view(np.float32)
                                  if np.iscomplexobj(np.asarray(l))
                                  else np.asarray(l))) for l in leaves)


def test_rs_clip_noop_when_all_components_live():
    """With every component above the rs_clip mass threshold the clip must
    be an exact no-op: the fit equals the rs_clip=0 fit bitwise."""
    key = jax.random.PRNGKey(11)
    x = 0.01 * crandn(key, (400, 8)) + 1.0
    kw = dict(n_components=8, latent_dim=2, ppca=True, max_iter=10,
              kmeans_iter=5)
    res_off = mfa.fit(jax.random.PRNGKey(12), x,
                      mfa.MfaConfig(rs_clip=0.0, **kw))
    res_on = mfa.fit(jax.random.PRNGKey(12), x,
                     mfa.MfaConfig(rs_clip=1e-3, **kw))
    for a, b in zip(jax.tree_util.tree_leaves(res_off.params),
                    jax.tree_util.tree_leaves(res_on.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mfa_fit_resume_continues(key):
    """Warm-starting EM from checkpointed params must not degrade the
    log-likelihood and should improve an unconverged fit (SURVEY §5
    checkpoint-based restart)."""
    h, _ = scm.generate_channels(key, 4000, scm.ScmConfig(8, 1))
    cfg = mfa.MfaConfig(n_components=2, latent_dim=2, max_iter=3, tol=0.0)
    first = mfa.fit(jax.random.PRNGKey(1), h, cfg)
    resumed = mfa.fit_resume(first.params, h, cfg._replace(max_iter=10))
    assert float(resumed.log_likelihood) >= float(first.log_likelihood) - 1e-3
