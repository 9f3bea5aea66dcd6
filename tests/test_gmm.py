"""GMM EM + estimation tests: parameter recovery on synthetic mixtures,
lower-bound monotonicity, estimator ordering, structured covariances."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_channel_estimation_tpu.models import gmm, gmm_estimator
from quantized_channel_estimation_tpu.ops import linalg as L
from quantized_channel_estimation_tpu.ops import observation, pilots, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.estimators import blmmse
from quantized_channel_estimation_tpu.utils.metrics import nmse


def _synthetic_mixture(rng, n, d=6, k=2, scale_sep=6.0):
    """Zero-mean complex Gaussians with known, strongly separated covariances
    (scale ratio `scale_sep` between consecutive components so EM can identify
    them without mean separation)."""
    covs = []
    for i in range(k):
        a = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
        c = a @ a.conj().T / d + scale_sep ** i * np.eye(d)
        covs.append(c)
    covs = np.stack(covs)
    labels = rng.integers(0, k, n)
    x = np.empty((n, d), np.complex64)
    for i in range(k):
        idx = labels == i
        l = np.linalg.cholesky(covs[i])
        w = np.sqrt(0.5) * (rng.standard_normal((idx.sum(), d))
                            + 1j * rng.standard_normal((idx.sum(), d)))
        x[idx] = (w @ l.T).astype(np.complex64)
    return x, covs


def test_em_recovers_mixture(rng, key):
    x, covs_true = _synthetic_mixture(rng, 8000)
    cfg = gmm.GmmConfig(n_components=2, cov_type="full", zero_mean=True,
                        chunk_size=2048)
    res = gmm.fit(key, jnp.asarray(x), cfg)
    assert bool(res.converged)
    w = np.sort(np.asarray(res.params.weights))
    np.testing.assert_allclose(w, [0.5, 0.5], atol=0.05)
    # match components by trace and compare covariances
    got = np.asarray(res.params.covariances)
    order = np.argsort([np.trace(c).real for c in got])
    order_true = np.argsort([np.trace(c).real for c in covs_true])
    for g, t in zip(order, order_true):
        rel = np.linalg.norm(got[g] - covs_true[t]) / np.linalg.norm(covs_true[t])
        assert rel < 0.15, rel


def test_em_lower_bound_improves(rng, key):
    """More EM iterations cannot degrade the lower bound (monotonicity)."""
    x, _ = _synthetic_mixture(rng, 3000)
    lbs = []
    for max_iter in [1, 3, 10]:
        cfg = gmm.GmmConfig(n_components=2, max_iter=max_iter, tol=0.0,
                            chunk_size=1024)
        res = gmm.fit(key, jnp.asarray(x), cfg)
        lbs.append(float(res.lower_bound))
    assert lbs[0] <= lbs[1] + 1e-4 and lbs[1] <= lbs[2] + 1e-4, lbs


@pytest.mark.parametrize("cov_type,blocks", [
    ("circulant", None),
    ("block-circulant", (2, 3)),
    ("toeplitz", None),
    ("block-toeplitz", (2, 3)),
    ("diag", None),
    ("spherical", None),
])
def test_structured_fit_shapes_and_psd(rng, key, cov_type, blocks):
    x, _ = _synthetic_mixture(rng, 2000)
    cfg = gmm.GmmConfig(n_components=2, cov_type=cov_type, blocks=blocks,
                        max_iter=5, chunk_size=1024)
    res = gmm.fit(key, jnp.asarray(x), cfg)
    covs = np.asarray(res.params.covariances)
    assert covs.shape == (2, 6, 6)
    for c in covs:
        np.testing.assert_allclose(c, c.conj().T, atol=1e-4)
        assert np.linalg.eigvalsh(c).min() > 0
    np.testing.assert_allclose(np.asarray(res.params.weights).sum(), 1.0,
                               rtol=1e-5)


def test_toeplitz_fit_is_toeplitz(rng, key):
    """The inv-em covariance update must produce (near-)Toeplitz matrices."""
    x, _ = _synthetic_mixture(rng, 2000)
    cfg = gmm.GmmConfig(n_components=1, cov_type="toeplitz", max_iter=8,
                        chunk_size=1024)
    res = gmm.fit(key, jnp.asarray(x), cfg)
    c = np.asarray(res.params.covariances)[0]
    for off in range(1, 5):
        diag = np.diagonal(c, offset=off)
        spread = np.abs(diag - diag.mean()).max()
        assert spread < 5e-2 * np.abs(np.diagonal(c)).mean(), (off, spread)


def test_spherical_fit_is_scalar_identity(rng, key):
    """Spherical covariances are sigma_k^2 I (diag averaged over dims,
    `gmm_cplx_bussgang.py:828-849`)."""
    x, covs_true = _synthetic_mixture(rng, 4000)
    cfg = gmm.GmmConfig(n_components=2, cov_type="spherical", max_iter=10,
                        chunk_size=1024)
    res = gmm.fit(key, jnp.asarray(x), cfg)
    covs = np.asarray(res.params.covariances)
    for c in covs:
        diag = np.diagonal(c).real
        np.testing.assert_allclose(diag, diag[0] * np.ones_like(diag),
                                   rtol=1e-5)
        off = c - np.diag(np.diagonal(c))
        assert np.abs(off).max() < 1e-6 * diag[0]
    # the two scalar variances should straddle the true per-component mean
    # variances (components are separated by a factor ~6 in scale)
    got = np.sort([np.diagonal(c).real[0] for c in covs])
    want = np.sort([np.trace(c).real / c.shape[0] for c in covs_true])
    np.testing.assert_allclose(got, want, rtol=0.2)


def test_circulant_fit_is_circulant(rng, key):
    x, _ = _synthetic_mixture(rng, 2000)
    cfg = gmm.GmmConfig(n_components=1, cov_type="circulant", max_iter=5,
                        chunk_size=1024)
    res = gmm.fit(key, jnp.asarray(x), cfg)
    c = np.asarray(res.params.covariances)[0]
    d = c.shape[0]
    f = np.fft.fft(np.eye(d)) / np.sqrt(d)
    spec = f @ c @ f.conj().T
    off = spec - np.diag(np.diag(spec))
    assert np.abs(off).max() < 1e-3 * np.abs(np.diag(spec)).max()


class TestGmmEstimation:
    N_ANT = 16

    @pytest.fixture(scope="class")
    def setup(self):
        key = jax.random.PRNGKey(7)
        cfg = scm.ScmConfig(n_antennas=self.N_ANT, n_path=1)
        h, t = scm.generate_channels(key, 22000, cfg)
        h_train, h_val, t_val = h[:20000], h[20000:], t[20000:]
        gcfg = gmm.GmmConfig(n_components=8, zero_mean=True, max_iter=30,
                             chunk_size=4096)
        fit = gmm.fit(jax.random.PRNGKey(8), h_train, gcfg)
        cov = jnp.einsum("nd,ne->de", h_train, jnp.conj(h_train)) / h_train.shape[0]
        return h_train, h_val, t_val, fit.params, cov

    @pytest.mark.parametrize("n_bits", [1, 2, Q.INF_BITS])
    def test_gmm_between_genie_and_global(self, setup, n_bits):
        """The ordering anchor: genie <= GMM <= global MSE (within tolerance)
        — the reference's core scientific validation (SURVEY §4)."""
        _, h_val, t_val, params, cov = setup
        snr = 10.0
        a = pilots.pilot_matrix(self.N_ANT, 1, n_bits)
        q = Q.design_quantizer(snr, n_bits)
        r = observation.observe(jax.random.PRNGKey(9), h_val, snr, a, n_bits, q)
        bank = gmm_estimator.prepare_bank(params, snr, a, n_bits, q)
        h_gmm = gmm_estimator.estimate(bank, r, "all")
        h_genie = blmmse.estimate_genie(r, t_val, snr, a, n_bits, q)
        h_glob = blmmse.estimate_global(r, cov, snr, a, n_bits, q)
        m_gmm = float(nmse(h_gmm, h_val))
        m_genie = float(nmse(h_genie, h_val))
        m_glob = float(nmse(h_glob, h_val))
        assert m_genie <= m_gmm * 1.05, (m_genie, m_gmm)
        assert m_gmm <= m_glob * 1.02, (m_gmm, m_glob)

    @pytest.mark.parametrize("mode", ["all", 1, 2, 0.9])
    def test_selection_modes(self, setup, mode):
        _, h_val, _, params, _ = setup
        snr, n_bits = 5.0, 2
        a = pilots.pilot_matrix(self.N_ANT, 1, n_bits)
        q = Q.design_quantizer(snr, n_bits)
        r = observation.observe(jax.random.PRNGKey(10), h_val, snr, a, n_bits, q)
        bank = gmm_estimator.prepare_bank(params, snr, a, n_bits, q)
        h_est = gmm_estimator.estimate(bank, r, mode)
        m = float(nmse(h_est, h_val))
        assert np.isfinite(m) and m < 1.0, (mode, m)

    def test_selection_weights_sum_to_one(self, setup, rng):
        proba = jnp.asarray(rng.dirichlet(np.ones(8), size=32), jnp.float32)
        for mode in ["all", 1, 3, 0.7]:
            w = gmm_estimator._selection_weights(proba, mode)
            np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)

    def test_coherent_reduces_to_estimate_at_t1(self, setup):
        """estimate_coherent on (B, 1, M) blocks must equal `estimate` —
        one snapshot contributes one log-likelihood, so the block posterior
        IS the per-sample posterior."""
        _, h_val, _, params, _ = setup
        snr, n_bits = 5.0, 2
        a = pilots.pilot_matrix(self.N_ANT, 1, n_bits)
        q = Q.design_quantizer(snr, n_bits)
        r = observation.observe(jax.random.PRNGKey(11), h_val, snr, a,
                                n_bits, q)
        bank = gmm_estimator.prepare_bank(params, snr, a, n_bits, q)
        flat = gmm_estimator.estimate(bank, r, "all")
        blk = gmm_estimator.estimate_coherent(bank, r[:, None, :], "all")
        np.testing.assert_allclose(np.asarray(blk[:, 0]), np.asarray(flat),
                                   rtol=2e-4, atol=2e-4)

    def test_coherent_beats_independent(self, setup):
        """Joint component selection over a coherence block (snapshots share
        one angular PSD -> one generating component) must beat independent
        per-snapshot estimation — the capability the reference lacks
        (`SCMMulti.py:30` emits blocks but everything downstream is
        single-snapshot)."""
        _, _, _, params, _ = setup
        key = jax.random.PRNGKey(12)
        n_coh, n_blocks = 8, 1500
        cfg = scm.ScmConfig(n_antennas=self.N_ANT, n_path=1,
                            n_coherence=n_coh)
        h, _ = scm.generate_channels(key, n_blocks, cfg)  # (B, T, N)
        snr, n_bits = 0.0, 2
        a = pilots.pilot_matrix(self.N_ANT, 1, n_bits)
        q = Q.design_quantizer(snr, n_bits)
        r = observation.observe(jax.random.fold_in(key, 1), h, snr, a,
                                n_bits, q)  # (B, T, M)
        bank = gmm_estimator.prepare_bank(params, snr, a, n_bits, q)
        h_flat = h.reshape(-1, self.N_ANT)
        m_indep = float(nmse(
            gmm_estimator.estimate(bank, r.reshape(h_flat.shape[0], -1),
                                   "all"), h_flat))
        m_joint = float(nmse(
            gmm_estimator.estimate_coherent(bank, r, "all").reshape(
                -1, self.N_ANT), h_flat))
        assert m_joint < m_indep, (m_joint, m_indep)

    def test_coherent_stats_shard_merge(self, setup):
        """`estimate_coherent_stats` from disjoint component shards, merged
        flash-style, must reproduce `estimate_coherent` exactly — the
        block-aware state behind the rank-3 TP route (round-2 VERDICT
        item 1)."""
        from quantized_channel_estimation_tpu.estimators.pallas_kernels import (
            merge_stats)
        _, h_val, _, params, _ = setup
        snr, n_bits, t = 0.0, 2, 4
        a = pilots.pilot_matrix(self.N_ANT, 1, n_bits)
        q = Q.design_quantizer(snr, n_bits)
        r = observation.observe(jax.random.PRNGKey(13), h_val, snr, a,
                                n_bits, q)
        b = r.shape[0] // t
        rb = r[:b * t].reshape(b, t, -1)
        bank = gmm_estimator.prepare_bank(params, snr, a, n_bits, q)
        want = np.asarray(gmm_estimator.estimate_coherent(bank, rb, "all"))
        k = bank.filters.shape[0]
        ms, dens, accs = [], [], []
        for k0 in range(0, k, k // 4):
            sub = gmm_estimator.PreparedBank(
                *[x[k0:k0 + k // 4] for x in bank])
            m_c, den_c, acc_c = gmm_estimator.estimate_coherent_stats(
                sub, rb, 64)
            ms.append(m_c)
            dens.append(den_c)
            accs.append(acc_c.reshape(acc_c.shape[0], -1))
        _, den, acc = merge_stats(ms, dens, accs)
        got = np.asarray((acc / den[:, None].astype(acc.dtype))
                         .reshape(want.shape))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_coherent_alpha_blend_endpoints(self, setup):
        """The leave-one-out evidence blend: alpha=0 must equal the
        INDEPENDENT per-snapshot estimator bit-for-bit, alpha=1 the block
        posterior; interior alphas are finite (round-3 probe: the family
        dominates both endpoints under urban-macro model mismatch —
        tools/coherent_temper_probe.py, BASELINE.md)."""
        _, h_val, _, params, _ = setup
        snr, n_bits, t = 0.0, 2, 4
        a = pilots.pilot_matrix(self.N_ANT, 1, n_bits)
        q = Q.design_quantizer(snr, n_bits)
        r = observation.observe(jax.random.PRNGKey(14), h_val, snr, a,
                                n_bits, q)
        b = r.shape[0] // t
        rb = r[:b * t].reshape(b, t, -1)
        bank = gmm_estimator.prepare_bank(params, snr, a, n_bits, q)
        indep = gmm_estimator.estimate(bank, rb.reshape(-1, self.N_ANT),
                                       "all").reshape(rb.shape[0], t, -1)
        a0 = gmm_estimator.estimate_coherent(bank, rb, "all", 512, 0.0)
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(indep))
        a1 = gmm_estimator.estimate_coherent(bank, rb, "all", 512, 1.0)
        np.testing.assert_array_equal(
            np.asarray(a1),
            np.asarray(gmm_estimator.estimate_coherent(bank, rb)))
        mid = gmm_estimator.estimate_coherent(bank, rb, "all", 512, 0.5)
        assert np.all(np.isfinite(np.asarray(mid)))

    def test_select_coherence_alpha(self, setup):
        """Round-4 auto-alpha: on the SAME bank, the selected alpha must be
        the grid argmin of validation NMSE and the reported scores must
        match independently computed NMSEs."""
        _, _, _, params, _ = setup
        key = jax.random.PRNGKey(21)
        t = 4
        cfg = scm.ScmConfig(n_antennas=self.N_ANT, n_path=1, n_coherence=t)
        h, _ = scm.generate_channels(key, 800, cfg)       # (B, T, N)
        snr, n_bits = 0.0, 2
        a = pilots.pilot_matrix(self.N_ANT, 1, n_bits)
        q = Q.design_quantizer(snr, n_bits)
        r = observation.observe(jax.random.fold_in(key, 1), h, snr, a,
                                n_bits, q)
        bank = gmm_estimator.prepare_bank(params, snr, a, n_bits, q)

        def est(rb, alpha):
            return gmm_estimator.estimate_coherent(bank, rb, "all", 512,
                                                   alpha)

        best, scores = gmm_estimator.select_coherence_alpha(est, r, h)
        assert best == min(scores, key=scores.get)
        assert set(scores) == set(gmm_estimator.DEFAULT_ALPHA_GRID)
        for al in (0.0, 1.0):
            ref = float(nmse(est(r, al), h))
            np.testing.assert_allclose(scores[al], ref, rtol=1e-3)


def test_fit_resume_continues(rng, key):
    """Resuming EM from checkpointed params must not degrade the lower bound
    and should improve an unconverged fit."""
    x, _ = _synthetic_mixture(rng, 4000)
    cfg = gmm.GmmConfig(n_components=2, max_iter=3, tol=0.0, chunk_size=1024)
    first = gmm.fit(key, jnp.asarray(x), cfg)
    resumed = gmm.fit_resume(first.params, jnp.asarray(x),
                             cfg._replace(max_iter=10))
    assert float(resumed.lower_bound) >= float(first.lower_bound) - 1e-3


def test_fit_resume_toeplitz_continues(rng, key):
    """Structured (inv-em) fits resume from checkpointed covariances: the
    circulant spectrum is re-derived from them, so segmented fits keep the
    lower bound non-decreasing."""
    x, _ = _synthetic_mixture(rng, 3000)
    cfg = gmm.GmmConfig(n_components=2, cov_type="toeplitz", zero_mean=True,
                        max_iter=3, tol=0.0, chunk_size=1024)
    first = gmm.fit(key, jnp.asarray(x), cfg)
    resumed = gmm.fit_resume(first.params, jnp.asarray(x),
                             cfg._replace(max_iter=10))
    assert float(resumed.lower_bound) >= float(first.lower_bound) - 1e-3
    # A second segment may step back by O(reg_covar) at the boundary: the
    # checkpointed covariances carry re-added jitter, so the restart model
    # differs slightly from the in-loop one. Allow that; forbid real drift
    # (the inexact spectrum recovery this test originally caught lost ~0.15).
    again = gmm.fit_resume(resumed.params, jnp.asarray(x),
                           cfg._replace(max_iter=5))
    assert float(again.lower_bound) >= float(resumed.lower_bound) - 0.02
