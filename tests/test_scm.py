"""SCM channel simulator: statistical properties vs the genie covariance."""
import jax
import jax.numpy as jnp
import numpy as np

from quantized_channel_estimation_tpu.ops import linalg as L
from quantized_channel_estimation_tpu.ops import scm


def test_channel_unit_power(key):
    cfg = scm.ScmConfig(n_antennas=16, n_path=2)
    h, t = scm.generate_channels(key, 2000, cfg)
    h = np.asarray(h)
    # per-antenna power E[|h_i|^2] = t[0] = 1 after PSD normalization
    assert abs(np.mean(np.abs(h) ** 2) - 1.0) < 0.05
    t = np.asarray(t)
    np.testing.assert_allclose(t[:, 0].real, 1.0, atol=1e-3)
    np.testing.assert_allclose(t[:, 0].imag, 0.0, atol=1e-3)


def test_sample_cov_matches_genie_toeplitz(key):
    """Many coherence draws of a single PSD must have sample covariance close
    to toeplitz(t) — the relation genie-BLMMSE relies on."""
    cfg = scm.ScmConfig(n_antennas=8, n_path=1, n_coherence=4000)
    h, t = scm.generate_channels(key, 3, cfg)
    h = np.asarray(h)  # (3, n_coh, N)
    c_true = np.asarray(L.toeplitz_from_first_row(t))
    for b in range(3):
        emp = h[b].T @ h[b].conj() / h.shape[1]
        np.testing.assert_allclose(emp, c_true[b], atol=0.12)


def test_chunked_matches_batch_shape(key):
    cfg = scm.ScmConfig(n_antennas=8, n_path=2)
    h, t = scm.generate_channels_chunked(key, 1000, cfg, chunk=256)
    assert h.shape == (1000, 8)
    assert t.shape == (1000, 8)


# ---- MIMO (Kronecker) variant: ops/scm_mimo.py -------------------------
from quantized_channel_estimation_tpu.ops import scm_mimo


def test_mimo_shapes_and_unit_power(key):
    cfg = scm_mimo.ScmMimoConfig(n_antennas_bs=8, n_antennas_ms=4, n_path=2)
    h, t_bs, t_ms = scm_mimo.generate_channels_mimo(key, 1500, cfg)
    assert h.shape == (1500, 32)
    assert t_bs.shape == (1500, 8) and t_ms.shape == (1500, 4)
    # both ends' PSDs are energy-normalized -> t[0] = 1 at each end, and the
    # kron diagonal is t_bs[0]*t_ms[0] = 1
    np.testing.assert_allclose(np.asarray(t_bs)[:, 0].real, 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t_ms)[:, 0].real, 1.0, atol=1e-3)
    assert abs(np.mean(np.abs(np.asarray(h)) ** 2) - 1.0) < 0.1


def test_mimo_cov_is_kron_of_toeplitz(key):
    """Coherence draws of one sample must have covariance kron(C_MS, C_BS)
    with the reference's vectorization layout (i = i_ms*N_BS + i_bs,
    `scm_helper_MIMO.py:105-118`) — verified WITHOUT the factored shortcut,
    against a dense numpy kron of the genie Toeplitz rows."""
    cfg = scm_mimo.ScmMimoConfig(n_antennas_bs=4, n_antennas_ms=3, n_path=1,
                                 n_coherence=8000)
    h, t_bs, t_ms = scm_mimo.generate_channels_mimo(key, 2, cfg)
    h = np.asarray(h)  # (2, n_coh, 12)
    c_bs = np.asarray(L.toeplitz_from_first_row(t_bs))
    c_ms = np.asarray(L.toeplitz_from_first_row(t_ms))
    for b in range(2):
        c_true = np.kron(c_ms[b], c_bs[b])
        emp = h[b].T @ h[b].conj() / h.shape[1]
        np.testing.assert_allclose(emp, c_true, atol=0.12)


def test_mimo_chunked_matches_shapes(key):
    cfg = scm_mimo.ScmMimoConfig(n_antennas_bs=4, n_antennas_ms=2, n_path=2)
    h, t_bs, t_ms = scm_mimo.generate_channels_mimo_chunked(
        key, 700, cfg, chunk=256)
    assert h.shape == (700, 8)
    assert t_bs.shape == (700, 4) and t_ms.shape == (700, 2)


def test_mimo_feeds_block_toeplitz_gmm(key):
    """The Kronecker MIMO channel is the natural block-toeplitz GMM input:
    a small fit must converge with finite lower bound and kron-structured
    component covariances."""
    from quantized_channel_estimation_tpu.models import gmm

    cfg = scm_mimo.ScmMimoConfig(n_antennas_bs=4, n_antennas_ms=2, n_path=1)
    h, _, _ = scm_mimo.generate_channels_mimo(key, 2000, cfg)
    res = gmm.fit(jax.random.PRNGKey(1), h,
                  gmm.GmmConfig(n_components=2, cov_type="block-toeplitz",
                                blocks=(2, 4), max_iter=15))
    assert np.isfinite(float(res.lower_bound))
    covs = np.asarray(res.params.covariances)
    assert covs.shape == (2, 8, 8)
    assert np.all(np.isfinite(covs))


# ---- Urban-macro variant: scm.generate_channels_urban_macro ------------


def test_urban_macro_shapes_and_pathloss_range(key):
    cfg = scm.UrbanMacroConfig(n_antennas=8)
    h, t = scm.generate_channels_urban_macro(key, 3000, cfg)
    assert h.shape == (3000, 8) and t.shape == (3000, 8)
    t0 = np.asarray(t)[:, 0]
    np.testing.assert_allclose(t0.imag, 0.0, atol=1e-3)
    # per-antenna power = beta in [1, (max/min)^(eps_pl/10)] ~ [1, 4.13]
    beta_max = (cfg.max_dist / cfg.min_dist) ** (cfg.eps_pl / 10.0)
    assert np.all(t0.real > 1.0 - 1e-3)
    assert np.all(t0.real < beta_max + 1e-3)


def test_urban_macro_genie_cov_matches_samples(key):
    """Per-sample mean power must track the genie diagonal (h scaled by
    sqrt(beta), t by beta — `SCM3GPPMacro.py:71-77`)."""
    cfg = scm.UrbanMacroConfig(n_antennas=6, n_coherence=4000)
    h, t = scm.generate_channels_urban_macro(key, 4, cfg)
    h = np.asarray(h)  # (4, n_coh, 6)
    t0 = np.asarray(t)[:, 0].real
    emp = np.mean(np.abs(h) ** 2, axis=(1, 2))
    np.testing.assert_allclose(emp, t0, rtol=0.08)


def test_multi_snapshot_coherence_pipeline(key):
    """n_coherence > 1 (reference signature `SCMMulti.py:30`): snapshots are
    independent draws sharing one angular PSD; flatten_coherence broadcasts
    the per-block genie Toeplitz row so the single-snapshot estimators run
    unchanged, and genie-BLMMSE quality matches the n_coherence=1 pipeline."""
    import numpy as np
    from quantized_channel_estimation_tpu.estimators import blmmse
    from quantized_channel_estimation_tpu.ops import observation, pilots
    from quantized_channel_estimation_tpu.ops import quantizer as Q
    from quantized_channel_estimation_tpu.utils.metrics import nmse

    n_ant, n_coh, n_blocks = 16, 4, 500
    h, t = scm.generate_channels(key, n_blocks,
                                 scm.ScmConfig(n_ant, 2, n_coherence=n_coh))
    assert h.shape == (n_blocks, n_coh, n_ant)
    h_flat, t_flat = scm.flatten_coherence(h, t)
    assert h_flat.shape == (n_blocks * n_coh, n_ant)
    assert t_flat.shape == (n_blocks * n_coh, n_ant)
    # the genie row repeats within each block
    np.testing.assert_array_equal(np.asarray(t_flat[:n_coh]),
                                  np.tile(np.asarray(t[:1]), (n_coh, 1)))
    # snapshots share second-order statistics: per-block sample covariance
    # diag approaches the genie diag (coarse at n_coh=4, so pool blocks)
    e_diag = float(jnp.mean(jnp.abs(h_flat) ** 2))
    g_diag = float(jnp.mean(jnp.real(t_flat[:, 0])))
    assert abs(e_diag - g_diag) / g_diag < 0.1

    snr, n_bits = 10.0, 2
    a = pilots.pilot_matrix(n_ant, 1, n_bits)
    q = Q.design_quantizer(snr, n_bits)
    r = observation.observe(jax.random.fold_in(key, 1), h_flat, snr, a,
                            n_bits, q)
    m_multi = float(nmse(blmmse.estimate_genie(r, t_flat, snr, a, n_bits, q),
                         h_flat))
    # single-snapshot pipeline at matched sample count
    h1, t1 = scm.generate_channels(jax.random.fold_in(key, 2),
                                   n_blocks * n_coh,
                                   scm.ScmConfig(n_ant, 2, n_coherence=1))
    r1 = observation.observe(jax.random.fold_in(key, 3), h1, snr, a,
                             n_bits, q)
    m_single = float(nmse(blmmse.estimate_genie(r1, t1, snr, a, n_bits, q),
                          h1))
    assert abs(m_multi - m_single) / m_single < 0.15, (m_multi, m_single)
    # 2-D input passes through unchanged
    assert scm.flatten_coherence(h1).shape == h1.shape
