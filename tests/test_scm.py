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
