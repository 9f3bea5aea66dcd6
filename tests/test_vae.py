"""VAE tests: shapes, loss finiteness, short-training improvement, and
end-to-end estimation sanity for all three modes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_channel_estimation_tpu.models import vae
from quantized_channel_estimation_tpu.ops import observation, pilots, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.utils.metrics import nmse

N_ANT = 16
SNRS = [-10, -5, 0, 5, 10, 15, 20]


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(20)
    h, _ = scm.generate_channels(key, 6000, scm.ScmConfig(N_ANT, 1))
    return h[:5000], h[5000:]


def _cfg(mode, **kw):
    return vae.VaeConfig(n_antennas=N_ANT, latent_dim=4, n_layers=3,
                         vae_mode=mode, n_bits=2, lr=1e-3, batch_size=128,
                         epochs=2, steps_per_epoch=20, **kw)


def _setup(mode):
    cfg = _cfg(mode)
    a = pilots.pilot_matrix(N_ANT, 1, cfg.n_bits)
    quantizers = [Q.design_quantizer(s, cfg.n_bits) for s in SNRS]
    return cfg, a, quantizers


@pytest.mark.parametrize("mode", ["genie", "noisy", "real"])
def test_train_step_finite(data, mode):
    h_train, _ = data
    cfg, a, quantizers = _setup(mode)
    model, state = vae.init_vae(jax.random.PRNGKey(0), cfg)
    step = vae.make_train_step(model, cfg, a, jnp.asarray(SNRS, jnp.float32),
                               quantizers)
    losses = []
    for i in range(5):
        state, loss = step(state, h_train, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses), losses


def test_training_reduces_loss(data):
    h_train, _ = data
    cfg, a, quantizers = _setup("noisy")
    model, state = vae.init_vae(jax.random.PRNGKey(1), cfg)
    step = vae.make_train_step(model, cfg, a, jnp.asarray(SNRS, jnp.float32),
                               quantizers)
    first, last = [], []
    for i in range(120):
        state, loss = step(state, h_train, jax.random.PRNGKey(i))
        (first if i < 20 else last).append(float(loss))
    assert np.mean(last[-20:]) < np.mean(first), (np.mean(first), np.mean(last[-20:]))


@pytest.mark.parametrize("mode", ["genie", "noisy", "real"])
def test_estimation_beats_trivial(data, mode):
    """After a short training run, the VAE estimator must beat the trivial
    zero estimator (NMSE < 1) at moderate SNR."""
    h_train, h_val = data
    cfg, a, quantizers = _setup(mode)
    cfg = cfg._replace(epochs=3, steps_per_epoch=60)
    model, state, losses = vae.train(
        jax.random.PRNGKey(2), cfg, h_train, a, SNRS, quantizers,
        verbose=False)
    snr = 10.0
    q = Q.design_quantizer(snr, cfg.n_bits)
    r = observation.observe(jax.random.PRNGKey(3), h_val, snr, a, cfg.n_bits, q)
    h_true = h_val if mode == "genie" else None  # genie eval is genie-aided
    h_est = vae.estimate(model, state.params, cfg, r, snr, a, q,
                         h_true=h_true)
    m = float(nmse(h_est, h_val))
    assert np.isfinite(m) and m < 1.0, (mode, m)


def test_obs_to_input_shapes(data):
    h_train, _ = data
    cfg, a, quantizers = _setup("noisy")
    q = quantizers[3]
    r = observation.observe(jax.random.PRNGKey(4), h_train[:32], 5.0, a,
                            cfg.n_bits, q)
    x = vae.obs_to_input(cfg, r)
    assert x.shape == (32, 2 * N_ANT)
    assert x.dtype == jnp.float32
    cfg_real = _cfg("real")
    x2 = vae.obs_to_input(cfg_real, r)
    assert x2.shape == (32, 2 * N_ANT)
