"""VAE channel estimator: train on noisy quantized pilots, then estimate.

Reference workflow: `Bussgang_VAE.py --vae noisy`. The VAE learns a
conditionally-Gaussian prior: its decoder emits per-sample FFT-domain
variances, so each observation gets its OWN LMMSE filter (vs the GMM's
fixed bank). Training regenerates the quantized observations every epoch
with per-sample random SNRs (intentional SNR-robust training, kept from
the reference) — entirely on-device.

Modes: 'genie' (clean-channel input), 'noisy' (quantized input, clean
target), 'real' (quantized input only — no CSI at all, like example 02).

    python examples/04_vae_estimator.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from quantized_channel_estimation_tpu.models import vae
from quantized_channel_estimation_tpu.ops import observation, pilots, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.utils import metrics

N_ANT, N_BITS = 16, 2
SNRS = (0.0, 5.0, 10.0, 15.0)   # training draws per-sample SNRs from these
SNR_EVAL = 10.0

key = jax.random.PRNGKey(0)
h_train, _ = scm.generate_channels(key, 8_000, scm.ScmConfig(N_ANT, 1))
h_val, _ = scm.generate_channels(jax.random.PRNGKey(1), 1_000,
                                 scm.ScmConfig(N_ANT, 1))

cfg = vae.VaeConfig(n_antennas=N_ANT, latent_dim=N_ANT // 4, n_layers=3,
                    vae_mode="noisy", n_bits=N_BITS, lr=1e-3,
                    batch_size=128, epochs=30)
a = pilots.pilot_matrix(N_ANT, 1, N_BITS)
quantizers = [Q.design_quantizer(s, N_BITS) for s in SNRS]

model, state, losses = vae.train(jax.random.PRNGKey(2), cfg, h_train, a,
                                 jnp.asarray(SNRS, jnp.float32), quantizers,
                                 verbose=False)
print(f"trained {cfg.epochs} epochs; loss {losses[0]:.1f} -> {losses[-1]:.1f}")

q_eval = Q.design_quantizer(SNR_EVAL, N_BITS)
r_val = observation.observe(jax.random.PRNGKey(3), h_val, SNR_EVAL, a,
                            N_BITS, q_eval)
h_est = vae.estimate(model, state.params, cfg, r_val, SNR_EVAL, a, q_eval)
print(f"VAE-noisy NMSE @ {SNR_EVAL:.0f} dB: "
      f"{float(metrics.nmse(h_est, h_val)):.4f}")
