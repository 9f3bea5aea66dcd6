"""Quickstart: fit a GMM prior on channels, estimate from 2-bit observations.

The minimum end-to-end slice (reference workflow: `Bussgang_GMM.py`):
3GPP-SCM channels -> pilot -> quantize -> GMM fit -> Bussgang-LMMSE bank ->
estimates + NMSE vs the genie bound.

Runs on ANY backend, including TPU runtimes without complex buffer support:
it goes through `harness.stages`, whose cjit-wrapped stages pass complex
data across jit boundaries as packed (re, im) reals. On TPU, 'all'-mode
estimation automatically takes the fused Pallas kernel.

    python examples/01_quickstart_estimation.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

from quantized_channel_estimation_tpu.harness import stages
from quantized_channel_estimation_tpu.models import gmm
from quantized_channel_estimation_tpu.ops import scm
from quantized_channel_estimation_tpu.ops import quantizer as Q

N_ANT, K, N_BITS, SNR_DB = 32, 16, 2, 10.0

key = jax.random.PRNGKey(0)

# 1. channels (h) + genie Toeplitz covariance rows (t)
h_train, _ = stages.generate_channels(key, 20_000, scm.ScmConfig(N_ANT, 1))
h_val, t_val = stages.generate_channels(
    jax.random.PRNGKey(1), 2_000, scm.ScmConfig(N_ANT, 1))

# 2. pilot matrix + quantizer design + quantized observations
a = stages.pilot_matrix(N_ANT, n_pilots=1, n_bits=N_BITS)
q = Q.design_quantizer(SNR_DB, N_BITS)
r = stages.observe(jax.random.PRNGKey(2), h_val, SNR_DB, a, N_BITS, q)

# 3. fit the GMM prior on clean training channels
cfg = gmm.GmmConfig(n_components=K, zero_mean=True, max_iter=100)
fit = stages.gmm_fit(jax.random.PRNGKey(3), h_train, cfg)
print(f"EM converged: {bool(fit.converged)} after {int(fit.n_iter)} iters")

# 4. prepare the per-SNR Bussgang-LMMSE bank (a pure value — cache or shard it)
bank = stages.prepare_bank(fit.params, SNR_DB, a, N_BITS, q)

# 5. estimate and compare against the genie bound (true per-sample covariance)
h_est = stages.estimate_auto(bank, r, "all")
h_genie = stages.blmmse_genie(r, t_val, SNR_DB, a, N_BITS, q)
print(f"GMM-Bussgang NMSE @ {SNR_DB:.0f} dB: {stages.nmse(h_est, h_val):.4f}")
print(f"genie bound        @ {SNR_DB:.0f} dB: {stages.nmse(h_genie, h_val):.4f}")
