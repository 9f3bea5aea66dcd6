"""Train the GMM directly on quantized pilots — no ground-truth CSI.

Reference workflow: `Bussgang_GMM_quant.py`. The EM runs on quantized
observations r = Q(Ah + n); each M-step recovers the underlying channel
covariances via the arcsine law (1-bit) or per-dimension Gauss-Newton
scale solves from quantization-bin occupancy (n-bit), so the prior is
learned without ever seeing a clean channel.

Plain complex API on CPU for clarity; see example 01 for the packed-real
`harness.stages` form that also runs on complex-less TPU runtimes.

    python examples/02_train_without_csi.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

from quantized_channel_estimation_tpu.estimators import blmmse
from quantized_channel_estimation_tpu.models import gmm, gmm_estimator, gmm_quant
from quantized_channel_estimation_tpu.ops import observation, pilots, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.utils import metrics

N_ANT, K, N_BITS = 16, 8, 2
SNR_TRAIN = 5.0   # the pilots the base station actually records
SNR_EVAL = 5.0

key = jax.random.PRNGKey(0)
h_train, _ = scm.generate_channels(key, 20_000, scm.ScmConfig(N_ANT, 1))
h_val, t_val = scm.generate_channels(jax.random.PRNGKey(1), 2_000,
                                     scm.ScmConfig(N_ANT, 1))

a = pilots.pilot_matrix(N_ANT, 1, N_BITS)
q_train = Q.design_quantizer(SNR_TRAIN, N_BITS)
sigma2 = 10.0 ** (-SNR_TRAIN / 10.0)

# the training data is QUANTIZED observations, not channels
r_train = observation.observe(jax.random.PRNGKey(2), h_train, SNR_TRAIN, a,
                              N_BITS, q_train)

cfg = gmm.GmmConfig(n_components=K, zero_mean=True, max_iter=40)
fit = gmm_quant.fit(jax.random.PRNGKey(3), r_train, cfg, N_BITS, sigma2,
                    q_train)
print(f"quantized-EM done after {int(fit.n_iter)} iters")

# evaluate: same Bussgang-LMMSE bank machinery as the CSI-trained GMM
q_eval = Q.design_quantizer(SNR_EVAL, N_BITS)
r_val = observation.observe(jax.random.PRNGKey(4), h_val, SNR_EVAL, a,
                            N_BITS, q_eval)
bank = gmm_estimator.prepare_bank(fit.params, SNR_EVAL, a, N_BITS, q_eval)
h_est = gmm_estimator.estimate(bank, r_val, "all")
h_genie = blmmse.estimate_genie(r_val, t_val, SNR_EVAL, a, N_BITS, q_eval)

print(f"CSI-free GMM NMSE @ {SNR_EVAL:.0f} dB: "
      f"{float(metrics.nmse(h_est, h_val)):.4f}")
print(f"genie bound       @ {SNR_EVAL:.0f} dB: "
      f"{float(metrics.nmse(h_genie, h_val)):.4f}")

# Structured CSI-free variants — both of these CRASH in the reference
# (`gmm_cplx_quant.py:763-767`); here they are working designs:
#   diag:      per-dim variance recovery from quantization-bin occupancy,
#              O(NKD) statistics (needs n_bits >= 2)
#   circulant: full recovery projected onto the circulant cone via the
#              DFT diagonal (Frobenius-nearest circulant)
for cov_type in ("diag", "circulant"):
    fit_s = gmm_quant.fit(jax.random.PRNGKey(5), r_train,
                          cfg._replace(cov_type=cov_type), N_BITS, sigma2,
                          q_train)
    bank_s = gmm_estimator.prepare_bank(fit_s.params, SNR_EVAL, a, N_BITS,
                                        q_eval)
    h_s = gmm_estimator.estimate(bank_s, r_val, "all")
    print(f"CSI-free {cov_type:9s} NMSE @ {SNR_EVAL:.0f} dB: "
          f"{float(metrics.nmse(h_s, h_val)):.4f}")
