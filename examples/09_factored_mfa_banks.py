"""Factored MFA estimation: the low-rank prior never densifies.

The reference's Mofa fits Lambda Lambda^H + diag(psi) with a Woodbury
E-step, then DENSIFIES at prediction (`mofa_cplx_bussgang.py:117-216`) —
K dense D^3 Cholesky factorizations per SNR, an O(K D^2) bank, O(K D^2)
per estimate. Here the factored form goes end to end: for the standard
P=1 pilot with n-bit/inf-bit quantization the Bussgang covariance stays
EXACTLY low-rank+diagonal, so the per-SNR prepare runs only MxM
factorizations and estimation is O(K D M) per sample (models/mfa_bank.py;
on-chip 4.4x dense at D=512, 10.2x at D=2048 — BASELINE.md).

    python examples/09_factored_mfa_banks.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from quantized_channel_estimation_tpu import serving
from quantized_channel_estimation_tpu.harness import stages
from quantized_channel_estimation_tpu.models import (
    gmm_estimator, mfa, mfa_bank)
from quantized_channel_estimation_tpu.ops import observation, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.utils import metrics

N_ANT, N_BITS, SNR = 32, 2, 10.0
LATENT = 8

# --- fit an MFA prior on clean channels -----------------------------------
h, _ = scm.generate_channels(jax.random.PRNGKey(0), 24_000,
                             scm.ScmConfig(N_ANT, 2))
fit = mfa.fit(jax.random.PRNGKey(1), h,
              mfa.MfaConfig(n_components=16, latent_dim=LATENT,
                            zero_mean=True, max_iter=50))
print(f"MFA fit: {int(fit.n_iter)} iters, ll={float(fit.log_likelihood):.1f}")

# --- factored bank vs the densified path ----------------------------------
h_val, _ = scm.generate_channels(jax.random.PRNGKey(2), 2_000,
                                 scm.ScmConfig(N_ANT, 2))
q = Q.design_quantizer(SNR, N_BITS)
a = jnp.eye(N_ANT, dtype=jnp.complex64)          # P=1 pilot, x0 = 1
r = observation.observe(jax.random.PRNGKey(3), h_val, SNR, a, N_BITS, q)

bank_f = mfa_bank.prepare_bank_factored(fit.params, SNR, 1.0 + 0.0j,
                                        N_BITS, q)
bank_d = gmm_estimator.prepare_bank(mfa.to_gmm_params(fit.params), SNR, a,
                                    N_BITS, q)
h_f = mfa_bank.estimate_factored(bank_f, r)
h_d = gmm_estimator.estimate(bank_d, r, "all")
count = lambda b: sum(int(np.prod(x.shape)) for x in b)
print(f"NMSE factored={float(metrics.nmse(h_f, h_val)):.5f} "
      f"dense={float(metrics.nmse(h_d, h_val)):.5f}  "
      f"(bank elements {count(bank_d)} -> {count(bank_f)}, "
      f"{count(bank_d) / count(bank_f):.1f}x smaller)")

# coherence blocks + the alpha blend ride the same bank
rb = r[:500 * 4].reshape(500, 4, N_ANT)
h_coh = mfa_bank.estimate_factored_coherent(bank_f, rb, "all", 256, 0.25)
print(f"coherent T=4 alpha=0.25: "
      f"NMSE={float(metrics.nmse(h_coh.reshape(-1, N_ANT), h_val[:2000])):.5f}")

# --- serving: from_mfa defaults to the factored bank ----------------------
svc = serving.EstimationService.from_mfa(fit.params, 1.0 + 0.0j, N_BITS,
                                         max_delay_ms=2.0)
try:
    print(f"serving factored={svc.factored}")
    got = svc.submit(np.asarray(r[:256]), SNR)
    print(f"served 256 estimates, NMSE="
          f"{float(metrics.nmse(jnp.asarray(got), h_val[:256])):.5f}")
    m = svc.metrics()
    print(f"service metrics: served={m['estimates_served']} "
          f"microbatches={m['microbatches']}")
finally:
    svc.close()

# 1-bit falls back to the densified bank automatically (the arcsine map
# destroys low rank — a loud ValueError if forced)
svc1 = serving.EstimationService.from_mfa(fit.params, 1.0 + 0.0j, 1,
                                          max_delay_ms=2.0,
                                          use_pallas=False)
try:
    print(f"1-bit service factored={svc1.factored} (dense fallback)")
finally:
    svc1.close()
