"""MFA vs GMM at large antenna dimension: the factored model's scale story.

At D beyond ~128 the full-covariance GMM's E-step is O(K N D^2) and its
M-step materializes (K, D, D) second moments; the MFA's factored-Woodbury
E-step (ARCHITECTURE.md, `models/mfa.py`) is O(K N D M) with M = D/4 —
structure the reference implements (`mofa_cplx_bussgang.py`) but never
exercises past D=64. This tool fits both at the same shape, compares fit
time and Bussgang-estimation MSE vs the genie bound at 10 dB / 2-bit.

Measured (v5e, 2026-08-19), D=256, K=16, 30 iters, latent 64:
  MFA fit 7.5 s, mse 0.0605; GMM fit 9.1 s, mse 0.0510; genie 0.0395.
The factored E-step buys only 1.21x fit time despite 4x fewer FLOPs —
both fits are HBM-bound on the data scan (PARITY_NOTES.md flash-EM
entry), so the FLOP saving barely shows; and the PPCA covariance loses
~19% MSE to the full GMM at this shape. Conclusion recorded in
BASELINE.md: at large D prefer the structured (toeplitz) GMM, which wins
on BOTH axes; MFA remains the choice when a latent representation itself
is wanted.

Usage: python tools/scale_bench_mfa.py [D] [K] [iters]
"""
import os
import sys
import time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
from quantized_channel_estimation_tpu.models import gmm, mfa
from quantized_channel_estimation_tpu.ops import scm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.harness import stages

D = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 30
N_TRAIN, N_VAL, SNR, NB = 60_000, 2_000, 10.0, 2

t0 = time.time()
h, t = stages.generate_channels(jax.random.PRNGKey(0), N_TRAIN + N_VAL,
                                scm.ScmConfig(D, 1), chunk=4096)
h_train = stages.tree_slice(h, 0, N_TRAIN)
h_val = stages.tree_slice(h, N_TRAIN, N_TRAIN + N_VAL)
t_val = stages.tree_slice(t, N_TRAIN, N_TRAIN + N_VAL)
print(f"datagen {time.time()-t0:.1f}s", flush=True)

a = stages.pilot_matrix(D, 1, NB)
q = Q.design_quantizer(SNR, NB)
r = stages.observe(jax.random.PRNGKey(2), h_val, SNR, a, NB, q)


def evaluate(params):
    bank = stages.prepare_bank(params, SNR, a, NB, q)
    return stages.nmse(stages.estimate_auto(bank, r, "all"), h_val)


results = {}
# --- MFA, latent M = D//4 (the reference's latent_dim rule) -----------
mcfg = mfa.MfaConfig(n_components=K, latent_dim=D // 4, ppca=True,
                     zero_mean=True, max_iter=ITERS, tol=0.0,
                     chunk_size=4096)
t0 = time.time()
mfit = stages.mfa_fit(jax.random.PRNGKey(1), h_train, mcfg)
dt_mfa = time.time() - t0
params_mfa = stages.mfa_to_gmm(mfit.params, 1e-6)
results["mfa"] = (dt_mfa, evaluate(params_mfa))
print(f"MFA  fit {dt_mfa:6.1f}s ({int(mfit.n_iter)} iters, latent {D//4}) "
      f"mse={results['mfa'][1]:.4f}", flush=True)

# --- full-covariance GMM at the same shape ----------------------------
gcfg = gmm.GmmConfig(n_components=K, zero_mean=True, max_iter=ITERS,
                     tol=0.0, chunk_size=4096)
t0 = time.time()
gfit = stages.gmm_fit(jax.random.PRNGKey(1), h_train, gcfg)
dt_gmm = time.time() - t0
results["gmm"] = (dt_gmm, evaluate(gfit.params))
print(f"GMM  fit {dt_gmm:6.1f}s ({int(gfit.n_iter)} iters) "
      f"mse={results['gmm'][1]:.4f}", flush=True)

# --- genie bound (chunked at large D) ----------------------------------
mse_gen = stages.chunked_genie_nmse(r, t_val, h_val, SNR, a, NB, q)

print(f"D={D} K={K} @10dB {NB}-bit: "
      f"mfa={results['mfa'][1]:.4f} ({results['mfa'][0]:.1f}s) "
      f"gmm={results['gmm'][1]:.4f} ({results['gmm'][0]:.1f}s) "
      f"genie={mse_gen:.4f} | mfa fit speedup "
      f"{results['gmm'][0]/results['mfa'][0]:.2f}x", flush=True)
