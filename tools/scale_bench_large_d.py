"""Large-antenna-array scale-up evidence (D beyond the reference's 64).

Generates SCM channels at dimension D, fits a K-component GMM (structured
covariance optional), and compares GMM-Bussgang MSE against genie-BLMMSE at
10 dB / 2-bit, plus estimation throughput through the split-K chunked
kernel vs the einsum path. Measured (v5e, 2026-08-19), D=256 (4x the
reference's standard array):

  K=16 full:      gmm 0.0536 vs genie 0.0399 (1.35x), kernel 3.4 M est/s
  K=32 full:      gmm 0.0470 vs genie 0.0395 (1.19x)
  K=64 full:      gmm 0.0458 vs genie 0.0387 (1.18x) - K is not the gap
  K=32 toeplitz:  gmm 0.0444 vs genie 0.0395 (1.12x) - structure is
  (kernel 2.25-3.4 M est/s = 2.3-3.1x einsum at this dimension)

D=512 (8x), K=16 toeplitz, 6 segments (2026-08-19): gmm 0.0511 vs genie
0.0402 (1.27x); fit 637 s / 30 iters incl. per-segment compiles;
estimation 0.41 M est/s with fused(chunked) == einsum (HBM-bound, bank
no longer VMEM-resident).

D=1024 (16x), K=8 toeplitz, 6 segments (2026-08-20): gmm 0.0591 vs genie
0.0400 (1.48x); datagen 11 s, fit 422 s / 30 iters; estimation
0.24 M est/s (einsum == chunked; ~134 MFLOP/estimate = ~32 TFLOP/s,
~90% of the f32 ceiling — fully compute-bound). The first attempt died in
the RESUME program's remote compile ("response body closed"), which is
why the segmented fit here passes max_retries=2.

Usage: python tools/scale_bench_large_d.py [D] [K] [cov_type] [segments]
(segments > 1 runs the fit as that many bounded executions through
em_driver.fit_segmented — needed at D=512, where a monolithic fit is one
multi-minute program execution.)
"""
import os
import sys
import time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from quantized_channel_estimation_tpu.estimators import blmmse, pallas_kernels as pk
from quantized_channel_estimation_tpu.models import em_driver, gmm, gmm_estimator
from quantized_channel_estimation_tpu.ops import observation, pilots, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.harness import stages
from quantized_channel_estimation_tpu.ops.boundary import cjit

D = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = int(sys.argv[2]) if len(sys.argv) > 2 else 32
COV = sys.argv[3] if len(sys.argv) > 3 else "toeplitz"
SEGS = int(sys.argv[4]) if len(sys.argv) > 4 else 1
N_TRAIN, N_VAL, SNR, NB = 60_000, 2_000, 10.0, 2
t0 = time.time()
# datagen memory scales with the 100x-oversampled PSD lattice (chunk, 100 D):
# 4096 rows up to D=256 (the long-standing footprint), shrinking
# proportionally beyond so the per-chunk lattice bytes stay ~constant
GEN_CHUNK = min(4096, max(512, (4096 * 256) // D))
h, t = stages.generate_channels(jax.random.PRNGKey(0), N_TRAIN + N_VAL,
                                scm.ScmConfig(D, 1), chunk=GEN_CHUNK)
h_train = stages.tree_slice(h, 0, N_TRAIN)
h_val = stages.tree_slice(h, N_TRAIN, N_TRAIN + N_VAL)
t_val = stages.tree_slice(t, N_TRAIN, N_TRAIN + N_VAL)
print(f"datagen {time.time()-t0:.1f}s", flush=True)

TOTAL_ITERS = 30
PER_SEG = -(-TOTAL_ITERS // SEGS)
cfg = gmm.GmmConfig(n_components=K, max_iter=PER_SEG,
                    chunk_size=4096, cov_type=COV)
t0 = time.time()
if SEGS == 1:
    fit = stages.gmm_fit(jax.random.PRNGKey(1), h_train, cfg)
else:
    # cap each resumed segment at the remaining budget so the total stays
    # exactly TOTAL_ITERS when SEGS does not divide it
    n_segments = -(-TOTAL_ITERS // PER_SEG)  # can be < SEGS (ceil rounding)
    fit = em_driver.fit_segmented(
        lambda: stages.gmm_fit(jax.random.PRNGKey(1), h_train, cfg),
        lambda prev: stages.gmm_fit_resume(
            prev.params, h_train, cfg._replace(max_iter=min(
                PER_SEG, TOTAL_ITERS - int(prev.n_iter)))),
        n_segments=n_segments,
        max_retries=2)  # the remote compile service drops large programs
print(f"fit {time.time()-t0:.1f}s "
      f"({n_segments if SEGS > 1 else 1} segments): {int(fit.n_iter)} iters "
      f"lb={float(fit.lower_bound):.3f}", flush=True)

a = stages.pilot_matrix(D, 1, NB)
q = Q.design_quantizer(SNR, NB)
r = stages.observe(jax.random.PRNGKey(2), h_val, SNR, a, NB, q)
bank = stages.prepare_bank(fit.params, SNR, a, NB, q)
h_gmm = stages.estimate_auto(bank, r, "all")
mse_gmm = stages.nmse(h_gmm, h_val)
mse_gen = stages.chunked_genie_nmse(r, t_val, h_val, SNR, a, NB, q)
print(f"D={D} K={K} {COV} @10dB 2-bit: gmm={mse_gmm:.4f} genie={mse_gen:.4f} "
      f"(ratio {mse_gmm/mse_gen:.3f})", flush=True)

# estimation throughput through the split-K chunked kernel vs einsum
BATCH, REPS = 32768, 5
def gen_obs(key):
    from quantized_channel_estimation_tpu.ops.cplx import crandn
    hh = crandn(key, (BATCH, D))
    return observation.observe(jax.random.fold_in(key, 1), hh, SNR, None, NB, q)
rb = cjit(gen_obs)(jax.random.PRNGKey(3))
for name, fn in {
    "fused(chunked)": lambda b, x: pk.estimate_fused(b, x),
    "einsum": lambda b, x: gmm_estimator.estimate(b, x, "all", 4096),
}.items():
    def run_all(b, x, fn=fn):
        def one(i):
            xr = jax.tree_util.tree_map(lambda v: jnp.roll(v, i, axis=0), x)
            return jnp.sum(jnp.abs(fn(b, xr)))
        return jnp.sum(jax.lax.map(one, jnp.arange(REPS)))
    rj = cjit(run_all)
    warm = float(rj(bank, rb)); assert warm > 0
    times = []
    for _ in range(5):
        s = time.perf_counter(); float(rj(bank, rb)); times.append(time.perf_counter()-s)
    dt = sorted(times)[2]
    print(f"{name:16s} {BATCH*REPS/dt/1e6:7.2f} M est/s", flush=True)
