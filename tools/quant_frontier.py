"""CSI-FREE structured training at frontier D (round-5, VERDICT r4 item 5).

Trains a circulant GMM PURELY from 2-bit quantized pilots at D >= 1024
(16x+ the reference's 64-antenna array) — the quantized-EM covariance
recovery (`models/gmm_quant.py`, reference `cov_est_quant.py:31-88` /
`gmm_cplx_bussgang.py:104-119`) runs in the DFT eigendomain at O(N K D)
per iteration, so no dense D^2 statistics or D^3 factorization ever
exists — then serves the fitted bank through the FFT-domain structured
path and reports:

  - fit wall time (quantized circulant EM, one program),
  - NMSE vs the genie-BLMMSE anchor (chunked; true per-sample Toeplitz) and
    vs a CSI-TRAINED circulant fit on the same channels (the price of
    training without ground truth),
  - structured serving throughput (roll-loop amortized medians).

Usage: python tools/quant_frontier.py [D] [K]
Evidence recorded in BASELINE.md (round-5 frontier row).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

from quantized_channel_estimation_tpu.harness import stages
from quantized_channel_estimation_tpu.models import gmm, gmm_quant
from quantized_channel_estimation_tpu.models.gmm import GmmParams
from quantized_channel_estimation_tpu.models import structured_bank as sb
from quantized_channel_estimation_tpu.ops import observation, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.ops.boundary import cjit

D = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
N_TRAIN, N_VAL, SNR, NB = 60_000, 2_000, 10.0, 2
if D > 8192:
    # the pilot array + the EM scan's layout copies must CO-reside in the
    # 15.75 GB HBM (donation cannot alias across the layout change —
    # measured RESOURCE_EXHAUSTED at 60k x 16384); 40k rows is ~5x
    # oversampled for the K x D circulant parameters at K=8
    N_TRAIN = 40_000 if D <= 16384 else 20_000 if D <= 32768 else 10_000
MAX_ITER = 30

t0 = time.time()
# beyond D=8192 the fixed 512-row floor OOMs the SCM generator's
# angle-grid FFT temps (D=16384 measured 18.9 GB > 15.75 GB HBM) — scale
# the chunk down with D there (stages.auto_gen_chunk rationale)
GEN_CHUNK = int(os.environ.get(
    "QF_GEN_CHUNK",
    min(4096, max(512, (4096 * 256) // D)) if D <= 8192
    else stages.auto_gen_chunk(D)))
q = Q.design_quantizer(SNR, NB)
sigma2 = 10.0 ** (-SNR / 10.0)
obs = cjit(observation.observe, static_argnums=(4,))
# D >= 8192: holding BOTH the clean train channels and their genie rows
# (60k x D complex each) plus the quantized pilots exceeds HBM (the
# first D=8192 attempt OOM'd in the datagen concat) — but the CSI-free
# fit needs ONLY the quantized pilots, so STREAM them: generate + observe
# per slab, drop the clean channels; keep a small clean validation set.
STREAM = D >= 8192 or os.environ.get("QF_STREAM") == "1"
if STREAM:
    # library streamed-datagen entry (same folded-key schedule as the
    # recorded D=8192 run — bit-identical slabs)
    r_train, _ = stages.stream_quantized_pilots(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), N_TRAIN,
        scm.ScmConfig(D, 1), SNR, None, NB, q, gen_chunk=GEN_CHUNK)
    h_val, t_val = stages.generate_channels(
        jax.random.fold_in(jax.random.PRNGKey(0), 10_000), N_VAL,
        scm.ScmConfig(D, 1), chunk=GEN_CHUNK)
else:
    h, t = stages.generate_channels(jax.random.PRNGKey(0),
                                    N_TRAIN + N_VAL,
                                    scm.ScmConfig(D, 1), chunk=GEN_CHUNK)
    h_train = stages.tree_slice(h, 0, N_TRAIN)
    h_val = stages.tree_slice(h, N_TRAIN, N_TRAIN + N_VAL)
    t_val = stages.tree_slice(t, N_TRAIN, N_TRAIN + N_VAL)
    r_train = obs(jax.random.PRNGKey(1), h_train, SNR, None, NB, q)
print(f"datagen {time.time() - t0:.1f}s"
      + (" (streamed pilots)" if STREAM else ""), flush=True)
r_val = obs(jax.random.PRNGKey(2), h_val, SNR, None, NB, q)

# ---- CSI-free quantized circulant EM (the headline fit) ----
# D <= 1024: the default dense-recovery-then-project path (measured 5-9%
# better NMSE). Beyond: the spectra-native DFT-domain EM
# (`gmm_quant.fit_circulant_spectra`, O(N K D)/iter, no dense (K, D, D)
# anywhere — the dense path crashes the device there). QF_SPECTRA=1
# forces the spectra path at any D.
SPECTRA = D >= 2048 or STREAM or os.environ.get("QF_SPECTRA") == "1"
# D > 8192: a chunk that DIVIDES N_TRAIN (no _chunk pad — the padded
# (N, D) copy alone is 3.7 GB at D=16384) and donate r into the fit (it
# is not reused) so the scan's layout copies recycle the argument HBM.
EM_CHUNK = int(os.environ.get(
    "QF_CHUNK", 4096 if D <= 1024 else 1024 if D <= 8192
    else max(c for c in (1000, 500, 250, 100) if N_TRAIN % c == 0)))
qcfg = gmm.GmmConfig(n_components=K, cov_type="circulant",
                     max_iter=MAX_ITER, chunk_size=EM_CHUNK)
prep = cjit(lambda p, snr, nb, qq, spec: sb.prepare_bank_circulant(
    p, snr, 1.0 + 0.0j, nb, qq, spectra=spec), static_argnums=(2,))
t0 = time.time()
if SPECTRA:
    fit_s = cjit(gmm_quant.fit_circulant_spectra, static_argnums=(2, 3),
                 donate_argnums=(1,))(
        jax.random.PRNGKey(3), r_train, qcfg, NB, sigma2, q)
    n_it = int(np.asarray(fit_s.n_iter))
    fit_time = time.time() - t0
    lb = float(np.asarray(fit_s.lower_bound))
    dummy = stages.from_numpy(np.zeros((K, 1, 1), np.complex64))
    params_q = GmmParams(fit_s.weights, fit_s.means, dummy, dummy)
    bank_q = prep(params_q, SNR, NB, q, fit_s.spectra)
else:
    fit_q = stages.gmm_quant_fit(jax.random.PRNGKey(3), r_train, qcfg, NB,
                                 sigma2, q)
    n_it = int(np.asarray(fit_q.n_iter))
    fit_time = time.time() - t0
    lb = float(np.asarray(fit_q.lower_bound))
    bank_q = prep(fit_q.params, SNR, NB, q, None)
print(f"CSI-free circulant fit{' (spectra-native)' if SPECTRA else ''}: "
      f"{fit_time:.1f}s / {n_it} iters (lb={lb:.4f})", flush=True)

est = cjit(lambda b, rr: sb.estimate_circulant(b, rr, "all", 2048),
           static_argnums=())
nmse_q = stages.nmse(est(bank_q, r_val), h_val)

# ---- CSI-trained reference fit on the same channels (its final densify
# is (K, D, D) — skipped where that is the thing that crashes) ----
nmse_c = float("nan")
if not SPECTRA:
    t0 = time.time()
    fit_c = stages.gmm_fit(jax.random.PRNGKey(3), h_train, qcfg)
    print(f"CSI-trained circulant fit: {time.time() - t0:.1f}s / "
          f"{int(np.asarray(fit_c.n_iter))} iters", flush=True)
    bank_c = prep(fit_c.params, SNR, NB, q, None)
    nmse_c = stages.nmse(est(bank_c, r_val), h_val)

t0 = time.time()
n_genie = N_VAL if D < 2048 else 512 if D < 4096 else \
    128 if D < 8192 else 0  # a D^3 Cholesky per row stops paying at 8192
print(f"NMSE CSI-free: {nmse_q:.5f} | CSI-trained: {nmse_c:.5f}",
      flush=True)
try:
    if n_genie == 0:
        raise RuntimeError("skipped")
    a_eye = cjit(lambda d: jnp.eye(d, dtype=jnp.complex64),
                 static_argnums=(0,))(D)
    nmse_genie = stages.chunked_genie_nmse(
        stages.tree_slice(r_val, 0, n_genie),
        stages.tree_slice(t_val, 0, n_genie),
        stages.tree_slice(h_val, 0, n_genie), SNR, a_eye, NB, q,
        max_bytes=1 << 28 if D < 4096 else 1 << 27)
    print(f"genie anchor: {nmse_genie:.5f} [{n_genie} rows] "
          f"({time.time() - t0:.0f}s)", flush=True)
except Exception as e:  # the B x D^3 anchor is the one dense eval here
    print(f"genie anchor unavailable at D={D}: {type(e).__name__}",
          flush=True)

# ---- structured serving throughput (roll-loop amortized; the batch is
# tiled well past the ~25 ms tunnel dispatch floor) ----
REPEATS = 5
B_SRV = max(N_VAL, min(131072, (1 << 25) // D))
tile = cjit(lambda x, reps: jnp.tile(x, (reps, 1))[:B_SRV],
            static_argnums=(1,))
r_srv = tile(r_val, -(-B_SRV // N_VAL))


def run_all(b, x):
    def one(i):
        xr = jax.tree_util.tree_map(lambda v: jnp.roll(v, i, axis=0), x)
        return jnp.sum(jnp.abs(sb.estimate_circulant(b, xr, "all", 2048)))
    return jnp.sum(jax.lax.map(one, jnp.arange(REPEATS)))


run_j = cjit(run_all)
assert float(np.asarray(run_j(bank_q, r_srv))) > 0
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    assert float(np.asarray(run_j(bank_q, r_srv))) > 0
    ts.append(time.perf_counter() - t0)
dt = sorted(ts)[len(ts) // 2]
rate = B_SRV * REPEATS / dt
print(f"structured serving: {rate / 1e6:.3f} M est/s "
      f"(D={D}, K={K}, batch {B_SRV})", flush=True)
