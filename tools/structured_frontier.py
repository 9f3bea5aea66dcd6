"""Frontier-array scale through the structured bank: D=2048/4096 (32x/64x
the reference's array).

The dense path's per-sample O(K D^2) work and O(K D^2) bank made D=1024 the
practical ceiling (BASELINE.md: 0.24 M est/s at ~90% of the f32 ceiling).
The FFT-domain bank removes both walls: O(K D) bank, O(K D + D log D) per
sample. This tool fits a circulant GMM at D (diagonal EM in the DFT domain
— also cheap), compares dense-vs-structured NMSE on held-out channels, and
measures estimation throughput both ways.

Usage: python tools/structured_frontier.py [D] [K]   (default 2048 8)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from quantized_channel_estimation_tpu.harness import stages
from quantized_channel_estimation_tpu.models import (
    gmm, gmm_estimator, structured_bank as sb)
from quantized_channel_estimation_tpu.ops import observation, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.ops.boundary import cjit
from quantized_channel_estimation_tpu.ops.cplx import crandn

D = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N_TRAIN = int(os.environ.get("FRONTIER_NTRAIN", 60_000))
N_VAL, SNR, NB = 2_000, 10.0, 2

t0 = time.time()
gen_chunk = max(128, (4096 * 256) // D)
h, t = stages.generate_channels(jax.random.PRNGKey(0), N_TRAIN + N_VAL,
                                scm.ScmConfig(D, 1), chunk=gen_chunk)
h_train = stages.tree_slice(h, 0, N_TRAIN)
h_val = stages.tree_slice(h, N_TRAIN, N_TRAIN + N_VAL)
print(f"datagen {time.time()-t0:.1f}s", flush=True)

cfg = gmm.GmmConfig(n_components=K, cov_type="circulant", chunk_size=2048,
                    max_iter=30)
t0 = time.time()
fit = stages.gmm_fit(jax.random.PRNGKey(1), h_train, cfg)
print(f"circulant fit {time.time()-t0:.1f}s ({int(fit.n_iter)} iters)",
      flush=True)

a = stages.pilot_matrix(D, 1, NB)
q = Q.design_quantizer(SNR, NB)
r = stages.observe(jax.random.PRNGKey(2), h_val, SNR, a, NB, q)

t0 = time.time()
bank_s = cjit(sb.prepare_bank_circulant, static_argnums=(3,))(
    fit.params, SNR, a, NB, q)
float(jnp.sum(jnp.abs(bank_s.log_weights)))
print(f"structured prepare {time.time()-t0:.1f}s", flush=True)
est_s = cjit(sb.estimate_circulant, static_argnums=(2, 3, 4))
mse_s = stages.nmse(est_s(bank_s, r), h_val)

bank_d = None
try:
    t0 = time.time()
    bank_d = stages.prepare_bank(fit.params, SNR, a, NB, q)
    float(jnp.sum(jnp.abs(bank_d.log_weights)))
    print(f"dense prepare {time.time()-t0:.1f}s", flush=True)
    mse_d = stages.nmse(stages.estimate(bank_d, r, "all", 512), h_val)
    print(f"D={D} K={K} @10dB 2-bit: NMSE structured={mse_s:.5f} "
          f"dense={mse_d:.5f}", flush=True)
except Exception as e:  # the point, at large D: dense does not fit
    bank_d = None
    print(f"D={D} K={K} @10dB 2-bit: NMSE structured={mse_s:.5f}; "
          f"dense bank INFEASIBLE on one chip "
          f"({type(e).__name__}: {str(e)[:80]})", flush=True)

BATCH, INNER = 8192, 5


def gen_obs(key):
    hh = crandn(key, (BATCH, D))
    return observation.observe(jax.random.fold_in(key, 1), hh, SNR, None,
                               NB, q)


rb = cjit(gen_obs)(jax.random.PRNGKey(3))
for name, fn in {
    "structured (FFT)": lambda b, x: sb.estimate_circulant(b, x, "all",
                                                           8192),
    "dense einsum": lambda b, x: gmm_estimator.estimate(b, x, "all", 512),
}.items():
    bank = bank_s if name.startswith("structured") else bank_d
    if bank is None:
        print(f"  {name:18s} (skipped: bank infeasible)", flush=True)
        continue

    def run_all(b, x, fn=fn):
        def one(i):
            xr = jax.tree_util.tree_map(lambda v: jnp.roll(v, i, axis=0), x)
            return jnp.sum(jnp.abs(fn(b, xr)))
        return jnp.sum(jax.lax.map(one, jnp.arange(INNER)))

    rj = cjit(run_all)
    float(rj(bank, rb))
    ts = []
    for _ in range(5):
        s = time.perf_counter()
        float(rj(bank, rb))
        ts.append(time.perf_counter() - s)
    dt = sorted(ts)[2]
    print(f"  {name:18s} {BATCH*INNER/dt/1e6:7.3f} M est/s", flush=True)
