"""Structured (FFT-domain) prepared banks vs the dense estimator, on-chip.

Round-4 VERDICT item 1: the dense estimation path at D>=512 is
compute-bound at ~90% of the f32 ceiling (BASELINE.md D=1024 row:
0.24 M est/s, ~134 MFLOP/estimate), so the only remaining lever is FLOP
reduction — which the circulant eigendomain delivers: O(K D + D log D)
per estimate instead of O(K D^2), and a K*D-float bank instead of
K*(M^2 + D*M).

Three legs:
  1. D=64 standard-config parity: circulant fit, dense vs structured MSE
     (must agree to ~1e-4 relative in MSE) + throughput both paths.
  2. D=1024 circulant fit (cheap: diagonal EM in the DFT domain) —
     exact structured quality + the headline throughput/prep comparison.
  3. D=1024 toeplitz fit (segmented, the BASELINE.md configuration) —
     the Frobenius-best circulant approximation's MSE delta vs the dense
     Toeplitz bank, measured not assumed.

Usage: python tools/structured_bank_bench.py [leg ...]  (default: all)
"""
import os
import sys
import time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp

from quantized_channel_estimation_tpu.estimators import pallas_kernels as pk
from quantized_channel_estimation_tpu.harness import stages
from quantized_channel_estimation_tpu.models import (
    em_driver, gmm, gmm_estimator, structured_bank as sb)
from quantized_channel_estimation_tpu.ops import observation, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.ops.boundary import cjit
from quantized_channel_estimation_tpu.ops.cplx import crandn

SNR, NB = 10.0, 2
prepare_circ = cjit(sb.prepare_bank_circulant, static_argnums=(3,))
estimate_circ = cjit(sb.estimate_circulant, static_argnums=(2, 3, 4))
spectra_of = cjit(sb.spectra_from_params)


def median_time(fn, *args, reps=5):
    warm = float(fn(*args))
    assert warm == warm, "NaN from timed function"
    times = []
    for _ in range(reps):
        s = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - s)
    return sorted(times)[reps // 2]


def throughput(label, est_fn, bank, rb, batch, inner=5):
    """Median est/s with the roll trick (forces `inner` distinct executions
    inside one program) and an honest scalar readback barrier."""
    def run_all(b, x):
        def one(i):
            xr = jax.tree_util.tree_map(lambda v: jnp.roll(v, i, axis=0), x)
            return jnp.sum(jnp.abs(est_fn(b, xr)))
        return jnp.sum(jax.lax.map(one, jnp.arange(inner)))
    rj = cjit(run_all)
    dt = median_time(rj, bank, rb)
    rate = batch * inner / dt
    print(f"  {label:24s} {rate/1e6:8.3f} M est/s", flush=True)
    return rate


def gen_obs(key, batch, d, q):
    def gen(k):
        hh = crandn(k, (batch, d))
        return observation.observe(jax.random.fold_in(k, 1), hh, SNR, None,
                                   NB, q)
    return cjit(gen)(key)


def leg_d64():
    print("== leg 1: D=64 standard config, circulant fit ==", flush=True)
    d, k, n_train, n_val = 64, 64, 100_000, 10_000
    h, t = stages.generate_channels(jax.random.PRNGKey(0), n_train + n_val,
                                    scm.ScmConfig(d, 1))
    h_train = stages.tree_slice(h, 0, n_train)
    h_val = stages.tree_slice(h, n_train, n_train + n_val)
    cfg = gmm.GmmConfig(n_components=k, cov_type="circulant", chunk_size=4096)
    t0 = time.time()
    fit = stages.gmm_fit(jax.random.PRNGKey(1), h_train, cfg)
    print(f"  circulant fit {time.time()-t0:.1f}s ({int(fit.n_iter)} iters)",
          flush=True)
    a = stages.pilot_matrix(d, 1, NB)
    q = Q.design_quantizer(SNR, NB)
    r = stages.observe(jax.random.PRNGKey(2), h_val, SNR, a, NB, q)
    bank_d = stages.prepare_bank(fit.params, SNR, a, NB, q)
    bank_s = prepare_circ(fit.params, SNR, a, NB, q)
    h_dense = stages.estimate(bank_d, r, "all", 2048)
    h_struct = estimate_circ(bank_s, r)
    mse_d = stages.nmse(h_dense, h_val)
    mse_s = stages.nmse(h_struct, h_val)
    print(f"  NMSE dense={mse_d:.5f} structured={mse_s:.5f} "
          f"(rel delta {abs(mse_s-mse_d)/mse_d:.2e})", flush=True)
    batch = 131_072
    rb = gen_obs(jax.random.PRNGKey(3), batch, d, q)
    if jax.default_backend() == "tpu":
        throughput("dense kernel (fused)",
                   lambda b, x: pk.estimate_fused(b, x), bank_d, rb, batch)
    throughput("dense einsum",
               lambda b, x: gmm_estimator.estimate(b, x, "all", 4096),
               bank_d, rb, batch)
    throughput("structured (FFT)",
               lambda b, x: sb.estimate_circulant(b, x, "all", 16384),
               bank_s, rb, batch)


def _large_d_common(d, k, fit, label):
    a = stages.pilot_matrix(d, 1, NB)
    q = Q.design_quantizer(SNR, NB)
    n_val = 2000
    hv, tv = stages.generate_channels(jax.random.PRNGKey(7), n_val,
                                      scm.ScmConfig(d, 1), chunk=1024)
    r = stages.observe(jax.random.PRNGKey(2), hv, SNR, a, NB, q)
    t0 = time.time()
    bank_d = stages.prepare_bank(fit.params, SNR, a, NB, q)
    float(jnp.sum(jnp.abs(bank_d.log_weights)))
    prep_dense = time.time() - t0
    t0 = time.time()
    spec = spectra_of(fit.params)
    bank_s = prepare_circ(fit.params, SNR, a, NB, q)
    float(jnp.sum(jnp.abs(bank_s.log_weights)))
    prep_struct = time.time() - t0
    h_dense = stages.estimate(bank_d, r, "all", 1024)
    h_struct = estimate_circ(bank_s, r)
    mse_d = stages.nmse(h_dense, hv)
    mse_s = stages.nmse(h_struct, hv)
    mse_gen = stages.chunked_genie_nmse(r, tv, hv, SNR, a, NB, q)
    print(f"  [{label}] NMSE dense={mse_d:.5f} structured={mse_s:.5f} "
          f"genie={mse_gen:.5f}  (struct/dense {mse_s/mse_d:.4f})",
          flush=True)
    print(f"  [{label}] prepare: dense {prep_dense:.2f}s vs structured "
          f"{prep_struct:.2f}s (incl. spectra extraction + compiles)",
          flush=True)
    batch = 16_384
    rb = gen_obs(jax.random.PRNGKey(3), batch, d, q)
    r_d = throughput("dense einsum",
                     lambda b, x: gmm_estimator.estimate(b, x, "all", 1024),
                     bank_d, rb, batch)
    r_k = 0.0
    if jax.default_backend() == "tpu":
        r_k = throughput("dense kernel (chunked)",
                         lambda b, x: pk.estimate_fused(b, x), bank_d, rb,
                         batch)
    r_s = throughput("structured (FFT)",
                     lambda b, x: sb.estimate_circulant(b, x, "all", 16384),
                     bank_s, rb, batch)
    print(f"  [{label}] structured speedup: {r_s/max(r_d, r_k):.1f}x over "
          f"best dense", flush=True)


def leg_d1024_circ():
    print("== leg 2: D=1024, K=8, CIRCULANT fit (exact structured) ==",
          flush=True)
    d, k = 1024, 8
    gen_chunk = 1024
    h, t = stages.generate_channels(jax.random.PRNGKey(0), 60_000,
                                    scm.ScmConfig(d, 1), chunk=gen_chunk)
    cfg = gmm.GmmConfig(n_components=k, cov_type="circulant",
                        chunk_size=4096, max_iter=30)
    t0 = time.time()
    fit = stages.gmm_fit(jax.random.PRNGKey(1), h, cfg)
    print(f"  circulant fit {time.time()-t0:.1f}s ({int(fit.n_iter)} iters)",
          flush=True)
    _large_d_common(d, k, fit, "circ-fit")


def leg_d1024_toep(segments=6):
    print("== leg 3: D=1024, K=8, TOEPLITZ fit (circulant approximation "
          "delta) ==", flush=True)
    d, k = 1024, 8
    h, t = stages.generate_channels(jax.random.PRNGKey(0), 60_000,
                                    scm.ScmConfig(d, 1), chunk=1024)
    total_iters = 30
    per_seg = -(-total_iters // segments)
    cfg = gmm.GmmConfig(n_components=k, cov_type="toeplitz",
                        chunk_size=4096, max_iter=per_seg)
    t0 = time.time()
    fit = em_driver.fit_segmented(
        lambda: stages.gmm_fit(jax.random.PRNGKey(1), h, cfg),
        lambda prev: stages.gmm_fit_resume(
            prev.params, h, cfg._replace(max_iter=min(
                per_seg, total_iters - int(prev.n_iter)))),
        n_segments=segments, max_retries=2)
    print(f"  toeplitz fit {time.time()-t0:.1f}s ({int(fit.n_iter)} iters)",
          flush=True)
    _large_d_common(d, k, fit, "toep-fit")


if __name__ == "__main__":
    legs = sys.argv[1:] or ["d64", "d1024circ", "d1024toep"]
    for leg in legs:
        {"d64": leg_d64, "d1024circ": leg_d1024_circ,
         "d1024toep": leg_d1024_toep}[leg]()
