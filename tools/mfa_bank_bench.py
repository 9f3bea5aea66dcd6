"""Factored (low-rank+diagonal) MFA banks vs the dense estimator, on-chip.

Round-4 follow-on to the circulant-bank campaign: the MFA family was the
last model whose structure was exploited only at FIT time (factored-Woodbury
E-step) and abandoned at estimation (serving densified via
`mfa.to_gmm_params` — K dense D^3 Cholesky prepare, O(K D^2) bank,
O(N K D^2) estimation, mirroring the reference `mofa_cplx_bussgang.py:117-216`).
`models/mfa_bank.py` keeps the Woodbury form end to end: O(K D M) bank,
O(N K D M) estimation — a D/(2M)-fold FLOP reduction that grows with D.

Legs:
  1. d64:   D=64, K=64, M=16 MFA fit on SCM channels at the standard
            config — NMSE parity (factored must equal dense to f32
            rounding) + throughput of dense kernel / dense einsum /
            factored.
  2. d512:  D=512, K=16, M=32 — mid-range: prepare-time and throughput
            comparison where the D/(2M) factor is 8x.
  3. d2048: D=2048, K=8, M=32 — frontier: the dense prepare pays K D^3
            Cholesky + K D^2 filters; the factored prepare only M x M
            factorizations (D/(2M) = 32x FLOP reduction per estimate).

Usage: python tools/mfa_bank_bench.py [leg ...]   (default: d64 d512)
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
    gmm_estimator, mfa, mfa_bank as mb)
from quantized_channel_estimation_tpu.ops import observation, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.ops.boundary import cjit
from quantized_channel_estimation_tpu.ops.cplx import crandn

SNR, NB = 10.0, 2
prepare_fact = cjit(mb.prepare_bank_factored, static_argnums=(3,))
estimate_fact = cjit(mb.estimate_factored, static_argnums=(2, 3, 4))


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
    """Median est/s with the roll trick (forces `inner` distinct
    executions inside one program) and an honest scalar readback."""
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


def bank_bytes(bank):
    return sum(int(x.size) * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(bank))


def run_leg(d, k, m, n_train, n_val, batch, label, n_path=2,
            dense_kernel=False, dense=True, max_iter=60):
    print(f"== {label}: D={d}, K={k}, M={m} MFA fit ==", flush=True)
    # generation chunk shrinks with D (the SCM coloring peaks at
    # chunk x D^2 intermediates; same rule as tools/structured_frontier.py)
    h, t = stages.generate_channels(jax.random.PRNGKey(0), n_train + n_val,
                                    scm.ScmConfig(d, n_path),
                                    chunk=max(128, (4096 * 256) // d))
    h_train = stages.tree_slice(h, 0, n_train)
    h_val = stages.tree_slice(h, n_train, n_train + n_val)
    cfg = mfa.MfaConfig(n_components=k, latent_dim=m, zero_mean=True,
                        max_iter=max_iter, chunk_size=4096)
    t0 = time.time()
    fit = stages.mfa_fit(jax.random.PRNGKey(1), h_train, cfg)
    print(f"  mfa fit {time.time()-t0:.1f}s ({int(fit.n_iter)} iters, "
          f"ll {float(fit.log_likelihood):.1f})", flush=True)
    a = stages.pilot_matrix(d, 1, NB)
    q = Q.design_quantizer(SNR, NB)
    r = stages.observe(jax.random.PRNGKey(2), h_val, SNR, a, NB, q)

    t0 = time.time()
    bank_f = prepare_fact(fit.params, SNR, a, NB, q)
    float(jnp.sum(jnp.abs(bank_f.log_weights)))
    prep_fact = time.time() - t0
    h_fact = estimate_fact(bank_f, r, "all", 4096, "xla")
    mse_f = stages.nmse(h_fact, h_val)
    kernel_ok = (jax.default_backend() == "tpu"
                 and pk._fact_bank_bytes(d, k, m) <= 13 * 1024 * 1024)
    if kernel_ok:
        h_kern = estimate_fact(bank_f, r, "all", 4096, "kernel")
        mse_k = stages.nmse(h_kern, h_val)
        print(f"  NMSE factored kernel={mse_k:.5f} (vs xla {mse_f:.5f}, "
              f"rel delta {abs(mse_k-mse_f)/mse_f:.2e})", flush=True)

    if dense:
        t0 = time.time()
        gp = stages.mfa_to_gmm(fit.params, 1e-6)
        bank_d = stages.prepare_bank(gp, SNR, a, NB, q)
        float(jnp.sum(jnp.abs(bank_d.log_weights)))
        prep_dense = time.time() - t0
        h_dense = stages.estimate(bank_d, r, "all", min(2048, 16384 * 64 // d))
        mse_d = stages.nmse(h_dense, h_val)
        print(f"  NMSE dense={mse_d:.5f} factored={mse_f:.5f} "
              f"(rel delta {abs(mse_f-mse_d)/mse_d:.2e})", flush=True)
        print(f"  prepare: dense {prep_dense:.2f}s vs factored "
              f"{prep_fact:.2f}s (incl. compiles); bank bytes "
              f"dense {bank_bytes(bank_d)/1e6:.1f} MB vs factored "
              f"{bank_bytes(bank_f)/1e6:.1f} MB", flush=True)
    else:
        print(f"  NMSE factored={mse_f:.5f}; factored prepare "
              f"{prep_fact:.2f}s; bank {bank_bytes(bank_f)/1e6:.1f} MB "
              "(dense leg skipped)", flush=True)

    rb = gen_obs(jax.random.PRNGKey(3), batch, d, q)
    rates = {}
    if dense:
        rates["dense"] = throughput(
            "dense einsum",
            lambda b, x: gmm_estimator.estimate(
                b, x, "all", min(2048, 16384 * 64 // d)),
            bank_d, rb, batch)
        if dense_kernel and jax.default_backend() == "tpu":
            rates["kernel"] = throughput(
                "dense kernel (fused)",
                lambda b, x: pk.estimate_fused(b, x), bank_d, rb, batch)
    rates["factored"] = throughput(
        "factored (Woodbury, XLA)",
        lambda b, x: mb.estimate_factored(b, x, "all", 4096, "xla"),
        bank_f, rb, batch)
    if kernel_ok:
        rates["factored_kernel"] = throughput(
            "factored kernel (fused)",
            lambda b, x: pk.estimate_fused_factored(b, x),
            bank_f, rb, batch)
    if dense:
        best_dense = max(v for kk, v in rates.items()
                         if not kk.startswith("factored"))
        best_fact = max(v for kk, v in rates.items()
                        if kk.startswith("factored"))
        print(f"  [{label}] best factored speedup: "
              f"{best_fact/best_dense:.2f}x over best dense", flush=True)
    return rates


def leg_d64():
    run_leg(64, 64, 16, 100_000, 10_000, 131_072, "d64", n_path=2,
            dense_kernel=True)


def leg_d512():
    run_leg(512, 16, 32, 60_000, 2_000, 32_768, "d512", n_path=2)


def leg_d2048():
    run_leg(2048, 8, 32, 40_000, 2_000, 8_192, "d2048", n_path=2,
            max_iter=40)


def leg_d4096():
    """Frontier: the dense comparison leg is ATTEMPTED and its failure
    mode reported (the structured campaign measured the dense GMM prepare
    RESOURCE_EXHAUSTED at this size; the factored prepare is O(K D M))."""
    try:
        run_leg(4096, 4, 32, 40_000, 2_000, 4_096, "d4096", n_path=2,
                max_iter=30)
    except Exception as e:  # noqa: BLE001 - report the dense wall honestly
        print(f"  dense leg failed: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        print("  re-running factored-only", flush=True)
        run_leg(4096, 4, 32, 40_000, 2_000, 4_096, "d4096", n_path=2,
                max_iter=30, dense=False)


if __name__ == "__main__":
    legs = sys.argv[1:] or ["d64", "d512"]
    for leg in legs:
        {"d64": leg_d64, "d512": leg_d512, "d2048": leg_d2048,
         "d4096": leg_d4096}[leg]()
