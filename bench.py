"""Headline benchmark: GMM-Bussgang channel estimates per second on one chip.

Standard config (reference `Bussgang_GMM.py:34-52`): N=64 antennas, K=64
components, 1 pilot, 2-bit uniform quantizer, zero-mean full-covariance bank,
'all' component weighting.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference implementation's `Gmm_nbit.estimate_from_y` measured
on this machine's CPU (tools/measure_reference_baseline.py, 2026-08-17):
201.05 estimates/s.

Notes:
  - The component bank is built from synthetic Hermitian-PSD covariances of
    the exact benchmark shapes (K=64, D=64): estimation throughput is
    independent of how the bank was trained, and this keeps the bench free of
    EM compile time on the remote TPU runtime. EM training itself is covered
    by the harness benchmarks and the test suite.
  - All stages are cjit-wrapped (ops.boundary): complex data crosses stage
    boundaries as packed (re, im) reals — the TPU runtime has no complex
    buffer type. Completion is forced by a real-scalar readback per repeat
    (an honest barrier over the remote-execution tunnel).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_ESTIMATES_PER_SEC = 201.05

N_ANT = 64
K_COMP = 64
N_BITS = 2
SNR_DB = 10.0
BATCH = 16384
REPEATS = 20


def log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    from quantized_channel_estimation_tpu.models import gmm_estimator
    from quantized_channel_estimation_tpu.models.gmm import GmmParams
    from quantized_channel_estimation_tpu.ops import linalg, observation, pilots
    from quantized_channel_estimation_tpu.ops import quantizer as Q
    from quantized_channel_estimation_tpu.ops.boundary import cjit
    from quantized_channel_estimation_tpu.ops.cplx import crandn

    def make_params(key):
        ka, kw = jax.random.split(key)
        a = crandn(ka, (K_COMP, N_ANT, N_ANT))
        covs = a @ jnp.conj(jnp.swapaxes(a, -1, -2)) / N_ANT \
            + jnp.eye(N_ANT, dtype=a.dtype)
        # normalize to unit average antenna power like SCM channels
        tr = jnp.real(jnp.trace(covs, axis1=-2, axis2=-1))[:, None, None]
        covs = covs * (N_ANT / tr).astype(covs.dtype)
        prec = linalg.robust_precision_cholesky(covs)
        w = jnp.ones((K_COMP,), jnp.float32) / K_COMP
        means = jnp.zeros((K_COMP, N_ANT), covs.dtype)
        return GmmParams(w, means, covs, prec)

    log("building bank")
    params = cjit(make_params)(jax.random.PRNGKey(0))
    a = cjit(pilots.pilot_matrix, static_argnums=(0, 1, 2, 3))(
        N_ANT, 1, N_BITS, "angle_amp")
    q = Q.design_quantizer(SNR_DB, N_BITS)
    prep = cjit(gmm_estimator.prepare_bank, static_argnums=(3,))
    bank = prep(params, SNR_DB, a, N_BITS, q)
    log("bank prepared")

    def gen_obs(key):
        h = crandn(key, (BATCH, N_ANT))
        return observation.observe(jax.random.fold_in(key, 1), h, SNR_DB,
                                   None, N_BITS, q)

    r = cjit(gen_obs)(jax.random.PRNGKey(1))
    log("observations generated")

    est_sum = cjit(lambda b, x: jnp.sum(jnp.abs(
        gmm_estimator.estimate(b, x, "all", 4096))))
    roll = cjit(lambda x, i: jax.tree_util.tree_map(
        lambda v: jnp.roll(v, i, axis=0), x))

    rolls = [roll(r, i) for i in range(REPEATS)]
    warm = float(est_sum(bank, rolls[0]))  # compile + honest execution
    assert warm > 0 and jnp.isfinite(warm), warm
    log(f"warmup done (sum={warm:.3e})")

    t0 = time.perf_counter()
    acc = 0.0
    for rr in rolls:
        acc += float(est_sum(bank, rr))  # scalar readback forces completion
    dt = time.perf_counter() - t0
    assert acc > 0

    rate = BATCH * REPEATS / dt
    vs = rate / REFERENCE_ESTIMATES_PER_SEC
    print(json.dumps({
        "metric": "gmm_bussgang_estimates_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "estimates/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
