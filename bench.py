"""Headline benchmark: GMM-Bussgang channel estimates per second on one chip.

Standard config (reference `Bussgang_GMM.py:34-52`): N=64 antennas, K=64
components, 1 pilot, 2-bit uniform quantizer, zero-mean full-covariance bank,
'all' component weighting. Compute path: the fused Pallas estimation kernel
(estimators/pallas_kernels.py). The metric is held fixed at this
full-covariance config for cross-round comparability; circulant fits serve
~40-50% faster still through the round-4 structured kernel (21.2 M est/s
at K=64, 22.3 M at K=256; tools/circ_kernel_bench.py — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference implementation's `Gmm_nbit.estimate_from_y` measured
on this machine's CPU (tools/measure_reference_baseline.py, 2026-08-17):
201.05 estimates/s.

Measurement notes:
  - the TPU is reached through a remote-execution tunnel with ~28 ms
    round-trip latency and no reliable async barrier, so ALL repeats run
    inside one jitted program (lax.map over pre-rolled batches) and the
    single real-scalar readback at the end is the completion barrier;
  - complex data crosses jit boundaries as packed (re, im) reals
    (ops.boundary) — the TPU runtime has no complex buffer type.
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
BATCH = 131072
REPEATS = 10


def log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    from quantized_channel_estimation_tpu.estimators import pallas_kernels as pk
    from quantized_channel_estimation_tpu.models import gmm_estimator
    from quantized_channel_estimation_tpu.models.gmm import GmmParams
    from quantized_channel_estimation_tpu.ops import linalg, observation, pilots
    from quantized_channel_estimation_tpu.ops import quantizer as Q
    from quantized_channel_estimation_tpu.ops.boundary import cjit
    from quantized_channel_estimation_tpu.ops.cplx import crandn

    def make_params(key):
        ka, _ = jax.random.split(key)
        a = crandn(ka, (K_COMP, N_ANT, N_ANT))
        covs = a @ jnp.conj(jnp.swapaxes(a, -1, -2)) / N_ANT \
            + jnp.eye(N_ANT, dtype=a.dtype)
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
    bank = cjit(gmm_estimator.prepare_bank, static_argnums=(3,))(
        params, SNR_DB, a, N_BITS, q)

    def gen_obs(key):
        h = crandn(key, (BATCH, N_ANT))
        return observation.observe(jax.random.fold_in(key, 1), h, SNR_DB,
                                   None, N_BITS, q)

    r = cjit(gen_obs)(jax.random.PRNGKey(1))
    log("bank + observations ready")

    def run_all(b, x):
        # REPEATS distinct batches (rolled views), all inside one program;
        # the scalar sum forces every repeat's completion at one readback
        def one(i):
            xr = jax.tree_util.tree_map(lambda v: jnp.roll(v, i, axis=0), x)
            return jnp.sum(jnp.abs(pk.estimate_fused(b, xr)))
        return jnp.sum(jax.lax.map(one, jnp.arange(REPEATS)))

    run_j = cjit(run_all)
    warm = float(run_j(bank, r))
    assert warm > 0 and jnp.isfinite(warm), warm
    log(f"warmup done (sum={warm:.3e})")

    # the tunnel produces multi-second latency outliers (which can only
    # deflate the measured rate) -> report the median of 5 timed runs
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        total = float(run_j(bank, r))
        times.append(time.perf_counter() - t0)
        assert total > 0
    dt = sorted(times)[len(times) // 2]
    log(f"times: {[f'{t:.3f}' for t in times]} -> median {dt:.3f}s")

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
