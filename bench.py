"""Headline benchmark: GMM-Bussgang channel estimates per second on one chip.

Standard config (reference `Bussgang_GMM.py:34-52`): N=64 antennas, K=64
components, 1 pilot, 2-bit uniform quantizer, zero-mean full-covariance GMM,
'all' component weighting.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference implementation's `Gmm_nbit.estimate_from_y` measured
on this machine's CPU (see tools/measure_reference_baseline.py); value stored
in REFERENCE_ESTIMATES_PER_SEC below.
"""
import json
import time

import jax
import jax.numpy as jnp

# Reference CPU throughput (estimates/sec) for the same config, measured with
# tools/measure_reference_baseline.py on this machine. Updated when measured.
REFERENCE_ESTIMATES_PER_SEC = None  # set by measurement; None -> vs_baseline null

N_ANT = 64
K_COMP = 64
N_BITS = 2
SNR_DB = 10.0
BATCH = 16384
REPEATS = 20


def main():
    from quantized_channel_estimation_tpu.models import gmm, gmm_estimator
    from quantized_channel_estimation_tpu.ops import observation, pilots, scm
    from quantized_channel_estimation_tpu.ops import quantizer as Q

    key = jax.random.PRNGKey(0)
    h, _ = scm.generate_channels_chunked(key, 32768, scm.ScmConfig(N_ANT, 1))
    cfg = gmm.GmmConfig(n_components=K_COMP, max_iter=5, chunk_size=4096)
    params = gmm.fit(key, h, cfg).params

    a = pilots.pilot_matrix(N_ANT, 1, N_BITS)
    q = Q.design_quantizer(SNR_DB, N_BITS)
    r = observation.observe(jax.random.PRNGKey(1), h[:BATCH], SNR_DB, a,
                            N_BITS, q)
    bank = gmm_estimator.prepare_bank(params, SNR_DB, a, N_BITS, q)

    est = jax.jit(lambda b, x: gmm_estimator.estimate(b, x, "all", 4096))
    jax.block_until_ready(est(bank, r))  # compile + warm up

    t0 = time.perf_counter()
    for _ in range(REPEATS):
        out = est(bank, r)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    rate = BATCH * REPEATS / dt
    vs = (rate / REFERENCE_ESTIMATES_PER_SEC
          if REFERENCE_ESTIMATES_PER_SEC else None)
    print(json.dumps({
        "metric": "gmm_bussgang_estimates_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "estimates/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
