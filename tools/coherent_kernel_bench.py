"""Coherent estimation kernel vs einsum path on the real chip.

Measures (B, T, M) block-pooled joint estimation throughput for the new
in-VMEM-pooled Pallas kernel (`pallas_kernels.estimate_fused_coherent`)
against the chunked einsum path (`gmm_estimator.estimate_coherent`) and the
flat per-snapshot kernel (`estimate_fused`, the T=1 upper bound). Same
protocol as tools/kernel_bench.py: repeats inside one jitted program, one
scalar readback as the barrier, median of 3.

Usage: python tools/coherent_kernel_bench.py [n_blocks] [t_coh] [repeats]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

N_ANT = int(os.environ.get("CKB_D", 64))
K_COMP = int(os.environ.get("CKB_K", 64))
N_BITS = 2
SNR_DB = 10.0
N_BLOCKS = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
T_COH = int(sys.argv[2]) if len(sys.argv) > 2 else 4
REPEATS = int(sys.argv[3]) if len(sys.argv) > 3 else 10


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

    params = cjit(make_params)(jax.random.PRNGKey(0))
    a = cjit(pilots.pilot_matrix, static_argnums=(0, 1, 2, 3))(
        N_ANT, 1, N_BITS, "angle_amp")
    q = Q.design_quantizer(SNR_DB, N_BITS)
    bank = cjit(gmm_estimator.prepare_bank, static_argnums=(3,))(
        params, SNR_DB, a, N_BITS, q)

    def gen_obs(key):
        h = crandn(key, (N_BLOCKS * T_COH, N_ANT))
        r = observation.observe(jax.random.fold_in(key, 1), h, SNR_DB,
                                None, N_BITS, q)
        return r.reshape(N_BLOCKS, T_COH, N_ANT)

    rb = cjit(gen_obs)(jax.random.PRNGKey(1))

    def runner(est_fn):
        def run_all(b, x):
            def one(i):
                xr = jax.tree_util.tree_map(lambda v: jnp.roll(v, i, axis=0),
                                            x)
                return jnp.sum(jnp.abs(est_fn(b, xr)))
            return jnp.sum(jax.lax.map(one, jnp.arange(REPEATS)))
        return cjit(run_all)

    variants = [
        ("einsum_coherent", runner(
            lambda b, x: gmm_estimator.estimate_coherent(b, x, "all", 512))),
        ("kernel_coherent", runner(pk.estimate_fused_coherent)),
        ("kernel_flat_bound", runner(
            lambda b, x: pk.estimate_fused(
                b, x.reshape(-1, x.shape[-1])))),
    ]

    results = {}
    want = None
    for name, fn in variants:
        try:
            warm = float(fn(bank, rb))
            assert warm > 0 and jnp.isfinite(warm), (name, warm)
            if name == "einsum_coherent":
                want = warm
            elif name == "kernel_coherent" and want is not None:
                rel = abs(warm - want) / want
                assert rel < 1e-3, f"kernel/einsum sum mismatch rel={rel:.2e}"
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                total = float(fn(bank, rb))
                times.append(time.perf_counter() - t0)
                assert total > 0
            dt = sorted(times)[1]
        except Exception as e:
            print(f"{name:20s} FAILED: {str(e).splitlines()[0][:150]}",
                  flush=True)
            continue
        rate = N_BLOCKS * T_COH * REPEATS / dt
        results[name] = rate
        print(f"{name:20s} {rate/1e6:8.2f} M est/s  ({dt*1e3:7.1f} ms)",
              flush=True)
    if "kernel_coherent" in results and "einsum_coherent" in results:
        print(f"kernel/einsum speedup: "
              f"{results['kernel_coherent']/results['einsum_coherent']:.2f}x")


if __name__ == "__main__":
    main()
