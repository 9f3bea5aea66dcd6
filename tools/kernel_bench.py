"""Compare estimation-kernel variants on the real chip.

Same measurement protocol as bench.py (remote-execution tunnel: all repeats
inside one jitted program, one scalar readback as the barrier).

Usage: python tools/kernel_bench.py [batch] [repeats]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

N_ANT = 64
K_COMP = 64
N_BITS = 2
SNR_DB = 10.0
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 10


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
        h = crandn(key, (BATCH, N_ANT))
        return observation.observe(jax.random.fold_in(key, 1), h, SNR_DB,
                                   None, N_BITS, q)

    r = cjit(gen_obs)(jax.random.PRNGKey(1))

    def runner(est_fn, tile_n):
        def run_all(b, x):
            def one(i):
                xr = jax.tree_util.tree_map(lambda v: jnp.roll(v, i, axis=0), x)
                return jnp.sum(jnp.abs(est_fn(b, xr, tile_n=tile_n)))
            return jnp.sum(jax.lax.map(one, jnp.arange(REPEATS)))
        return cjit(run_all)

    import functools as ft
    variants = []
    for tile in (512, 1024, 2048):
        variants.append((f"karatsuba_t{tile}", runner(pk.estimate, tile)))
        variants.append((f"block_t{tile}", runner(pk.estimate_block, tile)))
    variants.append(("block_t4096", runner(pk.estimate_block, 4096)))
    for tile in (1024, 2048):
        for g in (2, 4):
            variants.append((
                f"blockg{g}_t{tile}",
                runner(ft.partial(pk.estimate_block_grouped, group=g), tile)))

    results = {}
    for name, fn in variants:
        try:
            warm = float(fn(bank, r))
            assert warm > 0 and jnp.isfinite(warm), (name, warm)
            times = []
            for _ in range(3):  # tunnel outliers only deflate -> take median
                t0 = time.perf_counter()
                total = float(fn(bank, r))
                times.append(time.perf_counter() - t0)
                assert total > 0
            dt = sorted(times)[1]
        except Exception as e:
            print(f"{name:20s} FAILED: {str(e).splitlines()[0][:120]}",
                  flush=True)
            continue
        rate = BATCH * REPEATS / dt
        results[name] = rate
        print(f"{name:20s} {rate/1e6:8.2f} M est/s  ({dt*1e3:7.1f} ms)",
              flush=True)

    best = max(results, key=results.get)
    print(f"best: {best} at {results[best]/1e6:.2f} M est/s")


if __name__ == "__main__":
    main()
