"""Measure speed AND estimation-MSE impact of in-kernel GEMM precision.

Fits a real GMM on SCM channels (TPU), prepares banks at moderate/high SNR,
then compares the grouped block kernel with full-f32 passes vs single-pass
bf16-multiply (Precision.DEFAULT) against the einsum path, on both channel
MSE and throughput. High SNR is the precision-critical regime (near-singular
arcsine/Bussgang covariances).

Usage: python tools/kernel_precision_experiment.py
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
N_TRAIN = 50_000
N_VAL = 65_536
REPEATS = 10


def main():
    from quantized_channel_estimation_tpu.estimators import pallas_kernels as pk
    from quantized_channel_estimation_tpu.models import gmm, gmm_estimator
    from quantized_channel_estimation_tpu.ops import observation, pilots, scm
    from quantized_channel_estimation_tpu.ops import quantizer as Q
    from quantized_channel_estimation_tpu.ops.boundary import cjit

    key = jax.random.PRNGKey(7)
    gen = cjit(scm.generate_channels, static_argnums=(1, 2))
    h = gen(key, N_TRAIN + N_VAL, scm.ScmConfig(N_ANT, 1))[0]
    take = cjit(lambda hh, a, b: jax.tree_util.tree_map(
        lambda x: x[a:b], hh), static_argnums=(1, 2))
    h_train = take(h, 0, N_TRAIN)
    h_val = take(h, N_TRAIN, N_TRAIN + N_VAL)

    cfg = gmm.GmmConfig(n_components=K_COMP, max_iter=40, chunk_size=16384)
    t0 = time.time()
    params = cjit(lambda k, hh, c: gmm.fit(k, hh, c).params,
                  static_argnums=(2,))(jax.random.PRNGKey(1), h_train, cfg)
    print(f"# fit done in {time.time()-t0:.1f}s", flush=True)

    a = cjit(pilots.pilot_matrix, static_argnums=(0, 1, 2, 3))(
        N_ANT, 1, N_BITS, "angle_amp")

    mse_fn = cjit(lambda hh, ee: jnp.sum(jnp.abs(hh - ee) ** 2)
                  / (N_VAL * N_ANT))

    for snr in (10.0, 20.0):
        q = Q.design_quantizer(snr, N_BITS)
        bank = cjit(gmm_estimator.prepare_bank, static_argnums=(3,))(
            params, snr, a, N_BITS, q)
        r = cjit(observation.observe, static_argnums=(4,))(
            jax.random.PRNGKey(2), h_val, snr, a, N_BITS, q)

        paths = {
            "einsum_f32": lambda b, x: gmm_estimator.estimate(
                b, x, "all", 16384),
            "kernel_f32": lambda b, x: pk.estimate_block_grouped(
                b, x, tile_n=2048, group=4),
            "kernel_bf16x1": lambda b, x: pk.estimate_block_grouped(
                b, x, tile_n=2048, group=4,
                precision=jax.lax.Precision.DEFAULT),
        }
        for name, fn in paths.items():
            est = cjit(fn)(bank, r)
            mse = float(mse_fn(h_val, est))

            # timing: repeats inside one program, scalar readback barrier
            def run_all(b, x, fn=fn):
                def one(i):
                    xr = jax.tree_util.tree_map(
                        lambda v: jnp.roll(v, i, axis=0), x)
                    return jnp.sum(jnp.abs(fn(b, xr)))
                return jnp.sum(jax.lax.map(one, jnp.arange(REPEATS)))
            rj = cjit(run_all)
            warm = float(rj(bank, r))
            assert warm > 0, warm
            times = []
            for _ in range(3):  # median: tunnel outliers only deflate
                t0 = time.perf_counter()
                tot = float(rj(bank, r))
                times.append(time.perf_counter() - t0)
            dt = sorted(times)[1]
            rate = N_VAL * REPEATS / dt / 1e6
            print(f"snr={snr:4.0f}  {name:14s} mse={mse:.6f} "
                  f"rate={rate:8.2f} M/s", flush=True)


if __name__ == "__main__":
    main()
