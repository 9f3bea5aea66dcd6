"""Measure bf16 hi/lo split-GEMM kernel modes: speed AND estimation MSE.

Motivation: Mosaic runs float32 in-kernel dots at full f32 passes regardless
of the precision arg (PARITY_NOTES.md), and the grouped kernel already
sustains ~63 TFLOP/s at K=D=64 — at/near the f32 pass-count roofline. The
only remaining MXU lever is fewer passes: 'bf16' (1 pass, accuracy-rejected)
bounds the ceiling, 'split3' (3 passes, hi·hi + hi·lo + lo·hi, ~2^-16
relative error) targets f32-like accuracy at possibly fewer effective
passes, 'split2' drops the sample low bits (2 passes).

Real SCM-fit bank, 2-bit, SNR 10/20 dB (high SNR = precision-critical
regime). Usage: python tools/kernel_split_bench.py
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
N_VAL = 131_072
REPEATS = 10


def main():
    from quantized_channel_estimation_tpu.estimators import pallas_kernels as pk
    from quantized_channel_estimation_tpu.models import gmm, gmm_estimator
    from quantized_channel_estimation_tpu.ops import observation, pilots, scm
    from quantized_channel_estimation_tpu.ops import quantizer as Q
    from quantized_channel_estimation_tpu.ops.boundary import cjit

    from quantized_channel_estimation_tpu.harness import stages

    key = jax.random.PRNGKey(7)
    # chunked: one-shot generation of 181k channels OOMs HBM (the 100x
    # oversampled PSD intermediate is ~5 GB per plane at this batch)
    h = stages.generate_channels(key, N_TRAIN + N_VAL,
                                 scm.ScmConfig(N_ANT, 1), chunk=32768)[0]
    h_train = stages.tree_slice(h, 0, N_TRAIN)
    h_val = stages.tree_slice(h, N_TRAIN, N_TRAIN + N_VAL)

    cfg = gmm.GmmConfig(n_components=K_COMP, max_iter=40, chunk_size=16384)
    t0 = time.time()
    params = cjit(lambda k, hh, c: gmm.fit(k, hh, c).params,
                  static_argnums=(2,))(jax.random.PRNGKey(1), h_train, cfg)
    print(f"# fit done in {time.time()-t0:.1f}s", flush=True)

    a = cjit(pilots.pilot_matrix, static_argnums=(0, 1, 2, 3))(
        N_ANT, 1, N_BITS, "angle_amp")

    mse_fn = cjit(lambda hh, ee: jnp.sum(jnp.abs(hh - ee) ** 2)
                  / (N_VAL * N_ANT))

    import functools as ft
    for snr in (10.0, 20.0):
        q = Q.design_quantizer(snr, N_BITS)
        bank = cjit(gmm_estimator.prepare_bank, static_argnums=(3,))(
            params, snr, a, N_BITS, q)
        r = cjit(observation.observe, static_argnums=(4,))(
            jax.random.PRNGKey(2), h_val, snr, a, N_BITS, q)

        paths = {}
        for mode in ("f32", "bf16", "split3", "split2"):
            paths[f"kernel_{mode}"] = ft.partial(
                pk.estimate_block_grouped, tile_n=2048, group=4, mode=mode)
        for name, fn in paths.items():
            est = cjit(fn)(bank, r)
            mse = float(mse_fn(h_val, est))

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
            for _ in range(5):  # median: tunnel outliers only deflate
                t0 = time.perf_counter()
                tot = float(rj(bank, r))
                times.append(time.perf_counter() - t0)
            dt = sorted(times)[len(times) // 2]
            rate = N_VAL * REPEATS / dt / 1e6
            print(f"snr={snr:4.0f}  {name:14s} mse={mse:.6f} "
                  f"rate={rate:8.2f} M/s", flush=True)


if __name__ == "__main__":
    main()
