"""Quantized-EM iteration cost: diag vs full covariance type (TPU).

The diag path accumulates only per-dim moments + bin-occupancy counts —
no (K, D, D) Grams — so its iteration should sit far below the full
path's ~31 ms at K=D=64 (PARITY_NOTES quantized-EM decomposition).

Usage: python tools/quant_diag_bench.py [K] [D] [N]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax


def main():
    from quantized_channel_estimation_tpu.harness import stages
    from quantized_channel_estimation_tpu.models import gmm, gmm_quant
    from quantized_channel_estimation_tpu.ops import quantizer as Q
    from quantized_channel_estimation_tpu.ops import scm
    from quantized_channel_estimation_tpu.ops.boundary import cjit

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    snr, n_bits = 5.0, 2
    sigma2 = 10.0 ** (-snr / 10.0)

    key = jax.random.PRNGKey(0)
    h, _ = stages.generate_channels(key, n, scm.ScmConfig(d, 1))
    a = stages.pilot_matrix(d, 1, n_bits)
    q = Q.design_quantizer(snr, n_bits)
    r = stages.observe(jax.random.fold_in(key, 1), h, snr, a, n_bits, q)

    fit_fn = cjit(lambda kk, rr, c: (lambda res: (res.lower_bound,
                                                  res.n_iter))(
        gmm_quant.fit(kk, rr, c, n_bits, sigma2, q)), static_argnums=(2,))

    for cov_type, iters in (("full", 20), ("diag", 20)):
        cfg = gmm.GmmConfig(n_components=k, cov_type=cov_type,
                            zero_mean=True, max_iter=iters, tol=0.0,
                            chunk_size=4096)
        lb, it = fit_fn(key, r, cfg)  # compile + warm
        runs = []
        for rep in range(5):
            t0 = time.perf_counter()
            lb, it = fit_fn(jax.random.fold_in(key, rep), r, cfg)
            lb = float(lb)
            runs.append(time.perf_counter() - t0)
        med = sorted(runs)[len(runs) // 2]
        print(f"{cov_type:5s}: median {med:.3f}s / {int(it)} iters = "
              f"{med / int(it) * 1000:.1f} ms/iter (lb={lb:.3f}) "
              f"runs={[f'{t:.2f}' for t in runs]}", flush=True)


if __name__ == "__main__":
    main()
