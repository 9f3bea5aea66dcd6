"""Multi-chip scaling-efficiency benchmark (BASELINE target: >=80% on a
2-host pod slice; SURVEY §2.4 / §5 distributed design).

Measures weak-scaling efficiency of the two distributed paths over the
(data, component) mesh:

  - EM training: samples sharded over 'data', per-shard sufficient
    statistics psum'd (the EM analog of gradient all-reduce). Weak scaling:
    N_per_device held constant, so perfect scaling = flat wall-clock as
    devices grow.
  - Estimation: the request batch sharded over 'data' and the component
    bank over 'component'; partial estimates psum over 'component'.

On a single-chip machine this degenerates to a 1-device measurement and
prints only the absolute numbers; with more real devices
(`jax.device_count() > 1`) it sweeps device counts {1, 2, 4, ...} and
reports efficiency = t(1) / t(n) (weak scaling, per-device work fixed).
Run on a CPU host with XLA_FLAGS=--xla_force_host_platform_device_count=8
to validate the sweep mechanically (virtual devices share one CPU, so the
efficiency numbers are NOT meaningful there — the tool says so).

Usage: python tools/scaling_bench.py [n_per_device] [k_components]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def median_time(fn, reps=5):
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return sorted(runs)[len(runs) // 2]


def main():
    from quantized_channel_estimation_tpu.models import gmm, gmm_estimator
    from quantized_channel_estimation_tpu.ops import pilots
    from quantized_channel_estimation_tpu.ops import quantizer as Q
    from quantized_channel_estimation_tpu.parallel import mesh as pmesh
    from quantized_channel_estimation_tpu.utils.profiling import (
        force_completion)

    n_per_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    k_comp = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    d = 64
    n_bits, snr = 2, 10.0
    n_dev_total = jax.device_count()
    virtual = jax.default_backend() == "cpu"
    if virtual and n_dev_total > 1:
        print("NOTE: virtual CPU devices share one host CPU — efficiency "
              "numbers below are a mechanical validation only")

    counts = []
    c = 1
    while c <= n_dev_total:
        counts.append(c)
        c *= 2

    key = jax.random.PRNGKey(0)
    results = []
    for n_dev in counts:
        m = pmesh.make_mesh(n_dev, 1, devices=jax.devices()[:n_dev])
        n = n_per_dev * n_dev
        h = (jax.random.normal(key, (n, d)) +
             1j * jax.random.normal(jax.random.fold_in(key, 1), (n, d))
             ).astype(jnp.complex64)
        h = pmesh.shard_data(m, h)
        cfg = gmm.GmmConfig(n_components=k_comp, zero_mean=True,
                            max_iter=10, tol=0.0, init="random",
                            chunk_size=4096)

        def fit_once():
            r = pmesh.fit_gmm_shard_map(m, key, h, cfg)
            force_completion((r.lower_bound,))

        fit_once()  # compile
        t_fit = median_time(fit_once, reps=3)

        # collective/compute overlap: segment the statistics scan so each
        # segment's psum can ride behind the next segment's compute
        # (gmm.segmented_psum_scan). On >1 real chips this should close
        # most of the blocking-barrier gap; report both so the comparison
        # is ready the moment multi-chip hardware exists.
        cfg_ov = cfg._replace(psum_segments=4)

        def fit_overlap_once():
            r = pmesh.fit_gmm_shard_map(m, key, h, cfg_ov)
            force_completion((r.lower_bound,))

        fit_overlap_once()
        t_fit_ov = median_time(fit_overlap_once, reps=3)

        # estimation path: bank over 'component' needs n_comp shards; use a
        # (1, n_dev) mesh so the same devices shard K instead
        m2 = pmesh.make_mesh(1, n_dev, devices=jax.devices()[:n_dev])
        fitres = pmesh.fit_gmm_shard_map(m, key, h, cfg)
        a = pilots.pilot_matrix(d, 1, n_bits)
        q = Q.design_quantizer(snr, n_bits)
        bank = gmm_estimator.prepare_bank(fitres.params, snr, a, n_bits, q)
        bank = pmesh.shard_bank(m2, bank)
        r_batch = jnp.ones((4096, d), jnp.complex64)

        def est_once():
            out = pmesh.estimate_sharded(m2, bank, r_batch, "all",
                                         chunk_size=2048)
            force_completion((jnp.sum(jnp.abs(out)),))

        est_once()
        t_est = median_time(est_once, reps=3)

        # tensor-parallel stats-kernel path: each device runs the Pallas
        # stats kernel on its K-shard (einsum stats mirror off-TPU), shards
        # merge with pmax + psum over 'component'
        def est_tp_once():
            out = pmesh.estimate_sharded_kernel(m2, bank, r_batch,
                                                chunk_size=2048)
            force_completion((jnp.sum(jnp.abs(out)),))

        est_tp_once()
        t_tp = median_time(est_tp_once, reps=3)
        results.append((n_dev, t_fit, t_fit_ov, t_est, t_tp))
        print(f"devices={n_dev}: EM 10 iters (N={n} total, weak) "
              f"{t_fit:.3f}s blocking-psum / {t_fit_ov:.3f}s "
              f"pipelined-psum(4); estimation (4096 reqs) GSPMD "
              f"{t_est:.3f}s / TP-kernel {t_tp:.3f}s", flush=True)

    t1_fit, t1_fit_ov, t1_est, t1_tp = results[0][1:]
    for n_dev, t_fit, t_fit_ov, t_est, t_tp in results[1:]:
        print(f"weak-scaling efficiency @ {n_dev} devices: "
              f"EM {100 * t1_fit / t_fit:.0f}% blocking / "
              f"{100 * t1_fit_ov / t_fit_ov:.0f}% pipelined "
              f"(target >= 80%), estimation speedup "
              f"GSPMD {t1_est / t_est:.2f}x / TP-kernel {t1_tp / t_tp:.2f}x")
    if len(results) == 1:
        print("single device: no efficiency to report "
              "(need jax.device_count() > 1 real chips)")


if __name__ == "__main__":
    main()
