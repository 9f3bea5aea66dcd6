"""Serving latency/throughput benchmark for the EstimationService.

Closed-loop load test of the continuous-batching front-end (serving.py):
N client threads submit fixed-size estimation requests at a handful of
SNRs as fast as responses return, for a fixed duration. Reports per-
request latency percentiles (p50/p90/p99) and sustained throughput in
estimates/s, as one JSON line.

The service path is the production one — per-SNR prepared banks, padded
power-of-two microbatches, the fused Pallas kernel on TPU ('all' mode) —
and every latency sample includes the real host readback (asnumpy), per
the honest-barrier rule. On this environment the TPU sits behind a remote
tunnel whose RTT dominates small-batch latency and has multi-second
outliers; p50 is the robust figure, p99 characterizes the tunnel.

Bank statistical quality is irrelevant to serving speed, so the GMM
parameters are synthetic random PSD covariances at the headline shape
(K=64, D=64, 2-bit) — no training run needed.

Usage: python tools/serving_bench.py [--duration 20] [--clients 8]
       [--req-size 64] [--cpu]
"""
import argparse
import json
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def synthetic_circulant_params(k: int, d: int, seed: int = 0):
    """Random CIRCULANT-covariance GmmParams (host numpy): C = F^H diag(s) F.
    The structured service only reads weights/means/covariances (spectra are
    re-extracted exactly), so prec_chol is a zero placeholder."""
    from quantized_channel_estimation_tpu.models.gmm import GmmParams
    rng = np.random.default_rng(seed)
    spec = rng.uniform(0.2, 2.0, (k, d)).astype(np.float32)
    f = np.fft.fft(np.eye(d)) / np.sqrt(d)
    covs = np.einsum("df,kf,fe->kde", f.conj().T, spec, f,
                     optimize=True).astype(np.complex64)  # F^H diag(s) F
    weights = np.full((k,), 1.0 / k, np.float32)
    means = np.zeros((k, d), np.complex64)
    prec = np.zeros((k, d, d), np.complex64)
    return GmmParams(weights, means, covs, prec)


def synthetic_params(k: int, d: int, seed: int = 0):
    """Random PSD-covariance GmmParams as HOST numpy arrays.

    The axon TPU runtime has no complex buffer type at program boundaries;
    params must enter device programs only through the service's cjit
    packing, so everything here stays numpy (precision Cholesky included)."""
    from quantized_channel_estimation_tpu.models.gmm import GmmParams
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((k, d, d)) + 1j * rng.standard_normal((k, d, d))
    covs = (a @ a.conj().transpose(0, 2, 1) / d
            + np.eye(d)[None]).astype(np.complex64)
    weights = np.full((k,), 1.0 / k, np.float32)
    means = np.zeros((k, d), np.complex64)
    # P = (L^{-1})^H, upper triangular — the repo's precision-cholesky
    # convention (linalg.prec_from_chol)
    l = np.linalg.cholesky(covs)
    linv = np.stack([np.linalg.solve(lk, np.eye(d)) for lk in l])
    prec = np.ascontiguousarray(
        linv.conj().transpose(0, 2, 1)).astype(np.complex64)
    return GmmParams(weights, means, covs, prec)


def synthetic_mfa_params(k: int, d: int, latent: int, seed: int = 0):
    """Random MfaParams (host numpy) for the `from_mfa` serving path."""
    from quantized_channel_estimation_tpu.models.mfa import MfaParams
    rng = np.random.default_rng(seed)
    lam = (rng.standard_normal((k, d, latent))
           + 1j * rng.standard_normal((k, d, latent))).astype(np.complex64)
    lam /= np.sqrt(2.0 * latent)
    psis = rng.uniform(0.2, 1.0, (k, d)).astype(np.float32)
    weights = np.full((k,), 1.0 / k, np.float32)
    means = np.zeros((k, d), np.complex64)
    return MfaParams(weights, means, lam, psis)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--req-size", type=int, default=64,
                    help="snapshots per request (blocks*T with --coherence)")
    ap.add_argument("--n-antennas", type=int, default=64)
    ap.add_argument("--n-components", type=int, default=64)
    ap.add_argument("--n-bits", type=int, default=2)
    ap.add_argument("--max-batch", type=int, default=1024)
    ap.add_argument("--coherence", type=int, default=1,
                    help="T>1 submits (blocks, T, M) coherence-block "
                         "requests through the block-pooled joint path")
    ap.add_argument("--mfa", action="store_true",
                    help="back the service with an MFA prior via "
                         "EstimationService.from_mfa (densified on the "
                         "host CPU backend)")
    ap.add_argument("--latent", type=int, default=16)
    ap.add_argument("--structured", action="store_true",
                    help="serve through the FFT-domain circulant bank "
                         "(round-4 structured path)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from quantized_channel_estimation_tpu.serving import EstimationService

    d = args.n_antennas
    t_coh = max(1, args.coherence)
    if args.req_size % t_coh:
        ap.error(f"--req-size {args.req_size} must divide by "
                 f"--coherence {t_coh}")
    a = np.eye(d, dtype=np.complex64)
    if args.mfa:
        mfa_params = synthetic_mfa_params(args.n_components, d, args.latent)
        # densification (to_gmm_params) runs complex linalg; pin it to the
        # CPU backend — the axon TPU runtime has no complex buffers at
        # program boundaries and the service's cjit handles the TPU side
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            svc = EstimationService.from_mfa(mfa_params, a, args.n_bits,
                                             max_batch=args.max_batch)
            svc.params = jax.tree_util.tree_map(np.asarray, svc.params)
    elif args.structured:
        params = synthetic_circulant_params(args.n_components, d)
        svc = EstimationService(params, a, args.n_bits, structured=True,
                                max_batch=args.max_batch)
    else:
        params = synthetic_params(args.n_components, d)
        svc = EstimationService(params, a, args.n_bits,
                                max_batch=args.max_batch)
    snrs = [-5.0, 5.0, 15.0]
    rng = np.random.default_rng(1)

    def shape_req(x):
        if t_coh > 1:
            return x.reshape(args.req_size // t_coh, t_coh, d)
        return x

    def make_req():
        x = (rng.standard_normal((args.req_size, d))
             + 1j * rng.standard_normal((args.req_size, d)))
        return shape_req(x.astype(np.complex64))

    # warm up every (snr, microbatch-size) program the load can hit: client
    # requests coalesce to anything from one request up to clients*req_size,
    # padded to powers of two — submit each padded size once per SNR so no
    # compile lands inside the measured window (remote compiles can exceed
    # the clients' submit timeout and would silently kill their threads)
    print("warmup (compiles)...", flush=True)
    t0 = time.perf_counter()
    cap = 1 << max(4, args.max_batch.bit_length() - 1)
    top = min(cap, args.clients * args.req_size)
    sizes, s = [], 1 << max(4, (args.req_size - 1).bit_length())
    while s <= top:
        # block requests must carry whole T-blocks: round each warmup size
        # down to a multiple of t_coh (a T that doesn't divide the power of
        # two, e.g. T=3, would otherwise fail the reshape below even though
        # the service itself supports it)
        rounded = s - s % t_coh if t_coh > 1 else s
        if rounded and rounded not in sizes:
            sizes.append(rounded)
        s *= 2
    for snr in snrs:
        for size in sizes:
            x = (rng.standard_normal((size, d))
                 + 1j * rng.standard_normal((size, d))).astype(np.complex64)
            if t_coh > 1:
                x = x.reshape(size // t_coh, t_coh, d)
            svc.submit(x, snr, timeout=600.0)
            print(f"  warmed snr={snr} n={size} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
    print(f"warmup done in {time.perf_counter() - t0:.1f}s", flush=True)

    latencies = []
    counts = [0]
    lat_lock = threading.Lock()
    stop = threading.Event()

    def client(i):
        r = make_req()
        j = 0
        while not stop.is_set():
            snr = snrs[(i + j) % len(snrs)]
            t0 = time.perf_counter()
            out = svc.submit(r, snr, timeout=120.0)
            dt = time.perf_counter() - t0
            assert out.shape == r.shape, (out.shape, r.shape)
            with lat_lock:
                latencies.append(dt)
                counts[0] += args.req_size
            j += 1

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(args.clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(args.duration)
    stop.set()
    for t in threads:
        t.join(timeout=60)
    elapsed = time.perf_counter() - t_start

    svc.close()
    if not latencies:
        print(json.dumps({"error": "no request completed in the window",
                          "clients": args.clients}))
        sys.exit(1)
    lat = np.sort(np.asarray(latencies)) * 1000.0
    result = {
        "requests": int(len(lat)),
        "estimates_per_s": round(counts[0] / elapsed, 1),
        "p50_ms": round(float(np.percentile(lat, 50)), 2),
        "p90_ms": round(float(np.percentile(lat, 90)), 2),
        "p99_ms": round(float(np.percentile(lat, 99)), 2),
        "clients": args.clients,
        "req_size": args.req_size,
        "coherence": t_coh,
        "bank": ("mfa" if args.mfa else "structured" if args.structured else "gmm"),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    # second line: the service's SELF-reported view (round-4 metrics
    # surface) — lets operators cross-check the external harness
    sm = svc.metrics()
    print(json.dumps({"service_metrics": {
        k: sm[k] for k in ("requests_completed", "estimates_served",
                           "requests_shed", "microbatches",
                           "bank_cache_misses", "latency_p50_s",
                           "latency_p99_s")}}))


if __name__ == "__main__":
    main()
