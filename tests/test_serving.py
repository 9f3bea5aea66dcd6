"""Continuous-batching estimation service."""
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_channel_estimation_tpu import serving
from quantized_channel_estimation_tpu.models import gmm, gmm_estimator
from quantized_channel_estimation_tpu.ops import observation, pilots, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q

N_ANT = 16


@pytest.fixture(scope="module")
def service_setup():
    key = jax.random.PRNGKey(60)
    h, _ = scm.generate_channels(key, 6000, scm.ScmConfig(N_ANT, 1))
    fit = gmm.fit(jax.random.PRNGKey(61), h[:5000],
                  gmm.GmmConfig(n_components=4, max_iter=10, chunk_size=2048))
    a = pilots.pilot_matrix(N_ANT, 1, 2)
    return fit.params, a, h[5000:]


def test_single_request_matches_direct(service_setup):
    params, a, h_val = service_setup
    snr = 5.0
    q = Q.design_quantizer(snr, 2)
    r = observation.observe(jax.random.PRNGKey(62), h_val[:100], snr, a, 2, q)
    r_np = np.asarray(r)

    svc = serving.EstimationService(params, a, 2, max_delay_ms=1.0)
    try:
        got = svc.submit(r_np, snr)
        bank = gmm_estimator.prepare_bank(params, snr, a, 2, q)
        want = np.asarray(gmm_estimator.estimate(bank, r, "all"))
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        svc.close()


def test_bank_cache_lru_bounded(service_setup):
    """A client sweeping many distinct SNRs must not grow bank memory
    without bound: the per-SNR cache is LRU-capped at max_banks, and
    nearby float SNRs snap to one grid point (serving.py VERDICT item 6)."""
    params, a, h_val = service_setup
    q = Q.design_quantizer(5.0, 2)
    r = np.asarray(observation.observe(jax.random.PRNGKey(65), h_val[:8],
                                       5.0, a, 2, q))
    svc = serving.EstimationService(params, a, 2, max_delay_ms=0.5,
                                    max_banks=3, snr_step_db=0.1)
    try:
        for snr in (0.0, 2.0, 4.0, 6.0, 8.0, 10.0):
            svc.submit(r, snr)
        assert len(svc._banks) == 3
        # most-recent SNRs survive, oldest evicted
        assert 10.0 in svc._banks and 0.0 not in svc._banks
        # snapping: 5.97/6.03 dB share the 6.0 bank (no new entry)
        n_before = len(svc._banks)
        keys_before = set(svc._banks)
        svc.submit(r, 6.03)
        svc.submit(r, 5.97)
        assert len(svc._banks) == n_before
        assert set(svc._banks) == keys_before
    finally:
        svc.close()


def test_queue_backpressure_sheds_load(service_setup):
    """Past the max_queue high-water mark submit() raises
    ServiceOverloadedError instead of queueing unboundedly."""
    params, a, h_val = service_setup
    q = Q.design_quantizer(5.0, 2)
    r = np.asarray(observation.observe(jax.random.PRNGKey(66), h_val[:64],
                                       5.0, a, 2, q))
    # long delay + tiny queue: the loop holds requests while we overfill
    svc = serving.EstimationService(params, a, 2, max_delay_ms=10_000.0,
                                    max_batch=1 << 20, max_queue=100)
    try:
        svc_errors = []
        threads = [threading.Thread(
            target=lambda: svc.submit(r, 5.0, timeout=30.0))
            for _ in range(1)]
        for t in threads:
            t.start()
        # first 64 samples queued; the next 64 would exceed 100
        import time as _time
        _time.sleep(0.05)
        with pytest.raises(serving.ServiceOverloadedError):
            svc.submit(r, 5.0)
        # drain: shrink the delay so the pending request completes and the
        # queue frees up again
        svc.max_delay = 0.001
        for t in threads:
            t.join(timeout=30)
        _time.sleep(0.05)
        got = svc.submit(r, 5.0)  # accepted again after the drain
        assert got.shape == (64, N_ANT)
        assert not svc_errors
    finally:
        svc.close()


def test_pallas_path_matches_direct(service_setup):
    """use_pallas=True routes through the fused kernel (interpret on CPU)."""
    params, a, h_val = service_setup
    snr = 5.0
    q = Q.design_quantizer(snr, 2)
    r = observation.observe(jax.random.PRNGKey(64), h_val[:64], snr, a, 2, q)
    svc = serving.EstimationService(params, a, 2, max_delay_ms=1.0,
                                    use_pallas=True)
    try:
        got = svc.submit(np.asarray(r), snr)
        bank = gmm_estimator.prepare_bank(params, snr, a, 2, q)
        want = np.asarray(gmm_estimator.estimate(bank, r, "all"))
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        svc.close()


def test_concurrent_requests_coalesce(service_setup):
    params, a, h_val = service_setup
    snr = 10.0
    q = Q.design_quantizer(snr, 2)
    r = observation.observe(jax.random.PRNGKey(63), h_val[:320], snr, a, 2, q)
    r_np = np.asarray(r)
    svc = serving.EstimationService(params, a, 2, max_delay_ms=20.0)
    results = {}

    def worker(i):
        results[i] = svc.submit(r_np[i * 32:(i + 1) * 32], snr)

    try:
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(30)
        bank = gmm_estimator.prepare_bank(params, snr, a, 2, q)
        want = np.asarray(gmm_estimator.estimate(bank, r, "all"))
        for i in range(10):
            np.testing.assert_allclose(results[i], want[i * 32:(i + 1) * 32],
                                       atol=1e-4)
    finally:
        svc.close()


def test_oversized_request_microbatched(service_setup):
    """A single request larger than max_batch is processed in bounded
    power-of-two microbatches (no arbitrarily large one-off XLA program)
    and still returns correct results."""
    params, a, h_val = service_setup
    snr = 5.0
    q = Q.design_quantizer(snr, 2)
    r = observation.observe(jax.random.PRNGKey(65), h_val[:700], snr, a, 2, q)
    r_np = np.asarray(r)

    svc = serving.EstimationService(params, a, 2, max_batch=256,
                                    max_delay_ms=1.0)
    try:
        got = svc.submit(r_np, snr, timeout=60)
        bank = gmm_estimator.prepare_bank(params, snr, a, 2, q)
        want = np.asarray(gmm_estimator.estimate(bank, r, "all"))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        svc.close()


def test_malformed_request_fails_alone(service_setup):
    """Shape validation happens in submit(): a bad request raises there and
    cannot poison co-batched requests; a 1-D vector is rejected instead of
    being misread as per-row requests."""
    params, a, h_val = service_setup
    svc = serving.EstimationService(params, a, 2, max_delay_ms=1.0)
    try:
        with pytest.raises(ValueError, match="shape"):
            svc.submit(np.ones((4, 8), np.complex64), 5.0)  # wrong M
        with pytest.raises(ValueError, match="shape"):
            svc.submit(np.ones((N_ANT,), np.complex64), 5.0)  # 1-D
        # a valid request still works after the rejections
        q = Q.design_quantizer(5.0, 2)
        r = observation.observe(jax.random.PRNGKey(66), h_val[:8], 5.0,
                                a, 2, q)
        out = svc.submit(np.asarray(r), 5.0)
        assert out.shape == (8, N_ANT)
    finally:
        svc.close()


def test_pallas_with_ineligible_selection_mode_rejected(service_setup):
    """Selection modes the fused kernels cannot compute (float
    cumulative-p, k >= K) must be refused instead of silently returning
    'all' results; int top-k within eligibility is served (round-5,
    `test_serving_topk_kernel_mode`)."""
    params, a, _ = service_setup
    with pytest.raises(ValueError, match="mode"):
        serving.EstimationService(params, a, 2, use_pallas=True, mode=0.9)
    with pytest.raises(ValueError, match="mode"):
        # K=4 fit: k=4 == K is the 'all' combine, not a selection
        serving.EstimationService(params, a, 2, use_pallas=True, mode=4)


def test_flush_errors_propagate_to_clients(service_setup):
    """A failing compute path must raise in submit(), not time out."""
    params, a, h_val = service_setup
    svc = serving.EstimationService(params, a, 2, max_delay_ms=1.0)
    svc._estimate = lambda *args: (_ for _ in ()).throw(ValueError("boom"))
    try:
        with pytest.raises(RuntimeError):
            svc.submit(np.asarray(h_val[:8]), 5.0, timeout=10)
    finally:
        svc.close()


def test_mfa_backed_service(service_setup):
    """The service takes any GmmParams — an MFA prior serves through the
    identical bank machinery after `to_gmm_params` densification."""
    _, a, h_val = service_setup
    from quantized_channel_estimation_tpu.models import mfa

    key = jax.random.PRNGKey(65)
    h, _ = scm.generate_channels(key, 4000, scm.ScmConfig(N_ANT, 1))
    fit = mfa.fit(jax.random.PRNGKey(66), h,
                  mfa.MfaConfig(n_components=4, latent_dim=4, zero_mean=True,
                                max_iter=10, chunk_size=2000))
    params = mfa.to_gmm_params(fit.params)
    snr = 5.0
    q = Q.design_quantizer(snr, 2)
    r_np = np.asarray(observation.observe(jax.random.PRNGKey(67),
                                          h_val[:64], snr, a, 2, q))
    svc = serving.EstimationService(params, a, 2, max_delay_ms=1.0)
    try:
        got = svc.submit(r_np, snr)
        bank = gmm_estimator.prepare_bank(params, snr, a, 2, q)
        want = np.asarray(gmm_estimator.estimate(bank, r_np, "all"))
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        svc.close()


def test_coherent_request_matches_direct(service_setup):
    """A (n, T, M) block request routes through block-pooled joint
    estimation and returns (n, T, D) — the flagship coherence capability
    reaching the production path (round-2 VERDICT item 1)."""
    params, a, h_val = service_setup
    snr, t = 0.0, 4
    q = Q.design_quantizer(snr, 2)
    r = observation.observe(jax.random.PRNGKey(70), h_val[:96], snr, a, 2, q)
    rb = np.asarray(r).reshape(24, t, -1)
    svc = serving.EstimationService(params, a, 2, max_delay_ms=1.0)
    try:
        got = svc.submit(rb, snr)
        bank = gmm_estimator.prepare_bank(params, snr, a, 2, q)
        want = np.asarray(gmm_estimator.estimate_coherent(
            bank, jax.numpy.asarray(rb), "all"))
        assert got.shape == rb.shape[:2] + (N_ANT,)
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        svc.close()


def test_coherent_pallas_path_matches_direct(service_setup):
    """use_pallas=True serves blocks through the fused coherent kernel
    (interpret on CPU) with identical results."""
    params, a, h_val = service_setup
    snr, t = 5.0, 4
    q = Q.design_quantizer(snr, 2)
    r = observation.observe(jax.random.PRNGKey(71), h_val[:64], snr, a, 2, q)
    rb = np.asarray(r).reshape(16, t, -1)
    svc = serving.EstimationService(params, a, 2, max_delay_ms=1.0,
                                    use_pallas=True)
    try:
        got = svc.submit(rb, snr)
        bank = gmm_estimator.prepare_bank(params, snr, a, 2, q)
        want = np.asarray(gmm_estimator.estimate_coherent(
            bank, jax.numpy.asarray(rb), "all"))
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        svc.close()


def test_mixed_t_requests_isolated(service_setup):
    """Flat, T=2 and T=4 requests at one SNR are queued separately (a block
    is never co-batched with a different T) and each result matches its
    direct path."""
    params, a, h_val = service_setup
    snr = 5.0
    q = Q.design_quantizer(snr, 2)
    r = observation.observe(jax.random.PRNGKey(72), h_val[:64], snr, a, 2, q)
    r_np = np.asarray(r)
    bank = gmm_estimator.prepare_bank(params, snr, a, 2, q)
    svc = serving.EstimationService(params, a, 2, max_delay_ms=10.0)
    results = {}

    def worker(name, arr):
        results[name] = svc.submit(arr, snr)

    try:
        jobs = {"flat": r_np[:16],
                "t2": r_np[:32].reshape(16, 2, -1),
                "t4": r_np[:64].reshape(16, 4, -1)}
        threads = [threading.Thread(target=worker, args=(n, v))
                   for n, v in jobs.items()]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=30)
        np.testing.assert_allclose(
            results["flat"],
            np.asarray(gmm_estimator.estimate(bank, jobs["flat"], "all")),
            atol=1e-4)
        for name in ("t2", "t4"):
            want = np.asarray(gmm_estimator.estimate_coherent(
                bank, jax.numpy.asarray(jobs[name]), "all"))
            np.testing.assert_allclose(results[name], want, atol=1e-4)
    finally:
        svc.close()


def test_coherent_malformed_rejected(service_setup):
    params, a, _ = service_setup
    svc = serving.EstimationService(params, a, 2, max_delay_ms=1.0)
    try:
        with pytest.raises(ValueError):
            svc.submit(np.zeros((4, 2, N_ANT + 1), np.complex64), 5.0)
        with pytest.raises(ValueError):
            svc.submit(np.zeros((4, 0, N_ANT), np.complex64), 5.0)
        with pytest.raises(ValueError):
            svc.submit(np.zeros((2, 2, 2, N_ANT), np.complex64), 5.0)
    finally:
        svc.close()


@pytest.fixture(scope="module")
def vae_service_setup(service_setup):
    """A tiny trained-for-2-epochs noisy VAE over the module's channels."""
    from quantized_channel_estimation_tpu.models import vae

    _, a, h_val = service_setup
    key = jax.random.PRNGKey(80)
    h, _ = scm.generate_channels(key, 4000, scm.ScmConfig(N_ANT, 1))
    cfg = vae.VaeConfig(n_antennas=N_ANT, latent_dim=4, n_layers=2,
                        vae_mode="noisy", batch_size=200, epochs=2)
    model, state, _ = vae.train(jax.random.PRNGKey(81), cfg, h, a,
                                [0.0, 10.0],
                                [Q.design_quantizer(s, cfg.n_bits)
                                 for s in (0.0, 10.0)], verbose=False)
    return model, state.params, cfg, a, h_val


def test_vae_service_matches_direct(vae_service_setup):
    """VaeEstimationService flat requests == direct vae.estimate."""
    from quantized_channel_estimation_tpu.models import vae

    model, params, cfg, a, h_val = vae_service_setup
    snr = 5.0
    q = Q.design_quantizer(snr, cfg.n_bits)
    r = observation.observe(jax.random.PRNGKey(82), h_val[:64], snr, a,
                            cfg.n_bits, q)
    svc = serving.VaeEstimationService(model, params, cfg, a,
                                       max_delay_ms=1.0)
    try:
        got = svc.submit(np.asarray(r), snr)
        want = np.asarray(vae.estimate(model, params, cfg, r, snr, a, q))
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        svc.close()


def test_vae_service_coherent_matches_direct(vae_service_setup):
    """(n, T, M) blocks through the VAE service pool predicted spectra per
    block, matching vae.estimate(coherence=T) on the flattened layout."""
    from quantized_channel_estimation_tpu.models import vae

    model, params, cfg, a, h_val = vae_service_setup
    snr, t = 0.0, 4
    q = Q.design_quantizer(snr, cfg.n_bits)
    r = observation.observe(jax.random.PRNGKey(83), h_val[:64], snr, a,
                            cfg.n_bits, q)
    rb = np.asarray(r).reshape(16, t, -1)
    svc = serving.VaeEstimationService(model, params, cfg, a,
                                       max_delay_ms=1.0)
    try:
        got = svc.submit(rb, snr)
        want = np.asarray(vae.estimate(model, params, cfg, r, snr, a, q,
                                       coherence=t)).reshape(16, t, -1)
        assert got.shape == (16, t, N_ANT)
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        svc.close()


def test_vae_service_rejects_genie(vae_service_setup):
    from quantized_channel_estimation_tpu.models import vae

    model, params, cfg, a, _ = vae_service_setup
    genie_cfg = cfg.replace(vae_mode="genie") if hasattr(cfg, "replace") \
        else cfg._replace(vae_mode="genie")
    with pytest.raises(ValueError, match="genie"):
        serving.VaeEstimationService(model, params, genie_cfg, a)


def test_from_mfa_constructor(service_setup):
    """`EstimationService.from_mfa` densifies once and serves identically
    to a manually-densified bank (round-2 VERDICT item 6)."""
    from quantized_channel_estimation_tpu.models import mfa

    _, a, h_val = service_setup
    key = jax.random.PRNGKey(90)
    h, _ = scm.generate_channels(key, 4000, scm.ScmConfig(N_ANT, 1))
    fit = mfa.fit(jax.random.PRNGKey(91), h,
                  mfa.MfaConfig(n_components=4, latent_dim=4,
                                zero_mean=True, max_iter=10,
                                chunk_size=2000))
    snr = 5.0
    q = Q.design_quantizer(snr, 2)
    r_np = np.asarray(observation.observe(jax.random.PRNGKey(92),
                                          h_val[:32], snr, a, 2, q))
    svc = serving.EstimationService.from_mfa(fit.params, a, 2,
                                             max_delay_ms=1.0)
    try:
        got = svc.submit(r_np, snr)
        bank = gmm_estimator.prepare_bank(
            mfa.to_gmm_params(fit.params, 1e-6), snr, a, 2, q)
        want = np.asarray(gmm_estimator.estimate(bank, r_np, "all"))
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        svc.close()


def test_coherent_alpha_service(service_setup):
    """coherence_alpha threads through the service: alpha=0 serves the
    independent per-snapshot estimates for block requests."""
    params, a, h_val = service_setup
    snr, t = 0.0, 4
    q = Q.design_quantizer(snr, 2)
    r = observation.observe(jax.random.PRNGKey(95), h_val[:64], snr, a, 2, q)
    rb = np.asarray(r).reshape(16, t, -1)
    svc = serving.EstimationService(params, a, 2, max_delay_ms=1.0,
                                    coherence_alpha=0.0)
    try:
        got = svc.submit(rb, snr)
        bank = gmm_estimator.prepare_bank(params, snr, a, 2, q)
        want = np.asarray(gmm_estimator.estimate(
            bank, jax.numpy.asarray(rb).reshape(-1, N_ANT), "all")
        ).reshape(16, t, N_ANT)
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        svc.close()


def _obs_blocks(h_blocks, snr, a, key=77):
    q = Q.design_quantizer(snr, 2)
    return np.asarray(observation.observe(jax.random.PRNGKey(key), h_blocks,
                                          snr, a, 2, q))


def test_close_drains_queued_requests(service_setup):
    """Round-4 VERDICT weak #1: close() must flush queued requests instead
    of leaving clients hanging until their submit timeout."""
    params, a, h_val = service_setup
    snr = 5.0
    q = Q.design_quantizer(snr, 2)
    r = np.asarray(observation.observe(jax.random.PRNGKey(70), h_val[:64],
                                       snr, a, 2, q))
    # huge max_delay so the loop would not flush on its own
    svc = serving.EstimationService(params, a, 2, max_delay_ms=60_000.0)
    results = {}

    def client(i):
        results[i] = svc.submit(r, snr, timeout=30.0)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    import time as _time
    _time.sleep(0.3)   # let requests enqueue
    svc.close(drain=True)
    for t in threads:
        t.join(timeout=30)
    assert set(results) == {0, 1, 2}
    for i in range(3):
        assert results[i].shape == (64, N_ANT)
    m = svc.metrics()
    assert m["requests_completed"] == 3
    assert m["queue_depth_samples"] == 0


def test_close_fail_fast(service_setup):
    """close(drain=False) fails queued requests with ServiceClosedError
    immediately; new submits are refused."""
    params, a, h_val = service_setup
    snr = 5.0
    q = Q.design_quantizer(snr, 2)
    r = np.asarray(observation.observe(jax.random.PRNGKey(71), h_val[:16],
                                       snr, a, 2, q))
    svc = serving.EstimationService(params, a, 2, max_delay_ms=60_000.0)
    errs = {}

    def client(i):
        try:
            svc.submit(r, snr, timeout=30.0)
            errs[i] = None
        except serving.ServiceClosedError as e:
            errs[i] = e

    threads = [threading.Thread(target=client, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    import time as _time
    _time.sleep(0.3)
    svc.close(drain=False)
    for t in threads:
        t.join(timeout=10)
    assert all(isinstance(e, serving.ServiceClosedError)
               for e in errs.values()), errs
    with pytest.raises(serving.ServiceClosedError):
        svc.submit(r, snr)
    assert svc.metrics()["requests_failed"] == 2


def test_metrics_surface(service_setup):
    """Round-4 VERDICT weak #2: the service self-reports counters, a
    latency histogram, queue depth, and bank-cache stats."""
    params, a, h_val = service_setup
    snr = 5.0
    q = Q.design_quantizer(snr, 2)
    r = np.asarray(observation.observe(jax.random.PRNGKey(72), h_val[:32],
                                       snr, a, 2, q))
    svc = serving.EstimationService(params, a, 2, max_delay_ms=1.0)
    try:
        for _ in range(3):
            svc.submit(r, snr)
        svc.submit(r, 10.0)
        m = svc.metrics()
        assert m["requests_submitted"] == 4
        assert m["requests_completed"] == 4
        assert m["estimates_served"] == 4 * 32
        assert m["bank_cache_misses"] == 2      # two distinct SNRs
        assert m["banks_cached"] == 2
        assert m["latency_count"] == 4
        assert m["latency_p50_s"] > 0
        assert m["latency_p99_s"] >= m["latency_p50_s"]
        assert m["requests_failed"] == 0 and m["requests_shed"] == 0
    finally:
        svc.close()


def test_auto_alpha_service(service_setup):
    """coherence_alpha='auto' with provided validation blocks: selection
    runs once per (SNR, T), the chosen alpha comes from the grid, and the
    served result matches the direct estimator at that alpha."""
    params, a, h_val = service_setup
    t = 4
    cfg = scm.ScmConfig(N_ANT, 1, n_coherence=t)
    h_blocks, _ = scm.generate_channels(jax.random.PRNGKey(73), 300, cfg)
    h_np = np.asarray(h_blocks)
    snr = 0.0
    rb = _obs_blocks(h_blocks[:200], snr, a)
    svc = serving.EstimationService(params, a, 2, max_delay_ms=1.0,
                                    coherence_alpha="auto",
                                    alpha_val=h_np[200:])
    try:
        got = svc.submit(rb, snr)
        sel = svc.metrics()["coherence_alpha_selected"]
        assert list(sel.keys()) == [(snr, t)]
        alpha = sel[(snr, t)]
        from quantized_channel_estimation_tpu.models.gmm_estimator import (
            DEFAULT_ALPHA_GRID)
        assert alpha in DEFAULT_ALPHA_GRID
        q = Q.design_quantizer(snr, 2)
        bank = gmm_estimator.prepare_bank(params, snr, a, 2, q)
        want = np.asarray(gmm_estimator.estimate_coherent(
            bank, rb, "all", 512, alpha))
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        svc.close()


def test_auto_alpha_requires_val_blocks(service_setup):
    params, a, _ = service_setup
    with pytest.raises(ValueError, match="alpha_val"):
        serving.EstimationService(params, a, 2, coherence_alpha="auto")
    with pytest.raises(ValueError, match="float or 'auto'"):
        serving.EstimationService(params, a, 2, coherence_alpha="best")


def test_mesh_backed_service(service_setup):
    """Round-4 VERDICT weak #3: a (data, component) mesh routes microbatches
    through the tensor-parallel pmax/psum stats merge so serving uses every
    device — validated on the 8-device virtual CPU mesh against the
    single-device einsum estimator (flat AND coherent paths)."""
    from quantized_channel_estimation_tpu.parallel import mesh as pm
    params, a, h_val = service_setup
    mesh = pm.make_mesh(n_data=4, n_component=2)
    snr = 5.0
    q = Q.design_quantizer(snr, 2)
    r = np.asarray(observation.observe(jax.random.PRNGKey(74), h_val[:96],
                                       snr, a, 2, q))
    svc = serving.EstimationService(params, a, 2, max_delay_ms=1.0,
                                    mesh=mesh, use_pallas=False)
    try:
        got = svc.submit(r, snr)
        bank = gmm_estimator.prepare_bank(params, snr, a, 2, q)
        want = np.asarray(gmm_estimator.estimate(bank, r, "all"))
        np.testing.assert_allclose(got, want, atol=1e-4)
        # coherent blocks through the rank-3 TP route
        rb = r[:64].reshape(16, 4, N_ANT)
        got_b = svc.submit(rb, snr)
        want_b = np.asarray(gmm_estimator.estimate_coherent(bank, rb))
        np.testing.assert_allclose(got_b, want_b, atol=1e-4)
        assert svc.metrics()["requests_completed"] == 2
    finally:
        svc.close()


def test_mesh_rejects_selection_mode(service_setup):
    from quantized_channel_estimation_tpu.parallel import mesh as pm
    params, a, _ = service_setup
    mesh = pm.make_mesh(n_data=4, n_component=2)
    with pytest.raises(ValueError, match="mesh-backed"):
        serving.EstimationService(params, a, 2, mesh=mesh, mode=1,
                                  use_pallas=False)


def test_structured_bank_service():
    """structured=True serves through the FFT-domain circulant bank —
    results must match the dense service on a circulant fit, flat and
    coherent (round-4 structured-bank integration)."""
    key = jax.random.PRNGKey(90)
    h, _ = scm.generate_channels(key, 6000, scm.ScmConfig(N_ANT, 1))
    fit = gmm.fit(jax.random.PRNGKey(91), h[:5000],
                  gmm.GmmConfig(n_components=4, cov_type="circulant",
                                max_iter=12, chunk_size=2048))
    a = pilots.pilot_matrix(N_ANT, 1, 2)
    snr = 5.0
    q = Q.design_quantizer(snr, 2)
    r = np.asarray(observation.observe(jax.random.PRNGKey(92), h[5000:5100],
                                       snr, a, 2, q))
    svc_s = serving.EstimationService(fit.params, a, 2, max_delay_ms=1.0,
                                      structured=True)
    svc_d = serving.EstimationService(fit.params, a, 2, max_delay_ms=1.0,
                                      use_pallas=False)
    try:
        got_s = svc_s.submit(r, snr)
        got_d = svc_d.submit(r, snr)
        np.testing.assert_allclose(got_s, got_d, atol=2e-4)
        rb = r[:96].reshape(24, 4, N_ANT)
        got_sb = svc_s.submit(rb, snr)
        got_db = svc_d.submit(rb, snr)
        np.testing.assert_allclose(got_sb, got_db, atol=2e-4)
    finally:
        svc_s.close()
        svc_d.close()
    # mesh-backed structured serving: the TP FFT-domain route
    # (estimate_sharded_circulant) on the virtual mesh
    from quantized_channel_estimation_tpu.parallel import mesh as pm
    svc_m = serving.EstimationService(fit.params, a, 2, max_delay_ms=1.0,
                                      structured=True,
                                      mesh=pm.make_mesh(4, 2))
    try:
        got_m = svc_m.submit(r[:96], snr)
        q5 = Q.design_quantizer(snr, 2)
        from quantized_channel_estimation_tpu.models import (
            structured_bank as sbm)
        bank = sbm.prepare_bank_circulant(fit.params, snr, 1.0 + 0.0j, 2, q5)
        want_m = np.asarray(sbm.estimate_circulant(bank, jnp.asarray(r[:96])))
        np.testing.assert_allclose(got_m, want_m, atol=2e-4)
        got_mb = svc_m.submit(r[:96].reshape(24, 4, N_ANT), snr)
        want_mb = np.asarray(sbm.estimate_circulant_coherent(
            bank, jnp.asarray(r[:96]).reshape(24, 4, N_ANT)))
        np.testing.assert_allclose(got_mb, want_mb, atol=2e-4)
    finally:
        svc_m.close()


def test_mesh_backed_large_t_divisibility(service_setup):
    """Mesh + large-T coherent requests: the T-aware microbatch floor can
    drop to 1 block, but the TP route needs row counts divisible by the
    data axis — the mesh-aware floor must keep pads divisible (round-4
    self-review fix). Also: auto-alpha selection batches are trimmed to a
    divisible block count."""
    from quantized_channel_estimation_tpu.parallel import mesh as pm
    params, a, h_val = service_setup
    mesh = pm.make_mesh(n_data=4, n_component=2)
    snr, t = 5.0, 16
    q = Q.design_quantizer(snr, 2)
    r = np.asarray(observation.observe(jax.random.PRNGKey(75), h_val[:48],
                                       snr, a, 2, q))
    rb = r.reshape(3, t, N_ANT)   # 3 blocks -> pads to 4 (= n_data)
    svc = serving.EstimationService(params, a, 2, max_delay_ms=1.0,
                                    mesh=mesh, use_pallas=False)
    try:
        got = svc.submit(rb, snr)
        bank = gmm_estimator.prepare_bank(params, snr, a, 2, q)
        want = np.asarray(gmm_estimator.estimate_coherent(bank, rb))
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        svc.close()
    # auto-alpha with a mesh: selection blocks trimmed to divisibility
    cfgT = 4
    h_blocks, _ = scm.generate_channels(
        jax.random.PRNGKey(76), 103, scm.ScmConfig(N_ANT, 1,
                                                   n_coherence=cfgT))
    svc2 = serving.EstimationService(params, a, 2, max_delay_ms=1.0,
                                     mesh=mesh, use_pallas=False,
                                     coherence_alpha="auto",
                                     alpha_val=np.asarray(h_blocks[:50]))
    try:
        rb2 = np.asarray(observation.observe(
            jax.random.PRNGKey(77), h_blocks[50:98], snr, a, 2, q))
        out = svc2.submit(rb2, snr)
        assert out.shape == (48, cfgT, N_ANT)
        sel = svc2.metrics()["coherence_alpha_selected"]
        assert (snr, cfgT) in sel
    finally:
        svc2.close()


def test_structured_auto_alpha_service():
    """structured=True composes with coherence_alpha='auto' (selection runs
    through the structured coherent estimator)."""
    key = jax.random.PRNGKey(95)
    t = 4
    h, _ = scm.generate_channels(key, 5000, scm.ScmConfig(N_ANT, 1))
    fit = gmm.fit(jax.random.PRNGKey(96), h[:4000],
                  gmm.GmmConfig(n_components=4, cov_type="circulant",
                                max_iter=12, chunk_size=2048))
    hb, _ = scm.generate_channels(jax.random.PRNGKey(97), 200,
                                  scm.ScmConfig(N_ANT, 1, n_coherence=t))
    a = pilots.pilot_matrix(N_ANT, 1, 2)
    snr = 0.0
    q = Q.design_quantizer(snr, 2)
    rb = np.asarray(observation.observe(jax.random.PRNGKey(98), hb[:120],
                                        snr, a, 2, q))
    svc = serving.EstimationService(fit.params, a, 2, max_delay_ms=1.0,
                                    structured=True,
                                    coherence_alpha="auto",
                                    alpha_val=np.asarray(hb[120:]))
    try:
        out = svc.submit(rb, snr)
        assert out.shape == (120, t, N_ANT)
        sel = svc.metrics()["coherence_alpha_selected"]
        assert (snr, t) in sel
    finally:
        svc.close()


def test_serving_topk_kernel_mode(service_setup):
    """use_pallas=True with an int selection mode serves through the fused
    top-k kernel (round-5; interpret mode on CPU) and matches the einsum
    selection estimate."""
    params, a, h_val = service_setup
    snr = 5.0
    q = Q.design_quantizer(snr, 2)
    r = observation.observe(jax.random.PRNGKey(66), h_val[:64], snr, a, 2, q)
    r_np = np.asarray(r)
    svc = serving.EstimationService(params, a, 2, max_delay_ms=1.0,
                                    mode=1, use_pallas=True)
    try:
        got = svc.submit(r_np, snr)
        bank = gmm_estimator.prepare_bank(params, snr, a, 2, q)
        want = np.asarray(gmm_estimator.estimate(bank, r, 1))
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        svc.close()
    # float cumulative-p with an explicit kernel request still fails loudly
    with pytest.raises(ValueError):
        serving.EstimationService(params, a, 2, mode=0.9, use_pallas=True)
    # k >= K falls outside the top-k kernel too
    with pytest.raises(ValueError):
        serving.EstimationService(params, a, 2, mode=4, use_pallas=True)


def test_structured_multipilot_service():
    """structured=True with a P=2 kron pilot rides the per-bin P x P
    multi-pilot bank (round-5) and matches the dense service, flat and
    through a (data, component) mesh."""
    key = jax.random.PRNGKey(95)
    h, _ = scm.generate_channels(key, 6000, scm.ScmConfig(N_ANT, 1))
    fit = gmm.fit(jax.random.PRNGKey(96), h[:5000],
                  gmm.GmmConfig(n_components=4, cov_type="circulant",
                                max_iter=12, chunk_size=2048))
    a = pilots.pilot_matrix(N_ANT, 2, 2)
    snr = 5.0
    q = Q.design_quantizer(snr, 2)
    r = np.asarray(observation.observe(jax.random.PRNGKey(97),
                                       h[5000:5100], snr, a, 2, q))
    svc_s = serving.EstimationService(fit.params, a, 2, max_delay_ms=1.0,
                                      structured=True)
    svc_d = serving.EstimationService(fit.params, a, 2, max_delay_ms=1.0,
                                      use_pallas=False)
    try:
        got_s = svc_s.submit(r, snr)
        got_d = svc_d.submit(r, snr)
        np.testing.assert_allclose(got_s, got_d, atol=2e-4)
        # coherent multi-pilot block requests (round-5 late: the MP
        # coherent dispatch incl. the alpha blend)
        rb = r[:96].reshape(24, 4, -1)
        got_sb = svc_s.submit(rb, snr)
        got_db = svc_d.submit(rb, snr)
        np.testing.assert_allclose(got_sb, got_db, atol=2e-4)
    finally:
        svc_s.close()
        svc_d.close()
    if len(jax.devices()) >= 8:
        from quantized_channel_estimation_tpu.parallel import mesh as pm
        svc_m = serving.EstimationService(fit.params, a, 2,
                                          max_delay_ms=1.0,
                                          structured=True,
                                          mesh=pm.make_mesh(4, 2))
        try:
            got_m = svc_m.submit(r[:64], snr)
            np.testing.assert_allclose(got_m, got_d[:64], atol=2e-4)
        finally:
            svc_m.close()


def test_from_circulant_spectra_service():
    """Spectra-native serving (round-5): a `fit_circulant_spectra` result
    serves through `from_circulant_spectra` with no dense covariance
    anywhere, matching the dense service built from the densified fit."""
    from quantized_channel_estimation_tpu.models import gmm_quant
    from quantized_channel_estimation_tpu.ops.linalg import (
        unitary_dft, hermitize, robust_precision_cholesky)
    key = jax.random.PRNGKey(98)
    h, _ = scm.generate_channels(key, 8000, scm.ScmConfig(N_ANT, 1))
    snr, n_bits = 5.0, 2
    q = Q.design_quantizer(snr, n_bits)
    a = pilots.pilot_matrix(N_ANT, 1, n_bits)
    r_train = observation.observe(jax.random.PRNGKey(99), h[:7000], snr,
                                  a, n_bits, q)
    cfg = gmm.GmmConfig(n_components=4, cov_type="circulant",
                        zero_mean=True, max_iter=10, chunk_size=2048)
    res = gmm_quant.fit_circulant_spectra(jax.random.PRNGKey(100), r_train,
                                          cfg, n_bits, 10 ** (-snr / 10), q)
    r = np.asarray(observation.observe(jax.random.PRNGKey(101),
                                       h[7000:7064], snr, a, n_bits, q))
    svc = serving.EstimationService.from_circulant_spectra(
        res.weights, res.means, res.spectra, a, n_bits, max_delay_ms=1.0)
    try:
        got = svc.submit(r, snr)
    finally:
        svc.close()
    # reference: densify the spectra and serve dense
    f = unitary_dft(N_ANT)
    covs = jnp.einsum("fd,kf,fe->kde", jnp.conj(f),
                      res.spectra.astype(jnp.complex64), f)
    covs = hermitize(covs) + 1e-5 * jnp.eye(N_ANT, dtype=jnp.complex64)
    params = gmm.GmmParams(res.weights, res.means, covs,
                           robust_precision_cholesky(covs))
    bank = gmm_estimator.prepare_bank(params, snr, a, n_bits, q)
    want = np.asarray(gmm_estimator.estimate(bank, jnp.asarray(r), "all"))
    np.testing.assert_allclose(got, want, atol=2e-3)
