"""Segmented EM driver: bounded-execution fits match continuous ones,
convergence stops early, and checkpointed runs resume across 'processes'."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_channel_estimation_tpu.models import em_driver, gmm, gmm_quant
from quantized_channel_estimation_tpu.ops import observation, quantizer, scm
from quantized_channel_estimation_tpu.utils.checkpoint import TrainCheckpointer


@pytest.fixture(scope="module")
def channels():
    cfg = scm.ScmConfig(n_antennas=16)
    h, _ = scm.generate_channels(jax.random.PRNGKey(7), 2000, cfg)
    return jnp.asarray(np.asarray(h), jnp.complex64)


def test_segmented_matches_continuous_toeplitz(channels):
    """3 segments x 4 iters tracks one continuous 12-iter structured fit
    (exercises the exact spectrum recovery at every boundary)."""
    key = jax.random.PRNGKey(1)
    cfg = gmm.GmmConfig(n_components=4, cov_type="toeplitz", zero_mean=True,
                        max_iter=4, tol=0.0, chunk_size=1024)
    seg = em_driver.fit_segmented(
        lambda: gmm.fit(key, channels, cfg),
        lambda prev: gmm.fit_resume(prev.params, channels, cfg),
        n_segments=3)
    cont = gmm.fit(key, channels, cfg._replace(max_iter=12))
    assert int(seg.n_iter) == 12
    assert abs(float(seg.lower_bound) - float(cont.lower_bound)) < 0.3


def test_segmented_stops_on_convergence(channels):
    """A generous tol converges in segment 1; later segments must not run."""
    calls = {"resume": 0}
    cfg = gmm.GmmConfig(n_components=2, cov_type="full", zero_mean=True,
                        max_iter=50, tol=1.0, chunk_size=1024)

    def resume(prev):
        calls["resume"] += 1
        return gmm.fit_resume(prev.params, channels, cfg)

    res = em_driver.fit_segmented(
        lambda: gmm.fit(jax.random.PRNGKey(0), channels, cfg), resume,
        n_segments=5)
    assert bool(res.converged)
    assert calls["resume"] == 0


def test_segmented_retries_transient_runtime_errors(channels):
    """max_retries re-runs a segment killed by a JaxRuntimeError (the remote
    runtime drops compiles transiently); programming errors never retry."""
    cfg = gmm.GmmConfig(n_components=2, cov_type="full", zero_mean=True,
                        max_iter=3, tol=0.0, chunk_size=1024)
    calls = {"start": 0, "resume": 0}

    def flaky_start():
        calls["start"] += 1
        if calls["start"] == 1:
            raise jax.errors.JaxRuntimeError(
                "INTERNAL: remote_compile: read body: response body closed")
        return gmm.fit(jax.random.PRNGKey(0), channels, cfg)

    def flaky_resume(prev):
        calls["resume"] += 1
        if calls["resume"] == 1:
            raise jax.errors.JaxRuntimeError("INTERNAL: execution dropped")
        return gmm.fit_resume(prev.params, channels, cfg)

    res = em_driver.fit_segmented(flaky_start, flaky_resume, n_segments=2,
                                  max_retries=1)
    assert calls == {"start": 2, "resume": 2}
    assert int(res.n_iter) == 6

    # exactness: retried run == clean run (segments are pure)
    clean = em_driver.fit_segmented(
        lambda: gmm.fit(jax.random.PRNGKey(0), channels, cfg),
        lambda prev: gmm.fit_resume(prev.params, channels, cfg),
        n_segments=2)
    np.testing.assert_allclose(np.asarray(res.params.covariances),
                               np.asarray(clean.params.covariances))

    # exhausted retries re-raise
    with pytest.raises(jax.errors.JaxRuntimeError):
        em_driver.fit_segmented(
            lambda: (_ for _ in ()).throw(
                jax.errors.JaxRuntimeError("INTERNAL: down")),
            flaky_resume, n_segments=1, max_retries=1)

    # non-runtime errors propagate immediately, no retry
    boom = {"n": 0}

    def bad_start():
        boom["n"] += 1
        raise ValueError("config error")

    with pytest.raises(ValueError):
        em_driver.fit_segmented(bad_start, flaky_resume, n_segments=1,
                                max_retries=3)
    assert boom["n"] == 1


def test_segmented_checkpoint_resume(channels, tmp_path):
    """Kill after 2 segments; a rerun restores segment 2's result and runs
    only the remaining segment, landing where an uninterrupted run does."""
    key = jax.random.PRNGKey(3)
    cfg = gmm.GmmConfig(n_components=2, cov_type="full", zero_mean=True,
                        max_iter=3, tol=0.0, chunk_size=1024)
    start = lambda: gmm.fit(key, channels, cfg)
    resume = lambda prev: gmm.fit_resume(prev.params, channels, cfg)

    with TrainCheckpointer(str(tmp_path / "ck")) as ck:
        partial = em_driver.fit_segmented(start, resume, n_segments=2,
                                          checkpointer=ck)
        ck.wait()
    assert int(partial.n_iter) == 6

    calls = {"start": 0}

    def start_counting():
        calls["start"] += 1
        return start()

    with TrainCheckpointer(str(tmp_path / "ck")) as ck:
        assert ck.latest_step() == 1
        # restoring requires an example result pytree
        with pytest.raises(ValueError):
            em_driver.fit_segmented(start_counting, resume, n_segments=3,
                                    checkpointer=ck)
        final = em_driver.fit_segmented(start_counting, resume, n_segments=3,
                                        checkpointer=ck,
                                        example_result=partial)
        ck.wait()
    assert calls["start"] == 0          # never refit from scratch
    assert int(final.n_iter) == 9
    uninterrupted = em_driver.fit_segmented(start, resume, n_segments=3)
    assert abs(float(final.lower_bound)
               - float(uninterrupted.lower_bound)) < 1e-4


def test_segmented_restore_of_converged_run_is_a_noop(channels, tmp_path):
    """Rerunning against a checkpoint of an already-converged run returns it
    directly instead of re-training the remaining segments."""
    cfg = gmm.GmmConfig(n_components=2, cov_type="full", zero_mean=True,
                        max_iter=50, tol=1.0, chunk_size=1024)
    start = lambda: gmm.fit(jax.random.PRNGKey(0), channels, cfg)
    resume = lambda prev: gmm.fit_resume(prev.params, channels, cfg)
    with TrainCheckpointer(str(tmp_path / "ck")) as ck:
        done = em_driver.fit_segmented(start, resume, n_segments=5,
                                       checkpointer=ck)
        ck.wait()
    assert bool(done.converged)

    calls = {"n": 0}

    def count(*a):
        calls["n"] += 1
        raise AssertionError("must not fit again")

    with TrainCheckpointer(str(tmp_path / "ck")) as ck:
        again = em_driver.fit_segmented(count, count, n_segments=5,
                                        checkpointer=ck,
                                        example_result=jax.eval_shape(start))
    assert calls["n"] == 0
    assert int(again.n_iter) == int(done.n_iter)
    np.testing.assert_allclose(np.asarray(again.params.weights),
                               np.asarray(done.params.weights))


def test_segmented_quantized_family(channels):
    """The quantized-training EM segments through its full-result resume."""
    snr_db, n_bits = 10.0, 2
    sigma2 = float(10.0 ** (-snr_db / 10.0))
    q = quantizer.design_quantizer(snr_db, n_bits, "uniform")
    r = observation.observe(jax.random.PRNGKey(5), channels, snr_db, None,
                            n_bits, q)
    cfg = gmm.GmmConfig(n_components=2, cov_type="full", zero_mean=True,
                        max_iter=3, tol=0.0, chunk_size=1024)
    seg = em_driver.fit_segmented(
        lambda: gmm_quant.fit(jax.random.PRNGKey(6), r, cfg, n_bits, sigma2,
                              q=q),
        lambda prev: gmm_quant.fit_resume(jax.random.PRNGKey(8), prev, r,
                                          cfg, n_bits, sigma2, q=q),
        n_segments=2)
    assert int(seg.n_iter) == 6
    cont = gmm_quant.fit(jax.random.PRNGKey(6), r,
                         cfg._replace(max_iter=6), n_bits, sigma2, q=q)
    assert abs(float(seg.lower_bound) - float(cont.lower_bound)) < 0.3
