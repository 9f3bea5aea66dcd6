"""Misc utilities, MF rate bound, circulant approximation."""
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_channel_estimation_tpu.ops import linalg as L
from quantized_channel_estimation_tpu.ops.quantizer import design_quantizer
from quantized_channel_estimation_tpu.utils import misc
from quantized_channel_estimation_tpu.utils.metrics import (
    global_bussgang_stats, rate_lower_bound, rate_mf_bound)


def test_rand_exp_range():
    x = misc.rand_exp(1e-5, 1e-3, (1000,), seed=0)
    assert np.all(x >= 1e-5) and np.all(x <= 1e-3)
    # log-uniform: median near geometric mean
    assert 5e-5 < np.median(x) < 2e-4


def test_rand_geom_ints():
    x = misc.rand_geom(10, 1000, (100,), seed=1)
    assert x.dtype.kind == "i"
    assert np.all(x >= 10) and np.all(x <= 1000)


def test_sec2hours():
    assert misc.sec2hours(3661) == "1:01:01"


def test_rate_mf_bound_positive(rng):
    d = 8
    h = (rng.standard_normal((500, d)) + 1j * rng.standard_normal((500, d))
         ).astype(np.complex64) / np.sqrt(2)
    cov = jnp.asarray(h.T @ h.conj() / 500)
    b, cq = global_bussgang_stats(cov, 10.0, 1)
    # perfect estimates: MF bound must beat noisy estimates' bound
    r_perfect = float(rate_mf_bound(jnp.asarray(h), jnp.asarray(h), b, cq))
    noisy = h + 0.5 * (rng.standard_normal(h.shape)
                       + 1j * rng.standard_normal(h.shape)).astype(np.complex64)
    r_noisy = float(rate_mf_bound(jnp.asarray(noisy), jnp.asarray(h), b, cq))
    assert r_perfect > r_noisy > 0


def test_rate_mf_bound_matches_reference_loop(rng):
    """The batched einsum must equal the reference's per-sample loop
    g = res^H B^H Cq^{-1} (`Bussgang_GMM.py:186-195`) — a transposed
    Cq^{-1} deviates by tenths of a bit for complex Cq."""
    d = 6
    n = 40
    h = (rng.standard_normal((n, d)) + 1j * rng.standard_normal((n, d))
         ).astype(np.complex128) / np.sqrt(2)
    res = h + 0.3 * (rng.standard_normal((n, d))
                     + 1j * rng.standard_normal((n, d)))
    cov = h.T @ h.conj() / n
    b, cq = global_bussgang_stats(jnp.asarray(cov), 10.0, 2,
                                  design_quantizer(10.0, 2))
    b_np = np.asarray(b, np.complex128)
    cq_np = np.asarray(cq, np.complex128)
    cq_inv = np.linalg.pinv(cq_np)
    want = 0.0
    for i in range(n):
        g = res[i].conj().T @ b_np.conj().T @ cq_inv
        err = h[i] - res[i]
        want += np.real(np.log2(
            1 + np.abs(g @ b_np @ res[i]) ** 2
            / (g @ cq_np @ g.conj().T + np.abs(g @ b_np @ err) ** 2)))
    want /= n
    got = float(rate_mf_bound(jnp.asarray(res), jnp.asarray(h),
                              jnp.asarray(b_np), jnp.asarray(cq_np),
                              jitter=0.0))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_best_circulant_approximation(rng):
    """The returned spectrum must define the Frobenius-optimal circulant:
    check optimality by comparing against small perturbations."""
    n = 8
    t = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex128)
    t[0] = 5.0 + abs(t[0])
    toep = np.asarray(L.toeplitz_from_first_row(jnp.asarray(t)))
    spec = np.asarray(L.best_circulant_approximation(jnp.asarray(t)))
    f = np.fft.fft(np.eye(n)) / np.sqrt(n)
    circ = f.conj().T @ np.diag(spec) @ f
    err_opt = np.linalg.norm(toep - circ)
    for trial in range(5):
        pert = spec + 0.05 * rng.standard_normal(n)
        circ_p = f.conj().T @ np.diag(pert) @ f
        assert np.linalg.norm(toep - circ_p) >= err_opt - 1e-9
    # circulant structure: constant wrapped diagonals
    for off in range(1, n):
        diag_hi = np.diagonal(circ, offset=off)
        diag_lo = np.diagonal(circ, offset=off - n)
        np.testing.assert_allclose(diag_hi, diag_hi[0], atol=1e-10)
        np.testing.assert_allclose(diag_lo[0], diag_hi[0], atol=1e-10)


def test_no_implicit_transfers_guard():
    """The transfer guard turns implicit host->device transfers (a stray
    un-jitted host constant in a hot loop) into errors while device-only
    compute passes (SURVEY §5 sanitizer analog)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from quantized_channel_estimation_tpu.utils.profiling import (
        no_implicit_transfers)

    x = jnp.arange(8.0)
    two = jnp.asarray(2.0)  # already on device
    with no_implicit_transfers():
        y = jnp.sum(x * two)  # device-only: fine
        with pytest.raises(jax.errors.JaxRuntimeError):
            _ = x * 2.0  # python scalar = implicit host->device transfer
    assert float(np.asarray(y)) == 56.0


def test_rate_lower_bound_matches_reference_loop(rng):
    """The statistical rate bound (the main rate metric in every CSV) must
    equal the reference's per-sample numpy computation
    (`Bussgang_GMM.py:153-163`): per-sample power normalization, inner
    products through B, num = |mean|^2, den = var + mean quadratic form."""
    d = 6
    n = 60
    h = (rng.standard_normal((n, d)) + 1j * rng.standard_normal((n, d))
         ).astype(np.complex128) / np.sqrt(2)
    res = h + 0.3 * (rng.standard_normal((n, d))
                     + 1j * rng.standard_normal((n, d)))
    cov = h.T @ h.conj() / n
    b, cq = global_bussgang_stats(jnp.asarray(cov), 10.0, 2,
                                  design_quantizer(10.0, 2))
    b_np = np.asarray(b, np.complex128)
    cq_np = np.asarray(cq, np.complex128)
    res_ref = res.copy()
    norm_fac = np.sum(np.abs(res_ref) ** 2, axis=1)
    for i in range(res_ref.shape[0]):
        res_ref[i] /= norm_fac[i]
    inner = np.squeeze(np.expand_dims(res_ref.conj(), 1) @ b_np
                       @ np.expand_dims(h, 2))
    num = np.abs(np.mean(inner, axis=0)) ** 2
    den1 = np.var(inner, axis=0)
    den2 = np.real(np.squeeze(np.expand_dims(res_ref.conj(), 1) @ cq_np
                              @ np.expand_dims(res_ref, 2)))
    want = np.log2(1 + num / (den1 + np.mean(den2, axis=0)))
    got = float(rate_lower_bound(jnp.asarray(res), jnp.asarray(h),
                                 jnp.asarray(b_np), jnp.asarray(cq_np)))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # and the GMM path's clipped normalization (`Bussgang_GMM.py:299`)
    res_ref = res.copy()
    norm_fac = np.clip(np.sum(np.abs(res_ref) ** 2, axis=1), 0.1, None)
    for i in range(res_ref.shape[0]):
        res_ref[i] /= norm_fac[i]
    inner = np.squeeze(np.expand_dims(res_ref.conj(), 1) @ b_np
                       @ np.expand_dims(h, 2))
    den2 = np.real(np.squeeze(np.expand_dims(res_ref.conj(), 1) @ cq_np
                              @ np.expand_dims(res_ref, 2)))
    want = np.log2(1 + np.abs(np.mean(inner)) ** 2
                   / (np.var(inner) + np.mean(den2)))
    got = float(rate_lower_bound(jnp.asarray(res), jnp.asarray(h),
                                 jnp.asarray(b_np), jnp.asarray(cq_np),
                                 norm_clip=0.1))
    np.testing.assert_allclose(got, want, rtol=1e-6)
