"""Numerical-utility tests: Toeplitz builder, FFT identities, batched solves."""
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from quantized_channel_estimation_tpu.ops import linalg as L


def test_toeplitz_matches_scipy(rng):
    t = (rng.standard_normal(6) + 1j * rng.standard_normal(6)).astype(np.complex64)
    t[0] = abs(t[0])
    got = np.asarray(L.toeplitz_from_first_row(jnp.asarray(t)))
    want = scipy.linalg.toeplitz(t.conj(), t)  # first row t, Hermitian
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_toeplitz_batched(rng):
    t = (rng.standard_normal((3, 5)) + 1j * rng.standard_normal((3, 5))).astype(np.complex64)
    got = np.asarray(L.toeplitz_from_first_row(jnp.asarray(t)))
    for b in range(3):
        want = np.asarray(L.toeplitz_from_first_row(jnp.asarray(t[b])))
        np.testing.assert_allclose(got[b], want)


def test_unitary_dft():
    f = np.asarray(L.unitary_dft(8))
    np.testing.assert_allclose(f @ f.conj().T, np.eye(8), atol=1e-6)


def test_oversampled_dft_toeplitz_identity(rng):
    """F2^H diag(s) F2 must be Toeplitz for any nonneg spectrum s
    (the Barton-Fuhrmann parameterization)."""
    n = 6
    f2 = np.asarray(L.oversampled_dft(n, jnp.complex128))
    s = rng.random(2 * n)
    c = f2.conj().T @ np.diag(s) @ f2
    for k in range(1, n):
        diag = np.diagonal(c, offset=k)
        np.testing.assert_allclose(diag, diag[0], atol=1e-12)
    # Hermitian PSD
    np.testing.assert_allclose(c, c.conj().T, atol=1e-12)
    assert np.linalg.eigvalsh(c).min() > -1e-12


def test_cho_solve_and_inv(rng):
    d = 5
    a = rng.standard_normal((4, d, d)) + 1j * rng.standard_normal((4, d, d))
    c = a @ np.conj(np.swapaxes(a, -1, -2)) + d * np.eye(d)
    b = rng.standard_normal((4, d)) + 1j * rng.standard_normal((4, d))
    x = np.asarray(L.cho_solve_hermitian(jnp.asarray(c, jnp.complex128),
                                         jnp.asarray(b, jnp.complex128)))
    np.testing.assert_allclose(np.einsum("bij,bj->bi", c, x), b, rtol=1e-8)
    cinv = np.asarray(L.hermitian_inv(jnp.asarray(c, jnp.complex128)))
    np.testing.assert_allclose(np.einsum("bij,bjk->bik", c, cinv),
                               np.broadcast_to(np.eye(d), (4, d, d)), atol=1e-8)


def test_precision_cholesky_quadratic_form(rng):
    d = 4
    a = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
    c = a @ a.conj().T + d * np.eye(d)
    p = np.asarray(L.precision_cholesky(jnp.asarray(c[None], jnp.complex128)))[0]
    x = rng.standard_normal(d) + 1j * rng.standard_normal(d)
    quad = np.sum(np.abs(x @ p.conj()) ** 2)
    want = np.real(x.conj() @ np.linalg.inv(c) @ x)
    np.testing.assert_allclose(quad, want, rtol=1e-8)
    # log-det identity: 2 sum log diag(P) = -log det C
    ld = 2 * float(L.logdet_from_prec_chol(jnp.asarray(p[None]))[0])
    np.testing.assert_allclose(ld, -np.linalg.slogdet(c)[1], rtol=1e-6)


def test_psd_project(rng):
    a = rng.standard_normal((4, 4))
    sym = (a + a.T) / 2
    proj = np.asarray(L.psd_project(jnp.asarray(sym, jnp.complex128)))
    w = np.linalg.eigvalsh(proj)
    assert w.min() >= -1e-10


def test_psd_project_polar_matches_eigh():
    """GEMM-only Newton-Schulz PSD projection vs the eigh-clip reference."""
    import jax
    import jax.numpy as jnp
    from quantized_channel_estimation_tpu.ops import linalg
    from quantized_channel_estimation_tpu.ops.cplx import crandn

    key = jax.random.PRNGKey(3)
    k, d = 8, 32
    a = crandn(key, (k, d, d))
    h = linalg.hermitize(a @ jnp.conj(jnp.swapaxes(a, -1, -2)) / d
                         - 0.3 * jnp.eye(d, dtype=a.dtype))
    for floor in (0.0, 1e-5):
        want = linalg.psd_project(h, floor)
        got = linalg.psd_project_polar(h, floor)
        rel = jnp.max(jnp.linalg.norm(got - want, axis=(-2, -1))
                      / jnp.linalg.norm(want, axis=(-2, -1)))
        assert float(rel) < 1e-4, float(rel)
        wmin = float(jnp.min(jnp.linalg.eigvalsh(got)))
        assert wmin >= floor - 1e-5, wmin


def test_psd_project_polar_floor_on_near_zero_negatives():
    """Eigenvalues just below zero (the slow-convergence regime of the sign
    iteration) must still come out >= floor."""
    import jax
    import jax.numpy as jnp
    from quantized_channel_estimation_tpu.ops import linalg
    from quantized_channel_estimation_tpu.ops.cplx import crandn

    d, floor = 64, 1e-5
    qmat, _ = jnp.linalg.qr(crandn(jax.random.PRNGKey(7), (d, d)))
    for negscale in (1e-3, 1e-5, 1e-7):
        lam = jnp.ones((d,)).at[:8].set(-negscale * d)
        h = linalg.hermitize((qmat * lam[None, :]) @ jnp.conj(qmat.T))
        got = linalg.psd_project_polar(h[None].astype(jnp.complex64), floor)
        wmin = float(jnp.min(jnp.linalg.eigvalsh(got)))
        assert wmin >= floor - 1e-7, (negscale, wmin)


def test_spectrum_from_covariance_exact_recovery():
    """C = F2^H diag(s) F2 with adversarially peaked random spectra must be
    recovered to a few percent in float32 — including with diagonal jitter
    (representable since F2^H F2 = I) — where the naive DFT readback is a
    Gram-smoothed spectrum that reconstructs ~60% wrong. (EM-produced SCM
    spectra are smoother: measured <0.5% there, PARITY_NOTES.md.)"""
    import jax
    import jax.numpy as jnp
    from quantized_channel_estimation_tpu.ops import linalg

    d, k = 16, 3
    f2 = linalg.oversampled_dft(d, jnp.complex64)
    s_true = jax.random.exponential(jax.random.PRNGKey(0), (k, 2 * d),
                                    jnp.float32) ** 2  # peaked spectra
    covs = jnp.einsum("fd,kf,fe->kde", jnp.conj(f2),
                      s_true.astype(jnp.complex64), f2)
    for jitter in (0.0, 1e-4):
        c = linalg.add_jitter(covs, jitter)
        s = linalg.spectrum_from_covariance(c, f2, 1e-8)
        rec = jnp.einsum("fd,kf,fe->kde", jnp.conj(f2),
                         s.astype(jnp.complex64), f2)
        rel = jnp.linalg.norm(rec - c, axis=(1, 2)) / jnp.linalg.norm(
            c, axis=(1, 2))
        assert float(jnp.max(rel)) < 0.04, (jitter, np.asarray(rel))
    # the naive readback is measurably NOT a recovery (~60% here)
    naive = jnp.maximum(jnp.real(jnp.einsum(
        "fd,kde,fe->kf", f2, covs, jnp.conj(f2))), 1e-8)
    rec_naive = jnp.einsum("fd,kf,fe->kde", jnp.conj(f2),
                           naive.astype(jnp.complex64), f2)
    rel_naive = jnp.linalg.norm(rec_naive - covs, axis=(1, 2)) \
        / jnp.linalg.norm(covs, axis=(1, 2))
    assert float(jnp.min(rel_naive)) > 0.3, np.asarray(rel_naive)


def test_spectrum_from_covariance_block_frame():
    """Recovery also holds for the kron (block-toeplitz) frame."""
    import jax
    import jax.numpy as jnp
    from quantized_channel_estimation_tpu.ops import linalg

    n1, n2, k = 4, 4, 2
    f2 = jnp.kron(linalg.oversampled_dft(n1, jnp.complex64),
                  linalg.oversampled_dft(n2, jnp.complex64))
    s_true = jax.random.uniform(jax.random.PRNGKey(1),
                                (k, f2.shape[0]), jnp.float32, 0.01, 1.0)
    covs = jnp.einsum("fd,kf,fe->kde", jnp.conj(f2),
                      s_true.astype(jnp.complex64), f2)
    s = linalg.spectrum_from_covariance(covs, f2, 1e-8)
    rec = jnp.einsum("fd,kf,fe->kde", jnp.conj(f2),
                     s.astype(jnp.complex64), f2)
    rel = jnp.linalg.norm(rec - covs, axis=(1, 2)) / jnp.linalg.norm(
        covs, axis=(1, 2))
    assert float(jnp.max(rel)) < 0.04, np.asarray(rel)
