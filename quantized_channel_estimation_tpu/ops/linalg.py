"""Batched Hermitian linear algebra and structured-covariance transforms.

All functions are jittable, vmappable, and dtype-polymorphic. Batched forms
map onto XLA's batched Cholesky / triangular-solve / eigh lowerings, which on
TPU run in parallel across the batch (the reference loops in Python over
components/samples: e.g. `modules/utils.py:387-434`,
`estimators/blmmse.py:26-60`).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Toeplitz / circulant structure
# ---------------------------------------------------------------------------

def toeplitz_from_first_row(t: jax.Array) -> jax.Array:
    """Hermitian Toeplitz matrix whose *first row* is ``t``.

    C[i, j] = t[j - i] for j >= i and conj(t[i - j]) for j < i.

    This matches the reference's ``toeplitz(t).T`` convention used to build
    genie covariances from the SCM first-row vector
    (`estimators/blmmse.py:28`, with `modules/utils.py:115-175`). Works on
    batched inputs (..., D) -> (..., D, D).
    """
    d = t.shape[-1]
    i = jnp.arange(d)[:, None]
    j = jnp.arange(d)[None, :]
    idx = jnp.abs(j - i)
    gathered = t[..., idx]  # (..., D, D) with entry t[|i-j|]
    return jnp.where(j >= i, gathered, jnp.conj(gathered))


def unitary_dft(n: int, dtype=jnp.complex64) -> jax.Array:
    """Unitary DFT matrix F with F F^H = I (fft(I)/sqrt(n))."""
    k = jnp.arange(n)
    w = jnp.exp(jnp.asarray(-2j * jnp.pi / n, dtype) * jnp.outer(k, k).astype(dtype))
    return w / math.sqrt(n)


def oversampled_dft(n: int, dtype=jnp.complex64) -> jax.Array:
    """F2 = fft(I_{2n})[:, :n] / sqrt(2n): the (2n, n) oversampled DFT used by
    the Barton-Fuhrmann Toeplitz EM projection (`gmm_cplx_bussgang.py:146`).

    F2^H diag(s) F2 is a Toeplitz-structured PSD matrix for s >= 0.
    """
    k2 = jnp.arange(2 * n)
    kn = jnp.arange(n)
    w = jnp.exp(jnp.asarray(-1j * jnp.pi / n, dtype) * jnp.outer(k2, kn).astype(dtype))
    return w / math.sqrt(2 * n)


def spectrum_from_covariance(covs: jax.Array, f2: jax.Array, floor: float,
                             iters: int = 200) -> jax.Array:
    """Recover the frame spectrum s with C = F2^H diag(s) F2 from C.

    The oversampled frame's rows are NOT orthogonal, so the naive diagonal
    b_f = f_f^H C f_f is a smoothed spectrum (b = G s with Gram
    G_{fg} = |f_f^H f_g|^2 >= 0), not s itself. A checkpoint-resumed
    Barton-Fuhrmann EM needs the generating spectrum, or it restarts from a
    blurred operating point and its lower bound regresses.

    The Gram system is solved with Richardson-Lucy multiplicative updates
    (minimizing KL(b || G s) over s >= 0): C (+ its diagonal jitter, since
    F2^H F2 = I puts c*I in the cone at s = c) is exactly representable
    with a nonnegative spectrum, so the iteration converges to an exact
    recovery. Crucially it is float32-stable on TPU — a pinv of the
    rank-deficient Gram matrix amplifies f32 noise into O(1) covariance
    reconstruction error (measured: up to 94% on SCM checkpoints), while
    200 multiplicative steps reconstruct to <0.5%.
    covs: (K, D, D) Hermitian; f2: (F, D); returns (K, F) >= floor.
    """
    gram = jnp.abs(f2 @ jnp.conj(f2).T) ** 2
    b = jnp.maximum(jnp.real(
        jnp.einsum("fd,kde,fe->kf", f2, covs, jnp.conj(f2))), 0.0)
    gsum = jnp.sum(gram, axis=0)
    tiny = jnp.finfo(b.dtype).tiny

    def body(_, sig):
        ratio = b / jnp.maximum(sig @ gram, tiny)
        return sig * (ratio @ gram) / gsum

    sigma = jax.lax.fori_loop(0, iters, body, jnp.maximum(b, floor))
    return jnp.maximum(sigma, floor)


# ---------------------------------------------------------------------------
# Batched Hermitian solves
# ---------------------------------------------------------------------------

def add_jitter(c: jax.Array, eps: float) -> jax.Array:
    """Add eps to the diagonal of (..., D, D) matrices."""
    d = c.shape[-1]
    return c + eps * jnp.eye(d, dtype=c.dtype)


def chol_lower(c: jax.Array) -> jax.Array:
    """Lower Cholesky factor of Hermitian PSD (..., D, D)."""
    return jnp.linalg.cholesky(c)


def precision_cholesky(c: jax.Array) -> jax.Array:
    """Upper-triangular P with C^{-1} = P P^H, computed as inv(L)^H.

    Returned dense so the E-step is a plain GEMM: for L = chol(C),
    P = (L^{-1})^H and |x^H P|^2 = x^H C^{-1} x. Mirrors sklearn's
    precisions_cholesky_ convention used by the reference
    (`gmm_cplx_bussgang.py:15-52`) but batched instead of per-component loops.
    """
    return prec_from_chol(jnp.linalg.cholesky(c))


def prec_from_chol(l: jax.Array) -> jax.Array:
    """Upper-triangular P = (L^{-1})^H from a lower Cholesky factor L — the
    single encoding of the precision-cholesky convention (shared by
    `precision_cholesky`, `robust_precision_cholesky`, and the estimator
    bank preparation)."""
    d = l.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(d, dtype=l.dtype), l.shape)
    linv = jax.scipy.linalg.solve_triangular(l, eye, lower=True)
    return jnp.conj(jnp.swapaxes(linv, -1, -2))


def _robust_chol(c: jax.Array, base_jitter: float, scales) -> jax.Array:
    """Batched Cholesky with an escalating relative-jitter ladder: each
    matrix is factored at every jitter level (scaled to its mean diagonal)
    and the first finite factorization is selected per matrix."""
    d = c.shape[-1]
    eye = jnp.eye(d, dtype=c.dtype)
    diag_mean = jnp.mean(jnp.real(jnp.diagonal(c, axis1=-2, axis2=-1)),
                         axis=-1)[..., None, None]
    ls = []
    for scale in scales:
        jit_mat = (base_jitter + scale * diag_mean) * eye
        ls.append(jnp.linalg.cholesky(c + jit_mat))
    l = ls[-1]
    for cand in reversed(ls[:-1]):
        bad = jnp.any(jnp.isnan(cand), axis=(-2, -1), keepdims=True)
        l = jnp.where(bad, l, cand)
    return l


def robust_precision_cholesky(c: jax.Array, base_jitter: float = 0.0) -> jax.Array:
    """`precision_cholesky` with escalating relative jitter.

    The reference runs float64 where an absolute reg_covar=1e-6 keeps every
    empirical covariance factorizable; in float32 a rank-deficient component
    (e.g. a tiny k-means cluster in D=64) NaNs. Retry each matrix with jitter
    scaled to its mean diagonal: +0, +1e-4 d, +1e-2 d.
    """
    return prec_from_chol(_robust_chol(c, base_jitter, (0.0, 1e-4, 1e-2)))


def robust_chol_lower(c: jax.Array, base_jitter: float = 0.0) -> jax.Array:
    """Lower Cholesky factor with escalating relative jitter.

    Same selection scheme as `robust_precision_cholesky` but returning L
    itself — used where a coloring factor of a near-singular PSD matrix is
    needed (e.g. sampling from truncated-Toeplitz covariances, which are
    numerically rank-deficient for narrow angular spreads; the reference
    falls back to `scipy.linalg.sqrtm` there, `scm_helper_MIMO.py:113-117`).
    The ladder starts finer than `robust_precision_cholesky`'s (+1e-6 d)
    because a sampling factor tolerates — and benefits from — the smallest
    jitter that factorizes.
    """
    return _robust_chol(c, base_jitter, (0.0, 1e-6, 1e-4, 1e-2))


def logdet_from_prec_chol(p: jax.Array) -> jax.Array:
    """sum(log diag(P)) for upper-triangular precision-cholesky P (real part).

    Equals -1/2 log det(C).
    """
    diag = jnp.real(jnp.diagonal(p, axis1=-2, axis2=-1))
    return jnp.sum(jnp.log(diag), axis=-1)


def cho_solve_hermitian(c: jax.Array, b: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Solve C x = b for Hermitian PSD C (..., D, D), b (..., D) or (..., D, M).

    Cholesky-based: the speed-of-light choice on TPU vs the reference's
    SVD-based `np.linalg.pinv` (`gmm_cplx_bussgang.py:321-323`).
    """
    if jitter:
        c = add_jitter(c, jitter)
    l = jnp.linalg.cholesky(c)
    vec = b.ndim == c.ndim - 1
    if vec:
        b = b[..., None]
    y = jax.scipy.linalg.solve_triangular(l, b, lower=True)
    x = jax.scipy.linalg.solve_triangular(jnp.conj(jnp.swapaxes(l, -1, -2)), y, lower=False)
    return x[..., 0] if vec else x


def hermitian_inv(c: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Dense inverse of Hermitian PSD matrices via Cholesky."""
    d = c.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(d, dtype=c.dtype), c.shape)
    return cho_solve_hermitian(c, eye, jitter=jitter)


def psd_pinv(c: jax.Array, rcond: float = 1e-10) -> jax.Array:
    """Eigh-based pseudo-inverse for Hermitian matrices.

    Fallback for near-singular quantized covariances (the 1-bit arcsine Cr has
    unit diagonal and off-diagonals -> 1 at high SNR); matches the numerical
    role of `np.linalg.pinv` in the reference without a full SVD.
    """
    w, v = jnp.linalg.eigh(c)
    tol = rcond * jnp.max(jnp.abs(w), axis=-1, keepdims=True)
    w_inv = jnp.where(w > tol, 1.0 / w, 0.0).astype(c.dtype)
    return jnp.einsum("...ij,...j,...kj->...ik", v, w_inv, jnp.conj(v))


def psd_project(c: jax.Array, floor: float = 0.0) -> jax.Array:
    """Project Hermitian matrices onto the PSD cone by eigenvalue clipping.

    Used by quantized-EM covariance recovery (`gmm_cplx_quant.py:798-824`).
    """
    w, v = jnp.linalg.eigh(c)
    w = jnp.maximum(w, floor).astype(c.dtype)
    return jnp.einsum("...ij,...j,...kj->...ik", v, w, jnp.conj(v))


def hermitize(c: jax.Array) -> jax.Array:
    """(C + C^H)/2."""
    return 0.5 * (c + jnp.conj(jnp.swapaxes(c, -1, -2)))


def psd_project_polar(c: jax.Array, floor: float = 0.0,
                      iters: int = 40) -> jax.Array:
    """PSD projection via the matrix sign function (Newton-Schulz).

    Same semantics as `psd_project` (eigenvalue clip to `floor`) but
    GEMM-only: max(A, f) = f I + (B + sign(B) B)/2 with B = A - f I, and
    sign(B) from the cubically-convergent iteration X <- X(3I - X^2)/2 on
    B scaled below unit spectral norm (Frobenius bound).

    Motivation: batched `eigh` costs ~26 ms at K=64, D=64 on v5e — half a
    quantized-EM iteration — while 40 Newton-Schulz steps are ~1 ms of MXU
    work. Eigenvalues of magnitude below ~1.5^-iters of the norm do not
    fully saturate; 40 iterations pushes that scale to ~1e-7·||B||, below
    the norm-relative diagonal guard added at the end, so the result stays
    >= floor even for adversarial near-zero negative spectra (covered in
    tests/test_linalg.py; 26 iterations measurably violated the floor).
    Validated against `psd_project` and by full-scale quantized-EM parity.
    """
    d = c.shape[-1]
    eye = jnp.eye(d, dtype=c.dtype)
    b = hermitize(c) - floor * eye
    nrm = jnp.sqrt(jnp.sum(jnp.abs(b) ** 2, axis=(-2, -1), keepdims=True))
    nrm = jnp.maximum(nrm, jnp.finfo(jnp.float32).tiny).astype(b.dtype)
    x0 = b / nrm

    def body(_, x):
        return 0.5 * (x @ (3.0 * eye - x @ x))

    sign = jax.lax.fori_loop(0, iters, body, x0)
    pos = 0.5 * (b + hermitize(sign) @ b)
    # the iteration's float32 error is relative to ||B||; a norm-relative
    # diagonal guard keeps the result PSD with margin >= floor (the eigh
    # path guarantees this exactly)
    guard = (2e-6 * jnp.real(nrm)).astype(c.dtype)
    return hermitize(pos) + (floor + guard) * eye


def _block_reshape(x: jax.Array, blocks):
    n1, n2 = blocks
    return x.reshape(x.shape[:-1] + (n1, n2))


def circulant_diag_spectra(covs: jax.Array, blocks=None) -> jax.Array:
    """Diagonal of F C F^H for the unitary (block-)DFT basis F — i.e. the
    Rayleigh quotients s_f = f_f^H C f_f, which are (a) EXACT eigenvalues
    when C is (block-)circulant in that basis and (b) the Frobenius-optimal
    circulant approximation's spectrum otherwise (keeping the diagonal of a
    matrix in an orthonormal basis is the best diagonal approximation).

    Computed without materializing F: fft over the row index then ifft over
    the column index and take the diagonal — O(D^2 log D) per matrix versus
    the O(D^3) dense congruence. `blocks=(n1, n2)` selects the
    kron(F_{n1}, F_{n2}) basis used by 'block-circulant' fits
    (`gmm._dft_for`). covs (..., D, D) Hermitian -> (..., D) real.
    """
    if blocks is None:
        g = jnp.fft.ifft(jnp.fft.fft(covs, axis=-2), axis=-1)
    else:
        n1, n2 = blocks
        d = covs.shape[-1]
        assert n1 * n2 == d, f"blocks {blocks} incompatible with dim {d}"
        c4 = covs.reshape(covs.shape[:-2] + (n1, n2, n1, n2))
        g = jnp.fft.ifftn(jnp.fft.fftn(c4, axes=(-4, -3)), axes=(-2, -1))
        g = g.reshape(covs.shape)
    return jnp.real(jnp.diagonal(g, axis1=-2, axis2=-1))


def circulant_first_rows(spectra: jax.Array, blocks=None) -> jax.Array:
    """First row C[0, :] of the (block-)circulant matrix
    C = F^H diag(s) F (unitary basis): fft(s)/D (2-D fft for blocks).
    spectra (..., D) real -> (..., D) complex."""
    d = spectra.shape[-1]
    if blocks is None:
        return jnp.fft.fft(spectra.astype(jnp.complex64), axis=-1) / d
    row = jnp.fft.fft2(_block_reshape(spectra.astype(jnp.complex64), blocks))
    return row.reshape(spectra.shape) / d


def circulant_spectra_from_first_rows(rows: jax.Array, blocks=None) -> jax.Array:
    """Inverse of `circulant_first_rows`: s = D * ifft(row0) (real part; a
    Hermitian circulant matrix has a conjugate-symmetric first row, so the
    imaginary residue is rounding noise). rows (..., D) -> (..., D) real."""
    d = rows.shape[-1]
    if blocks is None:
        return jnp.real(jnp.fft.ifft(rows, axis=-1)) * d
    s = jnp.fft.ifft2(_block_reshape(rows, blocks))
    return jnp.real(s).reshape(rows.shape) * d


def best_circulant_approximation(t: jax.Array) -> jax.Array:
    """Eigenvalues (FFT-domain spectrum) of the best circulant approximation
    of the Hermitian Toeplitz matrix with first row t, in the Frobenius norm:
    c_k = sum_m w_m(t) e^{+2 pi i k m / n} (an inverse DFT of the weights —
    see the code comment; the forward-DFT sign would build the conjugate
    matrix) with the standard triangular weighting
    w_m = ((n-m) t_m + m conj(t_{n-m})) / n.

    Spec source: the reference's dead-code `SCM3GPP/toeplitz_helpers.py:57-84`
    (unreachable upstream; reimplemented from the math). Returns the real
    spectrum (n,); the circulant matrix is F^H diag(spec) F.
    """
    n = t.shape[-1]
    m = jnp.arange(n)
    idx = jnp.where(m == 0, 0, n - m)
    w = ((n - m) * t + m * jnp.conj(t[..., idx])) / n
    # C = F^H diag(s) F (unitary F) has first row fft(s)/n -> s = n ifft(w)
    return jnp.real(jnp.fft.ifft(w, axis=-1)) * n
