"""FFT-domain prepared banks: structure-exploiting GMM-Bussgang estimation.

The reference builds circulant/Toeplitz covariance structure during the fit
but DENSIFIES before inference — its estimation path only supports 'full'
covariances (`gmm_cplx_bussgang.py:104-161` builds the structure machinery,
`:317` raises for anything but 'full' at prediction), so every estimate pays
dense O(D^2) per sample and the per-SNR prepare pays K dense D^3 Cholesky
factorizations. This module keeps the WHOLE estimation pipeline in the DFT
eigendomain instead.

Why this is exact for the standard single-pilot setup (A = x0 * I, so the
observation dim M equals the channel dim D): a circulant channel covariance
C = F^H diag(s) F gives

  Cy = |x0|^2 C + sigma^2 I                     -- circulant, spectrum
                                                   sy = |x0|^2 s + sigma^2
  diag(Cy) = mean(sy) * ones                    -- circulant diagonals are
                                                   constant => the Bussgang
                                                   gain matrix is g * I
  Cr = arcsine(Cy)                 [1 bit]      -- elementwise in the matrix
                                                   entries, which depend only
                                                   on (i - j) mod D => still
                                                   circulant
       Cy                          [inf bits]
       b^2 Cy + (1-b^2) diag(Cy)   [n bit]      -- diag(Cy) = c0 * I is
                                                   circulant => spectrum
                                                   b^2 sy + (1-b^2) c0
  W = C (g x0 I)^H Cr^{-1}                      -- product of circulants:
                                                   spectrum g conj(x0) s / sr

so the ENTIRE per-SNR bank is K spectra of length D (memory K*D instead of
K*D^2 dense filters + K*M^2 precision factors) and per-sample estimation is
one FFT + O(K) elementwise/GEMV work + one inverse FFT: O(K D + D log D)
instead of O(K D^2). The responsibilities are computed in the DFT domain via
the diagonal complex-Gaussian density (`gmm.log_prob_diag`) — a unitary
change of basis leaves Gaussian likelihoods invariant, so posteriors (and
hence every selection mode) match the dense path bit-for-bit up to FFT
rounding.

Toeplitz fits ride the same path through their Frobenius-best circulant
approximation (`linalg.circulant_diag_spectra` IS that projection for
non-circulant input); the approximation's MSE cost is measured, not assumed
(tools/structured_bank_bench.py, BASELINE.md).

TPU shape notes: everything is GEMM- or FFT-shaped — the responsibilities
are three (N, D) x (D, K) GEMMs, the combine is two (N, K) x (K, D) GEMMs
plus an elementwise multiply, and XLA lowers the batched FFTs natively. No
(N, K, D) intermediate ever exists (the dense path's memory bound), so no
sample chunking is needed for memory — chunking here only bounds the (N, K)
logit tensor.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from quantized_channel_estimation_tpu.models.gmm import GmmParams
from quantized_channel_estimation_tpu.models.gmm_estimator import (
    _selection_weights)
from quantized_channel_estimation_tpu.ops import cplx, linalg
from quantized_channel_estimation_tpu.ops.bussgang import bussgang_gain_diag
from quantized_channel_estimation_tpu.ops.precision import highest_precision
from quantized_channel_estimation_tpu.ops.quantizer import (
    ScalarQuantizer, is_inf_bits)


class CirculantBank(NamedTuple):
    """Per-SNR prepared bank with (block-)circulant component covariances,
    entirely in the unitary-DFT eigendomain. K components, D dims.

    The matrix quantities of `gmm_estimator.PreparedBank` collapse to
    spectra: `spec_cr` replaces the (K, M, M) precision Cholesky factors,
    `filt_f` the (K, D, M) dense LMMSE filters. Total bank memory is
    O(K D) instead of O(K D^2)."""
    log_weights: jax.Array   # (K,) f32; dead components at -inf
    mean_rf: jax.Array       # (K, D) complex: F (B A mu)  (DFT of obs mean)
    spec_cr: jax.Array       # (K, D) f32: eigenvalues of Cr (jittered)
    filt_f: jax.Array        # (K, D) complex: eigenvalues of W
    bias_f: jax.Array        # (K, D) complex: F mu - filt_f * mean_rf


def _pilot_scalar(a, d: int):
    """Extract x0 from a scalar or an (M, M) = x0*I pilot matrix.

    The structured path is only exact for A proportional to the identity
    (the standard P=1 pilot); a concrete non-scaled-identity matrix is
    rejected loudly instead of silently producing approximate answers."""
    a = jnp.asarray(a)
    if a.ndim == 0:
        return a.astype(jnp.complex64)
    if a.ndim != 2 or a.shape[0] != a.shape[1] or a.shape[0] != d:
        raise ValueError(
            f"structured banks need A = x0*I with M = D = {d}; got pilot "
            f"shape {a.shape} (multi-pilot observations densify Cy — use "
            "gmm_estimator.prepare_bank)")
    if not isinstance(a, jax.core.Tracer):
        an = np.asarray(a)
        x0 = an[0, 0]
        if not np.allclose(an, x0 * np.eye(d), atol=1e-6 * max(1.0, abs(x0))):
            raise ValueError(
                "structured banks need A = x0*I (scaled identity); the "
                "given pilot matrix is not — use gmm_estimator.prepare_bank")
    return a[0, 0].astype(jnp.complex64)


def _pilot_vector(a, d: int) -> jax.Array:
    """Extract the pilot vector x (P,) from a scalar, x0*I, or the
    reference's kron(x, I_d) multi-pilot matrix (`utils.py:366`,
    `ops.pilots.pilot_matrix`). Raises for any other structure — the
    structured path's per-bin algebra needs exactly this form."""
    a = jnp.asarray(a)
    if a.ndim == 0:
        return a.reshape(1).astype(jnp.complex64)
    if a.ndim != 2 or a.shape[1] != d or a.shape[0] % d:
        raise ValueError(
            f"structured banks need A = kron(x, I_{d}); got pilot shape "
            f"{a.shape} — use gmm_estimator.prepare_bank")
    p = a.shape[0] // d
    # candidate x: the (i*d, 0) entries of the kron structure
    x = a[::d, 0] if p > 1 else a[None, 0, 0]
    x = x.reshape(p)
    if not isinstance(a, jax.core.Tracer):
        an = np.asarray(a)
        xn = np.asarray(x)
        want = np.kron(xn[:, None], np.eye(d))
        scale = max(1.0, float(np.abs(xn).max()))
        if not np.allclose(an, want, atol=1e-6 * scale):
            raise ValueError(
                "structured banks need A = kron(x, I) (the reference pilot "
                "form); the given matrix is not — use "
                "gmm_estimator.prepare_bank")
    return x.astype(jnp.complex64)


def spectra_from_params(params: GmmParams, blocks=None) -> jax.Array:
    """Channel-covariance spectra (K, D) from fitted dense parameters.

    Exact (up to f32 rounding) for 'circulant'/'block-circulant' fits —
    `gmm.fit` builds those covariances as F^H diag(s) F and this recovers s;
    for 'toeplitz' (or any other) fits it returns the Frobenius-best
    circulant approximation's spectrum (`linalg.circulant_diag_spectra`)."""
    return jnp.maximum(linalg.circulant_diag_spectra(params.covariances,
                                                     blocks), 0.0)


@partial(jax.jit, static_argnums=(3, 6))
@highest_precision
def _prepare_circulant(spectra, means, weights, n_bits, x0, sigma2,
                       blocks, q, jitter, weight_floor_rel) -> CirculantBank:
    k, d = spectra.shape
    sy = jnp.abs(x0) ** 2 * spectra + sigma2          # (K, D) Cy spectrum
    c0 = jnp.mean(sy, axis=-1)                        # (K,) diag(Cy) value
    if is_inf_bits(n_bits):
        gains = jnp.ones_like(c0)
        spec_cr = sy
    elif n_bits == 1:
        gains = bussgang_gain_diag(c0, 1)
        # arcsine law in lag domain: the map is elementwise in the matrix
        # ENTRIES, so apply it to the first row of Cy/c0 and transform back
        # (`bussgang.arcsine_cov` on the dense matrix does the same entries)
        row_y = linalg.circulant_first_rows(sy, blocks) / c0[:, None].astype(
            jnp.complex64)
        row_r = (2.0 / jnp.pi) * (
            jnp.arcsin(jnp.clip(jnp.real(row_y), -1.0, 1.0))
            + 1j * jnp.arcsin(jnp.clip(jnp.imag(row_y), -1.0, 1.0)))
        spec_cr = jnp.maximum(
            linalg.circulant_spectra_from_first_rows(row_r, blocks), 0.0)
    else:
        gains = bussgang_gain_diag(c0, n_bits, q)
        beta2 = jnp.clip(gains, 0.0, 1.0)[:, None] ** 2
        spec_cr = beta2 * sy + (1.0 - beta2) * c0[:, None]
    spec_cr = spec_cr + jitter                        # matches add_jitter
    ax = gains.astype(jnp.complex64)[:, None] * x0    # A_eff = g x0 I
    mu_f = unitary_fft(means, blocks)
    mean_rf = ax * mu_f                               # F (g x0 mu)
    # W = C A_eff^H Cr^{-1}: spectrum g conj(x0) s / s_r
    filt_f = jnp.conj(ax) * (spectra / spec_cr).astype(jnp.complex64)
    bias_f = mu_f - filt_f * mean_rf
    floor = weight_floor_rel / k
    logw = jnp.where(weights >= floor,
                     jnp.log(jnp.maximum(weights, floor)), -jnp.inf)
    return CirculantBank(logw.astype(jnp.float32), mean_rf,
                         jnp.real(spec_cr).astype(jnp.float32), filt_f,
                         bias_f)


def prepare_bank_circulant(params: GmmParams, snr_db, a, n_bits,
                           q: Optional[ScalarQuantizer] = None,
                           jitter: float = 1e-6,
                           weight_floor_rel: float = 1e-2,
                           blocks=None,
                           spectra: Optional[jax.Array] = None
                           ) -> CirculantBank:
    """Structured analog of `gmm_estimator.prepare_bank` for
    (block-)circulant component covariances and a scaled-identity pilot.

    Same Bussgang observation model and the same dead-component weight
    floor; `spectra` short-circuits the extraction when the caller kept the
    fit's DFT spectra. Prepare cost is O(K D log D) given spectra
    (O(K D^2 log D) extracting them from dense covariances) versus the
    dense path's K D^3 Cholesky factorizations; bank memory is O(K D)
    versus O(K D^2).

    Multi-pilot observations A = kron(x, I_D) with P > 1 (round-5) return
    a `CirculantBankMP` instead — the per-bin P x P LMMSE factorization,
    exact for every bit-width (see the class docstring); `estimate_circulant`
    dispatches on the bank type."""
    d = params.means.shape[-1]
    x = _pilot_vector(a, d)
    if spectra is None:
        spectra = spectra_from_params(params, blocks)
    sigma2 = 10.0 ** (-jnp.asarray(snr_db, jnp.float32) / 10.0)
    if x.shape[0] > 1:
        return _prepare_circulant_mp(spectra, params.means, params.weights,
                                     n_bits, x, sigma2, blocks, q, jitter,
                                     weight_floor_rel)
    return _prepare_circulant(spectra, params.means, params.weights, n_bits,
                              x.reshape(()), sigma2, blocks, q, jitter,
                              weight_floor_rel)


# ---------------------------------------------------------------------------
# unitary (block-)DFT data transforms
# ---------------------------------------------------------------------------

def unitary_fft(x: jax.Array, blocks=None) -> jax.Array:
    """u = F x along the last axis for the unitary (block-)DFT F that
    diagonalizes 'circulant' (`linalg.unitary_dft`) / 'block-circulant'
    (kron of two) covariances: fft/sqrt(D), 2-D fft for blocks."""
    d = x.shape[-1]
    if blocks is None:
        return jnp.fft.fft(x, axis=-1) / jnp.sqrt(d).astype(jnp.float32)
    n1, n2 = blocks
    u = jnp.fft.fft2(x.reshape(x.shape[:-1] + (n1, n2)))
    return u.reshape(x.shape) / jnp.sqrt(d).astype(jnp.float32)


def unitary_ifft(u: jax.Array, blocks=None) -> jax.Array:
    """x = F^H u (inverse of `unitary_fft`)."""
    d = u.shape[-1]
    if blocks is None:
        return jnp.fft.ifft(u, axis=-1) * jnp.sqrt(d).astype(jnp.float32)
    n1, n2 = blocks
    x = jnp.fft.ifft2(u.reshape(u.shape[:-1] + (n1, n2)))
    return x.reshape(u.shape) * jnp.sqrt(d).astype(jnp.float32)


def _dft_matrix(d: int, blocks) -> jax.Array:
    if blocks is None:
        return linalg.unitary_dft(d)
    return jnp.kron(linalg.unitary_dft(blocks[0]),
                    linalg.unitary_dft(blocks[1]))


def _resolve_method(method: str) -> str:
    """'auto' -> 'fft' for the chunked XLA pipeline ('all'-mode flat-basis
    requests on TPU short-circuit to the fused Pallas kernel BEFORE this
    resolution — see `estimate_circulant`). Measured on-chip with
    DEVICE-RESIDENT
    inputs (2026-08-21, medians of 5 amortized roll-trick programs): at
    D=64/K=64 the two lowerings tie (18.4 M est/s both) and at D=1024/K=8
    the FFT wins 1.33 M vs 0.91 M est/s — the O(D log D) asymptotics are
    real on TPU. ('dft' — one (N, 2D)x(2D, 2D) f32 MXU GEMM per transform
    via the 2x2 block embedding — remains selectable; an earlier session
    concluded the TPU FFT was ~1000x slow, but that measurement fed HOST
    numpy arrays to every timed call, so it was clocking a 128 MB tunnel
    re-transfer per call, not the FFT. Keep bench inputs device-resident —
    CLAUDE.md.)"""
    if method != "auto":
        return method
    return "fft"


def _fwd(x: jax.Array, blocks, method: str) -> jax.Array:
    if method == "fft":
        return unitary_fft(x, blocks)
    f = _dft_matrix(x.shape[-1], blocks)
    return cplx.cmatmul(x, f.T)           # row convention: (F x) = x @ F^T


def _inv(u: jax.Array, blocks, method: str) -> jax.Array:
    if method == "fft":
        return unitary_ifft(u, blocks)
    f = _dft_matrix(u.shape[-1], blocks)
    return cplx.cmatmul(u, jnp.conj(f))   # (F^H u) = u @ conj(F)


def _split_blocks(f_t: jax.Array):
    """(2D, 2D) real block embedding of right-multiplication by a complex
    matrix: [xr xi] @ [[Re, Im], [-Im, Re]] = [Re(x@f) Im(x@f)]."""
    top = jnp.concatenate([jnp.real(f_t), jnp.imag(f_t)], axis=-1)
    bot = jnp.concatenate([-jnp.imag(f_t), jnp.real(f_t)], axis=-1)
    return jnp.concatenate([top, bot], axis=-2).astype(jnp.float32)


class _SplitBank(NamedTuple):
    """All chunk-loop constants of the split-real DFT pipeline, prepared
    ONCE outside the `lax.scan` body (a (2D, 2D) block-matrix construction
    inside the scan is not guaranteed to be hoisted by the backend):
    fwd/inv transform blocks, split log-prob coefficients, and the stacked
    [Re, Im] combine matrices."""
    b_fwd: jax.Array      # (2D, 2D) f32: right-mult by F^T
    b_inv: jax.Array      # (2D, 2D) f32: right-mult by conj(F)
    prec_t: jax.Array     # (D, K) f32
    cm_re_t: jax.Array    # (D, K) f32: Re(conj(mean) * prec)^T
    cm_im_t: jax.Array    # (D, K) f32: Im(conj(mean) * prec)^T
    const_k: jax.Array    # (K,) f32: logw - mu2 + logdet - D log pi
    bias2: jax.Array      # (K, 2D) f32: [Re bias_f, Im bias_f]
    filt2: jax.Array      # (K, 2D) f32: [Re filt_f, Im filt_f]


def _split_bank(bank: CirculantBank, d: int, blocks) -> _SplitBank:
    f = _dft_matrix(d, blocks)
    prec = 1.0 / bank.spec_cr
    cm = jnp.conj(bank.mean_rf) * prec
    mu2 = jnp.sum(jnp.abs(bank.mean_rf) ** 2 * prec, axis=-1)
    logdet = -jnp.sum(jnp.log(bank.spec_cr), axis=-1)
    const = (bank.log_weights - mu2 + logdet
             - d * jnp.log(jnp.pi)).astype(jnp.float32)
    pack = lambda x: jnp.concatenate(
        [jnp.real(x), jnp.imag(x)], axis=-1).astype(jnp.float32)
    return _SplitBank(_split_blocks(f.T), _split_blocks(jnp.conj(f)),
                      prec.T.astype(jnp.float32),
                      jnp.real(cm).T.astype(jnp.float32),
                      jnp.imag(cm).T.astype(jnp.float32),
                      const, pack(bank.bias_f), pack(bank.filt_f))


def _estimate_chunk_split(sb_: _SplitBank, x2d: jax.Array, mode,
                          d: int) -> jax.Array:
    """One chunk fully in split-real form: x2d (n, 2D) = [Re r, Im r] ->
    (n, 2D) = [Re h, Im h]. Every matmul is an f32 MXU GEMM; complex
    arithmetic appears only as the elementwise filter application."""
    u = x2d @ sb_.b_fwd                                   # (n, 2D)
    ur, ui = u[:, :d], u[:, d:]
    x2 = (ur * ur + ui * ui) @ sb_.prec_t                 # (n, K)
    cross = ur @ sb_.cm_re_t - ui @ sb_.cm_im_t           # Re(u conj(m) p)
    logits = sb_.const_k[None, :] + 2.0 * cross - x2
    proba = jax.nn.softmax(logits, axis=-1)
    w = _selection_weights(proba, mode).astype(jnp.float32)
    bias = w @ sb_.bias2                                  # (n, 2D)
    filt = w @ sb_.filt2
    fr, fi = filt[:, :d], filt[:, d:]
    hr = bias[:, :d] + fr * ur - fi * ui
    hi = bias[:, d:] + fr * ui + fi * ur
    return jnp.concatenate([hr, hi], axis=-1) @ sb_.b_inv


def _log_prob_diag_split(u: jax.Array, means: jax.Array,
                         variances: jax.Array) -> jax.Array:
    """`gmm.log_prob_diag` restated with explicitly-real GEMMs (see
    `cplx.cmatmul`): |u|^2 @ prec^T is real, and the cross term only needs
    Re(u @ (conj(mu) prec)^T) — two real GEMMs via `cmatmul_realout`."""
    d = u.shape[-1]
    prec = 1.0 / variances                                    # (K, D)
    mu2 = jnp.sum(jnp.abs(means) ** 2 * prec, axis=-1)        # (K,)
    cross = cplx.cmatmul_realout(u, (jnp.conj(means) * prec).T)
    x2 = (jnp.real(u) ** 2 + jnp.imag(u) ** 2) @ prec.T
    quad = mu2[None, :] - 2.0 * cross + x2
    logdet = -jnp.sum(jnp.log(variances), axis=-1)
    return -(d * jnp.log(jnp.pi) + quad) + logdet[None, :]


# ---------------------------------------------------------------------------
# estimation
# ---------------------------------------------------------------------------

def _estimate_chunk_f(bank: CirculantBank, u: jax.Array, mode) -> jax.Array:
    """One chunk in the DFT domain: u (n, D) -> H (n, D) (still DFT-domain).

    Unitary invariance: log CN(r; mu_r, Cr) = log CN(F r; F mu_r, diag(s_r)),
    so the posteriors equal the dense path's exactly."""
    lp = _log_prob_diag_split(u, bank.mean_rf, bank.spec_cr)
    proba = jax.nn.softmax(lp + bank.log_weights[None, :], axis=-1)
    w = _selection_weights(proba, mode).astype(jnp.float32)
    # h_f = sum_k w_k (bias_f,k + filt_k * u): two real-embedded
    # (n, K) x (K, D) GEMMs (`cplx.rcmatmul` — w is real)
    return cplx.rcmatmul(w, bank.bias_f) + cplx.rcmatmul(w, bank.filt_f) * u


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
@highest_precision
def estimate_circulant(bank: CirculantBank, r: jax.Array,
                       mode: Union[str, int, float] = "all",
                       chunk_size: int = 16384,
                       blocks=None, method: str = "auto") -> jax.Array:
    """Estimate channels from quantized observations r (N, M) -> (N, D)
    through the FFT-domain bank: the structured analog of
    `gmm_estimator.estimate` (identical posterior semantics and selection
    modes; matches the dense estimator to FFT rounding on circulant fits).

    O(N (K D + D log D)) total with method='fft' (O(N D^2) MXU work with
    the TPU-default method='dft', still a factor-K FLOP reduction over the
    dense path's O(N K D^2) — see `_resolve_method`); no (N, K, D)
    intermediate exists, so the chunking only bounds the (chunk, K) logit
    tensor.

    Multi-pilot banks (`CirculantBankMP`, P > 1) route to the per-bin
    P x P pipeline (`estimate_circulant_mp`)."""
    if isinstance(bank, CirculantBankMP):
        return estimate_circulant_mp(bank, r, mode,
                                     min(chunk_size, 8192), blocks,
                                     method)
    d_ = r.shape[-1]
    k_ = bank.log_weights.shape[0]
    # resident-bank VMEM rule (CLAUDE.md): the kernel's constants — two
    # (2D, D) forward blocks, the (2D, 2D) inverse block, (3D, K) logit
    # coefficients, 4 (K, D) combine mats — must fit the ~13 MiB scoped
    # budget; beyond that (D >= ~640) the chunked XLA pipeline takes over
    kernel_bytes = 4 * (8 * d_ * d_ + 3 * d_ * k_ + 4 * k_ * d_ + 2 * k_)
    kernel_ok = (mode == "all" and kernel_bytes <= 13 * 1024 * 1024)
    if method == "kernel" or (method == "auto" and kernel_ok
                              and jax.default_backend() == "tpu"):
        if not kernel_ok:
            raise ValueError("method='kernel' supports mode='all' within "
                             "the VMEM budget (got "
                             f"mode={mode!r}, bank bytes {kernel_bytes})")
        # single-pass fused Pallas kernel: +16% over the XLA pipeline on
        # v5e (21.2 vs 18.3 M est/s at D=64/K=64) with the whole bank
        # VMEM-resident; 0.3-0.4% elementwise vs XLA on-chip =
        # softmax-amplified f32 accumulation-order noise, quality-neutral
        # (NMSE-vs-truth equal/marginally better —
        # results/parity_r4/circ_kernel_onchip.log)
        from quantized_channel_estimation_tpu.estimators import (
            pallas_kernels as pk)
        return pk.estimate_fused_circulant(
            bank, r, interpret=jax.default_backend() != "tpu",
            blocks=blocks)
    method = _resolve_method(method)
    n, d = r.shape
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n
    if method == "dft":
        # fully split-real pipeline: split once, scan f32 chunks, join once
        sb_ = _split_bank(bank, d, blocks)
        x2d = jnp.concatenate(
            [jnp.real(r), jnp.imag(r)], axis=-1).astype(jnp.float32)
        xp = jnp.pad(x2d, ((0, pad), (0, 0))).reshape(n_chunks, chunk_size,
                                                      2 * d)
        out = jax.lax.map(
            lambda xc: _estimate_chunk_split(sb_, xc, mode, d), xp)
        out = out.reshape(n_chunks * chunk_size, 2 * d)[:n]
        return (out[:, :d] + 1j * out[:, d:]).astype(r.dtype)
    rp = jnp.pad(r, ((0, pad), (0, 0))).reshape(n_chunks, chunk_size, -1)

    def one(rc):
        u = _fwd(rc, blocks, method)
        return _inv(_estimate_chunk_f(bank, u, mode), blocks, method)

    out = jax.lax.map(one, rp)
    return out.reshape(n_chunks * chunk_size, -1)[:n].astype(r.dtype)


def _estimate_coherent_chunk_f(bank: CirculantBank, u: jax.Array, mode,
                               alpha: float) -> jax.Array:
    """One chunk of DFT-domain coherence blocks u (B, T, D) -> (B, T, D).

    Same block-pooled posterior / leave-one-out alpha blend as
    `gmm_estimator._estimate_coherent_chunk` — only the likelihood and the
    per-component combine are diagonal here."""
    b, t, d = u.shape
    lp3 = _log_prob_diag_split(u.reshape(b * t, d), bank.mean_rf,
                               bank.spec_cr).reshape(b, t, -1)
    lp_sum = jnp.sum(lp3, axis=1)
    if alpha >= 1.0:
        proba = jax.nn.softmax(lp_sum + bank.log_weights[None, :], axis=-1)
        w = _selection_weights(proba, mode).astype(jnp.float32)  # (B, K)
        return cplx.rcmatmul(w, bank.bias_f)[:, None, :] \
            + cplx.rcmatmul(w, bank.filt_f)[:, None, :] * u
    lg = lp3 + alpha * (lp_sum[:, None, :] - lp3) \
        + bank.log_weights[None, None, :]
    proba = jax.nn.softmax(lg, axis=-1)
    w = _selection_weights(proba, mode).astype(jnp.float32)      # (B, T, K)
    return cplx.rcmatmul(w, bank.bias_f) \
        + cplx.rcmatmul(w, bank.filt_f) * u


def _stats_chunk_f(bank: CirculantBank, u: jax.Array):
    """Un-normalized online-softmax estimation state over THIS bank's
    components for one DFT-domain chunk u (n, D) — the structured analog of
    `gmm_estimator._stats_chunk`. Logits include the component log-weight
    and log-determinant (both component-specific, so shard-consistent);
    dead components (-inf weight) clamp to -1e30 like the dense path."""
    lp = _log_prob_diag_split(u, bank.mean_rf, bank.spec_cr)
    logits = (lp + jnp.maximum(bank.log_weights, -1e30)[None, :]).astype(
        jnp.float32)
    m = jnp.max(logits, axis=-1)
    p = jnp.exp(logits - m[:, None])
    den = jnp.sum(p, axis=-1)
    acc = cplx.rcmatmul(p, bank.bias_f) + cplx.rcmatmul(p, bank.filt_f) * u
    return m, den, acc


@partial(jax.jit, static_argnums=(2, 3, 4))
@highest_precision
def estimate_circulant_stats(bank: CirculantBank, r: jax.Array,
                             chunk_size: int = 16384, blocks=None,
                             method: str = "auto"):
    """'all'-mode estimation state (m, den, acc) for a (component shard of
    a) circulant bank: merging shard states with pmax/psum (or
    `pallas_kernels.merge_stats`) and taking acc/den reproduces the full
    `estimate_circulant(..., 'all')` in the DFT DOMAIN — apply
    `unitary_ifft` to the merged quotient (the inverse transform commutes
    with the per-row normalization, so it runs ONCE after the merge).
    Shapes: m (N,) f32, den (N,) f32, acc (N, D) complex (DFT domain)."""
    method = _resolve_method(method)
    n = r.shape[0]
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n
    rp = jnp.pad(r, ((0, pad), (0, 0))).reshape(n_chunks, chunk_size, -1)
    m, den, acc = jax.lax.map(
        lambda rc: _stats_chunk_f(bank, _fwd(rc, blocks, method)), rp)
    return (m.reshape(-1)[:n], den.reshape(-1)[:n],
            acc.reshape(n_chunks * chunk_size, -1)[:n])


def _coherent_stats_chunk_f(bank: CirculantBank, u: jax.Array,
                            alpha: float):
    """Block online-softmax state for DFT-domain coherence blocks
    u (B, T, D): structured analog of
    `gmm_estimator._coherent_stats_chunk` (same per-block/per-snapshot
    state convention and merge semantics)."""
    b, t, d = u.shape
    lp3 = _log_prob_diag_split(u.reshape(b * t, d), bank.mean_rf,
                               bank.spec_cr).reshape(b, t, -1)
    lw = jnp.maximum(bank.log_weights, -1e30)
    lp_sum = jnp.sum(lp3, axis=1)
    if alpha >= 1.0:
        logits = (lw[None, :] + lp_sum).astype(jnp.float32)     # (B, K)
        m = jnp.max(logits, axis=-1)
        p = jnp.exp(logits - m[:, None])
        den = jnp.sum(p, axis=-1)
        acc = cplx.rcmatmul(p, bank.bias_f)[:, None, :] \
            + cplx.rcmatmul(p, bank.filt_f)[:, None, :] * u
        return m, den, acc
    lg = (lw[None, None, :] + lp3
          + alpha * (lp_sum[:, None, :] - lp3)).astype(jnp.float32)
    m = jnp.max(lg, axis=-1)                                    # (B, T)
    p = jnp.exp(lg - m[..., None])
    den = jnp.sum(p, axis=-1)
    acc = cplx.rcmatmul(p, bank.bias_f) + cplx.rcmatmul(p, bank.filt_f) * u
    return m, den, acc


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
@highest_precision
def estimate_circulant_coherent_stats(bank: CirculantBank, r: jax.Array,
                                      chunk_size: int = 4096,
                                      alpha: float = 1.0, blocks=None,
                                      method: str = "auto"):
    """BLOCK estimation state for circulant banks over coherence blocks
    r (B, T, M): per-block (m, den) at alpha=1, per-snapshot below, acc
    (B, T, D) complex in the DFT domain — merge across component shards
    with the identical pmax/psum recurrence as the dense coherent stats,
    then `unitary_ifft` the quotient once."""
    if r.ndim != 3:
        raise ValueError(f"expected (B, T, M) blocks, got {r.shape}")
    method = _resolve_method(method)
    n = r.shape[0]
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n
    rp = jnp.pad(r, ((0, pad), (0, 0), (0, 0)))
    rp = rp.reshape(n_chunks, chunk_size, r.shape[1], r.shape[2])
    m, den, acc = jax.lax.map(
        lambda rc: _coherent_stats_chunk_f(
            bank, _fwd(rc, blocks, method), alpha), rp)
    lead = (-1,) if alpha >= 1.0 else (-1, r.shape[1])
    return (m.reshape(lead)[:n], den.reshape(lead)[:n],
            acc.reshape(n_chunks * chunk_size, r.shape[1], -1)[:n])


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
@highest_precision
def estimate_circulant_coherent(bank: CirculantBank, r: jax.Array,
                                mode: Union[str, int, float] = "all",
                                chunk_size: int = 4096,
                                alpha: float = 1.0,
                                blocks=None, method: str = "auto"
                                ) -> jax.Array:
    """Joint estimation of coherence blocks r (B, T, M) -> (B, T, D) through
    the FFT-domain bank: structured analog of
    `gmm_estimator.estimate_coherent` including the alpha evidence blend
    (alpha=0 is exactly the independent per-snapshot estimator)."""
    if r.ndim != 3:
        raise ValueError(f"estimate_circulant_coherent expects (B, T, M) "
                         f"blocks, got shape {r.shape}")
    if isinstance(bank, CirculantBankMP):
        return estimate_circulant_mp_coherent(bank, r, mode,
                                              min(chunk_size, 2048),
                                              alpha, blocks, method)
    d_ = r.shape[-1]
    k_ = bank.log_weights.shape[0]
    t_ = r.shape[1]
    kernel_bytes = 4 * (8 * d_ * d_ + 3 * d_ * k_ + 4 * k_ * d_ + 2 * k_)
    # same eligibility as the flat kernel, plus the hardware-validated
    # T <= 16 in-kernel pooling range (pallas_kernels._check_t_coh;
    # T=16 calibrated quality-neutral on a real fit —
    # results/parity_r4/t16_calibration.log)
    kernel_ok = (mode == "all" and 1 <= t_ <= 16
                 and kernel_bytes <= 13 * 1024 * 1024)
    if method == "kernel" or (method == "auto" and kernel_ok
                              and jax.default_backend() == "tpu"):
        if not kernel_ok:
            raise ValueError("method='kernel' needs mode='all', T <= 16, "
                             f"and the VMEM budget (got mode={mode!r}, "
                             f"T={t_}, bank bytes {kernel_bytes})")
        from quantized_channel_estimation_tpu.estimators import (
            pallas_kernels as pk)
        return pk.estimate_fused_circulant_coherent(
            bank, r, alpha=alpha,
            interpret=jax.default_backend() != "tpu", blocks=blocks)
    method = _resolve_method(method)
    n = r.shape[0]
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n
    rp = jnp.pad(r, ((0, pad), (0, 0), (0, 0)))
    rp = rp.reshape(n_chunks, chunk_size, r.shape[1], r.shape[2])

    def one(rc):
        u = _fwd(rc, blocks, method)
        return _inv(_estimate_coherent_chunk_f(bank, u, mode, alpha),
                    blocks, method)

    out = jax.lax.map(one, rp)
    return out.reshape(n_chunks * chunk_size, r.shape[1], -1)[:n].astype(
        r.dtype)


# ---------------------------------------------------------------------------
# multi-pilot (P > 1) structured banks: per-bin P x P LMMSE (round-5)
# ---------------------------------------------------------------------------

class CirculantBankMP(NamedTuple):
    """Per-SNR prepared bank for (block-)circulant component covariances
    under the reference's MULTI-pilot observation A = kron(x, I_D)
    (`utils.py:366`), x a (P,) pilot vector. K components, D dims.

    The kron pilot maps each DFT bin to a P-vector: with Ch = F^H diag(s) F,
    every PD x PD quantity (Cy, the Bussgang Cr under ALL three maps, W)
    is block-structured with circulant D x D blocks, so (I_P (x) F)
    simultaneously diagonalizes the blocks and the estimator factorizes
    into D independent P x P problems:

      Cy_f      = s_f x x^H + sigma^2 I_P
      Cr_f      = Cy_f                                   [inf]
                  beta^2 Cy_f + diag((1-beta^2) d_i)     [n bit]
                  per-block-pair arcsine spectra          [1 bit]
                  (the arcsine law is elementwise in the ENTRIES of each
                   circulant block, so block (i, j) stays circulant with
                   eigenvalues D*ifft(arcsine(first row)) — complex for
                   i != j)
      W_f       = s_f (g (.) x)^H Cr_f^{-1}              (1 x P row)

    with d_i = |x_i|^2 mean(s) + sigma^2 the (block-constant) diag(Cy) and
    g_i the per-block Bussgang gains. Bank memory O(K D P^2) vs the dense
    path's O(K (PD)^2 + K D PD); prepare cost K D P^3 batched Cholesky vs
    K (PD)^3. Matches `gmm_estimator.prepare_bank` + `estimate` to f32/FFT
    rounding (parity-tested at P in {2, 4})."""
    log_weights: jax.Array   # (K,) f32; dead components at -inf
    mean_rf: jax.Array       # (K, D, P) complex: per-bin DFT obs mean
    prec_f: jax.Array        # (K, D, P, P) complex: per-bin Cr_f^{-1}
    logdet: jax.Array        # (K,) f32: sum_f log det Cr_f
    filt_f: jax.Array        # (K, D, P) complex: per-bin W row
    bias_f: jax.Array        # (K, D) complex


@partial(jax.jit, static_argnums=(3, 6))
@highest_precision
def _prepare_circulant_mp(spectra, means, weights, n_bits, x, sigma2,
                          blocks, q, jitter,
                          weight_floor_rel) -> CirculantBankMP:
    k, d = spectra.shape
    p = x.shape[0]
    cbar = jnp.mean(spectra, axis=-1)                     # (K,) diag(Ch)
    di = jnp.abs(x)[None, :] ** 2 * cbar[:, None] + sigma2  # (K, P)
    xxh = x[:, None] * jnp.conj(x)[None, :]               # (P, P)
    eye_p = jnp.eye(p, dtype=jnp.complex64)
    s_c = spectra.astype(jnp.complex64)
    if is_inf_bits(n_bits):
        gains = jnp.ones_like(di)
        cr_f = (s_c[:, :, None, None] * xxh
                + sigma2.astype(jnp.complex64) * eye_p)
    elif n_bits == 1:
        gains = bussgang_gain_diag(di, 1)
        # per-block-pair arcsine: first row of block (i, j) of Cy is
        # x_i conj(x_j) c_row + sigma^2 delta_ij e0; normalize by
        # sqrt(d_i d_j), arcsine the ENTRIES, then the block's (complex)
        # eigenvalues are D * ifft of the mapped row — all in the SAME
        # DFT basis (`bussgang.arcsine_cov` on the dense matrix maps the
        # same entries)
        c_row = linalg.circulant_first_rows(spectra, blocks)  # (K, D)
        e0 = jnp.zeros((d,), jnp.complex64).at[0].set(1.0)
        row_y = (x[None, :, None, None] * jnp.conj(x)[None, None, :, None]
                 * c_row[:, None, None, :]
                 + sigma2.astype(jnp.complex64)
                 * eye_p[None, :, :, None] * e0[None, None, None, :])
        den = jnp.sqrt(di[:, :, None] * di[:, None, :])[..., None]
        row_n = row_y / den.astype(jnp.complex64)
        row_r = (2.0 / jnp.pi) * (
            jnp.arcsin(jnp.clip(jnp.real(row_n), -1.0, 1.0))
            + 1j * jnp.arcsin(jnp.clip(jnp.imag(row_n), -1.0, 1.0)))
        if blocks is None:
            lam = jnp.fft.ifft(row_r, axis=-1) * d        # (K, P, P, D)
        else:
            n1, n2 = blocks
            lam = jnp.fft.ifft2(row_r.reshape(k, p, p, n1, n2))
            lam = lam.reshape(k, p, p, d) * d
        cr_f = jnp.moveaxis(lam, -1, 1)                   # (K, D, P, P)
    else:
        gains = bussgang_gain_diag(di, n_bits, q)         # (K, P)
        beta = jnp.clip(jnp.mean(gains, axis=-1), 0.0, 1.0)  # (K,)
        b2 = (beta ** 2)[:, None].astype(jnp.complex64)
        cy_f = (s_c[:, :, None, None] * xxh
                + sigma2.astype(jnp.complex64) * eye_p)   # (K, D, P, P)
        diag_part = ((1.0 - beta[:, None] ** 2) * di)      # (K, P)
        cr_f = (b2[:, :, None, None] * cy_f
                + diag_part[:, None, :, None].astype(jnp.complex64) * eye_p)
    cr_f = linalg.hermitize(cr_f) + jitter * eye_p
    chol = jnp.linalg.cholesky(cr_f)                      # (K, D, P, P)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.real(jnp.diagonal(
        chol, axis1=-2, axis2=-1))), axis=(-2, -1)).astype(jnp.float32)
    # P x P inverse via the Cholesky (P is tiny)
    inv_l = jax.scipy.linalg.solve_triangular(
        chol, jnp.broadcast_to(eye_p, chol.shape), lower=True)
    prec_f = jnp.conj(jnp.swapaxes(inv_l, -1, -2)) @ inv_l
    prec_f = linalg.hermitize(prec_f)

    gx = gains.astype(jnp.complex64) * x[None, :]         # (K, P)
    mu_f = unitary_fft(means, blocks)                     # (K, D)
    mean_rf = gx[:, None, :] * mu_f[:, :, None]           # (K, D, P)
    # W row per bin: s_f conj(gx) @ prec_f
    filt_f = s_c[:, :, None] * jnp.einsum(
        "kp,kdpq->kdq", jnp.conj(gx), prec_f)
    bias_f = mu_f * (1.0 - jnp.einsum("kdp,kp->kd", filt_f, gx))
    floor = weight_floor_rel / k
    logw = jnp.where(weights >= floor,
                     jnp.log(jnp.maximum(weights, floor)), -jnp.inf)
    return CirculantBankMP(logw.astype(jnp.float32), mean_rf, prec_f,
                           logdet, filt_f, bias_f)


class _MpConsts(NamedTuple):
    """Chunk-loop constants of the multi-pilot logit computation, prepared
    once outside the scan: the expanded quadratic's GEMM coefficients."""
    prec_re: jax.Array    # (K, D, P, P) f32
    prec_im: jax.Array    # (K, D, P, P) f32
    pm_flat: jax.Array    # (K, P*D) complex: vec(prec @ mean) pilot-major
    const_k: jax.Array    # (K,) f32: logw - logdet - m^H P m - PD log pi


def _mp_consts(bank: CirculantBankMP) -> _MpConsts:
    k, d, p = bank.mean_rf.shape
    pm = jnp.einsum("kdpq,kdq->kdp", bank.prec_f, bank.mean_rf)
    mpm = jnp.real(jnp.einsum("kdp,kdp->k", jnp.conj(bank.mean_rf), pm))
    lw = jnp.maximum(bank.log_weights, -1e30)
    const = (lw - bank.logdet - mpm
             - p * d * jnp.log(jnp.pi)).astype(jnp.float32)
    pm_flat = jnp.swapaxes(pm, 1, 2).reshape(k, p * d)    # pilot-major
    return _MpConsts(jnp.real(bank.prec_f).astype(jnp.float32),
                     jnp.imag(bank.prec_f).astype(jnp.float32),
                     pm_flat, const)


def _mp_logits(bank: CirculantBankMP, mc: _MpConsts, u: jax.Array):
    """Posterior logits (n, K) for DFT-domain observations u (n, P, D):
    const_k + 2 Re(u . conj(Pm)) - u^H Prec u, with the quadratic expanded
    into P(P+1)/2 (n, D) x (D, K) real GEMMs (no (n, K, .) or (n, D, P, P)
    intermediate)."""
    n, p, d = u.shape
    term1 = jnp.zeros((n, mc.const_k.shape[0]), jnp.float32)
    for pi in range(p):
        up = u[:, pi, :]
        mag = (jnp.real(up) ** 2 + jnp.imag(up) ** 2).astype(jnp.float32)
        term1 = term1 + mag @ mc.prec_re[:, :, pi, pi].T
        for qi in range(pi + 1, p):
            v = jnp.conj(up) * u[:, qi, :]                # (n, D)
            term1 = term1 + 2.0 * (
                jnp.real(v).astype(jnp.float32) @ mc.prec_re[:, :, pi, qi].T
                - jnp.imag(v).astype(jnp.float32) @ mc.prec_im[:, :, pi, qi].T)
    u_flat = u.reshape(n, p * d)
    cross = cplx.cmatmul_realout(u_flat, jnp.conj(mc.pm_flat).T)
    return mc.const_k[None, :] + 2.0 * cross - term1


def _mp_combine(bank: CirculantBankMP, w: jax.Array, u: jax.Array):
    """h_f = sum_k w_k (bias_f,k + sum_i filt_f,k,i * u_i): P + 1
    (n, K) x (K, D) real-embedded GEMMs, elementwise per-bin apply."""
    h_f = cplx.rcmatmul(w, bank.bias_f)
    for pi in range(u.shape[1]):
        h_f = h_f + cplx.rcmatmul(w, bank.filt_f[:, :, pi]) * u[:, pi, :]
    return h_f


def _estimate_chunk_mp(bank: CirculantBankMP, mc: _MpConsts, u: jax.Array,
                       mode) -> jax.Array:
    lp = _mp_logits(bank, mc, u)
    proba = jax.nn.softmax(lp, axis=-1)
    w = _selection_weights(proba, mode).astype(jnp.float32)
    return _mp_combine(bank, w, u)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
@highest_precision
def estimate_circulant_mp(bank: CirculantBankMP, r: jax.Array,
                          mode: Union[str, int, float] = "all",
                          chunk_size: int = 8192,
                          blocks=None, method: str = "auto") -> jax.Array:
    """Estimate channels from multi-pilot quantized observations
    r (N, P*D) -> (N, D) through the per-bin P x P bank: identical
    posterior semantics and selection modes as `gmm_estimator.estimate`.
    O(N (K D P^2 + P D log D)) vs the dense path's O(N K D^2 P).

    method='auto' dispatches 'all'-mode TPU requests within the
    resident-VMEM gate to the fused multi-pilot kernel
    (`pallas_kernels.estimate_fused_circulant_mp`); 'xla' forces this
    chunked pipeline, 'kernel' forces the kernel (raises when
    ineligible)."""
    k, d, p = bank.mean_rf.shape
    n = r.shape[0]
    if r.shape[-1] != p * d:
        raise ValueError(f"expected observations of dim P*D = {p * d}, "
                         f"got {r.shape}")
    from quantized_channel_estimation_tpu.estimators import (
        pallas_kernels as pk)
    kernel_ok = (mode == "all" and pk._mp_circ_kernel_eligible(d, k, p))
    if method == "kernel" or (method == "auto" and kernel_ok
                              and jax.default_backend() == "tpu"):
        if not kernel_ok:
            raise ValueError(
                "method='kernel' needs mode='all' within the VMEM budget "
                f"(got mode={mode!r}, bank bytes "
                f"{pk._mp_circ_bank_bytes(d, k, p)})")
        return pk.estimate_fused_circulant_mp(
            bank, r, interpret=jax.default_backend() != "tpu",
            blocks=blocks)
    mc = _mp_consts(bank)
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n
    rp = jnp.pad(r, ((0, pad), (0, 0))).reshape(n_chunks, chunk_size, p, d)

    def one(rc):
        u = unitary_fft(rc, blocks)                       # per pilot block
        return unitary_ifft(_estimate_chunk_mp(bank, mc, u, mode), blocks)

    out = jax.lax.map(one, rp)
    return out.reshape(n_chunks * chunk_size, -1)[:n].astype(r.dtype)


def _estimate_coherent_chunk_mp(bank: CirculantBankMP, mc: _MpConsts,
                                u: jax.Array, mode,
                                alpha: float) -> jax.Array:
    """Coherence blocks u (B, T, P, D) -> (B, T, D): block-pooled posterior
    with the leave-one-out alpha blend (`gmm_estimator.
    _estimate_coherent_chunk` semantics)."""
    b, t, p, d = u.shape
    uf = u.reshape(b * t, p, d)
    lp3 = _mp_logits(bank, mc, uf).reshape(b, t, -1)
    lw = jnp.maximum(bank.log_weights, -1e30)
    # _mp_logits already includes the log-weight via const_k; the block
    # posterior must count it ONCE, so subtract the (T-1) extras
    lp_sum = jnp.sum(lp3, axis=1) - (t - 1) * lw[None, :]
    if alpha >= 1.0:
        proba = jax.nn.softmax(lp_sum, axis=-1)
        w = _selection_weights(proba, mode).astype(jnp.float32)
        wf = jnp.repeat(w, t, axis=0)
    else:
        lg = lp3 + alpha * (lp_sum[:, None, :] - lp3)
        proba = jax.nn.softmax(lg, axis=-1)
        w = _selection_weights(proba, mode).astype(jnp.float32)
        wf = w.reshape(b * t, -1)
    return _mp_combine(bank, wf, uf).reshape(b, t, d)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
@highest_precision
def estimate_circulant_mp_coherent(bank: CirculantBankMP, r: jax.Array,
                                   mode: Union[str, int, float] = "all",
                                   chunk_size: int = 2048,
                                   alpha: float = 1.0,
                                   blocks=None,
                                   method: str = "auto") -> jax.Array:
    """Joint estimation of coherence blocks r (B, T, P*D) -> (B, T, D)
    through the multi-pilot bank (coherent analog of
    `estimate_circulant_mp`, incl. the alpha evidence blend and the fused
    coherent MP kernel on eligible TPU requests)."""
    if r.ndim != 3:
        raise ValueError(f"expected (B, T, P*D) blocks, got {r.shape}")
    k, d, p = bank.mean_rf.shape
    n, t = r.shape[0], r.shape[1]
    from quantized_channel_estimation_tpu.estimators import (
        pallas_kernels as pk)
    kernel_ok = (mode == "all" and 1 <= t <= 16
                 and pk._mp_circ_kernel_eligible(d, k, p, t))
    if method == "kernel" or (method == "auto" and kernel_ok
                              and jax.default_backend() == "tpu"):
        if not kernel_ok:
            raise ValueError(
                "method='kernel' needs mode='all', T <= 16, and the VMEM "
                f"budget (got mode={mode!r}, T={t})")
        return pk.estimate_fused_circulant_mp_coherent(
            bank, r, alpha=alpha,
            interpret=jax.default_backend() != "tpu", blocks=blocks)
    mc = _mp_consts(bank)
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n
    rp = jnp.pad(r, ((0, pad), (0, 0), (0, 0)))
    rp = rp.reshape(n_chunks, chunk_size, t, p, d)

    def one(rc):
        u = unitary_fft(rc, blocks)
        return unitary_ifft(
            _estimate_coherent_chunk_mp(bank, mc, u, mode, alpha), blocks)

    out = jax.lax.map(one, rp)
    return out.reshape(n_chunks * chunk_size, t, -1)[:n].astype(r.dtype)


def _mp_stats_chunk(bank: CirculantBankMP, mc: _MpConsts, u: jax.Array):
    """Un-normalized online-softmax state over THIS bank's components for
    one DFT-domain multi-pilot chunk u (n, P, D) — the MP analog of
    `_stats_chunk_f` (same merge semantics: pmax/psum across component
    shards, acc stays DFT-domain until one post-merge inverse
    transform). `_mp_logits`' row-constant -PD log pi is shard-identical,
    so it cancels in any normalized merge."""
    lp = _mp_logits(bank, mc, u)
    m = jnp.max(lp, axis=-1)
    p = jnp.exp(lp - m[:, None])
    den = jnp.sum(p, axis=-1)
    acc = _mp_combine(bank, p, u)
    return m, den, acc


@partial(jax.jit, static_argnums=(2, 3))
@highest_precision
def estimate_circulant_mp_stats(bank: CirculantBankMP, r: jax.Array,
                                chunk_size: int = 8192, blocks=None):
    """'all'-mode estimation state (m, den, acc DFT-domain) for a
    (component shard of a) multi-pilot bank; merged quotients need ONE
    `unitary_ifft` (it commutes with the normalization)."""
    k, d, p = bank.mean_rf.shape
    n = r.shape[0]
    mc = _mp_consts(bank)
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n
    rp = jnp.pad(r, ((0, pad), (0, 0))).reshape(n_chunks, chunk_size, p, d)
    m, den, acc = jax.lax.map(
        lambda rc: _mp_stats_chunk(bank, mc, unitary_fft(rc, blocks)), rp)
    return (m.reshape(-1)[:n], den.reshape(-1)[:n],
            acc.reshape(n_chunks * chunk_size, -1)[:n])


def _mp_coherent_stats_chunk(bank: CirculantBankMP, mc: _MpConsts,
                             u: jax.Array, alpha: float):
    """Block state for multi-pilot coherence blocks u (B, T, P, D): MP
    analog of `_coherent_stats_chunk_f` (per-block m/den at alpha=1,
    per-snapshot below)."""
    b, t, p, d = u.shape
    uf = u.reshape(b * t, p, d)
    lp3 = _mp_logits(bank, mc, uf).reshape(b, t, -1)
    lw = jnp.maximum(bank.log_weights, -1e30)
    lp_sum = jnp.sum(lp3, axis=1) - (t - 1) * lw[None, :]
    if alpha >= 1.0:
        logits = lp_sum.astype(jnp.float32)
        m = jnp.max(logits, axis=-1)
        p_ = jnp.exp(logits - m[:, None])
        den = jnp.sum(p_, axis=-1)
        pf = jnp.repeat(p_, t, axis=0)
    else:
        lg = (lp3 + alpha * (lp_sum[:, None, :] - lp3)).astype(jnp.float32)
        m = jnp.max(lg, axis=-1)
        p_ = jnp.exp(lg - m[..., None])
        den = jnp.sum(p_, axis=-1)
        pf = p_.reshape(b * t, -1)
    acc = _mp_combine(bank, pf, uf).reshape(b, t, d)
    return m, den, acc


@partial(jax.jit, static_argnums=(2, 3, 4))
@highest_precision
def estimate_circulant_mp_coherent_stats(bank: CirculantBankMP,
                                         r: jax.Array,
                                         chunk_size: int = 2048,
                                         alpha: float = 1.0, blocks=None):
    """BLOCK estimation state for multi-pilot banks over coherence blocks
    r (B, T, P*D) — same merge semantics as the P=1 coherent stats."""
    if r.ndim != 3:
        raise ValueError(f"expected (B, T, P*D) blocks, got {r.shape}")
    k, d, p = bank.mean_rf.shape
    n, t = r.shape[0], r.shape[1]
    mc = _mp_consts(bank)
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n
    rp = jnp.pad(r, ((0, pad), (0, 0), (0, 0)))
    rp = rp.reshape(n_chunks, chunk_size, t, p, d)
    m, den, acc = jax.lax.map(
        lambda rc: _mp_coherent_stats_chunk(bank, mc,
                                            unitary_fft(rc, blocks), alpha),
        rp)
    lead = (-1,) if alpha >= 1.0 else (-1, t)
    return (m.reshape(lead)[:n], den.reshape(lead)[:n],
            acc.reshape(n_chunks * chunk_size, t, -1)[:n])
