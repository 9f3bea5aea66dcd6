"""Factored (low-rank + diagonal) prepared banks: structure-exploiting
MFA-Bussgang estimation that never densifies the factor model.

The reference's Mofa predicts through DENSE covariances — `to_gmm` +
per-component dense LMMSE (`mofa_cplx_bussgang.py:117-216`), so estimation
pays O(K D^2) per sample and the per-SNR prepare pays K dense D^3 Cholesky
factorizations even though the model it fitted is rank-M. This framework's
round-3 serving layer reproduced that (`serving.from_mfa` densified via
`mfa.to_gmm_params`). This module keeps the WHOLE estimation pipeline in the
factored form instead, the estimation-time analog of the factored-Woodbury
E-step that `mfa._run_em` already uses at fit time.

Why this is exact for the standard single-pilot setup (A = x0 * I, so the
observation dim M_obs equals the channel dim D): with the MFA channel
covariance Ch = Lambda Lambda^H + diag(psi) (Lambda D x M, M << D),

  Cy = |x0|^2 Ch + sigma^2 I = U U^H + diag(d),
        U = x0 Lambda,  d = |x0|^2 psi + sigma^2        -- still rank-M
  diag(Cy) = uu + d,  uu = rowsum |U|^2                 -- O(K D), no dense Cy
  Cr = Cy                                  [inf bits]   -- V = U,     e = d
       b^2 Cy + (1-b^2) diag(Cy)           [n bit]      -- V = b U,
         b = clip(mean(gains), 0, 1)                       e = d + (1-b^2) uu

so Cr = V V^H + diag(e) stays EXACTLY low-rank + diagonal (the same class as
the prior), and every estimator quantity goes through the Woodbury identity:

  Cr^{-1} = diag(1/e) - T^H T,   T = L^{-1} V^H diag(1/e),
  inner   = I_M + V^H diag(1/e) V = L L^H       (eigenvalues >= 1: the
                                                 Cholesky never needs jitter)
  log det Cr = sum log e + 2 sum log diag(L)

The per-SNR prepare forms only M x M factorizations — O(K D M^2) total
versus the dense path's K D^3 — and the bank is O(K D M) memory versus
O(K D^2). Per-sample estimation with the diagonal A_eff^H = conj(x0) diag(g):

  W r = Ch A_eff^H Cr^{-1} r = Lambda gamma + (psi c / e) o r - R beta
        beta  = T r                          (M,)
        gamma = P2 r                         (M,)
  with the precomputed O(K D M) bank pieces
        c = conj(x0) g,
        P2 = Lambda^H diag(c/e) - (Lambda^H diag(c) T^H) T
             (the Q beta = Q T r term is LINEAR in r, so it folds into the
              forward matrix — no batched (K, M, M) contraction at
              estimation time),
        R = diag(psi c) T^H

i.e. O(K D M) per sample instead of O(K D^2) — a D/(2M)-fold FLOP reduction
that GROWS with D at fixed latent rank, and the memory wall that stops the
dense prepare entirely (RESOURCE_EXHAUSTED at D=4096, BASELINE.md frontier
rows) never arrives. 1-bit quantization is the one exclusion: the arcsine
law is elementwise in the MATRIX ENTRIES and does not preserve low rank, so
1-bit MFA banks must densify (`mfa.to_gmm_params` +
`gmm_estimator.prepare_bank`); `prepare_bank_factored` rejects it loudly.

TPU shape notes: everything lands on the MXU as (N, D) x (D, K*M) forward
GEMMs and (N, K*M) x (K*M, D) combine GEMMs (one real GEMM each via the
2x2 block embedding, `cplx.cmatmul`) plus (N, K) x (K, D) bias/diag
combines — no (N, K, D) intermediate ever exists, so chunking only bounds
the (chunk, K*M) coefficient tensors. The responsibilities reuse the
forward beta GEMM; posteriors match the dense path bit-for-bit up to f32
order (the Woodbury form is exact algebra, not an approximation).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from quantized_channel_estimation_tpu.models.gmm_estimator import (
    _selection_weights)
from quantized_channel_estimation_tpu.models.mfa import MfaParams
from quantized_channel_estimation_tpu.models.structured_bank import (
    _pilot_scalar)
from quantized_channel_estimation_tpu.ops import cplx
from quantized_channel_estimation_tpu.ops.bussgang import bussgang_gain_diag
from quantized_channel_estimation_tpu.ops.precision import highest_precision
from quantized_channel_estimation_tpu.ops.quantizer import (
    ScalarQuantizer, is_inf_bits)


class FactoredBank(NamedTuple):
    """Per-SNR prepared bank for rank-M + diagonal component covariances.
    K components, D dims, M latent rank. The matrix quantities of
    `gmm_estimator.PreparedBank` collapse to O(D M) factors: `t_mat`
    replaces the (K, M_obs, M_obs) precision Cholesky factors, the
    (`lam_t`, `p2_mat`, `r_t`, `a1`) family the (K, D, M_obs)
    dense LMMSE filters. Total bank memory O(K D M) vs O(K D^2)."""
    log_weights: jax.Array  # (K,) f32; dead components at -inf
    means_r: jax.Array      # (K, D) complex: Bussgang-domain obs means
    inv_e: jax.Array        # (K, D) f32: 1/e, Cr's diagonal part inverted
    t_mat: jax.Array        # (K, M, D) complex: T = L^-1 V^H diag(1/e)
    t_mu: jax.Array         # (K, M) complex: T means_r
    logdet: jax.Array       # (K,) f32: log det Cr
    lam_t: jax.Array        # (K, M, D) complex: Lambda^T (combine stack)
    p2_mat: jax.Array       # (K, M, D) complex: Lam^H diag(c/e) - Q T
    r_t: jax.Array          # (K, M, D) complex: rows (psi c) * conj(T)
    a1: jax.Array           # (K, D) complex: psi c / e
    bias: jax.Array         # (K, D) complex: mu - W mu_r


@highest_precision
def prepare_bank_factored(params: MfaParams, snr_db, a, n_bits,
                          q: Optional[ScalarQuantizer] = None,
                          jitter: float = 1e-6,
                          weight_floor_rel: float = 1e-2,
                          one_bit: str = "reject") -> FactoredBank:
    """Factored analog of `gmm_estimator.prepare_bank` for MFA parameters
    and a scaled-identity pilot. Same Bussgang observation model (per-entry
    diagonal gains, scalar-beta n-bit Cr — `bussgang.bank_gains_and_cov`
    semantics) and the same dead-component weight floor; only the
    representation differs.

    1-bit (round-5): the exact arcsine law is elementwise in the MATRIX
    ENTRIES and does not preserve low rank, so by default 1-bit raises
    (densify via `mfa.to_gmm_params`). `one_bit='linear-arcsine'` instead
    uses the first-order odd expansion arcsin(x) = x + O(x^3):

        Cr ~ (2/pi) K + (1 - 2/pi) I,   K = D^(-1/2) Cy D^(-1/2)

    which stays EXACTLY in the low-rank + diagonal class — V = g (.) U
    rowwise (g the 1-bit gains sqrt(2/pi)/sqrt(diag Cy)), e = g^2 dvec +
    1 - 2/pi — with per-entry error (2/pi)(arcsin(rho) - rho) = O(rho^3)
    in the normalized off-diagonal correlations rho. The diagonal is
    exact. Accuracy is MEASURED, not assumed (tools/mfa_bank_bench.py
    one-bit rows; PARITY_NOTES.md round-5)."""
    if not is_inf_bits(n_bits) and n_bits == 1 \
            and one_bit != "linear-arcsine":
        raise ValueError(
            "factored MFA banks do not support exact 1-bit quantization: "
            "the arcsine law is elementwise in the matrix entries and "
            "destroys the low-rank structure. Densify with "
            "mfa.to_gmm_params + gmm_estimator.prepare_bank, or pass "
            "one_bit='linear-arcsine' for the measured O(rho^3) "
            "approximation that keeps the factored form.")
    k, d, m = params.lambdas.shape
    x0 = _pilot_scalar(a, d)
    sigma2 = 10.0 ** (-jnp.asarray(snr_db, jnp.float32) / 10.0)
    lam = params.lambdas
    psis = params.psis                                    # (K, D) real
    u = x0 * lam                                          # (K, D, M)
    uu = jnp.sum(jnp.abs(u) ** 2, axis=-1)                # (K, D) real
    dvec = jnp.abs(x0) ** 2 * psis + sigma2               # (K, D) real
    diag_cy = uu + dvec
    if is_inf_bits(n_bits):
        gains = jnp.ones_like(diag_cy)
        v = u
        e = dvec
    elif n_bits == 1:
        # linear-arcsine factored form (docstring above): V = g (.) U,
        # e = g^2 dvec + 1 - 2/pi; gains are the exact per-entry 1-bit
        # Bussgang gains, so means/filters/responsibility scaling match
        # the dense bank except for the O(rho^3) Cr off-diagonal error
        gains = bussgang_gain_diag(diag_cy, 1)            # (K, D) real
        v = gains[..., None].astype(u.dtype) * u
        e = gains ** 2 * dvec + (1.0 - 2.0 / jnp.pi)
    else:
        gains = bussgang_gain_diag(diag_cy, n_bits, q)    # (K, D) real
        beta = jnp.clip(jnp.mean(gains, axis=-1), 0.0, 1.0)
        v = beta[:, None, None].astype(u.dtype) * u
        e = dvec + (1.0 - beta[:, None] ** 2) * uu
    e = e + jitter
    inv_e = (1.0 / e).astype(jnp.float32)

    # Woodbury pieces: inner = I + V^H E^-1 V has eigenvalues >= 1
    vh_e = jnp.conj(jnp.swapaxes(v, -1, -2)) \
        * inv_e[:, None, :].astype(v.dtype)               # (K, M, D)
    inner = jnp.eye(m, dtype=v.dtype) + vh_e @ v          # (K, M, M)
    chol = jnp.linalg.cholesky(
        0.5 * (inner + jnp.conj(jnp.swapaxes(inner, -1, -2))))
    t_mat = jax.scipy.linalg.solve_triangular(chol, vh_e, lower=True)
    logdet = (jnp.sum(jnp.log(e), axis=-1)
              + 2.0 * jnp.sum(jnp.log(jnp.real(jnp.diagonal(
                  chol, axis1=-2, axis2=-1))), axis=-1)).astype(jnp.float32)

    mu_r = gains.astype(u.dtype) * (x0 * params.means)    # (K, D)
    t_mu = jnp.einsum("kmd,kd->km", t_mat, mu_r)

    # estimation stacks: W = Ch diag(c) Cr^-1 with c = conj(x0) g.
    # gamma = P r - Q (T r) is linear in r, so Q folds into the forward
    # matrix ONCE at prepare: P2 = P - Q T (O(K D M^2) — the only
    # rectangular product here, still no D^3 anywhere)
    c = jnp.conj(x0) * gains.astype(u.dtype)              # (K, D)
    lam_t = jnp.swapaxes(lam, -1, -2)                     # (K, M, D)
    p_mat = jnp.conj(lam_t) * (c * inv_e)[:, None, :]
    q_mat = jnp.einsum("kmd,kpd->kmp", jnp.conj(lam_t) * c[:, None, :],
                       jnp.conj(t_mat))
    p2_mat = p_mat - q_mat @ t_mat
    r_t = (psis.astype(u.dtype) * c)[:, None, :] * jnp.conj(t_mat)
    a1 = psis.astype(u.dtype) * c * inv_e

    # bias = mu - W mu_r through the same factored apply
    b_mu = t_mu
    g_mu = jnp.einsum("kmd,kd->km", p2_mat, mu_r)
    w_mu = (jnp.einsum("kmd,km->kd", lam_t, g_mu) + a1 * mu_r
            - jnp.einsum("kmd,km->kd", r_t, b_mu))
    bias = params.means - w_mu

    floor = weight_floor_rel / k
    logw = jnp.where(params.weights >= floor,
                     jnp.log(jnp.maximum(params.weights, floor)), -jnp.inf)
    return FactoredBank(logw.astype(jnp.float32), mu_r, inv_e, t_mat, t_mu,
                        logdet, lam_t, p2_mat, r_t, a1, bias)


def _forward(bank: FactoredBank, r: jax.Array):
    """The two forward GEMMs shared by responsibilities and combine:
    beta = T r (N, K, M) and gamma = P2 r (N, K, M)."""
    k, m, d = bank.t_mat.shape
    beta = cplx.cmatmul(r, bank.t_mat.reshape(k * m, d).T).reshape(
        r.shape[0], k, m)
    gamma = cplx.cmatmul(r, bank.p2_mat.reshape(k * m, d).T).reshape(
        r.shape[0], k, m)
    return beta, gamma


def _log_prob(bank: FactoredBank, r: jax.Array, beta: jax.Array,
              with_const: bool = True) -> jax.Array:
    """log CN(r; mu_r, Cr) (N, K) via the Woodbury quadratic form, reusing
    the forward beta GEMM: quad = |r - mu|^2-weighted diag(1/e) part minus
    |T (r - mu)|^2."""
    d = r.shape[-1]
    a_term = (jnp.real(r) ** 2 + jnp.imag(r) ** 2) @ bank.inv_e.T
    cm = (jnp.conj(bank.means_r) * bank.inv_e).T          # (D, K)
    cross = cplx.cmatmul_realout(r, cm)                   # (N, K)
    mu2 = jnp.sum(jnp.abs(bank.means_r) ** 2 * bank.inv_e, axis=-1)
    b_term = jnp.sum(jnp.abs(beta - bank.t_mu[None, :, :]) ** 2, axis=-1)
    quad = a_term - 2.0 * cross + mu2[None, :] - b_term
    lp = -bank.logdet[None, :] - quad
    if with_const:
        lp = lp - d * jnp.log(jnp.pi)
    return lp


def _combine(bank: FactoredBank, r: jax.Array, w: jax.Array,
             beta: jax.Array, gamma: jax.Array) -> jax.Array:
    """h = sum_k w_k (bias_k + W_k r): two (N, K*M) x (K*M, D) combine
    GEMMs plus the (N, K) bias/diag combines. w may be a posterior,
    selection weights, or unnormalized online-softmax weights."""
    n = r.shape[0]
    k, m, d = bank.lam_t.shape
    wc = w.astype(gamma.dtype)
    h = cplx.rcmatmul(w, bank.bias) + cplx.rcmatmul(w, bank.a1) * r
    h = h + cplx.cmatmul((wc[:, :, None] * gamma).reshape(n, k * m),
                         bank.lam_t.reshape(k * m, d))
    return h - cplx.cmatmul((wc[:, :, None] * beta).reshape(n, k * m),
                            bank.r_t.reshape(k * m, d))


def _estimate_chunk(bank: FactoredBank, r: jax.Array, mode) -> jax.Array:
    beta, gamma = _forward(bank, r)
    lp = _log_prob(bank, r, beta)
    proba = jax.nn.softmax(lp + bank.log_weights[None, :], axis=-1)
    w = _selection_weights(proba, mode).astype(jnp.float32)
    return _combine(bank, r, w, beta, gamma)


@partial(jax.jit, static_argnums=(2, 3, 4))
@highest_precision
def estimate_factored(bank: FactoredBank, r: jax.Array,
                      mode: Union[str, int, float] = "all",
                      chunk_size: int = 4096,
                      method: str = "auto") -> jax.Array:
    """Estimate channels from quantized observations r (N, M) -> (N, D)
    through the factored bank: the structured analog of
    `gmm_estimator.estimate` (identical posterior semantics and selection
    modes; matches the dense estimator to f32 rounding — the Woodbury form
    is exact algebra). O(N K D M) total vs the dense path's O(N K D^2).

    method='auto' dispatches 'all'-mode TPU requests to the fused Pallas
    kernel (`pallas_kernels.estimate_fused_factored`) when the whole bank
    fits the ~13 MiB scoped-VMEM budget — measured +132% over this XLA
    pipeline at D=64/K=64/M=16 (14.2 vs 6.1 M est/s, above the dense
    kernel's 11.9 M same-session) and +80% at D=256/K=32/M=16; 'xla'
    forces the chunked pipeline, 'kernel' forces the kernel (raises when
    ineligible)."""
    k_, m_, d_ = bank.t_mat.shape
    from quantized_channel_estimation_tpu.estimators import (
        pallas_kernels as pk)
    kernel_ok = (mode == "all" and pk._fact_kernel_eligible(d_, k_, m_))
    if method == "kernel" or (method == "auto" and kernel_ok
                              and jax.default_backend() == "tpu"):
        if not kernel_ok:
            raise ValueError(
                "method='kernel' needs mode='all' within the VMEM budget "
                f"(got mode={mode!r}, bank bytes "
                f"{pk._fact_bank_bytes(d_, k_, m_)})")
        return pk.estimate_fused_factored(
            bank, r, interpret=jax.default_backend() != "tpu")
    n = r.shape[0]
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n
    rp = jnp.pad(r, ((0, pad), (0, 0))).reshape(n_chunks, chunk_size, -1)
    out = jax.lax.map(lambda rc: _estimate_chunk(bank, rc, mode), rp)
    return out.reshape(n_chunks * chunk_size, -1)[:n].astype(r.dtype)


def _estimate_coherent_chunk(bank: FactoredBank, r: jax.Array, mode,
                             alpha: float) -> jax.Array:
    """One chunk of coherence blocks r (B, T, M) -> (B, T, D): same
    block-pooled posterior / leave-one-out alpha blend as
    `gmm_estimator._estimate_coherent_chunk` (alpha=0 IS the independent
    per-snapshot estimator), with the factored likelihood and combine."""
    b, t, d = r.shape
    rf = r.reshape(b * t, d)
    beta, gamma = _forward(bank, rf)
    lp3 = _log_prob(bank, rf, beta).reshape(b, t, -1)
    lp_sum = jnp.sum(lp3, axis=1)
    if alpha >= 1.0:
        proba = jax.nn.softmax(lp_sum + bank.log_weights[None, :], axis=-1)
        w = _selection_weights(proba, mode).astype(jnp.float32)  # (B, K)
        wf = jnp.repeat(w, t, axis=0)
    else:
        lg = lp3 + alpha * (lp_sum[:, None, :] - lp3) \
            + bank.log_weights[None, None, :]
        proba = jax.nn.softmax(lg, axis=-1)
        w = _selection_weights(proba, mode).astype(jnp.float32)  # (B, T, K)
        wf = w.reshape(b * t, -1)
    return _combine(bank, rf, wf, beta, gamma).reshape(b, t, -1)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
@highest_precision
def estimate_factored_coherent(bank: FactoredBank, r: jax.Array,
                               mode: Union[str, int, float] = "all",
                               chunk_size: int = 1024,
                               alpha: float = 1.0,
                               method: str = "auto") -> jax.Array:
    """Joint estimation of coherence blocks r (B, T, M) -> (B, T, D)
    through the factored bank: structured analog of
    `gmm_estimator.estimate_coherent` including the alpha evidence blend.
    method='auto' dispatches 'all'-mode TPU requests with 1 <= T <= 16 to
    the fused coherent kernel within the VMEM gate (same eligibility
    family as `estimate_factored`)."""
    if r.ndim != 3:
        raise ValueError(f"estimate_factored_coherent expects (B, T, M) "
                         f"blocks, got shape {r.shape}")
    k_, m_, d_ = bank.t_mat.shape
    t_ = r.shape[1]
    from quantized_channel_estimation_tpu.estimators import (
        pallas_kernels as pk)
    kernel_ok = (mode == "all" and 1 <= t_ <= 16
                 and pk._fact_kernel_eligible(d_, k_, m_, t_))
    if method == "kernel" or (method == "auto" and kernel_ok
                              and jax.default_backend() == "tpu"):
        if not kernel_ok:
            raise ValueError(
                "method='kernel' needs mode='all', T <= 16, and the VMEM "
                f"budget (got mode={mode!r}, T={t_}, bank bytes "
                f"{pk._fact_bank_bytes(d_, k_, m_)})")
        return pk.estimate_fused_factored_coherent(
            bank, r, alpha=alpha,
            interpret=jax.default_backend() != "tpu")
    n = r.shape[0]
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n
    rp = jnp.pad(r, ((0, pad), (0, 0), (0, 0)))
    rp = rp.reshape(n_chunks, chunk_size, r.shape[1], r.shape[2])
    out = jax.lax.map(
        lambda rc: _estimate_coherent_chunk(bank, rc, mode, alpha), rp)
    return out.reshape(n_chunks * chunk_size, r.shape[1], -1)[:n].astype(
        r.dtype)


def _stats_chunk(bank: FactoredBank, r: jax.Array):
    """Un-normalized online-softmax estimation state over THIS bank's
    components for one chunk — the factored analog of
    `gmm_estimator._stats_chunk` (same merge semantics: pmax/psum or
    `pallas_kernels.merge_stats` across component shards, acc/den
    reproduces `estimate_factored(..., 'all')`). The row-constant
    -D log pi is dropped (cancels in any normalized merge); dead
    components clamp to -1e30."""
    beta, gamma = _forward(bank, r)
    lp = _log_prob(bank, r, beta, with_const=False)
    logits = (lp + jnp.maximum(bank.log_weights, -1e30)[None, :]).astype(
        jnp.float32)
    m = jnp.max(logits, axis=-1)
    p = jnp.exp(logits - m[:, None])
    den = jnp.sum(p, axis=-1)
    acc = _combine(bank, r, p, beta, gamma)
    return m, den, acc


@partial(jax.jit, static_argnums=(2,))
@highest_precision
def estimate_factored_stats(bank: FactoredBank, r: jax.Array,
                            chunk_size: int = 4096):
    """'all'-mode estimation state (m, den, acc) for a (component shard of
    a) factored bank — merge across shards with the identical pmax/psum
    recurrence as the dense/circulant stats forms and take acc/den.
    Shapes: m (N,) f32, den (N,) f32, acc (N, D) complex."""
    n = r.shape[0]
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n
    rp = jnp.pad(r, ((0, pad), (0, 0))).reshape(n_chunks, chunk_size, -1)
    m, den, acc = jax.lax.map(lambda rc: _stats_chunk(bank, rc), rp)
    return (m.reshape(-1)[:n], den.reshape(-1)[:n],
            acc.reshape(n_chunks * chunk_size, -1)[:n])


def _coherent_stats_chunk(bank: FactoredBank, r: jax.Array, alpha: float):
    """Block online-softmax state for coherence blocks r (B, T, M):
    factored analog of `gmm_estimator._coherent_stats_chunk` (same
    per-block / per-snapshot state convention and merge semantics)."""
    b, t, d = r.shape
    rf = r.reshape(b * t, d)
    beta, gamma = _forward(bank, rf)
    lp3 = _log_prob(bank, rf, beta, with_const=False).reshape(b, t, -1)
    lw = jnp.maximum(bank.log_weights, -1e30)
    lp_sum = jnp.sum(lp3, axis=1)
    if alpha >= 1.0:
        logits = (lw[None, :] + lp_sum).astype(jnp.float32)      # (B, K)
        m = jnp.max(logits, axis=-1)
        p = jnp.exp(logits - m[:, None])
        den = jnp.sum(p, axis=-1)
        pf = jnp.repeat(p, t, axis=0)
    else:
        lg = (lw[None, None, :] + lp3
              + alpha * (lp_sum[:, None, :] - lp3)).astype(jnp.float32)
        m = jnp.max(lg, axis=-1)                                 # (B, T)
        p = jnp.exp(lg - m[..., None])
        den = jnp.sum(p, axis=-1)
        pf = p.reshape(b * t, -1)
    acc = _combine(bank, rf, pf, beta, gamma).reshape(b, t, -1)
    return m, den, acc


@partial(jax.jit, static_argnums=(2, 3))
@highest_precision
def estimate_factored_coherent_stats(bank: FactoredBank, r: jax.Array,
                                     chunk_size: int = 1024,
                                     alpha: float = 1.0):
    """BLOCK estimation state for factored banks over coherence blocks
    r (B, T, M): per-block (m, den) at alpha=1, per-snapshot below, acc
    (B, T, D) complex — merge across component shards with the identical
    pmax/psum recurrence as the dense/circulant coherent stats."""
    if r.ndim != 3:
        raise ValueError(f"expected (B, T, M) blocks, got {r.shape}")
    n = r.shape[0]
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n
    rp = jnp.pad(r, ((0, pad), (0, 0), (0, 0)))
    rp = rp.reshape(n_chunks, chunk_size, r.shape[1], r.shape[2])
    m, den, acc = jax.lax.map(
        lambda rc: _coherent_stats_chunk(bank, rc, alpha), rp)
    lead = (-1,) if alpha >= 1.0 else (-1, r.shape[1])
    return (m.reshape(lead)[:n], den.reshape(lead)[:n],
            acc.reshape(n_chunks * chunk_size, r.shape[1], -1)[:n])
