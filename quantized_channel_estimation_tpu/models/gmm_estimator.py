"""GMM-Bussgang channel estimation: per-component LMMSE with responsibility
weighting (reference `gmm_cplx_bussgang.py:166-332`).

Pure-functional redesign of the reference's stateful `_prepare_for_prediction`
(which destructively overwrites its model and forces deepcopy at call sites,
`gmm_cplx_bussgang.py:309-313`): here `prepare_bank(params, snr, ...)` returns
an immutable `PreparedBank` that can be cached per SNR and reused.

Speed-of-light choices vs the reference:
  - the LMMSE filters W_k = C_k A_eff_k^H Cr_k^{-1} are precomputed once per
    (component, SNR) — the reference recomputes C_k A_eff^H per *sample*
    (`gmm_cplx_bussgang.py:226-228`)
  - Cholesky solves instead of per-component SVD pinv
  - the combine step is one stacked GEMM (r @ [W_1; ...; W_K]^H) plus a
    responsibility-weighted reduction — MXU-shaped, chunked over samples
  - top-k / cumulative-probability component selection is a dense masked
    weighted sum (no data-dependent control flow under jit)
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from quantized_channel_estimation_tpu.models.gmm import GmmParams, log_prob_full
from quantized_channel_estimation_tpu.ops import linalg
from quantized_channel_estimation_tpu.ops.bussgang import (
    bank_gains_and_cov)
from quantized_channel_estimation_tpu.ops.precision import highest_precision
from quantized_channel_estimation_tpu.ops.quantizer import (
    ScalarQuantizer, is_inf_bits)


class PreparedBank(NamedTuple):
    """Per-SNR prepared component bank for quantized-observation estimation.

    All arrays are component-batched: K components, M = observation dim
    (n_pilots * N), D = channel dim (N antennas).
    """
    log_weights: jax.Array    # (K,)
    means_r: jax.Array        # (K, M)   Bussgang-domain observation means
    prec_chol_r: jax.Array    # (K, M, M) precision cholesky of Cr (responsibilities)
    filters: jax.Array        # (K, D, M) W_k = C_k A_eff_k^H Cr_k^{-1}
    bias: jax.Array           # (K, D)   mu_h,k - W_k means_r,k


@highest_precision
def prepare_bank(params: GmmParams, snr_db, a: jax.Array, n_bits,
                 q: Optional[ScalarQuantizer] = None,
                 jitter: float = 1e-6,
                 weight_floor_rel: float = 1e-2) -> PreparedBank:
    """Build the Bussgang-linearized observation-domain bank
    (`gmm_cplx_bussgang.py:246-328`):

      Cy_k  = A C_k A^H + sigma^2 I
      B_k   = diagonal Bussgang gain of Cy_k
      mu_r  = B_k A mu_k
      Cr_k  = arcsine(Cy_k)            [1 bit]
              Cy_k                     [inf bits]
              beta^2 Cy + (1-beta^2) diag(Cy),  beta = clip(mean(B_k), 0, 1)
      W_k   = C_k (B_k A)^H Cr_k^{-1}
    """
    sigma2 = 10.0 ** (-snr_db / 10.0)
    m = a.shape[0]
    dtype = params.covariances.dtype
    eye = jnp.eye(m, dtype=dtype)

    cy = jnp.einsum("mn,knp,qp->kmq", a, params.covariances, jnp.conj(a))
    cy = cy + jnp.asarray(sigma2, jnp.float32) * eye

    a_mu = jnp.einsum("mn,kn->km", a, params.means)
    gains, cr = bank_gains_and_cov(cy, n_bits, q)

    means_r = gains.astype(dtype) * a_mu
    a_eff = gains[..., :, None].astype(dtype) * a  # (K, M, N)

    cr_j = linalg.add_jitter(cr, jitter)
    chol = jnp.linalg.cholesky(cr_j)
    prec_chol = linalg.prec_from_chol(chol)

    # W_k = C_k A_eff^H Cr^{-1}: solve Cr X = A_eff C_k^H, W = X^H
    cah = jnp.einsum("knd,kmd->knm", params.covariances, jnp.conj(a_eff))  # C A_eff^H
    y = jax.scipy.linalg.solve_triangular(chol, jnp.conj(jnp.swapaxes(cah, -1, -2)), lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.conj(jnp.swapaxes(chol, -1, -2)), y, lower=False)
    filters = jnp.conj(jnp.swapaxes(x, -1, -2))  # (K, D, M)

    bias = params.means - jnp.einsum("kdm,km->kd", filters, means_r)
    # Mask dead components: a collapsed EM fit can leave components with
    # ~zero weight whose degenerate Cr models nevertheless win
    # responsibilities at high SNR and wreck the combine (observed at
    # K=64/2-bit/20 dB, and again at K=128 where a weight-1e-5 component —
    # ~1 sample of mass, covariance reg_covar-dominated — survived an
    # absolute 1e-7 floor and blew the 20 dB MSE 10x). The floor is
    # RELATIVE to the uniform weight 1/K: a component below
    # weight_floor_rel/K carries a vanishing share of the mixture and is
    # fit to too few samples for its covariance to be meaningful. The
    # reference never prunes because its f64 EM rarely collapses; masking
    # only excludes components that carry no probability mass anyway.
    k_comp = params.weights.shape[0]
    floor = weight_floor_rel / k_comp
    logw = jnp.where(params.weights >= floor,
                     jnp.log(jnp.maximum(params.weights, floor)),
                     -jnp.inf)
    return PreparedBank(logw, means_r, prec_chol, filters, bias)


def responsibilities(bank: PreparedBank, r: jax.Array) -> jax.Array:
    """Posterior component probabilities of quantized observations (N, K)."""
    lp = log_prob_full(r, bank.means_r, bank.prec_chol_r) + bank.log_weights[None, :]
    return jax.nn.softmax(lp, axis=-1)


def _selection_weights(proba: jax.Array, mode) -> jax.Array:
    """Dense selection weights implementing the reference's
    `n_summands_or_proba` modes (`gmm_cplx_bussgang.py:197-242`):
      'all'    -> full posterior weighting
      int 1    -> argmax component (one-hot)
      int k>1  -> top-k by responsibility, renormalized
      float p  -> smallest prefix of sorted responsibilities with cumulative
                  probability >= p, renormalized
    """
    k = proba.shape[-1]
    if mode == "all":
        return proba
    if isinstance(mode, int):
        if mode == 1:
            return jax.nn.one_hot(jnp.argmax(proba, axis=-1), k, dtype=proba.dtype)
        kth = jax.lax.top_k(proba, mode)[0][..., -1:]
        mask = proba >= kth
        sel = proba * mask
        return sel / jnp.sum(sel, axis=-1, keepdims=True)
    # float cumulative-probability mode
    order = jnp.argsort(-proba, axis=-1)
    sorted_p = jnp.take_along_axis(proba, order, axis=-1)
    csum = jnp.cumsum(sorted_p, axis=-1)
    # include indices up to (and incl.) the first where csum >= mode
    include_sorted = jnp.concatenate(
        [jnp.ones_like(csum[..., :1], bool), csum[..., :-1] < mode], axis=-1)
    mask = jnp.take_along_axis(
        include_sorted, jnp.argsort(order, axis=-1), axis=-1)
    sel = proba * mask
    return sel / jnp.sum(sel, axis=-1, keepdims=True)


def _estimate_chunk(bank: PreparedBank, r: jax.Array, mode) -> jax.Array:
    proba = responsibilities(bank, r)
    w = _selection_weights(proba, mode).astype(r.dtype)
    k, d, m = bank.filters.shape
    # one stacked GEMM: (n, M) @ (M, K*D) -> per-component estimates (n, K, D)
    z = (r @ bank.filters.reshape(k * d, m).T).reshape(r.shape[0], k, d)
    z = z + bank.bias[None, :, :]
    return jnp.einsum("nk,nkd->nd", w, z)


@partial(jax.jit, static_argnums=(2, 3))
@highest_precision
def estimate(bank: PreparedBank, r: jax.Array,
             mode: Union[str, int, float] = "all",
             chunk_size: int = 2048) -> jax.Array:
    """Estimate channels from quantized observations r (N, M) -> (N, D).

    h_n = sum_k w_k(r_n) (mu_k + W_k (r_n - mu_r,k)), chunked over samples to
    bound the (chunk, K, D) intermediate.
    """
    n = r.shape[0]
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n
    rp = jnp.pad(r, ((0, pad), (0, 0))).reshape(n_chunks, chunk_size, -1)
    out = jax.lax.map(lambda rc: _estimate_chunk(bank, rc, mode), rp)
    return out.reshape(n_chunks * chunk_size, -1)[:n]


def _estimate_coherent_chunk(bank: PreparedBank, r: jax.Array, mode,
                             alpha: float = 1.0) -> jax.Array:
    """One chunk of coherence blocks r (B, T, M) -> (B, T, D)."""
    b, t, m = r.shape
    lp = log_prob_full(r.reshape(b * t, m), bank.means_r, bank.prec_chol_r)
    lp3 = lp.reshape(b, t, -1)
    # block log-likelihood: snapshots are conditionally independent given the
    # component, so the posterior logits SUM over the coherence axis (the
    # log-weight enters once per block, not once per snapshot)
    lp_sum = jnp.sum(lp3, axis=1)
    k, d, mm = bank.filters.shape
    z = (r.reshape(b * t, m) @ bank.filters.reshape(k * d, mm).T)
    z = z.reshape(b, t, k, d) + bank.bias[None, None, :, :]
    if alpha >= 1.0:
        lp_block = lp_sum + bank.log_weights[None, :]
        proba = jax.nn.softmax(lp_block, axis=-1)        # (B, K)
        w = _selection_weights(proba, mode).astype(r.dtype)
        return jnp.einsum("bk,btkd->btd", w, z)
    # leave-one-out blend (alpha < 1): each snapshot keeps its OWN
    # likelihood at full strength and admits the other snapshots' evidence
    # scaled by alpha — alpha=0 is exactly the independent per-snapshot
    # posterior, alpha=1 the block posterior. Measured (full-scale probe,
    # tools/coherent_temper_probe.py): the family dominates BOTH endpoints
    # under model mismatch (urban-macro ≥0 dB, where pure pooling loses the
    # per-snapshot hedge) and never loses where pooling wins (3gpp).
    lg = lp3 + alpha * (lp_sum[:, None, :] - lp3) \
        + bank.log_weights[None, None, :]
    proba = jax.nn.softmax(lg, axis=-1)                  # (B, T, K)
    w = _selection_weights(proba, mode).astype(r.dtype)
    return jnp.einsum("btk,btkd->btd", w, z)


@partial(jax.jit, static_argnums=(2, 3, 4))
@highest_precision
def estimate_coherent(bank: PreparedBank, r: jax.Array,
                      mode: Union[str, int, float] = "all",
                      chunk_size: int = 512,
                      alpha: float = 1.0) -> jax.Array:
    """Joint estimation of coherence blocks r (B, T, M) -> (B, T, D).

    New design beyond the reference (which only ever runs n_coherence=1 and
    would flatten multi-snapshot blocks into independent samples,
    `SCMMulti.py:30` / PARITY_NOTES "n_coherence > 1"): snapshots inside a
    block are i.i.d. draws sharing ONE angular PSD (`scm.channel_from_psd`),
    i.e. one generating mixture component, so the component posterior is
    computed from the BLOCK likelihood prod_t p(r_t | k) — per-snapshot
    log-likelihoods sum over the coherence axis before the softmax — and
    every snapshot is combined with the shared block weights. T observations
    sharpen the posterior by ~T x in log-space, so component identification
    (and hence MSE) improves over independent per-snapshot estimation at any
    finite SNR. Reduces exactly to `estimate` at T=1.

    `alpha` < 1 blends toward the independent per-snapshot posterior
    (leave-one-out evidence scaling; alpha=0 IS the independent estimator)
    — the hedge for model-mismatched regimes where pure pooling over-commits
    (measured: urban-macro at >=0 dB; `_estimate_coherent_chunk`). The
    Pallas kernel path (`estimate_fused_coherent`) carries the full alpha
    blend in-kernel (validated on hardware, PARITY_NOTES.md alpha
    addendum), so kernel users need not fall back here for alpha < 1.
    """
    if r.ndim != 3:
        raise ValueError(f"estimate_coherent expects (B, T, M) blocks, got "
                         f"shape {r.shape}; use `estimate` for flat samples")
    n = r.shape[0]
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n
    rp = jnp.pad(r, ((0, pad), (0, 0), (0, 0)))
    rp = rp.reshape(n_chunks, chunk_size, r.shape[1], r.shape[2])
    out = jax.lax.map(
        lambda rc: _estimate_coherent_chunk(bank, rc, mode, alpha), rp)
    return out.reshape(n_chunks * chunk_size, r.shape[1], -1)[:n]


DEFAULT_ALPHA_GRID = (0.0, 0.1, 0.25, 0.5, 1.0)


def select_coherence_alpha(est_fn, r_val: jax.Array, h_val: jax.Array,
                           grid=DEFAULT_ALPHA_GRID):
    """Pick the evidence-blend alpha by validation NMSE — the automatic
    replacement for hand-setting `coherence_alpha` (round-3 evidence:
    the best alpha is SNR- and channel-model-dependent — 1.0 at −10 dB,
    0.1–0.25 at >=−5 dB on urban-macro, interior values on 3gpp
    [BASELINE.md] — so any fixed deployment value leaves measured wins on
    the table).

    est_fn(r_blocks, alpha) -> (B, T, D) estimates (e.g. a closure over
    `estimate_coherent`, the fused kernel, or the structured circulant
    path); r_val (B, T, M) held-out observations; h_val (B, T, D) their
    TRUE channels — selection needs real blocks from the deployment
    distribution: synthesizing validation data from the fitted mixture
    itself cannot work, because under the model the pure block posterior
    (alpha=1) is optimal by construction and the grid would never detect
    model mismatch. Returns (best_alpha, {alpha: nmse}). Each alpha is one
    compiled program (alpha is static in every estimation path), so the
    grid cost is len(grid) bounded-size evaluations at bank-prepare time,
    amortized over the serving/eval lifetime.
    """
    scores = {}
    for alpha in grid:
        h_hat = est_fn(r_val, float(alpha))
        err = h_hat - jnp.asarray(h_val, h_hat.dtype)
        # the repo's NMSE convention: sum|e|^2 / h.size (utils.metrics.nmse)
        scores[float(alpha)] = float(
            jnp.sum(jnp.abs(err) ** 2)) / np.prod(h_val.shape)
    best = min(scores, key=scores.get)
    return best, scores


def _stats_chunk(bank: PreparedBank, r: jax.Array):
    """Un-normalized online-softmax estimation state over THIS bank's
    components for one sample chunk — the JAX mirror of the Pallas stats
    kernel (`pallas_kernels._estimate_kernel_block_grouped_stats`). Logits
    use the kernel convention

        logit_k(r) = logw_k + 2 sum log diag(P_k) - |r conj(P_k) - mu~_k|^2

    (the row-constant -M log pi of the complex Gaussian is dropped: it is
    identical for every component on every shard, so it cancels in any
    normalized or merged combine). Dead components (-inf log-weight from
    `prepare_bank`'s floor) are clamped to -1e30 like the kernel so the
    running max stays finite."""
    pc = jnp.conj(bank.prec_chol_r)                       # (K, M, M)
    y = jnp.einsum("nm,kmp->nkp", r, pc)
    mu = jnp.einsum("km,kmp->kp", bank.means_r, pc)
    quad = jnp.sum(jnp.abs(y - mu[None, :, :]) ** 2, axis=-1)  # (N, K)
    diag = jnp.real(jnp.diagonal(bank.prec_chol_r, axis1=-2, axis2=-1))
    logw = jnp.maximum(
        bank.log_weights + 2.0 * jnp.sum(jnp.log(diag), axis=-1), -1e30)
    logits = (logw[None, :] - quad).astype(jnp.float32)
    m = jnp.max(logits, axis=-1)                          # (N,)
    p = jnp.exp(logits - m[:, None])
    den = jnp.sum(p, axis=-1)                             # (N,)
    k, d, mm = bank.filters.shape
    z = (r @ bank.filters.reshape(k * d, mm).T).reshape(r.shape[0], k, d)
    z = z + bank.bias[None, :, :]
    acc = jnp.einsum("nk,nkd->nd", p.astype(z.dtype), z)  # (N, D)
    return m, den, acc


@partial(jax.jit, static_argnums=(2,))
@highest_precision
def estimate_stats(bank: PreparedBank, r: jax.Array,
                   chunk_size: int = 2048):
    """'all'-mode estimation state (m, den, acc) for a (shard of a) bank.

    Merging states from disjoint component shards — flash-attention-style,
    with `pallas_kernels.merge_stats` or pmax/psum collectives over a mesh
    axis (`parallel.mesh.estimate_sharded_kernel`) — and taking acc/den
    reproduces `estimate(bank_full, r, 'all')` exactly. Shapes: m (N,) f32,
    den (N,) f32, acc (N, D) complex.
    """
    n = r.shape[0]
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n
    rp = jnp.pad(r, ((0, pad), (0, 0))).reshape(n_chunks, chunk_size, -1)
    m, den, acc = jax.lax.map(lambda rc: _stats_chunk(bank, rc), rp)
    return (m.reshape(-1)[:n], den.reshape(-1)[:n],
            acc.reshape(n_chunks * chunk_size, -1)[:n])


def _coherent_stats_chunk(bank: PreparedBank, r: jax.Array,
                          alpha: float = 1.0):
    """Un-normalized BLOCK online-softmax state for one chunk of coherence
    blocks r (B, T, M): the coherent analog of `_stats_chunk`. Per-snapshot
    kernel-convention logits SUM over the coherence axis before the
    max/exp — the log-det term 2 sum log diag(P_k) is correctly counted T
    times (once per snapshot likelihood) while the mixture log-weight enters
    once per block (`_estimate_coherent_chunk` semantics). The accumulator
    keeps the per-snapshot estimates weighted by the shared block weights,
    so merged acc/den reproduces `estimate_coherent(..., 'all')` exactly."""
    b, t, mm = r.shape
    rf = r.reshape(b * t, mm)
    pc = jnp.conj(bank.prec_chol_r)                       # (K, M, M)
    y = jnp.einsum("nm,kmp->nkp", rf, pc)
    mu = jnp.einsum("km,kmp->kp", bank.means_r, pc)
    quad = jnp.sum(jnp.abs(y - mu[None, :, :]) ** 2, axis=-1)  # (B*T, K)
    diag = jnp.real(jnp.diagonal(bank.prec_chol_r, axis1=-2, axis2=-1))
    logdet = 2.0 * jnp.sum(jnp.log(diag), axis=-1)        # (K,)
    k, d, _ = bank.filters.shape
    z = (rf @ bank.filters.reshape(k * d, mm).T).reshape(b, t, k, d)
    z = z + bank.bias[None, None, :, :]
    lw = jnp.maximum(bank.log_weights, -1e30)  # dead clamp like the kernel
    quad3 = quad.reshape(b, t, -1)
    if alpha >= 1.0:
        # block logit: logw (once) + T * logdet - sum_t quad
        logits = (lw[None, :] + t * logdet[None, :]
                  - jnp.sum(quad3, axis=1)).astype(jnp.float32)
        m = jnp.max(logits, axis=-1)                      # (B,)
        p = jnp.exp(logits - m[:, None])
        den = jnp.sum(p, axis=-1)                         # (B,)
        acc = jnp.einsum("bk,btkd->btd", p.astype(z.dtype), z)
        return m, den, acc
    # leave-one-out blend: per-SNAPSHOT state (m/den (B, T)) — each row
    # keeps its own likelihood plus alpha times the others' evidence
    # (`_estimate_coherent_chunk` alpha<1); the cross-shard merge is the
    # same elementwise pmax/psum recurrence, just per row
    lp3 = logdet[None, None, :] - quad3                    # (B, T, K)
    lp_sum = jnp.sum(lp3, axis=1)
    logits = (lw[None, None, :] + lp3
              + alpha * (lp_sum[:, None, :] - lp3)).astype(jnp.float32)
    m = jnp.max(logits, axis=-1)                          # (B, T)
    p = jnp.exp(logits - m[..., None])
    den = jnp.sum(p, axis=-1)                             # (B, T)
    acc = jnp.einsum("btk,btkd->btd", p.astype(z.dtype), z)
    return m, den, acc


@partial(jax.jit, static_argnums=(2, 3))
@highest_precision
def estimate_coherent_stats(bank: PreparedBank, r: jax.Array,
                            chunk_size: int = 512, alpha: float = 1.0):
    """'all'-mode BLOCK estimation state (m, den, acc) for a (shard of a)
    bank over coherence blocks r (B, T, M).

    Merging states from disjoint component shards — `merge_stats` with acc
    flattened to (B, T*D), or pmax/psum collectives over a mesh axis
    (`parallel.mesh.estimate_sharded_kernel` rank-3 route) — and taking
    acc/den reproduces `estimate_coherent(bank_full, r, 'all')` exactly.
    The collective payload per block is one f32 pair + one complex (T, D)
    accumulator, independent of K. Shapes: m (B,) f32, den (B,) f32,
    acc (B, T, D) complex.

    `alpha` < 1 selects the leave-one-out evidence blend
    (`estimate_coherent(alpha=)`): the state becomes per-SNAPSHOT —
    m/den (B, T) — and the identical elementwise merge applies (payload
    2T f32 + the same accumulator per block)."""
    if r.ndim != 3:
        raise ValueError(f"estimate_coherent_stats expects (B, T, M) blocks,"
                         f" got shape {r.shape}")
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
