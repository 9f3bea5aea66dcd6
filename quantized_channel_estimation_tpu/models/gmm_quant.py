"""Complex GMM fitted by EM *directly on quantized observations*, recovering
the underlying channel covariances each M-step (reference
`modules/gmm_cplx_quant.py` — training without ground-truth CSI).

Model state per component k:
  - channel covariance C_k (recovered, the quantity of interest)
  - quantized-observation covariance Cq_k (drives the E-step
    responsibilities of the quantized data r)

M-step covariance recovery by bit-width (`gmm_cplx_quant.py:773-853`):
  1 bit:  Cq = weighted sample cov of r; C = entrywise arcsine inversion
          sin(pi/2 Re) + j sin(pi/2 Im), PSD-clipped
  n bit:  C = arcsine-correlation x per-dim Gauss-Newton scale recovery
          (ops.cov_recovery), minus sigma^2 I, PSD-clipped; Cq re-synthesized
          as B Cy B^H with the exact quantized variance on the diagonal
  inf:    C = sample cov - sigma^2 I, PSD-clipped; Cq = C + sigma^2 I

Supported covariance types: 'full', 'toeplitz'/'block-toeplitz' (recovery +
Barton-Fuhrmann spectrum projection), 'diag'/'spherical' (per-dim
bin-occupancy variance recovery, O(NKD) statistics — n_bits >= 2; spherical
ties the variance across dims), and 'circulant' (full recovery +
closed-form DFT-diagonal projection). The reference INTENDS diag, spherical
and circulant quantized training but all three crash upstream (the
covariance updaters return one array where the caller unpacks two,
`gmm_cplx_quant.py:763-767,855-878,966` — and even then they compute plain
sample covariances of the QUANTIZED data with no Bussgang/occupancy
recovery of the channel covariance); the modes here are working designs
that exceed the reference.

Estimation from quantized pilots reuses `gmm_estimator.prepare_bank` — the
prepared-bank math is identical to the clean-trained GMM
(`gmm_cplx_quant.py:271-352`).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from quantized_channel_estimation_tpu.models import gmm as gmm_mod
from quantized_channel_estimation_tpu.models.gmm import (
    GmmConfig, GmmParams, log_prob_full, _chunk, _init_resp_stats, _resp_chunk)
from quantized_channel_estimation_tpu.ops import cov_recovery, linalg
from quantized_channel_estimation_tpu.ops.bussgang import (
    bank_gains_and_cov, bussgang_gain_diag, quantized_variance)
from quantized_channel_estimation_tpu.ops.precision import highest_precision
from quantized_channel_estimation_tpu.ops.quantizer import (
    ScalarQuantizer, is_inf_bits)


class QuantGmmFitResult(NamedTuple):
    params: GmmParams          # recovered channel-domain parameters
    cov_quant: jax.Array       # (K, M, M) quantized-observation covariances
    lower_bound: jax.Array
    n_iter: jax.Array
    converged: jax.Array


class _QState(NamedTuple):
    weights: jax.Array
    means: jax.Array       # (K, M) quantized-domain means (0 when zero_mean)
    covs: jax.Array        # (K, M, M) recovered channel covariances
    covs_quant: jax.Array  # (K, M, M)
    sigma_spec: jax.Array  # (K, F) inv-em spectrum (zeros when unused)
    lower_bound: jax.Array
    prev_lb: jax.Array
    n_iter: jax.Array


class _QStats(NamedTuple):
    nk: jax.Array
    sx: jax.Array
    sxx: jax.Array           # quantized-domain second moment
    corr_1bit: jax.Array     # 1-bit requantized correlation stat
    below: jax.Array         # threshold bin-occupancy stats (K, M, B, 2)
    log_norm: jax.Array


def _accumulate(r_chunks, mask, log_weights, means, prec_chol_q, pos_tau,
                n_bits, axis_name=None, psum_segments: int = 1):
    """Fused E-step + sufficient-statistics pass over chunked quantized data.

    Under shard_map with `axis_name`, the statistics (moments + covariance-
    recovery sums: 1-bit requantized correlation, threshold bin-occupancy
    counts) are psum'd over the data axis — every field is a plain data
    sum."""
    k = log_weights.shape[0]
    d = r_chunks.shape[-1]
    n_tau = pos_tau.shape[0] if pos_tau is not None else 0
    init = _QStats(
        jnp.zeros((k,), jnp.float32),
        jnp.zeros((k, d), r_chunks.dtype),
        jnp.zeros((k, d, d), r_chunks.dtype),
        jnp.zeros((k, d, d), r_chunks.dtype),
        jnp.zeros((k, d, n_tau, 2), jnp.float32),
        jnp.zeros((), jnp.float32),
    )

    def body(stats, inputs):
        xc, mc = inputs
        lp_fn = lambda x: log_prob_full(x, means, prec_chol_q)
        resp, ln = _resp_chunk(xc, mc, log_weights, lp_fn)
        # shared moment update (gmm._update_stats) + the quantized extras
        base = gmm_mod._update_stats(
            gmm_mod._Stats(stats.nk, stats.sx, stats.sxx, stats.log_norm),
            resp, xc, diag=False, log_norm_inc=ln)
        nk, sx, sxx = base.nk, base.sx, base.sxx
        if n_bits == 1 or is_inf_bits(n_bits):
            corr = stats.corr_1bit
            below = stats.below
        else:
            qs = cov_recovery.accumulate_quant_stats(xc, resp, pos_tau)
            corr = stats.corr_1bit + qs.corr_1bit
            below = stats.below + qs.below
        return _QStats(nk, sx, sxx, corr, below, base.log_norm), None

    # pipelined segment psums like the plain EM (gmm.segmented_psum_scan);
    # the quantized stats add two more O(K D^2) fields to the payload, so
    # overlapping the reduce matters even more here
    return gmm_mod.segmented_psum_scan(body, init, r_chunks, mask,
                                       axis_name, psum_segments)


class _QStatsDiag(NamedTuple):
    nk: jax.Array
    sx: jax.Array
    sxx: jax.Array           # (K, D) real per-dim quantized second moment
    below: jax.Array         # threshold bin-occupancy stats (K, D, B, 2)
    log_norm: jax.Array


class _QStateDiag(NamedTuple):
    weights: jax.Array
    means: jax.Array         # (K, D) quantized-domain means (0 if zero_mean)
    var: jax.Array           # (K, D) recovered channel variances
    var_quant: jax.Array     # (K, D) quantized-observation variances
    lower_bound: jax.Array
    prev_lb: jax.Array
    n_iter: jax.Array


def _accumulate_diag(r_chunks, mask, log_weights, means, var_quant, pos_tau,
                     n_bits, axis_name=None, psum_segments: int = 1):
    """Diagonal-model E-step + statistics: per-dim moments and bin-occupancy
    counts only — no (K, D, D) Grams at all, so the quantized-EM iteration
    drops from O(N K D^2) to O(N K D) HBM traffic (this is the scalable
    path the reference's broken 'diag' mode was reaching for)."""
    k = log_weights.shape[0]
    d = r_chunks.shape[-1]
    n_tau = pos_tau.shape[0] if pos_tau is not None else 0
    init = _QStatsDiag(
        jnp.zeros((k,), jnp.float32),
        jnp.zeros((k, d), r_chunks.dtype),
        jnp.zeros((k, d), jnp.float32),
        jnp.zeros((k, d, n_tau, 2), jnp.float32),
        jnp.zeros((), jnp.float32),
    )

    def body(stats, inputs):
        xc, mc = inputs
        lp_fn = lambda x: gmm_mod.log_prob_diag(x, means, var_quant)
        resp, ln = _resp_chunk(xc, mc, log_weights, lp_fn)
        base = gmm_mod._update_stats(
            gmm_mod._Stats(stats.nk, stats.sx, stats.sxx, stats.log_norm),
            resp, xc, diag=True, log_norm_inc=ln)
        below = stats.below
        if not is_inf_bits(n_bits):
            pos = pos_tau
            below_re = jnp.abs(jnp.real(xc))[:, :, None] < pos
            below_im = jnp.abs(jnp.imag(xc))[:, :, None] < pos
            below = below + jnp.stack([
                jnp.einsum("nk,ndb->kdb", resp, below_re.astype(resp.dtype)),
                jnp.einsum("nk,ndb->kdb", resp, below_im.astype(resp.dtype)),
            ], axis=-1)
        return _QStatsDiag(base.nk, base.sx, base.sxx, below,
                           base.log_norm), None

    return gmm_mod.segmented_psum_scan(body, init, r_chunks, mask,
                                       axis_name, psum_segments)


def _run_quant_em_diag(state0: _QStateDiag, chunks, mask, n: int,
                       cfg: GmmConfig, n_bits, sigma2, q, pos_tau,
                       k_gn) -> QuantGmmFitResult:
    """Diagonal quantized EM: per-dim variance recovery from bin occupancy
    (n-bit) or the sample moment (inf), exact quantized-variance
    resynthesis for the E-step. The reference intends this mode but its
    implementation crashes (`gmm_cplx_quant.py:763-767`); 1-bit is
    rejected in `_prep` (no amplitude information without correlations)."""
    if cfg.axis_name is not None:
        n = n * jax.lax.axis_size(cfg.axis_name)

    def em_iter(state: _QStateDiag) -> _QStateDiag:
        stats = _accumulate_diag(chunks, mask, jnp.log(state.weights),
                                 state.means, state.var_quant, pos_tau,
                                 n_bits, axis_name=cfg.axis_name,
                                 psum_segments=cfg.psum_segments)
        nk = stats.nk + 10.0 * jnp.finfo(jnp.float32).eps
        means = (jnp.zeros_like(state.means) if cfg.zero_mean
                 else stats.sx / nk[:, None].astype(state.means.dtype))
        if is_inf_bits(n_bits):
            y_var = stats.sxx / nk[:, None]
        else:
            gn_key = jax.random.fold_in(k_gn, state.n_iter)
            y_var = cov_recovery.recover_variances(
                stats.nk, stats.below, pos_tau, state.var_quant, gn_key)
        var = jnp.maximum(y_var - sigma2, cfg.reg_covar)
        if cfg.cov_type == "spherical":
            # tie the recovered variance across dimensions (the reference's
            # spherical updater is `diag(...).mean(1)`,
            # `gmm_cplx_quant.py:966` — also unreachable there)
            var = jnp.broadcast_to(jnp.mean(var, axis=-1, keepdims=True),
                                   var.shape)
        valid = (stats.nk >= 2.0)[:, None]
        var = jnp.where(valid, var, 1.0)  # empty-component guard (see
        # _recover_covs): park at unit power, ~zero weight keeps it inert
        if is_inf_bits(n_bits):
            var_quant = var + sigma2
        else:
            var_quant = quantized_variance(var + sigma2, q)
        weights = nk / jnp.sum(nk)
        return _QStateDiag(weights, means, var, var_quant,
                           stats.log_norm / n, state.lower_bound,
                           state.n_iter + 1)

    def cond(state: _QStateDiag):
        return jnp.logical_and(
            state.n_iter < cfg.max_iter,
            jnp.abs(state.lower_bound - state.prev_lb) >= cfg.tol)

    state = jax.lax.while_loop(cond, em_iter, state0)
    converged = jnp.abs(state.lower_bound - state.prev_lb) < cfg.tol
    # densify to the universal post-fit GmmParams (like the clean EM's
    # structured types, which convert to full after fit)
    d = state.var.shape[-1]
    dtype = state.means.dtype
    eye = jnp.eye(d, dtype=dtype)
    covs = state.var[:, :, None].astype(dtype) * eye
    prec_chol = (1.0 / jnp.sqrt(state.var))[:, :, None].astype(dtype) * eye
    params = GmmParams(state.weights, state.means, covs, prec_chol)
    cov_quant = state.var_quant[:, :, None].astype(dtype) * eye
    return QuantGmmFitResult(params, cov_quant, state.lower_bound,
                             state.n_iter, converged)


# ---------------------------------------------------------------------------
# DFT-NATIVE circulant quantized EM (round-5): O(N K D + N D log D) per
# iteration end to end — no (K, D, D) statistics, recovery, PSD projection,
# or Cholesky ever exists, so CSI-free circulant training scales to
# frontier D where the dense-recovery-then-project path (which this
# replaces) crashed the device (PARITY_NOTES.md round-5). The nonlinear
# recovery maps (arcsine inversion, occupancy Gauss-Newton) are applied
# AFTER the circulant projection of the statistics (averaging the D lags
# first REDUCES the noise entering the nonlinearity; the old path arcsined
# the dense estimate and projected after — measured quality parity in
# tests). PSD projection on the circulant cone is a free spectrum clip.
# ---------------------------------------------------------------------------

class _QStatsCirc(NamedTuple):
    nk: jax.Array        # (K,)
    sx_f: jax.Array      # (K, D) complex: DFT-domain weighted mean sums
    sxx_f: jax.Array     # (K, D) f32: sum resp |F r|^2 — the spectrum of
    #                      the circulant projection of the weighted
    #                      quantized sample covariance
    spec_q1: jax.Array   # (K, D) f32: same for the 1-bit requantized data
    below: jax.Array     # (K, B, 2) f32: bin occupancy pooled over dims
    #                      (circulant diag is constant)
    log_norm: jax.Array


class _QStateCirc(NamedTuple):
    weights: jax.Array
    means_f: jax.Array     # (K, D) complex DFT-domain means (0 zero_mean)
    spec_chan: jax.Array   # (K, D) recovered channel spectra
    spec_quant: jax.Array  # (K, D) quantized-observation spectra (E-step)
    lower_bound: jax.Array
    prev_lb: jax.Array
    n_iter: jax.Array


class QuantCircFitResult(NamedTuple):
    """Spectra-native result of the circulant quantized EM: feeds
    `structured_bank.prepare_bank_circulant(spectra=)` directly with no
    dense (K, D, D) materialization anywhere — the frontier-D entry."""
    weights: jax.Array   # (K,)
    means: jax.Array     # (K, D) complex, DATA domain
    spectra: jax.Array   # (K, D) recovered channel spectra
    spec_quant: jax.Array
    lower_bound: jax.Array
    n_iter: jax.Array
    converged: jax.Array


def _ufft(x: jax.Array) -> jax.Array:
    d = x.shape[-1]
    return jnp.fft.fft(x, axis=-1) / jnp.sqrt(d).astype(jnp.float32)


def _accumulate_circ(r_chunks, mask, log_weights, means_f, spec_quant,
                     pos_tau, n_bits, axis_name=None,
                     psum_segments: int = 1) -> _QStatsCirc:
    """Fused E-step + circulant recovery statistics: per-chunk FFTs feed a
    diagonal DFT-domain responsibility pass; every field is a plain data
    sum (psum'd under shard_map like the other quantized paths)."""
    k = log_weights.shape[0]
    d = r_chunks.shape[-1]
    n_tau = pos_tau.shape[0] if pos_tau is not None else 0
    need_q1 = not (n_bits == 1 or is_inf_bits(n_bits))
    init = _QStatsCirc(
        jnp.zeros((k,), jnp.float32),
        jnp.zeros((k, d), r_chunks.dtype),
        jnp.zeros((k, d), jnp.float32),
        jnp.zeros((k, d), jnp.float32),
        jnp.zeros((k, n_tau, 2), jnp.float32),
        jnp.zeros((), jnp.float32),
    )

    def body(stats, inputs):
        xc, mc = inputs
        u = _ufft(xc)
        resp, ln = _resp_chunk(
            u, mc, log_weights,
            lambda uu: gmm_mod.log_prob_diag(uu, means_f, spec_quant))
        respd = resp.astype(jnp.float32)
        nk = stats.nk + jnp.sum(resp, axis=0)
        sx_f = stats.sx_f + jnp.einsum(
            "nk,nd->kd", respd.astype(u.real.dtype), u)
        u2 = (jnp.real(u) ** 2 + jnp.imag(u) ** 2).astype(jnp.float32)
        sxx_f = stats.sxx_f + jnp.einsum("nk,nd->kd", respd, u2)
        spec_q1, below = stats.spec_q1, stats.below
        if need_q1:
            uq = _ufft(cov_recovery.one_bit_requantize(xc))
            uq2 = (jnp.real(uq) ** 2 + jnp.imag(uq) ** 2).astype(jnp.float32)
            spec_q1 = spec_q1 + jnp.einsum("nk,nd->kd", respd, uq2)
            cnt_re = jnp.sum(
                (jnp.abs(jnp.real(xc))[:, :, None] < pos_tau), axis=1)
            cnt_im = jnp.sum(
                (jnp.abs(jnp.imag(xc))[:, :, None] < pos_tau), axis=1)
            below = below + jnp.stack([
                jnp.einsum("nk,nb->kb", respd, cnt_re.astype(jnp.float32)),
                jnp.einsum("nk,nb->kb", respd, cnt_im.astype(jnp.float32)),
            ], axis=-1)
        return _QStatsCirc(nk, sx_f, sxx_f, spec_q1, below,
                           stats.log_norm + ln), None

    return gmm_mod.segmented_psum_scan(body, init, r_chunks, mask,
                                       axis_name, psum_segments)


def _recover_circ(stats: _QStatsCirc, cfg: GmmConfig, n_bits, sigma2, q,
                  pos_tau, prev_spec_quant, key):
    """Circulant channel-spectrum recovery + quantized-spectrum
    resynthesis — the spectrum-domain restatement of `_recover_covs`
    (its arcsine/occupancy maps applied to the projected first rows; PSD
    clip = spectrum clip; resynthesis via `_prepare_circulant`'s
    constant-diagonal closed forms)."""
    d = stats.sxx_f.shape[-1]
    nk = stats.nk
    spec_samp = stats.sxx_f / nk[:, None]
    if n_bits == 1:
        spec_quant = spec_samp + cfg.reg_covar
        # 1-bit data IS its own requantization (|r_d| = 1): arcsine-invert
        # the projected correlation's first row, clip the spectrum
        row = linalg.circulant_first_rows(spec_samp)
        row_rec = (jnp.sin(jnp.pi / 2.0 * jnp.real(row))
                   + 1j * jnp.sin(jnp.pi / 2.0 * jnp.imag(row)))
        spec_chan = jnp.maximum(
            linalg.circulant_spectra_from_first_rows(row_rec),
            cfg.reg_covar)
    elif is_inf_bits(n_bits):
        spec_chan = jnp.maximum(spec_samp - sigma2, cfg.reg_covar)
        spec_quant = spec_chan + sigma2
    else:
        corr_spec = stats.spec_q1 / nk[:, None]
        row = linalg.circulant_first_rows(corr_spec)
        row_rec = (jnp.sin(jnp.pi / 2.0 * jnp.real(row))
                   + 1j * jnp.sin(jnp.pi / 2.0 * jnp.imag(row)))
        spec_corr = jnp.maximum(
            linalg.circulant_spectra_from_first_rows(row_rec), 0.0)
        # per-component scale from dim-pooled occupancy (circulant
        # diagonals are constant): one 1-D Gauss-Newton per component
        x0 = jnp.mean(prev_spec_quant, axis=-1)[:, None]       # (K, 1)
        s2 = cov_recovery.recover_variances(
            nk, stats.below[:, None, :, :] / d, pos_tau, x0, key)[:, 0]
        spec_y = s2[:, None] * spec_corr
        spec_chan = jnp.maximum(spec_y - sigma2, cfg.reg_covar)
        # resynthesis (constant diagonal -> scalar gains/variance per k)
        sy = spec_chan + sigma2
        c0 = jnp.mean(sy, axis=-1)
        g = bussgang_gain_diag(c0, n_bits, q)
        beta2 = jnp.clip(g, 0.0, 1.0) ** 2
        qvar = quantized_variance(c0, q)
        spec_quant = beta2[:, None] * sy + (qvar - beta2 * c0)[:, None]
    spec_quant = jnp.maximum(spec_quant, cfg.reg_covar)
    # empty-component guard (see _recover_covs): park at unit power
    valid = (nk >= 2.0)[:, None]
    spec_chan = jnp.where(valid, spec_chan, 1.0)
    spec_quant = jnp.where(valid, spec_quant, 1.0)
    return spec_chan, spec_quant


def _run_quant_em_circ(state0: _QStateCirc, chunks, mask, n: int,
                       cfg: GmmConfig, n_bits, sigma2, q, pos_tau,
                       k_gn) -> QuantCircFitResult:
    if cfg.axis_name is not None:
        n = n * jax.lax.axis_size(cfg.axis_name)

    def em_iter(state: _QStateCirc) -> _QStateCirc:
        stats = _accumulate_circ(chunks, mask, jnp.log(state.weights),
                                 state.means_f, state.spec_quant, pos_tau,
                                 n_bits, axis_name=cfg.axis_name,
                                 psum_segments=cfg.psum_segments)
        nk = stats.nk + 10.0 * jnp.finfo(jnp.float32).eps
        means_f = (jnp.zeros_like(state.means_f) if cfg.zero_mean
                   else stats.sx_f / nk[:, None].astype(state.means_f.dtype))
        gn_key = jax.random.fold_in(k_gn, state.n_iter)
        spec_chan, spec_quant = _recover_circ(stats, cfg, n_bits, sigma2,
                                              q, pos_tau, state.spec_quant,
                                              gn_key)
        weights = nk / jnp.sum(nk)
        return _QStateCirc(weights, means_f, spec_chan, spec_quant,
                           stats.log_norm / n, state.lower_bound,
                           state.n_iter + 1)

    def cond(state: _QStateCirc):
        return jnp.logical_and(
            state.n_iter < cfg.max_iter,
            jnp.abs(state.lower_bound - state.prev_lb) >= cfg.tol)

    state = jax.lax.while_loop(cond, em_iter, state0)
    converged = jnp.abs(state.lower_bound - state.prev_lb) < cfg.tol
    d = state.spec_chan.shape[-1]
    means = jnp.fft.ifft(state.means_f, axis=-1) \
        * jnp.sqrt(d).astype(jnp.float32)
    return QuantCircFitResult(state.weights, means.astype(state.means_f.dtype),
                              state.spec_chan, state.spec_quant,
                              state.lower_bound, state.n_iter, converged)


# N*D element budget above which _circ_state0 streams its init: 60k x 8192
# (measured fine, recorded frontier row) stays under; 60k x 16384 measured
# 25.6 GB > the 15.75 GB v5e HBM through the dense init (full-dataset DFT +
# the k-means (N, 2D) squared-norm temps), so it engages the streamed one.
_INIT_ELEM_BUDGET = 600_000_000


def _streamed_init_stats(key, r, cfg: GmmConfig):
    """Frontier-D init: k-means centers from a deterministic row PREFIX
    (rows are i.i.d., so the prefix is an unbiased subsample), then one
    chunked DFT+hard-assignment scan folds labels into the init stats —
    neither the full DFT-domain dataset nor any (N, 2D) temp ever
    materializes. Init-only approximation; the EM iterations that follow
    are the exact chunked passes."""
    from quantized_channel_estimation_tpu.models import kmeans as km
    from quantized_channel_estimation_tpu.ops.cplx import cplx2real
    n, d = r.shape[0], r.shape[-1]
    k = cfg.n_components
    n_sub = min(n, max(4096, 50 * k))
    u_sub = _ufft(r[:n_sub])
    centers = km.kmeans(key, cplx2real(u_sub, axis=-1).astype(jnp.float32),
                        k, max_iter=cfg.kmeans_iter).centers
    xs, mask = _chunk(r, min(cfg.chunk_size, n))
    init = gmm_mod._zero_stats(k, d, r.dtype, True)

    def body(stats, inputs):
        rc, mc = inputs
        uc = _ufft(rc)
        dists = km._sq_dists(cplx2real(uc, axis=-1).astype(jnp.float32),
                             centers)
        onehot = (jax.nn.one_hot(jnp.argmin(dists, axis=-1), k,
                                 dtype=jnp.float32) * mc[:, None])
        return gmm_mod._update_stats(stats, onehot, uc, True), None

    stats, _ = jax.lax.scan(body, init, (xs, mask))
    return stats


def _circ_state0(key, r, cfg: GmmConfig):
    """Init from k-means (or random) responsibilities on the DFT-domain
    data (the clean circulant fit's init domain, `gmm.fit` circulant)."""
    if (cfg.axis_name is None and cfg.init == "kmeans"
            and r.shape[0] * r.shape[-1] > _INIT_ELEM_BUDGET):
        init_stats = _streamed_init_stats(key, r, cfg)
    else:
        u = _ufft(r)
        init_stats = _init_resp_stats(key, u, cfg, diag=True,
                                      chunk=cfg.chunk_size)
        if cfg.axis_name is not None:
            init_stats = jax.lax.psum(init_stats, cfg.axis_name)
    nk0 = init_stats.nk + 10.0 * jnp.finfo(jnp.float32).eps
    means_f0 = (jnp.zeros((cfg.n_components, r.shape[-1]), r.dtype)
                if cfg.zero_mean
                else init_stats.sx / nk0[:, None].astype(r.dtype))
    spec_quant0 = init_stats.sxx / nk0[:, None] + cfg.reg_covar
    return _QStateCirc(nk0 / jnp.sum(nk0), means_f0, spec_quant0,
                       spec_quant0,
                       jnp.asarray(-jnp.inf, jnp.float32),
                       jnp.asarray(jnp.inf, jnp.float32),
                       jnp.zeros((), jnp.int32))


@partial(jax.jit, static_argnums=(2, 3))
@highest_precision
def fit_circulant_spectra(key: jax.Array, r: jax.Array, cfg: GmmConfig,
                          n_bits, sigma2,
                          q: Optional[ScalarQuantizer] = None
                          ) -> QuantCircFitResult:
    """CSI-free circulant training, spectra-native: the FRONTIER-D entry —
    O(N K D + N D log D)/iter with NO dense (K, D, D) anywhere, returning
    spectra that feed `structured_bank.prepare_bank_circulant(spectra=)`
    directly.

    Quality note (measured, same-init A/B at D=64/K=8/2-bit/10 dB):
    recovering on the PROJECTED statistics costs ~5-9% NMSE vs
    `fit(cov_type='circulant')`'s dense-recovery-then-project (0.080-0.083
    vs 0.076 — under model misspecification the dense-then-project is the
    better projection), so use `fit` wherever its dense intermediates fit
    the device and this entry beyond (the dense path crashed the worker at
    D=2048; this one never materializes D^2 — PARITY_NOTES.md round-5)."""
    if cfg.cov_type != "circulant":
        raise ValueError("fit_circulant_spectra requires "
                         f"cov_type='circulant' (got {cfg.cov_type!r})")
    if not is_inf_bits(n_bits) and n_bits != 1 and q is None:
        raise ValueError("n-bit circulant recovery needs the quantizer")
    pos_tau = (cov_recovery.positive_thresholds(q)
               if (q is not None and not is_inf_bits(n_bits)
                   and n_bits != 1) else None)
    chunks, mask = _chunk(r, min(cfg.chunk_size, r.shape[0]))
    k_init, k_gn = jax.random.split(key)
    state0 = _circ_state0(k_init, r, cfg)
    return _run_quant_em_circ(state0, chunks, mask, r.shape[0], cfg,
                              n_bits, sigma2, q, pos_tau, k_gn)


@partial(jax.jit, static_argnums=(3, 4))
@highest_precision
def fit_circulant_spectra_resume(key: jax.Array, prev: QuantCircFitResult,
                                 r: jax.Array, cfg: GmmConfig, n_bits,
                                 sigma2,
                                 q: Optional[ScalarQuantizer] = None
                                 ) -> QuantCircFitResult:
    """Warm-start the spectra-native circulant quantized EM from a previous
    result — checkpoint-based restart / segmented frontier fits
    (`em_driver.fit_segmented`): the state is the O(K D) spectra pytree
    itself, so resuming never touches a dense covariance either."""
    if cfg.cov_type != "circulant":
        raise ValueError("fit_circulant_spectra_resume requires "
                         f"cov_type='circulant' (got {cfg.cov_type!r})")
    pos_tau = (cov_recovery.positive_thresholds(q)
               if (q is not None and not is_inf_bits(n_bits)
                   and n_bits != 1) else None)
    chunks, mask = _chunk(r, min(cfg.chunk_size, r.shape[0]))
    state0 = _QStateCirc(prev.weights, _ufft(prev.means), prev.spectra,
                         prev.spec_quant,
                         jnp.asarray(-jnp.inf, jnp.float32),
                         jnp.asarray(jnp.inf, jnp.float32),
                         jnp.zeros((), jnp.int32))
    return _run_quant_em_circ(state0, chunks, mask, r.shape[0], cfg,
                              n_bits, sigma2, q, pos_tau, key)


def _recover_covs(stats: _QStats, cfg: GmmConfig, n_bits, sigma2,
                  q: Optional[ScalarQuantizer], pos_tau, prev_covs_quant,
                  key, eye):
    """Channel-covariance recovery + quantized-covariance resynthesis."""
    nk_c = stats.nk[:, None, None].astype(stats.sxx.dtype)
    samp = stats.sxx / nk_c  # weighted sample cov of quantized data
    d = samp.shape[-1]

    if n_bits == 1:
        covs_quant = samp + cfg.reg_covar * eye
        covs = cov_recovery.arcsine_correlation(samp) + cfg.reg_covar * eye
        covs = linalg.psd_project_polar(linalg.hermitize(covs), cfg.reg_covar)
        covs = covs + cfg.reg_covar * eye
    elif is_inf_bits(n_bits):
        covs = samp + cfg.reg_covar * eye - sigma2 * eye + cfg.reg_covar * eye
        covs = linalg.psd_project_polar(linalg.hermitize(covs), cfg.reg_covar)
        covs = covs + cfg.reg_covar * eye
        covs_quant = covs + sigma2 * eye
    else:
        x0 = jnp.real(jnp.diagonal(prev_covs_quant, axis1=-2, axis2=-1))
        qstats = cov_recovery.QuantStats(stats.nk, stats.corr_1bit, stats.below)
        covs = cov_recovery.recover_covariance(qstats, pos_tau, x0, key)
        covs = covs - sigma2 * eye + cfg.reg_covar * eye
        covs = linalg.psd_project_polar(linalg.hermitize(covs), cfg.reg_covar)
        covs = covs + cfg.reg_covar * eye
        # resynthesize the implied quantized covariance from the recovered one
        cy = covs + sigma2 * eye
        diag_cy = jnp.real(jnp.diagonal(cy, axis1=-2, axis2=-1))
        gains = bussgang_gain_diag(diag_cy, n_bits, q).astype(cy.dtype)
        bq = gains[..., :, None] * cy * jnp.conj(gains)[..., None, :]
        diag_cr = quantized_variance(diag_cy, q).astype(cy.dtype)
        covs_quant = bq * (1 - eye) + diag_cr[..., None] * eye
    # Empty-component guard: k-means on coarsely quantized data (16 distinct
    # values per dim at 2 bits) readily produces components with Nk ~ 0,
    # whose bin-occupancy probabilities clip to inverted bounds
    # [1/Nk, (Nk-1)/Nk] and poison the recovery (the bounds invert for any
    # Nk < 2, so the mask requires Nk >= 2). Park such components at a
    # unit-power prior; their ~zero weights keep them out of estimation
    # (and prepare_bank masks them entirely).
    valid = (stats.nk >= 2.0)[:, None, None]
    covs = jnp.where(valid, covs, eye)
    covs_quant = jnp.where(valid, covs_quant, eye)
    return covs, covs_quant



def _prep(r: jax.Array, cfg: GmmConfig, n_bits, q):
    """Shared fit/fit_resume preparation: thresholds, cov-structure flags,
    data chunks.

    Covariance types: 'full', 'toeplitz'/'block-toeplitz' (Barton-Fuhrmann
    inverse-EM spectrum projection), 'diag' (per-dim bin-occupancy variance
    recovery only — no correlation statistics at all), and 'circulant'
    (full recovery + closed-form projection onto the circulant cone via the
    DFT diagonal). The reference INTENDS diag and circulant quantized
    training but both crash upstream (its covariance updater returns one
    array where the caller unpacks two, `gmm_cplx_quant.py:763-767`); these
    are working designs, not reproductions.
    """
    d = r.shape[-1]
    dtype = r.dtype
    eye = jnp.eye(d, dtype=dtype)
    pos_tau = (cov_recovery.positive_thresholds(q)
               if (q is not None and not is_inf_bits(n_bits) and n_bits != 1)
               else None)
    if cfg.cov_type not in ("full", "toeplitz", "block-toeplitz", "diag",
                            "spherical", "circulant"):
        raise NotImplementedError(
            f"Gmm_quant covariance_type={cfg.cov_type!r}: supported are "
            "'full', 'toeplitz', 'block-toeplitz', 'diag', 'spherical', "
            "'circulant'")
    if cfg.cov_type in ("diag", "spherical") and n_bits == 1:
        # |Q_1bit(y)|^2 == 1 for every sample: a 1-bit quantizer carries no
        # per-dim amplitude information, so a correlation-free diag model
        # is unidentifiable (the full path survives on the arcsine
        # CORRELATION, which diag ignores)
        raise NotImplementedError(
            f"cov_type={cfg.cov_type!r} quantized training is "
            "unidentifiable at n_bits=1 (bin occupancy carries no "
            "amplitude information)")
    inv_em = cfg.cov_type in ("toeplitz", "block-toeplitz")
    f2 = None
    if inv_em:
        f2 = gmm_mod._oversampled_dft_for(cfg, d, dtype)
    elif cfg.cov_type == "circulant":
        f2 = linalg.unitary_dft(d, dtype)
    chunks, mask = _chunk(r, min(cfg.chunk_size, r.shape[0]))
    return d, dtype, eye, pos_tau, inv_em, f2, chunks, mask


@partial(jax.jit, static_argnums=(2, 3, 6))
@highest_precision
def fit(key: jax.Array, r: jax.Array, cfg: GmmConfig, n_bits, sigma2,
        q: Optional[ScalarQuantizer] = None,
        quantizer_type: str = "uniform") -> QuantGmmFitResult:
    """Fit on quantized observations r (N, M); sigma2 is the training-SNR
    noise variance (`Bussgang_GMM_quant.py:117-122`)."""
    del quantizer_type  # the quantizer object already encodes the design
    # NOTE (round-5): 'circulant' keeps the dense-recovery-then-project
    # path here — a same-init A/B at D=64/K=8/2-bit measured it 5-9%
    # better NMSE than the DFT-native recovery (recovering on the dense
    # estimate and PROJECTING AFTER is the better projection under
    # model misspecification; the SCM truth is Toeplitz, not circulant).
    # At frontier D where the dense intermediates exceed the device, use
    # `fit_circulant_spectra` explicitly (O(N K D), measured delta
    # documented there).
    d, dtype, eye, pos_tau, inv_em, f2, chunks, mask = _prep(r, cfg, n_bits, q)
    n = r.shape[0]
    k_init, k_gn = jax.random.split(key)

    if cfg.cov_type in ("diag", "spherical"):
        init_stats = _init_resp_stats(k_init, r, cfg, diag=True,
                                      chunk=cfg.chunk_size)
        if cfg.axis_name is not None:
            init_stats = jax.lax.psum(init_stats, cfg.axis_name)
        nk0 = init_stats.nk + 10.0 * jnp.finfo(jnp.float32).eps
        means0 = (jnp.zeros((cfg.n_components, d), dtype) if cfg.zero_mean
                  else init_stats.sx / nk0[:, None].astype(dtype))
        var_quant0 = init_stats.sxx / nk0[:, None] + cfg.reg_covar
        state0 = _QStateDiag(nk0 / jnp.sum(nk0), means0, var_quant0,
                             var_quant0,
                             jnp.asarray(-jnp.inf, jnp.float32),
                             jnp.asarray(jnp.inf, jnp.float32),
                             jnp.zeros((), jnp.int32))
        return _run_quant_em_diag(state0, chunks, mask, n, cfg, n_bits,
                                  sigma2, q, pos_tau, k_gn)

    # ----- initialization: kmeans hard assignment, plain sample covs as the
    # initial quantized covs; channel covs start from the same recovery -----
    init_stats0 = _init_resp_stats(k_init, r, cfg, diag=False,
                                   chunk=cfg.chunk_size)
    if cfg.axis_name is not None:
        # shard_map data parallelism: global init statistics (requires
        # cfg.init='random'; per-shard k-means would be inconsistent)
        init_stats0 = jax.lax.psum(init_stats0, cfg.axis_name)
    nk0 = init_stats0.nk + 10.0 * jnp.finfo(jnp.float32).eps
    means0 = jnp.zeros((cfg.n_components, d), dtype) if cfg.zero_mean else (
        init_stats0.sx / nk0[:, None].astype(dtype))
    covs_quant0 = init_stats0.sxx / nk0[:, None, None].astype(dtype) \
        + cfg.reg_covar * eye
    weights0 = nk0 / jnp.sum(nk0)
    sigma_spec0 = jnp.zeros(
        (cfg.n_components,
         2 * d if inv_em else d if cfg.cov_type == "circulant" else 1),
        jnp.float32)
    state0 = _QState(weights0, means0, covs_quant0, covs_quant0, sigma_spec0,
                     jnp.asarray(-jnp.inf, jnp.float32),
                     jnp.asarray(jnp.inf, jnp.float32),
                     jnp.zeros((), jnp.int32))

    # initialize sigma_spec for inv-em from the initial covariance spectrum
    if inv_em:
        sig0 = jnp.maximum(jnp.real(jnp.einsum(
            "fd,kde,fe->kf", f2, covs_quant0, jnp.conj(f2))), cfg.reg_covar)
        state0 = state0._replace(sigma_spec=sig0)
    return _run_quant_em(state0, chunks, mask, r.shape[0], cfg, n_bits,
                         sigma2, q, pos_tau, inv_em, f2, eye, k_gn)


def _run_quant_em(state0: _QState, chunks, mask, n: int, cfg: GmmConfig,
                  n_bits, sigma2, q, pos_tau, inv_em: bool, f2, eye,
                  k_gn) -> QuantGmmFitResult:
    """The quantized-EM loop from a given state (shared by `fit` and
    `fit_resume`)."""
    dtype = eye.dtype
    if cfg.axis_name is not None:
        n = n * jax.lax.axis_size(cfg.axis_name)

    def em_iter(state: _QState) -> _QState:
        prec_q = linalg.robust_precision_cholesky(state.covs_quant)
        stats = _accumulate(chunks, mask, jnp.log(state.weights), state.means,
                            prec_q, pos_tau, n_bits,
                            axis_name=cfg.axis_name,
                            psum_segments=cfg.psum_segments)
        nk = stats.nk + 10.0 * jnp.finfo(jnp.float32).eps
        means = (jnp.zeros_like(state.means) if cfg.zero_mean
                 else stats.sx / nk[:, None].astype(dtype))
        gn_key = jax.random.fold_in(k_gn, state.n_iter)
        covs, covs_quant = _recover_covs(stats, cfg, n_bits, sigma2, q,
                                         pos_tau, state.covs_quant, gn_key, eye)
        if inv_em:
            # Barton-Fuhrmann projection applied to the *recovered* covariance
            # (`gmm_cplx_quant.py:880-945`); pseudo-inverse + trust-region
            # step for float32 stability (see gmm._m_step_toeplitz)
            cinv = linalg.psd_pinv(state.covs, rcond=1e-7)
            m = cinv @ covs @ cinv - cinv
            theta = jnp.real(jnp.einsum("fd,kde,fe->kf", f2, m, jnp.conj(f2)))
            raw = state.sigma_spec + state.sigma_spec ** 2 * theta
            sigma_spec = jnp.maximum(
                jnp.clip(raw, 0.1 * state.sigma_spec, 10.0 * state.sigma_spec),
                cfg.reg_covar)
            covs = jnp.einsum("fd,kf,fe->kde", jnp.conj(f2),
                              sigma_spec.astype(dtype), f2) + cfg.reg_covar * eye
            if is_inf_bits(n_bits):
                # unquantized: the E-step covariance is exactly Cy of the
                # projected channel covariance (the reference's `n_bits > 1`
                # resynthesis with A_buss = I, `gmm_cplx_quant.py:934-945`);
                # without this the E-step would use the stale pre-projection
                # covariance and EM optimizes a mismatched objective
                covs_quant = covs + sigma2 * eye
            elif n_bits != 1:
                _, covs_quant = bank_gains_and_cov(covs + sigma2 * eye,
                                                   n_bits, q, exact_diag=True)
        elif cfg.cov_type == "circulant":
            # closed-form projection of the recovered covariance onto the
            # circulant cone: C_circ = F^H diag(sigma) F with sigma the DFT
            # diagonal (the Frobenius-nearest circulant; the clean-EM analog
            # diagonalizes the data instead, `gmm_cplx_bussgang.py:104-119`,
            # which quantized data cannot do — quantization is per-antenna)
            sigma_spec = jnp.maximum(jnp.real(jnp.einsum(
                "fd,kde,fe->kf", f2, covs, jnp.conj(f2))), cfg.reg_covar)
            covs = jnp.einsum("fd,kf,fe->kde", jnp.conj(f2),
                              sigma_spec.astype(dtype), f2) \
                + cfg.reg_covar * eye
            if is_inf_bits(n_bits):
                covs_quant = covs + sigma2 * eye
            elif n_bits == 1:
                # arcsine law of the projected Cy (shared Cr model)
                _, covs_quant = bank_gains_and_cov(covs + sigma2 * eye, 1, q)
            else:
                _, covs_quant = bank_gains_and_cov(covs + sigma2 * eye,
                                                   n_bits, q, exact_diag=True)
        else:
            sigma_spec = state.sigma_spec
        weights = nk / jnp.sum(nk)
        return _QState(weights, means, covs, covs_quant, sigma_spec,
                       stats.log_norm / n, state.lower_bound,
                       state.n_iter + 1)

    def cond(state: _QState):
        return jnp.logical_and(
            state.n_iter < cfg.max_iter,
            jnp.abs(state.lower_bound - state.prev_lb) >= cfg.tol)

    state = jax.lax.while_loop(cond, em_iter, state0)
    converged = jnp.abs(state.lower_bound - state.prev_lb) < cfg.tol

    covs = linalg.hermitize(state.covs) + cfg.reg_covar * eye
    prec = linalg.robust_precision_cholesky(covs)
    # channel-domain means: the reference keeps the quantized-domain means as
    # means_cplx (zero in the standard zero-mean config)
    params = GmmParams(state.weights, state.means, covs, prec)
    return QuantGmmFitResult(params, state.covs_quant, state.lower_bound,
                             state.n_iter, converged)


@partial(jax.jit, static_argnums=(3, 4))
@highest_precision
def fit_resume(key: jax.Array, prev: QuantGmmFitResult, r: jax.Array,
               cfg: GmmConfig, n_bits, sigma2,
               q: Optional[ScalarQuantizer] = None) -> QuantGmmFitResult:
    """Warm-start quantized EM from a previous fit result — checkpoint-based
    restart (SURVEY §5); the analog of `gmm.fit_resume`. The key seeds the
    per-iteration Gauss-Newton restarts only. For toeplitz/block-toeplitz
    the inv-em spectrum is recovered exactly from the checkpointed channel
    covariances via the frame Gram solve
    (`linalg.spectrum_from_covariance`)."""
    d, dtype, eye, pos_tau, inv_em, f2, chunks, mask = _prep(r, cfg, n_bits, q)
    k = prev.params.weights.shape[0]
    if cfg.cov_type in ("diag", "spherical"):
        var = jnp.real(jnp.diagonal(prev.params.covariances,
                                    axis1=-2, axis2=-1))
        var_quant = jnp.real(jnp.diagonal(prev.cov_quant,
                                          axis1=-2, axis2=-1))
        state0 = _QStateDiag(prev.params.weights, prev.params.means,
                             var, var_quant,
                             jnp.asarray(-jnp.inf, jnp.float32),
                             jnp.asarray(jnp.inf, jnp.float32),
                             jnp.zeros((), jnp.int32))
        return _run_quant_em_diag(state0, chunks, mask, r.shape[0], cfg,
                                  n_bits, sigma2, q, pos_tau, key)
    if inv_em:
        sigma_spec = linalg.spectrum_from_covariance(
            prev.params.covariances, f2, cfg.reg_covar)
    elif cfg.cov_type == "circulant":
        # recomputed fresh each iteration (closed-form projection, not a
        # fixed point) — only the carry shape matters
        sigma_spec = jnp.zeros((k, prev.params.means.shape[-1]), jnp.float32)
    else:
        sigma_spec = jnp.zeros((k, 1), jnp.float32)
    state0 = _QState(prev.params.weights, prev.params.means,
                     prev.params.covariances.astype(dtype),
                     prev.cov_quant.astype(dtype), sigma_spec,
                     jnp.asarray(-jnp.inf, jnp.float32),
                     jnp.asarray(jnp.inf, jnp.float32),
                     jnp.zeros((), jnp.int32))
    return _run_quant_em(state0, chunks, mask, r.shape[0], cfg, n_bits,
                         sigma2, q, pos_tau, inv_em, f2, eye, key)
