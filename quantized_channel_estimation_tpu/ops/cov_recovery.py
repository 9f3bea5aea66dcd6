"""Covariance recovery from coarsely quantized observations.

The scheme (paper Fig. 2; reference `modules/cov_est_quant.py` and
`Covariance_recovery.py`):

  correlation: re-quantize to 1 bit, form the (responsibility-weighted) sample
               correlation, invert the arcsine law entrywise:
               sin(pi/2 Re) + j sin(pi/2 Im)
  scale:       per dimension, fit the std s of each real component to the
               below-threshold bin-occupancy probabilities by nonlinear LS on
               erf(tau/(sqrt(2) s)) = p  (Gauss-Newton); variance = 2 s^2
  combine:     C = diag(s) corr diag(s)

All statistics come in as EM-style sufficient statistics so that the same
function serves the quantized-EM M-step (`gmm_cplx_quant.py:773-853`) and the
standalone Fig.-2 benchmark; everything is batched over components.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quantized_channel_estimation_tpu.ops.gauss_newton import solve_erf_scale
from quantized_channel_estimation_tpu.ops.quantizer import ScalarQuantizer


def positive_thresholds(q: ScalarQuantizer) -> jax.Array:
    """The strictly positive thresholds tau_b, b = 1..2^(b-1)-1
    (`cov_est_quant.py:60`)."""
    t = q.thresholds
    return t[(t.shape[0] - 1) // 2 + 1:]


def one_bit_requantize(r: jax.Array) -> jax.Array:
    """sign(Re)/sqrt(2) + j sign(Im)/sqrt(2) (`cov_est_quant.py:27-28`)."""
    s = 1.0 / jnp.sqrt(2.0)
    return (s * jnp.sign(jnp.real(r)) + 1j * s * jnp.sign(jnp.imag(r))).astype(r.dtype)


def arcsine_correlation(corr_1bit: jax.Array) -> jax.Array:
    """Invert the arcsine law entrywise: the 1-bit correlation K maps back to
    sin(pi/2 Re K) + j sin(pi/2 Im K) (`cov_est_quant.py:53`)."""
    return (jnp.sin(jnp.pi / 2.0 * jnp.real(corr_1bit))
            + 1j * jnp.sin(jnp.pi / 2.0 * jnp.imag(corr_1bit))).astype(corr_1bit.dtype)


class QuantStats(NamedTuple):
    """Sufficient statistics for covariance recovery, batched over K.

    nk:        (K,)          responsibility masses
    corr_1bit: (K, D, D)     sum_n r_nk q1(x_n) q1(x_n)^H (un-normalized)
    below:     (K, D, B, 2)  sum_n r_nk 1(|Re/Im x_nd| < tau_b) for the
                             positive thresholds tau_1..tau_B (re, im stacked)
    """
    nk: jax.Array
    corr_1bit: jax.Array
    below: jax.Array


def accumulate_quant_stats(r: jax.Array, resp: jax.Array,
                           pos_tau: jax.Array) -> QuantStats:
    """One pass over a chunk of quantized data. r: (N, D), resp: (N, K),
    pos_tau: (B,). Additive across chunks (chunk-scan / psum friendly)."""
    q1 = one_bit_requantize(r)
    nk = jnp.sum(resp, axis=0)
    rq = resp.astype(r.real.dtype).T[..., None] * q1[None, :, :]  # (K, N, D)
    corr = jnp.einsum("knd,ne->kde", rq, jnp.conj(q1))
    below_re = jnp.abs(jnp.real(r))[:, :, None] < pos_tau  # (N, D, B)
    below_im = jnp.abs(jnp.imag(r))[:, :, None] < pos_tau
    below = jnp.stack([
        jnp.einsum("nk,ndb->kdb", resp, below_re.astype(resp.dtype)),
        jnp.einsum("nk,ndb->kdb", resp, below_im.astype(resp.dtype)),
    ], axis=-1)
    return QuantStats(nk, corr, below)


def recover_variances(nk: jax.Array, below: jax.Array, pos_tau: jax.Array,
                      x0: jax.Array, key: jax.Array) -> jax.Array:
    """Per-dimension unquantized variances (K, D) from bin-occupancy
    statistics: fit the real-component std s to erf(tau/(sqrt(2) s)) = p by
    Gauss-Newton, variance = 2 s^2 (`cov_est_quant.py:56-85`). Serves both
    the full recovery (scale part) and the diagonal quantized-EM (which
    needs no correlation at all)."""
    nk_d = nk[:, None, None, None]
    # occupancy clip bounds [1/Nk, (Nk-1)/Nk] invert for Nk < 2; order them
    # so jnp.clip stays well-defined (callers must still mask such
    # components out — gmm_quant requires Nk >= 2)
    lo, hi = 1.0 / nk_d, (nk_d - 1.0) / nk_d
    probs = jnp.clip(below / nk_d, jnp.minimum(lo, hi), jnp.maximum(lo, hi))
    k, d, b, _ = probs.shape
    # stack (re, im) residuals per (component, dim): 2B residuals, same tau
    probs_flat = jnp.moveaxis(probs, -1, -2).reshape(k, d, 2 * b)
    tau_flat = jnp.concatenate([pos_tau, pos_tau])
    s = solve_erf_scale(tau_flat, probs_flat, jnp.real(x0), key)
    sigma2 = jnp.clip(2.0 * s ** 2, 0.0, None)
    return jnp.where(jnp.isnan(sigma2), 1.0, sigma2)  # NaN guard (`:83-84`)


def recover_covariance(stats: QuantStats, pos_tau: jax.Array,
                       x0: jax.Array, key: jax.Array) -> jax.Array:
    """Recover the unquantized covariance bank (K, D, D) from quantized-data
    statistics (`cov_est_quant.py:31-88`).

    x0: (K, D) Gauss-Newton warm starts (the reference warm-starts from the
    current quantized variances, `gmm_cplx_quant.py:817`).
    """
    nk = stats.nk[:, None, None]
    corr = arcsine_correlation(stats.corr_1bit / nk.astype(stats.corr_1bit.dtype))
    sigma2 = recover_variances(stats.nk, stats.below, pos_tau, x0, key)
    scale = jnp.sqrt(sigma2).astype(corr.dtype)
    return scale[:, :, None] * corr * scale[:, None, :]


def recover_covariance_from_samples(r: jax.Array, q: ScalarQuantizer,
                                    key: jax.Array) -> jax.Array:
    """Unweighted single-covariance recovery from raw quantized samples —
    the standalone Fig.-2 path (`Covariance_recovery.py:96-138`). r: (N, D)."""
    pos_tau = positive_thresholds(q)
    if pos_tau.shape[0] == 0:
        # a 1-bit sign quantizer has no interior thresholds: bin occupancy
        # carries no amplitude information and the scale fit would silently
        # return its warm start (the reference's Fig. 2 uses 3 bits)
        raise ValueError("covariance recovery needs n_bits >= 2; a 1-bit "
                         "quantizer provides no amplitude information "
                         "(use the arcsine correlation alone)")
    resp = jnp.ones((r.shape[0], 1), jnp.float32)
    stats = accumulate_quant_stats(r, resp, pos_tau)
    x0 = jnp.ones((1, r.shape[1]), jnp.float32)
    return recover_covariance(stats, pos_tau, x0, key)[0]
