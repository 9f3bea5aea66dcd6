"""Quantized observation model: r = Q(A h + n) (`modules/utils.py:241-318`).

Everything runs on-device in one fused jit (the reference's torch path
round-trips GPU -> CPU for `np.digitize` inside the training loop,
`utils.py:206-221` — the known hot spot this design removes).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from quantized_channel_estimation_tpu.ops.cplx import crandn
from quantized_channel_estimation_tpu.ops.quantizer import (
    ScalarQuantizer, is_inf_bits, quantize)


def apply_pilots(h: jax.Array, a: Optional[jax.Array]) -> jax.Array:
    """y = A h for h (..., N); A (M, N) or None (identity)."""
    if a is None:
        return h
    return jnp.einsum("mn,...n->...m", a, h)


def observe(key: jax.Array, h: jax.Array, snr_db, a: Optional[jax.Array],
            n_bits, q: Optional[ScalarQuantizer] = None) -> jax.Array:
    """r = Q(A h + 10^(-snr/20) w), w ~ CN(0, I) (`utils.py:241-251`)."""
    y = apply_pilots(h, a)
    noise_amp = (10.0 ** (-jnp.asarray(snr_db) / 20.0)).astype(jnp.real(y).dtype)
    y = y + noise_amp * crandn(key, y.shape, dtype=y.dtype)
    return quantize(y, n_bits, q)


def observe_random_snr(key: jax.Array, h: jax.Array, snrs_db: jax.Array,
                       a: Optional[jax.Array], n_bits,
                       quantizers: Optional[list] = None,
                       snr_probs: Optional[jax.Array] = None,
                       return_tables: bool = False):
    """Per-sample random SNR draw from a discrete set, used for SNR-robust VAE
    training (`utils.py:254-318`). Returns (r, snr_per_sample), or with
    `return_tables` (r, snr, thresholds (B, T), labels (B, L)) — the
    per-sample quantizer tables the quantization-aware VAE likelihood needs
    for non-uniform designs (None, None for inf/1-bit, which have no
    tables).

    `quantizers` is a list of ScalarQuantizer (one per SNR, same shapes);
    selection is a gather over the stacked threshold/label tables — fully
    on-device, no per-sample Python loop.
    """
    ksel, knoise = jax.random.split(key)
    snrs_db = jnp.asarray(snrs_db, jnp.float32)
    n_snrs = snrs_db.shape[0]
    batch = h.shape[0]
    if snr_probs is not None:
        idx = jax.random.categorical(
            ksel, jnp.log(jnp.asarray(snr_probs, jnp.float32)), shape=(batch,))
    else:
        idx = jax.random.randint(ksel, (batch,), 0, n_snrs)
    snr = snrs_db[idx]

    y = apply_pilots(h, a)
    noise_amp = (10.0 ** (-snr / 20.0)).astype(jnp.real(y).dtype)
    # broadcast the per-sample amplitude over every trailing axis (h may be
    # (B, N) or (B, n_coherence, N)); a bare [:, None] right-aligns wrongly
    # for ndim > 2
    amp = noise_amp.reshape((batch,) + (1,) * (y.ndim - 1))
    y = y + amp * crandn(knoise, y.shape, dtype=y.dtype)

    if is_inf_bits(n_bits):
        return (y, snr, None, None) if return_tables else (y, snr)
    if n_bits == 1:
        r1 = quantize(y, 1, None)
        return (r1, snr, None, None) if return_tables else (r1, snr)
    thresholds = jnp.stack([qz.thresholds for qz in quantizers])[idx]  # (B, T)
    labels = jnp.stack([qz.labels for qz in quantizers])[idx]  # (B, L)

    def quant_one(yb, tb, lb):
        qz = ScalarQuantizer(tb, lb, jnp.zeros((), tb.dtype))
        return quantize(yb, n_bits, qz)

    r = jax.vmap(quant_one)(y, thresholds, labels)
    return (r, snr, thresholds, labels) if return_tables else (r, snr)
