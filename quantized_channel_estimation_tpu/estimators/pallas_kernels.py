"""Fused GMM-Bussgang estimation kernel (Pallas/TPU).

Computes, for quantized observations r (N, M) and a prepared component bank
(K components), the 'all'-mode estimate

    h_n = sum_k softmax_k(logit_k(r_n)) (b_k + W_k r_n)
    logit_k(r) = logw_k - | r conj(P_k) - mu~_k |^2

in ONE kernel launch, flash-attention style over the component axis:

  - the entire bank (precision factors P, filters W, biases, means) stays
    resident in VMEM (~4 MB at K=64, M=D=64) — read from HBM once per kernel,
    not once per sample tile;
  - samples stream through in (TILE_N, M) tiles on the grid;
  - an online-softmax accumulator fuses responsibility computation with the
    weighted combine, so the (N, K, D) per-component-estimate tensor that the
    XLA einsum path materializes in HBM (hundreds of MB per batch) never
    exists.

Complex arithmetic is explicit real/imag (the MXU has no complex type). Two
bank layouts are provided:

  - `KernelBank` / `estimate`: Karatsuba — 3 real matmuls per complex GEMM,
    each M=64 wide (half a 128x128 MXU tile in contraction AND output);
  - `KernelBankBlock` / `estimate_block(_grouped)`: real 2x2 block embedding
    [[B_re, B_im], [-B_im, B_re]] — one GEMM with contraction 2M=128 (a full
    MXU tile); `_grouped` packs `group` components' [P|W] blocks into one
    (128, group*256) GEMM. 4/3 more nominal FLOPs than Karatsuba but 2.2x
    faster measured on v5e (tools/kernel_bench.py): MXU time is quantized by
    128-wide tiles, so half-width GEMMs waste the array.

`estimate_fused` is the canonical entry (measured-best block variant). Bank
arrays are component-batched 3-D refs (dynamic indexing on the untiled
leading dim); per-component log-weight scalars live in SMEM.

The pure-JAX `reference_estimate_packed` implements the same math for
correctness tests; `gmm_estimator.estimate` remains the general path (top-k /
cumulative modes).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantized_channel_estimation_tpu.models.gmm_estimator import PreparedBank
from quantized_channel_estimation_tpu.ops.precision import highest_precision


class KernelBank(NamedTuple):
    """PreparedBank re-laid-out for the kernel: all-real, component-batched.

    Complex GEMMs run as 3 real MXU matmuls (Karatsuba): for y = r B with
    r = rr + i ri, B = B_re + i B_im,
        P1 = rr B_re,  P2 = ri B_im,  P3 = (rr + ri)(B_re + B_im)
        Re y = P1 - P2,  Im y = P3 - P1 - P2
    so the bank stores B_re, B_im AND the precomputed sum B_re + B_im.

    pc_re/pc_im/pc_s: (K, M, M)  conj(P_k) (+ sum plane)
    wt_re/wt_im/wt_s: (K, M, D)  W_k^T (+ sum plane)
    mu_re/mu_im:      (K, 1, M)  mu~_k = means_r_k @ conj(P_k)
    b_re/b_im:        (K, 1, D)  bias_k = mu_h,k - W_k mu_r,k
    logw:             (K,)       log weights + 2 sum log diag(P_k)  [SMEM]
    """
    pc_re: jax.Array
    pc_im: jax.Array
    pc_s: jax.Array
    wt_re: jax.Array
    wt_im: jax.Array
    wt_s: jax.Array
    mu_re: jax.Array
    mu_im: jax.Array
    b_re: jax.Array
    b_im: jax.Array
    logw: jax.Array


@highest_precision
def kernel_bank(bank: PreparedBank) -> KernelBank:
    """Lower a PreparedBank to the kernel layout (jittable)."""
    k, d, m = bank.filters.shape
    pc = jnp.conj(bank.prec_chol_r)  # (K, M, M); y = r @ pc
    mu = jnp.einsum("km,kmp->kp", bank.means_r, pc)[:, None, :]  # (K, 1, M)
    wt = jnp.swapaxes(bank.filters, -1, -2)  # (K, M, D)
    diag = jnp.real(jnp.diagonal(bank.prec_chol_r, axis1=-2, axis2=-1))
    logw = bank.log_weights + 2.0 * jnp.sum(jnp.log(diag), axis=-1)
    # Dead components carry log-weight -inf (prepare_bank's mask). The online
    # softmax would compute exp(-inf - (-inf)) = NaN if such a component
    # leads; a large finite floor keeps the recursion exact: exp(floor - m)
    # underflows to 0 as soon as any live logit appears.
    logw = jnp.maximum(logw, -1e30)
    b = bank.bias[:, None, :]  # (K, 1, D)
    pc_re, pc_im = jnp.real(pc), jnp.imag(pc)
    wt_re, wt_im = jnp.real(wt), jnp.imag(wt)
    return KernelBank(
        pc_re, pc_im, pc_re + pc_im, wt_re, wt_im, wt_re + wt_im,
        jnp.real(mu), jnp.imag(mu), jnp.real(b), jnp.imag(b),
        logw.astype(jnp.float32))


def _estimate_kernel(logw, pc_re, pc_im, pc_s, wt_re, wt_im, wt_s,
                     mu_re, mu_im, b_re, b_im, r_re, r_im, out_re, out_im,
                     *, n_comp: int):
    """One sample tile: stream over K components with online softmax."""
    tile_n = r_re.shape[0]
    d = out_re.shape[1]
    rr = r_re[:]
    ri = r_im[:]
    rs = rr + ri  # shared Karatsuba operand

    def cmul(bre, bim, bsum):
        """Complex (rr + i ri) @ (bre + i bim) via 3 real MXU matmuls."""
        p1 = jnp.dot(rr, bre, preferred_element_type=jnp.float32)
        p2 = jnp.dot(ri, bim, preferred_element_type=jnp.float32)
        p3 = jnp.dot(rs, bsum, preferred_element_type=jnp.float32)
        return p1 - p2, p3 - p1 - p2

    def body(k, carry):
        m_run, denom, acc_re, acc_im = carry
        # y = r @ conj(P_k)
        y_re, y_im = cmul(pc_re[k], pc_im[k], pc_s[k])
        dy_re = y_re - mu_re[k]
        dy_im = y_im - mu_im[k]
        quad = jnp.sum(dy_re * dy_re + dy_im * dy_im, axis=-1,
                       keepdims=True)  # (TN, 1)
        logit = logw[k] - quad
        # z = r @ W_k^T + b_k
        z_re, z_im = cmul(wt_re[k], wt_im[k], wt_s[k])
        z_re = z_re + b_re[k]
        z_im = z_im + b_im[k]
        # online softmax update
        m_new = jnp.maximum(m_run, logit)
        scale = jnp.exp(m_run - m_new)
        p = jnp.exp(logit - m_new)
        denom = denom * scale + p
        acc_re = acc_re * scale + p * z_re
        acc_im = acc_im * scale + p * z_im
        return m_new, denom, acc_re, acc_im

    init = (jnp.full((tile_n, 1), -jnp.inf, jnp.float32),
            jnp.zeros((tile_n, 1), jnp.float32),
            jnp.zeros((tile_n, d), jnp.float32),
            jnp.zeros((tile_n, d), jnp.float32))
    _, denom, acc_re, acc_im = jax.lax.fori_loop(0, n_comp, body, init)
    out_re[:] = acc_re / denom
    out_im[:] = acc_im / denom


@functools.partial(jax.jit, static_argnums=(3, 4))
def estimate_packed(kb: KernelBank, r_re: jax.Array, r_im: jax.Array,
                    tile_n: int = 512, interpret: bool = False):
    """Fused 'all'-mode estimation. r_re/r_im: (N, M) float32 ->
    (h_re, h_im): (N, D) float32. N must be a multiple of tile_n (callers
    pad; see `estimate`)."""
    n, m = r_re.shape
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n} "
                         "(the grid would silently drop the tail rows); "
                         "pad like `estimate` does")
    k_comp = kb.pc_re.shape[0]
    d = kb.wt_re.shape[-1]
    grid = (n // tile_n,)
    bank_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole array, resident
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    data_spec = pl.BlockSpec((tile_n, m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_estimate_kernel, n_comp=k_comp)
    flops = 6 * n * m * (m + d) * k_comp  # 3 real GEMMs per complex GEMM
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[smem_spec] + [bank_spec] * 10 + [data_spec, data_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((n, d), jnp.float32),
                   jax.ShapeDtypeStruct((n, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (2 * n * m + 2 * n * d
                                + 3 * k_comp * m * (m + d)),
            transcendentals=2 * n * k_comp),
        interpret=interpret,
    )(kb.logw, kb.pc_re, kb.pc_im, kb.pc_s, kb.wt_re, kb.wt_im, kb.wt_s,
      kb.mu_re, kb.mu_im, kb.b_re, kb.b_im, r_re, r_im)


def estimate(bank: PreparedBank, r: jax.Array, tile_n: int = 512,
             interpret: bool = False) -> jax.Array:
    """Drop-in fused replacement for `gmm_estimator.estimate(bank, r, 'all')`.

    Accepts complex r inside a trace; pads N to a tile multiple.
    """
    kb = kernel_bank(bank)
    n = r.shape[0]
    n_pad = -(-n // tile_n) * tile_n
    rp = jnp.pad(r, ((0, n_pad - n), (0, 0)))
    h_re, h_im = estimate_packed(kb, jnp.real(rp).astype(jnp.float32),
                                 jnp.imag(rp).astype(jnp.float32),
                                 tile_n, interpret)
    return (h_re + 1j * h_im)[:n].astype(r.dtype)


class KernelBankBlock(NamedTuple):
    """Bank in real-block layout: one full-width GEMM per component.

    The Karatsuba layout (KernelBank) runs 3 real matmuls per complex GEMM,
    each with contraction/output dims of M=64 — half a 128×128 MXU tile in
    both directions. This layout instead embeds each complex matrix B as the
    real 2×2 block matrix [[B_re, B_im], [-B_im, B_re]] so that with
    R = [r_re | r_im] (N, 2M):

        R @ Bblk = [Re(r B) | Im(r B)]

    — one real GEMM with contraction 2M = 128 (a full MXU tile). Per
    component the precision block (2M, 2M) and filter block (2M, 2D) are
    concatenated column-wise into pw (2M, 2M+2D), so the whole per-component
    compute is ONE (TILE_N, 128) @ (128, 256) MXU call. 4/3 more nominal
    FLOPs than Karatsuba, but every pass is full-width.

    pw:   (K, 2M, 2M+2D)   [Pblk | Wblk]
    mu:   (K, 1, 2M)       [Re mu~ | Im mu~]
    b:    (K, 1, 2D)       [Re bias | Im bias]
    logw: (K,)             log weights + 2 sum log diag(P_k)  [SMEM]
    """
    pw: jax.Array
    mu: jax.Array
    b: jax.Array
    logw: jax.Array


def _cplx_block(b: jax.Array) -> jax.Array:
    """(..., M, P) complex -> (..., 2M, 2P) real block [[re, im], [-im, re]]."""
    bre, bim = jnp.real(b), jnp.imag(b)
    top = jnp.concatenate([bre, bim], axis=-1)
    bot = jnp.concatenate([-bim, bre], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


@highest_precision
def kernel_bank_block(bank: PreparedBank, t_coh: int = 1,
                      coh_alpha: float = 1.0) -> KernelBankBlock:
    """Lower a PreparedBank to the block-GEMM kernel layout (jittable).

    t_coh > 1 prepares the bank for the COHERENT kernel path: the per-block
    logit is logw_mixture (once) + T * logdet - sum_t quad_t, and the kernel
    pools T per-snapshot logits by summation, so the mixture log-weight is
    pre-divided by T (the log-det term 2 sum log diag(P) is correctly
    counted once per snapshot). coh_alpha < 1 selects the leave-one-out
    blend: the in-kernel logit becomes (1-a)*lg_t + a*sum_t' lg_t', whose
    logw coefficient is (1-a+aT) — the divisor below — while the logdet
    coefficient (1-a+aT) matches the blend of per-snapshot likelihoods
    exactly."""
    pc = jnp.conj(bank.prec_chol_r)  # (K, M, M); y = r @ pc
    mu = jnp.einsum("km,kmp->kp", bank.means_r, pc)  # (K, M)
    wt = jnp.swapaxes(bank.filters, -1, -2)  # (K, M, D)
    diag = jnp.real(jnp.diagonal(bank.prec_chol_r, axis1=-2, axis2=-1))
    lw_div = (1.0 - coh_alpha + coh_alpha * t_coh) if t_coh > 1 else 1.0
    logw = (bank.log_weights / lw_div
            + 2.0 * jnp.sum(jnp.log(diag), axis=-1))
    logw = jnp.maximum(logw, -1e30)  # dead-component floor (see kernel_bank)
    pw = jnp.concatenate([_cplx_block(pc), _cplx_block(wt)], axis=-1)
    mu2 = jnp.concatenate([jnp.real(mu), jnp.imag(mu)], axis=-1)[:, None, :]
    b2 = jnp.concatenate([jnp.real(bank.bias), jnp.imag(bank.bias)],
                         axis=-1)[:, None, :]
    return KernelBankBlock(pw.astype(jnp.float32), mu2.astype(jnp.float32),
                           b2.astype(jnp.float32), logw.astype(jnp.float32))


def estimate_block(bank: PreparedBank, r: jax.Array, tile_n: int = 1024,
                   interpret: bool = False) -> jax.Array:
    """Block-GEMM estimation with one component per MXU call — exactly the
    grouped kernel at group=1 (kept as a named benchmark variant)."""
    return estimate_block_grouped(bank, r, tile_n=tile_n, group=1,
                                  interpret=interpret)


def _check_t_coh(tile_n: int, t_coh: int):
    """Coherent tiles pool logits over T static sublane slices of bp rows
    each; bp must land on the f32 sublane granularity (8 rows) and T must
    stay small (Mosaic crashes on long static unrolls — CLAUDE.md)."""
    if t_coh <= 1:
        return
    bp = tile_n // t_coh
    if tile_n % t_coh or bp % 8:
        raise ValueError(
            f"t_coh={t_coh} needs tile_n ({tile_n}) divisible by it with a "
            f"per-tile block count that is a multiple of 8 (got bp={bp})")
    if t_coh > 16:
        raise NotImplementedError(
            f"t_coh={t_coh}: the in-kernel pool statically unrolls T "
            "sublane slices; T <= 16 is the hardware-validated range "
            "(T<=8 round-3; T=16 compiled, ran, and calibrated "
            "quality-neutral on real fits 2026-08-21 — "
            "results/parity_r4/t16_calibration.log; the unroll slices are "
            "bp-ROW sublane slices, not the single-lane slices Mosaic "
            "crashes on) — the auto-dispatch falls back to the einsum "
            "path above it")


def _blocks_to_tmajor(r: jax.Array, tile_n: int):
    """Lay coherence blocks r (B, T, M) out T-MAJOR per sample tile for the
    coherent kernel: blocks are padded to a multiple of bp = tile_n // T and
    grouped bp per tile; within tile i, row j*bp + b holds snapshot j of
    block i*bp + b. Returns (rows (N_pad, M), n_blocks_padded)."""
    b, t, m = r.shape
    bp = tile_n // t
    b_pad = -(-b // bp) * bp
    rp = jnp.pad(r, ((0, b_pad - b), (0, 0), (0, 0)))
    rows = rp.reshape(b_pad // bp, bp, t, m).swapaxes(1, 2)
    return rows.reshape(b_pad * t, m), b_pad


def _tmajor_to_blocks(x: jax.Array, t: int, tile_n: int, n_blocks: int):
    """Inverse of `_blocks_to_tmajor` for a per-row output x (N_pad, X) (or
    (N_pad,)): back to (n_blocks, T, X) / (n_blocks, T)."""
    bp = tile_n // t
    lead = x.shape[0] // (bp * t)
    out = x.reshape((lead, t, bp) + x.shape[1:]).swapaxes(1, 2)
    return out.reshape((lead * bp, t) + x.shape[1:])[:n_blocks]


def _grouped_stream(logw, pw, mu, b, rr, n_groups: int, group: int,
                    two_m: int, two_d: int, precision, mode: str = "f32",
                    pw_lo=None, rr_lo=None, t_coh: int = 1,
                    coh_alpha: float = 1.0):
    """Stream over K, `group` components per GEMM: pw[g] is
    (2M, group*(2M+2D)) = [P_1|W_1|...|P_G|W_G], widening the MXU output
    dim and cutting loop-iteration count. Returns the online-softmax state
    (running max, denominator, un-normalized accumulator) over the streamed
    components — the shared core of the normalizing and stats-emitting
    kernels (the latter enables the K-chunked merge for oversized banks).

    `mode` selects the GEMM precision scheme (tools/kernel_split_bench.py):
      - 'f32':    float32 operands, Mosaic full-f32 passes (default);
      - 'bf16':   operands cast to bfloat16, ONE MXU pass — the speed
                  ceiling; rejected for accuracy on the headline config
                  (PARITY_NOTES.md) but exposed for measurement;
      - 'split3': bf16 hi/lo decomposition of both operands, 3 passes
                  (hi·hi + hi·lo + lo·hi; the dropped lo·lo term is
                  O(2^-16) relative) — near-f32 accuracy;
      - 'split2': hi·hi + hi·lo only (full-precision bank, bf16 samples) —
                  2 passes, sample low bits dropped.
    For the split modes, rr/pw are the bf16 HI planes and rr_lo/pw_lo the
    bf16 LO planes (hi+lo bf16 = the same VMEM bytes as the f32 bank).

    `t_coh` > 1 turns the stream into the COHERENT (block-pooled) variant:
    the tile must be laid out T-MAJOR — rows [j*bp + i] hold snapshot j of
    block i, bp = tile_n // t_coh (`_blocks_to_tmajor`) — and each
    per-snapshot logit is summed over its block's T rows (T static sublane
    slices + a sublane-tiled broadcast, VPU-only) BEFORE the online
    max/exp, so every snapshot of a block is combined with the SHARED block
    posterior (`gmm_estimator.estimate_coherent` semantics; the caller
    pre-divides the mixture log-weight by T — `kernel_bank_block(t_coh=)`).
    The resulting per-row (m, den) state is block-constant, so the flat
    merge recurrence (`merge_stats`, pmax/psum) applies unchanged."""
    tile_n = rr.shape[0]
    stride = two_m + two_d
    if t_coh > 1:
        bp = tile_n // t_coh

        def pool(lg):
            s = lg[0:bp]
            for j in range(1, t_coh):
                s = s + lg[j * bp:(j + 1) * bp]
            pooled = jnp.concatenate([s] * t_coh, axis=0)
            if coh_alpha >= 1.0:
                return pooled
            # leave-one-out evidence blend (`gmm_estimator.
            # _estimate_coherent_chunk` alpha<1): per-snapshot logit plus
            # alpha times the other snapshots' evidence. The caller scales
            # the mixture log-weight by 1/(1-a+aT) so it enters once.
            return (1.0 - coh_alpha) * lg + coh_alpha * pooled
    else:
        pool = lambda lg: lg

    def body(g, carry):
        m_run, denom, acc = carry
        if mode in ("f32", "bf16"):
            yz = jnp.dot(rr, pw[g], preferred_element_type=jnp.float32,
                         precision=precision)
        else:
            yz = (jnp.dot(rr, pw[g], preferred_element_type=jnp.float32)
                  + jnp.dot(rr, pw_lo[g], preferred_element_type=jnp.float32))
            if mode == "split3":
                yz = yz + jnp.dot(rr_lo, pw[g],
                                  preferred_element_type=jnp.float32)
        logits = []
        zs = []
        for j in range(group):  # static unroll
            base = j * stride
            dy = yz[:, base:base + two_m] - mu[g, :, j * two_m:(j + 1) * two_m]
            quad = jnp.sum(dy * dy, axis=-1, keepdims=True)
            logits.append(pool(logw[g * group + j] - quad))
            zs.append(yz[:, base + two_m:base + stride]
                      + b[g, :, j * two_d:(j + 1) * two_d])
        m_new = m_run
        for lg in logits:
            m_new = jnp.maximum(m_new, lg)
        scale = jnp.exp(m_run - m_new)
        denom = denom * scale
        acc = acc * scale
        for lg, z in zip(logits, zs):
            p = jnp.exp(lg - m_new)
            denom = denom + p
            acc = acc + p * z
        return m_new, denom, acc

    init = (jnp.full((tile_n, 1), -jnp.inf, jnp.float32),
            jnp.zeros((tile_n, 1), jnp.float32),
            jnp.zeros((tile_n, two_d), jnp.float32))
    return jax.lax.fori_loop(0, n_groups, body, init)


def _estimate_kernel_block_grouped(logw, pw, mu, b, r2, out, *, n_groups: int,
                                   group: int, two_m: int,
                                   precision=None, t_coh: int = 1,
                                   coh_alpha: float = 1.0):
    """One sample tile: normalized weighted combine over all K components."""
    _, denom, acc = _grouped_stream(logw, pw, mu, b, r2[:], n_groups, group,
                                    two_m, out.shape[1], precision,
                                    t_coh=t_coh, coh_alpha=coh_alpha)
    out[:] = acc / denom


def _estimate_kernel_block_grouped_bf16(logw, pw, mu, b, r2, out, *,
                                        n_groups: int, group: int,
                                        two_m: int):
    """Pure-bfloat16 GEMM variant (speed ceiling; accuracy-rejected)."""
    rr = r2[:].astype(jnp.bfloat16)
    _, denom, acc = _grouped_stream(logw, pw, mu, b, rr, n_groups, group,
                                    two_m, out.shape[1], None, mode="bf16")
    out[:] = acc / denom


def _estimate_kernel_block_grouped_split(logw, pw_hi, pw_lo, mu, b, r2, out,
                                         *, n_groups: int, group: int,
                                         two_m: int, mode: str):
    """bf16 hi/lo split-GEMM variant (3- or 2-pass); the sample tile is
    split on the VPU, the bank planes arrive pre-split."""
    rr_f = r2[:]
    rr = rr_f.astype(jnp.bfloat16)
    rr_lo = (rr_f - rr.astype(jnp.float32)).astype(jnp.bfloat16)
    _, denom, acc = _grouped_stream(logw, pw_hi, mu, b, rr, n_groups, group,
                                    two_m, out.shape[1], None, mode=mode,
                                    pw_lo=pw_lo, rr_lo=rr_lo)
    out[:] = acc / denom


def _estimate_kernel_block_grouped_stats(logw, pw, mu, b, r2, out_m, out_den,
                                         out_acc, *, n_groups: int,
                                         group: int, two_m: int,
                                         precision=None, t_coh: int = 1,
                                         coh_alpha: float = 1.0):
    """One sample tile over a K-CHUNK of the bank: emits the raw
    online-softmax state (max, denominator, accumulator) so chunks can be
    merged exactly in JAX (flash-attention-style split-K).

    m/denom are written broadcast across a full 128-lane tile: a (tile_n, 1)
    output would be lane-padded to 128 anyway AND XLA then places the
    'small' (N, 1) logical buffer in VMEM (S(1)), blowing the scoped-VMEM
    limit — measured on v5e ('Scoped allocation with size 17.72M')."""
    m, denom, acc = _grouped_stream(logw, pw, mu, b, r2[:], n_groups, group,
                                    two_m, out_acc.shape[1], precision,
                                    t_coh=t_coh, coh_alpha=coh_alpha)
    out_m[:] = jnp.broadcast_to(m, out_m.shape)
    out_den[:] = jnp.broadcast_to(denom, out_den.shape)
    out_acc[:] = acc


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def estimate_packed_block_grouped(kb: KernelBankBlock, r2: jax.Array,
                                  tile_n: int = 1024, group: int = 2,
                                  interpret: bool = False, precision=None,
                                  mode: str = "f32", t_coh: int = 1,
                                  coh_alpha: float = 1.0):
    """Block-GEMM estimation with `group` components per MXU call.
    K must be a multiple of `group`. `precision` feeds the in-kernel dots
    (None -> Mosaic default = full float32 passes); `mode` selects the GEMM
    precision scheme (see `_grouped_stream`). `t_coh` > 1 is the coherent
    block-pooled variant: r2 must be laid out T-major per tile
    (`_blocks_to_tmajor`) and kb built with `kernel_bank_block(t_coh=)`."""
    n, two_m = r2.shape
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n} "
                         "(the grid would silently drop the tail rows); "
                         "pad like `estimate_block_grouped` does")
    _check_t_coh(tile_n, t_coh)
    k_comp = kb.pw.shape[0]
    two_d = kb.pw.shape[-1] - two_m
    assert k_comp % group == 0, (k_comp, group)
    n_groups = k_comp // group
    stride = two_m + two_d
    # (K, 2M, S) -> (K/G, 2M, G*S); (K, 1, 2M) -> (K/G, 1, G*2M); same for b
    pw = jnp.swapaxes(kb.pw.reshape(n_groups, group, two_m, stride),
                      1, 2).reshape(n_groups, two_m, group * stride)
    mu = kb.mu.reshape(n_groups, 1, group * two_m)
    b = kb.b.reshape(n_groups, 1, group * two_d)
    grid = (n // tile_n,)
    bank_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    data_spec = pl.BlockSpec((tile_n, two_m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_n, two_d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    static = dict(n_groups=n_groups, group=group, two_m=two_m)
    if mode == "f32":
        kern = functools.partial(_estimate_kernel_block_grouped,
                                 precision=precision, t_coh=t_coh,
                                 coh_alpha=coh_alpha, **static)
        in_specs = [smem_spec, bank_spec, bank_spec, bank_spec, data_spec]
        args = (kb.logw, pw, mu, b, r2)
    elif mode == "bf16":
        if t_coh > 1:
            raise NotImplementedError("coherent pooling is f32-only")
        kern = functools.partial(_estimate_kernel_block_grouped_bf16,
                                 **static)
        in_specs = [smem_spec, bank_spec, bank_spec, bank_spec, data_spec]
        args = (kb.logw, pw.astype(jnp.bfloat16), mu, b, r2)
    elif mode in ("split3", "split2"):
        if t_coh > 1:
            raise NotImplementedError("coherent pooling is f32-only")
        pw_hi = pw.astype(jnp.bfloat16)
        pw_lo = (pw - pw_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        kern = functools.partial(_estimate_kernel_block_grouped_split,
                                 mode=mode, **static)
        in_specs = [smem_spec, bank_spec, bank_spec, bank_spec, bank_spec,
                    data_spec]
        args = (kb.logw, pw_hi, pw_lo, mu, b, r2)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, two_d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * two_m * (two_m + two_d) * k_comp,
            bytes_accessed=4 * (n * (2 * two_m + two_d)
                                + k_comp * two_m * (two_m + two_d)),
            transcendentals=2 * n * k_comp),
        interpret=interpret,
    )(*args)


def estimate_block_grouped(bank: PreparedBank, r: jax.Array,
                           tile_n: int = 1024, group: int = 2,
                           interpret: bool = False,
                           precision=None, mode: str = "f32") -> jax.Array:
    """`estimate_block` with multi-component GEMMs."""
    kb = kernel_bank_block(bank)
    n = r.shape[0]
    n_pad = -(-n // tile_n) * tile_n
    rp = jnp.pad(r, ((0, n_pad - n), (0, 0)))
    r2 = jnp.concatenate([jnp.real(rp), jnp.imag(rp)],
                         axis=-1).astype(jnp.float32)
    h2 = estimate_packed_block_grouped(kb, r2, tile_n, group, interpret,
                                       precision, mode)
    d = h2.shape[-1] // 2
    return (h2[:, :d] + 1j * h2[:, d:])[:n].astype(r.dtype)


def _grouped_stream_topk(logw, pw, mu, b, rr, n_groups: int, group: int,
                         two_m: int, two_d: int, k_sel: int):
    """Single-pass top-k selection stream (round-5): stream over K like
    `_grouped_stream`, but instead of the online-softmax state keep the
    RUNNING TOP-k (logit, z) pairs per row via an elementwise bubble
    insertion — k_sel extra (TN, 2D) VMEM buffers and k_sel where-ops per
    component, no second GEMM sweep. Returns (ls, zs): tuples of k_sel
    (TN, 1) logits sorted descending and their (TN, 2D) per-component
    estimates. Ties keep the lower component index (matching
    `jax.lax.top_k`'s stable order in `gmm_estimator._selection_weights`)."""
    tile_n = rr.shape[0]
    stride = two_m + two_d

    def body(g, carry):
        ls, zs = carry
        yz = jnp.dot(rr, pw[g], preferred_element_type=jnp.float32)
        for j in range(group):  # static unroll
            base = j * stride
            dy = yz[:, base:base + two_m] - mu[g, :, j * two_m:(j + 1) * two_m]
            quad = jnp.sum(dy * dy, axis=-1, keepdims=True)
            lg = logw[g * group + j] - quad
            z = yz[:, base + two_m:base + stride] \
                + b[g, :, j * two_d:(j + 1) * two_d]
            # bubble the candidate down the sorted slots: strict > keeps
            # the earlier (lower-index) component on ties
            new_ls, new_zs = [], []
            for i in range(k_sel):
                take = lg > ls[i]
                evict_l = jnp.where(take, ls[i], lg)
                evict_z = jnp.where(take, zs[i], z)
                new_ls.append(jnp.where(take, lg, ls[i]))
                new_zs.append(jnp.where(take, z, zs[i]))
                lg, z = evict_l, evict_z
            ls, zs = tuple(new_ls), tuple(new_zs)
        return ls, zs

    init = (tuple(jnp.full((tile_n, 1), -jnp.inf, jnp.float32)
                  for _ in range(k_sel)),
            tuple(jnp.zeros((tile_n, two_d), jnp.float32)
                  for _ in range(k_sel)))
    return jax.lax.fori_loop(0, n_groups, body, init)


def _estimate_kernel_block_grouped_topk(logw, pw, mu, b, r2, out, *,
                                        n_groups: int, group: int,
                                        two_m: int, k_sel: int):
    """One sample tile: top-k-selected renormalized combine. k_sel=1 is the
    argmax component (one-hot — no exp at all); k_sel>1 renormalizes the
    softmax over the selected set exactly like
    `gmm_estimator._selection_weights(proba, k)`."""
    ls, zs = _grouped_stream_topk(logw, pw, mu, b, r2[:], n_groups, group,
                                  two_m, out.shape[1], k_sel)
    if k_sel == 1:
        out[:] = zs[0]
        return
    den = jnp.ones_like(ls[0])
    acc = zs[0]
    for i in range(1, k_sel):
        w = jnp.exp(ls[i] - ls[0])
        den = den + w
        acc = acc + w * zs[i]
    out[:] = acc / den


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def estimate_packed_block_grouped_topk(kb: KernelBankBlock, r2: jax.Array,
                                       tile_n: int, group: int, k_sel: int,
                                       interpret: bool = False):
    """Grouped block-GEMM top-k estimation: r2 (N, 2M) f32 -> (N, 2D) f32
    [Re | Im]. Same GEMM structure and bank residency as
    `estimate_packed_block_grouped`; the online softmax is replaced by the
    running top-k insertion (k_sel extra (TN, 2D) live buffers)."""
    n, two_m = r2.shape
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n}")
    k_comp = kb.pw.shape[0]
    two_d = kb.pw.shape[-1] - two_m
    assert k_comp % group == 0, (k_comp, group)
    n_groups = k_comp // group
    stride = two_m + two_d
    pw = jnp.swapaxes(kb.pw.reshape(n_groups, group, two_m, stride),
                      1, 2).reshape(n_groups, two_m, group * stride)
    mu = kb.mu.reshape(n_groups, 1, group * two_m)
    b = kb.b.reshape(n_groups, 1, group * two_d)
    grid = (n // tile_n,)
    bank_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    data_spec = pl.BlockSpec((tile_n, two_m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_n, two_d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_estimate_kernel_block_grouped_topk,
                             n_groups=n_groups, group=group, two_m=two_m,
                             k_sel=k_sel)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[smem_spec, bank_spec, bank_spec, bank_spec, data_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, two_d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * two_m * (two_m + two_d) * k_comp,
            bytes_accessed=4 * (n * (2 * two_m + two_d)
                                + k_comp * two_m * (two_m + two_d)),
            transcendentals=n * k_sel),
        interpret=interpret,
    )(kb.logw, pw, mu, b, r2)


def _estimate_kernel_block_grouped_topk_stats(logw, pw, mu, b, r2, out_l,
                                              out_z, *, n_groups: int,
                                              group: int, two_m: int,
                                              k_sel: int):
    """Top-k stats variant over a K-CHUNK: emits the chunk's top-k
    (logit, z) candidate lists so chunks merge exactly in JAX (the top-k
    of a union is the top-k of the per-chunk top-k's). Logit columns are
    lane-broadcast like the softmax stats kernel (`..._grouped_stats`)."""
    ls, zs = _grouped_stream_topk(logw, pw, mu, b, r2[:], n_groups, group,
                                  two_m, out_z.shape[1] // k_sel, k_sel)
    two_d = out_z.shape[1] // k_sel
    for i in range(k_sel):
        out_l[:, 128 * i:128 * (i + 1)] = jnp.broadcast_to(
            ls[i], (ls[i].shape[0], 128))
        out_z[:, two_d * i:two_d * (i + 1)] = zs[i]


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def estimate_packed_block_grouped_topk_stats(kb: KernelBankBlock,
                                             r2: jax.Array, tile_n: int,
                                             group: int, k_sel: int,
                                             interpret: bool = False):
    """Chunk-level top-k candidates: returns (l (N, 128*k) f32 broadcast
    columns, z (N, 2D*k) f32)."""
    n, two_m = r2.shape
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n}")
    k_comp = kb.pw.shape[0]
    two_d = kb.pw.shape[-1] - two_m
    assert k_comp % group == 0, (k_comp, group)
    n_groups = k_comp // group
    stride = two_m + two_d
    pw = jnp.swapaxes(kb.pw.reshape(n_groups, group, two_m, stride),
                      1, 2).reshape(n_groups, two_m, group * stride)
    mu = kb.mu.reshape(n_groups, 1, group * two_m)
    b = kb.b.reshape(n_groups, 1, group * two_d)
    grid = (n // tile_n,)
    bank_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    data_spec = pl.BlockSpec((tile_n, two_m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    l_spec = pl.BlockSpec((tile_n, 128 * k_sel), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((tile_n, two_d * k_sel), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    kern = functools.partial(_estimate_kernel_block_grouped_topk_stats,
                             n_groups=n_groups, group=group, two_m=two_m,
                             k_sel=k_sel)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[smem_spec, bank_spec, bank_spec, bank_spec, data_spec],
        out_specs=[l_spec, z_spec],
        out_shape=[jax.ShapeDtypeStruct((n, 128 * k_sel), jnp.float32),
                   jax.ShapeDtypeStruct((n, two_d * k_sel), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * two_m * (two_m + two_d) * k_comp,
            bytes_accessed=4 * (n * (2 * two_m + (two_d + 128) * k_sel)
                                + k_comp * two_m * (two_m + two_d)),
            transcendentals=0),
        interpret=interpret,
    )(kb.logw, pw, mu, b, r2)


def merge_topk(ls, zs, k_sel: int):
    """Exact merge of per-chunk top-k candidate lists from DISJOINT
    component sets: the union's top-k combine. ls: list of (N, k) f32
    logits (each sorted desc); zs: list of (N, k, 2D) f32. Returns the
    renormalized-softmax top-k combine (N, 2D) (k_sel=1 = argmax row).
    Candidate order inside the concat preserves chunk (= component index)
    order, so ties resolve like a single-pass run."""
    l_all = jnp.concatenate(ls, axis=1)                   # (N, C*k)
    z_all = jnp.concatenate(zs, axis=1)                   # (N, C*k, 2D)
    l_sel, idx = jax.lax.top_k(l_all, k_sel)              # (N, k)
    z_sel = jnp.take_along_axis(z_all, idx[..., None], axis=1)
    if k_sel == 1:
        return z_sel[:, 0, :]
    w = jnp.exp(l_sel - l_sel[:, :1])                     # (N, k)
    return (jnp.einsum("nk,nkd->nd", w, z_sel)
            / jnp.sum(w, axis=1, keepdims=True))


TOPK_KERNEL_MAX = 8  # bubble-insert slots per row; beyond this the extra
# VMEM live set and per-component where-chains stop paying vs the einsum
# path (and the static unroll grows toward Mosaic's crash range)


def topk_mode_eligible(d: int, k_comp: int, m: int, k_sel,
                       vmem_budget: int = 13 * 1024 * 1024) -> bool:
    """Dims-based form of `topk_kernel_eligible` — the ONE eligibility
    rule, shared with serving (which knows the model dims before any bank
    exists): int selection with 1 <= k < K, small enough for the
    in-register bubble; resident-VMEM banks run the single-launch kernel,
    oversized ones the split-K chunked candidate merge while a
    >= 4-component chunk fits the stats budget (like `estimate_fused`)."""
    if not isinstance(k_sel, int) or isinstance(k_sel, bool):
        return False
    if not 1 <= k_sel <= min(TOPK_KERNEL_MAX, k_comp - 1):
        return False
    per_k = 4 * (2 * m) * (2 * m + 2 * d)
    if k_comp * per_k <= vmem_budget:
        return True
    chunk_budget = (10 if 2 * m <= 256 else 8) * 1024 * 1024
    return (chunk_budget // per_k) // 4 * 4 >= 4


def topk_kernel_eligible(bank: PreparedBank, k_sel,
                         vmem_budget: int = 13 * 1024 * 1024) -> bool:
    """Bank-shaped wrapper of `topk_mode_eligible`."""
    k_comp, d, m = bank.filters.shape
    return topk_mode_eligible(d, k_comp, m, k_sel, vmem_budget)


def _topk_chunked(bank: PreparedBank, r2: jax.Array, k_sel: int,
                  k_chunk: int, tile_n: int, interpret: bool):
    """Split-K top-k: per-chunk candidate lists from the stats kernel,
    merged exactly with `merge_topk` (top-k of a union = top-k of the
    per-chunk top-k's). Returns (N, 2D) f32."""
    k_comp, d, _ = bank.filters.shape
    ls, zs = [], []
    for k0 in range(0, k_comp, k_chunk):
        sub = _bank_slice(bank, k0, min(k0 + k_chunk, k_comp))
        kc = sub.filters.shape[0]
        group = next(g for g in (4, 2, 1) if kc % g == 0)
        kb = kernel_bank_block(sub)
        l_c, z_c = estimate_packed_block_grouped_topk_stats(
            kb, r2, tile_n, group, k_sel, interpret)
        ls.append(l_c[:, ::128])                          # (N, k) values
        zs.append(z_c.reshape(z_c.shape[0], k_sel, 2 * d))
    return merge_topk(ls, zs, k_sel)


def estimate_fused_topk(bank: PreparedBank, r: jax.Array, k_sel: int,
                        interpret: bool = False,
                        vmem_budget: int = 13 * 1024 * 1024) -> jax.Array:
    """Fused top-k-selection estimation (round-5): the kernel analog of
    `gmm_estimator.estimate(bank, r, k_sel)` for int selection modes
    (`gmm_cplx_bussgang.py:197-242` — int 1 = argmax component, int k>1 =
    top-k by responsibility renormalized). Single pass: the bank stays
    VMEM-resident and the running top-k (logit, z) pairs replace the
    online-softmax state, so selection serving no longer forfeits the
    fused-kernel path. Banks beyond the resident-VMEM rule run the
    split-K chunked candidate merge (`_topk_chunked`). Callers check
    `topk_kernel_eligible`."""
    k_comp, d, m = bank.filters.shape
    if not topk_kernel_eligible(bank, k_sel, vmem_budget):
        raise ValueError(
            f"top-k kernel needs int 1 <= k <= "
            f"min({TOPK_KERNEL_MAX}, K-1) within the VMEM budgets "
            f"(got k={k_sel!r}, K={k_comp})")
    # the top-k stream carries k_sel (TN, 2D) live buffers beyond the
    # 'all' kernel's one accumulator; halve the tile once the extras pass
    # ~2 accumulators' worth
    base_tile = 2048 if r.shape[0] >= 2048 else 256
    tile_n = base_tile if k_sel <= 2 else max(256, base_tile // 2)
    n = r.shape[0]
    n_pad = -(-n // tile_n) * tile_n
    rp = jnp.pad(r, ((0, n_pad - n), (0, 0)))
    r2 = jnp.concatenate([jnp.real(rp), jnp.imag(rp)],
                         axis=-1).astype(jnp.float32)
    per_k = 4 * (2 * m) * (2 * m + 2 * d)
    if k_comp * per_k > vmem_budget:
        chunk_budget = (10 if 2 * m <= 256 else 8) * 1024 * 1024
        k_chunk = (chunk_budget // per_k) // 4 * 4
        # the candidate outputs add k_sel*(128 + 2D) f32 per tile row ON
        # TOP of the ~10 MiB chunk bank: tile 1024 at k=4/D=64 measured
        # 'Scoped allocation 16.27M ... exceeded by 272K' — cap the
        # chunked-branch tile so the output tiles stay ~2 MiB
        chunk_tile = min(tile_n, 1024 if k_sel <= 2 else 512)
        h2 = _topk_chunked(bank, r2, int(k_sel), k_chunk, chunk_tile,
                           interpret)
    else:
        kb = kernel_bank_block(bank)
        group = next(g for g in (4, 2, 1) if k_comp % g == 0)
        h2 = estimate_packed_block_grouped_topk(kb, r2, tile_n, group,
                                                int(k_sel), interpret)
    return (h2[:, :d] + 1j * h2[:, d:])[:n].astype(r.dtype)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def estimate_packed_block_grouped_stats(kb: KernelBankBlock, r2: jax.Array,
                                        tile_n: int = 2048, group: int = 4,
                                        interpret: bool = False,
                                        t_coh: int = 1,
                                        coh_alpha: float = 1.0):
    """Grouped block-GEMM pass over a K-chunk, returning the un-normalized
    online-softmax state (m, denom, acc) per sample for exact cross-chunk
    merging. With `t_coh` > 1 (T-major r2, `kernel_bank_block(t_coh=)`
    bank) the state is the BLOCK-pooled coherent one, block-constant in
    m/denom across each block's T rows."""
    n, two_m = r2.shape
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n}")
    _check_t_coh(tile_n, t_coh)
    k_comp = kb.pw.shape[0]
    two_d = kb.pw.shape[-1] - two_m
    assert k_comp % group == 0, (k_comp, group)
    n_groups = k_comp // group
    stride = two_m + two_d
    pw = jnp.swapaxes(kb.pw.reshape(n_groups, group, two_m, stride),
                      1, 2).reshape(n_groups, two_m, group * stride)
    mu = kb.mu.reshape(n_groups, 1, group * two_m)
    b = kb.b.reshape(n_groups, 1, group * two_d)
    grid = (n // tile_n,)
    bank_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    data_spec = pl.BlockSpec((tile_n, two_m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((tile_n, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_n, two_d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_estimate_kernel_block_grouped_stats,
                             n_groups=n_groups, group=group, two_m=two_m,
                             t_coh=t_coh, coh_alpha=coh_alpha)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[smem_spec, bank_spec, bank_spec, bank_spec, data_spec],
        out_specs=[col_spec, col_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((n, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n, two_d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * two_m * (two_m + two_d) * k_comp,
            bytes_accessed=4 * (n * (2 * two_m + two_d)
                                + k_comp * two_m * (two_m + two_d)),
            transcendentals=2 * n * k_comp),
        interpret=interpret,
    )(kb.logw, pw, mu, b, r2)


def _bank_slice(bank: PreparedBank, k0: int, k1: int) -> PreparedBank:
    return PreparedBank(*[a[k0:k1] for a in bank])


def merge_stats(ms, dens, accs):
    """Exact merge of online-softmax estimation states from DISJOINT
    component sets (flash-attention-style split-K): with per-set
    (m_c, den_c, acc_c), m* = max_c m_c and

        den* = sum_c exp(m_c - m*) den_c
        acc* = sum_c exp(m_c - m*) acc_c

    so acc*/den* equals the single-pass combine over the union. ms/dens are
    lists of (N,) arrays, accs a list of (N, X) arrays (real-packed or
    complex). The same recurrence runs across devices as pmax + psum in
    `parallel.mesh.estimate_sharded_kernel`."""
    m_all = jnp.stack(ms)                            # (C, N)
    m_star = jnp.max(m_all, axis=0)                  # (N,)
    w = jnp.exp(m_all - m_star[None])                # (C, N)
    den = jnp.sum(jnp.stack(dens) * w, axis=0)       # (N,)
    acc = jnp.sum(jnp.stack(accs) * w[..., None].astype(accs[0].dtype),
                  axis=0)                            # (N, X)
    return m_star, den, acc


def _stats_chunked(bank: PreparedBank, r: jax.Array, k_chunk: int,
                   tile_n: Optional[int], interpret: bool):
    """Run the stats kernel over K-chunks of the bank and merge exactly.
    Returns (m (N,), den (N,), acc (N, 2D) real-packed), already sliced to
    the un-padded sample count."""
    n = r.shape[0]
    if tile_n is None:
        tile_n = _chunk_tile_n(bank)
    tile_n = min(tile_n, 256) if n < 1024 else tile_n
    n_pad = -(-n // tile_n) * tile_n
    rp = jnp.pad(r, ((0, n_pad - n), (0, 0)))
    r2 = jnp.concatenate([jnp.real(rp), jnp.imag(rp)],
                         axis=-1).astype(jnp.float32)
    k_comp = bank.filters.shape[0]
    ms, dens, accs = [], [], []
    for k0 in range(0, k_comp, k_chunk):
        sub = _bank_slice(bank, k0, min(k0 + k_chunk, k_comp))
        kc = sub.filters.shape[0]
        group = next(g for g in (4, 2, 1) if kc % g == 0)
        kb = kernel_bank_block(sub)
        m_c, den_c, acc_c = estimate_packed_block_grouped_stats(
            kb, r2, tile_n, group, interpret)
        ms.append(m_c[:, 0])      # broadcast lanes, col 0 is the value
        dens.append(den_c[:, 0])
        accs.append(acc_c)
    m_star, den, acc = merge_stats(ms, dens, accs)
    return m_star[:n], den[:n], acc[:n]


def estimate_block_grouped_chunked(bank: PreparedBank, r: jax.Array,
                                   k_chunk: int, tile_n: Optional[int] = None,
                                   interpret: bool = False) -> jax.Array:
    """Split-K estimation for banks too large for the scoped-VMEM stack:
    run the grouped kernel per K-chunk emitting raw softmax state, merge
    the chunks exactly with `merge_stats`.

    The stats kernel's scoped-VMEM stack is chunk_bank + in/out tiles whose
    bytes scale with tile_n * (2M + 2D): at D=64, 10 MiB chunks + tile 1024
    fit the 16 MiB limit (tile 2048 measured 'Scoped allocation ...
    17.72M'); at D=256, tile 1024 measured 22.41M — so tile_n defaults to
    `_chunk_tile_n` (inverse scaling with block width, 1024 at D=64, 256 at
    D=256)."""
    _, den, acc = _stats_chunked(bank, r, k_chunk, tile_n, interpret)
    h2 = acc / den[:, None]
    d = h2.shape[-1] // 2
    return (h2[:, :d] + 1j * h2[:, d:]).astype(r.dtype)


def estimate_fused_stats(bank: PreparedBank, r: jax.Array,
                         interpret: bool = False):
    """'all'-mode estimation state via the Pallas stats kernel: the
    kernel-path analog of `gmm_estimator.estimate_stats` (same logit
    convention — `kernel_bank_block` folds 2 sum log diag(P_k) into logw).

    The bank is split into scoped-VMEM-sized K-chunks (one chunk when it
    fits) and the per-chunk states merge exactly via `merge_stats`. Used by
    `parallel.mesh.estimate_sharded_kernel`, where each device runs this on
    its component shard and the cross-DEVICE merge is pmax + psum over the
    'component' mesh axis. Returns (m (N,) f32, den (N,) f32,
    acc (N, D) complex64).
    """
    k_comp, d, m = bank.filters.shape
    per_k = 4 * (2 * m) * (2 * m + 2 * d)
    two_m = 2 * m
    # measured-safe chunk budget for the stats kernel's scoped stack
    # (chunk bank + m/den/acc/r2 tiles; see `estimate_fused`)
    chunk_budget = (10 if two_m <= 256 else 8) * 1024 * 1024
    k_chunk = (chunk_budget // per_k) // 4 * 4
    if k_chunk < 4:
        # degenerate: a handful of components already over budget (huge D)
        from quantized_channel_estimation_tpu.models import gmm_estimator
        return gmm_estimator.estimate_stats(bank, r,
                                            min(4096, max(256, r.shape[0])))
    m_s, den, acc2 = _stats_chunked(bank, r, min(k_chunk, k_comp), None,
                                    interpret)
    acc = (acc2[:, :d] + 1j * acc2[:, d:]).astype(jnp.complex64)
    return m_s, den, acc


def _chunk_tile_n(bank: PreparedBank) -> int:
    """Sample-tile size for the split-K stats kernel, scaled down with the
    real-block width to bound the tile portion of the scoped-VMEM stack:
    1024 up to 2M+2D=512 (D=64 and the measured-good D=128 config), 512 to
    768, 256 beyond (D=256 at tile 1024 measured 22.41M scoped vs the
    16 MiB limit)."""
    k_comp, d, m = bank.filters.shape
    width = 2 * m + 2 * d
    if width <= 512:
        return 1024
    return 512 if width <= 768 else 256


def estimate_fused(bank: PreparedBank, r: jax.Array,
                   interpret: bool = False,
                   vmem_budget: int = 13 * 1024 * 1024) -> jax.Array:
    """Canonical fused 'all'-mode estimation: grouped block-GEMM kernel with
    measured-best defaults (group=4, tile_n=2048 on v5e — 15.1M est/s at
    K=D=64 vs 6.9M for the Karatsuba layout; tools/kernel_bench.py).

    Banks that exceed Mosaic's scoped-VMEM stack take the split-K chunked
    kernel (`estimate_block_grouped_chunked`) instead of giving up the MXU.
    Measured rule (v5e, 2026-08-18): the grouped kernel's scoped allocation
    is exactly bank_bytes + 2 MiB against a 16 MiB limit, independent of
    tile_n and batch size — banks up to 12 MiB (K=96 at D=64) compile and
    run 1.7x faster than the einsum path; 16 MiB banks (K=128) fail with
    'Scoped allocation ... exceeded scoped vmem limit'. The 13 MiB default
    budget keeps 1 MiB of margin under that rule. The einsum estimator
    remains only for the degenerate case of a single component already
    over budget (huge D)."""
    k_comp, d, m = bank.filters.shape
    per_k = 4 * (2 * m) * (2 * m + 2 * d)
    bank_bytes = k_comp * per_k
    tile_n = 2048 if r.shape[0] >= 2048 else 256
    if bank_bytes > vmem_budget:
        # the stats-emitting chunk kernel carries scoped tile extras beyond
        # the chunk bank (m/denom/acc/r2 tiles; ~4.75 MiB at D=64 tile 2048
        # — a 13 MiB chunk measured 'Scoped allocation with size 17.72M').
        # `_chunk_tile_n` keeps the tile portion ~constant across D; wide
        # blocks (2M > 128) still get a smaller chunk budget because the
        # acc tile scales with 2D (D=256 with the old 10 MiB budget
        # measured 22.41M scoped)
        two_m = 2 * m
        chunk_budget = (10 if two_m <= 256 else 8) * 1024 * 1024
        k_chunk = (chunk_budget // per_k) // 4 * 4
        if k_chunk >= 4:
            return estimate_block_grouped_chunked(bank, r, k_chunk,
                                                  interpret=interpret)
        from quantized_channel_estimation_tpu.models import gmm_estimator
        return gmm_estimator.estimate(bank, r, "all",
                                      min(4096, max(256, r.shape[0])))
    group = next(g for g in (4, 2, 1) if k_comp % g == 0)
    return estimate_block_grouped(bank, r, tile_n=tile_n, group=group,
                                  interpret=interpret)


def _coherent_tile_n(base: int, t: int) -> int:
    """Largest tile <= base that holds an integer number of T-row blocks
    with the per-tile block count on the 8-row f32 sublane granularity."""
    bp = max(8, (base // t) // 8 * 8)
    return bp * t


def _coherent_stats_merged(bank: PreparedBank, r: jax.Array,
                           interpret: bool, alpha: float = 1.0):
    """K-chunked coherent stats kernel sweep, merged per row. Returns
    (m (B,), den (B,), acc (B, T, D) complex) at alpha=1 (block-constant
    state sliced to per-block values); alpha<1 keeps the per-SNAPSHOT
    state — m/den (B, T) — which the kernel already emits per row.
    Assumes t_coh is kernel-eligible (caller checks)."""
    b, t, m_dim = r.shape
    k_comp, d, _ = bank.filters.shape
    per_k = 4 * (2 * m_dim) * (2 * m_dim + 2 * d)
    chunk_budget = (10 if 2 * m_dim <= 256 else 8) * 1024 * 1024
    k_chunk = max(4, (chunk_budget // per_k) // 4 * 4)
    tile_n = _coherent_tile_n(_chunk_tile_n(bank), t)
    rows, b_pad = _blocks_to_tmajor(r, tile_n)
    r2 = jnp.concatenate([jnp.real(rows), jnp.imag(rows)],
                         axis=-1).astype(jnp.float32)
    ms, dens, accs = [], [], []
    for k0 in range(0, k_comp, k_chunk):
        sub = _bank_slice(bank, k0, min(k0 + k_chunk, k_comp))
        kc = sub.filters.shape[0]
        group = next(g for g in (4, 2, 1) if kc % g == 0)
        kb = kernel_bank_block(sub, t_coh=t, coh_alpha=alpha)
        m_c, den_c, acc_c = estimate_packed_block_grouped_stats(
            kb, r2, tile_n, group, interpret, t, alpha)
        ms.append(m_c[:, 0])
        dens.append(den_c[:, 0])
        accs.append(acc_c)
    m_star, den, acc2 = merge_stats(ms, dens, accs)
    acc_b = _tmajor_to_blocks(acc2, t, tile_n, b)       # (B, T, 2D)
    acc = (acc_b[..., :d] + 1j * acc_b[..., d:]).astype(jnp.complex64)
    m_b = _tmajor_to_blocks(m_star, t, tile_n, b)        # (B, T)
    den_b = _tmajor_to_blocks(den, t, tile_n, b)
    if alpha >= 1.0:  # block-constant: slice to per-block values
        return m_b[:, 0], den_b[:, 0], acc
    return m_b, den_b, acc


def _coherent_kernel_eligible(bank: PreparedBank, t: int) -> bool:
    k_comp, d, m_dim = bank.filters.shape
    per_k = 4 * (2 * m_dim) * (2 * m_dim + 2 * d)
    chunk_budget = (10 if 2 * m_dim <= 256 else 8) * 1024 * 1024
    # T <= 16 is the hardware-validated unroll range: T<=8 round-3, T=16
    # compiled + ran + calibrated quality-neutral on a real fit round-4
    # (NMSE-vs-truth within ±0.08% of the einsum path —
    # results/parity_r4/t16_calibration.log). The pooling unroll slices
    # are bp-ROW sublane slices, not the single-lane slices Mosaic's
    # compile helper crashes on (CLAUDE.md).
    return 1 < t <= 16 and chunk_budget // per_k >= 4


def estimate_fused_coherent_stats(bank: PreparedBank, r: jax.Array,
                                  interpret: bool = False,
                                  alpha: float = 1.0):
    """Coherent 'all'-mode BLOCK estimation state via the Pallas kernel:
    the kernel-path analog of `gmm_estimator.estimate_coherent_stats` (same
    state convention and merge semantics — one pmax + two psums over a
    'component' mesh axis reproduce `estimate_coherent` exactly;
    `parallel.mesh.estimate_sharded_kernel` rank-3 route).

    Blocks are laid out T-major per sample tile and the grouped kernel
    pools each component's T per-snapshot logits in VMEM before its online
    softmax (`_grouped_stream(t_coh=)`), so the (B*T, K) logit tensor the
    XLA path materializes per chunk never exists. Returns (m (B,) f32,
    den (B,) f32, acc (B, T, D) complex64). Falls back to the einsum stats
    path for T beyond the hardware-validated unroll range (>16) or
    degenerate huge-D banks."""
    if r.ndim != 3:
        raise ValueError(f"expected (B, T, M) blocks, got {r.shape}")
    t = r.shape[1]
    if not _coherent_kernel_eligible(bank, t):
        from quantized_channel_estimation_tpu.models import gmm_estimator
        return gmm_estimator.estimate_coherent_stats(bank, r, 512, alpha)
    return _coherent_stats_merged(bank, r, interpret, alpha)


def estimate_fused_coherent(bank: PreparedBank, r: jax.Array,
                            interpret: bool = False,
                            vmem_budget: int = 13 * 1024 * 1024,
                            alpha: float = 1.0) -> jax.Array:
    """Canonical fused coherent 'all'-mode estimation of blocks r (B, T, M)
    -> (B, T, D): the kernel analog of `gmm_estimator.estimate_coherent`
    (new design — the reference never exploits coherence blocks,
    `SCMMulti.py:30`). Banks within the scoped-VMEM rule run as ONE grouped
    kernel launch with in-VMEM block pooling; oversized banks take the
    split-K coherent stats path; ineligible T falls back to the einsum
    path.

    `alpha` < 1 is the leave-one-out evidence blend
    (`gmm_estimator.estimate_coherent(alpha=)`): in-kernel it is one extra
    VPU fma per logit ((1-a)*lg + a*pool(lg)) plus the 1/(1-a+aT)
    log-weight scale in `kernel_bank_block`; the split-K stats path
    carries it too (the state becomes per-snapshot)."""
    if r.ndim != 3:
        raise ValueError(f"expected (B, T, M) blocks, got {r.shape}")
    b, t, m_dim = r.shape
    if t == 1:
        return estimate_fused(bank, r[:, 0, :], interpret,
                              vmem_budget)[:, None, :]
    from quantized_channel_estimation_tpu.models import gmm_estimator
    if not _coherent_kernel_eligible(bank, t):
        return gmm_estimator.estimate_coherent(bank, r, "all", 512, alpha)
    k_comp, d, _ = bank.filters.shape
    per_k = 4 * (2 * m_dim) * (2 * m_dim + 2 * d)
    if k_comp * per_k > vmem_budget:
        m_b, den, acc = _coherent_stats_merged(bank, r, interpret, alpha)
        den_b = den[:, None, None] if den.ndim == 1 else den[..., None]
        return (acc / den_b.astype(acc.dtype)).astype(r.dtype)
    base = 2048 if b * t >= 2048 else 256
    tile_n = _coherent_tile_n(base, t)
    rows, b_pad = _blocks_to_tmajor(r, tile_n)
    r2 = jnp.concatenate([jnp.real(rows), jnp.imag(rows)],
                         axis=-1).astype(jnp.float32)
    kb = kernel_bank_block(bank, t_coh=t, coh_alpha=alpha)
    group = next(g for g in (4, 2, 1) if k_comp % g == 0)
    h2 = estimate_packed_block_grouped(kb, r2, tile_n, group, interpret,
                                       None, "f32", t, alpha)
    out = _tmajor_to_blocks(h2, t, tile_n, b)            # (B, T, 2D)
    return (out[..., :d] + 1j * out[..., d:]).astype(r.dtype)


def reference_estimate_packed(kb: KernelBank, r_re, r_im):
    """Pure-JAX implementation of the same math (for kernel tests)."""
    k = kb.pc_re.shape[0]
    r = r_re + 1j * r_im
    pc = kb.pc_re + 1j * kb.pc_im
    wt = kb.wt_re + 1j * kb.wt_im
    mu = (kb.mu_re + 1j * kb.mu_im)[:, 0, :]
    b = (kb.b_re + 1j * kb.b_im)[:, 0, :]
    y = jnp.einsum("nm,kmp->knp", r, pc)
    quad = jnp.sum(jnp.abs(y - mu[:, None, :]) ** 2, axis=-1)  # (K, N)
    logits = kb.logw[:, None] - quad
    w = jax.nn.softmax(logits, axis=0)  # (K, N)
    z = jnp.einsum("nm,kmd->knd", r, wt) + b[:, None, :]
    h = jnp.einsum("kn,knd->nd", w.astype(z.dtype), z)
    return jnp.real(h), jnp.imag(h)


# ---------------------------------------------------------------------------
# structured (circulant / FFT-domain) fused kernel
# ---------------------------------------------------------------------------

class CircKernelBank(NamedTuple):
    """`structured_bank.CirculantBank` lowered for a single-pass fused
    kernel. Everything the chunk pipeline does — forward DFT, split
    log-prob, softmax, combine, inverse DFT — is straight-line math whose
    constants total ~O(D^2 + K D) floats, so the WHOLE bank stays
    VMEM-resident and one sample tile needs exactly seven small GEMMs and
    one softmax, with no HBM intermediate between them (the XLA pipeline
    writes u/logits/combine rounds through HBM between fused regions).

    Lane-dim slicing inside the kernel is avoided by PRE-SPLITTING the
    constants (Mosaic is fragile on sub-128 lane slices — CLAUDE.md): the
    forward transform is two (2D, D) GEMMs producing ur/ui directly, the
    logit coefficients are pre-stacked to one (3D, K) operand consumed by
    a concat, and the inverse transform consumes concat([hr, hi]).

    bfwd_r/bfwd_i: (2D, D) f32   right-mult by F^T, split output columns
    lcoef:         (3D, K) f32   [2 Re(cm)^T; -2 Im(cm)^T; -prec^T],
                                 cm = conj(mean_rf) * prec
    const:         (1, K) f32    logw - mu2 + logdet (row-constant terms
                                 of the softmax cancel; dead components
                                 clamped to -1e30)
    bias_r/bias_i: (K, D) f32    Re/Im bias_f
    filt_r/filt_i: (K, D) f32    Re/Im filt_f
    binv:          (2D, 2D) f32  right-mult by conj(F) (2x2 block)
    """
    bfwd_r: jax.Array
    bfwd_i: jax.Array
    lcoef: jax.Array
    const: jax.Array
    bias_r: jax.Array
    bias_i: jax.Array
    filt_r: jax.Array
    filt_i: jax.Array
    binv: jax.Array


def _circ_bank_bytes(d: int, k: int) -> int:
    """Resident-constant footprint of CircKernelBank (f32)."""
    return 4 * (8 * d * d + 3 * d * k + 4 * k * d + 2 * k)


def _circ_tile_n(d: int, k: int, requested=None) -> int:
    """Largest power-of-two sample tile keeping bank constants + per-tile
    intermediates inside the ~13 MiB scoped-VMEM budget (measured at
    D=512: a 1024-row tile overflows to 26.3 MB — per-row live set is
    ~10 D floats across x/u/z/logits/combine/out buffers)."""
    if requested is not None:
        return requested
    budget = 13 * 1024 * 1024 - _circ_bank_bytes(d, k) - 2 * 1024 * 1024
    per_row = 4 * (10 * d + 2 * k)
    cap = max(64, budget // per_row)
    t = 64
    while t * 2 <= min(cap, 2048):
        t *= 2
    return t


@highest_precision
def circ_kernel_bank(bank, blocks=None) -> CircKernelBank:
    """Lower a CirculantBank (jittable). `blocks=(n1, n2)` builds the
    kron(F_n1, F_n2) basis, so block-circulant (MIMO) banks ride the same
    kernel — the transform is a GEMM either way."""
    from quantized_channel_estimation_tpu.models import structured_bank as sb
    d = bank.spec_cr.shape[-1]
    f = sb._dft_matrix(d, blocks)
    ft = f.T
    # [xr xi] @ [[Re, Im], [-Im, Re]] = [Re(x@ft) Im(x@ft)]; split columns
    bfwd_r = jnp.concatenate([jnp.real(ft), -jnp.imag(ft)],
                             axis=0).astype(jnp.float32)
    bfwd_i = jnp.concatenate([jnp.imag(ft), jnp.real(ft)],
                             axis=0).astype(jnp.float32)
    fi = jnp.conj(f)
    top = jnp.concatenate([jnp.real(fi), jnp.imag(fi)], axis=-1)
    bot = jnp.concatenate([-jnp.imag(fi), jnp.real(fi)], axis=-1)
    binv = jnp.concatenate([top, bot], axis=-2).astype(jnp.float32)
    prec = 1.0 / bank.spec_cr
    cm = jnp.conj(bank.mean_rf) * prec
    mu2 = jnp.sum(jnp.abs(bank.mean_rf) ** 2 * prec, axis=-1)
    logdet = -jnp.sum(jnp.log(bank.spec_cr), axis=-1)
    const = jnp.maximum(bank.log_weights - mu2 + logdet,
                        -1e30).astype(jnp.float32)[None, :]
    lcoef = jnp.concatenate(
        [2.0 * jnp.real(cm).T, -2.0 * jnp.imag(cm).T, -prec.T],
        axis=0).astype(jnp.float32)
    return CircKernelBank(
        bfwd_r, bfwd_i, lcoef, const,
        jnp.real(bank.bias_f).astype(jnp.float32),
        jnp.imag(bank.bias_f).astype(jnp.float32),
        jnp.real(bank.filt_f).astype(jnp.float32),
        jnp.imag(bank.filt_f).astype(jnp.float32), binv)


def _circ_kernel(bfwd_r, bfwd_i, lcoef, const, bias_r, bias_i,
                 filt_r, filt_i, binv, x_ref, out_ref):
    """One sample tile, straight-line: fwd DFT -> logits -> softmax ->
    combine -> inverse DFT, all in VMEM."""
    x = x_ref[:]                                           # (TN, 2D)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    ur = dot(x, bfwd_r[:])                                 # (TN, D)
    ui = dot(x, bfwd_i[:])
    z = jnp.concatenate([ur, ui, ur * ur + ui * ui], axis=-1)
    logits = dot(z, lcoef[:]) + const[:]                   # (TN, K)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)
    br = dot(w, bias_r[:])
    bi = dot(w, bias_i[:])
    fr = dot(w, filt_r[:])
    fi = dot(w, filt_i[:])
    hr = br + fr * ur - fi * ui
    hi = bi + fr * ui + fi * ur
    out_ref[:] = dot(jnp.concatenate([hr, hi], axis=-1), binv[:])


@functools.partial(jax.jit, static_argnums=(2, 3))
def estimate_circ_packed(ckb: CircKernelBank, x2d: jax.Array,
                         tile_n: int = 1024, interpret: bool = False):
    """Fused structured estimation: x2d (N, 2D) f32 [Re | Im] ->
    (N, 2D) f32 [Re | Im]. N must be a multiple of tile_n."""
    n, d2 = x2d.shape
    d = d2 // 2
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n}")
    k_comp = ckb.const.shape[-1]
    bank_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    data_spec = pl.BlockSpec((tile_n, d2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    flops = 2 * n * (2 * d2 * d + 3 * d * k_comp + 4 * k_comp * d
                     + d2 * d2)
    return pl.pallas_call(
        _circ_kernel,
        grid=(n // tile_n,),
        in_specs=[bank_spec] * 9 + [data_spec],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((n, d2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (2 * n * d2 + 3 * d2 * d2),
            transcendentals=n * k_comp),
        interpret=interpret,
    )(ckb.bfwd_r, ckb.bfwd_i, ckb.lcoef, ckb.const, ckb.bias_r, ckb.bias_i,
      ckb.filt_r, ckb.filt_i, ckb.binv, x2d)


def estimate_fused_circulant(bank, r: jax.Array, tile_n=None,
                             interpret: bool = False,
                             blocks=None) -> jax.Array:
    """Fused 'all'-mode structured estimation of r (N, M) complex through a
    `structured_bank.CirculantBank` — the kernel analog of
    `structured_bank.estimate_circulant` ('all' mode; `blocks` selects the
    kron basis for block-circulant/MIMO banks; selection modes stay on the
    XLA path)."""
    ckb = circ_kernel_bank(bank, blocks)
    tile_n = _circ_tile_n(r.shape[-1], bank.log_weights.shape[0], tile_n)
    n = r.shape[0]
    n_pad = -(-n // tile_n) * tile_n
    rp = jnp.pad(r, ((0, n_pad - n), (0, 0)))
    x2d = jnp.concatenate([jnp.real(rp), jnp.imag(rp)],
                          axis=-1).astype(jnp.float32)
    out = estimate_circ_packed(ckb, x2d, tile_n, interpret)
    d = r.shape[-1]
    return (out[:n, :d] + 1j * out[:n, d:]).astype(r.dtype)


class MpCircKernelBank(NamedTuple):
    """`structured_bank.CirculantBankMP` lowered for the single-pass fused
    MULTI-PILOT kernel (round-5 late): per-pilot forward DFT GEMMs, one
    stacked logit GEMM over the P^2-family quadratic features, softmax,
    per-pilot combine, inverse DFT — all straight-line in VMEM, pre-split
    constants (no sub-128 lane slicing, see CircKernelBank).

    bfwd_r/bfwd_i: (P, 2PD, D) f32  per-pilot split forward transforms
    lcoef:         (F, K) f32       F = D (3P + P(P-1)) stacked feature
                                    coefficients (docstring of
                                    `mp_circ_kernel_bank`)
    const:         (1, K) f32       logw - logdet - m^H Prec m (clamped)
    bias_r/bias_i: (K, D) f32
    filt_r/filt_i: (P, K, D) f32    per-pilot W rows
    binv:          (2D, 2D) f32
    """
    bfwd_r: jax.Array
    bfwd_i: jax.Array
    lcoef: jax.Array
    const: jax.Array
    bias_r: jax.Array
    bias_i: jax.Array
    filt_r: jax.Array
    filt_i: jax.Array
    binv: jax.Array


def _mp_circ_bank_bytes(d: int, k: int, p: int) -> int:
    feat = d * (3 * p + p * (p - 1))
    return 4 * (2 * p * (2 * p * d) * d + feat * k + (2 + 2 * p) * k * d
                + 4 * d * d + 2 * k)


def _mp_circ_per_row_bytes(d: int, k: int, p: int) -> int:
    """Per-sample-row VMEM live set of the fused MP kernels (the x/u/
    feature/logit/combine buffers)."""
    return 4 * ((6 * p + p * (p - 1)) * d + 2 * k)


def _mp_circ_kernel_eligible(d: int, k: int, p: int, t: int = 1) -> bool:
    """Full VMEM invariant for fused-MP dispatch: resident bank PLUS the
    floor tile's live set must fit the ~13 MiB scoped budget (64 rows
    flat, 8*T rows coherent — `_coherent_tile_n`'s sublane floor can
    RAISE the tile above a budget-derived base, so bank-bytes-only gating
    admits near-limit banks that overflow; the same failure class
    `_fact_kernel_eligible` closes for the factored kernels)."""
    budget = 13 * 1024 * 1024 - _mp_circ_bank_bytes(d, k, p) \
        - 2 * 1024 * 1024
    min_tile = 64 if t <= 1 else 8 * t
    return budget >= min_tile * _mp_circ_per_row_bytes(d, k, p)


def _mp_circ_tile_n(d: int, k: int, p: int, requested=None) -> int:
    """Power-of-two sample tile within the scoped-VMEM budget (per-row
    live set: `_mp_circ_per_row_bytes`); dispatchers must check
    `_mp_circ_kernel_eligible` first — a negative budget floors to the
    64-row minimum here."""
    if requested is not None:
        return requested
    budget = 13 * 1024 * 1024 - _mp_circ_bank_bytes(d, k, p) \
        - 2 * 1024 * 1024
    cap = max(64, budget // _mp_circ_per_row_bytes(d, k, p))
    t = 64
    while t * 2 <= min(cap, 1024):
        t *= 2
    return t


@highest_precision
def mp_circ_kernel_bank(bank, blocks=None) -> MpCircKernelBank:
    """Lower a CirculantBankMP (jittable). The logit constants come from
    `structured_bank._mp_consts` — the ONE computation of the expanded
    quadratic shared with the XLA path (const_k keeps its row-constant
    -PD log pi; it cancels in the softmax). Feature order consumed by the
    logit GEMM: for each pilot p, [ur_p; ui_p; |u_p|^2] with coefficients
    [2 Re(pm_p)^T; 2 Im(pm_p)^T; -Re(prec_pp)^T]; then for each pair
    p < q, [Re(conj(u_p) u_q); Im(conj(u_p) u_q)] with
    [-2 Re(prec_pq)^T; +2 Im(prec_pq)^T]."""
    from quantized_channel_estimation_tpu.models import structured_bank as sb
    k, d, p = bank.mean_rf.shape
    f = sb._dft_matrix(d, blocks)
    ft = f.T
    fr = jnp.real(ft).astype(jnp.float32)
    fi_ = jnp.imag(ft).astype(jnp.float32)
    zero = jnp.zeros((d, d), jnp.float32)
    # per-pilot forward blocks consuming x2d = [Re r_1..Re r_P|Im r_1..Im r_P]
    rows_r, rows_i = [], []
    for pi in range(p):
        blk_r = [fr if j == pi else zero for j in range(p)] \
            + [-fi_ if j == pi else zero for j in range(p)]
        blk_i = [fi_ if j == pi else zero for j in range(p)] \
            + [fr if j == pi else zero for j in range(p)]
        rows_r.append(jnp.concatenate(blk_r, axis=0))
        rows_i.append(jnp.concatenate(blk_i, axis=0))
    bfwd_r = jnp.stack(rows_r)                             # (P, 2PD, D)
    bfwd_i = jnp.stack(rows_i)
    fi_c = jnp.conj(f)
    top = jnp.concatenate([jnp.real(fi_c), jnp.imag(fi_c)], axis=-1)
    bot = jnp.concatenate([-jnp.imag(fi_c), jnp.real(fi_c)], axis=-1)
    binv = jnp.concatenate([top, bot], axis=-2).astype(jnp.float32)

    mc = sb._mp_consts(bank)
    const = mc.const_k[None, :]
    pm_flat = mc.pm_flat                                   # (K, P*D)
    coefs = []
    for pi in range(p):
        pm_p = pm_flat[:, pi * d:(pi + 1) * d]             # (K, D)
        coefs += [2.0 * jnp.real(pm_p).T,
                  2.0 * jnp.imag(pm_p).T,
                  -mc.prec_re[:, :, pi, pi].T]
    for pi in range(p):
        for qi in range(pi + 1, p):
            coefs += [-2.0 * mc.prec_re[:, :, pi, qi].T,
                      2.0 * mc.prec_im[:, :, pi, qi].T]
    lcoef = jnp.concatenate(coefs, axis=0).astype(jnp.float32)
    filt_r = jnp.moveaxis(jnp.real(bank.filt_f), -1, 0).astype(jnp.float32)
    filt_i = jnp.moveaxis(jnp.imag(bank.filt_f), -1, 0).astype(jnp.float32)
    return MpCircKernelBank(
        bfwd_r, bfwd_i, lcoef, const,
        jnp.real(bank.bias_f).astype(jnp.float32),
        jnp.imag(bank.bias_f).astype(jnp.float32),
        filt_r, filt_i, binv)


def _mp_circ_kernel(bfwd_r, bfwd_i, lcoef, const, bias_r, bias_i,
                    filt_r, filt_i, binv, x_ref, out_ref, *, n_pilots: int,
                    t_coh: int = 1, alpha: float = 1.0):
    """One sample tile, straight-line: P forward DFT pairs -> stacked
    quadratic features -> one logit GEMM -> softmax -> per-pilot combine
    -> inverse DFT, all in VMEM. P is a small static unroll (the slices
    below are full-width bank-operand reads, not lane slices).

    t_coh > 1 is the COHERENT variant (one shared body, like
    `_grouped_stream(t_coh=)` for the dense family): rows are T-major per
    tile, per-snapshot logits pool over T static sublane slices before
    the softmax with the leave-one-out alpha blend; `const` arrives with
    the mixture log-weight pre-divided by (1 - alpha + alpha*T)."""
    x = x_ref[:]                                           # (TN, 2PD)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    urs, uis = [], []
    for pi in range(n_pilots):
        urs.append(dot(x, bfwd_r[pi]))                     # (TN, D)
        uis.append(dot(x, bfwd_i[pi]))
    feats = []
    for pi in range(n_pilots):
        feats += [urs[pi], uis[pi], urs[pi] * urs[pi] + uis[pi] * uis[pi]]
    for pi in range(n_pilots):
        for qi in range(pi + 1, n_pilots):
            feats.append(urs[pi] * urs[qi] + uis[pi] * uis[qi])
            feats.append(urs[pi] * uis[qi] - uis[pi] * urs[qi])
    z = jnp.concatenate(feats, axis=-1)
    logits = dot(z, lcoef[:]) + const[:]
    if t_coh > 1:
        bp = logits.shape[0] // t_coh
        s = logits[0:bp]
        for j in range(1, t_coh):
            s = s + logits[j * bp:(j + 1) * bp]
        pooled = jnp.concatenate([s] * t_coh, axis=0)
        logits = (logits + alpha * (pooled - logits) if alpha < 1.0
                  else pooled)
    m = jnp.max(logits, axis=-1, keepdims=True)
    pr = jnp.exp(logits - m)
    w = pr / jnp.sum(pr, axis=-1, keepdims=True)
    hr = dot(w, bias_r[:])
    hi = dot(w, bias_i[:])
    for pi in range(n_pilots):
        fr_ = dot(w, filt_r[pi])
        fi__ = dot(w, filt_i[pi])
        hr = hr + fr_ * urs[pi] - fi__ * uis[pi]
        hi = hi + fr_ * uis[pi] + fi__ * urs[pi]
    out_ref[:] = dot(jnp.concatenate([hr, hi], axis=-1), binv[:])


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def estimate_mp_circ_packed(ckb: MpCircKernelBank, x2d: jax.Array,
                            tile_n: int, n_pilots: int,
                            interpret: bool = False, t_coh: int = 1,
                            alpha: float = 1.0):
    """Fused multi-pilot structured estimation: x2d (N, 2PD) f32
    [Re r_1..Re r_P | Im r_1..Im r_P] -> (N, 2D) f32 [Re | Im]; t_coh > 1
    selects the coherent body (T-major x2d, `_blocks_to_tmajor`)."""
    n, d2p = x2d.shape
    d = d2p // (2 * n_pilots)
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n}")
    _check_t_coh(tile_n, t_coh)
    k_comp = ckb.const.shape[-1]
    bank_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    data_spec = pl.BlockSpec((tile_n, d2p), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_n, 2 * d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    feat = d * (3 * n_pilots + n_pilots * (n_pilots - 1))
    flops = 2 * n * (2 * n_pilots * d2p * d + feat * k_comp
                     + (2 + 2 * n_pilots) * k_comp * d + 4 * d * d)
    kern = functools.partial(_mp_circ_kernel, n_pilots=n_pilots,
                             t_coh=t_coh, alpha=alpha)
    return pl.pallas_call(
        kern,
        grid=(n // tile_n,),
        in_specs=[bank_spec] * 9 + [data_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, 2 * d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (n * (d2p + 2 * d)
                                + _mp_circ_bank_bytes(d, k_comp, n_pilots)),
            transcendentals=n * k_comp),
        interpret=interpret,
    )(ckb.bfwd_r, ckb.bfwd_i, ckb.lcoef, ckb.const, ckb.bias_r, ckb.bias_i,
      ckb.filt_r, ckb.filt_i, ckb.binv, x2d)


def estimate_fused_circulant_mp(bank, r: jax.Array, tile_n=None,
                                interpret: bool = False,
                                blocks=None) -> jax.Array:
    """Fused 'all'-mode MULTI-PILOT structured estimation of r (N, P*D)
    complex through a `structured_bank.CirculantBankMP` — the kernel
    analog of `structured_bank.estimate_circulant_mp` ('all' mode;
    selection modes stay on the XLA path). Input rows are the reference's
    pilot-major kron(x, I) layout; the kernel consumes
    [Re r_1..Re r_P | Im r_1..Im r_P]."""
    k, d, p = bank.mean_rf.shape
    ckb = mp_circ_kernel_bank(bank, blocks)
    tile_n = _mp_circ_tile_n(d, k, p, tile_n)
    n = r.shape[0]
    n_pad = -(-n // tile_n) * tile_n
    rp = jnp.pad(r, ((0, n_pad - n), (0, 0)))
    x2d = jnp.concatenate([jnp.real(rp), jnp.imag(rp)],
                          axis=-1).astype(jnp.float32)
    out = estimate_mp_circ_packed(ckb, x2d, tile_n, p, interpret)
    return (out[:n, :d] + 1j * out[:n, d:]).astype(r.dtype)


def estimate_fused_circulant_mp_coherent(bank, r: jax.Array,
                                         alpha: float = 1.0,
                                         interpret: bool = False,
                                         blocks=None) -> jax.Array:
    """Fused coherent MULTI-pilot structured estimation of blocks
    r (B, T, P*D) -> (B, T, D): kernel analog of
    `structured_bank.estimate_circulant_mp_coherent` ('all' mode,
    T <= 16; callers check eligibility)."""
    b, t, _ = r.shape
    if t == 1:
        return estimate_fused_circulant_mp(bank, r[:, 0, :],
                                           interpret=interpret,
                                           blocks=blocks)[:, None, :]
    k, d, p = bank.mean_rf.shape
    lw_div = 1.0 - alpha + alpha * t
    ckb = mp_circ_kernel_bank(bank, blocks)
    lw = jnp.maximum(bank.log_weights, -1e30).astype(jnp.float32)
    ckb = ckb._replace(const=ckb.const - lw[None, :]
                       + (lw / lw_div)[None, :])
    base = _mp_circ_tile_n(d, k, p)
    if b * t < base:
        base = min(base, 256)
    tile_n = _coherent_tile_n(base, t)
    rows, b_pad = _blocks_to_tmajor(r, tile_n)
    x2d = jnp.concatenate([jnp.real(rows), jnp.imag(rows)],
                          axis=-1).astype(jnp.float32)
    out = estimate_mp_circ_packed(ckb, x2d, tile_n, p, interpret, t,
                                  float(alpha))
    out_b = _tmajor_to_blocks(out, t, tile_n, b)          # (B, T, 2D)
    return (out_b[..., :d] + 1j * out_b[..., d:]).astype(r.dtype)


def _circ_kernel_coh(bfwd_r, bfwd_i, lcoef, const, bias_r, bias_i,
                     filt_r, filt_i, binv, x_ref, out_ref, *,
                     t_coh: int, alpha: float):
    """Coherent variant: rows are T-major per tile (`_blocks_to_tmajor`),
    per-snapshot logits pool over T static sublane slices of bp rows
    before the softmax (the dense coherent kernel's hardware-validated
    pattern, T <= 8), with the leave-one-out alpha blend as one extra VPU
    fma. `const` must be pre-divided by (1 - alpha + alpha*T) so the
    mixture log-weight enters once per block after pooling."""
    x = x_ref[:]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    ur = dot(x, bfwd_r[:])
    ui = dot(x, bfwd_i[:])
    z = jnp.concatenate([ur, ui, ur * ur + ui * ui], axis=-1)
    logits = dot(z, lcoef[:]) + const[:]                   # (TN, K)
    bp = logits.shape[0] // t_coh
    s = logits[0:bp]
    for j in range(1, t_coh):
        s = s + logits[j * bp:(j + 1) * bp]
    pooled = jnp.concatenate([s] * t_coh, axis=0)
    lg = logits + alpha * (pooled - logits) if alpha < 1.0 else pooled
    m = jnp.max(lg, axis=-1, keepdims=True)
    p = jnp.exp(lg - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)
    br = dot(w, bias_r[:])
    bi = dot(w, bias_i[:])
    fr = dot(w, filt_r[:])
    fi = dot(w, filt_i[:])
    hr = br + fr * ur - fi * ui
    hi = bi + fr * ui + fi * ur
    out_ref[:] = dot(jnp.concatenate([hr, hi], axis=-1), binv[:])


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def estimate_circ_packed_coh(ckb: CircKernelBank, x2d: jax.Array,
                             tile_n: int, t_coh: int, alpha: float,
                             interpret: bool = False):
    """T-major coherent fused structured estimation; x2d (N, 2D) f32 with
    N a multiple of tile_n and tile_n // t_coh a multiple of 8."""
    n, d2 = x2d.shape
    _check_t_coh(tile_n, t_coh)
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n}")
    k_comp = ckb.const.shape[-1]
    d = d2 // 2
    bank_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    data_spec = pl.BlockSpec((tile_n, d2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    kern = functools.partial(_circ_kernel_coh, t_coh=t_coh, alpha=alpha)
    flops = 2 * n * (2 * d2 * d + 3 * d * k_comp + 4 * k_comp * d
                     + d2 * d2)
    return pl.pallas_call(
        kern,
        grid=(n // tile_n,),
        in_specs=[bank_spec] * 9 + [data_spec],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((n, d2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (2 * n * d2 + 3 * d2 * d2),
            transcendentals=n * k_comp),
        interpret=interpret,
    )(ckb.bfwd_r, ckb.bfwd_i, ckb.lcoef, ckb.const, ckb.bias_r, ckb.bias_i,
      ckb.filt_r, ckb.filt_i, ckb.binv, x2d)


def estimate_fused_circulant_coherent(bank, r: jax.Array,
                                      alpha: float = 1.0,
                                      interpret: bool = False,
                                      blocks=None) -> jax.Array:
    """Fused coherent structured estimation of blocks r (B, T, M) ->
    (B, T, D): kernel analog of
    `structured_bank.estimate_circulant_coherent` ('all' mode, flat
    circulant basis, hardware-validated T <= 8; callers check
    eligibility and fall back to the XLA path)."""
    b, t, m_dim = r.shape
    if t == 1:
        return estimate_fused_circulant(bank, r[:, 0, :],
                                        interpret=interpret,
                                        blocks=blocks)[:, None, :]
    # pre-divide the mixture log-weight so it enters once per block after
    # the in-kernel pooling (`kernel_bank_block` trick): const carries
    # logw + (logdet - mu2); only logw must be scaled, so split it out
    lw_div = 1.0 - alpha + alpha * t
    ckb = circ_kernel_bank(bank, blocks)
    lw = jnp.maximum(bank.log_weights, -1e30).astype(jnp.float32)
    ckb = ckb._replace(const=ckb.const - lw[None, :]
                       + (lw / lw_div)[None, :])
    base = _circ_tile_n(m_dim, bank.log_weights.shape[0])
    if b * t < base:
        base = max(64, 256)
    tile_n = _coherent_tile_n(base, t)
    rows, b_pad = _blocks_to_tmajor(r, tile_n)
    x2d = jnp.concatenate([jnp.real(rows), jnp.imag(rows)],
                          axis=-1).astype(jnp.float32)
    out = estimate_circ_packed_coh(ckb, x2d, tile_n, t, float(alpha),
                                   interpret)
    d = m_dim
    out_b = _tmajor_to_blocks(out, t, tile_n, b)          # (B, T, 2D)
    return (out_b[..., :d] + 1j * out_b[..., d:]).astype(r.dtype)


def _circ_kernel_stats(bfwd_r, bfwd_i, lcoef, const, bias_r, bias_i,
                       filt_r, filt_i, binv, x_ref, out_m, out_den,
                       out_acc):
    """Stats variant of `_circ_kernel`: un-normalized online-softmax state
    (m, den, acc) per row for cross-shard pmax/psum merging — acc stays in
    the DFT DOMAIN (the inverse transform commutes with the normalization
    and runs once after the merge). Same logit convention per shard, so
    kernel-state merges with kernel-state exactly."""
    x = x_ref[:]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    ur = dot(x, bfwd_r[:])
    ui = dot(x, bfwd_i[:])
    z = jnp.concatenate([ur, ui, ur * ur + ui * ui], axis=-1)
    logits = dot(z, lcoef[:]) + const[:]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    den = jnp.sum(p, axis=-1, keepdims=True)
    br = dot(p, bias_r[:])
    bi = dot(p, bias_i[:])
    fr = dot(p, filt_r[:])
    fi = dot(p, filt_i[:])
    out_m[:] = m
    out_den[:] = den
    out_acc[:] = jnp.concatenate(
        [br + fr * ur - fi * ui, bi + fr * ui + fi * ur], axis=-1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def estimate_circ_packed_stats(ckb: CircKernelBank, x2d: jax.Array,
                               tile_n: int = 1024,
                               interpret: bool = False):
    """(m (N, 1), den (N, 1), acc (N, 2D)) f32, DFT-domain."""
    n, d2 = x2d.shape
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n}")
    bank_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    data_spec = pl.BlockSpec((tile_n, d2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _circ_kernel_stats,
        grid=(n // tile_n,),
        in_specs=[bank_spec] * 9 + [data_spec],
        out_specs=[col_spec, col_spec, data_spec],
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, d2), jnp.float32)],
        interpret=interpret,
    )(ckb.bfwd_r, ckb.bfwd_i, ckb.lcoef, ckb.const, ckb.bias_r, ckb.bias_i,
      ckb.filt_r, ckb.filt_i, ckb.binv, x2d)


def estimate_fused_circulant_stats(bank, r: jax.Array,
                                   tile_n=None,
                                   interpret: bool = False):
    """Kernel analog of `structured_bank.estimate_circulant_stats`:
    (m (N,) f32, den (N,) f32, acc (N, D) complex, DFT domain). Merge
    kernel states with kernel states (the shared row-constant -D log pi is
    dropped from the kernel logit convention, like the dense stats
    kernel)."""
    ckb = circ_kernel_bank(bank)
    n, d = r.shape
    tile_n = _circ_tile_n(d, bank.log_weights.shape[0], tile_n)
    n_pad = -(-n // tile_n) * tile_n
    rp = jnp.pad(r, ((0, n_pad - n), (0, 0)))
    x2d = jnp.concatenate([jnp.real(rp), jnp.imag(rp)],
                          axis=-1).astype(jnp.float32)
    m, den, acc = estimate_circ_packed_stats(ckb, x2d, tile_n, interpret)
    return (m[:n, 0], den[:n, 0],
            (acc[:n, :d] + 1j * acc[:n, d:]).astype(jnp.complex64))


def _circ_kernel_coh_stats(bfwd_r, bfwd_i, lcoef, const, bias_r, bias_i,
                           filt_r, filt_i, binv, x_ref, out_m, out_den,
                           out_acc, *, t_coh: int, alpha: float):
    """Stats variant of `_circ_kernel_coh`: T-major per-row blended logits,
    un-normalized (m, den, acc) with acc in the DFT domain (block-constant
    m/den rows at alpha=1 — callers slice per block)."""
    x = x_ref[:]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    ur = dot(x, bfwd_r[:])
    ui = dot(x, bfwd_i[:])
    z = jnp.concatenate([ur, ui, ur * ur + ui * ui], axis=-1)
    logits = dot(z, lcoef[:]) + const[:]
    bp = logits.shape[0] // t_coh
    s = logits[0:bp]
    for j in range(1, t_coh):
        s = s + logits[j * bp:(j + 1) * bp]
    pooled = jnp.concatenate([s] * t_coh, axis=0)
    lg = logits + alpha * (pooled - logits) if alpha < 1.0 else pooled
    m = jnp.max(lg, axis=-1, keepdims=True)
    p = jnp.exp(lg - m)
    den = jnp.sum(p, axis=-1, keepdims=True)
    br = dot(p, bias_r[:])
    bi = dot(p, bias_i[:])
    fr = dot(p, filt_r[:])
    fi = dot(p, filt_i[:])
    out_m[:] = m
    out_den[:] = den
    out_acc[:] = jnp.concatenate(
        [br + fr * ur - fi * ui, bi + fr * ui + fi * ur], axis=-1)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def estimate_circ_packed_coh_stats(ckb: CircKernelBank, x2d: jax.Array,
                                   tile_n: int, t_coh: int, alpha: float,
                                   interpret: bool = False):
    n, d2 = x2d.shape
    _check_t_coh(tile_n, t_coh)
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n}")
    bank_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    data_spec = pl.BlockSpec((tile_n, d2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_circ_kernel_coh_stats, t_coh=t_coh,
                             alpha=alpha)
    return pl.pallas_call(
        kern,
        grid=(n // tile_n,),
        in_specs=[bank_spec] * 9 + [data_spec],
        out_specs=[col_spec, col_spec, data_spec],
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, d2), jnp.float32)],
        interpret=interpret,
    )(ckb.bfwd_r, ckb.bfwd_i, ckb.lcoef, ckb.const, ckb.bias_r, ckb.bias_i,
      ckb.filt_r, ckb.filt_i, ckb.binv, x2d)


def estimate_fused_circulant_coherent_stats(bank, r: jax.Array,
                                            alpha: float = 1.0,
                                            interpret: bool = False,
                                            blocks=None):
    """Kernel analog of
    `structured_bank.estimate_circulant_coherent_stats`: per-block state
    (m (B,), den (B,)) at alpha=1, per-snapshot ((B, T)) below, acc
    (B, T, D) complex in the DFT domain. Merge kernel states with kernel
    states (shared per-shard logit convention)."""
    b, t, m_dim = r.shape
    lw_div = 1.0 - alpha + alpha * t
    ckb = circ_kernel_bank(bank, blocks)
    lw = jnp.maximum(bank.log_weights, -1e30).astype(jnp.float32)
    ckb = ckb._replace(const=ckb.const - lw[None, :]
                       + (lw / lw_div)[None, :])
    base = _circ_tile_n(m_dim, bank.log_weights.shape[0])
    if b * t < base:
        base = 256
    tile_n = _coherent_tile_n(base, t)
    rows, b_pad = _blocks_to_tmajor(r, tile_n)
    x2d = jnp.concatenate([jnp.real(rows), jnp.imag(rows)],
                          axis=-1).astype(jnp.float32)
    m, den, acc = estimate_circ_packed_coh_stats(ckb, x2d, tile_n, t,
                                                 float(alpha), interpret)
    d = m_dim
    acc_b = _tmajor_to_blocks(acc, t, tile_n, b)
    acc_c = (acc_b[..., :d] + 1j * acc_b[..., d:]).astype(jnp.complex64)
    m_b = _tmajor_to_blocks(m[:, 0], t, tile_n, b)
    den_b = _tmajor_to_blocks(den[:, 0], t, tile_n, b)
    if alpha >= 1.0:
        return m_b[:, 0], den_b[:, 0], acc_c
    return m_b, den_b, acc_c


# ---------------------------------------------------------------------------
# factored (low-rank+diagonal / MFA) fused kernel
# ---------------------------------------------------------------------------

class FactKernelBank(NamedTuple):
    """`mfa_bank.FactoredBank` lowered for a single-pass fused kernel.

    Same architecture as `CircKernelBank` — forward GEMMs, a
    stacked-coefficient logit GEMM, softmax, combine GEMMs, all in VMEM —
    with the DFT transform replaced by the Woodbury coefficient GEMMs
    (beta = T r, gamma = P2 r as (TN, 2KM) split-real arrays) and the
    per-component M-row reduction of |beta - T mu|^2 realized as ONE
    block-indicator GEMM (MXU-shaped; no sub-128 lane slicing, no
    reshapes of the lane dim — CLAUDE.md Mosaic rules). KM = K*M.

    fwd_t/fwd_p: (2D, 2KM) f32  [xr|xi] @ . -> [beta_r|beta_i] / gamma
    tmu2:        (1, 2KM) f32   [Re T mu | Im T mu]
    lcoef:       (3D, K) f32    [2(Re mu_r inv_e)^T; 2(Im ..)^T; -inv_e^T]
    const:       (1, K) f32     logw - logdet - mu2 (dead comps -1e30)
    ind:         (2KM, K) f32   both halves' M-blocks -> component column
    indt2:       (K, 2KM) f32   w broadcast K -> 2KM
    cstack_r/i:  (4KM, D) f32   [wkm*gam | wkm*beta] @ . -> Re/Im combine
                                (Lambda rows; MINUS-R rows folded in)
    bias_r/i:    (K, D) f32
    a1_r/i:      (K, D) f32
    """
    fwd_t: jax.Array
    fwd_p: jax.Array
    tmu2: jax.Array
    lcoef: jax.Array
    const: jax.Array
    ind: jax.Array
    indt2: jax.Array
    cstack_r: jax.Array
    cstack_i: jax.Array
    bias_r: jax.Array
    bias_i: jax.Array
    a1_r: jax.Array
    a1_i: jax.Array


def _fact_bank_bytes(d: int, k: int, m: int) -> int:
    km = k * m
    return 4 * (2 * (2 * d) * (2 * km) + 2 * km + 3 * d * k + k
                + 2 * (2 * km) * k + 2 * (4 * km) * d + 4 * k * d)


def _fact_per_row_bytes(d: int, k: int, m: int) -> int:
    """Per-sample-row VMEM live set of the fused factored kernels: the
    measured ~(2 KM + 4 D) floats plus the (TN, K) weight tile (hardware
    calibration note in `_fact_tile_n`)."""
    return 4 * (4 * d + 2 * k * m + k)


def _fact_kernel_eligible(d: int, k: int, m: int, t: int = 1) -> bool:
    """Full VMEM invariant for fused-factored dispatch: the resident bank
    PLUS the smallest dispatchable sample tile's live set must fit the
    ~13 MiB scoped budget. Gating on bank bytes alone admitted ~11-13 MiB
    banks whose tile live set overflows (round-4 advisor finding). The
    floor tile is 64 rows flat and 8*T rows coherent (`_coherent_tile_n`'s
    sublane floor), so eligibility is exactly "the floor tile fits"."""
    budget = 13 * 1024 * 1024 - _fact_bank_bytes(d, k, m) - 2 * 1024 * 1024
    min_tile = 64 if t <= 1 else 8 * t
    return budget >= min_tile * _fact_per_row_bytes(d, k, m)


def _fact_tile_n(d: int, k: int, m: int, requested=None) -> int:
    """Largest power-of-two sample tile keeping constants + per-tile
    intermediates inside the ~13 MiB scoped-VMEM budget. The per-row
    coefficient was CALIBRATED on hardware at D=64/K=64/M=16 (KM=1024):
    tile 512 compiles and is the fastest (14.4 M est/s; 64→13.3, 128→13.9,
    256→13.6), tile 1024 crashes the Mosaic compile — so the live set is
    ~2 KM + 4 D floats/row (buffer reuse halves the naive sum of the
    x/z/beta/gamma/diff/wkm/op intermediates), and the hard cap stays at
    the hardware-validated 512."""
    if requested is not None:
        return requested
    budget = 13 * 1024 * 1024 - _fact_bank_bytes(d, k, m) - 2 * 1024 * 1024
    per_row = _fact_per_row_bytes(d, k, m)
    cap = max(64, budget // per_row)
    t = 64
    while t * 2 <= min(cap, 512):
        t *= 2
    return t


def _split_cols(ct):
    """(D, KM) complex right-multiplier -> (2D, 2KM) f32 block matrix:
    [xr|xi] @ block = [Re(x@ct) | Im(x@ct)]."""
    top = jnp.concatenate([jnp.real(ct), jnp.imag(ct)], axis=-1)
    bot = jnp.concatenate([-jnp.imag(ct), jnp.real(ct)], axis=-1)
    return jnp.concatenate([top, bot], axis=-2).astype(jnp.float32)


@highest_precision
def fact_kernel_bank(bank) -> FactKernelBank:
    """Lower a `mfa_bank.FactoredBank` (jittable)."""
    k, m, d = bank.t_mat.shape
    km = k * m
    t_flat = bank.t_mat.reshape(km, d)
    p_flat = bank.p2_mat.reshape(km, d)
    fwd_t = _split_cols(t_flat.T)
    fwd_p = _split_cols(p_flat.T)
    tmu = bank.t_mu.reshape(1, km)
    tmu2 = jnp.concatenate([jnp.real(tmu), jnp.imag(tmu)],
                           axis=-1).astype(jnp.float32)
    cm_r = (jnp.real(bank.means_r) * bank.inv_e).T       # (D, K)
    cm_i = (jnp.imag(bank.means_r) * bank.inv_e).T
    lcoef = jnp.concatenate([2.0 * cm_r, 2.0 * cm_i, -bank.inv_e.T],
                            axis=0).astype(jnp.float32)
    mu2 = jnp.sum(jnp.abs(bank.means_r) ** 2 * bank.inv_e, axis=-1)
    const = jnp.maximum(bank.log_weights - bank.logdet - mu2,
                        -1e30).astype(jnp.float32)[None, :]
    eye = jnp.eye(k, dtype=jnp.float32)
    blk = jnp.repeat(eye, m, axis=0)                     # (KM, K)
    ind = jnp.concatenate([blk, blk], axis=0)            # (2KM, K)
    indt2 = ind.T
    lam_flat = bank.lam_t.reshape(km, d)
    r_flat = bank.r_t.reshape(km, d)
    cstack_r = jnp.concatenate(
        [jnp.real(lam_flat), -jnp.imag(lam_flat),
         -jnp.real(r_flat), jnp.imag(r_flat)], axis=0).astype(jnp.float32)
    cstack_i = jnp.concatenate(
        [jnp.imag(lam_flat), jnp.real(lam_flat),
         -jnp.imag(r_flat), -jnp.real(r_flat)], axis=0).astype(jnp.float32)
    return FactKernelBank(
        fwd_t, fwd_p, tmu2, lcoef, const, ind, indt2, cstack_r, cstack_i,
        jnp.real(bank.bias).astype(jnp.float32),
        jnp.imag(bank.bias).astype(jnp.float32),
        jnp.real(bank.a1).astype(jnp.float32),
        jnp.imag(bank.a1).astype(jnp.float32))


def _fact_kernel(fwd_t, fwd_p, tmu2, lcoef, const, ind, indt2,
                 cstack_r, cstack_i, bias_r, bias_i, a1_r, a1_i,
                 xr_ref, xi_ref, out_ref):
    """One sample tile, straight-line: Woodbury coefficient GEMMs ->
    logits -> softmax -> combine, all in VMEM."""
    xr = xr_ref[:]                                         # (TN, D)
    xi = xi_ref[:]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    x2 = jnp.concatenate([xr, xi], axis=-1)                # (TN, 2D)
    beta = dot(x2, fwd_t[:])                               # (TN, 2KM)
    gam = dot(x2, fwd_p[:])
    z = jnp.concatenate([xr, xi, xr * xr + xi * xi], axis=-1)
    diff = beta - tmu2[:]
    logits = dot(z, lcoef[:]) + dot(diff * diff, ind[:]) + const[:]
    mx = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - mx)
    w = p / jnp.sum(p, axis=-1, keepdims=True)             # (TN, K)
    wkm = dot(w, indt2[:])                                 # (TN, 2KM)
    op = jnp.concatenate([wkm * gam, wkm * beta], axis=-1)  # (TN, 4KM)
    ar = dot(w, a1_r[:])
    ai = dot(w, a1_i[:])
    hr = dot(op, cstack_r[:]) + dot(w, bias_r[:]) + ar * xr - ai * xi
    hi = dot(op, cstack_i[:]) + dot(w, bias_i[:]) + ar * xi + ai * xr
    out_ref[:] = jnp.concatenate([hr, hi], axis=-1)


@functools.partial(jax.jit, static_argnums=(3, 4))
def estimate_fact_packed(fkb: FactKernelBank, xr: jax.Array, xi: jax.Array,
                         tile_n: int = 1024, interpret: bool = False):
    """Fused factored estimation: xr/xi (N, D) f32 -> (N, 2D) f32
    [Re | Im]. N must be a multiple of tile_n."""
    n, d = xr.shape
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n}")
    km2 = fkb.tmu2.shape[-1]
    k_comp = fkb.const.shape[-1]
    bank_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    data_spec = pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_n, 2 * d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    flops = 2 * n * (2 * (2 * d) * km2 + 3 * d * k_comp + km2 * k_comp
                     + k_comp * km2 + 2 * km2 * 2 * d + 4 * k_comp * d)
    return pl.pallas_call(
        _fact_kernel,
        grid=(n // tile_n,),
        in_specs=[bank_spec] * 13 + [data_spec, data_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, 2 * d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (4 * n * d) + _fact_bank_bytes(
                d, k_comp, km2 // (2 * k_comp)),
            transcendentals=n * k_comp),
        interpret=interpret,
    )(fkb.fwd_t, fkb.fwd_p, fkb.tmu2, fkb.lcoef, fkb.const, fkb.ind,
      fkb.indt2, fkb.cstack_r, fkb.cstack_i, fkb.bias_r, fkb.bias_i,
      fkb.a1_r, fkb.a1_i, xr, xi)


def estimate_fused_factored(bank, r: jax.Array, tile_n=None,
                            interpret: bool = False) -> jax.Array:
    """Fused 'all'-mode factored estimation of r (N, M) complex through a
    `mfa_bank.FactoredBank` — the kernel analog of
    `mfa_bank.estimate_factored` ('all' mode; selection modes stay on the
    XLA path)."""
    fkb = fact_kernel_bank(bank)
    k, m, d = bank.t_mat.shape
    tile_n = _fact_tile_n(d, k, m, tile_n)
    n = r.shape[0]
    n_pad = -(-n // tile_n) * tile_n
    rp = jnp.pad(r, ((0, n_pad - n), (0, 0)))
    xr = jnp.real(rp).astype(jnp.float32)
    xi = jnp.imag(rp).astype(jnp.float32)
    out = estimate_fact_packed(fkb, xr, xi, tile_n, interpret)
    return (out[:n, :d] + 1j * out[:n, d:]).astype(r.dtype)


def _fact_kernel_coh(fwd_t, fwd_p, tmu2, lcoef, const, ind, indt2,
                     cstack_r, cstack_i, bias_r, bias_i, a1_r, a1_i,
                     xr_ref, xi_ref, out_ref, *, t_coh: int, alpha: float):
    """Coherent variant of `_fact_kernel`: rows are T-major per tile
    (`_blocks_to_tmajor`), per-snapshot logits pool over T static sublane
    slices of bp rows before the softmax (the hardware-validated pattern
    of `_circ_kernel_coh`), with the leave-one-out alpha blend as one
    extra VPU fma. `const` must carry the mixture log-weight pre-divided
    by (1 - alpha + alpha*T) so it enters once per block after pooling;
    logdet/mu2 are per-snapshot likelihood terms and pool T times."""
    xr = xr_ref[:]
    xi = xi_ref[:]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    x2 = jnp.concatenate([xr, xi], axis=-1)
    beta = dot(x2, fwd_t[:])
    gam = dot(x2, fwd_p[:])
    z = jnp.concatenate([xr, xi, xr * xr + xi * xi], axis=-1)
    diff = beta - tmu2[:]
    logits = dot(z, lcoef[:]) + dot(diff * diff, ind[:]) + const[:]
    bp = logits.shape[0] // t_coh
    s = logits[0:bp]
    for j in range(1, t_coh):
        s = s + logits[j * bp:(j + 1) * bp]
    pooled = jnp.concatenate([s] * t_coh, axis=0)
    lg = logits + alpha * (pooled - logits) if alpha < 1.0 else pooled
    mx = jnp.max(lg, axis=-1, keepdims=True)
    p = jnp.exp(lg - mx)
    w = p / jnp.sum(p, axis=-1, keepdims=True)
    wkm = dot(w, indt2[:])
    op = jnp.concatenate([wkm * gam, wkm * beta], axis=-1)
    ar = dot(w, a1_r[:])
    ai = dot(w, a1_i[:])
    hr = dot(op, cstack_r[:]) + dot(w, bias_r[:]) + ar * xr - ai * xi
    hi = dot(op, cstack_i[:]) + dot(w, bias_i[:]) + ar * xi + ai * xr
    out_ref[:] = jnp.concatenate([hr, hi], axis=-1)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def estimate_fact_packed_coh(fkb: FactKernelBank, xr: jax.Array,
                             xi: jax.Array, tile_n: int, t_coh: int,
                             alpha: float, interpret: bool = False):
    """T-major coherent fused factored estimation; xr/xi (N, D) f32 with
    N a multiple of tile_n and tile_n // t_coh a multiple of 8."""
    n, d = xr.shape
    _check_t_coh(tile_n, t_coh)
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n}")
    km2 = fkb.tmu2.shape[-1]
    k_comp = fkb.const.shape[-1]
    bank_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    data_spec = pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_n, 2 * d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_fact_kernel_coh, t_coh=t_coh, alpha=alpha)
    flops = 2 * n * (2 * (2 * d) * km2 + 3 * d * k_comp + 2 * km2 * k_comp
                     + 2 * km2 * 2 * d + 4 * k_comp * d)
    return pl.pallas_call(
        kern,
        grid=(n // tile_n,),
        in_specs=[bank_spec] * 13 + [data_spec, data_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, 2 * d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * (4 * n * d),
            transcendentals=n * k_comp),
        interpret=interpret,
    )(fkb.fwd_t, fkb.fwd_p, fkb.tmu2, fkb.lcoef, fkb.const, fkb.ind,
      fkb.indt2, fkb.cstack_r, fkb.cstack_i, fkb.bias_r, fkb.bias_i,
      fkb.a1_r, fkb.a1_i, xr, xi)


def estimate_fused_factored_coherent(bank, r: jax.Array,
                                     alpha: float = 1.0,
                                     interpret: bool = False) -> jax.Array:
    """Fused coherent factored estimation of blocks r (B, T, M) ->
    (B, T, D): kernel analog of `mfa_bank.estimate_factored_coherent`
    ('all' mode, T <= 16; callers check eligibility and fall back to the
    XLA path)."""
    b, t, m_dim = r.shape
    if t == 1:
        return estimate_fused_factored(bank, r[:, 0, :],
                                       interpret=interpret)[:, None, :]
    lw_div = 1.0 - alpha + alpha * t
    fkb = fact_kernel_bank(bank)
    lw = jnp.maximum(bank.log_weights, -1e30).astype(jnp.float32)
    fkb = fkb._replace(const=fkb.const - lw[None, :]
                       + (lw / lw_div)[None, :])
    k, m, d = bank.t_mat.shape
    base = _fact_tile_n(d, k, m)
    if b * t < base:
        # shrink to the small-batch tile, but never ABOVE the
        # VMEM-budget-derived base (round-4 advisor finding: raising a
        # budget-limited base to 256 risks a Mosaic VMEM OOM)
        base = min(base, 256)
    tile_n = _coherent_tile_n(base, t)
    rows, b_pad = _blocks_to_tmajor(r, tile_n)
    xr = jnp.real(rows).astype(jnp.float32)
    xi = jnp.imag(rows).astype(jnp.float32)
    out = estimate_fact_packed_coh(fkb, xr, xi, tile_n, t, float(alpha),
                                   interpret)
    out_b = _tmajor_to_blocks(out, t, tile_n, b)          # (B, T, 2D)
    return (out_b[..., :d] + 1j * out_b[..., d:]).astype(r.dtype)


def _fact_kernel_stats(fwd_t, fwd_p, tmu2, lcoef, const, ind, indt2,
                       cstack_r, cstack_i, bias_r, bias_i, a1_r, a1_i,
                       xr_ref, xi_ref, out_m, out_den, out_acc):
    """Stats variant of `_fact_kernel`: un-normalized online-softmax state
    (m, den, acc) for a component SHARD — same logit convention as
    `mfa_bank._stats_chunk` (log-prob without the row-constant -D log pi,
    plus the clamped log-weight), so kernel and XLA shard states merge
    exactly with the shared pmax/psum recurrence."""
    xr = xr_ref[:]
    xi = xi_ref[:]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    x2 = jnp.concatenate([xr, xi], axis=-1)
    beta = dot(x2, fwd_t[:])
    gam = dot(x2, fwd_p[:])
    z = jnp.concatenate([xr, xi, xr * xr + xi * xi], axis=-1)
    diff = beta - tmu2[:]
    logits = dot(z, lcoef[:]) + dot(diff * diff, ind[:]) + const[:]
    mx = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - mx)                               # un-normalized
    out_m[:] = mx
    out_den[:] = jnp.sum(p, axis=-1, keepdims=True)
    wkm = dot(p, indt2[:])
    op = jnp.concatenate([wkm * gam, wkm * beta], axis=-1)
    ar = dot(p, a1_r[:])
    ai = dot(p, a1_i[:])
    hr = dot(op, cstack_r[:]) + dot(p, bias_r[:]) + ar * xr - ai * xi
    hi = dot(op, cstack_i[:]) + dot(p, bias_i[:]) + ar * xi + ai * xr
    out_acc[:] = jnp.concatenate([hr, hi], axis=-1)


@functools.partial(jax.jit, static_argnums=(3, 4))
def estimate_fact_packed_stats(fkb: FactKernelBank, xr: jax.Array,
                               xi: jax.Array, tile_n: int = 1024,
                               interpret: bool = False):
    n, d = xr.shape
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n}")
    bank_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    data_spec = pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_n, 2 * d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fact_kernel_stats,
        grid=(n // tile_n,),
        in_specs=[bank_spec] * 13 + [data_spec, data_spec],
        out_specs=[col_spec, col_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, 2 * d), jnp.float32)],
        interpret=interpret,
    )(fkb.fwd_t, fkb.fwd_p, fkb.tmu2, fkb.lcoef, fkb.const, fkb.ind,
      fkb.indt2, fkb.cstack_r, fkb.cstack_i, fkb.bias_r, fkb.bias_i,
      fkb.a1_r, fkb.a1_i, xr, xi)


def estimate_fused_factored_stats(bank, r: jax.Array,
                                  interpret: bool = False):
    """Kernel analog of `mfa_bank.estimate_factored_stats`: (m (N,),
    den (N,), acc (N, D) complex) for a component shard of a FactoredBank.
    Merges exactly with XLA shard states (shared logit convention)."""
    k, m, d = bank.t_mat.shape
    tile_n = _fact_tile_n(d, k, m)
    n = r.shape[0]
    n_pad = -(-n // tile_n) * tile_n
    rp = jnp.pad(r, ((0, n_pad - n), (0, 0)))
    fkb = fact_kernel_bank(bank)
    xr = jnp.real(rp).astype(jnp.float32)
    xi = jnp.imag(rp).astype(jnp.float32)
    mx, den, acc = estimate_fact_packed_stats(fkb, xr, xi, tile_n,
                                              interpret)
    acc_c = (acc[:n, :d] + 1j * acc[:n, d:]).astype(jnp.complex64)
    return mx[:n, 0], den[:n, 0], acc_c
