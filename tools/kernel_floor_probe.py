"""Locate the estimation kernel's bottleneck: MXU vs VPU vs HBM.

Context (tools/kernel_split_bench.py, 2026-08-18): pure-bf16 GEMMs run the
grouped kernel only 1.2% faster than f32 (15.20 vs 15.02 M est/s), so the
kernel is NOT MXU-pass-bound. This probe times stripped variants of the same
kernel to attribute the per-tile time:

  full        — production kernel (GEMM + logits + online softmax + combine)
  gemm_only   — GEMMs plus a trivial reduction of yz (MXU + HBM floor)
  logits_only — GEMM + quad + online-softmax denominator, no combine
  combine_only— GEMM + p=const weighted combine, no logits/softmax

All variants share grid/blockspecs/bank layout, differing only in kernel
body, so differences are VPU/loop work. Usage: python tools/kernel_floor_probe.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_ANT = 64
K_COMP = 64
N_BITS = 2
SNR_DB = 10.0
BATCH = 131072
REPEATS = 10
TILE_N = 2048
GROUP = 4


def _body_full(logw, pw, mu, b, rr, n_groups, group, two_m, two_d):
    stride = two_m + two_d

    def body(g, carry):
        m_run, denom, acc = carry
        yz = jnp.dot(rr, pw[g], preferred_element_type=jnp.float32)
        logits, zs = [], []
        for j in range(group):
            base = j * stride
            dy = yz[:, base:base + two_m] - mu[g, :, j * two_m:(j + 1) * two_m]
            quad = jnp.sum(dy * dy, axis=-1, keepdims=True)
            logits.append(logw[g * group + j] - quad)
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

    init = (jnp.full((rr.shape[0], 1), -jnp.inf, jnp.float32),
            jnp.zeros((rr.shape[0], 1), jnp.float32),
            jnp.zeros((rr.shape[0], two_d), jnp.float32))
    _, denom, acc = jax.lax.fori_loop(0, n_groups, body, init)
    return acc / denom


def _body_gemm_only(logw, pw, mu, b, rr, n_groups, group, two_m, two_d):
    stride = two_m + two_d

    def body(g, acc):
        yz = jnp.dot(rr, pw[g], preferred_element_type=jnp.float32)
        # consume every column cheaply (one add per group slot) so Mosaic
        # cannot dead-code the GEMM
        for j in range(group):
            base = j * stride
            acc = acc + yz[:, base + two_m:base + stride]
        return acc

    acc = jax.lax.fori_loop(
        0, n_groups, body, jnp.zeros((rr.shape[0], two_d), jnp.float32))
    return acc


def _body_logits_only(logw, pw, mu, b, rr, n_groups, group, two_m, two_d):
    stride = two_m + two_d

    def body(g, carry):
        m_run, denom = carry
        yz = jnp.dot(rr, pw[g], preferred_element_type=jnp.float32)
        logits = []
        for j in range(group):
            base = j * stride
            dy = yz[:, base:base + two_m] - mu[g, :, j * two_m:(j + 1) * two_m]
            quad = jnp.sum(dy * dy, axis=-1, keepdims=True)
            logits.append(logw[g * group + j] - quad)
        m_new = m_run
        for lg in logits:
            m_new = jnp.maximum(m_new, lg)
        denom = denom * jnp.exp(m_run - m_new)
        for lg in logits:
            denom = denom + jnp.exp(lg - m_new)
        return m_new, denom

    init = (jnp.full((rr.shape[0], 1), -jnp.inf, jnp.float32),
            jnp.zeros((rr.shape[0], 1), jnp.float32))
    _, denom = jax.lax.fori_loop(0, n_groups, body, init)
    return jnp.broadcast_to(denom, (rr.shape[0], two_d))


def _body_combine_only(logw, pw, mu, b, rr, n_groups, group, two_m, two_d):
    stride = two_m + two_d

    def body(g, acc):
        yz = jnp.dot(rr, pw[g], preferred_element_type=jnp.float32)
        for j in range(group):
            base = j * stride
            p = logw[g * group + j]  # scalar stand-in for the softmax weight
            z = yz[:, base + two_m:base + stride] \
                + b[g, :, j * two_d:(j + 1) * two_d]
            acc = acc + p * z
        return acc

    return jax.lax.fori_loop(
        0, n_groups, body, jnp.zeros((rr.shape[0], two_d), jnp.float32))


def _body_square_only(logw, pw, mu, b, rr, n_groups, group, two_m, two_d):
    """GEMM + elementwise square, NO lane reduction (isolates the square)."""
    stride = two_m + two_d

    def body(g, acc):
        yz = jnp.dot(rr, pw[g], preferred_element_type=jnp.float32)
        for j in range(group):
            base = j * stride
            dy = yz[:, base:base + two_m] - mu[g, :, j * two_m:(j + 1) * two_m]
            acc = acc + (dy * dy)[:, :two_d]
        return acc

    return jax.lax.fori_loop(
        0, n_groups, body, jnp.zeros((rr.shape[0], two_d), jnp.float32))


def _body_quad_only(logw, pw, mu, b, rr, n_groups, group, two_m, two_d):
    """GEMM + square + lane reduction, no exp/max/denominator."""
    stride = two_m + two_d

    def body(g, acc):
        yz = jnp.dot(rr, pw[g], preferred_element_type=jnp.float32)
        for j in range(group):
            base = j * stride
            dy = yz[:, base:base + two_m] - mu[g, :, j * two_m:(j + 1) * two_m]
            acc = acc + jnp.sum(dy * dy, axis=-1, keepdims=True)
        return acc

    acc = jax.lax.fori_loop(
        0, n_groups, body, jnp.zeros((rr.shape[0], 1), jnp.float32))
    return jnp.broadcast_to(acc, (rr.shape[0], two_d))


def _body_full_fixedmax(logw, pw, mu, b, rr, n_groups, group, two_m, two_d):
    """Full math but softmax anchored at a FIXED max (no running max, no
    rescaling of denom/acc) — the timing upper bound for a two-phase or
    precomputed-anchor softmax."""
    stride = two_m + two_d
    m_fix = logw[0]

    def body(g, carry):
        denom, acc = carry
        yz = jnp.dot(rr, pw[g], preferred_element_type=jnp.float32)
        for j in range(group):
            base = j * stride
            dy = yz[:, base:base + two_m] - mu[g, :, j * two_m:(j + 1) * two_m]
            quad = jnp.sum(dy * dy, axis=-1, keepdims=True)
            p = jnp.exp(logw[g * group + j] - quad - m_fix)
            z = yz[:, base + two_m:base + stride] \
                + b[g, :, j * two_d:(j + 1) * two_d]
            denom = denom + p
            acc = acc + p * z
        return denom, acc

    init = (jnp.zeros((rr.shape[0], 1), jnp.float32),
            jnp.zeros((rr.shape[0], two_d), jnp.float32))
    denom, acc = jax.lax.fori_loop(0, n_groups, body, init)
    return acc / denom


BODIES = {
    "full": _body_full,
    "gemm_only": _body_gemm_only,
    "logits_only": _body_logits_only,
    "combine_only": _body_combine_only,
    "square_only": _body_square_only,
    "quad_only": _body_quad_only,
    "full_fixedmax": _body_full_fixedmax,
}


@functools.partial(jax.jit, static_argnums=(4, 5))
def run_variant(logw, pw, mu, b, name: str, n_groups: int, r2=None):
    two_m = r2.shape[-1]
    two_d = pw.shape[-1] // GROUP - two_m
    body = BODIES[name]

    def kern(logw_r, pw_r, mu_r, b_r, r2_r, out_r):
        out_r[:] = body(logw_r, pw_r, mu_r, b_r, r2_r[:], n_groups, GROUP,
                        two_m, two_d)

    n = r2.shape[0]
    return pl.pallas_call(
        kern,
        grid=(n // TILE_N,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec((TILE_N, two_m), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE_N, two_d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, two_d), jnp.float32),
    )(logw, pw, mu, b, r2)


def main():
    from quantized_channel_estimation_tpu.estimators import pallas_kernels as pk
    from quantized_channel_estimation_tpu.models import gmm_estimator
    from quantized_channel_estimation_tpu.models.gmm import GmmParams
    from quantized_channel_estimation_tpu.ops import linalg, observation, pilots
    from quantized_channel_estimation_tpu.ops import quantizer as Q
    from quantized_channel_estimation_tpu.ops.boundary import cjit
    from quantized_channel_estimation_tpu.ops.cplx import crandn

    def make_params(key):
        ka, _ = jax.random.split(key)
        a = crandn(ka, (K_COMP, N_ANT, N_ANT))
        covs = a @ jnp.conj(jnp.swapaxes(a, -1, -2)) / N_ANT \
            + jnp.eye(N_ANT, dtype=a.dtype)
        tr = jnp.real(jnp.trace(covs, axis1=-2, axis2=-1))[:, None, None]
        covs = covs * (N_ANT / tr).astype(covs.dtype)
        prec = linalg.robust_precision_cholesky(covs)
        w = jnp.ones((K_COMP,), jnp.float32) / K_COMP
        means = jnp.zeros((K_COMP, N_ANT), covs.dtype)
        return GmmParams(w, means, covs, prec)

    params = cjit(make_params)(jax.random.PRNGKey(0))
    a = cjit(pilots.pilot_matrix, static_argnums=(0, 1, 2, 3))(
        N_ANT, 1, N_BITS, "angle_amp")
    q = Q.design_quantizer(SNR_DB, N_BITS)
    bank = cjit(gmm_estimator.prepare_bank, static_argnums=(3,))(
        params, SNR_DB, a, N_BITS, q)

    def make_inputs(b_, key):
        kb = pk.kernel_bank_block(b_)
        n_groups = K_COMP // GROUP
        two_m = 2 * N_ANT
        stride = kb.pw.shape[-1]
        pw = jnp.swapaxes(kb.pw.reshape(n_groups, GROUP, two_m, stride),
                          1, 2).reshape(n_groups, two_m, GROUP * stride)
        mu = kb.mu.reshape(n_groups, 1, GROUP * two_m)
        bb = kb.b.reshape(n_groups, 1, GROUP * (stride - two_m))
        h = crandn(key, (BATCH, N_ANT))
        r = observation.observe(jax.random.fold_in(key, 1), h, SNR_DB,
                                None, N_BITS, q)
        r2 = jnp.concatenate([jnp.real(r), jnp.imag(r)],
                             axis=-1).astype(jnp.float32)
        return kb.logw, pw, mu, bb, r2

    logw, pw, mu, bb, r2 = cjit(make_inputs)(bank, jax.random.PRNGKey(1))
    n_groups = K_COMP // GROUP

    for name in BODIES:
        def run_all(lw, p_, m_, b_, x, name=name):
            def one(i):
                xr = jnp.roll(x, i, axis=0)
                return jnp.sum(jnp.abs(run_variant(lw, p_, m_, b_, name,
                                                   n_groups, r2=xr)))
            return jnp.sum(jax.lax.map(one, jnp.arange(REPEATS)))
        rj = cjit(run_all)
        warm = float(rj(logw, pw, mu, bb, r2))
        assert jnp.isfinite(warm), (name, warm)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            tot = float(rj(logw, pw, mu, bb, r2))
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        per_batch_ms = dt / REPEATS * 1e3
        rate = BATCH * REPEATS / dt / 1e6
        print(f"{name:14s} {per_batch_ms:7.2f} ms/batch  {rate:8.2f} M/s",
              flush=True)


if __name__ == "__main__":
    main()
