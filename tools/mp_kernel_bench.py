"""On-chip benchmark of the MULTI-PILOT structured path (round-5): the
per-bin P x P XLA pipeline, the fused MP kernels (flat + coherent), and
the dense baselines on the same observations.

Round-5 measured (v5e, device-resident, medians of 5 amortized roll-loop
programs; results/parity_r5/multipilot*_onchip.log), D=64/K=64/P=2/2-bit:

  MP fused kernel (flat):   21.84 M est/s   <- fastest multi-pilot route
  MP XLA pipeline:          17.41 M
  dense fused kernel:        7.01 M  (M = P*D = 128-wide blocks)
  dense einsum:              2.01 M
  MP coherent kernel (T=4): 21.54 M  vs 14.69 M XLA coherent MP (+47%)

Cross-rel vs the dense path 1.5e-6 (XLA) / 2.6e-5 (kernel, accumulation
class); coherent kernel <= 9e-5 at alpha in {1.0, 0.25}.

Usage: python tools/mp_kernel_bench.py [flat|coherent ...]
Dims via MP_D / MP_K / MP_P / MP_T env vars.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from quantized_channel_estimation_tpu.estimators import pallas_kernels as pk
from quantized_channel_estimation_tpu.models import gmm_estimator
from quantized_channel_estimation_tpu.models import structured_bank as sb
from quantized_channel_estimation_tpu.models.gmm import GmmParams
from quantized_channel_estimation_tpu.ops import linalg, observation, pilots
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.ops.boundary import cjit
from quantized_channel_estimation_tpu.ops.cplx import crandn

D = int(os.environ.get("MP_D", 64))
K = int(os.environ.get("MP_K", 64))
P = int(os.environ.get("MP_P", 2))
T = int(os.environ.get("MP_T", 4))
NB, SNR, REPEATS = 2, 10.0, 10
BATCH = int(os.environ.get("MP_BATCH", 65536))
MODES = sys.argv[1:] or ["flat", "coherent"]


def make_params(key):
    s = jax.random.uniform(key, (K, D), minval=0.05, maxval=2.0)
    s = s * (D / jnp.sum(s, axis=-1, keepdims=True))
    f = linalg.unitary_dft(D)
    covs = jnp.einsum("fd,kf,fe->kde", jnp.conj(f), s.astype(jnp.complex64),
                      f)
    covs = linalg.hermitize(covs) + 1e-6 * jnp.eye(D, dtype=jnp.complex64)
    prec = linalg.robust_precision_cholesky(covs)
    return GmmParams(jnp.ones((K,), jnp.float32) / K,
                     jnp.zeros((K, D), jnp.complex64), covs, prec), s


(params, spectra) = cjit(make_params)(jax.random.PRNGKey(0))
a = cjit(pilots.pilot_matrix, static_argnums=(0, 1, 2, 3))(
    D, P, NB, "angle_amp")
q = Q.design_quantizer(SNR, NB)
bank = cjit(lambda p_, s_, snr, nb, qq, aa: sb.prepare_bank_circulant(
    p_, snr, aa, nb, qq, spectra=s_), static_argnums=(3,))(
        params, spectra, SNR, NB, q, a)


def gen_obs(key, aa):
    h = crandn(key, (BATCH, D))
    return observation.observe(jax.random.fold_in(key, 1), h, SNR, aa, NB, q)


r = cjit(gen_obs)(jax.random.PRNGKey(1), a)


def bench(est, bank_arg, x):
    """est: PLAIN function (complex bank, complex obs) -> complex out;
    wrapped in exactly one cjit here (nesting cjit wrappers, or closing
    over Packed values inside a trace, leaks Packed leaves into jnp ops —
    the round-5 probe bug class)."""
    def run_all(b_, xx):
        def one(i):
            xr = jax.tree_util.tree_map(lambda v: jnp.roll(v, i, axis=0), xx)
            return jnp.sum(jnp.abs(est(b_, xr)))
        return jnp.sum(jax.lax.map(one, jnp.arange(REPEATS)))
    run_j = cjit(run_all)
    assert float(run_j(bank_arg, x)) > 0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        assert float(run_j(bank_arg, x)) > 0
        ts.append(time.perf_counter() - t0)
    return BATCH * REPEATS / sorted(ts)[2]


def cross(f1, b1, f2, b2, x):
    j1 = cjit(f1)
    j2 = cjit(f2)
    h1 = j1(b1, x)
    h2 = j2(b2, x)
    num = float(np.asarray(cjit(
        lambda u, v: jnp.sum(jnp.abs(u - v) ** 2))(h1, h2)))
    den = float(np.asarray(cjit(lambda v: jnp.sum(jnp.abs(v) ** 2))(h2)))
    return num / den


if "flat" in MODES:
    bank_d = cjit(gmm_estimator.prepare_bank, static_argnums=(3,))(
        params, SNR, a, NB, q)
    ck = lambda b_, x: pk.estimate_fused_circulant_mp(b_, x)
    cx = lambda b_, x: sb.estimate_circulant(b_, x, "all", 4096, None,
                                             "xla")
    dd = lambda b_, x: gmm_estimator.estimate(b_, x, "all", 4096)
    print(f"flat cross kernel-vs-dense: "
          f"{cross(ck, bank, dd, bank_d, r):.2e}")
    for name, est, b_ in (("MP fused kernel", ck, bank),
                          ("MP XLA pipeline", cx, bank),
                          ("dense einsum   ", dd, bank_d)):
        print(f"{name}: {bench(est, b_, r) / 1e6:6.2f} M est/s")

if "coherent" in MODES:
    b_blk = BATCH // T
    rb = cjit(lambda x, b, t: x[: b * t].reshape(b, t, -1),
              static_argnums=(1, 2))(r, b_blk, T)
    for alpha in (1.0, 0.25):
        ck_a = (lambda al: lambda b_, x:
                pk.estimate_fused_circulant_mp_coherent(b_, x, alpha=al))(
                    alpha)
        cx_a = (lambda al: lambda b_, x: sb.estimate_circulant_mp_coherent(
            b_, x, "all", 512, al, None, "xla"))(alpha)
        print(f"coh alpha={alpha} cross kernel-vs-xla: "
              f"{cross(ck_a, bank, cx_a, bank, rb):.2e}")
    for name, est in (("MP coh kernel", lambda b_, x: pk.
                       estimate_fused_circulant_mp_coherent(b_, x)),
                      ("MP coh XLA   ", lambda b_, x: sb.
                       estimate_circulant_mp_coherent(b_, x, "all", 512,
                                                      1.0, None, "xla"))):
        print(f"{name}: {bench(est, bank, rb) / 1e6:6.2f} M est/s")
