"""On-chip benchmark of the fused structured (circulant) kernels vs the
XLA structured pipeline — flat, coherent, and the TP stats route.

Round-4 measured (v5e, device-resident, medians of 5 amortized programs;
results/parity_r4/circ_kernel_onchip.log):

  flat D=64/K=64:    fused 21.2 M est/s vs XLA 18.3 M (+16%)  <- record
  coherent T=4:      fused 19.7 M vs XLA 17.3 M (+14%; dense coherent
                     kernel record was 13.3 M)
  TP route (1-dev):  14.5 M through the stats kernel + pmax/psum merge
                     (the merged-state HBM round trip costs ~26%)

Quality: 0.3-0.4% elementwise vs XLA on a real fit — softmax-amplified
f32 accumulation-order noise, NMSE-vs-truth equal/marginally better.

Usage: python tools/circ_kernel_bench.py [flat|coherent|tp ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from quantized_channel_estimation_tpu.estimators import pallas_kernels as pk
from quantized_channel_estimation_tpu.models import structured_bank as sb
from quantized_channel_estimation_tpu.models.structured_bank import (
    CirculantBank)
from quantized_channel_estimation_tpu.ops.boundary import Packed, cjit

D, K = 64, 64


def synthetic_bank(d=D, k=K, seed=0):
    rng = np.random.default_rng(seed)
    return CirculantBank(
        log_weights=np.log(rng.dirichlet(np.ones(k))).astype(np.float32),
        mean_rf=np.zeros((k, d), np.complex64),
        spec_cr=rng.uniform(0.5, 2.0, (k, d)).astype(np.float32),
        filt_f=((rng.standard_normal((k, d))
                 + 1j * rng.standard_normal((k, d))) * 0.1
                ).astype(np.complex64),
        bias_f=np.zeros((k, d), np.complex64))


def packed_randn(shape, seed=0):
    rng = np.random.default_rng(seed)
    return Packed(jnp.asarray(rng.standard_normal(shape).astype(np.float32)),
                  jnp.asarray(rng.standard_normal(shape).astype(np.float32)))


def bench(label, fn, bank, r, n_est):
    def run(b, x):
        def one(i):
            xr = jax.tree_util.tree_map(lambda v: jnp.roll(v, i, axis=0), x)
            return jnp.sum(jnp.abs(fn(b, xr)))
        return jnp.sum(jax.lax.map(one, jnp.arange(5)))
    rj = cjit(run)
    float(rj(bank, r))
    ts = []
    for _ in range(5):
        s = time.perf_counter()
        float(rj(bank, r))
        ts.append(time.perf_counter() - s)
    dt = sorted(ts)[2]
    print(f"  {label:34s} {n_est*5/dt/1e6:7.3f} M est/s", flush=True)


def leg_flat():
    print("== flat D=64/K=64 ==", flush=True)
    bank, r = synthetic_bank(), packed_randn((131072, D))
    bench("fused circ kernel", lambda b, x: pk.estimate_fused_circulant(
        b, x, tile_n=2048), bank, r, 131072)
    bench("xla structured (fft)",
          lambda b, x: sb.estimate_circulant(b, x, "all", 16384, None,
                                             "fft"), bank, r, 131072)


def leg_coherent():
    print("== coherent T=4 ==", flush=True)
    bank, r = synthetic_bank(), packed_randn((32768, 4, D))
    for alpha in (1.0, 0.25):
        bench(f"fused coherent kernel alpha={alpha}",
              lambda b, x, a=alpha: pk.estimate_fused_circulant_coherent(
                  b, x, alpha=a), bank, r, 131072)
        bench(f"xla coherent (fft) alpha={alpha}",
              lambda b, x, a=alpha: sb.estimate_circulant_coherent(
                  b, x, "all", 4096, a, None, "fft"), bank, r, 131072)


def leg_tp():
    from quantized_channel_estimation_tpu.parallel import mesh as pm
    print("== TP route (1-device mesh) ==", flush=True)
    bank, r = synthetic_bank(), packed_randn((131072, D))
    mesh = pm.make_mesh(1, 1)
    bench("TP kernel-stats + merge",
          lambda b, x: pm.estimate_sharded_circulant(mesh, b, x),
          bank, r, 131072)


def leg_d512():
    """Mid-range: D=512/K=16 — the kernel's resident constants (8.4 MB)
    still fit the 13 MiB gate; D>=~640 falls back to the XLA pipeline."""
    print("== flat D=512/K=16 ==", flush=True)
    d, k = 512, 16
    bank, r = synthetic_bank(d, k), packed_randn((32768, d))
    bench("fused circ kernel", lambda b, x: pk.estimate_fused_circulant(
        b, x), bank, r, 32768)
    bench("xla structured (fft)",
          lambda b, x: sb.estimate_circulant(b, x, "all", 16384, None,
                                             "fft"), bank, r, 32768)


if __name__ == "__main__":
    legs = sys.argv[1:] or ["flat", "coherent", "tp", "d512"]
    for leg in legs:
        {"flat": leg_flat, "coherent": leg_coherent, "tp": leg_tp,
         "d512": leg_d512}[leg]()
