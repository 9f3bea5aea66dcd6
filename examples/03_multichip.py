"""Multi-chip: data-parallel EM and tensor-parallel estimation on a mesh.

The reference's only parallelism is a multiprocessing pool over SNR points;
here samples shard over the 'data' mesh axis (EM sufficient statistics are
psum'd — the EM analog of gradient all-reduce) and the component bank
shards over 'component' (each device applies its own LMMSE filters; the
online-softmax states merge with pmax + psum).

This script runs anywhere by simulating an 8-device mesh on CPU — the
standard JAX fake-cluster technique. On a real pod slice, drop the
simulation lines and build the mesh from `jax.devices()`.

    python examples/03_multichip.py
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")  # simulation; remove on a pod

from quantized_channel_estimation_tpu.models import gmm, gmm_estimator
from quantized_channel_estimation_tpu.ops import observation, pilots, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.parallel import mesh as pmesh
from quantized_channel_estimation_tpu.utils import metrics

N_ANT, K, N_BITS, SNR = 16, 8, 2, 10.0

print(f"devices: {len(jax.devices())}")
key = jax.random.PRNGKey(0)
h_train, _ = scm.generate_channels(key, 16_000, scm.ScmConfig(N_ANT, 1))
h_val, _ = scm.generate_channels(jax.random.PRNGKey(1), 1_600,
                                 scm.ScmConfig(N_ANT, 1))

# ---- data-parallel EM: 8-way 'data' mesh, explicit psum'd statistics ----
m_dp = pmesh.make_mesh(n_data=8, n_component=1)
cfg = gmm.GmmConfig(n_components=K, zero_mean=True, max_iter=30,
                    init="random", chunk_size=1000)
fit = pmesh.fit_gmm_shard_map(m_dp, jax.random.PRNGKey(2), h_train, cfg)
print(f"data-parallel EM: {int(fit.n_iter)} iters, "
      f"lower bound {float(fit.lower_bound):.3f}")

# ---- tensor-parallel estimation: (data=2, component=4) mesh ----
a = pilots.pilot_matrix(N_ANT, 1, N_BITS)
q = Q.design_quantizer(SNR, N_BITS)
r = observation.observe(jax.random.PRNGKey(3), h_val, SNR, a, N_BITS, q)
bank = gmm_estimator.prepare_bank(fit.params, SNR, a, N_BITS, q)

m_tp = pmesh.make_mesh(n_data=2, n_component=4)
h_est = pmesh.estimate_sharded_kernel(m_tp, bank, r)
print(f"tensor-parallel NMSE @ {SNR:.0f} dB: "
      f"{float(metrics.nmse(h_est, h_val)):.4f}")

# exactness: the sharded paths match the single-device estimate
h_ref = gmm_estimator.estimate(bank, r, "all")
import jax.numpy as jnp
print("max |sharded - single| =",
      float(jnp.max(jnp.abs(h_est - h_ref))))
