"""Worker for tests/test_distributed.py: one process of a 2-process
jax.distributed CPU cluster running the data-parallel EM and comparing
against the single-process fit. Run as:

    python tests/_distributed_worker.py <port> <process_id>
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

port, pid = sys.argv[1], int(sys.argv[2])

from quantized_channel_estimation_tpu.parallel import distributed as dist

dist.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from quantized_channel_estimation_tpu.models import gmm
from quantized_channel_estimation_tpu.ops import scm
from quantized_channel_estimation_tpu.parallel import mesh as pmesh

assert jax.process_count() == 2, jax.process_count()
mesh = dist.global_mesh()
n_shards = mesh.shape[pmesh.DATA_AXIS]

# every process generates the same full dataset deterministically, then
# contributes its local slice to the global sharded array
N, D = 4000, 8
h_full, _ = scm.generate_channels(jax.random.PRNGKey(5), N,
                                  scm.ScmConfig(D, 1))
h_np = np.asarray(h_full)
sl = dist.local_batch_slice(N)
h_global = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(pmesh.DATA_AXIS)), h_np[sl], h_np.shape)

# chunk_size must equal the per-device chunking for the global-chunk-index
# PRNG alignment (see tests/test_parallel.py): 4000 / n_shards local rows
cfg = gmm.GmmConfig(n_components=4, zero_mean=True, max_iter=8,
                    init="random", chunk_size=N // n_shards // 2)
fit_dist = pmesh.fit_gmm_shard_map(mesh, jax.random.PRNGKey(6), h_global,
                                   cfg)
fit_single = gmm.fit(jax.random.PRNGKey(6), jnp.asarray(h_np), cfg)

lb_d = float(fit_dist.lower_bound)
lb_s = float(fit_single.lower_bound)
assert abs(lb_d - lb_s) <= 1e-3 * abs(lb_s), (lb_d, lb_s)
np.testing.assert_allclose(np.asarray(fit_dist.params.covariances),
                           np.asarray(fit_single.params.covariances),
                           atol=5e-3)

# tensor-parallel estimation with the COMPONENT axis spanning the two
# processes: the pmax/psum online-softmax merge rides the inter-process
# collective transport (the DCN analog of the pod case)
from quantized_channel_estimation_tpu.models import gmm_estimator
from quantized_channel_estimation_tpu.ops import observation, pilots
from quantized_channel_estimation_tpu.ops import quantizer as Q

mesh_tp = dist.global_mesh(n_component_shards=jax.device_count())
snr, n_bits = 5.0, 2
a = pilots.pilot_matrix(D, 1, n_bits)
q = Q.design_quantizer(snr, n_bits)
r_np = np.asarray(observation.observe(jax.random.PRNGKey(7),
                                      jnp.asarray(h_np[:400]), snr, a,
                                      n_bits, q))
bank = gmm_estimator.prepare_bank(fit_single.params, snr, a, n_bits, q)
k_local = 4 // jax.process_count()
bank_global = gmm_estimator.PreparedBank(*[
    jax.make_array_from_process_local_data(
        NamedSharding(mesh_tp, P(pmesh.COMPONENT_AXIS)),
        np.asarray(x)[pid * k_local:(pid + 1) * k_local], np.asarray(x).shape)
    for x in bank])
r_global = jax.make_array_from_process_local_data(
    NamedSharding(mesh_tp, P()), r_np, r_np.shape)
got = pmesh.estimate_sharded_kernel(mesh_tp, bank_global, r_global,
                                    chunk_size=200)
want = gmm_estimator.estimate(bank, jnp.asarray(r_np), "all", 200)
np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
print(f"WORKER_OK pid={pid} lb={lb_d:.4f}", flush=True)
