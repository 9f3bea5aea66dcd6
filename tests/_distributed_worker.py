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
print(f"WORKER_OK pid={pid} lb={lb_d:.4f}", flush=True)
