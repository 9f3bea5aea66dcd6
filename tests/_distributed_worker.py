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

# DP k-means init across the REAL transport (round-4: the psum'd Lloyd
# statistics + single-device-identical seeding replace the former
# init='random' restriction)
cfg_km = cfg._replace(init="kmeans")
fit_km_dist = pmesh.fit_gmm_shard_map(mesh, jax.random.PRNGKey(6), h_global,
                                      cfg_km)
fit_km_single = gmm.fit(jax.random.PRNGKey(6), jnp.asarray(h_np), cfg_km)
assert abs(float(fit_km_dist.lower_bound) - float(fit_km_single.lower_bound)) \
    <= 1e-3 * abs(float(fit_km_single.lower_bound))
np.testing.assert_allclose(np.asarray(fit_km_dist.params.covariances),
                           np.asarray(fit_km_single.params.covariances),
                           atol=5e-3)

# TP COHERENT estimation (rank-3 blocks) incl. the alpha evidence blend —
# previously virtual-mesh-only (round-3 weak #5); the per-block pmax/psum
# state merge now rides the real inter-process collective
rb_np = r_np[:384].reshape(96, 4, -1)
rb_global = jax.make_array_from_process_local_data(
    NamedSharding(mesh_tp, P()), rb_np, rb_np.shape)
for alpha in (1.0, 0.25):
    got_c = pmesh.estimate_sharded_kernel(mesh_tp, bank_global, rb_global,
                                          chunk_size=96,
                                          coherence_alpha=alpha)
    want_c = gmm_estimator.estimate_coherent(bank, jnp.asarray(rb_np),
                                             "all", 96, alpha)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               atol=1e-5)

# TP STRUCTURED (FFT-domain) estimation across the real transport: the
# O(K D) circulant-bank shards merge with the same pmax/psum recurrence
# (round-4; XLA stats path on CPU workers)
from quantized_channel_estimation_tpu.models import structured_bank as sbm

cfit = gmm.fit(jax.random.PRNGKey(12), jnp.asarray(h_np),
               gmm.GmmConfig(n_components=4, cov_type="circulant",
                             max_iter=8, chunk_size=N))
cbank = sbm.prepare_bank_circulant(cfit.params, snr, 1.0 + 0.0j, n_bits, q)
cbank_global = sbm.CirculantBank(*[
    jax.make_array_from_process_local_data(
        NamedSharding(mesh_tp, P(pmesh.COMPONENT_AXIS)),
        np.asarray(x)[pid * 2:(pid + 1) * 2], np.asarray(x).shape)
    for x in cbank])
got_s = pmesh.estimate_sharded_circulant(mesh_tp, cbank_global, r_global,
                                         chunk_size=200)
want_s = sbm.estimate_circulant(cbank, jnp.asarray(r_np), "all", 16384,
                                None, "fft")
np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), atol=1e-5)
got_sc = pmesh.estimate_sharded_circulant(
    mesh_tp, cbank_global, rb_global, chunk_size=96, coherence_alpha=0.25)
want_sc = sbm.estimate_circulant_coherent(cbank, jnp.asarray(rb_np), "all",
                                          4096, 0.25, None, "fft")
np.testing.assert_allclose(np.asarray(got_sc), np.asarray(want_sc),
                           atol=1e-5)

# DP MFA across real transport (shares the GMM-shaped psum'd statistics)
from quantized_channel_estimation_tpu.models import mfa

mcfg = mfa.MfaConfig(n_components=2, latent_dim=2, zero_mean=True,
                     max_iter=6, tol=0.0, chunk_size=N // n_shards)
mfa_dist = pmesh.fit_mfa_shard_map(mesh, jax.random.PRNGKey(8), h_global,
                                   mcfg)
mfa_single = mfa.fit(jax.random.PRNGKey(8), jnp.asarray(h_np),
                     mcfg._replace(axis_name=None))
np.testing.assert_allclose(float(mfa_dist.log_likelihood),
                           float(mfa_single.log_likelihood), rtol=1e-3)
np.testing.assert_allclose(np.asarray(mfa_dist.params.psis),
                           np.asarray(mfa_single.params.psis), rtol=2e-2)

# TP FACTORED (low-rank+diagonal) MFA estimation across the real
# transport: O(K D M) Woodbury-bank shards merge with the same pmax/psum
# recurrence (round-4 follow-on; flat + coherent alpha)
from quantized_channel_estimation_tpu.models import mfa_bank as mbm

fbank = mbm.prepare_bank_factored(mfa_single.params, snr, 1.0 + 0.0j,
                                  n_bits, q)
k_f = 2 // jax.process_count()
fbank_global = mbm.FactoredBank(*[
    jax.make_array_from_process_local_data(
        NamedSharding(mesh_tp, P(pmesh.COMPONENT_AXIS)),
        np.asarray(x)[pid * k_f:(pid + 1) * k_f], np.asarray(x).shape)
    for x in fbank])
got_f = pmesh.estimate_sharded_factored(mesh_tp, fbank_global, r_global,
                                        chunk_size=200)
want_f = mbm.estimate_factored(fbank, jnp.asarray(r_np), "all")
np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                           atol=1e-5)
got_fc = pmesh.estimate_sharded_factored(
    mesh_tp, fbank_global, rb_global, chunk_size=96, coherence_alpha=0.25)
want_fc = mbm.estimate_factored_coherent(fbank, jnp.asarray(rb_np), "all",
                                         1024, 0.25)
np.testing.assert_allclose(np.asarray(got_fc), np.asarray(want_fc),
                           atol=1e-5)

# DP quantized-EM across real transport (recovery statistics psum like the
# moments); k-means init on the quantized stream exercises the DP k-means
# on a second data distribution
from quantized_channel_estimation_tpu.models import gmm_quant

sigma2 = 10 ** (-snr / 10)
r_train_np = np.asarray(observation.observe(jax.random.PRNGKey(9),
                                            jnp.asarray(h_np), snr, a,
                                            n_bits, q))
rq_global = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(pmesh.DATA_AXIS)), r_train_np[sl],
    r_train_np.shape)
qcfg = gmm.GmmConfig(n_components=2, zero_mean=True, max_iter=4, tol=0.0,
                     chunk_size=N // n_shards)
q_dist = pmesh.fit_gmm_quant_shard_map(mesh, jax.random.PRNGKey(10),
                                       rq_global, qcfg, n_bits, sigma2, q)
q_single = gmm_quant.fit(jax.random.PRNGKey(10), jnp.asarray(r_train_np),
                         qcfg, n_bits, sigma2, q)
np.testing.assert_allclose(float(q_dist.lower_bound),
                           float(q_single.lower_bound), rtol=1e-3)
np.testing.assert_allclose(np.asarray(q_dist.params.covariances),
                           np.asarray(q_single.params.covariances),
                           atol=5e-3)

# DP VAE training across real transport: per-step pmean'd gradients; the
# loss must be finite and improve (exactness vs single device is the
# virtual-mesh test's job — this validates the TRANSPORT)
from quantized_channel_estimation_tpu.models import vae

vcfg = vae.VaeConfig(n_antennas=D, latent_dim=2, n_layers=2,
                     vae_mode="genie", batch_size=64, lr=2e-3)
model, state = vae.init_vae(jax.random.PRNGKey(30), vcfg)
_, losses = pmesh.vae_run_epochs_shard_map(
    mesh, model, vcfg, None, jnp.asarray([5.0]),
    [Q.design_quantizer(5.0, vcfg.n_bits)], state, h_global,
    jax.random.PRNGKey(31), n_steps=6, n_epochs=3)
losses = np.asarray(losses)
assert np.all(np.isfinite(losses)) and losses[-1] < losses[0], losses

print(f"WORKER_OK pid={pid} lb={lb_d:.4f}", flush=True)
