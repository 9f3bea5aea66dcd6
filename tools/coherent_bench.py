"""Full-scale coherence-block estimation evidence (real chip or CPU).

Standard dimensions (D=64, K=64, 2-bit), validation data generated as
coherence blocks (T snapshots sharing one angular PSD — the structure the
reference's `SCMMulti.py:30` can emit but never exploits). Compares
independent per-snapshot estimation (`gmm_estimator.estimate`) against
block-pooled joint estimation (`estimate_coherent`) at several SNRs, plus
the genie anchor, and times both paths.

Usage: python tools/coherent_bench.py [T] [n_blocks]
"""
import os
import sys
import time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

from quantized_channel_estimation_tpu.harness import stages
from quantized_channel_estimation_tpu.models import gmm
from quantized_channel_estimation_tpu.ops import scm
from quantized_channel_estimation_tpu.ops import quantizer as Q

T = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N_BLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
D, K, NB, N_TRAIN = 64, 64, 2, 100_000

t0 = time.time()
h_train, _ = stages.generate_channels(jax.random.PRNGKey(0), N_TRAIN,
                                      scm.ScmConfig(D, 1))
h_val, t_val = stages.generate_channels(jax.random.PRNGKey(1), N_BLOCKS,
                                        scm.ScmConfig(D, 1, n_coherence=T))
print(f"datagen {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
fit = stages.gmm_fit(jax.random.PRNGKey(2), h_train,
                     gmm.GmmConfig(n_components=K, zero_mean=True,
                                   max_iter=100, chunk_size=4096))
print(f"fit {time.time()-t0:.1f}s ({int(fit.n_iter)} iters)", flush=True)

a = stages.pilot_matrix(D, 1, NB)
h_flat, t_flat = stages.flatten_coherence(h_val, t_val)

for snr in (-10.0, 0.0, 10.0):
    q = Q.design_quantizer(snr, NB)
    r = stages.observe(jax.random.PRNGKey(3), h_val, snr, a, NB, q)
    bank = stages.prepare_bank(fit.params, snr, a, NB, q)
    r_flat = stages.flatten_coherence(r)

    t0 = time.time()
    m_indep = stages.nmse(stages.estimate(bank, r_flat, "all"), h_flat)
    t_indep = time.time() - t0
    t0 = time.time()
    m_joint = stages.nmse(
        stages.flatten_coherence(stages.estimate_coherent(bank, r, "all")),
        h_flat)
    t_joint = time.time() - t0
    m_genie = stages.chunked_genie_nmse(r_flat, t_flat, h_flat, snr, a, NB, q)
    print(f"snr={snr:+6.1f}  genie={m_genie:.5f}  indep={m_indep:.5f} "
          f"({t_indep:.1f}s)  joint={m_joint:.5f} ({t_joint:.1f}s)  "
          f"delta={100*(m_joint-m_indep)/m_indep:+.1f}%", flush=True)
