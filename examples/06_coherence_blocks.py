"""Coherence blocks: joint component selection over snapshots sharing a PSD.

The reference's channel model can emit multi-snapshot coherence blocks
(`SCMMulti.py:30` — n_coherence independent draws sharing one angular PSD)
but every downstream estimator there is single-snapshot. This framework
exploits the block structure: `estimate_coherent` computes the GMM component
posterior from the BLOCK likelihood (per-snapshot log-likelihoods summed
over the coherence axis before the softmax) and combines every snapshot
with the shared weights. Component identification sharpens ~T-fold in
log-space, which lowers the MSE exactly where it is hardest — low SNR.

    python examples/06_coherence_blocks.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

# small shapes, many distinct per-SNR programs: CPU finishes in seconds
# where the remote TPU runtime would spend minutes compiling each one
jax.config.update("jax_platforms", "cpu")

from quantized_channel_estimation_tpu.harness import stages
from quantized_channel_estimation_tpu.models import gmm
from quantized_channel_estimation_tpu.ops import scm
from quantized_channel_estimation_tpu.ops import quantizer as Q

N_ANT, K, N_BITS, N_COH = 16, 8, 2, 8

key = jax.random.PRNGKey(0)

# 1. fit the GMM prior on single-snapshot training channels (the prior is
#    per-snapshot; coherence only enters at estimation time)
h_train, _ = stages.generate_channels(key, 20_000, scm.ScmConfig(N_ANT, 1))
fit = stages.gmm_fit(jax.random.PRNGKey(1), h_train,
                     gmm.GmmConfig(n_components=K, zero_mean=True,
                                   max_iter=50))
print(f"EM converged: {bool(fit.converged)} after {int(fit.n_iter)} iters")

# 2. validation COHERENCE BLOCKS: (B, T, N) — T snapshots per angular PSD
h_val, _ = stages.generate_channels(
    jax.random.PRNGKey(2), 2_000,
    scm.ScmConfig(N_ANT, 1, n_coherence=N_COH))

a = stages.pilot_matrix(N_ANT, n_pilots=1, n_bits=N_BITS)
for snr_db in (-10.0, 0.0, 10.0):
    q = Q.design_quantizer(snr_db, N_BITS)
    r = stages.observe(jax.random.PRNGKey(3), h_val, snr_db, a, N_BITS, q)
    bank = stages.prepare_bank(fit.params, snr_db, a, N_BITS, q)

    # independent per-snapshot estimation (what flattening gives you)
    r_flat = stages.flatten_coherence(r)
    h_flat = stages.flatten_coherence(h_val)
    m_indep = stages.nmse(stages.estimate(bank, r_flat, "all"), h_flat)

    # joint estimation over each block
    h_joint = stages.flatten_coherence(
        stages.estimate_coherent(bank, r, "all"))
    m_joint = stages.nmse(h_joint, h_flat)

    # leave-one-out evidence blend (alpha=0 == independent, 1 == joint):
    # the hedge for model-mismatched regimes — see BASELINE.md's
    # urban-macro row and tools/coherent_temper_probe.py
    h_blend = stages.flatten_coherence(
        stages.estimate_coherent(bank, r, "all", 512, 0.5))
    m_blend = stages.nmse(h_blend, h_flat)
    print(f"SNR {snr_db:+5.1f} dB: independent {m_indep:.4f}  "
          f"joint {m_joint:.4f} ({100 * (m_joint - m_indep) / m_indep:+.1f}%)"
          f"  blend(a=0.5) {m_blend:.4f}")
