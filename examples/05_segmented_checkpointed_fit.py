"""Crash-safe long fits: segmented EM with per-segment checkpoints.

One `fit` call is a single compiled program execution; on preemptible or
wall-time-bounded runtimes a long structured fit should instead run as
several bounded segments, checkpointing after each. If the process dies,
rerunning this script resumes AFTER the last finished segment instead of
refitting — delete CKPT_DIR to start over.

Structured (toeplitz/block-toeplitz) state resumes exactly: the inv-em
spectrum is recovered from the checkpointed covariances by the frame Gram
solve (`linalg.spectrum_from_covariance`).

No reference analog: the reference's host-side Python EM loop is
interruptible for free but never checkpoints mid-fit (its sklearn
`warm_start` plumbing is unused, `gmm_cplx_bussgang.py:491`).

    python examples/05_segmented_checkpointed_fit.py    # run, ctrl-C, rerun
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

from quantized_channel_estimation_tpu.models import em_driver, gmm, gmm_estimator
from quantized_channel_estimation_tpu.ops import observation, pilots, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.utils import metrics
from quantized_channel_estimation_tpu.utils.checkpoint import TrainCheckpointer

N_ANT, K, N_BITS, SNR = 32, 16, 2, 10.0
CKPT_DIR = "/tmp/qce_segmented_ckpt"
SEGMENTS, ITERS_PER_SEGMENT = 5, 8

key = jax.random.PRNGKey(0)
h_train, _ = scm.generate_channels(key, 20_000, scm.ScmConfig(N_ANT, 1))
h_val, _ = scm.generate_channels(jax.random.PRNGKey(1), 2_000,
                                 scm.ScmConfig(N_ANT, 1))

cfg = gmm.GmmConfig(n_components=K, cov_type="toeplitz", zero_mean=True,
                    max_iter=ITERS_PER_SEGMENT, tol=0.0)
start = lambda: gmm.fit(jax.random.PRNGKey(2), h_train, cfg)
resume = lambda prev: gmm.fit_resume(prev.params, h_train, cfg)

# restoring a checkpoint needs an example pytree of matching
# shapes/dtypes; jax.eval_shape builds one for free (no fit, no compile)
example = jax.eval_shape(start)

with TrainCheckpointer(CKPT_DIR) as ck:
    done = ck.latest_step()
    if done is not None:
        print(f"resuming after checkpointed segment {done}")
    fit = em_driver.fit_segmented(start, resume, SEGMENTS, checkpointer=ck,
                                  example_result=example)
    ck.wait()
print(f"fit complete: {int(fit.n_iter)} total EM iterations, "
      f"lower bound {float(fit.lower_bound):.3f}")

a = pilots.pilot_matrix(N_ANT, 1, N_BITS)
q = Q.design_quantizer(SNR, N_BITS)
r_val = observation.observe(jax.random.PRNGKey(3), h_val, SNR, a, N_BITS, q)
bank = gmm_estimator.prepare_bank(fit.params, SNR, a, N_BITS, q)
h_est = gmm_estimator.estimate(bank, r_val, "all")
print(f"toeplitz-GMM NMSE @ {SNR:.0f} dB, {N_BITS} bits: "
      f"{float(metrics.nmse(h_est, h_val)):.4f}")
