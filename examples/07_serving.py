"""Production serving: continuous-batching estimation over GMM/MFA/VAE priors.

The reference is a batch research codebase; this framework adds a serving
layer (`serving.py`) for the deployment shape the estimators ultimately
target: many concurrent clients submitting small requests at arbitrary
SNRs. Requests coalesce into padded power-of-two microbatches per
(SNR, block-length) so XLA reuses a bounded set of compiled programs;
per-SNR prepared banks are LRU-cached; overload sheds explicitly.

Shown here: (1) flat requests against a GMM bank, (2) coherence-block
requests (n, T, M) served through block-pooled joint estimation, (3) an
MFA prior through the same service (`from_mfa`), and (4) the CSI-free VAE
service (`VaeEstimationService`).

    python examples/07_serving.py
"""
import pathlib
import sys
import threading

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

# small shapes, many distinct programs: CPU finishes in seconds where the
# remote TPU runtime would spend minutes compiling each one
jax.config.update("jax_platforms", "cpu")

import numpy as np

from quantized_channel_estimation_tpu import serving
from quantized_channel_estimation_tpu.harness import stages
from quantized_channel_estimation_tpu.models import gmm, mfa, vae
from quantized_channel_estimation_tpu.ops import scm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.ops.boundary import asnumpy

N_ANT, K, N_BITS = 16, 8, 2

key = jax.random.PRNGKey(0)
h_train, _ = stages.generate_channels(key, 20_000, scm.ScmConfig(N_ANT, 1))
fit = stages.gmm_fit(jax.random.PRNGKey(1), h_train,
                     gmm.GmmConfig(n_components=K, zero_mean=True,
                                   max_iter=40))
a = np.eye(N_ANT, dtype=np.complex64)  # 1 pilot, identity observation

# 1. GMM bank service: concurrent clients at mixed SNRs ----------------------
svc = serving.EstimationService(stages.to_numpy(fit.params), a, N_BITS,
                                max_delay_ms=2.0)
rng = np.random.default_rng(0)
req = (rng.standard_normal((32, N_ANT))
       + 1j * rng.standard_normal((32, N_ANT))).astype(np.complex64)
results = {}


def client(i, snr):
    results[i] = svc.submit(req, snr)


threads = [threading.Thread(target=client, args=(i, snr))
           for i, snr in enumerate([0.0, 0.0, 10.0, 10.0])]
for t in threads:
    t.start()
for t in threads:
    t.join()
print(f"GMM service: {len(threads)} concurrent clients served, "
      f"result shape {results[0].shape}")

# 2. coherence-block requests: (blocks, T, M) -> block-pooled joint estimate
blocks = req.reshape(8, 4, N_ANT)
out = svc.submit(blocks, 0.0)
print(f"coherent request: {blocks.shape} -> {out.shape} "
      "(T snapshots share one component posterior)")
# the service self-reports (round-4): counters, latency histogram, queue
# depth, bank-cache stats; close() DRAINS queued requests by default
m = svc.metrics()
print(f"metrics: {m['requests_completed']} requests, "
      f"{m['estimates_served']} estimates, p50 {m['latency_p50_s']*1e3:.0f} ms, "
      f"banks cached {m['banks_cached']}")
svc.close()  # drains; close(drain=False) fails queued requests fast

# 3. the same service over an MFA prior --------------------------------------
mfit = mfa.fit(jax.random.PRNGKey(2), jax.numpy.asarray(stages.to_numpy(h_train)[:8000]),
               mfa.MfaConfig(n_components=4, latent_dim=4, zero_mean=True,
                             max_iter=15))
svc_mfa = serving.EstimationService.from_mfa(mfit.params, a, N_BITS,
                                             max_delay_ms=2.0)
out = svc_mfa.submit(req, 5.0)
print(f"MFA-backed service: {out.shape}")
svc_mfa.close()

# 4. CSI-free VAE service (noisy mode; genie is rejected by construction) ----
vcfg = vae.VaeConfig(n_antennas=N_ANT, latent_dim=4, n_layers=2,
                     vae_mode="noisy", batch_size=200, epochs=2)
model, state, _ = vae.train(jax.random.PRNGKey(3), vcfg,
                            jax.numpy.asarray(stages.to_numpy(h_train)[:8000]), a,
                            [0.0, 10.0],
                            [Q.design_quantizer(s, N_BITS) for s in (0.0, 10.0)],
                            verbose=False)
svc_vae = serving.VaeEstimationService(model, state.params, vcfg, a,
                                       max_delay_ms=2.0)
out_flat = svc_vae.submit(req, 5.0)
out_blocks = svc_vae.submit(blocks, 5.0)
print(f"VAE service: flat {out_flat.shape}, blocks {out_blocks.shape} "
      "(spectra pooled per block)")
svc_vae.close()
print("done")
