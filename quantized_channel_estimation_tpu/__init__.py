"""TPU-native framework for channel estimation in coarsely quantized (1-4 bit ADC)
massive-MIMO systems, built on JAX/XLA/Pallas.

Capabilities (reference: benediktfesl/Quantized_Channel_Estimation):
  - 3GPP SCM channel simulation (vectorized, `ops.scm`)
  - Uniform / Lloyd-Max scalar quantizers with closed-form design (`ops.quantizer`)
  - Bussgang decomposition statistics (gain matrices, arcsine law, quantized
    output covariance) (`ops.bussgang`)
  - Classical estimators: genie/global Bussgang-LMMSE, Bussgang least squares
    (`estimators`)
  - Conditionally-Gaussian generative priors fitted by EM: complex GMM with
    full / circulant / block-circulant / Toeplitz / block-Toeplitz covariances,
    mixture of factor analyzers (MFA), and a VAE (`models`)
  - EM training directly on quantized pilots with arcsine-law covariance
    recovery (`models.gmm_quant`, `ops.cov_recovery`)
  - Per-component Bussgang-LMMSE channel estimation with responsibility
    weighting (`models.gmm` / `models.mfa` estimation paths)
  - NMSE and achievable-rate lower-bound metrics, CSV output (`utils.metrics`)
  - Multi-chip sharding over a (data, component) mesh (`parallel`)

Everything in the compute path is jittable; parameters are pure pytrees.
"""

from quantized_channel_estimation_tpu import ops, models, estimators, parallel, utils

__version__ = "0.1.0"
