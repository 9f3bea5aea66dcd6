from quantized_channel_estimation_tpu.ops import (
    boundary, bussgang, cov_recovery, cplx, gauss_newton, linalg,
    observation, pilots, quantizer, scm)
