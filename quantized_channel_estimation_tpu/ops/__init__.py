from quantized_channel_estimation_tpu.ops import (
    bussgang, cplx, linalg, observation, pilots, quantizer, scm)
