from quantized_channel_estimation_tpu.harness import (
    run_cov_recovery, run_gmm, run_gmm_quant, run_mfa, run_vae)
