from quantized_channel_estimation_tpu.models import (
    gmm, gmm_estimator, gmm_quant, kmeans, mfa, structured_bank, vae)
