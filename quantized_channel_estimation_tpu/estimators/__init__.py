from quantized_channel_estimation_tpu.estimators import blmmse, ls
