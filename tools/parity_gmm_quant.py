"""Quantized-training parity: our gmm_quant (EM on quantized pilots with
arcsine/Gauss-Newton covariance recovery) vs the reference's Gmm_quant, on
identical channels and identical quantized training/validation observations.

Run on CPU: python tools/parity_gmm_quant.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402

for alias in ("infty", "Inf"):
    if not hasattr(np, alias):
        setattr(np, alias, np.inf)

N_ANT = int(os.environ.get("PARITY_N_ANT", 16))
K_COMP = int(os.environ.get("PARITY_K", 8))
N_TRAIN = int(os.environ.get("PARITY_NTRAIN", 10_000))
N_VAL = int(os.environ.get("PARITY_NVAL", 2_000))
MAX_ITER = int(os.environ.get("PARITY_MAXITER", 15))
N_BITS = 2
SNR = 5.0


def _shim_sklearn():
    from sklearn.mixture import GaussianMixture
    if not hasattr(GaussianMixture, "_check_n_features"):
        GaussianMixture._check_n_features = lambda self, X, reset=True: None
    GaussianMixture._print_verbose_msg_init_end = lambda self, *a, **k: None
    GaussianMixture._print_verbose_msg_init_beg = lambda self, *a, **k: None
    GaussianMixture._print_verbose_msg_iter_end = lambda self, *a, **k: None


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from quantized_channel_estimation_tpu.models import (
        gmm, gmm_estimator, gmm_quant)
    from quantized_channel_estimation_tpu.ops import observation, pilots, scm
    from quantized_channel_estimation_tpu.ops import quantizer as Q
    from quantized_channel_estimation_tpu.utils.metrics import nmse

    _shim_sklearn()
    import modules.utils as ref_ut
    from modules.gmm_cplx_quant import Gmm_quant as RefGmmQuant

    key = jax.random.PRNGKey(77)
    h, _ = scm.generate_channels_chunked(key, N_TRAIN + N_VAL,
                                         scm.ScmConfig(N_ANT, 1))
    h_train, h_val = h[:N_TRAIN], h[N_TRAIN:]
    h_val_np = np.asarray(h_val, np.complex128)

    a = pilots.pilot_matrix(N_ANT, 1, N_BITS)
    a_np = np.asarray(a, np.complex128)
    q = Q.design_quantizer(SNR, N_BITS)
    ref_quant = ref_ut.get_quantizer([SNR], N_BITS, quantizer_type="uniform")
    sigma2 = 10 ** (-SNR / 10)

    # identical quantized training and validation observations
    r_train = observation.observe(jax.random.fold_in(key, 1), h_train, SNR,
                                  a, N_BITS, q)
    r_val = observation.observe(jax.random.fold_in(key, 2), h_val, SNR,
                                a, N_BITS, q)
    r_train_np = np.asarray(r_train, np.complex128)
    r_val_np = np.asarray(r_val, np.complex128)

    t0 = time.time()
    fit = gmm_quant.fit(jax.random.PRNGKey(3), r_train,
                        gmm.GmmConfig(n_components=K_COMP, zero_mean=True,
                                      max_iter=MAX_ITER),
                        N_BITS, sigma2, q)
    bank = gmm_estimator.prepare_bank(fit.params, SNR, a, N_BITS, q)
    ours = float(nmse(gmm_estimator.estimate(bank, r_val, "all"), h_val))
    print(f"our quant-GMM fit: {time.time() - t0:.1f}s "
          f"({int(fit.n_iter)} iters)")

    t0 = time.time()
    ref = RefGmmQuant(n_components=K_COMP, covariance_type="full",
                      max_iter=MAX_ITER)
    ref.fit(h=r_train_np, sigma2=sigma2, n_bits=N_BITS,
            quantizer=ref_quant[SNR], quant_type="uniform", zero_mean=True)
    print(f"reference quant-GMM fit: {time.time() - t0:.1f}s")
    est = ref.estimate_from_y(r_val_np, SNR, N_ANT, a_np, "all", N_BITS,
                              "uniform", ref_quant[SNR])
    refm = float(np.sum(np.abs(est - h_val_np) ** 2) / h_val_np.size)

    rel = (ours - refm) / refm
    ok = rel < 0.10  # one-sided; EM-on-recovered-covs is noisier than clean EM
    print(f"quant-gmm snr={SNR}: ours={ours:.5f} ref={refm:.5f} "
          f"rel={rel:+.2e} {'OK' if ok else 'MISMATCH'}")
    print("QUANT-GMM PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
