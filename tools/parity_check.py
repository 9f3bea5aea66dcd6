"""Numerical parity check: run the reference implementation and this
framework on IDENTICAL channels and IDENTICAL quantized observations and
compare per-SNR MSE.

Classical estimators (global/genie BLMMSE, LS) are deterministic given the
data, so they must agree to float tolerance. The GMM differs by EM
initialization; converged MSE must agree within a few percent (SURVEY §7:
parity on converged metrics, not parameters).

Run on CPU: python tools/parity_check.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402

if not hasattr(np, "infty"):
    np.infty = np.inf

N_ANT = int(os.environ.get("PARITY_N_ANT", 32))
K_COMP = int(os.environ.get("PARITY_K", 16))
N_TRAIN = int(os.environ.get("PARITY_NTRAIN", 20_000))
N_VAL = int(os.environ.get("PARITY_NVAL", 2_000))
MAX_ITER = int(os.environ.get("PARITY_MAXITER", 100))
N_BITS = 2
SNRS = [float(s) for s in
        os.environ.get("PARITY_SNRS", "-10,0,10").split(",")]


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
    import jax.numpy as jnp
    from quantized_channel_estimation_tpu.estimators import blmmse, ls
    from quantized_channel_estimation_tpu.models import gmm, gmm_estimator
    from quantized_channel_estimation_tpu.ops import observation, pilots, scm
    from quantized_channel_estimation_tpu.ops import quantizer as Q
    from quantized_channel_estimation_tpu.utils.metrics import nmse

    _shim_sklearn()
    import modules.utils as ref_ut
    from estimators.blmmse import BLMMSE as RefBLMMSE
    from estimators.LS import LS as RefLS
    from modules.gmm_cplx_bussgang import Gmm_nbit as RefGmm

    key = jax.random.PRNGKey(123)
    h, t = scm.generate_channels_chunked(key, N_TRAIN + N_VAL,
                                         scm.ScmConfig(N_ANT, 1))
    h_np, t_np = np.asarray(h, np.complex128), np.asarray(t, np.complex128)
    h_train, h_val = h[:N_TRAIN], h[N_TRAIN:]
    t_val = t[N_TRAIN:]
    cov = jnp.einsum("nd,ne->de", h_train, jnp.conj(h_train)) / N_TRAIN
    cov_np = np.asarray(cov, np.complex128)

    a = pilots.pilot_matrix(N_ANT, 1, N_BITS)
    a_np = np.asarray(a, np.complex128)
    ref_a = ref_ut.get_pilot_matrix(N_ANT, 1, N_BITS, pilot_type="angle_amp")
    print(f"pilot matrix max diff: {np.abs(a_np - ref_a).max():.2e}")

    ref_quant = ref_ut.get_quantizer(SNRS, N_BITS, quantizer_type="uniform")

    report = []

    def compare(name, snr, ours, refs, tol, one_sided=False):
        rel = (ours - refs) / max(abs(refs), 1e-12)
        # one_sided: lower MSE than the reference always passes (the target is
        # "matched within the paper's deltas OR better", BASELINE.md)
        ok = rel < tol if one_sided else abs(rel) < tol
        report.append((name, snr, ours, refs, rel, ok))
        print(f"{name:14s} snr={snr:6.1f}  ours={ours:.6f} ref={refs:.6f} "
              f"rel={rel:+.2e} {'OK' if ok else 'MISMATCH'}")
        return ok

    # quantizer bit-exactness
    for snr in SNRS:
        q = Q.design_quantizer(snr, N_BITS)
        np.testing.assert_allclose(np.asarray(q.thresholds, np.float64),
                                   ref_quant[snr][0], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(q.labels, np.float64),
                                   ref_quant[snr][1], rtol=1e-6)
    print("quantizer thresholds/labels match the reference (rtol 1e-6)")

    all_ok = True
    # identical observations for both sides
    r_by_snr = {}
    for i, snr in enumerate(SNRS):
        q = Q.design_quantizer(snr, N_BITS)
        r = observation.observe(jax.random.fold_in(key, i), h_val, snr, a,
                                N_BITS, q)
        r_by_snr[snr] = r

    for snr in SNRS:
        r = r_by_snr[snr]
        r_np = np.asarray(r, np.complex128)
        q = Q.design_quantizer(snr, N_BITS)
        h_val_np = np.asarray(h_val, np.complex128)

        ours = float(nmse(blmmse.estimate_global(r, cov, snr, a, N_BITS, q),
                          h_val))
        ref = RefBLMMSE(snr).estimate_global(r_np, cov_np, a_np, N_BITS,
                                             "uniform", ref_quant[snr])
        refm = np.sum(np.abs(ref - h_val_np) ** 2) / h_val_np.size
        all_ok &= compare("blmmse_glob", snr, ours, refm, 2e-2)

        ours = float(nmse(ls.estimate_global(r, cov, snr, a, N_BITS, q),
                          h_val))
        ref = RefLS(snr).estimate_global(r_np, cov_np, a_np, N_BITS,
                                         "uniform", ref_quant[snr])
        refm = np.sum(np.abs(ref - h_val_np) ** 2) / h_val_np.size
        all_ok &= compare("LS_glob", snr, ours, refm, 2e-2)

        ours = float(nmse(blmmse.estimate_genie(r, t_val, snr, a, N_BITS, q),
                          h_val))
        ref = RefBLMMSE(snr).estimate_genie(
            r_np, np.asarray(t_val, np.complex128), a_np, N_BITS, "uniform",
            ref_quant[snr])
        refm = np.sum(np.abs(ref - h_val_np) ** 2) / h_val_np.size
        all_ok &= compare("blmmse_genie", snr, ours, refm, 2e-2)

    # GMM: same training data, independent inits; converged MSE within 5%
    t0 = time.time()
    fit = gmm.fit(jax.random.PRNGKey(7), h_train,
                  gmm.GmmConfig(n_components=K_COMP, zero_mean=True,
                                max_iter=MAX_ITER,
                                n_init=int(os.environ.get("PARITY_NINIT", 1))))
    print(f"our GMM fit: {time.time() - t0:.1f}s ({int(fit.n_iter)} iters)")
    t0 = time.time()
    ref_gmm = RefGmm(n_components=K_COMP, covariance_type="full",
                     max_iter=MAX_ITER)
    ref_gmm.fit(h=h_np[:N_TRAIN], zero_mean=True)
    print(f"reference GMM fit: {time.time() - t0:.1f}s")
    # compare achieved objective (mean per-sample log-likelihood) on the SAME
    # training data: separates optimization quality from estimation parity
    print(f"lower bound: ours={float(fit.lower_bound):.4f} "
          f"ref={float(ref_gmm.gm.lower_bound_):.4f}")

    for snr in SNRS:
        r = r_by_snr[snr]
        q = Q.design_quantizer(snr, N_BITS)
        bank = gmm_estimator.prepare_bank(fit.params, snr, a, N_BITS, q)
        ours = float(nmse(gmm_estimator.estimate(bank, r, "all"), h_val))
        from copy import deepcopy
        g = deepcopy(ref_gmm)
        ref = g.estimate_from_y(np.asarray(r, np.complex128), snr, N_ANT,
                                a_np, "all", N_BITS, "uniform",
                                ref_quant[snr])
        h_val_np = np.asarray(h_val, np.complex128)
        refm = np.sum(np.abs(ref - h_val_np) ** 2) / h_val_np.size
        all_ok &= compare("blmmse_gmm", snr, ours, refm, 5e-2, one_sided=True)

    print("\nPARITY:", "PASS" if all_ok else "FAIL")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
