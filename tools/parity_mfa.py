"""MFA parity check: our MFA vs the reference's Mofa on identical channels
and identical quantized observations (converged-metric comparison, like
tools/parity_check.py for the GMM).

Run on CPU: python tools/parity_mfa.py
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

N_ANT = int(os.environ.get("PARITY_N_ANT", 32))
K_COMP = int(os.environ.get("PARITY_K", 16))
LATENT = int(os.environ.get("PARITY_LATENT", 8))
N_TRAIN = int(os.environ.get("PARITY_NTRAIN", 20_000))
N_VAL = int(os.environ.get("PARITY_NVAL", 2_000))
MAX_ITER = int(os.environ.get("PARITY_MAXITER", 60))
N_BITS = 2
SNRS = [0.0, 10.0]


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from quantized_channel_estimation_tpu.models import gmm_estimator, mfa
    from quantized_channel_estimation_tpu.ops import observation, pilots, scm
    from quantized_channel_estimation_tpu.ops import quantizer as Q
    from quantized_channel_estimation_tpu.utils.metrics import nmse

    import modules.utils as ref_ut
    from modules.mofa_cplx_bussgang import Mofa as RefMofa

    key = jax.random.PRNGKey(321)
    h, _ = scm.generate_channels_chunked(key, N_TRAIN + N_VAL,
                                         scm.ScmConfig(N_ANT, 3))
    h_np = np.asarray(h, np.complex128)
    h_train, h_val = h[:N_TRAIN], h[N_TRAIN:]
    h_val_np = np.asarray(h_val, np.complex128)

    a = pilots.pilot_matrix(N_ANT, 1, N_BITS)
    a_np = np.asarray(a, np.complex128)
    ref_quant = ref_ut.get_quantizer(SNRS, N_BITS, quantizer_type="uniform")

    t0 = time.time()
    res = mfa.fit(jax.random.PRNGKey(1), h_train,
                  mfa.MfaConfig(n_components=K_COMP, latent_dim=LATENT,
                                ppca=True, zero_mean=True, rs_clip=1e-3,
                                max_iter=MAX_ITER))
    params = mfa.to_gmm_params(res.params, reg=1e-6)
    print(f"our MFA fit: {time.time() - t0:.1f}s ({int(res.n_iter)} iters, "
          f"ll={float(res.log_likelihood):.1f})")

    t0 = time.time()
    ref = RefMofa(n_components=K_COMP, latent_dim=LATENT, PPCA=True,
                  lock_psis=False, rs_clip=1e-3, maxiter=MAX_ITER,
                  verbose=False)
    ref.fit(h_np[:N_TRAIN], True)  # zero_mean=True as in Bussgang_MFA.py
    print(f"reference MFA fit: {time.time() - t0:.1f}s")

    all_ok = True
    for snr in SNRS:
        q = Q.design_quantizer(snr, N_BITS)
        r = observation.observe(jax.random.fold_in(key, int(snr)), h_val,
                                snr, a, N_BITS, q)
        r_np = np.asarray(r, np.complex128)

        bank = gmm_estimator.prepare_bank(params, snr, a, N_BITS, q)
        ours = float(nmse(gmm_estimator.estimate(bank, r, "all"), h_val))

        from copy import deepcopy
        g = deepcopy(ref)
        est = g.estimate_from_y(r_np, snr, a_np, "all", N_BITS, "uniform",
                                ref_quant[snr])
        refm = float(np.sum(np.abs(est - h_val_np) ** 2) / h_val_np.size)
        rel = (ours - refm) / refm
        ok = rel < 0.05  # one-sided: better always passes
        all_ok &= ok
        print(f"mfa snr={snr:5.1f}: ours={ours:.5f} ref={refm:.5f} "
              f"rel={rel:+.2e} {'OK' if ok else 'MISMATCH'}")
    print("MFA PARITY:", "PASS" if all_ok else "FAIL")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
