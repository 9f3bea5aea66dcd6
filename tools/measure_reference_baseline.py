"""Measure the reference implementation's CPU throughput for the headline
benchmark config (N=64 antennas, K=64 components, 2-bit uniform, 'all'
weighting). Runs the *reference code* at /root/reference unmodified; the
resulting estimates/sec is recorded in bench.py as the baseline.

Run with the reference on sys.path:
    python tools/measure_reference_baseline.py
"""
import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402

# the reference targets numpy 1.21; restore the alias numpy 2 removed
if not hasattr(np, "infty"):
    np.infty = np.inf


def _shim_sklearn():
    """The reference targets sklearn 1.0.x; newer sklearn removed the private
    hooks it calls. Provide no-op shims so the math paths run unmodified."""
    from sklearn.mixture import GaussianMixture
    if not hasattr(GaussianMixture, "_check_n_features"):
        GaussianMixture._check_n_features = lambda self, X, reset=True: None
    # sklearn >=1.4 changed the private verbose-print signatures
    GaussianMixture._print_verbose_msg_init_end = lambda self, *a, **k: None
    GaussianMixture._print_verbose_msg_init_beg = lambda self, *a, **k: None
    GaussianMixture._print_verbose_msg_iter_end = lambda self, *a, **k: None


def main():
    _shim_sklearn()
    from modules.SCM3GPP.SCMMulti import SCMMulti
    from modules.gmm_cplx_bussgang import Gmm_nbit
    import modules.utils as ut

    n_ant, k, n_bits, snr = 64, 64, 2, 10
    rng = np.random.default_rng(0)
    scm = SCMMulti(path_sigma=2.0, n_path=1)
    t0 = time.time()
    h, t = scm.generate_channel(6000, 1, n_ant, rng)
    h = np.squeeze(h)
    t_gen = time.time() - t0
    print(f"channel gen: {6000 / t_gen:.1f} ch/s")

    gmm = Gmm_nbit(n_components=k, covariance_type="full", max_iter=5)
    t0 = time.time()
    gmm.fit(h=h[:5000], zero_mean=True)
    print(f"fit (5000 samples, <=5 iters): {time.time() - t0:.1f}s")

    a = ut.get_pilot_matrix(n_ant, 1, n_bits, pilot_type="angle_amp")
    quantizer = ut.get_quantizer([snr], n_bits, quantizer_type="uniform")
    n_eval = 1000
    r = ut.get_observation_nbit(h[5000:5000 + n_eval], snr, a, n_bits,
                                quantizer[snr][0], quantizer[snr][1])
    from copy import deepcopy
    g = deepcopy(gmm)
    # warm-up/prepare happens inside; time the full per-SNR call as the
    # benchmark scripts do (`Bussgang_GMM.py:287`)
    t0 = time.time()
    g.estimate_from_y(r, snr, n_ant, a, "all", n_bits, "uniform",
                      quantizer[snr])
    dt = time.time() - t0
    print(f"estimate_from_y: {n_eval / dt:.2f} estimates/s "
          f"({dt:.1f}s for {n_eval})")


if __name__ == "__main__":
    main()
