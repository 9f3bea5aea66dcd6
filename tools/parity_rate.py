"""Achievable-rate-bound parity: run the REFERENCE's rate computations on
shared data and shared estimates and assert `utils/metrics.py` matches to
float tolerance.

Covers every `_rate.csv` column family:
  - statistical lower bound (`Bussgang_GMM.py:146-163`), bits 1/2/3/inf
  - matched-filter bound (`Bussgang_GMM.py:186-195`)
  - GMM row's norm clip at 1e-1 (`Bussgang_GMM.py:299`)
  - perfect-CSI anchor (`Bussgang_GMM.py:244-262`)
  - the VAE eval variant (`estimators/vae.py:213-226`) is the same
    statistical formula without clip (torch transcription of :146-163) and
    is covered by the no-clip rows.

The global Bussgang statistics (Buss_glob, Cr, Cq_glob) come from the
reference's own `modules.uniform_quantizer.get_Bussgang_matrix/get_Cr`;
the surrounding 10-line bound loops are inline (they live in `__main__`
blocks and cannot be imported). Both sides run float64 on CPU.

Run: python tools/parity_rate.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402

for alias in ("infty", "Inf"):
    if not hasattr(np, alias):
        setattr(np, alias, np.inf)

N_ANT = int(os.environ.get("PARITY_N_ANT", 64))
N_TRAIN = int(os.environ.get("PARITY_NTRAIN", 20_000))
N_VAL = int(os.environ.get("PARITY_NVAL", 2_000))
SNRS = [-10.0, 0.0, 10.0, 20.0]
BITS = [1, 2, 3, np.inf]
RTOL = 1e-9  # both sides are float64 closed forms on identical inputs


def ref_rate_stat(res, h_val, buss_glob, cq_glob, norm_clip=None):
    """Literal transcription of `Bussgang_GMM.py:153-163` (statistical lower
    bound); `norm_clip=0.1` reproduces the GMM row's `np.clip(..., 1e-1,
    np.inf)` (`Bussgang_GMM.py:299`)."""
    res = res.copy()
    norm_fac = np.sum(np.abs(res) ** 2, axis=1)
    if norm_clip is not None:
        norm_fac = np.clip(norm_fac, norm_clip, np.inf)
    for i in range(res.shape[0]):
        res[i] /= norm_fac[i]
    inner = np.squeeze(np.expand_dims(res.conj(), 1) @ buss_glob
                       @ np.expand_dims(h_val, 2))
    num = np.abs(np.mean(inner, axis=0)) ** 2
    den1 = np.var(inner, axis=0)
    den2 = np.real(np.squeeze(np.expand_dims(res.conj(), 1) @ cq_glob
                              @ np.expand_dims(res, 2)))
    den2 = np.mean(den2, axis=0)
    return float(np.log2(1 + num / (den1 + den2)))


def ref_rate_mf(res, h_val, buss_glob, cq_glob):
    """Literal transcription of `Bussgang_GMM.py:186-195` (matched-filter
    bound, the 'LS_glob' per-sample loop)."""
    cq_inv = np.linalg.pinv(cq_glob)
    rate = 0.0
    for n in range(res.shape[0]):
        g_mf_h = res[n].conj().T @ buss_glob.conj().T @ cq_inv
        err = h_val[n] - res[n]
        rate += np.real(np.log2(
            1 + (np.abs(g_mf_h @ buss_glob @ res[n]) ** 2)
            / (g_mf_h @ cq_glob @ g_mf_h.conj().T
               + np.abs(g_mf_h @ buss_glob @ err) ** 2)))
    return float(rate / res.shape[0])


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from quantized_channel_estimation_tpu.estimators import blmmse
    from quantized_channel_estimation_tpu.ops import observation, pilots, scm
    from quantized_channel_estimation_tpu.ops import quantizer as Q
    from quantized_channel_estimation_tpu.utils import metrics

    import modules.utils as ref_ut
    from modules.uniform_quantizer import get_Bussgang_matrix, get_Cr

    key = jax.random.PRNGKey(99)
    h, _ = scm.generate_channels_chunked(key, N_TRAIN + N_VAL,
                                         scm.ScmConfig(N_ANT, 1))
    h = jnp.asarray(np.asarray(h), jnp.complex128)
    h_train, h_val = h[:N_TRAIN], h[N_TRAIN:]
    h_val_np = np.asarray(h_val)
    cov = np.einsum("nd,ne->de", h_train, np.conj(h_train)) / N_TRAIN
    cov_j = jnp.asarray(cov)

    checks = []

    def check(name, ours, refv, rtol=RTOL):
        rel = abs(ours - refv) / max(abs(refv), 1e-12)
        ok = rel < rtol
        checks.append(ok)
        print(f"{name:48s} ours={ours:+.10f} ref={refv:+.10f} "
              f"rel={rel:.2e} {'OK' if ok else 'MISMATCH'}")

    for n_bits in BITS:
        bits_tag = "inf" if n_bits == np.inf else int(n_bits)
        a = pilots.pilot_matrix(N_ANT, 1, n_bits).astype(jnp.complex128)
        a_np = np.asarray(a)
        ref_quant = (ref_ut.get_quantizer(SNRS, n_bits, "uniform")
                     if n_bits != np.inf else {s: None for s in SNRS})
        for snr in SNRS:
            q = (Q.design_quantizer(snr, n_bits, dtype=jnp.float64)
                 if n_bits != np.inf else None)
            r = observation.observe(jax.random.fold_in(key, int(snr) + 100),
                                    h_val, snr, a, n_bits, q)
            # shared estimates: our global BLMMSE (deterministic given data)
            res = np.asarray(blmmse.estimate_global(r, cov_j, snr, a,
                                                    n_bits, q))

            # reference global Bussgang statistics (Bussgang_GMM.py:148-151)
            cy_act = cov + 10 ** (-snr / 10) * np.eye(N_ANT, dtype=complex)
            buss_glob = get_Bussgang_matrix(snr, n_bits, cy_act)
            cr = get_Cr(cy_act, n_bits, snr, ref_quant[snr])
            cq_glob = cr - buss_glob @ cov @ buss_glob.conj().T
            # ours
            b_ours, cq_ours = metrics.global_bussgang_stats(
                cov_j, snr, n_bits, q)
            # 1e-7 (not 1e-9): the 1-bit arcsine's derivative blows up as
            # the normalized correlation approaches +-1 (high SNR), so the
            # matrix entries amplify last-bit f64 differences to ~1e-8;
            # the resulting RATE values still match to <=1e-9 below
            cq_rel = (np.linalg.norm(np.asarray(cq_ours) - cq_glob)
                      / np.linalg.norm(cq_glob))
            checks.append(cq_rel < 1e-7)
            print(f"Cq_glob bits={bits_tag} snr={snr:+.0f}: rel "
                  f"{cq_rel:.2e} {'OK' if cq_rel < 1e-7 else 'MISMATCH'}")

            check(f"rstat   bits={bits_tag} snr={snr:+.0f}",
                  float(metrics.rate_lower_bound(
                      jnp.asarray(res), h_val, b_ours, cq_ours)),
                  ref_rate_stat(res, h_val_np, buss_glob, cq_glob))
            check(f"rstat/clip bits={bits_tag} snr={snr:+.0f}",
                  float(metrics.rate_lower_bound(
                      jnp.asarray(res), h_val, b_ours, cq_ours,
                      norm_clip=0.1)),
                  ref_rate_stat(res, h_val_np, buss_glob, cq_glob,
                                norm_clip=0.1))
            # exercise the clip branch for real: shrink estimates so EVERY
            # norm falls below 1e-1 (Bussgang_GMM.py:299 clips low-power
            # GMM estimates; natural estimates rarely trip it)
            check(f"rstat/clip-active bits={bits_tag} snr={snr:+.0f}",
                  float(metrics.rate_lower_bound(
                      jnp.asarray(0.01 * res), h_val, b_ours, cq_ours,
                      norm_clip=0.1)),
                  ref_rate_stat(0.01 * res, h_val_np, buss_glob, cq_glob,
                                norm_clip=0.1))
            check(f"perfect-CSI bits={bits_tag} snr={snr:+.0f}",
                  float(metrics.rate_lower_bound(
                      h_val, h_val, b_ours, cq_ours)),
                  ref_rate_stat(h_val_np, h_val_np, buss_glob, cq_glob))
            # matched-filter bound (mf pinv is SVD-based; tolerance a touch
            # looser than the closed-form rows)
            check(f"rate_mf bits={bits_tag} snr={snr:+.0f}",
                  float(metrics.rate_mf_bound(
                      jnp.asarray(res), h_val, b_ours, cq_ours)),
                  ref_rate_mf(res, h_val_np, buss_glob, cq_glob),
                  rtol=1e-7)

    ok = all(checks)
    print(f"RATE PARITY: {'PASS' if ok else 'FAIL'} "
          f"({sum(checks)}/{len(checks)})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
