"""Tempered block pooling probe (round-3 follow-up to the urban-macro
coherent result).

The full-scale urban-macro sweep showed block pooling WINS at low SNR
(−8.1% at −10 dB) but LOSES 2–3.5% at ≥0 dB: the macro PSD family is more
diverse than K=64 covers, and the T-fold-sharpened block posterior
discards the per-snapshot hedging that softens model mismatch. Hypothesis:
a pooling temperature beta in [1/T, 1] on the summed per-snapshot
log-likelihoods (beta=1 = current `estimate_coherent`; beta=1/T ≈ the mean
per-snapshot posterior) recovers the hedge where mismatch dominates.

This probe evaluates the beta grid against the cached full-scale
urban-macro (and 3gpp) harness artifacts on CPU. Evidence for BASELINE.md;
if an interior beta dominates at every SNR it becomes an API knob.

Usage: python tools/coherent_temper_probe.py [model_tag]
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

MODEL = sys.argv[1] if len(sys.argv) > 1 else "urban-macro-coh4"
N_PATH = 6 if "macro" in MODEL else 1
T = 4
N_TRAIN, N_VAL = 100_000, 10_000
SNRS = [-10.0, -5.0, 0.0, 5.0, 10.0, 15.0, 20.0]
BETAS = [1.0]
ALPHAS = [0.75, 0.5, 0.25, 0.1]
SAVES = "results/saves"


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from quantized_channel_estimation_tpu.models import gmm_estimator
    from quantized_channel_estimation_tpu.models.gmm import log_prob_full
    from quantized_channel_estimation_tpu.ops import observation, pilots
    from quantized_channel_estimation_tpu.ops import quantizer as Q
    from quantized_channel_estimation_tpu.utils import io as qio
    from quantized_channel_estimation_tpu.utils.metrics import nmse

    d = 64
    chans, _ = qio.load_channels(os.path.join(
        SAVES, f"saved_data_ant={d}_model={MODEL}_paths={N_PATH}"
               f"_ntrain={N_TRAIN}_nchan={N_TRAIN + N_VAL}.npz"))
    params = qio.load_gmm_params(os.path.join(
        SAVES, f"trained_gmm_ant={d}_comp=64_model={MODEL}_paths={N_PATH}"
               f"_ntrain={N_TRAIN}_covtype=full_zeromean=True.npz"))
    nb_val = N_VAL // T
    h_val = jnp.asarray(chans[N_TRAIN // T:N_TRAIN // T + nb_val])  # (B,T,D)
    a = pilots.pilot_matrix(d, 1, 2)
    key = jax.random.PRNGKey(99)

    @jax.jit
    def eval_betas(bank, r):
        b, t, m = r.shape
        rf = r.reshape(b * t, m)
        lp = log_prob_full(rf, bank.means_r, bank.prec_chol_r)
        lp_sum = jnp.sum(lp.reshape(b, t, -1), axis=1)
        k, dd, mm = bank.filters.shape
        z = (rf @ bank.filters.reshape(k * dd, mm).T).reshape(b, t, k, dd)
        z = z + bank.bias[None, None, :, :]
        outs = []
        for beta in BETAS:
            lp_b = beta * lp_sum + bank.log_weights[None, :]
            w = jax.nn.softmax(lp_b, axis=-1).astype(z.dtype)
            outs.append(jnp.einsum("bk,btkd->btd", w, z))
        # leave-one-out blend: per-snapshot logits plus alpha times the
        # OTHER snapshots' evidence — alpha=0 is exactly the independent
        # estimator, alpha=1 the block posterior; the family contains both
        lp3 = lp.reshape(b, t, -1)
        for alpha in ALPHAS:
            lg = lp3 + alpha * (lp_sum[:, None, :] - lp3) \
                + bank.log_weights[None, None, :]
            w = jax.nn.softmax(lg, axis=-1).astype(z.dtype)
            outs.append(jnp.einsum("btk,btkd->btd", w, z))
        return outs

    print(f"model={MODEL} T={T} betas={BETAS} (beta=1 == estimate_coherent; "
          "indep = per-snapshot)")
    rows = {}
    for snr in SNRS:
        q = Q.design_quantizer(snr, 2)
        r = observation.observe(jax.random.fold_in(key, int(snr) + 30),
                                h_val, snr, a, 2, q)
        bank = gmm_estimator.prepare_bank(params, snr, a, 2, q)
        indep = float(nmse(
            gmm_estimator.estimate(bank, r.reshape(-1, d), "all"),
            h_val.reshape(-1, d)))
        outs = eval_betas(bank, r)
        ms = [float(nmse(o.reshape(-1, d), h_val.reshape(-1, d)))
              for o in outs]
        rows[snr] = (indep, ms)
        labels = [f"b{b:g}" for b in BETAS] + [f"a{a:g}" for a in ALPHAS]
        tag = " ".join(f"{l}={m:.4f}" for l, m in zip(labels, ms))
        best = labels[int(np.argmin(ms))]
        print(f"snr={snr:6.1f}: indep={indep:.4f} {tag}  best={best}"
              f"{' (blend<=indep)' if min(ms) <= indep else ' (indep wins)'}",
              flush=True)


if __name__ == "__main__":
    main()
