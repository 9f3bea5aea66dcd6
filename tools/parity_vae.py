"""VAE parity (genie mode): our flax VAE vs the reference's torch VAE_nbit,
trained on identical channels with identical architecture/hyperparameters,
compared on estimation MSE over shared quantized observations.

Genie mode is used because the reference's noisy/real training paths
regenerate observations with a per-sample Python quantization loop over the
full training set every epoch — infeasible to run here. VAE training is
stochastic (different frameworks, inits, batch draws), so parity is a
same-ballpark check (±20%) on the converged estimator, not bit equality.

Run on CPU: python tools/parity_vae.py
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
LATENT = int(os.environ.get("PARITY_LATENT", max(8, N_ANT // 4)))
N_LAYERS = int(os.environ.get("PARITY_LAYERS", 3 if N_ANT <= 32 else 4))
N_TRAIN = int(os.environ.get("PARITY_NTRAIN", 10_000))
N_VAL = int(os.environ.get("PARITY_NVAL", 2_000))
EPOCHS = int(os.environ.get("PARITY_EPOCHS", 60))
BATCH = 200
LR = 5e-4
N_BITS = 2
SNRS_EVAL = [5.0, 15.0]
SNRS = [-10, -5, 0, 5, 10, 15, 20]


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from quantized_channel_estimation_tpu.models import vae
    from quantized_channel_estimation_tpu.ops import observation, pilots, scm
    from quantized_channel_estimation_tpu.ops import quantizer as Q
    from quantized_channel_estimation_tpu.utils.metrics import nmse

    import modules.utils as ref_ut
    from estimators.vae import VAE_nbit as RefVae

    key = jax.random.PRNGKey(99)
    h, _ = scm.generate_channels_chunked(key, N_TRAIN + 1000 + N_VAL,
                                         scm.ScmConfig(N_ANT, 3))
    h_np = np.asarray(h, np.complex128)
    h_train = h[:N_TRAIN]
    h_test = h_np[N_TRAIN:N_TRAIN + 1000]
    h_val = h[N_TRAIN + 1000:]
    h_val_np = np.asarray(h_val, np.complex128)

    a = pilots.pilot_matrix(N_ANT, 1, N_BITS)
    a_np = np.asarray(a, np.complex128)
    quantizers = [Q.design_quantizer(s, N_BITS) for s in SNRS]
    ref_quant = ref_ut.get_quantizer(SNRS + SNRS_EVAL, N_BITS, "uniform")

    # ---- ours ----
    cfg = vae.VaeConfig(n_antennas=N_ANT, latent_dim=LATENT,
                        n_layers=N_LAYERS, vae_mode="genie", n_bits=N_BITS,
                        lr=LR, batch_size=BATCH, epochs=EPOCHS,
                        steps_per_epoch=N_TRAIN // BATCH)
    t0 = time.time()
    model, state, losses = vae.train(jax.random.PRNGKey(5), cfg, h_train, a,
                                     SNRS, quantizers, verbose=False)
    print(f"our VAE train: {time.time() - t0:.0f}s, "
          f"final loss {losses[-1]:.2f}")

    # ---- reference ----
    import torch
    # torch>=2.6 defaults torch.load(weights_only=True), which rejects the
    # reference's own checkpoints (they embed numpy scalars). We just created
    # the file ourselves, so force the legacy behavior.
    _orig_load = torch.load

    def _load(*args, **kwargs):
        kwargs.setdefault("weights_only", False)
        return _orig_load(*args, **kwargs)

    torch.load = _load
    params = {
        "sim_id": "parity", "n_antennas": N_ANT, "n_pilots": 1,
        "pilot_type": "angle_amp", "n_bits": N_BITS, "snrs": SNRS,
        "n_paths": 3, "vae_mode": "genie", "n_train": N_TRAIN,
        "n_test": 1000, "n_val": N_VAL, "epochs": EPOCHS,
        "quantizer_type": "uniform", "file_vae": "",
        "apply_batchnorm": False, "lr": LR, "batch_size": BATCH,
        "n_layers": N_LAYERS, "latent_dim": LATENT, "zeromean": True,
        "fft_pre": True, "conv_vae": False, "filters_max": 32,
        "n_pilot_convs": 0, "eval_rate": True, "snr_scale": False,
        "snr_scale_fac": 0.5, "model_type": "3gpp", "n_path": 3,
        "device": torch.device("cpu"), "A": a_np, "quantizer": ref_quant,
    }
    os.makedirs("results/vae/saves", exist_ok=True)
    ref = RefVae(params=params)
    t0 = time.time()
    ref.train(h_np[:N_TRAIN].copy(), h_test.copy(), SNRS)
    print(f"reference VAE train: {time.time() - t0:.0f}s")

    all_ok = True
    for snr in SNRS_EVAL:
        q = Q.design_quantizer(snr, N_BITS)
        r = observation.observe(jax.random.fold_in(key, int(snr)), h_val,
                                snr, a, N_BITS, q)
        ours = float(nmse(vae.estimate(model, state.params, cfg, r, snr, a,
                                       q, h_true=h_val), h_val))
        r_np = np.asarray(r, np.complex128)
        refm, _, _ = ref.eval(h_val_np.copy(), r_np, snr, h_np[:N_TRAIN])
        rel = (ours - refm) / refm
        ok = rel < 0.20  # one-sided; stochastic training
        all_ok &= ok
        print(f"vae-genie snr={snr:5.1f}: ours={ours:.5f} ref={refm:.5f} "
              f"rel={rel:+.2e} {'OK' if ok else 'MISMATCH'}")
    print("VAE PARITY:", "PASS" if all_ok else "FAIL")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
