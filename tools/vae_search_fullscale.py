"""Full-scale VAE hyperparameter search vs the fixed defaults (round-2
VERDICT item 5: "prove the search pays").

Protocol (successive halving on epochs, budget-bound):
  1. Baseline: the fixed lr=5e-4 / batch=200 config at the full 500 epochs
     (`Bussgang_VAE.py:35-82` defaults).
  2. Screening: N_TRIALS random draws (lr ~ rand_exp(1e-5, 1e-3),
     batch ~ U{100..299} — the reference's search space, `:70-71`) at
     SCREEN_EPOCHS each.
  3. Promotion: the best screening trial re-run at 500 epochs (resumes its
     own checkpoint — the ckpt key carries lr/batch).
  4. Report searched-vs-default MSE per sweep SNR + mean.

Usage: python tools/vae_search_fullscale.py [--mode noisy] [--trials 8]
       [--epochs 500] [--screen-epochs 150]
Evidence recorded in BASELINE.md.
"""
import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="noisy",
                    choices=["genie", "noisy", "real"])
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--screen-epochs", type=int, default=150)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from quantized_channel_estimation_tpu.harness import run_vae

    base = run_vae.VaeBenchConfig(vae_mode=args.mode, epochs=args.epochs)

    t0 = time.time()
    print(f"=== baseline: lr={base.lr:g} batch={base.batch_size} "
          f"epochs={args.epochs}", flush=True)
    mse_b, _, tb = run_vae.run(base, verbose=True)
    base_mses = mse_b[f"vae_{args.mode}"]
    print(f"baseline mean MSE {np.mean(base_mses):.5f} "
          f"({tb['train']:.0f}s train)", flush=True)

    print(f"=== screening: {args.trials} trials x {args.screen_epochs} "
          f"epochs", flush=True)
    scfg = dataclasses.replace(base, epochs=args.screen_epochs,
                               n_trials=args.trials)
    best, trials = run_vae.run_search(scfg, verbose=True)

    print(f"=== promotion: lr={best['lr']:.3e} batch={best['batch_size']} "
          f"-> {args.epochs} epochs (resumes its screening checkpoint)",
          flush=True)
    pcfg = dataclasses.replace(base, lr=best["lr"],
                               batch_size=best["batch_size"])
    mse_p, _, tp = run_vae.run(pcfg, verbose=True)
    prom_mses = mse_p[f"vae_{args.mode}"]

    rows = {"snrs": list(base.snrs),
            "default": [round(v, 5) for v in base_mses],
            "searched": [round(v, 5) for v in prom_mses],
            "default_mean": round(float(np.mean(base_mses)), 5),
            "searched_mean": round(float(np.mean(prom_mses)), 5),
            "searched_lr": best["lr"],
            "searched_batch": best["batch_size"],
            "mode": args.mode,
            "screen_trials": args.trials,
            "screen_epochs": args.screen_epochs,
            "total_s": round(time.time() - t0, 0)}
    rows["search_wins"] = rows["searched_mean"] < rows["default_mean"]
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
