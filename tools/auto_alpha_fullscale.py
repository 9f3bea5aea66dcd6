"""Full-scale auto-alpha evidence (round-4 VERDICT item 2 'done'):
per-SNR selection must match-or-beat the best FIXED alpha at every SNR on
the 3gpp, urban-macro, and Kronecker-MIMO full-scale sweeps.

For each cached full-scale artifact set (channels + K=64 full-covariance
fit), alpha is selected per SNR on the LAST 1024 train-slice coherence
blocks (observed with a key disjoint from the eval observations) and the
whole DEFAULT_ALPHA_GRID is evaluated on the 2500 validation blocks, so
the table shows both what 'auto' picks and what it costs vs the per-SNR
oracle. The cached fits saw the selection blocks among their 100k training
samples; at K=64/100k the per-sample influence is negligible (the
disjoint-fit variant is covered by tests/test_harness_variants.py's
auto-alpha test), and keeping the fits warm is what makes the three-model
sweep a minutes-scale run.

Usage: python tools/auto_alpha_fullscale.py [model_tag ...]
  (default: 3gpp-coh4 urban-macro-coh4 mimo16x4-coh4)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from quantized_channel_estimation_tpu.harness import stages
from quantized_channel_estimation_tpu.models.gmm_estimator import (
    DEFAULT_ALPHA_GRID)
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.utils import io as qio

T = 4
N_TRAIN, N_VAL = 100_000, 10_000
SNRS = [-10.0, -5.0, 0.0, 5.0, 10.0, 15.0, 20.0]
N_SEL_BLOCKS = 1024
SAVES = "results/saves"
PATHS = {"3gpp-coh4": 1, "urban-macro-coh4": 6, "mimo16x4-coh4": 2}


def run_model(tag: str):
    d = 64
    n_path = PATHS[tag]
    path = os.path.join(
        SAVES, f"saved_data_ant={d}_model={tag}_paths={n_path}"
               f"_ntrain={N_TRAIN}_nchan={N_TRAIN + N_VAL}.npz")
    if "mimo" in tag:  # the mimo cache stores (channels, toep_bs, toep_ms)
        chans = np.load(path)["channels"]
    else:
        chans, _ = qio.load_channels(path)
    params = stages.from_numpy(qio.load_gmm_params(os.path.join(
        SAVES, f"trained_gmm_ant={d}_comp=64_model={tag}_paths={n_path}"
               f"_ntrain={N_TRAIN}_covtype=full_zeromean=True.npz")))
    nb_train, nb_val = N_TRAIN // T, N_VAL // T
    h_sel = chans[nb_train - N_SEL_BLOCKS:nb_train]          # (1024, T, D)
    h_val = chans[nb_train:nb_train + nb_val]                # (2500, T, D)
    a = stages.pilot_matrix(d, 1, 2)
    print(f"== {tag} (n_path={n_path}) ==", flush=True)
    header = "SNR    " + "".join(f"a={al:<8g}" for al in DEFAULT_ALPHA_GRID)
    print(f"{header}  chosen  eval(chosen)  eval(best-fixed)")
    ok_all = True
    for i, snr in enumerate(SNRS):
        q = Q.design_quantizer(snr, 2)
        r_sel = stages.observe(jax.random.fold_in(jax.random.PRNGKey(7), i),
                               h_sel, snr, a, 2, q)
        r_val = stages.observe(jax.random.fold_in(jax.random.PRNGKey(8), i),
                               h_val, snr, a, 2, q)
        bank = stages.prepare_bank(params, snr, a, 2, q)
        sel_scores, eval_scores = {}, {}
        for al in DEFAULT_ALPHA_GRID:
            sel_scores[al] = stages.nmse(
                stages.estimate_coherent_auto(bank, r_sel, "all", float(al)),
                h_sel)
            eval_scores[al] = stages.nmse(
                stages.estimate_coherent_auto(bank, r_val, "all", float(al)),
                h_val)
        chosen = min(sel_scores, key=sel_scores.get)
        best_fixed = min(eval_scores.values())
        ok = eval_scores[chosen] <= best_fixed * 1.005
        ok_all = ok_all and ok
        row = "".join(f"{eval_scores[al]:<10.5f}" for al in
                      DEFAULT_ALPHA_GRID)
        print(f"{snr:<7g}{row}  {chosen:<6g}  {eval_scores[chosen]:<12.5f}"
              f"  {best_fixed:.5f}{'' if ok else '  <-- MISS'}", flush=True)
    print(f"{tag}: auto == best-fixed at every SNR (0.5% tolerance): "
          f"{'PASS' if ok_all else 'FAIL'}", flush=True)
    return ok_all


if __name__ == "__main__":
    tags = sys.argv[1:] or list(PATHS)
    t0 = time.time()
    results = {tag: run_model(tag) for tag in tags}
    print(f"total {time.time()-t0:.0f}s; " + ", ".join(
        f"{t}={'PASS' if ok else 'FAIL'}" for t, ok in results.items()),
        flush=True)
