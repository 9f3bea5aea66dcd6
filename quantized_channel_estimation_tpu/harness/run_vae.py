"""VAE benchmark (reference `Bussgang_VAE.py`): train the selected VAE mode
(genie / noisy / real), evaluate Bussgang-LMMSE estimation over the SNR
sweep, write MSE + rate CSV and the params CSV.
"""
from __future__ import annotations

import dataclasses
import datetime
import os
import time
from typing import Sequence

import jax
import numpy as np

from quantized_channel_estimation_tpu.harness import stages
from quantized_channel_estimation_tpu.harness.run_gmm import (
    GmmBenchConfig, _get_data, _model_tag, channel_dim)
from quantized_channel_estimation_tpu.models import vae
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.ops.boundary import cjit
from quantized_channel_estimation_tpu.utils import io as qio


@dataclasses.dataclass(frozen=True)
class VaeBenchConfig:
    """Mirrors `Bussgang_VAE.py:35-82` (fixed defaults; the reference draws
    lr/batch_size randomly for hyperparameter search)."""
    vae_mode: str = "noisy"
    n_antennas: int = 64
    n_path: int = 3
    # channel model: '3gpp' | 'urban-macro' | 'mimo' (round-4: lifted from
    # run_gmm so the CSI-free VAE modes can train on macro/MIMO channels;
    # see run_gmm.GmmBenchConfig.channel_model). For 'mimo' the VAE input
    # dim is n_antennas * n_antennas_ms.
    channel_model: str = "3gpp"
    n_antennas_ms: int = 1
    n_pilots: int = 1
    n_bits: int = 2
    pilot_type: str = "angle_amp"
    quantizer_type: str = "uniform"
    snrs: Sequence[float] = (-10, -5, 0, 5, 10, 15, 20)
    epochs: int = 500
    n_layers: int = 4
    latent_dim: int = 16
    zeromean: bool = True
    fft_pre: bool = True
    # fixed defaults; full-scale searches (tools/vae_search_fullscale.py,
    # BASELINE.md) beat them by 0.4-0.6% mean MSE with MODE-SPECIFIC
    # winners (noisy: lr=6.17e-4/batch=290; real: lr=1.88e-4/batch=202) —
    # use run_search (the reference's own protocol) for production tuning
    lr: float = 5e-4
    batch_size: int = 200
    n_train: int = 100_000
    n_val: int = 10_000
    path_sigma: float = 2.0
    seed: int = 0
    eval_rate: bool = True
    results_dir: str = "results"
    cache_dir: str = "results/saves"
    use_cache: bool = True
    # hyperparameter random search (`Bussgang_VAE.py:54-82`): with
    # n_trials > 1, `run_search` redraws lr/batch_size per trial; the fixed
    # lr/batch_size above are then ignored
    n_trials: int = 1
    # route vae.estimate through the per-sample circulant (DFT-domain)
    # fast path — exact for the P=1 scaled-identity pilot ('auto' engages
    # it exactly then); O(D log D)/sample instead of the dense O(D^3)
    use_structured_bank: object = "auto"
    # >1: validation channels arrive as T-snapshot coherence blocks and an
    # extra 'vae_<mode>_coh' column pools the decoder's predicted spectra
    # over each block (`vae.estimate(coherence=T)` — new design, see
    # run_gmm.GmmBenchConfig.n_coherence); n_train/n_val count snapshots
    n_coherence: int = 1
    # >1 (round-5): training runs DATA-PARALLEL over an n_data_shards-way
    # mesh (`vae.train(mesh=...)`: channels sharded, per-device batch
    # draws, gradients pmean'd per step — effective batch = batch_size *
    # n_data_shards; the reference's VAE is single-GPU torch). Evaluation
    # stays per-sample. n_train must divide by it.
    n_data_shards: int = 1


def run(cfg: VaeBenchConfig, verbose: bool = True):
    t_start = time.time()
    key = jax.random.PRNGKey(cfg.seed)
    k_data, k_fit, k_obs = jax.random.split(key, 3)

    t_coh = max(1, cfg.n_coherence)
    if t_coh > 1 and (cfg.n_train % t_coh or cfg.n_val % t_coh):
        raise ValueError(
            f"n_train={cfg.n_train} and n_val={cfg.n_val} must be "
            f"multiples of n_coherence={t_coh} (they count snapshots)")
    base = GmmBenchConfig(n_antennas=cfg.n_antennas, n_path=cfg.n_path,
                          channel_model=cfg.channel_model,
                          n_antennas_ms=cfg.n_antennas_ms,
                          n_train=cfg.n_train, n_val=cfg.n_val,
                          path_sigma=cfg.path_sigma, cache_dir=cfg.cache_dir,
                          use_cache=cfg.use_cache, n_coherence=t_coh)
    dim = channel_dim(base)
    channels, _ = _get_data(base, k_data)
    if t_coh > 1:
        nb_train, nb_val = cfg.n_train // t_coh, cfg.n_val // t_coh
        h_train = stages.flatten_coherence(
            stages.tree_slice(channels, 0, nb_train))
        # flat block-major rows: T consecutive rows share one angular PSD,
        # exactly the layout `vae.estimate(coherence=T)` pools over
        h_val = stages.flatten_coherence(
            stages.tree_slice(channels, nb_train, nb_train + nb_val))
    else:
        h_train = stages.tree_slice(channels, 0, cfg.n_train)
        h_val = stages.tree_slice(channels, cfg.n_train,
                                  cfg.n_train + cfg.n_val)

    a = stages.pilot_matrix(dim, cfg.n_pilots, cfg.n_bits,
                            cfg.pilot_type)
    quantizers = [Q.design_quantizer(s, cfg.n_bits, cfg.quantizer_type)
                  for s in cfg.snrs]
    quantizer_by_snr = dict(zip(cfg.snrs, quantizers))
    cov = stages.sample_cov(h_train)

    vcfg = vae.VaeConfig(
        n_antennas=dim, n_pilots=cfg.n_pilots,
        latent_dim=cfg.latent_dim, n_layers=cfg.n_layers,
        vae_mode=cfg.vae_mode, zeromean=cfg.zeromean, fft_pre=cfg.fft_pre,
        n_pilot_convs=max(0, cfg.n_pilots // 2), n_bits=cfg.n_bits,
        quantizer_type=cfg.quantizer_type, lr=cfg.lr,
        batch_size=cfg.batch_size, epochs=cfg.epochs)
    # checkpoint/resume like the reference's per-epoch torch.save into
    # results/vae/saves (`vae.py:76-79,148-153`), at block granularity
    # lr/batch_size are in the key so random-search trials (which share the
    # seed) never resume each other's checkpoints
    coh_tag = f"_coh{t_coh}" if t_coh > 1 else ""
    ckpt_dir = os.path.join(
        cfg.cache_dir,
        f"vae_ckpt_{cfg.vae_mode}_ant={dim}"
        # 3gpp keeps the historical key so existing checkpoints stay warm
        + ("" if cfg.channel_model == "3gpp"
           else f"_model={_model_tag(base)}")
        + f"_bits={cfg.n_bits}"
        f"_train={cfg.n_train}_seed={cfg.seed}_lr={cfg.lr:g}"
        f"_bs={cfg.batch_size}{coh_tag}"
        # a DP run follows a different batch/gradient stream than a
        # single-device one — never resume across layouts
        + (f"_dp{cfg.n_data_shards}" if cfg.n_data_shards > 1 else "")
        ) if cfg.use_cache else None
    mesh = None
    if cfg.n_data_shards > 1:
        from quantized_channel_estimation_tpu.parallel import (
            mesh as pmesh_mod)
        mesh = pmesh_mod.make_mesh(cfg.n_data_shards, 1)
    t0 = time.time()
    model, state, losses = vae.train(k_fit, vcfg, h_train, a, cfg.snrs,
                                     quantizers, verbose=verbose,
                                     checkpoint_path=ckpt_dir,
                                     checkpoint_every=25, mesh=mesh)
    train_time = time.time() - t0
    if verbose:
        print(f"VAE[{cfg.vae_mode}] trained {cfg.epochs} epochs "
              f"({train_time:.0f}s), final loss {losses[-1]:.2f}")

    mse_cols = {f"vae_{cfg.vae_mode}": []}
    rate_cols = {f"vae_{cfg.vae_mode}_rstat": []}
    if t_coh > 1:
        mse_cols[f"vae_{cfg.vae_mode}_coh"] = []
        rate_cols[f"vae_{cfg.vae_mode}_coh_rstat"] = []
    # one compiled eval program reused across the sweep: snr and the
    # quantizer tables are dynamic arguments
    # genie mode is genie-aided at eval: the encoder sees the true channel
    structured = (cfg.use_structured_bank if cfg.use_structured_bank
                  != "auto" else cfg.n_pilots == 1)
    est_fn = cjit(lambda params, rr, aa, snr_db, q, hh:
                  vae.estimate(model, params, vcfg, rr, snr_db, aa, q,
                               h_true=hh, structured=structured))
    est_coh_fn = cjit(lambda params, rr, aa, snr_db, q, hh:
                      vae.estimate(model, params, vcfg, rr, snr_db, aa, q,
                                   h_true=hh, coherence=t_coh,
                                   structured=structured))
    for i, snr in enumerate(cfg.snrs):
        q = quantizer_by_snr[snr]
        r = stages.observe(jax.random.fold_in(k_obs, i), h_val, snr, a,
                           cfg.n_bits, q)
        h_est = est_fn(state.params, r, a, float(snr), q, h_val)
        mse_cols[f"vae_{cfg.vae_mode}"].append(stages.nmse(h_est, h_val))
        if cfg.eval_rate:
            rate_cols[f"vae_{cfg.vae_mode}_rstat"].append(
                stages.rate(h_est, h_val, cov, snr, cfg.n_bits, q))
        if t_coh > 1:
            # block-pooled predicted spectra over each coherence block —
            # h_val's rows are block-major, T consecutive rows per block
            h_coh = est_coh_fn(state.params, r, a, float(snr), q, h_val)
            mse_cols[f"vae_{cfg.vae_mode}_coh"].append(
                stages.nmse(h_coh, h_val))
            if cfg.eval_rate:
                rate_cols[f"vae_{cfg.vae_mode}_coh_rstat"].append(
                    stages.rate(h_coh, h_val, cov, snr, cfg.n_bits, q))
    if verbose:
        print(f"vae_{cfg.vae_mode}: mse={mse_cols[f'vae_{cfg.vae_mode}']}")
        if t_coh > 1:
            print(f"vae_{cfg.vae_mode}_coh: "
                  f"mse={mse_cols[f'vae_{cfg.vae_mode}_coh']}")

    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    out_dir = os.path.join(cfg.results_dir, "vae")
    name = (f"{stamp}_vae{cfg.vae_mode}_{_model_tag(base)}_path={cfg.n_path}"
            f"_ant={dim}_bits={cfg.n_bits}_train={cfg.n_train}"
            f"_pilot={cfg.n_pilots}_qtype={cfg.quantizer_type}")
    cols = dict(mse_cols)
    if cfg.eval_rate:
        cols.update(rate_cols)
    qio.write_result_csv(os.path.join(out_dir, name + ".csv"), cfg.snrs, cols)
    # params CSV + loss CSV/PNG (reference `Bussgang_VAE.py:174-193`)
    from quantized_channel_estimation_tpu.utils.misc import dict_to_csv
    dict_to_csv(dataclasses.asdict(cfg),
                os.path.join(out_dir, name + "_params.csv"))
    qio.write_result_csv(os.path.join(out_dir, name + "_loss.csv"),
                         list(range(1, len(losses) + 1)), {"loss": losses})
    qio.save_loss_plot(os.path.join(out_dir, name + "_loss.png"), losses)
    return mse_cols, rate_cols, {"train": train_time,
                                 "total": time.time() - t_start}


def run_search(cfg: VaeBenchConfig, verbose: bool = True):
    """Hyperparameter random search (`Bussgang_VAE.py:54-82`): per trial,
    lr ~ rand_exp(1e-5, 1e-3) (`:70`) and batch_size ~ U{100..299} (`:71`);
    the other searchable knobs are fixed in the reference (n_layers=4,
    latent_dim=N//4, zeromean/fft_pre True, `:72-75`) and stay at cfg's
    values. The reference realizes one trial per script invocation and dumps
    the drawn params to CSV (`:174-182`); here `n_trials` loops that, each
    trial writes its own result/params/loss artifacts via `run`, and a
    summary CSV ranks trials by mean MSE over the sweep.

    Returns (best_trial_dict, all_trials list).
    """
    from quantized_channel_estimation_tpu.utils.misc import rand_exp

    trials = []
    for trial in range(cfg.n_trials):
        rng = np.random.default_rng([cfg.seed, trial])
        lr = float(rand_exp(1e-5, 1e-3, seed=rng)[0])
        batch_size = int(rng.integers(100, 300))
        tcfg = dataclasses.replace(cfg, lr=lr, batch_size=batch_size)
        if verbose:
            print(f"trial {trial + 1}/{cfg.n_trials}: lr={lr:.3e} "
                  f"batch_size={batch_size}")
        mse_cols, rate_cols, times = run(tcfg, verbose=verbose)
        mses = mse_cols[f"vae_{cfg.vae_mode}"]
        trials.append({"trial": trial, "lr": lr, "batch_size": batch_size,
                       "mean_mse": float(np.mean(mses)), "mse": mses,
                       "rate": rate_cols.get(f"vae_{cfg.vae_mode}_rstat"),
                       "train_time": times["train"]})
    best = min(trials, key=lambda t: t["mean_mse"])
    if verbose:
        print(f"best trial {best['trial']}: lr={best['lr']:.3e} "
              f"batch_size={best['batch_size']} mean_mse={best['mean_mse']:.5f}")
    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    out = os.path.join(cfg.results_dir, "vae",
                       f"{stamp}_vae{cfg.vae_mode}_search_summary.csv")
    cols = {"lr": [t["lr"] for t in trials],
            "batch_size": [t["batch_size"] for t in trials],
            "mean_mse": [t["mean_mse"] for t in trials],
            "best": [int(t is best) for t in trials]}
    for i, snr in enumerate(cfg.snrs):
        cols[f"mse_snr={snr:g}"] = [t["mse"][i] for t in trials]
    qio.write_result_csv(out, [t["trial"] for t in trials], cols,
                         index_name="trial")
    return best, trials


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--vae", "-v", type=int, default=0,
                   help="0=genie 1=noisy 2=real (`Bussgang_VAE.py:21-28`)")
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--trials", type=int, default=1,
                   help=">1 runs the reference's lr/batch_size random "
                        "search (`Bussgang_VAE.py:54-82`)")
    args = p.parse_args()
    mode = ["genie", "noisy", "real"][args.vae]
    cfg = VaeBenchConfig(vae_mode=mode, epochs=args.epochs,
                         n_trials=args.trials)
    if args.trials > 1:
        run_search(cfg)
    else:
        run(cfg)
