"""MFA-Bussgang benchmark (reference `Bussgang_MFA.py`): fit a complex
mixture of factor analyzers on clean channels (n_path=3, latent=N/4, PPCA),
evaluate Bussgang-LMMSE estimation over the SNR sweep, MSE + rate to CSV.
"""
from __future__ import annotations

import dataclasses
import datetime
import os
import time
from typing import Sequence, Union

import jax

from quantized_channel_estimation_tpu.harness import stages
from quantized_channel_estimation_tpu.harness.run_gmm import (
    GmmBenchConfig, _get_data, _model_tag, channel_dim)
from quantized_channel_estimation_tpu.models import mfa
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.utils import io as qio


@dataclasses.dataclass(frozen=True)
class MfaBenchConfig:
    """Mirrors `Bussgang_MFA.py:27-42`."""
    n_antennas: int = 64
    n_components: int = 64
    n_summands_or_proba: Union[str, int, float] = "all"
    n_path: int = 3
    # channel model: '3gpp' | 'urban-macro' | 'mimo' (round-4: lifted from
    # run_gmm so MFA benchmarks can run the macro/MIMO generators too —
    # see run_gmm.GmmBenchConfig.channel_model). For 'mimo' the channel
    # dim is n_antennas (BS) * n_antennas_ms (MS).
    channel_model: str = "3gpp"
    n_antennas_ms: int = 1
    # >1: block-shaped validation + the block-pooled 'blmmse_mfa_coh'
    # column (see run_gmm.GmmBenchConfig.n_coherence)
    n_coherence: int = 1
    # evidence-blend exponent for the coherent column; 'auto' selects per
    # SNR on held-out train blocks (see run_gmm.GmmBenchConfig.coherence_alpha)
    coherence_alpha: Union[float, str] = 1.0
    alpha_val_blocks: int = 1024
    n_pilots: int = 1
    n_bits: int = 2
    pilot_type: str = "angle_amp"
    quantizer_type: str = "uniform"
    snrs: Sequence[float] = (-10, -5, 0, 5, 10, 15, 20)
    latent_dim: int = 16  # n_antennas // 4
    ppca: bool = True
    lock_psis: bool = False
    zero_mean: bool = True
    max_iter: int = 100
    n_train: int = 100_000
    n_val: int = 10_000
    path_sigma: float = 2.0
    seed: int = 0
    eval_rate: bool = True
    results_dir: str = "results"
    cache_dir: str = "results/saves"
    use_cache: bool = True
    # Factored (low-rank+diagonal) estimation banks (round-4): 'auto' keeps
    # the fitted factor model FACTORED at estimation time — O(K D M) bank,
    # O(N K D M) estimation through the Woodbury pipeline
    # (models/mfa_bank.py) — whenever it is EXACT: n_bits != 1 (the 1-bit
    # arcsine map destroys low rank) with the P=1 scaled-identity pilot.
    # True forces it (raises when ineligible), False densifies like the
    # reference (`mofa_cplx_bussgang.py:117-216`).
    use_factored_bank: Union[bool, str] = "auto"
    # mesh parallelism for the sweep (round-5, see
    # run_gmm.GmmBenchConfig.n_data_shards): the MFA EM runs data-parallel
    # via `fit_mfa_shard_map` (zero-mean AND nonzero-mean — the means init
    # is the data-parallel k-means), estimation through the sharded
    # factored/dense stats merges.
    n_data_shards: int = 1
    n_component_shards: int = 1


def run(cfg: MfaBenchConfig, verbose: bool = True):
    t_start = time.time()
    key = jax.random.PRNGKey(cfg.seed)
    k_data, k_fit, k_obs = jax.random.split(key, 3)

    sharded = None
    if cfg.n_data_shards * cfg.n_component_shards > 1:
        from quantized_channel_estimation_tpu.parallel import (
            mesh as pmesh_mod)
        sharded = stages.ShardedStages(pmesh_mod.make_mesh(
            cfg.n_data_shards, cfg.n_component_shards))
        sharded.check_divisible(cfg.n_train, cfg.n_val, cfg.n_components)

    t_coh = max(1, cfg.n_coherence)
    if t_coh > 1 and (cfg.n_train % t_coh or cfg.n_val % t_coh):
        raise ValueError(
            f"n_train={cfg.n_train} and n_val={cfg.n_val} must be "
            f"multiples of n_coherence={t_coh} (they count snapshots)")
    auto_alpha = cfg.coherence_alpha == "auto"
    if auto_alpha and t_coh <= 1:
        raise ValueError("coherence_alpha='auto' requires n_coherence > 1")
    base = GmmBenchConfig(n_antennas=cfg.n_antennas, n_path=cfg.n_path,
                          channel_model=cfg.channel_model,
                          n_antennas_ms=cfg.n_antennas_ms,
                          n_train=cfg.n_train, n_val=cfg.n_val,
                          path_sigma=cfg.path_sigma, cache_dir=cfg.cache_dir,
                          use_cache=cfg.use_cache, n_coherence=t_coh)
    dim = channel_dim(base)
    channels, _ = _get_data(base, k_data)
    alpha_val_h = None
    if t_coh > 1:
        nb_train, nb_val = cfg.n_train // t_coh, cfg.n_val // t_coh
        nb_fit = nb_train
        if auto_alpha:
            nb_alpha = max(1, min(cfg.alpha_val_blocks, nb_train // 10))
            nb_fit = nb_train - nb_alpha
            alpha_val_h = stages.tree_slice(channels, nb_fit, nb_train)
        h_train = stages.flatten_coherence(
            stages.tree_slice(channels, 0, nb_fit))
        h_val_blocks = stages.tree_slice(channels, nb_train,
                                         nb_train + nb_val)
        h_val = stages.flatten_coherence(h_val_blocks)
    else:
        h_train = stages.tree_slice(channels, 0, cfg.n_train)
        h_val = stages.tree_slice(channels, cfg.n_train,
                                  cfg.n_train + cfg.n_val)

    a = stages.pilot_matrix(dim, cfg.n_pilots, cfg.n_bits,
                            cfg.pilot_type)
    quantizers = {snr: Q.design_quantizer(snr, cfg.n_bits, cfg.quantizer_type)
                  for snr in cfg.snrs}
    cov = stages.sample_cov(h_train)

    # zero-responsibility guard selection rule (`Bussgang_MFA.py:118-122`)
    rs_clip = 1e-3 if (not (cfg.lock_psis or cfg.ppca)) or cfg.zero_mean \
        else 0.0
    mcfg = mfa.MfaConfig(
        n_components=cfg.n_components, latent_dim=cfg.latent_dim,
        ppca=cfg.ppca, lock_psis=cfg.lock_psis, zero_mean=cfg.zero_mean,
        rs_clip=rs_clip, max_iter=cfg.max_iter)
    factored = (cfg.use_factored_bank if isinstance(cfg.use_factored_bank,
                                                    bool)
                else (cfg.n_bits != 1 and cfg.n_pilots == 1))
    if factored and cfg.n_pilots != 1:
        raise ValueError("use_factored_bank requires the P=1 "
                         "scaled-identity pilot")
    if factored and cfg.n_bits == 1:
        raise ValueError("use_factored_bank does not support 1-bit "
                         "(arcsine destroys low rank); set it False")
    t0 = time.time()
    res_fit = (sharded.mfa_fit(k_fit, h_train, mcfg) if sharded
               else stages.mfa_fit(k_fit, h_train, mcfg))
    # only densify when the factored path is off — the factored bank keeps
    # the O(K D M) representation end to end
    params = None if factored else stages.mfa_to_gmm(res_fit.params, 1e-6)
    fit_time = time.time() - t0
    if verbose:
        print(f"MFA fit: {int(res_fit.n_iter)} iters "
              f"ll={float(res_fit.log_likelihood):.1f} ({fit_time:.1f}s)"
              + (" [factored bank]" if factored else ""))

    mse_cols = {"blmmse_mfa": []}
    rate_cols = {"mfa_rstat": []}
    alpha_by_snr = {}
    if t_coh > 1:
        mse_cols["blmmse_mfa_coh"] = []
        rate_cols["mfa_coh_rstat"] = []

    if factored:
        if sharded:
            est_flat = sharded.estimate_factored
            est_coh = sharded.estimate_factored
        else:
            est_flat = stages.estimate_factored
            est_coh = stages.estimate_factored_coherent
    elif sharded:
        est_flat = sharded.estimate
        est_coh = sharded.estimate_coherent
    else:
        est_flat = stages.estimate_auto
        est_coh = stages.estimate_coherent_auto

    def coherent_alpha(bank, snr, i):
        """Fixed blend, or per-SNR 'auto' grid selection on the held-out
        train blocks (run_gmm.coherent_alpha semantics)."""
        if not auto_alpha:
            return cfg.coherence_alpha
        if snr not in alpha_by_snr:
            from quantized_channel_estimation_tpu.models import gmm_estimator
            r_a = stages.observe(jax.random.fold_in(k_obs, 10_000 + i),
                                 alpha_val_h, snr, a, cfg.n_bits,
                                 quantizers[snr])
            scores = {}
            for al in gmm_estimator.DEFAULT_ALPHA_GRID:
                h_hat = est_coh(bank, r_a, cfg.n_summands_or_proba,
                                float(al))
                scores[float(al)] = stages.nmse(h_hat, alpha_val_h)
            alpha_by_snr[snr] = min(scores, key=scores.get)
            if verbose:
                print(f"  alpha[{snr} dB] = {alpha_by_snr[snr]}")
        return alpha_by_snr[snr]

    for i, snr in enumerate(cfg.snrs):
        k_snr = jax.random.fold_in(k_obs, i)
        if factored:
            bank = stages.prepare_bank_factored(res_fit.params, snr, a,
                                                cfg.n_bits, quantizers[snr])
        else:
            bank = stages.prepare_bank(params, snr, a, cfg.n_bits,
                                       quantizers[snr])
        if t_coh > 1:
            r_blocks = stages.observe(k_snr, h_val_blocks, snr, a,
                                      cfg.n_bits, quantizers[snr])
            r_val = stages.flatten_coherence(r_blocks)
            res_coh = stages.flatten_coherence(est_coh(
                bank, r_blocks, cfg.n_summands_or_proba,
                coherent_alpha(bank, snr, i)))
            mse_cols["blmmse_mfa_coh"].append(stages.nmse(res_coh, h_val))
            if cfg.eval_rate:
                rate_cols["mfa_coh_rstat"].append(
                    stages.rate(res_coh, h_val, cov, snr, cfg.n_bits,
                                quantizers[snr]))
        else:
            r_val = stages.observe(k_snr, h_val, snr, a, cfg.n_bits,
                                   quantizers[snr])
        res = est_flat(bank, r_val, cfg.n_summands_or_proba)
        mse_cols["blmmse_mfa"].append(stages.nmse(res, h_val))
        if cfg.eval_rate:
            rate_cols["mfa_rstat"].append(
                stages.rate(res, h_val, cov, snr, cfg.n_bits,
                            quantizers[snr]))
    if verbose:
        print(f"blmmse_mfa: mse={mse_cols['blmmse_mfa']}")
        if t_coh > 1:
            print(f"blmmse_mfa_coh: mse={mse_cols['blmmse_mfa_coh']}")

    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    out_dir = os.path.join(cfg.results_dir, "3gpp")
    coh_tag = f"_coh={t_coh}" if t_coh > 1 else ""
    model_tag = ("" if cfg.channel_model == "3gpp"
                 else f"_model={_model_tag(base)}")
    name = (f"{stamp}_ant={dim}{model_tag}_path={cfg.n_path}{coh_tag}"
            f"_train={cfg.n_train}_comp={cfg.n_components}"
            f"_pil={cfg.n_pilots}_bits={cfg.n_bits}"
            f"_sums={cfg.n_summands_or_proba}_L={cfg.latent_dim}"
            f"_PPCA={cfg.ppca}_lockpsi={cfg.lock_psis}"
            f"_ptype={cfg.pilot_type}_qtype={cfg.quantizer_type}"
            f"_0mean={cfg.zero_mean}")
    cols = dict(mse_cols)
    if cfg.eval_rate:
        cols.update(rate_cols)
    qio.write_result_csv(os.path.join(out_dir, name + ".csv"), cfg.snrs, cols)
    timings = {"fit": fit_time, "total": time.time() - t_start}
    if auto_alpha:
        timings["coherence_alpha_by_snr"] = dict(alpha_by_snr)
    return mse_cols, rate_cols, timings


if __name__ == "__main__":
    run(MfaBenchConfig())
