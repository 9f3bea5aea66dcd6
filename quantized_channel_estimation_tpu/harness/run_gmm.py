"""Main benchmark harness: the TPU-native equivalent of `Bussgang_GMM.py`.

Evaluates global-Bussgang BLMMSE, Bussgang-LS, genie-Bussgang BLMMSE, the
perfect-CSI rate anchor, and GMM-Bussgang over an SNR sweep; writes the same
transposed MSE/rate CSV tables as the reference (`Bussgang_GMM.py:312-332`).

The reference parallelizes over SNR points with a multiprocessing pool; here
every estimator is one jitted batched computation per SNR. All stages go
through `harness.stages` (packed-real boundaries), so the same code runs on
the real TPU chip and on CPU.
"""
from __future__ import annotations

import dataclasses
import datetime
import os
import time
from typing import Optional, Sequence, Union

import jax
import numpy as np

from quantized_channel_estimation_tpu.harness import stages
from quantized_channel_estimation_tpu.models import em_driver, gmm, gmm_estimator
from quantized_channel_estimation_tpu.ops import scm
from quantized_channel_estimation_tpu.ops import scm_mimo
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.utils import io as qio


@dataclasses.dataclass(frozen=True)
class GmmBenchConfig:
    """Mirrors the reference's script constants (`Bussgang_GMM.py:34-63`)."""
    n_antennas: int = 64
    n_components: int = 64
    n_summands_or_proba: Union[str, int, float] = "all"
    # '3gpp' (SCMMulti), 'urban-macro' (SCM3GPPMacro redesign), or 'mimo'
    # (Kronecker SCMMulti_MIMO redesign; n_antennas = BS side,
    # n_antennas_ms = MS side, channel dim = product). n_path applies to all
    # models (the canonical urban-macro-15deg run uses n_path=6);
    # path_sigma applies to '3gpp' and the BS side of 'mimo' (urban-macro
    # fixes the per-path spread at 2.82843, the MS side of 'mimo' at 35).
    channel_model: str = "3gpp"
    n_antennas_ms: int = 1
    n_path: int = 1
    # >1: validation channels arrive as T-snapshot coherence blocks sharing
    # one angular PSD (`SCMMulti.py:30`); classical estimators and the GMM
    # run per-snapshot on the flattened stream, and an extra
    # 'blmmse_gmm_coh' column evaluates block-pooled joint estimation
    # (`gmm_estimator.estimate_coherent` — new design, no reference
    # analog). n_train/n_val still count SNAPSHOTS and must divide by it.
    # Supported by all three channel models (urban-macro is the low-SNR
    # cell-edge regime where the block posterior pays most).
    n_coherence: int = 1
    # evidence-blend exponent for the coherent column: 1.0 = pure block
    # posterior (the Pallas kernel path), 0.0 = exactly independent;
    # interior values keep the per-snapshot hedge under model mismatch
    # (urban-macro >=0 dB — BASELINE.md / tools/coherent_temper_probe.py).
    # 'auto' selects alpha PER SNR on held-out train blocks (the best value
    # is SNR- and model-dependent, so any fixed deployment value leaves
    # measured wins on the table): the last alpha_val_blocks coherence
    # blocks of the train slice are withheld from the GMM fit, observed at
    # each SNR, and the DEFAULT_ALPHA_GRID value with the lowest validation
    # NMSE drives that SNR's coherent column (chosen alphas returned in
    # timings['coherence_alpha_by_snr']).
    coherence_alpha: Union[float, str] = 1.0
    alpha_val_blocks: int = 1024  # held-out blocks for 'auto' (capped at
    # a tenth of the train blocks)
    n_pilots: int = 1
    n_bits: Union[int, float] = 2
    cov_type: str = "full"
    blocks: Optional[tuple] = None
    pilot_type: str = "angle_amp"
    quantizer_type: str = "uniform"
    snrs: Sequence[float] = (-10, -5, 0, 5, 10, 15, 20)
    n_train: int = 100_000
    n_val: int = 10_000
    zero_mean_gmm: bool = True
    path_sigma: float = 2.0
    seed: int = 0
    eval_blmmse_genie: bool = True
    eval_blmmse_glob: bool = True
    eval_blmmse_gmm: bool = True
    eval_ls_glob: bool = True
    eval_rate: bool = True
    results_dir: str = "results"
    cache_dir: str = "results/saves"
    use_cache: bool = True
    # FFT-domain structured estimation (round-4): 'auto' uses the
    # O(K D + D log D)/sample circulant-bank path whenever it is EXACT —
    # cov_type circulant/block-circulant with the single-pilot
    # scaled-identity observation (any P=1 pilot type) — and the dense
    # path otherwise; True forces it (Toeplitz fits then ride the
    # Frobenius-best circulant approximation, +2.5% NMSE measured at
    # D=1024 — BASELINE.md), False forces dense
    use_structured_bank: Union[bool, str] = "auto"
    gmm_max_iter: int = 100
    # >1 splits the gmm_max_iter total budget into that many bounded program
    # executions (em_driver.fit_segmented) — for runtimes that bound
    # single-execution wall time at large D/K. Only cov types with
    # resumable state (full / toeplitz / block-toeplitz) support it.
    gmm_fit_segments: int = 1
    # Mesh parallelism for the sweep (round-5): devices used =
    # n_data_shards * n_component_shards on a (data, component) mesh
    # (`parallel.mesh.make_mesh`). The GMM fit runs data-parallel (psum'd
    # EM sufficient statistics over 'data', `fit_gmm_shard_map`);
    # estimation shards samples over 'data' and the prepared bank over
    # 'component' (pmax/psum online-softmax stats merge for 'all' mode,
    # GSPMD einsum for selection modes — `stages.ShardedStages`). 1 x 1 =
    # the single-device path; the reference's only parallelism is a
    # harness-level mp.Pool over SNR points (`Bussgang_GMM.py:29-32`).
    # n_train/n_val must divide by n_data_shards, n_components by
    # n_component_shards; gmm_fit_segments > 1 is single-device-only.
    n_data_shards: int = 1
    n_component_shards: int = 1


CHANNEL_MODELS = ("3gpp", "urban-macro", "mimo")


def channel_dim(cfg: GmmBenchConfig) -> int:
    """Dimension of the vectorized channel (N_BS * N_MS for 'mimo')."""
    if cfg.channel_model not in CHANNEL_MODELS:
        raise ValueError(f"channel_model={cfg.channel_model!r}; "
                         f"expected one of {CHANNEL_MODELS}")
    if cfg.channel_model == "mimo":
        return cfg.n_antennas * cfg.n_antennas_ms
    return cfg.n_antennas


def _model_tag(cfg: GmmBenchConfig) -> str:
    """Cache/result key for the channel model. MIMO embeds BOTH antenna
    counts — different (BS, MS) splits with the same product must not
    collide on one cache file."""
    tag = (f"mimo{cfg.n_antennas}x{cfg.n_antennas_ms}"
           if cfg.channel_model == "mimo" else cfg.channel_model)
    if cfg.n_coherence > 1:  # block-shaped dataset: distinct cache key
        return f"{tag}-coh{cfg.n_coherence}"
    return tag


def _get_data(cfg: GmmBenchConfig, key):
    """Load or generate the channel dataset.

    Returns packed (h, genie) where genie is the Toeplitz first rows t for
    '3gpp'/'urban-macro' and the pair (t_bs, t_ms) for 'mimo'.
    """
    n_channels = cfg.n_train + cfg.n_val
    path = qio.dataset_cache_path(cfg.cache_dir, channel_dim(cfg),
                                  _model_tag(cfg), cfg.n_path,
                                  cfg.n_train, n_channels)
    n_gen = n_channels // max(1, cfg.n_coherence)  # blocks, not rows
    if cfg.channel_model == "mimo":
        mimo_cfg = scm_mimo.ScmMimoConfig(cfg.n_antennas, cfg.n_antennas_ms,
                                          cfg.n_path,
                                          path_sigma_bs=cfg.path_sigma,
                                          n_coherence=cfg.n_coherence)
        if cfg.use_cache and os.path.exists(path):
            data = np.load(path)
            return (stages.from_numpy(data["channels"]),
                    (stages.from_numpy(data["toep_bs"]),
                     stages.from_numpy(data["toep_ms"])))
        h, t_bs, t_ms = stages.generate_channels_mimo(key, n_gen, mimo_cfg)
        if cfg.use_cache:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            np.savez(path, channels=stages.to_numpy(h),
                     toep_bs=stages.to_numpy(t_bs),
                     toep_ms=stages.to_numpy(t_ms))
        return h, (t_bs, t_ms)
    if cfg.use_cache and os.path.exists(path):
        channels, toep = qio.load_channels(path)
        return stages.from_numpy(channels), stages.from_numpy(toep)
    if cfg.channel_model == "urban-macro":
        # n_path is honored; path_sigma is NOT — urban-macro-15deg fixes the
        # per-path Laplace spread at 2.82843 (`SCM3GPPMacro.py:23`)
        macro_cfg = scm.UrbanMacroConfig(cfg.n_antennas, n_paths=cfg.n_path,
                                         n_coherence=cfg.n_coherence)
        h, t = stages.generate_channels_macro(key, n_gen, macro_cfg)
    else:
        scm_cfg = scm.ScmConfig(cfg.n_antennas, cfg.n_path, cfg.path_sigma,
                                n_coherence=cfg.n_coherence)
        h, t = stages.generate_channels(key, n_gen, scm_cfg)
    if cfg.use_cache:
        qio.save_channels(path, stages.to_numpy(h), stages.to_numpy(t))
    return h, t


def run(cfg: GmmBenchConfig, verbose: bool = True):
    """Run the benchmark; returns (mse_columns, rate_columns, timings)."""
    t_start = time.time()
    key = jax.random.PRNGKey(cfg.seed)
    k_data, k_gmm, k_obs = jax.random.split(key, 3)

    sharded = None
    if cfg.n_data_shards * cfg.n_component_shards > 1:
        from quantized_channel_estimation_tpu.parallel import (
            mesh as pmesh_mod)
        sharded = stages.ShardedStages(pmesh_mod.make_mesh(
            cfg.n_data_shards, cfg.n_component_shards))
        sharded.check_divisible(cfg.n_train, cfg.n_val, cfg.n_components)
        if cfg.gmm_fit_segments > 1:
            raise NotImplementedError(
                "gmm_fit_segments > 1 is single-device-only (the resume "
                "path has no shard_map wrapper)")

    t_coh = max(1, cfg.n_coherence)
    if t_coh > 1:
        if cfg.n_train % t_coh or cfg.n_val % t_coh:
            raise ValueError(
                f"n_train={cfg.n_train} and n_val={cfg.n_val} must be "
                f"multiples of n_coherence={t_coh} (they count snapshots)")

    auto_alpha = cfg.coherence_alpha == "auto"
    if auto_alpha and t_coh <= 1:
        raise ValueError("coherence_alpha='auto' requires n_coherence > 1 "
                         "(there is no coherent column to tune)")

    channels, toep = _get_data(cfg, k_data)
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
        toep_val_blocks = stages.tree_slice(toep, nb_train,
                                            nb_train + nb_val)
        if cfg.channel_model == "mimo":  # per-block (t_bs, t_ms) pair
            h_val = stages.flatten_coherence(h_val_blocks)
            toep_val = tuple(stages.repeat_blocks(tt, t_coh)
                             for tt in toep_val_blocks)
        else:
            h_val, toep_val = stages.flatten_coherence(h_val_blocks,
                                                       toep_val_blocks)
    else:
        h_train = stages.tree_slice(channels, 0, cfg.n_train)
        h_val = stages.tree_slice(channels, cfg.n_train,
                                  cfg.n_train + cfg.n_val)
        toep_val = stages.tree_slice(toep, cfg.n_train,
                                     cfg.n_train + cfg.n_val)

    dim = channel_dim(cfg)
    a = stages.pilot_matrix(dim, cfg.n_pilots, cfg.n_bits,
                            cfg.pilot_type)
    quantizers = {snr: Q.design_quantizer(snr, cfg.n_bits, cfg.quantizer_type)
                  for snr in cfg.snrs}

    # training sample covariance (`Bussgang_GMM.py:121-124`), one einsum
    cov = stages.sample_cov(h_train)

    mse_cols: dict = {}
    rate_cols: dict = {}
    timings: dict = {}

    obs_keys = {snr: jax.random.fold_in(k_obs, i)
                for i, snr in enumerate(cfg.snrs)}
    if t_coh > 1:
        # observe block-shaped so the coherent column sees real blocks;
        # every per-snapshot estimator consumes the flattened stream
        r_blocks_by_snr = {
            snr: stages.observe(obs_keys[snr], h_val_blocks, snr, a,
                                cfg.n_bits, quantizers[snr])
            for snr in cfg.snrs}
        r_by_snr = {snr: stages.flatten_coherence(r)
                    for snr, r in r_blocks_by_snr.items()}
    else:
        r_by_snr = {snr: stages.observe(obs_keys[snr], h_val, snr, a,
                                        cfg.n_bits, quantizers[snr])
                    for snr in cfg.snrs}

    def eval_algo(name, rate_name, est_fn, norm_clip=None):
        t0 = time.time()
        mses, rates = [], []
        for snr in cfg.snrs:
            res = est_fn(snr, r_by_snr[snr])
            mses.append(stages.nmse(res, h_val))
            if cfg.eval_rate:
                rates.append(stages.rate(res, h_val, cov, snr, cfg.n_bits,
                                         quantizers[snr], norm_clip))
        mse_cols[name] = mses
        if cfg.eval_rate:
            rate_cols[rate_name] = rates
        timings[name] = time.time() - t0
        if verbose:
            print(f"{name}: mse={[round(m, 5) for m in mses]} "
                  f"({timings[name]:.1f}s)")

    if cfg.eval_blmmse_glob:
        eval_algo("blmmse_glob", "blmmse_glob_rstat",
                  lambda snr, r: stages.blmmse_global(
                      r, cov, snr, a, cfg.n_bits, quantizers[snr]))

    if cfg.eval_ls_glob:
        # the reference writes two rate rows for LS: the per-sample matched-
        # filter bound and the statistical bound (`Bussgang_GMM.py:180-208`)
        ls_results = {}

        def ls_est(snr, r):
            ls_results[snr] = stages.ls_global(r, cov, snr, a, cfg.n_bits,
                                               quantizers[snr])
            return ls_results[snr]

        eval_algo("LS_glob", "LS_glob_stat", ls_est)
        if cfg.eval_rate:
            rate_cols["LS_glob_rstat_mf"] = [
                stages.rate_mf(ls_results[snr], h_val, cov, snr, cfg.n_bits,
                               quantizers[snr]) for snr in cfg.snrs]

    if cfg.eval_blmmse_genie:
        if cfg.channel_model == "mimo":
            # per-sample kron(toeplitz(t_ms), toeplitz(t_bs)) genie covariance
            eval_algo("blmmse_genie", "blmmse_genie_rstat",
                      lambda snr, r: stages.blmmse_genie_kron(
                          r, toep_val[0], toep_val[1], snr, a, cfg.n_bits,
                          quantizers[snr]))
        else:
            eval_algo("blmmse_genie", "blmmse_genie_rstat",
                      lambda snr, r: stages.blmmse_genie(
                          r, toep_val, snr, a, cfg.n_bits, quantizers[snr]))

    if cfg.eval_rate:
        # perfect-CSI anchor (`Bussgang_GMM.py:244-262`)
        rate_cols["perfect_rstat"] = [
            stages.rate(h_val, h_val, cov, snr, cfg.n_bits, quantizers[snr])
            for snr in cfg.snrs]

    if cfg.eval_blmmse_gmm:
        # under 'auto' the fit sees fewer snapshots (the alpha-validation
        # blocks are withheld), so the cache key must not collide with the
        # full-train fit
        n_train_fit = (nb_fit * t_coh) if t_coh > 1 else cfg.n_train
        gmm_path = qio.gmm_cache_path(cfg.cache_dir, dim,
                                      cfg.n_components, _model_tag(cfg),
                                      cfg.n_path,
                                      n_train_fit, cfg.cov_type,
                                      cfg.zero_mean_gmm)
        t0 = time.time()
        if cfg.use_cache and os.path.exists(gmm_path):
            params = stages.from_numpy(qio.load_gmm_params(gmm_path))
        else:
            segs = max(1, cfg.gmm_fit_segments)
            if segs > 1 and cfg.cov_type not in (
                    "full", "toeplitz", "block-toeplitz"):
                # fail BEFORE the (potentially multi-minute) first segment:
                # gmm.fit_resume would raise the same way only when the
                # second segment traces
                raise NotImplementedError(
                    f"gmm_fit_segments>1 requires a resumable cov_type "
                    f"('full', 'toeplitz', 'block-toeplitz'); got "
                    f"{cfg.cov_type!r}")
            if segs > 1 and cfg.gmm_max_iter < 1:
                # per_seg would be 0 and the segment count below divides
                # by it; a 0-iteration segmented fit is meaningless anyway
                raise ValueError(
                    f"gmm_fit_segments={segs} requires gmm_max_iter >= 1 "
                    f"(got {cfg.gmm_max_iter})")
            per_seg = -(-cfg.gmm_max_iter // segs)
            gcfg = gmm.GmmConfig(
                n_components=cfg.n_components, cov_type=cfg.cov_type,
                blocks=cfg.blocks, zero_mean=cfg.zero_mean_gmm,
                max_iter=per_seg)
            if segs == 1:
                fit = (sharded.gmm_fit(k_gmm, h_train, gcfg) if sharded
                       else stages.gmm_fit(k_gmm, h_train, gcfg))
            else:
                # prev.n_iter is the running TOTAL, so capping each resumed
                # segment at the remaining budget keeps the segmented fit's
                # total at exactly gmm_max_iter (ceil alone can overshoot
                # when segs does not divide it)
                fit = em_driver.fit_segmented(
                    lambda: stages.gmm_fit(k_gmm, h_train, gcfg),
                    lambda prev: stages.gmm_fit_resume(
                        prev.params, h_train, gcfg._replace(max_iter=min(
                            per_seg, cfg.gmm_max_iter - int(prev.n_iter)))),
                    n_segments=-(-cfg.gmm_max_iter // per_seg),
                    # segmented fits exist for big programs on remote
                    # runtimes, which transiently drop compiles — retry
                    max_retries=1)
            params = fit.params
            if verbose:
                print(f"GMM fit: {int(fit.n_iter)} iters, "
                      f"lb={float(fit.lower_bound):.4f}, "
                      f"converged={bool(fit.converged)}")
            if cfg.use_cache:
                qio.save_pytree_npz(gmm_path, stages.to_numpy(params))
        timings["gmm_fit"] = time.time() - t0

        # round-5: exact for ANY n_pilots — P=1 rides the scalar spectra
        # bank, P>1 the per-bin P x P LMMSE bank (CirculantBankMP)
        structured = (cfg.use_structured_bank if cfg.use_structured_bank
                      != "auto" else
                      cfg.cov_type in ("circulant", "block-circulant"))

        # per-SNR banks built once and shared between the blmmse_gmm and
        # blmmse_gmm_coh columns (the Cr Cholesky/filter preparation is
        # identical for both)
        banks = {}

        def get_bank(snr):
            if snr not in banks:
                if structured:
                    banks[snr] = stages.prepare_bank_circulant(
                        params, snr, a, cfg.n_bits, quantizers[snr],
                        cfg.blocks)
                else:
                    banks[snr] = stages.prepare_bank(params, snr, a,
                                                     cfg.n_bits,
                                                     quantizers[snr])
            return banks[snr]

        def gmm_est(snr, r):
            if structured:
                if sharded:
                    return sharded.estimate_circulant(
                        get_bank(snr), r, cfg.n_summands_or_proba,
                        cfg.blocks)
                return stages.estimate_circulant(get_bank(snr), r,
                                                 cfg.n_summands_or_proba,
                                                 cfg.blocks)
            if sharded:
                return sharded.estimate(get_bank(snr), r,
                                        cfg.n_summands_or_proba)
            return stages.estimate_auto(get_bank(snr), r,
                                        cfg.n_summands_or_proba)

        eval_algo("blmmse_gmm", "gmm_rstat", gmm_est, norm_clip=0.1)

        if t_coh > 1:
            alpha_by_snr = {}

            def coh_est(bank, rb, mode, alpha):
                if structured:
                    if sharded:
                        return sharded.estimate_circulant(
                            bank, rb, mode, cfg.blocks, float(alpha))
                    return stages.estimate_circulant_coherent(
                        bank, rb, mode, float(alpha), cfg.blocks)
                if sharded:
                    return sharded.estimate_coherent(bank, rb, mode,
                                                     float(alpha))
                return stages.estimate_coherent_auto(bank, rb, mode, alpha)

            def coherent_alpha(snr, i):
                """Per-SNR blend: fixed value, or 'auto' grid selection on
                the held-out train blocks (observed at this SNR with a key
                disjoint from the eval observations)."""
                if not auto_alpha:
                    return cfg.coherence_alpha
                if snr not in alpha_by_snr:
                    r_a = stages.observe(
                        jax.random.fold_in(k_obs, 10_000 + i), alpha_val_h,
                        snr, a, cfg.n_bits, quantizers[snr])
                    best, scores = None, {}
                    for al in gmm_estimator.DEFAULT_ALPHA_GRID:
                        h_hat = coh_est(get_bank(snr), r_a,
                                        cfg.n_summands_or_proba, float(al))
                        scores[float(al)] = stages.nmse(h_hat, alpha_val_h)
                    best = min(scores, key=scores.get)
                    alpha_by_snr[snr] = best
                    if verbose:
                        print(f"  alpha[{snr} dB] = {best} "
                              f"({ {k: round(v, 5) for k, v in scores.items()} })")
                return alpha_by_snr[snr]

            # block-pooled joint estimation over each coherence block —
            # the column the reference cannot produce
            def gmm_coh_est(snr, r):
                del r  # uses the block-shaped observations
                i = list(cfg.snrs).index(snr)
                return stages.flatten_coherence(coh_est(
                    get_bank(snr), r_blocks_by_snr[snr],
                    cfg.n_summands_or_proba, coherent_alpha(snr, i)))

            eval_algo("blmmse_gmm_coh", "gmm_coh_rstat", gmm_coh_est,
                      norm_clip=0.1)
            if auto_alpha:
                timings["coherence_alpha_by_snr"] = dict(alpha_by_snr)

    timings["total"] = time.time() - t_start

    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    model_tag = ("" if _model_tag(cfg) == "3gpp"
                 else f"_model={_model_tag(cfg)}")
    base = (f"{stamp}_ant={dim}{model_tag}_path={cfg.n_path}"
            f"_ntrain={cfg.n_train}_comp={cfg.n_components}"
            f"_pilots={cfg.n_pilots}_bits={cfg.n_bits}"
            f"_0mean={cfg.zero_mean_gmm}_sums={cfg.n_summands_or_proba}"
            f"_ptype={cfg.pilot_type}_qtype={cfg.quantizer_type}_{cfg.cov_type}")
    out_dir = os.path.join(cfg.results_dir, "3gpp")
    qio.write_result_csv(os.path.join(out_dir, base + ".csv"),
                         cfg.snrs, mse_cols)
    if cfg.eval_rate:
        qio.write_result_csv(os.path.join(out_dir, base + "_rate.csv"),
                             cfg.snrs, rate_cols)
    return mse_cols, rate_cols, timings


if __name__ == "__main__":
    run(GmmBenchConfig())
