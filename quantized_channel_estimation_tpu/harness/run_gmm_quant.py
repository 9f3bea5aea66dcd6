"""Quantized-training GMM benchmark (reference `Bussgang_GMM_quant.py`):
GMM fitted by EM directly on quantized pilots at snr_train, evaluated at the
configured SNRs; MSE + rate lower bound to CSV.

Note: the reference crashes at CSV-save time on a never-set 'genie_gmm' key
(`Bussgang_GMM_quant.py:163`, documented in SURVEY §2.1); this harness writes
the same columns without that field.
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
from quantized_channel_estimation_tpu.models import gmm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.ops import scm
from quantized_channel_estimation_tpu.utils import io as qio


@dataclasses.dataclass(frozen=True)
class QuantGmmBenchConfig:
    n_antennas: int = 64
    n_components: int = 64
    n_summands_or_proba: Union[str, int, float] = "all"
    n_path: int = 1
    # channel model: '3gpp' | 'urban-macro' | 'mimo' (round-4: lifted from
    # run_gmm — the CSI-free quantized-EM can now train on macro/MIMO
    # pilots; see run_gmm.GmmBenchConfig.channel_model)
    channel_model: str = "3gpp"
    n_antennas_ms: int = 1
    # >1: block-shaped validation + the block-pooled 'blmmse_gmm_quant_coh'
    # column (see run_gmm.GmmBenchConfig.n_coherence); the CSI-free
    # TRAINING stream stays flattened (block pooling in the EM is a
    # measured no-op — PARITY_NOTES.md)
    n_coherence: int = 1
    # evidence-blend exponent for the coherent column; 'auto' selects per
    # SNR on held-out train blocks (see run_gmm.GmmBenchConfig)
    coherence_alpha: object = 1.0
    alpha_val_blocks: int = 1024
    n_pilots: int = 1
    n_bits: int = 2
    cov_type: str = "full"
    blocks: tuple = None
    pilot_type: str = "angle_amp"
    quantizer_type: str = "uniform"
    snrs: Sequence[float] = (5,)
    snr_train: float = 5.0
    max_iter: int = 100
    n_train: int = 100_000
    n_val: int = 10_000
    zero_mean_gmm: bool = True
    path_sigma: float = 2.0
    seed: int = 0
    eval_rate: bool = True
    results_dir: str = "results"
    cache_dir: str = "results/saves"
    use_cache: bool = True
    # FFT-domain structured estimation (round-4, see
    # run_gmm.GmmBenchConfig.use_structured_bank): quantized-trained
    # circulant fits produce exactly-circulant covariances, so the same
    # O(K D) bank applies to the CSI-free training path
    use_structured_bank: object = "auto"
    # mesh parallelism (round-5, see run_gmm.GmmBenchConfig.n_data_shards):
    # the CSI-free quantized-training EM runs data-parallel via
    # `fit_gmm_quant_shard_map` (recovery statistics psum like the
    # moments), estimation through the sharded stats merges.
    n_data_shards: int = 1
    n_component_shards: int = 1
    # spectra-NATIVE circulant trainer (round-5 frontier entry,
    # `gmm_quant.fit_circulant_spectra`): O(N K D)/iter with no dense
    # (K, D, D) anywhere — REQUIRED beyond D~1024 (the dense-recovery
    # path exhausts the device) at a measured 5-9% NMSE cost at small D
    # (PARITY_NOTES.md round-5). 'auto' engages it for circulant fits at
    # n_antennas >= 2048; True forces it (circulant only; implies the
    # structured estimation bank — there are no dense covariances to
    # serve from).
    use_spectra_fit: object = "auto"
    # STREAMED pilot datagen (round-5 frontier entry,
    # `stages.stream_quantized_pilots`): training channels are generated
    # and quantized slab-wise so the clean training set never
    # materializes — at D>=8192 holding 100k clean channels + pilots
    # exceeds HBM (the fit needs only the pilots). 'auto' engages it at
    # n_antennas >= 8192 for flat (n_coherence=1) 3gpp runs; True forces
    # it anywhere those conditions hold. The streamed draw is i.i.d.-valid
    # but NOT bit-identical to the dense path's single-key draw, and the
    # dataset cache is bypassed (there is no dense dataset to cache).
    stream_pilots: object = "auto"
    # EM scan chunk (memory knob, no math effect — gmm.GmmConfig.chunk_size).
    # 'auto': 4096 up to D=1024, 1024 to D=8192, then the largest
    # <=1024 divisor of n_train (an indivisible chunk pads the whole
    # (N, D) pilot array — 3.7 GB of pure copy at D=16384).
    em_chunk_size: object = "auto"


def _auto_em_chunk(dim: int, n_train: int) -> int:
    if dim <= 1024:
        return 4096
    if dim <= 8192:
        return 1024
    return max(c for c in (1024, 1000, 512, 500, 256, 250, 128, 100, 64, 1)
               if n_train % c == 0)


def run(cfg: QuantGmmBenchConfig, verbose: bool = True):
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
    base_cfg = GmmBenchConfig(
        n_antennas=cfg.n_antennas, n_path=cfg.n_path, n_train=cfg.n_train,
        channel_model=cfg.channel_model, n_antennas_ms=cfg.n_antennas_ms,
        n_val=cfg.n_val, path_sigma=cfg.path_sigma, cache_dir=cfg.cache_dir,
        use_cache=cfg.use_cache, n_coherence=t_coh)
    dim = channel_dim(base_cfg)
    stream = (cfg.stream_pilots if cfg.stream_pilots != "auto"
              else (dim >= 8192 and cfg.channel_model == "3gpp"
                    and t_coh == 1))
    if stream and (t_coh > 1 or cfg.channel_model != "3gpp"):
        raise ValueError("stream_pilots supports flat (n_coherence=1) "
                         "'3gpp' runs only")
    alpha_val_h = None
    if stream:
        # the clean TRAIN channels never materialize; only the small
        # validation set does (stages.stream_quantized_pilots)
        scm_cfg = scm.ScmConfig(cfg.n_antennas, cfg.n_path, cfg.path_sigma)
        h_val, _ = stages.generate_channels(
            jax.random.fold_in(k_data, 10_000), cfg.n_val, scm_cfg,
            chunk=stages.auto_gen_chunk(dim))
        h_train = None
    else:
        channels, _ = _get_data(base_cfg, k_data)
    if stream:
        pass
    elif t_coh > 1:
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
    all_snrs = sorted(set(list(cfg.snrs) + [cfg.snr_train]))
    quantizers = {snr: Q.design_quantizer(snr, cfg.n_bits, cfg.quantizer_type)
                  for snr in all_snrs}

    sigma2_train = 10.0 ** (-cfg.snr_train / 10.0)
    if stream:
        r_train, cov = stages.stream_quantized_pilots(
            k_data, jax.random.fold_in(k_obs, 999), cfg.n_train, scm_cfg,
            cfg.snr_train, a, cfg.n_bits, quantizers[cfg.snr_train],
            want_cov=cfg.eval_rate)
        if verbose:
            print(f"streamed pilot datagen: {cfg.n_train} rows at D={dim}")
    else:
        cov = stages.sample_cov(h_train)
        r_train = stages.observe(jax.random.fold_in(k_obs, 999), h_train,
                                 cfg.snr_train, a, cfg.n_bits,
                                 quantizers[cfg.snr_train])
    em_chunk = (cfg.em_chunk_size if cfg.em_chunk_size != "auto"
                else _auto_em_chunk(dim, cfg.n_train))
    gcfg = gmm.GmmConfig(n_components=cfg.n_components, cov_type=cfg.cov_type,
                         blocks=cfg.blocks, zero_mean=cfg.zero_mean_gmm,
                         max_iter=cfg.max_iter, chunk_size=em_chunk)
    spectra_fit = (cfg.use_spectra_fit if cfg.use_spectra_fit != "auto"
                   else (cfg.cov_type == "circulant"
                         and cfg.n_antennas >= 2048))
    if spectra_fit and cfg.cov_type != "circulant":
        raise ValueError("use_spectra_fit requires cov_type='circulant'")
    t0 = time.time()
    spectra = None
    if spectra_fit:
        from quantized_channel_estimation_tpu.ops.boundary import cjit
        from quantized_channel_estimation_tpu.models import (
            gmm_quant as gq, gmm as gmm_mod)
        if sharded:
            from quantized_channel_estimation_tpu.parallel import (
                mesh as pmesh_mod)
            sfit = cjit(lambda k, r, c, nb, s2, qq:
                        pmesh_mod.fit_circulant_spectra_shard_map(
                            sharded.mesh, k, r, c, nb, s2, qq),
                        static_argnums=(2, 3))(
                k_fit, r_train, gcfg, cfg.n_bits, sigma2_train,
                quantizers[cfg.snr_train])
        else:
            sfit = cjit(gq.fit_circulant_spectra, static_argnums=(2, 3))(
                k_fit, r_train, gcfg, cfg.n_bits, sigma2_train,
                quantizers[cfg.snr_train])
        spectra = sfit.spectra

        class _SpectraFit:
            """Result shim: the NMSE loop only touches params/weights and
            the convergence telemetry; covariances never densify."""
            import numpy as _np
            n_iter = sfit.n_iter
            lower_bound = sfit.lower_bound
            params = gmm_mod.GmmParams(
                sfit.weights, sfit.means,
                stages.from_numpy(
                    _np.zeros((cfg.n_components, 1, 1), _np.complex64)),
                stages.from_numpy(
                    _np.zeros((cfg.n_components, 1, 1), _np.complex64)))

        fit = _SpectraFit()
    elif sharded:
        fit = sharded.gmm_quant_fit(k_fit, r_train, gcfg, cfg.n_bits,
                                    sigma2_train, quantizers[cfg.snr_train])
    else:
        fit = stages.gmm_quant_fit(k_fit, r_train, gcfg, cfg.n_bits,
                                   sigma2_train, quantizers[cfg.snr_train])
    fit_time = time.time() - t0
    if verbose:
        print(f"quant-GMM fit: {int(fit.n_iter)} iters "
              f"lb={float(fit.lower_bound):.4f} ({fit_time:.1f}s)")

    # round-5: exact for ANY n_pilots (P>1 = per-bin P x P bank; the TP
    # mesh route carries the MP stats merge too)
    structured = (cfg.use_structured_bank if cfg.use_structured_bank
                  != "auto" else
                  cfg.cov_type in ("circulant", "block-circulant"))
    if spectra_fit and not structured:
        raise ValueError("use_spectra_fit produces no dense covariances — "
                         "use_structured_bank must stay on")

    mse_cols = {"blmmse_gmm_quant": []}
    rate_cols = {"blmmse_gmm_quant_rstat": []}
    alpha_by_snr = {}

    def coh_est(bank, rb, alpha):
        if structured:
            if sharded:
                return sharded.estimate_circulant(
                    bank, rb, cfg.n_summands_or_proba, cfg.blocks,
                    float(alpha))
            return stages.estimate_circulant_coherent(
                bank, rb, cfg.n_summands_or_proba, float(alpha), cfg.blocks)
        if sharded:
            return sharded.estimate_coherent(bank, rb,
                                             cfg.n_summands_or_proba,
                                             float(alpha))
        return stages.estimate_coherent_auto(bank, rb,
                                             cfg.n_summands_or_proba, alpha)

    def coherent_alpha(bank, snr, i):
        if not auto_alpha:
            return cfg.coherence_alpha
        if snr not in alpha_by_snr:
            from quantized_channel_estimation_tpu.models import gmm_estimator
            r_a = stages.observe(jax.random.fold_in(k_obs, 10_000 + i),
                                 alpha_val_h, snr, a, cfg.n_bits,
                                 quantizers[snr])
            scores = {}
            for al in gmm_estimator.DEFAULT_ALPHA_GRID:
                scores[float(al)] = stages.nmse(coh_est(bank, r_a, al),
                                                alpha_val_h)
            alpha_by_snr[snr] = min(scores, key=scores.get)
            if verbose:
                print(f"  alpha[{snr} dB] = {alpha_by_snr[snr]}")
        return alpha_by_snr[snr]

    if t_coh > 1:
        mse_cols["blmmse_gmm_quant_coh"] = []
        rate_cols["blmmse_gmm_quant_coh_rstat"] = []
    for i, snr in enumerate(cfg.snrs):
        k_snr = jax.random.fold_in(k_obs, i)
        if structured and spectra is not None:
            bank = stages.prepare_bank_circulant_spectra(
                fit.params, spectra, snr, a, cfg.n_bits, quantizers[snr],
                cfg.blocks)
        elif structured:
            bank = stages.prepare_bank_circulant(fit.params, snr, a,
                                                 cfg.n_bits,
                                                 quantizers[snr], cfg.blocks)
        else:
            bank = stages.prepare_bank(fit.params, snr, a, cfg.n_bits,
                                       quantizers[snr])
        if t_coh > 1:
            r_blocks = stages.observe(k_snr, h_val_blocks, snr, a,
                                      cfg.n_bits, quantizers[snr])
            r_val = stages.flatten_coherence(r_blocks)
            res_coh = stages.flatten_coherence(
                coh_est(bank, r_blocks, coherent_alpha(bank, snr, i)))
            mse_cols["blmmse_gmm_quant_coh"].append(
                stages.nmse(res_coh, h_val))
            if cfg.eval_rate:
                rate_cols["blmmse_gmm_quant_coh_rstat"].append(
                    stages.rate(res_coh, h_val, cov, snr, cfg.n_bits,
                                quantizers[snr], norm_clip=0.1))
        else:
            r_val = stages.observe(k_snr, h_val, snr, a, cfg.n_bits,
                                   quantizers[snr])
        if structured:
            if sharded:
                res = sharded.estimate_circulant(
                    bank, r_val, cfg.n_summands_or_proba, cfg.blocks)
            else:
                res = stages.estimate_circulant(bank, r_val,
                                                cfg.n_summands_or_proba,
                                                cfg.blocks)
        elif sharded:
            res = sharded.estimate(bank, r_val, cfg.n_summands_or_proba)
        else:
            res = stages.estimate_auto(bank, r_val, cfg.n_summands_or_proba)
        mse_cols["blmmse_gmm_quant"].append(stages.nmse(res, h_val))
        if cfg.eval_rate:
            rate_cols["blmmse_gmm_quant_rstat"].append(
                stages.rate(res, h_val, cov, snr, cfg.n_bits,
                            quantizers[snr], norm_clip=0.1))
    if verbose:
        print(f"mse={mse_cols['blmmse_gmm_quant']}")
        if t_coh > 1:
            print(f"mse_coh={mse_cols['blmmse_gmm_quant_coh']}")

    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    out_dir = os.path.join(cfg.results_dir, "3gpp")
    coh_tag = f"_coh={t_coh}" if t_coh > 1 else ""
    model_tag = ("" if cfg.channel_model == "3gpp"
                 else f"_model={_model_tag(base_cfg)}")
    base = (f"{stamp}_ant={dim}{model_tag}_path={cfg.n_path}{coh_tag}"
            f"_ntr={cfg.n_train // 1000}k_comp={cfg.n_components}"
            f"_pilots={cfg.n_pilots}_bits={cfg.n_bits}"
            f"_0mean={cfg.zero_mean_gmm}_sums={cfg.n_summands_or_proba}"
            f"_ptype={cfg.pilot_type}_qtype={cfg.quantizer_type}"
            f"_{cfg.cov_type}_snrtr={cfg.snr_train}")
    cols = dict(mse_cols)
    if cfg.eval_rate:
        cols.update(rate_cols)
    qio.write_result_csv(os.path.join(out_dir, base + ".csv"),
                         cfg.snrs, cols)
    timings = {"fit": fit_time, "total": time.time() - t_start}
    if auto_alpha:
        timings["coherence_alpha_by_snr"] = dict(alpha_by_snr)
    return mse_cols, rate_cols, timings


if __name__ == "__main__":
    run(QuantGmmBenchConfig())
