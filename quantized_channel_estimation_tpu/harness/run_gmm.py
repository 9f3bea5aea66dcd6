"""Main benchmark harness: the TPU-native equivalent of `Bussgang_GMM.py`.

Evaluates global-Bussgang BLMMSE, Bussgang-LS, genie-Bussgang BLMMSE, the
perfect-CSI rate anchor, and GMM-Bussgang over an SNR sweep; writes the same
transposed MSE/rate CSV tables as the reference (`Bussgang_GMM.py:312-332`).

The reference parallelizes over SNR points with a multiprocessing pool; here
every estimator is one jitted batched computation per SNR and the whole sweep
runs on one chip (or a mesh — see `parallel.mesh`).
"""
from __future__ import annotations

import dataclasses
import datetime
import os
import time
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from quantized_channel_estimation_tpu.estimators import blmmse, ls
from quantized_channel_estimation_tpu.models import gmm, gmm_estimator
from quantized_channel_estimation_tpu.ops import observation, pilots, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.utils import io as qio
from quantized_channel_estimation_tpu.utils.metrics import (
    global_bussgang_stats, nmse, rate_lower_bound)


@dataclasses.dataclass(frozen=True)
class GmmBenchConfig:
    """Mirrors the reference's script constants (`Bussgang_GMM.py:34-63`)."""
    n_antennas: int = 64
    n_components: int = 64
    n_summands_or_proba: Union[str, int, float] = "all"
    n_path: int = 1
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
    gmm_max_iter: int = 100


def _get_data(cfg: GmmBenchConfig, key):
    n_channels = cfg.n_train + cfg.n_val
    path = qio.dataset_cache_path(cfg.cache_dir, cfg.n_antennas, "3gpp",
                                  cfg.n_path, cfg.n_train, n_channels)
    if cfg.use_cache and os.path.exists(path):
        channels, toep = qio.load_channels(path)
        return jnp.asarray(channels), jnp.asarray(toep)
    scm_cfg = scm.ScmConfig(cfg.n_antennas, cfg.n_path, cfg.path_sigma)
    h, t = scm.generate_channels_chunked(key, n_channels, scm_cfg)
    if cfg.use_cache:
        qio.save_channels(path, np.asarray(h), np.asarray(t))
    return h, t


def run(cfg: GmmBenchConfig, verbose: bool = True):
    """Run the benchmark; returns (mse_columns, rate_columns, timings)."""
    t_start = time.time()
    key = jax.random.PRNGKey(cfg.seed)
    k_data, k_gmm, k_obs = jax.random.split(key, 3)

    channels, toep = _get_data(cfg, k_data)
    h_train = channels[:cfg.n_train]
    h_val = channels[cfg.n_train:cfg.n_train + cfg.n_val]
    toep_val = toep[cfg.n_train:cfg.n_train + cfg.n_val]

    a = pilots.pilot_matrix(cfg.n_antennas, cfg.n_pilots, cfg.n_bits,
                            cfg.pilot_type)
    quantizers = {snr: Q.design_quantizer(snr, cfg.n_bits, cfg.quantizer_type)
                  for snr in cfg.snrs}

    # training sample covariance (`Bussgang_GMM.py:121-124`), one einsum
    cov = jnp.einsum("nd,ne->de", h_train, jnp.conj(h_train)) / cfg.n_train

    mse_cols: dict = {}
    rate_cols: dict = {}
    timings: dict = {}

    def observe(snr, kk):
        return observation.observe(kk, h_val, snr, a, cfg.n_bits,
                                   quantizers[snr])

    def rate_of(res, snr, norm_clip=None):
        b_glob, cq_glob = global_bussgang_stats(cov, snr, cfg.n_bits,
                                                quantizers[snr])
        return float(rate_lower_bound(res, h_val, b_glob, cq_glob, norm_clip))

    obs_keys = {snr: jax.random.fold_in(k_obs, i)
                for i, snr in enumerate(cfg.snrs)}

    if cfg.eval_blmmse_glob:
        t0 = time.time()
        mses, rates = [], []
        for snr in cfg.snrs:
            r = observe(snr, obs_keys[snr])
            res = blmmse.estimate_global(r, cov, snr, a, cfg.n_bits,
                                         quantizers[snr])
            mses.append(float(nmse(res, h_val)))
            if cfg.eval_rate:
                rates.append(rate_of(res, snr))
        mse_cols["blmmse_glob"] = mses
        if cfg.eval_rate:
            rate_cols["blmmse_glob_rstat"] = rates
        timings["blmmse_glob"] = time.time() - t0
        if verbose:
            print(f"blmmse_glob: mse={mses} ({timings['blmmse_glob']:.1f}s)")

    if cfg.eval_ls_glob:
        t0 = time.time()
        mses, rates = [], []
        for snr in cfg.snrs:
            r = observe(snr, obs_keys[snr])
            res = ls.estimate_global(r, cov, snr, a, cfg.n_bits,
                                     quantizers[snr])
            mses.append(float(nmse(res, h_val)))
            if cfg.eval_rate:
                rates.append(rate_of(res, snr))
        mse_cols["LS_glob"] = mses
        if cfg.eval_rate:
            rate_cols["LS_glob_stat"] = rates
        timings["LS_glob"] = time.time() - t0
        if verbose:
            print(f"LS_glob: mse={mses} ({timings['LS_glob']:.1f}s)")

    if cfg.eval_blmmse_genie:
        t0 = time.time()
        mses, rates = [], []
        for snr in cfg.snrs:
            r = observe(snr, obs_keys[snr])
            res = blmmse.estimate_genie(r, toep_val, snr, a, cfg.n_bits,
                                        quantizers[snr])
            mses.append(float(nmse(res, h_val)))
            if cfg.eval_rate:
                rates.append(rate_of(res, snr))
        mse_cols["blmmse_genie"] = mses
        if cfg.eval_rate:
            rate_cols["blmmse_genie_rstat"] = rates
        timings["blmmse_genie"] = time.time() - t0
        if verbose:
            print(f"blmmse_genie: mse={mses} ({timings['blmmse_genie']:.1f}s)")

    if cfg.eval_rate:
        # perfect-CSI anchor (`Bussgang_GMM.py:244-262`)
        rate_cols["perfect_rstat"] = [rate_of(h_val, snr) for snr in cfg.snrs]

    if cfg.eval_blmmse_gmm:
        gmm_path = qio.gmm_cache_path(cfg.cache_dir, cfg.n_antennas,
                                      cfg.n_components, "3gpp", cfg.n_path,
                                      cfg.n_train, cfg.cov_type,
                                      cfg.zero_mean_gmm)
        t0 = time.time()
        if cfg.use_cache and os.path.exists(gmm_path):
            params = qio.load_gmm_params(gmm_path)
            params = jax.tree.map(jnp.asarray, params)
        else:
            gcfg = gmm.GmmConfig(
                n_components=cfg.n_components, cov_type=cfg.cov_type,
                blocks=cfg.blocks, zero_mean=cfg.zero_mean_gmm,
                max_iter=cfg.gmm_max_iter)
            fit = gmm.fit(k_gmm, h_train, gcfg)
            params = fit.params
            if verbose:
                print(f"GMM fit: {int(fit.n_iter)} iters, "
                      f"lb={float(fit.lower_bound):.4f}, "
                      f"converged={bool(fit.converged)}")
            if cfg.use_cache:
                qio.save_pytree_npz(gmm_path, params)
        timings["gmm_fit"] = time.time() - t0

        t0 = time.time()
        mses, rates = [], []
        for snr in cfg.snrs:
            r = observe(snr, obs_keys[snr])
            bank = gmm_estimator.prepare_bank(params, snr, a, cfg.n_bits,
                                              quantizers[snr])
            res = gmm_estimator.estimate(bank, r, cfg.n_summands_or_proba)
            mses.append(float(nmse(res, h_val)))
            if cfg.eval_rate:
                rates.append(rate_of(res, snr, norm_clip=0.1))
        mse_cols["blmmse_gmm"] = mses
        if cfg.eval_rate:
            rate_cols["gmm_rstat"] = rates
        timings["gmm_eval"] = time.time() - t0
        if verbose:
            print(f"blmmse_gmm: mse={mses} ({timings['gmm_eval']:.1f}s)")

    timings["total"] = time.time() - t_start

    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    base = (f"{stamp}_ant={cfg.n_antennas}_path={cfg.n_path}"
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
