"""Covariance-recovery benchmark: paper Fig. 2 reproduction (reference
`Covariance_recovery.py`).

NMSE of covariance estimation from quantized samples vs dataset size, for
(a) the proposed recovery (1-bit arcsine correlation x erf-model per-dim
    scales),
(b) the unquantized sample covariance,
(c) the naive quantized sample covariance.

The reference loops over samples and dimensions in Python with scipy
Gauss-Newton per dimension; here each Monte-Carlo run is one jitted batched
computation.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from quantized_channel_estimation_tpu.harness import stages
from quantized_channel_estimation_tpu.ops import cov_recovery, linalg, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.ops.cplx import crandn
from quantized_channel_estimation_tpu.utils import io as qio


@dataclasses.dataclass(frozen=True)
class CovRecoveryConfig:
    n_bits: int = 3
    quantizer_type: str = "uniform"
    n_dim: int = 64
    n_data_list: Sequence[int] = (10, 100, 1_000, 10_000, 100_000, 1_000_000)
    mc_runs: int = 10
    n_path: int = 1
    path_sigma: float = 2.0
    seed: int = 0
    results_dir: str = "results/cov_est_quant"


def run(cfg: CovRecoveryConfig, verbose: bool = True):
    from quantized_channel_estimation_tpu.ops.boundary import cjit
    key = jax.random.PRNGKey(cfg.seed)
    scm_cfg = scm.ScmConfig(cfg.n_dim, cfg.n_path, cfg.path_sigma)

    # per-MC-run covariance draw + its equivalent SNR (needed on the host to
    # design the quantizer) — one cjit, real outputs only
    def draw_covs(k_t, k_g):
        _, toep = scm.generate_channels(k_t, cfg.mc_runs, scm_cfg,
                                        dtype=jnp.complex64)
        covs = linalg.toeplitz_from_first_row(toep)
        loads = jnp.abs(jax.random.normal(k_g, (cfg.mc_runs,)))
        eye = jnp.eye(cfg.n_dim, dtype=covs.dtype)
        covs = covs + loads[:, None, None].astype(covs.dtype) * eye
        sigma2_avg = jnp.real(jnp.trace(covs, axis1=-2, axis2=-1)) / cfg.n_dim
        snr_eq = 10.0 * jnp.log10(1.0 / (sigma2_avg - 1.0))
        norm = jnp.mean(jnp.sum(jnp.abs(covs) ** 2, axis=(-2, -1)))
        return covs, snr_eq, norm

    draw_covs_j = cjit(draw_covs)

    def one_run(kr, kq, cov, q, n_data):
        """Sample n_data draws from cov, quantize, compute the three SSEs."""
        l = jnp.linalg.cholesky(cov)
        w = crandn(kr, (n_data, cfg.n_dim), dtype=cov.dtype)
        x = w @ l.T
        r = Q.quantize(x, cfg.n_bits, q)
        c_rec = cov_recovery.recover_covariance_from_samples(r, q, kq)
        c_unq = x.T @ jnp.conj(x) / n_data
        c_q = r.T @ jnp.conj(r) / n_data
        sse = lambda c: jnp.sum(jnp.abs(cov - c) ** 2)
        return sse(c_rec), sse(c_unq), sse(c_q)

    one_run_j = cjit(one_run, static_argnums=(4,))

    results = {"sampcov_quant": [], "sampcov_unquant": [], "Cov_est": []}
    for n_data in cfg.n_data_list:
        key, k_t, k_g = jax.random.split(key, 3)
        covs, snr_eq, norm = draw_covs_j(k_t, k_g)
        snr_eq = np.asarray(snr_eq)
        norm = float(norm)

        mse_rec = mse_unq = mse_q = 0.0
        for i in range(cfg.mc_runs):
            key, kr, kq = jax.random.split(key, 3)
            cov_i = stages.tree_index(covs, i)
            q = Q.design_quantizer(float(snr_eq[i]), cfg.n_bits,
                                   cfg.quantizer_type)
            s_rec, s_unq, s_q = one_run_j(kr, kq, cov_i, q, n_data)
            mse_rec += float(s_rec) / cfg.mc_runs
            mse_unq += float(s_unq) / cfg.mc_runs
            mse_q += float(s_q) / cfg.mc_runs
        results["Cov_est"].append(mse_rec / norm)
        results["sampcov_unquant"].append(mse_unq / norm)
        results["sampcov_quant"].append(mse_q / norm)
        if verbose:
            print(f"n_data={n_data}: recovered={mse_rec / norm:.4g} "
                  f"unquant={mse_unq / norm:.4g} quant={mse_q / norm:.4g}")

    os.makedirs(cfg.results_dir, exist_ok=True)
    path = os.path.join(
        cfg.results_dir,
        f"3gpp_path={cfg.n_path}_dim={cfg.n_dim}_bits={cfg.n_bits}"
        f"_mcs={cfg.mc_runs}_{cfg.quantizer_type}.csv")
    qio.write_result_csv(path, list(cfg.n_data_list), results)
    qio.save_loglog_plot(
        path.replace(".csv", ".png"), list(cfg.n_data_list), results,
        title=f"NMSE of estimated {cfg.n_dim}x{cfg.n_dim} cov "
              f"({cfg.n_bits}bit, {cfg.mc_runs}MC runs)",
        xlabel="data samples", ylabel="NMSE")
    return results


if __name__ == "__main__":
    run(CovRecoveryConfig())
