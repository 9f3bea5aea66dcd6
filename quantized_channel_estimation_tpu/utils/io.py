"""Result CSV writers and dataset/model caches.

The CSV schema mirrors the reference so curves are directly comparable:
transposed tables with an 'SNR' header row and one column per estimator
(`Bussgang_GMM.py:65-73,312-332`). Caches are config-keyed .npz files
(the reference uses joblib/.npy keyed filenames, `Bussgang_GMM.py:83-96,
267-278`).
"""
from __future__ import annotations

import csv
import os
from typing import Dict, List, Sequence

import numpy as np


def write_result_csv(path: str, snrs: Sequence[float],
                     columns: Dict[str, Sequence[float]],
                     index_name: str = "SNR") -> None:
    """Write a transposed result table: first column SNR (or `index_name`),
    then one column per estimator, matching the reference layout."""
    rows: List[list] = [[index_name] + [str(s) for s in snrs]]
    for name, vals in columns.items():
        rows.append([name] + [repr(float(v)) for v in vals])
    rows = [list(r) for r in zip(*rows)]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        csv.writer(f, lineterminator="\n").writerows(rows)


def dataset_cache_path(root: str, n_antennas: int, model_type: str,
                       n_path: int, n_train: int, n_channels: int) -> str:
    return os.path.join(
        root, f"saved_data_ant={n_antennas}_model={model_type}"
              f"_paths={n_path}_ntrain={n_train}_nchan={n_channels}.npz")


def save_channels(path: str, channels: np.ndarray, toep: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, channels=channels, toep=toep)


def load_channels(path: str):
    data = np.load(path)
    return data["channels"], data["toep"]


def gmm_cache_path(root: str, n_antennas: int, n_components: int,
                   model_type: str, n_path: int, n_train: int,
                   cov_type: str, zero_mean: bool) -> str:
    return os.path.join(
        root, f"trained_gmm_ant={n_antennas}_comp={n_components}"
              f"_model={model_type}_paths={n_path}_ntrain={n_train}"
              f"_covtype={cov_type}_zeromean={zero_mean}.npz")


def save_pytree_npz(path: str, tree) -> None:
    """Persist a NamedTuple-of-arrays pytree as .npz (Orbax-free checkpoint;
    everything here is a flat bank of dense arrays)."""
    import jax
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, treedef=np.asarray(str(treedef), dtype=object),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_gmm_params(path: str):
    from quantized_channel_estimation_tpu.models.gmm import GmmParams
    data = np.load(path, allow_pickle=True)
    leaves = [data[f"leaf_{i}"] for i in range(4)]
    return GmmParams(*leaves)


def save_loss_plot(path: str, losses, val_losses=None) -> None:
    """Training-loss PNG like the reference's (`Bussgang_VAE.py:184-193`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    ax.plot(range(1, len(losses) + 1), losses, label="train-loss")
    if val_losses is not None:
        ax.plot(range(1, len(val_losses) + 1), val_losses, label="val-loss")
    ax.legend()
    ax.set_xlabel("Epoch")
    ax.set_ylabel("Loss")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def save_loglog_plot(path: str, x, series: Dict[str, Sequence[float]],
                     title: str = "", xlabel: str = "", ylabel: str = "") -> None:
    """Log-log comparison PNG like the reference's covariance-recovery figure
    (`Covariance_recovery.py:160-167`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    for name, vals in series.items():
        ax.loglog(x, vals, label=name)
    ax.legend()
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
