"""Checkpoint I/O: GmmParams npz round trip and resume integration."""
import jax
import jax.numpy as jnp
import numpy as np

from quantized_channel_estimation_tpu.models import gmm
from quantized_channel_estimation_tpu.ops import scm
from quantized_channel_estimation_tpu.utils import io as qio


def test_gmm_params_npz_roundtrip(tmp_path, key):
    h, _ = scm.generate_channels(key, 2000, scm.ScmConfig(8, 1))
    fit = gmm.fit(key, h, gmm.GmmConfig(n_components=2, max_iter=5))
    path = str(tmp_path / "gmm.npz")
    qio.save_pytree_npz(path, jax.tree_util.tree_map(np.asarray, fit.params))
    loaded = qio.load_gmm_params(path)
    for a, b in zip(jax.tree_util.tree_leaves(fit.params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_resume_from_npz(tmp_path, key):
    """The checkpoint-restart flow: fit -> save -> load -> fit_resume."""
    h, _ = scm.generate_channels(key, 4000, scm.ScmConfig(8, 1))
    cfg = gmm.GmmConfig(n_components=2, max_iter=4, tol=0.0)
    first = gmm.fit(key, h, cfg)
    path = str(tmp_path / "ckpt.npz")
    qio.save_pytree_npz(path, jax.tree_util.tree_map(np.asarray, first.params))
    params = jax.tree_util.tree_map(jnp.asarray, qio.load_gmm_params(path))
    resumed = gmm.fit_resume(params, h, cfg._replace(max_iter=10))
    assert float(resumed.lower_bound) >= float(first.lower_bound) - 1e-3


def test_result_csv_schema(tmp_path):
    path = str(tmp_path / "out.csv")
    qio.write_result_csv(path, [0, 10], {"est_a": [0.5, 0.1],
                                         "est_b": [0.6, 0.2]})
    rows = open(path).read().strip().split("\n")
    assert rows[0] == "SNR,est_a,est_b"
    assert rows[1].startswith("0,0.5")
