"""Orbax training-checkpoint layer: save/restore/retention/resume."""
import jax
import jax.numpy as jnp
import numpy as np

from quantized_channel_estimation_tpu.models.gmm import GmmParams
from quantized_channel_estimation_tpu.utils.checkpoint import TrainCheckpointer


def _params(seed: float):
    k, d = 4, 8
    covs = (jnp.eye(d, dtype=jnp.complex64)[None] *
            jnp.arange(1, k + 1, dtype=jnp.float32)[:, None, None]) + 0j
    return GmmParams(
        weights=jnp.full((k,), 0.25, jnp.float32) + seed,
        means=jnp.zeros((k, d), jnp.complex64) + seed,
        covariances=covs * (1.0 + seed),
        prec_chol=covs,
    )


def test_save_restore_roundtrip(tmp_path):
    p = _params(0.0)
    with TrainCheckpointer(str(tmp_path / "ckpt")) as ckpt:
        assert ckpt.latest_step() is None
        assert ckpt.restore(None, p) is p  # fresh start is a no-op
        ckpt.save(3, p)
        ckpt.wait()
        assert ckpt.latest_step() == 3
        got = ckpt.restore(3, jax.tree_util.tree_map(jnp.zeros_like, p))
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert isinstance(got, GmmParams)


def test_retention_and_resume(tmp_path):
    with TrainCheckpointer(str(tmp_path / "ckpt"), max_to_keep=2) as ckpt:
        for step in range(5):
            ckpt.save(step, _params(float(step)))
        ckpt.wait()
        assert ckpt.latest_step() == 4
        steps = sorted(ckpt._mngr.all_steps())
        assert len(steps) <= 2 and steps[-1] == 4

    # a new manager over the same directory resumes from the latest step
    with TrainCheckpointer(str(tmp_path / "ckpt"), max_to_keep=2) as ckpt2:
        step = ckpt2.latest_step()
        assert step == 4
        got = ckpt2.restore(step, _params(0.0))
    np.testing.assert_allclose(np.asarray(got.weights),
                               np.asarray(_params(4.0).weights))
