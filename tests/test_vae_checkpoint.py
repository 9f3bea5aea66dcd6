"""VAE checkpoint/resume behavior."""
import jax
import numpy as np

from quantized_channel_estimation_tpu.models import vae
from quantized_channel_estimation_tpu.ops import pilots, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q

N_ANT = 8
SNRS = [0.0, 10.0]


def test_checkpoint_resume(tmp_path):
    key = jax.random.PRNGKey(50)
    h, _ = scm.generate_channels(key, 1200, scm.ScmConfig(N_ANT, 1))
    cfg = vae.VaeConfig(n_antennas=N_ANT, latent_dim=2, n_layers=2,
                        vae_mode="noisy", n_bits=2, batch_size=64,
                        epochs=2, steps_per_epoch=5)
    a = pilots.pilot_matrix(N_ANT, 1, 2)
    quantizers = [Q.design_quantizer(s, 2) for s in SNRS]
    ckpt = str(tmp_path / "vae_ckpt")

    _, state1, losses1 = vae.train(jax.random.PRNGKey(0), cfg, h, a, SNRS,
                                   quantizers, verbose=False,
                                   checkpoint_path=ckpt)
    assert len(losses1) == 2

    # resuming with more epochs continues from the checkpoint
    cfg3 = cfg._replace(epochs=3)
    _, state2, losses2 = vae.train(jax.random.PRNGKey(0), cfg3, h, a, SNRS,
                                   quantizers, verbose=False,
                                   checkpoint_path=ckpt)
    assert len(losses2) == 3
    np.testing.assert_allclose(losses2[:2], losses1, rtol=1e-6)

    # full-state restore (params + Adam moments + step): the resumed run
    # must be BIT-IDENTICAL to an uninterrupted 3-epoch run (batch keys fold
    # in the absolute epoch index). A params-only restore resets the Adam
    # moments mid-run and fails this.
    _, state3, losses3 = vae.train(jax.random.PRNGKey(0), cfg3, h, a, SNRS,
                                   quantizers, verbose=False)
    np.testing.assert_allclose(losses2, losses3, rtol=1e-6)
    for a2, a3 in zip(jax.tree_util.tree_leaves(state2.params),
                      jax.tree_util.tree_leaves(state3.params)):
        np.testing.assert_array_equal(np.asarray(a2), np.asarray(a3))
    for a2, a3 in zip(jax.tree_util.tree_leaves(state2.opt_state),
                      jax.tree_util.tree_leaves(state3.opt_state)):
        np.testing.assert_array_equal(np.asarray(a2), np.asarray(a3))
