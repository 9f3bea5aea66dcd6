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
