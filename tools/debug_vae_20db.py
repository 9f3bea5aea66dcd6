"""Dissect the real-mode VAE 20 dB NaN (VERDICT round-1 weak item 1).

Loads the full-scale trained checkpoint, rebuilds the 20 dB eval exactly as
harness/run_vae.py does, and traces where non-finite values first appear.
Run on CPU (f32 like the TPU path): python tools/debug_vae_20db.py [snr]
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from quantized_channel_estimation_tpu.harness.run_gmm import (
        GmmBenchConfig, _get_data)
    from quantized_channel_estimation_tpu.harness import stages
    from quantized_channel_estimation_tpu.models import vae
    from quantized_channel_estimation_tpu.ops import linalg, pilots
    from quantized_channel_estimation_tpu.ops import quantizer as Q
    from quantized_channel_estimation_tpu.ops.bussgang import bank_gains_and_cov
    from quantized_channel_estimation_tpu.utils.checkpoint import (
        TrainCheckpointer)

    snr = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    cfg = None
    vcfg = vae.VaeConfig(n_antennas=64, n_pilots=1, latent_dim=16,
                         n_layers=4, vae_mode="real", zeromean=True,
                         fft_pre=True, n_pilot_convs=0, n_bits=2,
                         quantizer_type="uniform", lr=5e-4, batch_size=200,
                         epochs=500)
    key = jax.random.PRNGKey(0)
    k_data, k_fit, k_obs = jax.random.split(key, 3)
    base = GmmBenchConfig(n_antennas=64, n_path=3, n_train=100_000,
                          n_val=10_000, path_sigma=2.0,
                          cache_dir="results/saves", use_cache=True)
    channels, _ = _get_data(base, k_data)
    h_val = stages.tree_slice(channels, 100_000, 110_000)
    a = stages.pilot_matrix(64, 1, 2, "angle_amp")

    model, state = vae.init_vae(jax.random.split(k_fit)[0], vcfg)
    ckpt = TrainCheckpointer(
        "results/saves/vae_ckpt_real_ant=64_bits=2_train=100000_seed=0",
        max_to_keep=3)
    last = ckpt.latest_step()
    state = ckpt.restore(last, state)
    print(f"restored checkpoint at epoch {last + 1}")
    params = state.params

    snrs = (-10, -5, 0, 5, 10, 15, 20)
    i = snrs.index(snr)
    q = Q.design_quantizer(snr, 2, "uniform")
    r = stages.observe(jax.random.fold_in(k_obs, i), h_val, snr, a, 2, q)
    r = stages.to_numpy(r)
    h_np = stages.to_numpy(h_val)
    a_np = stages.to_numpy(a)
    r = jnp.asarray(r[:2048])
    h_np = h_np[:2048]
    aj = jnp.asarray(a_np)

    # --- manual replay of vae.estimate internals on one chunk ---
    n = 64
    sigma2 = 10.0 ** (-snr / 10.0)
    f = linalg.unitary_dft(n, r.dtype)
    x = vae.obs_to_input(vcfg, r)
    print("encoder input finite:", bool(jnp.all(jnp.isfinite(x))))
    mu_dec, log_prec = model.apply(params, x, method=vae.DnnVae.forward_nosamp)
    lp = np.asarray(log_prec)
    print(f"log_prec: finite={np.isfinite(lp).all()} min={lp.min():.2f} "
          f"max={lp.max():.2f}")
    var = jnp.clip(jnp.exp(-log_prec), 1e-12 * 1e2, 1e2)
    v = np.asarray(var)
    print(f"var: min={v.min():.3e} max={v.max():.3e} "
          f"n_at_ceiling={(v >= 99.9).sum()} n_at_floor={(v <= 1.1e-10).sum()}")
    ch = jnp.einsum("fd,bf,fe->bde", jnp.conj(f), var.astype(r.dtype), f)
    cy = jnp.einsum("md,bde,pe->bmp", aj, ch, jnp.conj(aj))
    m = aj.shape[0]
    cy = cy + sigma2 * jnp.eye(m, dtype=r.dtype)
    print("cy finite:", bool(jnp.all(jnp.isfinite(cy))))
    gains, cr = bank_gains_and_cov(cy, 2, q)
    g = np.asarray(gains)
    print(f"gains: finite={np.isfinite(g).all()} min={g.min():.3e} "
          f"max={g.max():.3e}")
    crn = np.asarray(cr)
    print(f"cr finite: {np.isfinite(crn).all()}")
    scale = jnp.mean(jnp.real(jnp.diagonal(cr, axis1=-2, axis2=-1)), axis=-1)
    crj = cr + (1e-6 * scale)[:, None, None] * jnp.eye(m, dtype=cr.dtype)
    # eigenvalue picture of the worst-conditioned sample
    crj64 = np.asarray(crj, np.complex128)
    ev = np.linalg.eigvalsh(crj64)
    print(f"crj eigs: min={ev.min():.3e} (sample {ev[:, 0].argmin()}) "
          f"max={ev.max():.3e} n_nonpsd={(ev[:, 0] <= 0).sum()}")
    cond = ev[:, -1] / np.maximum(ev[:, 0], 1e-300)
    print(f"cond: median={np.median(cond):.3e} max={cond.max():.3e}")
    a_eff = gains[..., :, None].astype(r.dtype) * aj
    ch_aeff = jnp.einsum("bde,bme->bdm", ch, jnp.conj(a_eff))
    x_sol = linalg.cho_solve_hermitian(crj, r)
    xs = np.asarray(x_sol)
    bad = ~np.isfinite(xs).all(axis=-1)
    print(f"cho_solve: n_bad={bad.sum()}/{xs.shape[0]}")
    est = np.asarray(jnp.einsum("bdm,bm->bd", ch_aeff, x_sol))
    badest = ~np.isfinite(est).all(axis=-1)
    print(f"estimates: n_bad={badest.sum()}")
    if badest.any():
        j = int(np.argmax(badest))
        print(f"first bad sample {j}: var range "
              f"[{v[j].min():.3e}, {v[j].max():.3e}], "
              f"cr diag range [{np.real(np.diag(crn[j])).min():.3e}, "
              f"{np.real(np.diag(crn[j])).max():.3e}], "
              f"min eig {ev[j, 0]:.3e}, cond {cond[j]:.3e}")
    good = ~badest
    mse_good = (np.abs(est[good] - h_np[good]) ** 2).sum() / h_np[good].size
    print(f"MSE over finite samples: {mse_good:.4f}")


if __name__ == "__main__":
    main()
