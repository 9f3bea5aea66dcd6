"""3GPP spatial channel model (SCM) simulation, fully vectorized.

Synthesizes ULA channels by coloring white noise with the square root of an
angular power spectral density (wrapped Laplace mixture mapped through the
ULA arcsine transform), sampled on an oversampled frequency lattice.

Reference behavior: `modules/SCM3GPP/scm_helper.py` + `SCMMulti.py`. The
reference loops over samples in Python (`SCMMulti.py:49-54`); here the whole
batch is one vmapped/jitted computation: (B, n_freq) spectra -> one batched
IFFT -> channels. Returns the channels and the first row of each sample's
Toeplitz covariance (the "genie" covariance used by genie-BLMMSE).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quantized_channel_estimation_tpu.ops.cplx import crandn

OVERSAMPLING = 100  # frequency oversampling factor (`scm_helper.py:48`)
LATTICE_EPS = 1.0 / 3.0  # offset avoiding +-pi samples (`scm_helper.py:53`)


class ScmConfig(NamedTuple):
    n_antennas: int
    n_path: int = 3
    path_sigma: float = 2.0  # angular spread (deg std) of each Laplace cluster
    n_coherence: int = 1


def _laplace_mixture(theta_deg: jax.Array, angles_deg: jax.Array,
                     weights: jax.Array, sigma: float) -> jax.Array:
    """Mixture of wrapped Laplace densities over angle (degrees).

    theta_deg: (..., F), angles/weights: (..., P). Scale = sigma/sqrt(2) so
    sigma is the angular standard deviation (`scm_helper.py:26-36`).
    """
    scale = sigma / jnp.sqrt(2.0)
    diff = theta_deg[..., :, None] - angles_deg[..., None, :]  # (..., F, P)
    diff = (diff + 180.0) % 360.0 - 180.0
    v = weights[..., None, :] / (2.0 * scale) * jnp.exp(-jnp.abs(diff) / scale)
    return jnp.sum(v, axis=-1)


def angular_psd(u: jax.Array, angles_deg: jax.Array, weights: jax.Array,
                sigma: float) -> jax.Array:
    """ULA spatial-frequency PSD: Laplace mixture in angle mapped through the
    arcsine transform u = pi sin(theta) (`scm_helper.py:17-23`)."""
    u = (u + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
    theta = jnp.degrees(jnp.arcsin(u / jnp.pi))
    v = (_laplace_mixture(theta, angles_deg, weights, sigma)
         + _laplace_mixture(180.0 - theta, angles_deg, weights, sigma))
    return jnp.degrees(2.0 * jnp.pi * v / jnp.sqrt(jnp.pi ** 2 - u ** 2))


def sample_psd(angles_deg: jax.Array, weights: jax.Array, n_antennas: int,
               sigma: float) -> jax.Array:
    """Sampled, clipped, energy-normalized PSD on the oversampled lattice.

    angles/weights: (..., P). Returns (..., F) with F = OVERSAMPLING * N.
    Near-infinite endfire energies are clipped at F (`scm_helper.py:61-69`)
    and total energy is normalized to F (`scm_helper.py:71-72`).
    """
    n_freq = OVERSAMPLING * n_antennas
    lattice = (jnp.arange(LATTICE_EPS, n_freq + LATTICE_EPS) / n_freq
               * 2.0 * jnp.pi - jnp.pi)
    fs = angular_psd(lattice, angles_deg, weights, sigma)
    fs = jnp.where(jnp.abs(fs) > n_freq, float(n_freq), fs)
    total = jnp.sum(fs, axis=-1, keepdims=True)
    return jnp.where(total > 0, fs / total * n_freq, fs)


def channel_from_psd(key: jax.Array, fs: jax.Array, n_antennas: int,
                     n_coherence: int = 1, dtype=jnp.complex64):
    """Color white noise by sqrt(PSD) and IFFT-truncate to the array
    (`scm_helper.py:74-82`).

    fs: (..., F). Returns (h, t): h (..., n_coherence, N) channels, t (..., N)
    the first row of the per-sample Toeplitz covariance.
    """
    n_freq = fs.shape[-1]
    x = crandn(key, fs.shape[:-1] + (n_coherence, n_freq), dtype=dtype)
    colored = jnp.sqrt(fs)[..., None, :].astype(dtype) * x
    h = jnp.fft.ifft(colored, axis=-1) * jnp.sqrt(jnp.asarray(n_freq, jnp.float32))
    h = h[..., :n_antennas].astype(dtype)
    t = (jnp.fft.fft(fs.astype(dtype), axis=-1) / n_freq)[..., :n_antennas]
    return h, t.astype(dtype)


def generate_channels(key: jax.Array, n_batches: int, cfg: ScmConfig,
                      dtype=jnp.complex64):
    """Generate a batch of SCM channels.

    Per sample: n_path cluster gains ~ U(0,1) normalized to sum 1, angles
    ~ U(-90, 90) degrees (`SCMMulti.py:49-52`). Returns
    (h (B, n_coherence, N) or (B, N) if n_coherence == 1, t (B, N)).
    """
    kg, ka, kx = jax.random.split(key, 3)
    gains = jax.random.uniform(kg, (n_batches, cfg.n_path))
    gains = gains / jnp.sum(gains, axis=-1, keepdims=True)
    angles = (jax.random.uniform(ka, (n_batches, cfg.n_path)) - 0.5) * 180.0
    fs = sample_psd(angles, gains, cfg.n_antennas, cfg.path_sigma)
    h, t = channel_from_psd(kx, fs, cfg.n_antennas, cfg.n_coherence, dtype)
    if cfg.n_coherence == 1:
        h = h[..., 0, :]
    return h, t


def flatten_coherence(h: jax.Array, t: jax.Array = None):
    """Flatten multi-snapshot channels (B, n_coherence, N) -> (B*n_coh, N)
    for the single-snapshot observation/estimation pipeline.

    Snapshots within a coherence block are INDEPENDENT channel draws
    sharing one angular PSD (`SCMMulti.py:30` returns (h, t) with a single
    Toeplitz row per block; `chan_from_spectrum` colors fresh noise per
    snapshot) — so each snapshot is a full-rank observation and the
    per-block genie covariance row t broadcasts across its snapshots,
    which is what this returns as the second element. The reference's
    scripts only ever run n_coherence=1; this is the natural extension for
    its estimators, all of which condition on a covariance, not a
    channel realization.
    """
    if h.ndim == 2:  # already single-snapshot
        return (h, t) if t is not None else h
    b, n_coh, n = h.shape
    h_flat = h.reshape(b * n_coh, n)
    if t is None:
        return h_flat
    t_flat = jnp.broadcast_to(t[:, None, :], (b, n_coh, t.shape[-1])).reshape(
        b * n_coh, -1)
    return h_flat, t_flat


class UrbanMacroConfig(NamedTuple):
    """3GPP urban-macro 15-degree parameterization.

    Values mirror `SCM3GPPMacro.set_urban_macro15_deg`
    (`modules/SCM3GPP/SCM3GPPMacro.py:19-28`) — lognormal delay/angular
    spreads, per-path shadow fading, and distance-dependent path loss over
    1000-1500 m. That file is dead code in the reference (unresolvable
    import); this is a working re-design.
    """
    n_antennas: int
    mu_as: float = 1.18     # lognormal angular-spread mean (log10 deg)
    eps_as: float = 0.21    # lognormal angular-spread std
    r_as: float = 1.3       # AoD spread multiplier
    path_sigma: float = 2.82843  # per-path Laplace angular spread (deg std)
    mu_ds: float = -6.18    # lognormal delay-spread mean (log10 s)
    eps_ds: float = 0.18    # lognormal delay-spread std
    r_ds: float = 1.7       # delay distribution multiplier
    eps_pl: float = 35.0    # 10 x path-loss exponent
    n_paths: int = 6
    n_coherence: int = 1
    min_dist: float = 1000.0  # m (`SCM3GPPMacro.py:71-72`)
    max_dist: float = 1500.0


def generate_channels_urban_macro(key: jax.Array, n_batches: int,
                                  cfg: UrbanMacroConfig, dtype=jnp.complex64):
    """Generate a batch of urban-macro channels (`SCM3GPPMacro.py:30-79`).

    Per sample: user angle ~ U(-60, 60) deg; delay spread DS lognormal;
    path delays exponential with rate 1/(r_DS DS), sorted and offset to 0
    (the reference also computes a chip-quantized copy `tau_quant` that it
    never uses — not reproduced); path powers exp-decaying over delay with
    3 dB lognormal shadow fading, normalized; per-path AoD offsets
    ~ N(0, (r_AS AS)^2) with AS lognormal, sorted by magnitude (keeping the
    reference's power/angle pairing); then the standard Laplace-PSD
    synthesis at `path_sigma`, scaled by a distance-drawn path-loss factor
    (h by sqrt(beta), genie row t by beta). The reference loops per sample
    in Python; here the whole batch is one vmapped program, and the
    exponential delays come from `jax.random.exponential` instead of
    `-log(U)` (exact same law, no log(0)).

    Returns (h (B, n_coherence, N) — coherence axis squeezed when
    n_coherence == 1 — and genie Toeplitz first rows t (B, N)).
    """
    kt, kd, ke, kz, ka, ko, kx, kr = jax.random.split(key, 8)
    b, p = n_batches, cfg.n_paths
    theta = (jax.random.uniform(kt, (b,)) - 0.5) * 120.0
    ds = 10.0 ** (cfg.mu_ds + cfg.eps_ds * jax.random.normal(kd, (b,)))
    tau = cfg.r_ds * ds[:, None] * jax.random.exponential(ke, (b, p))
    tau = jnp.sort(tau, axis=-1)
    tau = tau - tau[:, :1]
    exponent = -(cfg.r_ds - 1.0) / cfg.r_ds / ds
    shadow_db = 3.0 * jax.random.normal(kz, (b, p))
    powers = jnp.exp(exponent[:, None] * tau) * 10.0 ** (0.1 * shadow_db)
    powers = powers / jnp.sum(powers, axis=-1, keepdims=True)
    as_deg = 10.0 ** (cfg.mu_as + cfg.eps_as * jax.random.normal(ka, (b,)))
    aod = jax.random.normal(ko, (b, p)) * (cfg.r_as * as_deg)[:, None]
    aod = jnp.take_along_axis(aod, jnp.argsort(jnp.abs(aod), axis=-1), -1)
    fs = sample_psd(theta[:, None] + aod, powers, cfg.n_antennas,
                    cfg.path_sigma)
    h, t = channel_from_psd(kx, fs, cfg.n_antennas, cfg.n_coherence, dtype)
    dist = (jax.random.uniform(kr, (b,))
            * (cfg.max_dist - cfg.min_dist) + cfg.min_dist)
    path_loss_db = cfg.eps_pl * jnp.log10(dist / cfg.max_dist)
    beta = 10.0 ** (-0.1 * path_loss_db)
    h = h * jnp.sqrt(beta)[:, None, None].astype(dtype)
    t = t * beta[:, None].astype(dtype)
    if cfg.n_coherence == 1:
        h = h[..., 0, :]
    return h, t


def generate_channels_chunked(key: jax.Array, n_batches: int, cfg: ScmConfig,
                              chunk: int = 8192, dtype=jnp.complex64):
    """Chunked channel generation to bound the (B, 100*N) PSD intermediate in
    HBM; each chunk is one jitted call."""
    gen = jax.jit(generate_channels, static_argnums=(1, 2, 3))
    hs, ts = [], []
    n_done = 0
    keys = jax.random.split(key, -(-n_batches // chunk))
    for k in keys:
        n = min(chunk, n_batches - n_done)
        h, t = gen(k, chunk, cfg, dtype)
        hs.append(h[:n])
        ts.append(t[:n])
        n_done += n
    return jnp.concatenate(hs, axis=0), jnp.concatenate(ts, axis=0)
