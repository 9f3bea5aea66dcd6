"""VAE-based channel estimator (reference `estimators/vae.py`, flax/optax).

Three training modes (`Bussgang_VAE.py:30-33`):
  genie: encoder input is the FFT-domain true channel (stacked real)
  noisy: encoder input is a quantized pilot observation (regenerated each
         epoch with per-sample random SNR); target is the true channel
  real:  encoder input is a quantized pilot observation + its SNR; no CSI —
         the quantization-aware conditionally-Gaussian ELBO supervises

Decoder parameterizes a conditionally-Gaussian channel prior in the FFT
domain: per-dim log-precisions (and means unless zeromean). Estimation
converts decoder outputs to Bussgang-LMMSE quantities: Ch = F^H diag(var) F,
Cy = A Ch A^H + s2 I, then the 1-bit arcsine / n-bit Bussgang Cr machinery
(`vae.py:376-431`), all batched.

TPU-first: observation regeneration runs on-device inside the jitted train
step (the reference's torch path round-trips GPU->CPU for np.digitize every
epoch, `utils.py:206-221` — SURVEY flags it as the known hot spot). Batches
are drawn with replacement exactly like the reference's
`next(iter(dataloader))` pattern (`vae.py:110-117`, intentional per SURVEY).
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from quantized_channel_estimation_tpu.ops import linalg, observation
from quantized_channel_estimation_tpu.ops.bussgang import (
    bank_gains_and_cov, bussgang_gain_diag)
from quantized_channel_estimation_tpu.ops.cplx import cplx2real, real2cplx
from quantized_channel_estimation_tpu.ops.precision import highest_precision
from quantized_channel_estimation_tpu.ops.quantizer import (
    ScalarQuantizer, is_inf_bits)


class VaeConfig(NamedTuple):
    n_antennas: int
    n_pilots: int = 1
    latent_dim: int = 16           # n_antennas // 4 (`Bussgang_VAE.py:73`)
    n_layers: int = 4
    vae_mode: str = "noisy"        # 'genie' | 'noisy' | 'real'
    zeromean: bool = True
    fft_pre: bool = True
    n_pilot_convs: int = 0         # max(0, n_pilots // 2) (`Bussgang_VAE.py:78`)
    n_bits: float = 2
    quantizer_type: str = "uniform"
    lr: float = 5e-4
    batch_size: int = 200
    epochs: int = 500
    steps_per_epoch: Optional[int] = None  # default: n_train // batch_size
    axis_name: Optional[str] = None  # data-parallel axis under shard_map:
    # each device draws its own batch from its shard (keys decorrelated by
    # axis index) and gradients/losses are pmean'd — SGD's gradient
    # all-reduce; effective batch = batch_size * n_devices


def _linspace_dims(a: int, b: int, n: int) -> Sequence[int]:
    return tuple(int(v) for v in np.linspace(a, b, n))


# torch nn.Linear's default weight init (kaiming_uniform(a=sqrt(5)) =
# U(+-sqrt(1/fan_in)), i.e. variance 1/(3 fan_in)) — the init the reference
# trains under. flax's default lecun_normal starts smaller and measurably
# converges slower: at the 40-epoch parity scale it left a systematic
# +6-10% estimation-MSE gap (seed spread +-0.2%, so not noise) that this
# init closes entirely (0.3066 vs reference 0.3078 @ 5 dB noisy mode;
# PARITY_NOTES.md).
_TORCH_LINEAR_INIT = nn.initializers.variance_scaling(1 / 3, "fan_in",
                                                      "uniform")


def _dense(d: int) -> nn.Dense:
    return nn.Dense(d, kernel_init=_TORCH_LINEAR_INIT)


class DnnVae(nn.Module):
    """Encoder/decoder MLPs with linearly interpolated widths
    (`vae.py:232-309`). Latent mean/log-std are the two halves of the last
    encoder layer; reparameterization uses exp(log-std) directly as the
    reference does (`vae.py:280-281`)."""
    cfg: VaeConfig

    def setup(self):
        c = self.cfg
        enc_dims = _linspace_dims(2 * c.n_antennas, 2 * c.latent_dim,
                                  c.n_layers + 1)
        self.enc_layers = [_dense(d) for d in enc_dims[1:]]
        out_dim = c.n_antennas if c.zeromean else 3 * c.n_antennas
        dec_dims = _linspace_dims(c.latent_dim, out_dim, c.n_layers + 1)
        self.dec_layers = [_dense(d) for d in dec_dims[1:]]
        pilot_dims = _linspace_dims(c.n_pilots, 1, c.n_pilot_convs + 1)
        self.pilot_layers = [_dense(d) for d in pilot_dims[1:]]

    def _pre_pilot(self, x):
        """1x1 conv stack collapsing the pilot axis (`vae.py:242-245`):
        x (B, P, 2N) -> (B, 2N). Empty for n_pilot_convs=0 (the reference's
        default with one pilot)."""
        if self.cfg.vae_mode == "genie" or x.ndim == 2:
            return x
        x = jnp.swapaxes(x, -1, -2)  # (B, 2N, P): mix over pilots per feature
        for layer in self.pilot_layers:
            x = nn.relu(layer(x))
        return x[..., 0] if x.shape[-1] == 1 else jnp.squeeze(
            jnp.swapaxes(x, -1, -2))

    def encode(self, x):
        x = self._pre_pilot(x)
        for i, layer in enumerate(self.enc_layers):
            x = layer(x)
            if i < len(self.enc_layers) - 1:
                x = nn.relu(x)
        half = x.shape[-1] // 2
        return x[..., :half], x[..., half:]  # (mu, log-std)

    def decode(self, z):
        x = z
        for i, layer in enumerate(self.dec_layers):
            x = layer(x)
            if i < len(self.dec_layers) - 1:
                x = nn.relu(x)
        if self.cfg.zeromean:
            return None, x  # log-precisions only
        n = self.cfg.n_antennas
        return x[..., :2 * n], x[..., 2 * n:]

    def __call__(self, x, key):
        mu_enc, log_std_enc = self.encode(x)
        eps = jax.random.normal(key, mu_enc.shape)
        z = mu_enc + jnp.exp(log_std_enc) * eps
        mu_dec, log_prec_dec = self.decode(z)
        return mu_enc, log_std_enc, mu_dec, log_prec_dec

    def forward_nosamp(self, x):
        """Deterministic forward (latent mean, no sampling) for estimation
        (`vae.py:294-309`)."""
        mu_enc, _ = self.encode(x)
        return self.decode(mu_enc)


def elbo_loss(cfg: VaeConfig, outputs, data_h, data_y, snr_list=None,
              q_tables=None):
    """Conditionally-Gaussian ELBO (`vae.py:312-365`); returns the negative
    mean ELBO (to minimize).

    `q_tables` (round-5): per-sample quantizer (thresholds (B, T),
    labels (B, L)) for the 'real'-mode quantization-aware likelihood with
    NON-uniform designs — the Bussgang gain then comes from the general
    threshold/label closed form (`bussgang.bussgang_gain_diag`'s sum,
    which is the reference's Lloyd formula `lloyd_max_quantizer.py:10-21`).
    The reference raises for Lloyd here (`vae.py:329-331`); supporting it
    is a strict superset."""
    mu_enc, log_std_enc, mu_dec, log_prec_dec = outputs
    if cfg.vae_mode == "real":
        sigma2 = 10.0 ** (-snr_list / 10.0)
        cy = jnp.exp(-log_prec_dec) + sigma2[:, None]
        if not is_inf_bits(cfg.n_bits):
            cy_diag = jnp.mean(cy, axis=1, keepdims=True)
            c = cy_diag[:, 0]
            if cfg.quantizer_type == "uniform":
                # per-sample uniform-step closed form, delta from each
                # sample's own SNR, applied at EVERY bit-width including 1
                # (the reference `get_Bussgang_matrix_diag_fast`,
                # `uniform_quantizer.py:101-111`, uses this formula at
                # 1 bit too — not the sign-quantizer gain)
                from quantized_channel_estimation_tpu.ops.quantizer import (
                    uniform_step)
                delta = uniform_step(snr_list, int(cfg.n_bits))  # (B,)
                idx = jnp.arange(1, 2 ** int(cfg.n_bits), dtype=jnp.float32)
                half = 2.0 ** int(cfg.n_bits) / 2.0
                expo = jnp.exp(-(delta ** 2)[:, None] * (idx - half) ** 2
                               / c[:, None])
                gains = (delta / jnp.sqrt(jnp.pi) / jnp.sqrt(c)
                         * jnp.sum(expo, axis=-1))
            else:
                # general per-sample threshold/label gain (Lloyd designs):
                # B = sum_j (l_j - l_{j-1}) exp(-tau_j^2 / c) / (sqrt(pi)
                # sqrt(c)) — beyond the reference, which raises for Lloyd
                if q_tables is None or q_tables[0] is None:
                    raise NotImplementedError(
                        "vae_mode='real' with a non-uniform quantizer needs "
                        "the per-sample quantizer tables (observe_random_snr"
                        "(return_tables=True))")
                thr, lab = q_tables
                label_steps = jnp.diff(lab, axis=-1)          # (B, T)
                expo = jnp.exp(-(thr ** 2) / c[:, None])
                gains = (jnp.sum(label_steps * expo, axis=-1)
                         / (jnp.sqrt(jnp.pi) * jnp.sqrt(c)))
            b2 = jnp.clip(gains ** 2, 0.0, 1.0)[:, None]  # (B, 1)
            cy = b2 * cy + (1.0 - b2) * cy_diag
        loss = jnp.sum(-jnp.log(cy), axis=1)
        w = data_y if cfg.zeromean else data_y - mu_dec
        inv = jnp.concatenate([1.0 / cy, 1.0 / cy], axis=1)
        loss = loss - jnp.sum(w * inv * w, axis=1)
    else:
        loss = jnp.sum(log_prec_dec, axis=1)
        w = data_h if cfg.zeromean else data_h - mu_dec
        lam = jnp.exp(jnp.concatenate([log_prec_dec, log_prec_dec], axis=1))
        loss = loss - jnp.sum(w * lam * w, axis=1)
    loss = loss + jnp.sum(log_std_enc, axis=1)
    loss = loss - 0.5 * jnp.sum(mu_enc ** 2, axis=1)
    loss = loss - 0.5 * jnp.sum(jnp.exp(2.0 * log_std_enc), axis=1)
    return -jnp.mean(loss)


# ---------------------------------------------------------------------------
# data preparation
# ---------------------------------------------------------------------------

def fft_stack(h: jax.Array) -> jax.Array:
    """FFT-domain stacked-real channels: [Re; Im](fft(h)/sqrt(N)) (B, 2N)."""
    n = h.shape[-1]
    return cplx2real(jnp.fft.fft(h, axis=-1) / math.sqrt(n), axis=-1).astype(
        jnp.float32)


def obs_to_input(cfg: VaeConfig, r: jax.Array) -> jax.Array:
    """Quantized observation (B, P*N) -> encoder input.

    noisy: Fortran-reshape to (B, N, P), transpose to (B, P, N), per-pilot FFT
    if fft_pre, stack reals -> (B, P, 2N) (`vae.py:48-52, 90-94`).
    real: FFT over the full observation vector, stack reals (`vae.py:100-101`).
    """
    n, p = cfg.n_antennas, cfg.n_pilots
    if cfg.vae_mode == "real":
        m = r.shape[-1]
        x = jnp.fft.fft(r, axis=-1) / math.sqrt(m) if cfg.fft_pre else r
        return cplx2real(x, axis=-1).astype(jnp.float32)
    x = r.reshape(-1, p, n)  # Fortran (B, N, P) then transpose == (B, P, N)
    if cfg.fft_pre:
        x = jnp.fft.fft(x, axis=-1) / math.sqrt(n)
    x = cplx2real(x, axis=-1).astype(jnp.float32)
    return x[:, 0, :] if p == 1 else x


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

class VaeTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def init_vae(key, cfg: VaeConfig):
    if cfg.vae_mode == "real" and cfg.n_pilots > 1:
        # single-pilot only, like the reference: its real mode feeds the
        # FULL flat observation (2NP reals) to an encoder declared with
        # in_features=2N (`vae.py:100-101,238-241`) and evaluates an N-dim
        # decoder likelihood against the 2NP-dim observation
        # (`vae.py:322-343`) — both shape-inconsistent for P > 1
        raise NotImplementedError(
            "vae_mode='real' supports n_pilots=1 only (the reference's "
            "real-mode architecture and likelihood are single-pilot)")
    model = DnnVae(cfg)
    if cfg.vae_mode == "genie":
        dummy = jnp.zeros((2, 2 * cfg.n_antennas), jnp.float32)
    elif cfg.vae_mode == "real":
        dummy = jnp.zeros((2, 2 * cfg.n_pilots * cfg.n_antennas), jnp.float32)
    else:
        dummy = (jnp.zeros((2, cfg.n_pilots, 2 * cfg.n_antennas), jnp.float32)
                 if cfg.n_pilots > 1
                 else jnp.zeros((2, 2 * cfg.n_antennas), jnp.float32))
    params = model.init(key, dummy, jax.random.PRNGKey(0))
    tx = optax.adam(cfg.lr)
    return model, VaeTrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def make_train_step(model: DnnVae, cfg: VaeConfig, a: Optional[jax.Array],
                    snrs: jax.Array, quantizers):
    """One SGD step on a freshly drawn batch: sample channels from the train
    set with replacement, generate the quantized observation on-device with a
    per-sample random SNR, compute the ELBO, update. Fully jitted."""
    tx = optax.adam(cfg.lr)

    def loss_fn(params, h_batch, key):
        from quantized_channel_estimation_tpu.ops.boundary import unpack
        a_c = unpack(a)  # pilot matrix may be Packed (re, im) at the boundary
        kobs, ksamp = jax.random.split(key)
        h_fft = fft_stack(h_batch)
        if cfg.vae_mode == "genie":
            out = model.apply(params, h_fft, ksamp)
            return elbo_loss(cfg, out, h_fft, None)
        r, snr, thr, lab = observation.observe_random_snr(
            kobs, h_batch, snrs, a_c, cfg.n_bits, quantizers,
            return_tables=True)
        x = obs_to_input(cfg, r)
        out = model.apply(params, x, ksamp)
        if cfg.vae_mode == "noisy":
            return elbo_loss(cfg, out, h_fft, None)
        return elbo_loss(cfg, out, None, x, snr_list=snr,
                         q_tables=(thr, lab))

    def _one_step(state: VaeTrainState, h_train, key):
        if cfg.axis_name is not None:
            # decorrelate the batch draw and observation noise across devices
            key = jax.random.fold_in(key, jax.lax.axis_index(cfg.axis_name))
        kidx, kloss = jax.random.split(key)
        idx = jax.random.randint(kidx, (cfg.batch_size,), 0, h_train.shape[0])
        h_batch = h_train[idx]
        loss, grads = jax.value_and_grad(loss_fn)(state.params, h_batch, kloss)
        if cfg.axis_name is not None:
            # gradient all-reduce; the NaN guard then fires identically on
            # every device (global mean loss), keeping params replicated
            grads = jax.lax.pmean(grads, cfg.axis_name)
            loss = jax.lax.pmean(loss, cfg.axis_name)
        # NaN/explosion guard: skip the update for bad batches
        # (`vae.py:120-128`). Harder than the reference's loss-only check:
        # the 'real'-mode likelihood's backward pass can spike to inf with a
        # FINITE loss (the quantization-gain term differentiates with a 1/c^2
        # factor), and one such batch permanently NaNs the parameters — seen
        # once in 500-epoch full-scale training. Guard the gradients too.
        grads_ok = jax.tree_util.tree_reduce(
            lambda acc, g: acc & jnp.all(jnp.isfinite(g)), grads,
            jnp.asarray(True))
        ok = jnp.isfinite(loss) & (loss < 1000.0) & grads_ok
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_params, state.params)
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), opt_state, state.opt_state)
        return VaeTrainState(params, opt_state, state.step + 1), loss

    @jax.jit
    def step(state: VaeTrainState, h_train, key):
        from quantized_channel_estimation_tpu.ops.boundary import unpack
        return _one_step(state, unpack(h_train), key)

    @partial(jax.jit, static_argnums=(3,))
    def run_epoch(state: VaeTrainState, h_train, key, n_steps: int):
        """n_steps SGD steps in one lax.scan — a single dispatch per epoch
        (the per-step dispatch latency of a remote TPU runtime would
        otherwise dominate training time)."""
        from quantized_channel_estimation_tpu.ops.boundary import unpack
        h = unpack(h_train)

        def body(st, i):
            return _one_step(st, h, jax.random.fold_in(key, i))

        state, losses = jax.lax.scan(body, state, jnp.arange(n_steps))
        return state, jnp.mean(jnp.where(jnp.isfinite(losses), losses,
                                         jnp.nan))

    @partial(jax.jit, static_argnums=(4, 5))
    def run_epochs(state: VaeTrainState, h_train, key, epoch0,
                   n_steps: int, n_epochs: int):
        """A block of epochs in one dispatch (nested scans). Key schedule is
        identical to calling run_epoch per epoch with fold_in(key, epoch):
        the remote tunnel's ~28 ms round trip per dispatch otherwise adds
        ~15 s across a 500-epoch run."""
        from quantized_channel_estimation_tpu.ops.boundary import unpack
        h = unpack(h_train)

        def epoch_body(st, e):
            ekey = jax.random.fold_in(key, e)

            def body(st, i):
                return _one_step(st, h, jax.random.fold_in(ekey, i))

            st, losses = jax.lax.scan(body, st, jnp.arange(n_steps))
            return st, jnp.mean(jnp.where(jnp.isfinite(losses), losses,
                                          jnp.nan))

        return jax.lax.scan(epoch_body, state, epoch0 + jnp.arange(n_epochs))

    step.run_epoch = run_epoch
    step.run_epochs = run_epochs
    return step


def train(key, cfg: VaeConfig, h_train: jax.Array,
          a: Optional[jax.Array], snrs, quantizers,
          h_val: Optional[jax.Array] = None, verbose: bool = True,
          checkpoint_path: Optional[str] = None,
          checkpoint_every: int = 1, mesh=None):
    """Full training loop; returns (model, state, losses).

    With `checkpoint_path` (a directory), the FULL train state (params,
    Adam moments, step) is persisted every `checkpoint_every` epochs via
    the Orbax-backed TrainCheckpointer (atomic, step-numbered,
    retention-managed) and training resumes from the latest checkpoint —
    the equivalent of the reference's per-epoch torch.save of
    `{model, optim, ...}` (`vae.py:148-153`); resuming with a fresh
    optimizer would reset the Adam moments mid-run and converge to a
    different model than an uninterrupted run. Per-epoch losses are kept in
    a losses.json beside the checkpoints (variable length, host metadata).

    `mesh` (round-5): a `parallel.mesh` (data, component) mesh — training
    runs DATA-PARALLEL over the 'data' axis (channels sharded, per-device
    batch draws, gradients pmean'd per step; effective batch =
    cfg.batch_size * n_data_shards). Checkpoints and the returned state
    stay replicated, so single-device resume of a DP run (and vice versa)
    just works. The reference's VAE is single-GPU torch (SURVEY §2.4).

    Large-batch note (measured, 4-way virtual mesh, N=16/20 epochs): at a
    FIXED lr and epoch count the DP run takes n_data_shards-fold fewer
    optimizer steps per epoch, so it converges slower per epoch (loss
    10.1 vs 7.2 after 20 epochs in the probe) — standard SGD large-batch
    behavior, not divergence. Scale lr (~linearly in the shard count) or
    epochs when moving a tuned single-device config onto a mesh.
    """
    import json
    import os

    k_init, k_train = jax.random.split(key)
    model, state = init_vae(k_init, cfg)
    start_epoch = 0
    losses: list = []
    ckpt = None
    if checkpoint_path:
        from quantized_channel_estimation_tpu.utils.checkpoint import (
            TrainCheckpointer)
        ckpt = TrainCheckpointer(checkpoint_path, max_to_keep=3)
        last = ckpt.latest_step()
        if last is not None:
            state = ckpt.restore(last, state)
            with open(os.path.join(checkpoint_path, "losses.json")) as f:
                losses = json.load(f)[: last + 1]
            start_epoch = last + 1
            if verbose:
                print(f"resumed VAE checkpoint at epoch {start_epoch}")
    snrs_arr = jnp.asarray(snrs, jnp.float32)
    n_train = jax.tree_util.tree_leaves(h_train)[0].shape[0]
    if mesh is None:
        step = make_train_step(model, cfg, a, snrs_arr, quantizers)
        steps = cfg.steps_per_epoch or max(1, n_train // cfg.batch_size)
        run_block = lambda st, ep, nb: step.run_epochs(
            st, h_train, k_train, jnp.int32(ep), steps, nb)
    else:
        from quantized_channel_estimation_tpu.parallel import mesh as _pm
        n_dev = mesh.shape[_pm.DATA_AXIS]
        if n_train % n_dev:
            raise ValueError(f"n_train={n_train} must divide over "
                             f"{n_dev} data shards")
        # steps count matches the single-device run on the same data; each
        # step consumes cfg.batch_size rows PER DEVICE
        steps = cfg.steps_per_epoch or max(1, (n_train // n_dev)
                                           // cfg.batch_size)
        runners: dict = {}

        def run_block(st, ep, nb):
            if nb not in runners:
                runners[nb] = _pm.make_vae_epochs_runner(
                    mesh, model, cfg, a, snrs_arr, quantizers, steps, nb)
            return runners[nb](st, h_train, k_train, ep)
    # dispatch epochs in blocks (one jit call per block); checkpoints bound
    # the block so checkpoint_every semantics are preserved
    block = max(1, min(checkpoint_every if checkpoint_path else 25,
                       cfg.epochs))
    epoch = start_epoch
    while epoch < cfg.epochs:
        n_block = min(block, cfg.epochs - epoch)
        state, mean_losses = run_block(state, epoch, n_block)
        block_losses = np.clip(np.asarray(mean_losses), -np.inf, 1000.0)
        losses.extend(float(v) for v in block_losses)
        epoch += n_block
        if ckpt is not None and epoch % checkpoint_every == 0:
            ckpt.save(epoch - 1, state, force=True)
            with open(os.path.join(checkpoint_path, "losses.json"), "w") as f:
                json.dump([float(v) for v in losses], f)
        if verbose and (epoch // max(1, cfg.epochs // 10)
                        > (epoch - n_block) // max(1, cfg.epochs // 10)):
            print(f"epoch {epoch}/{cfg.epochs} loss={losses[-1]:.2f}")
    if ckpt is not None:
        ckpt.close()
    return model, state, losses


def estimate(model: DnnVae, params, cfg: VaeConfig, r: jax.Array,
             snr_db: float, a: jax.Array,
             q: Optional[ScalarQuantizer] = None,
             chunk_size: int = 512, jitter: float = 1e-6,
             h_true: Optional[jax.Array] = None,
             var_clip: float = 1e2, coherence: int = 1,
             structured: bool = False) -> jax.Array:
    """Bussgang-LMMSE estimation from decoder outputs (`vae.py:157-228,
    376-431`): per-sample conditional covariance Ch = F^H diag(var) F, then
    the standard per-bit Cr machinery and one batched solve.

    `structured=True` (round-4; requires A = x0*I, the P=1 pilot — caller
    asserts) exploits that the decoder's covariance is CIRCULANT by
    construction (it predicts FFT-domain per-dim variances): Cy, the
    Bussgang gain (constant diagonal => scalar per sample), Cr under all
    three quantization maps, and the per-sample LMMSE filter all stay
    circulant, so the O(B D^3) per-sample dense build + Cholesky solve
    collapses to elementwise DFT-domain algebra — O(B (D log D + D)).
    Same math as `models/structured_bank.py`, per SAMPLE instead of per
    component; matches the dense path to FFT rounding.

    Genie mode is genie-AIDED at evaluation: the encoder sees the true
    channel (`vae.py:203-204`), so pass `h_true`; the LMMSE combine still
    uses the quantized observation r. Other modes ignore `h_true`.

    `coherence=T > 1` treats r as T-snapshot coherence blocks laid out
    contiguously (rows t·T..t·T+T-1 share one angular PSD —
    `scm.ScmConfig(n_coherence)`); the decoder's predicted FFT-domain
    variances are POOLED (averaged) over each block before the LMMSE, a
    T-fold variance reduction of the shared-PSD estimate. Per-snapshot
    conditional means are NOT pooled (each snapshot is an independent
    channel draw). No reference analog (new design, like
    `gmm_estimator.estimate_coherent`).
    """
    n = cfg.n_antennas
    sigma2 = 10.0 ** (-snr_db / 10.0)
    f = linalg.unitary_dft(n, r.dtype)
    genie = cfg.vae_mode == "genie"
    if genie and h_true is None:
        raise ValueError("genie-mode estimation needs h_true (the reference's"
                         " genie VAE encoder sees the true channel at eval)")

    # full-f32 matmul precision for the whole per-chunk eval: the decoder's
    # per-sample Cy = A Ch A^H + s2 I is built by einsums, and under the
    # TPU's default bf16 multiplies the rounding noise on Cy entries of
    # scale ~diag(var) exceeds sigma2 at high SNR (20 dB: s2 = 0.01 against
    # conditional variances up to ~30), pushing the n-bit Cr OFF the PSD
    # cone — the Cholesky NaNs and the whole sweep point reads back NaN.
    # This was the round-1 "real-mode VAE fails at 20 dB" bug: the same
    # checkpoint evaluates finite (MSE 0.092, paper-ordered) on CPU f32,
    # and on TPU once pinned. Lower SNRs survive only because their larger
    # sigma2 dominates the bf16 noise. (CLAUDE.md TPU gotcha #4; the GMM
    # bank preparation pins the same algebra.)
    @highest_precision
    def chunk_fn(args):
        rc, hc = args
        x = fft_stack(hc) if genie else obs_to_input(cfg, rc)
        mu_dec, log_prec = model.apply(params, x,
                                       method=DnnVae.forward_nosamp)
        # clip BOTH ways: a degenerate decoder dim with very negative
        # log-precision otherwise yields var ~ e^{+large}, and the Cy/Cr
        # products overflow float32 / fail the Cholesky at high SNR even
        # though training stayed finite (seen at full scale). The default
        # var_clip=1e2 assumes the framework's unit-channel-power
        # convention (the quantizer step design `uniform_quantizer.py:44`
        # bakes in the same assumption), where 1e2 per FFT bin is already
        # "no information"; pass a larger var_clip for data deliberately
        # scaled to power >> 1.
        # fixed 1e-12 floor (the reference's `convert_dec_outputs` clip,
        # `vae.py:408`) — deliberately NOT scaled by var_clip, which only
        # bounds the ceiling (ADVICE round 1)
        var = jnp.clip(jnp.exp(-log_prec), 1e-12,
                       var_clip)  # (B, N) FFT-domain
        if coherence > 1:
            # chunk boundaries are block-aligned (asserted below), so the
            # reshape groups exactly the T snapshots of each block
            var = jnp.broadcast_to(
                jnp.mean(var.reshape(-1, coherence, n), axis=1,
                         keepdims=True),
                (var.shape[0] // coherence, coherence, n)
            ).reshape(var.shape)
        if cfg.zeromean or mu_dec is None:
            mu_h = jnp.zeros((rc.shape[0], n), rc.dtype)
        else:
            mu_h = real2cplx(mu_dec.astype(jnp.float32), axis=-1).astype(
                rc.dtype) @ jnp.conj(f)
        if structured:
            # per-SAMPLE circulant algebra (see docstring): spectra replace
            # the dense Ch/Cy/Cr builds and the Cholesky solve
            x0 = a[0, 0]
            sy = jnp.abs(x0) ** 2 * var + sigma2             # (B, D) real
            c0 = jnp.mean(sy, axis=-1)                       # (B,) diag(Cy)
            if is_inf_bits(cfg.n_bits):
                gains = jnp.ones_like(c0)
                spec_cr = sy
            elif cfg.n_bits == 1:
                gains = bussgang_gain_diag(c0, 1)
                row_y = (jnp.fft.fft(sy.astype(jnp.complex64), axis=-1)
                         / n) / c0[:, None].astype(jnp.complex64)
                row_r = (2.0 / jnp.pi) * (
                    jnp.arcsin(jnp.clip(jnp.real(row_y), -1.0, 1.0))
                    + 1j * jnp.arcsin(jnp.clip(jnp.imag(row_y), -1.0, 1.0)))
                spec_cr = jnp.maximum(
                    jnp.real(jnp.fft.ifft(row_r, axis=-1)) * n, 0.0)
            else:
                gains = bussgang_gain_diag(c0, cfg.n_bits, q)
                b2 = jnp.clip(gains, 0.0, 1.0)[:, None] ** 2
                spec_cr = b2 * sy + (1.0 - b2) * c0[:, None]
            # same RELATIVE jitter as the dense branch (Cr's diagonal is
            # its spectrum's mean for a circulant matrix)
            spec_cr = spec_cr + jitter * jnp.mean(spec_cr, axis=-1,
                                                  keepdims=True)
            sqrt_n = jnp.sqrt(1.0 * n).astype(jnp.float32)
            u = jnp.fft.fft(rc, axis=-1) / sqrt_n            # unitary F r
            muf = jnp.fft.fft(mu_h, axis=-1) / sqrt_n
            gx = gains.astype(rc.dtype)[:, None] * x0
            wf = (jnp.conj(gx) * (var / spec_cr).astype(rc.dtype))
            hf = muf + wf * (u - gx * muf)
            return jnp.fft.ifft(hf, axis=-1) * sqrt_n
        ch = jnp.einsum("fd,bf,fe->bde", jnp.conj(f), var.astype(rc.dtype), f)
        cy = jnp.einsum("md,bde,pe->bmp", a, ch, jnp.conj(a))
        m = a.shape[0]
        cy = cy + sigma2 * jnp.eye(m, dtype=rc.dtype)
        gains, cr = bank_gains_and_cov(cy, cfg.n_bits, q)
        a_eff = gains[..., :, None].astype(rc.dtype) * a
        mu_y = jnp.einsum("bmd,bd->bm", a_eff, mu_h)
        ch_aeff = jnp.einsum("bde,bme->bdm", ch, jnp.conj(a_eff))
        # per-sample RELATIVE jitter: Cr's scale varies per sample with the
        # decoder's conditional variances (unlike the prepared GMM banks),
        # and an absolute 1e-6 is nothing against a degenerate sample's
        # large-scale Cr — its f32 Cholesky NaNs
        scale = jnp.mean(jnp.real(jnp.diagonal(cr, axis1=-2, axis2=-1)),
                         axis=-1)
        crj = cr + (jitter * scale)[:, None, None] * jnp.eye(
            m, dtype=cr.dtype)
        x_sol = linalg.cho_solve_hermitian(crj, rc - mu_y)
        return mu_h + jnp.einsum("bdm,bm->bd", ch_aeff, x_sol)

    n_samples = r.shape[0]
    if coherence > 1:
        if n_samples % coherence:
            raise ValueError(f"coherence={coherence} needs row count "
                             f"{n_samples} to be a multiple of it (blocks "
                             f"laid out contiguously)")
        # align chunk boundaries to blocks so pooling never mixes blocks
        # (padding rows then also form whole all-zero blocks)
        chunk_size = max(coherence, chunk_size - chunk_size % coherence)
    n_chunks = -(-n_samples // chunk_size)
    pad = n_chunks * chunk_size - n_samples
    rp = jnp.pad(r, ((0, pad), (0, 0))).reshape(n_chunks, chunk_size, -1)
    h_in = h_true if genie else jnp.zeros((n_samples, n), r.dtype)
    hp = jnp.pad(h_in, ((0, pad), (0, 0))).reshape(n_chunks, chunk_size, -1)
    out = jax.lax.map(chunk_fn, (rp, hp))
    return out.reshape(n_chunks * chunk_size, -1)[:n_samples]
