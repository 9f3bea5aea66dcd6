"""cjit-wrapped pipeline stages shared by all harness runners.

Complex data never exists as a device buffer outside a jit trace: every stage
takes/returns Packed (re, im) pytrees (ops.boundary). This makes the same
harness code run on the real TPU (whose runtime has no complex buffer type)
and on CPU. Scalars returned to Python (MSE, rate) are real and forced to
host, which doubles as an honest completion barrier on the remote TPU
runtime.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from quantized_channel_estimation_tpu.estimators import blmmse, ls
from quantized_channel_estimation_tpu.models import (
    gmm, gmm_estimator, gmm_quant, mfa, mfa_bank, structured_bank)
from quantized_channel_estimation_tpu.ops import observation, pilots, scm
from quantized_channel_estimation_tpu.ops import scm_mimo
from quantized_channel_estimation_tpu.ops.boundary import (
    Packed, asnumpy, cjit, pack_tree)
from quantized_channel_estimation_tpu.utils import metrics


def tree_concat(trees, axis=0):
    """Concatenate a list of identically-structured pytrees leafwise."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=axis), *trees)


def tree_slice(tree, start, stop):
    """Leafwise [start:stop]. Packed leaves are real arrays, so plain
    slicing works on every backend (numpy views on host, cached XLA slices
    on device) — no per-call jit closure to retrace."""
    return jax.tree_util.tree_map(lambda x: x[start:stop], tree)


def tree_index(tree, i: int):
    """Row i of every leaf of a (possibly Packed) pytree."""
    return jax.tree_util.tree_map(lambda x: x[i], tree)


_gen = cjit(scm.generate_channels, static_argnums=(1, 2))
_gen_macro = cjit(scm.generate_channels_urban_macro, static_argnums=(1, 2))
_gen_mimo = cjit(scm_mimo.generate_channels_mimo, static_argnums=(1, 2))


def _chunked_gen(gen, key, n_batches: int, cfg, chunk: int):
    """Chunked channel generation around a cjit'd generator returning a
    tuple of batch-leading packed arrays."""
    n_chunks = -(-n_batches // chunk)
    keys = jax.random.split(key, n_chunks)
    outs = []
    done = 0
    for k in keys:
        res = gen(k, min(chunk, n_batches), cfg)
        n = min(chunk, n_batches - done)
        res = tuple(tree_slice(x, 0, n) for x in res)
        outs.append(res)
        done += n
    return tuple(tree_concat([o[i] for o in outs])
                 for i in range(len(outs[0])))


def generate_channels(key, n_batches: int, cfg: scm.ScmConfig, chunk=8192):
    """Chunked SCM channel generation, packed outputs (h, t)."""
    return _chunked_gen(_gen, key, n_batches, cfg, chunk)


def generate_channels_macro(key, n_batches: int, cfg: scm.UrbanMacroConfig,
                            chunk=8192):
    """Chunked urban-macro channel generation, packed outputs (h, t)."""
    return _chunked_gen(_gen_macro, key, n_batches, cfg, chunk)


def generate_channels_mimo(key, n_batches: int, cfg: scm_mimo.ScmMimoConfig,
                           chunk=4096):
    """Chunked Kronecker-MIMO generation, packed outputs (h, t_bs, t_ms)."""
    return _chunked_gen(_gen_mimo, key, n_batches, cfg, chunk)


_pilot_matrix_j = cjit(
    lambda n_ant, n_pil, n_bits, ptype, key: pilots.pilot_matrix(
        n_ant, n_pil, n_bits, ptype, key),
    static_argnums=(0, 1, 2, 3))


def pilot_matrix(n_antennas, n_pilots, n_bits, pilot_type="angle_amp",
                 key=None):
    """Packed pilot matrix; pilot_type='rand' needs a PRNG key."""
    if pilot_type == "rand" and key is None:
        key = jax.random.PRNGKey(0)
    return _pilot_matrix_j(n_antennas, n_pilots, n_bits, pilot_type, key)

sample_cov = cjit(lambda h: jnp.einsum("nd,ne->de", h, jnp.conj(h))
                  / h.shape[0])

# (B, T, N) coherence blocks -> (B*T, N) rows (+ per-block genie rows
# broadcast across snapshots when t is given) — the ONE place that owns the
# block-major snapshot-ordering contract (ops/scm.py:flatten_coherence)
flatten_coherence = cjit(scm.flatten_coherence)

# per-block genie rows (B, N) -> per-snapshot rows (B*T, N): each block's
# row repeated for its T snapshots (matches flatten_coherence's block-major
# ordering). Used for the MIMO pair (t_bs, t_ms), which flatten_coherence's
# single-t signature cannot carry.
repeat_blocks = cjit(lambda t, n_coh: jnp.repeat(t, n_coh, axis=0),
                     static_argnums=(1,))

observe = cjit(observation.observe, static_argnums=(4,))

# un-normalized sample-cov accumulator for the streamed datagen below
_cov_outer = cjit(lambda h: jnp.einsum("nd,ne->de", h, jnp.conj(h)))


def auto_gen_chunk(n_antennas: int) -> int:
    """D-aware SCM generation chunk: the generator's angle-grid FFT temps
    scale as chunk x D x n_grid floats (x~5 live buffers), so a fixed
    chunk OOMs HBM at frontier D — D=16384 with chunk 512 was measured
    18.9 GB (> 15.75 GB v5e). Keep chunk x D ~<= 2M elements (~4 GB of
    temps), floored at 128 rows (64 beyond D=32768, where even 128 rows
    is 16.8 GB of temps) so the MXU batch stays useful."""
    floor = 64 if n_antennas > 32768 else 128
    return max(floor, min(8192, (2048 * 1024) // max(1, n_antennas)))


def stream_quantized_pilots(k_data, k_obs, n_batches: int,
                            scm_cfg: scm.ScmConfig, snr_db, a, n_bits,
                            q=None, slab=None, gen_chunk=None,
                            want_cov=False):
    """Slab-streamed quantized-pilot datagen: per slab i the channels are
    drawn with fold_in(k_data, i), observed with fold_in(k_obs, i), and
    the clean slab is dropped before the next one is generated — the
    clean training set never exists as one buffer. That is what lets
    CSI-free circulant training reach D>=8192 on one chip (the one-shot
    datagen OOMs there; BASELINE.md round-5 frontier rows). The draw is a
    valid i.i.d. dataset but NOT bit-identical to the one-shot path's
    single-key draw, so streamed and dense runs agree statistically, not
    bitwise. With want_cov the sample covariance is accumulated slab-wise
    (same math as `sample_cov`, f32 summation order aside) so rate bounds
    stay available without clean channels.

    Reference analog: none — `Bussgang_GMM_quant.py:15-45` materializes
    the dense dataset before observing it.

    Returns (r, cov) with cov None unless want_cov.
    """
    if gen_chunk is None:
        gen_chunk = auto_gen_chunk(scm_cfg.n_antennas)
    if slab is None:
        slab = max(gen_chunk, (4096 * 2048) // max(1, scm_cfg.n_antennas))
    r_parts, cov_sum = [], None
    rows, i = 0, 0
    while rows < n_batches:
        n = min(slab, n_batches - rows)
        h_c, _ = generate_channels(jax.random.fold_in(k_data, i), n,
                                   scm_cfg, chunk=gen_chunk)
        r_parts.append(observe(jax.random.fold_in(k_obs, i), h_c,
                               snr_db, a, n_bits, q))
        if want_cov:
            c = _cov_outer(h_c)
            cov_sum = c if cov_sum is None else jax.tree_util.tree_map(
                lambda x, y: x + y, cov_sum, c)
        del h_c
        rows += n
        i += 1
    r = tree_concat(r_parts) if len(r_parts) > 1 else r_parts[0]
    cov = (None if not want_cov else
           jax.tree_util.tree_map(lambda x: x / n_batches, cov_sum))
    return r, cov


blmmse_global = cjit(blmmse.estimate_global, static_argnums=(4,))
blmmse_genie = cjit(blmmse.estimate_genie, static_argnums=(4,))
blmmse_genie_kron = cjit(blmmse.estimate_genie_kron, static_argnums=(5,))
ls_global = cjit(ls.estimate_global, static_argnums=(4,))

gmm_fit = cjit(gmm.fit, static_argnums=(2,))
gmm_fit_resume = cjit(gmm.fit_resume, static_argnums=(2,))
gmm_quant_fit = cjit(gmm_quant.fit, static_argnums=(2, 3, 6))
gmm_quant_fit_resume = cjit(gmm_quant.fit_resume, static_argnums=(3, 4))
mfa_fit = cjit(mfa.fit, static_argnums=(2,))
mfa_to_gmm = cjit(mfa.to_gmm_params, static_argnums=(1,))

prepare_bank = cjit(gmm_estimator.prepare_bank, static_argnums=(3,))
# FFT-domain structured banks (round-4): exact for circulant/block-circulant
# fits with the P=1 scaled-identity pilot; measured faster than the fused
# kernel at D=64 and 5.5x the dense path at D=1024 (BASELINE.md)
prepare_bank_circulant = cjit(
    lambda p_, snr, a_, nb, q_, blocks: structured_bank.prepare_bank_circulant(
        p_, snr, a_, nb, q_, blocks=blocks),
    static_argnums=(3, 5))
# spectra-fed variant (round-5): banks straight from
# `gmm_quant.fit_circulant_spectra` output — no dense covariances exist
prepare_bank_circulant_spectra = cjit(
    lambda p_, spec, snr, a_, nb, q_, blocks:
        structured_bank.prepare_bank_circulant(
            p_, snr, a_, nb, q_, blocks=blocks, spectra=spec),
    static_argnums=(4, 6))
estimate_circulant = cjit(
    lambda b, r, mode, blocks: structured_bank.estimate_circulant(
        b, r, mode, 16384, blocks),
    static_argnums=(2, 3))
estimate_circulant_coherent = cjit(
    lambda b, r, mode, alpha, blocks:
        structured_bank.estimate_circulant_coherent(
            b, r, mode, 4096, alpha, blocks),
    static_argnums=(2, 3, 4))
estimate = cjit(gmm_estimator.estimate, static_argnums=(2, 3))
estimate_coherent = cjit(gmm_estimator.estimate_coherent,
                         static_argnums=(2, 3, 4))
# Factored (low-rank+diagonal) MFA banks (round-4): exact for n-bit/inf-bit
# with the P=1 scaled-identity pilot; O(K D M) bank, O(N K D M) estimation
# (models/mfa_bank.py; 1-bit densifies — arcsine destroys low rank)
prepare_bank_factored = cjit(
    lambda p_, snr, a_, nb, q_: mfa_bank.prepare_bank_factored(
        p_, snr, a_, nb, q_),
    static_argnums=(3,))
estimate_factored = cjit(
    lambda b, r, mode: mfa_bank.estimate_factored(b, r, mode, 4096),
    static_argnums=(2,))
estimate_factored_coherent = cjit(
    lambda b, r, mode, alpha: mfa_bank.estimate_factored_coherent(
        b, r, mode, 1024, alpha),
    static_argnums=(2, 3))


_fused = None
_fused_topk = None


def estimate_auto(bank, r, mode):
    """'all' mode on a TPU backend -> fused Pallas kernel; int selection
    modes within the top-k kernel's eligibility (round-5:
    `pallas_kernels.estimate_fused_topk` — 19.2 M est/s top-1 vs 2.7 M
    einsum at K=D=64) -> the fused top-k kernel; anything else (float
    cumulative-p, oversized banks, CPU/GPU where the TPU kernel cannot
    lower) -> the einsum estimator."""
    import jax as _jax
    global _fused, _fused_topk
    if _jax.default_backend() != "tpu":
        return estimate(bank, r, mode)
    from quantized_channel_estimation_tpu.estimators import pallas_kernels
    if mode == "all":
        if _fused is None:
            _fused = cjit(lambda b, rr: pallas_kernels.estimate_fused(b, rr))
        return _fused(bank, r)
    if pallas_kernels.topk_kernel_eligible(bank, mode):
        if _fused_topk is None:
            _fused_topk = cjit(
                lambda b, rr, k: pallas_kernels.estimate_fused_topk(
                    b, rr, k),
                static_argnums=(2,))
        return _fused_topk(bank, r, int(mode))
    return estimate(bank, r, mode)


_fused_coh = None


def estimate_coherent_auto(bank, r, mode, alpha: float = 1.0):
    """Coherent analog of `estimate_auto`: 'all' mode on TPU takes the
    in-VMEM block-pooled kernel (incl. the alpha evidence blend),
    everything else the einsum coherent path."""
    import jax as _jax
    global _fused_coh
    if mode == "all" and _jax.default_backend() == "tpu":
        if _fused_coh is None:
            from quantized_channel_estimation_tpu.estimators import (
                pallas_kernels)
            _fused_coh = cjit(
                lambda b, rr, al: pallas_kernels.estimate_fused_coherent(
                    b, rr, alpha=al),
                static_argnums=(2,))
        return _fused_coh(bank, r, alpha)
    return estimate_coherent(bank, r, mode, 512, alpha)

class ShardedStages:
    """Mesh-parallel stage set for the harness runners (round-5): the
    user-facing benchmark sweeps can now run data/tensor-parallel without
    writing mesh code — the library-level parallelism of `parallel.mesh`
    (the TPU-native replacement for the reference's harness-level mp.Pool,
    `Bussgang_GMM.py:29-32`) is composed here behind the same Packed
    all-real boundaries as the single-device stages, so one harness code
    path runs on the virtual CPU mesh and a real TPU slice alike.

    Fits run data-parallel through the explicit-psum shard_map bodies
    (`fit_gmm_shard_map` / `fit_gmm_quant_shard_map` / `fit_mfa_shard_map`);
    'all'-mode estimation runs through the sharded online-softmax stats
    merges (`estimate_sharded_kernel` / `_circulant` / `_factored`: samples
    on 'data', component bank on 'component'); selection modes take the
    GSPMD einsum route (`estimate_sharded`). One instance per mesh holds
    the compiled-program cache (every wrapper is one cjit)."""

    def __init__(self, mesh):
        from quantized_channel_estimation_tpu.parallel import mesh as pm
        self.mesh = mesh
        self.n_data = mesh.shape[pm.DATA_AXIS]
        self.n_component = mesh.shape[pm.COMPONENT_AXIS]
        self.gmm_fit = cjit(
            lambda key, h, cfg: pm.fit_gmm_shard_map(mesh, key, h, cfg),
            static_argnums=(2,))
        self.gmm_quant_fit = cjit(
            lambda key, r, cfg, n_bits, sigma2, q:
                pm.fit_gmm_quant_shard_map(mesh, key, r, cfg, n_bits,
                                           sigma2, q),
            static_argnums=(2, 3))
        self.mfa_fit = cjit(
            lambda key, x, cfg: pm.fit_mfa_shard_map(mesh, key, x, cfg),
            static_argnums=(2,))
        self._est_all = cjit(
            lambda b, r, alpha: pm.estimate_sharded_kernel(
                mesh, b, r, coherence_alpha=alpha),
            static_argnums=(2,))
        self._est_mode = cjit(
            lambda b, r, mode, alpha: pm.estimate_sharded(
                mesh, b, r, mode, coherence_alpha=alpha),
            static_argnums=(2, 3))
        self._est_circ = cjit(
            lambda b, r, alpha, blocks: pm.estimate_sharded_circulant(
                mesh, b, r, coherence_alpha=alpha, blocks=blocks),
            static_argnums=(2, 3))
        self._est_fact = cjit(
            lambda b, r, alpha: pm.estimate_sharded_factored(
                mesh, b, r, coherence_alpha=alpha),
            static_argnums=(2,))

    def check_divisible(self, n_train: int, n_val: int, k: int):
        """Fail before any compute when the standard sweep's shapes cannot
        shard over this mesh."""
        if n_train % self.n_data or n_val % self.n_data:
            raise ValueError(
                f"n_train={n_train} and n_val={n_val} must divide over "
                f"{self.n_data} data shards")
        if k % self.n_component:
            raise ValueError(f"n_components={k} must divide over "
                             f"{self.n_component} component shards")

    def estimate(self, bank, r, mode):
        """Dense-bank sharded estimation (flat rows r (N, M))."""
        if mode == "all":
            return self._est_all(bank, r, 1.0)
        return self._est_mode(bank, r, mode, 1.0)

    def estimate_coherent(self, bank, r, mode, alpha=1.0):
        """Dense-bank sharded block estimation (r (B, T, M))."""
        if mode == "all":
            return self._est_all(bank, r, float(alpha))
        return self._est_mode(bank, r, mode, float(alpha))

    def estimate_circulant(self, bank, r, mode, blocks=None, alpha=1.0):
        """FFT-domain sharded estimation; the TP stats merge computes the
        dense 'all'-mode combine only."""
        if mode != "all":
            raise ValueError(
                "mesh-sharded structured estimation computes the 'all'-mode "
                f"stats merge (got mode={mode!r}); run selection modes "
                "single-device or through the dense sharded route")
        return self._est_circ(bank, r, float(alpha), blocks)

    def estimate_factored(self, bank, r, mode, alpha=1.0):
        """Factored-bank sharded estimation ('all'-mode stats merge)."""
        if mode != "all":
            raise ValueError(
                "mesh-sharded factored estimation computes the 'all'-mode "
                f"stats merge (got mode={mode!r}); run selection modes "
                "single-device or densify for the dense sharded route")
        return self._est_fact(bank, r, float(alpha))


_nmse = cjit(metrics.nmse)


def nmse(h_est, h) -> float:
    return float(_nmse(h_est, h))


def chunked_genie_nmse(r, t_val, h_val, snr_db, a, n_bits, q,
                       max_bytes: int = 1 << 28) -> float:
    """Genie-BLMMSE NMSE evaluated in chunks.

    The genie estimator builds a (batch, D, D) covariance stack per call —
    at D=512 a 2000-sample batch is ~4 GB per live tensor — so the batch is
    split into chunks whose covariance stack stays under `max_bytes`, and
    the per-chunk NMSEs are sample-count weighted (exact, since
    nmse = sum/size)."""
    n_val = h_val.shape[0]
    d = h_val.shape[-1]
    chunk = max(1, min(n_val, max_bytes // (8 * d * d)))
    total = 0.0
    for i0 in range(0, n_val, chunk):
        i1 = min(i0 + chunk, n_val)
        h_gen = blmmse_genie(tree_slice(r, i0, i1),
                             tree_slice(t_val, i0, i1),
                             snr_db, a, n_bits, q)
        total += nmse(h_gen, tree_slice(h_val, i0, i1)) * (i1 - i0) / n_val
    return total


def _rate(h_est, h, cov, snr_db, n_bits, q, norm_clip):
    b, cq = metrics.global_bussgang_stats(cov, snr_db, n_bits, q)
    return metrics.rate_lower_bound(h_est, h, b, cq, norm_clip)


_rate_j = cjit(_rate, static_argnums=(4, 6))


def rate(h_est, h, cov, snr_db, n_bits, q, norm_clip=None) -> float:
    return float(_rate_j(h_est, h, cov, snr_db, n_bits, q, norm_clip))


def _rate_mf(h_est, h, cov, snr_db, n_bits, q):
    b, cq = metrics.global_bussgang_stats(cov, snr_db, n_bits, q)
    return metrics.rate_mf_bound(h_est, h, b, cq)


_rate_mf_j = cjit(_rate_mf, static_argnums=(4,))


def rate_mf(h_est, h, cov, snr_db, n_bits, q) -> float:
    """Matched-filter rate bound (`Bussgang_GMM.py:186-195`)."""
    return float(_rate_mf_j(h_est, h, cov, snr_db, n_bits, q))


def to_numpy(tree):
    """Packed pytree -> host numpy pytree (complex leaves recombined)."""
    return jax.tree_util.tree_map(asnumpy, tree,
                                  is_leaf=lambda x: isinstance(x, Packed))


def from_numpy(tree):
    """Host numpy pytree (possibly complex) -> packed device pytree."""
    return pack_tree(tree)
