"""Multi-chip sharding over a (data, component) mesh.

The reference's only parallelism is a per-machine multiprocessing.Pool over
SNR points (`Bussgang_GMM.py:29-32`); there is no distributed runtime at all
(SURVEY §2.4). The TPU-native replacements here:

  - EM training is data-parallel: channel samples are sharded over the 'data'
    mesh axis; the fused E+M scan produces per-shard sufficient statistics
    (Nk, sum r.x, sum r.xx^H) which XLA all-reduces when the (replicated)
    M-step consumes them — the EM analog of gradient all-reduce.
  - The GMM component bank (K axis) is sharded over the 'component' axis for
    bank preparation and estimation: each device prepares/applies its own
    components' LMMSE filters; the responsibility-weighted combine psums the
    partial estimates over 'component' (tensor-parallel analog).

Collectives ride ICI via jax.sharding + jit; nothing here issues explicit
NCCL/MPI-style calls.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Union

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quantized_channel_estimation_tpu.models import gmm, gmm_estimator
from quantized_channel_estimation_tpu.models.gmm import GmmConfig
from quantized_channel_estimation_tpu.models.gmm_estimator import PreparedBank

DATA_AXIS = "data"
COMPONENT_AXIS = "component"


def make_mesh(n_data: Optional[int] = None, n_component: int = 1,
              devices=None) -> Mesh:
    """Build a (data, component) mesh from the available devices."""
    devices = jax.devices() if devices is None else devices
    if n_data is None:
        n_data = len(devices) // n_component
    import numpy as np
    dev_array = np.asarray(devices[: n_data * n_component]).reshape(
        n_data, n_component)
    return Mesh(dev_array, (DATA_AXIS, COMPONENT_AXIS))


def shard_data(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Shard a sample-batched array over the 'data' axis."""
    return jax.device_put(
        x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))))


def shard_bank(mesh: Mesh, bank: PreparedBank) -> PreparedBank:
    """Shard every component-batched array of a PreparedBank over 'component'."""
    spec = lambda ndim: NamedSharding(mesh, P(COMPONENT_AXIS, *([None] * (ndim - 1))))
    return PreparedBank(*[jax.device_put(a, spec(a.ndim)) for a in bank])


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def fit_gmm_sharded(mesh: Mesh, key: jax.Array, h: jax.Array,
                    cfg: GmmConfig) -> gmm.GmmFitResult:
    """Data-parallel GMM EM: samples sharded over 'data', parameters
    replicated. XLA turns the sufficient-statistic contractions of the fused
    E+M scan into psums over the data axis."""
    h = shard_data(mesh, h)
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        return gmm.fit(key, h, cfg)


def fit_gmm_shard_map(mesh: Mesh, key: jax.Array, h: jax.Array,
                      cfg: GmmConfig) -> gmm.GmmFitResult:
    """Data-parallel GMM EM with EXPLICIT collectives: each device runs the
    fused E+M scan on its local shard, sufficient statistics are psum'd over
    the 'data' axis (gmm.accumulate_stats with cfg.axis_name), and the M-step
    runs replicated. One O(K D^2) all-reduce per EM iteration riding ICI.

    Both inits work: init='kmeans' (the default) runs the data-parallel
    k-means — psum'd centroid sums/counts, single-device-identical
    seeding (`models/kmeans.py`, round-4) — so DP training no longer
    gives up the k-means init quality every single-device parity result
    uses; init='random' stays bit-deterministic across layouts.
    """
    try:
        from jax import shard_map
        rep_kwargs = {"check_vma": False}
    except ImportError:  # older jax: experimental API, kwarg named check_rep
        from jax.experimental.shard_map import shard_map
        rep_kwargs = {"check_rep": False}

    cfg = cfg._replace(axis_name=DATA_AXIS)
    n_shards = mesh.shape[DATA_AXIS]
    assert h.shape[0] % n_shards == 0, (
        f"n_samples {h.shape[0]} must divide over {n_shards} data shards")

    def body(key, h_local):
        return gmm.fit.__wrapped__(key, h_local, cfg)

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, *([None] * (h.ndim - 1)))),
        out_specs=P(),
        **rep_kwargs)
    return jax.jit(mapped)(key, h)


def _shard_map_fn(mesh: Mesh, body, data_ndim: int, n_keys: int = 1):
    """shard_map wrapper: replicated keys/params, data sharded on 'data'."""
    try:
        from jax import shard_map
        rep_kwargs = {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map
        rep_kwargs = {"check_rep": False}
    in_specs = tuple([P()] * n_keys
                     + [P(DATA_AXIS, *([None] * (data_ndim - 1)))])
    return shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=P(),
                     **rep_kwargs)


def estimate_sharded_circulant(mesh: Mesh, bank, r: jax.Array,
                               chunk_size: int = 16384,
                               coherence_alpha: float = 1.0,
                               blocks=None,
                               use_kernel: Optional[bool] = None) -> jax.Array:
    """Tensor-parallel FFT-domain estimation: each device holds a K-shard
    of the `structured_bank.CirculantBank` (O(K D) floats — the whole
    shard trivially fits VMEM-side caches), computes the DFT-domain
    online-softmax state for its components, and the shards merge with the
    identical pmax + two psums as `estimate_sharded_kernel`. The inverse
    transform commutes with the per-row normalization, so it runs ONCE on
    the merged quotient per device. Per sample the collective payload is
    one f32 pair + one complex D-vector, independent of K — same as the
    dense TP route, with ~K x fewer local FLOPs. Rank-3 `r` = coherence
    blocks (per-block state at alpha=1, per-snapshot below).
    `use_kernel=None` picks the fused structured stats kernel
    (`pallas_kernels.estimate_fused_circulant_stats`) per shard on TPU for
    FLAT flat-basis requests, the XLA stats path otherwise — shards must
    share one implementation (the logit conventions differ by a
    row-constant)."""
    from quantized_channel_estimation_tpu.models import structured_bank as sb
    try:
        from jax import shard_map
        rep_kwargs = {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map
        rep_kwargs = {"check_rep": False}
    import jax.numpy as jnp

    n_k = mesh.shape[COMPONENT_AXIS]
    n_d = mesh.shape[DATA_AXIS]
    k_comp = bank.log_weights.shape[0]
    assert k_comp % n_k == 0, (k_comp, n_k)
    assert r.shape[0] % n_d == 0, (r.shape, n_d)
    spec = lambda ndim: NamedSharding(
        mesh, P(COMPONENT_AXIS, *([None] * (ndim - 1))))
    bank = type(bank)(*[jax.device_put(a, spec(a.ndim)) for a in bank])
    r = shard_data(mesh, r)
    coherent = r.ndim == 3
    multi_pilot = isinstance(bank, sb.CirculantBankMP)

    if use_kernel is None:
        use_kernel = (jax.default_backend() == "tpu" and not multi_pilot
                      and (not coherent or 1 < r.shape[1] <= 16))

    def body(bank_local, r_local):
        if multi_pilot:
            # per-bin P x P multi-pilot stats (round-5 late): same
            # pmax/psum merge, one post-merge inverse transform
            if coherent:
                m, den, acc = sb.estimate_circulant_mp_coherent_stats(
                    bank_local, r_local,
                    max(1, chunk_size // (4 * r_local.shape[1])),
                    coherence_alpha, blocks)
            else:
                m, den, acc = sb.estimate_circulant_mp_stats(
                    bank_local, r_local, max(1, chunk_size // 4), blocks)
        elif coherent and use_kernel:
            from quantized_channel_estimation_tpu.estimators import (
                pallas_kernels as pk)
            m, den, acc = pk.estimate_fused_circulant_coherent_stats(
                bank_local, r_local, coherence_alpha,
                interpret=jax.default_backend() != "tpu", blocks=blocks)
        elif coherent:
            m, den, acc = sb.estimate_circulant_coherent_stats(
                bank_local, r_local, max(1, chunk_size // r_local.shape[1]),
                coherence_alpha, blocks)
        elif use_kernel:
            from quantized_channel_estimation_tpu.estimators import (
                pallas_kernels as pk)
            m, den, acc = pk.estimate_fused_circulant_stats(
                bank_local, r_local,
                interpret=jax.default_backend() != "tpu")
        else:
            m, den, acc = sb.estimate_circulant_stats(bank_local, r_local,
                                                      chunk_size, blocks)
        m_star = jax.lax.pmax(m, COMPONENT_AXIS)
        w = jnp.exp(m - m_star)
        den = jax.lax.psum(den * w, COMPONENT_AXIS)
        expand = (1,) * (acc.ndim - w.ndim)
        wacc = w.reshape(w.shape + expand)
        acc = jax.lax.psum(acc * wacc.astype(acc.dtype), COMPONENT_AXIS)
        den_b = den.reshape(den.shape + expand)
        h_f = acc / den_b.astype(acc.dtype)
        return sb.unitary_ifft(h_f, blocks).astype(r_local.dtype)

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(COMPONENT_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        **rep_kwargs)
    return jax.jit(mapped)(bank, r)


def estimate_sharded_factored(mesh: Mesh, bank, r: jax.Array,
                              chunk_size: int = 4096,
                              coherence_alpha: float = 1.0,
                              use_kernel: Optional[bool] = None) -> jax.Array:
    """Tensor-parallel FACTORED (low-rank + diagonal) estimation: each
    device holds a K-shard of the `mfa_bank.FactoredBank` (O(K D M) floats),
    computes the online-softmax state for its components through the
    Woodbury pipeline (`estimate_factored_stats`), and the shards merge with
    the identical pmax + two psums as `estimate_sharded_kernel` /
    `estimate_sharded_circulant`. Per sample the collective payload is one
    f32 pair + one complex D-vector, independent of K — same as the other
    TP routes, with a D/(2M)-fold local-FLOP reduction over the dense one.
    Rank-3 `r` = coherence blocks (per-block state at alpha=1, per-snapshot
    below). `use_kernel=None` picks the fused factored stats kernel
    (`pallas_kernels.estimate_fused_factored_stats`) per shard on TPU for
    FLAT requests within the resident-VMEM gate, the XLA stats path
    otherwise (kernel and XLA shard states share one logit convention, so
    the merge is exact either way — unlike the circulant family, mixing is
    safe, but shards are homogeneous here anyway)."""
    from quantized_channel_estimation_tpu.estimators import (
        pallas_kernels as pk)
    from quantized_channel_estimation_tpu.models import mfa_bank as mb
    try:
        from jax import shard_map
        rep_kwargs = {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map
        rep_kwargs = {"check_rep": False}
    import jax.numpy as jnp

    n_k = mesh.shape[COMPONENT_AXIS]
    n_d = mesh.shape[DATA_AXIS]
    k_comp = bank.log_weights.shape[0]
    assert k_comp % n_k == 0, (k_comp, n_k)
    assert r.shape[0] % n_d == 0, (r.shape, n_d)
    k_sh, m_lat, d_dim = bank.t_mat.shape
    if use_kernel is None:
        use_kernel = (jax.default_backend() == "tpu" and r.ndim == 2
                      and pk._fact_kernel_eligible(d_dim, k_sh // n_k,
                                                   m_lat))
    spec = lambda ndim: NamedSharding(
        mesh, P(COMPONENT_AXIS, *([None] * (ndim - 1))))
    bank = type(bank)(*[jax.device_put(a, spec(a.ndim)) for a in bank])
    r = shard_data(mesh, r)
    coherent = r.ndim == 3

    def body(bank_local, r_local):
        if coherent:
            m, den, acc = mb.estimate_factored_coherent_stats(
                bank_local, r_local, max(1, chunk_size // r_local.shape[1]),
                coherence_alpha)
        elif use_kernel:
            m, den, acc = pk.estimate_fused_factored_stats(
                bank_local, r_local,
                interpret=jax.default_backend() != "tpu")
        else:
            m, den, acc = mb.estimate_factored_stats(bank_local, r_local,
                                                     chunk_size)
        m_star = jax.lax.pmax(m, COMPONENT_AXIS)
        w = jnp.exp(m - m_star)
        den = jax.lax.psum(den * w, COMPONENT_AXIS)
        expand = (1,) * (acc.ndim - w.ndim)
        wacc = w.reshape(w.shape + expand)
        acc = jax.lax.psum(acc * wacc.astype(acc.dtype), COMPONENT_AXIS)
        den_b = den.reshape(den.shape + expand)
        return (acc / den_b.astype(acc.dtype)).astype(r_local.dtype)

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(COMPONENT_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        **rep_kwargs)
    return jax.jit(mapped)(bank, r)


def kmeans_shard_map(mesh: Mesh, key: jax.Array, x: jax.Array, k: int,
                     max_iter: int = 50, tol: float = 1e-4):
    """Data-parallel k-means over the 'data' axis: psum'd centroid
    sums/counts per Lloyd step, single-device-identical k-means++ seeding
    (`models/kmeans.py` round-4). Returns (centers (K, D) replicated,
    labels (N,) gathered in global row order)."""
    from quantized_channel_estimation_tpu.models.kmeans import kmeans

    n_shards = mesh.shape[DATA_AXIS]
    assert x.shape[0] % n_shards == 0, (x.shape, n_shards)

    def body(key, x_local):
        res = kmeans(key, x_local, k, max_iter=max_iter, tol=tol,
                     axis_name=DATA_AXIS)
        return res.centers, jax.lax.all_gather(
            res.labels, DATA_AXIS, tiled=True)

    return jax.jit(_shard_map_fn(mesh, body, x.ndim))(key, x)


def fit_mfa_shard_map(mesh: Mesh, key: jax.Array, x: jax.Array, cfg):
    """Data-parallel MFA EM with explicit collectives: the MFA reduces to
    the same GMM-shaped sufficient statistics (models/mfa.py docstring), so
    the parallelism is the identical one O(K D^2) psum per iteration.
    Both zero-mean and nonzero-mean fits work — the means init runs the
    data-parallel k-means with single-device-identical seeding (round-5;
    the reference's canonical MFA fits means, `Bussgang_MFA.py:37-39` /
    `mofa_cplx_bussgang.py:219-243`). The axis name is set here."""
    from quantized_channel_estimation_tpu.models import mfa

    cfg = cfg._replace(axis_name=DATA_AXIS)
    n_shards = mesh.shape[DATA_AXIS]
    assert x.shape[0] % n_shards == 0, (x.shape, n_shards)

    def body(key, x_local):
        return mfa.fit.__wrapped__(key, x_local, cfg)

    return jax.jit(_shard_map_fn(mesh, body, x.ndim))(key, x)


def fit_gmm_quant_shard_map(mesh: Mesh, key: jax.Array, r: jax.Array,
                            cfg: GmmConfig, n_bits, sigma2, q=None):
    """Data-parallel quantized-training EM: the recovery statistics (1-bit
    requantized correlation, bin-occupancy counts) are data sums like the
    moments, so the whole covariance-recovery M-step runs replicated on
    psum'd statistics. Both inits work (the k-means init is data-parallel,
    like `fit_gmm_shard_map` — round-4)."""
    from quantized_channel_estimation_tpu.models import gmm_quant

    cfg = cfg._replace(axis_name=DATA_AXIS)
    n_shards = mesh.shape[DATA_AXIS]
    assert r.shape[0] % n_shards == 0, (r.shape, n_shards)

    def body(key, r_local):
        return gmm_quant.fit.__wrapped__(key, r_local, cfg, n_bits, sigma2, q)

    return jax.jit(_shard_map_fn(mesh, body, r.ndim))(key, r)


def make_vae_epochs_runner(mesh: Mesh, model, cfg, a, snrs, quantizers,
                           n_steps: int, n_epochs: int):
    """Build a compiled data-parallel VAE epoch-block runner: channels
    sharded over 'data', each device draws its own batches (keys
    decorrelated by axis index) and gradients are pmean'd per step — SGD's
    gradient all-reduce, the reference has no analog (single-GPU torch).
    Effective batch = cfg.batch_size * n_devices.

    Returns run(state, h_train, key, epoch0) -> (state, per-epoch mean
    losses), replicated. epoch0 is a DYNAMIC argument, so one compiled
    program serves every checkpoint block of the same length
    (`vae.train(mesh=...)` round-5)."""
    from quantized_channel_estimation_tpu.models import vae
    import jax.numpy as jnp

    try:
        from jax import shard_map
        rep_kwargs = {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map
        rep_kwargs = {"check_rep": False}

    cfg = cfg._replace(axis_name=DATA_AXIS)
    n_shards = mesh.shape[DATA_AXIS]
    step = vae.make_train_step(model, cfg, a, snrs, quantizers)

    def body(st, h_local, k, ep0):
        return step.run_epochs(st, h_local, k, ep0, n_steps, n_epochs)

    mapped = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(), P()),
        out_specs=P(),
        **rep_kwargs))

    def run(state, h_train, key, epoch0=0):
        n_rows = jax.tree_util.tree_leaves(h_train)[0].shape[0]
        assert n_rows % n_shards == 0, (n_rows, n_shards)
        return mapped(state, h_train, key, jnp.asarray(epoch0, jnp.int32))

    return run


def vae_run_epochs_shard_map(mesh: Mesh, model, cfg, a, snrs, quantizers,
                             state, h_train: jax.Array, key: jax.Array,
                             n_steps: int, n_epochs: int, epoch0: int = 0):
    """One-shot form of `make_vae_epochs_runner` (kept for tests/examples)."""
    run = make_vae_epochs_runner(mesh, model, cfg, a, snrs, quantizers,
                                 n_steps, n_epochs)
    return run(state, h_train, key, epoch0)


def fit_circulant_spectra_shard_map(mesh: Mesh, key: jax.Array,
                                    r: jax.Array, cfg: GmmConfig, n_bits,
                                    sigma2, q=None):
    """Data-parallel spectra-native circulant quantized EM (round-5): the
    frontier-D CSI-free trainer under shard_map — the per-iteration psum
    payload is O(K D) spectra statistics (vs O(K D^2) for the dense
    families), so the collective shrinks by a factor of D exactly where D
    is frontier-sized."""
    from quantized_channel_estimation_tpu.models import gmm_quant

    cfg = cfg._replace(axis_name=DATA_AXIS)
    n_shards = mesh.shape[DATA_AXIS]
    assert r.shape[0] % n_shards == 0, (r.shape, n_shards)

    def body(key, r_local):
        return gmm_quant.fit_circulant_spectra.__wrapped__(
            key, r_local, cfg, n_bits, sigma2, q)

    return jax.jit(_shard_map_fn(mesh, body, r.ndim))(key, r)


def estimate_sharded(mesh: Mesh, bank: PreparedBank, r: jax.Array,
                     mode: Union[str, int, float] = "all",
                     chunk_size: int = 2048,
                     coherence_alpha: float = 1.0) -> jax.Array:
    """Estimation with samples sharded over 'data' and the component bank
    sharded over 'component'. The weighted combine contracts over K, which
    XLA lowers to a psum over the component axis. GSPMD auto-sharding of the
    einsum estimator — supports every selection mode; for kernel-speed
    'all'-mode tensor parallelism use `estimate_sharded_kernel`.

    r of rank 3 is treated as (B, T, M) coherence blocks and routed through
    `gmm_estimator.estimate_coherent` (blocks sharded over 'data'; the
    block-pooled posterior's K-contractions psum over 'component' the same
    way)."""
    r = shard_data(mesh, r)
    bank = shard_bank(mesh, bank)
    if r.ndim == 3:
        # chunk_size counts SAMPLES on the flat path but BLOCKS in
        # estimate_coherent — the per-chunk (chunk, T, K, D) intermediate is
        # T-fold larger per block, so scale the block chunk down by T
        block_chunk = max(1, chunk_size // r.shape[1])
        return gmm_estimator.estimate_coherent(bank, r, mode, block_chunk,
                                               coherence_alpha)
    return gmm_estimator.estimate(bank, r, mode, chunk_size)


def estimate_sharded_kernel(mesh: Mesh, bank: PreparedBank, r: jax.Array,
                            use_kernel: Optional[bool] = None,
                            chunk_size: int = 2048,
                            coherence_alpha: float = 1.0) -> jax.Array:
    """Tensor-parallel fused 'all'-mode estimation with EXPLICIT collectives:
    each device holds a K-shard of the prepared bank (VMEM-resident inside
    the Pallas stats kernel on TPU), computes the un-normalized online-
    softmax state (m, den, acc) for its own components, and the shards merge
    EXACTLY with one pmax + two psums over 'component' — the cross-device
    form of the split-K chunked kernel's flash-style merge
    (`pallas_kernels.merge_stats`). Samples are sharded over 'data'.

    Per sample the collective payload is one f32 pair + one complex D-vector
    (acc), independent of K — the bank never moves, only the merged state
    rides ICI. `use_kernel=None` picks the Pallas stats kernel on TPU and
    the einsum stats path (`gmm_estimator.estimate_stats`, identical merge
    semantics) elsewhere — which is also how the path is validated on the
    virtual CPU mesh.

    r of rank 3 is treated as (B, T, M) coherence blocks: each device
    computes the BLOCK-pooled online-softmax state over its component shard
    (per-component block logits sum over the coherence axis BEFORE the
    softmax — Pallas in-VMEM pooling via `estimate_fused_coherent_stats`,
    or `gmm_estimator.estimate_coherent_stats` off-TPU) and the same
    pmax + two psums merge the shards exactly; the per-block collective
    payload is one f32 pair + one complex (T, D) accumulator, independent
    of K. Bit-matches `estimate_coherent(bank, r, 'all')` on every
    (data, component) mesh factorization. `coherence_alpha` < 1 selects
    the leave-one-out evidence blend (per-snapshot state, same elementwise
    merge)."""
    try:
        from jax import shard_map
        rep_kwargs = {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map
        rep_kwargs = {"check_rep": False}
    import jax.numpy as jnp

    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    n_k = mesh.shape[COMPONENT_AXIS]
    n_d = mesh.shape[DATA_AXIS]
    k_comp = bank.filters.shape[0]
    assert k_comp % n_k == 0, (
        f"K={k_comp} must divide over {n_k} component shards")
    assert r.shape[0] % n_d == 0, (
        f"n_samples {r.shape[0]} must divide over {n_d} data shards")

    coherent = r.ndim == 3

    def body(bank_local, r_local):
        if coherent:
            if use_kernel:
                from quantized_channel_estimation_tpu.estimators import (
                    pallas_kernels)
                m, den, acc = pallas_kernels.estimate_fused_coherent_stats(
                    bank_local, r_local, alpha=coherence_alpha)
            else:
                m, den, acc = gmm_estimator.estimate_coherent_stats(
                    bank_local, r_local,
                    max(1, chunk_size // r_local.shape[1]),
                    coherence_alpha)
        elif use_kernel:
            from quantized_channel_estimation_tpu.estimators import (
                pallas_kernels)
            m, den, acc = pallas_kernels.estimate_fused_stats(bank_local,
                                                              r_local)
        else:
            m, den, acc = gmm_estimator.estimate_stats(bank_local, r_local,
                                                       chunk_size)
        m_star = jax.lax.pmax(m, COMPONENT_AXIS)
        w = jnp.exp(m - m_star)
        den = jax.lax.psum(den * w, COMPONENT_AXIS)
        # state ranks: flat (N,), coherent alpha=1 per-block (B,),
        # coherent alpha<1 per-snapshot (B, T) — pad to acc's rank
        expand = (1,) * (acc.ndim - w.ndim)
        wacc = w.reshape(w.shape + expand)
        acc = jax.lax.psum(acc * wacc.astype(acc.dtype), COMPONENT_AXIS)
        den_b = den.reshape(den.shape + expand)
        return (acc / den_b.astype(acc.dtype)).astype(r_local.dtype)

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(COMPONENT_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        **rep_kwargs)
    return jax.jit(mapped)(bank, r)
