"""Complex Gaussian mixture model fitted by EM, with structured covariances.

Covariance types (reference `modules/gmm_cplx_bussgang.py:96-163`):
  - 'full':            plain complex EM
  - 'circulant':       diagonal-covariance EM on unitary-DFT-domain data,
                       covariances back-transformed F^H diag(c) F
  - 'block-circulant': same with a 2-D (kron) DFT, `blocks=(n1, n2)`
  - 'toeplitz':        full EM whose M-step projects onto Toeplitz via the
                       Barton-Fuhrmann "inverse EM" nonneg-spectrum fixed point
                       on an oversampled DFT (`gmm_cplx_bussgang.py:792-826`)
  - 'block-toeplitz':  kron of two oversampled DFTs
  - 'diag':            diagonal covariances in the data domain
  - 'spherical':       per-component scalar variance (diag averaged over
                       dims, `gmm_cplx_bussgang.py:828-849`)

TPU-first design:
  - E+M are fused into one `lax.scan` over data chunks that accumulates the
    EM sufficient statistics (Nk, sum r.x, sum r.xx^H); responsibilities are
    never materialized for the full dataset. The same statistics are what a
    multi-host data-parallel EM psums (see `parallel.mesh`).
  - All per-component linear algebra (Cholesky, precision factors) is batched
    over the component axis instead of Python loops.
  - The EM loop is a `lax.while_loop` on (params, lower_bound) with sklearn's
    stopping rule: |change of mean log-likelihood| < tol (the reference wraps
    sklearn's bookkeeping, `gmm_cplx_bussgang.py:500-546`).
  - Parameters are pure pytrees; nothing is mutated (the reference's
    `_prepare_for_prediction` destructively overwrites its model,
    `gmm_cplx_bussgang.py:309-313` — see `gmm_estimator.prepare_bank` for the
    pure replacement).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from quantized_channel_estimation_tpu.models.kmeans import kmeans
from quantized_channel_estimation_tpu.ops import linalg
from quantized_channel_estimation_tpu.ops.cplx import cplx2real


class GmmConfig(NamedTuple):
    n_components: int
    cov_type: str = "full"
    blocks: Optional[Tuple[int, int]] = None
    zero_mean: bool = True
    max_iter: int = 100     # sklearn GaussianMixture defaults
    tol: float = 1e-3
    # the reference (float64) uses 1e-6; in float32 that floor leaves
    # covariances with condition ~1e7 whose E-step quadratic forms carry
    # order-one errors, degrading the optimum. 1e-5 keeps f32 E-steps
    # accurate and empirically IMPROVES estimation MSE past the f64
    # reference (see PARITY_NOTES.md).
    reg_covar: float = 1e-5
    chunk_size: int = 4096  # E/M scan chunk (memory knob, no math effect)
    kmeans_iter: int = 50
    init: str = "kmeans"    # 'kmeans' | 'random' (sklearn's init_params)
    n_init: int = 1         # EM restarts, best lower bound kept (sklearn n_init)
    axis_name: Optional[str] = None  # data-parallel axis under shard_map:
    # sufficient statistics are psum'd over it (EM's gradient-all-reduce
    # analog); both inits work — 'kmeans' runs the data-parallel k-means
    # with psum'd assignment statistics (round-4; previously DP forced
    # 'random' and gave up the k-means init quality)
    psum_segments: Union[int, str] = "auto"  # >1 pipelines the statistics
    # all-reduce: the chunk scan splits into S segments whose partial
    # stats are psum'd as each segment finishes, so segment i's collective
    # can overlap segment i+1's compute (the EM analog of gradient-bucket
    # overlap) instead of one blocking O(K D^2) barrier per iteration.
    # Exact up to f32 summation order. No effect without axis_name.
    # 'auto' (round-5 default) resolves to 1: on every regime measured on
    # a real transport, segmenting LOSES (comm is <=5% of the wall — the
    # ceiling on any win — while extra collective launches + sync barriers
    # cost more; the earlier recorded 16 MB "win" is retracted as a
    # degenerate-program artifact). See `_resolve_segments` / BASELINE.md.
    # Set an explicit int for deployments where the collective dominates.


class GmmParams(NamedTuple):
    """Full-covariance complex GMM parameters (the universal post-fit form)."""
    weights: jax.Array       # (K,) real
    means: jax.Array         # (K, D) complex
    covariances: jax.Array   # (K, D, D) complex
    prec_chol: jax.Array     # (K, D, D) complex upper; C^{-1} = P P^H

    @property
    def n_components(self) -> int:
        return self.weights.shape[0]

    @property
    def dim(self) -> int:
        return self.means.shape[-1]


class GmmFitResult(NamedTuple):
    params: GmmParams
    lower_bound: jax.Array   # mean per-sample log-likelihood at convergence
    n_iter: jax.Array
    converged: jax.Array


# ---------------------------------------------------------------------------
# log-probabilities
# ---------------------------------------------------------------------------

def log_prob_full(x: jax.Array, means: jax.Array, prec_chol: jax.Array) -> jax.Array:
    """log CN(x; mu_k, C_k) for x (N, D) -> (N, K).

    Density log = -(D log pi + |(x - mu)^H P|^2) + 2 sum log diag(P)
    (`gmm_cplx_bussgang.py:388-435`). The quadratic form is one K-batched GEMM.
    """
    d = x.shape[-1]
    xp = jnp.einsum("nd,kde->kne", x, jnp.conj(prec_chol))
    mp = jnp.einsum("kd,kde->ke", means, jnp.conj(prec_chol))
    quad = jnp.sum(jnp.abs(xp - mp[:, None, :]) ** 2, axis=-1)  # (K, N)
    logdet = linalg.logdet_from_prec_chol(prec_chol)  # (K,)
    return (-(d * jnp.log(jnp.pi) + quad) + 2.0 * logdet[:, None]).T


def log_prob_diag(x: jax.Array, means: jax.Array, variances: jax.Array) -> jax.Array:
    """Diagonal-covariance complex log-density, x (N, D) -> (N, K).

    variances: (K, D) real. Expanded quadratic (no (N,K,D) intermediate):
    sum_d |x_d - mu_d|^2 / c_d  =  sum |mu|^2 p - 2 Re(x . (mu* p)) + |x|^2 . p
    (`gmm_cplx_bussgang.py:419-425`).
    """
    d = x.shape[-1]
    prec = 1.0 / variances  # (K, D)
    mu2 = jnp.sum(jnp.abs(means) ** 2 * prec, axis=-1)  # (K,)
    cross = jnp.real(x @ (jnp.conj(means) * prec).T)  # (N, K)
    x2 = (jnp.abs(x) ** 2) @ prec.T  # (N, K)
    quad = mu2[None, :] - 2.0 * cross + x2
    logdet = -jnp.sum(jnp.log(variances), axis=-1)  # log det C^{-1}
    return -(d * jnp.log(jnp.pi) + quad) + logdet[None, :]


# ---------------------------------------------------------------------------
# sufficient statistics (fused E+M data pass)
# ---------------------------------------------------------------------------

class _Stats(NamedTuple):
    nk: jax.Array        # (K,)
    sx: jax.Array        # (K, D) complex: sum_n r_nk x_n
    sxx: jax.Array       # (K, D, D) complex or (K, D) real for diag
    log_norm: jax.Array  # scalar: sum_n log p(x_n)


def _chunk(x: jax.Array, chunk: int):
    """Pad to a multiple of `chunk` and reshape to (n_chunks, chunk, D) plus a
    validity mask."""
    n = x.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    mask = jnp.pad(jnp.ones((n,), jnp.float32), (0, pad))
    return xp.reshape(n_chunks, chunk, -1), mask.reshape(n_chunks, chunk)


def _resp_chunk(xc, mc, log_weights, log_prob_fn):
    lp = log_prob_fn(xc) + log_weights[None, :]  # (nc, K)
    log_norm = jax.scipy.special.logsumexp(lp, axis=-1)
    resp = jnp.exp(lp - log_norm[:, None]) * mc[:, None]
    return resp, jnp.sum(log_norm * mc)


def _zero_stats(k: int, d: int, dtype, diag: bool) -> _Stats:
    sxx0 = (jnp.zeros((k, d), jnp.float32) if diag
            else jnp.zeros((k, d, d), dtype))
    return _Stats(jnp.zeros((k,), jnp.float32), jnp.zeros((k, d), dtype),
                  sxx0, jnp.zeros((), jnp.float32))


def _update_stats(stats: _Stats, resp, xc, diag: bool,
                  log_norm_inc=0.0) -> _Stats:
    """Accumulate one chunk's responsibility-weighted moments
    (Nk, sum r.x, sum r.xx^H). The single implementation behind every EM
    statistics pass (plain/init/random-init here, quantized in gmm_quant)."""
    nk = stats.nk + jnp.sum(resp, axis=0)
    respd = resp.astype(xc.real.dtype)
    sx = stats.sx + jnp.einsum("nk,nd->kd", respd, xc)
    if diag:
        sxx = stats.sxx + jnp.einsum("nk,nd->kd", resp, jnp.abs(xc) ** 2)
    else:
        rx = respd.T[..., None] * xc[None, :, :]  # (K, nc, D)
        sxx = stats.sxx + jnp.einsum("knd,ne->kde", rx, jnp.conj(xc))
    return _Stats(nk, sx, sxx, stats.log_norm + log_norm_inc)


def _resolve_segments(segments) -> int:
    """'auto' -> 1, on the measured evidence (round-5, 2-process Gloo
    cluster, core-pinned — BASELINE.md): with REAL segmentation, pipelining
    the statistics psum LOSES on every regime measurable on this transport
    — 8.4 MB collectives: 4.12 s blocking vs 5.01 s segmented (round-3);
    16.8 MB: 11.6 s vs 24.2 s (round-5) — because communication is <= 5%
    of the wall time (the hard ceiling on any overlap win) while the extra
    collective launches and inter-segment sync barriers cost far more.
    NOTE the round-3 record of a 16 MB "win" is RETRACTED: that run's
    chunk stream had ONE chunk, so segments clamped to 1 and both timed
    variants were the identical program (identical printed lower bounds) —
    the +192 ms was noise. Explicit integer segments remain available for
    deployments where the stats collective is a large wall-clock fraction
    (compute-dense scans over a slow inter-host link); the mechanism
    itself is exactness-validated on the virtual mesh and the real
    cluster."""
    return 1 if segments == "auto" else segments


def segmented_psum_scan(body, init, xs, mask, axis_name,
                        segments=1):
    """Scan `body` over the chunk stream (carry = additive statistics
    pytree), all-reducing over `axis_name`.

    segments <= 1 (or no axis_name): one scan, then one psum — a blocking
    barrier per call. segments = S > 1: the chunk stream splits into S
    sub-scans whose partial statistics are psum'd as each finishes; the S
    collectives are mutually independent of the later segments' compute,
    so XLA's async collectives can overlap communication with the
    remaining scan work (the EM analog of gradient-bucket overlap in DDP).
    The total is the sum of the psum'd partials — identical to
    psum-of-total up to f32 summation order.

    segments='auto' (round-5) resolves to 1: on every real-transport
    regime measured here, segmenting loses (`_resolve_segments`); set an
    explicit int only where the collective dominates the wall clock.

    `init` seeds the first segment only (zeros of the same pytree seed the
    rest), which matches the unsegmented path exactly.
    """
    n_chunks = xs.shape[0]
    segments = _resolve_segments(segments)
    segs = 1 if axis_name is None else max(1, min(segments, n_chunks))
    if segs <= 1:
        stats, _ = jax.lax.scan(body, init, (xs, mask))
        if axis_name is not None:
            stats = jax.lax.psum(stats, axis_name)
        return stats
    bounds = [round(i * n_chunks / segs) for i in range(segs + 1)]
    zeros = jax.tree_util.tree_map(jnp.zeros_like, init)
    total = None
    for i in range(segs):
        lo, hi = bounds[i], bounds[i + 1]
        part, _ = jax.lax.scan(body, init if i == 0 else zeros,
                               (xs[lo:hi], mask[lo:hi]))
        part = jax.lax.psum(part, axis_name)
        total = part if total is None else jax.tree_util.tree_map(
            jnp.add, total, part)
    return total


def accumulate_stats(x: jax.Array, mask_x, log_weights: jax.Array,
                     log_prob_fn, diag: bool, chunk: int,
                     axis_name=None, psum_segments: int = 1) -> _Stats:
    """One scan over the data computing responsibilities chunk-by-chunk and
    accumulating (Nk, sum r.x, sum r.xx^H, sum log-norm).

    Under shard_map with `axis_name`, the statistics are psum'd over the data
    axis — one all-reduce of O(K D^2) per EM iteration, the EM analog of
    gradient all-reduce; `psum_segments` > 1 pipelines it (see
    `segmented_psum_scan`)."""
    xs, mask = mask_x if mask_x is not None else _chunk(x, chunk)
    k = log_weights.shape[0]
    d = xs.shape[-1]
    init = _zero_stats(k, d, xs.dtype, diag)

    def body(stats, inputs):
        xc, mc = inputs
        resp, ln = _resp_chunk(xc, mc, log_weights, log_prob_fn)
        return _update_stats(stats, resp, xc, diag, ln), None

    return segmented_psum_scan(body, init, xs, mask, axis_name,
                               psum_segments)


# ---------------------------------------------------------------------------
# M-step parameter updates
# ---------------------------------------------------------------------------

def _means_from_stats(stats: _Stats, zero_mean: bool):
    nk = stats.nk + 10.0 * jnp.finfo(jnp.float32).eps
    means = stats.sx / nk[:, None].astype(stats.sx.dtype)
    if zero_mean:
        means = jnp.zeros_like(means)
    return nk, means


def _m_step_full(stats: _Stats, cfg: GmmConfig):
    nk, means = _means_from_stats(stats, cfg.zero_mean)
    # sum r (x-mu)(x-mu)^H = sxx - nk mu mu^H when mu is the weighted mean
    # (exactly, also when mu is forced to zero).
    covs = stats.sxx / nk[:, None, None].astype(stats.sxx.dtype)
    if not cfg.zero_mean:
        covs = covs - means[:, :, None] * jnp.conj(means[:, None, :])
    covs = linalg.add_jitter(covs, cfg.reg_covar)
    return nk, means, covs


def _m_step_diag(stats: _Stats, cfg: GmmConfig):
    nk, means = _means_from_stats(stats, cfg.zero_mean)
    var = stats.sxx / nk[:, None]
    if not cfg.zero_mean:
        var = var - jnp.abs(means) ** 2
    return nk, means, var + cfg.reg_covar


def _m_step_toeplitz(stats: _Stats, cfg: GmmConfig, prev_covs: jax.Array,
                     sigma_spec: jax.Array, f2: jax.Array):
    """Barton-Fuhrmann inverse-EM spectrum update (`gmm_cplx_bussgang.py:792-826`).

    sigma_spec: (K, 2D) nonnegative spectra; C_k = F2^H diag(sigma_k) F2.
    Fixed point: sigma_i += sigma_i^2 * Re(f_i^H (C^{-1} S C^{-1} - C^{-1}) f_i).
    """
    nk, means = _means_from_stats(stats, cfg.zero_mean)
    s = stats.sxx / nk[:, None, None].astype(stats.sxx.dtype)
    if not cfg.zero_mean:
        s = s - means[:, :, None] * jnp.conj(means[:, None, :])
    # eigenvalue-truncating pseudo-inverse like the reference's
    # np.linalg.pinv(..., hermitian=True) (`gmm_cplx_bussgang.py:817`):
    # a jittered Cholesky inverse would blow C^{-1} up to 1/reg_covar on the
    # near-singular SCM covariances and destabilize the fixed point
    cinv = linalg.psd_pinv(prev_covs, rcond=1e-7)
    m = cinv @ s @ cinv - cinv  # (K, D, D)
    theta = jnp.real(jnp.einsum("fd,kde,fe->kf", f2, m, jnp.conj(f2)))
    # trust region on the multiplicative fixed-point step: the raw update
    # sigma += sigma^2 theta can overshoot catastrophically in float32 on
    # peaked spectra (the reference survives only by running float64); capping
    # the per-iteration change preserves the fixed point (where the step is
    # small) while keeping the iteration stable
    raw = sigma_spec + sigma_spec ** 2 * theta
    sigma_spec = jnp.clip(raw, 0.1 * sigma_spec, 10.0 * sigma_spec)
    sigma_spec = jnp.maximum(sigma_spec, cfg.reg_covar)
    covs = jnp.einsum("fd,kf,fe->kde", jnp.conj(f2), sigma_spec.astype(stats.sxx.dtype), f2)
    covs = linalg.add_jitter(covs, cfg.reg_covar)
    return nk, means, covs, sigma_spec


# ---------------------------------------------------------------------------
# initialization
# ---------------------------------------------------------------------------

def _init_resp_stats(key, x, cfg: GmmConfig, diag: bool, chunk: int) -> _Stats:
    """Initial responsibilities folded straight into sufficient stats.

    init='kmeans': hard assignment from k-means on [Re; Im]-stacked data
    (`gmm_cplx_bussgang.py:549-574`); under shard_map (cfg.axis_name) the
    k-means itself runs data-parallel with psum'd assignment statistics and
    single-device-identical seeding (`models/kmeans.py`), so DP fits keep
    the same init quality as single-device ones. init='random': uniform
    random responsibilities (sklearn init_params='random',
    `gmm_cplx_bussgang.py:568-570`)."""
    if cfg.init == "random":
        return _init_random_stats(key, x, cfg, diag, chunk)
    labels = kmeans(key, cplx2real(x, axis=-1).astype(jnp.float32),
                    cfg.n_components, max_iter=cfg.kmeans_iter,
                    axis_name=cfg.axis_name).labels
    k = cfg.n_components
    d = x.shape[-1]
    xs, mask = _chunk(x, chunk)
    ls = jnp.pad(labels, (0, xs.shape[0] * xs.shape[1] - labels.shape[0])
                 ).reshape(xs.shape[0], xs.shape[1])
    init = _zero_stats(k, d, x.dtype, diag)

    def body(stats, inputs):
        xc, mc, lc = inputs
        onehot = jax.nn.one_hot(lc, k, dtype=jnp.float32) * mc[:, None]
        return _update_stats(stats, onehot, xc, diag), None

    stats, _ = jax.lax.scan(body, init, (xs, mask, ls))
    return stats


def _init_random_stats(key, x, cfg: GmmConfig, diag: bool, chunk: int) -> _Stats:
    """Random-responsibility init (rows of U(0,1) normalized to sum 1).

    The PRNG folds in the GLOBAL chunk index so a shard_map fit draws the
    same per-sample responsibilities as a single-device fit with the same
    chunk size (init is then bit-deterministic across layouts)."""
    k = cfg.n_components
    d = x.shape[-1]
    xs, mask = _chunk(x, chunk)
    chunk_offset = 0
    if cfg.axis_name is not None:
        chunk_offset = jax.lax.axis_index(cfg.axis_name) * xs.shape[0]
    init = _zero_stats(k, d, x.dtype, diag)

    def body(carry, inputs):
        stats, i = carry
        xc, mc = inputs
        resp = jax.random.uniform(jax.random.fold_in(key, chunk_offset + i),
                                  (xc.shape[0], k), dtype=jnp.float32)
        resp = resp / jnp.sum(resp, axis=-1, keepdims=True) * mc[:, None]
        return (_update_stats(stats, resp, xc, diag), i + 1), None

    (stats, _), _ = jax.lax.scan(body, (init, 0), (xs, mask))
    return stats


# ---------------------------------------------------------------------------
# EM drivers
# ---------------------------------------------------------------------------

class _FullState(NamedTuple):
    weights: jax.Array
    means: jax.Array
    covs: jax.Array          # (K,D,D) complex for full / (K,D) real for diag
    sigma_spec: jax.Array    # (K, F) inv-em spectrum (zeros if unused)
    lower_bound: jax.Array
    prev_lb: jax.Array
    n_iter: jax.Array


def _em_loop(x, init_stats: Optional[_Stats], cfg: GmmConfig, mode: str,
             f2: Optional[jax.Array], state0: Optional["_FullState"] = None):
    """Shared EM driver. mode in {'full', 'diag', 'spherical', 'inv-em'}.

    Either init_stats (fresh start: the first M-step builds parameters from
    them) or state0 (resume: iterate straight from existing parameters) must
    be given. With cfg.axis_name set (under shard_map), x is the per-device
    shard; the statistics all-reduce makes every device run the identical
    M-step."""
    n = x.shape[0]
    if cfg.axis_name is not None:
        n = n * jax.lax.axis_size(cfg.axis_name)
    diag = mode in ("diag", "spherical")
    xs_mask = _chunk(x, min(cfg.chunk_size, x.shape[0]))

    def params_from_stats(stats, state: Optional[_FullState]):
        if mode == "full":
            nk, means, covs = _m_step_full(stats, cfg)
            sigma = state.sigma_spec if state is not None else jnp.zeros((cfg.n_components, 1), jnp.float32)
        elif mode in ("diag", "spherical"):
            nk, means, covs = _m_step_diag(stats, cfg)
            if mode == "spherical":
                # scalar variance per component: diag averaged over dims
                # (`gmm_cplx_bussgang.py:828-849`), broadcast back to (K, D)
                covs = jnp.broadcast_to(
                    jnp.mean(covs, axis=-1, keepdims=True), covs.shape)
            sigma = state.sigma_spec if state is not None else jnp.zeros((cfg.n_components, 1), jnp.float32)
        else:  # inv-em
            if state is None:
                # initialize: full covariance from stats, spectrum from its
                # oversampled-DFT diagonal (`gmm_cplx_bussgang.py:599-603`)
                nk, means, covs = _m_step_full(stats, cfg)
                sigma = jnp.real(jnp.einsum("fd,kde,fe->kf", f2, covs, jnp.conj(f2)))
                sigma = jnp.maximum(sigma, cfg.reg_covar)
            else:
                nk, means, covs, sigma = _m_step_toeplitz(
                    stats, cfg, state.covs, state.sigma_spec, f2)
        weights = nk / jnp.sum(nk)
        return _FullState(weights, means, covs, sigma,
                          jnp.asarray(-jnp.inf, jnp.float32),
                          jnp.asarray(-jnp.inf, jnp.float32),
                          jnp.zeros((), jnp.int32))

    def log_prob_fn(state):
        if diag:
            return lambda xc: log_prob_diag(xc, state.means, state.covs)
        prec = linalg.robust_precision_cholesky(state.covs)
        return lambda xc: log_prob_full(xc, state.means, prec)

    def em_iter(state: _FullState) -> _FullState:
        stats = accumulate_stats(x, xs_mask, jnp.log(state.weights),
                                 log_prob_fn(state), diag,
                                 cfg.chunk_size, axis_name=cfg.axis_name,
                                 psum_segments=cfg.psum_segments)
        new = params_from_stats(stats, state)
        lb = stats.log_norm / n
        return new._replace(lower_bound=lb, prev_lb=state.lower_bound,
                            n_iter=state.n_iter + 1)

    def cond(state: _FullState):
        not_converged = jnp.abs(state.lower_bound - state.prev_lb) >= cfg.tol
        return jnp.logical_and(state.n_iter < cfg.max_iter, not_converged)

    # prev_lb = +inf so the first convergence check sees an infinite (not NaN)
    # change and the loop always runs at least one EM iteration.
    if state0 is None:
        state0 = params_from_stats(init_stats, None)
    state0 = state0._replace(prev_lb=jnp.asarray(jnp.inf, jnp.float32))
    state = jax.lax.while_loop(cond, em_iter, state0)
    converged = jnp.abs(state.lower_bound - state.prev_lb) < cfg.tol
    return state, converged


# ---------------------------------------------------------------------------
# fit: covariance-type dispatch
# ---------------------------------------------------------------------------

def _dft_for(cfg: GmmConfig, d: int, dtype) -> jax.Array:
    if cfg.cov_type == "circulant":
        return linalg.unitary_dft(d, dtype)
    n1, n2 = cfg.blocks
    assert n1 * n2 == d, f"blocks {cfg.blocks} incompatible with dim {d}"
    return jnp.kron(linalg.unitary_dft(n1, dtype), linalg.unitary_dft(n2, dtype))


def _oversampled_dft_for(cfg: GmmConfig, d: int, dtype) -> jax.Array:
    if cfg.cov_type == "toeplitz":
        return linalg.oversampled_dft(d, dtype)
    n1, n2 = cfg.blocks
    assert n1 * n2 == d, f"blocks {cfg.blocks} incompatible with dim {d}"
    return jnp.kron(linalg.oversampled_dft(n1, dtype),
                    linalg.oversampled_dft(n2, dtype))


def _fit_once(key: jax.Array, h: jax.Array, cfg: GmmConfig) -> GmmFitResult:
    d = h.shape[-1]
    dtype = h.dtype

    def init_stats_fn(x, diag):
        s = _init_resp_stats(key, x, cfg, diag=diag, chunk=cfg.chunk_size)
        if cfg.axis_name is not None:
            s = jax.lax.psum(s, cfg.axis_name)
        return s

    if cfg.cov_type in ("circulant", "block-circulant"):
        f = _dft_for(cfg, d, dtype)
        x = h @ f.T  # unitary-DFT-domain data
        init_stats = init_stats_fn(x, True)
        state, converged = _em_loop(x, init_stats, cfg, "diag", None)
        means = state.means @ jnp.conj(f)  # back-transform row vectors
        covs = jnp.einsum("fd,kf,fe->kde", jnp.conj(f),
                          state.covs.astype(dtype), f)
        covs = linalg.hermitize(covs)
    elif cfg.cov_type in ("toeplitz", "block-toeplitz"):
        f2 = _oversampled_dft_for(cfg, d, dtype)
        init_stats = init_stats_fn(h, False)
        state, converged = _em_loop(h, init_stats, cfg, "inv-em", f2)
        means, covs = state.means, linalg.hermitize(state.covs)
    elif cfg.cov_type == "full":
        init_stats = init_stats_fn(h, False)
        state, converged = _em_loop(h, init_stats, cfg, "full", None)
        means, covs = state.means, linalg.hermitize(state.covs)
    elif cfg.cov_type in ("diag", "spherical"):
        init_stats = init_stats_fn(h, True)
        state, converged = _em_loop(h, init_stats, cfg, cfg.cov_type, None)
        means = state.means
        covs = state.covs[:, :, None].astype(dtype) * jnp.eye(d, dtype=dtype)
    else:
        raise NotImplementedError(
            f"covariance_type={cfg.cov_type!r} is not implemented")

    covs = linalg.add_jitter(covs, cfg.reg_covar)
    prec = linalg.robust_precision_cholesky(covs)
    params = GmmParams(state.weights, means, covs, prec)
    return GmmFitResult(params, state.lower_bound, state.n_iter, converged)


@partial(jax.jit, static_argnums=(2,))
def fit(key: jax.Array, h: jax.Array, cfg: GmmConfig) -> GmmFitResult:
    """Fit the complex GMM with EM; always returns full-covariance complex
    parameters on the original data domain (the reference converts its
    structured fits to 'full' for estimation, `gmm_cplx_bussgang.py:104-161`).

    Runs cfg.n_init restarts with distinct init keys and keeps the best
    lower bound (sklearn's n_init; `gmm_cplx_bussgang.py:500-527`).

    All EM matmuls run at 'highest' precision: TPU default matmul precision
    (bfloat16 multiplies) corrupts the covariance sufficient statistics
    enough to NaN the factorizations at D=64 — verified on hardware; the
    estimation path is insensitive and keeps the default.
    """
    with jax.default_matmul_precision("highest"):
        best = _fit_once(key, h, cfg)
        for i in range(1, cfg.n_init):
            cand = _fit_once(jax.random.fold_in(key, i), h, cfg)
            take = cand.lower_bound > best.lower_bound
            best = jax.tree_util.tree_map(
                lambda c, b: jnp.where(take, c, b), cand, best)
        return best


def predict_proba(params: GmmParams, x: jax.Array) -> jax.Array:
    """Posterior component probabilities (N, K) (`gmm_cplx_bussgang.py:351-367`)."""
    lp = log_prob_full(x, params.means, params.prec_chol) + jnp.log(params.weights)[None, :]
    return jax.nn.softmax(lp, axis=-1)


@partial(jax.jit, static_argnums=(2,))
def fit_resume(params: GmmParams, h: jax.Array, cfg: GmmConfig) -> GmmFitResult:
    """Continue full-covariance EM from existing parameters — the
    checkpoint-restart path (SURVEY §5; the reference's sklearn `warm_start`
    plumbing exists but is never used, `gmm_cplx_bussgang.py:491`).

    Resumable states: 'full' (all structured fits convert to full post-fit,
    matching the reference's estimation-time invariant) and
    'toeplitz'/'block-toeplitz' — the generating inv-em spectrum is
    recovered from the checkpointed covariances by the frame Gram solve
    (`linalg.spectrum_from_covariance`; the naive DFT diagonal is a
    smoothed spectrum and regresses the lower bound). Besides checkpoint
    restart, this segments long structured fits into several bounded
    program executions (useful on remote runtimes that bound single
    execution wall time).
    """
    if cfg.cov_type not in ("full", "toeplitz", "block-toeplitz"):
        raise NotImplementedError(
            "fit_resume supports 'full' and 'toeplitz'/'block-toeplitz' "
            f"state (got {cfg.cov_type!r})")
    with jax.default_matmul_precision("highest"):
        d = h.shape[-1]
        if cfg.cov_type == "full":
            # one E-pass with the given params to produce equivalent
            # sufficient statistics, then the standard loop continues from
            # its M-step
            xs_mask = _chunk(h, min(cfg.chunk_size, h.shape[0]))
            stats = accumulate_stats(
                h, xs_mask, jnp.log(params.weights),
                lambda xc: log_prob_full(xc, params.means, params.prec_chol),
                False, cfg.chunk_size, axis_name=cfg.axis_name,
                psum_segments=cfg.psum_segments)
            state, converged = _em_loop(h, stats, cfg, "full", None)
        else:
            f2 = _oversampled_dft_for(cfg, d, h.dtype)
            sigma = linalg.spectrum_from_covariance(
                params.covariances, f2, cfg.reg_covar)
            state0 = _FullState(params.weights, params.means,
                                params.covariances.astype(h.dtype), sigma,
                                jnp.asarray(-jnp.inf, jnp.float32),
                                jnp.asarray(jnp.inf, jnp.float32),
                                jnp.zeros((), jnp.int32))
            state, converged = _em_loop(h, None, cfg, "inv-em", f2,
                                        state0=state0)
        covs = linalg.add_jitter(linalg.hermitize(state.covs), cfg.reg_covar)
        prec = linalg.robust_precision_cholesky(covs)
        out = GmmParams(state.weights, state.means, covs, prec)
        return GmmFitResult(out, state.lower_bound, state.n_iter, converged)
