"""Complex Mixture of Factor Analyzers (MFA) fitted by EM.

Per component k: C_k = Lambda_k Lambda_k^H + diag(psi_k), Lambda_k in C^{D x M}
with latent dimension M << D. Covariance inversions always go through the
Woodbury identity so only M x M systems are formed (reference
`modules/mofa_cplx_bussgang.py:412-422`).

Options mirroring the reference ctor (`mofa_cplx_bussgang.py:40-65`):
PPCA (isotropic psi), lock_psis (psi shared across components),
max_condition_number (loading init scale), max_iter, tol (relative
log-likelihood change, checked after >= 5 iterations, `:246-258`).

TPU-first reformulation: the reference materializes per-sample latent
posteriors z_n = beta (x_n - mu) and loops over components
(`mofa_cplx_bussgang.py:270-310`). Since z is linear in x, every M-step
quantity reduces algebraically to the SAME sufficient statistics as the GMM —
(Nk, sum r.x, sum r.xx^H) — accumulated in one chunked scan shared with
`gmm.accumulate_stats`:

    sum r z        = beta (Sx - Nk mu)
    sum r x z^H    = (Sxx - Sx mu^H) beta^H
    sum r z z^H    = beta Cov(mu, mu) beta^H
    psi            = diag(Cov(mu', mu') - Lambda beta Cov(mu, mu')) / Nk

so the per-iteration cost is one O(N K D^2) data pass plus O(K D^2 M) algebra,
with no (K, N, .) intermediates, and the data pass psums across hosts exactly
like the GMM's.

Estimation reuses the Bussgang prepared-bank machinery of `gmm_estimator`
(after preparation the MFA is a bank of dense covariances,
`mofa_cplx_bussgang.py:162-216`).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from quantized_channel_estimation_tpu.models import gmm as gmm_mod
from quantized_channel_estimation_tpu.models.gmm import GmmParams, _chunk
from quantized_channel_estimation_tpu.models.kmeans import kmeans
from quantized_channel_estimation_tpu.ops import linalg
from quantized_channel_estimation_tpu.ops.precision import highest_precision
from quantized_channel_estimation_tpu.ops.cplx import cplx2real


class MfaConfig(NamedTuple):
    n_components: int
    latent_dim: int
    ppca: bool = False
    lock_psis: bool = False
    zero_mean: bool = False
    max_condition_number: float = 1e6
    # floor on a component's total responsibility mass; below it the
    # component is reset to uniform resp == rs_clip for every sample
    # (`mofa_cplx_bussgang.py:45,338`; `Bussgang_MFA.py:118-122` enables it
    # for zero-mean or free-psi fits)
    rs_clip: float = 0.0
    max_iter: int = 100
    tol: float = 1e-6
    psi_floor: float = 1e-6
    chunk_size: int = 4096
    kmeans_iter: int = 50
    axis_name: Optional[str] = None  # data-parallel axis under shard_map:
    # the GMM-shaped sufficient statistics are psum'd over it; nonzero-mean
    # fits initialize means from the data-parallel k-means (psum'd
    # assignment statistics, single-device-identical seeding)
    psum_segments: Union[int, str] = "auto"  # >1 pipelines the statistics
    # all-reduce (gmm.segmented_psum_scan): segment psums overlap later
    # segments' compute instead of one blocking barrier per EM iteration;
    # 'auto' resolves to 1 on the measured evidence (gmm._resolve_segments)


class MfaParams(NamedTuple):
    weights: jax.Array   # (K,)
    means: jax.Array     # (K, D) complex
    lambdas: jax.Array   # (K, D, M) complex factor loadings
    psis: jax.Array      # (K, D) real diagonal noise


class MfaFitResult(NamedTuple):
    params: MfaParams
    log_likelihood: jax.Array
    n_iter: jax.Array
    converged: jax.Array


def covariances(params: MfaParams) -> jax.Array:
    """Dense C_k = Lambda Lambda^H + diag(psi), (K, D, D)."""
    d = params.psis.shape[-1]
    c = jnp.einsum("kdm,kem->kde", params.lambdas, jnp.conj(params.lambdas))
    return c + params.psis[..., None].astype(c.dtype) * jnp.eye(d, dtype=c.dtype)


def woodbury_inverse(lambdas: jax.Array, psis: jax.Array) -> jax.Array:
    """(Lambda Lambda^H + diag(psi))^{-1} via the matrix inversion lemma,
    batched over components: only M x M inverses are formed
    (`mofa_cplx_bussgang.py:412-422`)."""
    m = lambdas.shape[-1]
    psi_inv = (1.0 / psis).astype(lambdas.dtype)  # (K, D)
    lp = jnp.conj(jnp.swapaxes(lambdas, -1, -2)) * psi_inv[:, None, :]
    inner = jnp.eye(m, dtype=lambdas.dtype) + lp @ lambdas  # (K, M, M)
    inner_inv = linalg.hermitian_inv(linalg.hermitize(inner))
    outer = jnp.einsum("kdm,kmn,ken->kde", lambdas, inner_inv,
                       jnp.conj(lambdas))
    d = psis.shape[-1]
    return (psi_inv[..., None] * jnp.eye(d, dtype=lambdas.dtype)
            - psi_inv[:, :, None] * outer * psi_inv[:, None, :])


def _slogdet_from_woodbury(lambdas, psis):
    """log det(C) = sum log psi + log det(I + Lambda^H Psi^{-1} Lambda)."""
    m = lambdas.shape[-1]
    psi_inv = (1.0 / psis).astype(lambdas.dtype)
    lp = jnp.conj(jnp.swapaxes(lambdas, -1, -2)) * psi_inv[:, None, :]
    inner = jnp.eye(m, dtype=lambdas.dtype) + lp @ lambdas
    _, ld = jnp.linalg.slogdet(inner)
    return jnp.sum(jnp.log(psis), axis=-1) + jnp.real(ld)


class _MfaState(NamedTuple):
    params: MfaParams
    log_like: jax.Array
    prev_ll: jax.Array
    n_iter: jax.Array


def _weighted_cross(stats, mu_a, mu_b):
    """sum_n r (x - mu_a)(x - mu_b)^H from (Nk, Sx, Sxx)."""
    nk = stats.nk.astype(stats.sxx.dtype)[:, None, None]
    return (stats.sxx
            - stats.sx[:, :, None] * jnp.conj(mu_b)[:, None, :]
            - mu_a[:, :, None] * jnp.conj(stats.sx)[:, None, :]
            + nk * mu_a[:, :, None] * jnp.conj(mu_b)[:, None, :])



def _run_em(params0: MfaParams, x: jax.Array,
            cfg: MfaConfig) -> MfaFitResult:
    """The EM loop from given starting parameters (shared by `fit` and
    `fit_resume`)."""
    n, d = x.shape
    if cfg.axis_name is not None:
        n = n * jax.lax.axis_size(cfg.axis_name)
    m = cfg.latent_dim
    dtype = x.dtype
    xs_mask = _chunk(x, min(cfg.chunk_size, x.shape[0]))

    def em_iter(state: _MfaState) -> _MfaState:
        p = state.params
        # Factored Woodbury: with inner = I + Lambda^H Psi^{-1} Lambda = L L^H,
        # T = L^{-1} Lambda^H Psi^{-1} gives C^{-1} = Psi^{-1} - T^H T, so the
        # E-step quadratic form is O(K N D M) in the latent rank M (= D/4 in
        # the reference config) instead of O(K N D^2) through a dense inverse,
        # and neither a (K, D, D) inverse nor a (K, chunk, D) diff
        # intermediate is ever materialized. inner has eigenvalues >= 1, so
        # its Cholesky is unconditionally stable.
        psi_inv_r = 1.0 / p.psis                       # (K, D) real
        psi_inv = psi_inv_r.astype(dtype)
        lp_mat = jnp.conj(jnp.swapaxes(p.lambdas, -1, -2)) \
            * psi_inv[:, None, :]                      # (K, M, D) = L^H Psi^-1
        inner = jnp.eye(m, dtype=dtype) + lp_mat @ p.lambdas
        chol = jnp.linalg.cholesky(linalg.hermitize(inner))   # (K, M, M)
        t_mat = jax.scipy.linalg.solve_triangular(chol, lp_mat, lower=True)
        logdets = (jnp.sum(jnp.log(p.psis), axis=-1)
                   + 2.0 * jnp.sum(jnp.log(jnp.real(jnp.diagonal(
                       chol, axis1=-2, axis2=-1))), axis=-1))  # log det C
        mu = p.means
        mu2 = jnp.sum(jnp.abs(mu) ** 2 * psi_inv_r, axis=-1)  # (K,)
        mu_w = (jnp.conj(mu) * psi_inv).T                     # (D, K)
        t_mu = jnp.einsum("kmd,kd->km", t_mat, mu)            # (K, M)

        def log_prob_fn(xc):
            # diag part of (x-mu)^H C^{-1} (x-mu), expanded (no K x nc x D)
            a = (jnp.abs(xc) ** 2) @ psi_inv_r.T              # (nc, K)
            cross = jnp.real(xc @ mu_w)                       # (nc, K)
            tx = jnp.einsum("kmd,nd->knm", t_mat, xc)         # (K, nc, M)
            b = jnp.sum(jnp.abs(tx - t_mu[:, None, :]) ** 2, axis=-1)
            quad = a - 2.0 * cross + mu2[None, :] - b.T
            return -d * jnp.log(jnp.pi) - logdets[None, :] - quad

        stats = gmm_mod.accumulate_stats(x, xs_mask, jnp.log(p.weights),
                                         log_prob_fn, False, cfg.chunk_size,
                                         axis_name=cfg.axis_name,
                                         psum_segments=cfg.psum_segments)
        if cfg.rs_clip > 0.0:
            # reference `mofa_cplx_bussgang.py:338`: a component whose total
            # responsibility mass drops below rs_clip gets resp == rs_clip
            # for EVERY sample (resurrecting dying components). With
            # streaming statistics that is exact post-hoc: the unweighted
            # data sums are the component-sums of the stats (sum_k resp = 1).
            low = stats.nk < cfg.rs_clip
            tot_sx = jnp.sum(stats.sx, axis=0)
            tot_sxx = jnp.sum(stats.sxx, axis=0)
            rc = cfg.rs_clip
            stats = stats._replace(
                nk=jnp.where(low, n * rc, stats.nk),
                sx=jnp.where(low[:, None], rc * tot_sx, stats.sx),
                sxx=jnp.where(low[:, None, None], rc * tot_sxx, stats.sxx))
        nk = stats.nk + 10 * jnp.finfo(jnp.float32).eps
        nk_c = nk.astype(dtype)

        # beta = Lambda^H C^{-1} = inner^{-1} Lambda^H Psi^{-1} = L^{-H} T
        beta = jax.scipy.linalg.solve_triangular(
            jnp.conj(jnp.swapaxes(chol, -1, -2)), t_mat, lower=False)
        mu_old = p.means
        sz = jnp.einsum("kme,ke->km", beta,
                        stats.sx - nk_c[:, None] * mu_old)  # sum r z

        # means: (Sx - Lambda sum r z) / Nk (`mofa_cplx_bussgang.py:296`)
        if cfg.zero_mean:
            means = jnp.zeros_like(mu_old)
        else:
            means = (stats.sx - jnp.einsum("kdm,km->kd", p.lambdas, sz)) \
                / nk_c[:, None]

        stats_n = stats._replace(nk=nk)
        c_oo = _weighted_cross(stats_n, mu_old, mu_old)
        c_on = _weighted_cross(stats_n, mu_old, means)
        c_nn = _weighted_cross(stats_n, means, means)

        # loadings: Lambda = xz ezz^{-1} (`mofa_cplx_bussgang.py:299-300`)
        xz = jnp.conj(jnp.swapaxes(c_on, -1, -2)) @ jnp.conj(
            jnp.swapaxes(beta, -1, -2))  # sum r (x-mu_new) z^H
        zz = jnp.einsum("kme,kef,kpf->kmp", beta, c_oo, jnp.conj(beta))
        bl = jnp.einsum("kme,kep->kmp", beta, p.lambdas)
        ezz = nk_c[:, None, None] * (jnp.eye(m, dtype=dtype) - bl) + zz
        lam_h = jnp.linalg.solve(jnp.conj(jnp.swapaxes(ezz, -1, -2)),
                                 jnp.conj(jnp.swapaxes(xz, -1, -2)))
        lambdas = jnp.conj(jnp.swapaxes(lam_h, -1, -2))

        # psis with the PRE-update loadings, as in the reference
        # (`mofa_cplx_bussgang.py:292-302`):
        # psi = Re diag(C(mu', mu') - Lambda_old beta C(mu_old, mu')) / Nk
        lb = jnp.einsum("kdm,kme->kde", p.lambdas, beta)
        psis = jnp.real(jnp.diagonal(
            c_nn - lb @ c_on, axis1=-2, axis2=-1)) / nk[:, None]
        psis = jnp.clip(psis, cfg.psi_floor, None)
        if cfg.ppca:
            psis = jnp.mean(psis, axis=-1, keepdims=True) * jnp.ones_like(psis)
        if cfg.lock_psis:
            shared = jnp.einsum("k,kd->d", nk, psis) / jnp.sum(nk)
            psis = jnp.broadcast_to(shared, psis.shape)

        weights = nk / n
        new_params = MfaParams(weights, means, lambdas, psis)
        return _MfaState(new_params, stats.log_norm, state.log_like,
                         state.n_iter + 1)

    def cond(state: _MfaState):
        rel = jnp.abs((state.log_like - state.prev_ll)
                      / jnp.where(state.log_like == 0, 1.0, state.log_like))
        keep = jnp.logical_or(state.n_iter <= 5, rel >= cfg.tol)
        return jnp.logical_and(state.n_iter < cfg.max_iter, keep)

    state0 = _MfaState(params0, jnp.asarray(-jnp.inf, jnp.float32),
                       jnp.asarray(jnp.inf, jnp.float32),
                       jnp.zeros((), jnp.int32))
    state = jax.lax.while_loop(cond, em_iter, state0)
    rel = jnp.abs((state.log_like - state.prev_ll) / state.log_like)
    return MfaFitResult(state.params, state.log_like, state.n_iter,
                        rel < cfg.tol)


@partial(jax.jit, static_argnums=(2,))
@highest_precision
def fit(key: jax.Array, x: jax.Array, cfg: MfaConfig) -> MfaFitResult:
    """EM fit (`mofa_cplx_bussgang.py:94-113, 246-310`), statistics-based."""
    n, d = x.shape
    m = cfg.latent_dim
    k = cfg.n_components
    dtype = x.dtype

    # ----- init (`mofa_cplx_bussgang.py:219-243`) -----
    k_km, k_l, k_a = jax.random.split(key, 3)
    if cfg.zero_mean:
        means0 = jnp.zeros((k, d), dtype)
    else:
        # with cfg.axis_name set the k-means runs data-parallel: psum'd
        # assignment statistics and single-device-identical seeding
        # (`models/kmeans.py`), so every shard computes the same initial
        # means — the round-4 machinery that already serves the GMM init
        # (`gmm._init_resp_stats`) lifts the old zero_mean-only DP
        # restriction here too
        km = kmeans(k_km, cplx2real(x, axis=-1).astype(jnp.float32), k,
                    max_iter=cfg.kmeans_iter, axis_name=cfg.axis_name)
        means0 = (km.centers[:, :d] + 1j * km.centers[:, d:]).astype(dtype)
    lam_scale = 1.0 / jnp.sqrt(2.0 * cfg.max_condition_number)
    lr, li = jax.random.split(k_l)
    lambdas0 = (lam_scale * (jax.random.normal(lr, (k, d, m))
                             + 1j * jax.random.normal(li, (k, d, m)))).astype(dtype)
    # np.var of complex data = E|x - mean|^2 (`mofa_cplx_bussgang.py:236`)
    if cfg.axis_name is not None:
        # global per-dim variance: psum'd moments so every shard starts
        # from identical parameters
        n_tot = n * jax.lax.axis_size(cfg.axis_name)
        gmean = jax.lax.psum(jnp.sum(x, 0), cfg.axis_name) / n_tot
        gvar = jax.lax.psum(jnp.sum(jnp.abs(x - gmean) ** 2, 0),
                            cfg.axis_name) / n_tot
        psis0 = jnp.tile(gvar[None, :], (k, 1)).astype(jnp.float32)
    else:
        psis0 = jnp.tile(
            jnp.mean(jnp.abs(x - jnp.mean(x, 0)) ** 2, axis=0)[None, :],
            (k, 1)).astype(jnp.float32)
    amps0 = jax.random.uniform(k_a, (k,), jnp.float32)
    amps0 = amps0 / jnp.sum(amps0)
    return _run_em(MfaParams(amps0, means0, lambdas0, psis0), x, cfg)


@partial(jax.jit, static_argnums=(2,))
@highest_precision
def fit_resume(params: MfaParams, x: jax.Array,
               cfg: MfaConfig) -> MfaFitResult:
    """Warm-start EM from existing parameters — checkpoint-based restart
    (SURVEY §5); the analog of `gmm.fit_resume`. The reference's sklearn
    `warm_start` plumbing exists but is unused (`gmm_cplx_bussgang.py:491`);
    its Mofa has no resume at all."""
    return _run_em(params, x, cfg)


def to_gmm_params(params: MfaParams, reg: float = 0.0) -> GmmParams:
    """Densify to a full-covariance bank for Bussgang estimation
    (`mofa_cplx_bussgang.py:117-216` uses dense covs at prediction)."""
    covs = covariances(params)
    if reg:
        covs = linalg.add_jitter(covs, reg)
    prec = linalg.robust_precision_cholesky(covs)
    return GmmParams(params.weights, params.means, covs, prec)
