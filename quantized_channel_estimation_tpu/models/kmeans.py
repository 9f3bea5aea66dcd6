"""Jittable k-means (k-means++ seeding + Lloyd iterations), single-device
or data-parallel under `shard_map`.

Replaces the reference's sklearn KMeans init of the complex EM
(`gmm_cplx_bussgang.py:549-574`): complex data is stacked [Re; Im] and
clustered in R^{2D}. Fully on-device; deterministic given the PRNG key.
EM is init-sensitive, so parity with the reference is checked on converged
metrics, not parameters (SURVEY §7 "hard parts").

Data-parallel form (round-4): with `axis_name` set (x is the per-device
shard of a (data,)-sharded array), every step reduces with collectives —
assignment statistics (centroid sums/counts) psum like the EM sufficient
statistics they are, k-means++ seeding reproduces the single-device draws
exactly (the categorical sample is realized as argmax(logits + gumbel),
which is bit-identical to `jax.random.categorical`; each shard evaluates
the full-length gumbel stream and slices its window, and the global
argmax/row-selection merge with pmax/psum, ties to the lowest global index
like a single-device argmax), and sklearn's farthest-point empty-cluster
relocation runs on the globally farthest points. This removes the
`init='random'` restriction data-parallel EM fits previously carried
(`parallel/mesh.py` round-3) — a DP kmeans-init fit now matches the
single-device kmeans-init fit to f32 summation-order tolerance.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class KMeansResult(NamedTuple):
    centers: jax.Array  # (K, D)
    labels: jax.Array   # (N,) — per-shard rows under axis_name


def _sq_dists(x: jax.Array, centers: jax.Array) -> jax.Array:
    """(N, K) squared Euclidean distances via the |x|^2 - 2 x.c + |c|^2 GEMM."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    c2 = jnp.sum(centers * centers, axis=-1)
    return x2 - 2.0 * (x @ centers.T) + c2


class _Comm(NamedTuple):
    """Collective helpers that degrade to identities on a single device, so
    one code path serves both layouts (and the DP fit can be asserted
    against the single-device fit)."""
    axis_name: Optional[str]
    n_local: int
    n_global: int
    lo: jax.Array          # this shard's global row offset

    def gsum(self, v):
        return v if self.axis_name is None else jax.lax.psum(v, self.axis_name)

    def gmax(self, v):
        return v if self.axis_name is None else jax.lax.pmax(v, self.axis_name)

    def select_row(self, x, global_idx):
        """x_global[global_idx], with x the local shard."""
        local = global_idx - self.lo
        owns = (local >= 0) & (local < self.n_local)
        row = x[jnp.clip(local, 0, self.n_local - 1)]
        return self.gsum(jnp.where(owns, row, jnp.zeros_like(row)))

    def global_argmax(self, scores):
        """argmax over the GLOBAL score vector (scores: local slice); ties
        resolve to the lowest global index, matching a single-device
        argmax over the concatenated vector."""
        li = jnp.argmax(scores)
        gv = self.gmax(scores[li])
        sentinel = jnp.asarray(self.n_global, jnp.int32)
        cand = jnp.where(scores[li] == gv, self.lo + li, sentinel)
        return -self.gmax(-cand.astype(jnp.int32))


def _comm(axis_name, n_local: int) -> _Comm:
    if axis_name is None:
        return _Comm(None, n_local, n_local, jnp.zeros((), jnp.int32))
    size = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    return _Comm(axis_name, n_local, n_local * size,
                 (idx * n_local).astype(jnp.int32))


def _local_gumbel(key, comm: _Comm, dtype):
    """This shard's window of the GLOBAL (n_global,) gumbel stream — every
    shard draws the identical full-length stream and slices, so the
    realized categorical sample equals the single-device
    `jax.random.categorical` draw bit-for-bit."""
    g = jax.random.gumbel(key, (comm.n_global,), dtype)
    if comm.axis_name is None:
        return g
    return jax.lax.dynamic_slice(g, (comm.lo,), (comm.n_local,))


def _kmeanspp_init(key: jax.Array, x: jax.Array, k: int,
                   comm: _Comm) -> jax.Array:
    """k-means++ seeding: each next center sampled with probability
    proportional to the squared distance to the nearest chosen center."""
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, comm.n_global)
    c0 = comm.select_row(x, first)
    centers0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(c0)
    d0 = jnp.sum((x - c0) ** 2, axis=-1)

    def body(i, state):
        centers, dmin, key = state
        key, kc = jax.random.split(key)
        logits = jnp.log(jnp.maximum(dmin, 1e-30))
        idx = comm.global_argmax(logits + _local_gumbel(kc, comm, x.dtype))
        c = comm.select_row(x, idx)
        centers = centers.at[i].set(c)
        dmin = jnp.minimum(dmin, jnp.sum((x - c) ** 2, axis=-1))
        return centers, dmin, key

    centers, _, _ = jax.lax.fori_loop(1, k, body, (centers0, d0, key))
    return centers


def kmeans(key: jax.Array, x: jax.Array, k: int, max_iter: int = 50,
           tol: float = 1e-4, axis_name: Optional[str] = None) -> KMeansResult:
    """Lloyd's algorithm with k-means++ seeding. x: (N, D) real — the local
    shard of a 'data'-sharded array when `axis_name` is set (run under
    shard_map; returned labels cover the local rows).

    Stops when the total squared center shift < tol * mean per-dim variance
    (sklearn's convention) or at max_iter. Empty clusters relocate to the
    globally farthest points.
    """
    comm = _comm(axis_name, x.shape[0])
    centers0 = _kmeanspp_init(key, x, k, comm)
    # global per-dim variance from psum'd moments (single-device: the same
    # expression without collectives)
    n = comm.n_global
    mu = comm.gsum(jnp.sum(x, axis=0)) / n
    ex2 = comm.gsum(jnp.sum(x * x, axis=0)) / n
    tol_scaled = tol * jnp.mean(ex2 - mu * mu)

    def assign(centers):
        return jnp.argmin(_sq_dists(x, centers), axis=-1)

    def update(labels):
        onehot = jax.nn.one_hot(labels, k, dtype=x.dtype)  # (N_local, K)
        counts = comm.gsum(jnp.sum(onehot, axis=0))        # (K,) global
        sums = comm.gsum(onehot.T @ x)                     # (K, D) global
        return sums / jnp.maximum(counts, 1.0)[:, None], counts

    def relocate_empty(centers, counts):
        """Move empty-cluster centers to the points farthest from their
        assigned centers (sklearn's empty-cluster strategy); distinct points
        for multiple empty clusters."""
        dmin = jnp.min(_sq_dists(x, centers), axis=1)

        def body(j, carry):
            centers, dmin = carry
            gidx = comm.global_argmax(dmin)
            row = comm.select_row(x, gidx)
            empty = counts[j] == 0
            centers = centers.at[j].set(
                jnp.where(empty, row, centers[j]))
            local = gidx - comm.lo
            owns = (local >= 0) & (local < comm.n_local)
            hit = jnp.clip(local, 0, comm.n_local - 1)
            dmin = jnp.where(empty & owns, dmin.at[hit].set(-1.0), dmin)
            return centers, dmin

        centers, _ = jax.lax.fori_loop(0, k, body, (centers, dmin))
        return centers

    def body(state):
        centers, _, i, _ = state
        labels = assign(centers)
        new_centers, counts = update(labels)
        new_centers = jnp.where(counts[:, None] > 0, new_centers, centers)
        new_centers = relocate_empty(new_centers, counts)
        shift = jnp.sum((new_centers - centers) ** 2)
        return new_centers, labels, i + 1, shift

    def cond(state):
        _, _, i, shift = state
        return jnp.logical_and(i < max_iter, shift >= tol_scaled)

    init_labels = assign(centers0)
    centers, labels, _, _ = jax.lax.while_loop(
        cond, body, (centers0, init_labels, 0, jnp.asarray(jnp.inf, x.dtype)))
    return KMeansResult(centers, assign(centers))
