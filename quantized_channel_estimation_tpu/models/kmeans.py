"""Jittable k-means (k-means++ seeding + Lloyd iterations).

Replaces the reference's sklearn KMeans init of the complex EM
(`gmm_cplx_bussgang.py:549-574`): complex data is stacked [Re; Im] and
clustered in R^{2D}. Fully on-device; deterministic given the PRNG key.
EM is init-sensitive, so parity with the reference is checked on converged
metrics, not parameters (SURVEY §7 "hard parts").
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KMeansResult(NamedTuple):
    centers: jax.Array  # (K, D)
    labels: jax.Array   # (N,)


def _sq_dists(x: jax.Array, centers: jax.Array) -> jax.Array:
    """(N, K) squared Euclidean distances via the |x|^2 - 2 x.c + |c|^2 GEMM."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    c2 = jnp.sum(centers * centers, axis=-1)
    return x2 - 2.0 * (x @ centers.T) + c2


def _kmeanspp_init(key: jax.Array, x: jax.Array, k: int) -> jax.Array:
    """k-means++ seeding: each next center sampled with probability
    proportional to the squared distance to the nearest chosen center."""
    n = x.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    centers0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])
    d0 = jnp.sum((x - x[first]) ** 2, axis=-1)

    def body(i, state):
        centers, dmin, key = state
        key, kc = jax.random.split(key)
        idx = jax.random.categorical(kc, jnp.log(jnp.maximum(dmin, 1e-30)))
        c = x[idx]
        centers = centers.at[i].set(c)
        dmin = jnp.minimum(dmin, jnp.sum((x - c) ** 2, axis=-1))
        return centers, dmin, key

    centers, _, _ = jax.lax.fori_loop(1, k, body, (centers0, d0, key))
    return centers


def kmeans(key: jax.Array, x: jax.Array, k: int, max_iter: int = 50,
           tol: float = 1e-4) -> KMeansResult:
    """Lloyd's algorithm with k-means++ seeding. x: (N, D) real.

    Stops when the total squared center shift < tol * mean per-dim variance
    (sklearn's convention) or at max_iter. Empty clusters keep their center.
    """
    centers0 = _kmeanspp_init(key, x, k)
    tol_scaled = tol * jnp.mean(jnp.var(x, axis=0))

    def assign(centers):
        return jnp.argmin(_sq_dists(x, centers), axis=-1)

    def update(labels):
        onehot = jax.nn.one_hot(labels, k, dtype=x.dtype)  # (N, K)
        counts = jnp.sum(onehot, axis=0)  # (K,)
        sums = onehot.T @ x  # (K, D)
        return sums / jnp.maximum(counts, 1.0)[:, None], counts

    def relocate_empty(centers, counts):
        """Move empty-cluster centers to the points farthest from their
        assigned centers (sklearn's empty-cluster strategy); distinct points
        for multiple empty clusters."""
        dmin = jnp.min(_sq_dists(x, centers), axis=1)

        def body(j, carry):
            centers, dmin = carry
            idx = jnp.argmax(dmin)
            empty = counts[j] == 0
            centers = centers.at[j].set(
                jnp.where(empty, x[idx], centers[j]))
            dmin = jnp.where(empty, dmin.at[idx].set(-1.0), dmin)
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
