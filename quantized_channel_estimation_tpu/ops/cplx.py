"""Complex-array conventions and random sampling.

TPU-first notes: complex64 is the working precision. XLA nominally lowers
complex matmuls to real MXU matmul pairs, but that lowering cannot be
relied on (a 2026-08-21 axon runtime measured native c64 GEMMs ~125x slower
than equivalent-FLOP f32 — see `cmatmul`); hot complex GEMMs should go
through the explicit real embeddings below. float64 paths exist only for
CPU parity tests and are selected by the dtype of the inputs, never
hard-coded.

Reference behavior being reproduced: `modules/utils.py:13` (crandn),
`modules/utils.py:504-515,621-635` (cplx2real/real2cplx).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def crandn(key: jax.Array, shape, dtype=jnp.complex64) -> jax.Array:
    """Circularly-symmetric complex standard normal, E[|x|^2] = 1."""
    rdt = jnp.finfo(dtype).dtype  # matching real dtype
    kr, ki = jax.random.split(key)
    re = jax.random.normal(kr, shape, dtype=rdt)
    im = jax.random.normal(ki, shape, dtype=rdt)
    return jnp.sqrt(jnp.asarray(0.5, rdt)) * (re + 1j * im).astype(dtype)


def cplx2real(x: jax.Array, axis: int = -1) -> jax.Array:
    """Concatenate real and imaginary parts along `axis`."""
    return jnp.concatenate([jnp.real(x), jnp.imag(x)], axis=axis)


def real2cplx(x: jax.Array, axis: int = -1) -> jax.Array:
    """Inverse of :func:`cplx2real`."""
    re, im = jnp.split(x, 2, axis=axis)
    return re + 1j * im


def cmatmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Complex matmul a @ b through ONE real GEMM via the 2x2 block
    embedding: [ar ai] @ [[br, bi], [-bi, br]] = [cr, ci].

    Why not `a @ b` directly: XLA *normally* lowers complex matmuls to real
    MXU GEMM pairs, but the axon TPU runtime was measured (2026-08-21
    session) lowering native c64 GEMMs ~125x slower than equivalent-FLOP
    f32 GEMMs (2.7 s vs 27 ms for (16384,1024)x(1024,1024)) — a backend
    regression this embedding sidesteps with identical math (it IS the
    4-real-GEMM decomposition, fused into one MXU call whose 2K
    contraction also avoids half-width tiles at K < 128, the same layout
    the Pallas estimation kernel uses). Never slower on a healthy backend
    (measured equal), so it is the default for hot complex GEMMs.

    a (..., n, k) complex, b (..., k, m) complex -> (..., n, m) complex.
    """
    m = b.shape[-1]
    ab = jnp.concatenate([jnp.real(a), jnp.imag(a)], axis=-1)
    top = jnp.concatenate([jnp.real(b), jnp.imag(b)], axis=-1)
    bot = jnp.concatenate([-jnp.imag(b), jnp.real(b)], axis=-1)
    c = ab @ jnp.concatenate([top, bot], axis=-2)
    return (c[..., :m] + 1j * c[..., m:]).astype(
        complex_dtype_of(ab.dtype))


def cmatmul_realout(a: jax.Array, b: jax.Array) -> jax.Array:
    """Re(a @ b) for complex a, b with two real GEMMs (the imaginary half
    is never computed): Re = ar @ br - ai @ bi. Returns a real array."""
    ab = jnp.concatenate([jnp.real(a), jnp.imag(a)], axis=-1)
    bb = jnp.concatenate([jnp.real(b), -jnp.imag(b)], axis=-2)
    return ab @ bb


def rcmatmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """real a @ complex b as ONE real GEMM against [br, bi] (a complex cast
    would waste half the GEMM on a zero imaginary block)."""
    m = b.shape[-1]
    c = a @ jnp.concatenate([jnp.real(b), jnp.imag(b)], axis=-1)
    return (c[..., :m] + 1j * c[..., m:]).astype(complex_dtype_of(a.dtype))


def real_dtype_of(dtype) -> jnp.dtype:
    """float dtype matching a complex dtype (c64 -> f32, c128 -> f64)."""
    return jnp.finfo(dtype).dtype


def complex_dtype_of(dtype) -> jnp.dtype:
    """complex dtype matching a float dtype (f32 -> c64, f64 -> c128)."""
    return jnp.result_type(dtype, jnp.complex64)
