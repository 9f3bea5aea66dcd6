"""Complex-array conventions and random sampling.

TPU-first notes: complex64 is the working precision (XLA lowers complex
matmuls to real MXU matmul pairs — re-verified device-resident 2026-08-21:
native c64 GEMMs run at full speed; an earlier "125x slower" measurement
was a host-array tunnel-transfer artifact, see CLAUDE.md). The explicit
real embeddings below (`cmatmul` and friends) are measured speed-EQUAL to
native complex GEMMs on TPU and exist for split-real pipelines that avoid
materializing complex intermediates. float64 paths exist only for CPU
parity tests and are selected by the dtype of the inputs, never
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

    Measured speed-EQUAL to a native `a @ b` on the TPU (device-resident
    medians; the same layout the Pallas estimation kernel uses — its 2K
    contraction also avoids half-width MXU tiles at K < 128). Useful in
    split-real pipelines that carry (re, im) instead of materialized
    complex arrays; not a workaround for any backend deficiency (an
    earlier session's "c64 GEMMs 125x slow" finding was a host-array
    tunnel-transfer artifact — see CLAUDE.md).

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
