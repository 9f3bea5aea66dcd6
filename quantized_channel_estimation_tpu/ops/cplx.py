"""Complex-array conventions and random sampling.

TPU-first notes: complex64 is the working precision (XLA lowers complex matmuls
to real MXU matmuls); float64 paths exist only for CPU parity tests and are
selected by the dtype of the inputs, never hard-coded.

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


def real_dtype_of(dtype) -> jnp.dtype:
    """float dtype matching a complex dtype (c64 -> f32, c128 -> f64)."""
    return jnp.finfo(dtype).dtype


def complex_dtype_of(dtype) -> jnp.dtype:
    """complex dtype matching a float dtype (f32 -> c64, f64 -> c128)."""
    return jnp.result_type(dtype, jnp.complex64)
