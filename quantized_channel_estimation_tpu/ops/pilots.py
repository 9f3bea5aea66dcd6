"""Pilot matrix construction (`modules/utils.py:337-367`).

The observation model is y = A h + n with A = kron(x, I_N) for a pilot vector
x of length n_pilots, so y has dimension n_pilots * N.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from quantized_channel_estimation_tpu.ops.quantizer import is_inf_bits


def pilot_vector(key, n_pilots: int, n_bits, pilot_type: str = "angle_amp",
                 dtype=jnp.complex64) -> jax.Array:
    """Pilot vector x (n_pilots,). For n_bits = inf, all-ones (`utils.py:338`).

    Types (`utils.py:341-362`):
      angle:      unit-modulus phase ramp over [0, pi/2)
      angle_amp:  phase ramp with amplitude ramp 0.5 -> 1, power-normalized
                  (the default everywhere in the reference)
      rand:       complex Gaussian, power-normalized (needs `key`)
      ones:       all ones
    """
    if is_inf_bits(n_bits) or pilot_type == "ones":
        return jnp.ones((n_pilots,), dtype)
    if pilot_type == "angle":
        ph = jnp.linspace(0.0, jnp.pi / 2.0, n_pilots, endpoint=False)
        return jnp.exp(1j * ph).astype(dtype)
    if pilot_type == "angle_amp":
        ph = jnp.linspace(0.0, jnp.pi / 2.0, n_pilots, endpoint=False)
        amp = jnp.linspace(0.5, 1.0, n_pilots, endpoint=True)
        x = amp * jnp.exp(1j * ph)
        return (x * math.sqrt(n_pilots) / jnp.linalg.norm(x)).astype(dtype)
    if pilot_type == "rand":
        if key is None:
            raise ValueError("pilot_type='rand' requires a PRNG key")
        kr, ki = jax.random.split(key)
        x = jax.random.normal(kr, (n_pilots,)) + 1j * jax.random.normal(ki, (n_pilots,))
        return (x * math.sqrt(n_pilots) / jnp.linalg.norm(x)).astype(dtype)
    raise NotImplementedError(f"Pilot type {pilot_type!r} is not implemented!")


def pilot_matrix(n_antennas: int, n_pilots: int, n_bits,
                 pilot_type: str = "angle_amp", key=None,
                 dtype=jnp.complex64) -> jax.Array:
    """A = kron(x, I_N), shape (n_pilots * N, N) (`utils.py:366`)."""
    x = pilot_vector(key, n_pilots, n_bits, pilot_type, dtype)
    return jnp.kron(x[:, None], jnp.eye(n_antennas, dtype=dtype))
