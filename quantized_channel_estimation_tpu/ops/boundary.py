"""Device-boundary representation of complex data: packed (re, im) reals.

The TPU runtime used here (and TPU hardware in general) has no native complex
number type: XLA decomposes complex arithmetic into real MXU/VPU ops inside a
compiled program, but complex-typed *buffers* at program boundaries
(constants, transfers, outputs) are unsupported on this backend
(UNIMPLEMENTED at execution). The rule this module enforces:

    complex values exist only INSIDE jit traces and on the host (numpy);
    every on-device array is real.

`Packed` is a pytree node carrying the real and imaginary parts of a complex
array as two real arrays. `cjit(fn)` wraps a complex-signature pure function
so its compiled signature is all-real: Packed leaves are recombined to
complex after entering the trace and split again before leaving it. Library
code stays written in natural complex form; only top-level pipeline stages
are cjit-wrapped.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Packed(NamedTuple):
    """A complex array as two real device arrays (a pytree node)."""
    re: Any
    im: Any

    @property
    def shape(self):
        return self.re.shape

    @property
    def dtype(self):
        return jnp.result_type(self.re.dtype, jnp.complex64)

    def __array__(self, dtype=None):
        arr = np.asarray(self.re) + 1j * np.asarray(self.im)
        return arr.astype(dtype) if dtype is not None else arr


def _is_packed(x) -> bool:
    return isinstance(x, Packed)


def pack(x):
    """complex array -> Packed. Host-side numpy split for concrete complex
    input (never creates a complex device buffer); identity for Packed or
    real input."""
    if isinstance(x, Packed):
        return x
    if isinstance(x, jax.core.Tracer):
        return Packed(jnp.real(x), jnp.imag(x)) if jnp.iscomplexobj(x) else x
    if np.iscomplexobj(x):
        arr = np.asarray(x)
        return Packed(jnp.asarray(arr.real.copy()), jnp.asarray(arr.imag.copy()))
    return x


def unpack(x):
    """Packed -> complex (call only inside a trace or on CPU); identity else."""
    if isinstance(x, Packed):
        return x.re + 1j * x.im
    return x


def pack_tree(tree):
    return jax.tree_util.tree_map(pack, tree, is_leaf=_is_packed)


def unpack_tree(tree):
    return jax.tree_util.tree_map(unpack, tree, is_leaf=_is_packed)


def asnumpy(x) -> np.ndarray:
    """Packed/array -> host numpy (complex recombined on the host)."""
    if isinstance(x, Packed):
        return np.asarray(x)
    return np.asarray(x)


def cjit(fn, static_argnums=(), static_argnames=None, **jit_kwargs):
    """jit with an all-real compiled signature.

    The wrapped function may take and return complex arrays (or pytrees with
    complex leaves) — they cross the boundary as Packed reals. Non-complex
    leaves and static arguments pass through untouched.
    """
    if isinstance(static_argnums, int):
        static_argnums = (static_argnums,)
    static_set = set(static_argnums)

    def traced(*args, **kwargs):
        args = tuple(a if i in static_set else unpack_tree(a)
                     for i, a in enumerate(args))
        kwargs = {k: (v if static_argnames and k in static_argnames
                      else unpack_tree(v)) for k, v in kwargs.items()}
        return pack_tree(fn(*args, **kwargs))

    jitted = jax.jit(traced, static_argnums=static_argnums,
                     static_argnames=static_argnames, **jit_kwargs)

    def wrapper(*args, **kwargs):
        args = tuple(a if i in static_set else pack_tree(a)
                     for i, a in enumerate(args))
        kwargs = {k: (v if static_argnames and k in static_argnames
                      else pack_tree(v)) for k, v in kwargs.items()}
        return jitted(*args, **kwargs)

    wrapper._jitted = jitted
    return wrapper
