"""Matmul-precision control.

TPU default matmul precision multiplies in bfloat16 (3 significand digits).
That is fine for the bulk per-sample estimation GEMMs, but it corrupts
covariance-level algebra: EM sufficient statistics NaN their factorizations
at D=64, and prepared-bank filters built from near-singular high-SNR Cr
matrices produce badly wrong estimates (verified on hardware both times).
Decorate covariance-level functions with `highest_precision`.
"""
from __future__ import annotations

import functools

import jax


def highest_precision(fn):
    """Run fn's trace under full-float32 matmul precision."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped
