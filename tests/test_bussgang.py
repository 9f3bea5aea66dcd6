"""Bussgang statistics vs independent numerical-integration oracles."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from quantized_channel_estimation_tpu.ops import bussgang as B
from quantized_channel_estimation_tpu.ops import quantizer as Q


def _numeric_gain(q, c):
    """Oracle: scalar Bussgang gain b = E[Q(y) conj(y)] / E[|y|^2] for
    y ~ CN(0, c), computed by numerical integration over one real component."""
    s = math.sqrt(c / 2)
    x = np.linspace(-10 * s, 10 * s, 400001)
    pdf = np.exp(-x ** 2 / c) / math.sqrt(math.pi * c)  # N(0, c/2)
    qx = np.asarray(Q.quantize_real(jnp.asarray(x, jnp.float32), q), np.float64)
    return 2 * np.trapezoid(qx * x * pdf, x) / c


def _numeric_power(q, c):
    """Oracle: E[|Q(y)|^2] = 2 E[Q(yr)^2]."""
    s = math.sqrt(c / 2)
    x = np.linspace(-10 * s, 10 * s, 400001)
    pdf = np.exp(-x ** 2 / c) / math.sqrt(math.pi * c)
    qx = np.asarray(Q.quantize_real(jnp.asarray(x, jnp.float32), q), np.float64)
    return 2 * np.trapezoid(qx ** 2 * pdf, x)


@pytest.mark.parametrize("qtype", ["uniform", "lloyd"])
@pytest.mark.parametrize("n_bits", [2, 3])
def test_gain_matches_integral(qtype, n_bits):
    snr = 5.0
    q = Q.design_quantizer(snr, n_bits, qtype)
    for c in [0.5, 1.0, 2.3]:
        got = float(B.bussgang_gain_diag(jnp.asarray([c]), n_bits, q)[0])
        want = _numeric_gain(q, c)
        assert abs(got - want) < 2e-4, (qtype, n_bits, c, got, want)


def test_one_bit_gain():
    c = 1.7
    got = float(B.bussgang_gain_diag(jnp.asarray([c]), 1)[0])
    assert abs(got - math.sqrt(2 / math.pi) / math.sqrt(c)) < 1e-6


@pytest.mark.parametrize("n_bits", [2, 3])
def test_quantized_variance_matches_integral(n_bits):
    q = Q.design_uniform(0.0, n_bits)
    for c in [0.7, 1.0, 1.9]:
        got = float(B.quantized_variance(jnp.asarray([c]), q)[0])
        want = _numeric_power(q, c)
        assert abs(got - want) < 1e-4


def test_arcsine_diag_is_one(rng):
    """1-bit output power is exactly 1 (unit-modulus per component pair)."""
    a = rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))
    cy = a @ a.conj().T + 4 * np.eye(4)
    cr = np.asarray(B.arcsine_cov(jnp.asarray(cy, jnp.complex64)))
    np.testing.assert_allclose(np.diag(cr).real, 1.0, atol=1e-5)
    np.testing.assert_allclose(np.diag(cr).imag, 0.0, atol=1e-5)


def test_arcsine_matches_monte_carlo(rng):
    """Arcsine law vs empirical covariance of sign-quantized Gaussians."""
    d = 3
    a = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
    cy = a @ a.conj().T + d * np.eye(d)
    l = np.linalg.cholesky(cy)
    n = 400_000
    w = math.sqrt(0.5) * (rng.standard_normal((n, d)) + 1j * rng.standard_normal((n, d)))
    y = w @ l.T  # rows y with E[y y^H] = L L^H = Cy
    s = 1 / math.sqrt(2)
    r = s * (np.sign(y.real) + 1j * np.sign(y.imag))
    emp = r.T.conj() @ r / n
    cr = np.asarray(B.arcsine_cov(jnp.asarray(cy, jnp.complex128)))
    np.testing.assert_allclose(cr, emp.conj(), atol=8e-3)


def test_inf_bits_identity(rng):
    cy = jnp.eye(4, dtype=jnp.complex64) * 2.0
    np.testing.assert_allclose(np.asarray(B.quantized_cov(cy, Q.INF_BITS)),
                               np.asarray(cy))
    g = B.bussgang_gain_diag(jnp.ones((4,)), Q.INF_BITS)
    np.testing.assert_allclose(np.asarray(g), 1.0)
