"""Quantizer unit tests: thresholds/labels vs the Max table, bit-exact binning
vs np.digitize, Lloyd-Max fixed-point properties (SURVEY §4 test strategy)."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from quantized_channel_estimation_tpu.ops import quantizer as Q


def _np_digitize_quant(x, thresholds, labels):
    """Independent numpy oracle reproducing the reference binning
    (`modules/utils.py:189-203`)."""
    idx = np.digitize(x, thresholds)
    return labels[idx]


@pytest.mark.parametrize("n_bits", [2, 3, 4])
@pytest.mark.parametrize("snr", [-10, 0, 10])
def test_uniform_thresholds_match_max_table(n_bits, snr):
    q = Q.design_uniform(snr, n_bits)
    delta = float(Q.uniform_step(snr, n_bits))
    th = np.asarray(q.thresholds)
    # symmetric, uniformly spaced at delta, 2^b - 1 thresholds
    assert th.shape == (2 ** n_bits - 1,)
    np.testing.assert_allclose(np.diff(th), delta, rtol=1e-6)
    np.testing.assert_allclose(th, -th[::-1], atol=1e-6)
    # labels at cell midpoints
    lb = np.asarray(q.labels)
    np.testing.assert_allclose(lb[:-1], th - delta / 2, rtol=1e-6)
    np.testing.assert_allclose(lb[-1], th[-1] + delta / 2, rtol=1e-6)


@pytest.mark.parametrize("n_bits", [2, 3, 4])
def test_quantize_bit_exact_vs_digitize(rng, n_bits):
    q = Q.design_uniform(5.0, n_bits)
    x = rng.standard_normal(5000).astype(np.float32)
    got = np.asarray(Q.quantize_real(jnp.asarray(x), q))
    want = _np_digitize_quant(x, np.asarray(q.thresholds), np.asarray(q.labels))
    np.testing.assert_array_equal(got, want)


def test_one_bit_sign(rng):
    x = (rng.standard_normal(100) + 1j * rng.standard_normal(100)).astype(np.complex64)
    r = np.asarray(Q.quantize(jnp.asarray(x), 1, None))
    s = 1 / math.sqrt(2)
    np.testing.assert_allclose(np.real(r), s * np.sign(np.real(x)), atol=1e-7)
    np.testing.assert_allclose(np.imag(r), s * np.sign(np.imag(x)), atol=1e-7)


def test_inf_bits_passthrough(rng):
    x = (rng.standard_normal(10) + 1j * rng.standard_normal(10)).astype(np.complex64)
    r = Q.quantize(jnp.asarray(x), Q.INF_BITS, None)
    np.testing.assert_array_equal(np.asarray(r), x)


@pytest.mark.parametrize("n_bits", [2, 3])
def test_lloyd_max_fixed_point(n_bits):
    """Converged Lloyd-Max design must satisfy the two optimality conditions:
    thresholds are centroid midpoints, centroids are conditional means."""
    snr = 5.0
    q = Q.design_lloyd(snr, n_bits)
    th = np.asarray(q.thresholds, np.float64)
    lb = np.asarray(q.labels, np.float64)
    # midpoint condition (interior thresholds)
    np.testing.assert_allclose(th, 0.5 * (lb[1:] + lb[:-1]), rtol=1e-3, atol=1e-4)
    # conditional-mean condition via numerical integration
    var = 0.5 * (1 + 10 ** (-snr / 10))
    s = math.sqrt(var)
    edges = np.concatenate([[-12 * s], th, [12 * s]])
    for i in range(len(lb)):
        x = np.linspace(edges[i], edges[i + 1], 20001)
        pdf = np.exp(-x ** 2 / (2 * var)) / math.sqrt(2 * math.pi * var)
        centroid = np.trapezoid(x * pdf, x) / np.trapezoid(pdf, x)
        np.testing.assert_allclose(lb[i], centroid, rtol=2e-3, atol=2e-4)


def test_lloyd_distortion_near_optimal():
    """At high SNR the input is ~N(0, 1/2); normalized distortion must be close
    to Max's optimal non-uniform quantizer distortion (0.1175 for 2 bits)."""
    q = Q.design_lloyd(40.0, 2)
    var = 0.5 * (1 + 10 ** (-4.0))
    rho_norm = 2 * float(q.rho) / var  # rho covers the positive half
    assert abs(rho_norm - 0.1175) < 5e-3


def test_lloyd_symmetric():
    q = Q.design_lloyd(0.0, 3)
    th = np.asarray(q.thresholds)
    lb = np.asarray(q.labels)
    np.testing.assert_allclose(th, -th[::-1], atol=1e-6)
    np.testing.assert_allclose(lb, -lb[::-1], atol=1e-6)
    assert np.all(np.diff(th) > 0)


def test_lloyd_from_gmm_mixture():
    """GMM-matched Lloyd design: mixture of two variances must give a design
    between the two single-variance designs."""
    import jax.numpy as jnp
    lo = Q.design_lloyd(5.0, 3, mixture_variances=jnp.asarray([0.5]))
    hi = Q.design_lloyd(5.0, 3, mixture_variances=jnp.asarray([2.0]))
    mix = Q.design_lloyd_from_gmm(jnp.asarray([0.5, 0.5]),
                                  jnp.asarray([0.5, 2.0]), 5.0, 3)
    t_lo, t_hi, t_mix = (np.asarray(x.thresholds) for x in (lo, hi, mix))
    pos = t_lo.shape[0] // 2  # compare the positive thresholds
    assert np.all(t_mix[pos:] >= t_lo[pos:] - 1e-6)
    assert np.all(t_mix[pos:] <= t_hi[pos:] + 1e-6)
    assert np.all(np.diff(np.asarray(mix.thresholds)) > 0)
