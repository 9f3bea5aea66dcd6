"""FFT-domain structured prepared banks vs the dense estimator.

The structured path must reproduce `gmm_estimator.estimate` on
(block-)circulant fits to FFT rounding — the posteriors are a unitary
change of basis away from the dense ones, not an approximation — and must
track the dense Toeplitz estimator closely through the Frobenius-best
circulant approximation (measured delta, tools/structured_bank_bench.py).
Reference contrast: the upstream estimation path densifies every structure
(`gmm_cplx_bussgang.py:317` raises for non-'full' at prediction).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_channel_estimation_tpu.models import (
    gmm, gmm_estimator, structured_bank as sb)
from quantized_channel_estimation_tpu.ops import linalg, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q


def _rel(a, b):
    return float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))


# ---------------------------------------------------------------------------
# linalg helpers
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("blocks", [None, (4, 6)])
def test_circulant_spectra_roundtrip(blocks):
    d = 24
    key = jax.random.PRNGKey(0)
    s = jax.random.uniform(key, (5, d), minval=0.1, maxval=3.0,
                           dtype=jnp.float32)
    if blocks is None:
        f = linalg.unitary_dft(d)
    else:
        f = jnp.kron(linalg.unitary_dft(blocks[0]),
                     linalg.unitary_dft(blocks[1]))
    c = jnp.einsum("fd,kf,fe->kde", jnp.conj(f), s.astype(jnp.complex64), f)
    np.testing.assert_allclose(linalg.circulant_diag_spectra(c, blocks), s,
                               atol=2e-6)
    rows = linalg.circulant_first_rows(s, blocks)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(c[:, 0, :]),
                               atol=5e-6)
    np.testing.assert_allclose(
        linalg.circulant_spectra_from_first_rows(rows, blocks), s, atol=2e-6)


@pytest.mark.parametrize("blocks", [None, (4, 6)])
def test_unitary_fft_matches_dft_matrix(blocks):
    d = 24
    key = jax.random.PRNGKey(1)
    x = (jax.random.normal(key, (3, d)) +
         1j * jax.random.normal(jax.random.PRNGKey(2), (3, d))
         ).astype(jnp.complex64)
    if blocks is None:
        f = linalg.unitary_dft(d)
    else:
        f = jnp.kron(linalg.unitary_dft(blocks[0]),
                     linalg.unitary_dft(blocks[1]))
    np.testing.assert_allclose(np.asarray(sb.unitary_fft(x, blocks)),
                               np.asarray(x @ f.T), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(sb.unitary_ifft(sb.unitary_fft(x, blocks), blocks)),
        np.asarray(x), atol=2e-5)


def test_spectra_of_toeplitz_is_best_circulant():
    """For a Hermitian Toeplitz matrix the Rayleigh-diagonal spectrum equals
    the triangular-weighted circulant approximation of
    `linalg.best_circulant_approximation`."""
    d = 16
    t = (0.9 ** jnp.arange(d)) * jnp.exp(1j * 0.3 * jnp.arange(d))
    c = linalg.toeplitz_from_first_row(t.astype(jnp.complex64))
    np.testing.assert_allclose(
        np.asarray(linalg.circulant_diag_spectra(c[None])[0]),
        np.asarray(linalg.best_circulant_approximation(t)),
        atol=1e-5)


# ---------------------------------------------------------------------------
# fixtures: circulant-generated data + fits
# ---------------------------------------------------------------------------

D, K = 32, 8


def _circulant_data(key, n, d=D, k=K, mean=0.0):
    sk = jax.random.uniform(jax.random.fold_in(key, 0), (k, d),
                            minval=0.05, maxval=2.0, dtype=jnp.float32)
    comp = jax.random.randint(jax.random.fold_in(key, 1), (n,), 0, k)
    w = (jax.random.normal(jax.random.fold_in(key, 2), (n, d)) +
         1j * jax.random.normal(jax.random.fold_in(key, 3), (n, d))
         ) / np.sqrt(2)
    h = sb.unitary_ifft(jnp.sqrt(sk)[comp] * sb.unitary_fft(w)) + mean
    return h.astype(jnp.complex64)


@pytest.fixture(scope="module")
def circ_fit():
    h = _circulant_data(jax.random.PRNGKey(0), 8000)
    cfg = gmm.GmmConfig(n_components=K, cov_type="circulant", max_iter=30)
    return gmm.fit(jax.random.PRNGKey(5), h, cfg), h


def _observe(h, snr_db, n_bits, q, x0=1.0 + 0.0j, key=7):
    rng = np.random.default_rng(key)
    sigma = np.sqrt(10 ** (-snr_db / 10) / 2)
    y = np.asarray(h) * x0 + sigma * (
        rng.standard_normal(h.shape) + 1j * rng.standard_normal(h.shape)
    ).astype(np.complex64)
    return Q.quantize(jnp.asarray(y, jnp.complex64), n_bits, q)


# ---------------------------------------------------------------------------
# dense-vs-structured parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_bits,tol", [("inf", 2e-5), (1, 2e-3),
                                        (2, 2e-5), (3, 2e-5)])
@pytest.mark.parametrize("mode", ["all", 1, 2, 0.9])
def test_estimate_matches_dense_on_circulant_fit(circ_fit, n_bits, mode, tol):
    """1-bit carries a looser tolerance: the arcsine map's derivative
    diverges at +-1, so it amplifies the f32 circulant residue of the
    densified covariances (measured ~1e-4 relative; every other width is
    at FFT rounding ~1e-6). Hard selection modes are discontinuous in the
    logits — a ~1e-4 logit perturbation can flip a few rows' winning
    component to an O(1) row difference — so for 1-bit they assert on the
    fraction of agreeing rows instead of the norm."""
    fit, h = circ_fit
    x0 = 1.0 + 0.5j
    a = jnp.asarray(x0, jnp.complex64) * jnp.eye(D, dtype=jnp.complex64)
    q = Q.design_quantizer(10.0, n_bits, "uniform")
    r = _observe(h[:512], 10.0, n_bits, q, x0)
    bank_d = gmm_estimator.prepare_bank(fit.params, 10.0, a, n_bits, q)
    bank_s = sb.prepare_bank_circulant(fit.params, 10.0, a, n_bits, q)
    hd = gmm_estimator.estimate(bank_d, r, mode)
    hs = sb.estimate_circulant(bank_s, r, mode)
    if n_bits == 1 and mode != "all":
        row = np.linalg.norm(np.asarray(hs - hd), axis=-1) / np.maximum(
            np.linalg.norm(np.asarray(hd), axis=-1), 1e-12)
        assert float(np.mean(row < tol)) > 0.99, float(np.mean(row < tol))
    else:
        assert _rel(hs, hd) < tol


@pytest.mark.parametrize("alpha", [1.0, 0.25, 0.0])
def test_coherent_matches_dense(circ_fit, alpha):
    fit, h = circ_fit
    t = 4
    q = Q.design_quantizer(5.0, 2, "uniform")
    r = _observe(h[:800], 5.0, 2, q).reshape(200, t, D)
    a = jnp.eye(D, dtype=jnp.complex64)
    bank_d = gmm_estimator.prepare_bank(fit.params, 5.0, a, 2, q)
    bank_s = sb.prepare_bank_circulant(fit.params, 5.0, 1.0 + 0.0j, 2, q)
    hd = gmm_estimator.estimate_coherent(bank_d, r, "all", 512, alpha)
    hs = sb.estimate_circulant_coherent(bank_s, r, "all", 4096, alpha)
    assert _rel(hs, hd) < 2e-5


def test_alpha_zero_is_independent_estimator(circ_fit):
    fit, h = circ_fit
    q = Q.design_quantizer(5.0, 2, "uniform")
    r = _observe(h[:256], 5.0, 2, q)
    bank_s = sb.prepare_bank_circulant(fit.params, 5.0, 1.0 + 0.0j, 2, q)
    flat = sb.estimate_circulant(bank_s, r)
    blocks = sb.estimate_circulant_coherent(bank_s, r.reshape(64, 4, D),
                                            alpha=0.0)
    np.testing.assert_allclose(np.asarray(blocks.reshape(256, D)),
                               np.asarray(flat), atol=1e-5)


def test_nonzero_mean_fit(circ_fit):
    h = _circulant_data(jax.random.PRNGKey(11), 8000, mean=0.3 - 0.2j)
    cfg = gmm.GmmConfig(n_components=K, cov_type="circulant", max_iter=30,
                        zero_mean=False)
    fit = gmm.fit(jax.random.PRNGKey(6), h, cfg)
    q = Q.design_quantizer(10.0, 2, "uniform")
    r = _observe(h[:512], 10.0, 2, q)
    a = jnp.eye(D, dtype=jnp.complex64)
    bank_d = gmm_estimator.prepare_bank(fit.params, 10.0, a, 2, q)
    bank_s = sb.prepare_bank_circulant(fit.params, 10.0, 1.0 + 0.0j, 2, q)
    hd = gmm_estimator.estimate(bank_d, r)
    hs = sb.estimate_circulant(bank_s, r)
    assert _rel(hs, hd) < 2e-5


def test_block_circulant_end_to_end():
    d, blocks, k = 24, (4, 6), 4
    fb = jnp.kron(linalg.unitary_dft(4), linalg.unitary_dft(6))
    sk = jax.random.uniform(jax.random.PRNGKey(0), (k, d), minval=0.1,
                            maxval=2.0, dtype=jnp.float32)
    comp = jax.random.randint(jax.random.PRNGKey(1), (6000,), 0, k)
    w = (jax.random.normal(jax.random.PRNGKey(2), (6000, d)) +
         1j * jax.random.normal(jax.random.PRNGKey(3), (6000, d))
         ) / np.sqrt(2)
    h = ((jnp.sqrt(sk)[comp] * (w @ fb.T)) @ jnp.conj(fb)).astype(
        jnp.complex64)
    cfg = gmm.GmmConfig(n_components=k, cov_type="block-circulant",
                        blocks=blocks, max_iter=30)
    fit = gmm.fit(jax.random.PRNGKey(4), h, cfg)
    q = Q.design_quantizer(10.0, 2, "uniform")
    r = _observe(h[:256], 10.0, 2, q)
    a = jnp.eye(d, dtype=jnp.complex64)
    bank_d = gmm_estimator.prepare_bank(fit.params, 10.0, a, 2, q)
    bank_s = sb.prepare_bank_circulant(fit.params, 10.0, 1.0 + 0.0j, 2, q,
                                       blocks=blocks)
    hd = gmm_estimator.estimate(bank_d, r)
    hs = sb.estimate_circulant(bank_s, r, blocks=blocks)
    assert _rel(hs, hd) < 2e-5


def test_toeplitz_fit_through_circulant_approximation():
    """SCM channels + a Toeplitz fit: the structured path rides the
    Frobenius-best circulant approximation. It is NOT exact — assert the
    estimation quality (NMSE vs truth) is within a few percent of the
    dense Toeplitz estimator rather than elementwise closeness."""
    d, k = 32, 8
    h, _ = scm.generate_channels(jax.random.PRNGKey(0), 9000,
                                 scm.ScmConfig(n_antennas=d))
    h = h.astype(jnp.complex64)
    cfg = gmm.GmmConfig(n_components=k, cov_type="toeplitz", max_iter=25)
    fit = gmm.fit(jax.random.PRNGKey(1), h[:8000], cfg)
    q = Q.design_quantizer(10.0, 2, "uniform")
    htest = h[8000:]
    r = _observe(htest, 10.0, 2, q)
    a = jnp.eye(d, dtype=jnp.complex64)
    bank_d = gmm_estimator.prepare_bank(fit.params, 10.0, a, 2, q)
    bank_s = sb.prepare_bank_circulant(fit.params, 10.0, 1.0 + 0.0j, 2, q)
    hd = gmm_estimator.estimate(bank_d, r)
    hs = sb.estimate_circulant(bank_s, r)
    mse_d = float(jnp.mean(jnp.abs(hd - htest) ** 2))
    mse_s = float(jnp.mean(jnp.abs(hs - htest) ** 2))
    # circulant approximation may cost a little accuracy; bound the loss
    assert mse_s < 1.10 * mse_d, (mse_s, mse_d)


def test_rejects_non_identity_pilot(circ_fit):
    fit, _ = circ_fit
    a_bad = jnp.ones((D, D), jnp.complex64)
    with pytest.raises(ValueError):
        sb.prepare_bank_circulant(fit.params, 10.0, a_bad, 2,
                                  Q.design_quantizer(10.0, 2, "uniform"))
    with pytest.raises(ValueError):
        sb.prepare_bank_circulant(fit.params, 10.0,
                                  jnp.ones((D // 2, D), jnp.complex64), "inf")


@pytest.mark.parametrize("blocks", [None, (4, 8)])
def test_dft_method_matches_fft(circ_fit, blocks):
    """The TPU-default DFT-as-GEMM transform path must agree with the FFT
    path (same math, different lowering — see `cplx.cmatmul` for why the
    GEMM embedding exists)."""
    fit, h = circ_fit
    q = Q.design_quantizer(5.0, 2, "uniform")
    r = _observe(h[:256], 5.0, 2, q)
    bank = sb.prepare_bank_circulant(fit.params, 5.0, 1.0 + 0.0j, 2, q,
                                     blocks=blocks)
    a = sb.estimate_circulant(bank, r, blocks=blocks, method="fft")
    b = sb.estimate_circulant(bank, r, blocks=blocks, method="dft")
    assert _rel(b, a) < 1e-4
    rb = r.reshape(64, 4, D)
    ac = sb.estimate_circulant_coherent(bank, rb, blocks=blocks,
                                        alpha=0.3, method="fft")
    bc = sb.estimate_circulant_coherent(bank, rb, blocks=blocks,
                                        alpha=0.3, method="dft")
    assert _rel(bc, ac) < 1e-4


def test_cplx_matmul_embeddings():
    from quantized_channel_estimation_tpu.ops import cplx
    key = jax.random.PRNGKey(3)
    a = (jax.random.normal(key, (7, 5)) +
         1j * jax.random.normal(jax.random.PRNGKey(4), (7, 5))
         ).astype(jnp.complex64)
    b = (jax.random.normal(jax.random.PRNGKey(5), (5, 6)) +
         1j * jax.random.normal(jax.random.PRNGKey(6), (5, 6))
         ).astype(jnp.complex64)
    np.testing.assert_allclose(np.asarray(cplx.cmatmul(a, b)),
                               np.asarray(a @ b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cplx.cmatmul_realout(a, b)),
                               np.asarray(jnp.real(a @ b)), atol=1e-5)
    w = jax.random.normal(jax.random.PRNGKey(7), (4, 7, 5),
                          dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(cplx.rcmatmul(w, b)),
                               np.asarray(w.astype(jnp.complex64) @ b),
                               atol=1e-5)


def test_bank_memory_is_linear_in_d(circ_fit):
    fit, _ = circ_fit
    bank = sb.prepare_bank_circulant(fit.params, 10.0, 1.0 + 0.0j, "inf")
    n_elems = sum(np.prod(x.shape) for x in bank)
    assert n_elems == K + 4 * K * D  # logw + four (K, D) spectra/vectors


# ---------------------------------------------------------------------------
# stats form + tensor-parallel merge
# ---------------------------------------------------------------------------

def test_stats_shard_merge_matches_estimate(circ_fit):
    """Splitting the circulant bank into two component shards and merging
    the DFT-domain online-softmax states must reproduce estimate_circulant
    exactly (the structured analog of the dense flash-style merge)."""
    fit, h = circ_fit
    q = Q.design_quantizer(5.0, 2, "uniform")
    r = _observe(h[:256], 5.0, 2, q)
    bank = sb.prepare_bank_circulant(fit.params, 5.0, 1.0 + 0.0j, 2, q)
    want = sb.estimate_circulant(bank, r)
    half = K // 2
    states = []
    for lo, hi in ((0, half), (half, K)):
        shard = sb.CirculantBank(*[x[lo:hi] for x in bank])
        states.append(sb.estimate_circulant_stats(shard, r))
    m1, d1, a1 = states[0]
    m2, d2, a2 = states[1]
    m = np.maximum(m1, m2)
    w1, w2 = np.exp(m1 - m), np.exp(m2 - m)
    den = d1 * w1 + d2 * w2
    acc = a1 * w1[:, None] + a2 * w2[:, None]
    got = sb.unitary_ifft(jnp.asarray(acc / den[:, None]))
    assert _rel(got, want) < 1e-5


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (8, 1)])
def test_estimate_sharded_circulant(circ_fit, mesh_shape):
    from quantized_channel_estimation_tpu.parallel import mesh as pmesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    fit, h = circ_fit
    q = Q.design_quantizer(5.0, 2, "uniform")
    r = _observe(h[:256], 5.0, 2, q)
    bank = sb.prepare_bank_circulant(fit.params, 5.0, 1.0 + 0.0j, 2, q)
    m = pmesh.make_mesh(*mesh_shape)
    got = pmesh.estimate_sharded_circulant(m, bank, r, chunk_size=64)
    want = sb.estimate_circulant(bank, r)
    assert _rel(got, want) < 1e-5


@pytest.mark.parametrize("alpha", [1.0, 0.25])
def test_estimate_sharded_circulant_coherent(circ_fit, alpha):
    from quantized_channel_estimation_tpu.parallel import mesh as pmesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    fit, h = circ_fit
    q = Q.design_quantizer(5.0, 2, "uniform")
    rb = _observe(h[:512], 5.0, 2, q).reshape(128, 4, D)
    bank = sb.prepare_bank_circulant(fit.params, 5.0, 1.0 + 0.0j, 2, q)
    m = pmesh.make_mesh(2, 4)
    got = pmesh.estimate_sharded_circulant(m, bank, rb, chunk_size=64,
                                           coherence_alpha=alpha)
    want = sb.estimate_circulant_coherent(bank, rb, alpha=alpha)
    assert _rel(got, want) < 1e-5


def test_fused_circulant_kernel_matches_xla(circ_fit):
    """The single-pass fused structured kernel (interpret mode on CPU)
    must match the XLA pipeline; on hardware it runs at +16% with
    quality-neutral accumulation noise (results/parity_r4)."""
    from quantized_channel_estimation_tpu.estimators import (
        pallas_kernels as pk)
    fit, h = circ_fit
    q = Q.design_quantizer(5.0, 2, "uniform")
    r = _observe(h[:300], 5.0, 2, q)     # non-multiple of tile_n: pads
    bank = sb.prepare_bank_circulant(fit.params, 5.0, 1.0 + 0.0j, 2, q)
    want = sb.estimate_circulant(bank, r, "all", 16384, None, "fft")
    got = pk.estimate_fused_circulant(bank, r, interpret=True)
    assert _rel(got, want) < 2e-4
    got_m = sb.estimate_circulant(bank, r, "all", 16384, None, "kernel")
    assert _rel(got_m, want) < 2e-4
    with pytest.raises(ValueError, match="kernel"):
        sb.estimate_circulant(bank, r, 1, 16384, None, "kernel")


@pytest.mark.parametrize("t,alpha", [(4, 1.0), (4, 0.25), (8, 1.0)])
def test_fused_circulant_coherent_kernel(circ_fit, t, alpha):
    from quantized_channel_estimation_tpu.estimators import (
        pallas_kernels as pk)
    fit, h = circ_fit
    q = Q.design_quantizer(5.0, 2, "uniform")
    r = _observe(h[:800], 5.0, 2, q).reshape(-1, t, D)[:100]
    bank = sb.prepare_bank_circulant(fit.params, 5.0, 1.0 + 0.0j, 2, q)
    want = sb.estimate_circulant_coherent(bank, r, "all", 4096, alpha,
                                          None, "fft")
    got = pk.estimate_fused_circulant_coherent(bank, r, alpha=alpha,
                                               interpret=True)
    assert _rel(got, want) < 2e-4
    got_m = sb.estimate_circulant_coherent(bank, r, "all", 4096, alpha,
                                           None, "kernel")
    assert _rel(got_m, want) < 2e-4


def test_estimate_sharded_circulant_kernel_stats(circ_fit):
    """The TP route with the fused structured STATS kernel per shard
    (interpret mode on the virtual mesh) must match the XLA stats route
    and the plain estimator."""
    from quantized_channel_estimation_tpu.parallel import mesh as pmesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    fit, h = circ_fit
    q = Q.design_quantizer(5.0, 2, "uniform")
    r = _observe(h[:256], 5.0, 2, q)
    bank = sb.prepare_bank_circulant(fit.params, 5.0, 1.0 + 0.0j, 2, q)
    m = pmesh.make_mesh(2, 4)
    got = pmesh.estimate_sharded_circulant(m, bank, r, use_kernel=True)
    want = sb.estimate_circulant(bank, r, "all", 16384, None, "fft")
    assert _rel(got, want) < 2e-4


def test_fused_kernel_block_circulant():
    """The fused structured kernels carry the kron basis too (MIMO
    block-circulant banks): the transform is a GEMM either way."""
    from quantized_channel_estimation_tpu.estimators import (
        pallas_kernels as pk)
    d, blocks, k = 32, (4, 8), 4
    fb = jnp.kron(linalg.unitary_dft(4), linalg.unitary_dft(8))
    sk = jax.random.uniform(jax.random.PRNGKey(0), (k, d), minval=0.1,
                            maxval=2.0, dtype=jnp.float32)
    comp = jax.random.randint(jax.random.PRNGKey(1), (6000,), 0, k)
    w = (jax.random.normal(jax.random.PRNGKey(2), (6000, d)) +
         1j * jax.random.normal(jax.random.PRNGKey(3), (6000, d))
         ) / np.sqrt(2)
    h = ((jnp.sqrt(sk)[comp] * (w @ fb.T)) @ jnp.conj(fb)).astype(
        jnp.complex64)
    fit = gmm.fit(jax.random.PRNGKey(4), h,
                  gmm.GmmConfig(n_components=k, cov_type="block-circulant",
                                blocks=blocks, max_iter=20))
    q = Q.design_quantizer(10.0, 2, "uniform")
    r = _observe(h[:256], 10.0, 2, q)
    bank = sb.prepare_bank_circulant(fit.params, 10.0, 1.0 + 0.0j, 2, q,
                                     blocks=blocks)
    want = sb.estimate_circulant(bank, r, "all", 16384, blocks, "fft")
    got = pk.estimate_fused_circulant(bank, r, interpret=True, blocks=blocks)
    assert _rel(got, want) < 2e-4
    rb = r.reshape(64, 4, d)
    wantc = sb.estimate_circulant_coherent(bank, rb, "all", 4096, 0.25,
                                           blocks, "fft")
    gotc = pk.estimate_fused_circulant_coherent(bank, rb, alpha=0.25,
                                                interpret=True,
                                                blocks=blocks)
    assert _rel(gotc, wantc) < 2e-4


@pytest.mark.parametrize("alpha", [1.0, 0.25])
def test_estimate_sharded_circulant_coherent_kernel_stats(circ_fit, alpha):
    """TP coherent route with the fused coherent stats kernel per shard
    (interpret mode, virtual mesh) must match the plain coherent
    estimator."""
    from quantized_channel_estimation_tpu.parallel import mesh as pmesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    fit, h = circ_fit
    q = Q.design_quantizer(5.0, 2, "uniform")
    rb = _observe(h[:512], 5.0, 2, q).reshape(128, 4, D)
    bank = sb.prepare_bank_circulant(fit.params, 5.0, 1.0 + 0.0j, 2, q)
    m = pmesh.make_mesh(2, 4)
    got = pmesh.estimate_sharded_circulant(m, bank, rb, chunk_size=64,
                                           coherence_alpha=alpha,
                                           use_kernel=True)
    want = sb.estimate_circulant_coherent(bank, rb, "all", 4096, alpha,
                                          None, "fft")
    assert _rel(got, want) < 2e-4


def test_circ_kernel_tile_budget():
    """The auto tile keeps bank constants + per-tile intermediates inside
    the scoped-VMEM budget at every eligible (D, K) (a fixed 1024-row tile
    measured 26.3 MB at D=512 — results/parity_r4)."""
    from quantized_channel_estimation_tpu.estimators.pallas_kernels import (
        _circ_bank_bytes, _circ_tile_n)
    for d, k in [(32, 8), (64, 64), (128, 64), (256, 32), (512, 16)]:
        if _circ_bank_bytes(d, k) > 13 * 1024 * 1024:
            continue
        t = _circ_tile_n(d, k)
        assert t >= 64 and (t & (t - 1)) == 0, (d, k, t)
        total = _circ_bank_bytes(d, k) + t * 4 * (10 * d + 2 * k)
        assert total <= 13 * 1024 * 1024, (d, k, t, total)


# ---------------------------------------------------------------------------
# multi-pilot (P > 1) banks: per-bin P x P LMMSE vs the dense path (round-5)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_bits,tol", [("inf", 3e-5), (1, 2e-3), (2, 3e-5)])
@pytest.mark.parametrize("p", [2, 4])
def test_multipilot_matches_dense(circ_fit, p, n_bits, tol):
    """kron(x, I) pilots with P in {2, 4}: the per-bin P x P structured
    bank must reproduce the dense prepare/estimate for every bit-width
    (the 1-bit tolerance carries the arcsine-amplified f32 circulant
    residue like the P=1 case)."""
    from quantized_channel_estimation_tpu.ops import observation, pilots
    fit, h = circ_fit
    a = pilots.pilot_matrix(D, p, n_bits, "angle_amp")
    q = Q.design_quantizer(10.0, n_bits, "uniform")
    r = observation.observe(jax.random.PRNGKey(9), h[:512], 10.0, a,
                            n_bits, q)
    bank_d = gmm_estimator.prepare_bank(fit.params, 10.0, a, n_bits, q)
    bank_s = sb.prepare_bank_circulant(fit.params, 10.0, a, n_bits, q)
    assert isinstance(bank_s, sb.CirculantBankMP)
    for mode in ("all", 1, 2):
        hd = gmm_estimator.estimate(bank_d, r, mode)
        hs = sb.estimate_circulant(bank_s, r, mode)
        if n_bits == 1 and mode != "all":
            row = np.linalg.norm(np.asarray(hs - hd), axis=-1) / np.maximum(
                np.linalg.norm(np.asarray(hd), axis=-1), 1e-12)
            assert float(np.mean(row < tol)) > 0.99, (mode, np.mean(row))
        else:
            assert _rel(hs, hd) < tol, (mode, _rel(hs, hd))


@pytest.mark.parametrize("alpha", [1.0, 0.25])
def test_multipilot_coherent_matches_dense(circ_fit, alpha):
    from quantized_channel_estimation_tpu.ops import observation, pilots
    fit, h = circ_fit
    p, n_bits = 2, 2
    a = pilots.pilot_matrix(D, p, n_bits, "angle_amp")
    q = Q.design_quantizer(5.0, n_bits, "uniform")
    r = observation.observe(jax.random.PRNGKey(11), h[:256], 5.0, a,
                            n_bits, q)
    rb = r.reshape(64, 4, -1)
    bank_d = gmm_estimator.prepare_bank(fit.params, 5.0, a, n_bits, q)
    bank_s = sb.prepare_bank_circulant(fit.params, 5.0, a, n_bits, q)
    hd = gmm_estimator.estimate_coherent(bank_d, rb, "all", 16, alpha)
    hs = sb.estimate_circulant_coherent(bank_s, rb, "all", 16, alpha)
    assert _rel(hs, hd) < 3e-5, _rel(hs, hd)


def test_multipilot_bank_memory():
    """The MP bank is O(K D P^2) — a fraction of the dense
    O(K (PD)^2 + K D PD) at the standard dims."""
    from quantized_channel_estimation_tpu.ops import pilots
    p, d, k = 4, D, K
    h = _circulant_data(jax.random.PRNGKey(3), 4000)
    fit = gmm.fit(jax.random.PRNGKey(4), h,
                  gmm.GmmConfig(n_components=k, cov_type="circulant",
                                max_iter=10))
    a = pilots.pilot_matrix(d, p, 2, "angle_amp")
    q = Q.design_quantizer(10.0, 2, "uniform")
    bank = sb.prepare_bank_circulant(fit.params, 10.0, a, 2, q)
    mp_bytes = sum(v.size * v.dtype.itemsize
                   for v in jax.tree_util.tree_leaves(bank))
    dense_bytes = k * ((p * d) ** 2 + 2 * d * p * d) * 8
    assert mp_bytes < dense_bytes / 10, (mp_bytes, dense_bytes)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (1, 8)])
def test_estimate_sharded_multipilot(circ_fit, mesh_shape):
    """TP-sharded multi-pilot estimation: K-sharded CirculantBankMP with
    the pmax/psum stats merge must equal the unsharded MP estimate on
    every mesh factorization (round-5 late)."""
    from quantized_channel_estimation_tpu.ops import observation, pilots
    from quantized_channel_estimation_tpu.parallel import mesh as pmesh
    fit, h = circ_fit
    p, n_bits = 2, 2
    a = pilots.pilot_matrix(D, p, n_bits, "angle_amp")
    q = Q.design_quantizer(5.0, n_bits, "uniform")
    r = observation.observe(jax.random.PRNGKey(21), h[:256], 5.0, a,
                            n_bits, q)
    bank = sb.prepare_bank_circulant(fit.params, 5.0, a, n_bits, q)
    want = np.asarray(sb.estimate_circulant(bank, r, "all"))
    m = pmesh.make_mesh(*mesh_shape)
    got = np.asarray(pmesh.estimate_sharded_circulant(m, bank, r,
                                                      chunk_size=256))
    np.testing.assert_allclose(got, want, atol=1e-5, err_msg=str(mesh_shape))
    # coherent blocks with the alpha blend
    rb = r.reshape(64, 4, -1)
    want_b = np.asarray(sb.estimate_circulant_coherent(bank, rb, "all",
                                                       16, 0.5))
    got_b = np.asarray(pmesh.estimate_sharded_circulant(
        m, bank, rb, chunk_size=256, coherence_alpha=0.5))
    np.testing.assert_allclose(got_b, want_b, atol=1e-5)
