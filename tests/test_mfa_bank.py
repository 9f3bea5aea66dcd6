"""Factored (low-rank + diagonal) MFA prepared banks vs the dense estimator.

The factored path must reproduce `gmm_estimator.estimate` on densified MFA
parameters to f32 rounding — the Woodbury form is exact algebra, not an
approximation — across bit-widths, selection modes, coherence blocks, the
alpha blend, the stats/TP-merge forms, and the serving constructor.
Reference contrast: the upstream Mofa predicts through dense covariances
(`mofa_cplx_bussgang.py:117-216`); 1-bit stays dense here too (arcsine
destroys low rank) and must be rejected loudly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_channel_estimation_tpu.models import (
    gmm_estimator, mfa, mfa_bank as mb)
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.ops.cplx import crandn

D, M, K = 32, 6, 8
X0 = 0.7 - 0.2j


def _rel(a, b):
    return float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))


@pytest.fixture(scope="module")
def mfa_params():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lam = 0.5 * crandn(k1, (K, D, M))
    psis = 0.1 + jax.random.uniform(k2, (K, D))
    means = 0.3 * crandn(k3, (K, D))
    w = jax.random.uniform(k4, (K,)) + 0.1
    return mfa.MfaParams(w / jnp.sum(w), means, lam, psis)


@pytest.fixture(scope="module")
def obs(mfa_params):
    """Observations drawn from the mixture itself (component-conditional
    h = mu + Lambda z + sqrt(psi) eps), quantized at 2 bits / 10 dB."""
    key = jax.random.PRNGKey(1)
    n = 512
    comp = jax.random.randint(jax.random.fold_in(key, 0), (n,), 0, K)
    z = crandn(jax.random.fold_in(key, 1), (n, M))
    eps = crandn(jax.random.fold_in(key, 2), (n, D))
    h = (mfa_params.means[comp]
         + jnp.einsum("ndm,nm->nd", mfa_params.lambdas[comp], z)
         + jnp.sqrt(mfa_params.psis[comp]).astype(z.dtype) * eps)
    sigma = float(np.sqrt(10 ** (-10.0 / 10) / 2))
    y = X0 * h + sigma * crandn(jax.random.fold_in(key, 3), (n, D))
    q = Q.design_quantizer(10.0, 2)
    return Q.quantize(y, 2, q), q


def _dense_bank(mfa_params, snr, n_bits, q):
    a_mat = jnp.asarray(X0, jnp.complex64) * jnp.eye(D, dtype=jnp.complex64)
    return gmm_estimator.prepare_bank(mfa.to_gmm_params(mfa_params), snr,
                                      a_mat, n_bits, q)


@pytest.mark.parametrize("n_bits", [2, 3, "inf"])
@pytest.mark.parametrize("mode", ["all", 1, 2, 0.9])
def test_estimate_matches_dense(mfa_params, obs, n_bits, mode):
    r, _ = obs
    q = None if n_bits == "inf" else Q.design_quantizer(10.0, n_bits)
    fb = mb.prepare_bank_factored(mfa_params, 10.0, X0, n_bits, q)
    db = _dense_bank(mfa_params, 10.0, n_bits, q)
    hf = mb.estimate_factored(fb, r, mode)
    hd = gmm_estimator.estimate(db, r, mode)
    assert _rel(hf, hd) < 2e-4


@pytest.mark.parametrize("alpha", [1.0, 0.25, 0.0])
def test_coherent_matches_dense(mfa_params, obs, alpha):
    r, q = obs
    t = 4
    rb = r.reshape(-1, t, D)
    fb = mb.prepare_bank_factored(mfa_params, 10.0, X0, 2, q)
    db = _dense_bank(mfa_params, 10.0, 2, q)
    hf = mb.estimate_factored_coherent(fb, rb, "all", 64, alpha)
    hd = gmm_estimator.estimate_coherent(db, rb, "all", 64, alpha)
    assert _rel(hf, hd) < 2e-4


def test_alpha_zero_is_independent(mfa_params, obs):
    r, q = obs
    fb = mb.prepare_bank_factored(mfa_params, 10.0, X0, 2, q)
    rb = r.reshape(-1, 4, D)
    flat = mb.estimate_factored(fb, r, "all")
    coh0 = mb.estimate_factored_coherent(fb, rb, "all", 64, 0.0)
    np.testing.assert_allclose(np.asarray(coh0.reshape(-1, D)),
                               np.asarray(flat), atol=1e-5)


def test_one_bit_rejected(mfa_params):
    with pytest.raises(ValueError, match="1-bit"):
        mb.prepare_bank_factored(mfa_params, 10.0, X0, 1)


@pytest.mark.parametrize("snr,tol", [(-10.0, 1e-3), (0.0, 5e-3),
                                     (10.0, 5e-2)])
def test_one_bit_linear_arcsine(mfa_params, snr, tol):
    """Round-5: 1-bit factored banks via the linear-arcsine expansion
    (arcsin(x) = x + O(x^3) keeps low-rank + diagonal EXACTLY). The
    per-entry O(rho^3) Cr error grows with SNR; measured at full scale
    (D=64 MFA fit) the cross-NMSE vs the exact dense bank is 2.5e-9 at
    -10 dB to 4.2e-3 at +10 dB with NMSE-vs-truth equal or marginally
    BETTER at every SNR (PARITY_NOTES.md round-5). Here: synthetic-bank
    agreement with the exact densified path within the SNR-dependent
    tolerance."""
    from quantized_channel_estimation_tpu.models.gmm import GmmParams
    from quantized_channel_estimation_tpu.models import gmm_estimator
    from quantized_channel_estimation_tpu.ops import linalg, observation

    key = jax.random.PRNGKey(7)
    n = 256
    comp = jax.random.randint(jax.random.fold_in(key, 0), (n,), 0, K)
    z = crandn(jax.random.fold_in(key, 1), (n, M))
    eps = crandn(jax.random.fold_in(key, 2), (n, D))
    h = (mfa_params.means[comp]
         + jnp.einsum("ndm,nm->nd", mfa_params.lambdas[comp], z)
         + jnp.sqrt(mfa_params.psis[comp]).astype(z.dtype) * eps)
    a_mat = jnp.asarray(X0, jnp.complex64) * jnp.eye(D, dtype=jnp.complex64)
    r = observation.observe(jax.random.fold_in(key, 3), h, snr,
                            a_mat, 1, None)
    bank_f = mb.prepare_bank_factored(mfa_params, snr, X0, 1,
                                      one_bit="linear-arcsine")
    hf = mb.estimate_factored(bank_f, r, "all")
    covs = mfa.covariances(mfa_params)
    dense = GmmParams(mfa_params.weights, mfa_params.means, covs,
                      linalg.robust_precision_cholesky(covs))
    bank_d = gmm_estimator.prepare_bank(dense, snr, a_mat, 1)
    hd = gmm_estimator.estimate(bank_d, r, "all")
    rel = float(jnp.linalg.norm(hf - hd) / jnp.linalg.norm(hd))
    assert rel < tol, rel


def test_non_identity_pilot_rejected(mfa_params):
    a_bad = jnp.ones((D, D), jnp.complex64)
    with pytest.raises(ValueError, match="x0"):
        mb.prepare_bank_factored(mfa_params, 10.0, a_bad, 2,
                                 Q.design_quantizer(10.0, 2))


def test_scaled_identity_matrix_pilot_accepted(mfa_params, obs):
    """An explicit x0*I matrix pilot and the bare scalar build the same
    bank."""
    r, q = obs
    a_mat = jnp.asarray(X0, jnp.complex64) * jnp.eye(D, dtype=jnp.complex64)
    b1 = mb.prepare_bank_factored(mfa_params, 10.0, X0, 2, q)
    b2 = mb.prepare_bank_factored(mfa_params, 10.0, a_mat, 2, q)
    np.testing.assert_allclose(np.asarray(b1.bias), np.asarray(b2.bias),
                               atol=1e-6)


def test_bank_memory_is_linear_in_dm(mfa_params):
    """No bank field may be quadratic in D: the largest is O(K D M)."""
    fb = mb.prepare_bank_factored(mfa_params, 10.0, X0, 2,
                                  Q.design_quantizer(10.0, 2))
    for name, arr in fb._asdict().items():
        assert arr.size <= K * D * M, (name, arr.shape)


def test_dead_component_floor(mfa_params, obs):
    """A ~zero-weight component is masked exactly like the dense bank."""
    r, q = obs
    w = np.asarray(mfa_params.weights).copy()
    w[0] = 1e-9
    w = w / w.sum()
    p2 = mfa_params._replace(weights=jnp.asarray(w))
    fb = mb.prepare_bank_factored(p2, 10.0, X0, 2, q)
    assert np.isneginf(np.asarray(fb.log_weights)[0])
    db = _dense_bank(p2, 10.0, 2, q)
    hf = mb.estimate_factored(fb, r, "all")
    hd = gmm_estimator.estimate(db, r, "all")
    assert _rel(hf, hd) < 2e-4


# ---------------------------------------------------------------------------
# fused Pallas kernel (interpret mode on CPU)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_bits", [2, "inf"])
def test_fused_factored_kernel_matches_xla(mfa_params, obs, n_bits):
    from quantized_channel_estimation_tpu.estimators import (
        pallas_kernels as pk)
    r, _ = obs
    q = None if n_bits == "inf" else Q.design_quantizer(10.0, n_bits)
    fb = mb.prepare_bank_factored(mfa_params, 10.0, X0, n_bits, q)
    want = mb.estimate_factored(fb, r, "all", 4096, "xla")
    got = pk.estimate_fused_factored(fb, r, tile_n=64, interpret=True)
    assert _rel(got, want) < 1e-5


def test_fused_factored_nonzero_means(obs, mfa_params):
    """The kernel's bias/mean terms are exercised with non-zero means."""
    from quantized_channel_estimation_tpu.estimators import (
        pallas_kernels as pk)
    r, q = obs
    p2 = mfa_params._replace(means=mfa_params.means + (0.2 - 0.1j))
    fb = mb.prepare_bank_factored(p2, 10.0, X0, 2, q)
    want = mb.estimate_factored(fb, r, "all", 4096, "xla")
    got = pk.estimate_fused_factored(fb, r, tile_n=64, interpret=True)
    assert _rel(got, want) < 1e-5


@pytest.mark.parametrize("t,alpha", [(4, 1.0), (4, 0.25), (4, 0.0),
                                     (8, 1.0), (2, 0.5)])
def test_fused_factored_coherent_kernel(mfa_params, obs, t, alpha):
    from quantized_channel_estimation_tpu.estimators import (
        pallas_kernels as pk)
    r, q = obs
    n = (r.shape[0] // t) * t
    rb = r[:n].reshape(-1, t, D)
    fb = mb.prepare_bank_factored(mfa_params, 10.0, X0, 2, q)
    want = mb.estimate_factored_coherent(fb, rb, "all", 64, alpha, "xla")
    got = pk.estimate_fused_factored_coherent(fb, rb, alpha=alpha,
                                              interpret=True)
    assert _rel(got, want) < 1e-5


def test_fact_kernel_tile_budget():
    """Auto tile sizing keeps bank constants + per-tile intermediates
    inside the scoped-VMEM budget at every dispatchable size."""
    from quantized_channel_estimation_tpu.estimators import (
        pallas_kernels as pk)
    for d, k, m in [(64, 64, 16), (128, 64, 16), (256, 32, 16),
                    (512, 16, 16)]:
        assert pk._fact_bank_bytes(d, k, m) <= 13 * 1024 * 1024, (d, k, m)
        t = pk._fact_tile_n(d, k, m)
        # hardware-calibrated: tile 512 compiles at KM=1024/D=64 and is
        # the fastest; 1024 crashes Mosaic — the cap must never exceed it
        assert 64 <= t <= 512 and (t & (t - 1)) == 0
        per_row = 4 * (4 * d + 2 * k * m + k)
        assert (pk._fact_bank_bytes(d, k, m) + t * per_row
                <= 13 * 1024 * 1024), (d, k, m, t)
    # D=512/M=32 exceeds the resident budget -> XLA fallback, kernel raises
    assert pk._fact_bank_bytes(512, 16, 32) > 13 * 1024 * 1024


def test_estimate_factored_kernel_method_raises_when_ineligible(mfa_params):
    with pytest.raises(ValueError, match="VMEM|mode"):
        big = mfa.MfaParams(
            jnp.ones((4,)) / 4, jnp.zeros((4, 1024), jnp.complex64),
            jnp.zeros((4, 1024, 256), jnp.complex64),
            jnp.ones((4, 1024)))
        fb = mb.prepare_bank_factored(big, 10.0, 1.0 + 0.0j, "inf")
        mb.estimate_factored(fb, jnp.zeros((8, 1024), jnp.complex64),
                             "all", 4096, "kernel")


# ---------------------------------------------------------------------------
# stats form + tensor-parallel merge
# ---------------------------------------------------------------------------

def test_stats_shard_merge_matches_estimate(mfa_params, obs):
    """Splitting the factored bank into two component shards and merging
    the online-softmax states must reproduce estimate_factored exactly."""
    r, q = obs
    fb = mb.prepare_bank_factored(mfa_params, 10.0, X0, 2, q)
    want = mb.estimate_factored(fb, r)
    half = K // 2
    states = []
    for lo, hi in ((0, half), (half, K)):
        shard = mb.FactoredBank(*[x[lo:hi] for x in fb])
        states.append(mb.estimate_factored_stats(shard, r))
    m1, d1, a1 = states[0]
    m2, d2, a2 = states[1]
    m = np.maximum(m1, m2)
    w1, w2 = np.exp(m1 - m), np.exp(m2 - m)
    den = d1 * w1 + d2 * w2
    acc = a1 * w1[:, None] + a2 * w2[:, None]
    got = acc / den[:, None]
    assert _rel(jnp.asarray(got), want) < 1e-5


def test_stats_kernel_merges_with_xla_states(mfa_params, obs):
    """One shard through the fused stats kernel (interpret), the other
    through the XLA stats path — the shared logit convention makes the
    pmax/psum merge exact across implementations."""
    from quantized_channel_estimation_tpu.estimators import (
        pallas_kernels as pk)
    r, q = obs
    fb = mb.prepare_bank_factored(mfa_params, 10.0, X0, 2, q)
    want = mb.estimate_factored(fb, r, "all", 4096, "xla")
    half = K // 2
    s1 = mb.FactoredBank(*[x[:half] for x in fb])
    s2 = mb.FactoredBank(*[x[half:] for x in fb])
    m1, d1, a1 = pk.estimate_fused_factored_stats(s1, r, interpret=True)
    m2, d2, a2 = mb.estimate_factored_stats(s2, r)
    m = np.maximum(m1, m2)
    w1, w2 = np.exp(m1 - m), np.exp(m2 - m)
    den = d1 * w1 + d2 * w2
    acc = np.asarray(a1) * np.asarray(w1)[:, None] \
        + np.asarray(a2) * np.asarray(w2)[:, None]
    got = jnp.asarray(acc / np.asarray(den)[:, None])
    assert _rel(got, want) < 1e-5


def test_estimate_sharded_factored_kernel_stats(mfa_params, obs):
    """TP route with use_kernel=True (interpret on CPU) == XLA route."""
    from quantized_channel_estimation_tpu.parallel import mesh as pmesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    r, q = obs
    fb = mb.prepare_bank_factored(mfa_params, 10.0, X0, 2, q)
    m = pmesh.make_mesh(2, 4)
    got = pmesh.estimate_sharded_factored(m, fb, r, chunk_size=64,
                                          use_kernel=True)
    want = mb.estimate_factored(fb, r, "all", 4096, "xla")
    assert _rel(got, want) < 1e-5


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (8, 1)])
def test_estimate_sharded_factored(mfa_params, obs, mesh_shape):
    from quantized_channel_estimation_tpu.parallel import mesh as pmesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    r, q = obs
    fb = mb.prepare_bank_factored(mfa_params, 10.0, X0, 2, q)
    m = pmesh.make_mesh(*mesh_shape)
    got = pmesh.estimate_sharded_factored(m, fb, r, chunk_size=64)
    want = mb.estimate_factored(fb, r)
    assert _rel(got, want) < 1e-5


@pytest.mark.parametrize("alpha", [1.0, 0.25])
def test_estimate_sharded_factored_coherent(mfa_params, obs, alpha):
    from quantized_channel_estimation_tpu.parallel import mesh as pmesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    r, q = obs
    rb = r.reshape(-1, 4, D)
    fb = mb.prepare_bank_factored(mfa_params, 10.0, X0, 2, q)
    m = pmesh.make_mesh(2, 4)
    got = pmesh.estimate_sharded_factored(m, fb, rb, chunk_size=64,
                                          coherence_alpha=alpha)
    want = mb.estimate_factored_coherent(fb, rb, "all", 64, alpha)
    assert _rel(got, want) < 1e-5


# ---------------------------------------------------------------------------
# serving
# ---------------------------------------------------------------------------

def test_serving_from_mfa_factored(mfa_params, obs):
    """from_mfa defaults to the factored bank for n-bit with a scalar
    pilot and serves dense-path results to f32 tolerance."""
    from quantized_channel_estimation_tpu import serving
    r, q = obs
    svc = serving.EstimationService.from_mfa(mfa_params, X0, 2,
                                             max_delay_ms=1.0)
    try:
        assert svc.factored
        got = svc.submit(np.asarray(r[:64]), 10.0)
        db = _dense_bank(mfa_params, 10.0, 2, q)
        want = np.asarray(gmm_estimator.estimate(db, r[:64], "all"))
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        svc.close()


def test_serving_from_mfa_factored_coherent(mfa_params, obs):
    from quantized_channel_estimation_tpu import serving
    r, q = obs
    rb = np.asarray(r[:64]).reshape(16, 4, D)
    svc = serving.EstimationService.from_mfa(mfa_params, X0, 2,
                                             max_delay_ms=1.0,
                                             coherence_alpha=0.25)
    try:
        got = svc.submit(rb, 10.0)
        fb = mb.prepare_bank_factored(mfa_params, 10.0, X0, 2, q)
        want = np.asarray(mb.estimate_factored_coherent(
            fb, jnp.asarray(rb), "all", 1024, 0.25))
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        svc.close()


def test_serving_from_mfa_one_bit_falls_back_dense(mfa_params):
    """1-bit auto-falls back to the densified bank (arcsine breaks the
    factored form)."""
    from quantized_channel_estimation_tpu import serving
    svc = serving.EstimationService.from_mfa(mfa_params, X0, 1,
                                             max_delay_ms=1.0,
                                             use_pallas=False)
    try:
        assert not svc.factored
    finally:
        svc.close()


def test_serving_from_mfa_mesh(mfa_params, obs):
    """Mesh-backed factored serving routes through the TP stats merge."""
    from quantized_channel_estimation_tpu import serving
    from quantized_channel_estimation_tpu.parallel import mesh as pmesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    r, q = obs
    m = pmesh.make_mesh(2, 4)
    svc = serving.EstimationService.from_mfa(mfa_params, X0, 2,
                                             max_delay_ms=1.0, mesh=m)
    try:
        assert svc.factored
        got = svc.submit(np.asarray(r[:64]), 10.0)
        fb = mb.prepare_bank_factored(mfa_params, 10.0, X0, 2, q)
        want = np.asarray(mb.estimate_factored(fb, r[:64], "all"))
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        svc.close()
