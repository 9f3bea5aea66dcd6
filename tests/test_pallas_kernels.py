"""Fused estimation kernel vs the einsum path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_channel_estimation_tpu.estimators import pallas_kernels as pk
from quantized_channel_estimation_tpu.models import gmm, gmm_estimator
from quantized_channel_estimation_tpu.ops import observation, pilots, scm
from quantized_channel_estimation_tpu.ops import quantizer as Q


@pytest.fixture(scope="module")
def bank_and_obs():
    n_ant, n_bits, snr = 16, 2, 5.0
    key = jax.random.PRNGKey(33)
    h, _ = scm.generate_channels(key, 6000, scm.ScmConfig(n_ant, 1))
    fit = gmm.fit(jax.random.PRNGKey(34), h[:5000],
                  gmm.GmmConfig(n_components=8, max_iter=10, chunk_size=2048))
    a = pilots.pilot_matrix(n_ant, 1, n_bits)
    q = Q.design_quantizer(snr, n_bits)
    r = observation.observe(jax.random.PRNGKey(35), h[5000:], snr, a,
                            n_bits, q)
    bank = gmm_estimator.prepare_bank(fit.params, snr, a, n_bits, q)
    return bank, r.astype(jnp.complex64)


def test_reference_packed_matches_einsum_path(bank_and_obs):
    """The kernel math (logit/softmax/combine reformulation) must equal the
    production einsum estimate."""
    bank, r = bank_and_obs
    kb = pk.kernel_bank(bank)
    h_ref_re, h_ref_im = pk.reference_estimate_packed(
        kb, jnp.real(r).astype(jnp.float32), jnp.imag(r).astype(jnp.float32))
    h_ein = gmm_estimator.estimate(bank, r, "all")
    np.testing.assert_allclose(np.asarray(h_ref_re), np.real(np.asarray(h_ein)),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(h_ref_im), np.imag(np.asarray(h_ein)),
                               atol=2e-4)


def test_kernel_matches_reference_interpret(bank_and_obs):
    """Pallas kernel (interpret mode) vs the pure-JAX packed reference."""
    bank, r = bank_and_obs
    kb = pk.kernel_bank(bank)
    n = 256
    rr = jnp.real(r[:n]).astype(jnp.float32)
    ri = jnp.imag(r[:n]).astype(jnp.float32)
    got_re, got_im = pk.estimate_packed(kb, rr, ri, tile_n=128, interpret=True)
    want_re, want_im = pk.reference_estimate_packed(kb, rr, ri)
    np.testing.assert_allclose(np.asarray(got_re), np.asarray(want_re),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_im), np.asarray(want_im),
                               atol=2e-4)


def test_chunked_split_k_matches_einsum(bank_and_obs):
    """Split-K chunked kernel (online-softmax merge across bank chunks)
    must equal the single-pass estimate for any chunking."""
    bank, r = bank_and_obs
    want = np.asarray(gmm_estimator.estimate(bank, r[:300], "all"))
    for k_chunk in (2, 4, 6, 8):  # incl. non-divisor and full-bank chunks
        got = np.asarray(pk.estimate_block_grouped_chunked(
            bank, r[:300], k_chunk, tile_n=256, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-4, err_msg=str(k_chunk))


def test_fused_oversized_bank_takes_chunked_path(bank_and_obs):
    """estimate_fused with a tiny budget routes through the split-K path
    (not the einsum fallback) and stays correct."""
    bank, r = bank_and_obs
    per_k = 4 * (2 * 16) * (4 * 16)
    got = np.asarray(pk.estimate_fused(bank, r[:300], interpret=True,
                                       vmem_budget=5 * per_k))  # k_chunk=4
    want = np.asarray(gmm_estimator.estimate(bank, r[:300], "all"))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_estimate_wrapper_pads_and_matches(bank_and_obs):
    bank, r = bank_and_obs
    r_odd = r[:777]  # not a tile multiple
    h_kern = pk.estimate(bank, r_odd, tile_n=256, interpret=True)
    h_ein = gmm_estimator.estimate(bank, r_odd, "all")
    np.testing.assert_allclose(np.asarray(h_kern), np.asarray(h_ein),
                               atol=3e-4)


def test_block_kernel_matches_einsum(bank_and_obs):
    """Real-block layout (full-width MXU GEMMs) vs the einsum path."""
    bank, r = bank_and_obs
    h_blk = pk.estimate_block(bank, r[:777], tile_n=256, interpret=True)
    h_ein = gmm_estimator.estimate(bank, r[:777], "all")
    np.testing.assert_allclose(np.asarray(h_blk), np.asarray(h_ein),
                               atol=3e-4)


@pytest.mark.parametrize("group", [2, 4])
def test_grouped_block_kernel_matches_einsum(bank_and_obs, group):
    bank, r = bank_and_obs
    h_g = pk.estimate_block_grouped(bank, r[:512], tile_n=128, group=group,
                                    interpret=True)
    h_ein = gmm_estimator.estimate(bank, r[:512], "all")
    np.testing.assert_allclose(np.asarray(h_g), np.asarray(h_ein), atol=3e-4)


def test_estimate_fused_dispatch(bank_and_obs):
    """Canonical wrapper: group divides K, small batches pad to tile."""
    bank, r = bank_and_obs
    h_f = pk.estimate_fused(bank, r[:300], interpret=True)
    h_ein = gmm_estimator.estimate(bank, r[:300], "all")
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_ein), atol=3e-4)


def test_block_kernel_dead_components(bank_and_obs):
    bank, r = bank_and_obs
    dead_logw = bank.log_weights.at[0].set(-jnp.inf)
    bank_dead = bank._replace(log_weights=dead_logw)
    h_kern = pk.estimate_fused(bank_dead, r[:256], interpret=True)
    h_ein = gmm_estimator.estimate(bank_dead, r[:256], "all")
    assert np.all(np.isfinite(np.asarray(h_kern).view(np.float32)))
    np.testing.assert_allclose(np.asarray(h_kern), np.asarray(h_ein),
                               atol=3e-4)


def test_estimate_fused_large_bank_falls_back(bank_and_obs):
    """Banks too big for VMEM must route to the einsum path, same result."""
    bank, r = bank_and_obs
    h_fb = pk.estimate_fused(bank, r[:300], interpret=True,
                             vmem_budget=1)  # force the fallback
    h_ein = gmm_estimator.estimate(bank, r[:300], "all")
    np.testing.assert_allclose(np.asarray(h_fb), np.asarray(h_ein),
                               atol=1e-5)


def test_kernel_handles_dead_components(bank_and_obs):
    """A masked (zero-weight, log-weight -inf) component in the LEADING
    position must not NaN the online softmax."""
    bank, r = bank_and_obs
    dead_logw = bank.log_weights.at[0].set(-jnp.inf)
    bank_dead = bank._replace(log_weights=dead_logw)
    h_kern = pk.estimate(bank_dead, r[:256], tile_n=128, interpret=True)
    h_ein = gmm_estimator.estimate(bank_dead, r[:256], "all")
    assert np.all(np.isfinite(np.asarray(h_kern).view(np.float32)))
    np.testing.assert_allclose(np.asarray(h_kern), np.asarray(h_ein),
                               atol=3e-4)


@pytest.mark.parametrize("mode,tol", [("bf16", 3e-2), ("split3", 1e-4),
                                      ("split2", 3e-2)])
def test_grouped_kernel_precision_modes(bank_and_obs, mode, tol):
    """bf16 hi/lo split-GEMM modes: split3 must be near-f32 (the dropped
    lo*lo term is O(2^-16) relative); bf16/split2 are coarse measurement
    modes bounded loosely."""
    bank, r = bank_and_obs
    ref = pk.estimate_block_grouped(bank, r, tile_n=256, group=2,
                                    interpret=True)
    out = pk.estimate_block_grouped(bank, r, tile_n=256, group=2,
                                    interpret=True, mode=mode)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < tol, (mode, rel)


def test_estimate_stats_merge_equals_full(bank_and_obs):
    """Merging einsum-path stats from disjoint component shards
    (`merge_stats`) must reproduce the full-bank 'all' estimate — the
    correctness core of both the split-K chunked kernel and the
    tensor-parallel `estimate_sharded_kernel`."""
    bank, r = bank_and_obs
    want = np.asarray(gmm_estimator.estimate(bank, r, "all"))
    k = bank.filters.shape[0]
    shards = [gmm_estimator.PreparedBank(*[x[k0:k0 + k // 4] for x in bank])
              for k0 in range(0, k, k // 4)]
    stats = [gmm_estimator.estimate_stats(b, r, 512) for b in shards]
    _, den, acc = pk.merge_stats([s[0] for s in stats],
                                 [s[1] for s in stats],
                                 [s[2] for s in stats])
    got = np.asarray(acc / den[:, None].astype(acc.dtype))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_estimate_fused_stats_interpret_matches_einsum_stats(bank_and_obs):
    """The Pallas stats kernel (interpret mode) and the einsum stats path
    must produce the same merged estimate AND consistent raw states (same
    logit convention up to padding)."""
    bank, r = bank_and_obs
    m_e, den_e, acc_e = gmm_estimator.estimate_stats(bank, r, 512)
    m_k, den_k, acc_k = pk.estimate_fused_stats(bank, r, interpret=True)
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_e), atol=1e-4)
    got = np.asarray(acc_k / den_k[:, None].astype(acc_k.dtype))
    want = np.asarray(acc_e / den_e[:, None].astype(acc_e.dtype))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.fixture(scope="module")
def coherent_obs(bank_and_obs):
    """The module fixture's flat observations regrouped as (B, T, M)
    coherence blocks (the snapshots do not share a PSD here — irrelevant
    for exactness tests, which only compare the two compute paths)."""
    bank, r = bank_and_obs
    t = 4
    b = r.shape[0] // t
    return bank, r[:b * t].reshape(b, t, -1)


def test_fused_coherent_matches_einsum(coherent_obs):
    """The in-VMEM block-pooled kernel must equal the einsum coherent
    estimator exactly (same block posterior, same combine)."""
    bank, rb = coherent_obs
    want = np.asarray(gmm_estimator.estimate_coherent(bank, rb, "all"))
    got = np.asarray(pk.estimate_fused_coherent(bank, rb, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("t", [1, 2, 3, 8])
def test_fused_coherent_t_values(coherent_obs, t):
    """Every T (incl. T=1 degenerate and odd T, which needs a non-power-of-
    two tile) must match the einsum path."""
    bank, rb = coherent_obs
    r = rb.reshape(-1, rb.shape[-1])
    b = r.shape[0] // t
    rt = r[:b * t].reshape(b, t, -1)
    want = np.asarray(gmm_estimator.estimate_coherent(bank, rt, "all"))
    got = np.asarray(pk.estimate_fused_coherent(bank, rt, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_coherent_stats_kernel_shard_merge(coherent_obs):
    """Kernel coherent stats from disjoint component shards merged with
    `merge_stats` must reproduce the full coherent estimate — the
    tensor-parallel rank-3 route of `estimate_sharded_kernel`."""
    bank, rb = coherent_obs
    want = np.asarray(gmm_estimator.estimate_coherent(bank, rb, "all"))
    k = bank.filters.shape[0]
    ms, dens, accs = [], [], []
    for k0 in range(0, k, k // 2):
        sub = gmm_estimator.PreparedBank(*[x[k0:k0 + k // 2] for x in bank])
        m_c, den_c, acc_c = pk.estimate_fused_coherent_stats(
            sub, rb, interpret=True)
        ms.append(m_c)
        dens.append(den_c)
        accs.append(acc_c.reshape(acc_c.shape[0], -1))
    _, den, acc = pk.merge_stats(ms, dens, accs)
    got = np.asarray((acc / den[:, None].astype(acc.dtype))
                     .reshape(want.shape))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_coherent_stats_einsum_kernel_consistent(coherent_obs):
    """Einsum and kernel coherent stats share the logit convention: raw
    block maxima agree, merged estimates agree."""
    bank, rb = coherent_obs
    m_e, den_e, acc_e = gmm_estimator.estimate_coherent_stats(bank, rb)
    m_k, den_k, acc_k = pk.estimate_fused_coherent_stats(bank, rb,
                                                         interpret=True)
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_e), atol=1e-3)
    got = np.asarray(acc_k / den_k[:, None, None].astype(acc_k.dtype))
    want = np.asarray(acc_e / den_e[:, None, None].astype(acc_e.dtype))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_coherent_kernel_dead_components(coherent_obs):
    """A dead component (-inf log-weight from prepare_bank's floor) must
    not poison the pooled block softmax (the -1e30 clamp is scaled by T)."""
    bank, rb = coherent_obs
    logw = np.asarray(bank.log_weights).copy()
    logw[0] = -np.inf
    dead = gmm_estimator.PreparedBank(jnp.asarray(logw), bank.means_r,
                                      bank.prec_chol_r, bank.filters,
                                      bank.bias)
    want = np.asarray(gmm_estimator.estimate_coherent(dead, rb, "all"))
    got = np.asarray(pk.estimate_fused_coherent(dead, rb, interpret=True))
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("alpha", [1.0, 0.5, 0.0])
def test_fused_coherent_alpha_blend(coherent_obs, alpha):
    """The in-kernel leave-one-out blend ((1-a)*lg + a*pool(lg) with the
    1/(1-a+aT) log-weight scale) must equal the einsum blend at every
    alpha, including both endpoints."""
    bank, rb = coherent_obs
    want = np.asarray(gmm_estimator.estimate_coherent(bank, rb, "all", 512,
                                                      alpha))
    got = np.asarray(pk.estimate_fused_coherent(bank, rb, interpret=True,
                                                alpha=alpha))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("k_sel", [1, 2, 4, 7])
def test_topk_kernel_matches_einsum(bank_and_obs, k_sel):
    """Fused top-k selection (round-5): kernel == estimate(bank, r, k) for
    int selection modes (`gmm_cplx_bussgang.py:197-242`)."""
    bank, r = bank_and_obs
    got = np.asarray(pk.estimate_fused_topk(bank, r[:512], k_sel,
                                            interpret=True))
    want = np.asarray(gmm_estimator.estimate(bank, r[:512], k_sel))
    np.testing.assert_allclose(got, want, atol=2e-4, err_msg=str(k_sel))


def test_topk_kernel_eligibility(bank_and_obs):
    bank, r = bank_and_obs
    k_comp = bank.filters.shape[0]
    assert pk.topk_kernel_eligible(bank, 1)
    assert pk.topk_kernel_eligible(bank, min(4, k_comp - 1))
    assert not pk.topk_kernel_eligible(bank, "all")
    assert not pk.topk_kernel_eligible(bank, 0)
    assert not pk.topk_kernel_eligible(bank, k_comp)      # = 'all' anyway
    assert not pk.topk_kernel_eligible(bank, 0.9)         # float mode
    # oversized banks stay eligible through the split-K chunked merge
    # (round-5 late); only the single-launch path is budget-gated
    assert pk.topk_kernel_eligible(bank, 1, vmem_budget=16)


def test_topk_kernel_dead_components(bank_and_obs):
    """Dead (-inf log-weight) components must never win a top-k slot over a
    live one, and a dead slot's weight underflows to zero."""
    bank, r = bank_and_obs
    lw = np.asarray(bank.log_weights).copy()
    lw[::2] = -np.inf
    bank_dead = bank._replace(log_weights=jnp.asarray(lw))
    got = np.asarray(pk.estimate_fused_topk(bank_dead, r[:256], 2,
                                            interpret=True))
    want = np.asarray(gmm_estimator.estimate(bank_dead, r[:256], 2))
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.parametrize("k_sel", [1, 3])
def test_topk_chunked_matches_single_pass(bank_and_obs, k_sel):
    """Split-K chunked top-k (per-chunk candidate lists + merge_topk) must
    equal the einsum selection estimate for any chunking — the oversized-
    bank route of `estimate_fused_topk`."""
    bank, r = bank_and_obs
    want = np.asarray(gmm_estimator.estimate(bank, r[:256], k_sel))
    k_comp, d, m = bank.filters.shape
    per_k = 4 * (2 * m) * (2 * m + 2 * d)
    # tiny budget forces the chunked path (k_chunk = 4 of K = 8)
    got = np.asarray(pk.estimate_fused_topk(bank, r[:256], k_sel,
                                            interpret=True,
                                            vmem_budget=5 * per_k))
    np.testing.assert_allclose(got, want, atol=2e-4, err_msg=str(k_sel))
    assert pk.topk_kernel_eligible(bank, k_sel, vmem_budget=5 * per_k)


@pytest.fixture(scope="module")
def mp_bank_and_obs():
    from quantized_channel_estimation_tpu.models import structured_bank as sb
    n_ant, p, n_bits, snr = 16, 2, 2, 5.0
    key = jax.random.PRNGKey(55)
    h, _ = scm.generate_channels(key, 6000, scm.ScmConfig(n_ant, 1))
    fit = gmm.fit(jax.random.PRNGKey(56), h[:5000],
                  gmm.GmmConfig(n_components=8, cov_type="circulant",
                                max_iter=10, chunk_size=2048))
    a = pilots.pilot_matrix(n_ant, p, n_bits)
    q = Q.design_quantizer(snr, n_bits)
    r = observation.observe(jax.random.PRNGKey(57), h[5000:5512], snr, a,
                            n_bits, q)
    bank = sb.prepare_bank_circulant(fit.params, snr, a, n_bits, q)
    return bank, r.astype(jnp.complex64)


def test_mp_circ_kernel_matches_xla(mp_bank_and_obs):
    """Fused multi-pilot structured kernel (round-5 late): interpret-mode
    parity with the XLA per-bin P x P pipeline."""
    from quantized_channel_estimation_tpu.models import structured_bank as sb
    bank, r = mp_bank_and_obs
    want = np.asarray(sb.estimate_circulant_mp(bank, r, "all", 512, None,
                                               method="xla"))
    got = np.asarray(pk.estimate_fused_circulant_mp(bank, r,
                                                    interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_mp_circ_kernel_dead_components(mp_bank_and_obs):
    from quantized_channel_estimation_tpu.models import structured_bank as sb
    bank, r = mp_bank_and_obs
    lw = np.asarray(bank.log_weights).copy()
    lw[::2] = -np.inf
    bank_dead = bank._replace(log_weights=jnp.asarray(lw))
    want = np.asarray(sb.estimate_circulant_mp(bank_dead, r[:128], "all",
                                               128, None, method="xla"))
    got = np.asarray(pk.estimate_fused_circulant_mp(bank_dead, r[:128],
                                                    interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_mp_circ_kernel_p4(mp_bank_and_obs):
    """P=4: the pair-feature unroll (6 cross pairs) stays exact."""
    from quantized_channel_estimation_tpu.models import structured_bank as sb
    bank2, _ = mp_bank_and_obs
    n_ant, p, n_bits, snr = 16, 4, 2, 5.0
    key = jax.random.PRNGKey(58)
    h, _ = scm.generate_channels(key, 4000, scm.ScmConfig(n_ant, 1))
    fit = gmm.fit(jax.random.PRNGKey(59), h[:3500],
                  gmm.GmmConfig(n_components=4, cov_type="circulant",
                                max_iter=8, chunk_size=2048))
    a = pilots.pilot_matrix(n_ant, p, n_bits)
    q = Q.design_quantizer(snr, n_bits)
    r = observation.observe(jax.random.PRNGKey(60), h[3500:3756], snr, a,
                            n_bits, q)
    bank = sb.prepare_bank_circulant(fit.params, snr, a, n_bits, q)
    want = np.asarray(sb.estimate_circulant_mp(bank, r, "all", 256, None,
                                               method="xla"))
    got = np.asarray(pk.estimate_fused_circulant_mp(bank, r,
                                                    interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.parametrize("t,alpha", [(4, 1.0), (4, 0.25), (8, 1.0)])
def test_mp_circ_coherent_kernel(mp_bank_and_obs, t, alpha):
    """Fused coherent multi-pilot kernel (round-5 late): interpret-mode
    parity with the XLA MP coherent pipeline incl. the alpha blend."""
    from quantized_channel_estimation_tpu.models import structured_bank as sb
    bank, r = mp_bank_and_obs
    b = 256 // t
    rb = r[:b * t].reshape(b, t, -1)
    want = np.asarray(sb.estimate_circulant_mp_coherent(
        bank, rb, "all", 64, alpha, None, method="xla"))
    got = np.asarray(pk.estimate_fused_circulant_mp_coherent(
        bank, rb, alpha=alpha, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4, err_msg=str((t, alpha)))
