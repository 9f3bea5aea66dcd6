"""Harness variants: multi-pilot, Lloyd-Max quantizer, structured covariance
types, 1-bit and inf-bit sweeps — end-to-end through run_gmm."""
import numpy as np
import pytest

from quantized_channel_estimation_tpu.harness import run_gmm
from quantized_channel_estimation_tpu.ops.quantizer import INF_BITS


def _cfg(tmp_path, **kw):
    base = dict(n_antennas=16, n_components=4, n_train=8000, n_val=800,
                snrs=(0, 10), gmm_max_iter=15,
                results_dir=str(tmp_path / "results"),
                cache_dir=str(tmp_path / "results" / "saves"),
                eval_blmmse_genie=False, eval_ls_glob=False)
    base.update(kw)
    return run_gmm.GmmBenchConfig(**base)


def test_multi_pilot(tmp_path):
    # no SNR-monotonicity assertion: with amplitude-ramp multi-pilot configs
    # the reference's scalar-beta Cr model is mismatched at high SNR and the
    # MSE can genuinely increase (verified reference behavior)
    mse, _, _ = run_gmm.run(_cfg(tmp_path, n_pilots=2), verbose=False)
    assert 0 < mse["blmmse_gmm"][-1] < 1.0
    assert 0 < mse["blmmse_gmm"][0] < 1.0


def test_lloyd_quantizer(tmp_path):
    mse, _, _ = run_gmm.run(_cfg(tmp_path, quantizer_type="lloyd", n_bits=3),
                            verbose=False)
    assert 0 < mse["blmmse_gmm"][-1] < 1.0


@pytest.mark.parametrize("cov_type,blocks", [("circulant", None),
                                             ("toeplitz", None),
                                             ("block-circulant", (4, 4))])
def test_structured_covariance(tmp_path, cov_type, blocks):
    mse, _, _ = run_gmm.run(_cfg(tmp_path, cov_type=cov_type, blocks=blocks),
                            verbose=False)
    assert np.isfinite(mse["blmmse_gmm"][-1])
    assert 0 < mse["blmmse_gmm"][-1] < 1.0


def test_coherence_blocks_column(tmp_path):
    """n_coherence > 1 adds the block-pooled 'blmmse_gmm_coh' column, which
    must beat (or tie) independent per-snapshot estimation at low SNR; both
    rate columns are produced; snapshot counts must divide by T."""
    mse, rate, _ = run_gmm.run(
        _cfg(tmp_path, n_coherence=4, snrs=(-10, 0), use_cache=False),
        verbose=False)
    assert "blmmse_gmm_coh" in mse and "gmm_coh_rstat" in rate
    assert mse["blmmse_gmm_coh"][0] <= mse["blmmse_gmm"][0] * 1.02, mse
    assert all(np.isfinite(v) for v in mse["blmmse_gmm_coh"])
    with pytest.raises(ValueError, match="multiples of n_coherence"):
        run_gmm.run(_cfg(tmp_path, n_coherence=3), verbose=False)


def test_structured_bank_harness_matches_dense(tmp_path):
    """use_structured_bank='auto' routes circulant fits through the
    FFT-domain bank; the MSE columns must equal the dense path's (the
    posteriors are a unitary change of basis apart), flat AND coherent."""
    kw = dict(cov_type="circulant", use_cache=False, n_train=8000)
    m_s, _, _ = run_gmm.run(_cfg(tmp_path, **kw), verbose=False)
    m_d, _, _ = run_gmm.run(_cfg(tmp_path, use_structured_bank=False, **kw),
                            verbose=False)
    np.testing.assert_allclose(m_s["blmmse_gmm"], m_d["blmmse_gmm"],
                               rtol=1e-4)
    mc_s, _, _ = run_gmm.run(_cfg(tmp_path, n_coherence=4,
                                  coherence_alpha=0.25, **kw),
                             verbose=False)
    mc_d, _, _ = run_gmm.run(_cfg(tmp_path, n_coherence=4,
                                  coherence_alpha=0.25,
                                  use_structured_bank=False, **kw),
                             verbose=False)
    np.testing.assert_allclose(mc_s["blmmse_gmm_coh"],
                               mc_d["blmmse_gmm_coh"], rtol=1e-4)


def test_structured_bank_multi_pilot(tmp_path):
    """Round-5: structured banks are exact for ANY n_pilots — P>1 rides
    the per-bin P x P bank (CirculantBankMP) and must match the dense
    path on the same sweep (the old P=1-only restriction is lifted)."""
    kw = dict(cov_type="circulant", n_pilots=2, use_cache=False,
              snrs=(0, 10))
    mse_s, _, _ = run_gmm.run(_cfg(tmp_path, use_structured_bank=True,
                                   **kw), verbose=False)
    mse_d, _, _ = run_gmm.run(_cfg(tmp_path, use_structured_bank=False,
                                   **kw), verbose=False)
    np.testing.assert_allclose(mse_s["blmmse_gmm"], mse_d["blmmse_gmm"],
                               rtol=1e-4)


def test_auto_coherence_alpha(tmp_path):
    """coherence_alpha='auto': per-SNR grid selection on held-out train
    blocks (round-4 VERDICT item 2). The chosen alphas must come from the
    grid, be recorded, and the auto coherent column must match-or-beat BOTH
    fixed endpoints (alpha=0 == independent, alpha=1 == block posterior) at
    every SNR up to validation-vs-eval noise."""
    from quantized_channel_estimation_tpu.models.gmm_estimator import (
        DEFAULT_ALPHA_GRID)
    kw = dict(n_coherence=4, snrs=(-10, 10), use_cache=False,
              n_train=12000, alpha_val_blocks=512)
    mse_auto, _, tim = run_gmm.run(
        _cfg(tmp_path, coherence_alpha="auto", **kw), verbose=False)
    alphas = tim["coherence_alpha_by_snr"]
    assert set(alphas) == {-10, 10}
    assert all(a in DEFAULT_ALPHA_GRID for a in alphas.values())
    mse_blk, _, _ = run_gmm.run(
        _cfg(tmp_path, coherence_alpha=1.0, **kw), verbose=False)
    mse_ind, _, _ = run_gmm.run(
        _cfg(tmp_path, coherence_alpha=0.0, **kw), verbose=False)
    for i in range(2):
        best_fixed = min(mse_blk["blmmse_gmm_coh"][i],
                         mse_ind["blmmse_gmm_coh"][i])
        # the fixed runs fit on ALL train snapshots while 'auto' withholds
        # the alpha-validation blocks from its fit (~10% here), so at this
        # tiny scale the fits themselves differ — the margin absorbs the
        # fit-data gap, not selection error (the same-bank comparison is
        # test_select_coherence_alpha in tests/test_gmm.py)
        assert mse_auto["blmmse_gmm_coh"][i] <= best_fixed * 1.12, (
            mse_auto["blmmse_gmm_coh"], mse_blk["blmmse_gmm_coh"],
            mse_ind["blmmse_gmm_coh"])


def test_auto_alpha_requires_coherence(tmp_path):
    with pytest.raises(ValueError, match="auto"):
        run_gmm.run(_cfg(tmp_path, coherence_alpha="auto"), verbose=False)


def test_segmented_fit_matches_monolithic(tmp_path):
    """gmm_fit_segments=3 must land at the same MSE as one 15-iter fit —
    the segmented harness path is an execution-shape change, not a model
    change (toeplitz exercises the structured resume)."""
    mono, _, _ = run_gmm.run(_cfg(tmp_path, cov_type="toeplitz",
                                  use_cache=False), verbose=False)
    seg, _, _ = run_gmm.run(_cfg(tmp_path, cov_type="toeplitz",
                                 use_cache=False, gmm_fit_segments=3),
                            verbose=False)
    np.testing.assert_allclose(seg["blmmse_gmm"], mono["blmmse_gmm"],
                               rtol=0.05)


@pytest.mark.parametrize("n_bits", [1, INF_BITS])
def test_bit_extremes(tmp_path, n_bits):
    mse, _, _ = run_gmm.run(_cfg(tmp_path, n_bits=n_bits), verbose=False)
    assert 0 < mse["blmmse_gmm"][-1] < 1.0


def test_one_bit_worse_than_inf(tmp_path):
    m1, _, _ = run_gmm.run(_cfg(tmp_path, n_bits=1), verbose=False)
    minf, _, _ = run_gmm.run(_cfg(tmp_path, n_bits=INF_BITS), verbose=False)
    assert m1["blmmse_gmm"][-1] > minf["blmmse_gmm"][-1]


def test_mimo_channel_model(tmp_path):
    """Kronecker MIMO end to end: kron-genie BLMMSE must beat the global
    filter, and the GMM must sit between them."""
    mse, _, _ = run_gmm.run(_cfg(tmp_path, channel_model="mimo",
                                 n_antennas=8, n_antennas_ms=2,
                                 n_components=4, eval_blmmse_genie=True),
                            verbose=False)
    assert mse["blmmse_genie"][-1] < mse["blmmse_gmm"][-1] \
        < mse["blmmse_glob"][-1]


def test_urban_macro_channel_model(tmp_path):
    mse, _, _ = run_gmm.run(_cfg(tmp_path, channel_model="urban-macro",
                                 eval_blmmse_genie=True),
                            verbose=False)
    assert mse["blmmse_genie"][-1] < mse["blmmse_glob"][-1]
    assert np.isfinite(mse["blmmse_gmm"][-1])


def test_urban_macro_coherence_column(tmp_path):
    """n_coherence > 1 with the urban-macro model (round-2 VERDICT item 4
    lifted the '3gpp'-only guard): the blmmse_gmm_coh column appears and is
    finite; joint must not lose at the lowest SNR (the cell-edge regime the
    block posterior targets)."""
    mse, _, _ = run_gmm.run(
        _cfg(tmp_path, channel_model="urban-macro", n_path=6,
             n_coherence=4, snrs=(-10, 0)), verbose=False)
    assert "blmmse_gmm_coh" in mse
    assert np.all(np.isfinite(mse["blmmse_gmm_coh"]))
    assert mse["blmmse_gmm_coh"][0] <= mse["blmmse_gmm"][0] * 1.05


def test_mimo_coherence_column(tmp_path):
    """n_coherence > 1 with the Kronecker MIMO model: block-shaped dataset,
    per-block (t_bs, t_ms) genie rows repeated per snapshot, coherent
    column present."""
    mse, _, _ = run_gmm.run(
        _cfg(tmp_path, n_antennas=8, n_antennas_ms=2, channel_model="mimo",
             n_coherence=4, snrs=(-10, 0), eval_blmmse_genie=True),
        verbose=False)
    assert "blmmse_gmm_coh" in mse and "blmmse_genie" in mse
    assert np.all(np.isfinite(mse["blmmse_gmm_coh"]))
    assert mse["blmmse_gmm_coh"][0] <= mse["blmmse_gmm"][0] * 1.05
