"""Trace post-processing: validated on synthetic bleach/outlier curves
(the reference file is non-functional; behavior specified from its
docstrings/MATLAB body — SURVEY.md §2.4 #9)."""

import numpy as np

from dnmf_tpu.traces import clean_traces, histogram_match


def _synthetic_traces(rng, k=4, t=200, bleach=0.01):
    x = np.arange(t)
    base = 1.0 + 0.5 * rng.random((k, 1))
    signal = rng.random((k, t)) * (rng.random((k, t)) > 0.8)
    bleach_curve = np.exp(-bleach * x)[None, :]
    return (base + signal) * bleach_curve


def test_histogram_match_affine_recovery(rng):
    b = rng.gamma(2.0, 1.0, size=500)
    a = 0.5 * b + 2.0  # a is an affine distortion of b
    matched, dist = histogram_match(a, b, nbins=50, kind="regular")
    # Matching must invert the affine map.
    np.testing.assert_allclose(matched, b, atol=1e-6)
    assert dist < 1e-8


def test_histogram_match_nonnegative_and_nans(rng):
    b = rng.gamma(2.0, 1.0, size=300)
    # Inverse map 0.5*a + 0.5 has non-negative coefficients (NNLS clamps
    # negative intercepts to zero, so the truth must be feasible).
    a = 2.0 * b - 1.0
    a[10:20] = np.nan
    matched, dist = histogram_match(a, b, nbins=30, kind="non-negative")
    assert np.isnan(matched[10:20]).all()
    ok = ~np.isnan(matched)
    # a's valid subset excludes 10 samples, so its quantile profile (and
    # hence the fitted affine map) differs slightly from the exact inverse.
    np.testing.assert_allclose(matched[ok], b[ok], atol=0.2)
    assert dist < 0.1


def test_clean_traces_removes_bleach(rng):
    traces = _synthetic_traces(rng, bleach=0.02)
    cleaned, scales, offsets = clean_traces(
        traces, fps=4.0, detrend_mode=2, interp_method="linear"
    )
    ok = ~np.isnan(cleaned)
    # Output range [0.05, 0.95].
    assert np.nanmin(cleaned) >= 0.05 - 1e-9
    assert np.nanmax(cleaned) <= 0.95 + 1e-9
    # De-bleached: first-half vs second-half baseline (median) must be
    # much closer than in the raw bleached traces.
    t = traces.shape[1]
    raw_drop = np.nanmedian(traces[:, : t // 2], axis=1) - np.nanmedian(
        traces[:, t // 2:], axis=1
    )
    cl_drop = np.nanmedian(cleaned[:, : t // 2], axis=1) - np.nanmedian(
        cleaned[:, t // 2:], axis=1
    )
    assert np.abs(cl_drop).mean() < 0.5 * np.abs(raw_drop).mean()


def test_clean_traces_outlier_damping(rng):
    traces = _synthetic_traces(rng, bleach=0.0)
    traces[1, 100] += 100.0  # single-frame spike, reverts next frame
    cleaned, _, _ = clean_traces(traces, fps=4.0, sigma_threshold=5.0,
                                 detrend_mode=0, interp_method="linear")
    assert np.nanmax(cleaned[1]) <= 0.95 + 1e-9
    # The spike frame should not dominate the cleaned trace: its value is
    # in line with neighbors after median filtering.
    assert cleaned[1, 100] < 0.9


def test_clean_traces_dff_mode(rng):
    traces = _synthetic_traces(rng, bleach=0.01) * 10
    cleaned, scales, offsets = clean_traces(traces, fps=4.0,
                                            detrend_mode=3)
    assert np.all(scales >= 1.0)
    assert np.all(offsets == 0.0)
    assert np.isfinite(cleaned[~np.isnan(cleaned)]).all()


def test_clean_traces_smoothing(rng):
    traces = _synthetic_traces(rng, bleach=0.0)
    cleaned, _, _ = clean_traces(
        traces, fps=4.0, detrend_mode=0, interp_method="linear",
        smooth_method="movmean", smooth_window=5,
    )
    rough = clean_traces(traces, fps=4.0, detrend_mode=0,
                         interp_method="linear")[0]
    ok = ~np.isnan(cleaned) & ~np.isnan(rough)

    def tv(a):
        return np.abs(np.diff(a)).sum()

    assert tv(cleaned[0][ok[0]]) < tv(rough[0][ok[0]])


def test_clean_traces_butterworth_without_interp(rng):
    """Filtering must not propagate the edge-frame NaNs across rows."""
    traces = _synthetic_traces(rng, bleach=0.0)
    cleaned, _, _ = clean_traces(
        traces, fps=4.0, detrend_mode=0,
        smooth_method="low", smooth_window=(4, 0.2),
    )
    assert np.isfinite(cleaned).all()
    assert cleaned.min() >= 0.05 - 1e-9
