"""FFT registration primitives vs known shifts (scipy as shift oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import fourier_shift

from dnmf_tpu.ops import fft_reg


def _rand_image(rng, shape):
    # Smooth random image so correlation peaks are well defined.
    img = rng.normal(size=shape)
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(img, 2.0).astype(np.float32)


@pytest.mark.parametrize("shift", [(3, -2), (0, 5), (-4, -4)])
def test_integer_shift_2d(rng, shift):
    img = _rand_image(rng, (64, 48))
    shifted = np.roll(img, shift, axis=(0, 1))
    shifts, _, _ = fft_reg.phase_cross_correlation(
        jnp.asarray(shifted), jnp.asarray(img), max_shifts=(8, 8)
    )
    np.testing.assert_allclose(np.asarray(shifts), shift, atol=1e-3)


def test_integer_shift_3d(rng):
    img = _rand_image(rng, (32, 32, 8))
    shifted = np.roll(img, (2, -3, 1), axis=(0, 1, 2))
    shifts, _, _ = fft_reg.phase_cross_correlation(
        jnp.asarray(shifted), jnp.asarray(img), max_shifts=(6, 6, 2)
    )
    np.testing.assert_allclose(np.asarray(shifts), (2, -3, 1), atol=1e-3)


def test_subpixel_shift_2d(rng):
    img = _rand_image(rng, (64, 64))
    true = (1.3, -2.6)
    shifted = np.real(
        np.fft.ifftn(fourier_shift(np.fft.fftn(img), true))
    ).astype(np.float32)
    shifts, _, _ = fft_reg.phase_cross_correlation(
        jnp.asarray(shifted), jnp.asarray(img), upsample_factor=10,
        max_shifts=(6, 6),
    )
    np.testing.assert_allclose(np.asarray(shifts), true, atol=0.1)


def test_subpixel_shift_3d(rng):
    img = _rand_image(rng, (32, 32, 10))
    true = (0.5, -1.25, 0.75)
    shifted = np.real(
        np.fft.ifftn(fourier_shift(np.fft.fftn(img), true))
    ).astype(np.float32)
    shifts, _, _ = fft_reg.phase_cross_correlation(
        jnp.asarray(shifted), jnp.asarray(img), upsample_factor=8,
        max_shifts=(4, 4, 2),
    )
    np.testing.assert_allclose(np.asarray(shifts), true, atol=0.15)


def test_max_shifts_window_excludes_larger_shift(rng):
    img = _rand_image(rng, (64, 64))
    shifted = np.roll(img, (6, 0), axis=(0, 1))
    shifts, _, _ = fft_reg.phase_cross_correlation(
        jnp.asarray(shifted), jnp.asarray(img), max_shifts=(3, 3)
    )
    assert abs(float(shifts[0])) <= 3.0


def test_bounds_lb_ub(rng):
    img = _rand_image(rng, (64, 64))
    shifted = np.roll(img, (4, -2), axis=(0, 1))
    shifts, _, _ = fft_reg.phase_cross_correlation(
        jnp.asarray(shifted), jnp.asarray(img),
        shifts_lb=jnp.asarray([2.0, -4.0]),
        shifts_ub=jnp.asarray([7.0, 1.0]),
    )
    np.testing.assert_allclose(np.asarray(shifts), (4, -2), atol=1e-3)


def test_apply_shifts_roundtrip(rng):
    img = _rand_image(rng, (48, 48))
    shifts, src_freq, phasediff = fft_reg.phase_cross_correlation(
        jnp.asarray(np.roll(img, (3, 1), axis=(0, 1))), jnp.asarray(img),
        max_shifts=(6, 6),
    )
    # src_freq is an rfftn half-spectrum (use_rfft default).
    corrected = fft_reg.apply_shifts_fourier(
        src_freq, -shifts, phasediff, is_freq=True, border_nan=False,
        rfft_shape=img.shape,
    )
    # Interior must match the unshifted original.
    np.testing.assert_allclose(
        np.asarray(corrected)[6:-6, 6:-6], img[6:-6, 6:-6], atol=1e-3
    )
    # The complex-spectrum path remains available and must agree.
    shifts_c, src_freq_c, phasediff_c = fft_reg.phase_cross_correlation(
        jnp.asarray(np.roll(img, (3, 1), axis=(0, 1))), jnp.asarray(img),
        max_shifts=(6, 6), use_rfft=False,
    )
    np.testing.assert_allclose(np.asarray(shifts_c), np.asarray(shifts),
                               atol=1e-5)
    corrected_c = fft_reg.apply_shifts_fourier(
        src_freq_c, -shifts_c, phasediff_c, is_freq=True,
        border_nan=False,
    )
    np.testing.assert_allclose(np.asarray(corrected_c),
                               np.asarray(corrected), atol=1e-4)


def test_apply_shifts_border_nan(rng):
    img = _rand_image(rng, (20, 20))
    out = np.asarray(
        fft_reg.apply_shifts_fourier(jnp.asarray(img), jnp.asarray([2.0, -3.0]),
                                     border_nan=True)
    )
    assert np.all(np.isnan(out[:2, :]))
    assert np.all(np.isnan(out[:, -3:]))
    assert np.all(np.isfinite(out[3:, :-4]))


def test_apply_shifts_border_copy(rng):
    img = _rand_image(rng, (20, 20))
    out = np.asarray(
        fft_reg.apply_shifts_fourier(jnp.asarray(img), jnp.asarray([2.0, 0.0]),
                                     border_nan="copy")
    )
    np.testing.assert_allclose(out[0], out[2], atol=1e-6)
    np.testing.assert_allclose(out[1], out[2], atol=1e-6)


def test_apply_shifts_border_min(rng):
    img = _rand_image(rng, (20, 20))
    out = np.asarray(
        fft_reg.apply_shifts_fourier(jnp.asarray(img), jnp.asarray([0.0, 2.0]),
                                     border_nan="min")
    )
    mn = np.nanmin(out)
    np.testing.assert_allclose(out[:, 0], mn)


def test_cubic_integer_shift_matches_fourier(rng):
    """At integer shifts both apply paths are exact shifts with the same
    min-filled border region."""
    img = _rand_image(rng, (24, 20))
    for shift in [(3.0, -2.0), (0.0, 4.0)]:
        ours = np.asarray(fft_reg.apply_shifts_cubic(
            jnp.asarray(img), jnp.asarray(shift), border_nan="min"))
        ref = np.asarray(fft_reg.apply_shifts_fourier(
            jnp.asarray(img), jnp.asarray(shift), border_nan="min"))
        np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_cubic_reproduces_linear_ramp(rng):
    """Keys a=-0.5 interpolates degree<=2 polynomials exactly: a linear
    ramp shifted by a fraction stays a linear ramp in the interior."""
    x = np.arange(32, dtype=np.float32)
    img = np.broadcast_to(0.5 * x + 3.0, (8, 32)).copy()
    out = np.asarray(fft_reg.apply_shifts_cubic(
        jnp.asarray(img), jnp.asarray([0.0, 0.3]), border_nan="min"))
    expect = 0.5 * (x - 0.3) + 3.0
    np.testing.assert_allclose(out[4, 2:-2], expect[2:-2], rtol=1e-5,
                               atol=1e-4)


def test_cubic_fractional_shift_matches_scipy_spline(rng):
    """Independent oracle: scipy's order-3 spline shift agrees with Keys
    cubic convolution to interpolation error (measured 0.18% of range on
    this fixture); the Fourier (sinc) apply is a looser sanity bound."""
    from scipy.ndimage import shift as ndshift

    img = _rand_image(rng, (48, 48))
    shift = (1.7, -2.3)
    ours = np.asarray(fft_reg.apply_shifts_cubic(
        jnp.asarray(img), jnp.asarray(shift)))
    # The default clamps into the input range like the reference
    # (apply_shift_iteration's np.clip) — clip the oracle the same way.
    sci = np.clip(ndshift(img, shift, order=3, mode="nearest"),
                  img.min(), img.max())
    np.testing.assert_allclose(ours[4:-4, 4:-4], sci[4:-4, 4:-4],
                               atol=5e-3 * np.ptp(img))
    ref = np.asarray(fft_reg.apply_shifts_fourier(
        jnp.asarray(img), jnp.asarray(shift), border_nan="min"))
    np.testing.assert_allclose(ours[4:-4, 4:-4], ref[4:-4, 4:-4],
                               atol=6e-2 * np.ptp(img))


def test_cubic_border_policies(rng):
    img = _rand_image(rng, (16, 16))
    j = jnp.asarray(img)
    s = jnp.asarray([2.5, 0.0])
    out_min = np.asarray(fft_reg.apply_shifts_cubic(j, s, "min"))
    assert np.allclose(out_min[0], np.min(img))
    out_nan = np.asarray(fft_reg.apply_shifts_cubic(j, s, True))
    assert np.all(np.isnan(out_nan[0])) and not np.any(
        np.isnan(out_nan[8]))
    out_copy = np.asarray(fft_reg.apply_shifts_cubic(j, s, "copy"))
    assert np.all(np.isfinite(out_copy))
    out_wrap = np.asarray(fft_reg.apply_shifts_cubic(j, s, False))
    assert np.all(np.isfinite(out_wrap))


def test_cubic_3d_and_jit(rng):
    vol = _rand_image(rng, (16, 16, 8))
    import jax

    f = jax.jit(fft_reg.apply_shifts_cubic, static_argnames=())
    out = np.asarray(f(jnp.asarray(vol), jnp.asarray([1.2, -0.7, 0.4])))
    from scipy.ndimage import shift as ndshift

    sci = np.clip(ndshift(vol, (1.2, -0.7, 0.4), order=3, mode="nearest"),
                  vol.min(), vol.max())
    np.testing.assert_allclose(out[3:-3, 3:-3, 2:-2],
                               sci[3:-3, 3:-3, 2:-2],
                               atol=6e-3 * np.ptp(vol))


def test_bin_median_matches_reference_binning(rng):
    video = rng.normal(size=(25, 8, 8)).astype(np.float32)
    ours = np.asarray(fft_reg.bin_median(jnp.asarray(video), window=10))
    num_windows = 25 // 10
    ref = np.nanmedian(
        np.nanmean(video[:20].reshape(10, num_windows, 8, 8), axis=0),
        axis=0,
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_rfft_matches_complex_path(rng):
    """rfft-based correlation must produce identical subpixel shifts to
    the full complex-spectrum path (3-D, fractional shift)."""
    img = _rand_image(rng, (24, 24, 8))
    moved = np.asarray(fft_reg.apply_shifts_fourier(
        jnp.asarray(img), jnp.asarray([1.4, -2.3, 0.6]),
        border_nan=False))
    for usf in (1, 10):
        s_r, _, p_r = fft_reg.phase_cross_correlation(
            jnp.asarray(moved), jnp.asarray(img), upsample_factor=usf,
            max_shifts=(5, 5, 2), use_rfft=True)
        s_c, _, p_c = fft_reg.phase_cross_correlation(
            jnp.asarray(moved), jnp.asarray(img), upsample_factor=usf,
            max_shifts=(5, 5, 2), use_rfft=False)
        np.testing.assert_allclose(np.asarray(s_r), np.asarray(s_c),
                                   atol=1e-4)
        np.testing.assert_allclose(float(jnp.cos(p_r)),
                                   float(jnp.cos(p_c)), atol=1e-3)


def test_hermitian_full_reconstruction(rng):
    """_hermitian_full(rfftn(x)) == fftn(x) for real x (even + odd)."""
    for shape in [(8, 6), (7, 9), (6, 5, 4), (5, 4, 7)]:
        x = rng.normal(size=shape).astype(np.float32)
        half = jnp.fft.rfftn(jnp.asarray(x))
        full = fft_reg._hermitian_full(half, shape)
        np.testing.assert_allclose(np.asarray(full),
                                   np.fft.fftn(x), atol=1e-3)


def test_separable_warp_base_decomposition(rng):
    """separable_warp with a traced rigid base must equal the plain
    (wide-loop) form on a bounded-deviation field."""
    from dnmf_tpu.ops.resample import separable_warp

    vol = jnp.asarray(rng.random((24, 24, 6)).astype(np.float32))
    rigid = jnp.asarray([3.4, -2.7, 0.8])
    dev = jnp.asarray(
        np.stack([
            1.2 * np.sin(np.linspace(0, 3, 24))[:, None, None]
            * np.ones((24, 24, 6)),
            -0.9 * np.cos(np.linspace(0, 2, 24))[None, :, None]
            * np.ones((24, 24, 6)),
            0.3 * np.ones((24, 24, 6)),
        ], axis=-1).astype(np.float32))
    field = dev + rigid[None, None, None, :]
    wide = separable_warp(vol, field, (6, 6, 2))
    based = separable_warp(vol, field, (2, 2, 2), base=rigid,
                           base_bound=(5, 5, 2))
    np.testing.assert_allclose(np.asarray(based), np.asarray(wide),
                               atol=1e-5)


def test_matrix_dftn_matches_fftn(rng):
    """MXU matrix-DFT == XLA fftn (forward + inverse roundtrip)."""
    for shape in [(16, 12), (20, 16, 6), (7, 9, 5)]:
        x = rng.normal(size=shape).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(fft_reg.matrix_dftn(jnp.asarray(x))),
            np.fft.fftn(x), atol=1e-3)
        rt = fft_reg.matrix_dftn(fft_reg.matrix_dftn(jnp.asarray(x)),
                                 inverse=True)
        np.testing.assert_allclose(np.asarray(rt.real), x, atol=1e-4)


def test_matmul_impl_matches_rfft_impl(rng):
    """fft_impl='matmul' and 'rfft' paths agree on subpixel shifts."""
    img = _rand_image(rng, (40, 40, 8))
    moved = np.asarray(fft_reg.apply_shifts_fourier(
        jnp.asarray(img), jnp.asarray([2.6, -1.2, 0.4]),
        border_nan=False))
    s_m, _, _ = fft_reg.phase_cross_correlation(
        jnp.asarray(moved), jnp.asarray(img), upsample_factor=10,
        max_shifts=(5, 5, 2), fft_impl="matmul")
    s_f, _, _ = fft_reg.phase_cross_correlation(
        jnp.asarray(moved), jnp.asarray(img), upsample_factor=10,
        max_shifts=(5, 5, 2), fft_impl="xla")
    np.testing.assert_allclose(np.asarray(s_m), np.asarray(s_f),
                               atol=1e-3)


def test_cubic_nan_border_negative_weight_taps():
    """The NaN mask must fire when the ONLY out-of-range tap carries a
    negative Keys weight (regression: a signed `fill_w > 0` test let
    those pixels through with a silently un-normalized value)."""
    src = jnp.full((8,), 2.0, jnp.float32)
    out = np.asarray(fft_reg.apply_shifts_cubic(src, jnp.asarray([-0.5]),
                                                border_nan=True))
    # out[x] = src[x + 0.5]: taps x-1..x+2.  x=0 reaches src[-1] and
    # x=6 reaches src[8], each with Keys weight -0.0625 — NaN band.
    assert np.isnan(out[0]) and np.isnan(out[6]) and np.isnan(out[7])
    np.testing.assert_allclose(out[1:6], 2.0, rtol=1e-6)
    # The "min" constant blend keeps the signed weights (they must sum
    # to 1): a constant image stays exactly constant everywhere.
    out_min = np.asarray(fft_reg.apply_shifts_cubic(
        src, jnp.asarray([-0.5]), border_nan="min"))
    np.testing.assert_allclose(out_min, 2.0, rtol=1e-6)


def test_cubic_clamps_overshoot_like_reference():
    """Keys negative lobes overshoot at sharp edges; the reference clips
    the warped output into [nanmin, nanmax] of the input
    (apply_shift_iteration, /root/reference/Demix/MotionCorrect.py:393-396)
    — the default must too, and clamp_range=False must expose the raw
    convolution."""
    step = np.zeros((8, 16), np.float32)
    step[:, 8:] = 1.0
    s = jnp.asarray([0.0, 0.4])
    clamped = np.asarray(fft_reg.apply_shifts_cubic(
        jnp.asarray(step), s, border_nan="min"))
    raw = np.asarray(fft_reg.apply_shifts_cubic(
        jnp.asarray(step), s, border_nan="min", clamp_range=False))
    assert raw.max() > 1.0 + 1e-4 and raw.min() < -1e-4  # overshoots
    assert clamped.max() <= 1.0 and clamped.min() >= 0.0
    np.testing.assert_allclose(clamped,
                               np.clip(raw, step.min(), step.max()))


def test_cubic_reflect_border(rng):
    """border_nan='reflect' == the reference's interior
    cv2.BORDER_REFLECT (edge sample duplicated == scipy mode='reflect');
    gated against scipy's order-3 spline on a smooth image (different
    kernel family, so interpolation-error tolerance)."""
    from scipy.ndimage import gaussian_filter
    from scipy.ndimage import shift as ndshift

    img = gaussian_filter(
        rng.normal(size=(24, 24)).astype(np.float32), 2.0)
    shift = (2.3, -1.6)
    ours = np.asarray(fft_reg.apply_shifts_cubic(
        jnp.asarray(img), jnp.asarray(shift), border_nan="reflect",
        clamp_range=False))
    sci = ndshift(img, shift, order=3, mode="reflect")
    np.testing.assert_allclose(ours, sci, atol=2e-2 * np.ptp(img))
    # Constant image: reflect taps are all valid values -> exact.
    const = jnp.full((12,), 3.0, jnp.float32)
    out = np.asarray(fft_reg.apply_shifts_cubic(
        const, jnp.asarray([-1.5]), border_nan="reflect"))
    np.testing.assert_allclose(out, 3.0, rtol=1e-6)
