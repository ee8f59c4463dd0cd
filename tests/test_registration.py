"""Registration stack tests: rigid + piecewise-rigid on synthetic videos
with known motion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

from dnmf_tpu.config import RegistrationConfig
from dnmf_tpu.registration import MotionCorrect, patch_grid, tile_and_correct


def _template(rng, shape=(64, 64)):
    return gaussian_filter(rng.normal(size=shape), 2.0).astype(np.float32)


def _rolled_video(template, shifts):
    frames = [
        np.roll(template, s, axis=tuple(range(len(s)))) for s in shifts
    ]
    return np.stack(frames).astype(np.float32)


def test_rigid_recovers_known_shifts(rng):
    tmpl = _template(rng)
    true = [(0, 0), (2, -1), (-3, 2), (1, 3), (-2, -2), (3, 0)]
    video = _rolled_video(tmpl, true)
    mc = MotionCorrect(
        video, RegistrationConfig(max_shifts=(5, 5), pw_rigid=False,
                                  splits=2, border_nan=False)
    ).motion_correct(template=jnp.asarray(tmpl))
    rec = np.asarray(mc.shifts_rig)
    np.testing.assert_allclose(rec, -np.asarray(true, dtype=float),
                               atol=0.15)
    assert mc.border_to_0 == 3


def test_rigid_cubic_apply_mode(rng):
    """apply_mode='cubic' (the reference's apply_shift_iteration
    cv2.warpAffine INTER_CUBIC analog) estimates the same shifts and
    produces a correction close to the Fourier apply in the interior."""
    from dnmf_tpu.registration.motion_correct import rigid_correct_frames

    tmpl = _template(rng)
    true = [(2, -1), (-3, 2)]
    video = jnp.asarray(_rolled_video(tmpl, true))
    corr_f, sh_f = rigid_correct_frames(video, jnp.asarray(tmpl), (5, 5))
    corr_c, sh_c = rigid_correct_frames(video, jnp.asarray(tmpl), (5, 5),
                                        apply_mode="cubic")
    np.testing.assert_allclose(np.asarray(sh_c), np.asarray(sh_f),
                               atol=1e-5)
    f = np.nan_to_num(np.asarray(corr_f), nan=0.0)[:, 5:-5, 5:-5]
    c = np.asarray(corr_c)[:, 5:-5, 5:-5]
    np.testing.assert_allclose(c, f, atol=5e-2 * np.ptp(tmpl))


def test_template_init_max_frames_cap(rng):
    """None = all frames (reference behavior); an integer caps the
    seeding reads."""
    from dnmf_tpu.registration.motion_correct import _streamed_bin_median

    tmpl = _template(rng, (16, 16))
    video = np.stack([tmpl + 0.01 * i for i in range(40)])
    full = np.asarray(_streamed_bin_median(video))
    capped = np.asarray(_streamed_bin_median(video, max_frames=20))
    ref_full = np.asarray(_streamed_bin_median(video, max_frames=40))
    np.testing.assert_allclose(full, ref_full, atol=1e-6)
    assert not np.allclose(full, capped)


def test_rigid_template_iteration_without_template(rng):
    tmpl = _template(rng)
    true = [(1, 0), (0, 1), (-1, 0), (0, -1), (2, 1), (-2, -1)]
    video = _rolled_video(tmpl, true)
    cfg = RegistrationConfig(max_shifts=(4, 4), niter_rig=2, splits=2,
                             border_nan=False)
    mc = MotionCorrect(video, cfg).motion_correct()
    rec = np.asarray(mc.shifts_rig)
    # Shifts recovered up to a common offset (self-built template).
    centered = rec - rec.mean(0)
    true_arr = -np.asarray(true, dtype=float)
    np.testing.assert_allclose(centered, true_arr - true_arr.mean(0),
                               atol=0.3)


def test_rigid_3d(rng):
    tmpl = _template(rng, (32, 32, 8))
    true = [(0, 0, 0), (2, -1, 1), (-2, 2, -1), (1, 0, 0)]
    video = _rolled_video(tmpl, true)
    mc = MotionCorrect(
        video, RegistrationConfig(max_shifts=(4, 4, 2), border_nan=False)
    ).motion_correct(template=jnp.asarray(tmpl))
    rec = np.asarray(mc.shifts_rig)
    np.testing.assert_allclose(rec, -np.asarray(true, dtype=float),
                               atol=0.2)


def test_patch_grid_geometry():
    starts, grid_shape, window = patch_grid((64, 64), (8, 8), (24, 24))
    assert window == (32, 32)
    assert grid_shape == (3, 3)
    assert starts.shape == (9, 2)
    assert starts[-1].tolist() == [32, 32]


def test_tile_and_correct_uniform_shift_matches_rigid(rng):
    tmpl = _template(rng)
    img = np.roll(tmpl, (2, -1), axis=(0, 1))
    corrected, shifts = tile_and_correct(
        jnp.asarray(img), jnp.asarray(tmpl), (24, 24), (8, 8), (5, 5),
        max_deviation_rigid=2, use_remap=True, border_nan=False,
    )
    # Small smooth patches carry real FFT boundary effects (crops are not
    # circular shifts), so per-patch estimates scatter around the truth.
    s = np.asarray(shifts)
    np.testing.assert_allclose(s.mean(0), [-2.0, 1.0], atol=0.8)
    np.testing.assert_allclose(s, np.tile([-2.0, 1.0], (9, 1)), atol=1.6)
    c = np.asarray(corrected)
    assert np.abs(c[6:-6, 6:-6] - tmpl[6:-6, 6:-6]).max() < 0.15


def test_tile_and_correct_dft_path(rng):
    tmpl = _template(rng)
    img = np.roll(tmpl, (2, -1), axis=(0, 1))
    corrected, shifts = tile_and_correct(
        jnp.asarray(img), jnp.asarray(tmpl), (24, 24), (8, 8), (5, 5),
        max_deviation_rigid=2, use_remap=False, border_nan=False,
    )
    s = np.asarray(shifts)
    np.testing.assert_allclose(s.mean(0), [-2.0, 1.0], atol=0.8)
    c = np.asarray(corrected)
    interior = np.isfinite(c[6:-6, 6:-6])
    assert np.abs(c[6:-6, 6:-6] - tmpl[6:-6, 6:-6])[interior].max() < 0.2


def test_pwrigid_full_pipeline_and_points(rng):
    tmpl = _template(rng, (64, 64))
    true = [(0, 0), (2, 1), (-1, 2), (1, -2)]
    video = _rolled_video(tmpl, true)
    cfg = RegistrationConfig(
        max_shifts=(4, 4), pw_rigid=True, strides=(24, 24),
        overlaps=(8, 8), max_deviation_rigid=2, border_nan=False,
    )
    mc = MotionCorrect(video, cfg).motion_correct(
        template=jnp.asarray(tmpl)
    )
    xs = np.asarray(mc.x_shifts_els)
    assert xs.shape == (4, 9)
    np.testing.assert_allclose(
        xs.mean(1), [0, -2, 1, -1], atol=0.3
    )

    # apply_shifts_points: uniform frame shift s => positions move by
    # -shift_t + shift_0 per reference convention.
    points = np.array([[20.0, 20.0], [40.0, 30.0]])
    p_t = mc.apply_shifts_points(points)
    assert p_t.shape == (2, 2, 4)
    np.testing.assert_allclose(p_t[:, :, 0], points, atol=0.3)
    # frame 1 true motion (2,1): correction shift = (-2,-1), so
    # p_t = points - (-2) + 0 = points + 2 in x.
    np.testing.assert_allclose(
        p_t[0, :, 1], points[0] + np.array([2.0, 1.0]), atol=0.5
    )


def test_high_pass_filter_zero_mean_kernel(rng):
    from dnmf_tpu.registration import high_pass_filter_space

    img = rng.normal(size=(32, 32)).astype(np.float32)
    out = np.asarray(high_pass_filter_space(jnp.asarray(img), (3, 3)))
    assert out.shape == (32, 32)
    # High-pass: removes the DC component of smooth regions.
    flat = np.ones((32, 32), dtype=np.float32) * 5.0
    out_flat = np.asarray(
        high_pass_filter_space(jnp.asarray(flat), (3, 3))
    )
    np.testing.assert_allclose(out_flat, 0.0, atol=1e-4)


def test_pwrigid_3d_default_2d_config(rng):
    """3-D video with a 2-length strides config must not crash (geometry
    pads to one full-depth z patch)."""
    tmpl = _template(rng, (32, 32, 4))
    video = _rolled_video(tmpl, [(0, 0, 0), (2, -1, 0), (-1, 2, 1)])
    cfg = RegistrationConfig(max_shifts=(4, 4, 1), pw_rigid=True,
                             strides=(16, 16), overlaps=(4, 4),
                             max_deviation_rigid=2, border_nan=False)
    mc = MotionCorrect(video, cfg).motion_correct(template=jnp.asarray(tmpl))
    xs = np.asarray(mc.x_shifts_els)
    assert xs.shape[0] == 3
    np.testing.assert_allclose(xs.mean(1), [0, -2, 1], atol=0.5)


def test_patch_grid_window_clamped_to_axis():
    starts, grid_shape, window = patch_grid((12, 64), (8, 8), (8, 24))
    # First axis: window 16 > 12 -> single full-axis patch of width 12.
    assert window[0] == 12
    assert grid_shape[0] == 1
    assert all(s >= 0 for s in starts[:, 0])


def test_pwrigid_with_gsig_filter(rng):
    """1p high-pass filtering in the pw-rigid path: registration runs on
    filtered frames, shifts apply to raw frames."""
    tmpl = _template(rng, (64, 64))
    # Add a low-frequency background gradient that the filter removes.
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    bg = 0.5 * (xx / 64.0)
    true = [(0, 0), (2, 1), (-1, 2)]
    video = np.stack(
        [np.roll(tmpl, s, axis=(0, 1)) + bg for s in true]
    ).astype(np.float32)
    cfg = RegistrationConfig(
        max_shifts=(4, 4), pw_rigid=True, strides=(24, 24),
        overlaps=(8, 8), max_deviation_rigid=2, border_nan=False,
        gSig_filt=(3, 3),
    )
    mc = MotionCorrect(video, cfg).motion_correct(
        template=jnp.asarray(tmpl + bg)
    )
    xs = np.asarray(mc.x_shifts_els)
    np.testing.assert_allclose(xs.mean(1), [0, -2, 1], atol=0.6)


def test_high_pass_filter_preserves_shape(rng):
    from dnmf_tpu.registration import high_pass_filter_space

    img = rng.normal(size=(32, 40)).astype(np.float32)
    out = np.asarray(high_pass_filter_space(jnp.asarray(img), (2, 4)))
    assert out.shape == (32, 40)
    with pytest.raises(ValueError):
        high_pass_filter_space(jnp.zeros((8, 8, 4)), (2, 2))


# ----------------------------------------------------------------------
# Streamed batch drivers (round-2: bounded device memory, shifts-only,
# num_splits_to_process)
# ----------------------------------------------------------------------
def test_streamed_blocks_match_single_block(rng):
    """frame_block streaming is numerically identical to one big block,
    rigid and pw-rigid (the unchanged-output gate for the rework)."""
    tmpl = _template(rng)
    true = [(0, 0), (2, -1), (-3, 2), (1, 3), (-2, -2), (3, 0), (1, 1)]
    video = _rolled_video(tmpl, true)

    big = RegistrationConfig(max_shifts=(5, 5), pw_rigid=False, splits=1,
                             border_nan=False, frame_block=64)
    small = RegistrationConfig(max_shifts=(5, 5), pw_rigid=False,
                               splits=2, border_nan=False, frame_block=2)
    mc_big = MotionCorrect(video, big).motion_correct(
        template=jnp.asarray(tmpl))
    mc_small = MotionCorrect(video, small).motion_correct(
        template=jnp.asarray(tmpl))
    np.testing.assert_allclose(np.asarray(mc_small.shifts_rig),
                               np.asarray(mc_big.shifts_rig), atol=1e-5)
    np.testing.assert_allclose(mc_small.mc[0], mc_big.mc[0], atol=1e-4)

    big_pw = RegistrationConfig(
        max_shifts=(5, 5), pw_rigid=True, splits=1, border_nan=False,
        strides=(24, 24), overlaps=(8, 8), frame_block=64,
    )
    small_pw = RegistrationConfig(
        max_shifts=(5, 5), pw_rigid=True, splits=2, border_nan=False,
        strides=(24, 24), overlaps=(8, 8), frame_block=3,
    )
    mc_bp = MotionCorrect(video, big_pw).motion_correct(
        template=jnp.asarray(tmpl))
    mc_sp = MotionCorrect(video, small_pw).motion_correct(
        template=jnp.asarray(tmpl))
    np.testing.assert_allclose(np.asarray(mc_sp.x_shifts_els),
                               np.asarray(mc_bp.x_shifts_els), atol=1e-5)
    np.testing.assert_allclose(mc_sp.mc_els[0], mc_bp.mc_els[0],
                               atol=1e-4)


def test_shifts_only_mode(rng):
    """return_mc=False keeps shifts/templates but no corrected movie —
    memory does not scale with T."""
    tmpl = _template(rng)
    true = [(1, 0), (0, 2), (-1, 1), (2, -2)]
    video = _rolled_video(tmpl, true)
    cfg = RegistrationConfig(max_shifts=(4, 4), pw_rigid=False,
                             border_nan=False, return_mc=False,
                             frame_block=2)
    mc = MotionCorrect(video, cfg).motion_correct(
        template=jnp.asarray(tmpl))
    assert mc.mc == [None]
    np.testing.assert_allclose(np.asarray(mc.shifts_rig),
                               -np.asarray(true, dtype=float), atol=0.15)
    assert mc.border_to_0 == 2


def test_num_splits_to_process_subset_iterations(rng):
    """Template iterations run on a chunk subset; the final iteration
    still yields complete per-frame shifts."""
    tmpl = _template(rng)
    true = [(i % 3 - 1, (i + 1) % 3 - 1) for i in range(12)]
    video = _rolled_video(tmpl, true)
    cfg = RegistrationConfig(max_shifts=(4, 4), pw_rigid=False,
                             niter_rig=3, splits=4,
                             num_splits_to_process=2, border_nan=False,
                             frame_block=3)
    mc = MotionCorrect(video, cfg).motion_correct()
    rec = np.asarray(mc.shifts_rig)
    assert rec.shape == (12, 2)  # complete despite subset iterations
    centered = rec - rec.mean(0)
    true_arr = -np.asarray(true, dtype=float)
    np.testing.assert_allclose(centered, true_arr - true_arr.mean(0),
                               atol=0.3)


def test_memmap_video_registration(rng, tmp_path):
    """A disk-memmapped video registers without being materialized."""
    tmpl = _template(rng, (32, 32))
    true = [(1, 0), (0, 1), (-1, -1), (2, 0), (0, -2), (1, 1)]
    video = _rolled_video(tmpl, true)
    path = tmp_path / "reg.raw"
    mm = np.memmap(path, dtype=np.float32, mode="w+", shape=video.shape)
    mm[:] = video
    mm.flush()
    ro = np.memmap(path, dtype=np.float32, mode="r", shape=video.shape)
    cfg = RegistrationConfig(max_shifts=(4, 4), pw_rigid=False,
                             border_nan=False, frame_block=2,
                             return_mc=False)
    mc = MotionCorrect(ro, cfg).motion_correct(template=jnp.asarray(tmpl))
    assert isinstance(mc.video[0], np.memmap)
    np.testing.assert_allclose(np.asarray(mc.shifts_rig),
                               -np.asarray(true, dtype=float), atol=0.2)


def test_tile_and_correct_separable_matches_exact(rng):
    """remap_mode="separable" reproduces the exact gather remap within
    its documented sub-0.1 px positional tolerance (same shifts)."""
    from dnmf_tpu.registration.motion_correct import tile_and_correct

    m, n = 48, 40
    xs = np.arange(m)[:, None]
    ys = np.arange(n)[None, :]
    template = (np.sin(0.3 * xs) * np.cos(0.2 * ys)).astype(np.float32)
    img = np.roll(np.roll(template, 2, axis=0), -1, axis=1)
    kw = dict(strides=(24, 24), overlaps=(8, 8), max_shifts=(4, 4),
              max_deviation_rigid=2, use_remap=True, border_nan=True)
    c_exact, s_exact = tile_and_correct(
        jnp.asarray(img), jnp.asarray(template), remap_mode="exact", **kw
    )
    c_sep, s_sep = tile_and_correct(
        jnp.asarray(img), jnp.asarray(template), remap_mode="separable",
        **kw
    )
    np.testing.assert_allclose(np.asarray(s_sep), np.asarray(s_exact),
                               atol=1e-6)
    interior = (slice(6, -6), slice(6, -6))
    np.testing.assert_allclose(
        np.asarray(c_sep)[interior], np.asarray(c_exact)[interior],
        atol=0.06,
    )


def test_split_rig_els_config(rng):
    """Per-phase chunking knobs (reference splits_rig/splits_els +
    num_splits_to_process_rig/els, /root/reference/Demix/
    MotionCorrect.py:95-111) resolve independently and are reported by
    get_params."""
    cfg = RegistrationConfig(splits=3, splits_els=2,
                             num_splits_to_process=2,
                             num_splits_to_process_rig=1)
    assert cfg.resolved_splits("rig") == 3       # falls back to shared
    assert cfg.resolved_splits("els") == 2       # per-phase override
    assert cfg.resolved_num_splits_to_process("rig") == 1
    assert cfg.resolved_num_splits_to_process("els") == 2

    tmpl = _template(rng)
    true = [(i % 3 - 1, (i + 1) % 3 - 1) for i in range(8)]
    video = _rolled_video(tmpl, true)
    run_cfg = RegistrationConfig(
        max_shifts=(4, 4), pw_rigid=True, strides=(20, 20),
        overlaps=(8, 8), splits_rig=2, splits_els=4, border_nan=False,
        frame_block=4,
    )
    mc = MotionCorrect(video, run_cfg).motion_correct()
    params = mc.get_params()
    assert params["splits_rig"] == 2
    assert params["splits_els"] == 4
    assert len(mc.x_shifts_els) == 8  # complete despite differing chunking


def test_min_mov_full_movie(rng):
    """min_mov is the min over the WHOLE movie (reference
    video[0].min(), MotionCorrect.py:193-195), not a frame prefix; with
    gSig_filt set the offset is skipped (0.0)."""
    tmpl = _template(rng)
    video = _rolled_video(tmpl, [(0, 0)] * 6)
    video = video - video.min() + 1.0
    video[-1, 3, 3] = -7.5  # global min lives in the LAST frame
    cfg = RegistrationConfig(max_shifts=(3, 3), border_nan=False)
    mc = MotionCorrect(video, cfg).motion_correct()
    assert mc.min_mov == -7.5

    cfg_filt = RegistrationConfig(max_shifts=(3, 3), border_nan=False,
                                  gSig_filt=(2, 2))
    mc2 = MotionCorrect(video, cfg_filt).motion_correct()
    assert mc2.min_mov == 0.0


def test_rigid_decimate_bounds_match(rng):
    """Decimated global rigid pre-estimate: patch shifts stay within
    ~0.3 px of the full-resolution path's."""
    tmpl = _template(rng, shape=(64, 64))
    true = [(3, -2), (-4, 1), (0, 5), (2, 2)]
    video = _rolled_video(tmpl, true)
    common = dict(max_shifts=(6, 6), pw_rigid=True, strides=(32, 32),
                  overlaps=(16, 16), border_nan=False, frame_block=2)
    full = MotionCorrect(video, RegistrationConfig(**common)
                         ).motion_correct()
    dec = MotionCorrect(video, RegistrationConfig(rigid_decimate=2,
                                                  **common)
                        ).motion_correct()
    np.testing.assert_allclose(np.asarray(dec.x_shifts_els),
                               np.asarray(full.x_shifts_els), atol=0.3)
    np.testing.assert_allclose(np.asarray(dec.y_shifts_els),
                               np.asarray(full.y_shifts_els), atol=0.3)


def test_rigid_decimate_4_reaches_positive_max_shifts(rng):
    """Regression: the decimated pre-estimate must use a symmetric
    integer window.  With the reference-parity asymmetric [-m, m-1]
    window, the d-x rescale cost d px of positive range — at d=4 /
    max_shifts=6 every positive shift >= ~3 px saturated at ~2.8,
    systematically under-correcting those frames."""
    from dnmf_tpu.registration.motion_correct import _rigid_estimate

    tmpl = _template(rng, shape=(96, 96))
    for true in ((5.0, -5.0), (-5.0, 5.0)):
        img = jnp.roll(tmpl, (int(true[0]), int(true[1])), axis=(0, 1))
        for dec in (2, 4):
            est = np.asarray(_rigid_estimate(
                img, tmpl, (6.0, 6.0), 10, dec))
            np.testing.assert_allclose(est, true, atol=0.75)
            # Downstream warp-base precondition.
            assert np.all(np.abs(est) <= 7.0)


def test_tile_and_correct_block_fused_matches_vmapped(rng):
    """The fused-Pallas block path (interpret mode on CPU) matches
    vmap(tile_and_correct) — shifts to subpixel-grid tolerance, frames
    to interpolation tolerance."""
    from dnmf_tpu.registration.motion_correct import (
        tile_and_correct_block,
    )

    m, n, z = 32, 32, 4
    tmpl3 = gaussian_filter(
        rng.normal(size=(m, n, z)), (2.0, 2.0, 0.5)
    ).astype(np.float32)
    video = np.stack([
        np.roll(tmpl3, (2, -1, 1), axis=(0, 1, 2)),
        np.roll(tmpl3, (-1, 2, 0), axis=(0, 1, 2)),
        np.roll(tmpl3, (0, -2, -1), axis=(0, 1, 2)),
    ]).astype(np.float32)
    kw = dict(strides=(16, 16, 4), overlaps=(8, 8, 0),
              max_shifts=(4, 4, 2), max_deviation_rigid=2,
              use_remap=True, remap_mode="separable", border_nan=True)
    c_ref, s_ref = tile_and_correct_block(
        jnp.asarray(video), jnp.asarray(tmpl3), phasecorr_impl="xla",
        **kw
    )
    c_fused, s_fused = tile_and_correct_block(
        jnp.asarray(video), jnp.asarray(tmpl3), phasecorr_impl="fused",
        **kw
    )
    # Integer-peak agreement is exact; subpixel refinement runs the same
    # code on spectra that differ only by DFT-precision rounding.
    np.testing.assert_allclose(np.asarray(s_fused), np.asarray(s_ref),
                               atol=0.11)
    np.testing.assert_allclose(np.asarray(c_fused), np.asarray(c_ref),
                               atol=0.05)


def test_tile_and_correct_block_fused_remap_matches_separable(rng):
    """remap_mode="fused" (the Pallas warp kernel, interpret mode on
    CPU) must match remap_mode="separable" exactly given identical
    shift estimates (same fused phase-correlation path)."""
    from dnmf_tpu.registration.motion_correct import (
        tile_and_correct_block,
    )

    m, n, z = 32, 32, 4
    tmpl3 = gaussian_filter(
        rng.normal(size=(m, n, z)), (2.0, 2.0, 0.5)
    ).astype(np.float32)
    video = np.stack([
        np.roll(tmpl3, (2, -1, 1), axis=(0, 1, 2)),
        np.roll(tmpl3, (-1, 2, 0), axis=(0, 1, 2)),
    ]).astype(np.float32)
    kw = dict(strides=(16, 16, 4), overlaps=(8, 8, 0),
              max_shifts=(4, 4, 2), max_deviation_rigid=2,
              use_remap=True, border_nan=True,
              phasecorr_impl="fused")
    c_sep, s_sep = tile_and_correct_block(
        jnp.asarray(video), jnp.asarray(tmpl3),
        remap_mode="separable", **kw
    )
    c_fus, s_fus = tile_and_correct_block(
        jnp.asarray(video), jnp.asarray(tmpl3),
        remap_mode="fused", **kw
    )
    np.testing.assert_allclose(np.asarray(s_fus), np.asarray(s_sep),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_fus), np.asarray(c_sep),
                               rtol=1e-4, atol=1e-5)


def test_tile_and_correct_block_xla_matches_per_frame(rng):
    """phasecorr_impl="xla" block path is exactly vmapped
    tile_and_correct."""
    from dnmf_tpu.registration.motion_correct import (
        tile_and_correct_block,
    )

    tmpl = _template(rng, (40, 40))
    video = _rolled_video(tmpl, [(2, -1), (-1, 2)])
    kw = dict(strides=(24, 24), overlaps=(8, 8), max_shifts=(4, 4),
              max_deviation_rigid=2, use_remap=True,
              remap_mode="separable", border_nan=True)
    c_blk, s_blk = tile_and_correct_block(
        jnp.asarray(video), jnp.asarray(tmpl), phasecorr_impl="xla",
        **kw
    )
    for i in range(2):
        c1, s1 = tile_and_correct(
            jnp.asarray(video[i]), jnp.asarray(tmpl), **kw
        )
        np.testing.assert_allclose(np.asarray(s_blk[i]), np.asarray(s1),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(c_blk[i]), np.asarray(c1),
                                   atol=1e-6)


def test_niter_els_independent_of_niter_rig(rng, monkeypatch):
    """The elastic phase runs ``niter_els`` template iterations (default
    1, matching the reference's pinned ``num_iter = 1``,
    /root/reference/Demix/MotionCorrect.py:284) — ``niter_rig > 1`` must
    NOT silently iterate the elastic template too."""
    from dnmf_tpu.registration import motion_correct as mc_mod

    calls = {"rig": 0, "els": 0}
    orig = mc_mod._iteration_chunks

    def counting(chunks, cfg, is_last, phase):
        calls[phase] += 1
        return orig(chunks, cfg, is_last, phase=phase)

    monkeypatch.setattr(mc_mod, "_iteration_chunks", counting)
    tmpl = _template(rng, (48, 48))
    video = _rolled_video(tmpl, [(1, 0), (0, 1), (-1, 0)])
    cfg = RegistrationConfig(
        max_shifts=(4, 4), pw_rigid=True, niter_rig=3,
        strides=(24, 24), overlaps=(8, 8), max_deviation_rigid=2,
        border_nan=False,
    )
    MotionCorrect(video, cfg).motion_correct()
    assert calls["rig"] == 3   # rigid phase honors niter_rig
    assert calls["els"] == 1   # elastic phase pinned to niter_els=1

    calls = {"rig": 0, "els": 0}
    cfg2 = RegistrationConfig(
        max_shifts=(4, 4), pw_rigid=True, niter_rig=1, niter_els=2,
        strides=(24, 24), overlaps=(8, 8), max_deviation_rigid=2,
        border_nan=False,
    )
    MotionCorrect(video, cfg2).motion_correct(template=jnp.asarray(tmpl))
    assert calls["els"] == 2


def test_template_points_to_frame0_gauge(rng):
    """Peaks detected on the registration template live in TEMPLATE
    space, which differs from the frame-0 coordinates
    ``apply_shifts_points`` expects (reference contract ``:351-371``,
    ``P_T[0] == points``) by the frame-0 correction;
    ``template_points_to_frame0`` removes that constant bias."""
    tmpl = _template(rng)
    mm, nn = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    blob = 5.0 * np.exp(-((mm - 30.0) ** 2 + (nn - 40.0) ** 2)
                        / (2 * 2.0 ** 2)).astype(np.float32)
    base = tmpl + blob  # bright neuron at (30, 40)
    # Ramp STARTING AT A NONZERO shift: the self-built template's gauge
    # (~median position) then differs from frame 0 by several pixels.
    true = [(4, -3), (3, -2), (2, -1), (1, 0), (0, 1), (-1, 2),
            (-2, 3), (-3, 4)]
    video = _rolled_video(base, true)
    frame0_pos = np.array([30.0 + 4, 40.0 - 3])

    from dnmf_tpu.engine.pipeline import detect_peaks

    for pw in (False, True):
        cfg = RegistrationConfig(
            max_shifts=(6, 6), pw_rigid=pw, splits=2,
            strides=(32, 32), overlaps=(8, 8), border_nan=False)
        mc = MotionCorrect(video, cfg).motion_correct()
        template = np.asarray(mc.total_template_els if pw
                              else mc.total_template_rig)
        peaks = detect_peaks(template, 1)
        bias = np.linalg.norm(peaks[0] - frame0_pos)
        assert bias > 2.0, (pw, peaks, frame0_pos)  # gauge gap is real
        p0 = mc.template_points_to_frame0(peaks)
        err = np.linalg.norm(p0[0] - frame0_pos)
        assert err <= 1.0, (pw, p0, frame0_pos, err)
