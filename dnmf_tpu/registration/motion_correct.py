"""Rigid & piecewise-rigid motion correction (2-D and 3-D).

TPU-native rebuild of the reference's NoRMCorre-style registration
(``/root/reference/Demix/MotionCorrect.py``):

* Rigid: FFT phase correlation per frame against a template, subpixel
  matrix-DFT refinement, Fourier shift application — vmapped over frames
  and streamed in frame blocks (replacing the reference's
  ipyparallel/multiprocessing chunk map, ``:2062-2120``).
* Piecewise-rigid (``tile_and_correct``/``tile_and_correct_3d``,
  ``:1272-1767``): static patch grid (strides + overlaps), per-patch
  registration bounded by ``max_deviation_rigid`` around the rigid
  estimate, shift-field upsampling, and either
  - ``remap``: interpolated dense shift field + resampling (the
    reference's ``shifts_opencv`` fast path; interpolation here is
    trilinear vs cv2's cubic) — ``remap_mode`` picks exact gather-based
    sampling or the gather-free separable form (TPU-fast; see
    ``tile_and_correct``), or
  - DFT: per-patch Fourier shifts + feathered blending, with the
    reference's shear guard (blend weights switch to hard patch
    ownership when the 75th-percentile shift-field shear >= 0.5 px,
    ``:1444-1498``) expressed as a weight-stack select so both branches
    compile statically.
* Template iteration: register chunks -> per-chunk mean template ->
  median consensus (``motion_correct_batch_rigid`` ``:1770-1878``,
  ``_pwrigid`` ``:1880-2000``).
* ``apply_shifts_points`` (``:351-371``): nearest-patch-center lookup
  propagating per-patch shifts onto neuron coordinates — the bridge that
  seeds dNMF positions from registration output (sign conventions per
  axis preserved exactly, including the reference's opposite z sign).

Videos are time-major ``[T, ...spatial]``.
"""

from __future__ import annotations

import functools
import itertools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dnmf_tpu.config import RegistrationConfig
from dnmf_tpu.ops import fft_reg


# ----------------------------------------------------------------------
# Patch geometry (static)
# ----------------------------------------------------------------------
def _axis_starts(dim: int, window: int, stride: int) -> List[int]:
    """Patch start offsets along one axis: strided + one flush-end patch
    (reference ``sliding_window`` ranges, ``:1180-1188``)."""
    if window >= dim:
        # One patch covering the whole axis (a negative flush-end start
        # would silently extract wrong-shaped patches via Python slicing).
        return [0]
    starts = list(range(0, dim - window, stride))
    starts.append(dim - window)
    return starts


def patch_grid(dims, overlaps, strides):
    """Static patch geometry.

    Returns ``(starts [n_patches, nd] int array, grid_shape tuple,
    window tuple)``.  Windows are clamped to the axis length.
    """
    window = tuple(min(o + s, d)
                   for o, s, d in zip(overlaps, strides, dims))
    axes = [
        _axis_starts(d, w, s) for d, w, s in zip(dims, window, strides)
    ]
    grid_shape = tuple(len(a) for a in axes)
    starts = np.array(list(itertools.product(*axes)), dtype=np.int32)
    return starts, grid_shape, window


def _extract_patches(img: jnp.ndarray, starts: np.ndarray, window):
    """``[n_patches, *window]`` stack of patches.

    vmapped ``dynamic_slice`` over the start array — compile time is
    O(1) in patch count (a Python slice-stack loop makes XLA program
    size, and compile time, scale with the grid; NOTES r1 #3)."""
    starts_arr = jnp.asarray(starts, dtype=jnp.int32)

    def one(s):
        return jax.lax.dynamic_slice(
            img, tuple(s[d] for d in range(len(window))), window
        )

    return jax.vmap(one)(starts_arr)


def _blend_patches(patches, weights, starts, window, dims):
    """Feather-blend shifted patches back into a volume.

    ``lax.scan`` of dynamic read-modify-write slices over the patch axis
    (replaces the unrolled ``at[].add`` loop — one compiled body for any
    grid density).  NaNs in a patch (DFT border policy) are excluded
    from both numerator and weight mass.

    Returns the blended image with NaNs where no patch contributed.
    """
    valid = (~jnp.isnan(patches)).astype(jnp.float32)
    patches = jnp.nan_to_num(patches, nan=0.0)
    starts_arr = jnp.asarray(starts, dtype=jnp.int32)

    def body(carry, xs):
        num, den = carry
        patch, w, v, s = xs
        idx = tuple(s[d] for d in range(len(window)))
        cur_n = jax.lax.dynamic_slice(num, idx, window)
        cur_d = jax.lax.dynamic_slice(den, idx, window)
        num = jax.lax.dynamic_update_slice(num, cur_n + patch * w * v, idx)
        den = jax.lax.dynamic_update_slice(den, cur_d + w * v, idx)
        return (num, den), None

    zeros = jnp.zeros(dims, dtype=jnp.float32)
    (num, den), _ = jax.lax.scan(
        body, (zeros, zeros), (patches, weights, valid, starts_arr)
    )
    blended = num / jnp.where(den > 0, den, 1.0)
    return jnp.where(den > 0, blended, jnp.nan)


def _feather_weights(window, overlaps, grid_pos, grid_shape) -> np.ndarray:
    """Linear feathering of patch overlaps (reference
    ``create_weight_matrix_for_blending``, ``:1226-1260``, extended to 3-D)."""
    w = np.ones(window, dtype=np.float32)
    for ax, (win, ov, pos, g) in enumerate(
        zip(window, overlaps, grid_pos, grid_shape)
    ):
        prof = np.ones(win, dtype=np.float32)
        if ov > 0:
            if pos > 0:
                prof[:ov] = np.minimum(prof[:ov], np.linspace(0, 1, ov))
            if pos < g - 1:
                prof[-ov:] = np.minimum(prof[-ov:], np.linspace(1, 0, ov))
        shape = [1] * len(window)
        shape[ax] = win
        w = w * prof.reshape(shape)
    return w


def _ownership_weights(window, overlaps, grid_pos, grid_shape) -> np.ndarray:
    """Hard-stitch weights: each patch owns its interior half-overlap
    region (the reference's ``max_shear >= 0.5`` branch, ``:1480-1498``)."""
    w = np.ones(window, dtype=np.float32)
    for ax, (win, ov, pos, g) in enumerate(
        zip(window, overlaps, grid_pos, grid_shape)
    ):
        prof = np.ones(win, dtype=np.float32)
        half = ov // 2
        if ov > 0:
            if pos > 0:
                prof[:half] = 0.0
            if pos < g - 1:
                prof[win - (ov - half):] = 0.0
        shape = [1] * len(window)
        shape[ax] = win
        w = w * prof.reshape(shape)
    return w


# ----------------------------------------------------------------------
# 1p high-pass filter
# ----------------------------------------------------------------------
def _gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel-compatible 1-D kernel."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def high_pass_filter_space(img: jnp.ndarray, gSig_filt) -> jnp.ndarray:
    """Mean-subtracted Gaussian kernel filtering for 1p data
    (reference ``high_pass_filter_space``, ``:1262-1270``).

    The kernel is square, built from ``gSig_filt[0]`` only — exactly the
    reference's ``ker.dot(ker.T)``; 2-D images only (the reference's 1p
    path is 2-D)."""
    if img.ndim != 2:
        raise ValueError("gSig_filt high-pass filtering is 2-D only "
                         f"(got {img.ndim}-D frame)")
    ksize = (3 * gSig_filt[0]) // 2 * 2 + 1
    ker1 = _gaussian_kernel_1d(ksize, gSig_filt[0])
    ker2d = np.outer(ker1, ker1)
    peak_col = ker2d[:, 0].max()
    nz = ker2d >= peak_col
    ker2d = ker2d.copy()
    ker2d[nz] -= ker2d[nz].mean()
    ker2d[~nz] = 0.0
    pad = ksize // 2
    img_p = jnp.pad(img, ((pad, pad), (pad, pad)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        img_p[None, None].astype(jnp.float32),
        jnp.asarray(ker2d)[None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


def _rigid_estimate(reg_img, template, max_shifts, upsample_factor_fft,
                    rigid_decimate):
    """Global rigid shift of one frame (bounds the per-patch search)."""
    nd = reg_img.ndim
    if rigid_decimate > 1:
        # The global rigid estimate only bounds the per-patch search
        # (lb/ub below); a 2x/4x anti-aliased downsample in x/y keeps
        # ~0.1-0.2 px accuracy — far inside max_deviation_rigid — at
        # 1/d^2 the FFT cost (the full-frame FFT otherwise rivals the
        # entire patch stack).
        d = int(rigid_decimate)

        def pool(x):
            m, n = x.shape[0] // d, x.shape[1] // d
            rest = x.shape[2:]
            return x[:m * d, :n * d].reshape(
                (m, d, n, d) + rest).mean(axis=(1, 3))

        dec_ms = tuple(max(1.0, float(ms) / d)
                       for ms in max_shifts[:2]) + tuple(max_shifts[2:])
        # Symmetric integer window [-m, m], NOT the reference-parity
        # asymmetric [-m, m-1] that max_shifts= would apply: after the
        # d-x rescale that "-1" would cost d px of positive range
        # (at d=4/max_shifts=6 every positive shift >= ~3 px saturated
        # at ~2.8).  The decimated pre-estimate is our own lever with
        # no reference analog, so symmetry is free; the clamp restores
        # the |rigid| <= ceil(max_shifts)+1 bound downstream consumers
        # (fused/separable warp bases) rely on, which the subpixel
        # overshoot (+-0.75 decimated px -> +-0.75*d full-res) could
        # otherwise exceed.
        rigid_dec, _, _ = fft_reg.phase_cross_correlation(
            pool(reg_img), pool(template),
            upsample_factor=upsample_factor_fft,
            shifts_lb=jnp.asarray([-m for m in dec_ms]),
            shifts_ub=jnp.asarray([m + 1.0 for m in dec_ms]),
        )
        scale = jnp.asarray((float(d), float(d)) + (1.0,) * (nd - 2))
        bound = jnp.asarray([float(np.ceil(ms)) + 1.0
                             for ms in max_shifts])
        return jnp.clip(rigid_dec * scale, -bound, bound)
    rigid_shts, _, _ = fft_reg.phase_cross_correlation(
        reg_img, template, upsample_factor=upsample_factor_fft,
        max_shifts=max_shifts,
    )
    return rigid_shts


def _apply_remap_field(img, rigid_shts, patch_shifts, grid_shape,
                       remap_mode, max_shifts, max_deviation_rigid):
    """Upsample the patch shift field and resample one frame at
    ``x + shift(x)`` (the reference's ``shifts_opencv`` remap path)."""
    dims = img.shape
    nd = len(dims)
    # Dense interpolated shift field; sample img at x + shift(x).
    fields = [
        _upsample_field(patch_shifts[:, d], grid_shape, dims)
        for d in range(nd)
    ]
    dims3 = dims if nd == 3 else dims + (1,)
    vol = img.reshape(dims3)
    if remap_mode == "separable":
        from dnmf_tpu.ops.resample import separable_warp

        # The field deviates at most max_deviation_rigid (+0.75
        # subpixel + cubic-upsample overshoot < 0.5) from the rigid
        # shift, so warp relative to the traced rigid base: the
        # offset loop covers only the residual range instead of
        # max_shifts + deviation (28 -> 12 passes/axis at defaults).
        rb = int(max_deviation_rigid) + 2
        bound = (rb,) * nd + ((0,) if nd == 2 else ())
        base = jnp.concatenate(
            [rigid_shts, jnp.zeros((3 - nd,))]
        ) if nd == 2 else rigid_shts
        base_bound = tuple(
            int(np.ceil(ms)) + 1 for ms in max_shifts[:nd]
        ) + ((0,) if nd == 2 else ())
        shifts4 = jnp.stack(
            [f.reshape(dims3) for f in fields]
            + ([jnp.zeros(dims3)] if nd == 2 else []),
            axis=-1,
        )
        corrected = separable_warp(vol, shifts4, bound, base=base,
                                   base_bound=base_bound)
    elif remap_mode == "exact":
        from dnmf_tpu.ops.basis import voxel_grid
        from dnmf_tpu.ops.resample import trilinear_resample

        grid = voxel_grid(dims3)
        shift_flat = jnp.stack(
            [f.reshape(-1) for f in fields]
            + ([jnp.zeros(grid.shape[0])] if nd == 2 else []),
            axis=-1,
        )
        coords = grid + shift_flat
        corrected = trilinear_resample(vol, coords, padding="edge")
    else:
        raise ValueError(f"unknown remap_mode: {remap_mode!r}")
    return corrected.reshape(dims)


# ----------------------------------------------------------------------
# Per-frame correction
# ----------------------------------------------------------------------
@functools.partial(
    jax.jit,
    static_argnames=("max_shifts", "upsample_factor", "border_nan",
                     "apply_mode"),
)
def rigid_correct_frames(
    frames: jnp.ndarray,
    template: jnp.ndarray,
    max_shifts,
    upsample_factor: int = 10,
    border_nan=True,
    add_to_movie: float = 0.0,
    apply_mode: str = "fourier",
):
    """Rigid-register a block of frames against a template.

    Args:
      frames: ``[B, ...spatial]``.
      apply_mode: ``"fourier"`` (phase-ramp apply, the default) or
        ``"cubic"`` (separable Keys cubic convolution — the spatial-
        domain analog of the reference's ``apply_shift_iteration``
        cv2.warpAffine INTER_CUBIC path with border-min fill,
        ``/root/reference/Demix/MotionCorrect.py:387-426``; forces the
        "min" border policy like the reference does).

    Returns:
      ``(corrected [B, ...], shifts [B, nd])`` — ``shifts`` is the
      *correction applied* (the reference's reported ``-rigid_shts``).
    """
    if apply_mode not in ("fourier", "cubic"):
        raise ValueError(f"unknown apply_mode: {apply_mode!r}")
    template = template + add_to_movie
    real_shape = frames.shape[1:]
    # Template transform once per block, not once per vmapped frame,
    # with the impl phase_cross_correlation will auto-pick for these
    # dims (matrix-DFT for patch-sized frames, rfft beyond).
    matmul_dft = max(real_shape) <= fft_reg.MATMUL_DFT_MAX
    if matmul_dft:
        tf32 = template.astype(jnp.float32)
        template_freq = (
            fft_reg.matrix_dft3_mzn(tf32) if len(real_shape) == 3
            else fft_reg.matrix_dftn(tf32)
        )
    else:
        template_freq = jnp.fft.rfftn(template.astype(jnp.float32))

    def one(frame):
        frame = frame + add_to_movie
        shifts, src_freq, phasediff = fft_reg.phase_cross_correlation(
            frame, template_freq, upsample_factor=upsample_factor,
            max_shifts=max_shifts, target_is_freq=True,
        )
        if apply_mode == "cubic":
            corrected = fft_reg.apply_shifts_cubic(
                frame, -shifts, border_nan="min",
            )
        elif matmul_dft:
            # The matrix-DFT spectrum lives in a permuted layout; apply
            # from real space instead (one extra small rfft).
            corrected = fft_reg.apply_shifts_fourier(
                frame, -shifts, phasediff, border_nan=border_nan,
            )
        else:
            corrected = fft_reg.apply_shifts_fourier(
                src_freq, -shifts, phasediff, is_freq=True,
                border_nan=border_nan, rfft_shape=real_shape,
            )
        return corrected - add_to_movie, -shifts

    return jax.vmap(one)(frames)


def _upsample_field(field: jnp.ndarray, grid_shape, new_shape):
    """Cubic upsampling of a patch-grid shift field (reference
    ``cv2.resize(..., INTER_CUBIC)`` / ``resize_sk order=3``)."""
    field = field.reshape(grid_shape)
    if all(g == 1 for g in grid_shape):
        return jnp.broadcast_to(field, new_shape)
    return jax.image.resize(field, new_shape, method="cubic")


@functools.partial(
    jax.jit,
    static_argnames=(
        "strides", "overlaps", "max_shifts", "max_deviation_rigid",
        "upsample_factor_grid", "upsample_factor_fft", "use_remap",
        "remap_mode", "border_nan", "gSig_filt", "rigid_decimate",
    ),
)
def tile_and_correct(
    img: jnp.ndarray,
    template: jnp.ndarray,
    strides,
    overlaps,
    max_shifts,
    max_deviation_rigid: int = 3,
    upsample_factor_grid: int = 4,
    upsample_factor_fft: int = 10,
    use_remap: bool = True,
    remap_mode: str = "exact",
    border_nan=True,
    add_to_movie: float = 0.0,
    gSig_filt=None,
    rigid_decimate: int = 1,
):
    """One piecewise-rigid correction iteration for one frame (2-D or 3-D).

    With ``gSig_filt`` (1p data), registration runs on the high-pass
    filtered frame while shifts are applied to the raw frame — the
    reference's behavior (``:1335-1338,1400-1402``; like the reference,
    the DFT path rejects the combination).

    ``remap_mode`` selects how the interpolated shift field is applied
    (``use_remap=True``):

    * ``"exact"``     — gather-based trilinear (exact cv2.remap
      semantics).  TPU WARNING: XLA lowers the fractional gather to
      per-element DMAs; at 512x512x20 this costs ~750 ms/frame.
    * ``"separable"`` — three sequential 1-D hat-weighted passes over
      static offset ranges (:func:`dnmf_tpu.ops.resample.separable_warp`)
      — no gathers, ~2 orders of magnitude faster on TPU; exact for
      locally constant fields, <~0.1 px positional error for
      patch-smooth ones.

    Returns ``(corrected, patch_shifts [n_patches, nd])`` where
    ``patch_shifts`` are the applied corrections (reference
    ``total_shifts``), on the *original* patch grid.
    """
    dims = img.shape
    nd = len(dims)
    img = img + add_to_movie
    template = template + add_to_movie
    if gSig_filt is not None:
        if not use_remap:
            raise ValueError(
                "gSig_filt with the DFT blending path is unsupported "
                "(the reference raises here too, :1453-1455)"
            )
        reg_img = high_pass_filter_space(img - add_to_movie, gSig_filt)
        reg_img = reg_img + add_to_movie
    else:
        reg_img = img

    rigid_shts = _rigid_estimate(
        reg_img, template, max_shifts, upsample_factor_fft,
        rigid_decimate,
    )

    starts, grid_shape, window = patch_grid(dims, overlaps, strides)
    tmpl_patches = _extract_patches(template, starts, window)
    img_patches = _extract_patches(reg_img, starts, window)

    lb = jnp.ceil(rigid_shts - max_deviation_rigid)
    ub = jnp.floor(rigid_shts + max_deviation_rigid)

    def reg_patch(ip, tp):
        s, _, dp = fft_reg.phase_cross_correlation(
            ip, tp, upsample_factor=upsample_factor_fft,
            shifts_lb=lb, shifts_ub=ub,
        )
        return s, dp

    patch_shifts, patch_phases = jax.vmap(reg_patch)(
        img_patches, tmpl_patches
    )  # [n_patches, nd], [n_patches]

    if use_remap:
        corrected = _apply_remap_field(
            img, rigid_shts, patch_shifts, grid_shape, remap_mode,
            max_shifts, max_deviation_rigid,
        )
        return corrected - add_to_movie, -patch_shifts

    # DFT path: upsampled patch grid, per-patch Fourier shifts, blending.
    new_strides = tuple(
        int(round(s / upsample_factor_grid)) for s in strides
    )
    new_overlaps = overlaps
    new_starts, new_grid_shape, new_window = patch_grid(
        dims, new_overlaps, new_strides
    )
    up_shifts = jnp.stack(
        [
            _upsample_field(patch_shifts[:, d], grid_shape,
                            new_grid_shape).reshape(-1)
            for d in range(nd)
        ],
        axis=-1,
    )  # [n_new, nd]
    up_phases = _upsample_field(
        patch_phases, grid_shape, new_grid_shape
    ).reshape(-1)

    new_img_patches = _extract_patches(img, new_starts, new_window)

    def shift_patch(patch, s, ph):
        return fft_reg.apply_shifts_fourier(
            patch, -s, ph, is_freq=False, border_nan=border_nan
        )

    shifted = jax.vmap(shift_patch)(new_img_patches, up_shifts, up_phases)

    # Shear guard: feather vs hard ownership (reference :1444-1446).
    shear_terms = []
    for d in range(nd if nd == 2 else 2):
        f = up_shifts[:, d].reshape(new_grid_shape)
        for ax in range(len(new_grid_shape)):
            if new_grid_shape[ax] > 1:
                shear_terms.append(
                    jnp.max(jnp.abs(jnp.diff(f, axis=ax)))
                )
    max_shear = (
        jnp.percentile(jnp.stack(shear_terms), 75.0)
        if shear_terms else jnp.asarray(0.0)
    )

    feather = jnp.stack([
        jnp.asarray(_feather_weights(new_window, new_overlaps, pos,
                                     new_grid_shape))
        for pos in itertools.product(*[range(g) for g in new_grid_shape])
    ])
    owner = jnp.stack([
        jnp.asarray(_ownership_weights(new_window, new_overlaps, pos,
                                       new_grid_shape))
        for pos in itertools.product(*[range(g) for g in new_grid_shape])
    ])
    weights = jnp.where(max_shear < 0.5, feather, owner)

    corrected = _blend_patches(shifted, weights, new_starts, new_window,
                               dims)
    return corrected - add_to_movie, -patch_shifts


@functools.partial(
    jax.jit,
    static_argnames=(
        "strides", "overlaps", "max_shifts", "max_deviation_rigid",
        "upsample_factor_grid", "upsample_factor_fft", "use_remap",
        "remap_mode", "border_nan", "gSig_filt", "rigid_decimate",
        "phasecorr_impl", "dft_precision",
    ),
)
def tile_and_correct_block(
    frames: jnp.ndarray,
    template: jnp.ndarray,
    strides,
    overlaps,
    max_shifts,
    max_deviation_rigid: int = 3,
    upsample_factor_grid: int = 4,
    upsample_factor_fft: int = 10,
    use_remap: bool = True,
    remap_mode: str = "exact",
    border_nan=True,
    add_to_movie: float = 0.0,
    gSig_filt=None,
    rigid_decimate: int = 1,
    phasecorr_impl: str = "auto",
    dft_precision: str = "high",
):
    """Piecewise-rigid correction of a ``[B, ...spatial]`` frame block.

    Semantics match ``vmap(tile_and_correct)`` over the block; the win is
    the per-patch correlation stage, which (when ``phasecorr_impl``
    resolves to ``"fused"``) runs as ONE fused Pallas kernel over the
    whole ``[B, n_patches]`` grid — patch DFT, cross-power product,
    inverse, shift-window mask and argmax all in VMEM
    (:mod:`dnmf_tpu.ops.pallas_phasecorr`; measured 8.7 -> 4.9 ms/frame
    at 512x512x20 / 32 patches vs the per-patch XLA matrix-DFT chain).

    ``phasecorr_impl``: ``"fused"`` | ``"xla"`` | ``"auto"`` (fused for
    3-D remap-mode blocks on a TPU backend, XLA otherwise).
    ``dft_precision`` (fused path): ``"highest"`` (6-pass f32) |
    ``"high"`` (bf16x3, ~1e-6 relative — the default) | ``"default"``
    (single-pass bf16).
    """
    dims = frames.shape[1:]
    nd = len(dims)
    impl = phasecorr_impl
    if impl == "auto":
        impl = ("fused" if nd == 3 and use_remap
                and jax.default_backend() == "tpu" else "xla")
    if impl != "fused" or not use_remap:
        # The fused warp kernel rides the fused-phasecorr block path;
        # per-frame fallback uses the semantically-matching XLA passes.
        frame_remap = "separable" if remap_mode == "fused" else remap_mode

        def one(f):
            return tile_and_correct(
                f, template, strides, overlaps, max_shifts,
                max_deviation_rigid=max_deviation_rigid,
                upsample_factor_grid=upsample_factor_grid,
                upsample_factor_fft=upsample_factor_fft,
                use_remap=use_remap, remap_mode=frame_remap,
                border_nan=border_nan, add_to_movie=add_to_movie,
                gSig_filt=gSig_filt, rigid_decimate=rigid_decimate,
            )
        return jax.vmap(one)(frames)
    if nd != 3:
        raise ValueError("fused phase correlation is 3-D only")

    from dnmf_tpu.ops import pallas_phasecorr as pp

    if gSig_filt is not None:
        # Match the per-frame path's loud failure (the reference's 1p
        # high-pass is 2-D-only, :1262-1270) instead of silently
        # registering unfiltered frames.
        raise ValueError("gSig_filt high-pass filtering is 2-D only "
                         "(got 3-D frames on the fused path)")
    frames = frames + add_to_movie
    template = template + add_to_movie
    reg_frames = frames

    rigid_shts = jax.vmap(
        lambda f: _rigid_estimate(
            f, template, max_shifts, upsample_factor_fft,
            rigid_decimate)
    )(reg_frames)  # [B, 3]

    starts, grid_shape, window = patch_grid(dims, overlaps, strides)
    wm, wn, wz = window
    tre, tim = pp.patch_spectra(_extract_patches(template, starts,
                                                 window))
    pats = jax.vmap(
        lambda f: pp.to_zm_n(_extract_patches(f, starts, window))
    )(reg_frames)  # [B, NP, z*m, n]

    lb = jnp.ceil(rigid_shts - max_deviation_rigid)
    ub = jnp.floor(rigid_shts + max_deviation_rigid)
    bounds = jnp.concatenate(
        [lb, ub, jnp.zeros((frames.shape[0], 2))], axis=1
    ).astype(jnp.float32)  # [B, 8]

    sh_int, pre, pim = pp.phase_corr_block(
        pats, tre, tim, bounds, z=wz, precision=dft_precision,
        interpret=jax.default_backend() != "tpu",
    )
    if upsample_factor_fft > 1:
        prod = (pre + 1j * pim).reshape(pre.shape[:2] + (wz, wm, wn))

        def refine(pr, s):
            sf, _ = fft_reg.subpixel_refine(
                pr, s, upsample_factor_fft, window,
                prod_layout=(2, 0, 1),
            )
            return sf
        patch_shifts = jax.vmap(jax.vmap(refine))(prod, sh_int)
    else:
        patch_shifts = sh_int
    # Singleton axes carry no shift information (reference :1020-1022).
    sizes = jnp.asarray(window, dtype=jnp.float32)
    patch_shifts = jnp.where(sizes == 1, 0.0, patch_shifts)

    if remap_mode == "fused":
        from dnmf_tpu.ops import tuning
        from dnmf_tpu.ops.pallas_warp import fused_separable_warp

        tiles = tuning.lookup(
            "fused_warp", m=dims[0], n=dims[1], z=dims[2]) or {}
        corrected = fused_separable_warp(
            frames, patch_shifts, rigid_shts, grid_shape, dims,
            max_shifts, max_deviation_rigid,
            tm=tiles.get("tm", 32), tn=tiles.get("tn", 128),
            interpret=jax.default_backend() != "tpu",
        )
    else:
        corrected = jax.vmap(
            lambda f, rs, ps: _apply_remap_field(
                f, rs, ps, grid_shape, remap_mode, max_shifts,
                max_deviation_rigid)
        )(frames, rigid_shts, patch_shifts)
    return corrected - add_to_movie, -patch_shifts


# ----------------------------------------------------------------------
# Batch template iteration + user-facing class
# ----------------------------------------------------------------------
class MotionCorrect:
    """Motion-correction driver with the reference's API surface
    (``MotionCorrect``, ``/root/reference/Demix/MotionCorrect.py:64-385``).

    Args:
      video: ``[T, M, N]`` or ``[T, M, N, Z]`` array (or list of such).
      config: RegistrationConfig (is3d inferred from video rank if unset).
    """

    def __init__(self, video, config: Optional[RegistrationConfig] = None,
                 **overrides):
        if not isinstance(video, (list, tuple)):
            video = [video]
        # Videos stay HOST-resident (NumPy views; memmaps untouched;
        # duck-typed read views like data.streaming.SpatialView pass
        # through — the drivers only touch .shape and __getitem__) —
        # the batch drivers stream frame blocks to the device, so
        # device memory never scales with T.
        self.video = [
            v if (isinstance(v, np.ndarray)
                  or (hasattr(v, "shape") and hasattr(v, "__getitem__")
                      and not hasattr(v, "devices")))
            else np.asarray(v, dtype=np.float32)
            for v in video
        ]
        cfg = config or RegistrationConfig()
        if overrides:
            import dataclasses

            cfg = dataclasses.replace(cfg, **overrides)
        nd = self.video[0].ndim - 1
        if nd == 3 and not cfg.is3d:
            import dataclasses

            cfg = dataclasses.replace(cfg, is3d=True)
        if len(cfg.max_shifts) != nd:
            import dataclasses

            cfg = dataclasses.replace(
                cfg, max_shifts=tuple(cfg.max_shifts) + (1,) * (
                    nd - len(cfg.max_shifts)
                )
            )
        # Pad patch geometry for 3-D inputs: default to one full-depth
        # patch along z (the reference's 3-D demos use z-spanning patches).
        if len(cfg.strides) < nd:
            import dataclasses

            z_dim = int(self.video[0].shape[3])
            cfg = dataclasses.replace(
                cfg,
                strides=tuple(cfg.strides) + (z_dim,) * (
                    nd - len(cfg.strides)
                ),
                overlaps=tuple(cfg.overlaps) + (0,) * (
                    nd - len(cfg.overlaps)
                ),
            )
        self.config = cfg
        self.min_mov = cfg.min_mov

    # -- public API ----------------------------------------------------
    def motion_correct(self, template: Optional[jnp.ndarray] = None):
        """Rigid or pw-rigid correction per ``config.pw_rigid``; computes
        ``border_to_0`` from the max applied shift (reference ``:176-211``)."""
        if self.min_mov is None:
            if self.config.gSig_filt is None:
                # Full-movie min, streamed host-side in frame blocks
                # (reference: ``self.video[0].min()`` guarded on
                # ``gSig_filt is None``, /root/reference/Demix/
                # MotionCorrect.py:193-195).
                self.min_mov = _streamed_min(self.video[0])
            else:
                # The reference leaves min_mov None here and would fault
                # at ``-self.min_mov``; registration runs on high-passed
                # (zero-mean) frames, so no offset is the right intent.
                self.min_mov = 0.0
        if self.config.pw_rigid:
            self.motion_correct_pwrigid(template=template)
            shift_mats = [np.abs(np.asarray(s)) for s in
                          (self.x_shifts_els, self.y_shifts_els)]
            if self.config.is3d:
                shift_mats.append(np.abs(np.asarray(self.z_shifts_els)))
            b0 = np.ceil(max(s.max() for s in shift_mats))
        else:
            self.motion_correct_rigid(template=template)
            b0 = np.ceil(np.max(np.abs(np.asarray(self.shifts_rig))))
        self.border_to_0 = int(b0)
        return self

    def motion_correct_rigid(self, template=None) -> None:
        self.total_template_rig = template
        self.templates_rig: List = []
        self.shifts_rig: List = []
        self.mc: List = []
        for vid in self.video:
            tot, templates, shifts, mc = _batch_rigid(
                vid, self.config, template=self.total_template_rig,
                add_to_movie=-self.min_mov,
            )
            if template is None:
                self.total_template_rig = tot
            self.templates_rig += templates
            self.shifts_rig += list(shifts)
            self.mc.append(mc)

    def motion_correct_pwrigid(self, template=None) -> None:
        if template is None:
            self.motion_correct_rigid()
            template = self.total_template_rig
        self.total_template_els = template
        self.templates_els: List = []
        self.x_shifts_els: List = []
        self.y_shifts_els: List = []
        self.z_shifts_els: List = []
        self.coord_shifts_els: List = []
        self.mc_els: List = []
        for vid in self.video:
            (tot, templates, xs, ys, zs, coords, mc) = _batch_pwrigid(
                vid, self.config, template=self.total_template_els,
                add_to_movie=-self.min_mov,
            )
            if bool(jnp.isnan(jnp.sum(tot))):
                raise Exception(
                    "Template contains NaNs, something went wrong. "
                    "Reconsider the parameters"
                )
            self.total_template_els = tot
            self.templates_els += templates
            self.x_shifts_els += xs
            self.y_shifts_els += ys
            self.z_shifts_els += zs
            self.coord_shifts_els += coords
            self.mc_els.append(mc)

    # -- shift propagation onto points ----------------------------------
    def _patch_centers(self):
        dims = self.video[0].shape[1:]
        starts, grid_shape, window = patch_grid(
            dims, self.config.overlaps, self.config.strides
        )
        return starts + np.asarray(self.config.strides) / 2.0

    def apply_shifts_frame(self, points: np.ndarray, t: int) -> np.ndarray:
        """Forward-apply frame ``t``'s patch shifts to points
        (reference ``apply_shifts_frame``, ``:330-349``)."""
        centers = self._patch_centers()
        points = np.asarray(points, dtype=np.float64)
        d = np.linalg.norm(
            centers[:, None, :] - points[None, :, :], axis=-1
        )
        nearest = d.argmin(0)
        out = points.copy()
        out[:, 0] += np.asarray(self.x_shifts_els)[t][nearest]
        out[:, 1] += np.asarray(self.y_shifts_els)[t][nearest]
        if self.config.is3d:
            out[:, 2] += np.asarray(self.z_shifts_els)[t][nearest]
        return out

    def apply_shifts_points(self, points: np.ndarray) -> np.ndarray:
        """Per-frame neuron positions from patch shifts — the dNMF
        position seeder (reference ``apply_shifts_points``, ``:351-371``;
        per-axis sign conventions preserved, including the opposite z
        sign).

        Returns ``[K, 3, T]``.
        """
        centers = self._patch_centers()
        points = np.asarray(points, dtype=np.float64)
        d = np.linalg.norm(
            centers[:, None, :points.shape[1]] - points[None, :, :],
            axis=-1,
        )
        nearest = d.argmin(0)
        xs = np.asarray(self.x_shifts_els)
        ys = np.asarray(self.y_shifts_els)
        t_frames = xs.shape[0]
        p_t = np.zeros((points.shape[0], points.shape[1], t_frames))
        for t in range(t_frames):
            p_t[:, :, t] = points
            p_t[:, 0, t] += -xs[t][nearest] + xs[0][nearest]
            p_t[:, 1, t] += -ys[t][nearest] + ys[0][nearest]
            if self.config.is3d and points.shape[1] > 2:
                zs = np.asarray(self.z_shifts_els)
                p_t[:, 2, t] += zs[t][nearest] - zs[0][nearest]
        return p_t

    def template_points_to_frame0(self, points: np.ndarray
                                  ) -> np.ndarray:
        """Convert TEMPLATE-space coordinates (peaks detected on
        ``total_template_*`` or on shift-corrected summary images) to
        the FRAME-0 coordinates :meth:`apply_shifts_points` expects.

        The reference's ``apply_shifts_points`` contract takes curated
        frame-0/raw-space points (``/root/reference/Demix/
        MotionCorrect.py:351-371``: ``P_T[t] = points - (s_t - s_0)``,
        so ``P_T[0] == points``); template-space detections carry a
        constant per-patch bias of the frame-0 correction ``s_0``
        (alignment gauge: ``x_t + s_t = x_template`` for x/y, opposite
        sign on z per the reference convention), which this removes.
        """
        points = np.array(points, dtype=np.float64, copy=True)
        if self.config.pw_rigid:
            centers = self._patch_centers()
            d = np.linalg.norm(
                centers[:, None, :points.shape[1]] - points[None],
                axis=-1)
            nearest = d.argmin(0)
            points[:, 0] -= np.asarray(self.x_shifts_els)[0][nearest]
            points[:, 1] -= np.asarray(self.y_shifts_els)[0][nearest]
            if self.config.is3d and points.shape[1] > 2:
                points[:, 2] += np.asarray(
                    self.z_shifts_els)[0][nearest]
        else:
            s0 = np.asarray(self.shifts_rig)[0]
            points[:, :s0.shape[0]] -= s0[None, :points.shape[1]]
        return points

    def get_params(self) -> dict:
        cfg = self.config
        return {
            "max_shifts": cfg.max_shifts, "niter_rig": cfg.niter_rig,
            "niter_els": cfg.niter_els,
            "splits_rig": cfg.resolved_splits("rig"),
            "strides": cfg.strides,
            "overlaps": cfg.overlaps,
            "splits_els": cfg.resolved_splits("els"),
            "num_splits_to_process_rig":
                cfg.resolved_num_splits_to_process("rig"),
            "num_splits_to_process_els":
                cfg.resolved_num_splits_to_process("els"),
            "upsample_factor_grid": cfg.upsample_factor_grid,
            "max_deviation_rigid": cfg.max_deviation_rigid,
            "min_mov": self.min_mov, "border_nan": cfg.border_nan,
            "pw_rigid": cfg.pw_rigid, "is3D": cfg.is3d,
            "total_template_rig": getattr(self, "total_template_rig",
                                          None),
            "templates_rig": getattr(self, "templates_rig", []),
            "shifts_rig": getattr(self, "shifts_rig", []),
            "total_template_els": getattr(self, "total_template_els",
                                          None),
            "templates_els": getattr(self, "templates_els", []),
            "x_shifts_els": getattr(self, "x_shifts_els", []),
            "y_shifts_els": getattr(self, "y_shifts_els", []),
            "z_shifts_els": getattr(self, "z_shifts_els", []),
        }


# ----------------------------------------------------------------------
# Streamed batch drivers: device memory is bounded by
# frame_block x frame size; the video stays host-resident (NumPy/memmap)
# and the corrected movie (when kept) accumulates on host.
# ----------------------------------------------------------------------
def _chunk_indices(t: int, splits: int):
    return np.array_split(np.arange(t), splits)


def _host_frames(video, idx) -> np.ndarray:
    """Host-side float32 frame gather (works for np/memmap/jnp inputs)."""
    return np.asarray(video[np.asarray(idx)], dtype=np.float32)


def _streamed_min(video, block: int = 256) -> float:
    """Min over the whole movie, one host frame-block at a time (memmap
    safe; matches the reference's full-movie ``video.min()``)."""
    lo = np.inf
    for i in range(0, video.shape[0], block):
        lo = min(lo, float(np.min(np.asarray(video[i:i + block]))))
    return float(lo)


def _streamed_bin_median(video, gSig_filt=None,
                         max_frames=None) -> jnp.ndarray:
    """Template init: median over window-binned means, streamed.

    Matches ``fft_reg.bin_median``'s interleaved binning (reference
    ``bin_median``, ``:432-494``: reshape groups frame ``w*nw + n`` into
    window ``n``) while reading at most ``window`` frames onto the device
    at a time.  ``max_frames=None`` seeds from ALL frames — the
    reference's behavior (its ``bin_median`` sees the whole movie); an
    integer caps the host reads for very long recordings (the template
    is iterated afterwards anyway), via
    ``RegistrationConfig.template_init_max_frames``.
    """
    t = video.shape[0] if max_frames is None else min(video.shape[0],
                                                      max_frames)
    window = min(10, t)
    num_windows = t // window
    means = []
    for n in range(num_windows):
        idx = np.arange(n, n + window * num_windows, num_windows)
        frames = jnp.asarray(_host_frames(video, idx))
        if gSig_filt is not None:
            frames = jax.vmap(
                lambda f: high_pass_filter_space(f, gSig_filt)
            )(frames)
        means.append(np.asarray(jnp.nanmean(frames, axis=0)))
    return jnp.asarray(np.nanmedian(np.stack(means), axis=0))


def _iteration_chunks(chunks, cfg: RegistrationConfig, is_last: bool,
                      phase: str = "rig"):
    """Chunk subset for one template iteration.

    All chunks on the final iteration; otherwise an evenly-spaced subset
    of ``num_splits_to_process[_rig/_els]`` (deterministic version of the
    reference's random per-iteration sampling, ``:2097-2098``).
    """
    n = cfg.resolved_num_splits_to_process(phase)
    if is_last or n is None or n >= len(chunks):
        return chunks
    sel = np.linspace(0, len(chunks) - 1, n).round().astype(int)
    return [chunks[i] for i in sorted(set(sel.tolist()))]


def _stream_chunk(video, idx, cfg: RegistrationConfig, correct_block,
                  collect: bool):
    """Register one chunk in frame blocks.

    ``correct_block(frames [B, ...]) -> (corrected [B, ...], shifts)``.
    Returns ``(chunk_template, shifts [len(idx), ...], corrected_host or
    None)`` with device memory bounded by the block size.
    """
    fb = max(1, cfg.frame_block)
    sum_img = None
    cnt_img = None
    shifts_out = []
    corrected_host = [] if collect else None
    for i in range(0, len(idx), fb):
        frames = jnp.asarray(_host_frames(video, idx[i:i + fb]))
        corrected, shifts = correct_block(frames)
        finite = jnp.isfinite(corrected)
        s = jnp.sum(jnp.where(finite, corrected, 0.0), axis=0)
        c = jnp.sum(finite, axis=0)
        sum_img = s if sum_img is None else sum_img + s
        cnt_img = c if cnt_img is None else cnt_img + c
        shifts_out.append(np.asarray(shifts))
        if collect:
            corrected_host.append(np.asarray(corrected))
    chunk_t = sum_img / jnp.maximum(cnt_img, 1)
    chunk_t = jnp.where(cnt_img > 0, chunk_t, jnp.nan)
    chunk_t = jnp.nan_to_num(chunk_t, nan=float(jnp.nanmin(chunk_t)))
    shifts = np.concatenate(shifts_out)
    mc = np.concatenate(corrected_host) if collect else None
    return chunk_t, shifts, mc


def _batch_rigid(video, cfg: RegistrationConfig, template=None,
                 add_to_movie=0.0):
    """Template-iterated rigid registration, streamed in frame blocks
    (reference ``motion_correct_batch_rigid``, ``:1770-1878``; its chunk
    workers materialize whole chunks — here device memory is bounded by
    ``cfg.frame_block`` frames and the movie accumulates host-side)."""
    if template is None:
        template = _streamed_bin_median(
            video, cfg.gSig_filt,
            max_frames=cfg.template_init_max_frames)
    if bool(jnp.isnan(add_to_movie)):
        raise Exception("The movie contains NaNs. NaNs are not allowed!")

    def correct_block_factory(templ):
        def correct_block(frames):
            if cfg.gSig_filt is not None:
                reg_in = jax.vmap(
                    lambda f: high_pass_filter_space(f, cfg.gSig_filt)
                )(frames)
                # register on filtered, apply to raw
                shifts = rigid_correct_frames(
                    reg_in, templ, cfg.max_shifts,
                    upsample_factor=cfg.upsample_factor_fft,
                    border_nan=cfg.border_nan, add_to_movie=add_to_movie,
                )[1]
                corrected = jax.vmap(
                    lambda f, s: fft_reg.apply_shifts_fourier(
                        f, s, 0.0, border_nan=cfg.border_nan
                    )
                )(frames, shifts)
                return corrected, shifts
            return rigid_correct_frames(
                frames, templ, cfg.max_shifts,
                upsample_factor=cfg.upsample_factor_fft,
                border_nan=cfg.border_nan, add_to_movie=add_to_movie,
            )
        return correct_block

    new_templ = template
    chunks = _chunk_indices(video.shape[0], cfg.resolved_splits("rig"))
    num_iter = max(cfg.niter_rig, 1)
    for it in range(num_iter):
        is_last = it == num_iter - 1
        chunk_templates = []
        all_shifts = []
        all_mc = []
        correct_block = correct_block_factory(new_templ)
        for idx in _iteration_chunks(chunks, cfg, is_last, phase="rig"):
            chunk_t, shifts, mc = _stream_chunk(
                video, idx, cfg, correct_block,
                collect=is_last and cfg.return_mc,
            )
            chunk_templates.append(chunk_t)
            all_shifts.append(shifts)
            if mc is not None:
                all_mc.append(mc)
        new_templ = jnp.nanmedian(jnp.stack(chunk_templates), axis=0)
        if cfg.gSig_filt is not None:
            new_templ = high_pass_filter_space(new_templ, cfg.gSig_filt)

    shifts = np.concatenate(all_shifts)
    mc = np.concatenate(all_mc) if all_mc else None
    return new_templ, [np.asarray(t) for t in chunk_templates], shifts, mc


def _batch_pwrigid(video, cfg: RegistrationConfig, template,
                   add_to_movie=0.0):
    """Template-iterated pw-rigid registration, streamed in frame blocks
    (reference ``motion_correct_batch_pwrigid``, ``:1880-2000``)."""
    if template is None:
        raise Exception(
            "You need to initialize the template with a good estimate. "
            "See the motion_correct_batch_rigid function"
        )
    if bool(jnp.isnan(add_to_movie)):
        raise Exception("The template contains NaNs. NaNs are not allowed!")

    dims = video.shape[1:]
    nd = len(dims)
    strides = tuple(cfg.strides[:nd])
    overlaps = tuple(cfg.overlaps[:nd])
    starts, grid_shape, _ = patch_grid(dims, overlaps, strides)

    def correct_block_factory(templ):
        def correct_block(frames):
            return tile_and_correct_block(
                    frames, templ, strides, overlaps, cfg.max_shifts,
                    max_deviation_rigid=cfg.max_deviation_rigid,
                    upsample_factor_grid=cfg.upsample_factor_grid,
                    upsample_factor_fft=cfg.upsample_factor_fft,
                    use_remap=cfg.use_remap,
                    remap_mode=cfg.remap_mode,
                    border_nan=cfg.border_nan,
                    add_to_movie=add_to_movie, gSig_filt=cfg.gSig_filt,
                    phasecorr_impl=cfg.phasecorr_impl,
                    dft_precision=cfg.dft_precision,
                    rigid_decimate=cfg.rigid_decimate,
                )
        return correct_block

    new_templ = template
    chunks = _chunk_indices(video.shape[0], cfg.resolved_splits("els"))
    # The reference pins the elastic phase to ONE template iteration
    # (``num_iter = 1``, /root/reference/Demix/MotionCorrect.py:284);
    # ``niter_rig`` governs only the rigid phase.
    num_iter = max(cfg.niter_els, 1)
    for it in range(num_iter):
        is_last = it == num_iter - 1
        chunk_templates = []
        all_shifts = []
        all_mc = []
        correct_block = correct_block_factory(new_templ)
        for idx in _iteration_chunks(chunks, cfg, is_last, phase="els"):
            chunk_t, shifts, mc = _stream_chunk(
                video, idx, cfg, correct_block,
                collect=is_last and cfg.return_mc,
            )
            chunk_templates.append(chunk_t)
            all_shifts.append(shifts)
            if mc is not None:
                all_mc.append(mc)
        new_templ = jnp.nanmedian(jnp.stack(chunk_templates), axis=0)
        if cfg.gSig_filt is not None:
            # Keep the iterated template in the filtered domain
            # (reference :1971-1972).
            new_templ = high_pass_filter_space(new_templ, cfg.gSig_filt)

    shifts = np.concatenate(all_shifts)
    xs = [shifts[t, :, 0] for t in range(shifts.shape[0])]
    ys = [shifts[t, :, 1] for t in range(shifts.shape[0])]
    zs = (
        [shifts[t, :, 2] for t in range(shifts.shape[0])]
        if nd == 3 else [np.zeros(shifts.shape[1])] * shifts.shape[0]
    )
    coords = [starts] * shifts.shape[0]
    mc = np.concatenate(all_mc) if all_mc else None
    return (new_templ, [np.asarray(t) for t in chunk_templates],
            xs, ys, zs, coords, mc)
