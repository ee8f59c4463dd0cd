"""FFT phase-correlation registration primitives (2-D and 3-D).

TPU-native rebuild of the reference's subpixel registration core
(``register_translation`` ``/root/reference/Demix/MotionCorrect.py:801-1024``,
``register_translation_3d`` ``:648-797``, ``_upsampled_dft`` ``:498-614``,
``apply_shifts_dft`` ``:1028-1156`` — themselves adapted from
scikit-image/SIMA's Guizar-Sicairos matrix-multiply DFT algorithm):

* integer shift from the argmax of the FFT cross-correlation, restricted
  to a shift window.  The reference zeroes slices of the correlation
  surface (data-dependent Python slicing); here the window is a mask over
  *signed wrapped indices* — fully static shapes, traced bounds, so the
  same compiled kernel serves rigid and patch-bounded registration.
* subpixel refinement by evaluating the DFT on an ``upsample_factor``-fine
  grid around the integer estimate via small matrix products (MXU work,
  no zero-padded giant FFT).
* shift application by a Fourier-domain phase ramp with the reference's
  border policies (``True``/nan, ``False``, ``"min"``, ``"copy"``)
  expressed as masks/clamped gathers so shifts may be traced values.

Everything is jit/vmap-friendly: vmap over frames and over patches.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _signed_freq_index(n: int) -> jnp.ndarray:
    """``[n]`` signed wrapped indices: 0, 1, ..., mid, -(n-mid-1), ..., -1.

    Index ``i`` of an FFT cross-correlation corresponds to signed shift
    ``i`` if ``i <= fix(n/2)`` else ``i - n`` (reference ``:974-978``).
    """
    idx = np.arange(n)
    mid = np.fix(n / 2.0)
    return jnp.asarray(np.where(idx > mid, idx - n, idx), dtype=jnp.float32)


def _shift_window_mask(shape, lb, ub) -> jnp.ndarray:
    """Mask keeping signed shifts in ``[lb_d, ub_d - 1]`` per dim.

    Matches the reference's slice-zeroing exactly: with bounds ``lb<0<=ub``
    it zeroes ``[ub:lb]`` which keeps ``lb <= s <= ub-1`` (``:953-965``);
    the plain ``max_shifts`` path is the special case ``lb=-m, ub=m``.
    """
    mask = None
    for d, n in enumerate(shape):
        s = _signed_freq_index(n)
        keep = (s >= lb[d]) & (s <= ub[d] - 1)
        shape_d = [1] * len(shape)
        shape_d[d] = n
        keep = keep.reshape(shape_d)
        mask = keep if mask is None else (mask & keep)
    return mask


# Largest axis length for which the MXU matrix-DFT beats XLA's FFT
# (O(n^2) matmul vs memory-bound butterflies; crossover is well above
# registration patch sizes).
MATMUL_DFT_MAX = 256


@functools.lru_cache(maxsize=64)
def _dft_matrix_np(n: int, inverse: bool):
    k = np.arange(n)
    w = np.exp((2j if inverse else -2j) * np.pi * np.outer(k, k) / n)
    if inverse:
        w = w / n
    return w.astype(np.complex64)


# DFT-matrix contraction precision.  HIGHEST (6-pass f32 emulation) is
# the safe default: correlation surfaces carry large canceling terms
# and TPU matmuls default to single-pass bf16 (~0.4% error — enough to
# perturb subpixel peaks).  HIGH (3-pass bf16x3, ~1e-6 relative) halves
# the dominant matmul cost; exposed as a measured option via
# ``dft_precision``.
_DFT_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def matrix_dftn(x: jnp.ndarray, inverse: bool = False,
                precision: str = "highest") -> jnp.ndarray:
    """N-D DFT as per-axis MXU matrix products (standard axis order).

    XLA's TPU FFT is a memory-bound multi-pass butterfly on the VPU — at
    512x512x20-scale patch stacks it measured 21.6 ms/frame, the single
    largest cost of piecewise-rigid registration.  The O(n^2) DFT-matrix
    contraction runs on the MXU instead (see ``_DFT_PRECISIONS`` for the
    dot-precision trade).

    NOTE: for 3-D volumes with a thin minor (z) axis prefer
    :func:`matrix_dft3_mzn` — arrays laid out ``[.., z]`` use z/128 of
    the vector lanes, which made this order-preserving form (and XLA's
    FFT) ~5x slower than the permuted-layout pipeline.
    """
    prec = _DFT_PRECISIONS[precision]
    out = x if jnp.iscomplexobj(x) else x.astype(jnp.complex64)
    for ax in range(x.ndim):
        w = jnp.asarray(_dft_matrix_np(x.shape[ax], inverse))
        out = jnp.tensordot(w, out, axes=[[1], [ax]], precision=prec)
        out = jnp.moveaxis(out, 0, ax)
    return out


def matrix_dft3_mzn(x: jnp.ndarray, inverse: bool = False,
                    precision: str = "highest") -> jnp.ndarray:
    """3-D matrix DFT with lane-friendly layouts: ``[m, n, z]`` in,
    ``[m, z, n]`` (frequency) out — and the reverse when ``inverse``.

    Every intermediate keeps a large (>= m/n) minor dimension; the thin
    z axis never lands on the lane axis (where it would use z/128 of
    the VPU/MXU width — measured 5x slower end-to-end).  Contractions:

      1. z-pass:  ``W_z`` contracted to the front -> ``[z, m, n]``
      2. m-pass:  ``W_m`` contracted to the front -> ``[m, z, n]``
      3. n-pass:  right-multiplied                -> ``[m, z, n']``

    The permuted frequency layout composes: correlation products and
    the inverse transform run in ``[m, z, n]`` throughout.  The inverse
    returns real space in ``[z, m, n]`` layout — still lane-friendly, so
    the caller's magnitude/mask/argmax also avoid the thin minor axis
    (indices map back via the permutation).
    """
    hi = _DFT_PRECISIONS[precision]
    if not inverse:
        m, n, z = x.shape
        out = x if jnp.iscomplexobj(x) else x.astype(jnp.complex64)
        wz = jnp.asarray(_dft_matrix_np(z, False))
        wm = jnp.asarray(_dft_matrix_np(m, False))
        wn = jnp.asarray(_dft_matrix_np(n, False))
        out = jnp.tensordot(wz, out, axes=[[1], [2]],
                            precision=hi)           # [z, m, n]
        out = jnp.tensordot(wm, out, axes=[[1], [1]],
                            precision=hi)           # [m, z, n]
        return jnp.einsum("mzn,kn->mzk", out, wn, precision=hi)
    # inverse: x is [m, z, n] frequency -> [z, m, n] real-space layout
    m, z, n = x.shape
    wz = jnp.asarray(_dft_matrix_np(z, True))
    wm = jnp.asarray(_dft_matrix_np(m, True))
    wn = jnp.asarray(_dft_matrix_np(n, True))
    out = jnp.einsum("mzn,kn->mzk", x, wn, precision=hi)  # [m, z, n]
    out = jnp.tensordot(wm, out, axes=[[1], [0]],
                        precision=hi)               # [m, z, n]
    return jnp.tensordot(wz, out, axes=[[1], [1]],
                         precision=hi)              # [z, m, n]


def _hermitian_full(half: jnp.ndarray, shape) -> jnp.ndarray:
    """Reconstruct a full complex spectrum from its rfftn half-spectrum.

    For real inputs ``F(-k) = conj(F(k))``; the missing last-axis bins
    ``k in [nh, n)`` are ``conj(half[(-i) % n_d ..., n - k])``.  Pure
    memory ops (flip/roll/concat) — the price of using real FFTs for the
    correlation while keeping the subpixel matrix-DFT on the full
    spectrum it expects.
    """
    n_last = int(shape[-1])
    nh = half.shape[-1]
    if n_last == nh:  # length-1 last axis: rfft == full
        return half
    tail = jnp.conj(half[..., 1:n_last - nh + 1][..., ::-1])
    for d in range(half.ndim - 1):
        tail = jnp.roll(jnp.flip(tail, axis=d), 1, axis=d)
    return jnp.concatenate([half, tail], axis=-1)


def _upsampled_dft(
    data: jnp.ndarray,
    region_size: int,
    upsample_factor: int,
    axis_offsets: jnp.ndarray,
) -> jnp.ndarray:
    """Matrix-multiply DFT of ``data`` on an upsampled sub-region.

    N-dim version of the reference ``_upsampled_dft`` (``:498-614``):
    evaluates the inverse DFT of the (frequency-domain) ``data`` at
    ``region_size`` points per axis spaced ``1/upsample_factor`` apart,
    starting at ``axis_offsets``.

    Args:
      data: complex frequency-domain array.
      region_size: static int, points per output axis.
      upsample_factor: static int.
      axis_offsets: ``[ndim]`` (traced ok) region start offsets.

    Returns:
      Complex array ``[region_size] * ndim``.
    """
    out = data
    ndim = data.ndim
    for d in range(ndim - 1, -1, -1):
        n = data.shape[d]
        # Frequency sample positions (ifftshifted), matching the
        # reference's ifftshift(arange(n)) - floor(n/2).
        freqs = jnp.asarray(
            np.fft.ifftshift(np.arange(n)) - np.floor(n / 2.0),
            dtype=jnp.float32,
        )
        pts = jnp.arange(region_size, dtype=jnp.float32) - axis_offsets[d]
        kernel = jnp.exp(
            (-1j * 2 * np.pi / (n * upsample_factor))
            * pts[:, None] * freqs[None, :]
        )
        # Contract axis d of `out` with the kernel and put the transformed
        # axis back at position d, preserving axis order.
        out = jnp.tensordot(kernel, out, axes=[[1], [d]])
        out = jnp.moveaxis(out, 0, d)
    return out


def phase_cross_correlation(
    src_image: jnp.ndarray,
    target_image: jnp.ndarray,
    upsample_factor: int = 1,
    max_shifts: Optional[Sequence[float]] = None,
    shifts_lb: Optional[jnp.ndarray] = None,
    shifts_ub: Optional[jnp.ndarray] = None,
    space: str = "real",
    target_is_freq: bool = False,
    use_rfft: bool = True,
    fft_impl: str = "auto",
    dft_precision: str = "highest",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Subpixel FFT registration of ``src`` against ``target``.

    Returns ``(shifts, src_freq, phasediff)``: the displacement of the
    source content relative to the target (apply ``-shifts`` to correct),
    the source FFT (reusable for applying shifts), and the global phase
    difference — mirroring the reference's return contract.

    Shift bounds: either ``max_shifts`` (keep ``|s| <= m`` per dim, the
    reference's asymmetric ``[-m, m-1]`` window) or explicit traced
    ``shifts_lb``/``shifts_ub`` (the patchwise ``max_deviation_rigid``
    path).

    ``target_is_freq=True`` means ``target_image`` is already the
    template's FFT (an ``rfftn`` half-spectrum when ``use_rfft``) —
    templates are fixed across a frame block, so batch drivers can
    compute the template FFT once explicitly.

    ``use_rfft=True`` (default for real-space inputs) runs the
    correlation through real FFTs: ``rfftn`` halves the transform and
    product work and ``irfftn`` yields the (mathematically real)
    cross-correlation directly — identical shifts, ~2x less FFT compute,
    which dominates registration cost at 512x512x20.  The returned
    ``src_freq`` is then the half-spectrum; pass it to
    :func:`apply_shifts_fourier` with ``rfft_shape=src_image.shape``.
    """
    # Axis layouts: prod_layout / cc_layout map the axes of
    # image_product / cross_correlation onto STANDARD dims — the
    # permuted matrix-DFT pipeline keeps thin z axes off the vector
    # lanes (see matrix_dft3_mzn); identity for every other path.
    prod_layout = cc_layout = None  # identity unless set
    if space == "fourier":
        src_freq, target_freq = src_image, target_image
        shape = src_freq.shape
        image_product = src_freq * jnp.conj(target_freq)
        cross_correlation = jnp.fft.ifftn(image_product)
        magnitude = jnp.abs(cross_correlation)
        product_half = None
    elif fft_impl == "matmul" or (
            fft_impl == "auto" and max(src_image.shape) <= MATMUL_DFT_MAX):
        # MXU matrix-DFT path: the production choice for registration
        # patches.  target_is_freq then means "target is the matching
        # matrix-DFT spectrum" (mzn layout for 3-D inputs).
        shape = src_image.shape
        if src_image.ndim == 3:
            src_freq = matrix_dft3_mzn(
                src_image, precision=dft_precision)        # [m, z, n]
            target_freq = (
                target_image if target_is_freq
                else matrix_dft3_mzn(target_image,
                                     precision=dft_precision)
            )
            image_product = src_freq * jnp.conj(target_freq)
            prod_layout = (0, 2, 1)
            cross_correlation = matrix_dft3_mzn(
                image_product, inverse=True,
                precision=dft_precision)                   # [z, m, n]
            cc_layout = (2, 0, 1)
        else:
            src_freq = matrix_dftn(src_image, precision=dft_precision)
            target_freq = (
                target_image if target_is_freq
                else matrix_dftn(target_image,
                                 precision=dft_precision)
            )
            image_product = src_freq * jnp.conj(target_freq)
            cross_correlation = matrix_dftn(image_product, inverse=True,
                                            precision=dft_precision)
        magnitude = jnp.abs(cross_correlation)
        product_half = None
    elif use_rfft:
        shape = src_image.shape
        src_freq = jnp.fft.rfftn(src_image.astype(jnp.float32))
        target_freq = (
            target_image if target_is_freq
            else jnp.fft.rfftn(target_image.astype(jnp.float32))
        )
        product_half = src_freq * jnp.conj(target_freq)
        cross_correlation = jnp.fft.irfftn(product_half, s=shape)
        magnitude = jnp.abs(cross_correlation)
        image_product = None  # reconstructed lazily for subpixel only
    else:
        src_freq = jnp.fft.fftn(src_image.astype(jnp.complex64))
        target_freq = (
            target_image if target_is_freq
            else jnp.fft.fftn(target_image.astype(jnp.complex64))
        )
        shape = src_freq.shape
        image_product = src_freq * jnp.conj(target_freq)
        cross_correlation = jnp.fft.ifftn(image_product)
        magnitude = jnp.abs(cross_correlation)
        product_half = None
    ndim = len(shape)

    if shifts_lb is not None or shifts_ub is not None:
        lb = jnp.asarray(shifts_lb, dtype=jnp.float32)
        ub = jnp.asarray(shifts_ub, dtype=jnp.float32)
    elif max_shifts is not None:
        m = jnp.asarray(max_shifts, dtype=jnp.float32)
        lb, ub = -m, m
    else:
        lb = -jnp.asarray(shape, dtype=jnp.float32)
        ub = jnp.asarray(shape, dtype=jnp.float32)
    if cc_layout is None:
        cc_shape = shape
        mask = _shift_window_mask(shape, lb, ub)
    else:
        cc_shape = tuple(shape[d] for d in cc_layout)
        idx = jnp.asarray(cc_layout)
        mask = _shift_window_mask(cc_shape, jnp.take(lb, idx),
                                  jnp.take(ub, idx))
    magnitude = jnp.where(mask, magnitude, 0.0)

    flat_idx = jnp.argmax(magnitude)
    maxima_l = jnp.unravel_index(flat_idx, cc_shape)
    if cc_layout is None:
        maxima = jnp.stack(maxima_l).astype(jnp.float32)
    else:
        maxima = jnp.stack(
            [maxima_l[cc_layout.index(d)] for d in range(ndim)]
        ).astype(jnp.float32)
    midpoints = jnp.asarray(
        [np.fix(s / 2.0) for s in shape], dtype=jnp.float32
    )
    sizes = jnp.asarray(shape, dtype=jnp.float32)
    shifts = jnp.where(maxima > midpoints, maxima - sizes, maxima)
    ccmax = cross_correlation.reshape(-1)[flat_idx]

    if upsample_factor > 1:
        if image_product is None:
            image_product = _hermitian_full(product_half, shape)
        shifts, ccmax = subpixel_refine(
            image_product, shifts, upsample_factor, shape,
            prod_layout=prod_layout,
        )

    # Singleton axes carry no shift information (reference :1020-1022).
    shifts = jnp.where(sizes == 1, 0.0, shifts)
    phasediff = jnp.arctan2(jnp.imag(ccmax), jnp.real(ccmax))
    return shifts, src_freq, phasediff


def subpixel_refine(
    image_product: jnp.ndarray,
    shifts: jnp.ndarray,
    upsample_factor: int,
    shape,
    prod_layout=None,
):
    """Refine integer ``shifts`` to ``1/upsample_factor`` resolution via
    the Guizar-Sicairos matrix-multiply DFT around the coarse peak
    (reference ``:987-1016``).

    Args:
      image_product: full complex cross-power spectrum; its axes map to
        the spatial dims of ``shape`` via ``prod_layout`` (data axis
        ``d`` holds shape dim ``prod_layout[d]``; None = identity).
      shifts: ``[ndim]`` coarse signed shifts in ``shape``-dim order.

    Returns:
      ``(shifts, ccmax)``: refined shifts and the complex correlation
      value at the refined peak (feeds the phase-difference output).
    """
    ndim = len(shape)
    usf = int(upsample_factor)
    shifts = jnp.round(shifts * usf) / usf
    region_size = int(np.ceil(usf * 1.5))
    dftshift = float(np.fix(region_size / 2.0))
    sample_region_offset = dftshift - shifts * usf
    if prod_layout is not None:
        sample_region_offset = jnp.take(
            sample_region_offset, jnp.asarray(prod_layout)
        )
    cc_up = jnp.conj(
        _upsampled_dft(
            jnp.conj(image_product), region_size, usf,
            sample_region_offset,
        )
    ) / (float(np.prod(shape)) * usf**2)
    up_idx = jnp.argmax(jnp.abs(cc_up))
    up_maxima_l = jnp.unravel_index(up_idx, cc_up.shape)
    if prod_layout is None:
        up_maxima = jnp.stack(up_maxima_l).astype(jnp.float32)
    else:
        up_maxima = jnp.stack(
            [up_maxima_l[prod_layout.index(d)] for d in range(ndim)]
        ).astype(jnp.float32)
    shifts = shifts + (up_maxima - dftshift) / usf
    ccmax = cc_up.reshape(-1)[up_idx]
    return shifts, ccmax


def apply_shifts_fourier(
    src: jnp.ndarray,
    shifts: jnp.ndarray,
    diffphase: jnp.ndarray = 0.0,
    is_freq: bool = False,
    border_nan=True,
    rfft_shape=None,
) -> jnp.ndarray:
    """Translate an image/volume by (possibly fractional) ``shifts`` via a
    Fourier phase ramp, with the reference's border policies.

    ``border_nan``: ``True`` (NaN borders), ``False`` (leave wrapped),
    ``"min"`` (fill with the min), ``"copy"`` (replicate edge).

    Real-space inputs run through real FFTs (half the transform work;
    the phase ramp is Hermitian-symmetric so the result is identical:
    ``real(ifftn(F * ramp * e^{i phi})) = cos(phi) * irfftn(H * ramp)``
    for the Hermitian ``F`` of a real image).  For frequency-domain
    inputs (``is_freq=True``), pass ``rfft_shape`` = the real-space
    shape when ``src`` is an rfftn half-spectrum (as returned by
    :func:`phase_cross_correlation`); a full complex spectrum is used
    as before when ``rfft_shape`` is None.
    """
    if is_freq:
        rfft = rfft_shape is not None
        src_freq = src
        shape = tuple(rfft_shape) if rfft else src.shape
    else:
        rfft = True
        shape = src.shape
        src_freq = jnp.fft.rfftn(src.astype(jnp.float32))
    ndim = len(shape)
    shifts = jnp.asarray(shifts, dtype=jnp.float32)

    freq_shape = src_freq.shape
    ramp = jnp.zeros(freq_shape, dtype=jnp.float32)
    for d in range(ndim):
        n = shape[d]
        if rfft and d == ndim - 1:
            # rfft last axis carries only the non-negative bins.
            freqs = jnp.arange(freq_shape[d], dtype=jnp.float32)
        else:
            freqs = jnp.asarray(
                np.fft.ifftshift(
                    np.arange(-np.fix(n / 2.0), np.ceil(n / 2.0))
                ),
                dtype=jnp.float32,
            )
        sd = [1] * ndim
        sd[d] = freq_shape[d]
        ramp = ramp + shifts[d] * freqs.reshape(sd) / n
    greg = src_freq * jnp.exp(-1j * 2 * np.pi * ramp)
    if rfft:
        # Constant-phase factor applied as cos(phi) AFTER the inverse
        # transform: the phase-ramped half-spectrum is Hermitian, so
        # imag(ifftn) = 0 and real(ifftn(. * e^{i phi})) = cos(phi) * out.
        out = jnp.fft.irfftn(greg, s=shape)
        out = out * jnp.cos(jnp.asarray(diffphase, dtype=jnp.float32))
    else:
        greg = greg * jnp.exp(
            1j * jnp.asarray(diffphase, dtype=jnp.float32)
        )
        out = jnp.real(jnp.fft.ifftn(greg))

    if border_nan is not False:
        lo_w = jnp.ceil(jnp.maximum(shifts, 0.0)).astype(jnp.int32)
        hi_w = jnp.floor(jnp.minimum(shifts, 0.0)).astype(jnp.int32)
        if border_nan == "copy":
            # Clamp each axis's index into the valid interior.
            for d in range(ndim):
                n = shape[d]
                idx = jnp.arange(n)
                idx = jnp.clip(idx, lo_w[d], n - 1 + hi_w[d])
                out = jnp.take(out, idx, axis=d)
        else:
            fill = (
                jnp.nan if border_nan is True else jnp.nanmin(out)
            )
            mask = jnp.zeros(shape, dtype=bool)
            for d in range(ndim):
                n = shape[d]
                idx = jnp.arange(n)
                bad = (idx < lo_w[d]) | (idx >= n + hi_w[d])
                sd = [1] * ndim
                sd[d] = n
                mask = mask | bad.reshape(sd)
            out = jnp.where(mask, fill, out)
    return out


def _keys_cubic_weights(f: jnp.ndarray) -> jnp.ndarray:
    """4-tap Keys cubic-convolution weights at fractional offset ``f``.

    ``a = -0.5`` — the classical Keys (1981) kernel and OpenCV's
    ``INTER_CUBIC``, matching the reference's ``cv2.warpAffine`` apply
    path (``/root/reference/Demix/MotionCorrect.py:387-426``).  Taps
    sit at lattice offsets ``{-1, 0, 1, 2}`` around the sample; their
    distances are ``{1+f, f, 1-f, 2-f}``.  Exactly reproduces
    polynomials of degree <= 2 (third-order accurate).
    """
    a = -0.5
    d = jnp.stack([f + 1.0, f, 1.0 - f, 2.0 - f])
    near = (a + 2.0) * d**3 - (a + 3.0) * d**2 + 1.0        # |d| <= 1
    far = a * d**3 - 5.0 * a * d**2 + 8.0 * a * d - 4.0 * a  # 1 < |d| < 2
    return jnp.where(d <= 1.0, near, far)


def apply_shifts_cubic(
    src: jnp.ndarray,
    shifts: jnp.ndarray,
    border_nan="min",
    clamp_range: bool = True,
) -> jnp.ndarray:
    """Translate an image/volume by fractional ``shifts`` with separable
    Keys cubic convolution — the spatial-domain analog of the
    reference's ``apply_shift_iteration`` (``cv2.warpAffine`` +
    ``INTER_CUBIC`` + border-min fill,
    ``/root/reference/Demix/MotionCorrect.py:387-426``), whereas
    :func:`apply_shifts_fourier` is the phase-ramp path.

    Same shift convention as the Fourier apply: ``out[x] = src[x - s]``
    (content moves by ``+s``).  Pure translations are separable, so the
    kernel applies axis-by-axis: 4 gathers + a weighted sum per axis —
    O(4 * ndim * P), bandwidth-bound, jit/vmap-friendly (``shifts`` may
    be traced).

    ``border_nan``: ``"min"`` (reference ``cv2`` border-constant fill
    with the frame min — the default here to match it), ``True`` (NaN
    fill), ``"copy"`` (replicate edge), ``"reflect"`` (mirror with the
    edge sample duplicated — the reference's interior
    ``cv2.BORDER_REFLECT``, ``:387,396``), ``False`` (wrap around).

    ``clamp_range``: clip the output into ``[nanmin, nanmax]`` of the
    input, exactly like the reference (``np.clip(cv2.warpAffine(...),
    min_, max_)``, ``:393-396``) — the Keys kernel's negative lobes can
    otherwise overshoot the input range near sharp edges.

    Note on ``border_nan=True`` extent: the reference NaN-fills exactly
    the ``ceil(shift)``/``floor(shift)`` border strips (``:398-408``);
    here every pixel whose 4-tap stencil touches out-of-range is NaN —
    up to 2 px trailing plus a 1-px negative-lobe ring wider.  The
    old signed-weight test produced silently un-normalized values on
    that ring; NaN-aware consumers should expect the extra ring.
    """
    out = src.astype(jnp.float32)
    shifts = jnp.asarray(shifts, dtype=jnp.float32)
    ndim = out.ndim
    if clamp_range:
        lo_v, hi_v = jnp.nanmin(out), jnp.nanmax(out)
    if border_nan == "min":
        fill = jnp.min(out)
    elif border_nan is True:
        fill = jnp.nan
    else:
        fill = None  # "copy" / "reflect" / False need no constant
    for d in range(ndim):
        n = out.shape[d]
        s = shifts[d]
        base = jnp.floor(-s)
        f = -s - base
        w = _keys_cubic_weights(f)
        idx0 = jnp.arange(n) + base.astype(jnp.int32)
        acc = jnp.zeros_like(out)
        fill_w = jnp.zeros((n,), jnp.float32)  # constant-border weight
        fill_any = jnp.zeros((n,), jnp.float32)  # |weight| of OOB taps
        for m in range(-1, 3):
            idx = idx0 + m
            if border_nan is False:
                tap = jnp.take(out, jnp.mod(idx, n), axis=d)
            elif border_nan == "copy":
                tap = jnp.take(out, jnp.clip(idx, 0, n - 1), axis=d)
            elif border_nan == "reflect":
                # cv2.BORDER_REFLECT: fedcba|abcdef|fedcba — reflect
                # about the array edge WITH the edge sample duplicated.
                period = 2 * n
                im = jnp.mod(idx, period)
                im = jnp.where(im >= n, period - 1 - im, im)
                tap = jnp.take(out, im, axis=d)
            else:
                # Constant border: accumulate the out-of-range weight
                # separately and add `fill` ONCE at the end — weighting
                # a NaN fill per-tap would poison zero-weight taps
                # (0 * nan = nan).
                valid = (idx >= 0) & (idx < n)
                tap = jnp.take(out, jnp.clip(idx, 0, n - 1), axis=d)
                sd = [1] * ndim
                sd[d] = n
                tap = jnp.where(valid.reshape(sd), tap, 0.0)
                # Signed sum for the constant blend (weights must total
                # 1); magnitude sum for the NaN mask — Keys weights go
                # negative, so a signed test would miss (or cancel away)
                # out-of-range taps.
                fill_w = fill_w + jnp.where(valid, 0.0, w[m + 1])
                fill_any = fill_any + jnp.where(
                    valid, 0.0, jnp.abs(w[m + 1]))
            acc = acc + w[m + 1] * tap
        if fill is not None:
            sd = [1] * ndim
            sd[d] = n
            # Where any border weight accrued, blend in the constant;
            # a NaN fill must override the partial sum entirely.
            if border_nan is True:
                acc = jnp.where((fill_any > 0).reshape(sd), jnp.nan, acc)
            else:
                acc = acc + (fill_w.reshape(sd)) * fill
        out = acc
    if clamp_range:
        out = jnp.clip(out, lo_v, hi_v)  # NaNs pass through unchanged
    return out


def bin_median(video: jnp.ndarray, window: int = 10,
               exclude_nans: bool = True) -> jnp.ndarray:
    """Template initializer: median over window-binned means
    (reference ``bin_median``/``bin_median_3d``, ``:432-494``).

    Args:
      video: ``[T, ...spatial]``.
    """
    t = video.shape[0]
    window = min(window, t)
    num_windows = t // window
    num_frames = num_windows * window
    binned = video[:num_frames].reshape(
        (window, num_windows) + video.shape[1:]
    )
    if exclude_nans:
        return jnp.nanmedian(jnp.nanmean(binned, axis=0), axis=0)
    return jnp.median(jnp.mean(binned, axis=0), axis=0)


def registration_error(cross_correlation_max, src_amp, target_amp):
    """Translation-invariant normalized RMS error between registered
    images (reference ``_compute_error``, ``:628-644``)."""
    err = 1.0 - (
        cross_correlation_max * jnp.conj(cross_correlation_max)
        / (src_amp * target_amp)
    )
    return jnp.sqrt(jnp.abs(err))
