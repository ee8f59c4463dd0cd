"""Neuron seeding from summary images: local correlation x PNR.

The reference ships no detector at all (its demo positions come from
curated annotation files; ``/root/reference/demo.py:33-40``), and the
round-3 pipeline's fallback — greedy maxima on a smoothed template —
seeds poorly on real data: bright neuropil, vignetting, and bleed-
through outrank dim neurons on raw intensity (VERDICT r4 weak #4).

This module implements the standard summary-image seeder (the CNMF-E
family's correlation/PNR images) TPU-natively:

* ``summary_images`` — ONE streamed pass over the recording, jitted
  per frame block: local temporal correlation with the 6-neighborhood
  (active neurons fire coherently across adjacent voxels; smooth
  background does too, but carries no temporal peak), and
  peak-to-noise ratio (max DF over the first-difference noise floor —
  flat bleed-through has PNR ~ 0).  Device memory is a handful of
  ``[P]`` accumulators; works for arrays and streamed sources alike.
* ``detect_peaks_summary`` — vectorized local-maxima on the
  ``corr * pnr`` product image with distance suppression over the
  (small) candidate set, replacing the old Python loop over an argsort
  of ALL voxels.

The correlation image tolerates a few pixels of uncorrected motion
(neighbor coherence survives small shifts); compute it on rigid-
corrected frames when shifts are available for best results.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("size",))
def _accum_block(carry, frames, valid, size):
    """Fold one ``[B, P]`` frame block into the running moments.

    carry: ``(ref, s1, s2, sxy [3, P], sdiff2, vmax, prev, count)`` —
    a per-voxel reference level (the first block's mean; set once) plus
    sums of the CENTERED ``x' = x - ref``: x', x'^2, x' * (+1-neighbor
    x' along each axis), squared temporal first differences (prev
    carries across block boundaries), running max, and the frame
    count.  Centering makes the one-pass variance/covariance identity
    ``E[x'y'] - E[x']E[y']`` cancellation-free in f32 — uncentered
    accumulation differed by up to 5e-3 in the correlation of
    low-variance voxels ACROSS BLOCK PARTITIONS (gated in tests:
    streamed == array to 1e-5).
    """
    ref, s1, s2, sxy, sdiff2, vmax, prev, count = carry
    m, n, z = size
    b = frames.shape[0]
    mask = (jnp.arange(b) < valid).astype(frames.dtype)
    fr = frames * mask[:, None]
    ref = jnp.where(count > 0, ref,
                    jnp.sum(fr, axis=0)
                    / jnp.maximum(valid, 1).astype(frames.dtype))

    frc = (frames - ref[None]) * mask[:, None]
    s1 = s1 + jnp.sum(frc, axis=0)
    s2 = s2 + jnp.sum(frc * frc, axis=0)
    vmax = jnp.maximum(vmax, jnp.max(
        jnp.where(mask[:, None] > 0, frames, -jnp.inf), axis=0))

    vol = frc.reshape(b, m, n, z)
    nb = []
    for d in range(3):
        rolled = jnp.roll(vol, -1, axis=1 + d)
        nb.append(jnp.sum((vol * rolled).reshape(b, -1), axis=0))
    sxy = sxy + jnp.stack(nb, axis=0)

    # Temporal first differences, chained through prev across blocks.
    shifted = jnp.concatenate([prev[None], fr[:-1]], axis=0)
    dmask = mask * jnp.concatenate(
        [jnp.asarray([count > 0], frames.dtype),
         mask[:-1]])  # first-ever frame has no predecessor
    diff = (fr - shifted) * dmask[:, None]
    sdiff2 = sdiff2 + jnp.sum(diff * diff, axis=0)
    # Last VALID frame becomes the next block's predecessor.
    last = jnp.clip(valid - 1, 0, b - 1)
    prev = jax.lax.dynamic_index_in_dim(fr, last, axis=0,
                                        keepdims=False)
    return (ref, s1, s2, sxy, sdiff2, vmax, prev, count + valid)


@functools.partial(jax.jit, static_argnames=("size",))
def _accum_block_shifted(carry, frames, valid, shifts, size):
    """Rigid-correct a ``[B, P]`` block (per-frame translation via the
    registration apply, edge-replicated borders so no NaNs/wraps enter
    the moments) before folding it into the summary accumulators —
    seeds must live in template space, where ``apply_shifts_points``
    expects them."""
    from dnmf_tpu.ops import fft_reg

    vol = frames.reshape((-1,) + size)
    vol = jax.vmap(
        lambda f, s: fft_reg.apply_shifts_fourier(
            f, s, 0.0, border_nan="copy")
    )(vol, shifts)
    corrected = jnp.maximum(vol.reshape(frames.shape[0], -1), 0.0)
    return _accum_block(carry, corrected, valid, size)


def summary_images(video, size, frame_block: int = 16, shifts=None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Local-correlation and PNR volumes from one streamed pass.

    Args:
      video: ``[T, P]`` / ``[T, M, N, Z]`` array (NumPy or
        device-resident JAX — device arrays are sliced per block, never
        copied to host), or a streaming source (``StreamingVideo`` /
        ``RawFileVideo``) with ``blocks()``.
      size: spatial shape ``(M, N, Z)``.
      frame_block: device block size for array inputs.
      shifts: optional ``[T, 3]`` per-frame rigid correction shifts (the
        registration's ``shifts_rig`` sign convention); when given, each
        block is rigid-corrected on device before accumulation so the
        summary volumes — and the peaks detected on them — sit in
        template space rather than at time-averaged drifted positions.

    Returns:
      ``(corr [M, N, Z], pnr [M, N, Z])`` host arrays — mean Pearson
      correlation with the in-bounds +-1 neighbors, and
      ``(max - mean) / noise`` with the noise floor from temporal first
      differences (``std(diff) / sqrt(2)``, robust to slow drift).
    """
    size = tuple(int(s) for s in size)
    p = int(np.prod(size))
    zeros = jnp.zeros((p,), jnp.float32)
    carry = (zeros, zeros, zeros, jnp.zeros((3, p), jnp.float32),
             zeros, jnp.full((p,), -jnp.inf), zeros, jnp.int32(0))
    if shifts is not None:
        shifts = np.asarray(shifts, np.float32)
        if shifts.shape[1] < 3:
            shifts = np.pad(shifts,
                            ((0, 0), (0, 3 - shifts.shape[1])))

    def fold(carry, frames, start, valid):
        if shifts is None:
            return _accum_block(carry, frames, jnp.int32(valid), size)
        sh = shifts[start:start + frames.shape[0]]
        if sh.shape[0] < frames.shape[0]:  # padded tail block
            sh = np.pad(sh, ((0, frames.shape[0] - sh.shape[0]),
                             (0, 0)))
        return _accum_block_shifted(carry, frames, jnp.int32(valid),
                                    jnp.asarray(sh), size)

    if hasattr(video, "blocks") and not hasattr(video, "frames_flat"):
        for frames, start, valid in video.blocks():
            carry = fold(carry, frames, start, valid)
    else:
        t = int(np.shape(video)[0])
        on_device = isinstance(video, jnp.ndarray)
        arr = (video.reshape(t, -1) if on_device
               else np.asarray(video, np.float32).reshape(t, -1))
        for s in range(0, t, frame_block):
            blk = arr[s:s + frame_block]
            valid = int(blk.shape[0])
            blk = jnp.maximum(jnp.asarray(blk, jnp.float32), 0.0)
            if valid < frame_block:
                blk = jnp.pad(blk, ((0, frame_block - valid), (0, 0)))
            carry = fold(carry, blk, s, valid)

    ref, s1, s2, sxy, sdiff2, vmax, _prev, count = (np.asarray(c)
                                                    for c in carry)
    t = float(count)
    mean_c = (s1 / t).astype(np.float64)  # centered mean E[x - ref]
    mean = ref + mean_c
    var = np.maximum(s2 / t - mean_c * mean_c, 0.0)
    std = np.sqrt(var)

    m, n, z = size
    meanc_v = mean_c.reshape(size)
    std_v = std.reshape(size)
    corr_sum = np.zeros(size, np.float64)
    corr_cnt = np.zeros(size, np.float64)
    for d in range(3):
        exy = sxy[d].reshape(size) / t  # E[x' y'] (centered)
        std_nb = np.roll(std_v, -1, axis=d)
        cov = exy - meanc_v * np.roll(meanc_v, -1, axis=d)
        denom = std_v * std_nb
        c = np.where(denom > 1e-12, cov / np.maximum(denom, 1e-12),
                     0.0)
        sl = [slice(None)] * 3
        sl[d] = slice(0, size[d] - 1)  # wrapped last plane is invalid
        sl = tuple(sl)
        corr_sum[sl] += c[sl]
        corr_cnt[sl] += 1.0
        sr = [slice(None)] * 3
        sr[d] = slice(1, size[d])  # the same pair, seen from +1 side
        corr_sum[tuple(sr)] += c[sl]
        corr_cnt[tuple(sr)] += 1.0
    corr = (corr_sum / np.maximum(corr_cnt, 1.0)).astype(np.float32)

    noise = np.sqrt(np.maximum(sdiff2 / (2.0 * max(t - 1.0, 1.0)),
                               1e-12))
    pnr = ((vmax - mean) / noise).reshape(size).astype(np.float32)
    pnr = np.where(np.isfinite(pnr), pnr, 0.0)
    return corr, pnr


def detect_peaks_summary(
    corr: np.ndarray,
    pnr: np.ndarray,
    num_peaks: int,
    min_distance: float = 4.0,
    min_corr: float = 0.5,
    min_pnr: float = 2.0,
    smooth_sigma: float = 1.0,
) -> np.ndarray:
    """Top-``num_peaks`` seeds on the ``corr * pnr`` image.

    Vectorized: candidates are the local maxima of the smoothed score
    volume within a ``min_distance`` window that clear BOTH thresholds
    (an OR would re-admit bright-but-flat bleed-through); suppression
    then runs over that small set only.  When the suppressed
    threshold-passing set is short of ``num_peaks``, confirmed peaks
    KEEP their slots and the remainder tops up from progressively
    weaker tiers (sub-threshold maxima, then a bounded score-ranked
    voxel scan for degenerate volumes) — never displacing a peak that
    cleared both thresholds with one that did not.

    Returns ``[K', 3]`` float coordinates, score-sorted within tiers,
    ``K' <= num_peaks`` (short only when ``min_distance`` packing makes
    the request infeasible).
    """
    from scipy.ndimage import gaussian_filter, maximum_filter

    score = gaussian_filter(
        np.asarray(corr, np.float64) * np.asarray(pnr, np.float64),
        smooth_sigma)
    w = max(int(np.floor(min_distance)), 1)
    local_max = score >= maximum_filter(score, size=2 * w + 1,
                                        mode="nearest")
    good = local_max & (corr >= min_corr) & (pnr >= min_pnr)

    def ranked(mask):
        cand = np.argwhere(mask)
        order = np.argsort(score[tuple(cand.T)])[::-1]
        return cand[order].astype(np.float64)

    def suppress(chosen, cand):
        for c in cand:
            if len(chosen) == num_peaks:
                break
            if len(chosen) == 0 or (
                    np.linalg.norm(
                        np.asarray(chosen) - c[None], axis=1)
                    >= min_distance).all():
                chosen.append(c)
        return chosen

    chosen = suppress([], ranked(good))
    if len(chosen) < num_peaks:
        # Tier 2: sub-threshold local maxima with positive score.
        chosen = suppress(chosen, ranked(local_max & ~good
                                         & (score > 0)))
    if len(chosen) < num_peaks:
        # Tier 3 (degenerate volumes — flat/blank score): best
        # remaining voxels by score, scan bounded so the pathological
        # case stays cheap.
        flat = np.argsort(score.reshape(-1))[::-1]
        flat = flat[:max(200 * num_peaks, 10_000)]
        cand = np.stack(np.unravel_index(flat, score.shape),
                        axis=1).astype(np.float64)
        chosen = suppress(chosen, cand)
    if not chosen:
        return np.empty((0, 3), np.float64)
    return np.stack(chosen)
