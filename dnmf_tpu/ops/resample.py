"""Trilinear volume resampling with ``grid_sample`` border semantics.

Parity path for the reference's warped-footprint evaluation
(``F.grid_sample(..., align_corners=True)`` with default zero padding,
``/root/reference/Demix/dNMF.py:56-57``): the footprint volume is sampled
at deformed *voxel-unit* coordinates; each of the 8 surrounding lattice
corners contributes ``weight * value`` and corners outside the volume
contribute zero, so samples fade linearly into zeros across the border.

The reference feeds normalized coordinates ``2*psi/(size-1) - 1`` to
grid_sample; with ``align_corners=True`` that round-trips to sampling at
the raw coordinate ``psi``, so this implementation takes voxel-unit
coordinates directly.

Implemented as 8 masked XLA gathers over the flattened volume — fully
vmappable over frames/channels and TPU-friendly (static shapes, no
scatter).  Also used as the generic ``remap`` primitive by the
registration stack.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def trilinear_resample(
    volume: jnp.ndarray,
    coords: jnp.ndarray,
    padding: str = "zeros",
) -> jnp.ndarray:
    """Sample a volume at fractional coordinates with trilinear weights.

    Args:
      volume: ``[M, N, Z]`` or ``[M, N, Z, C]`` values.
      coords: ``[Q, 3]`` voxel-unit sample locations (x -> M axis,
        y -> N axis, z -> Z axis).
      padding: ``"zeros"`` (grid_sample default: out-of-bounds corners
        contribute 0) or ``"edge"`` (clamp to border voxel).

    Returns:
      ``[Q]`` or ``[Q, C]`` sampled values.
    """
    squeeze = volume.ndim == 3
    if squeeze:
        volume = volume[..., None]
    m, n, z, c = volume.shape
    flat = volume.reshape(-1, c)

    if padding == "edge":
        coords = jnp.clip(
            coords,
            0.0,
            jnp.asarray([m - 1, n - 1, z - 1], dtype=coords.dtype),
        )

    lo = jnp.floor(coords)
    frac = coords - lo
    lo = lo.astype(jnp.int32)

    out = jnp.zeros((coords.shape[0], c), dtype=volume.dtype)
    dims = jnp.asarray([m, n, z], dtype=jnp.int32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corner = lo + jnp.asarray([dx, dy, dz], dtype=jnp.int32)
                w = (
                    jnp.where(dx, frac[:, 0], 1.0 - frac[:, 0])
                    * jnp.where(dy, frac[:, 1], 1.0 - frac[:, 1])
                    * jnp.where(dz, frac[:, 2], 1.0 - frac[:, 2])
                )
                valid = jnp.all(
                    (corner >= 0) & (corner < dims[None, :]), axis=-1
                )
                cc = jnp.clip(corner, 0, dims[None, :] - 1)
                idx = (cc[:, 0] * n + cc[:, 1]) * z + cc[:, 2]
                vals = jnp.take(flat, idx, axis=0)
                out = out + jnp.where(
                    valid[:, None], w[:, None] * vals, 0.0
                )

    return out[:, 0] if squeeze else out


def resample_footprints(
    footprints: jnp.ndarray,
    psi: jnp.ndarray,
    size,
) -> jnp.ndarray:
    """Warp a footprint stack by sampling at deformed coordinates.

    Parity equivalent of the reference forward's grid_sample call for one
    frame: ``A_t[p, k] = trilinear(A[..., k], psi_p)``.

    Args:
      footprints: ``[P, K]`` flattened footprint volumes (``P = M*N*Z``).
      psi: ``[P, 3]`` deformed voxel coordinates.
      size: ``(M, N, Z)``.

    Returns:
      ``[P, K]`` warped footprints.
    """
    m, n, z = (int(s) for s in size)
    vol = footprints.reshape(m, n, z, -1)
    return trilinear_resample(vol, psi, padding="zeros")


def separable_warp(
    volume: jnp.ndarray,
    shifts: jnp.ndarray,
    max_shift,
    base=None,
    base_bound=None,
) -> jnp.ndarray:
    """Gather-free warp for smooth, statically-bounded shift fields.

    ``output(x) ~= volume[x + shifts(x)]`` (edge-clamped), computed as
    three sequential per-axis 1-D linear interpolations.  Each pass is a
    partition-of-unity hat-weighted sum over the *static* integer offset
    range ``[-S_a, S_a + 1]`` — pure aligned slices and elementwise
    multiply-adds, no gathers.  TPU motivation: XLA lowers fractional
    gathers (``jnp.take`` / ``map_coordinates`` style) to per-element
    DMAs — ~800 ms/frame for a full 512x512x20 remap — while this form
    runs at VPU/HBM speed (~2 orders of magnitude faster).

    Exactness: each pass interpolates with weights evaluated on the
    pre-shift lattice rather than at the jointly-displaced point, so the
    result is EXACT for locally constant shift fields and carries a
    positional error of O(|ds/dx| * |s|) for smooth ones — for
    piecewise-rigid registration fields (bounded by
    ``max_shifts + max_deviation_rigid``, varying over patch-stride
    scales) that is <~0.1 px, well under the shift-estimation noise.
    Use :func:`trilinear_resample` where exact reference (cv2.remap)
    semantics are required.

    The offset loop is the cost: each pass reads/writes the full volume
    once per offset.  When the field is a bounded deviation around a
    known (traced) constant — piecewise-rigid fields deviate at most
    ``max_deviation_rigid`` from the rigid shift — pass ``base``: the
    integer part of the constant moves into the *slice start*
    (``dynamic_slice`` with a traced offset costs one DMA, same as a
    static slice) and the loop covers only the residual range.  At
    512x512x20 with ``max_shifts=6``/deviation 3 this cuts the offsets
    per axis from 28 to 12.

    Args:
      volume: ``[M, N, Z]``.
      shifts: ``[M, N, Z, 3]`` per-axis displacement field.
      max_shift: static per-axis bound ``(S_m, S_n, S_z)``; without
        ``base`` it bounds ``|shifts|``, with ``base`` it bounds the
        residual ``|shifts - base|`` (fields are clipped to it).
      base: optional ``[3]`` traced per-axis constant component (e.g.
        the frame's rigid shift).
      base_bound: static per-axis bound on ``|base|`` (required with
        ``base``; e.g. ``max_shifts + 1``).

    Returns:
      ``[M, N, Z]`` warped volume.
    """
    out = volume
    for a in range(3):
        s_bound = int(max_shift[a])
        if base is None:
            if s_bound == 0:
                continue
            s = jnp.clip(shifts[..., a], -s_bound, s_bound)
            r = s_bound
            lo_off = -r
            padded = jnp.pad(
                out, [(r, r + 1) if d == a else (0, 0) for d in range(3)],
                mode="edge",
            )
        else:
            bb = int(base_bound[a])
            if s_bound == 0 and bb == 0:
                continue  # identity axis (e.g. z of a 2-D field)
            b_int = jnp.clip(
                jnp.floor(base[a]).astype(jnp.int32), -bb, bb
            )
            s = jnp.clip(shifts[..., a], base[a] - s_bound,
                         base[a] + s_bound)
            # Residual relative to the integer base: in [-S-1, S+1].
            s = jnp.clip(s - b_int.astype(jnp.float32),
                         -s_bound - 1, s_bound + 1)
            r = s_bound + 1
            lo_off = -r
            # ONE dynamic slice realizes the traced integer base: a
            # window of out.shape[a] + 2r + 2 centered r + 1 past the
            # base offset, so the residual loop below runs on cheap
            # static slices (a dynamic_slice per offset measured ~3x
            # slower than the whole static-slice loop).
            big = jnp.pad(
                out,
                [(bb + r, bb + r + 2) if d == a else (0, 0)
                 for d in range(3)],
                mode="edge",
            )
            start = [0] * 3
            start[a] = b_int + bb
            win = list(out.shape)
            win[a] = out.shape[a] + 2 * r + 2
            padded = jax.lax.dynamic_slice(big, tuple(start), tuple(win))
        acc = jnp.zeros_like(out)
        for o in range(lo_off, r + 2):
            w = jnp.maximum(0.0, 1.0 - jnp.abs(s - o))
            start = [0] * 3
            start[a] = o + r
            limit = list(padded.shape)
            limit[a] = start[a] + out.shape[a]
            acc = acc + w * jax.lax.slice(padded, start, limit)
        out = acc
    return out
