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

    Args:
      volume: ``[M, N, Z]``.
      shifts: ``[M, N, Z, 3]`` per-axis displacement field.
      max_shift: static per-axis bound ``(S_m, S_n, S_z)`` on
        ``|shifts|`` (shifts are clipped to it).

    Returns:
      ``[M, N, Z]`` warped volume.
    """
    out = volume
    for a in range(3):
        s_bound = int(max_shift[a])
        if s_bound == 0:
            continue
        s = jnp.clip(shifts[..., a], -s_bound, s_bound)
        pad = [(0, 0)] * 3
        pad[a] = (s_bound, s_bound + 1)
        padded = jnp.pad(out, pad, mode="edge")
        acc = jnp.zeros_like(out)
        for o in range(-s_bound, s_bound + 2):
            w = jnp.maximum(0.0, 1.0 - jnp.abs(s - o))
            start = [0] * 3
            start[a] = o + s_bound
            limit = list(padded.shape)
            limit[a] = start[a] + out.shape[a]
            acc = acc + w * jax.lax.slice(padded, start, limit)
        out = acc
    return out
