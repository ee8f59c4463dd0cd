"""Inverse warping by windowed nearest-neighbor search.

The reference inverse-warps each frame with
``scipy.interpolate.NearestNDInterpolator`` over all P deformed points
(``ExponentialFP.image_iwarp``, ``/root/reference/Demix/dNMF.py:96-103``)
— an O(P log P) host-side KD-tree per frame.  On TPU we exploit that the
deformation is a smooth, small displacement: the source voxel nearest to
an output location ``g`` lies within a small index-space window around
``g``.  Searching a static ``(2r+1)^3`` window is exact whenever
``max displacement < r`` and is a fully vectorized gather + running min.
"""

from __future__ import annotations

import jax.numpy as jnp

from dnmf_tpu.ops.basis import voxel_grid


def inverse_warp_nearest(
    values: jnp.ndarray,
    psi: jnp.ndarray,
    size,
    radius: int = 2,
) -> jnp.ndarray:
    """Nearest-neighbor inverse warp of one frame.

    Voxel ``p`` carries ``values[p]`` at deformed position ``psi[p]``;
    the output at voxel location ``g`` takes the value whose deformed
    position is nearest to ``g`` (searching source voxels within a
    ``(2*radius+1)^3`` window of ``g``).

    Args:
      values: ``[P]`` frame values (flattened voxels).
      psi: ``[P, 3]`` deformed voxel coordinates.
      size: ``(M, N, Z)``.
      radius: index-space search radius; exact for displacements < radius.

    Returns:
      ``[P]`` inverse-warped frame.
    """
    m, n, z = (int(s) for s in size)
    grid = voxel_grid(size)  # [P, 3] output locations
    dims = jnp.asarray([m, n, z], dtype=jnp.int32)
    gi = grid.astype(jnp.int32)

    best_d = jnp.full((grid.shape[0],), jnp.inf, dtype=psi.dtype)
    best_v = jnp.zeros_like(values)
    rz = min(radius, z - 1)
    for dx in range(-radius, radius + 1):
        for dy in range(-radius, radius + 1):
            for dz in range(-rz, rz + 1):
                cand = gi + jnp.asarray([dx, dy, dz], dtype=jnp.int32)
                valid = jnp.all((cand >= 0) & (cand < dims), axis=-1)
                cc = jnp.clip(cand, 0, dims - 1)
                idx = (cc[:, 0] * n + cc[:, 1]) * z + cc[:, 2]
                d = jnp.sum((jnp.take(psi, idx, axis=0) - grid) ** 2, -1)
                d = jnp.where(valid, d, jnp.inf)
                take = d < best_d
                best_d = jnp.where(take, d, best_d)
                best_v = jnp.where(take, jnp.take(values, idx), best_v)
    return best_v
