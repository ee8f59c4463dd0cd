"""Analytic Gaussian footprint evaluation — the TPU hot path.

The reference stores a footprint volume
``A[m,n,z,k] = exp(-sum_d (x_d - p_{kd})^2 / sigma_k^2)``
(``/root/reference/Demix/dNMF.py:39-40`` — note: no factor 2 in the
denominator) and warps it per frame through ``F.grid_sample``
(``:56-57``).  Because the footprint is an *analytic* function of
(position, sigma), this rebuild evaluates it directly at the deformed
coordinates ``psi = warp_beta(x)``:

    A_t[p, k] = exp(-||psi_p - pos_k||^2 / sigma_k^2)

which is exact (no trilinear interpolation error), requires no stored
volume, and exposes two equivalent compute formulations:

* ``direct``  — broadcast/subtract/exp; numerically stable (no
  large-coordinate cancellation), fuses into a single VPU loop under XLA.
* ``matmul``  — the exponent is affine in ``[psi, ||psi||^2]``:
      E = psi_aug @ W + b,
      psi_aug = [x, y, z, x^2+y^2+z^2]         ([P, 4])
      W = [2 p / sigma^2 ; -1/sigma^2]          ([4, K])
      b = -||p||^2 / sigma^2                    ([K])
  so evaluation rides the MXU.  Preferred inside fused Pallas kernels
  where the matmul feeds the systolic array directly.

Out-of-bounds masking emulates the resampler's zero padding: where the
deformed coordinate leaves ``[0, size-1]`` the footprint is zeroed (the
reference's grid_sample fades linearly into zeros over the last voxel;
the parity-exact path lives in :mod:`dnmf_tpu.ops.resample`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def gaussian_footprints(
    grid: jnp.ndarray,
    pos: jnp.ndarray,
    sigma: jnp.ndarray,
) -> jnp.ndarray:
    """Evaluate Gaussian footprints at given coordinates.

    Args:
      grid: ``[P, 3]`` coordinates (usually the identity voxel grid).
      pos: ``[K, 3]`` neuron centers.
      sigma: ``[K]`` per-neuron standard deviations, or ``[K, 3]``
        PER-AXIS widths (anisotropic footprints — beyond the reference's
        model class, whose sigma is one frozen scalar,
        ``/root/reference/Demix/dNMF.py:29``; its own rotating-cell
        fixture renders cells with cov diag(7, 2, 1e-6),
        ``/root/reference/WUtils/Simulator.py:244-285``, that no
        isotropic footprint represents).

    Returns:
      ``[P, K]`` footprint stack; matches the reference's ``self.A``
      (``/root/reference/Demix/dNMF.py:39-40``) flattened over voxels.
    """
    d = grid[:, None, :] - pos[None, :, :]
    if sigma.ndim == 2:
        expo = -jnp.sum((d * d) / (sigma * sigma)[None, :, :], axis=-1)
    else:
        expo = -jnp.sum(d * d, axis=-1) / (sigma[None, :] ** 2)
    return jnp.exp(expo)


def gaussian_weights(pos: jnp.ndarray, sigma: jnp.ndarray):
    """Affine exponent parameterization for the MXU formulation.

    Isotropic ``sigma [K]``: returns ``(W [4, K], b [K])`` such that
    ``exponent = [psi, ||psi||^2] @ W + b``.
    Anisotropic ``sigma [K, 3]``: returns ``(W [6, K], b [K])`` against
    the augmented row ``[psi, psi^2]`` (per-axis squares).
    """
    if sigma.ndim == 2:
        inv_s2 = 1.0 / (sigma * sigma)  # [K, 3]
        w_lin = 2.0 * pos.T * inv_s2.T  # [3, K]
        w_quad = -inv_s2.T  # [3, K]
        w = jnp.concatenate([w_lin, w_quad], axis=0)  # [6, K]
        b = -jnp.sum(pos * pos * inv_s2, axis=-1)  # [K]
        return w, b
    inv_s2 = 1.0 / (sigma**2)  # [K]
    w_lin = 2.0 * pos.T * inv_s2[None, :]  # [3, K]
    w_quad = -inv_s2[None, :]  # [1, K]
    w = jnp.concatenate([w_lin, w_quad], axis=0)  # [4, K]
    b = -jnp.sum(pos * pos, axis=-1) * inv_s2  # [K]
    return w, b


def _bounds_mask(psi: jnp.ndarray, size) -> jnp.ndarray:
    """``[P, 1]`` border fade: 1 inside, linear ramp to 0 across the border.

    Matches ``grid_sample`` zero-padding semantics for a constant volume:
    a sample at distance ``d`` outside the border keeps weight
    ``max(0, 1 - d)`` per axis (the in-bounds corner weights).  A hard
    step mask here would make the loss discontinuous in beta — with thin
    volumes (e.g. Z=2) every voxel is a border voxel in z and gradient
    descent on the deformation breaks.
    """
    hi = jnp.asarray(size, dtype=psi.dtype) - 1.0
    dist_in = jnp.minimum(psi, hi[None, :] - psi)  # >=0 inside
    w = jnp.clip(1.0 + dist_in, 0.0, 1.0)
    return jnp.prod(w, axis=-1, keepdims=True)


def evaluate_footprints(
    psi: jnp.ndarray,
    pos: jnp.ndarray,
    sigma: jnp.ndarray,
    size=None,
    mask_out_of_bounds: bool = True,
    formulation: str = "direct",
    precision=None,
) -> jnp.ndarray:
    """Evaluate warped footprints ``A_t[p, k]`` at deformed coordinates.

    Args:
      psi: ``[P, 3]`` deformed voxel coordinates (``warp_points`` output).
      pos: ``[K, 3]`` neuron centers (undeformed frame-0 positions).
      sigma: ``[K]`` footprint widths, or ``[K, 3]`` per-axis widths.
      size: volume size ``(M, N, Z)``; required if masking.
      mask_out_of_bounds: zero footprints where psi leaves the volume.
      formulation: ``"direct"`` (VPU, stable) or ``"matmul"`` (MXU).
      precision: lax matmul precision for the matmul formulation.

    Returns:
      ``[P, K]`` warped footprint stack.
    """
    if formulation == "matmul":
        w, b = gaussian_weights(pos, sigma)
        psi_aug = jnp.concatenate(
            [psi, psi * psi] if sigma.ndim == 2
            else [psi, jnp.sum(psi * psi, axis=-1, keepdims=True)],
            axis=-1,
        )
        expo = (
            jnp.dot(psi_aug, w, precision=precision,
                    preferred_element_type=psi.dtype)
            + b[None, :]
        )
        a = jnp.exp(expo)
    elif formulation == "direct":
        a = gaussian_footprints(psi, pos, sigma)
    else:
        raise ValueError(f"unknown formulation: {formulation!r}")

    if mask_out_of_bounds:
        if size is None:
            raise ValueError("size is required when mask_out_of_bounds=True")
        a = a * _bounds_mask(psi, size)
    return a


def fused_reconstruction(
    psi: jnp.ndarray,
    pos: jnp.ndarray,
    sigma: jnp.ndarray,
    c_t: jnp.ndarray,
    size=None,
    mask_out_of_bounds: bool = True,
    formulation: str = "direct",
) -> jnp.ndarray:
    """One-frame reconstruction ``recon[p] = sum_k A_t[p,k] * c_t[k]``.

    Functional equivalent of the reference's
    ``einsum('tkmnz,kt->tmnz', A_t, C)`` (``/root/reference/Demix/dNMF.py:58``)
    for a single frame, with the footprints evaluated on the fly.
    """
    a = evaluate_footprints(
        psi, pos, sigma, size=size, mask_out_of_bounds=mask_out_of_bounds,
        formulation=formulation,
    )
    return a @ c_t


def reconstruct_frames(
    betas: jnp.ndarray,
    c: jnp.ndarray,
    pos: jnp.ndarray,
    sigma: jnp.ndarray,
    size,
    basis: Optional[jnp.ndarray] = None,
    mask_out_of_bounds: bool = True,
    formulation: str = "direct",
) -> jnp.ndarray:
    """Batched reconstruction of a block of frames.

    Args:
      betas: ``[B, 10, 3]`` per-frame deformation coefficients.
      c: ``[B, K]`` per-frame trace values.
      pos: ``[K, 3]``; sigma: ``[K]``.
      size: ``(M, N, Z)``.
      basis: optional precomputed voxel basis ``[P, 10]``.

    Returns:
      ``[B, P]`` reconstructed frames (flattened voxels).
    """
    from dnmf_tpu.ops.basis import voxel_basis

    if basis is None:
        basis = voxel_basis(size, dtype=betas.dtype)

    def one(beta_t, c_t):
        psi = basis @ beta_t  # [P, 3]
        return fused_reconstruction(
            psi, pos, sigma, c_t, size=size,
            mask_out_of_bounds=mask_out_of_bounds, formulation=formulation,
        )

    return jax.vmap(one)(betas, c)
