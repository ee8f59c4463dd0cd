"""Closed-form Jacobian of the quadratic deformation + log-det regularizer.

The regularizer discourages volume-collapsing/folding deformations by
penalizing ``log|det J_beta(p)|^2`` at the volume corners ``p = 0`` and
``p = size - 1`` (reference ``/root/reference/Demix/dNMF.py:60-61,108-122``).

Two deliberate fixes over the reference (recorded in SURVEY.md §2.4):

* The reference builds the per-frame regularizer with ``torch.tensor([...])``
  which detaches it from autograd — it affects the printed loss only.  Here
  the regularizer is differentiable by default (``detach=True`` reproduces
  the reference's no-gradient behavior via ``stop_gradient``).
* The reference's hand-derived Jacobian entries assume the cross-term basis
  ordering ``[..., xy, yz, xz]`` while its own ``quadratic_basis`` produces
  ``[..., xy, xz, yz]`` (coefficients 8 and 9 swapped in the derivative
  terms, ``/root/reference/Demix/dNMF.py:111-119``).  This module derives
  the Jacobian for the actual basis ordering and is cross-checked against
  ``jax.jacfwd`` in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quadratic_jacobian(beta: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Jacobian ``J[i, j] = d warp_i / d p_j`` of the quadratic map.

    Args:
      beta: ``[10, 3]`` coefficients over basis
        ``[1, x, y, z, x^2, y^2, z^2, xy, xz, yz]``.
      point: ``[3]`` evaluation point.

    Returns:
      ``[3, 3]`` Jacobian (rows: output dims, cols: input dims).
    """
    x, y, z = point[0], point[1], point[2]
    # d phi / d(x, y, z) for the 10 basis functions.
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    dphi = jnp.stack(
        [
            jnp.stack([zero, zero, zero]),        # 1
            jnp.stack([one, zero, zero]),         # x
            jnp.stack([zero, one, zero]),         # y
            jnp.stack([zero, zero, one]),         # z
            jnp.stack([2 * x, zero, zero]),       # x^2
            jnp.stack([zero, 2 * y, zero]),       # y^2
            jnp.stack([zero, zero, 2 * z]),       # z^2
            jnp.stack([y, x, zero]),              # xy
            jnp.stack([z, zero, x]),              # xz
            jnp.stack([zero, z, y]),              # yz
        ]
    )  # [10, 3] = d phi_b / d p_j
    return beta.T @ dphi  # [3, 10] @ [10, 3] -> [3, 3]


def log_det_jacobian(beta: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """``log |det J_beta(point)|`` (scalar).

    Functional equivalent of ``ExponentialFP.log_det_jac``
    (``/root/reference/Demix/dNMF.py:108-122``) with the basis-ordering
    fix described in the module docstring.
    """
    j = quadratic_jacobian(beta, point)
    det = jnp.linalg.det(j)
    return jnp.log(jnp.abs(det) + 1e-32)


def corner_regularizer(
    beta: jnp.ndarray, size, detach: bool = False, scaling: str = "pixel"
) -> jnp.ndarray:
    """Per-frame corner regularizer.

    ``log|det J(hi)|^2 + log|det J(lo)|^2`` evaluated at the two volume
    corners — the reference's per-frame ``reg`` term
    (``/root/reference/Demix/dNMF.py:60-61``).  In pixel scaling the
    corners are ``0`` and ``size-1``; in normalized scaling they are
    ``-1`` and ``+1`` (the log-det of the pixel-space map differs from the
    normalized one only by a beta-independent similarity transform, so the
    regularizer is equivalent).

    Args:
      beta: ``[10, 3]`` (single frame) or ``[B, 10, 3]`` (batched).
      size: volume size ``(M, N, Z)``.
      detach: reproduce the reference's detached (no-gradient) behavior.
      scaling: coordinate space beta is parameterized in.
    """
    if scaling == "normalized":
        lo_pt = -jnp.ones(3, dtype=beta.dtype)
        hi_pt = jnp.ones(3, dtype=beta.dtype)
    else:
        lo_pt = jnp.zeros(3, dtype=beta.dtype)
        hi_pt = jnp.asarray(size, dtype=beta.dtype) - 1.0

    def one(b):
        hi = log_det_jacobian(b, hi_pt)
        lo = log_det_jacobian(b, lo_pt)
        return hi**2 + lo**2

    reg = jax.vmap(one)(beta) if beta.ndim == 3 else one(beta)
    if detach:
        reg = jax.lax.stop_gradient(reg)
    return reg
