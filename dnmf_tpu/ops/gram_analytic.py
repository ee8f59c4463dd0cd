"""Closed-form MU Grams: the O(P K^2) pixel reduction done in O(K^2).

The Gram matrix the reference computes per frame
(``A_ts = einsum('mnzkt,mnzlt->klt')``, ``/root/reference/Demix/dNMF.py:141``)
is, in this model, a sum of products of *analytic Gaussians* evaluated
at warped coordinates:

  G_kl = sum_x  w(psi(x))^2 exp(-|psi(x)-p_k|^2/s_k^2
                                - |psi(x)-p_l|^2/s_l^2)

The product of two Gaussians is a Gaussian: with ``c_k = 1/s_k^2``,
``c = c_k + c_l``, weighted midpoint ``m = (c_k p_k + c_l p_l)/c`` and
``gamma = c_k c_l / c``,

  G_kl = exp(-gamma |p_k - p_l|^2) * S(m, c)
  S(m, c) = sum_x w(psi(x))^2 exp(-c |psi(x) - m|^2)

Everything here is PER-AXIS under the hood (``c``, ``gamma``, ``m``
carry a trailing axis-3 dim), so ANISOTROPIC per-axis widths
``sigma [K, 3]`` — beyond the reference's frozen scalar model class —
are exactly as cheap as isotropic ``[K]``: the Gaussian-product
identity factorizes independently along each axis and the lattice sums
were already one-per-axis.

``S`` is a local property of the warp around ``x_m = psi^{-1}(m)``.
Linearizing ``psi`` there (``u_d ~= m_d + J_dd (x_d - x_{m,d})``, with
the off-diagonal mixing a second-order effect — the determinant of a
near-identity matrix equals the product of its diagonal to O(eps^2))
makes the 3-D lattice sum separable into three 1-D *windowed lattice
sums*, each evaluated EXACTLY over the true integer lattice:

  S ~= prod_d  sum_{x_d in [0, size_d) ∩ window}
                 ramp(u_d)^2 exp(-c J_dd^2 (x_d - x_{m,d})^2)

where ``ramp`` is the border fade the kernels apply
(``clip(1 + min(u, hi - u), 0, 1)``, squared because both footprints
carry it).  Summing the actual lattice (instead of a continuum
integral + erf border terms) keeps thin axes exact — the demo-scale
``z=2`` volumes sum their two real planes — and handles borders,
out-of-window truncation, and anisotropic sizes uniformly.

Approximation error by warp component (measured against the exact
path, 16x14x6 / sigma=2 with border-hugging neurons — the worst
regime; tests pin these):

* identity / pure offset / diagonal linear: ~1e-7 .. 2e-6 (exact up to
  f32 — the lattice sums carry borders, thin axes, and anisotropic
  scaling natively);
* own-axis quadratic: ~6e-5 (the per-axis sums carry the warp's own
  curvature term ``h_d`` exactly);
* constant shear eps: ~eps^2 (det(I + shear) = 1 + O(eps^2); 6.6e-4 at
  eps=0.03);
* cross-quadratic terms: the dominant residual — the axis-d border
  position then depends on the other axes, which a separable form
  cannot carry: ~8e-3 max at an exaggerated 0.03-normalized
  coefficient, concentrated on neurons < 1 px from a border.

MU iterates are insensitive at these scales (gated ~1e-3 on the MU
fixed point; the bf16-split exact kernel itself carries ~3e-6).

Why it matters: the exact Gram pass is the single most expensive kernel
at scale — 2 P K^2 FLOPs/frame (37 ms/frame at K=500, 512x512x20,
dot-bound).  The closed form costs O(K^2 * window) ~= 10^7 FLOPs/frame
(~negligible), leaving only the c1 video pass
(:func:`dnmf_tpu.ops.pallas_culled.c1_block_culled`, O(P K)).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dnmf_tpu.ops import basis as basis_ops
from dnmf_tpu.ops.jacobian import quadratic_jacobian


def _jac_diag(beta: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """``[..., 3]`` diagonal of the warp Jacobian at ``points [..., 3]``
    (in beta's own coordinate space).  Pixel-space diagonals equal
    normalized-space ones: conjugation by the per-axis scaling
    ``diag(hi/2)`` leaves diagonal entries (and the determinant)
    unchanged."""
    flat = points.reshape(-1, 3)
    jac = jax.vmap(lambda p: quadratic_jacobian(beta, p))(flat)
    return jnp.diagonal(jac, axis1=-2, axis2=-1).reshape(
        points.shape[:-1] + (3,))


def _invert_positions(pos: jnp.ndarray, beta: jnp.ndarray, size,
                      scaling: str, iters: int) -> jnp.ndarray:
    """``x_k = psi^{-1}(p_k)`` in pixel space, ``[K, 3]``."""
    if scaling == "normalized":
        pn = basis_ops.normalize_points(pos, size)
        inv = basis_ops.invert_warp_points(pn, beta, iters=iters)
        return basis_ops.denormalize_points(inv, size)
    return basis_ops.invert_warp_points(pos, beta, iters=iters)


def analytic_gram_frame(
    beta: jnp.ndarray,
    pos: jnp.ndarray,
    sigma: jnp.ndarray,
    size,
    scaling: str = "normalized",
    window: int = 16,
    iters: int = 3,
    plane_axis_max: int = 4,
) -> jnp.ndarray:
    """Closed-form ``[K, K]`` Gram for one frame's warp.

    Args:
      beta: ``[10, 3]`` warp coefficients.
      pos: ``[K, 3]`` anchor positions (pixel space).
      sigma: ``[K]`` footprint widths, or ``[K, 3]`` per-axis widths
        (anisotropic footprints — the per-axis Gaussian-product
        factorization makes them free here).
      size: volume shape ``(M, N, Z)``.
      window: half-width (in lattice steps) of the per-axis sums; must
        cover the pair Gaussian's support — ``>= ~3.3 * max(sigma)``
        for <1e-9 truncation (16 covers sigma <= ~4.8).
      iters: fixed-point iterations for ``psi^{-1}``.
      plane_axis_max: volumes whose thinnest axis has at most this many
        lattice planes decompose that axis exactly (cost/memory scale
        by its plane count; the separable line expansion cannot carry
        cross-warp variation across a 2-plane normalized axis).
    """
    size_t = tuple(int(s) for s in size)
    hi = jnp.asarray([float(s - 1) for s in size_t], jnp.float32)

    sig = sigma.astype(jnp.float32)
    if sig.ndim == 1:                                    # -> [K, 3]
        sig = jnp.broadcast_to(sig[:, None], sig.shape + (3,))
    ck = 1.0 / (sig * sig)                               # [K, 3]
    c = ck[:, None, :] + ck[None, :, :]                  # [K, K, 3]
    gamma = ck[:, None, :] * ck[None, :, :] / c          # [K, K, 3]
    wk = ck[:, None, :] / c                              # [K, K, 3]
    wl = ck[None, :, :] / c
    delta2 = (pos[:, None, :] - pos[None, :, :]) ** 2    # [K, K, 3]
    pairfac = jnp.exp(-jnp.sum(gamma * delta2, axis=-1))  # [K, K]

    m = wk * pos[:, None, :] + wl * pos[None, :, :]      # [K, K, 3]
    xk = _invert_positions(pos, beta, size_t, scaling, iters)
    xm = wk * xk[:, None, :] + wl * xk[None, :, :]       # [K, K, 3]
    # Expand each axis's 1-D warp restriction around the VOLUME-CLAMPED
    # inverse point, using the true warp value there as the base.  For
    # interior anchors xc == xm and (on the diagonal) psi(xc) == m
    # exactly, so nothing changes; for anchors outside the lattice
    # (e.g. a tracked neuron drifting past a thin-z face) the
    # contributing voxels sit several lattice units from x_m, where
    # cross/quadratic warp terms shift the OTHER axes' warped
    # coordinate by whole pixels — evaluating the expansion base and
    # Jacobian at the clamped point keeps the per-axis Gaussian centers
    # anchored to where the summed voxels actually are (measured: 33%
    # max Gram error -> ~1e-3 on a 96x64x2 volume with anchors 2.4-3.5
    # px past the z face).
    xc = jnp.clip(xm, 0.0, hi)                           # [K, K, 3]
    xc_space = (basis_ops.normalize_points(xc, size_t)
                if scaling == "normalized" else xc)
    u0 = basis_ops.warp_points(xc_space, beta)           # [K, K, 3]
    if scaling == "normalized":
        u0 = basis_ops.denormalize_points(u0, size_t)
    jdd = _jac_diag(beta, xc_space)                      # [K, K, 3]

    # Along the axis-d line through x_m the quadratic warp restricts to
    # an exact 1-D quadratic: u_d(s) = m_d + J_dd s + (h_d / 2) s^2 with
    # h_d = d^2 psi_d / dx_d^2 CONSTANT in space (2 * beta[x_d^2, d],
    # rescaled for the normalized parameterization) — so the per-axis
    # sums carry the warp's own curvature; only cross-axis mixing
    # remains approximated.
    if scaling == "normalized":
        hvec = [4.0 * beta[4 + d, d] / jnp.maximum(hi[d], 1.0)
                for d in range(3)]
    else:
        hvec = [2.0 * beta[4 + d, d] for d in range(3)]

    steps = jnp.arange(2 * window + 1, dtype=jnp.float32) - window

    def axis_sum(d, u0_d, jdd_d, xc_d, cb, m_d):
        """Windowed lattice sum along axis ``d``.  All arguments share
        a common batch shape (``[K, K]``, or ``[K, K, Z]`` in the
        plane-decomposed path); a window axis is appended internally."""
        x0 = jnp.round(xc_d)
        xs = x0[..., None] + steps                       # [..., W]
        ds = xs - xc_d[..., None]
        u = (u0_d[..., None] + jdd_d[..., None] * ds
             + 0.5 * hvec[d] * ds * ds)
        dist = jnp.minimum(u, hi[d] - u)
        ramp = jnp.clip(1.0 + dist, 0.0, 1.0)
        val = ramp * ramp * jnp.exp(
            -cb[..., None] * (u - m_d[..., None]) ** 2)
        valid = (xs >= 0.0) & (xs <= hi[d])
        return jnp.sum(jnp.where(valid, val, 0.0), axis=-1)

    thin = int(np.argmin(size_t))
    if size_t[thin] <= plane_axis_max:
        # Thin-axis plane decomposition: with only a handful of lattice
        # planes along the thinnest axis, sum that axis EXACTLY and
        # evaluate the other two axes' expansions per plane — the
        # expansion base u0/jdd then carries the thin-axis cross terms
        # exactly (on a 2-plane volume the normalized thin coordinate
        # swings across its whole [-1, 1] range between adjacent
        # planes, which a single line through x_c cannot represent).
        # Cost and memory scale by size[thin] (<= plane_axis_max).
        nz = size_t[thin]
        zvals = jnp.arange(nz, dtype=jnp.float32)
        onehot = jnp.asarray([1.0 if d == thin else 0.0
                              for d in range(3)], jnp.float32)
        xb = (xc[..., None, :] * (1.0 - onehot)
              + zvals[:, None] * onehot)                 # [K, K, Z, 3]
        xb_space = (basis_ops.normalize_points(xb, size_t)
                    if scaling == "normalized" else xb)
        u0b = basis_ops.warp_points(xb_space, beta)      # [K, K, Z, 3]
        if scaling == "normalized":
            u0b = basis_ops.denormalize_points(u0b, size_t)
        jddb = _jac_diag(beta, xb_space)                 # [K, K, Z, 3]

        ut = u0b[..., thin]                              # [K, K, Z]
        dist = jnp.minimum(ut, hi[thin] - ut)
        ramp = jnp.clip(1.0 + dist, 0.0, 1.0)
        s_planes = ramp * ramp * jnp.exp(
            -c[..., thin, None] * (ut - m[..., thin, None]) ** 2)
        zshape = s_planes.shape                          # [K, K, Z]
        for d in range(3):
            if d == thin:
                continue
            s_planes = s_planes * axis_sum(
                d, u0b[..., d], jddb[..., d],
                jnp.broadcast_to(xc[..., d, None], zshape),
                jnp.broadcast_to(c[..., d, None], zshape),
                jnp.broadcast_to(m[..., d, None], zshape),
            )
        return pairfac * jnp.sum(s_planes, axis=-1)

    s = jnp.ones_like(pairfac)
    for d in range(3):
        s = s * axis_sum(d, u0[..., d], jdd[..., d], xc[..., d],
                         c[..., d], m[..., d])
    return pairfac * s


@functools.partial(
    jax.jit,
    static_argnames=("size", "scaling", "window", "iters",
                     "plane_axis_max"),
)
def analytic_grams(
    betas: jnp.ndarray,
    pos: jnp.ndarray,
    sigma: jnp.ndarray,
    size,
    scaling: str = "normalized",
    window: int = 16,
    iters: int = 3,
    plane_axis_max: int = 4,
) -> jnp.ndarray:
    """``[T, K, K]`` closed-form Grams for a block of frame warps."""
    return jax.vmap(
        lambda b: analytic_gram_frame(
            b, pos, sigma, size, scaling=scaling, window=window,
            iters=iters, plane_axis_max=plane_axis_max)
    )(betas)


@functools.partial(
    jax.jit,
    static_argnames=("size", "scaling", "window", "iters",
                     "plane_axis_max"),
)
def analytic_grams_tracked(
    betas: jnp.ndarray,
    pos_t: jnp.ndarray,
    sigma: jnp.ndarray,
    size,
    scaling: str = "normalized",
    window: int = 16,
    iters: int = 3,
    plane_axis_max: int = 4,
) -> jnp.ndarray:
    """``[T, K, K]`` closed-form Grams with PER-FRAME positions
    (``pos_t [T, K, 3]`` — the position-refinement phase's tracked
    anchors, :func:`dnmf_tpu.ops.pallas_culled.gram_block_tracked`)."""
    return jax.vmap(
        lambda b, p: analytic_gram_frame(
            b, p, sigma, size, scaling=scaling, window=window,
            iters=iters, plane_axis_max=plane_axis_max)
    )(betas, pos_t)


def default_window(shape_std: float) -> int:
    """Window half-width covering ``exp(-2 t^2 / sigma^2) < 1e-9``
    (pair Gaussian at equal sigmas) plus linearization slack."""
    return int(np.ceil(3.3 * float(shape_std))) + 2
