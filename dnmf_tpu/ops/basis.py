"""Quadratic deformation basis and coordinate-grid helpers.

The deformation model maps a 3-D point ``p = (x, y, z)`` through a
second-order polynomial with per-frame coefficients ``beta``:

    warp(p) = phi(p) @ beta,   phi(p) in R^10,  beta in R^{10x3}

with the basis ordered ``[1, x, y, z, x^2, y^2, z^2, xy, xz, yz]`` —
the same ordering as the reference (``/root/reference/Demix/dNMF.py:47-51``
and ``/root/reference/WUtils/Simulator.py:80-94``).

Everything here is shape-static and jit/vmap friendly.  The flat voxel
basis ``Phi[P, 10]`` is precomputed once per volume size; per-frame warps
are then a single ``[P,10] @ [10,3]`` matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NUM_BASIS = 10


def quadratic_basis_points(points: jnp.ndarray) -> jnp.ndarray:
    """Quadratic basis of a point set.

    Args:
      points: ``[..., 3]`` coordinates.

    Returns:
      ``[..., 10]`` basis ``[1, x, y, z, x^2, y^2, z^2, xy, xz, yz]``.
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    one = jnp.ones_like(x)
    return jnp.stack(
        [one, x, y, z, x * x, y * y, z * z, x * y, x * z, y * z], axis=-1
    )


# Volumetric alias mirroring the reference's grid-shaped variant
# (``ExponentialFP.quadratic_basis``, ``/root/reference/Demix/dNMF.py:47-51``).
quadratic_basis = quadratic_basis_points


@functools.lru_cache(maxsize=32)
def _voxel_grid_cached(size, dtype_name):
    # Cache host-side NumPy only: caching a jnp array created inside a jit
    # trace would leak a tracer into later traces.
    import numpy as np

    m, n, z = size
    g = np.stack(
        np.meshgrid(
            np.arange(m), np.arange(n), np.arange(z), indexing="ij"
        ),
        axis=-1,
    ).astype(dtype_name)
    return g.reshape(-1, 3)


def voxel_grid(size, dtype=jnp.float32) -> jnp.ndarray:
    """Flat identity coordinate grid ``[M*N*Z, 3]`` in ij ('xy z') order.

    Equivalent to the reference's ``flow_id`` construction
    (``/root/reference/Demix/dNMF.py:22``) flattened to ``[P, 3]``.
    """
    return jnp.asarray(
        _voxel_grid_cached(tuple(int(s) for s in size),
                           jnp.dtype(dtype).name)
    )


def voxel_basis(size, dtype=jnp.float32) -> jnp.ndarray:
    """Precomputed quadratic basis of every voxel: ``[P, 10]``."""
    return quadratic_basis_points(voxel_grid(size, dtype))


def identity_beta(num_frames: int, dtype=jnp.float32) -> jnp.ndarray:
    """Per-frame identity deformation coefficients ``[T, 10, 3]``.

    Matches the reference's init (zero offset + identity linear part,
    ``/root/reference/Demix/dNMF.py:24-27``) but stored time-major so the
    time axis scans and shards naturally.
    """
    b0 = jnp.zeros((NUM_BASIS, 3), dtype=dtype).at[1, 0].set(1.0)
    b0 = b0.at[2, 1].set(1.0).at[3, 2].set(1.0)
    return jnp.broadcast_to(b0, (num_frames, NUM_BASIS, 3))


def warp_points(points: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """Apply the quadratic warp to points.

    Args:
      points: ``[..., 3]``.
      beta: ``[10, 3]`` per-frame coefficients.

    Returns:
      ``[..., 3]`` warped coordinates.
    """
    return quadratic_basis_points(points) @ beta


def invert_warp_points(points: jnp.ndarray, beta: jnp.ndarray,
                       iters: int = 3) -> jnp.ndarray:
    """Solve ``warp(x) = points`` for ``x`` by fixed-point iteration.

    The quadratic warp is a near-identity perturbation, so
    ``x <- x + (points - warp(x))`` contracts rapidly (each step squares
    the deviation scale); 3 iterations recover sub-1e-3-px inverses for
    demo-scale deformations.  Used to report apparent neuron positions —
    the model warps *coordinates* (the reference's pushforward semantics,
    ``/root/reference/Demix/dNMF.py:70-93``), so the neuron anchored at
    ``p`` appears at ``warp^{-1}(p)``.

    Args:
      points: ``[..., 3]`` target coordinates (same space as ``beta``).
      beta: ``[10, 3]`` per-frame coefficients.
      iters: fixed-point steps.

    Returns:
      ``[..., 3]`` with ``warp(result) ~= points``.
    """

    def body(x, _):
        return x + (points - warp_points(x, beta)), None

    x, _ = jax.lax.scan(body, points, None, length=iters)
    return x


def normalize_points(points: jnp.ndarray, size) -> jnp.ndarray:
    """Map pixel coordinates ``[0, size-1]`` to ``[-1, 1]``.

    The reference applies this normalization only to feed grid_sample
    (``/root/reference/Demix/dNMF.py:55``); here it is also the coordinate
    space of the default beta parameterization: with a pixel-space basis,
    Adam's uniform per-coordinate step gives quadratic coefficients
    ``O(size^2)`` leverage over offsets and the fit diverges unless the
    learning rate is tiny (the reference's lr=1e-5).  In ``[-1, 1]`` all
    10 basis terms are O(1) and conditioning is uniform.
    """
    # Singleton axes (size 1) would divide by zero; their only coordinate
    # is 0, which maps to -1 under max(size-1, 1) — and denormalize maps
    # it back to 0 exactly.
    hi = jnp.maximum(jnp.asarray(size, dtype=points.dtype) - 1.0, 1.0)
    return 2.0 * points / hi - 1.0


def denormalize_points(points: jnp.ndarray, size) -> jnp.ndarray:
    """Inverse of :func:`normalize_points`."""
    hi = jnp.maximum(jnp.asarray(size, dtype=points.dtype) - 1.0, 1.0)
    return (points + 1.0) / 2.0 * hi


def voxel_basis_normalized(size, dtype=jnp.float32) -> jnp.ndarray:
    """Quadratic basis of every voxel in normalized coordinates: ``[P, 10]``."""
    return quadratic_basis_points(
        normalize_points(voxel_grid(size, dtype), size)
    )


def warp_voxel_coords(
    voxel_basis_arr: jnp.ndarray,
    beta: jnp.ndarray,
    size,
    scaling: str,
) -> jnp.ndarray:
    """Deformed *pixel-space* coordinates of all voxels.

    Args:
      voxel_basis_arr: ``[P, 10]`` basis (pixel or normalized, matching
        ``scaling``).
      beta: ``[10, 3]``.
      scaling: ``"pixel"`` (reference parameterization) or
        ``"normalized"`` (well-conditioned default).
    """
    # HIGHEST: coordinates need full f32 — TPU default bf16 matmul
    # passes would put O(1 px) error on deformed positions.
    psi = jnp.matmul(voxel_basis_arr, beta,
                     precision=jax.lax.Precision.HIGHEST)
    if scaling == "normalized":
        psi = denormalize_points(psi, size)
    return psi


def affine_beta_from_displacements(
    points: jnp.ndarray,
    displacements: jnp.ndarray,
    size,
    scaling: str = "normalized",
    ridge: float = 1e-4,
) -> jnp.ndarray:
    """Per-frame affine deformation coefficients fitted to a displacement
    field — the registration-seeded initialization for the deformation
    fit.

    Registration reports per-patch content displacements: the blob near
    patch center ``c_i`` sits at ``q_{t,i} = c_i + d_{t,i}`` in frame t.
    The model samples footprints at warped coordinates, so the seed warp
    must map apparent positions back onto anchors: ``warp_t(q) = c``.  We
    fit the *displacement* of the warp, ``warp(x) = x + [1, x] @ G_t``,
    by ridge least squares per frame (min-perturbation around identity;
    degenerate patch grids — e.g. single-z-plane grids — stay
    well-posed).  Quadratic terms start at 0 and are learned by Adam.

    The reference's analog initializes positions only
    (``apply_shifts_points``, ``/root/reference/Demix/MotionCorrect.py:351-371``)
    and starts beta at identity for every frame — for temporally-white
    motion each frame's warp must then be found from scratch.

    Args:
      points: ``[n, 3]`` pixel-space anchor points (patch centers).
      displacements: ``[T, n, 3]`` pixel-space content displacements.
      size: volume shape.
      scaling: beta coordinate space ("normalized" or "pixel").
      ridge: Tikhonov weight (relative to n) on the affine perturbation.

    Returns:
      ``[T, 10, 3]`` coefficients.
    """
    t, n = displacements.shape[0], points.shape[0]
    base = identity_beta(t)
    if n == 0:
        return base
    q = points[None] + displacements  # [T, n, 3] apparent positions
    c = jnp.broadcast_to(points[None], q.shape)
    if scaling == "normalized":
        q = normalize_points(q, size)
        c = normalize_points(c, size)
    r = c - q  # warp displacement targets at sample points q

    if n < 4:
        # Underdetermined for an affine: translation-only seed.
        return base.at[:, 0, :].add(jnp.mean(r, axis=1))

    # Center the sample coordinates so the constant column is orthogonal
    # to the linear ones: a degenerate axis (all patch centers in one
    # z-plane) then has a zero column, and the ridge pins its linear
    # perturbation to 0 — preserving the identity along that axis
    # instead of splitting the offset into it catastrophically.
    mu = jnp.mean(q, axis=1, keepdims=True)  # [T, 1, 3]
    qc = q - mu
    ones = jnp.ones(q.shape[:2] + (1,), dtype=q.dtype)
    phi = jnp.concatenate([ones, qc], axis=-1)  # [T, n, 4]

    def solve(phi_t, r_t):
        a = phi_t.T @ phi_t + ridge * n * jnp.eye(4, dtype=phi_t.dtype)
        b = phi_t.T @ r_t
        return jnp.linalg.solve(a, b)  # [4, 3]

    g = jax.vmap(solve)(phi, r)  # displacement = g0 + (x - mu) @ g_lin
    g_lin = g[:, 1:, :]
    g0 = g[:, 0, :] - jnp.einsum("td,tdc->tc", mu[:, 0, :], g_lin)
    return base.at[:, 0, :].add(g0).at[:, 1:4, :].add(g_lin)


def _centered_quadratic_expansion(mu: jnp.ndarray) -> jnp.ndarray:
    """``[10, 10]`` matrix T with ``phi_centered_j(x) = sum_i T[j, i] phi_i(x)``
    for the basis order ``[1, x, y, z, x2, y2, z2, xy, xz, yz]`` and
    ``u = x - mu``: re-expands a polynomial fitted on centered
    coordinates into standard-basis coefficients (``coef_std = T.T @ g``).
    """
    mx, my, mz = mu[0], mu[1], mu[2]
    one = jnp.ones(())
    zero = jnp.zeros(())

    def row(c0, cx=zero, cy=zero, cz=zero, cxx=zero, cyy=zero, czz=zero,
            cxy=zero, cxz=zero, cyz=zero):
        return jnp.stack([c0, cx, cy, cz, cxx, cyy, czz, cxy, cxz, cyz])

    return jnp.stack([
        row(one),                                    # 1
        row(-mx, cx=one),                            # x - mx
        row(-my, cy=one),                            # y - my
        row(-mz, cz=one),                            # z - mz
        row(mx * mx, cx=-2 * mx, cxx=one),           # (x-mx)^2
        row(my * my, cy=-2 * my, cyy=one),           # (y-my)^2
        row(mz * mz, cz=-2 * mz, czz=one),           # (z-mz)^2
        row(mx * my, cx=-my, cy=-mx, cxy=one),       # (x-mx)(y-my)
        row(mx * mz, cx=-mz, cz=-mx, cxz=one),       # (x-mx)(z-mz)
        row(my * mz, cy=-mz, cz=-my, cyz=one),       # (y-my)(z-mz)
    ])


def quadratic_beta_from_displacements(
    points: jnp.ndarray,
    displacements: jnp.ndarray,
    size,
    scaling: str = "normalized",
    ridge: float = 1e-3,
) -> jnp.ndarray:
    """Per-frame FULL-QUADRATIC deformation coefficients fitted to a
    displacement field.

    Same contract as :func:`affine_beta_from_displacements` but fits all
    10 basis terms, so a dense patch grid seeds the quadratic component
    of the warp too (the model's deformation IS quadratic — an affine
    seed leaves the curvature of e.g. GP motion fields for Adam to find
    from scratch; VERDICT r2 #2).  Safeguards:

    * coordinates are centered per frame and each basis column is scaled
      to unit RMS before the ridge solve, so the conditioning does not
      depend on the volume's coordinate range;
    * columns with (numerically) no sample variation — constant-z patch
      grids, too-few patches for curvature — are masked out of the fit
      entirely and their coefficients pinned to 0, preserving the
      identity along unconstrained directions;
    * the centered polynomial is re-expanded exactly into standard-basis
      coefficients (:func:`_centered_quadratic_expansion`).

    Falls back to the affine behavior when fewer than 7 sample points.
    """
    t, n = displacements.shape[0], points.shape[0]
    if n < 7:
        return affine_beta_from_displacements(
            points, displacements, size, scaling=scaling)
    base = identity_beta(t)
    q = points[None] + displacements  # [T, n, 3] apparent positions
    c = jnp.broadcast_to(points[None], q.shape)
    if scaling == "normalized":
        q = normalize_points(q, size)
        c = normalize_points(c, size)
    r = c - q  # warp displacement targets at sample points q

    mu = jnp.mean(q, axis=1, keepdims=True)  # [T, 1, 3]
    phi = quadratic_basis_points(q - mu)  # [T, n, 10]
    # Column RMS over samples; the constant column keeps scale 1.
    col_rms = jnp.sqrt(jnp.mean(phi**2, axis=1, keepdims=True))  # [T,1,10]
    alive = (col_rms > 1e-6).astype(phi.dtype)
    scale = jnp.where(col_rms > 1e-6, col_rms, 1.0)
    phi_s = phi / scale * alive

    def solve(phi_t, r_t, scale_t, alive_t, mu_t):
        a = (phi_t.T @ phi_t
             + ridge * n * jnp.eye(10, dtype=phi_t.dtype))
        b = phi_t.T @ r_t
        g = jnp.linalg.solve(a, b)  # [10, 3] scaled-basis coefficients
        g = g / scale_t.reshape(10, 1) * alive_t.reshape(10, 1)
        t_mat = _centered_quadratic_expansion(mu_t)
        return t_mat.T @ g  # standard-basis coefficients

    g_std = jax.vmap(solve)(phi_s, r, scale[:, 0, :], alive[:, 0, :],
                            mu[:, 0, :])
    return base + g_std


def translation_beta(
    shifts: jnp.ndarray, size, scaling: str = "normalized"
) -> jnp.ndarray:
    """Per-frame deformation coefficients for pure translations.

    ``shifts [T, 3]`` are the *corrections* to apply (registration
    convention: content moved by ``d`` gets correction ``-d``); the model
    samples footprints at ``psi_t(x) = x + shift_t``, so the blob at
    ``p - shift`` maps onto the footprint at ``p``.  Used to seed the
    deformation fit from registration output.
    """
    t = shifts.shape[0]
    beta = identity_beta(t)
    if scaling == "normalized":
        hi = jnp.maximum(jnp.asarray(size, dtype=shifts.dtype) - 1.0, 1.0)
        offs = 2.0 * shifts / hi
    else:
        offs = shifts
    return beta.at[:, 0, :].set(offs)
