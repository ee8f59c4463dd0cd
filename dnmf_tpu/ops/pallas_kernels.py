"""Fused Pallas TPU kernels for the demixing hot path.

The profiled bottleneck (bench workload 256x256x10, K=50, T=256) is HBM
traffic on the warped-footprint matrix ``A[P, K]`` (~131 MB/frame):
XLA materializes it between the exp evaluation and each consuming matmul.
These kernels evaluate ``A`` tile-by-tile **in VMEM** — voxel coordinates
are derived from the flat pixel index inside the kernel, the quadratic
warp and the Gaussian exponent are computed on the fly — and accumulate
the downstream reductions in VMEM/SMEM, so per frame the only HBM
traffic is the video frame itself plus O(K^2) outputs.

Kernels process a **block of frames natively** with grid ``(B, tiles)``
(frames in dim 0, pixel tiles in dim 1).  This is deliberate: relying on
``vmap`` to batch a single-frame kernel moves the accumulation grid axis,
breaking the ``tile == 0`` initialization of the revisited output blocks
(a silent-garbage bug in compiled mode — interpret mode zero-fills
buffers and hides it).

* ``gram_block``   — MU sufficient statistics ``G = A^T A`` ``[B, K, K]``
  and ``c1 = A^T y`` ``[B, K]``.
* ``motion_block`` — squared-error data term and its **analytic**
  gradient w.r.t. the deformation coefficients:

      recon_p = w_p * sum_k A_pk c_k,     r = recon - y
      dL/dpsi_d = 2 r [ w (B2_d - psi_d B1) + S dw/dpsi_d ]
      B1 = A @ (2 c / sigma^2),  B2_d = A @ (2 c p_d / sigma^2),
      S = A @ c
      dL/dbeta = Phi^T (dL/dpsi * dpsi_scale)

  (product rule over the border fade ``w``): the entire backward pass is
  two extra small matmuls fused into the same pixel pass — no autodiff
  residuals.

Both kernels support the ``analytic`` footprint mode with the linear
border fade (see :mod:`dnmf_tpu.ops.footprints`) and either basis
scaling.  K pads to the lane width with ``-inf`` exponents so padded
neurons contribute exact zeros; gradient ties replicate JAX autodiff
subgradient conventions (0.5 at clip/min ties), which matter on thin-Z
volumes where every voxel sits on a fade boundary.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _coords_from_flat(idx: jnp.ndarray, size) -> Tuple[jnp.ndarray, ...]:
    """(m, n, z) voxel coordinates from flat ij-ordered indices."""
    m, n, z = size
    zi = idx % z
    rest = idx // z
    ni = rest % n
    mi = rest // n
    return (mi.astype(jnp.float32), ni.astype(jnp.float32),
            zi.astype(jnp.float32))


def _phi_columns(x, y, z):
    """The 10 quadratic basis functions (reference ordering)."""
    one = jnp.ones_like(x)
    return (one, x, y, z, x * x, y * y, z * z, x * y, x * z, y * z)


def _fade_cols(psi, size):
    """Per-axis fade factor columns (3 x [tp, 1]; scalars only — no array
    constants may be captured inside a Pallas kernel)."""
    parts = []
    for d in range(3):
        hi_d = float(size[d]) - 1.0
        dist = jnp.minimum(psi[:, d:d + 1], hi_d - psi[:, d:d + 1])
        parts.append(jnp.clip(1.0 + dist, 0.0, 1.0))
    return parts


def _eval_tile(idx, beta_ref, size, scaling, total_p):
    """Shared tile evaluation: returns (psi [tp,3], phi [tp,10],
    fade w [tp,1], valid [tp,1])."""
    mi, ni, zi = _coords_from_flat(idx, size)
    if scaling == "normalized":
        xs = 2.0 * mi / (float(size[0]) - 1.0) - 1.0
        ys = 2.0 * ni / (float(size[1]) - 1.0) - 1.0
        zs = 2.0 * zi / (float(size[2]) - 1.0) - 1.0
    else:
        xs, ys, zs = mi, ni, zi
    cols = _phi_columns(xs, ys, zs)
    phi = jnp.concatenate([c for c in cols], axis=1)  # [tp, 10]
    beta = beta_ref[:]  # [10, 3]
    # HIGHEST: in pixel scaling the basis mixes O(size^2) and O(1) terms;
    # Mosaic's default dot precision is bf16 passes, which destroys the
    # cancellation.
    psi = jax.lax.dot_general(
        phi, beta, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [tp, 3]
    if scaling == "normalized":
        psi = jnp.concatenate(
            [(psi[:, d:d + 1] + 1.0) / 2.0 * (float(size[d]) - 1.0)
             for d in range(3)],
            axis=1,
        )

    w0, w1, w2 = _fade_cols(psi, size)
    w = w0 * w1 * w2  # explicit product (reduce_prod unsupported in Mosaic)
    valid = (idx < total_p).astype(jnp.float32)
    return psi, phi, w * valid, valid


def _footprint_tile(psi, pos_ref, invs2_ref):
    """Raw Gaussian tile ``exp(-sum_d (psi_d - p_kd)^2 / sigma_k^2)``.

    Direct (VPU) evaluation: the matmul form of the exponent sums
    O(coord^2)-magnitude terms that cancel — catastrophic under the
    MXU's bf16-pass default precision at pixel coordinate scales.
    """
    pos_rows = pos_ref[:]  # [3, Kp] (padding far away)
    d2 = (psi[:, 0:1] - pos_rows[0:1, :]) ** 2
    d2 += (psi[:, 1:2] - pos_rows[1:2, :]) ** 2
    d2 += (psi[:, 2:3] - pos_rows[2:3, :]) ** 2
    return jnp.exp(-d2 * invs2_ref[:])


def _gaussian_params(pos, sigma, kp):
    """Padded direct parameterization ``(pos [3,Kp], inv_s2 [1,Kp])``;
    padded neurons sit far outside the volume, so they evaluate to 0."""
    k = pos.shape[0]
    pos_rows = jnp.full((3, kp), 1e4, dtype=jnp.float32)
    pos_rows = pos_rows.at[:, :k].set(pos.T)
    inv_s2 = jnp.ones((1, kp), dtype=jnp.float32)
    inv_s2 = inv_s2.at[0, :k].set(1.0 / (sigma**2))
    return pos_rows, inv_s2


# ----------------------------------------------------------------------
# Gram kernel
# ----------------------------------------------------------------------
def _gram_kernel(beta_ref, pos_ref, invs2_ref, y_ref, g_ref, c1_ref,
                 g_acc, c1_acc, *, size, scaling, tile_p, total_p,
                 n_tiles):
    # Accumulate in VMEM scratch (persists across grid steps) and write
    # the output block exactly once per frame — accumulating directly
    # into a revisited out_ref corrupts earlier frames' blocks when the
    # outer (frame) grid dimension advances.
    tile = pl.program_id(1)

    @pl.when(tile == 0)
    def _():
        g_acc[:] = jnp.zeros_like(g_acc)
        c1_acc[:] = jnp.zeros_like(c1_acc)

    base = tile * tile_p
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (tile_p, 1), 0)
    psi, _, w, _ = _eval_tile(idx, beta_ref, size, scaling, total_p)
    a = _footprint_tile(psi, pos_ref, invs2_ref) * w  # [tp, Kp]

    g_acc[:] += jax.lax.dot_general(
        a, a, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    c1_acc[:] += jax.lax.dot_general(
        y_ref[:], a, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [1, Kp]

    @pl.when(tile == n_tiles - 1)
    def _():
        g_ref[:] = g_acc[:]
        c1_ref[:] = c1_acc[:]


@functools.partial(
    jax.jit,
    static_argnames=("size", "scaling", "tile_p", "interpret"),
)
def gram_block(
    betas: jnp.ndarray,
    pos: jnp.ndarray,
    sigma: jnp.ndarray,
    y: jnp.ndarray,
    size,
    scaling: str = "normalized",
    tile_p: int = 8192,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused MU statistics for a block of frames.

    Args:
      betas: ``[B, 10, 3]``; y: ``[B, P]``.

    Returns:
      ``(G [B, K, K], c1 [B, K])``.
    """
    bsz = betas.shape[0]
    k = pos.shape[0]
    kp = _round_up(k, LANE)
    total_p = int(np.prod(size))
    p_pad = _round_up(total_p, tile_p)
    pos_rows, invs2 = _gaussian_params(pos, sigma, kp)

    y_pad = jnp.pad(y, ((0, 0), (0, p_pad - total_p))).reshape(
        bsz, -1, 1
    )
    n_tiles = p_pad // tile_p

    g, c1 = pl.pallas_call(
        functools.partial(
            _gram_kernel, size=tuple(size), scaling=scaling,
            tile_p=tile_p, total_p=total_p, n_tiles=n_tiles,
        ),
        grid=(bsz, n_tiles),
        scratch_shapes=[
            pltpu.VMEM((kp, kp), jnp.float32),
            pltpu.VMEM((1, kp), jnp.float32),
        ],
        in_specs=[
            pl.BlockSpec((None, 10, 3), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, kp), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile_p, 1), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, kp, kp), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, kp), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, kp, kp), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, kp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(betas, pos_rows, invs2, y_pad)
    return g[:, :k, :k], c1[:, 0, :k]


def gram_frame(beta_t, pos, sigma, y, size, scaling="normalized",
               tile_p: int = 8192, interpret: bool = False):
    """Single-frame convenience wrapper around :func:`gram_block`."""
    g, c1 = gram_block(beta_t[None], pos, sigma, y[None], size,
                       scaling=scaling, tile_p=tile_p,
                       interpret=interpret)
    return g[0], c1[0]


# ----------------------------------------------------------------------
# Motion kernel (data term + analytic gradient)
# ----------------------------------------------------------------------
def _motion_kernel(beta_ref, pos_ref, invs2_ref, u5_ref, y_ref,
                   scale_ref, sse_ref, dbeta_ref, sse_acc, dbeta_acc, *,
                   size, scaling, tile_p, total_p, n_tiles):
    tile = pl.program_id(1)

    @pl.when(tile == 0)
    def _():
        sse_acc[0, 0] = 0.0
        dbeta_acc[:] = jnp.zeros_like(dbeta_acc)

    base = tile * tile_p
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (tile_p, 1), 0)
    psi, phi, w, valid = _eval_tile(idx, beta_ref, size, scaling,
                                    total_p)
    a = _footprint_tile(psi, pos_ref, invs2_ref)  # raw [tp, Kp]

    # u columns: [S, B1, B2_x, B2_y, B2_z, 0, 0, 0] (padded to 8)
    u = jax.lax.dot_general(
        a, u5_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [tp, 8]
    s = u[:, 0:1]
    b1 = u[:, 1:2]
    b2 = u[:, 2:5]

    recon = w * s
    y_tile = y_ref[:] * valid  # [tile_p, 1]
    r = (recon - y_tile) * valid
    sse_acc[0, 0] += jnp.sum(r * r)

    # Border-fade derivative: w = prod_d w_d, w_d = clip(1 + min(psi_d,
    # hi_d - psi_d), 0, 1); dw/dpsi_d = (w / w_d) * dw_d.  Ties replicate
    # JAX autodiff subgradients: clip carries 1 strictly inside the ramp,
    # 0.5 at tie points (dist == 0 lands on every lattice voxel in
    # thin-Z volumes); min(psi, hi-psi) carries 0 at its own tie.
    dist_cols, sign_cols = [], []
    for d in range(3):
        hi_d = float(size[d]) - 1.0
        pd = psi[:, d:d + 1]
        dist_cols.append(jnp.minimum(pd, hi_d - pd))
        sign_cols.append(
            jnp.where(pd == hi_d - pd, 0.0,
                      jnp.where(pd < hi_d - pd, 1.0, -1.0))
        )
    dist_in = jnp.concatenate(dist_cols, axis=1)
    sign = jnp.concatenate(sign_cols, axis=1)
    wd = jnp.clip(1.0 + dist_in, 0.0, 1.0)
    ramp_grad = jnp.where(
        (dist_in > -1.0) & (dist_in < 0.0), 1.0,
        jnp.where((dist_in == 0.0) | (dist_in == -1.0), 0.5, 0.0),
    )
    dwd = ramp_grad * sign
    w_over = jnp.where(wd > 0.0, w / jnp.maximum(wd, 1e-12), 0.0)

    dpsi = 2.0 * r * (w * (b2 - psi * b1) + s * w_over * dwd)

    if scaling == "normalized":
        dpsi = jnp.concatenate(
            [dpsi[:, d:d + 1] * ((float(size[d]) - 1.0) / 2.0)
             for d in range(3)],
            axis=1,
        )
    dpsi = dpsi * scale_ref[0, 0]

    dbeta_acc[:] += jax.lax.dot_general(
        phi, dpsi, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(tile == n_tiles - 1)
    def _():
        sse_ref[0, 0] = sse_acc[0, 0]
        dbeta_ref[:] = dbeta_acc[:]


@functools.partial(
    jax.jit,
    static_argnames=("size", "scaling", "tile_p", "interpret"),
)
def motion_block(
    betas: jnp.ndarray,
    pos: jnp.ndarray,
    sigma: jnp.ndarray,
    c_block: jnp.ndarray,
    y: jnp.ndarray,
    size,
    scaling: str = "normalized",
    tile_p: int = 8192,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused data term + analytic beta gradient for a block of frames.

    Args:
      betas: ``[B, 10, 3]``; c_block: ``[B, K]``; y: ``[B, P]``.

    Returns:
      ``(mse [B], dbeta [B, 10, 3])`` — ``mse = sum_p r^2 / P`` per frame
      with ``dbeta`` its gradient (regularizer added outside).
    """
    bsz = betas.shape[0]
    k = pos.shape[0]
    kp = _round_up(k, LANE)
    total_p = int(np.prod(size))
    p_pad = _round_up(total_p, tile_p)
    pos_rows, invs2 = _gaussian_params(pos, sigma, kp)

    inv_s2 = 1.0 / (sigma**2)
    u5 = jnp.zeros((bsz, kp, 8), dtype=jnp.float32)
    u5 = u5.at[:, :k, 0].set(c_block)
    u5 = u5.at[:, :k, 1].set(2.0 * c_block * inv_s2[None, :])
    for d in range(3):
        u5 = u5.at[:, :k, 2 + d].set(
            2.0 * c_block * (pos[:, d] * inv_s2)[None, :]
        )

    y_pad = jnp.pad(y, ((0, 0), (0, p_pad - total_p))).reshape(
        bsz, -1, 1
    )
    n_tiles = p_pad // tile_p
    scale = jnp.full((1, 1), 1.0 / total_p, dtype=jnp.float32)

    sse, dbeta = pl.pallas_call(
        functools.partial(
            _motion_kernel, size=tuple(size), scaling=scaling,
            tile_p=tile_p, total_p=total_p, n_tiles=n_tiles,
        ),
        grid=(bsz, n_tiles),
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.VMEM((10, 3), jnp.float32),
        ],
        in_specs=[
            pl.BlockSpec((None, 10, 3), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, kp), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, kp, 8), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile_p, 1), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda bi, ti: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, 1, 1), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 10, 3), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 10, 3), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(betas, pos_rows, invs2, u5, y_pad, scale)
    return sse[:, 0, 0] / total_p, dbeta


def motion_frame(beta_t, pos, sigma, c_t, y, size, scaling="normalized",
                 tile_p: int = 8192, interpret: bool = False):
    """Single-frame convenience wrapper around :func:`motion_block`."""
    mse, dbeta = motion_block(beta_t[None], pos, sigma, c_t[None],
                              y[None], size, scaling=scaling,
                              tile_p=tile_p, interpret=interpret)
    return mse[0], dbeta[0]
