"""Fused Pallas TPU kernels for the demixing hot path.

Layout: **pixels ride the lane axis**.  Every per-pixel quantity is a
``[F, tile_p]`` row block and the footprint tile is ``A [K8, tile_p]``
(``K8 = K`` rounded up to the 8-sublane), so all elementwise work uses
full VPU lanes and K pads by at most 7 — an earlier draft with
``[tile_p, K128]`` layout ran its per-pixel column math on ``[tp, 1]``
shapes (1 of 128 lanes active) and padded K to 128 lanes, costing ~10x.

**Multi-frame steps**: each grid step processes ``F`` frames (default 8,
one per sublane).  The per-pixel row math — warp polynomial, border
fade, residual, gradient rows — is the VPU-bound floor of these kernels
at moderate K, and at ``[1, tile_p]`` it ran on 1 of 8 sublanes; with
frames stacked on the sublane axis the same cycles cover 8 frames.  The
per-frame quantities (Gaussian tile, MXU dots) still run frame-at-a-time
inside the step at full shape.  Arithmetic order per frame is unchanged,
so results are identical to the single-frame form.

Per frame the only HBM traffic is the video frame plus O(K^2) outputs:
voxel coordinates are derived in-kernel from flat indices, the quadratic
warp is evaluated as coefficient-column polynomials (beta rides a
``[F, 30]`` VMEM block; per-frame coefficients are ``[F, 1]`` columns
broadcast against shared basis rows), and the Gaussian exponent is
computed directly — ``(psi - p)^2`` rows — because a matmul-form
exponent sums O(coord^2) canceling terms that Mosaic's bf16-pass default
dot precision destroys.  The remaining dots run at HIGHEST precision
(compiled output matches float64 references to ~1e-4 at whole-frame
scale; notably the *XLA* compute path's Gram matmul at default TPU
precision is ~5% off at the same scale).

Kernels process a block of frames natively with grid ``(B / F, tiles)``;
accumulators live in scratch and the output block is written exactly
once per frame group (relying on vmap batching or
accumulate-into-out_ref corrupts revisited blocks when the outer grid
dimension advances).

* ``gram_block``   — MU sufficient statistics ``G = A A^T`` ``[B, K, K]``
  and ``c1 = A y`` ``[B, K]``.
* ``motion_block`` — squared-error data term and its **analytic**
  gradient w.r.t. the deformation coefficients:

      recon_p = w_p * sum_k A_kp c_k,     r = recon - y
      dL/dpsi_d = 2 r [ w (B2_d - psi_d B1_d) + S dw/dpsi_d ]
      B1_d = (2c/s_d^2) A,  B2_d = (2 c p_d / s_d^2) A,  S = c A

  (per-axis widths ``s_d`` — anisotropic ``sigma [K, 3]`` and isotropic
  ``[K]`` share one code path; the weights dot stays 8-wide either way)

  (product rule over the border fade ``w``): the whole backward pass is
  two extra small matmuls fused into the same pixel pass — no autodiff
  residuals.  Gradient ties replicate JAX autodiff subgradient
  conventions (0.5 at clip/min ties) — they matter on thin-Z volumes
  where every voxel sits on a fade boundary.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _coord_rows(base, size, tile_p):
    """Voxel coordinates of a tile as ``[1, tile_p]`` f32 rows.

    Volumes below 2^24 voxels use float divmod: integers that size are
    exact in f32, f32 division is correctly rounded (so
    ``floor(idx / z)`` can only stray at quotients within ulp/2 of an
    integer, impossible while ``quotient * divisor < 2^24``), and the
    VPU has no native integer divide — the int path's expansion costs
    ~1 ms/frame at whole-brain scale.
    """
    m, n, z = size
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (1, tile_p), 1)
    if m * n * z + tile_p < (1 << 24):
        idxf = idx.astype(jnp.float32)
        rest = jnp.floor(idxf / z)
        zi = idxf - rest * z
        mi = jnp.floor(rest / n)
        ni = rest - mi * n
        return idx, mi, ni, zi
    zi = idx % z
    rest = idx // z
    ni = rest % n
    mi = rest // n
    return (idx, mi.astype(jnp.float32), ni.astype(jnp.float32),
            zi.astype(jnp.float32))


def _basis_rows(mi, ni, zi, size, scaling):
    """The 10 quadratic basis rows ``[1, tile_p]`` (shared by frames)."""
    if scaling == "normalized":
        # max(size-1, 1): singleton axes would divide by zero (their only
        # coordinate, 0, maps to -1 and denormalizes back to 0).
        xs = 2.0 * mi / max(float(size[0]) - 1.0, 1.0) - 1.0
        ys = 2.0 * ni / max(float(size[1]) - 1.0, 1.0) - 1.0
        zs = 2.0 * zi / max(float(size[2]) - 1.0, 1.0) - 1.0
    else:
        xs, ys, zs = mi, ni, zi
    one = jnp.ones_like(xs)
    return (one, xs, ys, zs, xs * xs, ys * ys, zs * zs, xs * ys,
            xs * zs, ys * zs)


def _beta_warp_matrix(betas, f):
    """``[B, 10, 3] -> [B/F, 3F, 10]`` warp-coefficient matrix.

    Row ``d*F + fi`` holds frame ``fi``'s coefficients for axis ``d``,
    so ``psi_all = beta_mat @ phi`` yields per-axis ``[F, tp]`` blocks
    as contiguous sublane slices.
    """
    b_pad = betas.shape[0]
    return betas.reshape(b_pad // f, f, 10, 3).transpose(
        0, 3, 1, 2
    ).reshape(b_pad // f, 3 * f, 10)


def _warp_rows_mf(beta_ref, mi, ni, zi, size, scaling, f):
    """Multi-frame warp: ``psi`` as 3 x ``[F, tp]`` (frames on sublanes).

    ``beta_ref``: VMEM ``[3F, 10]`` (see :func:`_beta_warp_matrix`).
    The whole quadratic polynomial is ONE small MXU matmul
    ``[3F, 10] @ [10, tp]`` at HIGHEST precision (coordinates need f32:
    bf16 passes would put O(1 px) error on them) — an elementwise
    coefficient-broadcast form costs ~60 full-tile VPU ops instead.
    """
    phi = _basis_rows(mi, ni, zi, size, scaling)
    phi_mat = jnp.concatenate(phi, axis=0)  # [10, tp]
    psi_all = jax.lax.dot_general(
        beta_ref[:], phi_mat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [3F, tp]
    psi = []
    for d in range(3):
        acc = psi_all[d * f:(d + 1) * f, :]
        if scaling == "normalized":
            acc = (acc + 1.0) / 2.0 * max(float(size[d]) - 1.0, 1.0)
        psi.append(acc)
    return psi, phi


def _fade_row(psi, size):
    """Border fade ``[F, tp]``: product of per-axis linear ramps."""
    w = None
    for d in range(3):
        hi_d = float(size[d]) - 1.0
        dist = jnp.minimum(psi[d], hi_d - psi[d])
        wd = jnp.clip(1.0 + dist, 0.0, 1.0)
        w = wd if w is None else w * wd
    return w


LOG2E = 1.4426950408889634  # exp(-x) == exp2(-x * log2(e))


SCALE_COLS = (3, 5, 6)  # per-axis inv_s2 * log2(e) param columns


def _per_axis_inv_s2(sigma):
    """``[K, 3]`` per-axis inverse squared widths from ``sigma [K]``
    (isotropic — the same value on every axis) or ``[K, 3]``
    (anisotropic footprints, beyond the reference's frozen-scalar model
    class, ``/root/reference/Demix/dNMF.py:29``).  Every kernel is
    per-axis natively; isotropic is the equal-widths special case, so
    there is ONE code path and no aniso branch divergence."""
    sig = sigma.astype(jnp.float32)
    if sig.ndim == 1:
        sig = jnp.broadcast_to(sig[:, None], sig.shape + (3,))
    return 1.0 / (sig * sig)


def _footprint_tile(psi, pos_ref):
    """Raw Gaussians ``A [K8, tp] = exp(-sum_d (psi_d - p_kd)^2 / s_kd^2)``.

    ``psi``: 3 x ``[1, tp]`` (a single frame's rows); ``pos_ref``:
    ``[K8, 8]`` columns ``(px, py, pz, ...)`` with the per-axis exponent
    scales ``inv_s2_d * log2(e)`` in cols ``SCALE_COLS`` (3, 5, 6);
    padded neurons sit at 1e4 with unit scales so they evaluate to
    exactly 0.  The exponent runs as ``exp2`` with log2(e) pre-folded
    into the scale columns: same math, one fewer multiply and the VPU's
    native base-2 exponential.
    """
    expo = (pos_ref[:, 0:1] - psi[0]) ** 2 * pos_ref[:, 3:4]
    expo += (pos_ref[:, 1:2] - psi[1]) ** 2 * pos_ref[:, 5:6]
    expo += (pos_ref[:, 2:3] - psi[2]) ** 2 * pos_ref[:, 6:7]
    return jnp.exp2(-expo)


def _neuron_params(pos, sigma, k8, c_block=None):
    """``[K8, 8]`` per-neuron parameter columns (see _footprint_tile).

    With ``c_block [B, K]`` given, returns ``(params [B, K8, 8],
    w2 [B, K8, 8])`` where params col 4 holds the motion-kernel trace
    weight ``c``, w2 cols 0:3 hold ``2 c p_d / s_d^2`` (the B2 weights)
    and w2 cols 3:6 hold ``2 c / s_d^2`` (the per-axis B1 weights).

    Cols ``SCALE_COLS`` carry the per-axis ``inv_s2_d * log2(e)`` —
    the exponent scales for the ``exp2``-form footprint tile
    (:func:`_footprint_tile`); ``sigma`` may be ``[K]`` or ``[K, 3]``.
    """
    k = pos.shape[0]
    inv_s2 = _per_axis_inv_s2(sigma)  # [K, 3]
    base = jnp.full((k8, 8), 0.0, dtype=jnp.float32)
    base = base.at[:, :3].set(
        jnp.pad(pos, ((0, k8 - k), (0, 0)), constant_values=1e4)
    )
    for d, col in enumerate(SCALE_COLS):
        base = base.at[:k, col].set(inv_s2[:, d] * LOG2E)
        base = base.at[k:, col].set(1.0)
    if c_block is None:
        return base
    bsz = c_block.shape[0]
    out = jnp.broadcast_to(base, (bsz, k8, 8))
    out = out.at[:, :k, 4].set(c_block)
    w2 = jnp.zeros((bsz, k8, 8), dtype=jnp.float32)
    for d in range(3):
        w2 = w2.at[:, :k, d].set(
            2.0 * c_block * (pos[:, d] * inv_s2[:, d])[None, :]
        )
        w2 = w2.at[:, :k, 3 + d].set(
            2.0 * c_block * inv_s2[None, :, d]
        )
    return out, w2


def _split_bf16(a):
    """2-term bf16 decomposition: ``a ~ hi + lo`` with ``|lo| <~ 2^-9 |a|``."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _gram_dot(a, b, dot_mode):
    """``a @ b^T`` contracting the lane (pixel) axis.

    ``dot_mode``:
      * ``"highest"`` — f32-accurate via the MXU's 6-pass bf16 emulation.
      * ``"split"``   — 2-term bf16 decomposition, 3 single passes:
        ``hi@hi + hi@lo + lo@hi`` (the dropped ``lo@lo`` term is
        ``O(2^-18)`` relative).  ~2x faster where the Gram dot dominates
        (whole-brain K); error ~1e-5 relative vs float64 — far below the
        Gram's MU-update sensitivity.
    """
    dims = (((1,), (1,)), ((), ()))
    if dot_mode == "split":
        a_hi, a_lo = _split_bf16(a)
        b_hi, b_lo = _split_bf16(b)
        dot = functools.partial(
            jax.lax.dot_general, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pad_frames(bsz, f):
    """(effective F, padded B): small blocks shrink F instead of padding
    1 frame up to 8."""
    f_eff = min(f, bsz)
    return f_eff, _round_up(bsz, f_eff)


def _frame_major(y, b_pad, f_eff, n_tiles, tile_p, total_p):
    """``[B, P] -> [B/F, tiles, F, tile_p]`` so each grid step loads a
    naturally tiled ``[F, tile_p]`` video block."""
    bsz = y.shape[0]
    p_pad = n_tiles * tile_p
    y = jnp.pad(y, ((0, b_pad - bsz), (0, p_pad - total_p)))
    return y.reshape(b_pad // f_eff, f_eff, n_tiles, tile_p).swapaxes(1, 2)


# ----------------------------------------------------------------------
# Gram kernel
# ----------------------------------------------------------------------
def _gram_kernel(off_ref, beta_ref, pos_ref, y_ref, g_ref, c1_ref, g_acc,
                 c1_acc, *, size, scaling, tile_p, p_count, n_tiles, f,
                 dot_mode):
    tile = pl.program_id(1)

    @pl.when(tile == 0)
    def _():
        g_acc[:] = jnp.zeros_like(g_acc)
        c1_acc[:] = jnp.zeros_like(c1_acc)

    off = off_ref[0, 0]
    idx, mi, ni, zi = _coord_rows(off + tile * tile_p, size, tile_p)
    psi, _ = _warp_rows_mf(beta_ref, mi, ni, zi, size, scaling, f)
    valid = (idx < off + p_count).astype(jnp.float32)
    w = _fade_row(psi, size) * valid  # [F, tp] (valid broadcasts)

    for fi in range(f):
        psi_f = tuple(p[fi:fi + 1, :] for p in psi)
        a = _footprint_tile(psi_f, pos_ref) * w[fi:fi + 1, :]  # [K8, tp]
        g_acc[fi] += _gram_dot(a, a, dot_mode)
        # c1 is a skinny [K8, tp] @ [tp, 1] — O(1/K) of the Gram dot,
        # always at HIGHEST.
        c1_acc[fi] += jax.lax.dot_general(
            a, y_ref[fi:fi + 1, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @pl.when(tile == n_tiles - 1)
    def _():
        g_ref[:] = g_acc[:]
        c1_ref[:] = c1_acc[:]


@functools.partial(
    jax.jit,
    static_argnames=("size", "scaling", "tile_p", "frames_per_step",
                     "dot_mode", "interpret"),
)
def gram_block(
    betas: jnp.ndarray,
    pos: jnp.ndarray,
    sigma: jnp.ndarray,
    y: jnp.ndarray,
    size,
    scaling: str = "normalized",
    tile_p: int = 8192,
    frames_per_step: int = 8,
    dot_mode: str = "highest",
    p_offset=None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused MU statistics for a block of frames.

    Args:
      betas: ``[B, 10, 3]``; y: ``[B, P]``.
      p_offset: optional traced voxel offset (pixel-sharded/TP path):
        ``y`` then holds the contiguous global voxel range
        ``[p_offset, p_offset + y.shape[1])`` and the returned Grams are
        partial sums over that range (``psum`` over the pixel axis
        yields the global Gram).

    Returns:
      ``(G [B, K, K], c1 [B, K])``.
    """
    bsz = betas.shape[0]
    k = pos.shape[0]
    k8 = _round_up(k, SUBLANE)
    p_count = y.shape[1]
    p_pad = _round_up(p_count, tile_p)
    n_tiles = p_pad // tile_p
    params = _neuron_params(pos, sigma, k8)
    off = jnp.zeros((1, 1), jnp.int32) if p_offset is None else (
        jnp.asarray(p_offset, jnp.int32).reshape(1, 1))

    f_eff, b_pad = _pad_frames(bsz, frames_per_step)
    beta_rows = _beta_warp_matrix(
        jnp.pad(betas, ((0, b_pad - bsz), (0, 0), (0, 0))), f_eff
    )
    y_blk = _frame_major(y, b_pad, f_eff, n_tiles, tile_p, p_count)

    g, c1 = pl.pallas_call(
        functools.partial(
            _gram_kernel, size=tuple(size), scaling=scaling,
            tile_p=tile_p, p_count=p_count, n_tiles=n_tiles, f=f_eff,
            dot_mode=dot_mode,
        ),
        grid=(b_pad // f_eff, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, ti: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 3 * f_eff, 10), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k8, 8), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, f_eff, tile_p),
                         lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((f_eff, k8, k8), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_eff, k8, 1), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k8, k8), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k8, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f_eff, k8, k8), jnp.float32),
            pltpu.VMEM((f_eff, k8, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(off, beta_rows, params, y_blk)
    return g[:bsz, :k, :k], c1[:bsz, :k, 0]


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
def _motion_kernel(off_ref, beta_ref, pos_ref, w2_ref, y_ref, sse_ref,
                   dbeta_ref, sse_acc, dbeta_acc, s_scr, b1x_scr,
                   b1y_scr, b1z_scr, b2x_scr, b2y_scr, b2z_scr, *, size,
                   scaling, tile_p, p_count, n_tiles, f):
    tile = pl.program_id(1)

    @pl.when(tile == 0)
    def _():
        sse_acc[:] = jnp.zeros_like(sse_acc)
        dbeta_acc[:] = jnp.zeros_like(dbeta_acc)

    off = off_ref[0, 0]
    idx, mi, ni, zi = _coord_rows(off + tile * tile_p, size, tile_p)
    psi, phi = _warp_rows_mf(beta_ref, mi, ni, zi, size, scaling, f)
    valid = (idx < off + p_count).astype(jnp.float32)
    w = _fade_row(psi, size) * valid  # [F, tp]

    # Per-frame row quantities via one [K8, 8] x [K8, tp] contraction on
    # the sublane axis: rows 0 = S = c A, 1:4 = B2_d = (2 c p_d/s_d^2) A,
    # 4:7 = B1_d = (2c/s_d^2) A (per-axis widths — isotropic is the
    # equal-scales case; same dot shape either way).  Stacked into
    # [F, tp] scratch so the gradient row math below vectorizes across
    # frames.
    hi_prec = jax.lax.Precision.HIGHEST
    for fi in range(f):
        psi_f = tuple(p[fi:fi + 1, :] for p in psi)
        a = _footprint_tile(psi_f, pos_ref[fi])  # [K8, tp]
        weights = jnp.concatenate(
            [pos_ref[fi, :, 4:5], w2_ref[fi, :, 0:6],
             jnp.zeros((a.shape[0], 1), dtype=jnp.float32)],
            axis=1,
        )  # [K8, 8]
        rows = jax.lax.dot_general(
            weights, a, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi_prec,
        )  # [8, tp]
        s_scr[fi:fi + 1, :] = rows[0:1, :]
        b2x_scr[fi:fi + 1, :] = rows[1:2, :]
        b2y_scr[fi:fi + 1, :] = rows[2:3, :]
        b2z_scr[fi:fi + 1, :] = rows[3:4, :]
        b1x_scr[fi:fi + 1, :] = rows[4:5, :]
        b1y_scr[fi:fi + 1, :] = rows[5:6, :]
        b1z_scr[fi:fi + 1, :] = rows[6:7, :]

    s = s_scr[:]
    b1 = (b1x_scr[:], b1y_scr[:], b1z_scr[:])
    b2 = (b2x_scr[:], b2y_scr[:], b2z_scr[:])

    recon = w * s
    r = (recon - y_ref[:] * valid) * valid  # [F, tp]
    sse_acc[:] += jnp.sum(r * r, axis=1, keepdims=True)

    # Border-fade product rule with JAX tie-subgradient conventions:
    # clip carries 1 strictly inside the ramp, 0.5 at the tie points
    # (dist == 0 lands on every lattice voxel in thin-Z volumes);
    # min(psi, hi-psi) carries 0 at its own tie.
    dpsi = []
    for d in range(3):
        hi_d = float(size[d]) - 1.0
        pd = psi[d]
        dist = jnp.minimum(pd, hi_d - pd)
        wd = jnp.clip(1.0 + dist, 0.0, 1.0)
        ramp_grad = jnp.where(
            (dist > -1.0) & (dist < 0.0), 1.0,
            jnp.where((dist == 0.0) | (dist == -1.0), 0.5, 0.0),
        )
        sign = jnp.where(pd == hi_d - pd, 0.0,
                         jnp.where(pd < hi_d - pd, 1.0, -1.0))
        w_over = jnp.where(wd > 0.0, w / jnp.maximum(wd, 1e-12), 0.0)
        dpsi_d = 2.0 * r * (
            w * (b2[d] - pd * b1[d]) + s * w_over * ramp_grad * sign
        )
        if scaling == "normalized":
            dpsi_d = dpsi_d * (max(float(size[d]) - 1.0, 1.0) / 2.0)
        dpsi.append(dpsi_d * (1.0 / p_count))  # [F, tp]

    phi_mat = jnp.concatenate(phi, axis=0)  # [10, tp]
    for fi in range(f):
        dpsi_f = jnp.concatenate(
            [dp[fi:fi + 1, :] for dp in dpsi], axis=0
        )  # [3, tp]
        # dbeta^T [3, 10] = dpsi [3, tp] . phi [10, tp]^T
        dbeta_acc[fi] += jax.lax.dot_general(
            dpsi_f, phi_mat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi_prec,
        )

    @pl.when(tile == n_tiles - 1)
    def _():
        sse_ref[:] = sse_acc[:]
        dbeta_ref[:] = dbeta_acc[:]


@functools.partial(
    jax.jit,
    static_argnames=("size", "scaling", "tile_p", "frames_per_step",
                     "interpret"),
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
    frames_per_step: int = 8,
    p_offset=None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused data term + analytic beta gradient for a block of frames.

    Args:
      betas: ``[B, 10, 3]``; c_block: ``[B, K]``; y: ``[B, P]``.
      p_offset: optional traced voxel offset (pixel-sharded/TP path):
        ``y`` covers global voxels ``[p_offset, p_offset + y.shape[1])``
        and the returned mse/dbeta are local-voxel means whose
        pixel-axis ``psum / npix`` reproduces the global values.

    Returns:
      ``(mse [B], dbeta [B, 10, 3])`` — ``mse = sum_p r^2 / P`` per frame
      with ``dbeta`` its gradient (regularizer added outside).
    """
    bsz = betas.shape[0]
    k = pos.shape[0]
    k8 = _round_up(k, SUBLANE)
    p_count = y.shape[1]
    p_pad = _round_up(p_count, tile_p)
    n_tiles = p_pad // tile_p
    params, w2 = _neuron_params(pos, sigma, k8, c_block=c_block)
    off = jnp.zeros((1, 1), jnp.int32) if p_offset is None else (
        jnp.asarray(p_offset, jnp.int32).reshape(1, 1))

    f_eff, b_pad = _pad_frames(bsz, frames_per_step)
    pad_b = ((0, b_pad - bsz),)
    beta_rows = _beta_warp_matrix(
        jnp.pad(betas, pad_b + ((0, 0), (0, 0))), f_eff
    )
    params = jnp.pad(params, pad_b + ((0, 0), (0, 0)))
    w2 = jnp.pad(w2, pad_b + ((0, 0), (0, 0)))
    y_blk = _frame_major(y, b_pad, f_eff, n_tiles, tile_p, p_count)

    sse, dbeta_t = pl.pallas_call(
        functools.partial(
            _motion_kernel, size=tuple(size), scaling=scaling,
            tile_p=tile_p, p_count=p_count, n_tiles=n_tiles, f=f_eff,
        ),
        grid=(b_pad // f_eff, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, ti: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 3 * f_eff, 10), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_eff, k8, 8), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_eff, k8, 8), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, f_eff, tile_p),
                         lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((f_eff, 1), lambda bi, ti: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_eff, 3, 10), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 3, 10), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f_eff, 1), jnp.float32),
            pltpu.VMEM((f_eff, 3, 10), jnp.float32),
        ] + [pltpu.VMEM((f_eff, tile_p), jnp.float32)
             for _ in range(7)],  # S, B1 x3, B2 x3 row scratches
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(off, beta_rows, params, w2, y_blk)
    return (sse[:bsz, 0] / p_count,
            jnp.transpose(dbeta_t, (0, 2, 1))[:bsz])


def motion_frame(beta_t, pos, sigma, c_t, y, size, scaling="normalized",
                 tile_p: int = 8192, interpret: bool = False):
    """Single-frame convenience wrapper around :func:`motion_block`."""
    mse, dbeta = motion_block(beta_t[None], pos, sigma, c_t[None],
                              y[None], size, scaling=scaling,
                              tile_p=tile_p, interpret=interpret)
    return mse[0], dbeta[0]
