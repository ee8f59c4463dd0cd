"""Fused piecewise-rigid shift application: field upsample + separable
warp in ONE Pallas kernel.

Replaces the XLA apply path of
:func:`dnmf_tpu.registration.motion_correct._apply_remap_field`
(``remap_mode="separable"``) — the reference's ``cv2.resize`` +
``cv2.remap`` stage (``/root/reference/Demix/MotionCorrect.py:1404-1440``)
— for 3-D frame blocks.  Semantics are identical: sample each frame at
``x + clip(field(x), rigid ± (max_deviation_rigid + 2))`` where ``field``
is the cubic upsampling of the per-patch shift estimates, computed as
three sequential per-axis hat-weighted interpolation passes with
edge-clamped borders (weights evaluated on the pre-shift lattice, the
documented separable approximation of :func:`resample.separable_warp`).

Why a kernel: the XLA path runs ``3 x jax.image.resize`` full-volume
cubic upsamples plus ``~14 offsets x 3 axes`` full-volume multiply-add
passes — every pass a round-trip through HBM (~6 ms/frame at
512x512x20).  Here each volume tile is read ONCE; the field tile is
built in VMEM from tiny matmuls and all three passes run on resident
data, with integer offsets outside the tile's actual shift range culled
at runtime (the field is patch-smooth, so a tile typically touches 3-4
of the ~28 static offsets per axis).

Layout trick that makes every pass a flat slice: the volume is kept as
``[M, (N, Z)]`` rows x lanes with z minor, and each z-strip is padded by
``q_z`` >= the largest z offset.  Then a z-shift by ``u`` is a flat lane
slice at ``+u`` (never bleeding across strips, because ``|u| < q_z``), an
n-shift is a flat lane slice at ``+u*Zp``, and an m-shift is a sublane
slice — no gathers, no transposes, no per-z small ops.

The cubic field upsample is exactly ``jax.image.resize(..., "cubic")``:
resize is linear and separable, so its per-axis action is a matrix
(extracted by resizing an identity), and the n/z axes combine into one
Kronecker-factored weight matrix evaluated per tile on the MXU at
HIGHEST precision (bf16 passes would put ~0.05 px of error on the
field).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _resize_matrix(g: int, size: int) -> jnp.ndarray:
    """``[size, g]`` matrix of the per-axis cubic resize map.

    ``jax.image.resize`` is linear and separable per dimension, so the
    axis-0 action of ``resize((g,) -> (size,))`` is exactly this matrix
    (columns = resized basis vectors).  ``g == 1`` broadcasts.
    """
    if g == 1:
        return jnp.ones((size, 1), jnp.float32)
    return jax.image.resize(jnp.eye(g, dtype=jnp.float32), (size, g),
                            method="cubic")


def _ext_rows(r: jnp.ndarray, padded: int, off: int, size: int):
    """Edge-extend a resize matrix: row ``j`` of the result is the row of
    ``r`` at ``clip(j - off, 0, size - 1)`` — the field analog of the
    volume's edge padding (edge-extending both inputs commutes with the
    interpolation passes, so per-tile halos reproduce the global result).
    """
    idx = np.clip(np.arange(padded) - off, 0, size - 1)
    return r[idx]


def _warp_kernel(base_ref, fp_ref, wm_ref, wnz_ref, y_any, out_ref,
                 win, field, buf_a, buf_b, sem, *, tm, tn, lw, zp,
                 offs, qs, rb, tmh_a):
    """One (frame, m-tile, n-tile) grid step: DMA the halo window, build
    each axis' field tile by two matmuls, run the three hat passes with
    per-tile offset culling, write the tile."""
    bi = pl.program_id(0)
    mi = pl.program_id(1)
    ni = pl.program_id(2)
    qm, qn, qz = qs

    # Lane start ni*tn*zp: when tn*zp is not 128-aligned the host falls
    # back to a single n tile, so the start is statically 0 (Mosaic
    # cannot prove divisibility of a dynamic index times an unaligned
    # stride).
    lane_start = 0 if (tn * zp) % 128 else ni * tn * zp
    cp = pltpu.make_async_copy(
        y_any.at[bi, pl.ds(mi * tm, tmh_a), pl.ds(lane_start, lw)],
        win, sem,
    )
    cp.start()
    cp.wait()

    hi = jax.lax.Precision.HIGHEST

    def field_tile(d):
        # [tm, gm_p] @ [gm_p, gnz_p] @ [gnz_p, LW] — the cubic upsample
        # of patch field d restricted to this tile (+ halo columns).
        t1 = jax.lax.dot_general(
            wm_ref[...], fp_ref[d], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )
        field[...] = jax.lax.dot_general(
            t1, wnz_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )
        b = base_ref[0, d]
        sf = jnp.clip(field[...], b - rb, b + rb)
        return sf, jnp.min(sf), jnp.max(sf)

    # ---- pass m (sublane shifts) ----------------------------------
    sf, smin, smax = field_tile(0)
    buf_a[...] = jnp.zeros_like(buf_a)
    for u in range(-offs[0], offs[0] + 2):
        @pl.when((u > smin - 1.0) & (u < smax + 1.0))
        def _(u=u):
            w = jnp.maximum(0.0, 1.0 - jnp.abs(sf - u))
            buf_a[...] += w * win[qm + u:qm + u + tm, :]

    # ---- pass n (lane shifts by u * Zp) ----------------------------
    sf, smin, smax = field_tile(1)
    sfc = sf[:, qn * zp:qn * zp + tn * zp]
    buf_b[...] = jnp.zeros_like(buf_b)
    for u in range(-offs[1], offs[1] + 2):
        @pl.when((u > smin - 1.0) & (u < smax + 1.0))
        def _(u=u):
            w = jnp.maximum(0.0, 1.0 - jnp.abs(sfc - u))
            buf_b[:, qn * zp:qn * zp + tn * zp] = (
                buf_b[:, qn * zp:qn * zp + tn * zp]
                + w * buf_a[:, (qn + u) * zp:(qn + u) * zp + tn * zp]
            )

    # ---- pass z (flat lane shifts within padded strips) ------------
    # buf_a is free again (pass n consumed it); reuse its leading
    # [tm, tn*zp] columns as the pass-z accumulator so the culled
    # offsets stay @pl.when-guarded ref updates.
    sf, smin, smax = field_tile(2)
    sfc = sf[:, qn * zp:qn * zp + tn * zp]
    buf_a[:, :tn * zp] = jnp.zeros((tm, tn * zp), jnp.float32)
    for u in range(-offs[2], offs[2] + 2):
        @pl.when((u > smin - 1.0) & (u < smax + 1.0))
        def _(u=u):
            w = jnp.maximum(0.0, 1.0 - jnp.abs(sfc - u))
            buf_a[:, :tn * zp] = (
                buf_a[:, :tn * zp]
                + w * buf_b[:, qn * zp + u:qn * zp + u + tn * zp]
            )
    out_ref[...] = buf_a[:, :tn * zp]


@functools.partial(
    jax.jit,
    static_argnames=("grid_shape", "size", "max_shifts",
                     "max_deviation_rigid", "tm", "tn", "interpret"),
)
def fused_separable_warp(
    frames: jnp.ndarray,
    patch_shifts: jnp.ndarray,
    rigid_shifts: jnp.ndarray,
    grid_shape: Tuple[int, int, int],
    size: Tuple[int, int, int],
    max_shifts,
    max_deviation_rigid: int = 3,
    tm: int = 32,
    tn: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply per-patch shift fields to a 3-D frame block in one kernel.

    Matches ``vmap(_apply_remap_field(..., remap_mode="separable"))``
    over the block (same field clipping ``rigid ± (max_dev + 2)``, same
    edge-clamped borders; requires ``|rigid| <= ceil(max_shifts) + 1``,
    which the estimation stage's masked argmax guarantees).

    Args:
      frames: ``[B, M, N, Z]``.
      patch_shifts: ``[B, n_patches, 3]`` per-patch shift estimates
        (``n_patches = prod(grid_shape)``, row-major).
      rigid_shifts: ``[B, 3]`` per-frame rigid estimates (field clip
        centers).
      grid_shape: patch grid ``(Gm, Gn, Gz)``.
      size: ``(M, N, Z)``.
      max_shifts / max_deviation_rigid: the registration bounds (set the
        static offset ranges; actual per-tile offsets are culled).
      tm / tn: tile rows / cols.  VMEM scales with
        ``(tm + 2*q_m) * (tn + 2*q_n) * Zp``.

    Returns:
      ``[B, M, N, Z]`` warped frames.
    """
    b = frames.shape[0]
    m, n, z = (int(s) for s in size)
    gm, gn, gz = (int(g) for g in grid_shape)
    rb = int(max_deviation_rigid) + 2
    r = rb + 1
    bb = tuple(int(np.ceil(float(ms))) + 1 for ms in max_shifts)
    offs = tuple(bb[d] + r for d in range(3))   # static offset bound
    qm, qn, qz = (offs[0] + 2, offs[1] + 2, offs[2] + 2)
    zp = z + 2 * qz

    tm = max(8, min(tm, _round_up(m, 8)))
    n_mt = -(-m // tm)
    tn = min(tn, _round_up(n, 1))
    if (tn * zp) % 128:
        # Mosaic requires the output block's lane extent (tn * zp) to be
        # 128-divisible or span the whole axis, and the halo DMA's lane
        # start (ni * tn * zp) to stay tile-aligned.  Fall back to a
        # single n tile: starts become 0 and the out block spans the
        # axis (small volumes only — production zp keeps tn*zp aligned).
        tn = n
    n_nt = -(-n // tn)
    m_tot, n_tot = n_mt * tm, n_nt * tn
    lw_true = (tn + 2 * qn) * zp

    # Mosaic constrains HBM slice SHAPES to the (8, 128) memref tiling
    # (interpret mode does not check this — the original unaligned
    # window compiled under interpret and crashed the on-chip compile).
    # Round the DMA window up and pad the volume so every tile's
    # (row, lane) read stays in bounds; the slack rows/lanes carry
    # edge-padded values and zero field weights, and nothing past the
    # true window ever reaches the output slice.
    tmh = tm + 2 * qm
    tmh_a = _round_up(tmh, 8)
    lw = _round_up(lw_true, 128)
    extra_n = -(-((n_nt - 1) * tn * zp + lw
                  - (n_tot + 2 * qn) * zp) // zp)
    extra_n = max(0, extra_n)

    # Padded volume in [B, rows=m, lanes=(n, z)] layout; edge mode
    # matches separable_warp's per-pass edge padding (pre-padding the
    # input commutes with the passes when the field is edge-extended
    # the same way — see _ext_rows).
    vol = jnp.pad(
        frames,
        ((0, 0), (qm, qm + (m_tot - m) + (tmh_a - tmh)),
         (qn, qn + (n_tot - n) + extra_n), (qz, qz)),
        mode="edge",
    ).reshape(b, m_tot + 2 * qm + (tmh_a - tmh),
              (n_tot + 2 * qn + extra_n) * zp)

    # Field factors: per-axis cubic resize matrices, edge-extended.
    r_m = _resize_matrix(gm, m)
    r_n = _resize_matrix(gn, n)
    r_z = _resize_matrix(gz, z)
    gm_p = _round_up(gm, 8)
    gnz_p = _round_up(gn * gz, 16)
    wm = jnp.zeros((m_tot, gm_p), jnp.float32).at[:, :gm].set(
        _ext_rows(r_m, m_tot, 0, m)
    ).reshape(n_mt, tm, gm_p)
    wn_ext = _ext_rows(r_n, n_tot + 2 * qn, qn, n)  # [n_tot+2qn, gn]
    wz_ext = _ext_rows(r_z, zp, qz, z)              # [zp, gz]
    wnz = jnp.zeros((n_nt, gnz_p, lw), jnp.float32)
    # kron[g, h, n, z] = wn_ext[n, g] * wz_ext[z, h]: the combined
    # (n, z)-lane weight factor, per n-tile a [gn*gz, lw_true] matrix
    # (zero weights on the alignment-slack lanes).
    kron = jnp.einsum("ng,zh->ghnz", wn_ext, wz_ext)
    kron = kron.reshape(gn * gz, n_tot + 2 * qn, zp)
    for ni in range(n_nt):
        blk = kron[:, ni * tn:ni * tn + tn + 2 * qn, :].reshape(
            gn * gz, lw_true)
        wnz = wnz.at[ni, :gn * gz, :lw_true].set(blk)

    fp = jnp.zeros((b, 3, gm_p, gnz_p), jnp.float32).at[
        :, :, :gm, :gn * gz
    ].set(
        jnp.transpose(
            patch_shifts.reshape(b, gm, gn * gz, 3), (0, 3, 1, 2)
        )
    )
    base = rigid_shifts.reshape(b, 1, 3).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _warp_kernel, tm=tm, tn=tn, lw=lw, zp=zp, offs=offs,
            qs=(qm, qn, qz), rb=float(rb), tmh_a=tmh_a,
        ),
        grid=(b, n_mt, n_nt),
        in_specs=[
            pl.BlockSpec((None, 1, 3), lambda bi, mi, ni: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 3, gm_p, gnz_p),
                         lambda bi, mi, ni: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tm, gm_p),
                         lambda bi, mi, ni: (mi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, gnz_p, lw),
                         lambda bi, mi, ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (None, tm, tn * zp), lambda bi, mi, ni: (bi, mi, ni),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, m_tot, n_tot * zp),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tmh_a, lw), jnp.float32),
            pltpu.VMEM((tm, lw), jnp.float32),
            pltpu.VMEM((tm, lw), jnp.float32),
            pltpu.VMEM((tm, lw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(base, fp, wm, wnz, vol)

    out = out.reshape(b, m_tot, n_tot, zp)[:, :m, :n, qz:qz + z]
    return out
