"""Neuron-block-culled variants of the fused kernels.

At whole-brain scale (512x512x20, K>=200) ~95% of Gaussian evaluations
are exact zeros: a footprint's support is ~6 sigma (~20 px) while the
volume is 512 px across.  These kernels exploit that sparsity:

* neurons are **sorted by their m coordinate** (wrapper-level
  permutation; Gram outputs are unpermuted on return) and grouped into
  ``kblock``-wide blocks;
* each pixel tile computes the runtime range of its *deformed* m
  coordinates (a scalar min/max over the ``psi_m`` row — correct under
  any warp, unlike static tile geometry) and skips blocks whose
  [min_m - 6*sigma_max, max_m + 6*sigma_max] interval does not intersect
  it — skipping both the exp evaluation and the per-block-pair Gram
  dots (``exp(-36) ~ 2e-16``, below f32 resolution).

With one block (K <= kblock) the kernels reduce to the dense versions in
:mod:`dnmf_tpu.ops.pallas_kernels`, which also documents the layout and
numerical-precision decisions shared by both.

Gram pair dots support ``dot_mode="split"`` (3 single-pass bf16
products instead of the 6-pass HIGHEST emulation, ~3e-6 relative error
vs float64): halving the dot cost makes finer culling blocks
(kblock=64) the fastest whole-brain configuration.  These kernels stay
one-frame-per-grid-step: unlike the dense kernels, at whole-brain K the
per-pixel row math is a small fraction of the exp + dot work, and a
measured 8-frame variant ran *slower* (larger VMEM working set breaks
the pipeline overlap) — 14.2 vs 9.3 ms/frame Grams.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dnmf_tpu.ops import pallas_kernels as pk
from dnmf_tpu.ops.pallas_kernels import (
    SUBLANE,
    _coord_rows,
    _fade_row,
    _round_up,
    _warp_rows_mf,
)

REACH_SIGMAS = 6.0  # exp(-36) ≈ 2e-16: below f32 Gram resolution


def _sorted_params(pos, sigma, kb, nkb, c_block=None):
    """Sort neurons by m; build padded param columns + block m-ranges.

    Returns ``(perm, params [K_pad, 8], blocks [nkb_pad, 2], [w2])`` with
    ``K_pad = nkb * kb``; padded neurons sit at 1e4 with unit scales
    (they evaluate to exactly 0) and never extend a block's range.
    Cols ``SCALE_COLS`` (3, 5, 6) hold the per-axis ``inv_s2_d *
    log2(e)`` for the exp2-form footprint evaluation — ``sigma`` may be
    ``[K]`` (isotropic: equal scales) or ``[K, 3]`` (anisotropic).
    With ``c_block``: params col 4 = c; w2 cols 0:3 = ``2 c p_d/s_d^2``
    (B2 weights), cols 3:6 = ``2 c / s_d^2`` (per-axis B1 weights).
    """
    k = pos.shape[0]
    k_pad = nkb * kb
    perm = jnp.argsort(pos[:, 0])
    pos_s = pos[perm]
    sigma_s = sigma[perm]
    inv_s2 = pk._per_axis_inv_s2(sigma_s)  # [K, 3]

    params = jnp.full((k_pad, 8), 0.0, dtype=jnp.float32)
    params = params.at[:, :3].set(
        jnp.pad(pos_s, ((0, k_pad - k), (0, 0)), constant_values=1e4)
    )
    for d, col in enumerate(pk.SCALE_COLS):
        params = params.at[:k, col].set(inv_s2[:, d] * pk.LOG2E)
        params = params.at[k:, col].set(1.0)

    m_pad = jnp.pad(pos_s[:, 0], (0, k_pad - k),
                    constant_values=jnp.inf).reshape(nkb, kb)
    m_pad_neg = jnp.pad(pos_s[:, 0], (0, k_pad - k),
                        constant_values=-jnp.inf).reshape(nkb, kb)
    # Culling happens along m only — the reach is the m-axis width
    # (anisotropic z-flattened neurons cull TIGHTER than an isotropic
    # bound would).
    sig_m = sigma_s[:, 0] if sigma_s.ndim == 2 else sigma_s
    s_pad = jnp.pad(sig_m, (0, k_pad - k)).reshape(nkb, kb)
    reach = REACH_SIGMAS * jnp.max(s_pad, axis=1)
    blocks = jnp.stack(
        [jnp.min(m_pad, axis=1) - reach,
         jnp.max(m_pad_neg, axis=1) + reach],
        axis=1,
    )  # [nkb, 2]

    if c_block is None:
        return perm, params, blocks
    bsz = c_block.shape[0]
    c_s = c_block[:, perm]
    out = jnp.broadcast_to(params, (bsz, k_pad, 8))
    out = out.at[:, :k, 4].set(c_s)
    w2 = jnp.zeros((bsz, k_pad, 8), dtype=jnp.float32)
    for d in range(3):
        w2 = w2.at[:, :k, d].set(
            2.0 * c_s * (pos_s[:, d] * inv_s2[:, d])[None, :]
        )
        w2 = w2.at[:, :k, 3 + d].set(2.0 * c_s * inv_s2[None, :, d])
    return perm, out, blocks, w2


def _sorted_params_tracked(pos_t, sigma, kb, nkb, c_block=None):
    """Per-frame variant of :func:`_sorted_params` for tracked positions.

    ``pos_t [B, K, 3]`` holds each frame's own neuron centers (the
    position-refinement model, :mod:`dnmf_tpu.models.refine`).  The sort
    permutation keys on the per-neuron MEAN m over frames (refined
    positions deviate from their anchors by at most a few pixels, so one
    shared block structure stays tight), and each block's cull interval
    is the min/max over ALL frames of its members' m, padded by reach.

    Returns ``(perm, params [B, K_pad, 8], blocks [nkb, 2])`` with
    params cols ``(pos_m, pos_n, pos_z, inv_s2_m * log2e, c,
    inv_s2_n * log2e, inv_s2_z * log2e, 0)`` — per-axis scales in
    ``SCALE_COLS``; ``sigma`` may be ``[K]`` or ``[K, 3]`` (col 4 only
    when ``c_block [B, K]`` is given).
    """
    bsz, k = pos_t.shape[0], pos_t.shape[1]
    k_pad = nkb * kb
    perm = jnp.argsort(jnp.mean(pos_t[:, :, 0], axis=0))
    pos_s = pos_t[:, perm]  # [B, K, 3]
    sigma_s = sigma[perm]
    inv_s2 = pk._per_axis_inv_s2(sigma_s)  # [K, 3]

    params = jnp.zeros((bsz, k_pad, 8), dtype=jnp.float32)
    params = params.at[:, :, :3].set(
        jnp.pad(pos_s, ((0, 0), (0, k_pad - k), (0, 0)),
                constant_values=1e4)
    )
    for d, col in enumerate(pk.SCALE_COLS):
        params = params.at[:, :k, col].set(
            inv_s2[None, :, d] * pk.LOG2E)
        params = params.at[:, k:, col].set(1.0)
    if c_block is not None:
        params = params.at[:, :k, 4].set(c_block[:, perm])

    m_all = pos_s[:, :, 0]  # [B, K]
    m_pad = jnp.pad(jnp.min(m_all, axis=0), (0, k_pad - k),
                    constant_values=jnp.inf).reshape(nkb, kb)
    m_pad_neg = jnp.pad(jnp.max(m_all, axis=0), (0, k_pad - k),
                        constant_values=-jnp.inf).reshape(nkb, kb)
    sig_m = sigma_s[:, 0] if sigma_s.ndim == 2 else sigma_s
    s_pad = jnp.pad(sig_m, (0, k_pad - k)).reshape(nkb, kb)
    reach = REACH_SIGMAS * jnp.max(s_pad, axis=1)
    blocks = jnp.stack(
        [jnp.min(m_pad, axis=1) - reach,
         jnp.max(m_pad_neg, axis=1) + reach],
        axis=1,
    )  # [nkb, 2]
    return perm, params, blocks


def _block_footprint(psi, pos_ref, lo, kb):
    # Cols SCALE_COLS = per-axis inv_s2_d * log2(e): exp2 form of the
    # (possibly anisotropic) Gaussian (pallas_kernels._footprint_tile).
    expo = (pos_ref[lo:lo + kb, 0:1] - psi[0]) ** 2 \
        * pos_ref[lo:lo + kb, 3:4]
    expo += (pos_ref[lo:lo + kb, 1:2] - psi[1]) ** 2 \
        * pos_ref[lo:lo + kb, 5:6]
    expo += (pos_ref[lo:lo + kb, 2:3] - psi[2]) ** 2 \
        * pos_ref[lo:lo + kb, 6:7]
    return jnp.exp2(-expo)


def _pad_frame_group(b_pad, betas, pos_t=None, c_block=None):
    """Replicated-last-frame padding up to the frame-group multiple.

    Padded frames' psi joins the per-step culling union, so a copy of
    the last real frame keeps it tight; their video rows are
    zero-padded and their outputs are sliced off by the caller.
    """
    bsz = betas.shape[0]
    if b_pad > bsz:
        betas = jnp.concatenate(
            [betas, jnp.broadcast_to(betas[-1:], (b_pad - bsz, 10, 3))],
            axis=0,
        )
        if pos_t is not None:
            pos_t = jnp.concatenate(
                [pos_t, jnp.broadcast_to(
                    pos_t[-1:], (b_pad - bsz,) + pos_t.shape[1:])],
                axis=0,
            )
        if c_block is not None:
            c_block = jnp.pad(c_block, ((0, b_pad - bsz), (0, 0)))
    return betas, pos_t, c_block


def _unpermute_grams(g, c1, perm, bsz, k):
    """Undo the m-sort: sorted index i holds original neuron perm[i], so
    the original-order Gram is G_sorted[inv][:, inv], inv=argsort(perm)."""
    inv = jnp.argsort(perm)
    return g[:bsz, :k, :k][:, inv, :][:, :, inv], c1[:bsz, :k, 0][:, inv]


def _culled_tile_body(base, yget, beta_ref, blocks_ref, pos_ref, g_acc,
                      c1_acc, a_scr, ahi_scr, alo_scr, *, off, size,
                      scaling, tile_p, p_count, kb, nkb, f, split,
                      posget=None, psiget=None, pairs=True):
    """One voxel tile's culled Gram/c1 accumulation (shared by the
    grid-pipelined, manually-pipelined, and streamed-psi kernels).

    ``yget(fi) -> [1, tile_p]`` fetches frame ``fi``'s video row for
    this tile from whichever buffer the caller staged it in.

    ``posget(fi)``, when given, returns frame ``fi``'s own ``[K_pad, 8]``
    neuron parameters (the tracked-positions path — see
    :func:`gram_block_tracked`); default is the shared ``pos_ref``.

    ``psiget()``, when given, returns precomputed ``(psi, w)`` rows
    (each axis ``[F, tile_p]``; ``w`` must already carry the border
    fade and tail-padding zeros) instead of deriving them from
    ``beta_ref`` — the streamed-psi path, where ``base``/``off``/
    ``size``/``scaling``/``p_count`` are unused.

    ``pairs=False`` skips the block-pair Gram dots entirely (``g_acc``
    is untouched and may be None) — the c1-only path under analytic
    Grams (:mod:`dnmf_tpu.ops.gram_analytic`).
    """
    hi_prec = jax.lax.Precision.HIGHEST
    dims = (((1,), (1,)), ((), ()))
    bf_dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    if psiget is None:
        idx, mi, ni, zi = _coord_rows(base, size, tile_p)
        psi, _ = _warp_rows_mf(beta_ref, mi, ni, zi, size, scaling, f)
        w = _fade_row(psi, size) * (
            idx < off + p_count
        ).astype(jnp.float32)
    else:
        psi, w = psiget()
    # Culling bounds are the union over the step's F frames: one
    # cross-lane reduce instead of F, and per-frame deformed ranges
    # differ by at most the warp spread, so selectivity is
    # ~unchanged.  Bounds are per sub-tile (tighter than per step).
    t_lo = jnp.min(psi[0])
    t_hi = jnp.max(psi[0])

    actives = []
    pair_actives = {}
    for i in range(nkb):
        actives.append(
            (blocks_ref[i, 0] <= t_hi) & (blocks_ref[i, 1] >= t_lo)
        )
        for j in range(i, nkb) if pairs else ():
            # Pair-interval cull: G entries between blocks i and j
            # are nonzero only if some neuron pair sits within
            # 2*reach in m, i.e. the +-reach intervals overlap
            # (blocks sorted by m, so for j >= i that is "j starts
            # before i ends").
            pair_actives[(i, j)] = (blocks_ref[j, 0]
                                    <= blocks_ref[i, 1])

    for fi in range(f):
        psi_f = tuple(p[fi:fi + 1, :] for p in psi)
        w_f = w[fi:fi + 1, :]
        pos_f = pos_ref if posget is None else posget(fi)
        for i in range(nkb):
            @pl.when(actives[i])
            def _(i=i, psi_f=psi_f, w_f=w_f, pos_f=pos_f):
                sl = slice(i * kb, (i + 1) * kb)
                a = _block_footprint(psi_f, pos_f, i * kb, kb) * w_f
                if split:
                    hi, lo = pk._split_bf16(a)
                    ahi_scr[sl, :] = hi
                    alo_scr[sl, :] = lo
                else:
                    a_scr[sl, :] = a
        for i in range(nkb):
            @pl.when(actives[i])
            def _(i=i, fi=fi):
                sl = slice(i * kb, (i + 1) * kb)
                ai = (ahi_scr[sl, :].astype(jnp.float32)
                      + alo_scr[sl, :].astype(jnp.float32)) if split \
                    else a_scr[sl, :]
                c1_acc[fi, sl, :] += jax.lax.dot_general(
                    ai, yget(fi), dims,
                    preferred_element_type=jnp.float32,
                    precision=hi_prec,
                )
            for j in range(i, nkb) if pairs else ():
                @pl.when(actives[i] & actives[j]
                         & pair_actives[(i, j)])
                def _(i=i, j=j, fi=fi):
                    si = slice(i * kb, (i + 1) * kb)
                    sj = slice(j * kb, (j + 1) * kb)
                    if split:
                        # 3 single-pass bf16 products vs 6-pass
                        # HIGHEST; the dropped lo@lo term is
                        # O(2^-18) relative.
                        gij = (bf_dot(ahi_scr[si, :], ahi_scr[sj, :])
                               + bf_dot(ahi_scr[si, :],
                                        alo_scr[sj, :])
                               + bf_dot(alo_scr[si, :],
                                        ahi_scr[sj, :]))
                    else:
                        gij = jax.lax.dot_general(
                            a_scr[si, :], a_scr[sj, :], dims,
                            preferred_element_type=jnp.float32,
                            precision=hi_prec,
                        )
                    g_acc[fi, si, sj] += gij


def _gram_kernel_culled(off_ref, beta_ref, blocks_ref, pos_ref, y_ref,
                        g_ref, c1_ref, g_acc, c1_acc, *scr, size,
                        scaling, tile_p, p_count, n_steps, kb, nkb, f,
                        dot_mode, tps, tracked=False):
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _():
        g_acc[:] = jnp.zeros_like(g_acc)
        c1_acc[:] = jnp.zeros_like(c1_acc)

    # Per-step cost structure (whole-brain 512x512x20, K=200): round-3
    # leveled ablations showed an EMPTY body (streaming y, maintaining
    # accumulators, computing nothing) costs the same as the full kernel
    # — the binding constraint is ~2.2 us of per-grid-step pipeline
    # overhead (DMA issue latency + buffer rotation + step dispatch),
    # with the body compute hidden under it.  Three rewrites that
    # "should" beat it all measured SLOWER and default off: (a) an
    # XLA-side psi precompute (its ~1 GB/call HBM round-trip plus four
    # extra DMA issues per step cost more than the removed rows — 7.1
    # vs 5.9 ms/frame), (b) F frames per grid step beyond 2 (the
    # [F, K_pad, K_pad] accumulator blows the VMEM working set; F=4:
    # 14.3), and (c) ``tps`` (tiles_per_step) — streaming one
    # [F, tps * tile_p] video block per step and iterating the body
    # over tile_p-wide sub-tiles divides the step count by tps without
    # growing any compute shape, yet measured ~2x SLOWER (F=2: 6.1 ->
    # 13.1/12.5/12.2 ms/frame at tps=2/4/8, identical in sub-tile-major
    # and flat lane-offset layouts).  The overhead is therefore NOT a
    # fixed per-step cost that amortizes: with several sub-tiles of
    # body per step there is only one block-DMA in flight and the
    # compute serializes against it, where the tps=1 pipeline hides
    # each tile's body under the next tile's fetch.  The grid-step
    # pipelining IS the win; see docs/DESIGN.md "measured ceiling".
    off = off_ref[0, 0]

    # Split mode keeps only the 2-term bf16 decomposition in scratch
    # (reused frame-by-frame within the step) — no f32 footprint buffer;
    # the c1 dot reconstructs hi + lo, exact to the decomposition.
    split = dot_mode == "split"
    if split:
        ahi_scr, alo_scr = scr
        a_scr = None
    else:
        (a_scr,) = scr
        ahi_scr = alo_scr = None

    for sub in range(tps):
        base = off + (step * tps + sub) * tile_p
        yget = (
            (lambda fi, sub=sub: y_ref[fi:fi + 1,
                                       sub * tile_p:(sub + 1) * tile_p])
            if tps > 1 else (lambda fi: y_ref[fi:fi + 1, :])
        )
        _culled_tile_body(
            base, yget, beta_ref, blocks_ref, pos_ref, g_acc, c1_acc,
            a_scr, ahi_scr, alo_scr, off=off, size=size,
            scaling=scaling, tile_p=tile_p, p_count=p_count, kb=kb,
            nkb=nkb, f=f, split=split,
            posget=(lambda fi: pos_ref[fi]) if tracked else None,
        )

    @pl.when(step == n_steps - 1)
    def _():
        c1_ref[:] = c1_acc[:]
        # Mirror the strictly-upper blocks into the lower triangle.
        lower_mask = jax.lax.broadcasted_iota(
            jnp.int32, (f,) + g_acc.shape[1:], 1
        ) // kb > jax.lax.broadcasted_iota(
            jnp.int32, (f,) + g_acc.shape[1:], 2
        ) // kb
        g_full = g_acc[:]
        g_ref[:] = jnp.where(lower_mask,
                             jnp.transpose(g_full, (0, 2, 1)), g_full)


@functools.partial(
    jax.jit,
    static_argnames=("size", "scaling", "tile_p", "kblock", "dot_mode",
                     "frames_per_step", "tiles_per_step", "psi_source",
                     "interpret"),
)
def gram_block_culled(
    betas: jnp.ndarray,
    pos: jnp.ndarray,
    sigma: jnp.ndarray,
    y: jnp.ndarray,
    size,
    scaling: str = "normalized",
    tile_p: int = 8192,
    kblock: int = 64,
    dot_mode: str = "highest",
    frames_per_step: int = 1,
    tiles_per_step: int = 1,
    psi_source: str = "kernel",
    p_offset=None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Culled MU statistics for a block of frames: ``(G, c1)``.

    ``dot_mode="split"`` runs the block-pair Gram dots as 3 single-pass
    bf16 products instead of the 6-pass HIGHEST emulation (~2x cheaper
    dots; see ``pallas_kernels._gram_dot``); error vs float64 is ~3e-6
    relative.  ``frames_per_step`` frames share one grid step's
    coordinate/warp/fade rows (2 is the measured whole-brain optimum).
    ``tiles_per_step`` streams one ``[F, tps * tile_p]`` video block per
    grid step and iterates the body over ``tile_p``-wide sub-tiles,
    dividing the grid-step count by ``tps`` — a documented NEGATIVE
    result (~2x slower at whole-brain scale; see the kernel comment):
    kept at 1 in production, exposed for reproducibility.

    ``p_offset`` (traced): pixel-sharded/TP path — ``y`` covers global
    voxels ``[p_offset, p_offset + y.shape[1])``; returned Grams are
    partial sums over that range (``psum`` over the pixel axis yields
    the global Gram).  Culling still keys on the *deformed* coordinates
    of the local tile, so each shard skips blocks far from its voxels.

    ``psi_source="stream"`` (requires ``p_offset=None``): deformed
    coordinates + fade rows generated by XLA and streamed into the
    kernel.  Measured SLOWER than the default in-kernel rows (7.1 vs
    5.9 ms/frame — see :func:`_gram_kernel_streamed` for why); kept as
    the injection hook for externally-computed coordinate fields.
    """
    bsz = betas.shape[0]
    k = pos.shape[0]
    kb = min(kblock, _round_up(k, SUBLANE))
    nkb = -(-k // kb)
    k_pad = nkb * kb
    p_count = y.shape[1]
    tps = int(tiles_per_step)
    step_p = tile_p * tps
    p_pad = _round_up(p_count, step_p)
    perm, params, blocks = _sorted_params(pos, sigma, kb, nkb)
    off = jnp.zeros((1, 1), jnp.int32) if p_offset is None else (
        jnp.asarray(p_offset, jnp.int32).reshape(1, 1))

    n_steps = p_pad // step_p
    f_eff, b_pad = pk._pad_frames(bsz, frames_per_step)
    betas_pad, _, _ = _pad_frame_group(b_pad, betas)
    y_blk = pk._frame_major(y, b_pad, f_eff, n_steps, step_p, p_count)

    common = dict(
        grid=(b_pad // f_eff, n_steps),
        out_specs=[
            pl.BlockSpec((f_eff, k_pad, k_pad),
                         lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_eff, k_pad, 1), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f_eff, k_pad, k_pad), jnp.float32),
            pltpu.VMEM((f_eff, k_pad, 1), jnp.float32),
        ] + ([
            pltpu.VMEM((k_pad, tile_p), jnp.bfloat16),
            pltpu.VMEM((k_pad, tile_p), jnp.bfloat16),
        ] if dot_mode == "split" else [
            pltpu.VMEM((k_pad, tile_p), jnp.float32),
        ]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    row_spec = pl.BlockSpec((None, None, f_eff, step_p),
                            lambda bi, ti: (bi, ti, 0, 0),
                            memory_space=pltpu.VMEM)

    if psi_source == "stream":
        if p_offset is not None:
            raise ValueError(
                "psi_source='stream' does not take p_offset (pixel "
                "shards pass their local voxel basis through the "
                "kernel-side path)"
            )
        if tps != 1:
            raise ValueError(
                "psi_source='stream' (a documented negative result) "
                "supports tiles_per_step=1 only"
            )
        psi, w_fade = _xla_psi_rows(betas_pad, tuple(size), scaling)
        rows = [
            pk._frame_major(psi[:, :, d], b_pad, f_eff, n_steps, tile_p,
                            p_count)
            for d in range(3)
        ] + [pk._frame_major(w_fade, b_pad, f_eff, n_steps, tile_p,
                             p_count)]
        g, c1 = pl.pallas_call(
            functools.partial(
                _gram_kernel_streamed, tile_p=tile_p, n_tiles=n_steps,
                kb=kb, nkb=nkb, f=f_eff, dot_mode=dot_mode,
            ),
            in_specs=[
                pl.BlockSpec((nkb, 2), lambda bi, ti: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((k_pad, 8), lambda bi, ti: (0, 0),
                             memory_space=pltpu.VMEM),
                row_spec, row_spec, row_spec, row_spec, row_spec,
            ],
            **common,
        )(blocks, params, *rows, y_blk)
    else:
        beta_rows = pk._beta_warp_matrix(betas_pad, f_eff)
        g, c1 = pl.pallas_call(
            functools.partial(
                _gram_kernel_culled, size=tuple(size), scaling=scaling,
                tile_p=tile_p, p_count=p_count, n_steps=n_steps, kb=kb,
                nkb=nkb, f=f_eff, dot_mode=dot_mode, tps=tps,
            ),
            in_specs=[
                pl.BlockSpec((1, 1), lambda bi, ti: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((None, 3 * f_eff, 10),
                             lambda bi, ti: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nkb, 2), lambda bi, ti: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((k_pad, 8), lambda bi, ti: (0, 0),
                             memory_space=pltpu.VMEM),
                row_spec,
            ],
            **common,
        )(off, beta_rows, blocks, params, y_blk)

    return _unpermute_grams(g, c1, perm, bsz, k)


def _c1_kernel_culled(off_ref, beta_ref, blocks_ref, pos_ref, y_ref,
                      c1_ref, c1_acc, *scr, size, scaling, tile_p,
                      p_count, n_steps, kb, nkb, f, dot_mode,
                      tracked=False):
    """c1-only variant of :func:`_gram_kernel_culled`: same culled body
    with the pair dots disabled and no ``[F, K, K]`` accumulator."""
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _():
        c1_acc[:] = jnp.zeros_like(c1_acc)

    off = off_ref[0, 0]
    split = dot_mode == "split"
    if split:
        ahi_scr, alo_scr = scr
        a_scr = None
    else:
        (a_scr,) = scr
        ahi_scr = alo_scr = None
    _culled_tile_body(
        off + step * tile_p, lambda fi: y_ref[fi:fi + 1, :], beta_ref,
        blocks_ref, pos_ref, None, c1_acc, a_scr, ahi_scr, alo_scr,
        off=off, size=size, scaling=scaling, tile_p=tile_p,
        p_count=p_count, kb=kb, nkb=nkb, f=f, split=split, pairs=False,
        posget=(lambda fi: pos_ref[fi]) if tracked else None,
    )

    @pl.when(step == n_steps - 1)
    def _():
        c1_ref[:] = c1_acc[:]


def _pipelined_tiles(bi, y_any, ybuf, sems, n_steps, nbuf, body):
    """``nbuf``-deep rotated HBM->VMEM video-tile stream: start the
    first ``nbuf - 1`` copies, then per chunk start the lookahead copy,
    wait the current slot, and hand its VMEM rows to ``body(ci,
    yrows)``.  Shared by the manually-pipelined Gram/c1 kernels (one
    grid step per frame group; docs/DESIGN.md "measured ceiling")."""

    def dma(slot, ci):
        return pltpu.make_async_copy(
            y_any.at[bi, ci], ybuf.at[slot], sems.at[slot]
        )

    for s in range(min(nbuf - 1, n_steps)):
        dma(s, s).start()

    def loop_body(ci, carry):
        slot = jax.lax.rem(ci, nbuf)
        nxt = ci + nbuf - 1

        @pl.when(nxt < n_steps)
        def _():
            dma(jax.lax.rem(nxt, nbuf), nxt).start()

        dma(slot, ci).wait()
        body(ci, ybuf[slot])
        return carry

    jax.lax.fori_loop(0, n_steps, loop_body, 0)


def _c1_kernel_pipe(off_ref, beta_ref, blocks_ref, pos_ref, y_any,
                    c1_ref, c1_acc, ybuf, sems, *scr, size, scaling,
                    tile_p, p_count, n_steps, kb, nkb, f, dot_mode,
                    nbuf, tracked=False):
    """Manually-pipelined c1-only kernel: :func:`_gram_kernel_pipe`'s
    one-grid-step + :func:`_pipelined_tiles` rotation, with the pair
    dots disabled (the analytic-Grams companion)."""
    bi = pl.program_id(0)
    off = off_ref[0, 0]
    c1_acc[:] = jnp.zeros_like(c1_acc)
    split = dot_mode == "split"
    if split:
        ahi_scr, alo_scr = scr
        a_scr = None
    else:
        (a_scr,) = scr
        ahi_scr = alo_scr = None

    def body(ci, yrows):  # yrows [F, tile_p]
        _culled_tile_body(
            off + ci * tile_p, lambda fi: yrows[fi:fi + 1, :],
            beta_ref, blocks_ref, pos_ref, None, c1_acc,
            a_scr, ahi_scr, alo_scr, off=off, size=size,
            scaling=scaling, tile_p=tile_p, p_count=p_count, kb=kb,
            nkb=nkb, f=f, split=split, pairs=False,
            posget=(lambda fi: pos_ref[fi]) if tracked else None,
        )

    _pipelined_tiles(bi, y_any, ybuf, sems, n_steps, nbuf, body)
    c1_ref[:] = c1_acc[:]


@functools.partial(
    jax.jit,
    static_argnames=("size", "scaling", "tile_p", "kblock", "dot_mode",
                     "frames_per_step", "impl", "nbuf", "interpret"),
)
def c1_block_culled(
    betas: jnp.ndarray,
    pos: jnp.ndarray,
    sigma: jnp.ndarray,
    y: jnp.ndarray,
    size,
    scaling: str = "normalized",
    tile_p: int = 8192,
    kblock: int = 64,
    dot_mode: str = "split",
    frames_per_step: int = 2,
    impl: str = "grid",
    nbuf: int = 4,
    p_offset=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Culled ``c1[b, k] = sum_p a_k(p) y_b(p)`` WITHOUT the pair Grams.

    Companion of the closed-form Gram path
    (:mod:`dnmf_tpu.ops.gram_analytic` evaluates ``G`` analytically in
    O(K^2); only ``c1`` still needs the video).  Dropping the
    ``[F, K, K]`` accumulator and the O(n_blocks^2) pair dots leaves a
    leaner VMEM working set than :func:`gram_block_culled`, so larger
    ``tile_p`` tunings become reachable (sweep via tools/autotune.py).

    ``pos`` may be ``[K, 3]`` (shared anchors) or ``[B, K, 3]``
    (per-frame tracked positions, the refinement phase —
    :func:`gram_block_tracked`'s c1).

    ``impl="pipelined"`` routes through the one-grid-step fori_loop +
    ``nbuf``-deep manual DMA rotation (:func:`_c1_kernel_pipe` — same
    architecture as :func:`gram_block_pipelined`); sweep both via
    ``tools/autotune.py`` ('culled_c1' cache key).
    """
    bsz = betas.shape[0]
    tracked = pos.ndim == 3
    k = pos.shape[1] if tracked else pos.shape[0]
    kb = min(kblock, _round_up(k, SUBLANE))
    nkb = -(-k // kb)
    k_pad = nkb * kb
    p_count = y.shape[1]
    p_pad = _round_up(p_count, tile_p)
    off = jnp.zeros((1, 1), jnp.int32) if p_offset is None else (
        jnp.asarray(p_offset, jnp.int32).reshape(1, 1))
    n_steps = p_pad // tile_p
    f_eff, b_pad = pk._pad_frames(bsz, frames_per_step)
    if tracked:
        betas_pad, pos_pad, _ = _pad_frame_group(b_pad, betas,
                                                 pos_t=pos)
        perm, params, blocks = _sorted_params_tracked(pos_pad, sigma,
                                                      kb, nkb)
        params_spec = pl.BlockSpec((f_eff, k_pad, 8),
                                   lambda bi, ti: (bi, 0, 0),
                                   memory_space=pltpu.VMEM)
    else:
        betas_pad, _, _ = _pad_frame_group(b_pad, betas)
        perm, params, blocks = _sorted_params(pos, sigma, kb, nkb)
        params_spec = pl.BlockSpec((k_pad, 8), lambda bi, ti: (0, 0),
                                   memory_space=pltpu.VMEM)
    y_blk = pk._frame_major(y, b_pad, f_eff, n_steps, tile_p, p_count)
    beta_rows = pk._beta_warp_matrix(betas_pad, f_eff)
    split_scratch = ([
        pltpu.VMEM((k_pad, tile_p), jnp.bfloat16),
        pltpu.VMEM((k_pad, tile_p), jnp.bfloat16),
    ] if dot_mode == "split" else [
        pltpu.VMEM((k_pad, tile_p), jnp.float32),
    ])
    if impl == "pipelined":
        if tracked:
            params_spec1 = pl.BlockSpec((f_eff, k_pad, 8),
                                        lambda bi: (bi, 0, 0),
                                        memory_space=pltpu.VMEM)
        else:
            params_spec1 = pl.BlockSpec((k_pad, 8), lambda bi: (0, 0),
                                        memory_space=pltpu.VMEM)
        c1 = pl.pallas_call(
            functools.partial(
                _c1_kernel_pipe, size=tuple(size), scaling=scaling,
                tile_p=tile_p, p_count=p_count, n_steps=n_steps, kb=kb,
                nkb=nkb, f=f_eff, dot_mode=dot_mode, nbuf=nbuf,
                tracked=tracked,
            ),
            grid=(b_pad // f_eff,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda bi: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((None, 3 * f_eff, 10),
                             lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nkb, 2), lambda bi: (0, 0),
                             memory_space=pltpu.SMEM),
                params_spec1,
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((f_eff, k_pad, 1),
                                   lambda bi: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b_pad, k_pad, 1),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((f_eff, k_pad, 1), jnp.float32),
                pltpu.VMEM((nbuf, f_eff, tile_p), jnp.float32),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ] + split_scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(off, beta_rows, blocks, params, y_blk)
        inv = jnp.argsort(perm)
        return c1[:bsz, :k, 0][:, inv]
    if impl != "grid":
        raise ValueError(f"unknown c1 impl: {impl!r}")
    row_spec = pl.BlockSpec((None, None, f_eff, tile_p),
                            lambda bi, ti: (bi, ti, 0, 0),
                            memory_space=pltpu.VMEM)
    c1 = pl.pallas_call(
        functools.partial(
            _c1_kernel_culled, size=tuple(size), scaling=scaling,
            tile_p=tile_p, p_count=p_count, n_steps=n_steps, kb=kb,
            nkb=nkb, f=f_eff, dot_mode=dot_mode, tracked=tracked,
        ),
        grid=(b_pad // f_eff, n_steps),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, ti: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 3 * f_eff, 10),
                         lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nkb, 2), lambda bi, ti: (0, 0),
                         memory_space=pltpu.SMEM),
            params_spec,
            row_spec,
        ],
        out_specs=pl.BlockSpec((f_eff, k_pad, 1),
                               lambda bi, ti: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, k_pad, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((f_eff, k_pad, 1), jnp.float32),
        ] + split_scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(off, beta_rows, blocks, params, y_blk)
    inv = jnp.argsort(perm)
    return c1[:bsz, :k, 0][:, inv]


def _gram_kernel_pipe(off_ref, beta_ref, blocks_ref, pos_ref, y_any,
                      g_ref, c1_ref, g_acc, c1_acc, ybuf, sems, *scr,
                      size, scaling, tile_p, p_count, n_steps, kb, nkb,
                      f, dot_mode, nbuf):
    """Manually-pipelined culled Gram kernel: ONE grid step per frame
    group; the voxel-tile loop runs as a ``fori_loop`` with ``nbuf``-deep
    hand-rolled DMA rotation from HBM (``y_any`` stays in ANY memory).

    Motivation (docs/DESIGN.md "measured ceiling"): the grid-pipelined
    kernel is bound by ~per-grid-step machinery, not body compute — an
    empty body costs the same 5.9 ms/frame.  Replacing 1280 grid steps
    per frame pair with one step + an in-kernel chunk loop removes that
    machinery; the explicit multi-buffer DMA keeps compute overlapped
    with the video stream the way the grid pipeline did.
    """
    bi = pl.program_id(0)
    off = off_ref[0, 0]
    g_acc[:] = jnp.zeros_like(g_acc)
    c1_acc[:] = jnp.zeros_like(c1_acc)
    split = dot_mode == "split"
    if split:
        ahi_scr, alo_scr = scr
        a_scr = None
    else:
        (a_scr,) = scr
        ahi_scr = alo_scr = None

    def body(ci, yrows):  # yrows [F, tile_p]
        _culled_tile_body(
            off + ci * tile_p, lambda fi: yrows[fi:fi + 1, :],
            beta_ref, blocks_ref, pos_ref, g_acc, c1_acc,
            a_scr, ahi_scr, alo_scr, off=off, size=size,
            scaling=scaling, tile_p=tile_p, p_count=p_count, kb=kb,
            nkb=nkb, f=f, split=split,
        )

    _pipelined_tiles(bi, y_any, ybuf, sems, n_steps, nbuf, body)

    c1_ref[:] = c1_acc[:]
    lower_mask = jax.lax.broadcasted_iota(
        jnp.int32, (f,) + g_acc.shape[1:], 1
    ) // kb > jax.lax.broadcasted_iota(
        jnp.int32, (f,) + g_acc.shape[1:], 2
    ) // kb
    g_full = g_acc[:]
    g_ref[:] = jnp.where(lower_mask,
                         jnp.transpose(g_full, (0, 2, 1)), g_full)


@functools.partial(
    jax.jit,
    static_argnames=("size", "scaling", "tile_p", "kblock", "dot_mode",
                     "frames_per_step", "nbuf", "interpret"),
)
def gram_block_pipelined(
    betas: jnp.ndarray,
    pos: jnp.ndarray,
    sigma: jnp.ndarray,
    y: jnp.ndarray,
    size,
    scaling: str = "normalized",
    tile_p: int = 4096,
    kblock: int = 40,
    dot_mode: str = "split",
    frames_per_step: int = 2,
    nbuf: int = 4,
    p_offset=None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Culled MU statistics via the manually-pipelined kernel.

    Same contract as :func:`gram_block_culled`; see
    :func:`_gram_kernel_pipe` for why this variant exists.  ``nbuf`` is
    the DMA rotation depth (the video chunk for tile ``i + nbuf - 1``
    starts copying while tile ``i`` computes).
    """
    bsz = betas.shape[0]
    k = pos.shape[0]
    kb = min(kblock, _round_up(k, SUBLANE))
    nkb = -(-k // kb)
    k_pad = nkb * kb
    p_count = y.shape[1]
    p_pad = _round_up(p_count, tile_p)
    perm, params, blocks = _sorted_params(pos, sigma, kb, nkb)
    off = jnp.zeros((1, 1), jnp.int32) if p_offset is None else (
        jnp.asarray(p_offset, jnp.int32).reshape(1, 1))

    n_steps = p_pad // tile_p
    f_eff, b_pad = pk._pad_frames(bsz, frames_per_step)
    betas_pad, _, _ = _pad_frame_group(b_pad, betas)
    y_blk = pk._frame_major(y, b_pad, f_eff, n_steps, tile_p, p_count)
    beta_rows = pk._beta_warp_matrix(betas_pad, f_eff)

    g, c1 = pl.pallas_call(
        functools.partial(
            _gram_kernel_pipe, size=tuple(size), scaling=scaling,
            tile_p=tile_p, p_count=p_count, n_steps=n_steps, kb=kb,
            nkb=nkb, f=f_eff, dot_mode=dot_mode, nbuf=nbuf,
        ),
        grid=(b_pad // f_eff,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 3 * f_eff, 10), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nkb, 2), lambda bi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((k_pad, 8), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((f_eff, k_pad, k_pad), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_eff, k_pad, 1), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f_eff, k_pad, k_pad), jnp.float32),
            pltpu.VMEM((f_eff, k_pad, 1), jnp.float32),
            pltpu.VMEM((nbuf, f_eff, tile_p), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ] + ([
            pltpu.VMEM((k_pad, tile_p), jnp.bfloat16),
            pltpu.VMEM((k_pad, tile_p), jnp.bfloat16),
        ] if dot_mode == "split" else [
            pltpu.VMEM((k_pad, tile_p), jnp.float32),
        ]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(off, beta_rows, blocks, params, y_blk)

    return _unpermute_grams(g, c1, perm, bsz, k)


@functools.partial(
    jax.jit,
    static_argnames=("size", "scaling", "tile_p", "kblock", "dot_mode",
                     "frames_per_step", "interpret"),
)
def gram_block_tracked(
    betas: jnp.ndarray,
    pos_t: jnp.ndarray,
    sigma: jnp.ndarray,
    y: jnp.ndarray,
    size,
    scaling: str = "normalized",
    tile_p: int = 4096,
    kblock: int = 40,
    dot_mode: str = "split",
    frames_per_step: int = 2,
    p_offset=None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Culled MU statistics with PER-FRAME neuron positions: ``(G, c1)``.

    The tracked analog of :func:`gram_block_culled` for the
    position-refinement phase (:mod:`dnmf_tpu.models.refine`):
    ``pos_t [B, K, 3]`` holds each frame's own anchors, so
    ``A_t[p, k] = exp(-|psi_t(p) - pos_t[k]|^2 / sigma_k^2)``.  Same
    kernel body; the per-neuron parameter block carries one row set per
    frame and culling intervals take the min/max over frames (see
    :func:`_sorted_params_tracked`).
    """
    bsz = betas.shape[0]
    k = pos_t.shape[1]
    kb = min(kblock, _round_up(k, SUBLANE))
    nkb = -(-k // kb)
    k_pad = nkb * kb
    p_count = y.shape[1]
    p_pad = _round_up(p_count, tile_p)
    off = jnp.zeros((1, 1), jnp.int32) if p_offset is None else (
        jnp.asarray(p_offset, jnp.int32).reshape(1, 1))

    n_steps = p_pad // tile_p
    f_eff, b_pad = pk._pad_frames(bsz, frames_per_step)
    betas, pos_t, _ = _pad_frame_group(b_pad, betas, pos_t=pos_t)
    perm, params, blocks = _sorted_params_tracked(pos_t, sigma, kb, nkb)
    y_blk = pk._frame_major(y, b_pad, f_eff, n_steps, tile_p, p_count)
    beta_rows = pk._beta_warp_matrix(betas, f_eff)

    g, c1 = pl.pallas_call(
        functools.partial(
            _gram_kernel_culled, size=tuple(size), scaling=scaling,
            tile_p=tile_p, p_count=p_count, n_steps=n_steps, kb=kb,
            nkb=nkb, f=f_eff, dot_mode=dot_mode, tps=1, tracked=True,
        ),
        grid=(b_pad // f_eff, n_steps),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, ti: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 3 * f_eff, 10),
                         lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nkb, 2), lambda bi, ti: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((f_eff, k_pad, 8), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, f_eff, tile_p),
                         lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((f_eff, k_pad, k_pad),
                         lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_eff, k_pad, 1), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f_eff, k_pad, k_pad), jnp.float32),
            pltpu.VMEM((f_eff, k_pad, 1), jnp.float32),
        ] + ([
            pltpu.VMEM((k_pad, tile_p), jnp.bfloat16),
            pltpu.VMEM((k_pad, tile_p), jnp.bfloat16),
        ] if dot_mode == "split" else [
            pltpu.VMEM((k_pad, tile_p), jnp.float32),
        ]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(off, beta_rows, blocks, params, y_blk)

    return _unpermute_grams(g, c1, perm, bsz, k)


def _refine_kernel_culled(off_ref, beta_ref, blocks_ref, pos_ref, y_ref,
                          sse_ref, dp_ref, sse_acc, dp_acc, a_scr,
                          s_scr, *, size, scaling, tile_p, p_count,
                          n_tiles, kb, nkb, f, ncols=4):
    """Data term + raw position-gradient moments, per-frame positions.

    Per frame: ``recon = w * sum_k c_k A_k`` with
    ``A_k = exp(-sum_d (psi_d - pos_kd)^2 / s_kd^2)`` at the frame's OWN
    positions (``pos_ref [F, K_pad, 8]``, col 4 = c; per-axis widths).
    Outputs the masked SSE and the raw moments
    ``dp[k, d] = sum_p r_p w_p A_pk psi_pd`` (d < 3) and
    ``dp[k, 3] = sum_p r_p w_p A_pk``; the wrapper assembles
    ``dL/dpos_kd = (4 c_k / s_kd^2 / P) (dp[k, d] - pos_kd dp[k, 3])``.
    Unlike the beta gradient there is no fade-derivative term — the fade
    depends on psi only, not on the neuron positions.

    ``ncols=8`` adds the PER-AXIS second moments
    ``dp[k, 4+d] = sum_p r w A psi_pd^2`` (col 7 zero), from which the
    wrapper assembles the per-neuron SIGMA gradient
    ``dL/ds_kd = (4 c_k / (P s_kd^3)) sum_p r w A (psi_d - pos_kd)^2``
    via each axis's binomial expansion around ``pos_kd`` (isotropic
    callers sum the three axis terms — same math as the old
    ``|psi|^2`` single moment).
    """
    tile = pl.program_id(1)

    @pl.when(tile == 0)
    def _():
        sse_acc[:] = jnp.zeros_like(sse_acc)
        dp_acc[:] = jnp.zeros_like(dp_acc)

    off = off_ref[0, 0]
    idx, mi, ni, zi = _coord_rows(off + tile * tile_p, size, tile_p)
    psi, _ = _warp_rows_mf(beta_ref, mi, ni, zi, size, scaling, f)
    valid = (idx < off + p_count).astype(jnp.float32)
    w = _fade_row(psi, size) * valid  # [F, tp]
    t_lo = jnp.min(psi[0])
    t_hi = jnp.max(psi[0])
    actives = [
        (blocks_ref[i, 0] <= t_hi) & (blocks_ref[i, 1] >= t_lo)
        for i in range(nkb)
    ]
    hi_prec = jax.lax.Precision.HIGHEST
    dims = (((1,), (1,)), ((), ()))

    rs = []
    for fi in range(f):
        psi_f = tuple(p[fi:fi + 1, :] for p in psi)
        w_f = w[fi:fi + 1, :]
        pos_f = pos_ref[fi]  # [K_pad, 8]
        # Pass A: per-block footprints into scratch + the recon row
        # (culled blocks contribute exact f32 zeros — 6-sigma reach).
        s_scr[:] = jnp.zeros_like(s_scr)
        for i in range(nkb):
            @pl.when(actives[i])
            def _(i=i, psi_f=psi_f, pos_f=pos_f):
                sl = slice(i * kb, (i + 1) * kb)
                a = _block_footprint(psi_f, pos_f, i * kb, kb)
                a_scr[sl, :] = a
                s_scr[:] += jax.lax.dot_general(
                    pos_f[sl, 4:5], a, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=hi_prec,
                )
        r = (w_f * s_scr[:] - y_ref[fi:fi + 1, :] * valid) * valid
        rs.append(r)
        # Pass B: moment dots against (psi_m, psi_n, psi_z, 1[, |psi|^2]).
        rw = r * w_f
        rows = [psi_f[0], psi_f[1], psi_f[2], jnp.ones_like(rw)]
        if ncols > 4:
            rows.extend([psi_f[d] * psi_f[d] for d in range(3)])
            rows.extend([jnp.zeros_like(rw)] * (ncols - 7))
        mrows = jnp.concatenate(rows, axis=0)  # [ncols, tp]
        for i in range(nkb):
            @pl.when(actives[i])
            def _(i=i, fi=fi, rw=rw, mrows=mrows):
                sl = slice(i * kb, (i + 1) * kb)
                dp_acc[fi, sl, :] += jax.lax.dot_general(
                    a_scr[sl, :] * rw, mrows, dims,
                    preferred_element_type=jnp.float32,
                    precision=hi_prec,
                )
    r_all = jnp.concatenate(rs, axis=0)  # [F, tp]
    sse_acc[:] += jnp.sum(r_all * r_all, axis=1, keepdims=True)

    @pl.when(tile == n_tiles - 1)
    def _():
        sse_ref[:] = sse_acc[:]
        dp_ref[:] = dp_acc[:]


@functools.partial(
    jax.jit,
    static_argnames=("size", "scaling", "tile_p", "kblock",
                     "frames_per_step", "want_dsigma", "interpret"),
)
def refine_block_culled(
    betas: jnp.ndarray,
    pos_t: jnp.ndarray,
    sigma: jnp.ndarray,
    c_block: jnp.ndarray,
    y: jnp.ndarray,
    size,
    scaling: str = "normalized",
    tile_p: int = 4096,
    kblock: int = 40,
    frames_per_step: int = 8,
    p_offset=None,
    want_dsigma: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Culled data term + analytic PER-FRAME-POSITION gradient.

    The fused-kernel engine for position refinement
    (:func:`dnmf_tpu.models.refine.refine_positions`): per frame ``t``,
    ``mse_t = mean_p (w sum_k c_kt A_tk - y_t)^2`` with footprints
    anchored at that frame's own ``pos_t [B, K, 3]``, and its gradient
    wrt those positions.  Matches ``jax.grad`` of the XLA analytic path
    (data term only — the anchor tether is added by the caller, where it
    is O(K) work).  Returns ``(mse [B], dpos [B, K, 3])``.

    ``want_dsigma=True`` additionally returns ``dsigma [B, K]`` — each
    frame's data-term gradient wrt the per-neuron footprint widths
    (sigma is shared across frames; callers sum over the frame axis).
    This is the fused engine for per-neuron sigma fitting
    (:func:`dnmf_tpu.models.dnmf.sigma_epoch`), which the reference
    cannot do at all (sigma is frozen at ``shape_std``,
    ``/root/reference/Demix/dNMF.py:29``).

    ``p_offset`` (traced): pixel-sharded path — mse/dpos are local-voxel
    sums scaled by the LOCAL count; ``psum`` then global-rescale applies
    as for :func:`motion_block_culled`.
    """
    bsz = betas.shape[0]
    k = pos_t.shape[1]
    kb = min(kblock, _round_up(k, SUBLANE))
    nkb = -(-k // kb)
    k_pad = nkb * kb
    p_count = y.shape[1]
    p_pad = _round_up(p_count, tile_p)
    off = jnp.zeros((1, 1), jnp.int32) if p_offset is None else (
        jnp.asarray(p_offset, jnp.int32).reshape(1, 1))

    n_tiles = p_pad // tile_p
    f_eff, b_pad = pk._pad_frames(bsz, frames_per_step)
    betas, pos_t, c_block = _pad_frame_group(b_pad, betas,
                                             pos_t=pos_t,
                                             c_block=c_block)
    perm, params, blocks = _sorted_params_tracked(pos_t, sigma, kb, nkb,
                                                  c_block=c_block)
    y_blk = pk._frame_major(y, b_pad, f_eff, n_tiles, tile_p, p_count)

    ncols = 8 if want_dsigma else 4
    sse, dp = pl.pallas_call(
        functools.partial(
            _refine_kernel_culled, size=tuple(size), scaling=scaling,
            tile_p=tile_p, p_count=p_count, n_tiles=n_tiles, kb=kb,
            nkb=nkb, f=f_eff, ncols=ncols,
        ),
        grid=(b_pad // f_eff, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, ti: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 3 * f_eff, 10),
                         lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nkb, 2), lambda bi, ti: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((f_eff, k_pad, 8), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, f_eff, tile_p),
                         lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, f_eff, 1), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_eff, k_pad, ncols),
                         lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad // f_eff, f_eff, 1),
                                 jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k_pad, ncols), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f_eff, 1), jnp.float32),
            pltpu.VMEM((f_eff, k_pad, ncols), jnp.float32),
            pltpu.VMEM((k_pad, tile_p), jnp.float32),
            pltpu.VMEM((1, tile_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(off, pk._beta_warp_matrix(betas, f_eff), blocks, params, y_blk)

    mse = sse.reshape(b_pad)[:bsz] / p_count
    dp = dp[:bsz]  # [B, K_pad, ncols], sorted order
    pos_s = params[:bsz, :, :3]
    c_s = params[:bsz, :, 4]
    # Per-axis inv_s2 from the scale cols (pad rows carry 1).
    inv_s2 = jnp.stack(
        [params[:bsz, :, col] for col in pk.SCALE_COLS], axis=-1
    ) / pk.LOG2E  # [B, K_pad, 3]
    coeff = (4.0 * c_s[:, :, None] / p_count) * inv_s2
    dpos_s = coeff * (dp[:, :, :3] - pos_s * dp[:, :, 3:4])
    inv = jnp.argsort(perm)
    if not want_dsigma:
        return mse, dpos_s[:, :k][:, inv]
    # sum_p r w A (psi_d - pos_d)^2 per axis by binomial expansion:
    # M2_d - 2 pos_d M1_d + pos_d^2 M0 (cancellation ~pos^2/d2 in f32
    # — ~1e-3 relative at whole-brain coordinates, well inside the
    # optimizer's tolerance).
    d2mom = (dp[:, :, 4:7]
             - 2.0 * pos_s * dp[:, :, :3]
             + pos_s * pos_s * dp[:, :, 3:4])  # [B, K_pad, 3]
    # dL/ds_kd = (4 c_k / (P s_kd^3)) sum_p r w A d2_d; 1/s^3 = inv_s2^1.5.
    dsig_ax = (4.0 * c_s[:, :, None] * inv_s2 ** 1.5
               / p_count) * d2mom                # [B, K_pad, 3]
    if sigma.ndim == 2:  # anisotropic: per-axis gradient [B, K, 3]
        return mse, dpos_s[:, :k][:, inv], dsig_ax[:, :k][:, inv]
    # Isotropic: the shared-width gradient is the sum of axis terms.
    return (mse, dpos_s[:, :k][:, inv],
            jnp.sum(dsig_ax, axis=-1)[:, :k][:, inv])


def _gram_kernel_streamed(blocks_ref, pos_ref, psim_ref, psin_ref,
                          psiz_ref, w_ref, y_ref, g_ref, c1_ref, g_acc,
                          c1_acc, *scr, tile_p, n_tiles, kb, nkb, f,
                          dot_mode):
    """Culled Gram kernel consuming PRECOMPUTED psi/fade rows.

    MEASURED NEGATIVE RESULT (round 3, kept as the psi-injection hook +
    evidence): streaming XLA-generated psi/fade rows runs 7.1 vs 5.9
    ms/frame for the in-kernel rows at whole-brain K=200.  The ablation
    probes that motivated it (BASELINE.md) showed the kernel's time is
    UNCHANGED with dots+exp+stores removed AND with coords/warp/fade
    removed — i.e. the kernel is bound by ~2.2 us of per-(frame, tile)
    grid-pipeline overhead (DMA issue latency + buffer rotation), not
    by any body compute.  Adding four more streamed inputs per step
    only adds DMA issue overhead, hence the regression.  The lever that
    actually moves the wall is the STEP COUNT (tile_p / frames_per_step
    trade against VMEM) — see the tuning notes in ``_CulledShim``.

    Padded pixels carry w=0 (zero contribution) and psi=0 (they only
    loosen the final partial tile's cull interval toward m=0).
    """
    tile = pl.program_id(1)

    @pl.when(tile == 0)
    def _():
        g_acc[:] = jnp.zeros_like(g_acc)
        c1_acc[:] = jnp.zeros_like(c1_acc)

    split = dot_mode == "split"
    if split:
        ahi_scr, alo_scr = scr
        a_scr = None
    else:
        (a_scr,) = scr
        ahi_scr = alo_scr = None

    _culled_tile_body(
        None, lambda fi: y_ref[fi:fi + 1, :], None, blocks_ref,
        pos_ref, g_acc, c1_acc, a_scr, ahi_scr, alo_scr, off=None,
        size=None, scaling=None, tile_p=tile_p, p_count=None, kb=kb,
        nkb=nkb, f=f, split=split,
        psiget=lambda: ((psim_ref[:], psin_ref[:], psiz_ref[:]),
                        w_ref[:]),
    )

    @pl.when(tile == n_tiles - 1)
    def _():
        c1_ref[:] = c1_acc[:]
        lower_mask = jax.lax.broadcasted_iota(
            jnp.int32, (f,) + g_acc.shape[1:], 1
        ) // kb > jax.lax.broadcasted_iota(
            jnp.int32, (f,) + g_acc.shape[1:], 2
        ) // kb
        g_full = g_acc[:]
        g_ref[:] = jnp.where(lower_mask,
                             jnp.transpose(g_full, (0, 2, 1)), g_full)


def _xla_psi_rows(betas, size, scaling):
    """``(psi [B, P, 3] pixel-space, fade w [B, P])`` via one HIGHEST
    matmul per frame over the static voxel basis + lane-efficient
    elementwise fade (matches ``_warp_rows_mf`` + ``_fade_row``)."""
    from dnmf_tpu.ops import basis as B

    vb = (B.voxel_basis_normalized(size) if scaling == "normalized"
          else B.voxel_basis(size))

    def one(beta_t):
        psi = B.warp_voxel_coords(vb, beta_t, size, scaling)  # [P, 3]
        w = None
        for d in range(3):
            hi_d = float(size[d]) - 1.0
            dist = jnp.minimum(psi[:, d], hi_d - psi[:, d])
            wd = jnp.clip(1.0 + dist, 0.0, 1.0)
            w = wd if w is None else w * wd
        return psi, w

    return jax.vmap(one)(betas)


def _motion_kernel_culled(off_ref, beta_ref, blocks_ref, pos_ref, w2_ref,
                          y_ref, sse_ref, dbeta_ref, sse_acc, dbeta_acc,
                          s_scr, b1x_scr, b1y_scr, b1z_scr, b2x_scr,
                          b2y_scr, b2z_scr, *, size, scaling, tile_p,
                          p_count, n_tiles, kb, nkb, f):
    tile = pl.program_id(1)

    @pl.when(tile == 0)
    def _():
        sse_acc[:] = jnp.zeros_like(sse_acc)
        dbeta_acc[:] = jnp.zeros_like(dbeta_acc)

    # Multi-frame step (dense-kernel pattern): the shared row machinery
    # (coords, basis, warp polynomial, fade) and the dpsi gradient-row
    # chain vectorize over F frames on the sublane axis.  Unlike the
    # Gram kernel (whose per-frame [K_pad, K_pad] accumulator made
    # multi-frame steps 1.7x SLOWER), the only per-frame state here is
    # five [F, tile_p] row scratches, so F=8 does win — but modestly
    # (6.78 vs 7.20 ms/frame at whole-brain K=200, bit-identical
    # outputs): the per-(frame, block) exp + weights-dot work, which
    # F-sharing cannot amortize, dominates this kernel.
    off = off_ref[0, 0]
    idx, mi, ni, zi = _coord_rows(off + tile * tile_p, size, tile_p)
    psi, phi = _warp_rows_mf(beta_ref, mi, ni, zi, size, scaling, f)
    valid = (idx < off + p_count).astype(jnp.float32)
    w = _fade_row(psi, size) * valid  # [F, tp]
    # Culling bounds: union over the step's F frames (one reduce; the
    # per-frame deformed ranges differ by at most the warp spread).
    t_lo = jnp.min(psi[0])
    t_hi = jnp.max(psi[0])

    actives = [
        (blocks_ref[i, 0] <= t_hi) & (blocks_ref[i, 1] >= t_lo)
        for i in range(nkb)
    ]

    # Row scratches: S = cA, B1_d = (2c/s_d^2)A, B2_d = (2 c p_d/s_d^2)A
    # (per-axis widths; isotropic is the equal-scales case), accumulated
    # over active neuron blocks, frames on sublanes.
    s_scr[:] = jnp.zeros_like(s_scr)
    b1x_scr[:] = jnp.zeros_like(b1x_scr)
    b1y_scr[:] = jnp.zeros_like(b1y_scr)
    b1z_scr[:] = jnp.zeros_like(b1z_scr)
    b2x_scr[:] = jnp.zeros_like(b2x_scr)
    b2y_scr[:] = jnp.zeros_like(b2y_scr)
    b2z_scr[:] = jnp.zeros_like(b2z_scr)
    hi_prec = jax.lax.Precision.HIGHEST
    for fi in range(f):
        psi_f = tuple(p[fi:fi + 1, :] for p in psi)
        for i in range(nkb):
            @pl.when(actives[i])
            def _(fi=fi, i=i):
                lo = i * kb
                a = _block_footprint(psi_f, pos_ref[fi], lo, kb)
                weights = jnp.concatenate(
                    [pos_ref[fi, lo:lo + kb, 4:5],
                     w2_ref[fi, lo:lo + kb, 0:6],
                     jnp.zeros((kb, 1), dtype=jnp.float32)],
                    axis=1,
                )  # [kb, 8]
                rows = jax.lax.dot_general(
                    weights, a, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=hi_prec,
                )  # [8, tp]
                s_scr[fi:fi + 1, :] += rows[0:1, :]
                b2x_scr[fi:fi + 1, :] += rows[1:2, :]
                b2y_scr[fi:fi + 1, :] += rows[2:3, :]
                b2z_scr[fi:fi + 1, :] += rows[3:4, :]
                b1x_scr[fi:fi + 1, :] += rows[4:5, :]
                b1y_scr[fi:fi + 1, :] += rows[5:6, :]
                b1z_scr[fi:fi + 1, :] += rows[6:7, :]

    s = s_scr[:]
    b1 = (b1x_scr[:], b1y_scr[:], b1z_scr[:])
    b2 = (b2x_scr[:], b2y_scr[:], b2z_scr[:])
    recon = w * s
    r = (recon - y_ref[:] * valid) * valid  # [F, tp]
    sse_acc[:] += jnp.sum(r * r, axis=1, keepdims=True)

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
    static_argnames=("size", "scaling", "tile_p", "kblock",
                     "frames_per_step", "interpret"),
)
def motion_block_culled(
    betas: jnp.ndarray,
    pos: jnp.ndarray,
    sigma: jnp.ndarray,
    c_block: jnp.ndarray,
    y: jnp.ndarray,
    size,
    scaling: str = "normalized",
    tile_p: int = 8192,
    kblock: int = 64,
    frames_per_step: int = 8,
    p_offset=None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Culled data term + analytic beta gradient: ``(mse [B], dbeta)``.

    ``frames_per_step`` frames share one grid step's row machinery
    (coords/basis/warp/fade/gradient rows on the sublane axis — see the
    kernel comment); 8 is the measured whole-brain optimum.

    ``p_offset`` (traced): pixel-sharded/TP path — ``y`` covers global
    voxels ``[p_offset, p_offset + y.shape[1])``; mse/dbeta are
    local-voxel means (pixel-axis ``psum / npix`` gives global values).
    """
    bsz = betas.shape[0]
    k = pos.shape[0]
    kb = min(kblock, _round_up(k, SUBLANE))
    nkb = -(-k // kb)
    k_pad = nkb * kb
    p_count = y.shape[1]
    p_pad = _round_up(p_count, tile_p)

    off = jnp.zeros((1, 1), jnp.int32) if p_offset is None else (
        jnp.asarray(p_offset, jnp.int32).reshape(1, 1))
    n_tiles = p_pad // tile_p
    f_eff, b_pad = pk._pad_frames(bsz, frames_per_step)
    betas, _, c_block = _pad_frame_group(b_pad, betas,
                                         c_block=c_block)
    perm, params, blocks, w2 = _sorted_params(pos, sigma, kb, nkb,
                                              c_block=c_block)
    y_blk = pk._frame_major(y, b_pad, f_eff, n_tiles, tile_p, p_count)

    sse, dbeta_t = pl.pallas_call(
        functools.partial(
            _motion_kernel_culled, size=tuple(size), scaling=scaling,
            tile_p=tile_p, p_count=p_count, n_tiles=n_tiles, kb=kb,
            nkb=nkb, f=f_eff,
        ),
        grid=(b_pad // f_eff, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, ti: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 3 * f_eff, 10),
                         lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nkb, 2), lambda bi, ti: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((f_eff, k_pad, 8), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_eff, k_pad, 8), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, f_eff, tile_p),
                         lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # [groups, F, 1]: trailing (F, 1) block equals the array
            # dims for any F (a flat (F, 1) block over [b_pad, 1] is
            # rejected when F < 8 and F < b_pad).
            pl.BlockSpec((None, f_eff, 1), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_eff, 3, 10), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad // f_eff, f_eff, 1),
                                 jnp.float32),
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
    )(off, pk._beta_warp_matrix(betas, f_eff), blocks, params, w2,
      y_blk)
    return (sse.reshape(b_pad)[:bsz] / p_count,
            jnp.transpose(dbeta_t, (0, 2, 1))[:bsz])
