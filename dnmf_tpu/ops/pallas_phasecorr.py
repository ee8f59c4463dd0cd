"""Fused phase-correlation kernel for patch registration.

TPU-native replacement for the per-patch correlation stage of
piecewise-rigid registration (reference ``tile_and_correct``'s per-patch
``register_translation`` loop, ``/root/reference/Demix/MotionCorrect.py:
1344,1390-1392`` — the FFT/product/inverse/masked-argmax chain of
``register_translation_3d``, ``:648-797``).

Round-3 stage probes (tools/reg_bench.py, 512x512x20, 32 patches of
160x160x10, 16-frame dispatches) showed the XLA matrix-DFT correlation
costs ~8.5 ms/frame while its MXU FLOPs are worth ~1-2 ms: the cost is
HBM round-trips and relayouts between the per-axis DFT passes, the
complex-arithmetic expansion, and the masked argmax — all separate XLA
ops.  This kernel runs the whole chain per patch inside VMEM:

* patches live as 2-D ``[z*m, n]`` f32 arrays (the thin z axis never
  touches the lane axis; per-z slices are static sublane windows);
* m/n DFT passes are MXU dots against host-precomputed cos/-sin weight
  matrices, complex arithmetic expanded into real dots;
* the z DFT passes unroll with compile-time scalar weights (z is tiny)
  on the VPU;
* the cross-power product, inverse transform, shift-window mask over
  signed wrapped indices (traced bounds), and the argmax all stay in
  registers/VMEM;
* outputs: the integer signed shift per patch plus the product spectrum
  (for the XLA-side subpixel matrix-DFT refinement, which is cheap).

Grid is ``(n_frames, n_patches)`` with patches innermost: each frame's
``[NP, 8]`` shifts block is revisited across consecutive steps and
written back once per frame, while the per-patch template spectrum
blocks are refetched each step (~2 MB/step — negligible against the
body; see the inline comment at the ``pallas_call``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dft_weights_np(n: int):
    """``(cos, -sin)`` matrices of the unitary-free DFT
    ``w[k, x] = exp(-2i pi k x / n)`` (same convention as
    ``fft_reg._dft_matrix_np``)."""
    k = np.arange(n)
    ang = 2.0 * np.pi * np.outer(k, k) / n
    return (np.cos(ang).astype(np.float32),
            (-np.sin(ang)).astype(np.float32))


def _phasecorr_kernel(patch_ref, tre_ref, tim_ref, bounds_ref,
                      wmre_ref, wmim_ref, wnre_ref, wnim_ref,
                      shifts_ref, pre_ref, pim_ref, *, m, n, z,
                      precision):
    czr, czi = _dft_weights_np(z)  # compile-time scalars (z is tiny)

    def raw_dot(a, b, prec):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    if precision == "high":
        # Mosaic rejects Precision.HIGH — emulate bf16x3 by hand:
        # x = hi + lo (bf16 split), A·B ≈ Ah·Bh + Ah·Bl + Al·Bh.
        # ~1e-6 relative error at half the 6-pass HIGHEST cost.
        def dot(a, b):
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            bh = b.astype(jnp.bfloat16)
            bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            d = functools.partial(raw_dot,
                                  prec=jax.lax.Precision.DEFAULT)
            return d(ah, bh) + d(ah, bl) + d(al, bh)
    else:
        prec = (jax.lax.Precision.HIGHEST if precision == "highest"
                else jax.lax.Precision.DEFAULT)
        dot = functools.partial(raw_dot, prec=prec)

    wmre, wmim = wmre_ref[:], wmim_ref[:]
    wnre, wnim = wnre_ref[:], wnim_ref[:]

    def rows(a, k):
        return a[k * m:(k + 1) * m, :]

    p = patch_ref[:]  # [z*m, n] real
    # Forward m-pass (left-multiply; real input: 2 dots per z-slice).
    bre = [dot(wmre, rows(p, k)) for k in range(z)]
    bim = [dot(wmim, rows(p, k)) for k in range(z)]
    # Forward n-pass (right-multiply by the symmetric W_n; complex).
    cre = [dot(bre[k], wnre) - dot(bim[k], wnim) for k in range(z)]
    cim = [dot(bre[k], wnim) + dot(bim[k], wnre) for k in range(z)]
    # Forward z-pass: unrolled constant-scalar FMAs on [m, n] planes.
    sre = [
        sum(czr[k][x] * cre[x] - czi[k][x] * cim[x] for x in range(z))
        for k in range(z)
    ]
    sim = [
        sum(czr[k][x] * cim[x] + czi[k][x] * cre[x] for x in range(z))
        for k in range(z)
    ]
    # Cross-power product with the conjugated template spectrum.
    tre, tim = tre_ref[:], tim_ref[:]
    qre = [sre[k] * rows(tre, k) + sim[k] * rows(tim, k)
           for k in range(z)]
    qim = [sim[k] * rows(tre, k) - sre[k] * rows(tim, k)
           for k in range(z)]
    pre_ref[:] = jnp.concatenate(qre, axis=0)
    pim_ref[:] = jnp.concatenate(qim, axis=0)
    # Inverse n-pass (right-multiply by conj(W_n); scale folded at end).
    rre = [dot(qre[k], wnre) + dot(qim[k], wnim) for k in range(z)]
    rim = [dot(qim[k], wnre) - dot(qre[k], wnim) for k in range(z)]
    # Inverse m-pass (left-multiply by conj(W_m)).
    ure = [dot(wmre, rre[k]) + dot(wmim, rim[k]) for k in range(z)]
    uim = [dot(wmre, rim[k]) - dot(wmim, rre[k]) for k in range(z)]
    # Inverse z-pass, real part only (the correlation of real inputs is
    # real); conj(w)[x, k] has re=czr, im=+sin=-czi.
    scale = 1.0 / float(m * n * z)
    cc = [
        sum(czr[x][k] * ure[k] + czi[x][k] * uim[k] for k in range(z))
        * scale
        for x in range(z)
    ]
    mag = jnp.abs(jnp.concatenate(cc, axis=0))  # [z*m, n]

    # Shift-window mask over signed wrapped indices (traced bounds).
    row = jax.lax.broadcasted_iota(jnp.int32, (z * m, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (z * m, n), 1)
    zi = row // m
    mi = row % m
    sm = jnp.where(mi > m // 2, mi - m, mi).astype(jnp.float32)
    sn = jnp.where(col > n // 2, col - n, col).astype(jnp.float32)
    sz = jnp.where(zi > z // 2, zi - z, zi).astype(jnp.float32)
    bi = pl.program_id(0)
    lbm, lbn, lbz = (bounds_ref[bi, 0], bounds_ref[bi, 1],
                     bounds_ref[bi, 2])
    ubm, ubn, ubz = (bounds_ref[bi, 3], bounds_ref[bi, 4],
                     bounds_ref[bi, 5])
    keep = ((sm >= lbm) & (sm <= ubm - 1.0)
            & (sn >= lbn) & (sn <= ubn - 1.0)
            & (sz >= lbz) & (sz <= ubz - 1.0))
    magm = jnp.where(keep, mag, -1.0)

    # Argmax: per-row max over lanes, then min row index attaining the
    # global max (first-occurrence tie-break), then min column within
    # that row.
    rowmax = jnp.max(magm, axis=1, keepdims=True)  # [z*m, 1]
    vmax = jnp.max(rowmax)
    riota = jax.lax.broadcasted_iota(jnp.int32, (z * m, 1), 0)
    brow = jnp.min(jnp.where(rowmax == vmax, riota, z * m))
    inrow = (row == brow) & (magm == vmax)
    bcol = jnp.min(jnp.where(inrow, col, n))
    bz = brow // m
    bm = brow % m
    sh_m = jnp.where(bm > m // 2, bm - m, bm).astype(jnp.float32)
    sh_n = jnp.where(bcol > n // 2, bcol - n, bcol).astype(jnp.float32)
    sh_z = jnp.where(bz > z // 2, bz - z, bz).astype(jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    out = jnp.where(lane == 0, sh_m,
                    jnp.where(lane == 1, sh_n,
                              jnp.where(lane == 2, sh_z, 0.0)))
    # One row per patch into the frame's [NP, 8] block (patches are the
    # inner grid loop, so the block is revisited consecutively and
    # written back once per frame).
    shifts_ref[pl.ds(pl.program_id(1), 1), :] = out


@functools.partial(
    jax.jit, static_argnames=("z", "precision", "interpret"))
def phase_corr_block(
    patches: jnp.ndarray,
    tmpl_re: jnp.ndarray,
    tmpl_im: jnp.ndarray,
    bounds: jnp.ndarray,
    z: int,
    precision: str = "highest",
    interpret: bool = False,
):
    """Integer-shift phase correlation of a frame-block patch stack.

    Args:
      patches: ``[B, NP, z*m, n]`` f32 — per-frame patches in the
        z-major 2-D layout (see :func:`to_zm_n`).
      tmpl_re, tmpl_im: ``[NP, z*m, n]`` template patch spectra
        (:func:`patch_spectra`) — shared across frames.
      bounds: ``[B, 8]`` f32 rows ``(lb_m, lb_n, lb_z, ub_m, ub_n,
        ub_z, 0, 0)``; shifts kept in ``[lb, ub - 1]`` per dim (the
        reference's asymmetric window).
      z: static depth of the patch window.
      precision: "highest" (6-pass f32 dots, default) or "default".

    Returns:
      ``(shifts [B, NP, 3] f32 signed integer (m, n, z) shifts,
      prod_re [B, NP, z*m, n], prod_im [B, NP, z*m, n])`` — the product
      spectra feed the XLA-side subpixel refinement.
    """
    b, np_, zm, n = patches.shape
    if tmpl_re.shape != (np_, zm, n):
        raise ValueError("template spectra do not match patches")
    if zm % z:
        raise ValueError(f"z={z} does not divide z*m={zm}")
    m = zm // z
    wmre, wmim = _dft_weights_np(m)
    wnre, wnim = _dft_weights_np(n)

    # Frames outer / patches inner: each frame's [NP, 8] shifts block is
    # revisited across consecutive steps (written back once per frame);
    # the template spectrum block repeats per frame (~2 MB refetch per
    # step, negligible vs the body).
    grid = (b, np_)
    kernel = functools.partial(
        _phasecorr_kernel, m=m, n=n, z=z, precision=precision,
    )
    shifts, pre, pim = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, None, zm, n),
                         lambda bi, p: (bi, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, zm, n), lambda bi, p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, zm, n), lambda bi, p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 8), lambda bi, p: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m, m), lambda bi, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda bi, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda bi, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda bi, p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, np_, 8), lambda bi, p: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, zm, n),
                         lambda bi, p: (bi, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, zm, n),
                         lambda bi, p: (bi, p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, np_, 8), jnp.float32),
            jax.ShapeDtypeStruct((b, np_, zm, n), jnp.float32),
            jax.ShapeDtypeStruct((b, np_, zm, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(patches, tmpl_re, tmpl_im, bounds,
      jnp.asarray(wmre), jnp.asarray(wmim),
      jnp.asarray(wnre), jnp.asarray(wnim))
    return shifts[:, :, :3], pre, pim


def to_zm_n(patches: jnp.ndarray) -> jnp.ndarray:
    """``[..., m, n, z] -> [..., z*m, n]`` kernel layout."""
    m, n, z = patches.shape[-3:]
    lead = patches.shape[:-3]
    moved = jnp.moveaxis(patches, -1, -3)  # [..., z, m, n]
    return moved.reshape(lead + (z * m, n))


def patch_spectra(tmpl_patches: jnp.ndarray):
    """Template patch spectra in the kernel layout.

    Args:
      tmpl_patches: ``[NP, m, n, z]`` real.

    Returns:
      ``(tmpl_re, tmpl_im)`` each ``[NP, z*m, n]`` — the full complex
      DFT spectrum (standard per-axis convention, matching the kernel's
      weight matrices) laid out z-major.
    """
    from dnmf_tpu.ops import fft_reg

    np_, m, n, z = tmpl_patches.shape
    vol_zmn = jnp.moveaxis(tmpl_patches, -1, 1)  # [NP, z, m, n]
    spec = jax.vmap(fft_reg.matrix_dftn)(vol_zmn)  # [NP, z, m, n]
    spec = spec.reshape(np_, z * m, n)
    return jnp.real(spec).astype(jnp.float32), \
        jnp.imag(spec).astype(jnp.float32)
