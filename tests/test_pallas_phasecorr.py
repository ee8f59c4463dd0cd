"""Fused phase-correlation kernel vs the XLA matrix-DFT path
(interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnmf_tpu.ops import fft_reg
from dnmf_tpu.ops import pallas_phasecorr as pp

M, N, Z = 16, 16, 4
NP = 3
B = 2


def _fixture(rng):
    """Patches = noise templates Fourier-shifted by known amounts."""
    tmpl = rng.random((NP, M, N, Z)).astype(np.float32)
    # Per-frame, per-patch true shifts inside the [-3, 3] / [-1, 1] window
    true = np.stack([
        np.stack([[1.0, -2.0, 1.0], [-3.0, 0.0, -1.0], [2.0, 3.0, 0.0]]),
        np.stack([[0.0, 1.0, -1.0], [2.0, -2.0, 1.0], [-1.0, -1.0, 0.0]]),
    ])  # [B, NP, 3]
    pats = np.zeros((B, NP, M, N, Z), np.float32)
    for b in range(B):
        for p in range(NP):
            pats[b, p] = np.asarray(fft_reg.apply_shifts_fourier(
                jnp.asarray(tmpl[p]), jnp.asarray(true[b, p]),
                border_nan=False,
            ))
    return tmpl, pats, true


def _bounds(lb, ub):
    row = np.zeros((B, 8), np.float32)
    row[:, :3] = lb
    row[:, 3:6] = ub
    return jnp.asarray(row)


def test_integer_shifts_match_xla(rng):
    tmpl, pats, true = _fixture(rng)
    tre, tim = pp.patch_spectra(jnp.asarray(tmpl))
    shifts, pre, pim = pp.phase_corr_block(
        pp.to_zm_n(jnp.asarray(pats)), tre, tim,
        _bounds([-4.0, -4.0, -2.0], [4.0, 4.0, 2.0]), z=Z,
        interpret=True,
    )
    # The XLA reference (matmul impl, usf=1) per frame/patch.
    for b in range(B):
        for p in range(NP):
            s_ref, _, _ = fft_reg.phase_cross_correlation(
                jnp.asarray(pats[b, p]), jnp.asarray(tmpl[p]),
                upsample_factor=1, fft_impl="matmul",
                shifts_lb=jnp.asarray([-4.0, -4.0, -2.0]),
                shifts_ub=jnp.asarray([4.0, 4.0, 2.0]),
            )
            np.testing.assert_allclose(
                np.asarray(shifts[b, p]), np.asarray(s_ref), atol=0,
                err_msg=f"frame {b} patch {p}",
            )
            # And the coarse shifts recover the planted translation.
            np.testing.assert_allclose(
                np.asarray(shifts[b, p]), true[b, p], atol=0,
            )


def test_product_spectrum_matches_xla(rng):
    tmpl, pats, _ = _fixture(rng)
    tre, tim = pp.patch_spectra(jnp.asarray(tmpl))
    _, pre, pim = pp.phase_corr_block(
        pp.to_zm_n(jnp.asarray(pats)), tre, tim,
        _bounds([-4.0, -4.0, -2.0], [4.0, 4.0, 2.0]), z=Z,
        interpret=True,
    )
    for b in range(B):
        for p in range(NP):
            src = fft_reg.matrix_dftn(
                jnp.moveaxis(jnp.asarray(pats[b, p]), -1, 0))
            tgt = fft_reg.matrix_dftn(
                jnp.moveaxis(jnp.asarray(tmpl[p]), -1, 0))
            prod_ref = src * jnp.conj(tgt)  # [z, m, n]
            got = (np.asarray(pre[b, p]) + 1j * np.asarray(pim[b, p])
                   ).reshape(Z, M, N)
            scale = float(jnp.max(jnp.abs(prod_ref)))
            np.testing.assert_allclose(
                got, np.asarray(prod_ref), atol=2e-5 * scale,
                err_msg=f"frame {b} patch {p}",
            )


def test_subpixel_pipeline_matches_xla(rng):
    """Kernel coarse shifts + shared subpixel_refine == the XLA
    phase_cross_correlation at usf=4, including fractional shifts."""
    tmpl = rng.random((NP, M, N, Z)).astype(np.float32)
    true = np.stack([
        np.stack([[1.25, -2.5, 0.75], [-2.75, 0.5, -0.5],
                  [2.0, 2.25, 0.25]]),
        np.stack([[0.5, 1.75, -0.75], [1.5, -2.25, 0.5],
                  [-0.25, -1.5, 0.0]]),
    ])
    pats = np.zeros((B, NP, M, N, Z), np.float32)
    for b in range(B):
        for p in range(NP):
            pats[b, p] = np.asarray(fft_reg.apply_shifts_fourier(
                jnp.asarray(tmpl[p]), jnp.asarray(true[b, p]),
                border_nan=False,
            ))
    lb = jnp.asarray([-4.0, -4.0, -2.0])
    ub = jnp.asarray([4.0, 4.0, 2.0])
    tre, tim = pp.patch_spectra(jnp.asarray(tmpl))
    shifts, pre, pim = pp.phase_corr_block(
        pp.to_zm_n(jnp.asarray(pats)), tre, tim, _bounds(lb, ub), z=Z,
        interpret=True,
    )
    usf = 4
    for b in range(B):
        for p in range(NP):
            prod = (pre[b, p] + 1j * pim[b, p]).reshape(Z, M, N)
            s_fine, ccmax = fft_reg.subpixel_refine(
                prod, shifts[b, p], usf, (M, N, Z),
                prod_layout=(2, 0, 1),
            )
            s_ref, _, dp_ref = fft_reg.phase_cross_correlation(
                jnp.asarray(pats[b, p]), jnp.asarray(tmpl[p]),
                upsample_factor=usf, fft_impl="matmul",
                shifts_lb=lb, shifts_ub=ub,
            )
            np.testing.assert_allclose(
                np.asarray(s_fine), np.asarray(s_ref), atol=1e-5,
                err_msg=f"frame {b} patch {p}",
            )
            dp = jnp.arctan2(jnp.imag(ccmax), jnp.real(ccmax))
            np.testing.assert_allclose(
                float(dp), float(dp_ref), atol=1e-4,
            )
            # Truth recovery: 1/usf resolution on the long axes; the
            # 4-point z axis aliases fractional shifts (both the kernel
            # and XLA paths refine 0.75 -> 1.0 there), so allow 0.3.
            np.testing.assert_allclose(
                np.asarray(s_fine[:2]), true[b, p][:2],
                atol=0.5 / usf + 1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(s_fine[2:]), true[b, p][2:], atol=0.3,
            )


def test_singleton_z(rng):
    """2-D patches ride through as z=1 volumes."""
    tmpl = rng.random((2, M, N, 1)).astype(np.float32)
    pats = np.zeros((1, 2, M, N, 1), np.float32)
    true = np.array([[2.0, -3.0, 0.0], [-1.0, 1.0, 0.0]])
    for p in range(2):
        pats[0, p] = np.asarray(fft_reg.apply_shifts_fourier(
            jnp.asarray(tmpl[p]), jnp.asarray(true[p]),
            border_nan=False,
        ))
    tre, tim = pp.patch_spectra(jnp.asarray(tmpl))
    row = np.zeros((1, 8), np.float32)
    row[:, :3] = [-4.0, -4.0, -1.0]
    row[:, 3:6] = [4.0, 4.0, 1.0]
    shifts, _, _ = pp.phase_corr_block(
        pp.to_zm_n(jnp.asarray(pats)), tre, tim, jnp.asarray(row), z=1,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(shifts[0]), true, atol=0)
