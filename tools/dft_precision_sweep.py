"""dft_precision decision sweep (VERDICT r3 #8 / NOTES gap #3).

The fused phase-correlation kernel's DFT dots run at one of three
precisions (``RegistrationConfig.dft_precision``): "highest" (6-pass
f32 emulation), "high" (bf16x3, the default), "default" (single-pass
bf16).  Raw bf16 measured 3.6 vs 4.9 ms/frame for the correlation
stage — a defensible default flip ONLY if low-SNR, small-subpixel-shift
fixtures land the same shift estimates.  This harness measures exactly
that: known circular subpixel shifts (Fourier-applied in float64 on the
host) + Gaussian noise at several SNRs, estimated per patch by
``tile_and_correct_block`` at each precision, reported as shift error
vs ground truth.

Run on the chip: ``python tools/dft_precision_sweep.py``
Prints one JSON line with per-(snr, precision) error stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def fourier_shift(vol: np.ndarray, shift) -> np.ndarray:
    """Circularly shift ``vol`` by a (possibly fractional) 3-vector via
    the Fourier shift theorem in float64 — the exact ground-truth
    displacement for a circular-correlation estimator."""
    f = np.fft.fftn(vol.astype(np.float64))
    for ax, s in enumerate(shift):
        freqs = np.fft.fftfreq(vol.shape[ax])
        phase = np.exp(-2j * np.pi * freqs * s)
        shape = [1] * vol.ndim
        shape[ax] = -1
        f *= phase.reshape(shape)
    return np.real(np.fft.ifftn(f))


def make_fixture(size, b, rng, snr_db):
    """Smoothed-noise template + B subpixel-shifted noisy frames.

    Returns (template f32, frames [B, *size] f32, shifts_gt [B, 3]).
    SNR is content-power over noise-power in dB.
    """
    from scipy.ndimage import gaussian_filter

    tmpl = gaussian_filter(rng.normal(size=size), (2.0, 2.0, 1.0))
    tmpl = (tmpl - tmpl.mean()).astype(np.float64)
    sig_pow = np.mean(tmpl**2)
    noise_std = float(np.sqrt(sig_pow / (10 ** (snr_db / 10.0))))
    shifts = np.stack([
        rng.uniform(-2.0, 2.0, b),
        rng.uniform(-2.0, 2.0, b),
        rng.uniform(-1.0, 1.0, b),
    ], axis=1)
    # Bias toward the hard small-shift regime: half the frames < 0.5 px.
    shifts[: b // 2] *= 0.2
    frames = np.stack([
        fourier_shift(tmpl, s) + rng.normal(size=size) * noise_std
        for s in shifts
    ])
    return (tmpl.astype(np.float32), frames.astype(np.float32),
            shifts.astype(np.float64))


def run_sweep(size=(256, 256, 10), b=8, snrs=(10.0, 0.0, -5.0),
              precisions=("high", "default"), seed=0):
    from dnmf_tpu.registration.motion_correct import (
        tile_and_correct_block,
    )

    strides = (size[0] // 2, size[1] // 2, size[2])
    overlaps = (32, 32, 0)
    results = {}
    rng = np.random.default_rng(seed)
    for snr in snrs:
        tmpl, frames, gt = make_fixture(size, b, rng, snr)
        tmpl_j = jnp.asarray(tmpl)
        frames_j = jnp.asarray(frames)
        row = {}
        ests = {}
        for prec in precisions:
            fn = jax.jit(lambda fr, tm, p=prec: tile_and_correct_block(
                fr, tm, strides, overlaps, (4, 4, 2),
                max_deviation_rigid=2, upsample_factor_grid=4,
                upsample_factor_fft=10, use_remap=True,
                remap_mode="fused", border_nan=False,
                phasecorr_impl="fused", dft_precision=p,
                rigid_decimate=1,
            ))
            _, sh = fn(frames_j, tmpl_j)
            sh = np.asarray(sh)  # [B, n_patches, 3] corrections
            est = -sh.mean(axis=1)  # correction = -shift
            ests[prec] = est
            err = np.abs(est - gt)
            row[prec] = {
                "mean_err_px": round(float(err.mean()), 4),
                "max_err_px": round(float(err.max()), 4),
                "mean_err_small_shift_px": round(
                    float(err[: b // 2].mean()), 4),
            }
        if {"high", "default"} <= ests.keys():
            row["max_high_vs_default_px"] = round(float(np.max(
                np.abs(ests["high"] - ests["default"]))), 4)
        results[f"snr_{snr:+.0f}dB"] = row
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=3, default=[256, 256, 10])
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    out = run_sweep(size=tuple(args.size), b=args.frames,
                    seed=args.seed)
    print(json.dumps({"dft_precision_sweep": out,
                      "workload": f"{args.size} B={args.frames}, "
                                  "circular f64 subpixel shifts, "
                                  "half < 0.5 px"}, indent=None),
          flush=True)


if __name__ == "__main__":
    main()
