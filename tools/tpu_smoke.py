"""On-hardware validation: compiled kernels vs float64 references.

Interpret-mode tests (the pytest suite) cannot catch compiled-only
failures — Mosaic precision defaults, layout bugs, grid/accumulator
interactions — so this script re-derives every hot-path quantity in
float64 NumPy and compares against the compiled TPU output.

Run on a machine with a TPU attached:

    python tools/tpu_smoke.py            # quick (small shapes)
    python tools/tpu_smoke.py --full     # adds a whole-brain-scale check

Exits non-zero on any tolerance violation.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _f64_reference(size, pos, sigma, beta, y, scaling):
    """Float64 NumPy: warped footprints, Gram matrix, data projection."""
    m, n, z = size
    grid = np.stack(
        np.meshgrid(np.arange(m), np.arange(n), np.arange(z),
                    indexing="ij"),
        -1,
    ).reshape(-1, 3).astype(np.float64)
    sz = np.array(size, dtype=np.float64)
    if scaling == "normalized":
        denom = np.maximum(sz - 1.0, 1.0)
        gn = 2.0 * grid / denom - 1.0
    else:
        gn = grid
    x, yy, zz = gn[:, 0], gn[:, 1], gn[:, 2]
    phi = np.stack([np.ones_like(x), x, yy, zz, x * x, yy * yy, zz * zz,
                    x * yy, x * zz, yy * zz], 1)
    psi = phi @ beta.astype(np.float64)
    if scaling == "normalized":
        psi = (psi + 1.0) / 2.0 * np.maximum(sz - 1.0, 1.0)
    sig = sigma.astype(np.float64)
    if sig.ndim == 1:
        sig = np.broadcast_to(sig[:, None], sig.shape + (3,))
    expo = (((psi[:, None, :] - pos[None].astype(np.float64)) ** 2)
            / (sig[None] ** 2)).sum(-1)
    a = np.exp(-expo)
    hi = sz - 1.0
    w = np.clip(1 + np.minimum(psi, hi - psi), 0, 1).prod(1)
    aw = a * w[:, None]
    g = aw.T @ aw
    c1 = aw.T @ y.astype(np.float64)
    return aw, g, c1


def check(name, got, want, rtol, atol):
    got = np.asarray(got, dtype=np.float64)
    want = np.asarray(want, dtype=np.float64)
    err = np.abs(got - want)
    tol = atol + rtol * np.abs(want)
    # NaN-producing kernels are exactly the failure class this tool
    # exists to catch: NaN comparisons are False, so test explicitly.
    bad = (err > tol) | ~np.isfinite(got)
    status = "OK " if not bad.any() else "FAIL"
    print(f"[{status}] {name}: maxabs={np.nanmax(err):.3e} "
          f"scale={np.abs(want).max():.3e} "
          f"nonfinite={int((~np.isfinite(got)).sum())}")
    return not bad.any()


def run(size, k, scaling, tile_p, rtol=1e-3, atol=1e-4,
        grad_probes=True, aniso=False):
    import jax
    import jax.numpy as jnp

    from dnmf_tpu.models import dnmf as M
    from dnmf_tpu.ops import basis as B
    from dnmf_tpu.ops import pallas_culled as pc
    from dnmf_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(0)
    total_p = int(np.prod(size))
    hi = np.maximum(np.array(size, dtype=np.float64) - 4, 5)
    pos = rng.uniform(3, hi, (k, 3)).astype(np.float32)
    if aniso:  # per-axis widths, z-flattened (sigma [K, 3])
        print(f"-- anisotropic sigma [K, 3] pass ({scaling}) --")
        sigma = rng.uniform(2.0, 3.5, (k, 3)).astype(np.float32)
        sigma[:, 2] *= 0.6
    else:
        sigma = rng.uniform(2.0, 3.5, (k,)).astype(np.float32)
    beta = np.asarray(B.identity_beta(1))[0] + (
        0.002 * rng.normal(size=(10, 3)).astype(np.float32)
        if scaling == "normalized" else 0.0
    )
    # Shift the warp half a voxel off the lattice: at exact identity,
    # every border voxel lands exactly on a fade kink (psi = 0 or hi),
    # where the loss is non-smooth and central differences do not
    # converge (the kernel uses the autodiff tie subgradient there).
    # A 0.5-px translation puts all voxels 0.5 px from any kink, making
    # the finite-difference gradient oracle valid.
    for j, s in enumerate(size):
        h = max(float(s) - 1.0, 1.0)
        beta[0, j] += 0.5 if scaling == "pixel" else 1.0 / h
    y = rng.uniform(size=(total_p,)).astype(np.float32)
    c_t = rng.uniform(size=(k,)).astype(np.float32)

    aw, g_ref, c1_ref = _f64_reference(size, pos, sigma, beta, y, scaling)
    recon = aw @ c_t.astype(np.float64)
    r = recon - y
    mse_ref = float((r**2).mean())

    ok = True
    # "culled+split" is the production whole-brain configuration
    # (models layer passes dot_mode="split" for K > 64): the 3-pass
    # bf16-split Gram dot must stay within the same tolerance envelope.
    for label, fn, kw in (
        ("dense", pk.gram_block, {}),
        ("culled", pc.gram_block_culled, {}),
        ("culled+split", pc.gram_block_culled, {"dot_mode": "split"}),
        ("pipelined", pc.gram_block_pipelined, {"nbuf": 2}),
    ):
        g, c1 = fn(jnp.asarray(beta)[None], jnp.asarray(pos),
                   jnp.asarray(sigma), jnp.asarray(y)[None], size,
                   scaling=scaling, tile_p=tile_p, **kw)
        ok &= check(f"gram[{label}] G ({scaling})", g[0], g_ref, rtol, atol)
        ok &= check(f"gram[{label}] c1 ({scaling})", c1[0], c1_ref,
                    rtol, atol)

    # c1-only kernels (the analytic-Grams video pass), both impls.
    for label, kw in (("grid", {}),
                      ("pipelined", {"impl": "pipelined", "nbuf": 2})):
        c1o = pc.c1_block_culled(
            jnp.asarray(beta)[None], jnp.asarray(pos),
            jnp.asarray(sigma), jnp.asarray(y)[None], size,
            scaling=scaling, tile_p=tile_p, **kw)
        ok &= check(f"c1[{label}] ({scaling})", c1o[0], c1_ref, rtol,
                    atol)

    # Closed-form Grams (compiled XLA) vs the f64 pixel reduction.
    from dnmf_tpu.ops.gram_analytic import analytic_grams, default_window

    g_an = analytic_grams(
        jnp.asarray(beta)[None], jnp.asarray(pos), jnp.asarray(sigma),
        size, scaling=scaling, window=default_window(3.5))
    ok &= check(f"gram[analytic] G ({scaling})", g_an[0], g_ref,
                max(rtol, 2e-3), max(atol, 1e-3 * float(g_ref.max())))

    # Tracked (per-frame-position) Gram kernel vs an f64 reference at
    # jittered positions.
    pos_j = (pos + rng.normal(0, 0.4, pos.shape)).astype(np.float32)
    aw_j, g_ref_j, c1_ref_j = _f64_reference(size, pos_j, sigma, beta,
                                             y, scaling)
    g_t, c1_t = pc.gram_block_tracked(
        jnp.asarray(beta)[None], jnp.asarray(pos_j)[None],
        jnp.asarray(sigma), jnp.asarray(y)[None], size,
        scaling=scaling, tile_p=tile_p)
    ok &= check(f"gram[tracked] G ({scaling})", g_t[0], g_ref_j, rtol,
                atol)
    ok &= check(f"gram[tracked] c1 ({scaling})", c1_t[0], c1_ref_j,
                rtol, atol)

    # Refinement kernel: data term + analytic dpos vs f64 central
    # differences at the jittered positions.
    mse_j = float(((aw_j @ c_t.astype(np.float64) - y) ** 2).mean())
    r_mse, dpos = pc.refine_block_culled(
        jnp.asarray(beta)[None], jnp.asarray(pos_j)[None],
        jnp.asarray(sigma), jnp.asarray(c_t)[None],
        jnp.asarray(y)[None], size, scaling=scaling, tile_p=tile_p)
    ok &= check(f"refine mse ({scaling})", r_mse[0], mse_j, 1e-4, 1e-8)
    if grad_probes:
        def loss64_pos(p2):
            aw2, _, _ = _f64_reference(size, p2, sigma, beta, y,
                                       scaling)
            rr = aw2 @ c_t.astype(np.float64) - y
            return float((rr**2).mean())

        pprobes = [(0, 0), (min(3, k - 1), 1), (k - 1, 2)]
        fd_p, got_p = [], []
        d = np.asarray(dpos[0])
        for (ki, dj) in pprobes:
            eps = 1e-3
            pp = pos_j.copy(); pp[ki, dj] += eps
            pm = pos_j.copy(); pm[ki, dj] -= eps
            fd_p.append((loss64_pos(pp) - loss64_pos(pm)) / (2 * eps))
            got_p.append(d[ki, dj])
        fd_p, got_p = np.array(fd_p), np.array(got_p)
        ok &= check(f"refine dpos-fd ({scaling})", got_p, fd_p, 5e-3,
                    1e-3 * float(np.abs(fd_p).max()) + 1e-9)

    # Gradient reference via float64 central differences on a few
    # coefficients (full-dbeta analytic f64 derivation would duplicate
    # the kernel's fade-derivative logic; finite differences are the
    # independent oracle).  Skipped at huge scales: each probe costs a
    # full [P, K] float64 evaluation on the host.
    def loss64(b):
        aw2, _, _ = _f64_reference(size, pos, sigma, b, y, scaling)
        rr = aw2 @ c_t.astype(np.float64) - y
        return float((rr**2).mean())

    probes = [(0, 0), (1, 1), (4, 2), (7, 0)] if grad_probes else []
    # Per-coefficient step: basis term b carries sensitivity ~max|phi_b|
    # over the volume (up to size^2 in pixel scaling) — a fixed step
    # would perturb coordinates far outside the loss's linear regime.
    if scaling == "pixel":
        mm, nn, zz = (float(s) - 1.0 for s in size)
        sens = [1.0, mm, nn, zz, mm * mm, nn * nn, zz * zz,
                mm * nn, mm * zz, nn * zz]
    else:
        sens = [1.0] * 10
    fd = {}
    for (bi, bj) in probes:
        eps = 1e-4 / max(sens[bi], 1.0)
        bp = beta.copy(); bp[bi, bj] += eps
        bm = beta.copy(); bm[bi, bj] -= eps
        fd[(bi, bj)] = (loss64(bp) - loss64(bm)) / (2 * eps)

    for label, fn in (("dense", pk.motion_block),
                      ("culled", pc.motion_block_culled)):
        mse, dbeta = fn(jnp.asarray(beta)[None], jnp.asarray(pos),
                        jnp.asarray(sigma), jnp.asarray(c_t)[None],
                        jnp.asarray(y)[None], size, scaling=scaling,
                        tile_p=tile_p)
        ok &= check(f"motion[{label}] mse ({scaling})", mse[0], mse_ref,
                    1e-4, 1e-8)
        if probes:
            d = np.asarray(dbeta[0])
            got = np.array([d[bi, bj] for (bi, bj) in probes])
            want = np.array([fd[kk] for kk in probes])
            # Tolerance relative to the gradient's overall scale (single
            # near-zero entries otherwise fail on fd noise).
            ok &= check(f"motion[{label}] dbeta-fd ({scaling})", got,
                        want, 5e-3,
                        1e-3 * float(np.abs(want).max()) + 1e-9)
        else:
            ok &= check(f"motion[{label}] dbeta finite ({scaling})",
                        np.asarray(dbeta[0]), np.asarray(dbeta[0]),
                        1.0, 1.0)
    return ok


def run_registration():
    """Compiled fused registration kernels vs a known-shift oracle.

    Drives ``tile_and_correct_block`` with ``phasecorr_impl="fused"``
    and ``remap_mode="fused"`` — the Pallas phase-correlation and warp
    kernels, compiled — on integer-rolled copies of a smooth template.
    The oracle is the roll itself (float64 exact): recovered per-patch
    shifts must equal the negated roll, and the corrected interior must
    return to the template.  The interpret-mode pytest suite cannot see
    Mosaic miscompiles in these kernels; this check does.  Semantics:
    reference ``tile_and_correct``
    (``/root/reference/Demix/MotionCorrect.py:1272-1515``).
    """
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter

    from dnmf_tpu.registration.motion_correct import (
        tile_and_correct_block,
    )

    rng = np.random.default_rng(7)
    m, n, z = 96, 96, 8
    tmpl = gaussian_filter(
        rng.normal(size=(m, n, z)), (2.0, 2.0, 0.5)
    ).astype(np.float32)
    true = np.array(
        [(0, 0, 0), (2, -1, 1), (-3, 2, -1), (1, 3, 0)], dtype=int
    )
    video = np.stack([
        np.roll(tmpl, tuple(s), axis=(0, 1, 2)) for s in true
    ]).astype(np.float32)

    corrected, shifts = tile_and_correct_block(
        jnp.asarray(video), jnp.asarray(tmpl),
        (48, 48, 8), (16, 16, 0), (5, 5, 2),
        max_deviation_rigid=2, use_remap=True, remap_mode="fused",
        border_nan=False, phasecorr_impl="fused",
    )
    shifts = np.asarray(shifts)           # [B, n_patches, 3]
    corrected = np.asarray(corrected)     # [B, m, n, z]
    want = np.broadcast_to(
        -true[:, None, :].astype(np.float64), shifts.shape
    )
    # Subpixel refinement on circularly-rolled data lands near-integer;
    # frame-border contamination of patch crops puts ~0.3 px of genuine
    # scatter on the estimates (measured interpret-mode) — a Mosaic
    # miscompile shows up as O(1) px errors or non-finite output.
    ok = check("registration[fused] patch shifts (px)", shifts, want,
               0.0, 0.4)
    interior = (slice(None), slice(6, -6), slice(6, -6), slice(2, -2))
    want_int = np.broadcast_to(tmpl[None], corrected.shape)[interior]
    ok &= check("registration[fused] corrected interior",
                corrected[interior], want_int, 0.0, 0.08)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="include a whole-brain-scale check (slow)")
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    ok = True
    ok &= run((64, 32, 4), 12, "pixel", 2048)
    ok &= run((64, 32, 4), 12, "normalized", 2048)
    ok &= run((96, 64, 2), 80, "normalized", 4096)  # culled multi-block
    # Anisotropic sigma [K, 3] through every kernel + the closed form.
    ok &= run((64, 32, 4), 12, "normalized", 2048, aniso=True)
    ok &= run_registration()
    if args.full:
        ok &= run((512, 512, 20), 200, "normalized", 8192,
                  rtol=2e-3, atol=1e-3, grad_probes=False)
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
