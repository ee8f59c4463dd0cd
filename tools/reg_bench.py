"""Registration performance breakdown at whole-brain scale (512x512x20).

Times each stage of the pw-rigid pipeline on the real chip so kernel
work targets the measured bottleneck (VERDICT r2 #1: estimate+apply
<= 25 ms/frame).  Fencing: scalar host reads (block_until_ready does not
block on the tunneled axon backend — see .claude/skills/verify).

Usage: python tools/reg_bench.py [--frames 4] [--reps 5]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Tunnel compiles are slow (30s-5min per program); cache across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dnmf_tpu.registration.motion_correct import (  # noqa: E402
    patch_grid,
    rigid_correct_frames,
    tile_and_correct,
)

SIZE = (512, 512, 20)
MAX_SHIFTS = (6, 6, 2)
STRIDES = (128, 128, 10)
OVERLAPS = (32, 32, 0)


def fence(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, *args, reps=5):
    fence(fn(*args))  # compile + warm
    fence(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sections", type=str, default="all",
                    help="comma list from {main,probes,prec,fused,apply}")
    args = ap.parse_args()
    sections = (set(args.sections.split(","))
                if args.sections != "all"
                else {"main", "probes", "prec", "fused", "apply"})

    b = args.frames
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((b,) + SIZE, dtype=np.float32))
    template = jnp.asarray(rng.random(SIZE, dtype=np.float32))
    starts, grid_shape, window = patch_grid(SIZE, OVERLAPS, STRIDES)
    print(f"patch grid {grid_shape}, window {window}, "
          f"{starts.shape[0]} patches", flush=True)
    results = {}

    def report(name, secs):
        per_frame = secs / b * 1e3
        results[name] = per_frame
        print(f"{name:34s} {per_frame:8.2f} ms/frame", flush=True)

    # 1. rigid estimate + Fourier apply
    def rigid(fr):
        return rigid_correct_frames(fr, template, MAX_SHIFTS,
                                    upsample_factor=10, border_nan=False)

    # 2. full pw-rigid, separable remap, at each rigid-decimate level —
    # through the production block entry (tile_and_correct_block: fused
    # Pallas phase correlation on TPU, XLA fallback selectable).
    from dnmf_tpu.registration.motion_correct import (
        tile_and_correct_block,
    )

    def make_pw(dec, est_only, impl="auto", remap="separable"):
        def pw(fr):
            out = tile_and_correct_block(
                fr, template, STRIDES, OVERLAPS, MAX_SHIFTS,
                max_deviation_rigid=3, upsample_factor_grid=4,
                upsample_factor_fft=10, use_remap=True,
                remap_mode=remap, border_nan=False,
                rigid_decimate=dec, phasecorr_impl=impl)
            return out[1] if est_only else out
        return jax.jit(pw)

    if "main" in sections:
        report("rigid est+apply", timeit(rigid, frames, reps=args.reps))
        for dec in (1, 2, 4):
            report(f"pw-rigid est+apply (sep, dec={dec})",
                   timeit(make_pw(dec, False), frames, reps=args.reps))
        report("pw-rigid est+apply (dec=4, xla pc)",
               timeit(make_pw(4, False, impl="xla"), frames,
                      reps=args.reps))
        report("pw-rigid est+apply (dec=4, FUSED warp)",
               timeit(make_pw(4, False, remap="fused"), frames,
                      reps=args.reps))
        # Fused-warp correctness vs separable on the same shift field.
        c_sep = make_pw(4, False)(frames)[0]
        c_fus = make_pw(4, False, remap="fused")(frames)[0]
        werr = float(jnp.max(jnp.abs(c_fus - c_sep)))
        print(f"    fused-warp max |diff| vs separable: {werr:.2e}",
              flush=True)
        results["fused_warp_max_abs_diff"] = werr
        report("pw-rigid estimate only (dec=1)",
               timeit(make_pw(1, True), frames, reps=args.reps))
        report("pw-rigid estimate only (dec=4)",
               timeit(make_pw(4, True), frames, reps=args.reps))

    # 3b. estimation-stage probes
    from dnmf_tpu.ops import fft_reg
    from dnmf_tpu.registration.motion_correct import (
        _extract_patches,
        _upsample_field,
    )

    def patch_ffts(fr):
        def one(f):
            pats = _extract_patches(f, starts, window)
            half = jnp.fft.rfftn(pats, axes=(1, 2, 3))
            cc = jnp.fft.irfftn(half, s=window, axes=(1, 2, 3))
            return jnp.sum(cc)
        return jax.vmap(one)(fr)
    if "probes" in sections:
        report("probe: patch rfft+irfft only",
           timeit(jax.jit(patch_ffts), frames, reps=args.reps))

    def patch_reg(fr, tmpl, usf):
        tmpl_pats = _extract_patches(tmpl, starts, window)
        def one(f):
            pats = _extract_patches(f, starts, window)
            s, _, _ = jax.vmap(
                lambda ip, tp: fft_reg.phase_cross_correlation(
                    ip, tp, upsample_factor=usf,
                    shifts_lb=jnp.asarray([-6.0, -6.0, -2.0]),
                    shifts_ub=jnp.asarray([6.0, 6.0, 2.0]))
            )(pats, tmpl_pats)
            return s
        return jax.vmap(one)(fr)
    if "probes" in sections:
        report("probe: patch registration usf=1",
               timeit(jax.jit(lambda fr, t: patch_reg(fr, t, 1)),
                      frames, template, reps=args.reps))
        report("probe: patch registration usf=10",
               timeit(jax.jit(lambda fr, t: patch_reg(fr, t, 10)),
                      frames, template, reps=args.reps))

    # 3c. correlation-stage isolation probes on the production patch
    # stack (32 patches x window, matrix-DFT path) — what the fused
    # Pallas phase-correlation kernel would have to beat.
    def dft_fwd(fr):
        def one(f):
            pats = _extract_patches(f, starts, window)
            sp = jax.vmap(fft_reg.matrix_dft3_mzn)(pats)
            return jnp.sum(jnp.real(sp))
        return jax.vmap(one)(fr)
    if "probes" in sections:
        report("probe: patch matrix-DFT fwd only",
           timeit(jax.jit(dft_fwd), frames, reps=args.reps))

    # Template spectrum passed as a jit ARGUMENT: closed-over device
    # arrays embed as HLO constants, which this backend rejects
    # (UNIMPLEMENTED from the MLIR constant handler).
    tmpl_freq = jax.jit(
        lambda t: jax.vmap(fft_reg.matrix_dft3_mzn)(
            _extract_patches(t, starts, window))
    )(template)

    def dft_corr(fr, tf):
        def one(f):
            pats = _extract_patches(f, starts, window)
            sp = jax.vmap(fft_reg.matrix_dft3_mzn)(pats)
            prod = sp * jnp.conj(tf)
            cc = jax.vmap(
                lambda p: fft_reg.matrix_dft3_mzn(p, inverse=True)
            )(prod)
            return jnp.sum(jnp.real(cc))
        return jax.vmap(one)(fr)
    if "probes" in sections:
        report("probe: fwd+product+inverse",
               timeit(jax.jit(dft_corr), frames, tmpl_freq,
                      reps=args.reps))

    def make_reg_probe(usf):
        def probe(fr, tf):
            def one(f):
                pats = _extract_patches(f, starts, window)
                s, _, _ = jax.vmap(
                    lambda ip, tp: fft_reg.phase_cross_correlation(
                        ip, tp, upsample_factor=usf, target_is_freq=True,
                        shifts_lb=jnp.asarray([-6.0, -6.0, -2.0]),
                        shifts_ub=jnp.asarray([6.0, 6.0, 2.0]))
                )(pats, tf)
                return s
            return jax.vmap(one)(fr)
        return jax.jit(probe)
    if "probes" in sections:
        report("probe: + mask/argmax (usf=1, tmpl preFFT)",
               timeit(make_reg_probe(1), frames, tmpl_freq,
                      reps=args.reps))
        report("probe: + subpixel usf=10 (tmpl preFFT)",
               timeit(make_reg_probe(10), frames, tmpl_freq,
                      reps=args.reps))

    # 3d. DFT dot-precision trade: HIGH (3-pass bf16x3) halves the
    # dominant matmul cost vs HIGHEST (6-pass); measure both the time
    # and the recovered-shift error on a known-subpixel-shift fixture
    # (every patch of a rigidly shifted template must recover the
    # global shift).
    if "prec" in sections:
        gt_shift = np.array([2.3, -1.7, 0.6], dtype=np.float32)
        shifted = jax.jit(
            lambda t: fft_reg.apply_shifts_fourier(
                t, jnp.asarray(gt_shift), border_nan="copy")
        )(template)
        shifted_b = jnp.broadcast_to(shifted, (b,) + SIZE)

        def patch_reg_prec(fr, tmpl, prec):
            tmpl_pats = _extract_patches(tmpl, starts, window)
            def one(f):
                pats = _extract_patches(f, starts, window)
                s, _, _ = jax.vmap(
                    lambda ip, tp: fft_reg.phase_cross_correlation(
                        ip, tp, upsample_factor=10,
                        shifts_lb=jnp.asarray([-6.0, -6.0, -2.0]),
                        shifts_ub=jnp.asarray([6.0, 6.0, 2.0]),
                        dft_precision=prec)
                )(pats, tmpl_pats)
                return s
            return jax.vmap(one)(fr)

        for prec in ("highest", "high", "default"):
            fn = jax.jit(
                lambda fr, tmpl, p=prec: patch_reg_prec(fr, tmpl, p))
            secs = timeit(fn, frames, template, reps=args.reps)
            # recovered shift = displacement of src content; gt applied
            # to the source means recovery = +gt_shift
            rec = np.asarray(fn(shifted_b, template))
            err = float(np.max(np.abs(rec - gt_shift[None, None, :])))
            report(f"probe: patch reg usf=10 prec={prec}", secs)
            print(f"    max |shift err| vs known shift: {err:.4f} px",
                  flush=True)
            results[f"prec_{prec}_max_shift_err_px"] = err

    # 3e. fused Pallas phase-correlation kernel: extraction + in-VMEM
    # fwd/product/inverse/masked-argmax + XLA subpixel, one jit.
    if "fused" in sections:
        from dnmf_tpu.ops import pallas_phasecorr as pp

        wm, wn, wz = window
        brow = np.zeros((b, 8), np.float32)
        brow[:, :3] = [-6.0, -6.0, -2.0]
        brow[:, 3:6] = [6.0, 6.0, 2.0]
        brow_j = jnp.asarray(brow)
        tre, tim = jax.jit(
            lambda t: pp.patch_spectra(
                _extract_patches(t, starts, window))
        )(template)

        def make_fused(prec):
            def fused(fr, tre, tim, bnds):
                pats = jax.vmap(
                    lambda f: pp.to_zm_n(
                        _extract_patches(f, starts, window))
                )(fr)
                sh_int, pre, pim = pp.phase_corr_block(
                    pats, tre, tim, bnds, z=wz, precision=prec)
                prod = (pre + 1j * pim).reshape(
                    pre.shape[:2] + (wz, wm, wn))

                def refine(pr, s):
                    sf, _ = fft_reg.subpixel_refine(
                        pr, s, 10, window, prod_layout=(2, 0, 1))
                    return sf
                return jax.vmap(jax.vmap(refine))(prod, sh_int)
            return jax.jit(fused)

        gt_shift = np.array([2.3, -1.7, 0.6], dtype=np.float32)
        shifted = jax.jit(
            lambda t: fft_reg.apply_shifts_fourier(
                t, jnp.asarray(gt_shift), border_nan="copy")
        )(template)
        shifted_b = jnp.broadcast_to(shifted, (b,) + SIZE)
        for prec in ("highest", "high", "default"):
            fn = make_fused(prec)
            secs = timeit(fn, frames, tre, tim, brow_j,
                          reps=args.reps)
            rec = np.asarray(fn(shifted_b, tre, tim, brow_j))
            err = float(np.max(np.abs(rec - gt_shift[None, None, :])))
            report(f"probe: FUSED patch reg usf=10 prec={prec}", secs)
            print(f"    max |shift err| vs known shift: {err:.4f} px",
                  flush=True)
            results[f"fused_{prec}_max_shift_err_px"] = err

        def fused_int(fr, tre, tim, bnds):
            pats = jax.vmap(
                lambda f: pp.to_zm_n(
                    _extract_patches(f, starts, window))
            )(fr)
            sh_int, _, _ = pp.phase_corr_block(
                pats, tre, tim, bnds, z=wz)
            return sh_int
        report("probe: FUSED integer stage only",
               timeit(jax.jit(fused_int), frames, tre, tim, brow_j,
                      reps=args.reps))

    def field_up(shifts_p):
        return [
            _upsample_field(shifts_p[:, d], grid_shape, SIZE)
            for d in range(3)
        ]
    shifts_p = jnp.asarray(rng.random((starts.shape[0], 3),
                                      dtype=np.float32))
    if "probes" in sections:
        report("probe: field upsample x3 (1 frame)",
           timeit(jax.jit(field_up), shifts_p, reps=args.reps) * b)

    # 4. separable apply alone (fixed smooth field)
    from dnmf_tpu.ops.resample import separable_warp

    shift_field = jnp.stack([
        2.0 * jnp.ones(SIZE), -1.5 * jnp.ones(SIZE),
        0.5 * jnp.ones(SIZE)], axis=-1)
    bound = tuple(int(np.ceil((ms + 3) * 1.3)) + 1
                  for ms in MAX_SHIFTS)

    def apply_sep(fr):
        return jax.vmap(lambda f: separable_warp(f, shift_field, bound))(fr)
    if "apply" in sections:
        report("separable apply alone",
               timeit(jax.jit(apply_sep), frames, reps=args.reps))

        from dnmf_tpu.ops.pallas_warp import fused_separable_warp

        ps_b = jnp.broadcast_to(shifts_p[None], (b,) + shifts_p.shape)
        rig_b = jnp.zeros((b, 3))

        def apply_fused(fr, ps, rg, tm=32, tn=128):
            return fused_separable_warp(
                fr, ps, rg, tuple(grid_shape), SIZE, MAX_SHIFTS, 3,
                tm=tm, tn=tn)
        for tm, tn in ((32, 128), (64, 128), (32, 256)):
            try:
                report(f"FUSED apply alone (tm={tm},tn={tn})",
                       timeit(jax.jit(functools.partial(
                           apply_fused, tm=tm, tn=tn)),
                           frames, ps_b, rig_b, reps=args.reps))
            except Exception as e:  # VMEM walls etc.
                print(f"FUSED apply tm={tm},tn={tn}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)

    print(json.dumps({"reg_bench_ms_per_frame": results}), flush=True)


if __name__ == "__main__":
    main()
