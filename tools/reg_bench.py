"""Registration performance breakdown at whole-brain scale (512x512x20).

Times each stage of the pw-rigid pipeline on the real chip so kernel
work targets the measured bottleneck (VERDICT r2 #1: estimate+apply
<= 25 ms/frame).  Fencing: scalar host reads (block_until_ready does not
block on the tunneled axon backend — see .claude/skills/verify).

Usage: python tools/reg_bench.py [--frames 4] [--reps 5]
"""

from __future__ import annotations

import argparse
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
    args = ap.parse_args()

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
    report("rigid est+apply", timeit(rigid, frames, reps=args.reps))

    # 2. full pw-rigid, separable remap, at each rigid-decimate level
    def make_pw(dec, est_only):
        def pw(fr):
            out = jax.vmap(
                lambda f: tile_and_correct(
                    f, template, STRIDES, OVERLAPS, MAX_SHIFTS,
                    max_deviation_rigid=3, upsample_factor_grid=4,
                    upsample_factor_fft=10, use_remap=True,
                    remap_mode="separable", border_nan=False,
                    rigid_decimate=dec)
            )(fr)
            return out[1] if est_only else out
        return jax.jit(pw)

    for dec in (1, 2, 4):
        report(f"pw-rigid est+apply (sep, dec={dec})",
               timeit(make_pw(dec, False), frames, reps=args.reps))
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
    report("probe: patch rfft+irfft only",
           timeit(jax.jit(patch_ffts), frames, reps=args.reps))

    def patch_reg(fr, usf):
        tmpl_pats = _extract_patches(template, starts, window)
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
    report("probe: patch registration usf=1",
           timeit(jax.jit(lambda fr: patch_reg(fr, 1)), frames,
                  reps=args.reps))
    report("probe: patch registration usf=10",
           timeit(jax.jit(lambda fr: patch_reg(fr, 10)), frames,
                  reps=args.reps))

    def field_up(shifts_p):
        return [
            _upsample_field(shifts_p[:, d], grid_shape, SIZE)
            for d in range(3)
        ]
    shifts_p = jnp.asarray(rng.random((starts.shape[0], 3),
                                      dtype=np.float32))
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
    report("separable apply alone",
           timeit(jax.jit(apply_sep), frames, reps=args.reps))

    print(json.dumps({"reg_bench_ms_per_frame": results}), flush=True)


if __name__ == "__main__":
    main()
