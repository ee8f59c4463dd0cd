"""Whole-brain Gram-kernel sweep: tiles_per_step amortization.

Round-3 ablations (docs/DESIGN.md "measured ceiling") proved the culled
Gram kernel is bound by per-grid-step pipeline overhead, not body
compute — an EMPTY body costs the same as the full kernel.  This tool
measures the ``tiles_per_step`` lever (one streamed [F, tps * tile_p]
video block per step, body iterated over tile_p-wide sub-tiles), which
divides the step count without growing any compute shape.

Usage: python tools/gram_bench.py [--k 200] [--frames 16] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dnmf_tpu.ops import pallas_culled as pc  # noqa: E402

SIZE = (512, 512, 20)


def fence(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, reps=5):
    fence(fn())
    fence(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=200)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--kblock", type=int, default=40)
    ap.add_argument("--tile-p", type=int, default=4096)
    ap.add_argument("--tps", type=int, nargs="*",
                    default=[1, 2, 4, 8, 16])
    ap.add_argument("--fps", type=int, nargs="*", default=[2])
    ap.add_argument("--impl", type=str, default="grid",
                    choices=["grid", "pipe"],
                    help="grid | pipe (manually-pipelined kernel; "
                         "--tps values are reused as nbuf depths)")
    ap.add_argument("--cluster", action="store_true",
                    help="cluster all neurons into one 64px-wide ball "
                         "(maximal culling: nearly every tile skips "
                         "every block) — compared against the default "
                         "spread layout this measures how much of the "
                         "kernel's time culling can touch at all; if "
                         "clustered == spread the kernel is pure "
                         "per-step machinery and a neuron-major layout "
                         "(which multiplies tile visits) cannot win")
    args = ap.parse_args()

    b, k = args.frames, args.k
    p = int(np.prod(SIZE))
    rng = np.random.default_rng(0)
    betas = np.zeros((b, 10, 3), dtype=np.float32)
    betas[:, 1, 0] = betas[:, 2, 1] = betas[:, 3, 2] = 1.0
    betas += rng.normal(0, 0.01, betas.shape).astype(np.float32)
    if args.cluster:
        pos = rng.uniform(224, 288, (k, 3)).astype(np.float32)
    else:
        pos = rng.uniform(10, 500, (k, 3)).astype(np.float32)
    pos[:, 2] = rng.uniform(2, 18, k)
    sigma = np.full((k,), 3.0, dtype=np.float32)
    y = rng.random((b, p), dtype=np.float32)

    betas_j = jnp.asarray(betas)
    pos_j = jnp.asarray(pos)
    sigma_j = jnp.asarray(sigma)
    y_j = jnp.asarray(y)

    # Algorithmic FLOPs: 2 P K^2 per frame (the Gram einsum the
    # reference computes, /root/reference/Demix/dNMF.py:141).
    gflops = 2.0 * p * k * k / 1e9
    results = {}
    ref = None
    for fps in args.fps:
        for tps in args.tps:
            def run(fps=fps, tps=tps):
                if args.impl == "pipe":
                    return pc.gram_block_pipelined(
                        betas_j, pos_j, sigma_j, y_j, SIZE,
                        tile_p=args.tile_p, kblock=args.kblock,
                        dot_mode="split", frames_per_step=fps,
                        nbuf=tps,
                    )
                return pc.gram_block_culled(
                    betas_j, pos_j, sigma_j, y_j, SIZE,
                    tile_p=args.tile_p, kblock=args.kblock,
                    dot_mode="split", frames_per_step=fps,
                    tiles_per_step=tps,
                )
            try:
                out = run()
                if ref is None:
                    ref = out
                else:
                    err = max(
                        float(jnp.max(jnp.abs(out[0] - ref[0]))),
                        float(jnp.max(jnp.abs(out[1] - ref[1]))),
                    )
                    if err > 1e-4:
                        print(f"F={fps} tps={tps}: MISMATCH {err}",
                              flush=True)
                secs = timeit(run, reps=args.reps)
            except Exception as e:  # VMEM walls etc.
                print(f"F={fps} tps={tps}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                continue
            ms = secs / b * 1e3
            mfu = gflops / 125e3 / (ms / 1e3)
            results[f"F{fps}_tps{tps}"] = round(ms, 3)
            print(f"F={fps} tps={tps}: {ms:7.3f} ms/frame  "
                  f"algMFU={mfu:.3f}", flush=True)

    print(json.dumps({"gram_sweep_ms_per_frame": results}), flush=True)


if __name__ == "__main__":
    main()
