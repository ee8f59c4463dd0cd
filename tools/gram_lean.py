"""VERDICT r3 #9 experiment: a "lean-scratch" exact-Gram kernel.

The production culled Gram kernel (`ops/pallas_culled.gram_block_culled`)
stages ALL neuron blocks' footprints for a tile in a ``[K_pad, tile_p]``
bf16-pair scratch, then runs the block-pair dots.  That scratch is what
walls ``tile_p`` at 4096-5120 (docs/DESIGN.md "measured ceiling"), and
the per-(frame,tile) grid-step overhead is the measured binding
constraint — so the only untried lever is FEWER, TALLER tiles.

This kernel trades recompute for scratch: only TWO block slots
(``[2*kb, tile_p]``), with the j-side footprint of each (i, j) block
pair re-evaluated on demand.  At K=200/kb=40 that is 15 footprint
evaluations per (frame, tile) instead of 5 — and the round-3 ablations
showed the Gaussian evaluation is ~free (removing it changed nothing),
so if the grid-step overhead amortizes with tile height this wins.

Measured result (see BASELINE.md): the experiment is the decision
record for whether a fourth exact-kernel architecture is worth
productionizing.

Usage: python tools/gram_lean.py [--k 200] [--frames 16] [--reps 5]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dnmf_tpu.ops import pallas_culled as pc  # noqa: E402
from dnmf_tpu.ops import pallas_kernels as pk  # noqa: E402

SIZE = (512, 512, 20)


def _lean_kernel(off_ref, beta_ref, blocks_ref, pos_ref, y_ref, g_ref,
                 c1_ref, g_acc, c1_acc, ahi_scr, alo_scr, *, size,
                 scaling, tile_p, p_count, n_steps, kb, nkb, f):
    """Two-slot culled Gram kernel: slot 0 = block i, slot 1 = block j.

    Accumulates the same (G, c1) as ``_gram_kernel_culled`` with
    ``dot_mode="split"``; upper-triangular blocks only (mirrored at the
    final step, like production).
    """
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _():
        g_acc[:] = jnp.zeros_like(g_acc)
        c1_acc[:] = jnp.zeros_like(c1_acc)

    off = off_ref[0, 0]
    base = off + step * tile_p
    idx, mi, ni, zi = pk._coord_rows(base, size, tile_p)
    psi, _ = pk._warp_rows_mf(beta_ref, mi, ni, zi, size, scaling, f)
    w = pk._fade_row(psi, size) * (idx < off + p_count).astype(
        jnp.float32)
    t_lo = jnp.min(psi[0])
    t_hi = jnp.max(psi[0])

    actives = [
        (blocks_ref[i, 0] <= t_hi) & (blocks_ref[i, 1] >= t_lo)
        for i in range(nkb)
    ]
    pair_actives = {
        (i, j): (blocks_ref[j, 0] <= blocks_ref[i, 1])
        for i in range(nkb) for j in range(i + 1, nkb)
    }

    dims = (((1,), (1,)), ((), ()))
    bf_dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    def split_dot(si, sj):
        return (bf_dot(ahi_scr[si, :], ahi_scr[sj, :])
                + bf_dot(ahi_scr[si, :], alo_scr[sj, :])
                + bf_dot(alo_scr[si, :], ahi_scr[sj, :]))

    for fi in range(f):
        psi_f = tuple(p[fi:fi + 1, :] for p in psi)
        w_f = w[fi:fi + 1, :]
        for i in range(nkb):
            @pl.when(actives[i])
            def _(i=i, fi=fi, psi_f=psi_f, w_f=w_f):
                s0 = slice(0, kb)
                a_i = pc._block_footprint(psi_f, pos_ref, i * kb,
                                          kb) * w_f
                hi, lo = pk._split_bf16(a_i)
                ahi_scr[s0, :] = hi
                alo_scr[s0, :] = lo
                c1_acc[fi, i * kb:(i + 1) * kb, :] += (
                    jax.lax.dot_general(
                        a_i, y_ref[fi:fi + 1, :], dims,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    ))
                g_acc[fi, i * kb:(i + 1) * kb,
                      i * kb:(i + 1) * kb] += split_dot(s0, s0)

            for j in range(i + 1, nkb):
                @pl.when(actives[i] & actives[j] & pair_actives[(i, j)])
                def _(i=i, j=j, fi=fi, psi_f=psi_f, w_f=w_f):
                    s0 = slice(0, kb)
                    s1 = slice(kb, 2 * kb)
                    a_j = pc._block_footprint(psi_f, pos_ref, j * kb,
                                              kb) * w_f
                    hj, lj = pk._split_bf16(a_j)
                    ahi_scr[s1, :] = hj
                    alo_scr[s1, :] = lj
                    g_acc[fi, i * kb:(i + 1) * kb,
                          j * kb:(j + 1) * kb] += split_dot(s0, s1)

    @pl.when(step == n_steps - 1)
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


@functools.partial(
    jax.jit,
    static_argnames=("size", "scaling", "tile_p", "kblock",
                     "frames_per_step"),
)
def gram_block_lean(betas, pos, sigma, y, size,
                    scaling="normalized", tile_p=16384, kblock=40,
                    frames_per_step=2):
    bsz = betas.shape[0]
    k = pos.shape[0]
    kb = min(kblock, pc._round_up(k, pk.SUBLANE))
    nkb = -(-k // kb)
    k_pad = nkb * kb
    p_count = y.shape[1]
    p_pad = pc._round_up(p_count, tile_p)
    perm, params, blocks = pc._sorted_params(pos, sigma, kb, nkb)
    off = jnp.zeros((1, 1), jnp.int32)

    n_steps = p_pad // tile_p
    f_eff, b_pad = pk._pad_frames(bsz, frames_per_step)
    betas_pad, _, _ = pc._pad_frame_group(b_pad, betas)
    y_blk = pk._frame_major(y, b_pad, f_eff, n_steps, tile_p, p_count)
    beta_rows = pk._beta_warp_matrix(betas_pad, f_eff)

    row_spec = pl.BlockSpec((None, None, f_eff, tile_p),
                            lambda bi, ti: (bi, ti, 0, 0),
                            memory_space=pltpu.VMEM)
    g, c1 = pl.pallas_call(
        functools.partial(
            _lean_kernel, size=tuple(size), scaling=scaling,
            tile_p=tile_p, p_count=p_count, n_steps=n_steps, kb=kb,
            nkb=nkb, f=f_eff,
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
            pl.BlockSpec((k_pad, 8), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
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
            pltpu.VMEM((2 * kb, tile_p), jnp.bfloat16),
            pltpu.VMEM((2 * kb, tile_p), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(off, beta_rows, blocks, params, y_blk)
    return pc._unpermute_grams(g, c1, perm, bsz, k)


def fence(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, reps):
    fence(fn())
    fence(fn())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fence(fn())
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=200)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tiles", type=int, nargs="+",
                    default=[8192, 16384, 32768])
    args = ap.parse_args()

    b, k = args.frames, args.k
    p = int(np.prod(SIZE))
    rng = np.random.default_rng(0)
    betas = np.zeros((b, 10, 3), dtype=np.float32)
    betas[:, 1, 0] = betas[:, 2, 1] = betas[:, 3, 2] = 1.0
    betas += rng.normal(0, 0.01, betas.shape).astype(np.float32)
    pos = np.stack([
        rng.uniform(0.1 * s, 0.9 * s, k).astype(np.float32)
        for s in SIZE
    ], axis=1)
    sigma = np.full((k,), 3.0, dtype=np.float32)
    y = rng.random((b, p), dtype=np.float32)
    betas_j, pos_j = jnp.asarray(betas), jnp.asarray(pos)
    sigma_j, y_j = jnp.asarray(sigma), jnp.asarray(y)

    out = {}

    def ref():
        return pc.gram_block_culled(
            betas_j, pos_j, sigma_j, y_j, SIZE, dot_mode="split",
            tile_p=4096, kblock=40, frames_per_step=2)

    g0, c10 = ref()
    ms = timeit(ref, args.reps) / b * 1e3
    out["production_grid_4096"] = round(ms, 3)
    print(f"production grid tile_p=4096: {ms:.3f} ms/frame", flush=True)

    for tp in args.tiles:
        try:
            def run(tp=tp):
                return gram_block_lean(
                    betas_j, pos_j, sigma_j, y_j, SIZE, tile_p=tp,
                    kblock=40, frames_per_step=2)

            g1, c11 = run()
            err = max(
                float(jnp.max(jnp.abs(g1 - g0))
                      / jnp.max(jnp.abs(g0))),
                float(jnp.max(jnp.abs(c11 - c10))
                      / jnp.max(jnp.abs(c10))),
            )
            ms = timeit(run, args.reps) / b * 1e3
            out[f"lean_{tp}"] = {"ms_per_frame": round(ms, 3),
                                 "rel_err": err}
            print(f"lean tile_p={tp}: {ms:.3f} ms/frame "
                  f"(rel err {err:.2e})", flush=True)
        except Exception as e:  # VMEM walls etc.
            out[f"lean_{tp}"] = {"error": str(e)[:200]}
            print(f"lean tile_p={tp}: FAILED {str(e)[:120]}",
                  flush=True)

    print(json.dumps({"gram_lean": out}), flush=True)


if __name__ == "__main__":
    main()
