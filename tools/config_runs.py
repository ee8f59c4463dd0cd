"""Measured runs for BASELINE configs 4 and 5 at single-chip scale
(VERDICT r2 #5/#6).

Config 4 (10k-frame K=500 frame-sharded scan) cannot stream through
this session's ~16 MB/s tunneled host link (a real host feeds ~GB/s
over PCIe), so the single-chip COMPUTE path is measured end-to-end on a
device-synthesized config-4-shaped recording (512x512x20, K=500,
registration-seeded, full alternation rounds) and the 8-way-mesh figure
remains an extrapolation labeled as such in BASELINE.md.

Config 5 measures `batched_round` (vmap over recordings) on one chip at
reduced scale and reports the throughput ratio vs a single recording —
the "is vmap-over-recordings ~linear" question.

Run: python tools/config_runs.py [--config4] [--config5]
Prints one JSON line per section.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def run_config4(frames: int = 48, rounds: int = 5, epochs: int = 6,
                mu_iters: int = 50, gram_mode: str = "analytic",
                fit_sigma: bool = False, sigma_spread: float = 0.0):
    from wb_recovery import seeded_recovery

    size, k = (512, 512, 20), 500
    t = frames
    r = seeded_recovery(size, k, t, rounds, epochs, mu_iters,
                        frame_block=4, gram_mode=gram_mode,
                        fit_sigma=fit_sigma, sigma_spread=sigma_spread)
    corr, steady = r["corr"], r["round_s_steady"]
    out = {
        "config": 4,
        "workload": f"512x512x20 K=500 T={t} (device-synthesized; "
                    "tunnel cannot stream config-4 IO — see docstring)",
        "protocol": f"{rounds}x({epochs} epochs + {mu_iters} MU), "
                    f"rigid-seeded, grams={gram_mode}"
                    + (f", GT sigma spread {sigma_spread}"
                       if sigma_spread else "")
                    + (", fit_sigma" if fit_sigma
                       else (", sigma FROZEN (reference behavior)"
                             if sigma_spread else "")),
        "sigma_err_px": round(r["sigma_err"], 4),
        "synth_s": round(r["synth_s"], 1),
        "registration_seed_s": round(r["reg_s"], 1),
        "trace_corr_mean": round(float(np.mean(corr)), 4),
        "trace_corr_p10": round(float(np.percentile(corr, 10)), 4),
        "trace_corr_min": round(float(np.min(corr)), 4),
        "warp_err_px": round(r["warp_err_px"], 3),
        "round_s_steady": round(steady, 2),
        "frames_per_sec_full_round": round(t / steady, 2),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out), flush=True)
    return out


def run_config5(recordings: int = 4, t: int = 128):
    from dnmf_tpu.config import ModelConfig, OptimizerConfig
    from dnmf_tpu.models import dnmf as M
    from dnmf_tpu.parallel.batched import batched_round, stack_states

    size, k = (128, 128, 8), 50
    model = ModelConfig(size=size, num_neurons=k, num_frames=t,
                        shape_std=3.0)
    optimizer = M.make_motion_optimizer(OptimizerConfig(learning_rate=1e-3))
    p = size[0] * size[1] * size[2]
    keys = jax.random.split(jax.random.PRNGKey(0), recordings)
    states, videos = [], []
    for i, kk in enumerate(keys):
        pos = 10.0 + jax.random.uniform(kk, (k, 3)) * (
            jnp.asarray(size, jnp.float32) - 20.0)
        states.append(M.init_state(model, optimizer, positions=pos,
                                   key=kk))
        videos.append(jax.random.uniform(jax.random.fold_in(kk, 1),
                                         (t, p)))
    batched = stack_states(states)
    videos_b = jnp.stack(videos)
    use_pallas = jax.default_backend() == "tpu"

    def one_round_single(state, video):
        state, m = M.motion_epoch_parallel(
            state, video, model, optimizer, gamma=0.1, frame_block=8,
            use_pallas=use_pallas)
        g, c1 = M.compute_grams(state, video, model, frame_block=8,
                                use_pallas=use_pallas)
        return M.footprint_update(state, g, c1, iters=50), m

    def timed(fn, fence):
        fn()
        _ = fence()
        ts = []
        for _i in range(3):
            t0 = time.time()
            fn()
            _ = fence()
            ts.append(time.time() - t0)
        return sorted(ts)[1]

    box = {}

    def single():
        box["s"], box["m"] = one_round_single(states[0], videos[0])

    single_s = timed(single, lambda: float(jnp.sum(box["s"].c[0])))

    def batch():
        box["b"], box["bm"] = batched_round(
            batched, videos_b, model, optimizer, gamma=0.1, mu_iters=50,
            frame_block=8, use_pallas=use_pallas)

    batch_s = timed(batch, lambda: float(jnp.sum(box["b"].c[0])))
    ratio = (recordings * single_s) / batch_s
    out = {
        "config": 5,
        "workload": f"{recordings} recordings x 128x128x8 K={k} T={t}, "
                    "vmapped alternation round (fused kernels), "
                    "single chip",
        "single_recording_round_s": round(single_s, 3),
        "batched_round_s": round(batch_s, 3),
        "throughput_vs_serial": round(ratio, 2),
        "frames_per_sec_batched": round(recordings * t / batch_s, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config4", action="store_true")
    ap.add_argument("--config5", action="store_true")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--gram-mode", type=str, default="analytic",
                    choices=["exact", "analytic"],
                    help="MU Gram computation for config 4 "
                         "(analytic = closed form, ops/gram_analytic)")
    ap.add_argument("--fit-sigma", action="store_true",
                    help="per-neuron width fitting in the alternation")
    ap.add_argument("--sigma-spread", type=float, default=0.0,
                    help="heterogeneous GT widths: shape_std * "
                         "U(1-s, 1+s)")
    args = ap.parse_args()
    if not (args.config4 or args.config5):
        args.config4 = args.config5 = True
    if args.config5:
        run_config5()
    if args.config4:
        run_config4(frames=args.frames, rounds=args.rounds,
                    epochs=args.epochs, gram_mode=args.gram_mode,
                    fit_sigma=args.fit_sigma,
                    sigma_spread=args.sigma_spread)
