"""End-to-end demo: simulate a video of moving neurons, demix it, report
trace recovery, and render diagnostics.

Equivalent of the reference driver (``/root/reference/demo.py``) as a real
CLI.  ``--small`` runs a quick CPU-friendly configuration; the default
mirrors the reference demo workload (K=10, T=100, 50x50x2, GP motion,
5 rounds x (10 motion epochs + MU iters)).
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--small", action="store_true",
                    help="tiny fast config (CPU-friendly smoke run)")
    ap.add_argument("--parity", action="store_true",
                    help="reference-numerics mode (pixel basis, resampled "
                         "footprints, detached regularizer, lr=1e-5)")
    ap.add_argument("--rounds", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--outdir", type=str, default=None,
                    help="directory for rendered figures/videos")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--gram-mode", type=str, default="auto",
                    choices=["auto", "exact", "analytic"],
                    help="MU Gram computation (auto = trust-audited "
                         "closed form where valid, the production "
                         "default; analytic = closed form, "
                         "ops/gram_analytic; exact = pixel reduction)")
    ap.add_argument("--trace-solver", type=str, default="mu",
                    choices=["mu", "fista"],
                    help="trace-subproblem solver (mu = reference "
                         "multiplicative rule; fista = accelerated "
                         "projected gradient, same cost/iter, faster "
                         "convergence on overlapping neurons)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from dnmf_tpu import config as C
    from dnmf_tpu.data.datasets import SimulatedVideoDataset
    from dnmf_tpu.engine import DeformableNMF
    from dnmf_tpu.utils.metrics import r_squared, trace_correlations

    if args.small and args.parity:
        ap.error("--parity applies to the reference demo workload; "
                 "drop --small")
    if args.small:
        sim = C.SimulatorConfig(num_neurons=5, num_frames=20,
                                size=(24, 24, 2), shape_std=2.0,
                                density=0.3, bg_snr_db=-80.0,
                                motion="gpt", gp_sigma=(1.5, 1.5, 0.01),
                                gp_length_scale=(6.0, 6.0, 6.0),
                                seed=args.seed,
                                min_separation=5.0, margin=4.0)
        model = C.ModelConfig(size=sim.size, num_neurons=sim.num_neurons,
                              num_frames=sim.num_frames,
                              shape_std=sim.shape_std)
        opt = C.OptimizerConfig(learning_rate=args.lr or 1e-3,
                                motion_epochs=10, mu_iters=30,
                                outer_rounds=args.rounds or 15,
                                gamma_motion=0.01)
    else:
        import dataclasses

        sim = dataclasses.replace(C.reference_demo_simulator(),
                                  seed=args.seed)
        model = C.reference_demo_model(parity=args.parity)
        opt = C.reference_demo_optimizer()
        if args.parity:
            # Reference-exact numerics: serial mini-batch Adam at the
            # reference's lr (tuned for the pixel-basis sensitivities).
            opt = dataclasses.replace(opt, motion_mode="parity")
        else:
            # TPU-native schedule: the normalized-coordinate basis is
            # well-conditioned at ordinary learning rates.
            opt = dataclasses.replace(opt, learning_rate=1e-3,
                                      outer_rounds=10, gamma_motion=0.1)
        if args.lr:
            opt = dataclasses.replace(opt, learning_rate=args.lr)
        if args.rounds:
            opt = dataclasses.replace(opt, outer_rounds=args.rounds)
    if args.trace_solver != "mu":
        import dataclasses

        opt = dataclasses.replace(opt, trace_solver=args.trace_solver)

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    print(f"simulating K={sim.num_neurons} T={sim.num_frames} "
          f"size={sim.size} motion={sim.motion}")
    t0 = time.time()
    ds = SimulatedVideoDataset(sim)
    print(f"  simulated in {time.time() - t0:.1f}s")

    eng = DeformableNMF(model, opt, positions=ds.positions[:, :, 0],
                        runtime=C.RuntimeConfig(gram_mode=args.gram_mode))
    t0 = time.time()
    result = eng.fit(ds)
    elapsed = time.time() - t0

    corr = trace_correlations(result.traces, np.asarray(ds.traces))
    r2 = r_squared(result.traces, np.asarray(ds.traces))
    last_motion = [m for m in result.metrics if m["phase"] == "motion"][-1]
    summary = {
        "seconds": round(elapsed, 2),
        "final_recon_mse": last_motion["recon_mse"],
        "trace_corr_mean": float(corr.mean()),
        "trace_corr_min": float(corr.min()),
        "trace_r2_mean": float(r2.mean()),
    }
    print(json.dumps(summary, indent=2))

    if args.outdir:
        import os

        os.makedirs(args.outdir, exist_ok=True)
        from dnmf_tpu import viz

        viz.visualize_temporal(
            np.asarray(ds.traces), titlestr="C (ground truth)",
            save=True, file=os.path.join(args.outdir, "temporal-gt"),
        )
        viz.visualize_temporal(
            result.traces, titlestr="C (estimated)",
            save=True, file=os.path.join(args.outdir, "temporal"),
        )
        est_positions = eng.positions_all().transpose(1, 2, 0)  # [K,3,T]
        viz.visualize_trajectory(
            np.asarray(ds.positions), est_positions,
            save=True, file=os.path.join(args.outdir, "trajectory"),
        )

        # Footprint map at identity deformation (reference demo renders
        # fp.A max-projected, /root/reference/demo.py:61).
        from dnmf_tpu.ops.basis import voxel_grid
        from dnmf_tpu.ops.footprints import gaussian_footprints

        grid = voxel_grid(model.size)
        a0 = np.asarray(
            gaussian_footprints(grid, eng.state.pos, eng.state.sigma)
        ).reshape(model.size + (model.num_neurons,))
        viz.visualize_spatial(a0.max(2), save=True,
                              file=os.path.join(args.outdir, "spatial"))

        # Original, inverse-registered, and reconstruction videos
        # (reference demo.py:63-66).
        from dnmf_tpu.models import dnmf as model_lib

        video_mnzt = np.transpose(np.asarray(ds.video), (1, 2, 3, 0))
        viz.visualize_video(
            video=video_mnzt / video_mnzt.max(), save=True,
            file=os.path.join(args.outdir, "original.mp4"),
        )
        a_all, y_inv = model_lib.spatial_pushforward(
            eng.state, ds.frames_flat(), model, frame_block=4
        )
        y_inv = np.transpose(
            np.asarray(y_inv).reshape((-1,) + model.size), (1, 2, 3, 0)
        )
        viz.visualize_video(
            video=y_inv / (y_inv.max() + 1e-32), save=True,
            file=os.path.join(args.outdir, "registered.mp4"),
        )
        recon = np.einsum(
            "tpk,kt->tp", np.asarray(a_all), result.traces
        ).reshape((-1,) + model.size)
        recon_mnzt = np.transpose(recon, (1, 2, 3, 0))
        viz.visualize_video(
            video=recon_mnzt / (recon_mnzt.max() + 1e-32), save=True,
            file=os.path.join(args.outdir, "reconstruction.mp4"),
        )
        print(f"wrote figures to {args.outdir}")

    return summary


if __name__ == "__main__":
    main()
