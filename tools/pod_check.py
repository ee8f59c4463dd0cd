"""One-command first-pod validation: run every sharded program at small
scale on the REAL device mesh and assert factor equality vs the
single-device implementations.

The CPU-mesh tests (tests/test_sharding.py etc.) prove the SPMD programs
are correct under XLA's CPU collectives; what they cannot prove is that
the same programs behave on real ICI — the ppermute MU halo,
Pallas-kernels-inside-shard_map, and the TP voxel-offset path are the
flagged risks (NOTES.md).  Run this once on the first real multi-chip
session:

    python tools/pod_check.py            # uses the real device mesh
    python tools/pod_check.py --cpu 8    # forced 8-virtual-device CPU mesh
    python tools/pod_check.py --compiled # compiled Pallas kernels (TPU)

Exit code 0 = every check passed (a PASS/FAIL line prints per check).
``dryrun_multichip`` invokes :func:`run_all` on the virtual mesh, so the
same assertions gate every driver dryrun.
"""

from __future__ import annotations

import argparse
import sys


def _setup(n_time: int):
    import jax
    import jax.numpy as jnp

    from dnmf_tpu.config import ModelConfig, OptimizerConfig
    from dnmf_tpu.models import dnmf as M

    size = (12, 12, 2)
    k = 3
    t = 2 * n_time  # >= 2 frames per shard so the halo has interior edges
    model = ModelConfig(size=size, num_neurons=k, num_frames=t,
                        shape_std=2.0)
    optimizer = M.make_motion_optimizer(OptimizerConfig(learning_rate=1e-3))
    pos = jnp.asarray([[3.0, 3.0, 1.0], [8.0, 3.0, 1.0], [5.0, 8.0, 1.0]])
    state = M.init_state(model, optimizer, positions=pos,
                         key=jax.random.PRNGKey(3))
    video = jax.random.uniform(jax.random.PRNGKey(9),
                               (t, size[0] * size[1] * size[2]))
    return model, optimizer, state, video


def run_all(n_devices: int | None = None, compiled_pallas: bool = False,
            verbose: bool = True) -> int:
    """Run all pod checks; returns the number of FAILED checks.

    Args:
      n_devices: mesh width (default: every available device).
      compiled_pallas: run the fused Pallas kernels compiled (real TPU
        mesh) instead of interpret mode (CPU mesh).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dnmf_tpu.models import dnmf as M
    from dnmf_tpu.parallel import (
        make_mesh,
        shard_state,
        shard_video,
        sharded_compute_grams,
        sharded_footprint_update,
        sharded_motion_epoch,
    )

    n = n_devices or jax.device_count()
    if jax.device_count() < n:
        raise RuntimeError(
            f"pod_check needs {n} devices; backend "
            f"{jax.default_backend()!r} has {jax.device_count()}"
        )
    model, optimizer, state, video = _setup(n)
    mesh = make_mesh(num_time=n)
    s_state, s_video = shard_state(state, mesh), shard_video(video, mesh)
    failures = []

    def check(name, fn):
        try:
            fn()
            if verbose:
                print(f"  PASS {name}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            failures.append(name)
            if verbose:
                msg = str(e).split("\n")[0][:200]
                print(f"  FAIL {name}: {msg}", flush=True)

    # 1. Per-frame beta fit: zero-communication sharding.
    def _motion():
        ref_state, ref_m = M.motion_epoch_parallel(
            state, video, model, optimizer, gamma=0.1, frame_block=2)
        sh_state, sh_m = sharded_motion_epoch(
            s_state, s_video, model, optimizer, gamma=0.1, mesh=mesh,
            frame_block=2)
        np.testing.assert_allclose(np.asarray(sh_state.beta),
                                   np.asarray(ref_state.beta),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(float(sh_m["recon_mse"]),
                                   float(ref_m["recon_mse"]), rtol=1e-5)
    check("motion epoch (sharded == single)", _motion)

    # 2. MU Grams: local voxel reductions, no cross-shard comm.
    grams, c1 = M.compute_grams(state, video, model, frame_block=2)

    def _grams():
        sh_g, sh_c1 = sharded_compute_grams(
            s_state, s_video, model, mesh=mesh, frame_block=2)
        np.testing.assert_allclose(np.asarray(sh_g), np.asarray(grams),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sh_c1), np.asarray(c1),
                                   rtol=1e-5, atol=1e-6)
    check("MU Grams (sharded == single)", _grams)

    # 2b. Closed-form Grams compose with time sharding (zero-comm).
    def _grams_analytic():
        ref_g, ref_c1 = M.compute_grams(state, video, model,
                                        frame_block=2,
                                        gram_mode="analytic")
        sh_g, sh_c1 = sharded_compute_grams(
            s_state, s_video, model, mesh=mesh, frame_block=2,
            gram_mode="analytic")
        np.testing.assert_allclose(np.asarray(sh_g), np.asarray(ref_g),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sh_c1),
                                   np.asarray(ref_c1),
                                   rtol=1e-5, atol=1e-6)
    check("analytic Grams (sharded == single)", _grams_analytic)

    # 3. MU with temporal smoothing: the ppermute +-1-frame halo on ICI.
    def _halo():
        ref = M.footprint_update(state, grams, c1, iters=15, gamma=0.05)
        sh = sharded_footprint_update(
            s_state, shard_video(grams, mesh), shard_video(c1, mesh),
            mesh=mesh, iters=15, gamma=0.05)
        np.testing.assert_allclose(np.asarray(sh.c), np.asarray(ref.c),
                                   rtol=1e-4, atol=1e-6)
    check("MU ppermute halo (sharded == single)", _halo)

    # 3b. FISTA trace solve: the smoothing halo AND the pmax'd global
    #     Lipschitz must both be right for iterates to match.
    def _fista():
        ref = M.footprint_update(state, grams, c1, iters=20, gamma=0.05,
                                 solver="fista")
        sh = sharded_footprint_update(
            s_state, shard_video(grams, mesh), shard_video(c1, mesh),
            mesh=mesh, iters=20, gamma=0.05, solver="fista")
        np.testing.assert_allclose(np.asarray(sh.c), np.asarray(ref.c),
                                   rtol=1e-4, atol=1e-6)
    check("FISTA halo + pmax Lipschitz (sharded == single)", _fista)

    # 4. Fused Pallas kernels inside shard_map.
    def _pallas():
        sh_g, _ = sharded_compute_grams(
            s_state, s_video, model, mesh=mesh, frame_block=2,
            use_pallas=True, pallas_interpret=not compiled_pallas)
        np.testing.assert_allclose(np.asarray(sh_g), np.asarray(grams),
                                   rtol=1e-4, atol=1e-5)
    mode = "compiled" if compiled_pallas else "interpret"
    check(f"Pallas-in-shard_map Grams ({mode})", _pallas)

    # 3c. Anisotropic sigma [K, 3] replicates across the mesh and the
    #     sharded epochs/Grams (XLA + analytic) match single-device.
    def _aniso():
        sig3 = jnp.asarray([[1.6, 2.2, 1.1], [2.4, 1.4, 1.3],
                            [1.9, 1.9, 0.9]], jnp.float32)
        st_a = state._replace(sigma=sig3)
        s_st_a = shard_state(st_a, mesh)
        ref_st, _ = M.motion_epoch_parallel(
            st_a, video, model, optimizer, gamma=0.1, frame_block=2)
        sh_st, _ = sharded_motion_epoch(
            s_st_a, s_video, model, optimizer, gamma=0.1, mesh=mesh,
            frame_block=2)
        np.testing.assert_allclose(np.asarray(sh_st.beta),
                                   np.asarray(ref_st.beta),
                                   rtol=1e-5, atol=1e-7)
        for gm in ("exact", "analytic"):
            ref_g, ref_c1 = M.compute_grams(st_a, video, model,
                                            frame_block=2,
                                            gram_mode=gm)
            sh_g, sh_c1 = sharded_compute_grams(
                s_st_a, s_video, model, mesh=mesh, frame_block=2,
                gram_mode=gm)
            np.testing.assert_allclose(np.asarray(sh_g),
                                       np.asarray(ref_g),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(sh_c1),
                                       np.asarray(ref_c1),
                                       rtol=1e-5, atol=1e-6)
    check("anisotropic sigma sharded (== single)", _aniso)

    # 5. Tensor-parallel (pixel-sharded) Grams: traced voxel offsets +
    #    psum over the pixel axis.
    if n % 2 == 0:
        def _tp():
            mesh_tp = make_mesh(num_time=n // 2, num_pixel=2)
            tp_g, tp_c1 = sharded_compute_grams(
                shard_state(state, mesh_tp), shard_video(video, mesh_tp),
                model, mesh=mesh_tp, frame_block=2)
            np.testing.assert_allclose(np.asarray(tp_g),
                                       np.asarray(grams),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(tp_c1), np.asarray(c1),
                                       rtol=1e-5, atol=1e-6)
        check("TP pixel-sharded Grams (== dense)", _tp)

        def _tp_pallas():
            mesh_tp = make_mesh(num_time=n // 2, num_pixel=2)
            tp_g, _ = sharded_compute_grams(
                shard_state(state, mesh_tp), shard_video(video, mesh_tp),
                model, mesh=mesh_tp, frame_block=2, use_pallas=True,
                pallas_interpret=not compiled_pallas)
            np.testing.assert_allclose(np.asarray(tp_g),
                                       np.asarray(grams),
                                       rtol=1e-4, atol=1e-5)
        check(f"TP voxel-offset Pallas Grams ({mode})", _tp_pallas)

    # 6. Mesh x host-streaming composition (config-4 path).
    def _streaming():
        from dnmf_tpu.data.streaming import StreamingVideo
        from dnmf_tpu.parallel import (
            sharded_compute_grams_streaming,
            sharded_motion_epoch_streaming,
        )

        src = StreamingVideo(
            np.asarray(jax.device_get(video)).reshape(
                (video.shape[0],) + model.size), block=2)
        st_stream, m_stream = sharded_motion_epoch_streaming(
            s_state, src, model, optimizer, gamma=0.1, mesh=mesh)
        ref_state, ref_m = M.motion_epoch_parallel(
            state, video, model, optimizer, gamma=0.1,
            frame_block=video.shape[0])
        np.testing.assert_allclose(np.asarray(st_stream.beta),
                                   np.asarray(ref_state.beta),
                                   rtol=1e-5, atol=1e-6)
        sg, sc1 = sharded_compute_grams_streaming(s_state, src, model,
                                                  mesh=mesh)
        np.testing.assert_allclose(np.asarray(sg), np.asarray(grams),
                                   rtol=1e-5, atol=1e-6)
    check("mesh x streaming epoch/Grams (== device-resident)", _streaming)

    # 7. Mesh-sharded registration (gathered template median).
    def _registration():
        from dnmf_tpu.config import RegistrationConfig
        from dnmf_tpu.parallel.registration import sharded_register_rigid
        from dnmf_tpu.registration.motion_correct import _batch_rigid

        rng = np.random.default_rng(0)
        from scipy.ndimage import gaussian_filter

        tmpl = gaussian_filter(rng.normal(size=(32, 32)),
                               2.0).astype(np.float32)
        t_frames = 2 * n
        true = [(i % 5 - 2, (i + 2) % 5 - 2) for i in range(t_frames)]
        vid = np.stack([np.roll(tmpl, s, axis=(0, 1)) for s in true])
        cfg = RegistrationConfig(max_shifts=(5, 5), niter_rig=2,
                                 splits=n, border_nan=False,
                                 frame_block=1)
        templ_s, _, shifts_s = sharded_register_rigid(
            jnp.asarray(vid), cfg, mesh, template=jnp.asarray(tmpl))
        templ_b, _, shifts_b, _ = _batch_rigid(vid, cfg,
                                               template=jnp.asarray(tmpl))
        np.testing.assert_allclose(np.asarray(shifts_s), shifts_b,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(templ_s),
                                   np.asarray(templ_b), atol=1e-4)
    check("sharded registration (== single-device chunked)", _registration)

    # 8. Batched recordings on a (batch x time) mesh.
    if n % 2 == 0:
        def _batched():
            from jax.sharding import NamedSharding, PartitionSpec as P

            from dnmf_tpu.parallel.batched import (
                batched_round,
                stack_states,
                unstack_states,
            )

            mesh_bt = make_mesh(num_time=n // 2, num_batch=2)
            state1 = M.init_state(model, optimizer,
                                  positions=state.pos + 0.5,
                                  key=jax.random.PRNGKey(2))
            batched = stack_states([jax.device_get(state),
                                    jax.device_get(state1)])
            videos = jnp.stack([video, video[::-1]])
            batched = jax.tree_util.tree_map(
                lambda leaf: jax.device_put(
                    leaf, NamedSharding(mesh_bt, P("batch"))), batched)
            videos = jax.device_put(
                videos, NamedSharding(mesh_bt, P("batch")))
            new_batched, _ = batched_round(
                batched, videos, model, optimizer, gamma=0.1, mu_iters=5,
                frame_block=2)
            for i, (st, vid) in enumerate(
                    ((state, video), (state1, video[::-1]))):
                st_m, _ = M.motion_epoch_parallel(
                    st, vid, model, optimizer, 0.1, frame_block=2)
                g, gc1 = M.compute_grams(st_m, vid, model, frame_block=2)
                st_ref = M.footprint_update(st_m, g, gc1, iters=5,
                                            gamma=0.0)
                got = unstack_states(jax.device_get(new_batched))[i]
                np.testing.assert_allclose(np.asarray(got.beta),
                                           np.asarray(st_ref.beta),
                                           rtol=1e-5, atol=1e-7)
                np.testing.assert_allclose(np.asarray(got.c),
                                           np.asarray(st_ref.c),
                                           rtol=1e-4, atol=1e-6)
        check("batched recordings round (== per-recording)", _batched)

    # 9. Frame-sharded position refinement (zero-comm refine + tracked
    #    Grams + un-smoothed MU — the accuracy-polish phase).
    def _refine():
        from dnmf_tpu.models.refine import refined_rounds
        from dnmf_tpu.parallel.sharded import sharded_refined_rounds

        ref_state, ref_pos, _ = refined_rounds(
            state, video, model, rounds=1, epochs=3, mu_iters=3)
        mesh_t = make_mesh(num_time=n)
        sh_state, sh_pos, _ = sharded_refined_rounds(
            shard_state(state, mesh_t), shard_video(video, mesh_t),
            model, mesh_t, rounds=1, epochs=3, mu_iters=3)
        np.testing.assert_allclose(np.asarray(sh_pos),
                                   np.asarray(ref_pos),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sh_state.c),
                                   np.asarray(ref_state.c),
                                   rtol=1e-4, atol=1e-6)
    check("sharded position refinement (== single)", _refine)

    # 10. Same phase through the fused dpos / tracked-Gram kernels
    #     (Pallas-under-shard_map, per-frame-position variants).
    def _refine_pallas():
        from dnmf_tpu.models.refine import refined_rounds
        from dnmf_tpu.parallel.sharded import sharded_refined_rounds

        ref_state, ref_pos, _ = refined_rounds(
            state, video, model, rounds=1, epochs=3, mu_iters=3)
        mesh_t = make_mesh(num_time=n)
        sh_state, sh_pos, _ = sharded_refined_rounds(
            shard_state(state, mesh_t), shard_video(video, mesh_t),
            model, mesh_t, rounds=1, epochs=3, mu_iters=3,
            use_pallas=True, pallas_interpret=not compiled_pallas)
        np.testing.assert_allclose(np.asarray(sh_pos),
                                   np.asarray(ref_pos),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sh_state.c),
                                   np.asarray(ref_state.c),
                                   rtol=1e-3, atol=1e-5)
    check("sharded fused refinement (== single XLA)", _refine_pallas)

    if verbose:
        status = "ALL PASS" if not failures else f"{len(failures)} FAILED"
        print(f"pod_check: {status} "
              f"({n}-device mesh, backend={jax.default_backend()})",
              flush=True)
    return len(failures)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cpu", type=int, default=None, metavar="N",
                        help="force an N-virtual-device CPU mesh")
    parser.add_argument("--devices", type=int, default=None,
                        help="mesh width (default: all devices)")
    parser.add_argument("--compiled", action="store_true",
                        help="compiled Pallas kernels (real TPU mesh)")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_num_cpu_devices", args.cpu)
        except Exception:
            import os

            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={args.cpu}"
            ).strip()
    return run_all(args.devices or args.cpu,
                   compiled_pallas=args.compiled)


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    sys.exit(main())
