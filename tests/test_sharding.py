"""Sharded-vs-single-device equivalence on the 8-virtual-device CPU mesh —
the 'multi-node test without a cluster' (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from dnmf_tpu.config import ModelConfig, OptimizerConfig
from dnmf_tpu.models import dnmf as M
from dnmf_tpu.parallel import (
    make_mesh,
    shard_state,
    shard_video,
    sharded_compute_grams,
    sharded_footprint_update,
    sharded_motion_epoch,
)

SIZE = (12, 12, 2)
K, T = 3, 16  # T divisible by 8 devices


def _setup():
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=2.0)
    opt_cfg = OptimizerConfig(learning_rate=1e-3)
    optimizer = M.make_motion_optimizer(opt_cfg)
    key = jax.random.PRNGKey(3)
    pos = jnp.asarray([[3.0, 3.0, 1.0], [8.0, 3.0, 1.0], [5.0, 8.0, 1.0]])
    state = M.init_state(model, optimizer, positions=pos, key=key)
    video = jax.random.uniform(jax.random.PRNGKey(9),
                               (T, SIZE[0] * SIZE[1] * SIZE[2]))
    return model, optimizer, state, video


def test_sharded_motion_epoch_matches_single_device():
    model, optimizer, state, video = _setup()
    mesh = make_mesh(num_time=8)

    ref_state, ref_m = M.motion_epoch_parallel(
        state, video, model, optimizer, gamma=0.1, frame_block=4
    )
    sh_state, sh_m = sharded_motion_epoch(
        shard_state(state, mesh), shard_video(video, mesh), model,
        optimizer, gamma=0.1, mesh=mesh, frame_block=4,
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.beta), np.asarray(ref_state.beta),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        float(sh_m["recon_mse"]), float(ref_m["recon_mse"]), rtol=1e-5
    )


def test_sharded_grams_match_single_device():
    model, optimizer, state, video = _setup()
    mesh = make_mesh(num_time=8)
    ref_g, ref_c1 = M.compute_grams(state, video, model, frame_block=4)
    sh_g, sh_c1 = sharded_compute_grams(
        shard_state(state, mesh), shard_video(video, mesh), model,
        mesh=mesh, frame_block=4,
    )
    np.testing.assert_allclose(np.asarray(sh_g), np.asarray(ref_g),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sh_c1), np.asarray(ref_c1),
                               rtol=1e-5, atol=1e-6)


def test_sharded_mu_with_halo_matches_single_device():
    model, optimizer, state, video = _setup()
    mesh = make_mesh(num_time=8)
    grams, c1 = M.compute_grams(state, video, model, frame_block=4)

    # Smoothing active (gamma>0): exercises the ppermute halo.
    ref = M.footprint_update(state, grams, c1, iters=15, gamma=0.05)
    sh = sharded_footprint_update(
        shard_state(state, mesh), shard_video(grams, mesh),
        shard_video(c1, mesh), mesh=mesh, iters=15, gamma=0.05,
    )
    np.testing.assert_allclose(np.asarray(sh.c), np.asarray(ref.c),
                               rtol=1e-4, atol=1e-6)


def test_sharded_mu_no_smoothing_matches():
    model, optimizer, state, video = _setup()
    mesh = make_mesh(num_time=8)
    grams, c1 = M.compute_grams(state, video, model, frame_block=4)
    ref = M.footprint_update(state, grams, c1, iters=15, gamma=0.0)
    sh = sharded_footprint_update(
        shard_state(state, mesh), shard_video(grams, mesh),
        shard_video(c1, mesh), mesh=mesh, iters=15, gamma=0.0,
    )
    np.testing.assert_allclose(np.asarray(sh.c), np.asarray(ref.c),
                               rtol=1e-4, atol=1e-6)


def test_sharded_fista_with_halo_matches_single_device():
    """FISTA under frame sharding == single-device FISTA: the smoothing
    gradient's halo exchange AND the pmax'd global Lipschitz must both
    be right for the iterates to match bit-for-bit-ish."""
    model, optimizer, state, video = _setup()
    mesh = make_mesh(num_time=8)
    grams, c1 = M.compute_grams(state, video, model, frame_block=4)
    for gamma in (0.0, 0.05):
        ref = M.footprint_update(state, grams, c1, iters=25,
                                 gamma=gamma, solver="fista")
        sh = sharded_footprint_update(
            shard_state(state, mesh), shard_video(grams, mesh),
            shard_video(c1, mesh), mesh=mesh, iters=25, gamma=gamma,
            solver="fista",
        )
        np.testing.assert_allclose(np.asarray(sh.c), np.asarray(ref.c),
                                   rtol=1e-4, atol=1e-6)


def test_mesh_construction():
    mesh = make_mesh(num_time=4, num_batch=2)
    assert mesh.shape == {"batch": 2, "time": 4, "pixel": 1}
    mesh_tp = make_mesh(num_time=2, num_batch=1, num_pixel=4)
    assert mesh_tp.shape == {"batch": 1, "time": 2, "pixel": 4}


def test_batched_multi_recording_round():
    """vmap over recordings (BASELINE config 5) matches per-recording."""
    from dnmf_tpu.parallel.batched import (
        batched_round,
        stack_states,
        unstack_states,
    )

    model, optimizer, state0, video0 = _setup()
    key = jax.random.PRNGKey(11)
    state1 = M.init_state(model, optimizer,
                          positions=state0.pos + 0.5, key=key)
    video1 = jax.random.uniform(key, video0.shape)

    batched = stack_states([state0, state1])
    videos = jnp.stack([video0, video1])
    new_batched, metrics = batched_round(
        batched, videos, model, optimizer, gamma=0.1, mu_iters=5,
        frame_block=4,
    )
    assert metrics["recon_mse"].shape == (2,)

    # Per-recording serial reference.
    for i, (st, vid) in enumerate(((state0, video0), (state1, video1))):
        st_m, _ = M.motion_epoch_parallel(st, vid, model, optimizer, 0.1,
                                          frame_block=4)
        g, c1 = M.compute_grams(st_m, vid, model, frame_block=4)
        st_ref = M.footprint_update(st_m, g, c1, iters=5, gamma=0.0)
        got = unstack_states(new_batched)[i]
        np.testing.assert_allclose(np.asarray(got.beta),
                                   np.asarray(st_ref.beta),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(got.c),
                                   np.asarray(st_ref.c),
                                   rtol=1e-4, atol=1e-6)


def test_sharded_refined_rounds_matches_single_device():
    """Frame-sharded position refinement == single-device (zero-comm)."""
    from dnmf_tpu.models.refine import refined_rounds
    from dnmf_tpu.parallel.mesh import make_mesh
    from dnmf_tpu.parallel.sharded import sharded_refined_rounds

    model, optimizer, state, video = _setup()
    ref_state, ref_pos, ref_m = refined_rounds(
        state, video, model, rounds=2, epochs=4, mu_iters=5
    )
    mesh = make_mesh(num_time=8, num_batch=1)
    sh_state, sh_pos, sh_m = sharded_refined_rounds(
        shard_state(state, mesh), shard_video(video, mesh), model, mesh,
        rounds=2, epochs=4, mu_iters=5,
    )
    np.testing.assert_allclose(np.asarray(sh_pos), np.asarray(ref_pos),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sh_state.c),
                               np.asarray(ref_state.c),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sh_m["recon_mse"]),
                               np.asarray(ref_m["recon_mse"]),
                               rtol=1e-4, atol=1e-7)


def test_batched_round_pallas_matches_xla():
    """Fused kernels under vmap (recordings axis) == XLA batched path.

    pallas_call's batching rule prepends the recordings axis as an
    outer grid dimension; on the real chip this measured bit-exact vs
    per-recording dispatches (BASELINE.md config 5).
    """
    from dnmf_tpu.parallel.batched import batched_round, stack_states

    model, optimizer, state0, video0 = _setup()
    key = jax.random.PRNGKey(12)
    state1 = M.init_state(model, optimizer,
                          positions=state0.pos + 0.5, key=key)
    video1 = jax.random.uniform(key, video0.shape)
    batched = stack_states([state0, state1])
    videos = jnp.stack([video0, video1])

    ref, _ = batched_round(batched, videos, model, optimizer, gamma=0.1,
                           mu_iters=5, frame_block=4)
    got, _ = batched_round(batched, videos, model, optimizer, gamma=0.1,
                           mu_iters=5, frame_block=4, use_pallas=True,
                           pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(got.beta), np.asarray(ref.beta),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got.c), np.asarray(ref.c),
                               rtol=1e-4, atol=1e-6)


def test_engine_with_mesh_matches_single_device():
    """DeformableNMF with RuntimeConfig(mesh_time=8) == single device."""
    from dnmf_tpu.config import (
        ModelConfig as MC,
        OptimizerConfig as OC,
        RuntimeConfig as RC,
    )
    from dnmf_tpu.engine import DeformableNMF

    size = (12, 12, 2)
    k, t = 3, 16
    mc = MC(size=size, num_neurons=k, num_frames=t, shape_std=2.0)
    oc = OC(learning_rate=1e-3, motion_epochs=3, mu_iters=10,
            gamma_motion=0.1, gamma_traces=0.05)
    pos = jnp.asarray([[3.0, 3.0, 1.0], [8.0, 3.0, 1.0], [5.0, 8.0, 1.0]])
    video = jax.random.uniform(jax.random.PRNGKey(5),
                               (t, size[0] * size[1] * size[2]))

    eng_1 = DeformableNMF(mc, oc, RC(frame_block=4), positions=pos)
    eng_8 = DeformableNMF(mc, oc, RC(frame_block=4, mesh_time=8),
                          positions=pos)
    for eng in (eng_1, eng_8):
        eng.update_motion(video, epochs=3)
        eng.update_footprints(video, iters=10)
    np.testing.assert_allclose(np.asarray(eng_8.state.beta),
                               np.asarray(eng_1.state.beta),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(eng_8.traces, eng_1.traces,
                               rtol=1e-4, atol=1e-6)

    # Position-refinement polish routes through the sharded variant on
    # the mesh engine and must agree with the single-device engine.
    for eng in (eng_1, eng_8):
        eng.refine(video, rounds=1, epochs=3, mu_iters=3)
    np.testing.assert_allclose(np.asarray(eng_8.pos_t),
                               np.asarray(eng_1.pos_t),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(eng_8.traces, eng_1.traces,
                               rtol=1e-4, atol=1e-6)


def test_sharded_with_pallas_interpret_matches():
    """Pallas kernels inside shard_map (interpret mode on the CPU mesh)."""
    model, optimizer, state, video = _setup()
    mesh = make_mesh(num_time=4)
    from dnmf_tpu.parallel.sharded import (
        sharded_compute_grams as scg,
        sharded_motion_epoch as sme,
    )

    ref_state, ref_m = M.motion_epoch_parallel(
        state, video, model, optimizer, gamma=0.1, frame_block=4
    )
    sh_state, sh_m = sme(
        shard_state(state, mesh), shard_video(video, mesh), model,
        optimizer, gamma=0.1, mesh=mesh, frame_block=4,
        use_pallas=True, pallas_interpret=True,
    )
    np.testing.assert_allclose(np.asarray(sh_state.beta),
                               np.asarray(ref_state.beta),
                               rtol=0, atol=1e-5)

    ref_g, ref_c1 = M.compute_grams(state, video, model, frame_block=4)
    sh_g, sh_c1 = scg(
        shard_state(state, mesh), shard_video(video, mesh), model,
        mesh=mesh, frame_block=4, use_pallas=True, pallas_interpret=True,
    )
    np.testing.assert_allclose(np.asarray(sh_g), np.asarray(ref_g),
                               rtol=1e-4, atol=1e-5)


def test_distributed_helpers_single_host():
    """Multi-host entry point is importable and sane on one host (the
    real multi-process path needs a coordinator — documented untestable
    here; see dnmf_tpu/parallel/distributed.py)."""
    from dnmf_tpu.parallel import is_distributed, process_summary

    assert not is_distributed()
    summary = process_summary()
    assert summary["process_count"] == 1
    assert summary["global_device_count"] == 8  # virtual CPU mesh


def test_state_specs_match_by_field_path_not_shape():
    """Regression: a [K, T]-shaped leaf inside opt_state must replicate
    (round-2 shape-based matching would have sharded any leaf colliding
    with beta's or C's shape)."""
    from jax.sharding import PartitionSpec as P

    from dnmf_tpu.parallel.sharded import _state_specs

    model, optimizer, state, _ = _setup()
    k, t = state.c.shape
    # Craft an optimizer state carrying a trace-shaped statistic and a
    # beta-shaped moment side by side.
    crafted = state._replace(
        opt_state=(jnp.zeros_like(state.beta),   # moment: shards like beta
                   jnp.zeros((k, t)),            # collision shape: replicates
                   jnp.zeros(()))                # step count: replicates
    )
    specs = _state_specs(crafted)
    assert specs.beta == P("time")
    assert specs.c == P(None, "time")
    assert specs.pos == P() and specs.sigma == P()
    moment_spec, collision_spec, count_spec = specs.opt_state
    assert moment_spec == P("time")
    assert collision_spec == P()
    assert count_spec == P()
