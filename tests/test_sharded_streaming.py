"""Mesh x streaming composition (BASELINE config 4, scaled down).

The reference parallelizes long recordings by chunking T over host
processes (``/root/reference/Demix/MotionCorrect.py:2088-2117``); our
equivalent streams host frame blocks onto a time-sharded mesh.  These
tests gate the composed path against the dense single-device fit at
rtol 1e-5 (SURVEY.md §4: sharded must match single-device), including
partial final blocks (block size not dividing the shard length) and the
full engine route (DeformableNMF + StreamingVideo + mesh_time).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dnmf_tpu.config import ModelConfig, OptimizerConfig, RuntimeConfig
from dnmf_tpu.data.streaming import StreamingVideo
from dnmf_tpu.models import dnmf as M
from dnmf_tpu.parallel import (
    make_mesh,
    shard_state,
    sharded_compute_grams_streaming,
    sharded_footprint_update,
    sharded_motion_epoch_streaming,
)

SIZE = (12, 12, 2)
K, T = 4, 64
MESH_TIME = 8
BLOCK = 3  # does NOT divide shard_len=8 -> exercises partial-block masking


def _fixture(rng):
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=2.0)
    optimizer = M.make_motion_optimizer(OptimizerConfig(learning_rate=1e-3))
    pos = jnp.asarray(
        rng.uniform(2.0, 10.0, size=(K, 3)).astype(np.float32)
    )
    state = M.init_state(model, optimizer, positions=pos,
                         key=jax.random.PRNGKey(0))
    video = rng.uniform(0.0, 1.0, size=(T,) + SIZE).astype(np.float32)
    return model, optimizer, state, video


def test_sharded_streaming_matches_dense(rng):
    model, optimizer, state, video = _fixture(rng)
    video_flat = jnp.asarray(video.reshape(T, -1))

    # Dense single-device reference path.
    dense_state, dense_m = M.motion_epoch_parallel(
        state, video_flat, model, optimizer, gamma=0.1, frame_block=4
    )
    dense_grams, dense_c1 = M.compute_grams(dense_state, video_flat,
                                            model, frame_block=4)
    dense_final = M.footprint_update(dense_state, dense_grams, dense_c1,
                                     iters=5, gamma=0.01)

    # Streamed onto an 8-way time mesh.
    mesh = make_mesh(num_time=MESH_TIME, num_batch=1)
    sh_state = shard_state(state, mesh)
    source = StreamingVideo(video, block=BLOCK)
    sh_state, sh_m = sharded_motion_epoch_streaming(
        sh_state, source, model, optimizer, gamma=0.1, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.beta), np.asarray(dense_state.beta),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(sh_m["recon_mse"],
                               float(dense_m["recon_mse"]), rtol=1e-5)

    grams, c1 = sharded_compute_grams_streaming(
        sh_state, source, model, mesh=mesh
    )
    np.testing.assert_allclose(np.asarray(grams),
                               np.asarray(dense_grams),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(dense_c1),
                               rtol=1e-5, atol=1e-6)

    final = sharded_footprint_update(sh_state, grams, c1, mesh=mesh,
                                     iters=5, gamma=0.01)
    np.testing.assert_allclose(
        np.asarray(final.c), np.asarray(dense_final.c),
        rtol=1e-5, atol=1e-7,
    )


def test_engine_streaming_on_mesh_matches_dense(rng):
    """Full engine route: fit() with mesh_time + StreamingVideo equals the
    single-device dense fit (the round-1 undefined-behavior case)."""
    from dnmf_tpu.engine.trainer import DeformableNMF

    _, _, _, video = _fixture(rng)
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=2.0)
    opt = OptimizerConfig(learning_rate=1e-3, motion_mode="parallel",
                          motion_epochs=2, mu_iters=5, outer_rounds=2,
                          gamma_motion=0.1, gamma_traces=0.01)
    pos = jnp.asarray(
        np.random.default_rng(1).uniform(2.0, 10.0, (K, 3))
        .astype(np.float32)
    )

    dense = DeformableNMF(model, opt, positions=pos)
    dense_res = dense.fit(video.reshape(T, -1))

    meshed = DeformableNMF(
        model, opt, positions=pos,
        runtime=RuntimeConfig(mesh_time=MESH_TIME, frame_block=4),
    )
    stream_res = meshed.fit(StreamingVideo(video, block=BLOCK))

    # 2 chained rounds with different frame blockings accumulate a few
    # 1e-6 of f32 reassociation noise; gate absolutely at 1e-5 (Adam
    # steps move beta by ~1e-3/round, so this is ~0.1% of the movement).
    np.testing.assert_allclose(
        np.asarray(stream_res.state.beta),
        np.asarray(dense_res.state.beta), rtol=0, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(stream_res.state.c), np.asarray(dense_res.state.c),
        rtol=1e-4, atol=1e-6,
    )


def test_streaming_memmap_source_on_mesh(rng, tmp_path):
    """A disk-memmapped recording streams onto the mesh (config-4 shape,
    scaled down) and produces finite, matching factors."""
    from dnmf_tpu.data.streaming import open_memmap_video

    model, optimizer, state, video = _fixture(rng)
    path = tmp_path / "video.raw"
    mm = np.memmap(path, dtype=np.float32, mode="w+",
                   shape=(T,) + SIZE)
    mm[:] = video
    mm.flush()

    mesh = make_mesh(num_time=MESH_TIME, num_batch=1)
    sh_state = shard_state(state, mesh)
    source = open_memmap_video(str(path), (T,) + SIZE, block=4)
    sh_state, _ = sharded_motion_epoch_streaming(
        sh_state, source, model, optimizer, gamma=0.1, mesh=mesh
    )

    dense_state, _ = M.motion_epoch_parallel(
        state, jnp.asarray(video.reshape(T, -1)), model, optimizer,
        gamma=0.1, frame_block=4,
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.beta), np.asarray(dense_state.beta),
        rtol=1e-5, atol=1e-7,
    )


def test_sharded_checkpoint_resume(rng, tmp_path):
    """Save on an 8-way time mesh; restore onto the same mesh AND onto a
    single device — factors identical, and the resumed mesh run continues
    correctly (VERDICT r1: resume-onto-mesh was the untested case)."""
    from dnmf_tpu.utils.checkpoint import load_state, save_state

    model, optimizer, state, video = _fixture(rng)
    video_flat = jnp.asarray(video.reshape(T, -1))
    mesh = make_mesh(num_time=MESH_TIME, num_batch=1)

    from dnmf_tpu.parallel import shard_video, sharded_motion_epoch

    sh_state = shard_state(state, mesh)
    sh_video = shard_video(video_flat, mesh)
    sh_state, _ = sharded_motion_epoch(
        sh_state, sh_video, model, optimizer, gamma=0.1, mesh=mesh,
        frame_block=4,
    )
    path = str(tmp_path / "ckpt")
    save_state(path, sh_state)

    # Restore onto the mesh (template = freshly sharded init state).
    mesh_template = shard_state(
        M.init_state(model, optimizer, positions=state.pos,
                     key=jax.random.PRNGKey(0)),
        mesh,
    )
    restored_mesh = load_state(path, mesh_template)
    for name in ("beta", "c", "pos", "sigma"):
        np.testing.assert_array_equal(
            np.asarray(getattr(restored_mesh, name)),
            np.asarray(getattr(sh_state, name)),
        )
    # The restored state keeps the template's sharding and keeps training.
    assert restored_mesh.beta.sharding.is_equivalent_to(
        mesh_template.beta.sharding, restored_mesh.beta.ndim
    )
    cont_mesh, _ = sharded_motion_epoch(
        restored_mesh, sh_video, model, optimizer, gamma=0.1, mesh=mesh,
        frame_block=4,
    )

    # Restore onto a single device and continue there.
    single_template = M.init_state(model, optimizer, positions=state.pos,
                                   key=jax.random.PRNGKey(0))
    restored_single = load_state(path, single_template)
    np.testing.assert_array_equal(np.asarray(restored_single.beta),
                                  np.asarray(sh_state.beta))
    cont_single, _ = M.motion_epoch_parallel(
        restored_single, video_flat, model, optimizer, gamma=0.1,
        frame_block=4,
    )
    np.testing.assert_allclose(
        np.asarray(cont_mesh.beta), np.asarray(cont_single.beta),
        rtol=1e-5, atol=1e-7,
    )
