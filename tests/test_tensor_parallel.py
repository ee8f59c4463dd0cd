"""Pixel-sharded (tensor-parallel) Grams and gradients.

SURVEY §2.3 TP row: at whole-brain K (config 4: K=500), per-frame
``[K, K]`` Grams are the dominant reduction; sharding the *voxel* axis
splits both the footprint evaluation and the Gram accumulation, with one
``psum`` producing the global Gram — the pixel-sharded form of the
reference's whole-volume einsum (``/root/reference/Demix/dNMF.py:141``).
Gates: sharded == dense at K=96 on the CPU mesh (VERDICT r1 item 6),
composed with the time axis, through the raw steps and the engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnmf_tpu.config import ModelConfig, OptimizerConfig, RuntimeConfig
from dnmf_tpu.models import dnmf as M
from dnmf_tpu.parallel import (
    make_mesh,
    shard_state,
    shard_video,
    sharded_compute_grams,
    sharded_footprint_update,
    sharded_motion_epoch,
)

SIZE = (16, 12, 2)  # P = 384, divisible by 4 pixel shards
K, T = 96, 8


def _fixture(rng):
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=2.0)
    optimizer = M.make_motion_optimizer(OptimizerConfig(learning_rate=1e-3))
    pos = jnp.asarray(
        rng.uniform(1.0, 11.0, size=(K, 3)).astype(np.float32)
    )
    state = M.init_state(model, optimizer, positions=pos,
                         key=jax.random.PRNGKey(0))
    video = rng.uniform(0.0, 1.0, size=(T, SIZE[0] * SIZE[1] * SIZE[2]))
    return model, optimizer, state, jnp.asarray(video.astype(np.float32))


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2)],
                         ids=["tp8", "t2xp4", "t4xp2"])
def test_pixel_sharded_grams_match_dense(rng, mesh_shape):
    num_time, num_pixel = mesh_shape
    model, optimizer, state, video = _fixture(rng)

    dense_grams, dense_c1 = M.compute_grams(state, video, model,
                                            frame_block=4)

    mesh = make_mesh(num_time=num_time, num_batch=1, num_pixel=num_pixel)
    sh_state = shard_state(state, mesh)
    sh_video = shard_video(video, mesh)
    grams, c1 = sharded_compute_grams(sh_state, sh_video, model,
                                      mesh=mesh, frame_block=4)
    np.testing.assert_allclose(np.asarray(grams),
                               np.asarray(dense_grams),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(dense_c1),
                               rtol=1e-5, atol=1e-5)


def test_pixel_sharded_motion_epoch_matches_dense(rng):
    model, optimizer, state, video = _fixture(rng)
    dense_state, dense_m = M.motion_epoch_parallel(
        state, video, model, optimizer, gamma=0.1, frame_block=4
    )

    mesh = make_mesh(num_time=2, num_batch=1, num_pixel=4)
    sh_state = shard_state(state, mesh)
    sh_video = shard_video(video, mesh)
    sh_state, sh_m = sharded_motion_epoch(
        sh_state, sh_video, model, optimizer, gamma=0.1, mesh=mesh,
        frame_block=4,
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.beta), np.asarray(dense_state.beta),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(float(sh_m["recon_mse"]),
                               float(dense_m["recon_mse"]), rtol=1e-5)
    np.testing.assert_allclose(float(sh_m["reg"]),
                               float(dense_m["reg"]),
                               rtol=1e-5, atol=1e-7)


def test_engine_tp_round_matches_dense(rng):
    """Full engine round on a (time x pixel) mesh == single device."""
    from dnmf_tpu.engine.trainer import DeformableNMF

    model, _, state, video = _fixture(rng)
    opt = OptimizerConfig(learning_rate=1e-3, motion_mode="parallel",
                          motion_epochs=1, mu_iters=5, outer_rounds=1,
                          gamma_motion=0.1, gamma_traces=0.01)

    # Pin gram_mode="exact" on the dense side: the pixel mesh resolves
    # "auto" -> exact (the closed form is rejected there by design),
    # while the dense engine would resolve to analytic — a ~1e-3
    # modeling difference that is not what this test compares.
    dense = DeformableNMF(model, opt, positions=state.pos,
                          runtime=RuntimeConfig(gram_mode="exact"))
    dense_res = dense.fit(video)

    tp = DeformableNMF(
        model, opt, positions=state.pos,
        runtime=RuntimeConfig(mesh_time=2, mesh_pixel=4, frame_block=4),
    )
    assert tp._gram_mode == "exact"
    tp_res = tp.fit(video)

    np.testing.assert_allclose(
        np.asarray(tp_res.state.beta), np.asarray(dense_res.state.beta),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(tp_res.state.c), np.asarray(dense_res.state.c),
        rtol=1e-4, atol=1e-6,
    )


def test_pixel_sharded_mu_with_smoothing(rng):
    """Halo'd MU on TP-produced Grams == dense MU (the composition the
    long-config workload runs)."""
    model, optimizer, state, video = _fixture(rng)
    dense_grams, dense_c1 = M.compute_grams(state, video, model,
                                            frame_block=4)
    dense_final = M.footprint_update(state, dense_grams, dense_c1,
                                     iters=5, gamma=0.01)

    mesh = make_mesh(num_time=4, num_batch=1, num_pixel=2)
    sh_state = shard_state(state, mesh)
    sh_video = shard_video(video, mesh)
    grams, c1 = sharded_compute_grams(sh_state, sh_video, model,
                                      mesh=mesh, frame_block=4)
    final = sharded_footprint_update(sh_state, grams, c1, mesh=mesh,
                                     iters=5, gamma=0.01)
    np.testing.assert_allclose(
        np.asarray(final.c), np.asarray(dense_final.c),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("culled", [False, True], ids=["dense", "culled"])
def test_pixel_sharded_pallas_grams_match_dense(rng, culled):
    """Fused-kernel TP: voxel-offset pallas Grams on a pixel mesh ==
    dense XLA Grams (both kernel families; culled = K > 64 path)."""
    model, optimizer, state, video = _fixture(rng)
    if not culled:
        # K <= 64 routes to the dense fused kernels (_pick_pallas).
        sub = 48
        model = ModelConfig(size=SIZE, num_neurons=sub, num_frames=T,
                            shape_std=2.0)
        state = M.init_state(
            model, optimizer, positions=state.pos[:sub],
            key=jax.random.PRNGKey(0),
        )

    dense_grams, dense_c1 = M.compute_grams(state, video, model,
                                            frame_block=4)

    mesh = make_mesh(num_time=2, num_batch=1, num_pixel=4)
    sh_state = shard_state(state, mesh)
    sh_video = shard_video(video, mesh)
    grams, c1 = sharded_compute_grams(
        sh_state, sh_video, model, mesh=mesh, frame_block=4,
        use_pallas=True, pallas_interpret=True,
    )
    np.testing.assert_allclose(np.asarray(grams),
                               np.asarray(dense_grams),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(dense_c1),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("culled", [False, True], ids=["dense", "culled"])
def test_pixel_sharded_pallas_motion_matches_dense(rng, culled):
    """Fused-kernel TP: voxel-offset pallas gradients on a pixel mesh ==
    dense XLA motion epoch."""
    model, optimizer, state, video = _fixture(rng)
    if not culled:
        sub = 48
        model = ModelConfig(size=SIZE, num_neurons=sub, num_frames=T,
                            shape_std=2.0)
        state = M.init_state(
            model, optimizer, positions=state.pos[:sub],
            key=jax.random.PRNGKey(0),
        )
    dense_state, dense_m = M.motion_epoch_parallel(
        state, video, model, optimizer, gamma=0.1, frame_block=4
    )

    mesh = make_mesh(num_time=2, num_batch=1, num_pixel=4)
    sh_state = shard_state(state, mesh)
    sh_video = shard_video(video, mesh)
    sh_state, sh_m = sharded_motion_epoch(
        sh_state, sh_video, model, optimizer, gamma=0.1, mesh=mesh,
        frame_block=4, use_pallas=True, pallas_interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.beta), np.asarray(dense_state.beta),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(float(sh_m["recon_mse"]),
                               float(dense_m["recon_mse"]), rtol=1e-4)


def test_guards(rng):
    """Unsupported compositions fail loudly, not silently wrong."""
    from dnmf_tpu.config import DeformationConfig
    from dnmf_tpu.engine.trainer import DeformableNMF

    model, optimizer, state, video = _fixture(rng)
    mesh = make_mesh(num_time=2, num_batch=1, num_pixel=4)

    with pytest.raises(ValueError, match="p_offset"):
        M.grams_local(state, video, model, 4,
                      vb=M.model_voxel_basis(model), use_pallas=True)

    resample_model = ModelConfig(
        size=SIZE, num_neurons=K, num_frames=T, shape_std=2.0,
        deformation=DeformationConfig(footprint_mode="resample",
                                      basis_scaling="pixel",
                                      detach_regularizer=True),
    )
    with pytest.raises(ValueError, match="analytic"):
        DeformableNMF(
            resample_model,
            OptimizerConfig(motion_mode="parallel"),
            positions=state.pos,
            runtime=RuntimeConfig(mesh_pixel=4),
        )

    from dnmf_tpu.data.streaming import StreamingVideo
    from dnmf_tpu.parallel import sharded_motion_epoch_streaming

    resample_state = M.init_state(
        resample_model,
        M.make_motion_optimizer(OptimizerConfig(learning_rate=1e-3)),
        positions=state.pos, key=jax.random.PRNGKey(0),
    )
    src = StreamingVideo(np.zeros((T,) + SIZE, np.float32), block=4)
    sh_state = shard_state(resample_state, mesh)
    with pytest.raises(ValueError, match="analytic"):
        sharded_motion_epoch_streaming(
            sh_state, src, resample_model, optimizer, gamma=0.1,
            mesh=mesh,
        )


@pytest.mark.parametrize("use_pallas", [False, True],
                         ids=["xla", "pallas"])
def test_streaming_on_pixel_mesh_matches_dense(rng, use_pallas):
    """TP x streaming: host-streamed block rows on a (time x pixel) mesh
    reproduce the device-resident single-device fit (both footprint
    paths)."""
    from dnmf_tpu.data.streaming import StreamingVideo
    from dnmf_tpu.parallel import (
        sharded_compute_grams_streaming,
        sharded_motion_epoch_streaming,
    )

    model, optimizer, state, video = _fixture(rng)
    dense_state, dense_m = M.motion_epoch_parallel(
        state, video, model, optimizer, gamma=0.1, frame_block=4
    )
    dense_grams, dense_c1 = M.compute_grams(dense_state, video, model,
                                            frame_block=4)

    mesh = make_mesh(num_time=2, num_batch=1, num_pixel=4)
    sh_state = shard_state(state, mesh)
    src = StreamingVideo(
        np.asarray(video).reshape((T,) + SIZE), block=3
    )
    kw = dict(use_pallas=True, pallas_interpret=True) if use_pallas \
        else dict(use_pallas=False)
    sh_state, sh_m = sharded_motion_epoch_streaming(
        sh_state, src, model, optimizer, gamma=0.1, mesh=mesh, **kw
    )
    grams, c1 = sharded_compute_grams_streaming(
        sh_state, src, model, mesh=mesh, **kw
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.beta), np.asarray(dense_state.beta),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(float(sh_m["recon_mse"]),
                               float(dense_m["recon_mse"]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(grams),
                               np.asarray(dense_grams),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(dense_c1),
                               rtol=1e-4, atol=1e-5)
