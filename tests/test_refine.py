"""Per-frame position refinement (`dnmf_tpu/models/refine.py`).

The hard-fixture end-to-end gate lives in test_pipeline.py; these are
the component contracts.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dnmf_tpu.config import ModelConfig, OptimizerConfig
from dnmf_tpu.data import simulator
from dnmf_tpu.models import dnmf as M
from dnmf_tpu.models import refine

SIZE = (20, 20, 2)
K, T = 3, 6


def _state(model, positions):
    optimizer = M.make_motion_optimizer(OptimizerConfig())
    return M.init_state(model, optimizer, positions=positions,
                        key=jax.random.PRNGKey(0))


def test_tracked_grams_match_compute_grams_at_anchor_positions():
    """pos_t broadcast of the anchors must reproduce compute_grams."""
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=2.0)
    pos = jnp.asarray([[5.0, 5.0, 1.0], [14.0, 6.0, 1.0],
                       [8.0, 14.0, 1.0]])
    state = _state(model, pos)
    video = jax.random.uniform(jax.random.PRNGKey(1),
                               (T, SIZE[0] * SIZE[1] * SIZE[2]))
    g_ref, c1_ref = M.compute_grams(state, video, model, frame_block=4)
    pos_t = jnp.broadcast_to(pos[None], (T, K, 3))
    g, c1 = refine.tracked_grams(state, pos_t, video, model,
                                 frame_block=4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c1_ref),
                               rtol=1e-5, atol=1e-6)


def test_refine_fused_path_matches_xla():
    """use_pallas refinement (fused culled dpos kernel + tracked-Gram
    kernel, interpret mode) must track the XLA autodiff path: same Adam
    trajectory to float tolerance and same MU statistics."""
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=2.0)
    pos = jnp.asarray([[5.0, 5.0, 1.0], [14.0, 6.0, 1.0],
                       [8.0, 14.0, 1.0]])
    state = _state(model, pos)
    state = state._replace(
        c=jax.random.uniform(jax.random.PRNGKey(5), (K, T)) + 0.1
    )
    video = jax.random.uniform(jax.random.PRNGKey(6),
                               (T, SIZE[0] * SIZE[1] * SIZE[2]))

    pos_ref, m_ref = refine.refine_positions(
        state, None, video, model, epochs=8, learning_rate=0.05,
        prior=1e-4, frame_block=4)
    pos_fus, m_fus = refine.refine_positions(
        state, None, video, model, epochs=8, learning_rate=0.05,
        prior=1e-4, frame_block=4, use_pallas=True,
        pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(pos_fus), np.asarray(pos_ref),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(m_fus["recon_mse"]),
                               np.asarray(m_ref["recon_mse"]),
                               rtol=1e-4)

    g_ref, c1_ref = refine.tracked_grams(state, pos_ref, video, model,
                                         frame_block=4)
    g_fus, c1_fus = refine.tracked_grams(state, pos_ref, video, model,
                                         frame_block=4, use_pallas=True,
                                         pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1_fus), np.asarray(c1_ref),
                               rtol=1e-4, atol=1e-6)


def test_refine_recovers_per_neuron_jitter():
    """Neurons jittered independently per frame (inexpressible as a
    global warp): refinement must recover the true positions to a
    fraction of a pixel and lift trace correlation."""
    base = jnp.asarray([[5.0, 5.0, 1.0], [14.0, 6.0, 1.0],
                        [8.0, 14.0, 1.0]])
    key = jax.random.PRNGKey(3)
    jit_xy = jax.random.normal(key, (K, 2, T)) * 0.8
    jitter = jnp.concatenate([jit_xy, jnp.zeros((K, 1, T))], axis=1)
    positions = base[:, :, None] + jitter  # [K, 3, T]
    traces = simulator.exponential_traces(jax.random.PRNGKey(4), K, T,
                                          density=0.5)
    video = simulator.render_video(positions, traces, SIZE,
                                   shape_std=2.0)
    video = (video / jnp.max(video)).reshape(T, -1)

    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=2.0)
    state = _state(model, base)
    state = state._replace(c=jnp.asarray(traces))

    pos_t, m = refine.refine_positions(state, None, video, model,
                                       epochs=120, learning_rate=0.05,
                                       prior=1e-4, frame_block=4)
    got = np.asarray(jnp.transpose(pos_t, (1, 2, 0)))  # [K, 3, T]
    err = np.linalg.norm(got[:, :2] - np.asarray(positions)[:, :2],
                         axis=1)
    assert err.mean() < 0.3, err.mean()
    assert np.asarray(m["recon_mse"]).shape == (T,)


def test_refined_rounds_improve_traces():
    base = jnp.asarray([[5.0, 5.0, 1.0], [14.0, 6.0, 1.0],
                        [8.0, 14.0, 1.0]])
    key = jax.random.PRNGKey(7)
    jit_xy = jax.random.normal(key, (K, 2, T)) * 1.0
    jitter = jnp.concatenate([jit_xy, jnp.zeros((K, 1, T))], axis=1)
    positions = base[:, :, None] + jitter
    traces = simulator.exponential_traces(jax.random.PRNGKey(8), K, T,
                                          density=0.5)
    video = simulator.render_video(positions, traces, SIZE,
                                   shape_std=2.0)
    video = (video / jnp.max(video)).reshape(T, -1)
    gt = np.asarray(traces)

    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=2.0)
    state = _state(model, base)

    def corr_of(st):
        c = np.asarray(st.c)
        return np.mean([np.corrcoef(c[i], gt[i])[0, 1]
                        for i in range(K)])

    g, c1 = M.compute_grams(state, video, model, frame_block=4)
    st_base = M.footprint_update(state, g, c1, iters=40)
    st_ref, pos_t, _ = refine.refined_rounds(
        state, video, model, rounds=2, epochs=60, mu_iters=40,
        learning_rate=0.06, prior=3e-4, frame_block=4)
    assert corr_of(st_ref) > corr_of(st_base) + 0.05, (
        corr_of(st_ref), corr_of(st_base))
    assert pos_t.shape == (T, K, 3)


def test_engine_refine_method():
    from dnmf_tpu.engine import DeformableNMF

    base = jnp.asarray([[5.0, 5.0, 1.0], [14.0, 6.0, 1.0],
                        [8.0, 14.0, 1.0]])
    traces = simulator.exponential_traces(jax.random.PRNGKey(2), K, T,
                                          density=0.5)
    positions = jnp.broadcast_to(base[:, :, None], (K, 3, T))
    video = simulator.render_video(positions, traces, SIZE,
                                   shape_std=2.0)
    video = video / jnp.max(video)

    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=2.0)
    eng = DeformableNMF(model, OptimizerConfig(learning_rate=1e-3),
                        positions=base)
    eng.update_footprints(video.reshape(T, -1), iters=20)
    res = eng.refine(video.reshape(T, -1), rounds=1, epochs=10)
    assert eng.pos_t.shape == (T, K, 3)
    assert any(m["phase"] == "refine" for m in res.metrics)
    assert np.isfinite(res.traces).all()
