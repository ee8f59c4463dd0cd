"""Streamed end-to-end pipeline + streaming sigma/refine (VERDICT r4).

The one-call pipeline must run at the scale the north star defines:
``register_and_demix`` accepts ``StreamingVideo``/``RawFileVideo``/
memmaps with device memory bounded by the block size, and the round-4
accuracy features (per-neuron sigma fitting, per-frame position
refinement) compose with streaming.  Every streamed path is gated
factor-for-factor against its device-resident twin.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dnmf_tpu.config import (
    ModelConfig,
    OptimizerConfig,
    RegistrationConfig,
    RuntimeConfig,
)
from dnmf_tpu.data import simulator
from dnmf_tpu.data.streaming import SpatialView, StreamingVideo
from dnmf_tpu.engine import DeformableNMF
from dnmf_tpu.engine.pipeline import register_and_demix
from dnmf_tpu.models import dnmf as M
from dnmf_tpu.models import refine as refine_lib
from dnmf_tpu.ops import basis as B
from dnmf_tpu.ops.footprints import gaussian_footprints

SIZE = (24, 24, 2)
K, T = 4, 8


def _fixture():
    base = jnp.asarray(
        [[6.0, 6.0, 1.0], [17.0, 6.0, 1.0], [6.0, 17.0, 1.0],
         [17.0, 17.0, 1.0]]
    )
    tt = jnp.arange(T, dtype=jnp.float32)
    dx = 1.5 * jnp.sin(2 * jnp.pi * tt / T)
    dy = 1.0 * jnp.cos(2 * jnp.pi * tt / T) - 1.0
    offsets = jnp.stack([dx, dy, jnp.zeros_like(tt)], axis=0)
    positions = base[:, :, None] + offsets[None]
    traces = simulator.exponential_traces(jax.random.PRNGKey(2), K, T,
                                          density=0.4)
    video = simulator.render_video(positions, traces, SIZE,
                                   shape_std=2.0)
    return video / jnp.max(video), positions, traces


def test_spatial_view_indexing_matches_array():
    video = np.arange(6 * 4 * 3 * 2, dtype=np.float32).reshape(
        6, 4, 3, 2)
    sv = SpatialView(StreamingVideo(video, block=2))
    assert sv.shape == video.shape and sv.ndim == 4 and len(sv) == 6
    np.testing.assert_array_equal(sv[1:5], video[1:5])
    np.testing.assert_array_equal(sv[::2], video[::2])
    idx = np.array([0, 3, 4, 5, 2])  # mixed contiguous runs
    np.testing.assert_array_equal(sv[idx], video[idx])
    np.testing.assert_array_equal(sv[np.int64(3)], video[3])


def test_spatial_view_registration_reads_are_unclamped():
    """Registration must see the recording's true values: on
    offset-subtracted recordings with negative baselines, a clamped
    view would shift min_mov/templates vs the device-resident and
    memmap paths (which register raw data)."""
    video = np.arange(6 * 4 * 3 * 2, dtype=np.float32).reshape(
        6, 4, 3, 2) - 50.0
    src = StreamingVideo(video, block=2)
    sv = SpatialView(src)
    np.testing.assert_array_equal(sv[0:6], video)  # negatives intact
    assert sv[:].min() < 0
    # The NMF read path keeps the non-negativity clamp.
    assert src.read(0, 6).min() == 0.0
    np.testing.assert_array_equal(
        src.read_raw(0, 6), video.reshape(6, -1))


def test_spatial_view_negative_and_out_of_range_indices():
    video = np.arange(6 * 4 * 3 * 2, dtype=np.float32).reshape(
        6, 4, 3, 2)
    sv = SpatialView(StreamingVideo(video, block=2))
    np.testing.assert_array_equal(sv[-1], video[-1])
    np.testing.assert_array_equal(sv[np.array([-1, -6, 2])],
                                  video[np.array([-1, -6, 2])])
    np.testing.assert_array_equal(sv[-3:-1], video[-3:-1])
    for bad in (6, -7, np.array([0, 6]), np.array([-7])):
        with pytest.raises(IndexError):
            sv[bad]


def test_raw_file_video_raw_reads(tmp_path):
    from dnmf_tpu.data.streaming import open_raw_video

    video = (np.arange(4 * 2 * 3 * 2, dtype=np.float32).reshape(
        4, 2, 3, 2) - 20.0)
    path = tmp_path / "neg.raw"
    video.tofile(path)
    src = open_raw_video(str(path), video.shape, block=2)
    assert src.read(0, 4).min() == 0.0  # NMF reads clamp
    np.testing.assert_array_equal(src.read_raw(0, 4),
                                  video.reshape(4, -1))
    np.testing.assert_array_equal(SpatialView(src)[1:3], video[1:3])


def test_spatial_view_rejects_flat_sources():
    flat = StreamingVideo(np.zeros((6, 48), np.float32), block=2)
    with pytest.raises(ValueError, match="spatial shape"):
        SpatialView(flat)


def _sigma_fixture():
    pos = jnp.asarray(
        [[6.0, 6.0, 1.0], [18.0, 6.0, 1.0], [6.0, 18.0, 1.0],
         [18.0, 18.0, 1.0]], jnp.float32)
    sigma_gt = jnp.asarray([1.3, 1.8, 2.3, 2.8], jnp.float32)
    t = 16
    traces = simulator.exponential_traces(jax.random.PRNGKey(3), K, t,
                                          density=0.3)
    grid = B.voxel_grid(SIZE)
    a = gaussian_footprints(grid, pos, sigma_gt)
    video = jnp.maximum(a @ traces, 0.0).T
    video = jnp.maximum(
        video + 0.01 * jax.random.normal(jax.random.PRNGKey(5),
                                         video.shape), 0.0)
    return pos, sigma_gt, traces, video, t


def test_update_sigma_streaming_matches_resident():
    """Streamed fit_sigma == device-resident (the subsample is a
    fixed-size host gather; previously rejected — VERDICT r4 weak #2)."""
    pos, sigma_gt, traces, video, t = _sigma_fixture()

    def engine():
        model = ModelConfig(size=SIZE, num_neurons=K, num_frames=t,
                            shape_std=2.0)
        opt = OptimizerConfig(fit_sigma=True, sigma_steps=10,
                              sigma_frames=8, sigma_lr=0.05)
        eng = DeformableNMF(model, opt, RuntimeConfig(frame_block=4),
                            positions=pos)
        eng.state = eng.state._replace(c=traces)
        return eng

    eng_a = engine()
    eng_a.update_sigma(video)
    eng_b = engine()
    eng_b.update_sigma(StreamingVideo(np.asarray(video), block=4))
    np.testing.assert_allclose(np.asarray(eng_b.state.sigma),
                               np.asarray(eng_a.state.sigma),
                               rtol=1e-6)


def test_fit_accepts_streaming_with_fit_sigma():
    """fit(fit_sigma=True) on a streamed source runs end-to-end (was a
    hard reject)."""
    pos, sigma_gt, traces, video, t = _sigma_fixture()
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=t,
                        shape_std=2.0)
    opt = OptimizerConfig(learning_rate=1e-3, motion_epochs=1,
                          mu_iters=10, fit_sigma=True, sigma_steps=5,
                          sigma_frames=8, sigma_every=1)
    eng = DeformableNMF(model, opt, RuntimeConfig(frame_block=4),
                        positions=pos)
    eng.fit(StreamingVideo(np.asarray(video), block=4), rounds=2)
    assert any(m["phase"] == "sigma" for m in eng.metrics)
    assert float(jnp.max(jnp.abs(eng.state.sigma - 2.0))) > 0.05


def test_refined_rounds_streaming_matches_resident():
    """Block-local streamed refinement == the device-resident
    alternation, factor for factor (refine was a crash on streamed
    sources — VERDICT r4 weak #2)."""
    video, positions, traces = _fixture()
    t = T
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=t,
                        shape_std=2.0)
    opt = M.make_motion_optimizer(OptimizerConfig())
    state = M.init_state(model, opt, positions=positions[:, :, 0],
                         key=jax.random.PRNGKey(0))
    video_flat = jnp.maximum(
        jnp.asarray(video).reshape(t, -1), 0.0)
    kw = dict(rounds=2, epochs=6, mu_iters=10, learning_rate=0.05,
              prior=1e-3)
    st_a, pos_a, _ = refine_lib.refined_rounds(
        state, video_flat, model, frame_block=4, **kw)
    source = StreamingVideo(np.asarray(video), block=4)
    st_b, pos_b, _ = refine_lib.refined_rounds_streaming(
        state, source, model, **kw)
    np.testing.assert_allclose(np.asarray(pos_b), np.asarray(pos_a),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_b.c), np.asarray(st_a.c),
                               rtol=1e-5, atol=1e-7)


def test_engine_refine_streaming():
    """DeformableNMF.refine on a streamed source matches the resident
    path and stores pos_t."""
    video, positions, traces = _fixture()
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=2.0)
    opt = OptimizerConfig(learning_rate=1e-3)

    def make():
        return DeformableNMF(model, opt, RuntimeConfig(frame_block=4),
                             positions=positions[:, :, 0])

    eng_a = make()
    eng_a.refine(jnp.asarray(video).reshape(T, -1), rounds=1,
                 epochs=5)
    eng_b = make()
    eng_b.refine(StreamingVideo(np.asarray(video), block=4), rounds=1,
                 epochs=5)
    np.testing.assert_allclose(np.asarray(eng_b.pos_t),
                               np.asarray(eng_a.pos_t),
                               rtol=1e-5, atol=1e-6)
    assert any(m["phase"] == "refine" for m in eng_b.metrics)


def _pipeline_configs():
    reg = RegistrationConfig(
        max_shifts=(4, 4, 1), pw_rigid=False, is3d=True, splits=2,
        border_nan=False,
    )
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=2.0)
    opt = OptimizerConfig(learning_rate=1e-3, outer_rounds=2,
                          motion_epochs=4, mu_iters=20,
                          gamma_motion=0.1)
    return reg, model, opt


def test_register_and_demix_streaming_matches_resident():
    """The one-call pipeline on a StreamingVideo reproduces the
    device-resident run (registration and fit both stream).  Seeds are
    pinned: the summary images match streamed-vs-resident to ~1e-5
    (gated in test_seeding), but near-tied peak scores can flip a
    detected voxel by 1 px across block partitions — the factor gate
    here is about registration + fit, not tie-breaking."""
    video, positions, traces = _fixture()
    reg, model, opt = _pipeline_configs()
    pts = np.asarray(positions[:, :, 0], np.float64)
    res_a = register_and_demix(video, points=pts, registration=reg,
                               model=model, optimizer=opt)
    source = StreamingVideo(np.asarray(video), block=4)
    res_b = register_and_demix(source, points=pts, registration=reg,
                               model=model, optimizer=opt)
    np.testing.assert_array_equal(res_b.positions, res_a.positions)
    np.testing.assert_allclose(res_b.traces, res_a.traces, rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_b.fit.state.beta),
                               np.asarray(res_a.fit.state.beta),
                               atol=1e-5)


def test_register_and_demix_memmap(tmp_path):
    """A memmapped recording streams through the pipeline end-to-end
    (refine included)."""
    video, positions, traces = _fixture()
    path = tmp_path / "rec.raw"
    arr = np.asarray(video, np.float32)
    arr.tofile(path)
    mm = np.memmap(path, dtype=np.float32, mode="r",
                   shape=(T,) + SIZE)
    reg, model, opt = _pipeline_configs()
    res = register_and_demix(mm, num_neurons=K, registration=reg,
                             model=model, optimizer=opt,
                             refine_positions=True, refine_rounds=1,
                             refine_epochs=5)
    assert res.traces.shape == (K, T)
    assert np.isfinite(res.traces).all()
