"""Native threaded block reader: bit-equivalence with the NumPy path and
full interchangeability as a streamed-epoch source."""

import jax.numpy as jnp
import numpy as np
import pytest

from dnmf_tpu.data.streaming import (
    RawFileVideo,
    StreamingVideo,
    open_raw_video,
)
from dnmf_tpu.native import load_blockreader

SHAPE = (13, 6, 5, 2)  # deliberately odd T for partial final blocks


@pytest.fixture(scope="module")
def raw_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    video = rng.normal(size=SHAPE).astype(np.float32)  # incl. negatives
    path = tmp_path_factory.mktemp("nat") / "video.raw"
    video.tofile(path)
    return str(path), video


def _require_native():
    if load_blockreader() is None:
        pytest.skip("no native toolchain available")


def test_native_read_matches_numpy(raw_file):
    _require_native()
    path, video = raw_file
    src = RawFileVideo(path, SHAPE, block=4)
    ref = StreamingVideo(video, block=4)
    for start, stop in [(0, 4), (3, 9), (10, 13), (0, 13)]:
        np.testing.assert_array_equal(src.read(start, stop),
                                      ref.read(start, stop))


def test_native_blocks_match_numpy(raw_file):
    _require_native()
    path, video = raw_file
    for prefetch in (True, False):
        src = RawFileVideo(path, SHAPE, block=4, prefetch=prefetch)
        ref = StreamingVideo(video, block=4)
        got = list(src.blocks())
        want = list(ref.blocks())
        assert len(got) == len(want)
        for (gc, gs, gv), (wc, ws, wv) in zip(got, want):
            assert (gs, gv) == (ws, wv)
            np.testing.assert_array_equal(np.asarray(gc),
                                          np.asarray(wc))


def test_native_source_drives_streamed_epoch(raw_file):
    _require_native()
    import jax

    from dnmf_tpu.config import ModelConfig, OptimizerConfig
    from dnmf_tpu.models import dnmf as M

    path, video = raw_file
    t = SHAPE[0]
    model = ModelConfig(size=SHAPE[1:], num_neurons=3, num_frames=t,
                        shape_std=1.5)
    optimizer = M.make_motion_optimizer(
        OptimizerConfig(learning_rate=1e-3)
    )
    pos = jnp.asarray([[2.0, 2.0, 1.0], [4.0, 3.0, 0.5],
                       [3.0, 1.0, 1.0]])
    state = M.init_state(model, optimizer, positions=pos,
                         key=jax.random.PRNGKey(0))

    native_state, nm = M.motion_epoch_streaming(
        state, RawFileVideo(path, SHAPE, block=4), model, optimizer, 0.1
    )
    numpy_state, pm = M.motion_epoch_streaming(
        state, StreamingVideo(video, block=4), model, optimizer, 0.1
    )
    np.testing.assert_array_equal(np.asarray(native_state.beta),
                                  np.asarray(numpy_state.beta))
    np.testing.assert_allclose(float(nm["recon_mse"]),
                               float(pm["recon_mse"]), rtol=1e-6)


def test_open_raw_video_fallback(raw_file):
    path, video = raw_file
    src = open_raw_video(path, SHAPE, block=4)
    blocks = list(src.blocks())
    ref = list(StreamingVideo(video, block=4).blocks())
    for (gc, _, _), (wc, _, _) in zip(blocks, ref):
        np.testing.assert_array_equal(np.asarray(gc), np.asarray(wc))


def test_wait_range_mismatch_fails_loudly(raw_file):
    """wait(start, stop) must reject a range that differs from the
    in-flight prefetch instead of silently returning the wrong frames."""
    _require_native()
    path, video = raw_file
    src = RawFileVideo(path, SHAPE, block=4)
    src._reader.prefetch(0, 4)
    with pytest.raises(ValueError, match="does not match"):
        src._reader.wait(4, 8)  # same size, different range
    # The prefetch was consumed by the failed wait attempt? No — the
    # range check happens before the join, so the request is still
    # serviceable with the right range.
    got = src._reader.wait(0, 4)
    np.testing.assert_array_equal(got, np.maximum(
        video[0:4].reshape(4, -1), 0.0))
