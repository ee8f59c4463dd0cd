import jax
import jax.numpy as jnp
import numpy as np

from dnmf_tpu.config import SimulatorConfig
from dnmf_tpu.data import simulator
from dnmf_tpu.data.datasets import SimulatedVideoDataset

SMALL = SimulatorConfig(num_neurons=4, num_frames=12, size=(16, 14, 2),
                        shape_std=2.0, density=0.2, bg_snr_db=-60.0)


def test_gp_motion_shapes_and_statistics():
    key = jax.random.PRNGKey(0)
    pos = simulator.gp_motion(key, 30, 200, sigma=(4.0, 4.0, 0.01),
                              length_scale=(10.0, 10.0, 10.0),
                              size=(50, 50, 2))
    assert pos.shape == (30, 3, 200)
    # Offsets from anchor (per-frame mean over many frames approximates the
    # anchor); per-axis offset variance ~ sigma.
    anchors = np.asarray(pos).mean(axis=2)
    offsets = np.asarray(pos) - anchors[:, :, None]
    var_x = offsets[:, 0, :].var()
    assert 1.0 < var_x < 10.0  # prior variance 4.0 +- sampling noise
    var_z = offsets[:, 2, :].var()
    assert var_z < 0.1


def test_quadratic_sequential_starts_at_init():
    key = jax.random.PRNGKey(1)
    # Coefficient noise feeds the quadratic terms too (amplified by x^2,
    # matching the reference), so realistic configs sit at <= -100 dB.
    pos = simulator.quadratic_sequential_trajectory(
        key, 5, 10, snr_db=(-100, -100, -100), size=(20, 20, 2)
    )
    assert pos.shape == (5, 3, 10)
    # Low noise => near-identity transforms => small frame-to-frame motion.
    step = np.abs(np.diff(np.asarray(pos), axis=2)).max()
    assert step < 2.0


def test_quadratic_trajectory_shapes():
    pos = simulator.quadratic_trajectory(
        jax.random.PRNGKey(2), 6, 8, snr_db=(-60, -60, -60), size=(20, 20, 2)
    )
    assert pos.shape == (6, 3, 8)
    assert np.all(np.isfinite(np.asarray(pos)))


def test_exponential_traces():
    tr = simulator.exponential_traces(jax.random.PRNGKey(3), 8, 50,
                                      density=0.2)
    assert tr.shape == (8, 50)
    arr = np.asarray(tr)
    assert np.all(arr >= 1.0 - 1e-6)  # baseline 1 + nonneg spikes
    assert arr.max() > 1.5  # spikes present


def test_render_video_peak_and_position():
    positions = jnp.asarray([[[5.0], [7.0], [1.0]]])  # [K=1, 3, T=1]
    traces = jnp.asarray([[2.0]])
    video = simulator.render_video(positions, traces, (12, 14, 3),
                                   shape_std=2.0)
    assert video.shape == (1, 12, 14, 3)
    v = np.asarray(video[0])
    assert np.unravel_index(v.argmax(), v.shape) == (5, 7, 1)
    np.testing.assert_allclose(v[5, 7, 1], 2.0, rtol=1e-5)
    # squared-width 2*shape_std: value at distance 2 = peak * exp(-4/4)
    np.testing.assert_allclose(v[7, 7, 1], 2.0 * np.exp(-1.0), rtol=1e-4)


def test_generate_video_contract():
    video, positions, traces = simulator.generate_video(SMALL)
    assert video.shape == (12, 16, 14, 2)
    assert positions.shape == (4, 3, 12)
    assert traces.shape == (4, 12)
    assert abs(float(video.max()) - 1.0) < 1e-5  # normalized by max
    assert np.all(np.isfinite(np.asarray(video)))


def test_generate_video_deterministic():
    v1, p1, t1 = simulator.generate_video(SMALL)
    v2, p2, t2 = simulator.generate_video(SMALL)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_motion_name_aliases():
    cfg_sq = SimulatorConfig(num_neurons=3, num_frames=5, size=(10, 10, 1),
                             motion="sq", motion_snr_db=(-60, -60, -60))
    cfg_qs = SimulatorConfig(num_neurons=3, num_frames=5, size=(10, 10, 1),
                             motion="qs", motion_snr_db=(-60, -60, -60))
    v1, _, _ = simulator.generate_video(cfg_sq)
    v2, _, _ = simulator.generate_video(cfg_qs)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_roi_signals_recovers_trace_ordering():
    # Hand-placed, well-separated static neurons: the cube readout must
    # track each ground-truth trace almost perfectly.  (Random anchors can
    # land neurons ~1 px apart, which no ROI readout separates — that
    # mixing regime is exactly what dNMF itself is for.)
    t = 12
    positions = jnp.broadcast_to(
        jnp.asarray([[4.0, 4.0, 1.0], [12.0, 4.0, 1.0],
                     [4.0, 12.0, 1.0], [12.0, 12.0, 1.0]])[:, :, None],
        (4, 3, t),
    )
    traces = simulator.exponential_traces(jax.random.PRNGKey(5), 4, t,
                                          density=0.3)
    video = simulator.render_video(positions, traces, (17, 17, 3),
                                   shape_std=2.0)
    sig = simulator.roi_signals(video, positions, window=(2, 2, 0))
    assert sig.shape == (4, t)
    s, tr = np.asarray(sig), np.asarray(traces)
    for k in range(4):
        r = np.corrcoef(s[k], tr[k])[0, 1]
        assert r > 0.95, f"neuron {k} corr {r}"


def test_simulated_dataset_batches():
    ds = SimulatedVideoDataset(SMALL)
    assert len(ds) == 12
    assert ds.size == (16, 14, 2)
    batches = list(ds.batches(5))
    assert [b[0].shape[0] for b in batches] == [5, 5, 2]
    frames, times = batches[1]
    np.testing.assert_array_equal(np.asarray(times), [5, 6, 7, 8, 9])
    assert float(jnp.min(frames)) >= 0.0
    shuffled = list(
        ds.batches(4, shuffle=True, key=jax.random.PRNGKey(0))
    )
    all_times = np.concatenate([np.asarray(t) for _, t in shuffled])
    assert sorted(all_times.tolist()) == list(range(12))


def test_generate_random_video_contract():
    from dnmf_tpu.data import simulator as S

    v, traj, rot, colors = S.generate_random_video(
        cellnum=2, size=(24, 24, 1, 2, 4), cell_size=(9, 9, 1, 2), seed=1
    )
    assert v.shape == (24, 24, 1, 2, 4)
    assert traj.shape == (4, 2, 3)
    assert colors.shape == (2, 2)
    assert np.isfinite(v).all() and abs(float(v.max()) - 1.0) < 1e-9


def test_simulate_cell_peak_normalized():
    from dnmf_tpu.data import simulator as S

    cell = S.simulate_cell((9, 9, 3, 1), [4, 4, 1], 2 * np.eye(3),
                           [2.0], [0.0], [0.0])
    assert cell.shape == (9, 9, 3, 1)
    np.testing.assert_allclose(cell[4, 4, 1, 0], 2.0, rtol=1e-6)


def test_rotation_matrix_orthonormal():
    from dnmf_tpu.data import simulator as S

    r = S.rotation_matrix(0.7, [0, 0, 1])
    np.testing.assert_allclose(r[:3, :3] @ r[:3, :3].T, np.eye(3),
                               atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(r[:3, :3]), 1.0, atol=1e-12)


def test_snr_calculators_finite():
    from dnmf_tpu.data import simulator as S

    assert np.isfinite(S.compute_snr_motion())
    pos = S.gp_motion(jax.random.PRNGKey(0), 5, 10, sigma=(1, 1, 0.01),
                      length_scale=(5, 5, 5), size=(20, 20, 2))
    assert np.isfinite(S.compute_snr_positions(np.asarray(pos)))


def test_gp_time_motion_is_smooth():
    """'gpt' trajectories are temporally smooth (unlike the reference's
    white-in-time 'gp' model)."""
    pos_t = simulator.gp_time_motion(
        jax.random.PRNGKey(0), 6, 80, sigma=(2.0, 2.0, 0.05),
        length_scale=10.0, size=(30, 30, 2),
    )
    assert pos_t.shape == (6, 3, 80)
    p = np.asarray(pos_t)
    step = np.abs(np.diff(p[:, 0, :], axis=1)).mean()
    amplitude = (p[:, 0, :] - p[:, 0, :].mean(1, keepdims=True)).std()
    assert step < 0.3 * amplitude  # steps much smaller than excursions

    cfg = SimulatorConfig(num_neurons=3, num_frames=10, size=(16, 16, 2),
                          motion="gpt", gp_sigma=(1.0, 1.0, 0.01))
    video, positions, traces = simulator.generate_video(cfg)
    assert video.shape == (10, 16, 16, 2)
