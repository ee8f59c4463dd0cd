"""End-to-end engine tests on tiny simulated fixtures (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnmf_tpu.config import (
    DeformationConfig,
    ModelConfig,
    OptimizerConfig,
    RuntimeConfig,
    SimulatorConfig,
)
from dnmf_tpu.data.datasets import SimulatedVideoDataset
from dnmf_tpu.engine import DeformableNMF
from dnmf_tpu.utils.metrics import trace_correlations

SIZE = (16, 16, 2)
K, T = 4, 10


class _HandPlacedDataset:
    """Well-separated neurons with optional smooth drift — a controlled
    fixture so recovery thresholds are meaningful (random anchors can put
    neurons ~2 px apart, where trace mixing is expected)."""

    def __init__(self, drift=0.0):
        from dnmf_tpu.data import simulator

        base = jnp.asarray(
            [[4.0, 4.0, 1.0], [11.0, 4.0, 1.0],
             [4.0, 11.0, 1.0], [11.0, 11.0, 1.0]]
        )
        tt = jnp.arange(T, dtype=jnp.float32)
        dx = drift * jnp.sin(2 * jnp.pi * tt / T)
        dy = drift * jnp.cos(2 * jnp.pi * tt / T)
        offsets = jnp.stack([dx, dy, jnp.zeros_like(tt)], axis=0)  # [3, T]
        self.positions = base[:, :, None] + offsets[None]
        self.traces = simulator.exponential_traces(
            jax.random.PRNGKey(7), K, T, density=0.3
        )
        video = simulator.render_video(
            self.positions, self.traces, SIZE, shape_std=2.0
        )
        self.video = jnp.maximum(video / jnp.max(video), 0.0)

    def frames_flat(self):
        return self.video.reshape(self.video.shape[0], -1)


def _dataset(drift=0.0):
    return _HandPlacedDataset(drift=drift)


def _engine(ds, motion_mode="parallel", footprint_mode="analytic",
            lr=1e-3):
    model = ModelConfig(
        size=SIZE, num_neurons=K, num_frames=T, shape_std=2.0,
        deformation=DeformationConfig(footprint_mode=footprint_mode),
    )
    opt = OptimizerConfig(
        learning_rate=lr, batch_size=4, motion_epochs=3, mu_iters=30,
        gamma_motion=0.1, motion_mode=motion_mode,
    )
    return DeformableNMF(
        model, opt, RuntimeConfig(frame_block=4),
        positions=ds.positions[:, :, 0],
    )


def test_trace_recovery_static_positions():
    ds = _dataset()
    eng = _engine(ds)
    eng.update_footprints(ds, iters=50)
    corr = trace_correlations(eng.traces, np.asarray(ds.traces))
    assert np.all(corr > 0.8), corr


def test_trace_recovery_fista_solver():
    """trace_solver='fista' recovers at least as well as MU at the same
    iteration budget, through the engine surface (single device)."""
    import dataclasses

    ds = _dataset()
    eng = _engine(ds)
    eng.opt_config = dataclasses.replace(eng.opt_config,
                                         trace_solver="fista")
    eng.update_footprints(ds, iters=50)
    corr_f = trace_correlations(eng.traces, np.asarray(ds.traces))

    eng_mu = _engine(ds)
    eng_mu.update_footprints(ds, iters=50)
    corr_mu = trace_correlations(eng_mu.traces, np.asarray(ds.traces))
    assert np.all(corr_f > 0.8), corr_f
    assert np.min(corr_f) >= np.min(corr_mu) - 1e-3, (corr_f, corr_mu)


def test_motion_fit_reduces_loss_parallel():
    ds = _dataset(drift=1.0)
    eng = _engine(ds)
    eng.update_footprints(ds, iters=30)
    first = eng.update_motion(ds, epochs=1)["recon_mse"]
    for _ in range(4):
        last = eng.update_motion(ds, epochs=5)["recon_mse"]
    assert last < first, (first, last)
    assert np.isfinite(last)


def test_motion_fit_parity_mode_runs_and_reduces_loss():
    ds = _dataset(drift=1.0)
    eng = _engine(ds, motion_mode="parity")
    eng.update_footprints(ds, iters=30)
    first = eng.update_motion(ds, epochs=1)["recon_mse"]
    for _ in range(3):
        last = eng.update_motion(ds, epochs=5)["recon_mse"]
    assert last < first
    assert np.isfinite(last)


def test_resample_mode_close_to_analytic():
    ds = _dataset()
    eng_a = _engine(ds, footprint_mode="analytic")
    eng_r = _engine(ds, footprint_mode="resample")
    eng_a.update_footprints(ds, iters=20)
    eng_r.update_footprints(ds, iters=20)
    # Identity deformation: resampled == analytic exactly on lattice points,
    # so traces should agree tightly.
    np.testing.assert_allclose(eng_a.traces, eng_r.traces, rtol=1e-3,
                               atol=1e-5)


def test_full_fit_improves_traces():
    ds = _dataset(drift=0.8)
    eng = _engine(ds)
    result = eng.fit(ds, rounds=2)
    corr = trace_correlations(result.traces, np.asarray(ds.traces))
    assert np.all(corr > 0.7), corr
    phases = {m["phase"] for m in result.metrics}
    # gram_audit: the once-per-fit analytic-Gram trust gate (the
    # default gram_mode="auto" resolves to analytic here).
    assert phases == {"motion", "traces", "round", "gram_audit"}
    audit = [m for m in result.metrics if m["phase"] == "gram_audit"]
    assert len(audit) == 1 and audit[0]["rel_err"] < audit[0]["tol"]


def test_checkpoint_roundtrip(tmp_path):
    ds = _dataset()
    eng = _engine(ds)
    eng.update_footprints(ds, iters=10)
    eng.update_motion(ds, epochs=2)
    path = str(tmp_path / "ckpt")
    eng.save(path)
    eng2 = _engine(ds)
    eng2.restore(path)
    np.testing.assert_array_equal(
        np.asarray(eng.state.beta), np.asarray(eng2.state.beta)
    )
    np.testing.assert_array_equal(
        np.asarray(eng.state.c), np.asarray(eng2.state.c)
    )


def test_checkpoint_roundtrip_with_refined_positions(tmp_path):
    """pos_t (the refinement polish) is a first-class pipeline product;
    save/restore must carry it, and checkpoints written before refine
    still restore into a fresh trainer."""
    import jax.numpy as jnp

    ds = _dataset()
    eng = _engine(ds)
    eng.update_footprints(ds, iters=5)
    t = eng.model.num_frames
    eng.pos_t = (jnp.broadcast_to(eng.state.pos[None],
                                  (t,) + eng.state.pos.shape) + 0.25)
    path = str(tmp_path / "ckpt_refined")
    eng.save(path)
    eng2 = _engine(ds)
    assert getattr(eng2, "pos_t", None) is None
    eng2.restore(path)
    np.testing.assert_array_equal(np.asarray(eng2.pos_t),
                                  np.asarray(eng.pos_t))
    # Pre-refine checkpoint into a trainer that has no pos_t:
    eng3 = _engine(ds)
    path2 = str(tmp_path / "ckpt_plain")
    eng3.save(path2)
    eng4 = _engine(ds)
    eng4.restore(path2)
    assert getattr(eng4, "pos_t", None) is None
    np.testing.assert_array_equal(np.asarray(eng4.state.c),
                                  np.asarray(eng3.state.c))
    # Pre-refine checkpoint into a trainer whose OWN refine ran: the
    # session's pos_t predates the restored factors and must be
    # cleared, not paired with them (stale refined trajectories).
    eng5 = _engine(ds)
    eng5.pos_t = (jnp.broadcast_to(eng5.state.pos[None],
                                   (t,) + eng5.state.pos.shape) + 2.0)
    eng5.restore(path2)
    assert getattr(eng5, "pos_t", None) is None


def test_checkpoint_restores_raw_state_format(tmp_path):
    """Checkpoints from the original save() format (the raw DNMFState
    pytree, before the {'state', 'pos_t'} payload wrapper) must keep
    restoring — a format change must not strand existing checkpoints."""
    from dnmf_tpu.utils.checkpoint import save_state

    ds = _dataset()
    eng = _engine(ds)
    eng.update_footprints(ds, iters=5)
    path = str(tmp_path / "ckpt_v1")
    save_state(path, eng.state)  # the old on-disk layout
    eng2 = _engine(ds)
    eng2.restore(path)
    assert getattr(eng2, "pos_t", None) is None
    np.testing.assert_array_equal(np.asarray(eng2.state.c),
                                  np.asarray(eng.state.c))


def test_positions_all_uses_refined_positions():
    """After refine, the trajectory inverts the per-frame refined
    anchors (pos_t), not the shared ones; the cache keys on whichever
    source is live."""
    import jax.numpy as jnp

    ds = _dataset()
    eng = _engine(ds)
    base = eng.positions_all()
    t = eng.model.num_frames
    eng.pos_t = (jnp.broadcast_to(eng.state.pos[None],
                                  (t,) + eng.state.pos.shape) + 1.5)
    refined = eng.positions_all()
    assert not np.allclose(refined, base)
    # Identity warp: inverse of (pos + 1.5) is just the shift applied.
    np.testing.assert_allclose(refined, base + 1.5, atol=1e-4)
    assert eng.positions_all() is refined  # cached on pos_t identity
    # Mutating the returned buffer must fail loudly (frozen cache).
    with pytest.raises(ValueError):
        refined[0, 0, 0] = 0.0


def test_inverse_warp_identity():
    from dnmf_tpu.ops.basis import voxel_grid
    from dnmf_tpu.ops.interp import inverse_warp_nearest

    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.normal(size=(16 * 16 * 2,)).astype(np.float32))
    psi = voxel_grid(SIZE)
    out = inverse_warp_nearest(vals, psi, SIZE)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(vals))


def test_inverse_warp_shift():
    from dnmf_tpu.ops.basis import voxel_grid
    from dnmf_tpu.ops.interp import inverse_warp_nearest

    size = (10, 10, 1)
    grid = voxel_grid(size)
    vals = jnp.arange(100, dtype=jnp.float32)
    # All content shifted by +1 in x: output at g should take the value
    # whose shifted position lands at g, i.e. from source voxel x-1.
    psi = grid + jnp.asarray([1.0, 0.0, 0.0])
    out = np.asarray(inverse_warp_nearest(vals, psi, size)).reshape(10, 10)
    ref = np.arange(100, dtype=np.float32).reshape(10, 10)
    np.testing.assert_array_equal(out[1:, :], ref[:-1, :])


def test_streaming_matches_device_resident(tmp_path):
    """Host-streamed (memmap) fit == device-resident fit."""
    import numpy as np

    from dnmf_tpu.data.streaming import StreamingVideo, open_memmap_video
    from dnmf_tpu.models import dnmf as M

    ds = _dataset(drift=0.5)
    video_np = np.asarray(ds.video, dtype=np.float32)
    path = str(tmp_path / "video.bin")
    mm = np.memmap(path, dtype=np.float32, mode="w+",
                   shape=video_np.shape)
    mm[:] = video_np
    mm.flush()

    eng_a = _engine(ds)
    eng_b = _engine(ds)
    source = open_memmap_video(path, video_np.shape, block=4)
    assert source.num_blocks() == 3  # T=10, block=4 -> padded final block

    eng_a.update_footprints(ds, iters=10)
    eng_b.update_footprints(source, iters=10)
    np.testing.assert_allclose(eng_a.traces, eng_b.traces, rtol=1e-5,
                               atol=1e-7)

    ma = eng_a.update_motion(ds, epochs=3)
    mb = eng_b.update_motion(source, epochs=3)
    np.testing.assert_allclose(
        np.asarray(eng_a.state.beta), np.asarray(eng_b.state.beta),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(ma["recon_mse"], mb["recon_mse"],
                               rtol=1e-4)


def test_static_footprint_nmf_recovers_traces():
    """The reference's dormant static-A MU mode, made functional."""
    from dnmf_tpu.engine.trainer import StaticFootprintNMF

    ds = _dataset(drift=0.0)  # static scene
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=2.0)
    eng = StaticFootprintNMF(model, ds.positions[:, :, 0])
    a, c = eng.fit(ds.video, iters=60)
    assert a.shape == (SIZE[0] * SIZE[1] * SIZE[2], K)
    assert np.all(np.asarray(a) >= 0) and np.all(np.asarray(c) >= 0)
    corr = trace_correlations(np.asarray(c), np.asarray(ds.traces))
    assert np.all(corr > 0.8), corr


def test_device_resident_video_clamped():
    """Raw arrays with negative voxels are clamped like the dataset and
    streaming paths (NMF non-negativity)."""
    ds = _dataset()
    video = np.asarray(ds.video).copy()
    video[0, :5] = -1.0
    eng = _engine(ds)
    eng.update_footprints(jnp.asarray(video), iters=20)
    assert np.all(eng.traces >= 0)


def test_clean_traces_affine_contract(rng):
    """original ~= cleaned * scales + offsets (including the 0.05 remap)."""
    from dnmf_tpu.traces import clean_traces

    x = np.arange(100)
    traces = (1.0 + 0.5 * rng.random((3, 1))) * np.exp(-0.0 * x)[None]
    traces = traces + rng.random((3, 100))
    cleaned, scales, offsets = clean_traces(
        traces, fps=4.0, sigma_threshold=None, detrend_mode=0,
        interp_method="linear",
    )
    recon = cleaned * scales[:, None] + offsets[:, None]
    ok = ~np.isnan(cleaned)
    # Edge frames are NaN-trimmed then interpolated — they never carry the
    # original values, so the affine contract applies to the interior.
    ok[:, : int(round(4.0 / 2))] = False
    ok[:, -1] = False
    np.testing.assert_allclose(recon[ok], traces[ok], rtol=1e-6, atol=1e-9)


def test_fit_fused_matches_fit():
    """One-dispatch fused alternation == the per-phase loop."""
    ds = _dataset(drift=0.5)
    eng_a = _engine(ds)
    eng_b = _engine(ds)
    eng_a.fit(ds, rounds=3)
    eng_b.fit_fused(ds, rounds=3)
    np.testing.assert_allclose(
        np.asarray(eng_b.state.beta), np.asarray(eng_a.state.beta),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(eng_b.traces, eng_a.traces, rtol=1e-4,
                               atol=1e-6)


def test_positions_all_matches_positions_at():
    """Batched trajectory readout (one jitted vmap dispatch) must equal
    the per-frame fixed-point inverse."""
    model = ModelConfig(size=(16, 16, 2), num_neurons=3, num_frames=6,
                        shape_std=2.0)
    pos = jnp.asarray([[4.0, 4.0, 1.0], [10.0, 4.0, 1.0], [7.0, 11.0, 1.0]])
    eng = DeformableNMF(model, OptimizerConfig(learning_rate=1e-3),
                        positions=pos)
    # Perturb beta so the warp is non-trivial.
    beta = eng.state.beta.at[:, 1, 0].add(
        0.05 * jnp.arange(model.num_frames))
    beta = beta.at[:, 4, 1].add(0.01)
    eng.state = eng.state._replace(beta=beta)
    batched = eng.positions_all()
    assert batched.shape == (model.num_frames, model.num_neurons, 3)
    for t in range(model.num_frames):
        np.testing.assert_allclose(eng.positions_at(t), batched[t],
                                   rtol=1e-6, atol=1e-6)


# ----------------------------------------------------------------------
# gram_mode="auto" resolution + the analytic-Gram trust gate (VERDICT
# r3 #1: the closed form is the audited production default).
# ----------------------------------------------------------------------
def _engine_rt(ds, runtime, footprint_mode="analytic"):
    model = ModelConfig(
        size=SIZE, num_neurons=K, num_frames=T, shape_std=2.0,
        deformation=DeformationConfig(footprint_mode=footprint_mode),
    )
    opt = OptimizerConfig(learning_rate=1e-3, motion_epochs=2,
                          mu_iters=10, gamma_motion=0.1)
    return DeformableNMF(model, opt, runtime,
                         positions=ds.positions[:, :, 0])


def test_gram_mode_auto_resolution():
    ds = _dataset()
    assert _engine_rt(ds, RuntimeConfig())._gram_mode == "analytic"
    assert _engine_rt(ds, RuntimeConfig(),
                      footprint_mode="resample")._gram_mode == "exact"
    # Pixel meshes reject the global closed form by design.
    eng = _engine_rt(ds, RuntimeConfig(mesh_time=1, mesh_pixel=2))
    assert eng._gram_mode == "exact"
    with pytest.raises(ValueError, match="gram_mode"):
        _engine_rt(ds, RuntimeConfig(gram_mode="bogus"))


def test_trust_audit_passes_and_records():
    ds = _dataset(drift=0.5)
    eng = _engine_rt(ds, RuntimeConfig())
    result = eng.fit(ds, rounds=2)
    audits = [m for m in result.metrics if m["phase"] == "gram_audit"]
    assert len(audits) == 1  # once per fit
    assert audits[0]["rel_err"] < audits[0]["tol"]
    assert eng._gram_mode == "analytic"
    # A second fit re-audits (beta has evolved).
    eng.fit(ds, rounds=1)
    audits = [m for m in eng.metrics if m["phase"] == "gram_audit"]
    assert len(audits) == 2


def test_trust_audit_breach_falls_back_to_exact():
    ds = _dataset(drift=0.5)
    eng = _engine_rt(ds, RuntimeConfig(gram_trust_tol=1e-12))
    with pytest.warns(RuntimeWarning, match="trust audit breached"):
        result = eng.fit(ds, rounds=2)
    assert eng._gram_mode == "exact"
    # The fallback run matches an exact-mode run factor-for-factor
    # from the audit round onward; just gate sanity here.
    assert np.isfinite(result.traces).all()


def test_trust_audit_disabled_by_none_tol():
    ds = _dataset()
    eng = _engine_rt(ds, RuntimeConfig(gram_trust_tol=None))
    result = eng.fit(ds, rounds=1)
    assert not [m for m in result.metrics if m["phase"] == "gram_audit"]
    assert eng._gram_mode == "analytic"


def test_fit_fused_audits_before_and_after():
    ds = _dataset(drift=0.5)
    eng = _engine_rt(ds, RuntimeConfig())
    result = eng.fit_fused(ds, rounds=2)
    audits = [m for m in result.metrics if m["phase"] == "gram_audit"]
    assert len(audits) == 2  # pre (mode decision) + post (witness)
    assert all(a["rel_err"] < a["tol"] for a in audits)


def test_auto_matches_explicit_analytic_factors():
    ds = _dataset(drift=0.5)
    eng_auto = _engine_rt(ds, RuntimeConfig())
    eng_an = _engine_rt(ds, RuntimeConfig(gram_mode="analytic",
                                          gram_trust_tol=None))
    r_auto = eng_auto.fit(ds, rounds=2)
    r_an = eng_an.fit(ds, rounds=2)
    np.testing.assert_allclose(r_auto.traces, r_an.traces, rtol=1e-6,
                               atol=1e-8)


def test_fit_fused_rejects_fit_sigma():
    """fit_fused cannot interleave the host-side sigma cadence — it must
    refuse rather than silently skip the width fitting."""
    ds = _dataset()
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=2.0)
    opt = OptimizerConfig(learning_rate=1e-3, motion_epochs=2,
                          mu_iters=10, fit_sigma=True)
    eng = DeformableNMF(model, opt, RuntimeConfig(frame_block=4),
                        positions=ds.positions[:, :, 0])
    with pytest.raises(ValueError, match="fit_sigma"):
        eng.fit_fused(ds, rounds=2)


def test_fit_fused_matches_fit_with_sigma_anneal():
    """Annealed rounds segment the fused schedule; factors must match
    fit()'s per-round sigma scaling (regression: anneal was ignored)."""
    ds = _dataset(drift=0.5)
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=2.0)

    def mk():
        opt = OptimizerConfig(learning_rate=1e-3, batch_size=4,
                              motion_epochs=3, mu_iters=30,
                              gamma_motion=0.1,
                              sigma_anneal=(1.5, 1.0))
        return DeformableNMF(model, opt, RuntimeConfig(frame_block=4),
                             positions=ds.positions[:, :, 0])

    eng_a, eng_b = mk(), mk()
    eng_a.fit(ds, rounds=3)
    eng_b.fit_fused(ds, rounds=3)
    np.testing.assert_allclose(
        np.asarray(eng_b.state.beta), np.asarray(eng_a.state.beta),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(eng_b.traces, eng_a.traces, rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(eng_b.state.sigma),
                               np.asarray(eng_a.state.sigma))


def test_fit_restores_base_sigma_when_anneal_covers_final_round():
    """fit() must end at the base widths even when sigma_anneal covers
    every round (regression: only fit_fused restored, so a post-fit
    refine()/trace pass silently ran at the annealed width)."""
    ds = _dataset(drift=0.5)
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=2.0)
    opt = OptimizerConfig(learning_rate=1e-3, motion_epochs=1,
                          mu_iters=5, sigma_anneal=(1.5, 1.5))
    eng = DeformableNMF(model, opt, RuntimeConfig(frame_block=4),
                        positions=ds.positions[:, :, 0])
    eng.fit(ds, rounds=2)
    np.testing.assert_allclose(np.asarray(eng.state.sigma), 2.0,
                               rtol=1e-6)
