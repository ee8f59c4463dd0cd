"""Closed-form Grams vs the exact pixel-reduction oracle.

``ops/gram_analytic.py`` replaces the O(P K^2) Gram einsum
(``/root/reference/Demix/dNMF.py:141``) with an O(K^2) closed form;
these tests pin its error envelope against the exact XLA path (which is
itself reference-parity-gated) and gate the production integration
(``gram_mode="analytic"``), including the c1-only Pallas companion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnmf_tpu.config import ModelConfig, OptimizerConfig
from dnmf_tpu.models import dnmf as M
from dnmf_tpu.ops import mu as mu_ops
from dnmf_tpu.ops.gram_analytic import analytic_grams, default_window


def _exact_grams(state, video, model):
    return M.compute_grams(state, video, model, frame_block=4,
                           use_pallas=False)


def _setup(size, k, t, sigma, seed=0, interior_margin=None):
    rng = np.random.default_rng(seed)
    model = ModelConfig(size=size, num_neurons=k, num_frames=t,
                        shape_std=sigma)
    optimizer = M.make_motion_optimizer(OptimizerConfig())
    margin = (interior_margin if interior_margin is not None
              else [0.0, 0.0, 0.0])
    pos = np.stack([
        rng.uniform(margin[d], size[d] - 1.0 - margin[d], k)
        for d in range(3)
    ], axis=1).astype(np.float32)
    state = M.init_state(model, optimizer, positions=jnp.asarray(pos),
                         key=jax.random.PRNGKey(seed))
    video = jax.random.uniform(
        jax.random.PRNGKey(seed + 1),
        (t, size[0] * size[1] * size[2]))
    return model, state, video


def _warped_betas(state, rng, scale):
    betas = np.asarray(state.beta).copy()
    betas += rng.normal(0, scale, betas.shape).astype(np.float32)
    return state._replace(beta=jnp.asarray(betas))


def _rel_err(got, ref):
    ref = np.asarray(ref)
    scale = np.abs(ref).max()
    return np.abs(np.asarray(got) - ref).max() / scale


def test_identity_warp_matches_exact_everywhere(rng):
    """Identity warp: the per-axis lattice sums are exact (J = I, no
    linearization), including border neurons and the border fade."""
    model, state, video = _setup((20, 18, 8), k=7, t=2, sigma=2.0)
    g_ref, _ = _exact_grams(state, video, model)
    g = analytic_grams(state.beta, state.pos, state.sigma, model.size,
                       window=default_window(2.0))
    assert _rel_err(g, g_ref) < 2e-5


def test_thin_z_axis_exact(rng):
    """Demo-scale z=2 volumes: the windowed lattice sum covers the two
    real planes exactly (a continuum integral would not)."""
    model, state, video = _setup((24, 20, 2), k=6, t=2, sigma=2.5,
                                 seed=3)
    g_ref, _ = _exact_grams(state, video, model)
    g = analytic_grams(state.beta, state.pos, state.sigma, model.size,
                       window=default_window(2.5))
    assert _rel_err(g, g_ref) < 2e-5


def test_off_lattice_anchor_thin_z(rng):
    """Anchors drifted PAST a thin-z face under a quadratic warp — the
    regime that broke the single-line expansion (tpu_smoke round 3:
    33% max Gram error on 96x64x2 with anchors 2.4-3.5 px beyond the
    z face).  Pins the two fixes: the per-axis expansion re-centers on
    the volume-clamped inverse point, and thin axes (<= plane_axis_max
    planes) decompose exactly so cross-warp variation between planes
    is carried."""
    np_rng = np.random.default_rng(17)
    model, state, video = _setup((48, 32, 2), k=10, t=2, sigma=3.0,
                                 seed=9)
    pos = np.asarray(state.pos).copy()
    pos[:, 2] = np_rng.uniform(3.0, 4.5, pos.shape[0])  # z face is 1.0
    state = state._replace(pos=jnp.asarray(pos.astype(np.float32)))
    state = _warped_betas(state, np_rng, 0.002)
    g_ref, _ = _exact_grams(state, video, model)
    g = analytic_grams(state.beta, state.pos, state.sigma, model.size,
                       window=default_window(3.0))
    scale = float(np.abs(np.asarray(g_ref)).max())
    assert np.abs(np.asarray(g) - np.asarray(g_ref)).max() < 2e-3 * scale


def test_plane_decomposition_matches_separable_when_interior(rng):
    """On a thick-z volume the plane-decomposed path never triggers;
    force it via plane_axis_max and check it agrees with the separable
    path at interior anchors (same expansion, summed differently)."""
    model, state, video = _setup((20, 18, 4), k=6, t=2, sigma=2.0,
                                 seed=13, interior_margin=[3.0, 3.0, 0.0])
    np_rng = np.random.default_rng(13)
    state = _warped_betas(state, np_rng, 0.002)
    g_sep = analytic_grams(state.beta, state.pos, state.sigma,
                           model.size, window=default_window(2.0),
                           plane_axis_max=0)
    g_pln = analytic_grams(state.beta, state.pos, state.sigma,
                           model.size, window=default_window(2.0),
                           plane_axis_max=4)
    assert _rel_err(g_pln, g_sep) < 2e-3


def test_mixed_sigma_exact(rng):
    model, state, video = _setup((20, 18, 6), k=6, t=2, sigma=2.0,
                                 seed=5)
    sig = jnp.asarray(
        np.linspace(1.2, 3.0, 6).astype(np.float32))
    state = state._replace(sigma=sig)
    g_ref, _ = _exact_grams(state, video, model)
    g = analytic_grams(state.beta, state.pos, sig, model.size,
                       window=default_window(3.0))
    assert _rel_err(g, g_ref) < 2e-5


@pytest.mark.parametrize("scale,tol", [(0.01, 2e-3), (0.03, 1e-2)])
def test_quadratic_warp_error_envelope(rng, scale, tol):
    """Random quadratic warps at (and beyond) realistic magnitude: the
    linearized-J factorization error stays inside the envelope MU is
    insensitive to (the exact kernel's bf16-split already carries
    ~3e-6; trace recovery tolerates 1e-2 — see the MU test below)."""
    np_rng = np.random.default_rng(11)
    model, state, video = _setup((20, 18, 8), k=7, t=4, sigma=2.0,
                                 seed=7, interior_margin=[4.0, 4.0, 2.0])
    state = _warped_betas(state, np_rng, scale)
    g_ref, _ = _exact_grams(state, video, model)
    g = analytic_grams(state.beta, state.pos, state.sigma, model.size,
                       window=default_window(2.0))
    assert _rel_err(g, g_ref) < tol


def test_compute_grams_analytic_mode_xla(rng):
    """gram_mode='analytic' through the production entry: c1 must equal
    the exact path's bitwise-ish; G within the analytic envelope."""
    np_rng = np.random.default_rng(13)
    model, state, video = _setup((16, 14, 6), k=5, t=6, sigma=2.0,
                                 seed=9)
    state = _warped_betas(state, np_rng, 0.01)
    g_ref, c1_ref = _exact_grams(state, video, model)
    g, c1 = M.compute_grams(state, video, model, frame_block=4,
                            use_pallas=False, gram_mode="analytic")
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c1_ref),
                               rtol=1e-5, atol=1e-7)
    # Border-hugging neurons + cross-quadratic terms: the documented
    # worst regime of the separable form (~8e-3 at 0.03-coefficient
    # scale; here 0.01).
    assert _rel_err(g, g_ref) < 2e-2


def test_compute_grams_analytic_mode_pallas(rng):
    """The pallas analytic branch (c1_block_culled + closed-form G),
    interpret mode."""
    np_rng = np.random.default_rng(17)
    model, state, video = _setup((16, 14, 6), k=5, t=6, sigma=2.0,
                                 seed=15)
    state = _warped_betas(state, np_rng, 0.01)
    g_x, c1_x = M.compute_grams(state, video, model, frame_block=4,
                                use_pallas=False, gram_mode="analytic")
    g_p, c1_p = M.compute_grams(state, video, model, frame_block=4,
                                use_pallas=True, pallas_interpret=True,
                                gram_mode="analytic")
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(c1_p), np.asarray(c1_x),
                               rtol=1e-4, atol=1e-6)


def test_c1_block_culled_matches_gram_block(rng):
    """The c1-only kernel must reproduce gram_block_culled's c1 exactly
    (same body, pair dots skipped)."""
    from dnmf_tpu.ops import pallas_culled as pc

    size = (14, 12, 4)
    b, k = 3, 12
    p = int(np.prod(size))
    np_rng = np.random.default_rng(19)
    betas = np.zeros((b, 10, 3), dtype=np.float32)
    betas[:, 1, 0] = betas[:, 2, 1] = betas[:, 3, 2] = 1.0
    betas += np_rng.normal(0, 0.01, betas.shape).astype(np.float32)
    pos = np.stack([np_rng.uniform(1, s - 1.0, k) for s in size],
                   axis=1).astype(np.float32)
    sigma = np.full((k,), 1.5, dtype=np.float32)
    y = np_rng.random((b, p), dtype=np.float32)
    args = (jnp.asarray(betas), jnp.asarray(pos), jnp.asarray(sigma),
            jnp.asarray(y), size)
    _, c1_ref = pc.gram_block_culled(*args, kblock=8, tile_p=64,
                                     dot_mode="split",
                                     frames_per_step=2, interpret=True)
    c1 = pc.c1_block_culled(*args, kblock=8, tile_p=64,
                            dot_mode="split", frames_per_step=2,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c1_ref),
                               rtol=1e-6, atol=1e-8)
    # The manually-pipelined impl must match bit-for-bit-ish too.
    c1_pipe = pc.c1_block_culled(*args, kblock=8, tile_p=64,
                                 dot_mode="split", frames_per_step=2,
                                 impl="pipelined", nbuf=2,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(c1_pipe), np.asarray(c1),
                               rtol=1e-6, atol=1e-8)
    # Tracked (per-frame positions) through both impls.
    pos_t = jnp.asarray(
        np.stack([pos + np_rng.normal(0, 0.3, pos.shape)
                  .astype(np.float32) for _ in range(b)]))
    _, c1t_ref = pc.gram_block_tracked(
        args[0], pos_t, args[2], args[3], size, kblock=8, tile_p=64,
        dot_mode="split", frames_per_step=2, interpret=True)
    for impl, nbuf in (("grid", 4), ("pipelined", 3)):
        c1t = pc.c1_block_culled(
            args[0], pos_t, args[2], args[3], size, kblock=8,
            tile_p=64, dot_mode="split", frames_per_step=2, impl=impl,
            nbuf=nbuf, interpret=True)
        np.testing.assert_allclose(np.asarray(c1t),
                                   np.asarray(c1t_ref),
                                   rtol=1e-6, atol=1e-8)


def test_mu_insensitive_to_analytic_grams(rng):
    """MU fixed points with analytic vs exact Grams agree to ~1e-3 —
    the envelope that makes the closed form a drop-in fast mode."""
    np_rng = np.random.default_rng(23)
    model, state, video = _setup((16, 14, 6), k=5, t=8, sigma=2.0,
                                 seed=21)
    state = _warped_betas(state, np_rng, 0.01)
    g_ref, c1_ref = _exact_grams(state, video, model)
    g_an, c1_an = M.compute_grams(state, video, model, frame_block=4,
                                  use_pallas=False,
                                  gram_mode="analytic")
    c0 = state.c
    c_ref = mu_ops.run_mu_temporal(c0, g_ref, c1_ref, iters=50)
    c_an = mu_ops.run_mu_temporal(c0, g_an, c1_an, iters=50)
    denom = np.abs(np.asarray(c_ref)).max()
    assert np.abs(np.asarray(c_an) - np.asarray(c_ref)).max() / denom \
        < 1e-2


def test_sharded_analytic_grams_match_single_device(rng):
    """Time-sharded analytic Grams: zero-communication per shard; must
    equal the single-device analytic result."""
    from dnmf_tpu.parallel import (
        make_mesh,
        shard_state,
        shard_video,
        sharded_compute_grams,
    )

    np_rng = np.random.default_rng(31)
    model, state, video = _setup((16, 14, 6), k=5, t=16, sigma=2.0,
                                 seed=33)
    state = _warped_betas(state, np_rng, 0.01)
    g1, c11 = M.compute_grams(state, video, model, frame_block=4,
                              use_pallas=False, gram_mode="analytic")
    mesh = make_mesh(num_time=8)
    g8, c18 = sharded_compute_grams(
        shard_state(state, mesh), shard_video(video, mesh), model,
        mesh=mesh, frame_block=2, gram_mode="analytic")
    np.testing.assert_allclose(np.asarray(g8), np.asarray(g1),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(c18), np.asarray(c11),
                               rtol=1e-5, atol=1e-7)


def test_sharded_analytic_rejects_pixel_mesh(rng):
    from dnmf_tpu.parallel import (
        make_mesh,
        shard_state,
        shard_video,
        sharded_compute_grams,
    )

    model, state, video = _setup((16, 16, 2), k=4, t=8, sigma=2.0,
                                 seed=35)
    mesh = make_mesh(num_time=2, num_pixel=4)
    with pytest.raises(ValueError, match="pixel"):
        sharded_compute_grams(
            shard_state(state, mesh), shard_video(video, mesh), model,
            mesh=mesh, frame_block=2, gram_mode="analytic")


def test_tracked_grams_analytic_mode(rng):
    """Per-frame-position (refinement phase) analytic Grams, XLA and
    Pallas-interpret branches vs the exact tracked path."""
    from dnmf_tpu.models.refine import tracked_grams

    np_rng = np.random.default_rng(41)
    model, state, video = _setup((16, 14, 6), k=5, t=6, sigma=2.0,
                                 seed=43)
    state = _warped_betas(state, np_rng, 0.01)
    t = video.shape[0]
    pos_t = (jnp.broadcast_to(state.pos[None], (t,) + state.pos.shape)
             + jnp.asarray(np_rng.normal(0, 0.5, (t,) + state.pos.shape)
                           .astype(np.float32)))
    g_ref, c1_ref = tracked_grams(state, pos_t, video, model,
                                  frame_block=3)
    g_x, c1_x = tracked_grams(state, pos_t, video, model, frame_block=3,
                              gram_mode="analytic")
    np.testing.assert_allclose(np.asarray(c1_x), np.asarray(c1_ref),
                               rtol=1e-5, atol=1e-7)
    assert _rel_err(g_x, g_ref) < 2e-2
    g_p, c1_p = tracked_grams(state, pos_t, video, model, frame_block=3,
                              use_pallas=True, pallas_interpret=True,
                              gram_mode="analytic")
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(c1_p), np.asarray(c1_x),
                               rtol=1e-4, atol=1e-6)


def test_whole_brain_like_regime(rng):
    """Realistic regime check: sigma=3, whole-brain-like cumulative
    random-walk quadratic warps (the wb_recovery fixture's generator
    parameters, ~several px drift), mid-scale volume.  The closed form
    must stay well inside MU sensitivity here — this is the regime the
    config-3/4 speedup claims live in."""
    from dnmf_tpu.ops import basis as B

    size, k, t, sigma = (96, 96, 12), 40, 8, 3.0
    model, state, video = _setup(size, k=k, t=t, sigma=sigma, seed=61,
                                 interior_margin=[6.0, 6.0, 2.0])
    key = jax.random.PRNGKey(7)
    steps = jax.random.normal(key, (t, 10, 3)) * 0.002
    steps = steps.at[:, 4:, :].mul(0.25)
    steps = steps.at[0].set(0.0)
    betas_gt = B.identity_beta(t) + jnp.cumsum(steps, axis=0) * 3.0
    # *3 compresses a full T=64 recording's drift into 8 test frames
    # (random walk: sqrt(64/8) ~= 2.8).  Measured: 9e-5 at 1x drift,
    # 6e-4 here — MU-negligible in the regime the config-3/4 claims
    # live in (8x the drift reaches ~1.4%, still within MU tolerance).
    state = state._replace(beta=betas_gt)
    g_ref, _ = _exact_grams(state, video, model)
    g = analytic_grams(state.beta, state.pos, state.sigma, model.size,
                       window=default_window(sigma))
    assert _rel_err(g, g_ref) < 2e-3


def test_gram_window_covers_annealed_sigma(rng):
    """Regression: the window must be sized for the ACTUAL sigma, not
    model.shape_std — an annealed sigma (sigma_anneal scales it up)
    silently truncated the pair Gaussian with the default window."""
    from dnmf_tpu.ops.gram_analytic import default_window

    model, state, video = _setup((24, 20, 8), k=5, t=2, sigma=1.5,
                                 seed=51)
    big = jnp.full((5,), 4.5, jnp.float32)  # 3x the model's shape_std
    state = state._replace(sigma=big)
    g_ref, _ = _exact_grams(state, video, model)
    # Default window (sized for shape_std=1.5) truncates ...
    g_small, _ = M.compute_grams(state, video, model, frame_block=2,
                                 use_pallas=False,
                                 gram_mode="analytic")
    assert _rel_err(g_small, g_ref) > 1e-3
    # ... an explicit bound restores exactness (identity warp).
    g_wide, _ = M.compute_grams(state, video, model, frame_block=2,
                                use_pallas=False, gram_mode="analytic",
                                gram_window=default_window(4.5))
    assert _rel_err(g_wide, g_ref) < 2e-5


def test_trainer_gram_window_accounts_for_anneal(rng):
    from dnmf_tpu.config import (ModelConfig, OptimizerConfig,
                                 RuntimeConfig)
    from dnmf_tpu.engine.trainer import DeformableNMF
    from dnmf_tpu.ops.gram_analytic import default_window

    model = ModelConfig(size=(12, 10, 4), num_neurons=4, num_frames=4,
                        shape_std=2.0)
    eng = DeformableNMF(
        model, OptimizerConfig(sigma_anneal=(3.0, 2.0, 1.0)),
        runtime=RuntimeConfig(gram_mode="analytic"))
    assert eng._gram_window() == default_window(6.0)
    eng2 = DeformableNMF(model, OptimizerConfig(),
                         runtime=RuntimeConfig(gram_mode="exact"))
    assert eng2._gram_window() is None


def test_tracked_grams_rejects_unknown_mode(rng):
    from dnmf_tpu.models.refine import tracked_grams

    model, state, video = _setup((12, 10, 4), k=4, t=4, sigma=2.0)
    pos_t = jnp.broadcast_to(state.pos[None], (4,) + state.pos.shape)
    with pytest.raises(ValueError, match="gram_mode"):
        tracked_grams(state, pos_t, video, model,
                      gram_mode="analytical")


def test_refined_rounds_threads_gram_mode(rng):
    """gram_mode='analytic' must actually reach the refinement phase's
    tracked Grams (it was silently ignored)."""
    from dnmf_tpu.models.refine import refined_rounds

    np_rng = np.random.default_rng(53)
    model, state, video = _setup((16, 14, 6), k=5, t=6, sigma=2.0,
                                 seed=55)
    state = _warped_betas(state, np_rng, 0.01)
    st_e, _, _ = refined_rounds(state, video, model, rounds=1,
                                epochs=3, mu_iters=10, frame_block=3)
    st_a, _, _ = refined_rounds(state, video, model, rounds=1,
                                epochs=3, mu_iters=10, frame_block=3,
                                gram_mode="analytic")
    denom = np.abs(np.asarray(st_e.c)).max()
    dc = np.abs(np.asarray(st_a.c) - np.asarray(st_e.c)).max() / denom
    assert 0 < dc < 1e-2  # different G source, same fixed point scale


def test_batched_round_analytic_matches_per_recording(rng):
    """config-5 vmapped rounds with analytic Grams == per-recording
    analytic rounds (closes the batched-path threading)."""
    from dnmf_tpu.parallel.batched import (
        batched_round,
        stack_states,
        unstack_states,
    )

    model, state0, video0 = _setup((16, 14, 4), k=4, t=8, sigma=2.0,
                                   seed=71)
    from dnmf_tpu.config import OptimizerConfig
    optimizer = M.make_motion_optimizer(OptimizerConfig(
        learning_rate=1e-3))
    state1 = M.init_state(model, optimizer,
                          positions=state0.pos + 0.5,
                          key=jax.random.PRNGKey(72))
    video1 = jax.random.uniform(jax.random.PRNGKey(73), video0.shape)

    batched = stack_states([state0, state1])
    videos = jnp.stack([video0, video1])
    new_batched, _ = batched_round(
        batched, videos, model, optimizer, gamma=0.1, mu_iters=5,
        frame_block=4, gram_mode="analytic")
    outs = unstack_states(new_batched)
    for st, vid, out in ((state0, video0, outs[0]),
                         (state1, video1, outs[1])):
        st_m, _ = M.motion_epoch_parallel(st, vid, model, optimizer,
                                          0.1, frame_block=4)
        g, c1 = M.compute_grams(st_m, vid, model, frame_block=4,
                                gram_mode="analytic")
        ref = M.footprint_update(st_m, g, c1, iters=5)
        np.testing.assert_allclose(np.asarray(out.c),
                                   np.asarray(ref.c),
                                   rtol=1e-5, atol=1e-7)


def test_analytic_mode_rejects_pixel_sharding(rng):
    model, state, video = _setup((16, 14, 6), k=5, t=4, sigma=2.0)
    with pytest.raises(ValueError, match="pixel"):
        M.grams_local(state, video, model, 4, gram_mode="analytic",
                      p_offset=jnp.zeros((), jnp.int32))


def test_fused_rounds_analytic_mode(rng):
    """End-to-end alternation with gram_mode='analytic' tracks the
    exact mode's iterates."""
    model, state, video = _setup((16, 14, 6), k=5, t=8, sigma=2.0,
                                 seed=29)
    optimizer = M.make_motion_optimizer(OptimizerConfig(
        learning_rate=1e-3))
    kw = dict(rounds=2, epochs=2, mu_iters=20, gamma=0.1,
              frame_block=4)
    st_e, _ = M.fused_rounds(state, video, model, optimizer, **kw)
    st_a, _ = M.fused_rounds(state, video, model, optimizer,
                             gram_mode="analytic", **kw)
    # Round-2 beta sees round-1's C (fit on the analytic Grams), so the
    # iterates drift at the Gram-error scale rather than matching
    # bitwise.
    np.testing.assert_allclose(np.asarray(st_a.beta),
                               np.asarray(st_e.beta), atol=1e-4)
    denom = np.abs(np.asarray(st_e.c)).max()
    assert (np.abs(np.asarray(st_a.c) - np.asarray(st_e.c)).max()
            / denom) < 5e-3


def test_adversarial_error_sweep(rng):
    """VERDICT r3 #1: adversarial error sweep gating the production
    default.  Border-hugging anchors, strong shear, cross-quadratic
    warps, annealed (2.5x) sigma, and a large-K regime must all stay
    inside the trust-gate tolerance (RuntimeConfig.gram_trust_tol's
    default 0.02) against the exact pixel reduction."""
    np_rng = np.random.default_rng(23)
    tol = 0.02

    def check(name, size, k, sigma, beta_edit=None, sigma_mult=1.0,
              margin=(0.0, 0.0, 0.0), seed=0, tol=tol, aniso=None):
        model, state, video = _setup(size, k=k, t=2, sigma=sigma,
                                     seed=seed,
                                     interior_margin=list(margin))
        if aniso is not None:
            # Per-axis [K, 3] widths drawn from per-axis ranges.
            s = np.stack([np_rng.uniform(lo, hi, k)
                          for (lo, hi) in aniso], axis=1)
            state = state._replace(sigma=jnp.asarray(
                s.astype(np.float32)))
        if sigma_mult != 1.0:
            state = state._replace(sigma=state.sigma * sigma_mult)
        betas = np.asarray(state.beta).copy()
        # a realistic random warp on top of each adversarial component
        betas += np_rng.normal(0, 0.005, betas.shape).astype(np.float32)
        if beta_edit is not None:
            for t_i in range(betas.shape[0]):
                beta_edit(betas[t_i])
        state = state._replace(beta=jnp.asarray(betas))
        g_ref, _ = _exact_grams(state, video, model)
        g = analytic_grams(
            state.beta, state.pos, state.sigma, model.size,
            window=default_window(float(np.max(np.asarray(state.sigma)))))
        err = _rel_err(g, g_ref)
        assert err < tol, f"{name}: rel err {err:.3e} >= {tol}"
        return err

    # Border-hugging neurons (margin 0 => anchors down to the faces).
    check("border", (20, 18, 8), k=12, sigma=2.0, margin=(0, 0, 0))

    # Strong constant shear (eps=0.03 normalized; error ~ eps^2).
    def shear(b):
        b[2, 0] += 0.03   # y -> x
        b[1, 1] -= 0.03   # x -> y
        b[3, 0] += 0.02   # z -> x
    check("shear", (20, 18, 8), k=10, sigma=2.0, beta_edit=shear,
          margin=(3, 3, 2))

    # Cross-quadratic warp terms (the closed form's dominant residual).
    def crossq(b):
        b[7, 0] += 0.03   # xy -> x
        b[8, 1] += 0.03   # xz -> y
        b[9, 2] += 0.02   # yz -> z
    check("cross-quadratic", (20, 18, 8), k=10, sigma=2.0,
          beta_edit=crossq, margin=(3, 3, 2))

    # Cross-quadratic AND border-hugging (worst measured regime).
    check("cross-quadratic+border", (20, 18, 8), k=12, sigma=2.0,
          beta_edit=crossq, margin=(0, 0, 0))

    # Annealed sigma (sigma_anneal's 2.5x wide phase).
    check("annealed-sigma", (24, 20, 8), k=8, sigma=2.0, sigma_mult=2.5,
          margin=(2, 2, 1))

    # Large-K regime (config-4 scale neuron count at test volume).
    check("K=500", (20, 18, 8), k=500, sigma=2.0, margin=(1, 1, 1),
          seed=3)

    # Anisotropic [K, 3] widths (VERDICT r4 #8: the per-axis closed
    # form must hold the same envelope).  Thin-z widths down to 0.5 px
    # stress the plane-decomposition branch per axis independently.
    check("aniso+border", (20, 18, 8), k=12, sigma=2.0,
          margin=(0, 0, 0),
          aniso=((1.5, 3.0), (1.5, 3.0), (0.5, 1.2)))
    check("aniso+cross-quadratic", (20, 18, 8), k=10, sigma=2.0,
          beta_edit=crossq, margin=(3, 3, 2),
          aniso=((1.2, 2.8), (1.2, 2.8), (0.6, 1.5)))
    check("aniso+annealed", (24, 20, 8), k=8, sigma=2.0,
          sigma_mult=2.5, margin=(2, 2, 1),
          aniso=((1.2, 2.2), (1.2, 2.2), (0.6, 1.0)))


def test_trust_audit_helper_picks_worst_frame(rng):
    """audit_analytic_gram audits the frame whose beta deviates most
    from the identity (where the closed form's residual peaks)."""
    from dnmf_tpu.engine.trainer import audit_analytic_gram

    model, state, _ = _setup((16, 14, 6), k=5, t=4, sigma=2.0)
    betas = np.asarray(state.beta).copy()
    betas[2] += np.float32(0.05)  # frame 2 carries the strongest warp
    state = state._replace(beta=jnp.asarray(betas))
    audit = audit_analytic_gram(state, model)
    assert audit["frame"] == 2
    # 0.05 on EVERY coefficient (cross-quadratics included, border
    # anchors) is outside the closed form's regime — the audit must
    # flag it above the default trust tolerance, and a realistic warp
    # must pass.
    assert audit["rel_err"] > 0.02
    betas[2] = betas[0] + np.float32(0.01)
    state = state._replace(beta=jnp.asarray(betas))
    assert audit_analytic_gram(state, model)["rel_err"] < 0.02
