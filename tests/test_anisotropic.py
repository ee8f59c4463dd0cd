"""Anisotropic per-neuron footprint widths (sigma [K, 3]).

BEYOND the reference's model class: its sigma is one frozen scalar
(``/root/reference/Demix/dNMF.py:29``), yet its own rotating-cell
fixture renders cells with cov diag(7, 2, ~0)
(``/root/reference/WUtils/Simulator.py:244-285``) that no isotropic
footprint represents.  Here every path — XLA footprints (both
formulations), the fused Pallas kernels, the closed-form Grams, the
sigma fit, and the trainer — takes ``[K]`` or ``[K, 3]`` natively;
these tests gate the per-axis math against f64 oracles, autodiff, and
the isotropic special case.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dnmf_tpu.config import ModelConfig, OptimizerConfig, RuntimeConfig
from dnmf_tpu.engine import DeformableNMF
from dnmf_tpu.models import dnmf as M
from dnmf_tpu.ops import basis as B
from dnmf_tpu.ops import footprints as fp
from dnmf_tpu.ops import gram_analytic as ga
from dnmf_tpu.ops import pallas_culled as pc
from dnmf_tpu.utils.metrics import trace_correlations

SIZE = (24, 20, 6)
P = SIZE[0] * SIZE[1] * SIZE[2]
K, T = 5, 16


def _aniso_fixture(seed=0):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(
        [[6.0, 6.0, 3.0], [17.0, 6.0, 2.0], [6.0, 14.0, 3.0],
         [17.0, 14.0, 3.0], [11.0, 10.0, 2.5]], jnp.float32)
    # z-flattened, m-elongated, and mixed per-axis widths.
    sigma = jnp.asarray(rng.uniform(1.2, 2.8, (K, 3)), jnp.float32)
    sigma = sigma.at[:, 2].mul(0.6)
    return pos, sigma


def _numpy_footprints(grid, pos, sigma):
    g = np.asarray(grid, np.float64)[:, None, :]
    p = np.asarray(pos, np.float64)[None, :, :]
    s = np.asarray(sigma, np.float64)[None, :, :]
    return np.exp(-np.sum((g - p) ** 2 / s**2, axis=-1))


def test_gaussian_footprints_aniso_matches_f64_oracle():
    pos, sigma = _aniso_fixture()
    grid = B.voxel_grid(SIZE)
    ours = np.asarray(fp.gaussian_footprints(grid, pos, sigma))
    oracle = _numpy_footprints(grid, pos, sigma)
    np.testing.assert_allclose(ours, oracle, atol=2e-6)


def test_evaluate_footprints_matmul_matches_direct_aniso():
    pos, sigma = _aniso_fixture()
    beta = B.identity_beta(1)[0]
    beta = beta.at[1:4, :].add(
        jax.random.normal(jax.random.PRNGKey(2), (3, 3)) * 0.01)
    vb = B.voxel_basis_normalized(SIZE)
    psi = B.warp_voxel_coords(vb, beta, SIZE, "normalized")
    a_dir = fp.evaluate_footprints(psi, pos, sigma, size=SIZE,
                                   formulation="direct")
    a_mm = fp.evaluate_footprints(psi, pos, sigma, size=SIZE,
                                  formulation="matmul")
    np.testing.assert_allclose(np.asarray(a_mm), np.asarray(a_dir),
                               atol=5e-5)


def test_aniso_reduces_to_iso_when_axes_equal():
    """[K, 3] with equal per-axis widths must match the [K] path in
    every formulation (the isotropic special case)."""
    pos, _ = _aniso_fixture()
    s_iso = jnp.asarray([1.5, 2.0, 2.5, 1.8, 2.2], jnp.float32)
    s3 = jnp.broadcast_to(s_iso[:, None], (K, 3))
    grid = B.voxel_grid(SIZE)
    np.testing.assert_allclose(
        np.asarray(fp.gaussian_footprints(grid, pos, s3)),
        np.asarray(fp.gaussian_footprints(grid, pos, s_iso)),
        atol=1e-6)


def test_analytic_gram_aniso_matches_exact():
    pos, sigma = _aniso_fixture()
    beta = B.identity_beta(1)[0]
    beta = beta.at[1:4, :].add(
        jax.random.normal(jax.random.PRNGKey(7), (3, 3)) * 0.01)
    vb = B.voxel_basis_normalized(SIZE)
    psi = B.warp_voxel_coords(vb, beta, SIZE, "normalized")
    a = fp.evaluate_footprints(psi, pos, sigma, size=SIZE,
                               mask_out_of_bounds=True)
    g_exact = np.asarray(a.T @ a)
    g_an = np.asarray(ga.analytic_gram_frame(beta, pos, sigma, SIZE,
                                             window=12))
    rel = np.max(np.abs(g_an - g_exact)) / np.max(np.abs(g_exact))
    assert rel < 2e-3, rel


def _xla_gram(beta_blk, pos, sigma, y, model):
    state = _mk_state(model, pos, sigma, beta_blk.shape[0])
    state = state._replace(beta=beta_blk)
    return M.compute_grams(state, y, model, frame_block=y.shape[0])


def _mk_state(model, pos, sigma, t):
    opt = M.make_motion_optimizer(OptimizerConfig())
    state = M.init_state(model, opt, positions=pos,
                         key=jax.random.PRNGKey(0))
    return state._replace(sigma=sigma,
                          beta=B.identity_beta(t))


def test_pallas_gram_culled_aniso_matches_xla():
    pos, sigma = _aniso_fixture()
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=4,
                        shape_std=2.0)
    betas = B.identity_beta(4)
    betas = betas.at[:, 1:4, :].add(
        jax.random.normal(jax.random.PRNGKey(3), (4, 3, 3)) * 0.01)
    y = jax.random.uniform(jax.random.PRNGKey(4), (4, P))
    g_pal, c1_pal = pc.gram_block_culled(
        betas, pos, sigma, y, SIZE, kblock=8, tile_p=512,
        interpret=True)
    state = _mk_state(model, pos, sigma, 4)._replace(beta=betas)
    g_xla, c1_xla = M.compute_grams(state, y, model, frame_block=4)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_xla),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(c1_pal), np.asarray(c1_xla),
                               rtol=2e-4, atol=2e-4)


def test_pallas_motion_culled_aniso_matches_autodiff():
    pos, sigma = _aniso_fixture()
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=2,
                        shape_std=2.0)
    betas = B.identity_beta(2)
    betas = betas.at[:, 1:4, :].add(
        jax.random.normal(jax.random.PRNGKey(3), (2, 3, 3)) * 0.01)
    y = jax.random.uniform(jax.random.PRNGKey(4), (2, P))
    c_blk = jax.random.uniform(jax.random.PRNGKey(5), (2, K)) + 0.2
    mse_pal, dbeta_pal = pc.motion_block_culled(
        betas, pos, sigma, c_blk, y, SIZE, kblock=8, tile_p=512,
        frames_per_step=2, interpret=True)

    vb = B.voxel_basis_normalized(SIZE)

    def frame_loss(beta_t, y_t, c_t):
        a = fp.evaluate_footprints(
            B.warp_voxel_coords(vb, beta_t, SIZE, "normalized"),
            pos, sigma, size=SIZE, mask_out_of_bounds=True)
        recon = jnp.dot(a, c_t, precision=jax.lax.Precision.HIGHEST)
        return jnp.mean((recon - y_t) ** 2)

    vg = jax.vmap(jax.value_and_grad(frame_loss))
    mse_xla, dbeta_xla = vg(betas, y, c_blk)
    np.testing.assert_allclose(np.asarray(mse_pal),
                               np.asarray(mse_xla), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dbeta_pal),
                               np.asarray(dbeta_xla),
                               rtol=5e-3, atol=1e-7)


def test_refine_dsigma_aniso_matches_autodiff():
    """Fused per-axis width gradient (want_dsigma, sigma [K, 3]) vs
    jax.grad of the XLA data term."""
    pos, sigma = _aniso_fixture()
    t = 2
    betas = B.identity_beta(t)
    pos_t = jnp.broadcast_to(pos[None], (t, K, 3))
    y = jax.random.uniform(jax.random.PRNGKey(4), (t, P))
    c_blk = jax.random.uniform(jax.random.PRNGKey(5), (t, K)) + 0.2
    mse, dpos, dsig = pc.refine_block_culled(
        betas, pos_t, sigma, c_blk, y, SIZE, kblock=8, tile_p=512,
        frames_per_step=2, want_dsigma=True, interpret=True)
    assert dsig.shape == (t, K, 3)

    vb = B.voxel_basis_normalized(SIZE)

    def frame_loss(sig, beta_t, y_t, c_t):
        a = fp.evaluate_footprints(
            B.warp_voxel_coords(vb, beta_t, SIZE, "normalized"),
            pos, sig, size=SIZE, mask_out_of_bounds=True)
        recon = jnp.dot(a, c_t, precision=jax.lax.Precision.HIGHEST)
        return jnp.mean((recon - y_t) ** 2)

    for fi in range(t):
        g = jax.grad(frame_loss)(sigma, betas[fi], y[fi], c_blk[fi])
        np.testing.assert_allclose(np.asarray(dsig[fi]), np.asarray(g),
                                   rtol=5e-3, atol=1e-8)


def _render_aniso_video(pos, sigma, traces):
    grid = B.voxel_grid(SIZE)
    a = fp.gaussian_footprints(grid, pos, sigma)
    video = jnp.maximum(a @ traces, 0.0).T
    video = video + 0.01 * jax.random.normal(jax.random.PRNGKey(5),
                                             video.shape)
    return jnp.maximum(video, 0.0)


def test_sigma_fit_recovers_per_axis_widths():
    from dnmf_tpu.data import simulator

    pos, sigma_gt = _aniso_fixture()
    traces = simulator.exponential_traces(jax.random.PRNGKey(3), K, T,
                                          density=0.3)
    video = _render_aniso_video(pos, sigma_gt, traces)
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=2.0, sigma_axes=3)
    opt = M.make_motion_optimizer(OptimizerConfig())
    state = M.init_state(model, opt, positions=pos,
                         key=jax.random.PRNGKey(0))
    assert state.sigma.shape == (K, 3)
    state = state._replace(c=traces)
    sigma, mses = M.sigma_fit(
        state, video, state.beta, state.c.T, model,
        steps=80, lr=0.05, lo=0.6, hi=4.0, frame_block=8)
    err = np.abs(np.asarray(sigma) - np.asarray(sigma_gt))
    assert err.max() < 0.2, (np.asarray(sigma), np.asarray(sigma_gt))
    # An isotropic fit structurally cannot reach the per-axis truth.
    s_iso, _ = M.sigma_fit(
        state._replace(sigma=jnp.full((K,), 2.0)), video, state.beta,
        state.c.T, model, steps=80, lr=0.05, lo=0.6, hi=4.0,
        frame_block=8)
    iso_err = np.abs(np.asarray(s_iso)[:, None]
                     - np.asarray(sigma_gt))
    assert err.mean() < 0.3 * iso_err.mean()


def test_sigma_fit_aniso_pallas_interpret_matches_xla():
    from dnmf_tpu.data import simulator

    pos, sigma_gt = _aniso_fixture()
    traces = simulator.exponential_traces(jax.random.PRNGKey(3), K, T,
                                          density=0.3)
    video = _render_aniso_video(pos, sigma_gt, traces)
    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=2.0, sigma_axes=3)
    opt = M.make_motion_optimizer(OptimizerConfig())
    state = M.init_state(model, opt, positions=pos,
                         key=jax.random.PRNGKey(0))
    state = state._replace(c=traces)
    kw = dict(steps=5, lr=0.05, lo=0.6, hi=4.0, frame_block=8)
    s_xla, m_xla = M.sigma_fit(state, video, state.beta, state.c.T,
                               model, **kw)
    s_pal, m_pal = M.sigma_fit(state, video, state.beta, state.c.T,
                               model, use_pallas=True,
                               pallas_interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_xla),
                               rtol=3e-4)
    np.testing.assert_allclose(np.asarray(m_pal), np.asarray(m_xla),
                               rtol=1e-4)


def test_engine_aniso_fit_beats_isotropic_on_aniso_gt():
    """End-to-end: sigma_axes=3 + fit_sigma on anisotropic ground truth
    recovers widths and traces an isotropic engine cannot."""
    from dnmf_tpu.data import simulator

    # Overlapping pair with strongly anisotropic widths: the isotropic
    # engine must misassign the border mass along the elongated axis.
    pos = jnp.asarray([[8.0, 10.0, 3.0], [15.0, 10.0, 3.0],
                       [11.5, 15.0, 2.0]], jnp.float32)
    sigma_gt = jnp.asarray([[3.0, 1.2, 1.0], [1.2, 3.0, 1.0],
                            [2.2, 2.2, 0.8]], jnp.float32)
    k, t = 3, 24
    traces = simulator.exponential_traces(jax.random.PRNGKey(3), k, t,
                                          density=0.3)
    grid = B.voxel_grid(SIZE)
    a = fp.gaussian_footprints(grid, pos, sigma_gt)
    video = jnp.maximum(a @ traces, 0.0).T
    video = jnp.maximum(
        video + 0.01 * jax.random.normal(jax.random.PRNGKey(5),
                                         video.shape), 0.0)

    def run(sigma_axes):
        model = ModelConfig(size=SIZE, num_neurons=k, num_frames=t,
                            shape_std=2.0, sigma_axes=sigma_axes)
        opt = OptimizerConfig(learning_rate=1e-3, motion_epochs=2,
                              mu_iters=30, gamma_motion=0.1,
                              fit_sigma=True, sigma_steps=20,
                              sigma_lr=0.05, sigma_frames=t,
                              sigma_every=1, sigma_bounds=(0.3, 1.8))
        eng = DeformableNMF(model, opt, RuntimeConfig(frame_block=8),
                            positions=pos)
        eng.fit(video, rounds=4)
        return eng

    eng_iso = run(1)
    eng_aniso = run(3)
    corr_iso = trace_correlations(eng_iso.traces, np.asarray(traces))
    corr_aniso = trace_correlations(eng_aniso.traces,
                                    np.asarray(traces))
    gt = np.asarray(sigma_gt)
    err_aniso = np.abs(np.asarray(eng_aniso.state.sigma) - gt).mean()
    err_iso = np.abs(np.asarray(eng_iso.state.sigma)[:, None]
                     - gt).mean()
    assert err_aniso < 0.5 * err_iso, (err_aniso, err_iso)
    assert corr_aniso.min() >= corr_iso.min() - 1e-6, (
        corr_iso, corr_aniso)
    assert eng_aniso.state.sigma.shape == (k, 3)
