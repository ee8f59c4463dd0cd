"""Fused Pallas kernels vs the XLA reference path (interpret mode on the
CPU mesh; compiled-mode validation happens on TPU via bench/demo)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnmf_tpu.ops import basis as B
from dnmf_tpu.ops import footprints as FP
from dnmf_tpu.ops import mu as MU
from dnmf_tpu.ops import pallas_kernels as pk

SIZE = (16, 14, 2)
K = 5
P = 16 * 14 * 2


def _setup(rng, scaling):
    pos = jnp.asarray(rng.uniform(2, 12, (K, 3)).astype(np.float32))
    sigma = jnp.asarray(rng.uniform(1.5, 3.0, (K,)).astype(np.float32))
    beta = B.identity_beta(1)[0] + 0.03 * jnp.asarray(
        rng.normal(size=(10, 3)).astype(np.float32)
    )
    y = jnp.asarray(rng.uniform(size=(P,)).astype(np.float32))
    c_t = jnp.asarray(rng.uniform(size=(K,)).astype(np.float32))
    vb = (B.voxel_basis_normalized(SIZE) if scaling == "normalized"
          else B.voxel_basis(SIZE))
    return pos, sigma, beta, y, c_t, vb


@pytest.mark.parametrize("scaling", ["pixel", "normalized"])
def test_gram_frame_matches_xla(rng, scaling):
    pos, sigma, beta, y, c_t, vb = _setup(rng, scaling)
    psi = B.warp_voxel_coords(vb, beta, SIZE, scaling)
    a = FP.evaluate_footprints(psi, pos, sigma, size=SIZE)
    g_ref, c1_ref = MU.mu_grams(a, y)
    g, c1 = pk.gram_frame(beta, pos, sigma, y, SIZE, scaling=scaling,
                          tile_p=128, interpret=True)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c1_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("scaling", ["pixel", "normalized"])
def test_motion_frame_matches_autodiff(rng, scaling):
    pos, sigma, beta, y, c_t, vb = _setup(rng, scaling)

    def loss(b):
        psi = B.warp_voxel_coords(vb, b, SIZE, scaling)
        a = FP.evaluate_footprints(psi, pos, sigma, size=SIZE)
        return jnp.mean((a @ c_t - y) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss)(beta)
    mse, dbeta = pk.motion_frame(beta, pos, sigma, c_t, y, SIZE,
                                 scaling=scaling, tile_p=128,
                                 interpret=True)
    np.testing.assert_allclose(float(mse), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dbeta), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-6)


def test_motion_frame_border_fade_gradient(rng):
    """Deformation pushing mass off the border: the fade-derivative term
    must match autodiff through the clip-based mask."""
    pos = jnp.asarray([[1.0, 7.0, 1.0], [14.0, 7.0, 0.5]])
    sigma = jnp.full((2,), 2.0)
    beta = B.identity_beta(1)[0].at[0, 0].add(-1.2)  # shift toward border
    y = jnp.asarray(rng.uniform(size=(P,)).astype(np.float32))
    c_t = jnp.asarray([0.8, 0.6])
    vb = B.voxel_basis(SIZE)

    def loss(b):
        psi = B.warp_voxel_coords(vb, b, SIZE, "pixel")
        a = FP.evaluate_footprints(psi, pos, sigma, size=SIZE)
        return jnp.mean((a @ c_t - y) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss)(beta)
    mse, dbeta = pk.motion_frame(beta, pos, sigma, c_t, y, SIZE,
                                 scaling="pixel", tile_p=128,
                                 interpret=True)
    np.testing.assert_allclose(float(mse), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dbeta), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-6)


def test_model_layer_pallas_path_matches_xla(rng):
    from dnmf_tpu.config import ModelConfig, OptimizerConfig
    from dnmf_tpu.models import dnmf as M

    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=6,
                        shape_std=2.0)
    optimizer = M.make_motion_optimizer(OptimizerConfig(learning_rate=1e-3))
    pos = jnp.asarray(rng.uniform(2, 12, (K, 3)).astype(np.float32))
    state = M.init_state(model, optimizer, positions=pos,
                         key=jax.random.PRNGKey(0))
    video = jax.random.uniform(jax.random.PRNGKey(1), (6, P))

    g_ref, c1_ref = M.compute_grams(state, video, model, frame_block=3)
    g, c1 = M.compute_grams(state, video, model, frame_block=3,
                            use_pallas=True, pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)

    st_ref, m_ref = M.motion_epoch_parallel(
        state, video, model, optimizer, gamma=0.1, frame_block=3
    )
    st_pal, m_pal = M.motion_epoch_parallel(
        state, video, model, optimizer, gamma=0.1, frame_block=3,
        use_pallas=True, pallas_interpret=True,
    )
    # Adam normalizes tiny gradient differences up to step scale, so the
    # comparison is absolute at the parity gate (1e-5), not relative.
    np.testing.assert_allclose(np.asarray(st_pal.beta),
                               np.asarray(st_ref.beta),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(float(m_pal["recon_mse"]),
                               float(m_ref["recon_mse"]), rtol=1e-5)
