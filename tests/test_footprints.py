import jax
import jax.numpy as jnp
import numpy as np

from dnmf_tpu.ops import basis, footprints


def _setup(rng, size=(8, 7, 3), k=5):
    grid = basis.voxel_grid(size)
    pos = jnp.asarray(
        rng.uniform(0, np.array(size) - 1, size=(k, 3)).astype(np.float32)
    )
    sigma = jnp.asarray(rng.uniform(1.0, 3.0, size=(k,)).astype(np.float32))
    return grid, pos, sigma


def test_gaussian_footprints_naive(rng):
    size = (8, 7, 3)
    grid, pos, sigma = _setup(rng, size)
    a = footprints.gaussian_footprints(grid, pos, sigma)
    g, p, s = map(np.asarray, (grid, pos, sigma))
    naive = np.exp(
        -((g[:, None, :] - p[None, :, :]) ** 2).sum(-1) / s[None, :] ** 2
    )
    np.testing.assert_allclose(np.asarray(a), naive, rtol=1e-5)


def test_matmul_formulation_matches_direct(rng):
    size = (8, 7, 3)
    grid, pos, sigma = _setup(rng, size)
    psi = grid + 0.3  # mildly deformed coordinates
    a_direct = footprints.evaluate_footprints(
        psi, pos, sigma, size=size, formulation="direct"
    )
    a_matmul = footprints.evaluate_footprints(
        psi, pos, sigma, size=size, formulation="matmul",
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(
        np.asarray(a_direct), np.asarray(a_matmul), rtol=2e-3, atol=1e-5
    )


def test_out_of_bounds_mask(rng):
    size = (8, 7, 3)
    grid, pos, sigma = _setup(rng, size)
    psi = grid.at[0].set(jnp.asarray([-1.0, 0.0, 0.0]))
    a = footprints.evaluate_footprints(psi, pos, sigma, size=size)
    assert np.all(np.asarray(a[0]) == 0.0)
    a2 = footprints.evaluate_footprints(
        psi, pos, sigma, size=size, mask_out_of_bounds=False
    )
    assert np.all(np.asarray(a2[0]) > 0.0)


def test_fused_reconstruction(rng):
    size = (8, 7, 3)
    grid, pos, sigma = _setup(rng, size)
    c_t = jnp.asarray(rng.uniform(size=(5,)).astype(np.float32))
    recon = footprints.fused_reconstruction(grid, pos, sigma, c_t, size=size)
    a = footprints.evaluate_footprints(grid, pos, sigma, size=size)
    np.testing.assert_allclose(
        np.asarray(recon), np.asarray(a) @ np.asarray(c_t), rtol=1e-5
    )


def test_reconstruct_frames_batched(rng):
    size = (6, 5, 2)
    k, b = 4, 3
    grid, pos, sigma = _setup(rng, size, k)
    betas = basis.identity_beta(b)
    c = jnp.asarray(rng.uniform(size=(b, k)).astype(np.float32))
    recon = footprints.reconstruct_frames(betas, c, pos, sigma, size)
    assert recon.shape == (b, 6 * 5 * 2)
    a = footprints.evaluate_footprints(grid, pos, sigma, size=size)
    for t in range(b):
        np.testing.assert_allclose(
            np.asarray(recon[t]),
            np.asarray(a) @ np.asarray(c[t]),
            rtol=1e-4, atol=1e-6,
        )
