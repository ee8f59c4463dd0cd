import jax.numpy as jnp
import numpy as np

from dnmf_tpu.ops import basis


def test_quadratic_basis_values():
    p = jnp.asarray([[2.0, 3.0, 5.0]])
    b = basis.quadratic_basis_points(p)
    expected = [1, 2, 3, 5, 4, 9, 25, 6, 10, 15]
    np.testing.assert_allclose(np.asarray(b[0]), expected)


def test_voxel_grid_layout():
    g = basis.voxel_grid((2, 3, 2))
    assert g.shape == (12, 3)
    # ij ordering: last axis (z) fastest.
    np.testing.assert_allclose(np.asarray(g[0]), [0, 0, 0])
    np.testing.assert_allclose(np.asarray(g[1]), [0, 0, 1])
    np.testing.assert_allclose(np.asarray(g[2]), [0, 1, 0])
    np.testing.assert_allclose(np.asarray(g[-1]), [1, 2, 1])


def test_identity_beta_is_identity_warp(rng):
    beta = basis.identity_beta(4)
    assert beta.shape == (4, 10, 3)
    pts = jnp.asarray(rng.uniform(0, 10, size=(7, 3)).astype(np.float32))
    warped = basis.warp_points(pts, beta[0])
    np.testing.assert_allclose(np.asarray(warped), np.asarray(pts), atol=1e-5)


def test_warp_points_quadratic(rng):
    beta = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32)) * 0.1
    p = jnp.asarray([[1.0, 2.0, 3.0]])
    out = basis.warp_points(p, beta)
    phi = np.array([1, 1, 2, 3, 1, 4, 9, 2, 3, 6], dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(out[0]), phi @ np.asarray(beta), rtol=1e-5
    )


def test_voxel_basis_matches_grid():
    vb = basis.voxel_basis((3, 3, 2))
    g = basis.voxel_grid((3, 3, 2))
    np.testing.assert_allclose(
        np.asarray(vb), np.asarray(basis.quadratic_basis_points(g))
    )


def test_normalized_roundtrip_singleton_axis():
    """Singleton axes (planar recordings, Z=1) must not divide by zero."""
    pts = jnp.asarray([[3.0, 4.0, 0.0]])
    n = basis.normalize_points(pts, (10, 10, 1))
    assert np.all(np.isfinite(np.asarray(n)))
    back = basis.denormalize_points(n, (10, 10, 1))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                               atol=1e-6)


def test_translation_beta_shifts_coordinates():
    from dnmf_tpu.ops.basis import (
        translation_beta,
        voxel_basis_normalized,
        warp_voxel_coords,
    )

    size = (12, 10, 2)
    shifts = jnp.asarray([[1.5, -2.0, 0.5], [0.0, 0.0, 0.0]])
    beta = translation_beta(shifts, size, scaling="normalized")
    vb = voxel_basis_normalized(size)
    psi = warp_voxel_coords(vb, beta[0], size, "normalized")
    grid = basis.voxel_grid(size)
    np.testing.assert_allclose(
        np.asarray(psi), np.asarray(grid) + np.array([1.5, -2.0, 0.5]),
        atol=1e-5,
    )
    psi1 = warp_voxel_coords(vb, beta[1], size, "normalized")
    np.testing.assert_allclose(np.asarray(psi1), np.asarray(grid),
                               atol=1e-5)


def test_invert_warp_points_roundtrip(rng):
    """warp(invert(p)) round-trips to <1e-3 px for a strong quadratic
    warp (the fixed-point inverse replaces the biased first-order
    ``2p - warp(p)`` estimate)."""
    from dnmf_tpu.ops.basis import invert_warp_points, warp_points

    beta = np.asarray(basis.identity_beta(1))[0]
    beta = beta + rng.normal(0, 0.02, size=(10, 3)).astype(np.float32)
    beta_j = jnp.asarray(beta)
    pts = jnp.asarray(
        rng.uniform(-0.8, 0.8, size=(50, 3)).astype(np.float32)
    )
    inv = invert_warp_points(pts, beta_j, iters=3)
    back = warp_points(inv, beta_j)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                               atol=1e-3)
    # And the fixed point is a genuine improvement over first order.
    first_order = 2 * pts - warp_points(pts, beta_j)
    err_fp = np.abs(np.asarray(warp_points(inv, beta_j) - pts)).max()
    err_fo = np.abs(
        np.asarray(warp_points(first_order, beta_j) - pts)
    ).max()
    assert err_fp < err_fo


def test_affine_beta_from_displacements_recovers_affine(rng):
    """A known affine content motion is inverted exactly by the fitted
    seed warp: warp(apparent) == anchor."""
    from dnmf_tpu.ops.basis import (
        affine_beta_from_displacements,
        normalize_points,
        warp_points,
    )

    size = (24, 24, 4)
    centers = rng.uniform(4, 20, size=(9, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(1, 3, size=9)
    # Content motion: apparent q = M c + b (true affine).
    m_true = np.eye(3) + rng.normal(0, 0.03, (3, 3))
    b_true = rng.normal(0, 1.0, 3)
    q = centers @ m_true.T + b_true
    disp = (q - centers)[None].astype(np.float32)  # [T=1, n, 3]

    beta = affine_beta_from_displacements(
        jnp.asarray(centers), jnp.asarray(disp), size,
        scaling="normalized", ridge=1e-8,
    )
    qn = normalize_points(jnp.asarray(q.astype(np.float32)), size)
    back = warp_points(qn, beta[0])
    cn = normalize_points(jnp.asarray(centers), size)
    np.testing.assert_allclose(np.asarray(back), np.asarray(cn),
                               atol=2e-3)


def test_affine_beta_translation_fallback(rng):
    """n < 4 sample points fall back to a pure-translation seed."""
    from dnmf_tpu.ops.basis import affine_beta_from_displacements

    size = (20, 20, 2)
    centers = jnp.asarray([[10.0, 10.0, 1.0]])
    disp = jnp.asarray([[[2.0, -1.0, 0.0]]])  # [1, 1, 3]
    beta = affine_beta_from_displacements(centers, disp, size,
                                          scaling="pixel")
    expected = np.array(basis.identity_beta(1))[0]
    expected[0] = [-2.0, 1.0, 0.0]
    np.testing.assert_allclose(np.asarray(beta[0]), expected, atol=1e-6)
