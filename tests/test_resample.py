"""Trilinear resampler parity vs torch.nn.functional.grid_sample
(align_corners=True, zero padding) — the reference's warp semantics."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from dnmf_tpu.ops import basis, footprints, resample


def _torch_sample(volume, coords):
    """Oracle: sample [M,N,Z] volume at voxel coords via grid_sample."""
    m, n, z = volume.shape
    vol = torch.tensor(volume)[None, None]  # [1,1,M(D),N(H),Z(W)]
    size = np.array([m, n, z], dtype=np.float32)
    norm = 2.0 * coords / (size - 1) - 1.0
    # grid last dim: (x->W=Z axis, y->H=N axis, z->D=M axis)
    grid = torch.tensor(norm[:, ::-1].copy())[None, :, None, None, :]
    out = F.grid_sample(vol, grid, mode="bilinear", padding_mode="zeros",
                        align_corners=True)
    return out[0, 0, :, 0, 0].numpy()


def test_matches_grid_sample_interior(rng):
    size = (9, 8, 4)
    vol = rng.normal(size=size).astype(np.float32)
    coords = rng.uniform(0, np.array(size) - 1, size=(50, 3)).astype(
        np.float32
    )
    ours = resample.trilinear_resample(jnp.asarray(vol), jnp.asarray(coords))
    oracle = _torch_sample(vol, coords)
    np.testing.assert_allclose(np.asarray(ours), oracle, rtol=1e-4, atol=1e-5)


def test_matches_grid_sample_out_of_bounds(rng):
    size = (9, 8, 4)
    vol = rng.normal(size=size).astype(np.float32)
    coords = rng.uniform(-3, np.array(size) + 2, size=(80, 3)).astype(
        np.float32
    )
    ours = resample.trilinear_resample(jnp.asarray(vol), jnp.asarray(coords))
    oracle = _torch_sample(vol, coords)
    np.testing.assert_allclose(np.asarray(ours), oracle, rtol=1e-4, atol=1e-5)


def test_identity_coords_roundtrip(rng):
    size = (6, 5, 3)
    vol = rng.normal(size=size).astype(np.float32)
    coords = basis.voxel_grid(size)
    ours = resample.trilinear_resample(jnp.asarray(vol), coords)
    np.testing.assert_allclose(
        np.asarray(ours), vol.reshape(-1), rtol=1e-5, atol=1e-6
    )


def test_resample_footprints_close_to_analytic(rng):
    """For smooth Gaussians and small warps, resampled footprints should
    approximate the analytic evaluation (the fast path)."""
    size = (12, 11, 4)
    k = 3
    grid = basis.voxel_grid(size)
    pos = jnp.asarray([[5.0, 5.0, 1.5], [8.0, 3.0, 2.0], [3.0, 8.0, 1.0]])
    sigma = jnp.full((k,), 2.5)
    a0 = footprints.gaussian_footprints(grid, pos, sigma)
    psi = grid + 0.25
    warped = resample.resample_footprints(a0, psi, size)
    analytic = footprints.evaluate_footprints(
        psi, pos, sigma, size=size, mask_out_of_bounds=True
    )
    interior = np.all(
        (np.asarray(psi) >= 1) & (np.asarray(psi) <= np.array(size) - 2),
        axis=1,
    )
    # Trilinear interpolation of a sigma=2.5 Gaussian carries O(f'' h^2)
    # error — this is a sanity check, not a parity gate (that's the torch
    # oracle above).
    np.testing.assert_allclose(
        np.asarray(warped)[interior],
        np.asarray(analytic)[interior],
        atol=0.1,
    )


def test_separable_warp_constant_field_exact(rng):
    """With a locally-constant shift field the sequential-axis warp is
    mathematically identical to gather-based trilinear sampling."""
    from dnmf_tpu.ops.basis import voxel_grid
    from dnmf_tpu.ops.resample import separable_warp, trilinear_resample

    size = (12, 10, 6)
    vol = jnp.asarray(rng.uniform(size=size).astype(np.float32))
    const = np.array([1.3, -2.2, 0.7], np.float32)
    shifts = jnp.broadcast_to(jnp.asarray(const), size + (3,))
    out = separable_warp(vol, shifts, (3, 3, 2))

    grid = voxel_grid(size)
    coords = jnp.clip(
        grid + jnp.asarray(const)[None, :],
        0.0,
        jnp.asarray([s - 1 for s in size], jnp.float32),
    )
    ref = trilinear_resample(vol, coords, padding="edge").reshape(size)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_separable_warp_smooth_field_close(rng):
    """A patch-smooth field: positional error stays well under the
    documented O(|ds/dx| * |s|) bound on a smooth volume."""
    from dnmf_tpu.ops.basis import voxel_grid
    from dnmf_tpu.ops.resample import separable_warp, trilinear_resample

    size = (32, 24, 8)
    m, n, z = size
    xs = jnp.arange(m)[:, None, None]
    ys = jnp.arange(n)[None, :, None]
    zs = jnp.arange(z)[None, None, :]
    vol = (jnp.sin(0.3 * xs) * jnp.cos(0.25 * ys)
           + 0.5 * jnp.sin(0.4 * zs)).astype(jnp.float32)
    # smooth field, |s| <= 2, varying over ~16-voxel scales
    shifts = jnp.stack([
        2.0 * jnp.sin(0.1 * xs + 0.05 * ys) * jnp.ones_like(vol),
        1.5 * jnp.cos(0.08 * ys) * jnp.ones_like(vol),
        0.5 * jnp.sin(0.2 * zs) * jnp.ones_like(vol),
    ], axis=-1)
    out = separable_warp(vol, shifts, (3, 3, 1))

    grid = voxel_grid(size)
    coords = jnp.clip(
        grid + shifts.reshape(-1, 3),
        0.0,
        jnp.asarray([s - 1 for s in size], jnp.float32),
    )
    ref = trilinear_resample(vol, coords, padding="edge").reshape(size)
    # interior comparison (border rows see clamped-vs-hat edge handling)
    sl = (slice(3, -3), slice(3, -3), slice(1, -1))
    err = np.max(np.abs(np.asarray(out)[sl] - np.asarray(ref)[sl]))
    assert err < 0.05, err
