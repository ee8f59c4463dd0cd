"""Fused warp kernel vs the XLA separable apply path (interpret mode).

The fused kernel must reproduce
``registration.motion_correct._apply_remap_field(...,
remap_mode="separable")`` — cubic field upsample + 3-pass hat-weighted
warp with edge-clamped borders — per frame over a block.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnmf_tpu.ops.pallas_warp import fused_separable_warp
from dnmf_tpu.registration.motion_correct import _apply_remap_field

SIZE = (24, 20, 6)
GRID = (3, 3, 2)
MAX_SHIFTS = (3, 3, 2)
MAX_DEV = 2


def _fixture(rng, b=3, grid=GRID, spread=None):
    m, n, z = SIZE
    base = np.stack(
        [
            rng.uniform(-ms, ms, b).astype(np.float32)
            for ms in MAX_SHIFTS
        ],
        axis=1,
    )  # [b, 3]
    dev = spread if spread is not None else MAX_DEV + 1.5
    shifts = base[:, None, :] + rng.uniform(
        -dev, dev, (b, int(np.prod(grid)), 3)
    ).astype(np.float32)
    vol = rng.random((b, m, n, z), dtype=np.float32)
    return (jnp.asarray(vol), jnp.asarray(shifts),
            jnp.asarray(base))


def _xla_reference(vol, shifts, base, grid):
    def one(img, ps, rs):
        return _apply_remap_field(img, rs, ps, grid, "separable",
                                  MAX_SHIFTS, MAX_DEV)
    return jax.vmap(one)(vol, shifts, base)


@pytest.mark.parametrize("tm,tn", [(8, 16), (16, 8)])
def test_fused_warp_matches_xla(rng, tm, tn):
    """Block parity incl. non-divisible tile tails (24/16, 20/16...)
    and active field clipping (patch spread > max_deviation_rigid)."""
    vol, shifts, base = _fixture(rng)
    ref = _xla_reference(vol, shifts, base, GRID)
    got = fused_separable_warp(vol, shifts, base, GRID, SIZE,
                               MAX_SHIFTS, MAX_DEV, tm=tm, tn=tn,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_warp_broadcast_grid(rng):
    """grid_shape with singleton axes (incl. the (1,1,1) broadcast that
    _upsample_field special-cases)."""
    for grid in [(1, 1, 1), (3, 1, 2)]:
        vol, shifts, base = _fixture(rng, b=2, grid=grid)
        ref = _xla_reference(vol, shifts, base, grid)
        got = fused_separable_warp(vol, shifts, base, grid, SIZE,
                                   MAX_SHIFTS, MAX_DEV, tm=8, tn=16,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_fused_warp_zero_field_identity(rng):
    """Zero shifts + zero base must return the input exactly (hat
    weights collapse to the u=0 offset everywhere)."""
    m, n, z = SIZE
    vol = jnp.asarray(rng.random((2, m, n, z), dtype=np.float32))
    shifts = jnp.zeros((2, int(np.prod(GRID)), 3))
    base = jnp.zeros((2, 3))
    got = fused_separable_warp(vol, shifts, base, GRID, SIZE,
                               MAX_SHIFTS, MAX_DEV, tm=8, tn=16,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(vol),
                               rtol=0, atol=1e-6)


def test_fused_warp_integer_translation(rng):
    """A constant integer field must produce an exact (edge-clamped)
    integer translation of the volume."""
    m, n, z = SIZE
    vol = jnp.asarray(rng.random((1, m, n, z), dtype=np.float32))
    t = np.array([2.0, -1.0, 1.0], np.float32)
    shifts = jnp.broadcast_to(t, (1, int(np.prod(GRID)), 3))
    base = jnp.asarray(t[None])
    got = fused_separable_warp(vol, shifts, base, GRID, SIZE,
                               MAX_SHIFTS, MAX_DEV, tm=8, tn=16,
                               interpret=True)
    v = np.asarray(vol[0])
    idx_m = np.clip(np.arange(m) + 2, 0, m - 1)
    idx_n = np.clip(np.arange(n) - 1, 0, n - 1)
    idx_z = np.clip(np.arange(z) + 1, 0, z - 1)
    expect = v[idx_m][:, idx_n][:, :, idx_z]
    np.testing.assert_allclose(np.asarray(got[0]), expect,
                               rtol=0, atol=1e-6)

def test_fused_warp_multi_n_tile_aligned(rng):
    """Multi-n-tile path: Mosaic constrains the halo DMA's lane start
    (ni*tn*zp) and the out block's lane extent to 128-tile alignment,
    so unaligned tn*zp falls back to a single n tile — this fixture is
    built so tn*zp IS aligned (z=4, max_shifts_z=2, max_dev=2 -> zp=24;
    tn=16 -> 384) and n=40 gives 3 n-tiles, exercising the per-tile
    lane-start arithmetic that production whole-brain shapes use."""
    size = (24, 40, 4)
    grid = (3, 3, 2)
    max_shifts = (3, 3, 2)
    m, n, z = size
    base = np.stack(
        [rng.uniform(-ms, ms, 2).astype(np.float32)
         for ms in max_shifts], axis=1)
    shifts = base[:, None, :] + rng.uniform(
        -3.5, 3.5, (2, int(np.prod(grid)), 3)).astype(np.float32)
    vol = rng.random((2, m, n, z), dtype=np.float32)

    def one(img, ps, rs):
        return _apply_remap_field(img, rs, ps, grid, "separable",
                                  max_shifts, 2)
    ref = jax.vmap(one)(jnp.asarray(vol), jnp.asarray(shifts),
                        jnp.asarray(base))
    got = fused_separable_warp(
        jnp.asarray(vol), jnp.asarray(shifts), jnp.asarray(base),
        grid, size, max_shifts, 2, tm=8, tn=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
