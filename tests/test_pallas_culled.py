"""Culled kernels vs dense kernels / XLA (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnmf_tpu.ops import basis as B
from dnmf_tpu.ops import footprints as FP
from dnmf_tpu.ops import mu as MU
from dnmf_tpu.ops import pallas_culled as pc

SIZE = (32, 10, 2)
P = 32 * 10 * 2
K = 12  # 2 blocks at kblock=8


def _setup(rng, t=3):
    pos = jnp.asarray(
        rng.uniform([2, 2, 0.2], [30, 8, 1.8], (K, 3)).astype(np.float32)
    )
    sigma = jnp.asarray(rng.uniform(1.0, 2.0, (K,)).astype(np.float32))
    betas = B.identity_beta(t) + 0.02 * jnp.asarray(
        rng.normal(size=(t, 10, 3)).astype(np.float32)
    )
    y = jnp.asarray(rng.uniform(size=(t, P)).astype(np.float32))
    c = jnp.asarray(rng.uniform(size=(t, K)).astype(np.float32))
    return pos, sigma, betas, y, c


@pytest.mark.parametrize("scaling", ["pixel", "normalized"])
def test_gram_culled_matches_xla(rng, scaling):
    pos, sigma, betas, y, c = _setup(rng)
    vb = (B.voxel_basis_normalized(SIZE) if scaling == "normalized"
          else B.voxel_basis(SIZE))
    g, c1 = pc.gram_block_culled(betas, pos, sigma, y, SIZE,
                                 scaling=scaling, tile_p=128, kblock=8,
                                 interpret=True)
    for t in range(betas.shape[0]):
        psi = B.warp_voxel_coords(vb, betas[t], SIZE, scaling)
        a = FP.evaluate_footprints(psi, pos, sigma, size=SIZE)
        g_ref, c1_ref = MU.mu_grams(a, y[t])
        np.testing.assert_allclose(np.asarray(g[t]), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c1[t]),
                                   np.asarray(c1_ref),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("scaling", ["pixel", "normalized"])
def test_motion_culled_matches_autodiff(rng, scaling):
    pos, sigma, betas, y, c = _setup(rng)
    vb = (B.voxel_basis_normalized(SIZE) if scaling == "normalized"
          else B.voxel_basis(SIZE))
    mses, dbetas = pc.motion_block_culled(
        betas, pos, sigma, c, y, SIZE, scaling=scaling, tile_p=128,
        kblock=8, interpret=True,
    )

    def loss(b, ct, yt):
        psi = B.warp_voxel_coords(vb, b, SIZE, scaling)
        a = FP.evaluate_footprints(psi, pos, sigma, size=SIZE)
        return jnp.mean((a @ ct - yt) ** 2)

    for t in range(betas.shape[0]):
        l_ref, g_ref = jax.value_and_grad(loss)(betas[t], c[t], y[t])
        np.testing.assert_allclose(float(mses[t]), float(l_ref),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dbetas[t]),
                                   np.asarray(g_ref),
                                   rtol=1e-3, atol=1e-6)


def test_culled_single_block_degenerates(rng):
    """kblock >= K: no culling, must equal the dense kernel."""
    from dnmf_tpu.ops import pallas_kernels as pk

    pos, sigma, betas, y, c = _setup(rng)
    g_d, c1_d = pk.gram_block(betas, pos, sigma, y, SIZE,
                              scaling="pixel", tile_p=128,
                              interpret=True)
    g_c, c1_c = pc.gram_block_culled(betas, pos, sigma, y, SIZE,
                                     scaling="pixel", tile_p=128,
                                     kblock=64, interpret=True)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_d),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1_c), np.asarray(c1_d),
                               rtol=1e-5, atol=1e-6)


def test_gram_split_dot_mode_close_to_highest(rng):
    """dot_mode="split" (3-pass bf16 decomposition, the production
    whole-brain configuration) stays within ~1e-4 relative of the 6-pass
    HIGHEST Gram."""
    import jax.numpy as jnp
    import numpy as np

    from dnmf_tpu.ops import basis as B
    from dnmf_tpu.ops import pallas_culled as pc

    size = (24, 16, 4)
    k, t = 20, 3
    total_p = int(np.prod(size))
    pos = jnp.asarray(
        rng.uniform(2, np.array(size) - 2, (k, 3)).astype(np.float32)
    )
    sigma = jnp.asarray(rng.uniform(1.5, 3.0, (k,)).astype(np.float32))
    beta = jnp.asarray(
        np.asarray(B.identity_beta(t))
        + 0.01 * rng.normal(size=(t, 10, 3)).astype(np.float32)
    )
    y = jnp.asarray(rng.uniform(size=(t, total_p)).astype(np.float32))
    args = (beta, pos, sigma, y, size)
    kw = dict(scaling="normalized", tile_p=512, kblock=8, interpret=True)
    g_hi, c1_hi = pc.gram_block_culled(*args, dot_mode="highest", **kw)
    g_sp, c1_sp = pc.gram_block_culled(*args, dot_mode="split", **kw)
    scale = float(jnp.max(jnp.abs(g_hi)))
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_hi),
                               rtol=5e-4, atol=5e-4 * scale)
    np.testing.assert_allclose(np.asarray(c1_sp), np.asarray(c1_hi),
                               rtol=1e-5, atol=1e-6)


def test_pair_cull_distant_clusters(rng):
    """Two tight neuron clusters far apart in m: the cross-block Gram
    must still match the dense XLA reference (the pair-interval cull may
    only drop contributions below the exp(-36) reach floor), and nearby
    clusters must never be culled."""
    size = (64, 8, 2)
    total_p = int(np.prod(size))
    t = 2
    for gap_lo, gap_hi in [(4.0, 12.0), (40.0, 56.0)]:
        # cluster A at m ~ [2, 6], cluster B at m ~ [gap_lo, gap_hi]
        pos_a = rng.uniform([2, 2, 0.2], [6, 6, 1.8], (8, 3))
        pos_b = rng.uniform([gap_lo, 2, 0.2], [gap_hi, 6, 1.8], (8, 3))
        pos = jnp.asarray(
            np.concatenate([pos_a, pos_b]).astype(np.float32)
        )
        sigma = jnp.asarray(
            rng.uniform(1.0, 1.5, (16,)).astype(np.float32)
        )
        betas = B.identity_beta(t) + 0.02 * jnp.asarray(
            rng.normal(size=(t, 10, 3)).astype(np.float32)
        )
        y = jnp.asarray(rng.uniform(size=(t, total_p)).astype(np.float32))
        g, c1 = pc.gram_block_culled(betas, pos, sigma, y, size,
                                     scaling="pixel", tile_p=128,
                                     kblock=8, interpret=True)
        vb = B.voxel_basis(size)
        for ti in range(t):
            psi = B.warp_voxel_coords(vb, betas[ti], size, "pixel")
            a = FP.evaluate_footprints(psi, pos, sigma, size=size)
            g_ref, c1_ref = MU.mu_grams(a, y[ti])
            np.testing.assert_allclose(
                np.asarray(g[ti]), np.asarray(g_ref), rtol=1e-4,
                atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(c1[ti]), np.asarray(c1_ref), rtol=1e-4,
                atol=1e-5,
            )


@pytest.mark.parametrize("f", [2, 4])
def test_gram_culled_multiframe_steps_match(rng, f):
    """frames_per_step shares row machinery across F frames per grid
    step (F=2 is the measured whole-brain production setting); outputs
    must be identical to F=1, including the padded tail (t=3 with F=2
    pads one frame)."""
    pos, sigma, betas, y, c = _setup(rng, t=3)
    g1, c11 = pc.gram_block_culled(betas, pos, sigma, y, SIZE,
                                   scaling="normalized", tile_p=128,
                                   kblock=8, dot_mode="split",
                                   frames_per_step=1, interpret=True)
    gf, c1f = pc.gram_block_culled(betas, pos, sigma, y, SIZE,
                                   scaling="normalized", tile_p=128,
                                   kblock=8, dot_mode="split",
                                   frames_per_step=f, interpret=True)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(g1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1f), np.asarray(c11),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("tps", [2, 4])
@pytest.mark.parametrize("f", [1, 2])
def test_gram_culled_tiles_per_step_match(rng, f, tps):
    """tiles_per_step streams one [F, tps * tile_p] video block per grid
    step and iterates the body over tile_p-wide sub-tiles (the step-count
    amortization lever); outputs must be identical to tps=1, including
    the padded pixel tail (P=640 with tile_p=128: tps=2 pads 128 voxels,
    tps=4 pads 384)."""
    pos, sigma, betas, y, c = _setup(rng, t=3)
    g1, c11 = pc.gram_block_culled(betas, pos, sigma, y, SIZE,
                                   scaling="normalized", tile_p=128,
                                   kblock=8, dot_mode="split",
                                   frames_per_step=f, tiles_per_step=1,
                                   interpret=True)
    gt, c1t = pc.gram_block_culled(betas, pos, sigma, y, SIZE,
                                   scaling="normalized", tile_p=128,
                                   kblock=8, dot_mode="split",
                                   frames_per_step=f, tiles_per_step=tps,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(g1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1t), np.asarray(c11),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("nbuf", [2, 3])
@pytest.mark.parametrize("f", [1, 2])
def test_gram_pipelined_matches_grid(rng, f, nbuf):
    """The manually-pipelined kernel (one grid step per frame group,
    fori_loop over voxel tiles with hand-rolled nbuf-deep DMA rotation
    from ANY memory) must match the grid-pipelined kernel exactly,
    including the padded pixel tail (P=640 at tile_p=128) and padded
    frames (t=3 with F=2)."""
    pos, sigma, betas, y, c = _setup(rng, t=3)
    g1, c11 = pc.gram_block_culled(betas, pos, sigma, y, SIZE,
                                   scaling="normalized", tile_p=128,
                                   kblock=8, dot_mode="split",
                                   frames_per_step=f, interpret=True)
    gp, c1p = pc.gram_block_pipelined(betas, pos, sigma, y, SIZE,
                                      scaling="normalized", tile_p=128,
                                      kblock=8, dot_mode="split",
                                      frames_per_step=f, nbuf=nbuf,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(g1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1p), np.asarray(c11),
                               rtol=1e-5, atol=1e-6)


def test_gram_pipelined_pixel_shards_sum(rng):
    """TP contract: two pixel shards' pipelined Grams (``p_offset``-
    anchored) must sum to the full-volume Gram — the property the
    pixel-sharded MU path psums over (parallel/sharded.py)."""
    pos, sigma, betas, y, c = _setup(rng)
    g0, c10 = pc.gram_block_culled(betas, pos, sigma, y, SIZE,
                                   scaling="normalized", tile_p=128,
                                   kblock=8, dot_mode="split",
                                   frames_per_step=2, interpret=True)
    half = P // 2
    ga, c1a = pc.gram_block_pipelined(betas, pos, sigma, y[:, :half],
                                      SIZE, scaling="normalized",
                                      tile_p=128, kblock=8,
                                      dot_mode="split",
                                      frames_per_step=2, nbuf=2,
                                      p_offset=jnp.int32(0),
                                      interpret=True)
    gb, c1b = pc.gram_block_pipelined(betas, pos, sigma, y[:, half:],
                                      SIZE, scaling="normalized",
                                      tile_p=128, kblock=8,
                                      dot_mode="split",
                                      frames_per_step=2, nbuf=2,
                                      p_offset=jnp.int32(half),
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(ga + gb), np.asarray(g0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1a + c1b), np.asarray(c10),
                               rtol=1e-5, atol=1e-5)


def test_gram_pipelined_under_vmap(rng):
    """Config-5 contract: vmap over recordings must batch the manual-DMA
    pipelined kernel (pallas batching prepends a grid axis; the ANY-space
    video ref gains a leading dim indexed by the new grid axis) and match
    per-recording dispatches."""
    pos, sigma, betas, y, c = _setup(rng)
    yb = jnp.stack([y, 0.5 * y])
    bb = jnp.stack([betas, betas])

    def one(b_, y_):
        return pc.gram_block_pipelined(b_, pos, sigma, y_, SIZE,
                                       scaling="normalized", tile_p=128,
                                       kblock=8, dot_mode="split",
                                       frames_per_step=2, nbuf=2,
                                       interpret=True)

    gv, c1v = jax.vmap(one)(bb, yb)
    for r in range(2):
        gr, c1r = one(bb[r], yb[r])
        np.testing.assert_allclose(np.asarray(gv[r]), np.asarray(gr),
                                   rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(c1v[r]), np.asarray(c1r),
                                   rtol=0, atol=0)


def _tracked_setup(rng, t=3):
    pos, sigma, betas, y, c = _setup(rng, t=t)
    jitter = jnp.asarray(
        rng.normal(size=(t,) + pos.shape).astype(np.float32)
    ) * jnp.asarray([0.5, 0.3, 0.1])
    pos_t = pos[None] + jitter  # [T, K, 3]
    return pos_t, sigma, betas, y, c


@pytest.mark.parametrize("f", [1, 2])
def test_gram_tracked_matches_xla(rng, f):
    """Per-frame-position Grams (the tracked-refinement MU statistics)
    vs the XLA analytic path, frame by frame."""
    pos_t, sigma, betas, y, c = _tracked_setup(rng)
    g, c1 = pc.gram_block_tracked(betas, pos_t, sigma, y, SIZE,
                                  scaling="normalized", tile_p=128,
                                  kblock=8, dot_mode="split",
                                  frames_per_step=f, interpret=True)
    vb = B.voxel_basis_normalized(SIZE)
    for ti in range(betas.shape[0]):
        psi = B.warp_voxel_coords(vb, betas[ti], SIZE, "normalized")
        a = FP.evaluate_footprints(psi, pos_t[ti], sigma, size=SIZE)
        g_ref, c1_ref = MU.mu_grams(a, y[ti])
        np.testing.assert_allclose(np.asarray(g[ti]),
                                   np.asarray(g_ref), rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c1[ti]),
                                   np.asarray(c1_ref), rtol=1e-4,
                                   atol=1e-5)


@pytest.mark.parametrize("f", [1, 2])
def test_refine_kernel_matches_xla_grad(rng, f):
    """The fused refinement kernel's (mse, dpos) vs jax.grad of the XLA
    analytic data term at per-frame positions."""
    pos_t, sigma, betas, y, c = _tracked_setup(rng)
    vb = B.voxel_basis_normalized(SIZE)

    def frame_loss(pos_f, beta_f, y_f, c_f):
        psi = B.warp_voxel_coords(vb, beta_f, SIZE, "normalized")
        a = FP.evaluate_footprints(psi, pos_f, sigma, size=SIZE)
        recon = jnp.dot(a, c_f, precision=jax.lax.Precision.HIGHEST)
        return jnp.mean((recon - y_f) ** 2)

    mse_ref = jax.vmap(frame_loss)(pos_t, betas, y, c)
    dpos_ref = jax.vmap(jax.grad(frame_loss))(pos_t, betas, y, c)
    mse, dpos = pc.refine_block_culled(betas, pos_t, sigma, c, y, SIZE,
                                       scaling="normalized", tile_p=128,
                                       kblock=8, frames_per_step=f,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(mse), np.asarray(mse_ref),
                               rtol=1e-5, atol=1e-7)
    scale = float(jnp.max(jnp.abs(dpos_ref)))
    np.testing.assert_allclose(np.asarray(dpos) / scale,
                               np.asarray(dpos_ref) / scale,
                               atol=2e-5)


@pytest.mark.parametrize("f", [1, 2])
def test_gram_streamed_psi_matches_kernel_psi(rng, f):
    """psi_source='stream' (XLA-generated psi/fade rows DMA'd into the
    kernel — the whole-brain production setting) must match the
    in-kernel row generation."""
    pos, sigma, betas, y, c = _setup(rng, t=3)
    gk, c1k = pc.gram_block_culled(betas, pos, sigma, y, SIZE,
                                   scaling="normalized", tile_p=128,
                                   kblock=8, dot_mode="split",
                                   frames_per_step=f, interpret=True)
    gs, c1s = pc.gram_block_culled(betas, pos, sigma, y, SIZE,
                                   scaling="normalized", tile_p=128,
                                   kblock=8, dot_mode="split",
                                   frames_per_step=f,
                                   psi_source="stream", interpret=True)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gk),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1s), np.asarray(c1k),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("f", [1, 2])
def test_refine_kernel_dsigma_matches_xla_grad(rng, f):
    """want_dsigma=True: the fused kernel's per-frame sigma gradient vs
    jax.grad of the XLA analytic data term wrt the shared widths."""
    pos_t, sigma, betas, y, c = _tracked_setup(rng)
    vb = B.voxel_basis_normalized(SIZE)

    def frame_loss(sig, pos_f, beta_f, y_f, c_f):
        psi = B.warp_voxel_coords(vb, beta_f, SIZE, "normalized")
        a = FP.evaluate_footprints(psi, pos_f, sig, size=SIZE)
        recon = jnp.dot(a, c_f, precision=jax.lax.Precision.HIGHEST)
        return jnp.mean((recon - y_f) ** 2)

    dsig_ref = jax.vmap(
        lambda p, b, yy, cc: jax.grad(frame_loss)(sigma, p, b, yy, cc)
    )(pos_t, betas, y, c)
    mse, dpos, dsig = pc.refine_block_culled(
        betas, pos_t, sigma, c, y, SIZE, scaling="normalized",
        tile_p=128, kblock=8, frames_per_step=f, want_dsigma=True,
        interpret=True)
    # dpos unchanged by the wider moment block
    mse2, dpos2 = pc.refine_block_culled(
        betas, pos_t, sigma, c, y, SIZE, scaling="normalized",
        tile_p=128, kblock=8, frames_per_step=f, interpret=True)
    np.testing.assert_allclose(np.asarray(mse), np.asarray(mse2),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dpos), np.asarray(dpos2),
                               rtol=1e-5, atol=1e-8)
    # The kernel assembles sum r w A d2 by binomial expansion around
    # pos_k (|psi|^2 second moment), which carries ~|pos|^2/d2 f32
    # cancellation — ~1e-4 relative here, documented in the wrapper.
    scale = float(jnp.max(jnp.abs(dsig_ref)))
    np.testing.assert_allclose(np.asarray(dsig) / scale,
                               np.asarray(dsig_ref) / scale,
                               atol=1e-3)
