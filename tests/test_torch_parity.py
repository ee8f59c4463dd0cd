"""Numerical parity vs a PyTorch implementation of the reference
algorithm (BASELINE.md north-star: per-iteration factor parity).

The torch side below implements the *reference math* — stored Gaussian
footprint volume warped per frame through ``F.grid_sample`` with
pixel-space quadratic deformation coefficients, full-tensor Adam over
serial mini-batches, and NumPy-style multiplicative trace updates — and
the dnmf_tpu side runs in parity mode (``resample`` footprints,
``pixel`` basis scaling, detached regularizer).  Factors are compared
after every epoch / MU iteration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from dnmf_tpu.config import (
    DeformationConfig,
    ModelConfig,
    OptimizerConfig,
)
from dnmf_tpu.models import dnmf as M

SIZE = (20, 20, 2)
K, T = 4, 8
BATCH = 4
LR = 1e-4


def _fixture(rng):
    pos = np.array(
        [[5.0, 5.0, 1.0], [14.0, 5.0, 0.5], [5.0, 14.0, 1.2],
         [14.0, 14.0, 0.8]],
        dtype=np.float32,
    )
    c0 = rng.uniform(0.2, 1.0, size=(K, T)).astype(np.float32)
    video = rng.uniform(0.0, 0.3, size=(T,) + SIZE).astype(np.float32)
    # Add some signal at the positions so the fit is non-trivial.
    m, n, z = SIZE
    grid = np.stack(
        np.meshgrid(np.arange(m), np.arange(n), np.arange(z),
                    indexing="ij"),
        axis=-1,
    ).astype(np.float32)
    for t in range(T):
        for k in range(K):
            d2 = ((grid - pos[k]) ** 2).sum(-1)
            video[t] += c0[k, t] * np.exp(-d2 / 9.0)
    return pos, c0, video


class TorchReference:
    """Reference-math implementation (pixel basis, grid_sample warp)."""

    def __init__(self, pos, c0, sigma=3.0):
        m, n, z = SIZE
        gx, gy, gz = torch.meshgrid(
            torch.arange(m, dtype=torch.float32),
            torch.arange(n, dtype=torch.float32),
            torch.arange(z, dtype=torch.float32),
            indexing="ij",
        )
        pts = torch.stack([gx, gy, gz], dim=-1)  # [m, n, z, 3]
        self.basis = torch.cat(
            [
                torch.ones(m, n, z, 1), pts, pts**2,
                (pts[..., 0] * pts[..., 1])[..., None],
                (pts[..., 0] * pts[..., 2])[..., None],
                (pts[..., 1] * pts[..., 2])[..., None],
            ],
            dim=-1,
        )  # [m, n, z, 10]
        p = torch.tensor(pos)
        d2 = ((pts[:, :, :, None, :] - p[None, None, None]) ** 2).sum(-1)
        self.a_vol = torch.exp(-d2 / sigma**2)  # [m, n, z, K]
        beta0 = torch.zeros(10, 3)
        beta0[1, 0] = beta0[2, 1] = beta0[3, 2] = 1.0
        self.beta = beta0[None].repeat(T, 1, 1).clone().requires_grad_()
        self.c = torch.tensor(c0)
        self.sizes = torch.tensor(SIZE, dtype=torch.float32)
        self.opt = torch.optim.Adam([self.beta], lr=LR)

    def warped_footprints(self, times):
        """[B, K, m, n, z] via grid_sample at pixel coords (align_corners)."""
        beta_b = self.beta[times]  # [B, 10, 3]
        psi = torch.einsum("mnza,bac->bmnzc", self.basis, beta_b)
        gridn = 2 * psi / (self.sizes - 1) - 1
        # input [B, K, D=z, H=n, W=m]; grid last dim (x->W=m, y->H=n, z->D)
        a_in = self.a_vol.permute(3, 2, 1, 0)[None].expand(
            len(times), -1, -1, -1, -1
        )
        samp = F.grid_sample(
            a_in, gridn.permute(0, 3, 2, 1, 4), mode="bilinear",
            padding_mode="zeros", align_corners=True,
        )  # [B, K, z, n, m]
        return samp.permute(0, 1, 4, 3, 2)

    def motion_epoch(self, video):
        for start in range(0, T, BATCH):
            times = list(range(start, min(start + BATCH, T)))
            self.opt.zero_grad()
            warped = self.warped_footprints(times)
            recon = torch.einsum(
                "bkmnz,kb->bmnz", warped, self.c[:, times]
            )
            y = torch.tensor(video[times])
            loss = F.mse_loss(recon, y)
            loss.backward()
            self.opt.step()

    def mu_iterations(self, video, iters):
        with torch.no_grad():
            warped = self.warped_footprints(list(range(T)))
        a = warped.numpy().transpose(2, 3, 4, 1, 0)  # [m, n, z, K, T]
        y = video.transpose(1, 2, 3, 0)
        c = self.c.numpy().copy()
        for _ in range(iters):
            a_ts = np.einsum("mnzkt,mnzlt->klt", a, a)
            c1 = np.einsum("mnzkt,mnzt->kt", a, y)
            c2 = np.einsum("klt,lt->kt", a_ts, c)
            c = c * c1 / (c2 + 1e-32)
        self.c = torch.tensor(c)


def _build_ours(pos, c0):
    model = ModelConfig(
        size=SIZE, num_neurons=K, num_frames=T, shape_std=3.0,
        deformation=DeformationConfig(
            footprint_mode="resample", basis_scaling="pixel",
            detach_regularizer=True,
        ),
    )
    opt_cfg = OptimizerConfig(learning_rate=LR, batch_size=BATCH,
                              motion_mode="parity", shuffle=False)
    optimizer = M.make_motion_optimizer(opt_cfg)
    state = M.init_state(model, optimizer, positions=jnp.asarray(pos))
    state = state._replace(c=jnp.asarray(c0))
    return model, optimizer, state


def test_factor_parity_per_iteration(rng):
    pos, c0, video = _fixture(rng)
    ref = TorchReference(pos, c0)
    model, optimizer, state = _build_ours(pos, c0)
    video_flat = jnp.asarray(video.reshape(T, -1))

    nb = T // BATCH
    batch_times = jnp.asarray(
        np.arange(T).reshape(nb, BATCH)
    )
    batch_weights = jnp.ones((nb, BATCH), dtype=jnp.float32)

    # --- initial warped footprints agree (grid_sample parity) ---------
    vb = M.model_voxel_basis(model)
    stored_a = M._maybe_stored_a(state, model, vb)
    ours_a = M.frame_footprints(state.beta[0], state.pos, state.sigma,
                                model, vb, stored_a)
    ref_a = ref.warped_footprints([0])[0].detach().numpy()
    np.testing.assert_allclose(
        np.asarray(ours_a).reshape(SIZE + (K,)),
        ref_a.transpose(1, 2, 3, 0), rtol=1e-4, atol=1e-5,
    )

    # --- 3 alternation rounds, factors compared each step -------------
    for rnd in range(3):
        for _ in range(2):  # 2 motion epochs
            ref.motion_epoch(video)
            state, _ = M.motion_epoch_parity(
                state, video_flat, batch_times, batch_weights, model,
                optimizer, gamma=0.0,
            )
            # BASELINE gate: absolute per-iteration factor parity <=1e-5
            # (relative tolerance is meaningless for near-zero quadratic
            # coefficients whose Adam steps amplify f32 noise).
            np.testing.assert_allclose(
                np.asarray(state.beta),
                ref.beta.detach().numpy(),
                rtol=0, atol=1e-5,
                err_msg=f"beta diverged at round {rnd}",
            )
        ref.mu_iterations(video, iters=10)
        grams, c1 = M.compute_grams(state, video_flat, model,
                                    frame_block=4)
        state = M.footprint_update(state, grams, c1, iters=10, gamma=0.0)
        np.testing.assert_allclose(
            np.asarray(state.c), ref.c.numpy(), rtol=0, atol=1e-5,
            err_msg=f"C diverged at round {rnd}",
        )

    # --- end state: tight overall agreement ---------------------------
    from dnmf_tpu.utils.metrics import r_squared

    r2 = r_squared(np.asarray(state.c), ref.c.numpy(), affine=False)
    assert np.all(r2 > 0.999), r2
