"""Deformable NMF: state pytree + jitted update steps.

TPU-native rebuild of the reference optimizer
(``DeformableNMF`` + ``ExponentialFP``, ``/root/reference/Demix/dNMF.py``):

* State is an explicit pytree ``(beta, C, pos, sigma, opt_state)``; every
  update is a pure jit-compiled function (no module objects, no host
  round-trips).
* ``motion_epoch_parity`` replicates the reference's schedule exactly:
  serial Adam steps over mini-batches of frames against the *full* beta
  tensor (so Adam momentum decays even for frames outside the batch) —
  ``update_motion``, ``/root/reference/Demix/dNMF.py:181-194``.
* ``motion_epoch_parallel`` is the TPU-native mode: per-frame beta fits
  are independent given C (Adam is elementwise), so one epoch is a single
  batched gradient step over all frames, streamed in frame blocks.
* ``compute_grams`` + ``footprint_update`` replace the reference's
  host-side NumPy MU loop (``update_footprints``, ``:163-179``), which
  materialized the full warped-footprint tensor ``A[m,n,z,K,T]`` in host
  RAM.  Here the per-frame Grams ``[K,K]`` stream on-device and the MU
  iterations run on the Grams alone (see :mod:`dnmf_tpu.ops.mu`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dnmf_tpu.config import ModelConfig, OptimizerConfig
from dnmf_tpu.ops import basis as basis_ops
from dnmf_tpu.ops import footprints as fp_ops
from dnmf_tpu.ops import jacobian as jac_ops
from dnmf_tpu.ops import mu as mu_ops
from dnmf_tpu.ops import resample as resample_ops


class DNMFState(NamedTuple):
    """Learnable factors + optimizer state.

    beta: ``[T, 10, 3]`` per-frame quadratic deformation coefficients.
    c: ``[K, T]`` non-negative traces.
    pos: ``[K, 3]`` neuron centers (frame-0 positions).
    sigma: ``[K]`` footprint widths, or ``[K, 3]`` per-axis widths
      (``ModelConfig.sigma_axes == 3`` — anisotropic footprints).
    opt_state: optax state for the beta optimizer.
    """

    beta: jnp.ndarray
    c: jnp.ndarray
    pos: jnp.ndarray
    sigma: jnp.ndarray
    opt_state: optax.OptState


def make_motion_optimizer(config: OptimizerConfig) -> optax.GradientTransformation:
    """Adam on beta with torch-default hyperparameters
    (``optim.Adam([beta], lr=...)``, ``/root/reference/demo.py:42``)."""
    return optax.adam(config.learning_rate, b1=0.9, b2=0.999, eps=1e-8)


def init_state(
    model: ModelConfig,
    optimizer: optax.GradientTransformation,
    positions: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
    beta0: Optional[jnp.ndarray] = None,
) -> DNMFState:
    """Initialize factors (reference ``DeformableNMF.__init__`` ``:126-137``
    + ``ExponentialFP.__init__`` ``:19-43``): identity deformation (or a
    provided ``beta0 [T, 10, 3]``, e.g. registration-seeded), uniform
    random traces, given or random positions, constant sigma."""
    if key is None:
        key = jax.random.PRNGKey(0)
    k_c, k_p = jax.random.split(key)
    k_count, t = model.num_neurons, model.num_frames
    beta = beta0 if beta0 is not None else basis_ops.identity_beta(t)
    c = jax.random.uniform(k_c, (k_count, t))
    if positions is None:
        positions = 1.0 + jax.random.uniform(k_p, (k_count, 3)) * jnp.asarray(
            model.size, dtype=jnp.float32
        )
    if model.sigma_axes not in (1, 3):
        raise ValueError(
            f"sigma_axes must be 1 (isotropic) or 3 (per-axis), got "
            f"{model.sigma_axes}"
        )
    sig_shape = ((k_count,) if model.sigma_axes == 1
                 else (k_count, 3))
    sigma = jnp.full(sig_shape, model.shape_std, dtype=jnp.float32)
    opt_state = optimizer.init(beta)
    return DNMFState(beta=beta, c=c, pos=positions, sigma=sigma,
                     opt_state=opt_state)


class _CulledShim:
    """Expose the culled kernels under the dense kernels' names.

    Both use kblock=64 with split-float (3-pass bf16) Gram pair dots:
    with HIGHEST (6-pass) dots the pair-dot cost forced 128-wide blocks
    (full MXU-tile utilization) at the price of coarse culling; halving
    the dot cost flips the trade — finer culling of the exp work wins
    (whole-brain 512x512x20 K=200 Grams: 9.3 ms/frame at kblock=64+split
    vs 14.9 at kblock=128+HIGHEST, same chip/session; kblock=32 loses
    the MXU tile, 18.5).  Split error is ~3e-6 relative vs float64 —
    far below MU sensitivity (validated in tools/tpu_smoke.py).
    """

    # Round-2 sweep optima at whole-brain scale: 4096-pixel tiles win
    # everywhere (tighter per-tile deformed-m culling range), while the
    # best neuron-block width grows with K — 40 at K=200 (Grams 9.7 ->
    # 7.8 ms/frame, motion 6.8 -> 5.3) but 64 at K=500 (37.3 vs 57 at
    # kblock=40: more blocks mean quadratically more pair branches).
    # Round-3: Gram frames_per_step=2 shares the row machinery across
    # two sublane-packed frames (6.19 -> 5.87 ms/frame at K=200; F=4
    # still loses to the VMEM working set, 17.5).  Outputs are
    # identical across tunings (tests/test_pallas_culled.py).

    @staticmethod
    def _tuning(num_neurons: int):
        return (40 if num_neurons <= 320 else 64), 4096

    @staticmethod
    def _params(kernel: str, num_neurons: int) -> dict:
        """Static heuristic, overridden by any measured cache entry
        (``ops/tuning.py``; populated by ``tools/autotune.py``)."""
        from dnmf_tpu.ops import tuning

        kb, tp = _CulledShim._tuning(num_neurons)
        params = {"kblock": kb, "tile_p": tp}
        ent = tuning.lookup(kernel, k=int(num_neurons))
        if ent:
            params.update(ent)
        return params

    @staticmethod
    def gram_block(betas, pos, *args, **kwargs):
        from dnmf_tpu.ops import pallas_culled as pc

        params = _CulledShim._params("culled_gram", pos.shape[0])
        impl = params.pop("impl", "grid")
        params.setdefault("frames_per_step", 2)
        params.setdefault("dot_mode", "split")
        for key, val in params.items():
            kwargs.setdefault(key, val)
        if impl == "pipelined":
            kwargs.pop("tiles_per_step", None)  # grid-impl-only knob
            return pc.gram_block_pipelined(betas, pos, *args, **kwargs)
        kwargs.pop("nbuf", None)  # pipelined-only knob
        return pc.gram_block_culled(betas, pos, *args, **kwargs)

    @staticmethod
    def motion_block(betas, pos, *args, **kwargs):
        from dnmf_tpu.ops import pallas_culled as pc

        params = _CulledShim._params("culled_motion", pos.shape[0])
        for key, val in params.items():
            kwargs.setdefault(key, val)
        return pc.motion_block_culled(betas, pos, *args, **kwargs)


def _pick_pallas(num_neurons: int):
    """Dense fused kernels for small K; neuron-block-culled ones when
    the neuron count spans multiple 64-blocks (whole-brain scales)."""
    if num_neurons > 64:
        return _CulledShim
    from dnmf_tpu.ops import pallas_kernels as pk

    return pk


def model_voxel_basis(model: ModelConfig) -> jnp.ndarray:
    """``[P, 10]`` voxel basis in the model's beta coordinate space."""
    if model.deformation.basis_scaling == "normalized":
        return basis_ops.voxel_basis_normalized(model.size)
    return basis_ops.voxel_basis(model.size)


def frame_footprints(
    beta_t: jnp.ndarray,
    pos: jnp.ndarray,
    sigma: jnp.ndarray,
    model: ModelConfig,
    voxel_basis: jnp.ndarray,
    stored_a: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Warped footprints ``[P, K]`` for one frame, by either mode.

    ``analytic``: direct evaluation at deformed coordinates.
    ``resample``: trilinear sampling of ``stored_a`` — the grid_sample
    parity path (requires ``stored_a = gaussian_footprints(grid, pos,
    sigma)``).
    """
    psi = basis_ops.warp_voxel_coords(
        voxel_basis, beta_t, model.size, model.deformation.basis_scaling
    )
    mode = model.deformation.footprint_mode
    if mode == "analytic":
        return fp_ops.evaluate_footprints(
            psi, pos, sigma, size=model.size,
            mask_out_of_bounds=model.deformation.mask_out_of_bounds,
        )
    elif mode == "resample":
        if stored_a is None:
            raise ValueError("resample mode requires stored_a")
        return resample_ops.resample_footprints(stored_a, psi, model.size)
    raise ValueError(f"unknown footprint mode: {mode!r}")


def reconstruct(
    betas: jnp.ndarray,
    c_block: jnp.ndarray,
    pos: jnp.ndarray,
    sigma: jnp.ndarray,
    model: ModelConfig,
    voxel_basis: jnp.ndarray,
    stored_a: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Batched frame reconstruction ``[B, P]`` (either footprint mode)."""

    def one(beta_t, c_t):
        a = frame_footprints(beta_t, pos, sigma, model, voxel_basis,
                             stored_a)
        return jnp.dot(a, c_t, precision=jax.lax.Precision.HIGHEST)

    return jax.vmap(one)(betas, c_block)


def batch_loss(
    beta: jnp.ndarray,
    times: jnp.ndarray,
    weights: jnp.ndarray,
    y_block: jnp.ndarray,
    c: jnp.ndarray,
    pos: jnp.ndarray,
    sigma: jnp.ndarray,
    model: ModelConfig,
    voxel_basis: jnp.ndarray,
    gamma: float,
    stored_a: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Reference batch loss: ``mse(recon, y) + gamma * reg.mean()``
    (``/root/reference/Demix/dNMF.py:187-189``) over a (possibly
    zero-weight-padded) frame batch.

    Args:
      beta: full ``[T, 10, 3]`` (differentiated; only ``times`` rows get
        nonzero gradient).
      times: ``[B]`` frame indices; weights: ``[B]`` 1 for real frames,
        0 for padding.
      y_block: ``[B, P]`` observed frames.
    """
    betas = jnp.take(beta, times, axis=0)
    c_blk = jnp.take(c, times, axis=1).T  # [B, K]
    recon = reconstruct(betas, c_blk, pos, sigma, model, voxel_basis,
                        stored_a)
    p = recon.shape[-1]
    sse = jnp.sum((recon - y_block) ** 2, axis=-1)  # [B]
    denom = jnp.maximum(jnp.sum(weights), 1.0)
    mse = jnp.sum(sse * weights) / (denom * p)
    reg = jac_ops.corner_regularizer(
        betas, model.size, detach=model.deformation.detach_regularizer,
        scaling=model.deformation.basis_scaling,
    )
    reg_mean = jnp.sum(reg * weights) / denom
    return mse + gamma * reg_mean, (mse, reg_mean)


@functools.partial(
    jax.jit,
    static_argnames=("model", "optimizer", "gamma"),
)
def motion_epoch_parity(
    state: DNMFState,
    video_flat: jnp.ndarray,
    batch_times: jnp.ndarray,
    batch_weights: jnp.ndarray,
    model: ModelConfig,
    optimizer: optax.GradientTransformation,
    gamma: float,
) -> Tuple[DNMFState, dict]:
    """One epoch of the reference schedule: serial Adam over mini-batches.

    Args:
      video_flat: ``[T, P]`` frames (device-resident).
      batch_times: ``[num_batches, B]`` frame indices per batch.
      batch_weights: ``[num_batches, B]`` validity mask (partial batches).

    Returns:
      Updated state + per-epoch mean metrics.
    """
    vb = model_voxel_basis(model)
    stored_a = _maybe_stored_a(state, model, vb)

    def step(carry, xs):
        beta, opt_state = carry
        times, weights = xs
        y_block = jnp.take(video_flat, times, axis=0)
        grad_fn = jax.value_and_grad(batch_loss, has_aux=True)
        (_, (mse, reg)), g = grad_fn(
            beta, times, weights, y_block, state.c, state.pos, state.sigma,
            model, vb, gamma, stored_a,
        )
        updates, opt_state = optimizer.update(g, opt_state, beta)
        beta = optax.apply_updates(beta, updates)
        return (beta, opt_state), (mse, reg)

    (beta, opt_state), (mses, regs) = jax.lax.scan(
        step, (state.beta, state.opt_state), (batch_times, batch_weights)
    )
    metrics = {"recon_mse": jnp.mean(mses), "reg": jnp.mean(regs)}
    return state._replace(beta=beta, opt_state=opt_state), metrics


@functools.partial(
    jax.jit,
    static_argnames=("model", "optimizer", "gamma", "frame_block",
                     "use_pallas", "pallas_interpret"),
)
def motion_epoch_parallel(
    state: DNMFState,
    video_flat: jnp.ndarray,
    model: ModelConfig,
    optimizer: optax.GradientTransformation,
    gamma: float,
    frame_block: int = 16,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> Tuple[DNMFState, dict]:
    """TPU-native epoch: one Adam step with per-frame gradients.

    Per-frame losses are independent given C and Adam is elementwise, so
    this is per-frame Adam, vmapped — gradients stream in frame blocks so
    only ``[frame_block, P, K]`` of footprints is ever live.  With
    ``use_pallas`` (analytic footprint mode only) the data term and its
    analytic gradient come from the fused Pallas kernel — the footprint
    matrix never touches HBM.
    """
    t = video_flat.shape[0]
    grads, mses, regs = frame_grads_local(
        state, video_flat, model, gamma, frame_block,
        use_pallas=use_pallas, pallas_interpret=pallas_interpret,
    )
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.beta)
    beta = optax.apply_updates(state.beta, updates)
    metrics = {"recon_mse": jnp.mean(mses), "reg": jnp.mean(regs)}
    return state._replace(beta=beta, opt_state=opt_state), metrics


def frame_grads_local(
    state: DNMFState,
    video_loc: jnp.ndarray,
    model: ModelConfig,
    gamma: float,
    frame_block: int,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    vb: Optional[jnp.ndarray] = None,
    p_offset: Optional[jnp.ndarray] = None,
):
    """Per-frame loss gradients for a (local) set of frames.

    The single compute body shared by the single-device epoch, the
    shard_map per-shard function, and the host-streamed path — one place
    for the pallas dispatch, precision, padding, and scan logic.

    Pixel-sharded (TP) inputs, analytic mode only:

    * XLA path: ``vb`` overrides the voxel basis with each shard's
      ``[P_local, 10]`` slice so footprints evaluate only on local
      voxels.
    * Pallas path: ``p_offset`` (traced scalar) gives the shard's global
      voxel offset; the fused kernels derive local coordinates from it.

    Returns ``(grads [Tl, 10, 3], mses [Tl], regs [Tl])`` — on a pixel
    shard, the data terms are partial (local-voxel) values whose
    pixel-axis ``psum/npix`` reproduces the global ones.
    """
    pixel_local = vb is not None or p_offset is not None
    if pixel_local and model.deformation.footprint_mode != "analytic":
        raise ValueError(
            "pixel-sharded gradients require analytic footprints"
        )
    if use_pallas and vb is not None and p_offset is None:
        raise ValueError(
            "pixel-sharded pallas gradients need p_offset (the fused "
            "kernels derive coordinates from the voxel offset, not vb)"
        )
    if vb is None:
        vb = model_voxel_basis(model)
    stored_a = _maybe_stored_a(state, model, vb)
    tl, p = video_loc.shape

    reg_fn = functools.partial(
        jac_ops.corner_regularizer, size=model.size,
        detach=model.deformation.detach_regularizer,
        scaling=model.deformation.basis_scaling,
    )

    if use_pallas:
        if model.deformation.footprint_mode != "analytic":
            raise ValueError("pallas path requires analytic footprints")
        pk = _pick_pallas(model.num_neurons)

        def grad_fn(beta_blk, y_blk, c_blk):
            mses, dbetas = pk.motion_block(
                beta_blk, state.pos, state.sigma, c_blk, y_blk,
                model.size, scaling=model.deformation.basis_scaling,
                p_offset=p_offset, interpret=pallas_interpret,
            )
            regs, dregs = jax.vmap(jax.value_and_grad(reg_fn))(beta_blk)
            return (mses, regs), dbetas + gamma * dregs
    else:
        def frame_loss(beta_t, y_t, c_t):
            a = frame_footprints(beta_t, state.pos, state.sigma, model,
                                 vb, stored_a)
            recon = jnp.dot(a, c_t,
                            precision=jax.lax.Precision.HIGHEST)
            mse = jnp.mean((recon - y_t) ** 2)
            reg = reg_fn(beta_t)
            return mse + gamma * reg, (mse, reg)

        vg = jax.vmap(jax.value_and_grad(frame_loss, has_aux=True))

        def grad_fn(beta_blk, y_blk, c_blk):
            (_, (mses, regs)), g = vg(beta_blk, y_blk, c_blk)
            return (mses, regs), g

    fb = min(frame_block, tl)
    pad = (-tl) % fb
    beta_p = jnp.concatenate(
        [state.beta, basis_ops.identity_beta(pad)], axis=0
    ) if pad else state.beta
    y_p = jnp.pad(video_loc, ((0, pad), (0, 0))) if pad else video_loc
    c_p = jnp.pad(state.c, ((0, 0), (0, pad))) if pad else state.c
    nb = (tl + pad) // fb

    def block(_, xs):
        beta_blk, y_blk, c_blk = xs
        (mse, reg), g = grad_fn(beta_blk, y_blk, c_blk)
        return None, (g, mse, reg)

    _, (grads, mses, regs) = jax.lax.scan(
        block, None,
        (beta_p.reshape(nb, fb, 10, 3), y_p.reshape(nb, fb, p),
         c_p.T.reshape(nb, fb, -1)),
    )
    return (grads.reshape(-1, 10, 3)[:tl], mses.reshape(-1)[:tl],
            regs.reshape(-1)[:tl])


def grams_local(
    state: DNMFState,
    video_loc: jnp.ndarray,
    model: ModelConfig,
    frame_block: int,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    vb: Optional[jnp.ndarray] = None,
    p_offset: Optional[jnp.ndarray] = None,
    gram_mode: str = "exact",
    gram_window: Optional[int] = None,
):
    """Per-frame MU statistics for a (local) set of frames — the shared
    body behind ``compute_grams`` and the sharded/streamed variants.

    ``gram_mode="analytic"`` evaluates ``G`` in closed form
    (:mod:`dnmf_tpu.ops.gram_analytic` — O(K^2) instead of the
    O(P K^2) pixel reduction) and runs only the ``c1`` video pass;
    requires analytic footprints and whole-volume frames (the global
    closed form cannot be pixel-sharded without double counting).

    Pixel-sharded (TP) inputs, analytic mode only: the XLA path takes
    ``vb`` (each shard's ``[P_local, 10]`` basis slice); the Pallas path
    takes ``p_offset`` (traced global voxel offset of the shard).  The
    returned Grams are then partial sums over local voxels whose
    pixel-axis ``psum`` is the global Gram.

    Returns ``(grams [Tl, K, K], c1 [Tl, K])``.
    """
    pixel_local = vb is not None or p_offset is not None
    if pixel_local and model.deformation.footprint_mode != "analytic":
        raise ValueError(
            "pixel-sharded Grams require analytic footprints"
        )
    if use_pallas and vb is not None and p_offset is None:
        raise ValueError(
            "pixel-sharded pallas Grams need p_offset (the fused "
            "kernels derive coordinates from the voxel offset, not vb)"
        )
    analytic_g = gram_mode == "analytic"
    if gram_mode not in ("exact", "analytic"):
        raise ValueError(f"unknown gram_mode: {gram_mode!r}")
    if analytic_g:
        if pixel_local:
            raise ValueError(
                "gram_mode='analytic' computes the GLOBAL Gram in "
                "closed form — pixel-sharded partial sums would "
                "double-count under psum; use gram_mode='exact' on "
                "pixel meshes"
            )
        if model.deformation.footprint_mode != "analytic":
            raise ValueError(
                "gram_mode='analytic' requires analytic footprints"
            )
    if vb is None:
        vb = model_voxel_basis(model)
    stored_a = _maybe_stored_a(state, model, vb)
    tl, p = video_loc.shape

    fb = min(frame_block, tl)
    pad = (-tl) % fb
    beta_p = jnp.concatenate(
        [state.beta, basis_ops.identity_beta(pad)], axis=0
    ) if pad else state.beta
    y_p = jnp.pad(video_loc, ((0, pad), (0, 0))) if pad else video_loc
    nb = (tl + pad) // fb

    scaling = model.deformation.basis_scaling
    if analytic_g:
        from dnmf_tpu.ops import gram_analytic as ga

        # The window must cover the ACTUAL sigmas (state.sigma is
        # traced, so callers that scale sigma — e.g. the trainer's
        # sigma_anneal — pass a static gram_window bound; the default
        # covers model.shape_std only).
        window = gram_window or ga.default_window(model.shape_std)

        def gram_fn(beta_blk):
            return ga.analytic_grams(
                beta_blk, state.pos, state.sigma, model.size,
                scaling=scaling, window=window,
            )

    if use_pallas:
        if model.deformation.footprint_mode != "analytic":
            raise ValueError("pallas path requires analytic footprints")
        pk = _pick_pallas(model.num_neurons)

        if analytic_g:
            from dnmf_tpu.ops import pallas_culled as pc

            c1_params = _CulledShim._params("culled_c1",
                                            state.pos.shape[0])

            def block(_, xs):
                beta_blk, y_blk = xs
                c1 = pc.c1_block_culled(
                    beta_blk, state.pos, state.sigma, y_blk,
                    model.size, scaling=scaling,
                    interpret=pallas_interpret, **c1_params,
                )
                return None, (gram_fn(beta_blk), c1)
        else:
            def block(_, xs):
                beta_blk, y_blk = xs
                g, c1 = pk.gram_block(
                    beta_blk, state.pos, state.sigma, y_blk, model.size,
                    scaling=scaling,
                    p_offset=p_offset, interpret=pallas_interpret,
                )
                return None, (g, c1)
    else:
        def one(beta_t, y_t):
            a = frame_footprints(beta_t, state.pos, state.sigma, model,
                                 vb, stored_a)
            if analytic_g:
                return jnp.dot(a.T, y_t,
                               precision=jax.lax.Precision.HIGHEST)
            return mu_ops.mu_grams(a, y_t)

        if analytic_g:
            def block(_, xs):
                beta_blk, y_blk = xs
                c1 = jax.vmap(one)(beta_blk, y_blk)
                return None, (gram_fn(beta_blk), c1)
        else:
            def block(_, xs):
                beta_blk, y_blk = xs
                g, c1 = jax.vmap(one)(beta_blk, y_blk)
                return None, (g, c1)

    _, (grams, c1) = jax.lax.scan(
        block, None,
        (beta_p.reshape(nb, fb, 10, 3), y_p.reshape(nb, fb, p)),
    )
    k = state.c.shape[0]
    return grams.reshape(-1, k, k)[:tl], c1.reshape(-1, k)[:tl]


def _maybe_stored_a(state: DNMFState, model: ModelConfig,
                    voxel_basis: jnp.ndarray):
    if model.deformation.footprint_mode != "resample":
        return None
    grid = basis_ops.voxel_grid(model.size)
    return fp_ops.gaussian_footprints(grid, state.pos, state.sigma)


@functools.partial(
    jax.jit, static_argnames=("model", "frame_block", "use_pallas",
                              "pallas_interpret", "gram_mode",
                              "gram_window")
)
def compute_grams(
    state: DNMFState,
    video_flat: jnp.ndarray,
    model: ModelConfig,
    frame_block: int = 16,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    gram_mode: str = "exact",
    gram_window: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-frame MU Grams, streamed over frame blocks.

    Returns ``(grams[T, K, K], c1[T, K])`` — the one-time O(P K^2 T)
    reduction that the reference recomputed every MU iteration.  With
    ``use_pallas`` the fused kernel accumulates each frame's Gram in VMEM
    (analytic footprint mode only).  ``gram_mode="analytic"`` replaces
    the pixel reduction for ``G`` with the closed form
    (:mod:`dnmf_tpu.ops.gram_analytic`).
    """
    return grams_local(
        state, video_flat, model, frame_block,
        use_pallas=use_pallas, pallas_interpret=pallas_interpret,
        gram_mode=gram_mode, gram_window=gram_window,
    )


@functools.partial(
    jax.jit, static_argnames=("iters", "gamma", "solver"),
)
def footprint_update(
    state: DNMFState,
    grams: jnp.ndarray,
    c1: jnp.ndarray,
    iters: int,
    gamma: float = 0.0,
    solver: str = "mu",
) -> DNMFState:
    """``iters`` trace updates on precomputed Grams (replaces reference
    ``update_footprints``'s host NumPy loop).

    ``solver="mu"`` is the reference's multiplicative rule
    (``/root/reference/Demix/dNMF.py:139-149``); ``"fista"`` solves the
    same convex subproblem by accelerated projected gradient
    (:func:`dnmf_tpu.ops.mu.nnls_temporal`) — same per-iteration cost,
    O(1/k^2) convergence on correlated (overlapping-neuron) Grams.
    """
    g = gamma if gamma else None
    if solver == "mu":
        c = mu_ops.run_mu_temporal(state.c, grams, c1, iters=iters,
                                   gamma=g)
    elif solver == "fista":
        c = mu_ops.nnls_temporal(state.c, grams, c1, iters=iters,
                                 gamma=g)
    else:
        raise ValueError(f"unknown trace solver: {solver!r}")
    return state._replace(c=c)


@functools.partial(
    jax.jit,
    static_argnames=("model", "steps", "lr", "lo", "hi", "frame_block",
                     "use_pallas", "pallas_interpret"),
)
def sigma_fit(
    state: DNMFState,
    video_sub: jnp.ndarray,
    betas_sub: jnp.ndarray,
    c_sub: jnp.ndarray,
    model: ModelConfig,
    steps: int = 4,
    lr: float = 0.02,
    lo: float = 1.5,
    hi: float = 4.8,
    frame_block: int = 8,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-neuron footprint-width fit: ``steps`` Adam iterations on
    log-sigma against a frame subsample.

    BEYOND the reference's model class: the reference freezes sigma at
    the scalar ``shape_std`` forever (``/root/reference/Demix/dNMF.py:29``),
    so dim / misshapen / atypically-sized neurons are stuck with the
    global width — the measured per-neuron recovery tail.  Here sigma
    joins the alternation — ``[K]`` scalar widths or ``[K, 3]``
    PER-AXIS widths (``ModelConfig.sigma_axes == 3``; anisotropic
    z-elongated/flattened neurons): the data-term gradient wrt each
    neuron's width(s) comes from the fused culled kernel
    (:func:`dnmf_tpu.ops.pallas_culled.refine_block_culled` with
    ``want_dsigma=True`` — per-axis second moments) or XLA autodiff,
    averaged over a frame subsample (sigma is shared across frames, so
    a subsample estimates the full-recording gradient at a fraction of
    the cost).

    Args:
      video_sub: ``[S, P]`` subsampled frames.
      betas_sub: ``[S, 10, 3]`` their warps; c_sub: ``[S, K]`` traces.
      steps: Adam iterations (each re-evaluates all S frames).
      lr: Adam learning rate in log-sigma space.
      lo / hi: sigma clip bounds in PIXELS (keep ``hi`` inside the
        analytic-Gram window bound — the trainer derives both).

    Returns ``(sigma, mse_trace [steps])`` — sigma in the input shape.
    """
    s_frames, p = video_sub.shape
    k = state.c.shape[0]
    vb = model_voxel_basis(model)
    optimizer = optax.adam(lr)
    fb = min(frame_block, s_frames)
    pad = (-s_frames) % fb
    nb = (s_frames + pad) // fb
    betas_p = jnp.concatenate(
        [betas_sub, basis_ops.identity_beta(pad)], axis=0
    ) if pad else betas_sub
    y_p = jnp.pad(video_sub, ((0, pad), (0, 0))) if pad else video_sub
    c_p = jnp.pad(c_sub, ((0, pad), (0, 0))) if pad else c_sub

    if use_pallas:
        if model.deformation.footprint_mode != "analytic":
            raise ValueError("fused sigma fit requires analytic "
                             "footprints")
        from dnmf_tpu.ops import pallas_culled as pc

        params = _CulledShim._params("culled_refine", k)
        kb = params.get("kblock", _CulledShim._tuning(k)[0])
        tp = params.get("tile_p", _CulledShim._tuning(k)[1])
        # Honor the swept frames_per_step too (the k=200/500 winners are
        # 2/1, far from the kernel's default 8), capped by the block
        # size so short blocks don't pad up to phantom kernel frames.
        fps = min(int(params.get("frames_per_step", 8)), fb)

        def grads_for(sigma):
            pos_b = jnp.broadcast_to(state.pos[None],
                                     (fb,) + state.pos.shape)

            def block(_, xs):
                beta_blk, y_blk, c_blk = xs
                mses, _, dsig = pc.refine_block_culled(
                    beta_blk, pos_b, sigma, c_blk, y_blk, model.size,
                    scaling=model.deformation.basis_scaling,
                    tile_p=tp, kblock=kb, frames_per_step=fps,
                    want_dsigma=True,
                    interpret=pallas_interpret,
                )
                return None, (jnp.sum(dsig, axis=0), jnp.sum(mses))

            _, (dsigs, mses) = jax.lax.scan(
                block, None,
                (betas_p.reshape(nb, fb, 10, 3),
                 y_p.reshape(nb, fb, p), c_p.reshape(nb, fb, k)),
            )
            return jnp.sum(dsigs, axis=0) / s_frames, \
                jnp.sum(mses) / s_frames
    else:
        # In resample mode the stored footprint volume must be built
        # from the TRACED sigma (not state.sigma) or the gradient is
        # identically zero — grid_sample only moves values around, it
        # never re-widens them.  Differentiate the scanned total so the
        # [P, K] volume is built once per Adam step, not per frame.
        resample = model.deformation.footprint_mode == "resample"
        grid = basis_ops.voxel_grid(model.size) if resample else None

        def total_mse(sigma):
            stored_a = (
                fp_ops.gaussian_footprints(grid, state.pos, sigma)
                if resample else None
            )

            def frame_loss(beta_t, y_t, c_t):
                a = frame_footprints(beta_t, state.pos, sigma, model,
                                     vb, stored_a)
                recon = jnp.dot(a, c_t,
                                precision=jax.lax.Precision.HIGHEST)
                return jnp.mean((recon - y_t) ** 2)

            def block(acc, xs):
                beta_blk, y_blk, c_blk = xs
                mses = jax.vmap(frame_loss)(beta_blk, y_blk, c_blk)
                return acc + jnp.sum(mses), None

            total, _ = jax.lax.scan(
                block, jnp.float32(0.0),
                (betas_p.reshape(nb, fb, 10, 3),
                 y_p.reshape(nb, fb, p), c_p.reshape(nb, fb, k)),
            )
            return total / s_frames

        vg_total = jax.value_and_grad(total_mse)

        def grads_for(sigma):
            mse, g = vg_total(sigma)
            return g, mse

    log_lo, log_hi = float(np.log(lo)), float(np.log(hi))

    def step(carry, _):
        log_s, opt_state = carry
        sigma = jnp.exp(log_s)
        dsig, mse = grads_for(sigma)
        g_log = dsig * sigma  # d/dlog(s) = s d/ds
        updates, opt_state = optimizer.update(g_log, opt_state, log_s)
        log_s = jnp.clip(optax.apply_updates(log_s, updates),
                         log_lo, log_hi)
        return (log_s, opt_state), mse

    log_s0 = jnp.clip(jnp.log(state.sigma), log_lo, log_hi)
    (log_s, _), mses = jax.lax.scan(
        step, (log_s0, optimizer.init(log_s0)), None, length=steps
    )
    return jnp.exp(log_s), mses


def spatial_pushforward(
    state: DNMFState,
    video_flat: jnp.ndarray,
    model: ModelConfig,
    frame_block: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warped footprints + inverse-warped video for all frames.

    Equivalent of ``ExponentialFP.spatial_pushforward``
    (``/root/reference/Demix/dNMF.py:70-93``) — exposed for diagnostics /
    visualization (the MU path no longer needs the full ``A`` tensor).

    Returns ``(a_all[T, P, K], y_inv[T, P])``.  Only call at sizes where
    ``T*P*K`` fits in memory.
    """
    from dnmf_tpu.ops.interp import inverse_warp_nearest

    vb = model_voxel_basis(model)
    stored_a = _maybe_stored_a(state, model, vb)

    def one(beta_t, y_t):
        psi = basis_ops.warp_voxel_coords(
            vb, beta_t, model.size, model.deformation.basis_scaling
        )
        a = frame_footprints(beta_t, state.pos, state.sigma, model, vb,
                             stored_a)
        y_i = inverse_warp_nearest(y_t, psi, model.size)
        return a, y_i

    return jax.lax.map(
        lambda xs: one(*xs), (state.beta, video_flat),
        batch_size=frame_block,
    )


# ----------------------------------------------------------------------
# Host-streamed variants (videos larger than device memory)
# ----------------------------------------------------------------------
@functools.partial(
    jax.jit,
    static_argnames=("model", "gamma", "block", "use_pallas",
                     "pallas_interpret"),
)
def _stream_block_grads(
    state: DNMFState,
    frames: jnp.ndarray,
    start: jnp.ndarray,
    valid: jnp.ndarray,
    model: ModelConfig,
    gamma: float,
    block: int,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
):
    """Per-frame loss grads for one host-streamed frame block.

    One compiled program serves every block: the final partial block is
    zero-padded and masked via ``valid``.  Pads beta/C before slicing —
    dynamic_slice clamps out-of-range starts, which would otherwise hand
    the final block earlier frames' coefficients.
    """
    beta_pad = jnp.concatenate(
        [state.beta, basis_ops.identity_beta(block)], axis=0
    )
    c_pad = jnp.pad(state.c, ((0, 0), (0, block)))
    state_loc = state._replace(
        beta=jax.lax.dynamic_slice_in_dim(beta_pad, start, block),
        c=jax.lax.dynamic_slice_in_dim(c_pad, start, block, axis=1),
    )
    grads, mses, regs = frame_grads_local(
        state_loc, frames, model, gamma, block,
        use_pallas=use_pallas, pallas_interpret=pallas_interpret,
    )
    mask = (jnp.arange(block) < valid).astype(jnp.float32)
    return (grads * mask[:, None, None], jnp.sum(mses * mask),
            jnp.sum(regs * mask))


def motion_epoch_streaming(
    state: DNMFState,
    source,
    model: ModelConfig,
    optimizer: optax.GradientTransformation,
    gamma: float,
    use_pallas: bool = False,
) -> Tuple[DNMFState, dict]:
    """One parallel-mode epoch over a host-streamed video.

    Per-frame gradients are collected block-by-block (host->device
    transfer per block), then a single full-tensor Adam step applies —
    identical math to ``motion_epoch_parallel``.
    """
    grad_blocks = []
    mses, regs = [], []
    for frames, start, valid in source.blocks():
        g, ms, rs = _stream_block_grads(
            state, frames, start, valid, model, gamma, source.block,
            use_pallas=use_pallas,
        )
        # Keep per-block metrics as device scalars: a host read here
        # would synchronize the loop every block and serialize the
        # host->device transfers against compute.
        grad_blocks.append(g)
        mses.append(ms)
        regs.append(rs)
    t = state.beta.shape[0]
    grads = jnp.concatenate(grad_blocks, axis=0)[:t]
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.beta)
    beta = optax.apply_updates(state.beta, updates)
    metrics = {"recon_mse": jnp.stack(mses).sum() / t,
               "reg": jnp.stack(regs).sum() / t}
    return state._replace(beta=beta, opt_state=opt_state), metrics


@functools.partial(
    jax.jit,
    static_argnames=("model", "block", "use_pallas", "pallas_interpret",
                     "gram_mode", "gram_window"),
)
def _stream_block_grams(
    state: DNMFState,
    frames: jnp.ndarray,
    start: jnp.ndarray,
    model: ModelConfig,
    block: int,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    gram_mode: str = "exact",
    gram_window: Optional[int] = None,
):
    beta_pad = jnp.concatenate(
        [state.beta, basis_ops.identity_beta(block)], axis=0
    )
    state_loc = state._replace(
        beta=jax.lax.dynamic_slice_in_dim(beta_pad, start, block)
    )
    return grams_local(
        state_loc, frames, model, block,
        use_pallas=use_pallas, pallas_interpret=pallas_interpret,
        gram_mode=gram_mode, gram_window=gram_window,
    )


def compute_grams_streaming(
    state: DNMFState,
    source,
    model: ModelConfig,
    use_pallas: bool = False,
    gram_mode: str = "exact",
    gram_window: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-frame MU Grams over a host-streamed video."""
    gs, c1s = [], []
    for frames, start, valid in source.blocks():
        g, c1 = _stream_block_grams(
            state, frames, start, model, source.block,
            use_pallas=use_pallas, gram_mode=gram_mode,
            gram_window=gram_window,
        )
        gs.append(g)
        c1s.append(c1)
    t = state.beta.shape[0]
    return (jnp.concatenate(gs, axis=0)[:t],
            jnp.concatenate(c1s, axis=0)[:t])


@functools.partial(
    jax.jit,
    static_argnames=("model", "optimizer", "rounds", "epochs", "mu_iters",
                     "gamma", "mu_gamma", "frame_block", "use_pallas",
                     "pallas_interpret", "gram_mode", "gram_window",
                     "trace_solver"),
)
def fused_rounds(
    state: DNMFState,
    video_flat: jnp.ndarray,
    model: ModelConfig,
    optimizer: optax.GradientTransformation,
    rounds: int,
    epochs: int,
    mu_iters: int,
    gamma: float,
    mu_gamma: float = 0.0,
    frame_block: int = 16,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    gram_mode: str = "exact",
    gram_window: Optional[int] = None,
    trace_solver: str = "mu",
) -> Tuple[DNMFState, dict]:
    """The full alternation schedule as ONE compiled program.

    ``rounds x (epochs x Adam-on-beta + Grams + mu_iters x MU-on-C)``
    under nested ``lax.scan`` — a single device dispatch for the whole
    fit (the reference round-trips host<->device every batch).  Returns
    per-round metric traces ``[rounds]``.  ``gram_mode="analytic"``
    swaps the Gram pixel reduction for the closed form
    (:mod:`dnmf_tpu.ops.gram_analytic`).
    """
    if trace_solver not in ("mu", "fista"):
        raise ValueError(f"unknown trace solver: {trace_solver!r}")

    def one_epoch(st, _):
        grads, mses, regs = frame_grads_local(
            st, video_flat, model, gamma, frame_block,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
        )
        updates, opt_state = optimizer.update(grads, st.opt_state,
                                              st.beta)
        beta = optax.apply_updates(st.beta, updates)
        return (st._replace(beta=beta, opt_state=opt_state),
                (jnp.mean(mses), jnp.mean(regs)))

    def one_round(st, _):
        st, (mses, regs) = jax.lax.scan(one_epoch, st, None,
                                        length=epochs)
        grams, c1 = grams_local(
            st, video_flat, model, frame_block,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
            gram_mode=gram_mode, gram_window=gram_window,
        )
        mg = mu_gamma if mu_gamma else None
        if trace_solver == "fista":
            c = mu_ops.nnls_temporal(st.c, grams, c1, iters=mu_iters,
                                     gamma=mg)
        else:
            c = mu_ops.run_mu_temporal(st.c, grams, c1, iters=mu_iters,
                                       gamma=mg)
        st = st._replace(c=c)
        return st, {"recon_mse": mses[-1], "reg": regs[-1]}

    return jax.lax.scan(one_round, state, None, length=rounds)
