"""Per-frame per-neuron position refinement — beyond the reference's
model class.

The reference's model (and :mod:`dnmf_tpu.models.dnmf`) explains all
motion with ONE quadratic warp per frame
(``/root/reference/Demix/dNMF.py:53-62``).  On recordings whose neurons
move semi-independently (e.g. GP motion with a length scale comparable
to neuron spacing — the reference demo fixture,
``/root/reference/demo.py:26-28``) that class saturates: the best global
quadratic warp through the ground-truth trajectories leaves ~0.4 px mean
/ 1.6 px max per-neuron residual on the hard fixture and caps trace
correlation at ~0.90 (measured; see BASELINE.md), while footprints
anchored at the true per-frame positions recover traces exactly.

This module closes that gap with a final-polish phase: per-frame,
per-neuron position offsets fitted by gradient descent against the
reconstruction, alternated with MU trace updates on per-frame-position
Grams.  The deformation model is untouched — positions are refined in
the model's warped coordinate frame, so ``A_t[p, k] =
exp(-|psi_t(p) - pos_t[k]|^2 / sigma_k^2)`` with ``pos_t`` initialized
at the shared anchors.  A quadratic prior tethers each neuron to its
anchor (scaled in pixels), which keeps unidentified neurons (silent
frames) in place.

Per-frame problems are independent — the epoch vmaps over frames and
scans over frame blocks, exactly like the parallel deformation epoch.
With ``use_pallas`` the data term + dpos gradient and the tracked MU
Grams come from fused neuron-culled kernels
(:func:`dnmf_tpu.ops.pallas_culled.refine_block_culled`,
:func:`~dnmf_tpu.ops.pallas_culled.gram_block_tracked`) that never
materialize the ``[P, K]`` footprint stack — at whole-brain scale the
XLA autodiff path's per-frame [5.2M, K] residency makes refinement
memory-bound, exactly the wall the dbeta kernels removed for the
deformation fit.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dnmf_tpu.config import ModelConfig
from dnmf_tpu.models.dnmf import DNMFState, model_voxel_basis
from dnmf_tpu.ops import basis as basis_ops
from dnmf_tpu.ops import footprints as fp_ops
from dnmf_tpu.ops import mu as mu_ops


def _tracked_frame_footprints(beta_t, pos_t, sigma, model, vb):
    """``[P, K]`` footprints with this frame's own anchors (analytic)."""
    if model.deformation.footprint_mode != "analytic":
        raise ValueError("position refinement requires analytic "
                         "footprints")
    psi = basis_ops.warp_voxel_coords(
        vb, beta_t, model.size, model.deformation.basis_scaling
    )
    return fp_ops.evaluate_footprints(
        psi, pos_t, sigma, size=model.size,
        mask_out_of_bounds=model.deformation.mask_out_of_bounds,
    )


def _refine_tuning(num_neurons: int) -> dict:
    """Fused-refinement kernel parameters: the dbeta kernels' sweep
    optima as the static fallback, overridden by any measured
    ``culled_refine`` cache entry (kblock / tile_p / frames_per_step —
    ``tools/autotune.py`` sweeps all three)."""
    from dnmf_tpu.models.dnmf import _CulledShim

    return _CulledShim._params("culled_refine", num_neurons)


@functools.partial(
    jax.jit,
    static_argnames=("model", "epochs", "frame_block", "use_pallas",
                     "pallas_interpret"),
)
def refine_positions(
    state: DNMFState,
    pos_t: Optional[jnp.ndarray],
    video_flat: jnp.ndarray,
    model: ModelConfig,
    epochs: int = 20,
    learning_rate: float = 0.05,
    prior: float = 1e-3,
    frame_block: int = 16,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> Tuple[jnp.ndarray, dict]:
    """Fit per-frame neuron positions by Adam against the reconstruction.

    Args:
      state: current factors (beta, C, anchors, sigma) — not modified.
      pos_t: ``[T, K, 3]`` starting positions, or None to start at the
        anchors broadcast over frames.
      video_flat: ``[T, P]``.
      epochs: Adam steps (each sees every frame; frames independent).
      learning_rate: Adam lr in PIXELS (positions live in pixel space).
      prior: weight of ``mean(|pos_t - anchor|^2)`` per frame, in units
        of the (dimensionless) data MSE per squared pixel.
      use_pallas: data term + gradient via the fused culled kernel
        (:func:`dnmf_tpu.ops.pallas_culled.refine_block_culled`) —
        required at whole-brain scale, where XLA autodiff materializes
        the per-frame ``[P, K]`` footprint stack.

    Returns:
      ``(pos_t [T, K, 3], {"recon_mse": [T]})``.
    """
    t, p = video_flat.shape
    k = state.pos.shape[0]
    anchors = state.pos
    if pos_t is None:
        pos_t = jnp.broadcast_to(anchors[None], (t,) + anchors.shape)
    vb = model_voxel_basis(model)
    optimizer = optax.adam(learning_rate)

    if use_pallas:
        if model.deformation.footprint_mode != "analytic":
            raise ValueError("fused refinement requires analytic "
                             "footprints")
        from dnmf_tpu.ops import pallas_culled as pc

        tune = _refine_tuning(k)
        c_t = state.c.T  # [T, K]

        def epoch_fused(carry, _):
            pos_all, opt_state = carry
            mses, dpos = pc.refine_block_culled(
                state.beta, pos_all, state.sigma, c_t, video_flat,
                model.size, scaling=model.deformation.basis_scaling,
                interpret=pallas_interpret, **tune,
            )
            # Anchor-tether gradient: d/dpos mean_k |pos - anchor|^2.
            g_all = dpos + (2.0 * prior / k) * (pos_all - anchors[None])
            updates, opt_state = optimizer.update(g_all, opt_state,
                                                  pos_all)
            return (optax.apply_updates(pos_all, updates),
                    opt_state), mses

        opt_state = optimizer.init(pos_t)
        (pos_out, _), mses = jax.lax.scan(
            epoch_fused, (pos_t, opt_state), None, length=epochs
        )
        return pos_out, {"recon_mse": mses[-1]}

    def frame_loss(pos_f, beta_f, y_f, c_f):
        a = _tracked_frame_footprints(beta_f, pos_f, state.sigma, model,
                                      vb)
        recon = jnp.dot(a, c_f, precision=jax.lax.Precision.HIGHEST)
        mse = jnp.mean((recon - y_f) ** 2)
        tether = jnp.mean(jnp.sum((pos_f - anchors) ** 2, axis=-1))
        return mse + prior * tether, mse

    grad_fn = jax.vmap(jax.value_and_grad(frame_loss, has_aux=True))

    fb = min(frame_block, t)
    pad = (-t) % fb
    nb = (t + pad) // fb

    def pad_t(x, fill=0.0):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill) if pad else x

    beta_b = pad_t(state.beta).reshape(nb, fb, 10, 3)
    y_b = pad_t(video_flat).reshape(nb, fb, p)
    c_b = pad_t(state.c.T).reshape(nb, fb, -1)

    def epoch(carry, _):
        pos_all, opt_state = carry

        def block(_, xs):
            pos_blk, beta_blk, y_blk, c_blk = xs
            (_, mses), g = grad_fn(pos_blk, beta_blk, y_blk, c_blk)
            return None, (g, mses)

        pos_b = pos_all.reshape(nb, fb, *pos_all.shape[1:])
        _, (g_b, mses) = jax.lax.scan(block, None,
                                      (pos_b, beta_b, y_b, c_b))
        g_all = g_b.reshape(pos_all.shape)
        updates, opt_state = optimizer.update(g_all, opt_state, pos_all)
        return (optax.apply_updates(pos_all, updates), opt_state), mses

    pos_pad = pad_t(pos_t)
    opt_state = optimizer.init(pos_pad)
    (pos_out, _), mses = jax.lax.scan(epoch, (pos_pad, opt_state), None,
                                      length=epochs)
    return pos_out[:t], {"recon_mse": mses[-1].reshape(-1)[:t]}


@functools.partial(jax.jit, static_argnames=("model", "frame_block",
                                              "use_pallas",
                                              "pallas_interpret",
                                              "gram_mode",
                                              "gram_window"))
def tracked_grams(
    state: DNMFState,
    pos_t: jnp.ndarray,
    video_flat: jnp.ndarray,
    model: ModelConfig,
    frame_block: int = 16,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    gram_mode: str = "exact",
    gram_window=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-frame MU statistics ``(G [T,K,K], c1 [T,K])`` with per-frame
    positions (the tracked analog of ``dnmf.compute_grams``).

    ``gram_mode="analytic"``: closed-form ``G`` at the tracked anchors
    (:func:`dnmf_tpu.ops.gram_analytic.analytic_grams_tracked`) + the
    c1-only video pass."""
    t, p = video_flat.shape
    vb = model_voxel_basis(model)
    if gram_mode not in ("exact", "analytic"):
        raise ValueError(f"unknown gram_mode: {gram_mode!r}")
    analytic_g = gram_mode == "analytic"
    if analytic_g and model.deformation.footprint_mode != "analytic":
        raise ValueError("gram_mode='analytic' requires analytic "
                         "footprints")
    scaling = model.deformation.basis_scaling
    if analytic_g:
        from dnmf_tpu.ops import gram_analytic as ga

        window = gram_window or ga.default_window(model.shape_std)

        def gram_fn(beta_blk, pos_blk):
            return ga.analytic_grams_tracked(
                beta_blk, pos_blk, state.sigma, model.size,
                scaling=scaling, window=window,
            )

    if use_pallas:
        if model.deformation.footprint_mode != "analytic":
            raise ValueError("fused tracked Grams require analytic "
                             "footprints")
        from dnmf_tpu.ops import pallas_culled as pc

        tune = _refine_tuning(state.pos.shape[0])
        kb, tp = tune["kblock"], tune["tile_p"]
        if analytic_g:
            c1 = pc.c1_block_culled(
                state.beta, pos_t, state.sigma, video_flat, model.size,
                scaling=scaling, tile_p=tp, kblock=kb,
                dot_mode="split", interpret=pallas_interpret,
            )
            return gram_fn(state.beta, pos_t), c1
        return pc.gram_block_tracked(
            state.beta, pos_t, state.sigma, video_flat, model.size,
            scaling=scaling, tile_p=tp,
            kblock=kb, dot_mode="split", interpret=pallas_interpret,
        )

    def one(beta_f, pos_f, y_f):
        a = _tracked_frame_footprints(beta_f, pos_f, state.sigma, model,
                                      vb)
        c1 = jnp.dot(a.T, y_f, precision=jax.lax.Precision.HIGHEST)
        if analytic_g:
            return jnp.zeros((0,)), c1
        g = jnp.dot(a.T, a, precision=jax.lax.Precision.HIGHEST)
        return g, c1

    fb = min(frame_block, t)
    pad = (-t) % fb
    nb = (t + pad) // fb

    def pad_t(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) \
            if pad else x

    def block(_, xs):
        beta_blk, pos_blk, y_blk = xs
        return None, jax.vmap(one)(beta_blk, pos_blk, y_blk)

    _, (g, c1) = jax.lax.scan(
        block, None,
        (pad_t(state.beta).reshape(nb, fb, 10, 3),
         pad_t(pos_t).reshape(nb, fb, *pos_t.shape[1:]),
         pad_t(video_flat).reshape(nb, fb, p)),
    )
    k = state.c.shape[0]
    if analytic_g:
        return (gram_fn(state.beta, pos_t), c1.reshape(-1, k)[:t])
    return (g.reshape(-1, k, k)[:t], c1.reshape(-1, k)[:t])


def refined_rounds(
    state: DNMFState,
    video_flat: jnp.ndarray,
    model: ModelConfig,
    rounds: int = 2,
    epochs: int = 20,
    mu_iters: int = 30,
    learning_rate: float = 0.05,
    prior: float = 1e-3,
    frame_block: int = 16,
    pos_t: Optional[jnp.ndarray] = None,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    gram_mode: str = "exact",
    gram_window=None,
    trace_solver: str = "mu",
) -> Tuple[DNMFState, jnp.ndarray, dict]:
    """Alternate position refinement with tracked-Gram trace updates.

    Returns ``(state with updated C, pos_t, metrics)`` — beta and the
    anchors are untouched; ``pos_t`` holds the per-frame refinement.
    ``trace_solver="fista"`` swaps the MU trace updates for the
    accelerated projected-gradient solve (ops.mu.nnls_temporal) — the
    refinement phase targets exactly the overlapping-neuron tail where
    MU's convergence degrades.
    """
    if trace_solver not in ("mu", "fista"):
        raise ValueError(f"unknown trace solver: {trace_solver!r}")
    metrics = {}
    for _ in range(rounds):
        pos_t, metrics = refine_positions(
            state, pos_t, video_flat, model, epochs=epochs,
            learning_rate=learning_rate, prior=prior,
            frame_block=frame_block, use_pallas=use_pallas,
            pallas_interpret=pallas_interpret,
        )
        g, c1 = tracked_grams(state, pos_t, video_flat, model,
                              frame_block=frame_block,
                              use_pallas=use_pallas,
                              pallas_interpret=pallas_interpret,
                              gram_mode=gram_mode,
                              gram_window=gram_window)
        if trace_solver == "fista":
            c = mu_ops.nnls_temporal(state.c, g, c1, iters=mu_iters)
        else:
            c = mu_ops.run_mu_temporal(state.c, g, c1, iters=mu_iters)
        state = state._replace(c=c)
    return state, pos_t, metrics


@functools.partial(
    jax.jit,
    static_argnames=("model", "rounds", "epochs", "mu_iters", "block",
                     "use_pallas", "pallas_interpret", "gram_mode",
                     "gram_window", "trace_solver"),
)
def _refined_rounds_block(
    state: DNMFState,
    frames: jnp.ndarray,
    start: jnp.ndarray,
    valid: jnp.ndarray,
    pos_t_pad: jnp.ndarray,
    model: ModelConfig,
    rounds: int,
    epochs: int,
    mu_iters: int,
    learning_rate: float,
    prior: float,
    block: int,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    gram_mode: str = "exact",
    gram_window=None,
    trace_solver: str = "mu",
):
    """One streamed block's FULL refinement alternation.

    Per-frame problems are independent (positions, tracked Grams, AND
    the un-smoothed trace update all factor over frames), so the whole
    ``rounds x (epochs Adam + MU)`` schedule runs block-locally — ONE
    pass over the recording instead of ``rounds x (epochs + 1)``.  One
    compiled program serves every block (the final partial block is
    zero-padded; its outputs are masked/sliced by the caller).
    """
    beta_pad = jnp.concatenate(
        [state.beta, basis_ops.identity_beta(block)], axis=0
    )
    c_pad = jnp.pad(state.c, ((0, 0), (0, block)))
    state_loc = state._replace(
        beta=jax.lax.dynamic_slice_in_dim(beta_pad, start, block),
        c=jax.lax.dynamic_slice_in_dim(c_pad, start, block, axis=1),
    )
    pos_blk = jax.lax.dynamic_slice_in_dim(pos_t_pad, start, block)

    def one_round(carry, _):
        pos_b, st = carry
        pos_b, m = refine_positions(
            st, pos_b, frames, model, epochs=epochs,
            learning_rate=learning_rate, prior=prior,
            frame_block=block, use_pallas=use_pallas,
            pallas_interpret=pallas_interpret,
        )
        g, c1 = tracked_grams(st, pos_b, frames, model,
                              frame_block=block,
                              use_pallas=use_pallas,
                              pallas_interpret=pallas_interpret,
                              gram_mode=gram_mode,
                              gram_window=gram_window)
        if trace_solver == "fista":
            c = mu_ops.nnls_temporal(st.c, g, c1, iters=mu_iters)
        else:
            c = mu_ops.run_mu_temporal(st.c, g, c1, iters=mu_iters)
        return (pos_b, st._replace(c=c)), m["recon_mse"]

    (pos_blk, state_loc), mses = jax.lax.scan(
        one_round, (pos_blk, state_loc), None, length=rounds
    )
    mask = (jnp.arange(block) < valid).astype(jnp.float32)
    return pos_blk, state_loc.c, jnp.sum(mses[-1] * mask)


def refined_rounds_streaming(
    state: DNMFState,
    source,
    model: ModelConfig,
    rounds: int = 2,
    epochs: int = 20,
    mu_iters: int = 30,
    learning_rate: float = 0.05,
    prior: float = 1e-3,
    pos_t: Optional[jnp.ndarray] = None,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    gram_mode: str = "exact",
    gram_window=None,
    trace_solver: str = "mu",
) -> Tuple[DNMFState, jnp.ndarray, dict]:
    """:func:`refined_rounds` over a host-streamed video source.

    Identical math to the device-resident path (gated in tests): the
    refinement alternation is per-frame independent, so each streamed
    block runs its complete schedule in one compiled dispatch
    (:func:`_refined_rounds_block`) — device memory is bounded by the
    source's block size and the recording is read ONCE, with the
    source's prefetch overlapping the per-block compute.
    """
    t = state.beta.shape[0]
    k = state.pos.shape[0]
    if pos_t is None:
        pos_t = jnp.broadcast_to(state.pos[None], (t, k, 3))
    pos_t_pad = jnp.concatenate(
        [pos_t, jnp.broadcast_to(state.pos[None],
                                 (source.block, k, 3))], axis=0
    )
    pos_out, c_out, sse = [], [], []
    for frames, start, valid in source.blocks():
        pos_blk, c_blk, s = _refined_rounds_block(
            state, frames, start, valid, pos_t_pad, model,
            rounds=rounds, epochs=epochs, mu_iters=mu_iters,
            learning_rate=learning_rate, prior=prior,
            block=source.block, use_pallas=use_pallas,
            pallas_interpret=pallas_interpret, gram_mode=gram_mode,
            gram_window=gram_window, trace_solver=trace_solver,
        )
        pos_out.append(pos_blk)
        c_out.append(c_blk)
        sse.append(s)
    pos_t_new = jnp.concatenate(pos_out, axis=0)[:t]
    c_new = jnp.concatenate(c_out, axis=1)[:, :t]
    mse = jnp.stack(sse).sum() / t
    return (state._replace(c=c_new), pos_t_new,
            {"recon_mse": mse})
