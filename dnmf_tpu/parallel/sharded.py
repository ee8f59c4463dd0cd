"""Frame-sharded training steps via ``shard_map``.

Partitioning (SURVEY.md §5 "north-star feature"):

* ``beta [T,10,3]``, Adam moments, video ``[T,P]`` and traces ``C [K,T]``
  shard along the ``"time"`` mesh axis; positions/sigmas replicate.
* The deformation fit is per-frame independent — zero communication.
* Per-frame MU Grams reduce over voxels locally — zero communication.
* The temporally-smoothed MU update couples +-1 frames: one
  ``ppermute`` halo per iteration exchanges a single ``[K]`` trace column
  with each neighbor (global edges keep the reference's edge-replication
  semantics, ``/root/reference/Demix/dNMF.py:145``).

Adam is elementwise, so running ``optimizer.update`` on local shards is
exactly the global update.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dnmf_tpu.config import ModelConfig
from dnmf_tpu.models import dnmf as model_lib
from dnmf_tpu.ops import mu as mu_ops
from dnmf_tpu.parallel.mesh import PIXEL_AXIS, TIME_AXIS


def _pixel_size(mesh: Mesh) -> int:
    return mesh.shape.get(PIXEL_AXIS, 1)


def _state_specs(state: model_lib.DNMFState):
    """PartitionSpec pytree for a DNMFState: time-sharded factors.

    Leaves are classified by their field path (DNMFState is a NamedTuple,
    so the first path element is the field name) — not by shape, so a
    future leaf that happens to collide with beta's or C's shape cannot
    shard unintentionally.  Inside ``opt_state`` the only per-parameter
    arrays are the beta-shaped Adam moments; they shard like beta, and
    everything else (step counts, scalars) replicates.
    """
    beta_shape = state.beta.shape

    def spec(path, leaf):
        field = path[0].name if path else None
        if field == "beta":
            return P(TIME_AXIS)
        if field == "c":
            return P(None, TIME_AXIS)  # traces [K, T]
        if field == "opt_state":
            # Adam moments mirror the parameter (beta) shape; anything
            # else in the optimizer state replicates.
            if getattr(leaf, "shape", ()) == beta_shape:
                return P(TIME_AXIS)
            return P()
        return P()  # pos, sigma, and any future replicated field

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_state(state: model_lib.DNMFState, mesh: Mesh):
    """Place a state pytree onto the mesh with time-sharded factors."""
    specs = _state_specs(state)
    return jax.tree_util.tree_map(
        lambda leaf, sp: jax.device_put(leaf, NamedSharding(mesh, sp)),
        state, specs,
    )


def shard_video(video_flat: jnp.ndarray, mesh: Mesh):
    """Place ``[T, P]`` frames onto the mesh: frames over the time axis,
    voxels over the pixel axis (size-1 pixel axis = time-only layout)."""
    if (PIXEL_AXIS in mesh.shape
            and video_flat.shape[1] % mesh.shape[PIXEL_AXIS]):
        raise ValueError(
            f"voxel count {video_flat.shape[1]} must divide evenly over "
            f"mesh pixel={mesh.shape[PIXEL_AXIS]}"
        )
    return jax.device_put(
        video_flat, NamedSharding(mesh, P(TIME_AXIS, PIXEL_AXIS))
    )


@functools.partial(
    jax.jit,
    static_argnames=("model", "optimizer", "gamma", "frame_block", "mesh",
                     "use_pallas", "pallas_interpret"),
)
def sharded_motion_epoch(
    state: model_lib.DNMFState,
    video_flat: jnp.ndarray,
    model: ModelConfig,
    optimizer: optax.GradientTransformation,
    gamma: float,
    mesh: Mesh,
    frame_block: int = 16,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> Tuple[model_lib.DNMFState, dict]:
    """Frame-sharded equivalent of ``motion_epoch_parallel``.

    Requires ``T % mesh.shape["time"] == 0``.  With a pixel mesh axis
    of size > 1 (tensor parallelism), the video also shards over voxels:
    each shard evaluates footprints on its ``[P/npix, 10]`` basis slice
    and partial per-frame gradients ``psum`` over the pixel axis before
    the (replicated-over-pixel) Adam step.
    """
    specs = _state_specs(state)
    npix = _pixel_size(mesh)

    def local_fn(state_loc, video_loc, vb_loc):
        # Pixel shards: the XLA path evaluates on the local basis slice
        # (vb); the pallas path takes the shard's global voxel offset
        # and derives coordinates in-kernel.
        tp = npix > 1
        grads, mses, regs = model_lib.frame_grads_local(
            state_loc, video_loc, model, gamma, frame_block,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
            vb=vb_loc if (tp and not use_pallas) else None,
            p_offset=(jax.lax.axis_index(PIXEL_AXIS)
                      * video_loc.shape[1]) if (tp and use_pallas)
                     else None,
        )
        if npix > 1:
            # Local values are computed over local voxels; the psum/npix
            # of both the data-term gradients and the metrics reproduces
            # the global ones (the identical per-frame regularizer terms
            # also come back unscaled under /npix).
            grads = jax.lax.psum(grads, PIXEL_AXIS) / npix
            mses = jax.lax.psum(mses, PIXEL_AXIS) / npix
            regs = jax.lax.psum(regs, PIXEL_AXIS) / npix
        updates, opt_state = optimizer.update(
            grads, state_loc.opt_state, state_loc.beta
        )
        beta = optax.apply_updates(state_loc.beta, updates)
        t_global = mses.shape[0] * mesh.shape[TIME_AXIS]
        mse = jax.lax.psum(jnp.sum(mses), TIME_AXIS) / t_global
        reg = jax.lax.psum(jnp.sum(regs), TIME_AXIS) / t_global
        new_state = state_loc._replace(beta=beta, opt_state=opt_state)
        return new_state, {"recon_mse": mse, "reg": reg}

    vb = model_lib.model_voxel_basis(model)
    f = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(specs, P(TIME_AXIS, PIXEL_AXIS), P(PIXEL_AXIS)),
        out_specs=(specs, {"recon_mse": P(), "reg": P()}),
        check_vma=False,  # pallas_call outputs carry no vma annotations
    )
    return f(state, video_flat, vb)


@functools.partial(
    jax.jit, static_argnames=("model", "frame_block", "mesh",
                              "use_pallas", "pallas_interpret",
                              "gram_mode", "gram_window")
)
def sharded_compute_grams(
    state: model_lib.DNMFState,
    video_flat: jnp.ndarray,
    model: ModelConfig,
    mesh: Mesh,
    frame_block: int = 16,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    gram_mode: str = "exact",
    gram_window=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frame-sharded per-frame Grams: ``([T,K,K], [T,K])`` sharded on T.

    With a pixel mesh axis of size > 1 (tensor parallelism for large K,
    SURVEY §2.3 TP row), each shard accumulates partial Grams over its
    voxel subset and one ``psum`` over the pixel axis yields the global
    ``[K, K]`` per-frame Grams — the pixel-sharded form of the
    reference's whole-volume Gram einsum
    (``/root/reference/Demix/dNMF.py:141``).

    ``gram_mode="analytic"`` (time meshes only — it computes the global
    closed form per frame, so pixel shards would double-count; see
    :mod:`dnmf_tpu.ops.gram_analytic`) composes with time sharding
    zero-communication: each shard evaluates its own frames' closed
    forms and runs only the local c1 video pass.
    """
    specs = _state_specs(state)
    npix = _pixel_size(mesh)
    if gram_mode == "analytic" and npix > 1:
        raise ValueError(
            "gram_mode='analytic' is incompatible with a pixel mesh "
            "axis (global closed form; partial psum would double-count)"
        )

    def local_fn(state_loc, video_loc, vb_loc):
        tp = npix > 1
        g, c1 = model_lib.grams_local(
            state_loc, video_loc, model, frame_block,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
            vb=vb_loc if (tp and not use_pallas) else None,
            p_offset=(jax.lax.axis_index(PIXEL_AXIS)
                      * video_loc.shape[1]) if (tp and use_pallas)
                     else None,
            gram_mode=gram_mode, gram_window=gram_window,
        )
        if npix > 1:
            # Grams are plain sums over voxels — partial sums psum to the
            # global Gram (no normalization).
            g = jax.lax.psum(g, PIXEL_AXIS)
            c1 = jax.lax.psum(c1, PIXEL_AXIS)
        return g, c1

    vb = model_lib.model_voxel_basis(model)
    f = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(specs, P(TIME_AXIS, PIXEL_AXIS), P(PIXEL_AXIS)),
        out_specs=(P(TIME_AXIS), P(TIME_AXIS)),
        check_vma=False,  # pallas_call outputs carry no vma annotations
    )
    return f(state, video_flat, vb)


@functools.partial(
    jax.jit, static_argnames=("iters", "gamma", "mesh", "solver")
)
def sharded_footprint_update(
    state: model_lib.DNMFState,
    grams: jnp.ndarray,
    c1: jnp.ndarray,
    mesh: Mesh,
    iters: int,
    gamma: float = 0.0,
    solver: str = "mu",
) -> model_lib.DNMFState:
    """Frame-sharded trace updates with a +-1-frame ``ppermute`` halo.

    ``solver="mu"`` iterates the reference's multiplicative rule;
    ``"fista"`` runs the accelerated projected-gradient solve
    (:func:`dnmf_tpu.ops.mu.nnls_temporal`) — the smoothing gradient
    uses the same halo exchange, and the Lipschitz constant is the
    ``pmax`` of per-shard power-iteration estimates (the objective is
    frame-separable apart from the temporal Laplacian, whose ``4*gamma``
    bound is added after the reduction).
    """
    if solver not in ("mu", "fista"):
        raise ValueError(f"unknown trace solver: {solver!r}")
    specs = _state_specs(state)
    n_time = mesh.shape[TIME_AXIS]

    def local_fn(state_loc, grams_loc, c1_loc):
        idx = jax.lax.axis_index(TIME_AXIS)

        def edge_halo(c_loc):
            from_left = jax.lax.ppermute(
                c_loc[:, -1], TIME_AXIS,
                [(i, i + 1) for i in range(n_time - 1)],
            )
            from_right = jax.lax.ppermute(
                c_loc[:, 0], TIME_AXIS,
                [(i + 1, i) for i in range(n_time - 1)],
            )
            left_col = jnp.where(idx == 0, c_loc[:, 0], from_left)
            right_col = jnp.where(
                idx == n_time - 1, c_loc[:, -1], from_right
            )
            return left_col, right_col

        if solver == "fista":
            l_loc = mu_ops.gram_lipschitz(grams_loc)
            l_glob = jax.lax.pmax(l_loc, TIME_AXIS)
            if gamma:
                l_glob = l_glob + 4.0 * gamma
            c_out = mu_ops.nnls_temporal(
                state_loc.c, grams_loc, c1_loc, iters=iters,
                gamma=gamma if gamma else None, lipschitz=l_glob,
                halo_fn=edge_halo if gamma else None,
            )
            return state_loc._replace(c=c_out)

        def one_iter(c_loc, _):
            # Halo: right-edge column of the left neighbor + left-edge
            # column of the right neighbor; global edges replicate own
            # edge column (reference edge-replication semantics).
            halo = edge_halo(c_loc) if gamma else None
            c_new = mu_ops.mu_temporal_step(
                c_loc, grams_loc, c1_loc,
                gamma=gamma if gamma else None, halo=halo,
            )
            return c_new, None

        c_out, _ = jax.lax.scan(one_iter, state_loc.c, None, length=iters)
        return state_loc._replace(c=c_out)

    f = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(specs, P(TIME_AXIS), P(TIME_AXIS)),
        out_specs=specs,
    )
    return f(state, grams, c1)


@functools.partial(
    jax.jit,
    static_argnames=("model", "mesh", "rounds", "epochs", "mu_iters",
                     "learning_rate", "prior", "frame_block",
                     "use_pallas", "pallas_interpret", "gram_mode",
                     "gram_window", "trace_solver"),
)
def sharded_refined_rounds(
    state: model_lib.DNMFState,
    video_flat: jnp.ndarray,
    model: ModelConfig,
    mesh: Mesh,
    rounds: int = 2,
    epochs: int = 20,
    mu_iters: int = 30,
    learning_rate: float = 0.05,
    prior: float = 1e-3,
    frame_block: int = 16,
    pos_t: jnp.ndarray = None,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    gram_mode: str = "exact",
    gram_window=None,
    trace_solver: str = "mu",
):
    """Frame-sharded per-frame position refinement + tracked-Gram MU.

    Each frame's position problem is independent and its tracked Gram
    reduces over that frame's own voxels, and the MU trace update here
    runs without temporal smoothing — so the whole phase is
    zero-communication: the single-device :func:`models.refine.
    refined_rounds` runs verbatim on each shard's local frames (Adam is
    elementwise, anchors/sigma replicate).  Only the per-frame
    ``recon_mse`` metric comes back time-sharded.

    Requires a time-only mesh (``pixel`` axis of size 1): the refinement
    loss reduces over whole frames.

    ``trace_solver="fista"`` stays zero-communication: without temporal
    smoothing the per-frame problems decouple, so each shard's (tighter)
    local Lipschitz estimate is valid — iterate trajectories differ
    slightly from the single-device run but converge to the same
    optimum.
    """
    from dnmf_tpu.models import refine as refine_lib

    if _pixel_size(mesh) > 1:
        raise ValueError(
            "sharded_refined_rounds requires a time-only mesh "
            "(pixel axis must have size 1)"
        )
    specs = _state_specs(state)
    t = video_flat.shape[0]
    if pos_t is None:
        pos_t = jnp.broadcast_to(state.pos[None], (t,) + state.pos.shape)

    def local_fn(state_loc, video_loc, pos_loc):
        st, p_t, metrics = refine_lib.refined_rounds(
            state_loc, video_loc, model, rounds=rounds, epochs=epochs,
            mu_iters=mu_iters, learning_rate=learning_rate, prior=prior,
            frame_block=frame_block, pos_t=pos_loc,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
            gram_mode=gram_mode, gram_window=gram_window,
            trace_solver=trace_solver,
        )
        return st, p_t, metrics

    f = jax.shard_map(
        local_fn, mesh=mesh,
        # Time-only mesh (checked above) — a pixel-axis video spec would
        # mark the MU carry pixel-varying and break the scan's vma match.
        in_specs=(specs, P(TIME_AXIS), P(TIME_AXIS)),
        out_specs=(specs, P(TIME_AXIS), {"recon_mse": P(TIME_AXIS)}),
        check_vma=not use_pallas,  # pallas_call outputs carry no vma
    )
    return f(state, video_flat, pos_t)
