"""Mesh x streaming composition: frame-sharded epochs over host-streamed
videos (BASELINE config 4: 10k-frame recordings on a time mesh).

The reference's analog is its chunked-T parallel map — frames split into
chunks and pickled out to host worker processes
(``/root/reference/Demix/MotionCorrect.py:2088-2117``).  Here each mesh
shard owns a *contiguous* range of ``T/n`` frames (the same layout
``shard_video`` produces for device-resident runs), and the host feeds
the mesh in "block rows": step ``s`` transfers frames
``[d*shard_len + s*block, ... + block)`` for every shard ``d`` at once as
a single time-sharded ``[n*block, P]`` array, so every device receives
its own next block in one transfer.  Per-shard results accumulate into
time-sharded buffers (gradients / Grams) that never gather to one
device, and the single full-tensor Adam step runs on the sharded
gradient buffer — identical math to the device-resident sharded epoch.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dnmf_tpu.config import ModelConfig
from dnmf_tpu.models import dnmf as model_lib
from dnmf_tpu.ops import basis as basis_ops
from dnmf_tpu.parallel.mesh import PIXEL_AXIS, TIME_AXIS
from dnmf_tpu.parallel.sharded import _state_specs


def _shard_geometry(state, source, mesh: Mesh,
                    model=None) -> Tuple[int, int, int, int]:
    n = mesh.shape[TIME_AXIS]
    npix = mesh.shape.get(PIXEL_AXIS, 1)
    t = state.beta.shape[0]
    if t != source.num_frames:
        raise ValueError(
            f"model has {t} frames but the streaming source holds "
            f"{source.num_frames}"
        )
    if t % n:
        raise ValueError(
            f"num_frames={t} must divide evenly over mesh time={n}"
        )
    if npix > 1:
        if getattr(source, "size", None) is None:
            raise ValueError(
                "pixel-sharded streaming needs a source with a spatial "
                "shape ([T, M, N, Z]); this source is flat [T, P]"
            )
        p = int(np.prod(source.size))
        if p % npix:
            raise ValueError(
                f"voxel count {p} must divide evenly over mesh "
                f"pixel={npix}"
            )
        if model is not None and model.deformation.footprint_mode != (
                "analytic"):
            raise ValueError(
                "pixel-sharded streaming requires analytic footprints"
            )
    shard_len = t // n
    block = min(int(source.block), shard_len)
    return n, shard_len, block, npix


def _frame_spec(mesh: Mesh):
    """Block-row sharding: frames over time, voxels over pixel (when the
    mesh has a pixel axis)."""
    if PIXEL_AXIS in mesh.shape:
        return P(TIME_AXIS, PIXEL_AXIS)
    return P(TIME_AXIS)


def _host_block_row(source, n: int, shard_len: int, block: int,
                    off: int) -> Tuple[np.ndarray, int]:
    """Assemble step ``off``'s per-shard frame blocks into one host array.

    Returns ``([n*block, P] zero-padded array, valid_rows_per_shard)``.
    """
    valid = min(block, shard_len - off)
    segs = []
    for d in range(n):
        s0 = d * shard_len + off
        seg = source.read(s0, s0 + valid)
        if valid < block:
            seg = np.pad(seg, ((0, block - valid), (0, 0)))
        segs.append(seg)
    return np.concatenate(segs, axis=0), valid


def _masked_accumulate(buf_loc, values, offset, valid, block):
    """Write ``values[:valid]`` rows at ``offset`` into a local buffer.

    Works for any offset/valid via a scratch pad row-block: the padded
    copy means ``dynamic_update_slice`` never clamps the start (which
    would silently misalign the final partial block), and rows past
    ``valid`` land in the discarded pad region.
    """
    shard_len = buf_loc.shape[0]
    mask = (jnp.arange(block) < valid).astype(values.dtype)
    values = values * mask.reshape((block,) + (1,) * (values.ndim - 1))
    padded = jnp.concatenate(
        [buf_loc, jnp.zeros((block,) + buf_loc.shape[1:],
                            dtype=buf_loc.dtype)],
        axis=0,
    )
    padded = jax.lax.dynamic_update_slice_in_dim(padded, values, offset,
                                                 axis=0)
    return padded[:shard_len], mask


@functools.partial(
    jax.jit,
    static_argnames=("model", "gamma", "block", "mesh", "use_pallas",
                     "pallas_interpret"),
)
def _stream_shard_grads_step(
    state: model_lib.DNMFState,
    grads_buf: jnp.ndarray,
    frames: jnp.ndarray,
    offset: jnp.ndarray,
    valid: jnp.ndarray,
    model: ModelConfig,
    gamma: float,
    block: int,
    mesh: Mesh,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
):
    """One block row of per-frame gradients on every shard at once."""
    specs = _state_specs(state)
    npix = mesh.shape.get(PIXEL_AXIS, 1)
    tp = npix > 1

    def local_fn(state_loc, grads_loc, frames_loc, vb_loc, offset, valid):
        beta_pad = jnp.concatenate(
            [state_loc.beta, basis_ops.identity_beta(block)], axis=0
        )
        c_pad = jnp.pad(state_loc.c, ((0, 0), (0, block)))
        st = state_loc._replace(
            beta=jax.lax.dynamic_slice_in_dim(beta_pad, offset, block),
            c=jax.lax.dynamic_slice_in_dim(c_pad, offset, block, axis=1),
        )
        g, mses, regs = model_lib.frame_grads_local(
            st, frames_loc, model, gamma, block,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
            vb=vb_loc if (tp and not use_pallas) else None,
            p_offset=(jax.lax.axis_index(PIXEL_AXIS)
                      * frames_loc.shape[1]) if (tp and use_pallas)
                     else None,
        )
        if tp:
            # Partial (local-voxel) values; psum/npix reproduces the
            # global gradients/metrics (same contract as the
            # device-resident sharded epoch).
            g = jax.lax.psum(g, PIXEL_AXIS) / npix
            mses = jax.lax.psum(mses, PIXEL_AXIS) / npix
            regs = jax.lax.psum(regs, PIXEL_AXIS) / npix
        grads_loc, mask = _masked_accumulate(grads_loc, g, offset, valid,
                                             block)
        mse = jax.lax.psum(jnp.sum(mses * mask), TIME_AXIS)
        reg = jax.lax.psum(jnp.sum(regs * mask), TIME_AXIS)
        return grads_loc, mse, reg

    vb = model_lib.model_voxel_basis(model)
    f = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(specs, P(TIME_AXIS), _frame_spec(mesh),
                  P(PIXEL_AXIS) if tp else P(), P(), P()),
        out_specs=(P(TIME_AXIS), P(), P()),
        check_vma=False,  # pallas_call outputs carry no vma annotations
    )
    return f(state, grads_buf, frames, vb, offset, valid)


@functools.partial(jax.jit, static_argnames=("optimizer",))
def _apply_motion_updates(state, grads, optimizer):
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.beta)
    beta = optax.apply_updates(state.beta, updates)
    return state._replace(beta=beta, opt_state=opt_state)


def sharded_motion_epoch_streaming(
    state: model_lib.DNMFState,
    source,
    model: ModelConfig,
    optimizer: optax.GradientTransformation,
    gamma: float,
    mesh: Mesh,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> Tuple[model_lib.DNMFState, dict]:
    """One parallel-mode epoch over a host-streamed video on a time mesh.

    Identical math to ``motion_epoch_streaming`` /
    ``sharded_motion_epoch``: per-frame gradients collected block-row by
    block-row into a time-sharded buffer, then one full-tensor Adam step.
    With a pixel mesh axis, each block row also shards over voxels and
    partial gradients psum over the pixel axis (TP x streaming).
    """
    n, shard_len, block, _ = _shard_geometry(state, source, mesh, model)
    tsh = NamedSharding(mesh, P(TIME_AXIS))
    fsh = NamedSharding(mesh, _frame_spec(mesh))
    grads_buf = jax.device_put(
        jnp.zeros_like(state.beta), tsh
    )
    mses, regs = [], []
    for off in range(0, shard_len, block):
        host_row, valid = _host_block_row(source, n, shard_len, block, off)
        frames = jax.device_put(host_row, fsh)
        grads_buf, mse, reg = _stream_shard_grads_step(
            state, grads_buf, frames, jnp.int32(off), jnp.int32(valid),
            model, gamma, block, mesh,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
        )
        # Device scalars, read once at the end: a float() here would
        # synchronize every block row and serialize transfers vs compute.
        mses.append(mse)
        regs.append(reg)
    state = _apply_motion_updates(state, grads_buf, optimizer)
    t = state.beta.shape[0]
    return state, {"recon_mse": float(jnp.stack(mses).sum()) / t,
                   "reg": float(jnp.stack(regs).sum()) / t}


@functools.partial(
    jax.jit,
    static_argnames=("model", "block", "mesh", "use_pallas",
                     "pallas_interpret", "gram_mode", "gram_window"),
)
def _stream_shard_grams_step(
    state: model_lib.DNMFState,
    grams_buf: jnp.ndarray,
    c1_buf: jnp.ndarray,
    frames: jnp.ndarray,
    offset: jnp.ndarray,
    valid: jnp.ndarray,
    model: ModelConfig,
    block: int,
    mesh: Mesh,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    gram_mode: str = "exact",
    gram_window=None,
):
    specs = _state_specs(state)
    npix = mesh.shape.get(PIXEL_AXIS, 1)
    tp = npix > 1
    if gram_mode == "analytic" and tp:
        raise ValueError(
            "gram_mode='analytic' is incompatible with a pixel mesh "
            "axis (global closed form; partial psum would double-count)"
        )

    def local_fn(state_loc, grams_loc, c1_loc, frames_loc, vb_loc,
                 offset, valid):
        beta_pad = jnp.concatenate(
            [state_loc.beta, basis_ops.identity_beta(block)], axis=0
        )
        st = state_loc._replace(
            beta=jax.lax.dynamic_slice_in_dim(beta_pad, offset, block)
        )
        g, c1 = model_lib.grams_local(
            st, frames_loc, model, block,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
            vb=vb_loc if (tp and not use_pallas) else None,
            p_offset=(jax.lax.axis_index(PIXEL_AXIS)
                      * frames_loc.shape[1]) if (tp and use_pallas)
                     else None,
            gram_mode=gram_mode, gram_window=gram_window,
        )
        if tp:
            # Grams are plain sums over voxels — partial sums psum to
            # the global Gram.
            g = jax.lax.psum(g, PIXEL_AXIS)
            c1 = jax.lax.psum(c1, PIXEL_AXIS)
        grams_loc, _ = _masked_accumulate(grams_loc, g, offset, valid,
                                          block)
        c1_loc, _ = _masked_accumulate(c1_loc, c1, offset, valid, block)
        return grams_loc, c1_loc

    vb = model_lib.model_voxel_basis(model)
    f = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(specs, P(TIME_AXIS), P(TIME_AXIS), _frame_spec(mesh),
                  P(PIXEL_AXIS) if tp else P(), P(), P()),
        out_specs=(P(TIME_AXIS), P(TIME_AXIS)),
        check_vma=False,
    )
    return f(state, grams_buf, c1_buf, frames, vb, offset, valid)


def sharded_compute_grams_streaming(
    state: model_lib.DNMFState,
    source,
    model: ModelConfig,
    mesh: Mesh,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    gram_mode: str = "exact",
    gram_window=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-frame MU Grams over a host-streamed video, time-sharded.

    Returns ``(grams [T, K, K], c1 [T, K])`` sharded on the time axis —
    ready for ``sharded_footprint_update``'s halo'd MU iterations without
    ever gathering to a single device.  With a pixel mesh axis, block
    rows shard over voxels and partial Grams psum over the pixel axis.
    """
    n, shard_len, block, _ = _shard_geometry(state, source, mesh, model)
    k = state.c.shape[0]
    t = state.beta.shape[0]
    tsh = NamedSharding(mesh, P(TIME_AXIS))
    fsh = NamedSharding(mesh, _frame_spec(mesh))
    grams_buf = jax.device_put(jnp.zeros((t, k, k)), tsh)
    c1_buf = jax.device_put(jnp.zeros((t, k)), tsh)
    for off in range(0, shard_len, block):
        host_row, valid = _host_block_row(source, n, shard_len, block, off)
        frames = jax.device_put(host_row, fsh)
        grams_buf, c1_buf = _stream_shard_grams_step(
            state, grams_buf, c1_buf, frames, jnp.int32(off),
            jnp.int32(valid), model, block, mesh,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
            gram_mode=gram_mode, gram_window=gram_window,
        )
    return grams_buf, c1_buf
