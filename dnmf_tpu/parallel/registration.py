"""Mesh-sharded registration: the TPU-native form of the reference's
ONLY parallelism.

The reference parallelizes registration by splitting T into chunks and
mapping them over ipyparallel/multiprocessing workers, then combining
per-chunk templates with a host nanmedian
(``/root/reference/Demix/MotionCorrect.py:2088-2117, 1860-1862``).  Here
each mesh shard owns a contiguous frame range: per-frame FFT
registration runs shard-locally (zero communication), per-shard
templates come back as one stacked array (the shard axis is the chunk
axis), and the median consensus runs on the gathered stack — one
``shard_map`` call per template iteration instead of one process pool
dispatch per chunk.

Device memory per shard is bounded by ``frame_block`` frames via
``lax.map`` batching.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dnmf_tpu.config import RegistrationConfig
from dnmf_tpu.ops import fft_reg
from dnmf_tpu.parallel.mesh import TIME_AXIS


def _nan_template(corrected: jnp.ndarray) -> jnp.ndarray:
    """Finite-mean frame template with the reference's NaN policy
    (nanmean then nan->min, ``:1855-1862``)."""
    finite = jnp.isfinite(corrected)
    s = jnp.sum(jnp.where(finite, corrected, 0.0), axis=0)
    c = jnp.sum(finite, axis=0)
    t = s / jnp.maximum(c, 1)
    t = jnp.where(c > 0, t, jnp.nan)
    return jnp.nan_to_num(t, nan=jnp.nanmin(t))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "max_shifts", "upsample_factor",
                     "border_nan", "frame_block"),
)
def _sharded_rigid_step(
    video: jnp.ndarray,
    template: jnp.ndarray,
    mesh: Mesh,
    max_shifts,
    upsample_factor: int,
    border_nan,
    add_to_movie: float,
    frame_block: int,
):
    """One template iteration: returns ``(corrected [T, ...] sharded,
    shifts [T, nd] sharded, chunk_templates [n_shards, ...])``."""
    from dnmf_tpu.registration.motion_correct import rigid_correct_frames

    def local_fn(video_loc, template):
        def block(frames):
            return rigid_correct_frames(
                frames, template, max_shifts,
                upsample_factor=upsample_factor, border_nan=border_nan,
                add_to_movie=add_to_movie,
            )

        tl = video_loc.shape[0]
        fb = min(frame_block, tl)
        pad = (-tl) % fb
        v = jnp.pad(video_loc, ((0, pad),) + ((0, 0),) * (video_loc.ndim
                                                          - 1))
        nb = (tl + pad) // fb
        corrected, shifts = jax.lax.map(
            block, v.reshape((nb, fb) + video_loc.shape[1:])
        )
        corrected = corrected.reshape((-1,) + video_loc.shape[1:])[:tl]
        shifts = shifts.reshape(-1, shifts.shape[-1])[:tl]
        chunk_t = _nan_template(corrected)
        return corrected, shifts, chunk_t[None]

    f = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(TIME_AXIS), P()),
        out_specs=(P(TIME_AXIS), P(TIME_AXIS), P(TIME_AXIS)),
    )
    return f(video, template)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "strides", "overlaps", "max_shifts",
                     "max_deviation_rigid", "upsample_factor_grid",
                     "upsample_factor_fft", "use_remap", "remap_mode",
                     "border_nan", "frame_block"),
)
def _sharded_pwrigid_step(
    video: jnp.ndarray,
    template: jnp.ndarray,
    mesh: Mesh,
    strides,
    overlaps,
    max_shifts,
    max_deviation_rigid: int,
    upsample_factor_grid: int,
    upsample_factor_fft: int,
    use_remap: bool,
    remap_mode: str,
    border_nan,
    add_to_movie: float,
    frame_block: int,
):
    """One pw-rigid template iteration on the mesh.

    Returns ``(corrected [T, ...] sharded, patch_shifts [T, n_patches,
    nd] sharded, chunk_templates [n_shards, ...])``.
    """
    from dnmf_tpu.registration.motion_correct import tile_and_correct

    def local_fn(video_loc, template):
        def one(frame):
            return tile_and_correct(
                frame, template, strides, overlaps, max_shifts,
                max_deviation_rigid=max_deviation_rigid,
                upsample_factor_grid=upsample_factor_grid,
                upsample_factor_fft=upsample_factor_fft,
                use_remap=use_remap, remap_mode=remap_mode,
                border_nan=border_nan,
                add_to_movie=add_to_movie,
            )

        tl = video_loc.shape[0]
        fb = min(frame_block, tl)
        pad = (-tl) % fb
        v = jnp.pad(video_loc, ((0, pad),) + ((0, 0),) * (video_loc.ndim
                                                          - 1))
        nb = (tl + pad) // fb
        corrected, shifts = jax.lax.map(
            jax.vmap(one), v.reshape((nb, fb) + video_loc.shape[1:])
        )
        corrected = corrected.reshape((-1,) + video_loc.shape[1:])[:tl]
        shifts = shifts.reshape((-1,) + shifts.shape[2:])[:tl]
        chunk_t = _nan_template(corrected)
        return corrected, shifts, chunk_t[None]

    f = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(TIME_AXIS), P()),
        out_specs=(P(TIME_AXIS), P(TIME_AXIS), P(TIME_AXIS)),
    )
    return f(video, template)


def sharded_register_rigid(
    video: jnp.ndarray,
    cfg: RegistrationConfig,
    mesh: Mesh,
    template: Optional[jnp.ndarray] = None,
    add_to_movie: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Template-iterated rigid registration across a time mesh.

    Each shard is one "chunk" of the reference's chunked template
    iteration; the template consensus is the nanmedian over the gathered
    per-shard templates (``:1860-1862``).

    Args:
      video: ``[T, ...spatial]`` (will be placed time-sharded).
      template: initial template; defaults to the bin-median of the
        video.

    Returns:
      ``(template, corrected [T, ...] time-sharded, shifts [T, nd])``.
    """
    if cfg.gSig_filt is not None:
        raise ValueError("gSig_filt is not supported on the mesh path")
    if video.shape[0] % mesh.shape[TIME_AXIS]:
        raise ValueError("T must divide evenly over the time mesh axis")
    video = jax.device_put(video, NamedSharding(mesh, P(TIME_AXIS)))
    if template is None:
        template = fft_reg.bin_median(video)
    corrected = shifts = None
    for _ in range(max(cfg.niter_rig, 1)):
        corrected, shifts, chunk_ts = _sharded_rigid_step(
            video, template, mesh, tuple(cfg.max_shifts),
            cfg.upsample_factor_fft, cfg.border_nan, add_to_movie,
            cfg.frame_block,
        )
        template = jnp.nanmedian(chunk_ts, axis=0)
    return template, corrected, shifts


def sharded_register_pwrigid(
    video: jnp.ndarray,
    cfg: RegistrationConfig,
    mesh: Mesh,
    template: Optional[jnp.ndarray] = None,
    add_to_movie: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Template-iterated piecewise-rigid registration across a time mesh
    (reference ``motion_correct_batch_pwrigid`` ``:1880-2000`` over its
    chunk map).

    Returns ``(template, corrected [T, ...] time-sharded,
    patch_shifts [T, n_patches, nd])`` — shifts are applied corrections
    (reference ``total_shifts`` sign).
    """
    if cfg.gSig_filt is not None:
        raise ValueError("gSig_filt is not supported on the mesh path")
    if video.shape[0] % mesh.shape[TIME_AXIS]:
        raise ValueError("T must divide evenly over the time mesh axis")
    nd = video.ndim - 1
    video = jax.device_put(video, NamedSharding(mesh, P(TIME_AXIS)))
    if template is None:
        template, _, _ = sharded_register_rigid(video, cfg, mesh,
                                                add_to_movie=add_to_movie)
    corrected = shifts = None
    for _ in range(max(cfg.niter_rig, 1)):
        corrected, shifts, chunk_ts = _sharded_pwrigid_step(
            video, template, mesh, tuple(cfg.strides[:nd]),
            tuple(cfg.overlaps[:nd]), tuple(cfg.max_shifts),
            cfg.max_deviation_rigid, cfg.upsample_factor_grid,
            cfg.upsample_factor_fft, cfg.use_remap, cfg.remap_mode,
            cfg.border_nan, add_to_movie, cfg.frame_block,
        )
        template = jnp.nanmedian(chunk_ts, axis=0)
    return template, corrected, shifts
