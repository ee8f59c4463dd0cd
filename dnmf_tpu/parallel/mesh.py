"""Device mesh construction and state sharding specs.

The scaling story (SURVEY.md §2.3): the reference's only parallelism is
splitting the time axis into chunks mapped over host processes
(``motion_correction_piecewise``,
``/root/reference/Demix/MotionCorrect.py:2088,2109-2117``).  Here the time
axis shards over a ``jax.sharding.Mesh`` axis ``"time"`` (frames are
independent in the deformation fit and the MU Grams; the only cross-frame
coupling is the +-1-frame smoothing halo), and an optional ``"batch"``
axis vmaps over recordings.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TIME_AXIS = "time"
BATCH_AXIS = "batch"
PIXEL_AXIS = "pixel"


def make_mesh(
    num_time: Optional[int] = None,
    num_batch: int = 1,
    num_pixel: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(batch, time, pixel)`` mesh over available devices.

    ``batch`` partitions recordings, ``time`` partitions frames, and
    ``pixel`` partitions voxels within a frame (tensor parallelism for
    the ``[K, K]`` MU Grams at large K — each pixel shard evaluates
    footprints on its voxel subset and partial Grams ``psum`` over the
    axis; the reference's Gram einsum reduces over all voxels on one
    host, ``/root/reference/Demix/dNMF.py:141``).  Unused axes default to
    size 1, so 2-axis callers are unaffected.
    """
    if devices is None:
        devices = jax.devices()
    if num_time is None:
        num_time = len(devices) // (num_batch * num_pixel)
    devs = np.asarray(devices[: num_batch * num_time * num_pixel]).reshape(
        num_batch, num_time, num_pixel
    )
    return Mesh(devs, (BATCH_AXIS, TIME_AXIS, PIXEL_AXIS))


def video_sharding(mesh: Mesh) -> NamedSharding:
    """Video ``[T, P]``: frames over the time axis, voxels over the
    pixel axis (replicated there when the axis has size 1)."""
    return NamedSharding(mesh, P(TIME_AXIS, PIXEL_AXIS))
