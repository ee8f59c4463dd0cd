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


def make_mesh(
    num_time: Optional[int] = None,
    num_batch: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(batch, time)`` mesh over available devices."""
    if devices is None:
        devices = jax.devices()
    if num_time is None:
        num_time = len(devices) // num_batch
    devs = np.asarray(devices[: num_batch * num_time]).reshape(
        num_batch, num_time
    )
    return Mesh(devs, (BATCH_AXIS, TIME_AXIS))


def video_sharding(mesh: Mesh) -> NamedSharding:
    """Frames sharded over the time axis: video ``[T, P]``."""
    return NamedSharding(mesh, P(TIME_AXIS))
