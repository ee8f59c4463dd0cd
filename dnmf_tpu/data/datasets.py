"""Dataset wrappers: device-resident video sources with ground truth.

Equivalents of the reference's torch ``Dataset`` classes
(``/root/reference/Demix/dNMF.py:196-248``) without the torch DataLoader
machinery: frames live in device memory time-major (``[T, M, N, Z]``), and
batching is index-based so jitted steps take ``(frames, times)`` blocks.

Negative voxels are clamped to zero at access time, matching the
reference's ``sample[sample < 0] = 0`` (``:215,246``).
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dnmf_tpu.config import SimulatorConfig
from dnmf_tpu.data import simulator


class VideoDataset:
    """Base: time-major video with optional ground truth."""

    video: jnp.ndarray  # [T, M, N, Z], negatives clamped
    positions: Optional[jnp.ndarray] = None  # [K, 3, T]
    traces: Optional[jnp.ndarray] = None  # [K, T]

    def __len__(self) -> int:
        return int(self.video.shape[0])

    @property
    def size(self) -> Tuple[int, int, int]:
        return tuple(int(s) for s in self.video.shape[1:])

    def __getitem__(self, idx):
        return self.video[idx], idx

    def frames_flat(self) -> jnp.ndarray:
        """``[T, P]`` flattened voxels."""
        return self.video.reshape(self.video.shape[0], -1)

    def batches(
        self, batch_size: int, *, shuffle: bool = False,
        key: Optional[jax.Array] = None, drop_remainder: bool = False,
    ) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray]]:
        """Yield ``(frames[B, M, N, Z], times[B])`` blocks."""
        t = len(self)
        order = np.arange(t)
        if shuffle:
            if key is None:
                raise ValueError("shuffle requires a PRNG key")
            order = np.asarray(jax.random.permutation(key, t))
        stop = t - t % batch_size if drop_remainder else t
        for start in range(0, stop, batch_size):
            idx = jnp.asarray(order[start:start + batch_size])
            yield self.video[idx], idx


class SimulatedVideoDataset(VideoDataset):
    """Ground-truthed synthetic video (reference ``:196-217``)."""

    def __init__(self, config: SimulatorConfig,
                 key: Optional[jax.Array] = None):
        video, positions, traces = simulator.generate_video(config, key=key)
        self.video = jnp.maximum(video, 0.0)
        self.positions = positions
        self.traces = traces
        self.config = config


class NeuroPALVideoDataset(VideoDataset):
    """Real NeuroPAL recording loaded from ``data.mat`` / ``traces_n.mat``.

    Mirrors the reference loader (``/root/reference/Demix/dNMF.py:220-248``)
    including its downsampling (``[::2, ::2, ::10, :100]``) and position
    rescaling, with the Windows-only path join fixed.
    """

    def __init__(self, directory: str,
                 downsample=(2, 2, 10), max_frames: int = 100):
        from scipy.io import loadmat

        dx, dy, dz = downsample
        vid_mat = loadmat(os.path.join(directory, "data.mat"))
        video = np.asarray(
            vid_mat["data"][::dx, ::dy, ::dz, :max_frames], dtype=np.float32
        )
        # to time-major [T, M, N, Z]
        self.video = jnp.maximum(
            jnp.asarray(np.transpose(video, (3, 0, 1, 2))), 0.0
        )

        pos_mat = loadmat(os.path.join(directory, "traces_n.mat"))
        positions = np.asarray(
            pos_mat["positions"], dtype=np.float32
        ) - 1.0  # MATLAB 1-based
        positions[:, 0, :] /= dx
        positions[:, 1, :] /= dy
        positions[:, 2, :] /= dz
        self.positions = jnp.asarray(positions[:, :, :max_frames])
        self.names = [str(n[0]) for n in pos_mat["neuron_names"][0]]
