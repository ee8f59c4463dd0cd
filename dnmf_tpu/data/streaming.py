"""Host-streamed video source for recordings larger than device memory.

Whole-brain configs (BASELINE.md config 3+: 512x512x20 x 1k-10k frames)
exceed single-chip HBM, so the engine can consume frames in fixed-size
blocks transferred host->device per step.  The source wraps any
NumPy-like array — including ``np.memmap``, so multi-hundred-GB
recordings stream straight from disk (the reference holds everything in
host RAM, ``/root/reference/Demix/dNMF.py:72-93``).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import jax.numpy as jnp
import numpy as np


class StreamingVideo:
    """Frame-block iterator over a host-resident (or memmapped) video.

    Args:
      array: ``[T, M, N, Z]`` or ``[T, P]`` NumPy-like array (memmap ok).
      block: frames per device transfer; the final block is zero-padded
        to a fixed shape (one compiled program serves every block) and
        accompanied by a validity count.
    """

    def __init__(self, array, block: int = 64):
        self.array = array
        self.block = int(block)
        self.num_frames = int(array.shape[0])
        # Spatial shape; None for flat [T, P] sources (pixel-sharded
        # streaming requires a spatial shape and checks for this).
        self.size = (tuple(int(s) for s in array.shape[1:])
                     if array.ndim == 4 else None)
        self.num_voxels = int(np.prod(array.shape[1:]))

    def __len__(self) -> int:
        return self.num_frames

    def num_blocks(self) -> int:
        return -(-self.num_frames // self.block)

    def read(self, start: int, stop: int) -> np.ndarray:
        """Host read of frames ``[start, stop)`` as clamped f32 ``[n, P]``.

        Used by the mesh-sharded streaming drivers to assemble one
        per-shard block row from each shard's contiguous frame range.
        """
        return np.maximum(self.read_raw(start, stop), 0.0)

    def read_raw(self, start: int, stop: int) -> np.ndarray:
        """Host read WITHOUT the NMF non-negativity clamp — registration
        must see the recording's true values (the reference registers
        the raw movie; clamping would shift ``min_mov`` and the
        templates on offset-subtracted recordings with negative
        baselines)."""
        return np.asarray(
            self.array[start:stop], dtype=np.float32
        ).reshape(stop - start, -1)

    def blocks(self) -> Iterator[Tuple[jnp.ndarray, int, int]]:
        """Yield ``(frames [block, P] device array, start, valid)``."""
        for start in range(0, self.num_frames, self.block):
            stop = min(start + self.block, self.num_frames)
            chunk = np.asarray(
                self.array[start:stop], dtype=np.float32
            ).reshape(stop - start, -1)
            chunk = np.maximum(chunk, 0.0)
            valid = stop - start
            if valid < self.block:
                chunk = np.pad(chunk,
                               ((0, self.block - valid), (0, 0)))
            yield jnp.asarray(chunk), start, valid


def open_memmap_video(path: str, shape, dtype=np.float32,
                      block: int = 64) -> StreamingVideo:
    """Open a raw binary volume sequence as a streaming source."""
    mm = np.memmap(path, dtype=dtype, mode="r", shape=tuple(shape))
    return StreamingVideo(mm, block=block)


class RawFileVideo:
    """Streaming source over a raw float32 ``[T, ...spatial]`` file,
    backed by the native threaded block reader
    (:mod:`dnmf_tpu.native`): reads+clamps run on native threads and the
    NEXT block prefetches while the device computes on the current one.

    Same interface as :class:`StreamingVideo` (``read``/``blocks``), so
    every streamed epoch accepts it interchangeably.
    """

    def __init__(self, path: str, shape, block: int = 64,
                 num_threads: int = 4, prefetch: bool = True):
        from dnmf_tpu.native import BlockReader

        shape = tuple(int(s) for s in shape)
        self.path = path
        self.num_frames = shape[0]
        self.size = shape[1:] if len(shape) == 4 else None
        self.num_voxels = int(np.prod(shape[1:]))
        self.block = int(block)
        self.prefetch = bool(prefetch)
        self._reader = BlockReader(path, self.num_frames,
                                   self.num_voxels,
                                   num_threads=num_threads)
        self._raw_map = None

    def __len__(self) -> int:
        return self.num_frames

    def num_blocks(self) -> int:
        return -(-self.num_frames // self.block)

    def read(self, start: int, stop: int) -> np.ndarray:
        return self._reader.read(start, stop)

    def read_raw(self, start: int, stop: int) -> np.ndarray:
        """Unclamped host read for registration (the native reader
        clamps during its copy, so raw reads go through a lazily-opened
        memmap over the same file)."""
        if self._raw_map is None:
            self._raw_map = np.memmap(
                self.path, dtype=np.float32, mode="r",
                shape=(self.num_frames, self.num_voxels))
        return np.asarray(self._raw_map[start:stop], dtype=np.float32)

    def blocks(self) -> Iterator[Tuple[jnp.ndarray, int, int]]:
        starts = list(range(0, self.num_frames, self.block))
        if self.prefetch and starts:
            s0 = starts[0]
            self._reader.prefetch(s0, min(s0 + self.block,
                                          self.num_frames))
        for i, start in enumerate(starts):
            stop = min(start + self.block, self.num_frames)
            if self.prefetch:
                chunk = self._reader.wait(start, stop)
                if i + 1 < len(starts):
                    n0 = starts[i + 1]
                    self._reader.prefetch(
                        n0, min(n0 + self.block, self.num_frames)
                    )
            else:
                chunk = self._reader.read(start, stop)
            valid = stop - start
            if valid < self.block:
                chunk = np.pad(chunk,
                               ((0, self.block - valid), (0, 0)))
            yield jnp.asarray(chunk), start, valid


class SpatialView:
    """NumPy-like ``[T, M, N, Z]`` read view over a streaming source.

    Registration (:class:`dnmf_tpu.registration.MotionCorrect`) consumes
    host arrays through ``shape`` + ``__getitem__`` only; this adapter
    satisfies that contract for ``StreamingVideo``/``RawFileVideo`` by
    translating integer/slice/fancy indexing into grouped contiguous
    ``read_raw()`` calls — so the one-call pipeline
    (:func:`dnmf_tpu.engine.pipeline.register_and_demix`) can register a
    recording that never fits in memory.  Reads are UNCLAMPED (the
    reference registers the raw movie — ``min_mov`` and the templates
    must see negative baselines on offset-subtracted recordings; the
    NMF clamp applies only to the demixing reads).
    """

    def __init__(self, source):
        if getattr(source, "size", None) is None:
            raise ValueError(
                "registration needs the spatial shape — wrap a "
                "[T, M, N, Z] source, not a flat [T, P] one"
            )
        self.source = source
        self.shape = (source.num_frames,) + tuple(source.size)
        self.ndim = 4
        self._read = getattr(source, "read_raw", source.read)

    def __len__(self) -> int:
        return self.shape[0]

    def __getitem__(self, key) -> np.ndarray:
        t = self.shape[0]
        squeeze = False
        if isinstance(key, slice):
            start, stop, step = key.indices(t)
            idx = np.arange(start, stop, step)
        elif np.isscalar(key) or (isinstance(key, np.ndarray)
                                  and key.ndim == 0):
            idx = np.asarray([int(key)])
            squeeze = True
        else:
            idx = np.asarray(key).reshape(-1)
        # NumPy index semantics: negatives count from the end, anything
        # outside [-t, t) raises.
        if len(idx) and (idx.min() < -t or idx.max() >= t):
            raise IndexError(
                f"frame index out of range for {t} frames: "
                f"[{idx.min()}, {idx.max()}]")
        idx = np.where(idx < 0, idx + t, idx)
        out = np.empty((len(idx),) + self.shape[1:], np.float32)
        i = 0
        while i < len(idx):  # group ascending contiguous runs
            j = i
            while j + 1 < len(idx) and idx[j + 1] == idx[j] + 1:
                j += 1
            chunk = self._read(int(idx[i]), int(idx[j]) + 1)
            out[i:j + 1] = chunk.reshape((j - i + 1,) + self.shape[1:])
            i = j + 1
        return out[0] if squeeze else out


def open_raw_video(path: str, shape, block: int = 64,
                   num_threads: int = 4, prefetch: bool = True):
    """Open a raw float32 recording with the native prefetching reader,
    falling back to a memmapped :class:`StreamingVideo` when no
    compiler/loader is available."""
    from dnmf_tpu.native import load_blockreader

    if load_blockreader() is not None:
        return RawFileVideo(path, shape, block=block,
                            num_threads=num_threads, prefetch=prefetch)
    return open_memmap_video(path, shape, block=block)
