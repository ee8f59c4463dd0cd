"""Multi-host (multi-process) initialization for pod-scale runs.

The reference's distribution story is single-host process pools fed by
pickled chunks (``/root/reference/Demix/MotionCorrect.py:2109-2117``).
The TPU-native equivalent is ``jax.distributed``: every host process
calls :func:`initialize_distributed` once at startup, after which
``jax.devices()`` spans the whole slice/pod, the same ``make_mesh``
calls build global meshes, and XLA emits the cross-host collectives
(psum/ppermute ride ICI within a slice, DCN across slices) — no
hand-written transport.

This module is intentionally thin: on TPU pods the runtime discovers
the coordinator/process topology from the environment, so zero-argument
initialization is the common case.  It cannot be exercised in a
single-host CI environment (no second process/coordinator); multi-device
semantics are validated on the virtual CPU mesh instead
(``tests/test_sharding.py``, SURVEY.md §4), which compiles the identical
SPMD programs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join this process to a multi-host JAX runtime.

    Call once per host process, before any other JAX API touches a
    backend.  On Cloud TPU all arguments are auto-detected from the
    environment; on other platforms pass them explicitly.

    Args:
      coordinator_address: ``"ip:port"`` of process 0 (auto on TPU).
      num_processes: total host processes (auto on TPU).
      process_id: this process's index (auto on TPU).
      local_device_ids: restrict this process to a subset of its local
        devices (rarely needed).
    """
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def is_distributed() -> bool:
    """True when running under a multi-process JAX runtime."""
    return jax.process_count() > 1


def process_summary() -> dict:
    """Small observability record for logs/metrics sinks."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }
