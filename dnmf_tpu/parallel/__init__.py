"""Partitioning layer: device meshes, frame-sharded training steps, and
the +-1-frame halo exchange for temporally-smoothed trace updates."""

from dnmf_tpu.parallel.distributed import (
    initialize_distributed,
    is_distributed,
    process_summary,
)
from dnmf_tpu.parallel.batched import (
    batched_round,
    stack_states,
    unstack_states,
)
from dnmf_tpu.parallel.mesh import make_mesh, video_sharding
from dnmf_tpu.parallel.registration import (
    sharded_register_pwrigid,
    sharded_register_rigid,
)
from dnmf_tpu.parallel.streaming import (
    sharded_compute_grams_streaming,
    sharded_motion_epoch_streaming,
)
from dnmf_tpu.parallel.sharded import (
    sharded_compute_grams,
    sharded_footprint_update,
    sharded_motion_epoch,
    shard_state,
    shard_video,
)

__all__ = [
    "batched_round",
    "stack_states",
    "unstack_states",
    "make_mesh",
    "initialize_distributed",
    "is_distributed",
    "process_summary",
    "video_sharding",
    "sharded_compute_grams",
    "sharded_footprint_update",
    "sharded_motion_epoch",
    "sharded_motion_epoch_streaming",
    "sharded_compute_grams_streaming",
    "sharded_register_rigid",
    "sharded_register_pwrigid",
    "shard_state",
    "shard_video",
]
