"""Data layer: ground-truthed synthetic video simulator (the deterministic
test fixture) and dataset wrappers for simulated / real recordings."""

from dnmf_tpu.data.datasets import NeuroPALVideoDataset, SimulatedVideoDataset
from dnmf_tpu.data.streaming import (
    RawFileVideo,
    SpatialView,
    StreamingVideo,
    open_memmap_video,
    open_raw_video,
)
from dnmf_tpu.data.simulator import (
    exponential_traces,
    generate_video,
    gp_motion,
    quadratic_sequential_trajectory,
    quadratic_trajectory,
    render_video,
    roi_signals,
)

__all__ = [
    "NeuroPALVideoDataset",
    "RawFileVideo",
    "SimulatedVideoDataset",
    "SpatialView",
    "StreamingVideo",
    "open_memmap_video",
    "open_raw_video",
    "exponential_traces",
    "generate_video",
    "gp_motion",
    "quadratic_sequential_trajectory",
    "quadratic_trajectory",
    "render_video",
    "roi_signals",
]
