"""Utilities: volume/patch helpers, metrics, checkpointing."""

from dnmf_tpu.utils.metrics import r_squared, trace_correlations
from dnmf_tpu.utils.volume import (
    max_project,
    pairwise_distances,
    placement,
    subcube,
    superpose,
)

__all__ = [
    "r_squared",
    "trace_correlations",
    "max_project",
    "pairwise_distances",
    "placement",
    "subcube",
    "superpose",
]
