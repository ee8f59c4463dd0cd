"""Engine: the user-facing alternating-optimization driver."""

from dnmf_tpu.engine.trainer import DeformableNMF, FitResult

__all__ = ["DeformableNMF", "FitResult"]
