"""dnmf-tpu: TPU-native deformable non-negative matrix factorization.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the dNMF
reference framework (mathdiane/dNMF): demixing calcium-imaging videos of
moving, deforming animals by alternating between

* gradient fits of per-frame quadratic (2nd-order polynomial) deformations
  of 3-D space applied to Gaussian neuron footprints, and
* multiplicative non-negative updates of per-neuron activity traces,

plus an FFT-based rigid / piecewise-rigid registration stack, a
ground-truthed video simulator, trace post-processing, and visualization.

Design stance (TPU-first, not a port):

* Footprints are *analytic* Gaussians of (position, sigma), so instead of
  storing a footprint volume and warping it through a trilinear resampler
  (reference: ``Demix/dNMF.py:39-40,56-57``), the hot path evaluates
  ``exp(-||T_beta(x) - p_k||^2 / sigma_k^2)`` directly at deformed
  coordinates.  The exponent is an affine function of
  ``[psi, ||psi||^2]``, which makes footprint evaluation, reconstruction
  and the NMF Gram matrices pure MXU matmuls.
* Everything is a jit-compiled pure function over an explicit ``DNMFState``
  pytree; time loops are ``lax.scan``; frames stream through in blocks so
  the O(M*N*Z*K*T) warped-footprint tensor of the reference is never
  materialized.
* Long recordings shard frame-wise over a ``jax.sharding.Mesh``
  (axes ``('batch', 'time', 'pixel')``); the only cross-frame coupling
  (temporal smoothing in the multiplicative update) is a +-1-frame
  ``ppermute`` halo, and large-K Gram matrices tensor-parallelize over
  the voxel (``pixel``) axis with one ``psum``.
"""

__version__ = "0.2.0"

from dnmf_tpu.config import (
    DeformationConfig,
    ModelConfig,
    OptimizerConfig,
    RegistrationConfig,
    RuntimeConfig,
    SimulatorConfig,
    high_snr_registration,
)

__all__ = [
    "DeformationConfig",
    "ModelConfig",
    "OptimizerConfig",
    "RegistrationConfig",
    "RuntimeConfig",
    "SimulatorConfig",
    "high_snr_registration",
    "__version__",
]
