"""Typed configuration dataclasses.

The reference has no config system: hyper-parameters live as constructor
kwargs and hard-coded constants (``/root/reference/demo.py:16-46``,
``/root/reference/Demix/MotionCorrect.py:69-174``).  Here every subsystem
gets a frozen dataclass; ``reference_demo_*`` constructors reproduce the
reference's canonical defaults so the de-facto demo benchmark is a preset.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DeformationConfig:
    """Quadratic deformation model settings.

    ``footprint_mode``:
      * ``"analytic"``  — evaluate Gaussians directly at deformed
        coordinates (fast TPU path; exact, memory-light).
      * ``"resample"``  — trilinear re-sampling of a stored footprint
        volume with ``align_corners=True`` / zero-padding semantics,
        bit-matching the reference's ``F.grid_sample`` path
        (``/root/reference/Demix/dNMF.py:56-57``) for parity validation.
    """

    footprint_mode: str = "analytic"
    # Coordinate space of the beta parameterization:
    #   "normalized" — basis built on [-1, 1]^3 coordinates; all 10
    #     coefficients have O(1) sensitivity, so Adam is well-conditioned
    #     at ordinary learning rates (TPU-native default).
    #   "pixel" — the reference's parameterization (basis on raw voxel
    #     coordinates, ``/root/reference/Demix/dNMF.py:22-23``); quadratic
    #     terms carry O(size^2) leverage, requiring tiny learning rates
    #     (the reference's lr=1e-5).  Used by parity mode.
    basis_scaling: str = "normalized"
    # Mask analytic footprints to zero where the deformed coordinate leaves
    # the volume (mimics grid_sample zero padding at the border).
    mask_out_of_bounds: bool = True
    # Reference builds the regularizer through torch.tensor(...), detaching
    # it from autograd (``/root/reference/Demix/dNMF.py:60-61``) — the
    # printed loss includes it but beta receives no gradient.  ``True``
    # reproduces that behavior; ``False`` makes it differentiable.
    detach_regularizer: bool = False


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Shapes and priors of the deformable NMF model."""

    size: Tuple[int, int, int] = (50, 50, 2)  # (M, N, Z) voxels
    num_neurons: int = 10  # K
    num_frames: int = 100  # T
    shape_std: float = 3.0  # sigma of the spherical Gaussian footprints
    # 1: per-neuron scalar widths, sigma [K] (the reference's model
    #    class, though IT freezes the scalar forever —
    #    /root/reference/Demix/dNMF.py:29).
    # 3: per-neuron PER-AXIS widths, sigma [K, 3] — anisotropic
    #    footprints for z-elongated / misshapen neurons (the reference's
    #    own rotating-cell fixture renders cells with cov diag(7, 2, ~0),
    #    /root/reference/WUtils/Simulator.py:244-285, that no isotropic
    #    model represents).  Combine with OptimizerConfig.fit_sigma to
    #    FIT the per-axis widths; every path (XLA, fused Pallas kernels,
    #    closed-form Grams) handles either shape natively.
    sigma_axes: int = 1
    deformation: DeformationConfig = dataclasses.field(
        default_factory=DeformationConfig
    )
    dtype: str = "float32"

    @property
    def num_voxels(self) -> int:
        m, n, z = self.size
        return m * n * z


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Alternating-optimization schedule.

    Mirrors the reference demo loop: ``outer_rounds`` x
    (``motion_epochs`` Adam epochs on beta + ``mu_iters`` multiplicative
    updates on C) — ``/root/reference/demo.py:42-46``.
    """

    learning_rate: float = 1e-5
    batch_size: int = 4
    outer_rounds: int = 5
    motion_epochs: int = 10
    mu_iters: int = 50
    gamma_motion: float = 1.0  # Jacobian regularizer weight ("gamma")
    gamma_traces: float = 0.0  # temporal smoothing weight ("gamma_c")
    # "parity": serial Adam over shuffled mini-batches on the full beta
    #   tensor, replicating the reference's schedule exactly.
    # "parallel": per-frame independent Adam, vmapped over frames — the
    #   TPU-native mode (per-frame beta fits are independent given C).
    motion_mode: str = "parallel"
    shuffle: bool = True
    # Coarse-to-fine sigma annealing: per-round multipliers applied to the
    # footprint widths during fitting (padded with 1.0).  Wider Gaussians
    # carry longer-range alignment gradients — with frame-to-frame motion
    # comparable to the footprint support, the data term's gradient at
    # the identity deformation is otherwise nearly zero.
    sigma_anneal: Tuple[float, ...] = ()
    # Per-neuron footprint-width fitting (BEYOND the reference, which
    # freezes sigma at shape_std forever — /root/reference/Demix/
    # dNMF.py:29).  When True, every ``sigma_every``-th non-annealed
    # round runs ``sigma_steps`` Adam iterations on log-sigma against
    # ``sigma_frames`` evenly-spaced frames (sigma is shared across
    # frames, so a subsample estimates the full gradient at a fraction
    # of the cost; see models.dnmf.sigma_fit).  The defaults keep the
    # fit inside ~10% of the round budget at K=500 (measured:
    # every-round steps=4/frames=16 nearly DOUBLED the round time).
    fit_sigma: bool = False
    sigma_lr: float = 0.05
    sigma_steps: int = 2
    sigma_frames: int = 8
    sigma_every: int = 2
    # Clip bounds as multipliers of shape_std.  The upper bound also
    # sizes the analytic-Gram lattice window, so keep it modest.
    sigma_bounds: Tuple[float, float] = (0.5, 1.6)
    # Trace-subproblem solver: "mu" is the reference's multiplicative
    # rule (/root/reference/Demix/dNMF.py:139-149); "fista" solves the
    # same convex subproblem by Nesterov-accelerated projected gradient
    # (ops.mu.nnls_temporal) — identical per-iteration cost, O(1/k^2)
    # convergence where MU stalls on correlated (overlapping-neuron)
    # Gram columns.
    trace_solver: str = "mu"
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class RegistrationConfig:
    """FFT rigid / piecewise-rigid registration settings.

    Field-for-field covers the reference ``MotionCorrect.__init__``
    hyper-parameters (``/root/reference/Demix/MotionCorrect.py:69-174``)
    that affect numerical behavior; IO/plumbing-only knobs are dropped.
    """

    max_shifts: Tuple[int, ...] = (6, 6)
    niter_rig: int = 1
    # Elastic-phase template iterations.  The reference PINS this to 1
    # (``num_iter = 1``, /root/reference/Demix/MotionCorrect.py:284) —
    # the pw-rigid phase refines the rigid phase's template, it does not
    # re-iterate its own.  Kept configurable (>1 iterates the elastic
    # template too), but independent of ``niter_rig``.
    niter_els: int = 1
    # Temporal chunking.  ``splits`` is the shared default; the reference
    # separates the rigid and elastic phases
    # (``splits_rig``/``splits_els``, /root/reference/Demix/
    # MotionCorrect.py:95-111) — set the per-phase fields to override.
    splits: int = 1
    splits_rig: Optional[int] = None
    splits_els: Optional[int] = None
    # Frames seeding the initial template.  ``None`` = ALL frames, the
    # reference's ``bin_median`` behavior (/root/reference/Demix/
    # MotionCorrect.py:432-494); an integer caps host reads on very
    # long streamed recordings (the template is iterated afterwards).
    template_init_max_frames: Optional[int] = None
    strides: Tuple[int, ...] = (96, 96)
    overlaps: Tuple[int, ...] = (32, 32)
    upsample_factor_grid: int = 4
    upsample_factor_fft: int = 10
    max_deviation_rigid: int = 3
    pw_rigid: bool = False
    is3d: bool = False
    border_nan: object = True  # True | False | "min" | "copy"
    gSig_filt: Optional[Tuple[int, ...]] = None
    min_mov: Optional[float] = None
    # Apply shifts with the interpolating remap (reference
    # ``shifts_opencv=True``) instead of per-patch DFT + feathered blending.
    use_remap: bool = True
    # How the remap samples the frame: "exact" gather-based trilinear
    # (cv2.remap semantics; XLA lowers the gather to per-element DMAs —
    # ~750 ms/frame at 512x512x20 on TPU) or "separable" (gather-free
    # sequential 1-D passes, ~2 orders of magnitude faster on TPU,
    # <~0.1 px positional error on patch-smooth fields).
    remap_mode: str = "exact"
    # Decimate the global rigid PRE-estimate inside tile_and_correct by
    # this x/y factor (it only bounds the per-patch search; 2-4 keeps
    # ~0.1-0.2 px accuracy at 1/d^2 the full-frame FFT cost).  1 = the
    # reference's full-resolution estimate.
    rigid_decimate: int = 1
    # Frames per device dispatch: device memory is bounded by
    # frame_block * frame size regardless of T (the reference materializes
    # whole chunks per worker, ``:2031-2058``).
    frame_block: int = 16
    # During template-refinement iterations (all but the last), register
    # only this many chunks — the reference's ``num_splits_to_process_*``
    # knob (``:1846-1858``, which samples chunks randomly per iteration;
    # here a deterministic evenly-spaced subset, and the FINAL iteration
    # always processes every chunk so shifts/movie are complete).  The
    # shared value is the default; ``*_rig``/``*_els`` override per phase
    # (reference ``num_splits_to_process_rig/els``, ``:95-111``).
    num_splits_to_process: Optional[int] = None
    num_splits_to_process_rig: Optional[int] = None
    num_splits_to_process_els: Optional[int] = None
    # Keep the corrected movie (host-resident).  False => shifts +
    # templates only; memory does not scale with T.
    return_mc: bool = True
    # Per-patch correlation engine for pw-rigid frame blocks:
    # "auto" (fused Pallas kernel for 3-D remap blocks on TPU, XLA
    # matrix-DFT otherwise), "fused", or "xla"
    # (dnmf_tpu/ops/pallas_phasecorr.py; measured 8.7 -> 4.9 ms/frame
    # at 512x512x20 / 32 patches).
    phasecorr_impl: str = "auto"
    # DFT dot precision inside the fused kernel: "highest" (6-pass f32
    # emulation), "high" (bf16x3, ~1e-6 relative — default), "default"
    # (single-pass bf16, ~0.4% — integer peaks still exact on noise
    # fixtures, subpixel slightly perturbed).
    dft_precision: str = "high"

    def resolved_splits(self, phase: str) -> int:
        """Per-phase chunk count (``phase`` in {"rig", "els"})."""
        v = self.splits_rig if phase == "rig" else self.splits_els
        return self.splits if v is None else v

    def resolved_num_splits_to_process(self, phase: str) -> Optional[int]:
        v = (self.num_splits_to_process_rig if phase == "rig"
             else self.num_splits_to_process_els)
        return self.num_splits_to_process if v is None else v


@dataclasses.dataclass(frozen=True)
class SimulatorConfig:
    """Synthetic-video generator settings (ground-truthed fixture).

    Matches ``generate_video`` (``/root/reference/WUtils/Simulator.py:20-77``)
    with the motion-model-name bug fixed: both ``"sq"`` (docstring name) and
    ``"qs"`` (dispatch name) select sequential-quadratic motion.
    """

    num_neurons: int = 10
    num_frames: int = 100
    size: Tuple[int, int, int] = (50, 50, 2)
    shape_std: float = 3.0
    density: float = 0.2
    bg_snr_db: float = -120.0
    traces: str = "exp"
    motion: str = "gp"  # "gp" | "sq"/"qs" (sequential quadratic) | "q"
    # GP motion parameters (motion == "gp")
    gp_sigma: Tuple[float, float, float] = (5.0, 5.0, 0.01)
    gp_length_scale: Tuple[float, float, float] = (10.0, 10.0, 10.0)
    # Quadratic motion parameters (motion in {"sq", "qs", "q"})
    motion_means: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    motion_snr_db: Tuple[float, float, float] = (-100.0, -100.0, -100.0)
    # Fixture-quality constraints on random anchors (0 = reference
    # behavior, which can place neurons arbitrarily close / at the border).
    min_separation: float = 0.0
    margin: float = 0.0
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """Execution / partitioning settings."""

    # Frames processed per device step when streaming long recordings.
    frame_block: int = 8
    # Mesh axis sizes; None => single device.  mesh_pixel shards voxels
    # (tensor parallelism for the [K,K] MU Grams at large K; analytic
    # footprints; works with both the XLA and fused-Pallas paths).
    mesh_time: Optional[int] = None
    mesh_batch: Optional[int] = None
    mesh_pixel: Optional[int] = None
    # Fused Pallas kernels for footprint evaluation + Gram/gradient
    # accumulation (None = auto: on for TPU backends with analytic
    # footprints).
    use_pallas: Optional[bool] = None
    # MU Gram computation:
    #   "auto"     — "analytic" wherever it is valid (analytic
    #     footprints, no pixel mesh), "exact" otherwise.  The production
    #     default: measured 2.04x end-to-end at K=500 / 1.2x at K=200
    #     with identical recovery (BASELINE.md), guarded by the
    #     per-fit trust audit below.
    #   "exact"    — the O(P K^2) pixel reduction (also the parity /
    #     audit path and the only mode on pixel meshes).
    #   "analytic" — closed form, O(K^2) (ops/gram_analytic.py); only
    #     the c1 video pass remains.  Requires analytic footprints;
    #     single device or time meshes, not pixel meshes.
    gram_mode: str = "auto"
    # Trust gate for analytic Grams: once per fit, ONE frame's exact
    # Gram (the frame with the strongest warp) is compared against the
    # closed form; a max relative error above this tolerance falls the
    # fit back to gram_mode="exact" with a warning.  The analytic
    # form's residual is the cross-quadratic warp term (~1e-3 at
    # realistic warps, see ops/gram_analytic.py) — a breach means the
    # warp left the closed form's regime.  None disables the audit.
    gram_trust_tol: Optional[float] = 0.02
    # Raise on non-finite factors after each update phase (the analog of
    # the reference's hard NaN guards in MotionCorrect, SURVEY.md §5).
    check_finite: bool = False
    # Capture a jax.profiler trace of each fit() round into this dir.
    profile_dir: Optional[str] = None
    checkpoint_dir: Optional[str] = None
    metrics_path: Optional[str] = None


def high_snr_registration(**overrides) -> RegistrationConfig:
    """Fast-correlation preset for KNOWN-HIGH-SNR recordings.

    Runs the fused phase-correlation dots in single-pass bf16
    (``dft_precision="default"``): measured 3.6 vs 4.9 ms/frame on the
    whole-brain correlation stage.  NOT the default because at low SNR
    it is a measured accuracy regression — on the
    ``tools/dft_precision_sweep.py`` fixture (256x256x10, subpixel
    shifts, usf=10) the -5 dB small-shift mean error nearly doubles
    (0.026 -> 0.046 px) and estimates deviate from the "high" (bf16x3)
    path by up to 0.125 px, i.e. a different subpixel bin.  Use only
    where SNR is comfortably positive; any field can be overridden.
    """
    return RegistrationConfig(**{"dft_precision": "default", **overrides})


def reference_demo_model(parity: bool = False) -> ModelConfig:
    """The reference demo model shapes (``/root/reference/demo.py:16-19``).

    ``parity=True`` selects the reference's exact numerics: pixel-space
    beta parameterization, grid_sample-style resampled footprints, and the
    detached (gradient-free) Jacobian regularizer.
    """
    deform = (
        DeformationConfig(footprint_mode="resample", basis_scaling="pixel",
                          detach_regularizer=True)
        if parity
        else DeformationConfig()
    )
    return ModelConfig(size=(50, 50, 2), num_neurons=10, num_frames=100,
                       shape_std=3.0, deformation=deform)


def reference_demo_optimizer() -> OptimizerConfig:
    """The reference demo schedule (``/root/reference/demo.py:33,42-46``)."""
    return OptimizerConfig(learning_rate=1e-5, batch_size=4, outer_rounds=5,
                           motion_epochs=10, mu_iters=50, gamma_motion=1.0,
                           gamma_traces=0.0)


def reference_demo_simulator() -> SimulatorConfig:
    """The reference demo fixture (``/root/reference/demo.py:26-28``)."""
    return SimulatorConfig(num_neurons=10, num_frames=100, size=(50, 50, 2),
                           shape_std=3.0, density=0.2, bg_snr_db=-120.0,
                           traces="exp", motion="gp",
                           gp_sigma=(5.0, 5.0, 0.01),
                           gp_length_scale=(10.0, 10.0, 10.0))


def baseline_workload(name: str):
    """BASELINE.md scaling configs as (model, runtime) presets.

    ``demo``        — config 1: the reference demo scale (CPU-runnable).
    ``roi``         — config 2: 256x256x10, K=50, 500 frames.
    ``whole_brain`` — config 3: 512x512x20, K=200, 1k frames (streamed).
    ``long``        — config 4: 10k frames, K=500, frame-sharded mesh.
    ``multi``       — config 5: 32 recordings x K=200 (batched rounds).
    """
    presets = {
        "demo": (ModelConfig(size=(50, 50, 2), num_neurons=10,
                             num_frames=100),
                 RuntimeConfig(frame_block=16)),
        "roi": (ModelConfig(size=(256, 256, 10), num_neurons=50,
                            num_frames=500),
                RuntimeConfig(frame_block=8)),
        "whole_brain": (ModelConfig(size=(512, 512, 20), num_neurons=200,
                                    num_frames=1000),
                        RuntimeConfig(frame_block=2)),
        "long": (ModelConfig(size=(512, 512, 20), num_neurons=500,
                             num_frames=10240),
                 RuntimeConfig(frame_block=2, mesh_time=8)),
        "multi": (ModelConfig(size=(256, 256, 10), num_neurons=200,
                              num_frames=512),
                  RuntimeConfig(frame_block=4, mesh_batch=16)),
    }
    if name not in presets:
        raise KeyError(f"unknown workload {name!r}; "
                       f"choose from {sorted(presets)}")
    return presets[name]
