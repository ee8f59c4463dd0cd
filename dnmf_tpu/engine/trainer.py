"""User-facing driver: alternating deformation fits and trace updates.

Equivalent of the reference demo loop
(``/root/reference/demo.py:41-46``: 5 outer rounds of 10 Adam epochs on
beta + 50 MU iterations on C) as a configured, metric-logging, resumable
engine.  All heavy steps are jitted device functions; the Python level
only sequences epochs and collects scalar metrics.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dnmf_tpu.config import ModelConfig, OptimizerConfig, RuntimeConfig
from dnmf_tpu.models import dnmf as model_lib


@dataclasses.dataclass
class FitResult:
    state: model_lib.DNMFState
    metrics: List[dict]

    @property
    def traces(self) -> np.ndarray:
        return np.asarray(self.state.c)

    @property
    def beta(self) -> np.ndarray:
        return np.asarray(self.state.beta)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _positions_all_jit(pos, beta, iters, normalized, size):
    """``[T, K, 3]`` apparent positions: ``warp_t^{-1}(pos)`` per frame
    (module scope so jit compiles once across trainer instances).
    ``pos`` may be shared ``[K, 3]`` anchors or per-frame refined
    ``[T, K, 3]`` positions (post-:meth:`DeformableNMF.refine`)."""
    from dnmf_tpu.ops.basis import (
        denormalize_points,
        invert_warp_points,
        normalize_points,
    )

    tracked = pos.ndim == 3
    if normalized:
        p = normalize_points(pos, size)
        if tracked:
            inv = jax.vmap(
                lambda pp, b: invert_warp_points(pp, b, iters=iters)
            )(p, beta)
        else:
            inv = jax.vmap(
                lambda b: invert_warp_points(p, b, iters=iters)
            )(beta)
        return denormalize_points(inv, size)
    if tracked:
        return jax.vmap(
            lambda pp, b: invert_warp_points(pp, b, iters=iters)
        )(pos, beta)
    return jax.vmap(
        lambda b: invert_warp_points(pos, b, iters=iters)
    )(beta)


def audit_analytic_gram(state, model: ModelConfig, window=None,
                        use_pallas: bool = False) -> dict:
    """One-frame exact-vs-analytic Gram comparison (the trust gate).

    Picks the frame whose beta deviates most from the identity warp (the
    closed form's residual grows with warp strength — cross-quadratic
    terms, see :mod:`dnmf_tpu.ops.gram_analytic`), computes that frame's
    Gram both ways, and returns ``{"frame", "rel_err"}`` where
    ``rel_err`` is ``max|G_an - G_exact| / max|G_exact|``.
    """
    from dnmf_tpu.ops import basis as basis_ops
    from dnmf_tpu.ops import gram_analytic as ga

    ident = basis_ops.identity_beta(1)[0]
    severity = jnp.sum(jnp.abs(state.beta - ident), axis=(1, 2))
    t_idx = int(jnp.argmax(severity))
    beta1 = jax.lax.dynamic_slice_in_dim(state.beta, t_idx, 1)
    state1 = state._replace(beta=beta1, c=state.c[:, :1])
    # The Gram is video-independent — a zero frame feeds the c1 pass.
    zeros = jnp.zeros((1, model.num_voxels), jnp.float32)
    g_exact, _ = model_lib.compute_grams(
        state1, zeros, model, frame_block=1, use_pallas=use_pallas,
        gram_mode="exact",
    )
    if window is None:
        from dnmf_tpu.ops import gram_analytic as _ga

        window = _ga.default_window(model.shape_std)
    g_an = ga.analytic_grams(
        beta1, state.pos, state.sigma, model.size,
        scaling=model.deformation.basis_scaling, window=window,
    )
    rel = float(
        jnp.max(jnp.abs(g_an - g_exact))
        / jnp.maximum(jnp.max(jnp.abs(g_exact)), 1e-30)
    )
    return {"frame": t_idx, "rel_err": rel}


class DeformableNMF:
    """Alternating optimizer over a device-resident video.

    Usage::

        dnmf = DeformableNMF(model_cfg, opt_cfg, positions=pos0)
        result = dnmf.fit(video)   # video [T, M, N, Z] or dataset
    """

    def __init__(
        self,
        model: ModelConfig,
        optimizer: OptimizerConfig,
        runtime: Optional[RuntimeConfig] = None,
        positions: Optional[jnp.ndarray] = None,
        key: Optional[jax.Array] = None,
        beta0: Optional[jnp.ndarray] = None,
    ):
        self.model = model
        self.opt_config = optimizer
        self.runtime = runtime or RuntimeConfig()
        self.optimizer = model_lib.make_motion_optimizer(optimizer)
        self._key = key if key is not None else jax.random.PRNGKey(
            optimizer.seed
        )
        self._key, init_key = jax.random.split(self._key)
        self.state = model_lib.init_state(
            model, self.optimizer, positions=positions, key=init_key,
            beta0=beta0,
        )
        self.metrics: List[dict] = []
        self._base_sigma = self.state.sigma
        self._mesh = None
        if self.runtime.mesh_batch and not self.runtime.mesh_time:
            raise ValueError(
                "mesh_batch partitions recordings, which a single "
                "DeformableNMF does not have — use "
                "dnmf_tpu.parallel.batched for multi-recording runs "
                "(set mesh_time for frame sharding)"
            )
        if (self.runtime.mesh_time or self.runtime.mesh_pixel) \
                and optimizer.motion_mode == "parity":
            raise ValueError(
                "parity motion mode is batch-serial and bypasses the "
                "mesh; use motion_mode='parallel' with mesh axes"
            )
        if self.runtime.mesh_pixel and self.runtime.mesh_pixel > 1:
            p = model.size[0] * model.size[1] * model.size[2]
            if model.deformation.footprint_mode != "analytic":
                raise ValueError(
                    "mesh_pixel (Gram tensor parallelism) requires "
                    "analytic footprints"
                )
            if p % self.runtime.mesh_pixel:
                raise ValueError(
                    "voxel count must divide evenly over mesh_pixel"
                )
        if self.runtime.mesh_time or self.runtime.mesh_pixel:
            from dnmf_tpu.parallel import make_mesh, shard_state

            self._mesh = make_mesh(
                num_time=self.runtime.mesh_time or 1,
                num_batch=self.runtime.mesh_batch or 1,
                num_pixel=self.runtime.mesh_pixel or 1,
            )
            if model.num_frames % (self.runtime.mesh_time or 1):
                raise ValueError(
                    "num_frames must divide evenly over mesh_time"
                )
            self.state = shard_state(self.state, self._mesh)
        if self.runtime.use_pallas is None:
            self._use_pallas = (
                jax.default_backend() == "tpu"
                and model.deformation.footprint_mode == "analytic"
            )
        else:
            self._use_pallas = bool(self.runtime.use_pallas)
        mode = self.runtime.gram_mode
        if mode == "auto":
            # Production default: closed-form Grams wherever valid
            # (2.04x end-to-end at K=500, BASELINE.md), guarded by the
            # once-per-fit exact-Gram trust audit.
            analytic_ok = (
                model.deformation.footprint_mode == "analytic"
                and (self.runtime.mesh_pixel or 1) <= 1
            )
            mode = "analytic" if analytic_ok else "exact"
        elif mode not in ("exact", "analytic"):
            raise ValueError(f"unknown gram_mode: {mode!r} "
                             "(expected 'auto', 'exact', or 'analytic')")
        self._gram_mode = mode
        self._gram_audited = False

    class _Prepared:
        """Marker wrapper: video already flattened/clamped/sharded."""

        __slots__ = ("array",)

        def __init__(self, array):
            self.array = array

    # ------------------------------------------------------------------
    def _video_flat(self, video) -> jnp.ndarray:
        if isinstance(video, DeformableNMF._Prepared):
            return video.array
        if hasattr(video, "frames_flat"):
            video = video.frames_flat()
        else:
            video = jnp.asarray(video)
            if video.ndim == 4:
                video = video.reshape(video.shape[0], -1)
            # NMF non-negativity: clamp raw arrays exactly like the
            # dataset wrappers and StreamingVideo do (the reference clamps
            # at dataset access, /root/reference/Demix/dNMF.py:215,246).
            video = jnp.maximum(video, 0.0)
        if self._mesh is not None:
            from dnmf_tpu.parallel import shard_video

            video = shard_video(video, self._mesh)
        return video

    def _epoch_batches(self, key):
        """Shuffled, zero-padded batch index/weight arrays for parity mode."""
        t = self.model.num_frames
        b = self.opt_config.batch_size
        order = (
            np.asarray(jax.random.permutation(key, t))
            if self.opt_config.shuffle
            else np.arange(t)
        )
        pad = (-t) % b
        times = np.concatenate([order, np.zeros(pad, dtype=order.dtype)])
        weights = np.concatenate(
            [np.ones(t, np.float32), np.zeros(pad, np.float32)]
        )
        nb = (t + pad) // b
        return (
            jnp.asarray(times.reshape(nb, b)),
            jnp.asarray(weights.reshape(nb, b)),
        )

    def _gram_window(self):
        """Static per-axis window bound for analytic Grams, covering the
        largest sigma the fit will see (sigma_anneal scales sigma up to
        max(factors) * shape_std; ops/gram_analytic needs the window
        sized for the ACTUAL sigma, which is traced)."""
        if self._gram_mode != "analytic":
            return None
        from dnmf_tpu.ops import gram_analytic as ga

        factor = max((1.0,) + tuple(self.opt_config.sigma_anneal))
        if self.opt_config.fit_sigma:
            # Fitted sigmas may climb to the upper clip bound.
            factor = max(factor, self.opt_config.sigma_bounds[1])
        return ga.default_window(factor * self.model.shape_std)

    def _maybe_audit_analytic(self) -> None:
        """Trust gate for the closed-form Grams (once per fit).

        Compares ONE frame's exact Gram — the frame whose beta deviates
        most from the identity warp — against the analytic form; a max
        relative error above ``runtime.gram_trust_tol`` falls the fit
        back to ``gram_mode="exact"`` with a warning.  The Gram depends
        only on (beta, pos, sigma), so the audit needs no video data.
        """
        if self._gram_mode != "analytic" or self._gram_audited:
            return
        self._gram_audited = True
        tol = self.runtime.gram_trust_tol
        if tol is None:
            return
        audit = audit_analytic_gram(
            self.state, self.model, window=self._gram_window(),
            use_pallas=self._use_pallas,
        )
        entry = {"phase": "gram_audit", "tol": tol, **audit}
        self.metrics.append(entry)
        if audit["rel_err"] > tol:
            import warnings

            warnings.warn(
                "analytic-Gram trust audit breached "
                f"(frame {audit['frame']}: rel err {audit['rel_err']:.2e}"
                f" > tol {tol:g}) — falling back to gram_mode='exact' "
                "for the rest of this engine's updates",
                RuntimeWarning,
            )
            self._gram_mode = "exact"

    @staticmethod
    def _is_streaming(video) -> bool:
        return hasattr(video, "blocks") and not hasattr(video,
                                                        "frames_flat")

    # ------------------------------------------------------------------
    def update_motion(self, video, epochs: Optional[int] = None) -> dict:
        """Run ``epochs`` of deformation fitting (reference
        ``update_motion``)."""
        epochs = epochs or self.opt_config.motion_epochs
        gamma = self.opt_config.gamma_motion
        if self._is_streaming(video):
            last = {}
            for _ in range(epochs):
                if self._mesh is not None:
                    from dnmf_tpu.parallel import (
                        sharded_motion_epoch_streaming,
                    )

                    self.state, m = sharded_motion_epoch_streaming(
                        self.state, video, self.model, self.optimizer,
                        gamma, mesh=self._mesh,
                        use_pallas=self._use_pallas,
                    )
                else:
                    self.state, m = model_lib.motion_epoch_streaming(
                        self.state, video, self.model, self.optimizer,
                        gamma, use_pallas=self._use_pallas,
                    )
                last = {k: float(v) for k, v in m.items()}
                self.metrics.append({"phase": "motion", **last})
            return last
        video_flat = self._video_flat(video)
        last = {}
        for _ in range(epochs):
            if self.opt_config.motion_mode == "parity":
                self._key, bkey = jax.random.split(self._key)
                times, weights = self._epoch_batches(bkey)
                self.state, m = model_lib.motion_epoch_parity(
                    self.state, video_flat, times, weights, self.model,
                    self.optimizer, gamma,
                )
            elif self._mesh is not None:
                from dnmf_tpu.parallel import sharded_motion_epoch

                self.state, m = sharded_motion_epoch(
                    self.state, video_flat, self.model, self.optimizer,
                    gamma, mesh=self._mesh,
                    frame_block=self.runtime.frame_block,
                    use_pallas=self._use_pallas,
                )
            else:
                self.state, m = model_lib.motion_epoch_parallel(
                    self.state, video_flat, self.model, self.optimizer,
                    gamma, frame_block=self.runtime.frame_block,
                    use_pallas=self._use_pallas,
                )
            last = {k: float(v) for k, v in m.items()}
            self.metrics.append({"phase": "motion", **last})
        return last

    def update_footprints(self, video, iters: Optional[int] = None) -> dict:
        """Recompute Grams once, then run MU trace iterations (reference
        ``update_footprints`` without the host round-trip)."""
        iters = iters or self.opt_config.mu_iters
        self._maybe_audit_analytic()
        if self._is_streaming(video):
            if self._mesh is not None:
                from dnmf_tpu.parallel import (
                    sharded_compute_grams_streaming,
                )

                grams, c1 = sharded_compute_grams_streaming(
                    self.state, video, self.model, mesh=self._mesh,
                    use_pallas=self._use_pallas,
                    gram_mode=self._gram_mode,
                    gram_window=self._gram_window(),
                )
            else:
                grams, c1 = model_lib.compute_grams_streaming(
                    self.state, video, self.model,
                    use_pallas=self._use_pallas,
                    gram_mode=self._gram_mode,
                    gram_window=self._gram_window(),
                )
        elif self._mesh is not None:
            from dnmf_tpu.parallel import sharded_compute_grams

            grams, c1 = sharded_compute_grams(
                self.state, self._video_flat(video), self.model,
                mesh=self._mesh, frame_block=self.runtime.frame_block,
                use_pallas=self._use_pallas,
                gram_mode=self._gram_mode,
                gram_window=self._gram_window(),
            )
        else:
            video_flat = self._video_flat(video)
            grams, c1 = model_lib.compute_grams(
                self.state, video_flat, self.model,
                frame_block=self.runtime.frame_block,
                use_pallas=self._use_pallas,
                gram_mode=self._gram_mode,
                gram_window=self._gram_window(),
            )
        if self._mesh is not None:
            from dnmf_tpu.parallel import sharded_footprint_update

            self.state = sharded_footprint_update(
                self.state, grams, c1, mesh=self._mesh, iters=iters,
                gamma=self.opt_config.gamma_traces,
                solver=self.opt_config.trace_solver,
            )
        else:
            self.state = model_lib.footprint_update(
                self.state, grams, c1, iters=iters,
                gamma=self.opt_config.gamma_traces,
                solver=self.opt_config.trace_solver,
            )
        m = {"phase": "traces", "c_mean": float(jnp.mean(self.state.c))}
        self.metrics.append(m)
        return m

    def update_sigma(self, video, steps: Optional[int] = None) -> dict:
        """Fit per-neuron footprint widths on a frame subsample
        (:func:`dnmf_tpu.models.dnmf.sigma_fit`) — sigma (``[K]`` or
        per-axis ``[K, 3]``) joins the alternation, which the
        frozen-sigma reference cannot do
        (``/root/reference/Demix/dNMF.py:29``).  Updates both the live
        sigma and the anneal base.

        Streamed sources work too: the subsample is a FIXED-SIZE host
        gather (``sigma_frames`` frames via ``source.read``), so the
        cost is independent of the recording length.
        """
        cfg = self.opt_config
        t = self.model.num_frames
        s = min(cfg.sigma_frames, t)
        idx = np.linspace(0, t - 1, s).round().astype(int)
        if self._is_streaming(video):
            # Fixed-size host gather — sigma is shared across frames, so
            # ``sigma_frames`` frames estimate the full-recording
            # gradient regardless of T (sources' read() already applies
            # the NMF clamp).
            video_sub = jnp.asarray(np.concatenate(
                [video.read(int(i), int(i) + 1) for i in idx], axis=0))
        else:
            video_flat = self._video_flat(video)
            video_sub = jnp.take(video_flat, jnp.asarray(idx), axis=0)
        idx = jnp.asarray(idx)
        lo = cfg.sigma_bounds[0] * self.model.shape_std
        hi = cfg.sigma_bounds[1] * self.model.shape_std
        sigma, mses = model_lib.sigma_fit(
            self.state,
            video_sub,
            jnp.take(self.state.beta, idx, axis=0),
            jnp.take(self.state.c, idx, axis=1).T,
            self.model, steps=steps or cfg.sigma_steps,
            lr=cfg.sigma_lr, lo=lo, hi=hi,
            frame_block=min(self.runtime.frame_block, s),
            use_pallas=self._use_pallas,
        )
        self.state = self.state._replace(sigma=sigma)
        self._base_sigma = sigma
        m = {"phase": "sigma", "mse": float(mses[-1]),
             "sigma_mean": float(jnp.mean(sigma)),
             "sigma_min": float(jnp.min(sigma)),
             "sigma_max": float(jnp.max(sigma))}
        self.metrics.append(m)
        return m

    def _check_finite(self, phase: str) -> None:
        if not self.runtime.check_finite:
            return
        for name, leaf in (("beta", self.state.beta), ("C", self.state.c)):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                raise FloatingPointError(
                    f"non-finite {name} after {phase} — check learning "
                    "rate / regularizer weights"
                )

    def fit(self, video, rounds: Optional[int] = None) -> FitResult:
        """Full alternation schedule; returns final state + metric log."""
        import contextlib

        # Prepare (flatten/clamp/shard) once for the whole schedule.
        video_flat = (video if self._is_streaming(video)
                      else DeformableNMF._Prepared(self._video_flat(video)))
        rounds = rounds or self.opt_config.outer_rounds
        # Trust-audit the analytic Grams once per fit (at the first
        # update_footprints, after motion has produced a real warp).
        self._gram_audited = False
        anneal = self.opt_config.sigma_anneal
        plain_rounds = 0  # non-annealed rounds seen (sigma_every cadence)
        for r in range(rounds):
            factor = anneal[r] if r < len(anneal) else 1.0
            self.state = self.state._replace(
                sigma=self._base_sigma * factor
            )
            t0 = time.time()
            profiler_ctx = (
                jax.profiler.trace(self.runtime.profile_dir)
                if self.runtime.profile_dir and r == rounds - 1
                else contextlib.nullcontext()
            )
            with profiler_ctx:
                motion_m = self.update_motion(video_flat)
                self._check_finite("motion")
                if self.opt_config.fit_sigma and factor == 1.0:
                    # Width fitting waits out the annealed (deliberately
                    # widened) rounds — fitting sigma there would just
                    # undo the anneal — and runs every ``sigma_every``-th
                    # plain round (the subsample gradient is cheap but
                    # not free; measured cost notes in config.py).
                    if plain_rounds % max(self.opt_config.sigma_every,
                                          1) == 0:
                        self.update_sigma(video_flat)
                        self._check_finite("sigma")
                    plain_rounds += 1
                traces_m = self.update_footprints(video_flat)
                self._check_finite("traces")
            entry = {
                "phase": "round",
                "round": r,
                "seconds": time.time() - t0,
                **{f"motion_{k}": v for k, v in motion_m.items()},
                **{f"traces_{k}": v for k, v in traces_m.items()},
            }
            self.metrics.append(entry)
            if self.runtime.metrics_path:
                with open(self.runtime.metrics_path, "a") as f:
                    f.write(json.dumps(entry) + "\n")
            if self.runtime.checkpoint_dir:
                self.save(f"{self.runtime.checkpoint_dir}/round_{r}")
        # End on the base widths even when sigma_anneal covers the final
        # round — fit_fused restores the same way, and any subsequent
        # refine()/trace use must not silently run at an annealed width.
        self.state = self.state._replace(sigma=self._base_sigma)
        return FitResult(state=self.state, metrics=self.metrics)

    def refine(self, video, rounds: int = 3, epochs: int = 40,
               mu_iters: int = 40, learning_rate: float = 0.08,
               prior: float = 3e-4) -> FitResult:
        """Per-frame per-neuron position refinement (final polish).

        Lifts the global-quadratic-warp model-class limit: on motion
        that is only approximately a global warp (e.g. the reference
        demo's GP fixture), refined per-frame anchors recover the traces
        the warp cannot (hard-fixture corr 0.86 -> 0.98 measured; see
        :mod:`dnmf_tpu.models.refine`).  Stores the refined positions on
        ``self.pos_t`` (``[T, K, 3]``, model coordinate frame).

        Host-streamed sources (``StreamingVideo``/``RawFileVideo``) run
        the per-frame-independent alternation block-locally in ONE pass
        over the recording (:func:`dnmf_tpu.models.refine.
        refined_rounds_streaming`); factors match the device-resident
        path (gated in tests).
        """
        from dnmf_tpu.models import refine as refine_lib

        if self._mesh is not None and (self.runtime.mesh_pixel or 1) > 1:
            raise NotImplementedError(
                "position refinement reduces over whole frames — "
                "unsupported on a pixel-sharded mesh (use mesh_time)"
            )
        if self._is_streaming(video):
            if self._mesh is not None:
                raise NotImplementedError(
                    "streamed refinement is single-device (per-frame "
                    "independent — shard the recording across engines "
                    "instead)"
                )
            self._maybe_audit_analytic()
            t0 = time.time()
            self.state, pos_t, m = refine_lib.refined_rounds_streaming(
                self.state, video, self.model, rounds=rounds,
                epochs=epochs, mu_iters=mu_iters,
                learning_rate=learning_rate, prior=prior,
                pos_t=getattr(self, "pos_t", None),
                use_pallas=self._use_pallas,
                gram_mode=self._gram_mode,
                gram_window=self._gram_window(),
                trace_solver=self.opt_config.trace_solver,
            )
            self.pos_t = pos_t
            self._check_finite("refine")
            entry = {
                "phase": "refine", "rounds": rounds, "epochs": epochs,
                "seconds": time.time() - t0,
                "recon_mse": float(np.mean(np.asarray(m["recon_mse"]))),
            }
            self.metrics.append(entry)
            if self.runtime.metrics_path:
                with open(self.runtime.metrics_path, "a") as f:
                    f.write(json.dumps(entry) + "\n")
            return FitResult(state=self.state, metrics=self.metrics)
        video_flat = self._video_flat(video)
        self._maybe_audit_analytic()
        t0 = time.time()
        if self._mesh is not None:
            from dnmf_tpu.parallel.sharded import sharded_refined_rounds

            self.state, pos_t, m = sharded_refined_rounds(
                self.state, video_flat, self.model, self._mesh,
                rounds=rounds, epochs=epochs, mu_iters=mu_iters,
                learning_rate=learning_rate, prior=prior,
                frame_block=self.runtime.frame_block,
                pos_t=getattr(self, "pos_t", None),
                use_pallas=self._use_pallas,
                gram_mode=self._gram_mode,
                gram_window=self._gram_window(),
                trace_solver=self.opt_config.trace_solver,
            )
        else:
            self.state, pos_t, m = refine_lib.refined_rounds(
                self.state, video_flat, self.model, rounds=rounds,
                epochs=epochs, mu_iters=mu_iters,
                learning_rate=learning_rate, prior=prior,
                frame_block=self.runtime.frame_block,
                pos_t=getattr(self, "pos_t", None),
                use_pallas=self._use_pallas,
                gram_mode=self._gram_mode,
                gram_window=self._gram_window(),
                trace_solver=self.opt_config.trace_solver,
            )
        self.pos_t = pos_t
        self._check_finite("refine")
        entry = {
            "phase": "refine", "rounds": rounds, "epochs": epochs,
            "seconds": time.time() - t0,
            "recon_mse": float(np.mean(np.asarray(m["recon_mse"]))),
        }
        self.metrics.append(entry)
        if self.runtime.metrics_path:
            with open(self.runtime.metrics_path, "a") as f:
                f.write(json.dumps(entry) + "\n")
        return FitResult(state=self.state, metrics=self.metrics)

    def fit_fused(self, video, rounds: Optional[int] = None) -> FitResult:
        """The whole alternation as one compiled device program.

        Functionally equivalent to :meth:`fit` in parallel motion mode
        (single-device, non-streaming); eliminates all host round-trips
        between phases.  Metrics are per-round.  ``sigma_anneal`` is
        honored by running one fused segment per contiguous anneal
        factor (still one dispatch when annealing is off);
        ``fit_sigma`` needs :meth:`fit`'s host-side cadence and is
        rejected rather than silently skipped.
        """
        if self._mesh is not None or self._is_streaming(video):
            raise ValueError(
                "fit_fused supports the single-device, device-resident "
                "path; use fit() for meshes and streamed videos"
            )
        if self.opt_config.motion_mode == "parity":
            raise ValueError("fit_fused requires motion_mode='parallel'")
        if self.opt_config.fit_sigma:
            raise ValueError(
                "fit_fused compiles the whole schedule as one program "
                "and cannot interleave the sigma-fitting cadence; use "
                "fit() with fit_sigma=True"
            )
        video_flat = self._video_flat(video)
        rounds = rounds or self.opt_config.outer_rounds
        # The fused schedule is ONE compiled program — a mid-run
        # fallback is impossible, so audit the analytic Grams BEFORE
        # (with the seeded beta; decides the mode for this run) and
        # again AFTER (witnesses the final warp's error in metrics).
        self._gram_audited = False
        self._maybe_audit_analytic()
        # Segment the schedule at anneal-factor changes: each segment
        # runs with sigma = base * factor, matching fit()'s per-round
        # anneal semantics (one segment — one dispatch — when off).
        anneal = self.opt_config.sigma_anneal
        factors = [anneal[r] if r < len(anneal) else 1.0
                   for r in range(rounds)]
        segments = []  # (factor, num_rounds) runs
        for f in factors:
            if segments and segments[-1][0] == f:
                segments[-1][1] += 1
            else:
                segments.append([f, 1])
        recon_mse, reg = [], []
        for factor, seg_rounds in segments:
            self.state = self.state._replace(
                sigma=self._base_sigma * factor
            )
            self.state, metrics = model_lib.fused_rounds(
                self.state, video_flat, self.model, self.optimizer,
                rounds=seg_rounds, epochs=self.opt_config.motion_epochs,
                mu_iters=self.opt_config.mu_iters,
                gamma=self.opt_config.gamma_motion,
                mu_gamma=self.opt_config.gamma_traces,
                frame_block=self.runtime.frame_block,
                use_pallas=self._use_pallas,
                gram_mode=self._gram_mode,
                gram_window=self._gram_window(),
                trace_solver=self.opt_config.trace_solver,
            )
            recon_mse.extend(float(v) for v in metrics["recon_mse"])
            reg.extend(float(v) for v in metrics["reg"])
        self.state = self.state._replace(sigma=self._base_sigma)
        for r in range(rounds):
            self.metrics.append({
                "phase": "round", "round": r,
                "motion_recon_mse": recon_mse[r],
                "motion_reg": reg[r],
            })
        self._gram_audited = False
        self._maybe_audit_analytic()
        self._check_finite("fused fit")
        return FitResult(state=self.state, metrics=self.metrics)

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        """Checkpoint the factor state, plus the refinement positions
        if :meth:`refine` has produced them (``pos_t`` is a first-class
        pipeline product — without it a resumed run would silently lose
        the polish phase)."""
        from dnmf_tpu.utils.checkpoint import save_state

        payload = {"state": self.state}
        if getattr(self, "pos_t", None) is not None:
            payload["pos_t"] = self.pos_t
        save_state(path, payload)

    def restore(self, path: str) -> None:
        from dnmf_tpu.utils.checkpoint import load_state

        pos_t_tmpl = getattr(self, "pos_t", None)
        if pos_t_tmpl is None:
            t = self.model.num_frames
            pos_t_tmpl = jnp.broadcast_to(
                self.state.pos[None], (t,) + self.state.pos.shape)
        try:
            payload = load_state(
                path, {"state": self.state, "pos_t": pos_t_tmpl})
            self.pos_t = payload["pos_t"]
        except Exception:
            # Checkpoint without refinement positions (saved before
            # refine ran).  Any pos_t from a refine() in THIS session
            # predates the restored factors — clear it, or
            # positions_all()/save() would pair stale refined
            # trajectories with the restored beta.
            self.pos_t = None
            try:
                payload = load_state(path, {"state": self.state})
            except Exception:
                # Oldest format: the raw DNMFState pytree (pre-payload
                # save()) — keep those checkpoints restorable.
                payload = {"state": load_state(path, self.state)}
        self.state = payload["state"]

    @property
    def traces(self) -> np.ndarray:
        return np.asarray(self.state.c)

    def positions_at(self, frame: int, iters: int = 3) -> np.ndarray:
        """Deformed neuron positions at a frame: ``warp_t^{-1}(p_k)``.

        The model warps *coordinates* (footprints stay anchored at frame-0
        positions and the sampling grid deforms), so the apparent position
        of neuron k at frame t is the point ``x`` with ``warp_t(x) = p_k``.
        Solved by fixed-point iteration (exact to <1e-3 px for demo-scale
        warps; the old first-order ``2p - warp(p)`` estimate was biased
        for strong quadratic warps).
        """
        return np.asarray(self.positions_all(iters=iters)[frame])

    def positions_all(self, iters: int = 3) -> np.ndarray:
        """Deformed positions for EVERY frame in one jitted dispatch:
        ``[T, K, 3]`` (``invert_warp_points`` vmapped over beta frames —
        trajectory rendering used to loop :meth:`positions_at` per frame,
        O(T) device dispatches).  The host result is cached against the
        current factors, so a per-frame :meth:`positions_at` loop costs
        one dispatch total (and the jitted solver lives at module scope:
        a per-call closure would defeat jax.jit's cache and recompile
        every call — minutes per call on the tunneled backend).

        After :meth:`refine` has produced per-frame positions, the
        trajectory is ``warp_t^{-1}(pos_t[t])`` — the refined anchors,
        not the shared ones."""
        pos = getattr(self, "pos_t", None)
        if pos is None:
            pos = self.state.pos
        cache = getattr(self, "_positions_cache", None)
        if (cache is not None and cache[0] is self.state.beta
                and cache[1] is pos and cache[2] == iters):
            return cache[3]
        normalized = self.model.deformation.basis_scaling == "normalized"
        out = np.asarray(_positions_all_jit(
            pos, self.state.beta, iters, normalized,
            tuple(self.model.size)))
        # The cached buffer is returned directly on hits — freeze it so
        # a caller mutating the result fails loudly instead of silently
        # corrupting every later positions_all/positions_at call.
        out.setflags(write=False)
        self._positions_cache = (self.state.beta, pos, iters, out)
        return out


class StaticFootprintNMF:
    """Classic static-footprint NMF on motion-corrected video.

    The reference carries (but never exercises — the call is commented
    out, ``/root/reference/Demix/dNMF.py:174``) a multiplicative update
    for a *learned* static footprint matrix with a distance-penalty field
    around the tracked positions (``update_spatial``, ``:151-160``;
    ``D``, ``:133-135``).  This engine makes that mode first-class:
    alternate MU updates of ``A [P, K]`` and ``C [K, T]`` on an
    (inverse-warped / registered) video.
    """

    def __init__(self, model: ModelConfig, positions: jnp.ndarray,
                 gamma_a: float = 1.0, penalty_rate: float = 0.01,
                 key: Optional[jax.Array] = None):
        from dnmf_tpu.ops.basis import voxel_grid
        from dnmf_tpu.ops.footprints import gaussian_footprints
        from dnmf_tpu.ops.mu import distance_penalty

        self.model = model
        grid = voxel_grid(model.size)
        sigma = jnp.full((model.num_neurons,), model.shape_std)
        self.a = gaussian_footprints(grid, positions, sigma)  # [P, K]
        self.d = distance_penalty(grid, positions, rate=penalty_rate)
        self.gamma_a = gamma_a
        key = key if key is not None else jax.random.PRNGKey(0)
        self.c = jax.random.uniform(
            key, (model.num_neurons, model.num_frames)
        )

    def fit(self, video, iters: int = 50):
        """Alternate spatial/temporal MU updates; returns (A, C)."""
        from dnmf_tpu.ops.mu import mu_spatial_step

        video_flat = jnp.asarray(video)
        if video_flat.ndim == 4:
            video_flat = video_flat.reshape(video_flat.shape[0], -1)
        # MU non-negativity precondition (same clamp as DeformableNMF).
        y = jnp.maximum(video_flat, 0.0).T  # [P, T]

        @jax.jit
        def step(a, c):
            g = jnp.dot(a.T, a, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
            c1 = a.T @ y  # [K, T]
            c2 = g @ c
            c_new = c * c1 / (c2 + 1e-32)
            a_new = mu_spatial_step(a, c_new, y, d=self.d,
                                    gamma=self.gamma_a)
            return a_new, c_new

        a, c = self.a, self.c
        for _ in range(iters):
            a, c = step(a, c)
        self.a, self.c = a, c
        return a, c
