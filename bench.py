"""Benchmark: deformable-NMF demixing throughput on one chip.

Workload (BASELINE.md config 2 scale): 256x256x10 volume, K=50 neurons,
T=256 frames.  One "iteration" = one full alternation round:

  * 1 deformation epoch (per-frame Adam on beta, streamed frame blocks)
  * per-frame MU Grams (the O(P K^2 T) reduction)
  * 50 MU trace iterations on the Grams

The mathematical iterates match the reference's
``update_motion`` + ``update_footprints(iter_c=50)``
(``/root/reference/Demix/dNMF.py:163-194``); the reference recomputes the
full Gram einsum for each of the 50 MU iterations on host NumPy, which is
counted in the baseline measurement (identical math, its cost structure).

Prints ONE JSON line:
  {"metric": "frames/sec/chip", "value": N, "unit": "frames/s",
   "vs_baseline": speedup_vs_torch_cpu_reference_equivalent, ...extras}
"""

from __future__ import annotations

import json
import os
import time

SIZE = (256, 256, 10)
K = 50
T = 256
FRAME_BLOCK = 8
MU_ITERS = 50
WARMUP_ROUNDS = 2   # beyond compile: stabilize tunnel/queue state
ROUNDS = 5          # timed alternation rounds (median reported)

BASELINE_FRAMES = 2  # frames for the torch-CPU reference measurement

# Whole-brain workload (BASELINE config 3 scale; driver-witnessed since
# round 2 — round-1 whole-brain numbers came from hand runs only).
WB_SIZE = (512, 512, 20)
WB_K = 200
# Frames measured.  The kernel passes (Grams/c1/motion/refine) stream
# frame blocks and are T-linear, but the 50-iteration MU trace scan is
# a FIXED ~26 ms device program regardless of T (measured flat at
# T=16/64/128) — at T=16 its per-frame share was inflated 4-8x vs the
# 1k-frame recording the round figure models, so measure at T=64 and
# report the fixed total alongside.
WB_T = 64
WB_FRAME_BLOCK = 8
# Practical peak for MFU: measured 8192^3 f32 matmul throughput on this
# v5e chip (~125 TF/s; see .claude/skills/verify).
PRACTICAL_PEAK_FLOPS = 125e12


def _tpu_run(gram_mode="analytic"):
    """One-chip alternation-round timing at ROI scale.

    ``gram_mode="analytic"`` is the PRODUCTION configuration (the
    RuntimeConfig default resolves "auto" -> analytic here, trust-gated;
    see dnmf_tpu/config.py) — the headline tracks it; the "exact" run is
    reported alongside as the legacy/parity-path row.
    """
    import jax
    import jax.numpy as jnp

    from dnmf_tpu.config import ModelConfig, OptimizerConfig
    from dnmf_tpu.models import dnmf as M

    model = ModelConfig(size=SIZE, num_neurons=K, num_frames=T,
                        shape_std=3.0)
    optimizer = M.make_motion_optimizer(OptimizerConfig(learning_rate=1e-3))
    key = jax.random.PRNGKey(0)
    pos = 10.0 + jax.random.uniform(key, (K, 3)) * (
        jnp.asarray(SIZE, jnp.float32) - 20.0
    )
    state = M.init_state(model, optimizer, positions=pos, key=key)
    p = SIZE[0] * SIZE[1] * SIZE[2]
    video = jax.random.uniform(jax.random.PRNGKey(1), (T, p))

    use_pallas = jax.default_backend() == "tpu"

    def one_round(state):
        # The whole round is ONE compiled device program (fused kernels +
        # nested lax.scan) — no host round-trips inside.
        return M.fused_rounds(
            state, video, model, optimizer, rounds=1, epochs=1,
            mu_iters=MU_ITERS, gamma=0.1, frame_block=FRAME_BLOCK,
            use_pallas=use_pallas, gram_mode=gram_mode,
        )

    # Warm-up / compile.  NOTE: on the tunneled TPU backend
    # block_until_ready returns before execution completes — a scalar host
    # read is the only reliable completion fence.  Round 1 reported a 20%
    # session-to-session spread (579 vs 724 f/s) from single-shot timing;
    # now: 1 compile + WARMUP_ROUNDS warm rounds, median of ROUNDS timed
    # rounds, spread reported.
    for _ in range(1 + WARMUP_ROUNDS):
        state, _ = one_round(state)
        _ = float(jnp.sum(state.c))

    times = []
    for _ in range(ROUNDS):
        t0 = time.time()
        state, metrics = one_round(state)
        _ = float(jnp.sum(state.c)) + float(metrics["recon_mse"][-1])
        times.append(time.time() - t0)
    times.sort()
    per_round = times[len(times) // 2]
    return {
        "tpu_round_seconds": per_round,
        "tpu_round_seconds_min": times[0],
        "tpu_round_seconds_max": times[-1],
        "tpu_frames_per_sec": T / per_round,
        "recon_mse": float(metrics["recon_mse"][-1]),
        "backend": jax.default_backend(),
    }


def _whole_brain_run():
    """Config-3 scale measurements on one chip: per-frame Gram and
    motion-gradient costs (fused culled Pallas kernels), MU cost for the
    full trace update, and an MFU estimate.

    FLOP accounting is *algorithmic* (2*P*K^2 MACs per frame Gram —
    reference einsum ``/root/reference/Demix/dNMF.py:141``); the culled
    kernels skip inactive neuron-block pairs and the split-float dot
    runs 3 bf16 passes, so executed MXU work differs from algorithmic in
    both directions — this is a utilization *estimate*.
    """
    import jax
    import jax.numpy as jnp

    from dnmf_tpu.config import ModelConfig, OptimizerConfig
    from dnmf_tpu.models import dnmf as M

    if jax.default_backend() != "tpu":
        return None

    model = ModelConfig(size=WB_SIZE, num_neurons=WB_K, num_frames=WB_T,
                        shape_std=3.0)
    optimizer = M.make_motion_optimizer(OptimizerConfig(learning_rate=1e-3))
    key = jax.random.PRNGKey(0)
    # Timing fixture (random video, no GT recovery): the face-hugging z
    # draw is kept deliberately — border neurons are realistic for the
    # culled kernels' tile-activity distribution, and changing the draw
    # would break ms/frame comparability across rounds.  Recovery
    # fixtures use wb_recovery.interior_positions instead.
    pos = 20.0 + jax.random.uniform(key, (WB_K, 3)) * (
        jnp.asarray(WB_SIZE, jnp.float32) - 40.0
    )
    state = M.init_state(model, optimizer, positions=pos, key=key)
    p = WB_SIZE[0] * WB_SIZE[1] * WB_SIZE[2]
    video = jax.random.uniform(jax.random.PRNGKey(1), (WB_T, p))

    def time_op(fn, fence):
        fn()  # compile + warm
        _ = fence()
        ts = []
        for _ in range(3):
            t0 = time.time()
            fn()
            _ = fence()
            ts.append(time.time() - t0)
        return sorted(ts)[1]  # median of 3

    grams_box = {}

    def run_grams():
        grams_box["g"], grams_box["c1"] = M.compute_grams(
            state, video, model, frame_block=WB_FRAME_BLOCK,
            use_pallas=True,
        )

    g_sec = time_op(run_grams,
                    lambda: float(jnp.sum(grams_box["g"][0, 0])))

    # Closed-form Grams + c1-only video pass (ops/gram_analytic.py) —
    # the O(K^2) replacement for the 2PK^2 pixel reduction; also record
    # its max deviation from the exact Grams as a correctness witness.
    an_box = {}

    def run_grams_analytic():
        an_box["g"], an_box["c1"] = M.compute_grams(
            state, video, model, frame_block=WB_FRAME_BLOCK,
            use_pallas=True, gram_mode="analytic",
        )

    ga_sec = time_op(run_grams_analytic,
                     lambda: float(jnp.sum(an_box["g"][0, 0])))
    ga_err = float(jnp.max(jnp.abs(an_box["g"] - grams_box["g"]))
                   / jnp.max(jnp.abs(grams_box["g"])))

    mot_box = {}

    def run_motion():
        mot_box["s"], mot_box["m"] = M.motion_epoch_parallel(
            state, video, model, optimizer, gamma=0.1,
            frame_block=WB_FRAME_BLOCK, use_pallas=True,
        )

    m_sec = time_op(run_motion,
                    lambda: float(mot_box["m"]["recon_mse"]))

    mu_box = {}

    def run_mu():
        mu_box["s"] = M.footprint_update(
            state, grams_box["g"], grams_box["c1"], iters=MU_ITERS,
        )

    mu_sec = time_op(run_mu, lambda: float(jnp.sum(mu_box["s"].c[0])))

    # One fused position-refinement Adam epoch (per-frame dpos kernel;
    # the accuracy-polish phase — see dnmf_tpu/models/refine.py).
    from dnmf_tpu.models import refine as refine_lib

    ref_box = {}

    def run_refine():
        ref_box["p"], ref_box["m"] = refine_lib.refine_positions(
            state, None, video, model, epochs=1, use_pallas=True,
        )

    r_sec = time_op(run_refine,
                    lambda: float(jnp.sum(ref_box["p"][0])))

    gram_ms = g_sec / WB_T * 1e3
    motion_ms = m_sec / WB_T * 1e3
    mu_ms = mu_sec / WB_T * 1e3  # per frame share of the 50-iter update
    frame_ms = gram_ms + motion_ms + mu_ms
    # Algorithmic MACs per frame: Gram P*K^2, projection P*K, and the
    # motion pass evaluates footprints + data term + analytic gradient
    # (~3 P*K-scale passes; the K^2-free terms are bandwidth-, not
    # MXU-bound, so the Gram dominates the FLOP model).
    gram_flops = 2.0 * p * WB_K * WB_K
    mfu = gram_flops / (g_sec / WB_T) / PRACTICAL_PEAK_FLOPS
    ga_ms = ga_sec / WB_T * 1e3
    frame_an_ms = ga_ms + motion_ms + mu_ms
    return {
        "workload": f"{WB_SIZE[0]}x{WB_SIZE[1]}x{WB_SIZE[2]} K={WB_K} "
                    f"T={WB_T}",
        "gram_ms_per_frame": round(gram_ms, 2),
        "gram_analytic_ms_per_frame": round(ga_ms, 2),
        "gram_analytic_max_rel_err": round(ga_err, 6),
        "motion_ms_per_frame": round(motion_ms, 2),
        "mu50_ms_per_frame": round(mu_ms, 3),
        "mu50_ms_total_fixed": round(mu_sec * 1e3, 1),
        "refine_epoch_ms_per_frame": round(r_sec / WB_T * 1e3, 2),
        "round_frames_per_sec": round(1e3 / frame_ms, 1),
        "round_analytic_frames_per_sec": round(1e3 / frame_an_ms, 1),
        "gram_mfu_algorithmic": round(mfu, 3),
    }


def _correctness_run():
    """Compiled-kernel correctness summary (VERDICT r2 #3a): the
    tpu_smoke float64-oracle + finite-difference-gradient checks, run
    compiled on the real chip, condensed to a pass/fail + check count.

    CI runs the Pallas kernels interpret-only; this is the
    driver-witnessed evidence that the COMPILED kernels (Mosaic) match
    the f64 oracle.
    """
    import contextlib
    import io
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    import tpu_smoke

    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            ok = tpu_smoke.run((64, 32, 4), 12, "normalized", 2048)
            ok &= tpu_smoke.run((96, 64, 2), 80, "normalized", 4096,
                                grad_probes=False)
            ok &= tpu_smoke.run_registration()
    except Exception as e:  # noqa: BLE001 — never break the JSON line
        return {"pass": False, "error": str(e)[:200]}
    lines = [ln for ln in buf.getvalue().splitlines() if ln.startswith("[")]
    return {
        "pass": bool(ok),
        "checks": len(lines),
        "failed": [ln for ln in lines if ln.startswith("[FAIL")][:5],
    }


def _registration_run():
    """Whole-brain registration throughput (VERDICT r2 #1 witness):
    rigid and pw-rigid estimate+apply ms/frame at 512x512x20."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dnmf_tpu.registration.motion_correct import (
        rigid_correct_frames,
        tile_and_correct,
    )

    if jax.default_backend() != "tpu":
        return None
    # Measure at the production registration frame block (16 frames per
    # dispatch, RegistrationConfig.frame_block default): 2-frame
    # dispatches carried ~14 ms of per-dispatch overhead through the
    # tunneled backend, half of it billed to each frame — batch-16
    # amortizes it exactly like the production template iteration does.
    b = 16
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((b,) + WB_SIZE, dtype=np.float32))
    template = jnp.asarray(rng.random(WB_SIZE, dtype=np.float32))

    def timed(fn):
        _ = float(jnp.sum(fn()[0]))  # compile+warm; scalar fence
        _ = float(jnp.sum(fn()[0]))
        ts = []
        for _i in range(3):
            t0 = time.time()
            _ = float(jnp.sum(fn()[0]))
            ts.append(time.time() - t0)
        return sorted(ts)[1] / b * 1e3

    rigid_ms = timed(lambda: rigid_correct_frames(
        frames, template, (6, 6, 2), upsample_factor=10,
        border_nan=False))
    # frames/template must be jit ARGUMENTS: closing over them embeds
    # the 16-frame block (~336 MB) as HLO constants and the tunneled
    # remote_compile rejects the upload with HTTP 413.
    from dnmf_tpu.registration.motion_correct import (
        tile_and_correct_block,
    )

    pw = jax.jit(lambda fr, tmpl: tile_and_correct_block(
        fr, tmpl, (128, 128, 10), (32, 32, 0), (6, 6, 2),
        max_deviation_rigid=3, upsample_factor_grid=4,
        upsample_factor_fft=10, use_remap=True,
        remap_mode="fused", border_nan=False, rigid_decimate=4,
    ))
    pw_ms = timed(lambda: pw(frames, template))
    return {
        "rigid_est_apply_ms_per_frame": round(rigid_ms, 2),
        "pwrigid_est_apply_ms_per_frame": round(pw_ms, 2),
        "pwrigid_config": "4x4x2 patches, FUSED Pallas warp, "
                          "rigid_decimate=4, 16-frame dispatches, "
                          "fused Pallas phase-correlation (bf16x3)",
    }


def _pipeline_recovery_run():
    """Register -> seed -> demix end-to-end recovery at whole-brain
    scale (VERDICT r2 #3b): synthetic GT video rendered ON DEVICE,
    rigid-FFT registration seed, reference init protocol, trace corr +
    warp error + s/round."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() != "tpu":
        return None
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    from wb_recovery import seeded_recovery

    size, k, t = WB_SIZE, WB_K, 32
    # 6x12 converges the warp (round-4 tail study, BASELINE.md): the
    # r3 protocol's 3x6 left ~0.3 px of warp error whose footprint
    # SHAPE distortion cost overlapping neurons up to 0.07 corr (min
    # 0.934); at 6x12 warp err is 0.03 px and min corr 0.998.  Round
    # timing is reported per round, so the longer schedule changes
    # recovery only.
    rounds, epochs, mu_iters = 6, 12, 50
    r = seeded_recovery(size, k, t, rounds, epochs, mu_iters,
                        frame_block=8)
    return {
        "workload": f"{size[0]}x{size[1]}x{size[2]} K={k} T={t} "
                    f"{rounds}x({epochs}ep+{mu_iters}MU), rigid-seeded, "
                    "analytic grams",
        "trace_corr_mean": round(float(np.mean(r["corr"])), 4),
        "trace_corr_min": round(float(np.min(r["corr"])), 4),
        "warp_err_px": round(r["warp_err_px"], 3),
        "registration_seed_s": round(r["reg_s"], 2),
        "round_s_steady": round(r["round_s_steady"], 2),
        "frames_per_sec_full_round": round(t / r["round_s_steady"], 1),
    }


def _streamed_io_run():
    """On-chip streamed-IO witness (VERDICT r3 #5): a device-synthesized
    recording written to local disk, fitted through ``RawFileVideo`` +
    the native threaded ``BlockReader``, checked factor-for-factor
    against the device-resident fit, with prefetch-overlap timing.

    Sized for the tunneled link (~16 MB/s host<->device; a real host
    feeds GB/s over PCIe): the witness proves the native prefetch path
    feeds the real chip correctly and that prefetch overlaps compute at
    the achievable link rate — not config-4 absolute IO throughput.
    """
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dnmf_tpu.config import ModelConfig, OptimizerConfig
    from dnmf_tpu.data.streaming import RawFileVideo
    from dnmf_tpu.models import dnmf as M

    if jax.default_backend() != "tpu":
        return None

    size, k, t, blk = (128, 128, 10), 30, 48, 8
    model = ModelConfig(size=size, num_neurons=k, num_frames=t,
                        shape_std=3.0)
    optimizer = M.make_motion_optimizer(
        OptimizerConfig(learning_rate=1e-3))
    key = jax.random.PRNGKey(0)
    pos = 10.0 + jax.random.uniform(key, (k, 3)) * (
        jnp.asarray(size, jnp.float32) - 20.0)
    p = size[0] * size[1] * size[2]
    video = jax.random.uniform(jax.random.PRNGKey(1), (t, p))

    # Write the recording to local disk (raw f32, the BlockReader
    # format) — the device->host pull is part of the witness setup,
    # not the timed path.
    host = np.asarray(video, dtype=np.float32)
    tmp = tempfile.NamedTemporaryFile(suffix=".raw", delete=False)
    host.reshape(t, -1).tofile(tmp.name)
    tmp.close()

    def one_epoch_resident(state):
        return M.motion_epoch_parallel(
            state, video, model, optimizer, gamma=0.1,
            frame_block=blk, use_pallas=True)

    def one_epoch_streamed(state, source):
        return M.motion_epoch_streaming(
            state, source, model, optimizer, gamma=0.1,
            use_pallas=True)

    def timed_epochs(step, n=3):
        st = M.init_state(model, optimizer, positions=pos, key=key)
        st, m = step(st)  # compile + warm
        _ = float(m["recon_mse"])
        ts = []
        for _i in range(n):
            t0 = time.time()
            st, m = step(st)
            _ = float(m["recon_mse"])
            ts.append(time.time() - t0)
        return st, sorted(ts)[len(ts) // 2]

    st_res, sec_res = timed_epochs(one_epoch_resident)
    src_pf = RawFileVideo(tmp.name, (t,) + size, block=blk,
                          prefetch=True)
    st_pf, sec_pf = timed_epochs(lambda s: one_epoch_streamed(s, src_pf))
    src_np = RawFileVideo(tmp.name, (t,) + size, block=blk,
                          prefetch=False)
    _, sec_np = timed_epochs(lambda s: one_epoch_streamed(s, src_np))

    # Native reader throughput, page cache evicted per pass (the honest
    # disk-side number; the streamed-epoch deltas above are dominated by
    # the tunneled host->device link, where prefetch parity is expected
    # — on a real PCIe host the disk read is the overlappable cost).
    fd = os.open(tmp.name, os.O_RDONLY)
    read_ts = []
    for _i in range(3):
        os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
        t0 = time.time()
        src_np.read(0, t)
        read_ts.append(time.time() - t0)
    os.close(fd)
    read_s = sorted(read_ts)[1]

    # Factor equality: identical math, device-resident vs streamed.
    beta_err = float(jnp.max(jnp.abs(st_res.beta - st_pf.beta)))
    grams_r, c1_r = M.compute_grams(st_res, video, model,
                                    frame_block=blk, use_pallas=True)
    grams_s, c1_s = M.compute_grams_streaming(st_pf, src_pf, model,
                                              use_pallas=True)
    c_res = M.footprint_update(st_res, grams_r, c1_r, iters=30).c
    c_str = M.footprint_update(st_pf, grams_s, c1_s, iters=30).c
    c_err = float(jnp.max(jnp.abs(c_res - c_str))
                  / jnp.maximum(jnp.max(jnp.abs(c_res)), 1e-30))
    os.unlink(tmp.name)
    mb = t * p * 4 / 1e6
    return {
        "workload": f"{size[0]}x{size[1]}x{size[2]} K={k} T={t} "
                    f"raw-f32 file ({mb:.0f} MB/epoch pass), native "
                    "BlockReader prefetch",
        "resident_epoch_s": round(sec_res, 3),
        "streamed_epoch_s_prefetch": round(sec_pf, 3),
        "streamed_epoch_s_noprefetch": round(sec_np, 3),
        "native_read_mb_s_cold": round(mb / read_s, 1),
        "tunnel_link_mb_s": round(mb / max(sec_pf - sec_res, 1e-3), 1),
        "timing_note": "streamed-epoch overhead = the ~tunnel-rate "
                       "host->device transfer, which prefetch cannot "
                       "hide (it overlaps the DISK read, trivial here; "
                       "real hosts feed GB/s over PCIe)",
        "beta_max_abs_diff": beta_err,
        "traces_max_rel_diff": c_err,
        "factors_match": bool(beta_err < 1e-5 and c_err < 1e-5),
    }


def _aniso_recovery_run():
    """Anisotropic per-axis sigma witness (round 5): z-flattened
    per-axis GT widths, fitted with sigma_axes=3 vs the isotropic
    control on the SAME ground truth.  The lift is the representation
    error an isotropic model cannot remove.  Both arms run the CEILING
    sigma cadence (every round, 4 steps x 16 frames) so the widths
    actually converge on a 6-round fixture; the aniso-vs-iso round-time
    delta is therefore the per-axis kernels' price at that cadence
    (production cadence is lighter on both arms alike)."""
    import sys

    import jax
    import numpy as np

    if jax.default_backend() != "tpu":
        return None
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    from wb_recovery import seeded_recovery

    size, k, t = (256, 256, 10), 100, 32
    rounds, epochs, mu_iters = 6, 8, 50
    # Ceiling sigma protocol (every round, 4 steps x 16 frames): width
    # convergence IS the measurement here; the production cadence's 4
    # total Adam steps leave sigma near its init either way.
    kw = dict(frame_block=8, fit_sigma=True, sigma_aniso=True,
              sigma_every=1, sigma_steps=4, sigma_frames=16)
    r3 = seeded_recovery(size, k, t, rounds, epochs, mu_iters, **kw)
    r1 = seeded_recovery(size, k, t, rounds, epochs, mu_iters,
                         fit_sigma_axes=1, **kw)
    return {
        "workload": f"{size[0]}x{size[1]}x{size[2]} K={k} T={t}, "
                    "aniso GT (z-flattened 0.6x, +-25%/axis), "
                    f"{rounds}x({epochs}ep+{mu_iters}MU)+fit_sigma "
                    "(ceiling cadence: every round, 4 steps x 16 fr)",
        "sigma_err_px_aniso_fit": round(r3["sigma_err"], 3),
        "sigma_err_px_iso_fit": round(r1["sigma_err"], 3),
        "trace_corr_mean_aniso": round(float(np.mean(r3["corr"])), 4),
        "trace_corr_mean_iso": round(float(np.mean(r1["corr"])), 4),
        "trace_corr_min_aniso": round(float(np.min(r3["corr"])), 4),
        "trace_corr_min_iso": round(float(np.min(r1["corr"])), 4),
        "round_s_aniso": round(r3["round_s_steady"], 3),
        "round_s_iso": round(r1["round_s_steady"], 3),
    }


def _streamed_pipeline_run():
    """One-call pipeline on a raw-file source (round 5): a config-3-
    SHAPED recording on disk runs register_and_demix end-to-end through
    the native BlockReader with device memory bounded by the block
    size; factors gated against the device-resident run.  Sized for
    the tunneled link (real hosts stream GB/s over PCIe)."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() != "tpu":
        return None
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    from wb_recovery import interior_positions, synthesize

    from dnmf_tpu.config import ModelConfig, OptimizerConfig
    from dnmf_tpu.data.streaming import open_raw_video
    from dnmf_tpu.engine.pipeline import register_and_demix
    from dnmf_tpu.utils.metrics import trace_correlations

    size, k, t, blk = (128, 128, 8), 24, 48, 8
    model = ModelConfig(size=size, num_neurons=k, num_frames=t,
                        shape_std=3.0)
    key = jax.random.PRNGKey(0)
    pos_gt = interior_positions(key, k, size, margin=12.0)
    sigma_gt = jnp.full((k,), model.shape_std)
    _betas, c_gt, video, _pt = synthesize(model, pos_gt, sigma_gt,
                                          jax.random.PRNGKey(1))
    host = np.maximum(np.asarray(video, np.float32), 0.0)
    tmp = tempfile.NamedTemporaryFile(suffix=".raw", delete=False)
    host.tofile(tmp.name)
    tmp.close()

    opt = OptimizerConfig(learning_rate=1e-3, outer_rounds=3,
                          motion_epochs=8, mu_iters=50,
                          gamma_motion=0.1)
    pts = np.asarray(pos_gt, np.float64)

    t0 = time.time()
    res_r = register_and_demix(
        host.reshape((t,) + size), points=pts, model=model,
        optimizer=opt)
    _ = float(np.sum(res_r.traces))
    sec_resident = time.time() - t0

    src = open_raw_video(tmp.name, (t,) + size, block=blk)
    t0 = time.time()
    res_s = register_and_demix(src, points=pts, model=model,
                               optimizer=opt)
    _ = float(np.sum(res_s.traces))
    sec_streamed = time.time() - t0
    os.unlink(tmp.name)

    beta_err = float(np.max(np.abs(
        np.asarray(res_s.fit.state.beta)
        - np.asarray(res_r.fit.state.beta))))
    c_err = float(np.max(np.abs(res_s.traces - res_r.traces))
                  / max(np.max(np.abs(res_r.traces)), 1e-30))
    corr = trace_correlations(res_s.traces, np.asarray(c_gt))
    return {
        "workload": f"{size[0]}x{size[1]}x{size[2]} K={k} T={t} "
                    f"raw-f32 file, block={blk}, pw-rigid "
                    "register->seed->demix one-call",
        "pipeline_s_resident": round(sec_resident, 2),
        "pipeline_s_streamed": round(sec_streamed, 2),
        "trace_corr_mean": round(float(np.mean(corr)), 4),
        "corr_note": "light 3x8 protocol — the gate here is "
                     "streamed==resident factor equality; recovery "
                     "convergence is the pipeline section's 6x12 job",
        "beta_max_abs_diff": beta_err,
        "traces_max_rel_diff": c_err,
        "factors_match": bool(beta_err < 1e-4 and c_err < 1e-4),
    }


def _torch_cpu_baseline_per_frame():
    """Per-frame cost of the reference-equivalent round on torch/NumPy CPU.

    Measured on BASELINE_FRAMES frames and scaled linearly in T: the
    reference's per-round cost is T-linear (batch loop over all frames for
    the motion epoch; Gram einsums carry a T axis).
    """
    import numpy as np
    import torch
    import torch.nn.functional as F

    m, n, z = SIZE
    tb = BASELINE_FRAMES
    torch.manual_seed(0)
    # Stored footprint volume A[m,n,z,K] warped per frame via grid_sample
    # (reference ExponentialFP.forward, Demix/dNMF.py:53-62).
    grid_pts = torch.stack(
        torch.meshgrid(
            torch.arange(m, dtype=torch.float32),
            torch.arange(n, dtype=torch.float32),
            torch.arange(z, dtype=torch.float32),
            indexing="ij",
        ),
        dim=-1,
    )
    pos = 10.0 + torch.rand(K, 3) * (torch.tensor(SIZE).float() - 20.0)
    a_vol = torch.exp(
        -((grid_pts[:, :, :, None, :] - pos[None, None, None]) ** 2).sum(-1)
        / 9.0
    )  # [m, n, z, K]
    beta = torch.zeros(tb, 10, 3, requires_grad=True)
    with torch.no_grad():
        beta[:, 1, 0] = 1.0
        beta[:, 2, 1] = 1.0
        beta[:, 3, 2] = 1.0
    c = torch.rand(K, tb)
    y = torch.rand(tb, m, n, z)
    opt = torch.optim.Adam([beta], lr=1e-3)
    sizes = torch.tensor(SIZE).float()

    basis = torch.cat(
        [
            torch.ones(m, n, z, 1),
            grid_pts,
            grid_pts**2,
            (grid_pts[..., 0] * grid_pts[..., 1])[..., None],
            (grid_pts[..., 0] * grid_pts[..., 2])[..., None],
            (grid_pts[..., 1] * grid_pts[..., 2])[..., None],
        ],
        dim=-1,
    )  # [m, n, z, 10]

    def motion_step():
        opt.zero_grad()
        grid = torch.einsum("mnza,tab->tmnzb", basis, beta)
        grid = 2 * grid / (sizes - 1) - 1
        a_in = a_vol.permute(3, 2, 1, 0)[None].expand(tb, -1, -1, -1, -1)
        warped = F.grid_sample(
            a_in, grid.permute(0, 3, 2, 1, 4), align_corners=True
        ).permute(0, 1, 4, 3, 2)  # [tb, K, m, n, z]
        recon = torch.einsum("tkmnz,kt->tmnz", warped, c)
        loss = F.mse_loss(recon, y)
        loss.backward()
        opt.step()
        return warped

    # Motion epoch over the tb frames.  Warm once (torch lazy init /
    # allocator), then take the min of 3 — single-shot timings on this
    # 1-core host swing ~50% with background load, which showed up as
    # a 49k-89k spread in vs_baseline across driver runs.  min is the
    # most conservative choice (fastest baseline => smallest speedup).
    warped = motion_step()
    motion_time = None
    for _ in range(3):
        t0 = time.time()
        warped = motion_step()
        dt = time.time() - t0
        motion_time = dt if motion_time is None else min(motion_time, dt)

    # One full-Gram MU einsum round (reference recomputes this each of the
    # iter_c=50 iterations, Demix/dNMF.py:139-149,172-173).
    a_np = warped.detach().numpy().transpose(2, 3, 4, 1, 0)  # [m,n,z,K,tb]
    y_np = y.numpy().transpose(1, 2, 3, 0)
    c_np = c.numpy()
    mu_once = None
    for _ in range(3):
        t0 = time.time()
        a_ts = np.einsum("mnzkt,mnzlt->klt", a_np, a_np)
        c1 = np.einsum("mnzkt,mnzt->kt", a_np, y_np)
        c2 = np.einsum("klt,lt->kt", a_ts, c_np)
        _ = c_np * c1 / (c2 + 1e-32)
        dt = time.time() - t0
        mu_once = dt if mu_once is None else min(mu_once, dt)

    per_frame = (motion_time + MU_ITERS * mu_once) / tb
    return per_frame


def _guard(fn):
    try:
        return fn()
    except Exception as e:  # noqa: BLE001 — never break the JSON line
        return {"error": str(e)[:200]}


def _backend_preflight(retries=6, wait_s=60, probe_timeout=75):
    """Bounded device-discovery probe in a killable subprocess.

    When the tunnel is down, ``jax.devices()`` blocks FOREVER inside
    ``make_c_api_client`` (NOTES.md) — probing in-process would stall
    the whole benchmark run with no output.  Returns the platform name,
    or None after ``retries`` failed probes (~13 min worst case, riding
    out short tunnel blips).
    """
    import subprocess
    import sys

    code = "import jax; print(jax.devices()[0].platform)"
    last = ""
    for i in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=probe_timeout)
            if r.returncode == 0 and r.stdout.strip():
                return r.stdout.strip().splitlines()[-1]
            last = (r.stderr or "probe failed").strip()[-200:]
        except subprocess.TimeoutExpired:
            last = (f"device discovery timed out ({probe_timeout}s) — "
                    "tunnel down?")
        print(f"preflight {i + 1}/{retries}: {last}", file=sys.stderr,
              flush=True)
        if i + 1 < retries:
            time.sleep(wait_s)
    return None


def main():
    import sys

    import jax

    # Tunnel compiles are slow; persist across runs/sections.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    platform = _backend_preflight()
    if platform is None:
        print(json.dumps({
            "metric": "frames/sec/chip", "value": 0.0,
            "unit": "frames/s", "vs_baseline": 0.0,
            "error": "device backend unreachable (tunnel outage); "
                     "no measurement possible this session",
        }))
        sys.exit(1)

    # Headline = the PRODUCTION configuration (gram_mode auto ->
    # analytic, trust-gated); the exact-Gram run is the legacy/parity
    # row (VERDICT r3 #6: the headline must track the default fast
    # path).
    tpu = _tpu_run("analytic")
    tpu_exact = _tpu_run("exact")
    wb = _whole_brain_run()
    correctness = _guard(_correctness_run)
    registration = _guard(_registration_run)
    pipeline = _guard(_pipeline_recovery_run)
    streamed_io = _guard(_streamed_io_run)
    aniso = _guard(_aniso_recovery_run)
    streamed_pipeline = _guard(_streamed_pipeline_run)
    base_per_frame = _torch_cpu_baseline_per_frame()
    baseline_round = base_per_frame * T
    result = {
        "metric": "frames/sec/chip",
        "value": round(tpu["tpu_frames_per_sec"], 2),
        "unit": "frames/s",
        "vs_baseline": round(baseline_round / tpu["tpu_round_seconds"], 1),
        "workload": f"{SIZE[0]}x{SIZE[1]}x{SIZE[2]} K={K} T={T} "
                    f"1 motion epoch + grams + {MU_ITERS} MU",
        "gram_mode": "analytic (production default; exact row below)",
        "round_ms": round(tpu["tpu_round_seconds"] * 1e3, 1),
        "round_ms_min": round(tpu["tpu_round_seconds_min"] * 1e3, 1),
        "round_ms_max": round(tpu["tpu_round_seconds_max"] * 1e3, 1),
        "round_ms_exact": round(tpu_exact["tpu_round_seconds"] * 1e3, 1),
        "frames_per_sec_exact": round(
            tpu_exact["tpu_frames_per_sec"], 2),
        # max/median spread is tunnel-queue noise (NOTES.md); median is
        # the representative figure.
        "timing_note": "median of 5; max reflects tunnel hiccups",
        "baseline_round_s_extrapolated": round(baseline_round, 1),
        "backend": tpu["backend"],
        "whole_brain": wb,
        "correctness": correctness,
        "registration": registration,
        "pipeline": pipeline,
        "streamed_io": streamed_io,
        "anisotropic": aniso,
        "streamed_pipeline": streamed_pipeline,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
