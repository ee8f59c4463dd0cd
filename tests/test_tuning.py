"""Tuning cache: lookup semantics, persistence, sweep, and the
production dispatch hooks (``_CulledShim`` impl promotion)."""

import json
import time

import jax.numpy as jnp
import numpy as np
import pytest

from dnmf_tpu.ops import tuning


@pytest.fixture
def cache(tmp_path, monkeypatch):
    path = tmp_path / "tuning.json"
    monkeypatch.setenv("DNMF_TPU_TUNING_CACHE", str(path))
    tuning._cache.clear()
    yield path
    tuning._cache.clear()


def test_record_lookup_roundtrip(cache):
    assert tuning.lookup("culled_gram", k=200) is None
    tuning.record("culled_gram", {"k": 200},
                  {"kblock": 40, "tile_p": 4096}, 5.87, "test-dev")
    got = tuning.lookup("culled_gram", k=200)
    assert got == {"kblock": 40, "tile_p": 4096}
    # Persisted, not just in-memory.
    data = json.loads(cache.read_text())
    assert data["entries"][0]["metric_ms"] == 5.87


def test_lookup_nearest_k_within_ratio(cache):
    tuning.record("culled_gram", {"k": 200}, {"kblock": 40}, 1.0, "d")
    tuning.record("culled_gram", {"k": 500}, {"kblock": 64}, 1.0, "d")
    assert tuning.lookup("culled_gram", k=210) == {"kblock": 40}
    assert tuning.lookup("culled_gram", k=460) == {"kblock": 64}
    # 1.25x ratio bound: 320 matches neither 200 nor 500.
    assert tuning.lookup("culled_gram", k=320) is None
    # Nearest wins when both match.
    tuning.record("culled_gram", {"k": 220}, {"kblock": 48}, 1.0, "d")
    assert tuning.lookup("culled_gram", k=210) == {"kblock": 40}


def test_lookup_key_fields_must_agree(cache):
    tuning.record("fused_warp", {"m": 512, "n": 512, "z": 20},
                  {"tm": 64}, 1.0, "d")
    assert tuning.lookup("fused_warp", m=512, n=512, z=20) == {"tm": 64}
    assert tuning.lookup("fused_warp", m=512, n=512, z=10) is None
    # Differing key-field *sets* never match in either direction.
    assert tuning.lookup("fused_warp", m=512, n=512) is None
    assert tuning.lookup("fused_warp", m=512, n=512, z=20,
                         extra=1) is None


def test_record_replaces_same_key(cache):
    tuning.record("culled_motion", {"k": 200}, {"kblock": 40}, 2.0, "d")
    tuning.record("culled_motion", {"k": 200}, {"kblock": 64}, 1.5, "d")
    assert tuning.lookup("culled_motion", k=200) == {"kblock": 64}
    data = json.loads(cache.read_text())
    assert len(data["entries"]) == 1


def test_corrupt_cache_is_a_miss(cache):
    cache.write_text("{not json")
    assert tuning.lookup("culled_gram", k=200) is None


def test_sweep_picks_fastest_skips_failures_and_mismatches(cache):
    def build(params):
        if params.get("boom"):
            raise ValueError("VMEM wall")
        def run():
            time.sleep(params["s"])
            return np.float64(params.get("val", 0.0))
        return run

    cands = [
        {"s": 0.01},
        {"s": 0.0, "val": 99.0},   # fast but wrong -> disqualified
        {"boom": True},            # raises -> skipped
        {"s": 0.002},              # the legitimate winner
    ]
    best, results = tuning.sweep(
        cands, build, fence=float, reps=1,
        check=lambda a, b: abs(a - b), check_tol=1e-6)
    assert best == {"s": 0.002}
    errs = [r for r in results if "error" in r]
    assert len(errs) == 2
    assert any("mismatch" in r["error"] for r in errs)
    assert any("ValueError" in r["error"] for r in errs)


def test_culled_shim_params_fallback_and_override(cache):
    from dnmf_tpu.models.dnmf import _CulledShim

    # Miss -> static heuristic.
    assert _CulledShim._params("culled_gram", 200) == {
        "kblock": 40, "tile_p": 4096}
    assert _CulledShim._params("culled_gram", 500) == {
        "kblock": 64, "tile_p": 4096}
    # Measured entry overrides.
    tuning.record("culled_gram", {"k": 200},
                  {"impl": "pipelined", "kblock": 64, "tile_p": 2048,
                   "nbuf": 3}, 4.0, "d")
    got = _CulledShim._params("culled_gram", 200)
    assert got["impl"] == "pipelined" and got["nbuf"] == 3
    assert got["kblock"] == 64 and got["tile_p"] == 2048
    # Other kernels unaffected.
    assert _CulledShim._params("culled_motion", 200) == {
        "kblock": 40, "tile_p": 4096}


def test_gram_dispatch_honors_pipelined_promotion(cache, rng):
    """A cache entry flips _CulledShim.gram_block to the pipelined
    kernel; outputs must match the grid kernel (interpret mode)."""
    from dnmf_tpu.models.dnmf import _CulledShim

    size = (12, 10, 4)
    k, b = 12, 2
    p = int(np.prod(size))
    betas = np.zeros((b, 10, 3), dtype=np.float32)
    betas[:, 1, 0] = betas[:, 2, 1] = betas[:, 3, 2] = 1.0
    pos = np.stack([
        rng.uniform(1, s - 1.0, k).astype(np.float32) for s in size
    ], axis=1)
    sigma = np.full((k,), 1.5, dtype=np.float32)
    y = rng.random((b, p), dtype=np.float32)
    args = (jnp.asarray(betas), jnp.asarray(pos), jnp.asarray(sigma),
            jnp.asarray(y), size)

    g0, c0 = _CulledShim.gram_block(*args, tile_p=64, interpret=True)
    tuning.record("culled_gram", {"k": k},
                  {"impl": "pipelined", "nbuf": 2}, 1.0, "d")
    g1, c1 = _CulledShim.gram_block(*args, tile_p=64, interpret=True)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               rtol=2e-5, atol=2e-6)


def test_refine_tuning_override(cache):
    from dnmf_tpu.models.refine import _refine_tuning

    assert _refine_tuning(200) == {"kblock": 40, "tile_p": 4096}
    tuning.record("culled_refine", {"k": 200},
                  {"kblock": 64, "frames_per_step": 2}, 1.0, "d")
    assert _refine_tuning(200) == {"kblock": 64, "tile_p": 4096,
                                   "frames_per_step": 2}
