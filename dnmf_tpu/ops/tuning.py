"""Measured kernel-parameter cache: pick Pallas tiling knobs by data.

The fused kernels expose tiling knobs whose optima move with the
workload — neuron-block width ``kblock`` flips 40 -> 64 between K=200
and K=500 (pair-dot work grows quadratically with block count), the
Gram kernel's ``frames_per_step`` and the pipelined variant's ``nbuf``
trade VMEM against step-machinery overhead, and the fused warp kernel's
``(tm, tn)`` tiles trade halo DMA against VMEM residency.  Round-2/3
optima for the flagship shapes are hardcoded heuristics at the call
sites (``models/dnmf.py`` ``_CulledShim``); this module lets *measured*
results override them per shape.

``tools/autotune.py`` runs the sweeps on real hardware and records the
winners here; production wrappers consult :func:`lookup` first and fall
back to their static heuristics on a miss.  The cache is a small JSON
file (committed when measured on the target fleet hardware, so tuning
ships with the code), overridable via ``DNMF_TPU_TUNING_CACHE`` for
tests and per-site caches.

The reference has no analog — its only executor knob is the DataLoader
batch size (``/root/reference/demo.py:33``); kernel-level tuning is a
TPU-native concern.

Match rule: an entry matches a query when every non-``k`` key field is
equal and the neuron counts agree within ``K_RATIO`` (1.25x) — measured
optima are stable in that neighborhood (the kblock flip sits at a 2.5x
ratio), and anything farther should be re-measured, not interpolated.
"""

from __future__ import annotations

import json
import os
import pathlib
import tempfile
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

_ENV = "DNMF_TPU_TUNING_CACHE"
K_RATIO = 1.25

# (path, mtime) -> parsed entries; lookup runs at jit-trace time, so a
# stat per trace is fine but a full parse per call is not.
_cache: Dict[Tuple[str, float], List[dict]] = {}


def cache_path() -> pathlib.Path:
    env = os.environ.get(_ENV)
    if env:
        return pathlib.Path(env)
    return pathlib.Path(__file__).with_name("tuning_cache.json")


def _load() -> List[dict]:
    path = cache_path()
    try:
        mtime = path.stat().st_mtime
    except OSError:
        return []
    key = (str(path), mtime)
    if key not in _cache:
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            return []
        _cache.clear()  # one live file; drop stale mtimes
        _cache[key] = list(data.get("entries", []))
    return _cache[key]


def _k_close(a: Any, b: Any) -> bool:
    try:
        a, b = float(a), float(b)
    except (TypeError, ValueError):
        return a == b
    if a <= 0 or b <= 0:
        return a == b
    return max(a, b) / min(a, b) <= K_RATIO


def lookup(kernel: str, **key: Any) -> Optional[Dict[str, Any]]:
    """Best measured params for ``kernel`` at ``key``, or None.

    Non-``k`` fields must match exactly; ``k`` within :data:`K_RATIO`
    (nearest wins).  Entries with key fields the query doesn't supply
    never match (a more specific measurement shouldn't leak into a
    less specific query).
    """
    best, best_dist = None, None
    for ent in _load():
        if ent.get("kernel") != kernel:
            continue
        ek = ent.get("key", {})
        if set(ek) != set(key):
            continue
        dist = 0.0
        ok = True
        for f, v in ek.items():
            if f == "k":
                if not _k_close(v, key[f]):
                    ok = False
                    break
                dist = abs(float(v) - float(key[f]))
            elif v != key[f]:
                ok = False
                break
        if ok and (best is None or dist < best_dist):
            best, best_dist = ent, dist
    return dict(best["params"]) if best else None


def record(
    kernel: str,
    key: Dict[str, Any],
    params: Dict[str, Any],
    metric_ms: float,
    device: str,
    note: str = "",
) -> None:
    """Persist a measured winner (replaces any entry with the same
    kernel + exact key).  The read-modify-write runs under an exclusive
    flock so concurrent autotune runs (e.g. two shapes swept in
    parallel) merge instead of erasing each other's entries; the final
    rename is atomic for readers."""
    import fcntl

    path = cache_path()
    path.parent.mkdir(parents=True, exist_ok=True)
    lock = path.with_name(path.name + ".lock")
    with open(lock, "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        _record_locked(path, kernel, key, params, metric_ms, device,
                       note)
    _cache.clear()


def _record_locked(path, kernel, key, params, metric_ms, device, note):
    try:
        data = json.loads(path.read_text())
    except (OSError, ValueError):
        data = {"version": 1, "entries": []}
    entries = [
        e for e in data.get("entries", [])
        if not (e.get("kernel") == kernel and e.get("key") == key)
    ]
    entries.append({
        "kernel": kernel,
        "key": dict(key),
        "params": dict(params),
        "metric_ms": round(float(metric_ms), 4),
        "device": device,
        "note": note,
    })
    entries.sort(key=lambda e: (e["kernel"], json.dumps(e["key"],
                                                        sort_keys=True)))
    data["entries"] = entries
    data["version"] = 1
    fd, tmp = tempfile.mkstemp(dir=str(path.parent), suffix=".json")
    with os.fdopen(fd, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
        f.write("\n")
    os.replace(tmp, path)


def sweep(
    candidates: Sequence[Dict[str, Any]],
    build: Callable[[Dict[str, Any]], Callable[[], Any]],
    fence: Callable[[Any], float],
    reps: int = 5,
    check: Optional[Callable[[Any, Any], float]] = None,
    check_tol: float = 1e-4,
    log: Callable[[str], None] = lambda s: None,
) -> Tuple[Optional[Dict[str, Any]], List[dict]]:
    """Time each candidate param dict; return (winner, results).

    ``build(params)`` returns a nullary callable producing device
    output; ``fence(out)`` must force completion via a scalar host read
    (``jax.block_until_ready`` does not block on the tunneled backend —
    NOTES.md).  Candidates that raise (VMEM walls, Mosaic rejects) are
    recorded as failed and skipped.  ``check(out, ref_out)`` returns a
    max-abs-difference vs the first successful candidate; exceeding
    ``check_tol`` disqualifies (a fast wrong kernel must never win).
    """
    results: List[dict] = []
    best: Optional[Dict[str, Any]] = None
    best_ms = None
    ref_out = None
    for params in candidates:
        tag = json.dumps(params, sort_keys=True)
        try:
            fn = build(dict(params))
            out = fn()
            fence(out)
            if check is not None:
                if ref_out is None:
                    ref_out = out
                else:
                    err = float(check(out, ref_out))
                    if not err <= check_tol:
                        results.append({"params": dict(params),
                                        "error": f"mismatch {err:.3e}"})
                        log(f"{tag}: MISMATCH {err:.3e}")
                        continue
            fence(fn())  # second warm call: stabilize queues
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fence(fn())
                ts.append(time.perf_counter() - t0)
            ms = float(sorted(ts)[len(ts) // 2] * 1e3)
        except Exception as e:  # noqa: BLE001 — sweep must survive walls
            results.append({"params": dict(params),
                            "error": f"{type(e).__name__}: {e}"[:200]})
            log(f"{tag}: FAILED {type(e).__name__}")
            continue
        results.append({"params": dict(params), "ms": round(ms, 4)})
        log(f"{tag}: {ms:.3f} ms")
        if best_ms is None or ms < best_ms:
            best, best_ms = dict(params), ms
    return best, results
