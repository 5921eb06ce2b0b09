"""Per-chunk sampling-based codec auto-selection.

The reference fixes one compression codec per run from a CLI flag
(/root/reference/crates/cli/src/parse/file_output.rs:102-136). Per
BASELINE.json:north_rule we make the choice automatic and per column
chunk: cheap closed-form size estimators over a deterministic sample
rank the candidate codecs, the best candidates are trial-encoded in
full, and a plain/strplain+zstd floor guarantees we never lose to the
parquet-zstd reference path. Literature: "Adaptive Compression for Fast
Scans on String Columns" (SIGMOD 2021), FSST (VLDB 2020) — PAPERS.md.

Deterministic: sampling is a fixed stride, no RNG — codec choices are a
pure function of the chunk's values (FIXTURES.md §4 parallelism-
invariance).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import registry
from .bits import storage_width

SAMPLE_TARGET = 1 << 15  # values sampled for estimation


@dataclass
class Choice:
    codec_id: str
    enc_bytes: int
    payload: bytes
    estimates: dict[str, float] = field(default_factory=dict)


def _sample(values: np.ndarray, target: int = SAMPLE_TARGET) -> np.ndarray:
    n = len(values)
    if n <= target:
        return values
    stride = n // target
    return values[::stride]


def _int_estimates(v: np.ndarray) -> dict[str, float]:
    """Estimated bytes-per-value for each int codec on sample ``v``."""
    n = len(v)
    if n == 0:
        return {"plain": 0.0}
    item = v.dtype.itemsize
    v64 = v.astype(np.int64)
    vmin, vmax = int(v64.min()), int(v64.max())
    est: dict[str, float] = {"plain": float(item)}
    if vmin >= 0:
        est["bitpack"] = storage_width(vmax) / 8.0
    est["for"] = storage_width(vmax - vmin) / 8.0 + 16.0 / n
    diffs = np.diff(v64)
    if len(diffs):
        zmax = int(np.abs(diffs).max()) * 2
        est["delta"] = storage_width(zmax) / 8.0 + 16.0 / n
    n_runs = 1 + int(np.count_nonzero(diffs)) if len(diffs) else 1
    run_bits = storage_width(vmax - vmin) + storage_width(max(1, n // max(1, n_runs)) * 4)
    est["rle"] = n_runs * run_bits / 8.0 / n + 32.0 / n
    card = len(np.unique(v))
    est["dict"] = storage_width(max(0, card - 1)) / 8.0 + card * 4.0 / n
    # dictf packs to the same width pre-zstd but compresses strictly
    # better under the entropy stage on skewed data; prefer it slightly
    # so it lands in the trial set whenever dict is competitive.
    est["dictf"] = est["dict"] - 1e-6
    return est


def _consider(best: Choice | None, name: str, payload: bytes,
              est: dict[str, float], zstd_level: int) -> Choice | None:
    """Frame raw and +zstd variants of one base payload; keep the smallest."""
    for codec_id in (name, name + "+zstd"):
        blob = registry.frame(codec_id, payload, zstd_level=zstd_level)
        if best is None or len(blob) < best.enc_bytes:
            best = Choice(codec_id, len(blob), blob, est)
    return best


def choose_int(values: np.ndarray, *, zstd_level: int = registry.ZSTD_LEVEL,
               try_top: int = 1) -> Choice:
    """Pick the cheapest codec for an int chunk; returns the encoded blob.

    Estimator ranks codecs on a deterministic sample; the best
    ``try_top`` are fully encoded once each (raw and +zstd variants
    share the base encode) alongside the plain+zstd floor; smallest wins.
    """
    sample = _sample(values)
    est = _int_estimates(sample)
    ranked = sorted(est, key=est.get)[:try_top]
    # 'for' is always trialed: with the byte-split layout its +zstd
    # variant is the strongest general-purpose path (estimates can't see
    # the entropy stage); 'plain' is the never-lose floor.
    candidates = set(ranked) | {"for", "plain"}
    best: Choice | None = None
    for name in candidates:
        enc, _, _ = registry.CODECS[name]
        try:
            payload = enc(values)
        except ValueError:  # e.g. bitpack on negatives
            continue
        best = _consider(best, name, payload, est, zstd_level)
    assert best is not None
    return best


_STR_SAMPLE = 1024


def choose_str(values, *, zstd_level: int = registry.ZSTD_LEVEL) -> Choice:
    """Pick the cheapest string codec (strdict / strfsst / strplain+zstd).

    Trial-encodes a deterministic prefix sample with every candidate,
    full-encodes the sample winner, and keeps strplain+zstd as the
    never-lose floor.
    """
    import pyarrow as pa

    arr = values if isinstance(values, pa.Array) else pa.array(list(values), type=pa.string())
    est: dict[str, float] = {}
    if len(arr) > _STR_SAMPLE:
        sample = arr.slice(0, _STR_SAMPLE)
        for name in ("strplain", "strdict", "strfsst"):
            try:
                est[name] = float(len(registry.encode_any(name + "+zstd", sample,
                                                          zstd_level=zstd_level)))
            except Exception:
                est[name] = float("inf")
        winner = min(est, key=est.get)
        candidates = {winner, "strplain"}
    else:
        candidates = {"strplain", "strdict", "strfsst"}
    best: Choice | None = None
    for name in candidates:
        enc, _, _ = registry.CODECS[name]
        try:
            payload = enc(arr)
        except Exception:
            continue
        best = _consider(best, name, payload, est, zstd_level)
    assert best is not None
    return best
