"""Per-chunk sampling-based codec auto-selection.

The reference fixes one compression codec per run from a CLI flag
(/root/reference/crates/cli/src/parse/file_output.rs:102-136). Per
BASELINE.json:north_rule we make the choice automatic and per column
chunk: cheap closed-form size estimators prefilter the candidate list,
the survivors are trial-encoded on a deterministic sample (including a
fast-zstd entropy probe, so the estimate sees the cascade), and only the
sample winner is fully encoded. A plain floor guarantees we never exceed
the raw size. Literature: "Adaptive Compression for Fast Scans on String
Columns" (SIGMOD 2021), FSST (VLDB 2020) — PAPERS.md.

Trial-encoding every candidate on the FULL chunk was measured at ~85 ms
per 500k-token chunk with the zstd stage dominating (13-36 ms per
candidate); sample-sized trials cut that to ~25 ms with identical
choices on the bench distributions.

Deterministic: sampling is a fixed stride, no RNG — codec choices are a
pure function of the chunk's values (FIXTURES.md §4 parallelism-
invariance).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from . import registry
from .bits import storage_width, zigzag, zstd_compress

# Values sampled for estimation + trials. 8k (was 32k in r2): the
# trial loop was ~3.6 ms of an ~11 ms per-chunk kernel at 32k; at 8k it
# is ~0.9 ms with IDENTICAL choices and sizes across 11 distribution
# shapes (zipf/uniform/ramps/runs/dict/negatives — PLANS.md r3 A/B).
# Still a fixed-stride pure function of the chunk's values, so codec
# choices stay parallelism-invariant (tools/differential.py pins it).
# Env override is for A/B measurement only; a malformed value falls
# back to the default rather than crashing every executor import.
try:
    # max(1, ...): 0/negative would make _sample's ``n // target`` stride
    # divide by zero in every chunk-encode kernel — clamp, don't crash.
    SAMPLE_TARGET = max(1, int(os.environ.get("CRYO_SPARK_TRIAL_SAMPLE",
                                              1 << 13)))
except Exception:
    SAMPLE_TARGET = 1 << 13
_TRIAL_ZSTD_LEVEL = 1  # entropy probe level: matches ZSTD_LEVEL
# skip the full-size zstd frame when the trial's entropy gain on the
# winning base is below this margin (z_trial >= margin * raw_trial)
_ZSTD_SKIP_MARGIN = 0.97
_PROBE_WIN = 1 << 15  # payload-probe window (32 KiB x head/mid/tail)


def _zstd_futile(payload: bytes) -> bool:
    """Confirm on the REAL payload that the entropy stage has nothing.

    The trial gate alone is unsafe: the strided value sample aliases
    away run structure (e.g. 64-long runs sampled at stride 64 look
    like noise), so a chunk whose full payload zstd-compresses 20x can
    read as incompressible at trial time (measured: the 'runs' shape,
    bitpack 458 KB vs bitpack+zstd 23 KB). Three CONTIGUOUS windows of
    the full winner payload (head/mid/tail) keep local repetition
    visible at ~1/20 the cost of the full frame.
    """
    n = len(payload)
    mid = (n - _PROBE_WIN) // 2
    probe = (payload[:_PROBE_WIN] + payload[mid:mid + _PROBE_WIN]
             + payload[n - _PROBE_WIN:])
    return len(zstd_compress(probe, level=_TRIAL_ZSTD_LEVEL)) >= \
        _ZSTD_SKIP_MARGIN * len(probe)


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
    diffs = np.diff(v64)  # wraps mod 2^64 — the same arithmetic encode_delta packs
    if len(diffs):
        # zigzag, not abs*2: abs(int64.min) is still negative and a
        # full-range spread overflows, while zigzag is total on int64
        # and is exactly what the codec stores
        zmax = int(zigzag(diffs).max())
        est["delta"] = storage_width(zmax) / 8.0 + 16.0 / n
        if len(diffs) > 1:
            # second differences: near-regular ramps (timestamps of an
            # event stream) collapse to ~0 here while first deltas stay
            # wide — exactly the gap dod exists to exploit. When the
            # estimate is NOT strictly below delta's, dod cannot win
            # (same bitpack, +8 bytes of header) — withhold it so it
            # never ties into the prefilter and burns a sample trial
            # (measured +13% choose_int wall on zipf token chunks)
            ddmax = int(zigzag(np.diff(diffs)).max())
            dod_est = storage_width(ddmax) / 8.0 + 24.0 / n
            if dod_est < est["delta"]:
                est["dod"] = dod_est
    n_runs = 1 + int(np.count_nonzero(diffs)) if len(diffs) else 1
    run_bits = storage_width(vmax - vmin) + storage_width(max(1, n // max(1, n_runs)) * 4)
    est["rle"] = n_runs * run_bits / 8.0 / n + 32.0 / n
    card = len(np.unique(v))
    est["dict"] = storage_width(max(0, card - 1)) / 8.0 + card * 4.0 / n
    # dictf packs to the same width pre-zstd but compresses strictly
    # better under the entropy stage on skewed data; prefer it slightly
    # so it survives the prefilter whenever dict is competitive.
    est["dictf"] = est["dict"] - 1e-6
    return est


def _consider(best: Choice | None, name: str, payload: bytes,
              est: dict[str, float], zstd_level: int,
              variants: tuple[bool, bool] = (True, True)) -> Choice | None:
    """Frame raw and/or +zstd variants of one base payload; keep the smallest."""
    raw, zstd = variants
    for codec_id in ([name] if raw else []) + ([name + "+zstd"] if zstd else []):
        blob = registry.frame(codec_id, payload, zstd_level=zstd_level)
        if best is None or len(blob) < best.enc_bytes:
            best = Choice(codec_id, len(blob), blob, est)
    return best


_PREFILTER_TOP = 4


def choose_int(values: np.ndarray, *, zstd_level: int = registry.ZSTD_LEVEL,
               try_top: int = 1) -> Choice:
    """Pick the cheapest codec for an int chunk; returns the encoded blob.

    Closed-form estimates prefilter to the best ``_PREFILTER_TOP``
    codecs (plus 'for', the robust general path); those are trial-
    encoded on the sample with a fast-zstd probe; the best ``try_top``
    base codecs are then fully encoded (raw and +zstd variants share
    the base encode). A raw-plain floor is applied by size arithmetic
    without encoding, so the result never exceeds the raw bytes.
    """
    sample = _sample(values)
    est = _int_estimates(sample)
    scale = len(values) / max(1, len(sample))
    pre = sorted((k for k in est if k != "plain"), key=est.get)[:_PREFILTER_TOP]
    if "for" not in pre:
        pre.append("for")
    # plain+zstd never-lose floor: always trial it (sample memcpy + the
    # zstd probe already paid for the others) so a chunk where plain+zstd
    # beats every structured codec's zstd variant can still win the full
    # encode — preserves the match-or-beat-parquet-zstd guarantee.
    pre.append("plain")

    trials: list[tuple[float, str]] = []
    for name in pre:
        enc, _, _ = registry.CODECS[name]
        try:
            p = enc(sample)
        except ValueError:  # e.g. bitpack on negatives
            continue
        z = zstd_compress(p, level=_TRIAL_ZSTD_LEVEL)
        trials.append((len(p) * scale, name))
        trials.append((len(z) * scale, name + "+zstd"))
        est[name + "~trial"] = len(p) * scale
        est[name + "+zstd~trial"] = len(z) * scale
    trials.sort()

    best: Choice | None = None
    tried_bases: list[str] = []
    plain_z_trial = est.get("plain+zstd~trial", float("inf"))
    for _, codec_id in trials:
        base, _ = registry.split_codec_id(codec_id)
        if base in tried_bases:
            continue
        if len(tried_bases) >= try_top:
            break
        tried_bases.append(base)
        payload = registry.CODECS[base][0](values)
        # zstd-cascade skip (r3 verdict item 7): the winner's FULL +zstd
        # frame is ~4.3 ms of the ~8 ms kernel, but when the TRIAL shows
        # the entropy stage gains <3% on this base's structural payload
        # there is nothing left for it to find at full size either. Only
        # skip when the base's raw trial also beats plain+zstd's trial —
        # that keeps the match-or-beat-parquet-zstd floor intact (a base
        # whose raw form loses to plain+zstd must still get its zstd
        # variant considered). Pure function of the sample -> codec
        # choice stays parallelism-invariant (differential.py pins it).
        raw_t = est.get(base + "~trial", float("inf"))
        z_t = est.get(base + "+zstd~trial", float("inf"))
        zskip = (
            z_t >= _ZSTD_SKIP_MARGIN * raw_t      # trial: no entropy gain
            and raw_t <= plain_z_trial            # floor guard intact
            and len(payload) > 3 * _PROBE_WIN     # frame cost worth saving
            and _zstd_futile(payload)             # confirmed on REAL bytes
        )
        best = _consider(best, base, payload, est, zstd_level,
                         variants=(True, not zskip))

    # raw-plain floor: size known without encoding (header + raw bytes)
    plain_size = _plain_frame_size(values)
    if best is None or best.enc_bytes > plain_size:
        payload = registry.CODECS["plain"][0](values)
        best = _consider(best, "plain", payload, est, zstd_level,
                         variants=(True, best is None))
    assert best is not None
    return best


def _plain_frame_size(values: np.ndarray) -> int:
    # frame: magic(4) + name_len(1) + name(5) + flag(1); plain payload: hdr(9) + bytes
    return 4 + 1 + len("plain") + 1 + 9 + values.nbytes


_STR_SAMPLE = 1024
# Trial FSST only when the cheap codecs' zstd stage compresses poorly:
# when plain/dict+zstd already reach a ratio this good, the FSST trial
# (a symbol-table train, ~50x the cost of the other trials) cannot
# recoup its cost — strings are a small fraction of chunk bytes.
_FSST_GATE_RATIO = 0.35


def choose_str(values, *, zstd_level: int = registry.ZSTD_LEVEL) -> Choice:
    """Pick the cheapest string codec (strdict / strfsst / strplain).

    Trial-encodes a deterministic prefix sample with every candidate
    (with the +zstd stage, so the estimate sees the cascade) and
    full-encodes only the sample winner; a raw strplain floor is applied
    by size arithmetic so the result never exceeds the raw bytes.
    """
    import pyarrow as pa

    from .strings import to_bytes_lengths

    arr = values if isinstance(values, pa.Array) else pa.array(list(values), type=pa.string())
    est: dict[str, float] = {}
    if len(arr) > _STR_SAMPLE:
        sample = arr.slice(0, _STR_SAMPLE)
        scale = len(arr) / _STR_SAMPLE
        s_data, _s_lens = to_bytes_lengths(sample)
        sample_raw = max(1, len(s_data))
        for name in ("strplain", "strdict"):
            try:
                est[name] = float(len(registry.encode_any(
                    name + "+zstd", sample, zstd_level=_TRIAL_ZSTD_LEVEL))) * scale
            except Exception:
                est[name] = float("inf")
        if min(est.values()) / scale / sample_raw > _FSST_GATE_RATIO:
            try:
                est["strfsst"] = float(len(registry.encode_any(
                    "strfsst+zstd", sample, zstd_level=_TRIAL_ZSTD_LEVEL))) * scale
            except Exception:
                est["strfsst"] = float("inf")
        candidates = [min(est, key=est.get)]
    else:
        candidates = ["strplain", "strdict", "strfsst"]
    best: Choice | None = None
    for name in candidates:
        enc, _, _ = registry.CODECS[name]
        try:
            payload = enc(arr)
        except Exception:
            continue
        best = _consider(best, name, payload, est, zstd_level)
    # raw strplain floor (lengths FoR'd, so floor is data bytes + small slack)
    data, lengths = to_bytes_lengths(arr)
    floor = 4 + 1 + len("strplain") + 1 + 8 + 16 + 18 + len(lengths) * 8 + len(data)
    if best is None or best.enc_bytes > floor:
        payload = registry.CODECS["strplain"][0](arr)
        best = _consider(best, "strplain", payload, est, zstd_level,
                         variants=(True, best is None))
    assert best is not None
    return best


def choose_float(values: np.ndarray, *, zstd_level: int = registry.ZSTD_LEVEL) -> Choice:
    """Pick the cheapest float codec (falp / fbss / fplain).

    Sample trials with the fast-zstd probe rank the candidates; the
    winner is fully encoded. falp is all-or-nothing per chunk (its
    decimal-exactness precondition can hold on the sample but fail on
    the full chunk), so a full-encode ValueError falls through to the
    next-ranked codec. A raw fplain floor caps the result at raw bytes.
    """
    sample = _sample(values)
    scale = len(values) / max(1, len(sample))
    est: dict[str, float] = {}
    trials: list[tuple[float, str]] = []
    for name in ("falp", "fbss", "fplain"):
        enc, _, _ = registry.CODECS[name]
        try:
            p = enc(sample)
        except ValueError:  # falp on non-decimal data
            continue
        z = zstd_compress(p, level=_TRIAL_ZSTD_LEVEL)
        trials.append((len(p) * scale, name))
        trials.append((len(z) * scale, name + "+zstd"))
        est[name + "~trial"] = len(p) * scale
        est[name + "+zstd~trial"] = len(z) * scale
    trials.sort()

    best: Choice | None = None
    tried_bases: list[str] = []
    for _, codec_id in trials:
        base, _ = registry.split_codec_id(codec_id)
        if base in tried_bases:
            continue
        if best is not None and len(tried_bases) >= 1:
            break
        tried_bases.append(base)
        try:
            payload = registry.CODECS[base][0](values)
        except ValueError:
            continue
        best = _consider(best, base, payload, est, zstd_level)

    # fplain floor, both variants: guarantees the match-or-beat-
    # parquet-zstd contract unconditionally (floats are not in the
    # freeze hot path, so the extra raw-bytes zstd pass is cheap
    # relative to the guarantee it buys)
    if "fplain" not in tried_bases:
        payload = registry.CODECS["fplain"][0](values)
        best = _consider(best, "fplain", payload, est, zstd_level)
    assert best is not None
    return best
