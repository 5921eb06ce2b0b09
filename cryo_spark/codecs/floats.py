"""Float-array codecs: plain, byte-stream-split, ALP-style decimal scaling.

Extends the lightweight-compression menu to float32/float64 columns
(embedding vectors in a training-data pipeline). Same contract as
ints.py: ``encode(values: np.ndarray) -> bytes`` / ``decode(buf) ->
np.ndarray`` with *bit-identical* round-trip (NaN payloads, ±0.0 and
infinities preserved exactly — equality is checked on the raw bit
pattern, never with float ==).

- ``fbss`` — byte-stream-split: the k-th byte of every value is grouped
  into one plane, so the exponent/sign bytes (near-constant across an
  embedding column) land together and the zstd stage sees long runs.
  Same idea as Parquet's BYTE_STREAM_SPLIT encoding; plane packing
  mirrors the int byte-plane trick in ints.encode_dictf.
- ``falp`` — ALP-style (Afroozeh & Boncz, "ALP: Adaptive Lossless
  floating-Point Compression", SIGMOD'23) single-exponent variant:
  when every value in the chunk is exactly a decimal with <= _MAX_EXP
  places (quantized embeddings, prices, rounded scores), store
  round(v * 10^e) as integers through the existing frame-of-reference
  int codec. All-or-nothing per chunk — no exception list; chunks that
  don't qualify raise ValueError and the selector falls back.

All kernels are vectorized numpy — no per-row Python (BASELINE.json:input_hint).
"""

from __future__ import annotations

import struct

import numpy as np

from . import ints

_HDR = struct.Struct("<BQ")  # dtype code, n
_DTYPES = {0: np.dtype("<f4"), 1: np.dtype("<f8")}
_DTYPE_CODES = {np.dtype("<f4"): 0, np.dtype("<f8"): 1}
_BITS_OF = {np.dtype("<f4"): np.dtype("<u4"), np.dtype("<f8"): np.dtype("<u8")}


def _header(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    dt = np.dtype(values.dtype).newbyteorder("<")
    if dt not in _DTYPE_CODES:
        raise TypeError(f"unsupported float dtype {values.dtype}; use float32/float64")
    return _HDR.pack(_DTYPE_CODES[dt], len(values)), np.ascontiguousarray(values, dtype=dt)


def _read_header(buf: memoryview) -> tuple[np.dtype, int, int]:
    code, n = _HDR.unpack_from(buf, 0)
    return _DTYPES[code], n, _HDR.size


# ---------------------------------------------------------------------------
# fplain — raw little-endian bytes (the always-correct fallback)
# ---------------------------------------------------------------------------

def encode_fplain(values: np.ndarray) -> bytes:
    hdr, v = _header(values)
    return hdr + v.tobytes()


def decode_fplain(buf: memoryview) -> np.ndarray:
    dt, n, pos = _read_header(buf)
    return np.frombuffer(buf, dtype=dt, count=n, offset=pos).copy()


# ---------------------------------------------------------------------------
# fbss — byte-stream-split planes
# ---------------------------------------------------------------------------

def encode_fbss(values: np.ndarray) -> bytes:
    hdr, v = _header(values)
    planes = v.view(np.uint8).reshape(len(v), v.dtype.itemsize).T
    return hdr + np.ascontiguousarray(planes).tobytes()


def decode_fbss(buf: memoryview) -> np.ndarray:
    dt, n, pos = _read_header(buf)
    planes = np.frombuffer(buf, dtype=np.uint8, count=n * dt.itemsize, offset=pos)
    return np.ascontiguousarray(planes.reshape(dt.itemsize, n).T).reshape(-1).view(dt)


# ---------------------------------------------------------------------------
# falp — decimal-scaled integers through the FoR int codec
# ---------------------------------------------------------------------------

_MAX_EXP = 14  # 10^14 < 2^53: scaled magnitudes stay exactly representable
# scaled magnitude cap: conversion to int64 and the float64 round-trip
# multiply must both be exact
_MAX_SCALED = float(1 << 53)


def _find_exponent(v: np.ndarray) -> tuple[int, np.ndarray] | None:
    """Smallest e with round(v*10^e)/10^e bit-identical to v, or None."""
    if not len(v):
        return 0, np.zeros(0, dtype=np.int64)
    bits_dt = _BITS_OF[v.dtype]
    vbits = v.view(bits_dt)
    v64 = v.astype(np.float64)
    if not np.isfinite(v64).all():
        return None
    for e in range(_MAX_EXP + 1):
        scaled = np.round(v64 * (10.0 ** e))
        if np.abs(scaled).max(initial=0.0) >= _MAX_SCALED:
            return None
        ints64 = scaled.astype(np.int64)
        recon = (ints64 / (10.0 ** e)).astype(v.dtype)
        if (recon.view(bits_dt) == vbits).all():
            return e, ints64
    return None


def encode_falp(values: np.ndarray) -> bytes:
    hdr, v = _header(values)
    found = _find_exponent(v)
    if found is None:
        raise ValueError("falp: chunk is not exactly decimal-scaled (use fbss/fplain)")
    e, ints64 = found
    return hdr + struct.pack("<B", e) + ints.encode_for(ints64)


def decode_falp(buf: memoryview) -> np.ndarray:
    dt, n, pos = _read_header(buf)
    (e,) = struct.unpack_from("<B", buf, pos)
    ints64 = ints.decode_for(memoryview(buf)[pos + 1 :])
    return (ints64 / (10.0 ** e)).astype(dt)
