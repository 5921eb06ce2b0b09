"""Integer-array codecs: plain, bitpack, frame-of-reference, delta, RLE, dict.

Each codec exposes ``encode(values: np.ndarray) -> bytes`` and
``decode(buf) -> np.ndarray`` with exact dtype round-trip. Payloads are
self-contained (carry dtype + length); the codec *name* lives one level
up in the registry frame (registry.py), mirroring the reference's
one-logical-column -> N-physical-representations idea
(/root/reference/crates/freeze/src/types/schemas.rs:75-94) where the
representation menu is carried as configuration next to the data.

All kernels are vectorized numpy — no per-row Python (BASELINE.json:input_hint).
"""

from __future__ import annotations

import struct

import numpy as np

from .bits import get_blob, pack_bits, put_blob, storage_width, unpack_bits, unzigzag, zigzag

_HDR = struct.Struct("<BQ")  # dtype code, n
_DTYPES = {0: np.dtype("<i4"), 1: np.dtype("<i8")}
_DTYPE_CODES = {np.dtype("<i4"): 0, np.dtype("<i8"): 1}


def _header(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    dt = np.dtype(values.dtype).newbyteorder("<")
    if dt not in _DTYPE_CODES:
        raise TypeError(f"unsupported integer dtype {values.dtype}; use int32/int64")
    return _HDR.pack(_DTYPE_CODES[dt], len(values)), np.ascontiguousarray(values, dtype=dt)


def _read_header(buf: memoryview) -> tuple[np.dtype, int, int]:
    code, n = _HDR.unpack_from(buf, 0)
    return _DTYPES[code], n, _HDR.size


# ---------------------------------------------------------------------------
# plain — raw little-endian bytes (the always-correct fallback)
# ---------------------------------------------------------------------------

def encode_plain(values: np.ndarray) -> bytes:
    hdr, v = _header(values)
    return hdr + v.tobytes()


def decode_plain(buf: memoryview) -> np.ndarray:
    dt, n, pos = _read_header(buf)
    return np.frombuffer(buf, dtype=dt, count=n, offset=pos).copy()


# ---------------------------------------------------------------------------
# bitpack — fixed-width packing of non-negative values
# ---------------------------------------------------------------------------

def encode_bitpack(values: np.ndarray) -> bytes:
    hdr, v = _header(values)
    if len(v) and int(v.min()) < 0:
        raise ValueError("bitpack requires non-negative values (use 'for' or 'delta')")
    width = storage_width(int(v.max())) if len(v) else 0
    return hdr + struct.pack("<B", width) + pack_bits(v, width)


def decode_bitpack(buf: memoryview) -> np.ndarray:
    dt, n, pos = _read_header(buf)
    (width,) = struct.unpack_from("<B", buf, pos)
    return unpack_bits(buf[pos + 1 :], n, width).astype(dt)


# ---------------------------------------------------------------------------
# for — frame of reference: base (min) + bit-packed deltas
# ---------------------------------------------------------------------------

def encode_for(values: np.ndarray) -> bytes:
    hdr, v = _header(values)
    base = int(v.min()) if len(v) else 0
    # delta in uint64: v - base in int64 wraps when the spread exceeds
    # int64 (e.g. [-5422, 9e18]), silently packing at too small a width;
    # the true spread of two int64s always fits uint64, so mod-2^64
    # subtraction against the two's-complement base is exact
    u = v.astype(np.int64, copy=False).view(np.uint64)
    deltas = u - np.uint64(base & 0xFFFFFFFFFFFFFFFF)
    width = storage_width(int(deltas.max())) if len(v) else 0
    return hdr + struct.pack("<qB", base, width) + pack_bits(deltas, width)


def decode_for(buf: memoryview) -> np.ndarray:
    dt, n, pos = _read_header(buf)
    base, width = struct.unpack_from("<qB", buf, pos)
    deltas = unpack_bits(buf[pos + 9 :], n, width).astype(np.int64)
    return (deltas + base).astype(dt)


# ---------------------------------------------------------------------------
# delta — first value + zigzag(diff) bit-packed (wins on ramps / sorted data)
# ---------------------------------------------------------------------------

def encode_delta(values: np.ndarray) -> bytes:
    hdr, v = _header(values)
    first = int(v[0]) if len(v) else 0
    diffs = np.diff(v.astype(np.int64))
    zz = zigzag(diffs)
    width = storage_width(int(zz.max())) if len(zz) else 0
    return hdr + struct.pack("<qB", first, width) + pack_bits(zz, width)


def decode_delta(buf: memoryview) -> np.ndarray:
    dt, n, pos = _read_header(buf)
    first, width = struct.unpack_from("<qB", buf, pos)
    if n == 0:
        return np.empty(0, dtype=dt)
    zz = unpack_bits(buf[pos + 9 :], n - 1, width)
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    np.cumsum(unzigzag(zz), out=out[1:])
    out[1:] += first
    return out.astype(dt)


# ---------------------------------------------------------------------------
# dod — delta-of-delta: first value + first delta + zigzag(second diffs)
# bit-packed. Wins on near-regularly spaced ramps — timestamps of an
# event stream, auto-increment ids with gaps — where the first-order
# deltas are large but nearly constant, so the SECOND differences are
# tiny (Gorilla's timestamp idea, VLDB 2015; made vectorizable by
# fixed-width packing instead of Gorilla's per-value varint).
# All arithmetic wraps mod 2^64 consistently on both sides, so the
# round trip is exact for the full int64 range.
# ---------------------------------------------------------------------------

def encode_dod(values: np.ndarray) -> bytes:
    hdr, v = _header(values)
    v64 = v.astype(np.int64, copy=False)
    first = int(v64[0]) if len(v64) else 0
    diffs = np.diff(v64)
    first_d = int(diffs[0]) if len(diffs) else 0
    dd = np.diff(diffs)
    zz = zigzag(dd)
    width = storage_width(int(zz.max())) if len(zz) else 0
    return hdr + struct.pack("<qqB", first, first_d, width) + pack_bits(zz, width)


def decode_dod(buf: memoryview) -> np.ndarray:
    dt, n, pos = _read_header(buf)
    first, first_d, width = struct.unpack_from("<qqB", buf, pos)
    if n == 0:
        return np.empty(0, dtype=dt)
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    if n > 1:
        zz = unpack_bits(buf[pos + 17 :], n - 2, width)
        diffs = np.empty(n - 1, dtype=np.int64)
        diffs[0] = first_d
        np.cumsum(unzigzag(zz), out=diffs[1:])
        diffs[1:] += first_d
        np.cumsum(diffs, out=out[1:])
        out[1:] += first
    return out.astype(dt)


# ---------------------------------------------------------------------------
# rle — run-length encoding; run values and run lengths nested as FoR blobs
# ---------------------------------------------------------------------------

def encode_rle(values: np.ndarray) -> bytes:
    hdr, v = _header(values)
    if len(v):
        boundaries = np.flatnonzero(np.diff(v)) + 1
        starts = np.concatenate(([0], boundaries))
        run_values = v[starts]
        run_lengths = np.diff(np.concatenate((starts, [len(v)]))).astype(np.int64)
    else:
        run_values = v[:0]
        run_lengths = np.empty(0, dtype=np.int64)
    parts: list[bytes] = [hdr]
    put_blob(parts, encode_for(run_values))
    put_blob(parts, encode_for(run_lengths))
    return b"".join(parts)


def decode_rle(buf: memoryview) -> np.ndarray:
    dt, n, pos = _read_header(buf)
    vals_blob, pos = get_blob(buf, pos)
    lens_blob, pos = get_blob(buf, pos)
    run_values = decode_for(vals_blob)
    run_lengths = decode_for(lens_blob)
    return np.repeat(run_values, run_lengths).astype(dt, copy=False)


# ---------------------------------------------------------------------------
# dict — sorted unique symbol table (FoR-packed: sorted => small deltas)
#        + bit-packed codes
# ---------------------------------------------------------------------------

def encode_dict(values: np.ndarray) -> bytes:
    hdr, v = _header(values)
    table, codes = np.unique(v, return_inverse=True)
    parts: list[bytes] = [hdr]
    put_blob(parts, encode_for(table.astype(np.int64)))
    put_blob(parts, encode_bitpack(codes.astype(np.int64)))
    return b"".join(parts)


def decode_dict(buf: memoryview) -> np.ndarray:
    dt, n, pos = _read_header(buf)
    table_blob, pos = get_blob(buf, pos)
    codes_blob, pos = get_blob(buf, pos)
    table = decode_for(table_blob)
    codes = decode_bitpack(codes_blob)
    return table[codes].astype(dt, copy=False)


# ---------------------------------------------------------------------------
# dictf — frequency-ordered dictionary: the hottest value gets code 0, so a
# Zipfian stream maps to mostly-tiny codes whose high byte planes are ~all
# zero; with the byte-split layout the zstd stage then reaches near-entropy.
# Tie-break by value => fully deterministic.
# ---------------------------------------------------------------------------

def encode_dictf(values: np.ndarray) -> bytes:
    hdr, v = _header(values)
    table, codes, counts = np.unique(v, return_inverse=True, return_counts=True)
    order = np.lexsort((table, -counts))
    rank_of = np.empty(len(table), dtype=np.int64)
    rank_of[order] = np.arange(len(table))
    parts: list[bytes] = [hdr]
    put_blob(parts, encode_plain(table[order]))
    put_blob(parts, encode_bitpack(rank_of[codes]))
    return b"".join(parts)


def decode_dictf(buf: memoryview) -> np.ndarray:
    dt, n, pos = _read_header(buf)
    table_blob, pos = get_blob(buf, pos)
    codes_blob, pos = get_blob(buf, pos)
    table = decode_plain(table_blob)
    codes = decode_bitpack(codes_blob)
    return table[codes].astype(dt, copy=False)
