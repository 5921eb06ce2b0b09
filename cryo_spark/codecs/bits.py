"""Low-level vectorized bit-packing and framing primitives.

All kernels are pure numpy — no per-row Python. These are the shared
building blocks of every codec (cf. the reference's fixed-width packing
idiom for wide ints, /root/reference/crates/freeze/src/types/conversions.rs:21-47,
generalized here to arbitrary bit widths).

Framing convention: variable-size sub-blobs are length-prefixed with a
little-endian u64 so codecs can nest each other (e.g. RLE nests a
frame-of-reference blob for run values).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

U64 = struct.Struct("<Q")


# ---------------------------------------------------------------------------
# bit packing
# ---------------------------------------------------------------------------

def bit_width(max_value: int) -> int:
    """Bits needed to represent ``max_value`` (non-negative)."""
    if max_value < 0:
        raise ValueError("bit_width requires a non-negative value")
    return int(max_value).bit_length()


def storage_width(max_value: int) -> int:
    """Width actually used to pack values with max ``max_value``.

    Sub-byte widths (<= 8) are packed exactly — the dense path for tiny
    vocab / run lengths. Wider values are rounded up to the next byte
    multiple: byte-aligned lanes are ~100x faster to (un)pack (pure
    astype views) and give the downstream zstd stage byte-structured
    input it can actually model — the same trade Parquet makes with its
    PLAIN + codec path.
    """
    w = bit_width(max_value)
    return w if w <= 8 else (w + 7) // 8 * 8


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative integers into a dense little-endian layout.

    Each value must fit in ``width`` bits; width == 0 packs to b"".
    Sub-byte widths pack an exact bitstream. Byte-multiple widths store
    byte planes plane-major (byte-stream split): plane k holds byte k of
    every value. Equally dense, (un)packable with pure views/copies, and
    far friendlier to the downstream zstd stage — each plane is a
    low-entropy stream (high planes of small values are almost all zero).
    """
    n = len(values)
    if n == 0 or width == 0:
        return b""
    if width % 8 == 0:
        nbytes = width // 8
        if width <= 32:
            # 4-byte lanes: values fitting 32 bits stay in a uint32
            # temp — half the memory traffic of the generic path (the
            # dominant case: token ids and FoR deltas are < 2^32).
            # (A uint16 temp for width<=16 measured SLOWER: the extra
            # astype conversion pass costs more than the narrower
            # gather saves on this memory bus.)
            v = values.astype(np.uint32, copy=False) if values.dtype != np.uint32 \
                else values
            v = np.ascontiguousarray(v)
            lanes = v.view(np.uint8).reshape(n, 4)[:, :nbytes]
        else:
            v = np.ascontiguousarray(values, dtype=np.uint64)
            lanes = v.view(np.uint8).reshape(n, 8)[:, :nbytes]
        return np.ascontiguousarray(lanes.T).tobytes()  # plane-major
    v = np.ascontiguousarray(values, dtype=np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_bits(buf: bytes | memoryview, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns an unsigned ndarray of length n
    (uint32 for byte-aligned widths <= 32, else uint64)."""
    if n == 0 or width == 0:
        return np.zeros(n, dtype=np.uint64)
    if width % 8 == 0:
        nbytes = width // 8
        planes = np.frombuffer(buf, dtype=np.uint8, count=n * nbytes).reshape(nbytes, n)
        if width <= 32:
            lanes = np.zeros((n, 4), dtype=np.uint8)
            lanes[:, :nbytes] = planes.T
            return lanes.reshape(-1).view(np.uint32)
        lanes = np.zeros((n, 8), dtype=np.uint8)
        lanes[:, :nbytes] = planes.T
        return lanes.reshape(-1).view(np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    bits = np.unpackbits(raw, count=n * width, bitorder="little")
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)


# ---------------------------------------------------------------------------
# zigzag (signed -> unsigned, order-preserving around zero)
# ---------------------------------------------------------------------------

def zigzag(values: np.ndarray) -> np.ndarray:
    v = values.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def unzigzag(values: np.ndarray) -> np.ndarray:
    v = values.astype(np.uint64, copy=False)
    return ((v >> np.uint64(1)).astype(np.int64)) ^ -(v & np.uint64(1)).astype(np.int64)


# ---------------------------------------------------------------------------
# framing helpers
# ---------------------------------------------------------------------------

def put_blob(parts: list[bytes], blob: bytes) -> None:
    parts.append(U64.pack(len(blob)))
    parts.append(blob)


def get_blob(buf: memoryview, pos: int) -> tuple[memoryview, int]:
    (size,) = U64.unpack_from(buf, pos)
    pos += U64.size
    return buf[pos : pos + size], pos + size


# ---------------------------------------------------------------------------
# zstd (general-purpose entropy stage, via pyarrow's bundled zstd)
# ---------------------------------------------------------------------------

_ZSTD_CACHE: dict[int, pa.Codec] = {}


def _zstd(level: int) -> pa.Codec:
    codec = _ZSTD_CACHE.get(level)
    if codec is None:
        codec = pa.Codec("zstd", compression_level=level)
        _ZSTD_CACHE[level] = codec
    return codec


def zstd_compress(buf: bytes, level: int = 3) -> bytes:
    return U64.pack(len(buf)) + _zstd(level).compress(buf, asbytes=True)


def zstd_decompress(buf: bytes | memoryview) -> bytes:
    (size,) = U64.unpack_from(buf, 0)
    if size == 0:
        return b""
    return _zstd(3).decompress(bytes(buf[U64.size :]), decompressed_size=size, asbytes=True)
