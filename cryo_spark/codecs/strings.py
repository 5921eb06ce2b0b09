"""String-array codecs: strplain, strdict, strfsst.

Strings are handled in the Arrow layout — (concatenated utf8 bytes,
per-string lengths) — via pyarrow buffer access, so every kernel stays
vectorized C/C++ with no per-row Python (BASELINE.json:input_hint).
strdict mirrors the int dict codec (low-cardinality columns like
``source``); strfsst wins on shared-structure ids like ``doc_id``.

Encoders accept any list-like of str (list, numpy object array, pandas
Series, pyarrow Array); decoders return a ``pyarrow.StringArray``.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from . import fsst, ints
from .bits import get_blob, put_blob


def _as_arrow(values) -> pa.Array:
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        # binary arrays share the string layout (offsets + data buffer)
        # and every kernel here reads only those buffers — accept them
        # natively so opaque payloads (media bytes) reuse the codecs;
        # decoders still emit StringArray, the engine re-types zero-copy
        if values.type in (pa.string(), pa.binary()):
            arr = values
        else:
            arr = values.cast(pa.string())
    else:
        arr = pa.array(values, type=pa.string())
    if arr.null_count:
        raise ValueError("null strings not supported in string codecs")
    return arr


def to_bytes_lengths(values) -> tuple[np.ndarray, np.ndarray]:
    """list-like of str -> (uint8 data, int64 lengths), zero-copy from Arrow."""
    arr = _as_arrow(values)
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    off = arr.offset
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[off : off + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
    lengths = np.diff(offsets).astype(np.int64)
    return data, lengths


def from_bytes_lengths(data: np.ndarray, lengths: np.ndarray) -> pa.Array:
    """(uint8 data, lengths) -> pyarrow StringArray (vectorized build)."""
    offsets = np.zeros(len(lengths) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    return pa.StringArray.from_buffers(
        len(lengths),
        pa.py_buffer(offsets.tobytes()),
        pa.py_buffer(np.ascontiguousarray(data).tobytes()),
    )


# ---------------------------------------------------------------------------
# strplain — lengths (FoR) + raw utf8 bytes
# ---------------------------------------------------------------------------

def encode_strplain(values) -> bytes:
    data, lengths = to_bytes_lengths(values)
    parts: list[bytes] = [struct.pack("<Q", len(lengths))]
    put_blob(parts, ints.encode_for(lengths))
    put_blob(parts, data.tobytes())
    return b"".join(parts)


def decode_strplain(buf: memoryview) -> pa.Array:
    (n,) = struct.unpack_from("<Q", buf, 0)
    lens_blob, pos = get_blob(buf, 8)
    data_blob, pos = get_blob(buf, pos)
    lengths = ints.decode_for(lens_blob)
    return from_bytes_lengths(np.frombuffer(data_blob, dtype=np.uint8), lengths)


# ---------------------------------------------------------------------------
# strdict — dictionary-encode (Arrow) + bit-packed codes; table via strplain
# ---------------------------------------------------------------------------

def encode_strdict(values) -> bytes:
    arr = _as_arrow(values)
    de = arr.dictionary_encode()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    parts: list[bytes] = []
    put_blob(parts, encode_strplain(de.dictionary))
    put_blob(parts, ints.encode_bitpack(codes))
    return b"".join(parts)


def decode_strdict(buf: memoryview) -> pa.Array:
    table_blob, pos = get_blob(buf, 0)
    codes_blob, pos = get_blob(buf, pos)
    table = decode_strplain(table_blob)
    codes = ints.decode_bitpack(codes_blob)
    return table.take(pa.array(codes))


# ---------------------------------------------------------------------------
# strfsst — FSST symbol-table compression over the byte stream
# ---------------------------------------------------------------------------

def encode_strfsst(values) -> bytes:
    data, lengths = to_bytes_lengths(values)
    return fsst.encode(data, lengths)


def decode_strfsst(buf: memoryview) -> pa.Array:
    data, lengths = fsst.decode(buf)
    return from_bytes_lengths(data, lengths)
