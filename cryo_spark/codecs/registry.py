"""Codec registry: self-describing encoded blobs + optional zstd stage.

Frame layout: magic 'CSK1' | u8 name_len | name utf8 | u8 zstd_flag |
payload (zstd-wrapped when flag set). The codec *name* travels with the
data, so a decoder needs no side channel — the manifest's codec_id is
informational/lineage (FIXTURES.md §3), mirroring how the reference
names its representation per physical column suffix
(/root/reference/crates/freeze/src/types/schemas.rs:114-130).

A codec id may carry the suffix ``+zstd`` (e.g. ``bitpack+zstd``): the
inner payload is further compressed with zstd — the cascade that lets
the selector always match-or-beat plain parquet+zstd.
"""

from __future__ import annotations

import struct

import numpy as np

from . import floats, ints, strings
from .bits import zstd_compress, zstd_decompress

_MAGIC = b"CSK1"

INT_KIND = "int"
STR_KIND = "str"
FLT_KIND = "float"

# name -> (encode, decode, kind)
CODECS = {
    "plain": (ints.encode_plain, ints.decode_plain, INT_KIND),
    "bitpack": (ints.encode_bitpack, ints.decode_bitpack, INT_KIND),
    "for": (ints.encode_for, ints.decode_for, INT_KIND),
    "delta": (ints.encode_delta, ints.decode_delta, INT_KIND),
    "dod": (ints.encode_dod, ints.decode_dod, INT_KIND),
    "rle": (ints.encode_rle, ints.decode_rle, INT_KIND),
    "dict": (ints.encode_dict, ints.decode_dict, INT_KIND),
    "dictf": (ints.encode_dictf, ints.decode_dictf, INT_KIND),
    "strplain": (strings.encode_strplain, strings.decode_strplain, STR_KIND),
    "strdict": (strings.encode_strdict, strings.decode_strdict, STR_KIND),
    "strfsst": (strings.encode_strfsst, strings.decode_strfsst, STR_KIND),
    "fplain": (floats.encode_fplain, floats.decode_fplain, FLT_KIND),
    "fbss": (floats.encode_fbss, floats.decode_fbss, FLT_KIND),
    "falp": (floats.encode_falp, floats.decode_falp, FLT_KIND),
}

INT_CODECS = [n for n, (_, _, k) in CODECS.items() if k == INT_KIND]
STR_CODECS = [n for n, (_, _, k) in CODECS.items() if k == STR_KIND]
FLT_CODECS = [n for n, (_, _, k) in CODECS.items() if k == FLT_KIND]

# Entropy-stage level. Measured on the bench token distributions: the
# byte-plane payloads our codecs emit compress as well (often slightly
# better) at level 1 as at level 6, at ~2x the speed — the planes are
# already structure-exposed, so deeper match search buys nothing.
ZSTD_LEVEL = 1


def split_codec_id(codec_id: str) -> tuple[str, bool]:
    if codec_id.endswith("+zstd"):
        return codec_id[: -len("+zstd")], True
    return codec_id, False


def frame(codec_id: str, payload: bytes, *, zstd_level: int = ZSTD_LEVEL) -> bytes:
    """Wrap a raw codec payload into a self-describing frame.

    ``payload`` is the *uncompressed* codec output; when codec_id carries
    ``+zstd`` the entropy stage is applied here, so a selector can reuse
    one base encode for both variants.
    """
    _, use_zstd = split_codec_id(codec_id)
    if use_zstd:
        payload = zstd_compress(payload, level=zstd_level)
    name = codec_id.encode("ascii")
    return _MAGIC + struct.pack("<B", len(name)) + name + struct.pack("<B", int(use_zstd)) + payload


def encode_any(codec_id: str, values, *, zstd_level: int = ZSTD_LEVEL) -> bytes:
    """Encode values with the named codec into a self-describing frame."""
    base, _ = split_codec_id(codec_id)
    enc, _, _ = CODECS[base]
    return frame(codec_id, enc(values), zstd_level=zstd_level)


def decode_any(buf: bytes | memoryview):
    """Decode a self-describing frame -> ndarray (int) or pyarrow array (str)."""
    buf = memoryview(buf)
    if bytes(buf[:4]) != _MAGIC:
        raise ValueError("bad magic: not a cryo_spark encoded blob")
    (name_len,) = struct.unpack_from("<B", buf, 4)
    codec_id = bytes(buf[5 : 5 + name_len]).decode("ascii")
    pos = 5 + name_len
    (zstd_flag,) = struct.unpack_from("<B", buf, pos)
    payload = buf[pos + 1 :]
    if zstd_flag:
        payload = memoryview(zstd_decompress(payload))
    base, _ = split_codec_id(codec_id)
    _, dec, _ = CODECS[base]
    return dec(payload)


def raw_size(values, kind: str) -> int:
    """Uncompressed byte size of the logical values (for ratio reporting)."""
    if kind in (INT_KIND, FLT_KIND):
        return int(np.asarray(values).nbytes)
    data, lengths = strings.to_bytes_lengths(values)
    return int(data.nbytes + lengths.nbytes // 2)  # utf8 bytes + int32 offsets
