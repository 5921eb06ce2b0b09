"""Vectorized lightweight-compression codecs (numpy/pyarrow kernels).

Public surface:
- ``encode_any(codec_id, values)`` / ``decode_any(blob)`` — self-describing frames
- ``choose_int(values)`` / ``choose_str(values)`` — per-chunk auto-selection
- ``CODECS`` / ``INT_CODECS`` / ``STR_CODECS`` — the codec menu
"""

from .registry import (
    CODECS,
    FLT_CODECS,
    INT_CODECS,
    STR_CODECS,
    FLT_KIND,
    INT_KIND,
    STR_KIND,
    ZSTD_LEVEL,
    decode_any,
    encode_any,
    raw_size,
    split_codec_id,
)
from .selector import Choice, choose_float, choose_int, choose_str

__all__ = [
    "CODECS",
    "FLT_CODECS",
    "INT_CODECS",
    "STR_CODECS",
    "FLT_KIND",
    "INT_KIND",
    "STR_KIND",
    "ZSTD_LEVEL",
    "Choice",
    "choose_float",
    "choose_int",
    "choose_str",
    "decode_any",
    "encode_any",
    "raw_size",
    "split_codec_id",
]
