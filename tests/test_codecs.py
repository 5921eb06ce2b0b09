"""Codec round-trip unit tests (no Spark) — FIXTURES.md §2.

Mirrors the reference's per-type column-creation tests
(/root/reference/crates/freeze/src/types/dataframes/creation.rs:166-348):
every codec × every edge case must satisfy decode(encode(x)) == x
elementwise and dtype-exact, and encode must be deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from cryo_spark.codecs import (
    INT_CODECS,
    STR_CODECS,
    choose_int,
    choose_str,
    decode_any,
    encode_any,
)

RNG = np.random.default_rng(42)

INT_CASES = {
    "empty": np.array([], dtype=np.int32),
    "singleton": np.array([7], dtype=np.int32),
    "constant": np.full(1000, 5, dtype=np.int32),
    "ramp": np.arange(10_000, dtype=np.int32),
    "ramp_desc": np.arange(10_000, dtype=np.int32)[::-1].copy(),
    "extremes": np.array([0, 1, 2**31 - 1, 0], dtype=np.int32),
    "zipf": (RNG.zipf(1.2, 10_000) % 50_257).astype(np.int32),
    "negatives": np.array([-5, 0, 7, -(2**31), 2**31 - 1], dtype=np.int32),
    "int64": np.array([0, 2**40, -(2**40), 1], dtype=np.int64),
    "tiny_vocab": (RNG.integers(0, 16, 5000)).astype(np.int32),
    "uniform_random": RNG.integers(0, 2**31 - 1, 5000).astype(np.int32),
}

STR_CASES = {
    "empty": [],
    "single": ["hello"],
    "empty_strings": ["", "", ""],
    "source_vocab": ["web", "code", "books", "wiki", "chat"] * 200,
    "doc_ids": [f"doc-{i:012d}" for i in range(1000)],
    "mixed_len": ["x" * (i % 64) for i in range(500)],
    "unicode": ["héllo", "wörld", "日本語", "emoji 🎉", ""],
    "random_ascii": [
        "".join(chr(c) for c in RNG.integers(32, 127, RNG.integers(1, 64)))
        for _ in range(1000)
    ],
}

NEEDS_NONNEG = {"bitpack"}


@pytest.mark.parametrize("codec", INT_CODECS)
@pytest.mark.parametrize("case", list(INT_CASES))
def test_int_roundtrip(codec, case):
    values = INT_CASES[case]
    if codec in NEEDS_NONNEG and len(values) and values.min() < 0:
        with pytest.raises(ValueError):
            encode_any(codec, values)
        return
    for codec_id in (codec, codec + "+zstd"):
        blob = encode_any(codec_id, values)
        out = decode_any(blob)
        assert out.dtype == values.dtype, f"{codec_id}/{case}: dtype mismatch"
        np.testing.assert_array_equal(out, values, err_msg=f"{codec_id}/{case}")
        # determinism: byte-identical re-encode
        assert encode_any(codec_id, values) == blob


@pytest.mark.parametrize("codec", STR_CODECS)
@pytest.mark.parametrize("case", list(STR_CASES))
def test_str_roundtrip(codec, case):
    values = STR_CASES[case]
    for codec_id in (codec, codec + "+zstd"):
        blob = encode_any(codec_id, values)
        out = decode_any(blob)
        assert isinstance(out, pa.Array)
        assert out.to_pylist() == values, f"{codec_id}/{case}"
        assert encode_any(codec_id, values) == blob


@pytest.mark.parametrize("case", list(INT_CASES))
def test_selector_int(case):
    values = INT_CASES[case]
    choice = choose_int(values)
    out = decode_any(choice.payload)
    np.testing.assert_array_equal(out, values)
    assert choice.enc_bytes == len(choice.payload)
    # floor: never worse than plain+zstd
    floor = len(encode_any("plain+zstd", values))
    assert choice.enc_bytes <= floor


@pytest.mark.parametrize("case", list(STR_CASES))
def test_selector_str(case):
    values = STR_CASES[case]
    choice = choose_str(values)
    out = decode_any(choice.payload)
    assert out.to_pylist() == values
    floor = len(encode_any("strplain+zstd", values))
    assert choice.enc_bytes <= floor


def test_selector_picks_sensibly():
    constant = np.full(100_000, 42, dtype=np.int32)
    const_choice = choose_int(constant)
    assert const_choice.codec_id.startswith(("rle", "for", "dict", "delta"))
    assert const_choice.enc_bytes < 200  # ~0 bits/value either way
    ramp = np.arange(100_000, dtype=np.int32)
    assert choose_int(ramp).codec_id.startswith(("delta", "rle"))
    sources = pa.array(["web"] * 60_000 + ["code"] * 20_000, type=pa.string())
    assert choose_str(sources).codec_id.startswith(("strdict", "strplain"))


def test_compression_wins():
    """Sanity: codecs actually compress their best cases."""
    zipf = INT_CASES["zipf"]
    assert choose_int(zipf).enc_bytes < zipf.nbytes / 1.5
    constant = INT_CASES["constant"]
    assert choose_int(constant).enc_bytes < 100
    doc_ids = STR_CASES["doc_ids"]
    raw = sum(len(s) for s in doc_ids)
    assert choose_str(doc_ids).enc_bytes < raw / 2


def test_fsst_compresses_shared_prefixes():
    values = [f"doc-{i:012d}" for i in range(5000)]
    blob = encode_any("strfsst", values)
    raw = sum(len(s) for s in values)
    assert len(blob) < raw  # learned symbols beat raw utf8
    assert decode_any(blob).to_pylist() == values
