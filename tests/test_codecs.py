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
    FLT_CODECS,
    INT_CODECS,
    STR_CODECS,
    choose_float,
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
    assert const_choice.codec_id.startswith(("rle", "for", "dict", "delta",
                                             "dod"))
    assert const_choice.enc_bytes < 200  # ~0 bits/value either way
    ramp = np.arange(100_000, dtype=np.int32)
    # a ramp's second differences are all zero — dod packs it to ~nothing
    assert choose_int(ramp).codec_id.startswith(("delta", "rle", "dod"))
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


# ---------------------------------------------------------------------------
# float codecs (embedding columns)
# ---------------------------------------------------------------------------

FLT_CASES = {
    "empty": np.array([], dtype=np.float32),
    "singleton": np.array([3.25], dtype=np.float32),
    "constant": np.full(1000, 0.5, dtype=np.float32),
    "uniform": RNG.random(10_000).astype(np.float32),
    "gaussian_f64": RNG.normal(0, 1, 5000),
    "decimal3": np.round(RNG.random(10_000), 3).astype(np.float32),
    "decimal2_f64": np.round(RNG.normal(0, 100, 5000), 2),
    "specials": np.array(
        [0.0, -0.0, np.inf, -np.inf, np.nan, 1e-38, -1e38], dtype=np.float32
    ),
    "nan_payloads": np.array([0x7FC00001, 0x7FC0BEEF, 0xFFC00001], dtype=np.uint32)
    .view(np.float32)
    .copy(),
    "denormals": np.array([1e-42, -1e-42, 5e-324], dtype=np.float64).astype(np.float32),
}

# falp requires a decimal scaling that round-trips bit-exactly. For
# float32 that holds for ANY finite chunk with |v| < 2^53/10^14 ~ 90
# (14 decimal places out-resolve an f4 ULP), so "uniform" qualifies;
# float64 noise, non-finite values and sub-1e-14 denormals do not.
_FALP_OK = {"empty", "singleton", "constant", "uniform", "decimal3", "decimal2_f64"}


def _bits(a: np.ndarray) -> np.ndarray:
    return a.view(np.uint32 if a.dtype == np.float32 else np.uint64)


@pytest.mark.parametrize("codec", FLT_CODECS)
@pytest.mark.parametrize("case", list(FLT_CASES))
def test_float_roundtrip_bit_identical(codec, case):
    values = FLT_CASES[case]
    if codec == "falp" and case not in _FALP_OK:
        with pytest.raises(ValueError):
            encode_any(codec, values)
        return
    for codec_id in (codec, codec + "+zstd"):
        blob = encode_any(codec_id, values)
        out = decode_any(blob)
        assert out.dtype == values.dtype, f"{codec_id}/{case}: dtype mismatch"
        np.testing.assert_array_equal(
            _bits(out), _bits(values), err_msg=f"{codec_id}/{case}: bits differ"
        )
        assert encode_any(codec_id, values) == blob


@pytest.mark.parametrize("case", list(FLT_CASES))
def test_selector_float(case):
    values = FLT_CASES[case]
    choice = choose_float(values)
    out = decode_any(choice.payload)
    np.testing.assert_array_equal(_bits(out), _bits(values))
    assert choice.enc_bytes == len(choice.payload)
    # floor: never worse than fplain+zstd (the parquet-zstd analog)
    assert choice.enc_bytes <= len(encode_any("fplain+zstd", values))


def test_float_selector_picks_sensibly():
    # decimal-quantized embeddings: falp's scaled ints crush raw floats
    dec = np.round(RNG.random(100_000), 3).astype(np.float32)
    choice = choose_float(dec)
    assert choice.codec_id.startswith("falp")
    assert choice.enc_bytes < dec.nbytes / 2
    # full-precision floats: byte-stream-split + zstd still beats raw zstd
    # (exponent/sign planes are near-constant)
    smooth = np.sin(np.arange(100_000) / 1000).astype(np.float32)
    c2 = choose_float(smooth)
    assert c2.enc_bytes <= len(encode_any("fplain+zstd", smooth))


def test_falp_sample_pass_full_fail_falls_back():
    # the sample stride (every 2nd value) sees only decimal values; the
    # denormal straggler at an odd index makes falp invalid on the full
    # chunk — the selector must fall back to fbss/fplain, not raise
    v = np.round(RNG.random(65_536), 3).astype(np.float32)
    v[-1] = np.float32(1e-42)
    assert _bits(v[-1:]).item() != 0  # really a denormal, not flushed to 0
    with pytest.raises(ValueError):
        encode_any("falp", v)
    choice = choose_float(v)
    assert not choice.codec_id.startswith("falp")
    out = decode_any(choice.payload)
    np.testing.assert_array_equal(_bits(out), _bits(v))
