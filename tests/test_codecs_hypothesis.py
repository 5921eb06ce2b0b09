"""Property-based codec fuzzing (hypothesis): every selector round trip
is exact for arbitrary inputs.

The deterministic test matrix in test_codecs.py covers the designed
edge cases; these properties assert the contracts hold for ANY input
the strategies can build — full-range ints (both dtypes), floats
including NaN/inf/-0.0/subnormals compared on raw bit patterns, unicode
strings, and opaque binary payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import example, given, settings, strategies as st

from cryo_spark.codecs import (
    CODECS,
    choose_float,
    choose_int,
    choose_str,
    decode_any,
    encode_any,
)

SET = settings(max_examples=60, deadline=None)


int_arrays = st.sampled_from([np.int32, np.int64]).flatmap(
    lambda dt: st.lists(
        st.integers(
            min_value=int(np.iinfo(dt).min), max_value=int(np.iinfo(dt).max)
        ),
        max_size=300,
    ).map(lambda xs: np.array(xs, dtype=dt))
)


@SET
@given(int_arrays)
# spread > int64: delta/FoR arithmetic must be mod-2^64 exact, and the
# estimator must use zigzag (abs(int64.min) is still negative)
@example(values=np.array([-5422, 9223372036854770386], dtype=np.int64))
@example(values=np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max],
                         dtype=np.int64))
def test_choose_int_roundtrip(values):
    ch = choose_int(values)
    out = decode_any(ch.payload)
    assert out.dtype == values.dtype
    np.testing.assert_array_equal(out, values)
    # never-lose floor: frame overhead is bounded
    assert ch.enc_bytes <= values.nbytes + 64


@SET
@given(int_arrays)
def test_every_int_codec_roundtrips_or_rejects(values):
    for name, (enc, _, kind) in CODECS.items():
        if kind != "int":
            continue
        try:
            blob = encode_any(name, values)
        except (ValueError, OverflowError):
            continue  # e.g. bitpack on negatives: documented rejection
        out = decode_any(blob)
        assert out.dtype == values.dtype, name
        np.testing.assert_array_equal(out, values, err_msg=name)


float_arrays = st.sampled_from([np.float32, np.float64]).flatmap(
    lambda dt: st.lists(
        st.one_of(
            st.floats(width=32 if dt is np.float32 else 64,
                      allow_nan=True, allow_infinity=True),
            st.sampled_from([0.0, -0.0, 1e-40, -1e-40, 3.14159, -2.5]),
        ),
        max_size=300,
    ).map(lambda xs: np.array(xs, dtype=dt))
)


@SET
@given(float_arrays)
def test_choose_float_roundtrip_bitwise(values):
    ch = choose_float(values)
    out = decode_any(ch.payload)
    assert out.dtype == values.dtype
    u = np.uint32 if values.dtype == np.float32 else np.uint64
    np.testing.assert_array_equal(out.view(u), values.view(u))
    assert ch.enc_bytes <= values.nbytes + 64


@SET
@given(st.lists(st.text(max_size=40), max_size=200))
def test_choose_str_roundtrip(strings):
    arr = pa.array(strings, type=pa.string())
    ch = choose_str(arr)
    out = decode_any(ch.payload)
    assert out.to_pylist() == strings


@SET
@given(st.lists(st.binary(max_size=60), max_size=200))
def test_choose_str_binary_roundtrip(payloads):
    arr = pa.array(payloads, type=pa.binary())
    ch = choose_str(arr)
    out = decode_any(ch.payload)  # StringArray carrying the raw bytes
    rebuilt = pa.Array.from_buffers(
        pa.binary(), len(out), [None, out.buffers()[1], out.buffers()[2]]
    )
    assert rebuilt.to_pylist() == payloads
