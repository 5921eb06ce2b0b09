"""Kernel-level tests: winnowing fingerprint selection (MOSS)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cryo_spark.suite import (
    _flat_shingle_hashes,
    _winnow_kernel,
    _SHINGLE_K,
    _WINNOW_W,
)


def _fps(rows: list[tuple[int, str]]) -> dict[int, tuple[int, int, int]]:
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.int64()),
            pa.array([r[1] for r in rows], pa.string()),
        ],
        names=["doc_id", "text"],
    )
    out: dict[int, tuple[int, int, int]] = {}
    for ob in _winnow_kernel(iter([batch])):
        for did, n, mn, sm in zip(*(ob.column(i).to_pylist() for i in range(4))):
            out[did] = (n, mn, sm)
    return out


def _ref_fps(text: str) -> set[int]:
    """Independent scalar reimplementation of winnowing for one doc."""
    h, _, n_sh = _flat_shingle_hashes(pa.array([text], pa.string()))
    h = list(h)
    w = _WINNOW_W
    if len(h) < w:
        return {min(h)}
    return {min(h[i : i + w]) for i in range(len(h) - w + 1)}


def test_winnow_matches_scalar_reference():
    texts = [
        "the quick brown fox jumps over the lazy dog " * 4,
        "abcdefghij",
        "aaaaaaaaaaaaaaaaaaaa",  # constant text -> one fingerprint
    ]
    got = _fps(list(enumerate(texts)))
    for i, t in enumerate(texts):
        ref = _ref_fps(t)
        n, mn, sm = got[i]
        assert n == len(ref) and mn == min(ref) and sm == sum(ref)


def test_winnow_batch_composition_invariant():
    doc = (7, "winnowing selects robust fingerprints " * 5)
    alone = _fps([doc])[7]
    packed = _fps([(1, "z" * 300), doc, (2, "ab")])[7]
    assert alone == packed


def test_winnow_short_docs_use_only_own_bytes():
    # < SHINGLE_K chars: one zero-padded shingle; < W shingles: one
    # doc-wide min window. Neither may read the neighbor's buffer.
    a = _fps([(1, "hi"), (2, "Q" * 200)])[1]
    b = _fps([(1, "hi"), (2, "R" * 200)])[1]
    assert a == b and a[0] == 1
    mid = _fps([(1, "abcdef"), (2, "S" * 200)])[1]  # 2 shingles < W
    ref = _ref_fps("abcdef")
    assert mid == (len(ref), min(ref), sum(ref))


def test_winnow_guarantee_shared_substring_shares_fingerprint():
    # MOSS guarantee: a common substring of length >= K + W - 1 forces
    # at least one common fingerprint between the two documents.
    core = "zqxjkvbnmp"  # len 10 >= _SHINGLE_K + _WINNOW_W - 1 == 8
    assert len(core) >= _SHINGLE_K + _WINNOW_W - 1
    h, _, _ = _flat_shingle_hashes(
        pa.array(["AAAA" + core + "BBBB", "cccc" + core + "dddd"], pa.string())
    )
    fa = _ref_fps("AAAA" + core + "BBBB")
    fb = _ref_fps("cccc" + core + "dddd")
    assert fa & fb
