"""Batch-composition invariance of the shared hash kernels.

The chunk layout's correctness contract (FIXTURES.md §4) is that a
row's bucket is a pure function of its bytes: the planner's histogram
pass and the executor-side assignment kernel see the SAME strings in
DIFFERENT batch groupings, so any batch-shape dependence in the hash
silently misassigns rows (or KeyErrors on a bucket absent from the
plan). These tests pin that invariance for variable-length ids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cryo_spark.hashing import bucket_of, hash_utf8
from cryo_spark.suite import _minhash_kernel


def test_hash_utf8_independent_of_batch_composition():
    # same strings, batched next to neighbors of very different lengths
    strings = ["abc", "def", "", "x" * 7, "y" * 8, "z" * 9, "doc-000017"]
    alone = {s: hash_utf8(pa.array([s]))[0] for s in strings}
    together = hash_utf8(pa.array(strings + ["w" * 200]))
    for s, h in zip(strings, together[: len(strings)]):
        assert h == alone[s], f"hash of {s!r} depends on batch composition"


def test_hash_utf8_pairwise_batches_match():
    # the ADVICE repro: ['abc','def'] vs ['abc','<32-char id>']
    a = hash_utf8(pa.array(["abc", "def"]))
    b = hash_utf8(pa.array(["abc", "k" * 32]))
    assert a[0] == b[0]


def test_hash_utf8_distinguishes_values_and_lengths():
    vals = ["", "a", "ab", "a" * 8, "a" * 9, "b" * 8, "abc", "acb"]
    hs = hash_utf8(pa.array(vals))
    assert len(set(hs.tolist())) == len(vals)


def test_bucket_of_variable_length_ids_stable_across_batching():
    rng = np.random.default_rng(7)
    ids = [f"doc-{i}" if i % 3 else f"document-{i:012d}-{'p' * (i % 17)}" for i in range(500)]
    full = bucket_of(pa.array(ids), 64)
    # hash in shuffled 50-row batches (different max-lengths per batch)
    order = rng.permutation(500)
    got = np.empty(500, dtype=np.int64)
    for lo in range(0, 500, 50):
        idx = order[lo : lo + 50]
        got[idx] = bucket_of(pa.array([ids[i] for i in idx]), 64)
    assert np.array_equal(got, full)


def _minhash_rows(doc_ids, texts):
    batch = pa.RecordBatch.from_arrays(
        [pa.array(doc_ids, type=pa.int64()), pa.array(texts, type=pa.string())],
        names=["doc_id", "text"],
    )
    (out,) = list(_minhash_kernel(iter([batch])))
    return {out.column(0)[i].as_py(): [out.column(c)[i].as_py() for c in range(1, out.num_columns)]
            for i in range(out.num_rows)}


def test_minhash_short_docs_independent_of_neighbors():
    # docs shorter than the shingle width must hash only their own bytes,
    # not spill into the next doc in the concatenated buffer
    short = ["ab", "x", "", "abcd"]
    sigs_a = _minhash_rows([1, 2, 3, 4], short)
    sigs_b = _minhash_rows([1, 2, 3, 4], [short[0], "ZZZZZZZZZZ", short[2], "QQQQ"])
    assert sigs_a[1] == sigs_b[1]  # 'ab' unchanged despite neighbor swap
    assert sigs_a[3] == sigs_b[3]  # empty doc unchanged
    # and batching each doc alone gives the same signature
    for i, t in enumerate(short):
        solo = _minhash_rows([9], [t])[9]
        assert solo == sigs_a[i + 1], f"doc {t!r} leaks neighbor bytes"


def test_minhash_long_docs_stable_across_batching():
    texts = ["the quick brown fox jumps over the lazy dog " * 3,
             "pack my box with five dozen liquor jugs",
             "sphinx of black quartz judge my vow"]
    joint = _minhash_rows([1, 2, 3], texts)
    for k, t in zip([1, 2, 3], texts):
        assert _minhash_rows([k], [t])[k] == joint[k]


def test_bloom_properties_hypothesis():
    """No false negatives for ANY byte content; FP bounded on disjoint sets."""
    from hypothesis import given, settings, strategies as st

    import pyarrow as pa
    from cryo_spark.hashing import bloom_build, bloom_test, hash_utf8

    @given(st.lists(st.text(min_size=0, max_size=40), min_size=1,
                    max_size=300, unique=True))
    @settings(max_examples=50, deadline=None)
    def check(keys):
        h = hash_utf8(pa.array(keys, pa.string()))
        b = bloom_build(h)
        assert bloom_test(b, h).all()

    check()
