"""Greedy BPE merge-application edge cases the sf corpora never hit.

The synthetic corpus's arithmetic tokens never put the best pair's two
ids adjacent to themselves (consecutive tokens differ by a fixed
stride), so the oracle comparison exercises only non-overlapping
matches. These pin the run-parity (a == b) greedy semantics directly.
"""

from __future__ import annotations

import numpy as np

from cryo_spark.suite import _bpe_apply

NID = 999


def _run(docs, a, b):
    lengths = np.array([len(d) for d in docs], np.int64)
    flat = np.concatenate([np.asarray(d, np.int64) for d in docs]) \
        if docs else np.zeros(0, np.int64)
    return _bpe_apply(flat, lengths, a, b, NID)


def _merged(doc, a, b):
    """Reference: plain sequential greedy left-to-right merge."""
    out, i = [], 0
    while i < len(doc):
        if i + 1 < len(doc) and doc[i] == a and doc[i + 1] == b:
            out.append(NID)
            i += 2
        else:
            out.append(doc[i])
            i += 1
    return out


def _checksum(seq):
    return sum(v * (i + 1) for i, v in enumerate(seq))


def test_repeated_token_runs_even_parity():
    # aaaa -> [N, N]; aaa -> [N, a]; aab -> [N, b]
    for doc in ([7, 7, 7, 7], [7, 7, 7], [7, 7, 3]):
        nm, nl, cs = _run([doc], 7, 7)
        ref = _merged(doc, 7, 7)
        assert nl[0] == len(ref) and cs[0] == _checksum(ref)
        assert nm[0] == ref.count(NID)


def test_alternating_pairs_all_apply():
    doc = [1, 2, 1, 2, 1]  # (1,2) matches at 0 and 2, both apply
    nm, nl, cs = _run([doc], 1, 2)
    ref = _merged(doc, 1, 2)
    assert (nm[0], nl[0], cs[0]) == (2, len(ref), _checksum(ref))


def test_doc_boundary_never_matches():
    # doc1 ends with a, doc2 starts with b: adjacency in the flat
    # buffer must not create a match
    nm, nl, cs = _run([[5, 1], [2, 5]], 1, 2)
    assert nm.tolist() == [0, 0]
    assert nl.tolist() == [2, 2]
    assert cs.tolist() == [_checksum([5, 1]), _checksum([2, 5])]


def test_random_docs_match_sequential_reference():
    rng = np.random.default_rng(42)
    docs = [rng.integers(0, 4, size=rng.integers(1, 30)).tolist()
            for _ in range(200)]
    for a, b in [(1, 1), (0, 2), (3, 3), (2, 0)]:
        nm, nl, cs = _run(docs, a, b)
        for i, d in enumerate(docs):
            ref = _merged(d, a, b)
            assert nl[i] == len(ref), (i, d, a, b)
            assert cs[i] == _checksum(ref), (i, d, a, b)
            assert nm[i] == ref.count(NID), (i, d, a, b)
