"""_span_corrupt vs an explicit sequential construction of input/target.

The oracle comparison proves Spark == DuckDB on the shared positional
algebra; this pins that algebra against a plain build-the-sequences
reference, and asserts multi-position spans actually occur under the
chosen constants (a masking rule whose spans are all length 1 would
leave the run logic dead).
"""

from __future__ import annotations

import numpy as np

from cryo_spark.suite import (_SC_DEN, _SC_HIT, _SC_P1, _SC_P2, _SC_SENT,
                              _span_corrupt)


def _reference(doc, key):
    masked = [((key * _SC_P1 + (i + 1) * _SC_P2) % _SC_DEN) < _SC_HIT
              for i in range(len(doc))]
    inp, tgt, span = [], [], 0
    for i, (t, m) in enumerate(zip(doc, masked)):
        if m and (i == 0 or not masked[i - 1]):
            span += 1
            inp.append(_SC_SENT + span)
            tgt.append(_SC_SENT + span)
        if m:
            tgt.append(t)
        else:
            inp.append(t)
    return span, inp, tgt


def _checksum(seq):
    return sum(v * (i + 1) for i, v in enumerate(seq))


def test_span_corrupt_matches_sequential_reference():
    rng = np.random.default_rng(7)
    docs = [rng.integers(0, 50257, size=rng.integers(1, 65)).tolist()
            for _ in range(300)]
    keys = np.arange(300, dtype=np.int64) * 17 + 3
    lengths = np.array([len(d) for d in docs], np.int64)
    flat = np.concatenate([np.asarray(d, np.int64) for d in docs])
    n_spans, in_len, in_sum, tgt_sum = _span_corrupt(flat, lengths, keys)
    saw_multi = False
    for i, d in enumerate(docs):
        s, inp, tgt = _reference(d, int(keys[i]))
        assert n_spans[i] == s, i
        assert in_len[i] == len(inp), i
        assert in_sum[i] == _checksum(inp), i
        assert tgt_sum[i] == _checksum(tgt), i
        # span of length > 1 <=> target grows by more than 2 per span
        if s and len(tgt) > 2 * s:
            saw_multi = True
    assert saw_multi, "constants produced no multi-position span"
