"""Count-Min Sketch kernel (suite._cms_kernel) — boundary exactness.

The kernel streams bigram keys through d mod-prime hash rows; the
sketch must equal the one built from exact per-doc bigram lists —
including empty docs, one-token docs (no pairs), and pairs that would
cross document boundaries in the flattened buffer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cryo_spark.suite import _CMS_P, _CMS_PARAMS, _CMS_V, _CMS_W, _cms_kernel


def _brute_sketch(docs: list[list[int]]) -> np.ndarray:
    sketch = np.zeros((len(_CMS_PARAMS), _CMS_W), dtype=np.int64)
    for doc in docs:
        for t1, t2 in zip(doc, doc[1:]):
            k = (t1 * _CMS_V + t2) % _CMS_P
            for j, a, b in _CMS_PARAMS:
                sketch[j][((a * k + b) % _CMS_P) % _CMS_W] += 1
    return sketch


def _run_kernel(docs: list[list[int]], split: int | None = None) -> np.ndarray:
    arr = pa.array(docs, pa.list_(pa.int32()))
    t = pa.table({"tokens": arr})
    batches = t.to_batches(max_chunksize=split) if split else t.to_batches()
    sketch = np.zeros((len(_CMS_PARAMS), _CMS_W), dtype=np.int64)
    for out in _cms_kernel()(iter(batches)):
        js = out.column("j").to_numpy(zero_copy_only=False)
        bk = out.column("bucket").to_numpy(zero_copy_only=False)
        ct = out.column("cnt").to_numpy(zero_copy_only=False)
        sketch[js, bk] += ct
    return sketch


def test_kernel_matches_brute_force():
    rng = np.random.default_rng(11)
    docs = [rng.integers(0, _CMS_V, size=int(n)).tolist()
            for n in rng.integers(0, 40, size=200)]
    docs[3] = []            # empty doc
    docs[7] = [123]         # one token: no pairs
    got = _run_kernel(docs)
    want = _brute_sketch(docs)
    assert np.array_equal(got, want)
    assert got.sum() == len(_CMS_PARAMS) * sum(
        max(0, len(d) - 1) for d in docs)


def test_kernel_batch_split_invariant():
    rng = np.random.default_rng(13)
    docs = [rng.integers(0, _CMS_V, size=int(n)).tolist()
            for n in rng.integers(1, 12, size=64)]
    assert np.array_equal(_run_kernel(docs, split=5), _run_kernel(docs))


def test_estimate_never_underestimates():
    docs = [[1, 2, 1, 2, 1, 2], [1, 2, 9], [5, 6]]
    sketch = _run_kernel(docs)
    k = (1 * _CMS_V + 2) % _CMS_P
    est = min(sketch[j][((a * k + b) % _CMS_P) % _CMS_W]
              for j, a, b in _CMS_PARAMS)
    assert est >= 3  # (1,2) occurs 3x; CMS may only overestimate
