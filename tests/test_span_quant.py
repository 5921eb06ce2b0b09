"""Kernel-level tests: span-exact dedup windows + int8 quantizer."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from cryo_spark.suite import _quant_kernel, _span_kernel, _SPAN_K, _J_PRIME


def _spans(rows: list[tuple[int, str]]) -> dict[int, set[int]]:
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.int64()),
            pa.array([r[1] for r in rows], pa.string()),
        ],
        names=["doc_id", "text"],
    )
    out: dict[int, set[int]] = {}
    for ob in _span_kernel(iter([batch])):
        for did, h in zip(ob.column(0).to_pylist(), ob.column(1).to_pylist()):
            out.setdefault(did, set()).add(h)
    return out


def test_span_hashes_batch_composition_invariant():
    doc = (7, "the quick brown fox jumps over the lazy dog " * 3)
    alone = _spans([doc])[7]
    with_neighbors = _spans([(1, "x" * 500), doc, (2, "short")])[7]
    assert alone == with_neighbors


def test_span_short_doc_masked_to_own_bytes():
    # a doc shorter than K gets ONE window padded with zeros, never the
    # neighbor's bytes: identical short docs hash identically regardless
    # of what follows them in the buffer
    a = _spans([(1, "tiny"), (2, "A" * 100)])[1]
    b = _spans([(1, "tiny"), (2, "B" * 100)])[1]
    assert a == b and len(a) == 1


def test_span_shared_window_detected():
    shared = "S" * _SPAN_K
    got = _spans([(1, "aaa" + shared + "bbb"), (2, "ccc" + shared + "ddd")])
    assert got[1] & got[2], "docs sharing a K-byte window must share a hash"
    assert all(0 <= h < _J_PRIME for s in got.values() for h in s)


def _quant(rows: list[tuple[int, list[float]]]) -> dict[int, tuple]:
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.int64()),
            pa.array([r[1] for r in rows], pa.list_(pa.float32())),
        ],
        names=["vec_id", "embedding"],
    )
    out = {}
    for ob in _quant_kernel(iter([batch])):
        for vid, sm, qs, ql in zip(*(ob.column(i).to_pylist() for i in range(4))):
            out[vid] = (sm, qs, ql)
    return out


def test_quant_known_codes():
    # v = [1, -0.5, 0.25]: scale = 1/127; codes = [127, -63, 32]
    # (floor(-63.5 + 0.5) = -63, floor(31.75 + 0.5) = 32)
    got = _quant([(1, [1.0, -0.5, 0.25])])
    scale_micro, qsum, ql2 = got[1]
    assert scale_micro == int(np.floor(1.0 / 127.0 * 1e6))
    assert qsum == 127 * 1 + (-63) * 2 + 32 * 3
    assert ql2 == 127**2 + 63**2 + 32**2


def test_quant_zero_vector_guard():
    got = _quant([(5, [0.0, 0.0])])
    assert got[5] == (0, 0, 0)


def test_quant_empty_row_raises():
    with pytest.raises(ValueError):
        _quant([(9, [])])


def test_anchored_spans_are_content_defined_subset():
    from cryo_spark.suite import _make_span_kernel, _SPAN_ANCHOR_S

    rows = [(1, "shared passage of text here " * 4),
            (2, "prefix! " + "shared passage of text here " * 4)]
    batch = pa.RecordBatch.from_arrays(
        [pa.array([r[0] for r in rows], pa.int64()),
         pa.array([r[1] for r in rows], pa.string())],
        names=["doc_id", "text"],
    )

    def collect(kernel):
        out: dict[int, set[int]] = {}
        for ob in kernel(iter([batch])):
            for did, h in zip(ob.column(0).to_pylist(), ob.column(1).to_pylist()):
                out.setdefault(did, set()).add(h)
        return out

    full = collect(_span_kernel)
    anch = collect(_make_span_kernel(_SPAN_ANCHOR_S))
    for d in (1, 2):
        assert anch[d] <= full[d]
        assert all(h % _SPAN_ANCHOR_S == 0 for h in anch[d])
    # content-defined: both docs sample the same windows from the shared
    # passage, so the anchored intersection is the anchored slice of the
    # full intersection — shared spans survive sampling
    assert anch[1] & anch[2] == {h for h in full[1] & full[2]
                                 if h % _SPAN_ANCHOR_S == 0}
    assert anch[1] & anch[2], "shared passage must keep anchored hashes"


def test_qdot_kernel_matches_per_row_quantization():
    from cryo_spark.suite import _qdot_kernel, _quant_codes_np

    vecs = [[1.0, -0.5, 0.25], [0.1, 0.2, -0.3], [0.0, 0.0, 0.0]]
    qv = np.array([0.5, 0.5, -1.0])
    qc = _quant_codes_np(qv)
    batch = pa.RecordBatch.from_arrays(
        [pa.array([1, 2, 3], pa.int64()),
         pa.array([7, 8, 9], pa.int32()),
         pa.array(vecs, pa.list_(pa.float32()))],
        names=["vec_id", "label", "embedding"],
    )
    got = {}
    for ob in _qdot_kernel(qc)(iter([batch])):
        for vid, lab, d, qb2 in zip(*(ob.column(i).to_pylist() for i in range(4))):
            got[vid] = (d, qb2)
    for vid, v in zip([1, 2, 3], vecs):
        # float32 storage: quantize the same float32-rounded values
        c = _quant_codes_np(np.asarray(v, dtype=np.float32).astype(np.float64))
        assert got[vid] == (int(c @ qc), int((c * c).sum())), vid
