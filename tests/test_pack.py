"""engine.pack: context-window packing frozen as packed_sequences.

Contract: every input token lands in exactly one window, windows are
exactly `window` tokens except the tail, the concatenation order is the
key order of the source, and the result is a pure function of the data
(same windows at any source layout).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cryo_spark import engine
from cryo_spark.tablespec import PACKED_SEQUENCES


WINDOW = 128


@pytest.fixture(scope="module")
def packed(spark, sequences_path, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("pack") / "out")
    stats = engine.pack(spark, sequences_path, dest, window=WINDOW,
                        target_tokens=50_000)
    return dest, stats


def _source_stream(spark, sequences_path):
    rows = (
        spark.read.parquet(sequences_path)
        .select("doc_id", "tokens")
        .orderBy("doc_id")
        .collect()
    )
    out: list[int] = []
    for r in rows:
        out.extend(r["tokens"])
    return out


def test_pack_exact_token_stream(spark, sequences_path, packed):
    dest, stats = packed
    assert stats["n_failed"] == 0
    dec = engine.decode_frozen(spark, dest, spec=PACKED_SEQUENCES)
    rows = dec.orderBy("window_id").collect()
    stream = _source_stream(spark, sequences_path)
    got: list[int] = []
    for i, r in enumerate(rows):
        assert r["window_id"] == i, "window ids are dense from 0"
        assert r["n_tok"] == len(r["tokens"])
        assert r["n_docs"] >= 1
        if i < len(rows) - 1:
            assert r["n_tok"] == WINDOW
        got.extend(r["tokens"])
    assert got == stream, "every token in exactly one window, in key order"
    assert stats["n_windows"] == len(rows)


def test_pack_deterministic_across_source_layout(
    spark, sequences_path, tmp_path
):
    rp = str(tmp_path / "in_rp")
    spark.read.parquet(sequences_path).repartition(13).write.parquet(rp)
    d1 = str(tmp_path / "p1")
    d2 = str(tmp_path / "p2")
    engine.pack(spark, sequences_path, d1, window=256, target_tokens=50_000)
    engine.pack(spark, rp, d2, window=256, target_tokens=50_000)
    chk = lambda d: sorted(  # noqa: E731
        tuple(r) for r in engine.decode_frozen(spark, d, spec=PACKED_SEQUENCES)
        .select(
            "window_id",
            F.expr("aggregate(tokens, 0L, (a, x) -> a + x)").alias("s"),
            "n_tok", "n_docs",
        ).collect()
    )
    assert chk(d1) == chk(d2)


def test_pack_window_larger_than_corpus(spark, sequences_path, tmp_path):
    dest = str(tmp_path / "p_one")
    stats = engine.pack(spark, sequences_path, dest, window=10_000_000,
                        target_tokens=50_000_000)
    assert stats["n_windows"] == 1
    dec = engine.decode_frozen(spark, dest, spec=PACKED_SEQUENCES)
    r = dec.collect()[0]
    assert r["window_id"] == 0
    assert r["n_tok"] == len(_source_stream(spark, sequences_path))
