"""Schema evolution: add a column without rewriting committed history.

Iceberg add-column semantics over the encoded layout: chunks frozen
before the column existed decode it as all-null; new freezes carry real
values; one read serves both. Dropping a column is just projection
(schema.py algebra) and needs no metadata change.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cryo_spark import collect, decode, decode_frozen, freeze, write_sequences
from cryo_spark.engine import read_encoded
from cryo_spark.tablespec import SEQUENCES, ColumnSpec

SPEC_V2 = SEQUENCES.with_column(ColumnSpec("lang", "str"))


@pytest.fixture()
def evolved(spark, tmp_path):
    """Range A frozen under v1 (no lang), range B under v2 (with lang)."""
    src = str(tmp_path / "seqs.parquet")
    write_sequences(src, n=400, seed=11)
    raw = spark.read.parquet(src)
    in1 = str(tmp_path / "in_v1")
    in2 = str(tmp_path / "in_v2")
    raw.filter("doc_id < 'doc-000000000200'").write.parquet(in1)
    raw.filter("doc_id >= 'doc-000000000200'").withColumn(
        "lang", F.concat(F.lit("l"), F.pmod(F.col("n_tok"), F.lit(3)))
    ).write.parquet(in2)
    out = str(tmp_path / "out")
    s1 = freeze(spark, in1, out, target_tokens=20_000)
    s2 = freeze(spark, in2, out, target_tokens=20_000, spec=SPEC_V2)
    assert s1["n_failed"] == 0 and s2["n_failed"] == 0
    return src, in2, out


def test_old_chunks_decode_new_column_as_null(spark, evolved):
    src, in2, out = evolved
    for df in (decode_frozen(spark, out, spec=SPEC_V2),
               decode(read_encoded(spark, out), spec=SPEC_V2)):
        assert df.columns == ["doc_id", "tokens", "n_tok", "source", "lang"]
        old = df.filter("doc_id < 'doc-000000000200'")
        assert old.count() == 200
        assert old.filter(F.col("lang").isNotNull()).count() == 0
        # new rows carry the real values, bit-identical to the input
        new = df.filter("doc_id >= 'doc-000000000200'")
        want = sorted((r.doc_id, r.lang) for r in
                      spark.read.parquet(in2).select("doc_id", "lang").collect())
        got = sorted((r.doc_id, r.lang) for r in
                     new.select("doc_id", "lang").collect())
        assert got == want
        # pre-existing columns untouched by the evolution
        assert df.count() == 400


def test_v2_output_readable_under_v1(spark, evolved):
    _, _, out = evolved
    df = decode_frozen(spark, out, spec=SEQUENCES)
    assert df.columns == ["doc_id", "tokens", "n_tok", "source"]
    assert df.count() == 400


def test_projection_of_new_column(spark, evolved):
    _, _, out = evolved
    df = collect(spark, out, columns=["doc_id", "lang"], spec=SPEC_V2)
    assert df.columns == ["doc_id", "lang"]
    assert df.filter(F.col("lang").isNotNull()).count() == 200


def test_filter_on_new_column_prunes_old_chunks(spark, evolved):
    _, in2, out = evolved
    # null never matches an equality, so chunks that predate the column
    # are prunable outright — the zone-map semi-join drops them because
    # they have no stats row for the column at all
    df = collect(spark, out, filters=[("lang", "=", "l1")], spec=SPEC_V2)
    want = sorted(r.doc_id for r in spark.read.parquet(in2)
                  .filter("lang = 'l1'").select("doc_id").collect())
    assert sorted(r.doc_id for r in df.select("doc_id").collect()) == want
    assert len(want) > 0
