"""freeze() over an in-session DataFrame (the library-call shape).

The reference's Python ``cryo.freeze(**kwargs)`` runs without a staged
input file; our analog accepts a DataFrame anywhere a parquet path is
accepted — an upstream transform's output freezes directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cryo_spark import collect, decode_frozen, freeze


def _rows(df):
    return sorted(
        (r.doc_id, tuple(r.tokens), r.n_tok, r.source) for r in df.collect()
    )


def test_freeze_dataframe_roundtrip_and_resume(spark, sequences_path, tmp_path):
    out = str(tmp_path / "out")
    df = spark.read.parquet(sequences_path).filter(
        F.col("n_tok") % 2 == 0)  # a transform output, not a file
    s1 = freeze(spark, df, out, target_tokens=30_000)
    assert s1["n_failed"] == 0 and s1["n_encoded"] > 0
    assert _rows(decode_frozen(spark, out)) == _rows(df)
    # resume: the same frame re-freezes to a no-op
    s2 = freeze(spark, df, out, target_tokens=30_000)
    assert s2["n_encoded"] == 0 and s2["n_skipped"] == s1["n_chunks"]


def test_freeze_dataframe_with_key_range(spark, sequences_path, tmp_path):
    out = str(tmp_path / "out")
    df = spark.read.parquet(sequences_path)
    s = freeze(spark, df, out, target_tokens=30_000, keys="100:200")
    assert s["n_failed"] == 0
    got = sorted(r.doc_id for r in collect(spark, out).collect())
    assert got == [f"doc-{i:012d}" for i in range(100, 200)]
