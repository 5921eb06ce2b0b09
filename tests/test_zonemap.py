"""Zone-map stats (min_value/max_value per chunk x column) + filtered reads.

The manifest carries per-column chunk value ranges, so a filtered
collect prunes whole chunks before any payload decode — the parquet
row-group-statistics idiom over the encoded layout.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cryo_spark import collect, decode, freeze
from cryo_spark.engine import (_zone_map_prune, read_encoded, read_manifest)


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


@pytest.fixture(scope="module")
def frozen(spark, sequences_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("zm") / "out")
    s = freeze(spark, sequences_path, out, target_tokens=50_000)
    assert s["n_failed"] == 0
    return out


def test_manifest_carries_value_stats(spark, frozen):
    man = read_manifest(spark, frozen).filter(F.col("status") == "ok")
    assert {"min_value", "max_value"} <= set(man.columns)
    # every non-binary column row has stats
    assert man.filter(F.col("min_value").isNull()).count() == 0
    # n_tok stats are sane ints
    r = man.filter(F.col("column") == "n_tok").agg(
        F.min(F.col("min_value").cast("long")).alias("lo"),
        F.max(F.col("max_value").cast("long")).alias("hi"),
    ).first()
    assert 1 <= r.lo <= r.hi


def test_filtered_collect_matches_raw(spark, sequences_path, frozen):
    raw = spark.read.parquet(sequences_path)
    for filters, pred in [
        ([("source", "=", "code")], F.col("source") == "code"),
        ([("n_tok", ">=", 60)], F.col("n_tok") >= 60),
        ([("n_tok", "between", (10, 20))],
         (F.col("n_tok") >= 10) & (F.col("n_tok") <= 20)),
        ([("source", "=", "books"), ("n_tok", "<", 30)],
         (F.col("source") == "books") & (F.col("n_tok") < 30)),
    ]:
        got = _ids(collect(spark, frozen, filters=filters))
        want = _ids(raw.filter(pred))
        assert got == want and len(want) > 0, filters


def test_filter_projection_excludes_filter_column(spark, sequences_path, frozen):
    # filter column not in the projection: decoded for the residual,
    # dropped from the result
    df = collect(spark, frozen, columns=["doc_id"],
                 filters=[("source", "=", "wiki")])
    assert df.columns == ["doc_id"]
    want = _ids(spark.read.parquet(sequences_path).filter("source = 'wiki'"))
    assert _ids(df) == want


def test_zone_map_actually_prunes(spark, frozen):
    enc = read_encoded(spark, frozen)
    total = enc.select("run", "partition_id", "chunk_id").distinct().count()
    pruned = _zone_map_prune(enc, [("source", "=", "chat")], __import__(
        "cryo_spark").SPECS["sequences"])
    kept = pruned.select("run", "partition_id", "chunk_id").distinct().count()
    # chunks never span sources, so a one-source filter keeps only that
    # source's chunks
    assert 0 < kept < total
    # and the kept chunks decode to exactly that source (no residual
    # needed for a partition-aligned column)
    assert decode(pruned).filter("source <> 'chat'").count() == 0


def test_legacy_manifest_without_stats_is_kept(spark, frozen):
    enc = read_encoded(spark, frozen).drop("min_value", "max_value")
    spec = __import__("cryo_spark").SPECS["sequences"]
    assert _zone_map_prune(enc, [("n_tok", "=", 1)], spec) is enc


def test_filter_validation(spark, frozen):
    with pytest.raises(ValueError, match="list column"):
        collect(spark, frozen, filters=[("tokens", "=", 1)])
    with pytest.raises(ValueError, match="unknown filter column"):
        collect(spark, frozen, filters=[("nope", "=", 1)])
    with pytest.raises(ValueError, match="unknown filter op"):
        collect(spark, frozen, filters=[("n_tok", "!=", 1)])


def test_filters_on_raw_parquet_source(spark, sequences_path):
    got = _ids(collect(spark, sequences_path,
                       filters=[("n_tok", "<=", 5)]))
    want = _ids(spark.read.parquet(sequences_path).filter("n_tok <= 5"))
    assert got == want and len(want) > 0
