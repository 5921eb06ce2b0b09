"""export_shards: reproducible training-shard writer.

The trainer-facing contract: shard membership and within-shard order
are pure functions of the data (hash of the key + seed), so every
re-run, parallelism level, and source layout produces the same shards
— and each shard directory is exactly one file written in order.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from cryo_spark import engine, export_shards, freeze


N_SHARDS = 4
SEED = 12345


@pytest.fixture(scope="module")
def frozen(spark, sequences_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shards") / "frozen")
    freeze(spark, sequences_path, out, target_tokens=100_000)
    return out


def _expected(spark, sequences_path):
    """Per-shard key order recomputed independently of export_shards."""
    df = (
        spark.read.parquet(sequences_path)
        .select(
            "doc_id",
            F.xxhash64("doc_id", F.lit(SEED)).alias("h"),
        )
        .withColumn("shard", F.pmod("h", F.lit(N_SHARDS)).cast("int"))
    )
    rows = df.collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append((r["h"], r["doc_id"]))
    return {s: [d for _, d in sorted(v)] for s, v in by_shard.items()}


def test_shards_partition_and_order(spark, sequences_path, frozen, tmp_path):
    dest = str(tmp_path / "shards")
    s = export_shards(spark, frozen, dest, n_shards=N_SHARDS, seed=SEED)
    assert s["n_shards"] == N_SHARDS
    exp = _expected(spark, sequences_path)
    assert sum(s["rows"].values()) == sum(len(v) for v in exp.values())

    for shard, docs in exp.items():
        files = glob.glob(os.path.join(dest, f"shard={shard}", "*.parquet"))
        assert len(files) == 1, "one file per shard"
        got = pq.read_table(files[0], columns=["doc_id"])["doc_id"].to_pylist()
        assert got == docs, f"shard {shard} order mismatch"
        assert s["rows"][shard] == len(docs)


def test_shards_roundtrip_corpus(spark, sequences_path, frozen, tmp_path):
    dest = str(tmp_path / "shards_rt")
    export_shards(spark, frozen, dest, n_shards=N_SHARDS, seed=SEED)
    back = spark.read.parquet(dest)
    orig = spark.read.parquet(sequences_path)
    assert back.count() == orig.count()
    # token mass survives the shard write bit-exactly
    mass = F.sum(F.expr("aggregate(tokens, 0L, (a, x) -> a + x)"))
    assert back.agg(mass).first()[0] == orig.agg(mass).first()[0]


def test_shards_deterministic_across_source_layout(
    spark, sequences_path, frozen, tmp_path
):
    """Different physical source layout -> identical shard contents."""
    rp = str(tmp_path / "in_rp")
    spark.read.parquet(sequences_path).repartition(7).write.parquet(rp)
    d1 = str(tmp_path / "s1")
    d2 = str(tmp_path / "s2")
    export_shards(spark, frozen, d1, n_shards=N_SHARDS, seed=SEED)
    export_shards(spark, rp, d2, n_shards=N_SHARDS, seed=SEED)
    for shard in range(N_SHARDS):
        f1 = glob.glob(os.path.join(d1, f"shard={shard}", "*.parquet"))
        f2 = glob.glob(os.path.join(d2, f"shard={shard}", "*.parquet"))
        a = pq.read_table(f1[0], columns=["doc_id"])["doc_id"].to_pylist()
        b = pq.read_table(f2[0], columns=["doc_id"])["doc_id"].to_pylist()
        assert a == b


def test_shards_filters_prune(spark, frozen, tmp_path):
    dest = str(tmp_path / "shards_f")
    s = export_shards(
        spark, frozen, dest, n_shards=2, seed=SEED,
        filters=[("source", "=", "wiki")],
    )
    back = spark.read.parquet(dest)
    assert back.filter(F.col("source") != "wiki").count() == 0
    assert sum(s["rows"].values()) == back.count()
    assert (
        engine.collect(spark, frozen, filters=[("source", "=", "wiki")]).count()
        == back.count()
    )
