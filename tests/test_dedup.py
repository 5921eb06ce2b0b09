"""Dedup pipeline units: LSH hot-bucket cap, jaccard verify, components.

The oracle comparison (tools/check_oracles.py) proves Spark == DuckDB on
the sf corpora; these tests cover the scale paths the small corpora
can't reach — a degenerate hot bucket (every doc identical) must produce
LINEAR candidate edges, not the quadratic blowup VERDICT r1 flagged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cryo_spark.suite import (
    _connected_components,
    _jaccard_verify,
    _lsh_candidate_pairs,
    _minhash_kernel,
    _MINHASH_DDL,
)


@pytest.fixture(scope="module")
def hot_docs(spark):
    # 300 identical docs: every band bucket has size 300 >> cap 64
    text = "the same exact document text repeated everywhere " * 4
    return spark.range(300).select(
        F.col("id").alias("doc_id"), F.lit(text).alias("text")
    )


def test_hot_bucket_star_cap_linear_edges(spark, hot_docs):
    mh = hot_docs.mapInArrow(_minhash_kernel, _MINHASH_DDL)
    pairs = _lsh_candidate_pairs(mh, cap=64)
    rows = pairs.collect()
    # star edges only: hub = min doc_id (0), one edge per other doc
    assert len(rows) == 299, f"expected linear star edges, got {len(rows)}"
    assert all(r["doc_a"] == 0 for r in rows)
    assert sorted(r["doc_b"] for r in rows) == list(range(1, 300))


def test_hot_bucket_still_resolves_one_cluster(spark, hot_docs):
    mh = hot_docs.mapInArrow(_minhash_kernel, _MINHASH_DDL)
    edges = _jaccard_verify(hot_docs, _lsh_candidate_pairs(mh, cap=64))
    labels = _connected_components(edges)
    clusters = labels.groupBy("label").count().collect()
    assert len(clusters) == 1
    assert clusters[0]["count"] == 300 and clusters[0]["label"] == 0


def test_connected_components_chain(spark):
    # a path graph needs label propagation across multiple hops
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)] + [(100, 101)], ["doc_a", "doc_b"]
    )
    labels = {r["u"]: r["label"] for r in _connected_components(edges).collect()}
    assert all(labels[i] == 0 for i in range(11))
    assert labels[100] == labels[101] == 100


def test_jaccard_verify_filters_dissimilar(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta thetb"),
            (3, "completely different words with nothing shared here at all"),
        ],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], ["doc_a", "doc_b"])
    kept = sorted((r["doc_a"], r["doc_b"]) for r in _jaccard_verify(docs, pairs).collect())
    assert kept == [(1, 2)]
