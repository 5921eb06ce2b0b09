"""ANALYZE: per-column NDV statistics via portable KMV sketches."""

from __future__ import annotations

import json
import os

import pytest

from cryo_spark import freeze
from cryo_spark.engine import analyze


@pytest.fixture(scope="module")
def frozen(spark, sequences_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ndv") / "out")
    s = freeze(spark, sequences_path, out, target_tokens=30_000)
    assert s["n_failed"] == 0
    return out


def test_analyze_estimates_and_exact_counts(spark, sequences_path, frozen):
    stats = analyze(spark, frozen)
    src = spark.read.parquet(sequences_path)
    n = src.count()
    # key NDV: n unique docs >> k -> KMV estimate within ~20%
    assert stats["doc_id"]["method"] == "kmv"
    assert 0.8 * n <= stats["doc_id"]["ndv"] <= 1.2 * n
    # n_tok: estimate within the KMV error band
    true_ntok = src.select("n_tok").distinct().count()
    assert 0.8 * true_ntok <= stats["n_tok"]["ndv"] <= 1.2 * true_ntok
    # tokens: element NDV (vocabulary size estimate)
    true_vocab = src.selectExpr("explode(tokens) t").distinct().count()
    assert 0.8 * true_vocab <= stats["tokens"]["ndv"] <= 1.2 * true_vocab
    # source: string non-key -> exact
    true_src = src.select("source").distinct().count()
    assert stats["source"] == dict(method="exact", ndv=float(true_src))
    # persisted puffin-analog file
    with open(os.path.join(frozen, "stats", "ndv.json")) as f:
        disk = json.load(f)
    assert disk["columns"]["doc_id"] == stats["doc_id"]


def test_analyze_column_subset_and_exact_path(spark, sequences_path, frozen):
    true_ntok = spark.read.parquet(sequences_path) \
        .select("n_tok").distinct().count()
    # with k above the true NDV the sketch is EXACT
    stats = analyze(spark, frozen, columns=["n_tok"], k=4 * true_ntok)
    assert set(stats) == {"n_tok"}
    assert stats["n_tok"]["k"] == true_ntok
    assert stats["n_tok"]["ndv"] == float(true_ntok)
