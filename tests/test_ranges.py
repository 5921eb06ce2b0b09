"""Key-range grammar + key-filtered collect/freeze.

Grammar cases mirror the reference's parser tests
(/root/reference/crates/cli/src/parse/blocks.rs:616-723 semantics:
end-exclusive a:b, +n extents, -n last-n, /n evenly spaced subsets,
:stride, K/M/B suffixes, underscores, 'latest').
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cryo_spark import engine
from cryo_spark.ranges import (
    KeyNumbers,
    KeyRange,
    key_predicate,
    parse_key_specs,
)


@pytest.mark.parametrize(
    "spec,latest,want",
    [
        ("42", None, [KeyNumbers((42,))]),
        ("10:20", None, [KeyRange(10, 19)]),
        ("10:", 99, [KeyRange(10, 99)]),
        (":20", None, [KeyRange(0, 19)]),
        ("10:latest", 55, [KeyRange(10, 55)]),
        ("10:+5", None, [KeyRange(10, 14)]),
        ("-5:100", None, [KeyRange(96, 100)]),
        ("10:30:4", None, [KeyRange(10, 29, 4)]),
        ("1K:2K", None, [KeyRange(1000, 1999)]),
        ("0.5M:+3", None, [KeyRange(500_000, 500_002)]),
        ("1_000:1_002", None, [KeyRange(1000, 1001)]),
        ("5 7:9", None, [KeyNumbers((5,)), KeyRange(7, 8)]),
        # evenly spaced subset: reference's accumulator-floor algorithm
        ("400:420/5", None, [KeyNumbers((400, 404, 409, 414, 419))]),
        ("0:10/100", None, [KeyNumbers(tuple(range(10)))]),  # n >= total
    ],
)
def test_grammar(spec, latest, want):
    assert parse_key_specs(spec, latest=latest) == want


def test_grammar_errors():
    with pytest.raises(ValueError):
        parse_key_specs("20:10")
    with pytest.raises(ValueError):
        parse_key_specs("10:latest")  # latest unresolved
    with pytest.raises(ValueError):
        parse_key_specs("")


def test_key_predicate_selects_expected(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    pred = key_predicate(parse_key_specs("100:110 200:210:3 300:304/2"), F.col("k"))
    got = sorted(r["k"] for r in df.filter(pred).collect())
    want = sorted(set(range(100, 110)) | {200, 203, 206, 209} | {300, 303})
    assert got == want


def test_collect_keys_pushes_down_and_filters(spark, sequences_path):
    df = engine.collect(spark, sequences_path, keys="100:200:5")
    ids = sorted(r["doc_id"] for r in df.select("doc_id").collect())
    assert ids == [f"doc-{i:012d}" for i in range(100, 200, 5)]
    # the string-envelope BETWEEN must reach the parquet scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(doc_id" in plan and "LessThanOrEqual(doc_id" in plan


def test_collect_keys_from_encoded_prunes_chunks(spark, sequences_path, tmp_path):
    out = str(tmp_path / "fz")
    engine.freeze(spark, sequences_path, out, target_tokens=100_000)
    full = engine.collect(spark, out)
    sub = engine.collect(spark, out, keys="50:+100")
    ids = sorted(r["doc_id"] for r in sub.select("doc_id").collect())
    assert ids == [f"doc-{i:012d}" for i in range(50, 150)]
    assert full.count() == 10_000


def test_freeze_keys_and_n_chunks(spark, sequences_path, tmp_path):
    out = str(tmp_path / "fz_keys")
    s = engine.freeze(spark, sequences_path, out, keys="0:+1000", n_chunks=4)
    assert s["n_encoded"] == s["n_chunks"]
    # the sweep is bucket-granular: near the requested count, not exact
    assert 2 <= s["n_chunks"] <= 8
    dec = engine.decode(engine.read_encoded(spark, out))
    assert dec.count() == 1000
    ids = sorted(r["doc_id"] for r in dec.select("doc_id").collect())
    assert ids[0] == "doc-000000000000" and ids[-1] == "doc-000000000999"
