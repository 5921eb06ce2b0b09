"""Partition-spec evolution: append runs under a DIFFERENT chunk spec.

Iceberg evolves a table's partition spec without rewriting history:
old files keep their old layout, new writes use the new spec, and
every read plans across the mix (Iceberg spec-evolution semantics).
Our analog: each freeze run persists its own plan (plan/<fp>.parquet),
manifest rows carry plan_id, and readers never assume one layout —
so a second batch frozen with different target_tokens / chunk_by into
the same output must coexist with the first, byte-exactly.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from cryo_spark import collect, decode_frozen, freeze
from cryo_spark.engine import load_output_plan, read_manifest
from cryo_spark.fixtures import generate_sequences


def _rows(df):
    return sorted(
        (r.doc_id, tuple(r.tokens), r.n_tok, r.source) for r in df.collect()
    )


@pytest.fixture(scope="module")
def evolved(spark, tmp_path_factory):
    """One output holding batch A (hash layout) + batch B (range layout)."""
    d = tmp_path_factory.mktemp("specevo")
    table = generate_sequences(4_000, seed=7)
    a_path = str(d / "batch_a.parquet")
    b_path = str(d / "batch_b.parquet")
    pq.write_table(table.slice(0, 2_500), a_path, row_group_size=4096)
    pq.write_table(table.slice(2_500), b_path, row_group_size=4096)
    out = str(d / "out")
    s1 = freeze(spark, a_path, out, target_tokens=30_000, chunk_by="hash")
    s2 = freeze(spark, b_path, out, target_tokens=12_000, chunk_by="range")
    assert s1["n_failed"] == 0 and s2["n_failed"] == 0
    assert s2["n_encoded"] > 0 and s2["n_skipped"] == 0  # new spec = new work
    return out, a_path, b_path


def test_mixed_spec_read_is_bit_identical(spark, evolved):
    out, a_path, b_path = evolved
    want = _rows(spark.read.parquet(a_path).unionAll(
        spark.read.parquet(b_path)))
    assert _rows(decode_frozen(spark, out)) == want


def test_manifest_carries_both_plans(spark, evolved):
    out, _, _ = evolved
    man = read_manifest(spark, out).filter(F.col("status") == "ok")
    plan_ids = [r.plan_id for r in man.select("plan_id").distinct().collect()]
    assert len(plan_ids) == 2
    # the single-plan loader refuses to guess between them (colocated
    # join's fast path falls back rather than misplacing keys)
    assert load_output_plan(out) is None
    # ...but either plan loads explicitly by id
    for pid in plan_ids:
        plan = load_output_plan(out, pid)
        assert plan is not None and plan.n_chunks > 0


def test_key_range_read_spans_both_specs(spark, evolved):
    out, _, _ = evolved
    # 2400:2600 straddles the batch boundary at 2500: the hash-layout
    # run serves the left half, the range-layout run the right half
    got = sorted(r.doc_id for r in
                 collect(spark, out, keys="2400:2600").collect())
    assert got == [f"doc-{i:012d}" for i in range(2400, 2600)]
