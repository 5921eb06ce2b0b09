"""Z-order (Morton) chunk layout: zone maps prune on key AND weight.

`freeze(chunk_by="zorder")` interleaves the numeric key with the scalar
weight column (n_tok) on a 21+21-bit grid; chunks are contiguous Morton
ranges, so both columns cluster and the manifest zone maps prune reads
filtered on either one — Iceberg's rewrite_data_files z-ordering,
through the same histogram/sweep/salting planner as hash and range.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cryo_spark import collect, decode, decode_frozen, freeze
from cryo_spark.engine import _zone_map_prune, read_encoded, read_manifest
from cryo_spark.tablespec import SEQUENCES


def _rows(df):
    return sorted(
        (r.doc_id, tuple(r.tokens), r.n_tok, r.source) for r in df.collect()
    )


@pytest.fixture(scope="module")
def frozen_z(spark, sequences_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("zord") / "out")
    s = freeze(spark, sequences_path, out, target_tokens=30_000,
               chunk_by="zorder")
    assert s["n_failed"] == 0
    return out


def test_zorder_roundtrip_bit_identical(spark, sequences_path, frozen_z):
    want = _rows(spark.read.parquet(sequences_path))
    assert _rows(decode_frozen(spark, frozen_z)) == want
    assert _rows(decode(read_encoded(spark, frozen_z))) == want


def _kept(enc, man, filters):
    return (
        _zone_map_prune(enc, filters, SEQUENCES, man=man)
        .select("run", "partition_id", "chunk_id").distinct().count()
    )


def test_zorder_prunes_on_both_dimensions(spark, frozen_z):
    enc = read_encoded(spark, frozen_z)
    man = read_manifest(spark, frozen_z)
    total = enc.select("run", "partition_id", "chunk_id").distinct().count()
    assert total >= 8  # enough chunks for pruning to be exercisable
    # weight dimension: a tight n_tok band must exclude most chunks
    kept_w = _kept(enc, man, [("n_tok", "<=", 4)])
    assert 0 < kept_w < total
    # key dimension: a narrow doc_id range must also exclude chunks
    kept_k = _kept(enc, man, [("doc_id", "<=", "doc-000000000200")])
    assert 0 < kept_k < total
    # under z-order BOTH dims prune at once (the rectangle query)
    kept_kw = _kept(enc, man, [("doc_id", "<=", "doc-000000000200"),
                               ("n_tok", "<=", 4)])
    assert kept_kw <= min(kept_w, kept_k)


def test_zorder_filtered_collect_matches_full_filter(spark, sequences_path,
                                                     frozen_z):
    got = collect(spark, frozen_z, filters=[("n_tok", "<=", 4)])
    want = spark.read.parquet(sequences_path).filter(F.col("n_tok") <= 4)
    assert _rows(got) == _rows(want)


def test_zorder_plan_is_parallelism_invariant(spark, sequences_path):
    from cryo_spark import layout

    df = spark.read.parquet(sequences_path)
    p1 = layout.plan_chunks(df.repartition(2), target_tokens=30_000,
                            layout="zorder")
    p2 = layout.plan_chunks(df.repartition(17), target_tokens=30_000,
                            layout="zorder")
    assert p1.mapping == p2.mapping
    assert p1.range_bounds == p2.range_bounds
    assert p1.layout == "zorder"


def test_zorder_refuses_listweight_specs(spark, sequences_path):
    from cryo_spark import layout
    from cryo_spark.tablespec import TableSpec, ColumnSpec

    spec = TableSpec(
        name="sequences",  # same table shape, weight = the list column
        key="doc_id",
        columns=(
            ColumnSpec("doc_id", "str"),
            ColumnSpec("tokens", "list<int32>"),
            ColumnSpec("n_tok", "int32"),
            ColumnSpec("source", "str"),
        ),
        partition_col="source",
        weight="tokens",
    )
    df = spark.read.parquet(sequences_path)
    with pytest.raises(ValueError, match="scalar int weight"):
        layout.plan_chunks(df, target_tokens=30_000, spec=spec,
                           layout="zorder")


def test_zorder_freeze_resumes(spark, sequences_path, frozen_z):
    from cryo_spark import freeze

    s2 = freeze(spark, sequences_path, frozen_z, target_tokens=30_000,
                chunk_by="zorder")
    assert s2["n_encoded"] == 0 and s2["n_skipped"] > 0
