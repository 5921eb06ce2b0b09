"""Range-chunked layout: the reference's key-range chunk semantics.

`freeze(chunk_by="range")` buckets by a monotone per-source key map
instead of the hash — chunk key ranges come out tight and disjoint, so
manifest zone maps prune key-range reads exactly (under the default
hash layout every chunk's range spans the key space).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cryo_spark import collect, decode, decode_frozen, freeze, write_sequences
from cryo_spark.engine import _chunk_stat_prune, read_encoded, read_manifest
from cryo_spark import layout
from cryo_spark.tablespec import SEQUENCES


def _rows(df):
    return sorted(
        (r.doc_id, tuple(r.tokens), r.n_tok, r.source) for r in df.collect()
    )


@pytest.fixture(scope="module")
def frozen_range(spark, sequences_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rng") / "out")
    s = freeze(spark, sequences_path, out, target_tokens=30_000,
               chunk_by="range")
    assert s["n_failed"] == 0
    return out


def test_range_roundtrip_bit_identical(spark, sequences_path, frozen_range):
    want = _rows(spark.read.parquet(sequences_path))
    assert _rows(decode_frozen(spark, frozen_range)) == want
    assert _rows(decode(read_encoded(spark, frozen_range))) == want


def test_range_chunks_are_disjoint_per_source(spark, frozen_range):
    man = read_manifest(spark, frozen_range).filter(
        (F.col("status") == "ok") & (F.col("column") == "doc_id"))
    rows = man.select("partition_id", "chunk_id",
                      "min_doc_id", "max_doc_id").collect()
    by_pid: dict[int, list[tuple[str, str]]] = {}
    for r in rows:
        by_pid.setdefault(r.partition_id, []).append(
            (r.min_doc_id, r.max_doc_id))
    assert len(rows) > len(by_pid)  # multiple chunks somewhere
    for pid, spans in by_pid.items():
        spans.sort()
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            assert hi1 < lo2, f"overlap in partition {pid}"


def test_range_layout_prunes_key_ranges(spark, frozen_range):
    enc = read_encoded(spark, frozen_range)
    total = enc.select("run", "partition_id", "chunk_id").distinct().count()
    from cryo_spark import ranges
    chunks = ranges.parse_key_specs("100:200")
    kept = _chunk_stat_prune(enc, chunks, SEQUENCES) \
        .select("run", "partition_id", "chunk_id").distinct().count()
    # tight disjoint ranges: a 1%-of-keyspace read keeps a small
    # fraction of chunks (hash layout would keep ~all of them)
    assert 0 < kept < total / 2
    got = sorted(r.doc_id for r in
                 collect(spark, frozen_range, keys="100:200").collect())
    assert got == [f"doc-{i:012d}" for i in range(100, 200)]


def test_range_resume_and_determinism(spark, sequences_path, tmp_path):
    out = str(tmp_path / "out")
    s1 = freeze(spark, sequences_path, out, target_tokens=30_000,
                chunk_by="range")
    s2 = freeze(spark, sequences_path, out, target_tokens=30_000,
                chunk_by="range")
    assert s2["n_encoded"] == 0 and s2["n_skipped"] == s1["n_chunks"]
    # hash and range plans of the same input have different plan ids
    # (a hash re-freeze must not think the range chunks are its own)
    s3 = freeze(spark, sequences_path, out, target_tokens=30_000, dry_run=True)
    assert s3["n_to_encode"] > 0


def test_range_layout_int_key_spec(spark, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cryo_spark.tablespec import EMBEDDINGS

    rng = np.random.default_rng(5)
    n, d = 2000, 16
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(rng.normal(size=n * d).astype(np.float32)), d
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n, dtype=np.int64).astype("int32")),
    })
    src = str(tmp_path / "emb.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "out")
    s = freeze(spark, src, out, target_tokens=4_000, spec=EMBEDDINGS,
               chunk_by="range")
    assert s["n_failed"] == 0 and s["n_chunks"] > 1
    dec = decode_frozen(spark, out, spec=EMBEDDINGS)
    assert dec.count() == n
    # int-key manifest ranges disjoint (numeric compare)
    man = read_manifest(spark, out).filter(
        (F.col("status") == "ok") & (F.col("column") == "vec_id"))
    spans = sorted((int(r.min_doc_id), int(r.max_doc_id))
                   for r in man.collect())
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2


def test_range_layout_rejects_unknown_string_keys(spark, tmp_path):
    from cryo_spark.tablespec import TableSpec, ColumnSpec

    weird = TableSpec(
        name="weird", key="k",
        columns=(ColumnSpec("k", "str"), ColumnSpec("v", "int64")),
    )
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    with pytest.raises(ValueError, match="numeric key form"):
        layout.plan_chunks(df, 100, spec=weird, layout="range")
