"""Hidden partitioning (Iceberg partition transforms).

A TableSpec may declare ``partition_transform`` — day(ts), bucket(n,
col) or truncate(w, col) — instead of an identity partition column.
Partition values are DERIVED identically at plan time (histogram /
bounds) and pack time, never stored; the underlying column still
round-trips bit-identically as data. Iceberg calls this hidden
partitioning: queries and writers never see (or mistype) a partition
column.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cryo_spark import engine
from cryo_spark.tablespec import (ColumnSpec, TableSpec, _parse_transform,
                                  partition_values)

DAY_US = 86_400_000_000


def _spec(transform: str | None = None, **kw) -> TableSpec:
    return TableSpec(
        name="evd", key="event_id",
        columns=(ColumnSpec("event_id", "int64"),
                 ColumnSpec("ts", "timestamp"),
                 ColumnSpec("user_id", "int64")),
        partition_transform=transform, **kw)


def _events_table(n: int = 4_000, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = 1_704_067_200_000_000
    micros = base + np.cumsum(rng.integers(50_000_000, 150_000_000, n))
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(micros, type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 100, n).astype(np.int64)),
    })


# ---------------------------------------------------------------------------
# grammar / validation
# ---------------------------------------------------------------------------

def test_transform_grammar():
    assert _parse_transform("day(ts)") == ("day", ("ts",))
    assert _parse_transform("hour(ts)") == ("hour", ("ts",))
    assert _parse_transform("year(ts)") == ("year", ("ts",))
    assert _parse_transform("month(ts)") == ("month", ("ts",))
    assert _parse_transform("bucket(16, user_id)") == ("bucket", ("16", "user_id"))
    assert _parse_transform(" truncate(3, name) ") == ("truncate", ("3", "name"))
    for bad in ("day()", "bucket(user_id)", "bucket(0, x)", "week(ts)",
                "truncate(x, y)"):
        with pytest.raises(ValueError):
            _parse_transform(bad)


def test_transform_validation():
    with pytest.raises(ValueError, match="mutually exclusive"):
        TableSpec(name="x", key="k",
                  columns=(ColumnSpec("k", "str"), ColumnSpec("s", "str")),
                  partition_col="s", partition_transform="truncate(1, s)")
    with pytest.raises(ValueError, match="unknown column"):
        _spec("day(nope)")
    with pytest.raises(ValueError, match="needs a column of kind"):
        _spec("day(user_id)")  # day() wants a timestamp
    with pytest.raises(ValueError, match="needs a column of kind"):
        _spec("truncate(2, user_id)")  # truncate() wants str


def test_partition_values_null_sentinel():
    spec = _spec("day(ts)")
    t = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([2 * DAY_US + 5, None], pa.timestamp("us")),
        "user_id": pa.array([0, 0], pa.int64()),
    })
    assert partition_values(t, spec).to_pylist() == ["2", "__null__"]


# ---------------------------------------------------------------------------
# end-to-end freeze/decode under each transform
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("transform,chunk_by", [
    ("day(ts)", "hash"),
    ("day(ts)", "range"),
    ("bucket(8, user_id)", "hash"),
])
def test_hidden_partition_roundtrip(spark, tmp_path, transform, chunk_by):
    t = _events_table()
    src_path = str(tmp_path / "ev.parquet")
    pq.write_table(t, src_path)
    spec = _spec(transform)
    out = str(tmp_path / f"out_{chunk_by}")
    s = engine.freeze(spark, src_path, out, target_tokens=500, spec=spec,
                      chunk_by=chunk_by)
    assert s["n_failed"] == 0
    man = engine.read_manifest(spark, out)
    nparts = man.select("partition_id").distinct().count()
    micros = t.column("ts").cast(pa.int64()).to_numpy()
    if transform.startswith("day"):
        assert nparts == len(set(micros // DAY_US))
    else:
        assert 1 < nparts <= 8
    dec = engine.decode(engine.read_encoded(spark, out), spec=spec)
    got = sorted(dec.collect(), key=lambda r: r.event_id)
    want = sorted(spark.read.parquet(src_path).collect(),
                  key=lambda r: r.event_id)
    assert got == want


def test_bucket_transform_rejects_range_layout(spark, tmp_path):
    # bucket() has no SQL twin for the range-bounds aggregation
    t = _events_table(500)
    src_path = str(tmp_path / "ev.parquet")
    pq.write_table(t, src_path)
    with pytest.raises(Exception, match="bucket.*hash layout"):
        engine.freeze(spark, src_path, str(tmp_path / "out"),
                      target_tokens=500, spec=_spec("bucket(4, user_id)"),
                      chunk_by="range")


def test_spec_json_roundtrip_with_transform(tmp_path):
    spec = _spec("day(ts)")
    rt = TableSpec.from_json(spec.to_json())
    assert rt == spec
    # specs without a transform serialize as before (no new key)
    assert "partition_transform" not in _spec(None).to_dict()


def test_hidden_partition_resume(spark, tmp_path):
    """Resume over a hidden-partitioned output re-encodes nothing."""
    t = _events_table(1_000)
    src_path = str(tmp_path / "ev.parquet")
    pq.write_table(t, src_path)
    spec = _spec("day(ts)")
    out = str(tmp_path / "out")
    s1 = engine.freeze(spark, src_path, out, target_tokens=500, spec=spec)
    assert s1["n_failed"] == 0 and s1["n_encoded"] > 0
    s2 = engine.freeze(spark, src_path, out, target_tokens=500, spec=spec)
    assert s2["n_encoded"] == 0


@pytest.mark.parametrize("transform", ["year(ts)", "month(ts)", "day(ts)",
                                       "hour(ts)"])
def test_spark_and_arrow_transforms_agree(spark, transform):
    """partition_expr (SQL side, range/zorder bounds) and
    partition_values (arrow side, histogram/pack) produce identical
    strings — including pre-1970 negatives."""
    import datetime

    from cryo_spark.tablespec import partition_expr

    vals = [datetime.datetime(1969, 12, 31, 23, 0),
            datetime.datetime(1970, 1, 1),
            datetime.datetime(2024, 3, 15, 7, 30),
            datetime.datetime(2025, 12, 31, 23, 59)]
    spec = _spec(transform)
    t = pa.table({
        "event_id": pa.array(range(len(vals)), pa.int64()),
        "ts": pa.array(vals, pa.timestamp("us")),
        "user_id": pa.array([0] * len(vals), pa.int64()),
    })
    want = partition_values(t, spec).to_pylist()
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vals)],
        "event_id long, ts timestamp_ntz, user_id long")
    got = [r.p for r in
           df.select(partition_expr(spec).alias("p"))
           .orderBy("event_id").collect()]
    assert got == want
