"""Timestamp column kind + delta-of-delta codec.

The events family (event streams with tz-free microsecond timestamps)
goes through the engine as int64 epoch-micros: the int codec family
applies — 'dod' (delta-of-delta, the Gorilla timestamp idea) collapses
near-regular spacing — and the decode rebuilds timestamp[us] arrays
bit-identically, nulls included. Zone maps hold integer micros, so
datetime filter values prune chunks exactly.
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from cryo_spark import collect, freeze
from cryo_spark.codecs import choose_int, decode_any, encode_any
from cryo_spark.engine import read_manifest
from cryo_spark.tablespec import EVENTS

EPOCH = datetime.datetime(1970, 1, 1)


# ---------------------------------------------------------------------------
# dod codec
# ---------------------------------------------------------------------------

def test_dod_regular_ramp_is_tiny():
    # 100k perfectly regular timestamps: every second difference is 0,
    # so the packed payload is empty — header + two anchors only
    v = 1_704_067_200_000_000 + np.arange(100_000, dtype=np.int64) * 1_000_000
    blob = encode_any("dod", v)
    assert len(blob) < 64
    np.testing.assert_array_equal(decode_any(blob), v)


def test_dod_selector_wins_on_regular_spacing():
    v = 1_704_067_200_000_000 + np.arange(50_000, dtype=np.int64) * 60_000_000
    choice = choose_int(v)
    assert choice.codec_id.startswith("dod")
    np.testing.assert_array_equal(decode_any(choice.payload), v)


def test_dod_wrapping_extremes_roundtrip():
    # second differences overflow int64 — all arithmetic must wrap
    # consistently on both sides
    v = np.array([-(2**63), 2**63 - 1, -(2**63), 0, 2**62, -(2**62), 7],
                 dtype=np.int64)
    np.testing.assert_array_equal(decode_any(encode_any("dod", v)), v)


# ---------------------------------------------------------------------------
# events table end-to-end
# ---------------------------------------------------------------------------

def _write_events(path: str, n: int = 5_000) -> pa.Table:
    rng = np.random.default_rng(7)
    base = 1_704_067_200_000_000  # 2024-01-01 in micros
    micros = base + np.cumsum(rng.integers(100_000, 2_000_000, n))
    ts = pa.array(micros, type=pa.timestamp("us")).to_pylist()
    # a few null timestamps: validity must survive the int64 cast
    null_at = set(rng.integers(0, n, 25).tolist())
    ts = [None if i in null_at else t for i, t in enumerate(ts)]
    types = ["view", "click", "purchase", "error"]
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 500, n).astype(np.int64)),
        "event_type": pa.array([types[i % 4] for i in range(n)]),
        "value": pa.array(rng.random(n) * 100.0, type=pa.float64()),
        "props": pa.array([f'{{"k": {i % 97}}}' for i in range(n)]),
    })
    pq.write_table(t, path)
    return t


@pytest.fixture(scope="module")
def events_frozen(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("events")
    src = str(d / "events.parquet")
    _write_events(src)
    out = str(d / "out")
    s = freeze(spark, src, out, target_tokens=400, spec=EVENTS)
    assert s["n_failed"] == 0
    return src, out


def test_events_roundtrip_bit_identical(spark, events_frozen):
    src, out = events_frozen
    raw = spark.read.parquet(src)
    dec = collect(spark, out, spec=EVENTS)
    cols = [c.name for c in EVENTS.columns]
    want = sorted(raw.select(cols).collect(), key=lambda r: r.event_id)
    got = sorted(dec.select(cols).collect(), key=lambda r: r.event_id)
    assert got == want


def test_ts_manifest_stats_are_integer_micros(spark, events_frozen):
    _, out = events_frozen
    man = read_manifest(spark, out).filter(
        (F.col("column") == "ts") & (F.col("status") == "ok"))
    r = man.agg(F.min(F.col("min_value").cast("long")).alias("lo"),
                F.max(F.col("max_value").cast("long")).alias("hi")).first()
    assert r.lo is not None and 1_704_067_200_000_000 <= r.lo <= r.hi


def test_ts_filtered_collect_with_datetime_values(spark, events_frozen):
    src, out = events_frozen
    raw = spark.read.parquet(src)
    cut = datetime.datetime(2024, 1, 1, 1, 0, 0)
    hi = datetime.datetime(2024, 1, 1, 1, 30, 0)
    for filters, pred in [
        ([("ts", ">=", cut)], F.col("ts") >= F.lit(cut)),
        ([("ts", "between", (cut, hi))],
         (F.col("ts") >= F.lit(cut)) & (F.col("ts") <= F.lit(hi))),
    ]:
        got = sorted(r.event_id for r in
                     collect(spark, out, filters=filters, spec=EVENTS)
                     .select("event_id").collect())
        want = sorted(r.event_id for r in
                      raw.filter(pred).select("event_id").collect())
        assert got == want and len(want) > 0, filters


def test_ts_filter_tz_aware_matches_naive_utc(spark, events_frozen):
    """A tz-aware filter value means an absolute instant: it must
    select exactly the rows its naive-UTC equivalent selects, with the
    zone-map prune and the residual row predicate agreeing (a
    normalization applied to only one of the two paths silently drops
    chunks whose rows the row filter would keep)."""
    src, out = events_frozen
    raw = spark.read.parquet(src)
    naive = datetime.datetime(2024, 1, 1, 1, 0, 0)  # UTC wall clock
    ist = datetime.timezone(datetime.timedelta(hours=5, minutes=30))
    aware = naive.replace(tzinfo=datetime.timezone.utc).astimezone(ist)
    want = sorted(r.event_id for r in
                  raw.filter(F.col("ts") >= F.lit(naive))
                  .select("event_id").collect())
    assert len(want) > 0
    for cut in (aware, naive):
        got = sorted(r.event_id for r in
                     collect(spark, out, filters=[("ts", ">=", cut)],
                             spec=EVENTS).select("event_id").collect())
        assert got == want, cut
    hi_aware = (naive + datetime.timedelta(minutes=30)) \
        .replace(tzinfo=datetime.timezone.utc).astimezone(ist)
    got = sorted(r.event_id for r in
                 collect(spark, out,
                         filters=[("ts", "between", (aware, hi_aware))],
                         spec=EVENTS).select("event_id").collect())
    want_between = sorted(
        r.event_id for r in raw.filter(
            (F.col("ts") >= F.lit(naive))
            & (F.col("ts") <= F.lit(naive + datetime.timedelta(minutes=30)))
        ).select("event_id").collect())
    assert got == want_between and len(want_between) > 0


def test_ts_zone_map_actually_prunes(spark, tmp_path):
    # a selective ts range must decode strictly fewer chunks than exist.
    # Needs a layout where chunk key ranges track time: event_id grows
    # with ts, so chunk_by='range' gives contiguous ts spans per chunk
    # (the hash layout scatters keys — every chunk spans all of time)
    from cryo_spark.engine import _zone_map_prune, read_encoded

    src = str(tmp_path / "events.parquet")
    _write_events(src)
    out = str(tmp_path / "out")
    s = freeze(spark, src, out, target_tokens=400, spec=EVENTS,
               chunk_by="range")
    assert s["n_failed"] == 0
    enc = read_encoded(spark, out)
    man = read_manifest(spark, out)
    total = enc.select("partition_id", "chunk_id").distinct().count()
    cut = datetime.datetime(2024, 1, 1, 1, 0, 0)
    pruned = _zone_map_prune(enc, [("ts", ">=", cut)], EVENTS, man=man)
    kept = pruned.select("partition_id", "chunk_id").distinct().count()
    assert 0 < kept < total
    # and the filtered read over that layout is still exact
    raw = spark.read.parquet(src)
    got = sorted(r.event_id for r in
                 collect(spark, out, filters=[("ts", ">=", cut)], spec=EVENTS)
                 .select("event_id").collect())
    want = sorted(r.event_id for r in
                  raw.filter(F.col("ts") >= F.lit(cut))
                  .select("event_id").collect())
    assert got == want and len(want) > 0


def test_stream_encode_events_spec(spark, tmp_path):
    """stream_encode is spec-driven: the events family (timestamp kind)
    streams through the same kernels and decodes bit-identical."""
    from cryo_spark import engine, streaming

    inp = tmp_path / "ev_in"
    inp.mkdir()
    out = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")
    _write_events(str(inp / "a.parquet"), n=800)
    q = streaming.stream_encode(spark, str(inp), out, ckpt,
                                target_tokens=300, spec=EVENTS)
    q.awaitTermination(120)
    raw = spark.read.parquet(str(inp / "a.parquet"))
    dec = engine.decode(engine.read_encoded(spark, out), spec=EVENTS)
    cols = [c.name for c in EVENTS.columns]
    want = sorted(raw.select(cols).collect(), key=lambda r: r.event_id)
    got = sorted(dec.select(cols).collect(), key=lambda r: r.event_id)
    assert got == want
