"""Streaming exact dedup: first-wins, in-horizon drop, state eviction.

Files are fed one per micro-batch so the watermark advances between
batches deterministically (same protocol as test_windowed_stream):
a duplicate key arriving while its state is live is dropped; once the
watermark passes the key's event time + delay the state is evicted and
the key may be emitted again (cross-horizon dedup is the batch layer's
job).
"""

from __future__ import annotations

import datetime

from cryo_spark import streaming

_DDL = "ts timestamp, doc_id string, value long"
_BASE = datetime.datetime(2026, 1, 1)


def _write(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "ts": pa.array(
                [_BASE + datetime.timedelta(seconds=off) for off, _, _ in rows],
                pa.timestamp("us"),
            ),
            "doc_id": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.int64()),
        }),
        path,
    )


def test_dedup_stream_drops_in_horizon_and_evicts(spark, tmp_path):
    in_root = tmp_path / "in"
    in_root.mkdir()
    events = (
        spark.readStream.schema(_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_root))
    )
    out = streaming.dedup_stream(events, keys=("doc_id",), watermark="10 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # batch 1: A appears twice IN one batch -> exactly one survives;
        # B passes. Watermark after the batch: max_ts 3 - 10 < 0 -> 0.
        _write(str(in_root / "f1.parquet"), [(1, "A", 10), (2, "A", 20), (3, "B", 1)])
        q.processAllAvailable()
        # batch 2: A again while its state is live (wm 0 <= 1+10) ->
        # dropped; C at ts 30 passes and advances the watermark to 20,
        # which evicts A (expiry 11) and B (expiry 13).
        _write(str(in_root / "f2.parquet"), [(5, "A", 99), (30, "C", 3)])
        q.processAllAvailable()
        # batch 3: A after eviction -> re-emitted (by design: the
        # horizon bounds the state, cross-horizon dedup is batch-layer).
        _write(str(in_root / "f3.parquet"), [(25, "A", 7)])
        q.processAllAvailable()
        rows = [
            ((r["ts"] - _BASE).seconds, r["doc_id"], r["value"])
            for r in spark.sql("SELECT * FROM dedup_stream").collect()
        ]
        a_rows = sorted(t for t in rows if t[1] == "A")
        # exactly two A emissions: one from batch 1, one post-eviction
        assert len(a_rows) == 2
        assert a_rows[0][0] in (1, 2)  # first-in-batch wins (either dup, once)
        assert a_rows[1] == (25, "A", 7)
        assert (3, "B", 1) in rows
        assert (30, "C", 3) in rows
        # the in-horizon duplicate (ts 5) never surfaced
        assert not any(t[0] == 5 for t in rows)
        assert len(rows) == 4
    finally:
        q.stop()
