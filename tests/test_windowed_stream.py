"""Tumbling-window streaming agg: exactly-once finalized windows + late drop.

Files are fed one per micro-batch so the watermark advances between
batches deterministically: a window emits exactly when the watermark
passes its end, and an event older than the watermark never revives an
already-finalized window.
"""

from __future__ import annotations

import datetime

from cryo_spark import streaming

_DDL = "ts timestamp, user_id long, value long"
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
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "value": pa.array([r[2] for r in rows], pa.int64()),
        }),
        path,
    )


def test_windowed_stream_finalizes_and_drops_late(spark, tmp_path):
    in_root = tmp_path / "in"
    in_root.mkdir()
    events = (
        spark.readStream.schema(_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_root))
    )
    out = streaming.windowed_stream_agg(
        events, window="10 seconds", watermark="5 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("win_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # batch 1: two events in window [0, 10) plus one at 35 that will
        # advance the watermark to 30 — past window [0,10)'s end
        _write(str(in_root / "f1.parquet"), [(2, 1, 10), (3, 1, 20), (35, 2, 5)])
        q.processAllAvailable()
        # batch 2: a LATE event for [0,10) (ts 4 < wm 30: dropped) and an
        # event at 45 advancing the watermark to 40, finalizing [30, 40)
        _write(str(in_root / "f2.parquet"), [(4, 1, 999), (45, 2, 7)])
        q.processAllAvailable()
        rows = {
            (r["win_start"] - _BASE).seconds: r
            for r in spark.sql("SELECT * FROM win_stream").collect()
        }
        # [0,10): finalized with the two ON-TIME events only
        assert rows[0]["n_events"] == 2 and rows[0]["sum_value"] == 30
        # [30,40): finalized by batch 2's watermark advance
        assert rows[30]["n_events"] == 1 and rows[30]["sum_value"] == 5
        # [40,50): still open (wm 40 == its start), must NOT be emitted
        assert 40 not in rows
    finally:
        q.stop()


def test_windowed_stream_keys_split_counts(spark, tmp_path):
    in_root = tmp_path / "in"
    in_root.mkdir()
    events = (
        spark.readStream.schema(_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_root))
    )
    out = streaming.windowed_stream_agg(
        events, window="10 seconds", watermark="0 seconds", keys=("user_id",)
    )
    q = (
        out.writeStream.format("memory")
        .queryName("win_keys")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        _write(str(in_root / "f1.parquet"), [(1, 1, 1), (2, 1, 1), (3, 7, 1)])
        q.processAllAvailable()
        _write(str(in_root / "f2.parquet"), [(60, 9, 1)])  # wm -> 60 finalizes [0,10)
        q.processAllAvailable()
        got = {
            (r["user_id"], (r["win_start"] - _BASE).seconds): r["n_events"]
            for r in spark.sql("SELECT * FROM win_keys").collect()
        }
        assert got[(1, 0)] == 2 and got[(7, 0)] == 1
    finally:
        q.stop()
