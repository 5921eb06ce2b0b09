"""Stateful streaming sessionization (applyInPandasWithState).

The streaming counterpart of the batch ``sessionization`` query: same
gap rule, sessions emitted exactly once when the event-time watermark
proves no admissible event can extend them. Files are fed one at a
time with a drain between them, so watermark progress (end of batch
N) drives timeout flushes (during batch N+1) deterministically.
"""

from __future__ import annotations

import datetime

from cryo_spark import streaming

_DDL = "event_id long, ts timestamp, user_id long, value double"
_BASE = datetime.datetime(2026, 1, 1)


def _write(spark, path, rows):
    # one parquet FILE per feed (the file stream source lists files, not
    # Spark output directories)
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [_BASE + datetime.timedelta(seconds=off) for _, off, _ in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, path)


def _ts(off):
    return _BASE + datetime.timedelta(seconds=off)


def test_sessionize_stream_exact_sessions(spark, tmp_path):
    in_root = tmp_path / "in"
    in_root.mkdir()
    events = spark.readStream.schema(_DDL).option("maxFilesPerTrigger", 1).parquet(
        str(in_root)
    )
    out = streaming.sessionize_stream(events, gap_s=60, watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # batch 1: u1 has two sessions in ONE batch (gap 150 > 60 splits);
        # u2 opens a session later batches must flush by timeout
        _write(spark, str(in_root / "f1.parquet"), [
            (1, 0, 1.0), (1, 30, 1.0), (1, 50, 1.0), (1, 200, 1.0), (1, 210, 1.0),
            (2, 0, 2.0),
        ])
        q.processAllAvailable()
        # watermark is now 210. u1's open session (200-210) is extended
        # ACROSS batches by an admissible event (230 >= wm, 230-210 <= 60);
        # u2's timeout (60 < wm) fires
        _write(spark, str(in_root / "f2.parquet"), [
            (1, 230, 1.0),
            (3, 1000, 4.0), (3, 1010, 4.0),
        ])
        q.processAllAvailable()
        # wm 1010: flushes u1's extended session (timeout 290)
        _write(spark, str(in_root / "f3.parquet"), [(6, 5000, 0.5)])
        q.processAllAvailable()
        # wm 5000: flushes u3 (timeout 1070); then wm 9000 flushes u6.
        # u7 stays open (timeout 9060 > 9000) and must NOT be emitted.
        _write(spark, str(in_root / "f4.parquet"), [(7, 9000, 0.5)])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.value_sum)
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    assert rows == {
        (1, _ts(0), _ts(50), 3, 3.0),
        (1, _ts(200), _ts(230), 3, 3.0),
        (2, _ts(0), _ts(0), 1, 2.0),
        (3, _ts(1000), _ts(1010), 2, 8.0),
        (6, _ts(5000), _ts(5000), 1, 0.5),
    }
    # exactly-once: no duplicate emissions for any session
    n = spark.sql("SELECT count(*) c FROM sess_stream").first().c
    assert n == 5
