"""Streaming Count-Min sketch: bounded state, exact merged counts.

Files are fed one per micro-batch; after both batches the complete-mode
sink's sketch must equal the brute-force sketch of every bigram seen —
the streaming merge (stateful sum over <= d*w cells) adds nothing and
loses nothing relative to the batch kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from cryo_spark import streaming
from cryo_spark.suite import _CMS_P, _CMS_PARAMS, _CMS_V, _CMS_W

_DDL = "doc_id string, tokens array<int>"


def _write(path, docs):
    pq.write_table(
        pa.table({
            "doc_id": pa.array([f"d{i}" for i in range(len(docs))]),
            "tokens": pa.array(docs, pa.list_(pa.int32())),
        }),
        path,
    )


def _brute(docs):
    sketch = np.zeros((len(_CMS_PARAMS), _CMS_W), dtype=np.int64)
    for doc in docs:
        for t1, t2 in zip(doc, doc[1:]):
            k = (t1 * _CMS_V + t2) % _CMS_P
            for j, a, b in _CMS_PARAMS:
                sketch[j][((a * k + b) % _CMS_P) % _CMS_W] += 1
    return sketch


def test_cms_stream_matches_brute_force_across_batches(spark, tmp_path):
    rng = np.random.default_rng(5)
    batch1 = [rng.integers(0, _CMS_V, size=int(n)).tolist()
              for n in rng.integers(0, 30, size=40)]
    batch2 = [rng.integers(0, _CMS_V, size=int(n)).tolist()
              for n in rng.integers(1, 30, size=40)]
    in_root = tmp_path / "in"
    in_root.mkdir()
    _write(str(in_root / "b1.parquet"), batch1)

    seqs = (
        spark.readStream.schema(_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_root))
    )
    q = (
        streaming.cms_stream(seqs)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(str(in_root / "b2.parquet"), batch2)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM cms_stream").collect()
    finally:
        q.stop()
    got = np.zeros((len(_CMS_PARAMS), _CMS_W), dtype=np.int64)
    for r in rows:
        got[r["j"]][r["bucket"]] = r["cnt"]
    assert np.array_equal(got, _brute(batch1 + batch2))
