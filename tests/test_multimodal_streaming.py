"""Multimodal binary plumbing + streaming incremental encode tests."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from cryo_spark import engine, multimodal, streaming
from cryo_spark.fixtures import write_sequences


def test_multimodal_stub_raises_without_fake(spark):
    df = spark.createDataFrame(
        [("m1", b"\xff\xd8\xff\xe0fakejpegbytes")], "media_id string, payload binary"
    )
    os.environ.pop("CRYO_SPARK_FAKE_MEDIA", None)
    with pytest.raises(Exception) as exc:
        multimodal.extract_media_meta(df).collect()
    assert "NotImplementedError" in str(exc.value) or "Pillow" in str(exc.value)


def test_resize_media_raises_without_fake(spark):
    # must run BEFORE any fake-env test: reused python workers keep the
    # process env they were forked with, so once a fake-env task has
    # launched a worker pool the stub check would see stale env
    df = spark.createDataFrame([("m1", b"xx")], "media_id string, payload binary")
    os.environ.pop("CRYO_SPARK_FAKE_MEDIA", None)
    with pytest.raises(Exception) as exc:
        multimodal.resize_media(df, 4, 4).collect()
    assert "NotImplementedError" in str(exc.value) or "Pillow" in str(exc.value)


def test_multimodal_fake_decode_plumbing(spark):
    rows = [(f"m{i}", bytes([i % 256]) * (100 + i * 7)) for i in range(50)]
    df = spark.createDataFrame(rows, "media_id string, payload binary").repartition(4)
    os.environ["CRYO_SPARK_FAKE_MEDIA"] = "1"
    # env must reach executors: local mode workers inherit driver env at
    # fork, but set it via task-side closure to be deployment-safe
    spark.sparkContext.environment["CRYO_SPARK_FAKE_MEDIA"] = "1"
    try:
        out = multimodal.extract_media_meta(df).collect()
    finally:
        os.environ.pop("CRYO_SPARK_FAKE_MEDIA", None)
    assert len(out) == 50
    by_id = {r["media_id"]: r for r in out}
    assert by_id["m3"]["n_bytes"] == 121
    for r in out:
        assert r["n_channels"] == 3
        assert 1 <= r["width"] <= 640 and 1 <= r["height"] <= 480
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-5
    # determinism
    os.environ["CRYO_SPARK_FAKE_MEDIA"] = "1"
    try:
        out2 = multimodal.extract_media_meta(df).collect()
    finally:
        os.environ.pop("CRYO_SPARK_FAKE_MEDIA", None)
    assert sorted(map(str, out)) == sorted(map(str, out2))


def test_resize_media_fake_plumbing(spark):
    """Fake resize: deterministic strided gather, exact output shape;
    empty payloads resize to all-zero bytes."""
    rows = [(f"m{i}", bytes(range(i % 251)) * 3) for i in range(1, 30)]
    rows.append(("empty", b""))
    df = spark.createDataFrame(rows, "media_id string, payload binary").repartition(3)
    os.environ["CRYO_SPARK_FAKE_MEDIA"] = "1"
    spark.sparkContext.environment["CRYO_SPARK_FAKE_MEDIA"] = "1"
    try:
        out = multimodal.resize_media(df, width=8, height=6).collect()
    finally:
        os.environ.pop("CRYO_SPARK_FAKE_MEDIA", None)
        spark.sparkContext.environment.pop("CRYO_SPARK_FAKE_MEDIA", None)
    assert len(out) == 30
    by_id = {r["media_id"]: r for r in out}
    for r in out:
        assert r["width"] == 8 and r["height"] == 6
        assert len(r["payload"]) == 8 * 6 * 3
    assert bytes(by_id["empty"]["payload"]) == b"\x00" * (8 * 6 * 3)
    # strided-gather definition: out[j] = payload[(j * len) // out_len]
    src = bytes(range(10)) * 3
    exp = bytes(src[(j * len(src)) // (8 * 6 * 3)] for j in range(8 * 6 * 3))
    assert bytes(by_id["m10"]["payload"]) == exp


def test_frame_sample_plan():
    assert multimodal.frame_sample_plan(0, 5) == []
    assert multimodal.frame_sample_plan(1, 5) == [0]
    assert multimodal.frame_sample_plan(10, 3) == [0, 3, 6, 9]
    assert multimodal.frame_sample_plan(11, 3) == [0, 3, 6, 9, 10]


def test_stream_encode_incremental(spark, tmp_path):
    """Files landing in two waves encode exactly once each, decodable."""
    inp = tmp_path / "stream_in"
    inp.mkdir()
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")

    write_sequences(str(inp / "a.parquet"), n=500, seed=1)
    q = streaming.stream_encode(spark, str(inp), out, ckpt, target_tokens=50_000)
    q.awaitTermination(120)

    man1 = spark.read.parquet(f"{out}/manifest")
    chunks1 = man1.select("chunk_id").distinct().count()
    assert chunks1 >= 1

    # second wave: new file only
    write_sequences(str(inp / "b.parquet"), n=300, seed=2)
    q = streaming.stream_encode(spark, str(inp), out, ckpt, target_tokens=50_000)
    q.awaitTermination(120)

    dec = engine.decode(engine.read_encoded(spark, out))
    assert dec.count() == 800
    # batch-namespaced chunk ids never collide
    man = spark.read.parquet(f"{out}/manifest")
    runs = man.select("run").distinct().count()
    assert runs == 2
    # a re-trigger with no new files encodes nothing new
    q = streaming.stream_encode(spark, str(inp), out, ckpt, target_tokens=50_000)
    q.awaitTermination(120)
    assert spark.read.parquet(f"{out}/manifest").select("run").distinct().count() == 2


def test_stream_encode_embeddings_spec(spark, tmp_path):
    """stream_encode is spec-driven: the embeddings family streams through
    the same kernels and decodes bit-identical."""
    from pyspark.sql import functions as F

    from cryo_spark.fixtures import write_embeddings
    from cryo_spark.tablespec import EMBEDDINGS

    inp = tmp_path / "emb_in"
    inp.mkdir()
    out = str(tmp_path / "emb_out")
    ckpt = str(tmp_path / "emb_ckpt")

    write_embeddings(str(inp / "a.parquet"), n=600, dim=16, seed=1)
    q = streaming.stream_encode(spark, str(inp), out, ckpt,
                                target_tokens=3_000, spec=EMBEDDINGS)
    q.awaitTermination(120)
    write_embeddings(str(inp / "b.parquet"), n=400, dim=16, seed=2)
    q = streaming.stream_encode(spark, str(inp), out, ckpt,
                                target_tokens=3_000, spec=EMBEDDINGS)
    q.awaitTermination(120)

    dec = engine.decode(engine.read_encoded(spark, out), spec=EMBEDDINGS)
    src = spark.read.parquet(str(inp))
    # seeds 1 and 2 share vec_id ranges; compare multiset equality via
    # (vec_id, label, embedding) group counts
    key = ["vec_id", "label", "embedding"]
    d = dec.groupBy(*key).count().alias("d")
    s = src.groupBy(*key).count().alias("s")
    assert dec.count() == 1000
    assert d.join(s, key, "full_outer").filter(
        (F.col("d.count").isNull()) | (F.col("s.count").isNull())
        | (F.col("d.count") != F.col("s.count"))
    ).count() == 0


def test_stream_compact_vacuum_lifecycle(spark, tmp_path):
    """The steady-state maintenance story: stream batches accumulate many
    undersized runs/chunks; compact merges them into target-sized chunks;
    vacuum reclaims the fully-retired run dirs; the stream keeps landing
    new batches afterwards and every read stays bit-identical."""
    import os

    from cryo_spark import compact, vacuum

    inp = tmp_path / "lc_in"
    inp.mkdir()
    out = str(tmp_path / "lc_out")
    ckpt = str(tmp_path / "lc_ckpt")

    for i, (n, seed) in enumerate([(400, 11), (300, 12), (350, 13)]):
        write_sequences(str(inp / f"w{i}.parquet"), n=n, seed=seed)
        q = streaming.stream_encode(spark, str(inp), out, ckpt,
                                    target_tokens=20_000)
        q.awaitTermination(120)
    before = sorted(
        (r.doc_id, tuple(r.tokens), r.n_tok, r.source)
        for r in engine.decode(engine.read_encoded(spark, out)).collect()
    )
    assert len(before) == 1050

    s = compact(spark, out, target_tokens=400_000)
    assert s["run"] is not None and s["n_compacted"] >= 3
    v = vacuum(spark, out)
    # every stream run was fully retired by the compaction
    assert v["n_deleted_runs"] == 3 and v["bytes_reclaimed"] > 0
    assert sorted(
        (r.doc_id, tuple(r.tokens), r.n_tok, r.source)
        for r in engine.decode(engine.read_encoded(spark, out)).collect()
    ) == before
    assert sorted(
        (r.doc_id, tuple(r.tokens), r.n_tok, r.source)
        for r in engine.decode_frozen(spark, out).collect()
    ) == before

    # the stream continues after maintenance: a fourth wave lands in a
    # fresh run (batch-namespaced chunk ids never collide with the
    # compaction run's) and both read paths see the union
    write_sequences(str(inp / "w3.parquet"), n=200, seed=14)
    q = streaming.stream_encode(spark, str(inp), out, ckpt,
                                target_tokens=20_000)
    q.awaitTermination(120)
    assert engine.decode(engine.read_encoded(spark, out)).count() == 1250
    assert engine.decode_frozen(spark, out).count() == 1250
