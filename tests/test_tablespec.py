"""TableSpec-driven engine: a second table family through the real path.

The reference is schema-driven — every dataset declares its columns once
and collect/freeze are generic over them
(/root/reference/crates/freeze/src/datasets/*.rs). These tests prove the
same property here: the EMBEDDINGS spec (int64 key, list<float32>
payload, no partition column) runs the identical plan→pack→shuffle→
encode→manifest→decode pipeline as the default sequences spec, with the
float codec family picked per chunk and the round trip bit-identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from cryo_spark import engine, layout
from cryo_spark.fixtures import generate_embeddings, write_embeddings
from cryo_spark.tablespec import EMBEDDINGS, SEQUENCES, ColumnSpec, TableSpec

N = 4_000
DIM = 32
TARGET = 16_000  # flat float elements per chunk -> ~8 chunks


@pytest.fixture(scope="module")
def embeddings_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("emb") / "embeddings.parquet")
    return write_embeddings(path, n=N, dim=DIM)


def test_embeddings_freeze_roundtrip(spark, embeddings_path, tmp_path):
    out = str(tmp_path / "emb_out")
    s = engine.freeze(spark, embeddings_path, out, target_tokens=TARGET,
                      spec=EMBEDDINGS)
    assert s["n_encoded"] >= 5
    assert s["n_failed"] == 0
    assert s["tokens"] == N * DIM  # flat element count rides `tokens`
    enc = engine.read_encoded(spark, out)
    dec = engine.decode(enc, spec=EMBEDDINGS)
    src = spark.read.parquet(embeddings_path)
    assert dec.count() == N
    bad = (
        dec.alias("d").join(src.alias("s"), "vec_id", "full_outer")
        .filter(
            F.col("d.label").isNull() | F.col("s.label").isNull()
            | (F.col("d.label") != F.col("s.label"))
            | (F.col("d.embedding") != F.col("s.embedding"))
        ).count()
    )
    assert bad == 0


def test_embeddings_codec_lineage(spark, embeddings_path, tmp_path):
    """Manifest lineage: float codecs on embedding, int codecs elsewhere."""
    out = str(tmp_path / "emb_lineage")
    engine.freeze(spark, embeddings_path, out, target_tokens=TARGET,
                  spec=EMBEDDINGS)
    man = spark.read.parquet(f"{out}/manifest")
    rows = man.select("column", "codec_id").collect()
    by_col: dict[str, set[str]] = {}
    for r in rows:
        by_col.setdefault(r["column"], set()).add(r["codec_id"])
    assert set(by_col) == {"vec_id", "embedding", "label"}
    for cid in by_col["embedding"]:
        base = cid.split("|")[0].split("+")[0]
        assert base in ("falp", "fbss", "fplain"), cid
    for cid in by_col["vec_id"] | by_col["label"]:
        base = cid.split("+")[0]
        assert base in ("plain", "bitpack", "for", "delta", "rle", "dict",
                        "dictf"), cid


def test_embeddings_size_beats_parquet_zstd(spark, embeddings_path, tmp_path):
    import os

    import pyarrow.parquet as pq

    out = str(tmp_path / "emb_size")
    engine.freeze(spark, embeddings_path, out, target_tokens=TARGET,
                  spec=EMBEDDINGS)
    man = spark.read.parquet(f"{out}/manifest")
    ours = man.agg(F.sum("enc_bytes")).first()[0]
    ref_path = str(tmp_path / "ref_zstd.parquet")
    pq.write_table(generate_embeddings(N, DIM), ref_path, compression="zstd")
    ref = os.path.getsize(ref_path)
    assert ours <= ref * 1.02, f"ours={ours} > parquet+zstd={ref}"


def test_embeddings_nulls_roundtrip(spark):
    """Null list rows and null scalars survive the round trip as nulls."""
    t = pa.table({
        "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
        "embedding": pa.array([[1.5, 2.5], None, [], [0.25]],
                              type=pa.list_(pa.float32())),
        "label": pa.array([7, None, 9, None], pa.int32()),
    })
    df = spark.createDataFrame(t.to_pandas(), EMBEDDINGS.spark_ddl())
    enc = engine.encode(df, target_tokens=100, spec=EMBEDDINGS)
    dec = engine.decode(enc, spec=EMBEDDINGS).orderBy("vec_id").collect()
    assert [r["vec_id"] for r in dec] == [1, 2, 3, 4]
    assert dec[1]["embedding"] is None          # null list != empty list
    assert dec[2]["embedding"] == []
    assert dec[0]["embedding"] == [1.5, 2.5]
    assert [r["label"] for r in dec] == [7, None, 9, None]


def test_decode_column_pruning(spark, embeddings_path, tmp_path):
    out = str(tmp_path / "emb_prune")
    engine.freeze(spark, embeddings_path, out, target_tokens=TARGET,
                  spec=EMBEDDINGS)
    enc = engine.read_encoded(spark, out)
    dec = engine.decode(enc, columns=["vec_id", "label"], spec=EMBEDDINGS)
    assert [f.name for f in dec.schema.fields] == ["vec_id", "label"]
    assert dec.count() == N


def test_plan_determinism_no_partition_col(spark, embeddings_path):
    """A spec without partition_col plans one source group, deterministically
    across input parallelism (the parallelism-invariance contract)."""
    df = spark.read.parquet(embeddings_path)
    p1 = layout.plan_chunks(df, TARGET, spec=EMBEDDINGS)
    p2 = layout.plan_chunks(df.repartition(13), TARGET, spec=EMBEDDINGS)
    assert p1.mapping == p2.mapping
    assert p1.n_chunks == p2.n_chunks
    assert {m[0] for m in p1.mapping} == {""}


def test_unit_weight_spec(spark):
    """weight=None weighs every row 1: total == row count drives chunking."""
    spec = TableSpec(
        name="flat", key="k",
        columns=(ColumnSpec("k", "str"), ColumnSpec("v", "int64")),
    )
    import pandas as pd

    n = 3_000
    pdf = pd.DataFrame({
        "k": [f"k-{i:07d}" for i in range(n)],
        "v": np.arange(n, dtype=np.int64) * 1_000_003,
    })
    df = spark.createDataFrame(pdf, spec.spark_ddl())
    plan = layout.plan_chunks(df, target_tokens=500, spec=spec)
    assert plan.n_chunks >= 4
    enc = engine.encode(df, plan=plan, spec=spec)
    dec = engine.decode(enc, spec=spec)
    assert dec.count() == n
    bad = (
        dec.alias("d").join(df.alias("s"), "k", "full_outer")
        .filter((F.col("d.v") != F.col("s.v"))
                | F.col("d.v").isNull() | F.col("s.v").isNull())
        .count()
    )
    assert bad == 0


def test_documents_freeze_roundtrip(spark, tmp_path):
    """String-payload table (scalar weight, no footer statistic): freeze
    plans via the scan path and round-trips text bit-identical."""
    import pyarrow.parquet as pq

    from cryo_spark.tablespec import DOCUMENTS

    n = 2_000
    rng = np.random.default_rng(11)
    words = ["the", "quick", "brown", "fox", "jumps", "ünïcödé", "数据", ""]
    texts = [
        " ".join(words[j] for j in rng.integers(0, len(words), rng.integers(1, 40)))
        for _ in range(n)
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array([("en", "de", "zh")[i % 3] for i in range(n)]),
        "source": pa.array([("web", "books")[i % 2] for i in range(n)]),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })
    inp = str(tmp_path / "docs.parquet")
    pq.write_table(t, inp, row_group_size=512)
    out = str(tmp_path / "docs_out")
    s = engine.freeze(spark, inp, out, target_tokens=20_000, spec=DOCUMENTS)
    assert s["n_failed"] == 0 and s["n_encoded"] >= 2
    dec = engine.decode(engine.read_encoded(spark, out), spec=DOCUMENTS)
    src = spark.read.parquet(inp)
    assert dec.count() == n
    bad = (
        dec.alias("d").join(src.alias("s"), "doc_id", "full_outer")
        .filter(
            F.col("d.text").isNull() | F.col("s.text").isNull()
            | (F.col("d.text") != F.col("s.text"))
            | (F.col("d.lang") != F.col("s.lang"))
            | (F.col("d.n_chars") != F.col("s.n_chars"))
        ).count()
    )
    assert bad == 0


def test_media_binary_roundtrip(spark, tmp_path):
    """Opaque binary payloads (invalid UTF-8, empty, null) through the
    engine: the string codec family re-typed zero-copy as binary."""
    import pyarrow.parquet as pq

    from cryo_spark.tablespec import MEDIA

    rng = np.random.default_rng(5)
    n = 1_500
    payloads: list[bytes | None] = [
        b"\x89PNG\r\n\x1a\n" + rng.bytes(int(rng.integers(10, 400)))
        for _ in range(n)
    ]
    payloads[7] = b""          # empty payload
    payloads[11] = None        # null payload
    payloads[13] = b"\xff\xfe\x00\x80garbage"  # decidedly not UTF-8
    t = pa.table({
        "media_id": pa.array([f"m-{i:08d}" for i in range(n)]),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array(["image/png" if i % 4 else "image/jpeg"
                          for i in range(n)]),
        "n_bytes": pa.array([len(p) if p is not None else 0
                             for p in payloads], pa.int64()),
    })
    inp = str(tmp_path / "media.parquet")
    pq.write_table(t, inp, row_group_size=256)
    out = str(tmp_path / "media_out")
    s = engine.freeze(spark, inp, out, target_tokens=200, spec=MEDIA)
    assert s["n_failed"] == 0
    dec = engine.decode_frozen(spark, out, spec=MEDIA)
    got = {r["media_id"]: r for r in dec.collect()}
    assert len(got) == n
    for i in (0, 7, 11, 13, n - 1):
        r = got[f"m-{i:08d}"]
        if payloads[i] is None:
            assert r["payload"] is None
        else:
            assert bytes(r["payload"]) == payloads[i], i
    assert sum(len(r["payload"] or b"") for r in got.values()) == sum(
        len(p or b"") for p in payloads
    )


def test_spec_validation():
    with pytest.raises(ValueError, match="unknown column kind"):
        ColumnSpec("x", "decimal")
    cols = (ColumnSpec("k", "str"), ColumnSpec("v", "float64"))
    with pytest.raises(ValueError, match="key must be"):
        TableSpec(name="t", key="missing", columns=cols)
    with pytest.raises(ValueError, match="partition_col"):
        TableSpec(name="t", key="k", columns=cols, partition_col="v")
    with pytest.raises(ValueError, match="weight"):
        TableSpec(name="t", key="k", columns=cols, weight="v")
    assert SEQUENCES.list_column == "tokens"
    assert EMBEDDINGS.list_column == "embedding"
    assert SEQUENCES.packed_ddl().startswith("doc_id string, tokens binary")


def test_int_key_range_requests(spark, embeddings_path, tmp_path):
    """The reference's key-range grammar over a native int64 key: the
    numeric predicate pushes straight down — freeze a range, collect a
    strided subrange, manifest min/max prunes chunks on encoded reads."""
    from cryo_spark.tablespec import EMBEDDINGS

    # vec_id = 7i + 3 for i in [0, N): request an aligned range
    out = str(tmp_path / "emb_range")
    s = engine.freeze(spark, embeddings_path, out, target_tokens=TARGET,
                      spec=EMBEDDINGS, keys="3:7000")
    assert s["n_encoded"] >= 1
    dec = engine.decode(engine.read_encoded(spark, out), spec=EMBEDDINGS)
    ids = sorted(r["vec_id"] for r in dec.select("vec_id").collect())
    expect = [7 * i + 3 for i in range(N) if 3 <= 7 * i + 3 <= 7000]
    assert ids == expect

    # strided collect on the raw parquet source
    df = engine.collect(spark, embeddings_path, keys="3:700:14",
                        spec=EMBEDDINGS)
    got = sorted(r["vec_id"] for r in df.select("vec_id").collect())
    assert got == [v for v in range(3, 700, 14) if (v - 3) % 7 == 0]

    # key-range collect on the ENCODED source: manifest min/max pruning
    df2 = engine.collect(spark, out, keys="3:100", spec=EMBEDDINGS)
    got2 = sorted(r["vec_id"] for r in df2.select("vec_id").collect())
    assert got2 == [v for v in expect if v <= 100]


def test_spec_json_roundtrip():
    """to_dict/from_json inverse for every built-in spec; validation
    still fires on malformed JSON-sourced specs."""
    from cryo_spark.tablespec import SPECS

    for spec in SPECS.values():
        assert TableSpec.from_json(spec.to_json()) == spec
    with pytest.raises(ValueError):
        TableSpec.from_dict({"name": "x", "key": "k", "columns": [
            {"name": "k", "kind": "str"}], "bogus": 1})
    with pytest.raises(ValueError):
        TableSpec.from_dict({"name": "x", "key": "missing", "columns": [
            {"name": "k", "kind": "str"}]})


def test_resolve_spec_name_and_path(tmp_path):
    """resolve_spec: registry names and JSON file paths; user-defined
    families (the reference only has built-in dataset names) load with
    full validation."""
    from cryo_spark.tablespec import resolve_spec

    assert resolve_spec("embeddings") is EMBEDDINGS
    custom = TableSpec(
        name="labels", key="row_id",
        columns=(ColumnSpec("row_id", "int64"),
                 ColumnSpec("scores", "list<float64>"),
                 ColumnSpec("split", "str")),
        partition_col="split", weight="scores")
    p = tmp_path / "labels.json"
    p.write_text(custom.to_json())
    assert resolve_spec(str(p)) == custom
    with pytest.raises(ValueError):
        resolve_spec("not_a_table")


def test_freeze_persists_spec_and_cli_autodetects(spark, embeddings_path,
                                                  tmp_path):
    """freeze writes spec.json into the output; load_output_spec reads it
    back; the CLI's table resolution can recover the family without
    --table (the Iceberg self-describing-table property)."""
    out = str(tmp_path / "emb_spec_out")
    engine.freeze(spark, embeddings_path, out, target_tokens=TARGET,
                  spec=EMBEDDINGS)
    assert engine.load_output_spec(out) == EMBEDDINGS
    # a JSON-defined custom spec persists equally (engine path, not CLI,
    # to avoid a second SparkSession)
    assert engine.load_output_spec(str(tmp_path)) is None  # no spec.json


def test_cli_table_resolution(tmp_path):
    """_resolve_table: explicit name > JSON path > persisted output spec
    > sequences default — no SparkSession involved."""
    import argparse

    from cryo_spark.__main__ import _resolve_table
    from cryo_spark.engine import _persist_spec
    from cryo_spark.tablespec import SPECS

    ns = lambda **kw: argparse.Namespace(**kw)  # noqa: E731
    assert _resolve_table(ns(cmd="freeze", table="embeddings")) is EMBEDDINGS
    custom = TableSpec(name="t", key="k",
                       columns=(ColumnSpec("k", "int64"),
                                ColumnSpec("v", "list<int32>")))
    p = tmp_path / "t.json"
    p.write_text(custom.to_json())
    assert _resolve_table(ns(cmd="freeze", table=str(p))) == custom
    out = str(tmp_path / "frozen")
    _persist_spec(out, custom)
    assert _resolve_table(ns(cmd="describe", table=None, output=out)) == custom
    assert _resolve_table(ns(cmd="collect", table=None, input=out)) == custom
    assert _resolve_table(
        ns(cmd="describe", table=None, output=str(tmp_path))
    ) is SPECS["sequences"]
    with pytest.raises(ValueError):
        _resolve_table(ns(cmd="freeze", table="nope"))
