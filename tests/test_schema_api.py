"""Projection algebra, collect/export, dry-run, report, orphan invisibility.

The compute_used_columns cases mirror the reference's inline schema
tests (/root/reference/crates/freeze/src/types/schemas.rs:358-505):
defaults, columns=all, include/exclude, validation errors, order.
"""

from __future__ import annotations

import json
import os

import pytest

from cryo_spark import engine
from cryo_spark.schema import ALL, ColumnError, compute_used_columns

COLS = ["doc_id", "tokens", "n_tok", "source"]


@pytest.fixture(scope="module")
def encoded(spark, sequences_path):
    df = spark.read.parquet(sequences_path)
    enc = engine.encode(df, target_tokens=200_000)
    enc.cache()
    enc.count()
    yield enc
    enc.unpersist()


def test_default_projection():
    assert compute_used_columns(COLS, default_columns=["doc_id", "tokens"]) == [
        "doc_id", "tokens"
    ]


def test_columns_replaces_defaults():
    assert compute_used_columns(COLS, default_columns=["doc_id"],
                                columns=["source", "n_tok"]) == ["n_tok", "source"]


def test_columns_all_marker():
    assert compute_used_columns(COLS, default_columns=["doc_id"], columns=[ALL]) == COLS


def test_include_exclude():
    assert compute_used_columns(
        COLS, default_columns=["doc_id", "tokens"],
        include=["source"], exclude=["tokens"],
    ) == ["doc_id", "source"]


def test_include_all():
    assert compute_used_columns(COLS, default_columns=["doc_id"], include=[ALL]) == COLS


def test_order_is_schema_order_not_request_order():
    assert compute_used_columns(COLS, columns=["source", "doc_id"]) == ["doc_id", "source"]


@pytest.mark.parametrize("kw", [
    {"columns": ["nope"]}, {"include": ["nope"]}, {"exclude": ["nope"]},
])
def test_unknown_column_rejected(kw):
    with pytest.raises(ColumnError):
        compute_used_columns(COLS, **kw)


# --------------------------------------------------------------------------
# engine-level: decode projection, collect, export, dry_run, report, orphans
# --------------------------------------------------------------------------


def test_decode_projection(spark, sequences_path, encoded):
    dec = engine.decode(encoded, columns=["doc_id", "n_tok"])
    assert dec.columns == ["doc_id", "n_tok"]
    exp = spark.read.parquet(sequences_path).select("doc_id", "n_tok")
    got = {r["doc_id"]: r["n_tok"] for r in dec.collect()}
    want = {r["doc_id"]: r["n_tok"] for r in exp.collect()}
    assert got == want


def test_collect_from_input_path(spark, sequences_path):
    df = engine.collect(spark, sequences_path, columns=["doc_id", "source"], sort=True)
    rows = df.collect()
    assert df.columns == ["doc_id", "source"]
    assert [r["doc_id"] for r in rows] == sorted(r["doc_id"] for r in rows)


def test_collect_from_frozen_output(spark, sequences_path, tmp_path):
    out = str(tmp_path / "frozen")
    engine.freeze(spark, sequences_path, out, target_tokens=20_000)
    df = engine.collect(spark, out, exclude=["tokens"])
    assert df.columns == ["doc_id", "n_tok", "source"]
    assert df.count() == spark.read.parquet(sequences_path).count()


def test_freeze_dry_run(spark, sequences_path, tmp_path):
    out = str(tmp_path / "dry")
    s = engine.freeze(spark, sequences_path, out, target_tokens=20_000, dry_run=True)
    assert s["dry_run"] and s["n_to_encode"] == s["n_planned"]
    assert not os.path.exists(f"{out}/encoded")  # nothing executed


def test_freeze_writes_report(spark, sequences_path, tmp_path):
    out = str(tmp_path / "rep")
    s = engine.freeze(spark, sequences_path, out, target_tokens=20_000)
    reports = os.listdir(f"{out}/report")
    assert reports == [f"run={s['run']}.json"]
    body = json.load(open(f"{out}/report/{reports[0]}"))
    assert body["status"] == "completed"
    assert body["n_encoded"] == s["n_encoded"]


def test_orphan_run_invisible(spark, sequences_path, tmp_path):
    """Encoded files from a run that died before its manifest commit are
    invisible to read_encoded (reference tmp-rename atomicity,
    /root/reference/crates/freeze/src/types/dataframes/export.rs:13-23)."""
    out = str(tmp_path / "orphan")
    s = engine.freeze(spark, sequences_path, out, target_tokens=20_000)
    good = engine.read_encoded(spark, out).count()
    # simulate a dead run: encoded dir written, no manifest entry
    df = spark.read.parquet(sequences_path)
    plan = engine.layout.plan_chunks(df, 20_000)
    engine._grouped_encode(df, plan).write.parquet(
        f"{out}/encoded/run=deadbeef0000"
    )
    assert engine.read_encoded(spark, out).count() == good
    # decode of committed data still bit-identical row count
    assert engine.decode(engine.read_encoded(spark, out)).count() == df.count()


def test_export_csv_json(spark, sequences_path, tmp_path):
    df = spark.read.parquet(sequences_path).limit(50)
    engine.export(df, str(tmp_path / "x.csv"), format="csv")
    engine.export(df, str(tmp_path / "x.json"), format="json")
    back = spark.read.option("header", "true").csv(str(tmp_path / "x.csv"))
    assert back.count() == 50
    assert set(back.columns) == set(df.columns)


def test_parallelism_invariance(spark, sequences_path):
    """Encoded payload bytes are identical whatever the input partitioning
    (FIXTURES.md §4) — the property that makes the N vs 4N comparison and
    resume well-defined."""
    df = spark.read.parquet(sequences_path)
    plan = engine.layout.plan_chunks(df, 20_000)
    a = engine._grouped_encode(df.repartition(3), plan)
    b = engine._grouped_encode(df.repartition(11), plan)
    pa_ = {(r["chunk_id"], r["column"]): r["payload"] for r in a.collect()}
    pb = {(r["chunk_id"], r["column"]): r["payload"] for r in b.collect()}
    assert pa_.keys() == pb.keys()
    assert all(pa_[k] == pb[k] for k in pa_)


def test_unhex_columns_roundtrip(spark):
    from cryo_spark import schema as schema_mod

    df = spark.createDataFrame([(b"\x01\xabz",), (b"",)], ["payload"])
    hexed = schema_mod.hex_columns(df)
    vals = [r["payload"] for r in hexed.collect()]
    assert vals == ["0x01ab7a", "0x"]
    back = schema_mod.unhex_columns(hexed, ["payload"])
    assert [r["payload"] for r in back.collect()] == [bytearray(b"\x01\xabz"), bytearray(b"")]
    # prefix-less hex decodes too (parse_utils.rs semantics)
    noprefix = schema_mod.hex_columns(df, prefix=False)
    back2 = schema_mod.unhex_columns(noprefix, ["payload"])
    assert [r["payload"] for r in back2.collect()] == [bytearray(b"\x01\xabz"), bytearray(b"")]


def test_remember_cli(tmp_path, sequences_path):
    # subprocess: the CLI owns (and stops) its own SparkSession
    import json as _json
    import os
    import subprocess
    import sys

    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(__file__))}
    run = lambda *a: subprocess.run(
        [sys.executable, "-m", "cryo_spark", *a], cwd=tmp_path, env=env,
        capture_output=True, text=True, timeout=240)
    r1 = run("collect", "--input", sequences_path, "--limit", "2",
             "--keys", "5:+2", "--remember", "--master", "local[2]")
    assert r1.returncode == 0, r1.stderr[-500:]
    saved = _json.load(open(tmp_path / "remembered_command.json"))
    assert "--remember" not in saved["command"]
    # bare invocation replays the remembered command
    r2 = run()
    assert r2.returncode == 0, r2.stderr[-500:]
    assert r2.stdout.count("doc-") == 2
