"""Shuffle-free decode (engine.decode_frozen) vs the relational path.

The fast path must be a pure optimization: identical rows to
decode(read_encoded(...)) under every commit/orphan/failure state, with
conservative fallback whenever run-granular commit markers cannot prove
the manifest is complete.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from cryo_spark import engine

TARGET = 200_000


@pytest.fixture(scope="module")
def frozen_dir(spark, sequences_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dfz") / "frozen")
    s = engine.freeze(spark, sequences_path, out, target_tokens=TARGET)
    assert s["n_encoded"] > 0
    return out


def _assert_same(spark, df_fast, df_ref, key="doc_id"):
    assert df_fast.count() == df_ref.count()
    j = df_fast.alias("a").join(df_ref.alias("b"), key, "full_outer")
    cols = [c for c in df_fast.columns if c != key]
    pred = None
    for c in cols:
        t = (
            F.col(f"a.{c}").isNull() != F.col(f"b.{c}").isNull()
        ) | (F.col(f"a.{c}") != F.col(f"b.{c}"))
        pred = t if pred is None else pred | t
    assert j.filter(pred).count() == 0


def test_matches_relational(spark, frozen_dir):
    fast = engine.decode_frozen(spark, frozen_dir)
    ref = engine.decode(engine.read_encoded(spark, frozen_dir))
    _assert_same(spark, fast, ref)


def test_no_payload_exchange_in_plan(spark, frozen_dir):
    """The only exchange in the fast plan is the tiny task-list
    round-robin; the relational plan repartitions the payload rows."""
    fast_plan = engine.decode_frozen(spark, frozen_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    # the payload-bearing relational plan scans parquet then exchanges;
    # the fast plan's scan is a local task-list relation
    assert "FileScan parquet" not in fast_plan
    rel_plan = engine.decode(engine.read_encoded(spark, frozen_dir)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in rel_plan


def test_orphan_run_invisible(spark, frozen_dir, tmp_path):
    """An encoded run dir with no manifest run dir contributes nothing."""
    work = str(tmp_path / "orphan")
    shutil.copytree(frozen_dir, work)
    enc_base = f"{work}/encoded"
    run = next(d for d in os.listdir(enc_base) if d.startswith("run="))
    shutil.copytree(f"{enc_base}/{run}", f"{enc_base}/run=deadbeefcafe")
    n_ref = engine.decode(engine.read_encoded(spark, work)).count()
    n_fast = engine.decode_frozen(spark, work).count()
    assert n_fast == n_ref


def test_partial_manifest_falls_back(spark, frozen_dir, tmp_path):
    """A manifest run dir without its commit marker forces the
    relational semi-join path; rows still match it exactly."""
    work = str(tmp_path / "partial")
    shutil.copytree(frozen_dir, work)
    man_base = f"{work}/manifest"
    run = next(d for d in os.listdir(man_base) if d.startswith("run="))
    marker = f"{man_base}/{run}/_SUCCESS"
    assert os.path.exists(marker)
    os.remove(marker)
    fast = engine.decode_frozen(spark, work)
    ref = engine.decode(engine.read_encoded(spark, work))
    _assert_same(spark, fast, ref)


def test_column_pruned(spark, frozen_dir):
    dec = engine.decode_frozen(spark, frozen_dir, columns=["doc_id", "n_tok"])
    assert dec.columns == ["doc_id", "n_tok"]
    ref = engine.decode(engine.read_encoded(spark, frozen_dir),
                        columns=["doc_id", "n_tok"])
    _assert_same(spark, dec, ref)


def test_collect_fast_path_rows(spark, sequences_path, frozen_dir):
    df = engine.collect(spark, frozen_dir)
    src = spark.read.parquet(sequences_path)
    assert df.count() == src.count()
    bad = (
        df.alias("d").join(src.alias("s"), "doc_id", "inner")
        .filter(F.col("d.tokens") != F.col("s.tokens")).count()
    )
    assert bad == 0


def test_embeddings_spec(spark, tmp_path):
    from cryo_spark.fixtures import write_embeddings
    from cryo_spark.tablespec import EMBEDDINGS

    inp = str(tmp_path / "emb.parquet")
    write_embeddings(inp, n=3_000, dim=24)
    out = str(tmp_path / "emb_frozen")
    engine.freeze(spark, inp, out, target_tokens=20_000, spec=EMBEDDINGS)
    fast = engine.decode_frozen(spark, out, spec=EMBEDDINGS)
    ref = engine.decode(engine.read_encoded(spark, out), spec=EMBEDDINGS)
    _assert_same(spark, fast, ref, key="vec_id")


def test_empty_output_dir(spark, tmp_path):
    out = str(tmp_path / "nothing")
    dec = engine.decode_frozen(spark, out)
    assert dec.count() == 0
    assert dec.columns == ["doc_id", "tokens", "n_tok", "source"]
