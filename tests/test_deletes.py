"""Row-level deletes: equality-delete runs, merge-on-read, undo paths.

Iceberg equality-delete semantics over the encoded layout: a delete
writes matching keys as a delete run committed through the snapshot
log; reads anti-join the visible delete keys; time travel and rollback
both un-delete because visibility is replayed from the log.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cryo_spark import (collect, compact, decode, decode_frozen,
                        delete_where, freeze, write_sequences)
from cryo_spark import snapshots
from cryo_spark.engine import read_encoded


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


@pytest.fixture()
def frozen(spark, tmp_path):
    src = str(tmp_path / "seqs.parquet")
    write_sequences(src, n=500, seed=13)
    out = str(tmp_path / "out")
    s = freeze(spark, src, out, target_tokens=30_000)
    assert s["n_failed"] == 0
    return src, out


def test_delete_by_keys(spark, frozen):
    src, out = frozen
    d = delete_where(spark, out, keys="100:200")
    assert d["n_deleted"] == 100 and d["snapshot"] == 2
    want = _ids(spark.read.parquet(src).filter(
        "doc_id < 'doc-000000000100' OR doc_id >= 'doc-000000000200'"))
    # merge-on-read on BOTH read paths and under projection w/o the key
    assert _ids(decode_frozen(spark, out)) == want
    assert _ids(collect(spark, out)) == want
    n = collect(spark, out, columns=["n_tok"]).count()
    assert n == 400


def test_delete_by_filter(spark, frozen):
    src, out = frozen
    d = delete_where(spark, out, filters=[("source", "=", "web")])
    n_web = spark.read.parquet(src).filter("source = 'web'").count()
    assert d["n_deleted"] == n_web > 0
    left = decode_frozen(spark, out)
    assert left.filter("source = 'web'").count() == 0
    assert left.count() == 500 - n_web


def test_delete_time_travel_and_rollback(spark, frozen):
    src, out = frozen
    all_ids = _ids(spark.read.parquet(src))
    d = delete_where(spark, out, keys="0:50")
    assert d["snapshot"] == 2
    # pre-delete snapshot still sees the rows
    assert _ids(decode_frozen(spark, out, as_of=1)) == all_ids
    assert len(_ids(decode_frozen(spark, out, as_of=2))) == 450
    # rollback un-deletes
    snapshots.rollback(out, 1)
    assert _ids(decode_frozen(spark, out)) == all_ids


def test_deletes_stack_and_resolve_against_current(spark, frozen):
    _, out = frozen
    d1 = delete_where(spark, out, keys="0:100")
    # second delete's predicate resolves against CURRENT state (first
    # delete applied): overlapping range matches only surviving rows
    d2 = delete_where(spark, out, keys="50:150")
    assert d1["n_deleted"] == 100 and d2["n_deleted"] == 50
    assert decode_frozen(spark, out).count() == 350


def test_empty_delete_commits_nothing(spark, frozen):
    _, out = frozen
    d = delete_where(spark, out, keys="9000:9010")
    assert d == {**d, "snapshot": None, "n_deleted": 0}
    assert len(snapshots.log(out)) == 1


def test_delete_survives_compact(spark, frozen):
    src, out = frozen
    delete_where(spark, out, keys="0:100")
    s = compact(spark, out, target_tokens=400_000)
    assert s["run"] is not None
    # the rewrite carries the deleted rows physically (merge-on-read),
    # but every read keeps filtering them
    assert decode_frozen(spark, out).count() == 400
    assert collect(spark, out, filters=[("n_tok", ">=", 1)]).count() == 400


def test_raw_read_bypasses_deletes(spark, frozen):
    _, out = frozen
    delete_where(spark, out, keys="0:100")
    # decode(read_encoded(...)) is the physical-file read (Iceberg:
    # reading data files directly bypasses delete files) — documented
    assert decode(read_encoded(spark, out)).count() == 500


def test_delete_validation(spark, frozen):
    _, out = frozen
    with pytest.raises(ValueError, match="keys= and/or filters="):
        delete_where(spark, out)
