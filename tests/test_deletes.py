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
                        delete_where, freeze, purge_deletes, write_sequences)
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


def test_purge_physically_applies(spark, frozen):
    src, out = frozen
    delete_where(spark, out, keys="0:100")
    p = purge_deletes(spark, out, target_tokens=400_000)
    assert p["run"] is not None and p["n_purged_rows"] == 100
    assert p["n_rewritten"] > 0
    want = _ids(spark.read.parquet(src).filter(
        "doc_id >= 'doc-000000000100'"))
    # logical view unchanged...
    assert _ids(decode_frozen(spark, out)) == want
    assert _ids(collect(spark, out)) == want
    # ...but now it's PHYSICAL: the raw file read no longer contains the
    # deleted rows (pre-purge it did, test_raw_read_bypasses_deletes)
    assert _ids(decode(read_encoded(spark, out))) == want
    # current state carries no delete runs anymore (no anti-join cost)
    cur = snapshots.current(out)
    assert cur is not None and cur["deletes"] == set()


def test_purge_time_travel(spark, frozen):
    src, out = frozen
    all_ids = _ids(spark.read.parquet(src))
    delete_where(spark, out, keys="0:100")     # seq 2
    purge_deletes(spark, out, target_tokens=400_000)  # seq 3
    # pre-delete snapshot: everything; post-delete pre-purge: filtered
    # via merge-on-read; post-purge: filtered physically
    assert _ids(decode_frozen(spark, out, as_of=1)) == all_ids
    assert len(_ids(decode_frozen(spark, out, as_of=2))) == 400
    assert len(_ids(decode_frozen(spark, out, as_of=3))) == 400
    # rollback to pre-delete restores the rows (originals still on disk)
    snapshots.rollback(out, 1)
    assert _ids(decode_frozen(spark, out)) == all_ids


def test_purge_untouched_chunks_not_rewritten(spark, frozen):
    _, out = frozen
    from cryo_spark.engine import read_manifest
    n_chunks = read_manifest(spark, out).count() // 4  # 4 columns/chunk
    delete_where(spark, out, keys="0:10")
    p = purge_deletes(spark, out, target_tokens=400_000)
    # the keys live in few chunks; most chunks must not be touched
    assert 0 < p["n_rewritten"] < n_chunks


def test_purge_noop_without_deletes(spark, frozen):
    _, out = frozen
    p = purge_deletes(spark, out)
    assert p["run"] is None and p["snapshot"] is None


def test_purge_whole_chunk_deleted(spark, tmp_path):
    """A delete that empties ENTIRE chunks must still purge physically.

    Regression (caught by the second-seed differential sweep): chunks
    are per-source, so delete_where(source=X) deletes every row of X's
    chunks; the old purge refused the empty rewrite ("an empty run
    cannot carry the commit") and kept merge-on-read forever — and the
    suite's 'purged' pin only passed when key-bloom false positives
    dragged surviving rows into the rewrite. The fix commits a
    deletes-only snapshot: tombstones + an EMPTY manifest for the
    writer run (the commit carrier), Iceberg's add-zero-delete-N
    rewrite.
    """
    import numpy as np
    import pandas as pd

    from cryo_spark import engine

    n = 300
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "doc_id": [f"doc-{i:09d}" for i in range(n)],
        "tokens": [np.arange(20, dtype=np.int32) for _ in range(n)],
        "n_tok": np.full(n, 20, dtype=np.int32),
        "source": [("solo" if i % 10 == 0 else "bulk") for i in range(n)],
    })
    src = str(tmp_path / "in.parquet")
    spark.createDataFrame(pdf, engine.SEQUENCES_DDL) \
        .write.parquet(src)
    out = str(tmp_path / "out")
    s = freeze(spark, src, out, target_tokens=100_000)
    assert s["n_failed"] == 0
    d = delete_where(spark, out, filters=[("source", "=", "solo")])
    assert d["n_deleted"] == 30
    p = purge_deletes(spark, out, target_tokens=100_000)
    # the rewrite is empty (solo rows fill their per-source chunk) but
    # the purge must still commit and retire the chunk
    assert p["snapshot"] is not None and p["n_purged_rows"] == 30
    assert p["n_new_chunks"] == 0
    want = sorted(f"doc-{i:09d}" for i in range(n) if i % 10 != 0)
    assert _ids(decode_frozen(spark, out)) == want          # file kernel
    assert _ids(decode(read_encoded(spark, out))) == want   # relational
    cur = snapshots.current(out)
    assert cur is not None and cur["deletes"] == set()
    # time travel: pre-purge snapshots still see the rows
    assert len(_ids(decode_frozen(spark, out, as_of=1))) == n
    assert len(_ids(decode(read_encoded(spark, out, as_of=1)))) == n
    assert _ids(decode_frozen(spark, out, as_of=2)) == want  # merge-on-read
