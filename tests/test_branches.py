"""Snapshot branches: write-audit-publish isolation (Iceberg branches).

``snapshots.branch`` anchors a named lineage at a snapshot;
``freeze(..., branch=name)`` commits land on the branch — invisible to
main readers — and every read path accepts ``as_of='branch:<name>'``.
``snapshots.publish`` fast-forwards main to the branch head (refusing
if main diverged). Vacuum must never collect branch-only runs.
"""

from __future__ import annotations

import pytest

from cryo_spark import collect, decode_frozen, freeze, vacuum, write_sequences
from cryo_spark import snapshots
from cryo_spark.engine import read_manifest


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


@pytest.fixture()
def branched(spark, tmp_path):
    """Freeze keys 0:300 on main -> branch 'audit' -> 300:450 on it."""
    src = str(tmp_path / "seqs.parquet")
    write_sequences(src, n=600, seed=11)
    out = str(tmp_path / "out")
    s1 = freeze(spark, src, out, target_tokens=20_000, keys="0:300")
    assert s1["snapshot"] == 1
    snapshots.branch(out, "audit")
    sb = freeze(spark, src, out, target_tokens=20_000, keys="300:450",
                branch="audit")
    assert sb["n_encoded"] > 0
    return src, out


def test_branch_isolation(spark, branched):
    src, out = branched
    from pyspark.sql import functions as F

    a_ids = _ids(spark.read.parquet(src).filter(
        F.col("doc_id") < "doc-000000000300"))
    # main sees only A (branch commits invisible on every read path)
    assert _ids(decode_frozen(spark, out)) == a_ids
    assert _ids(collect(spark, out)) == a_ids
    # the branch sees A (inherited from the anchor) + B's range
    br = _ids(decode_frozen(spark, out, as_of="branch:audit"))
    assert set(a_ids) < set(br)
    assert len(br) == len(a_ids) + 150
    # manifest visibility agrees
    main_runs = {r.run for r in
                 read_manifest(spark, out).select("run").distinct().collect()}
    br_runs = {r.run for r in
               read_manifest(spark, out, as_of="branch:audit")
               .select("run").distinct().collect()}
    assert len(br_runs - main_runs) == 1


def test_branch_resume_counts_branch_runs(spark, branched):
    src, out = branched
    # same key range re-frozen on the branch: everything already done
    s = freeze(spark, src, out, target_tokens=20_000, keys="300:450",
               branch="audit")
    assert s["n_encoded"] == 0
    # on MAIN the branch runs are invisible: the same freeze encodes
    s2 = freeze(spark, src, out, target_tokens=20_000, keys="300:450")
    assert s2["n_encoded"] > 0


def test_publish_fast_forwards_main(spark, branched):
    src, out = branched
    from pyspark.sql import functions as F

    a_ids = _ids(spark.read.parquet(src).filter(
        F.col("doc_id") < "doc-000000000300"))
    seq = snapshots.publish(out, "audit")
    # unqualified reads now see the branch state
    pub = _ids(decode_frozen(spark, out))
    assert set(a_ids) < set(pub) and len(pub) == len(a_ids) + 150
    # time travel below the publish still sees plain main
    assert _ids(decode_frozen(spark, out, as_of=seq - 1)) == a_ids


def test_publish_refuses_diverged_main(spark, branched):
    src, out = branched
    freeze(spark, src, out, target_tokens=20_000, keys="450:600")  # main
    with pytest.raises(ValueError, match="diverged"):
        snapshots.publish(out, "audit")


def test_vacuum_keeps_branch_runs(spark, branched):
    src, out = branched
    rep = vacuum(spark, out)
    assert rep["n_deleted_runs"] == 0
    # branch read still intact after vacuum
    assert decode_frozen(spark, out, as_of="branch:audit").count() == 450


def test_stream_encode_to_branch(spark, branched, tmp_path):
    """Streaming WAP: micro-batches land on the branch, publish reveals."""
    from cryo_spark import streaming

    src, out = branched
    inp = tmp_path / "stream_in"
    inp.mkdir()
    write_sequences(str(inp / "a.parquet"), n=100, seed=21)
    before_main = decode_frozen(spark, out).count()
    q = streaming.stream_encode(spark, str(inp), out,
                                str(tmp_path / "ckpt"),
                                target_tokens=50_000, branch="audit")
    q.awaitTermination()
    # main unchanged; the branch gained the streamed batch
    assert decode_frozen(spark, out).count() == before_main
    assert decode_frozen(spark, out, as_of="branch:audit").count() == 450 + 100
    snapshots.publish(out, "audit")
    assert decode_frozen(spark, out).count() == before_main + 150 + 100


def test_unknown_and_duplicate_branches(spark, branched):
    src, out = branched
    with pytest.raises(ValueError, match="unknown branch"):
        decode_frozen(spark, out, as_of="branch:nope")
    with pytest.raises(ValueError, match="unknown branch"):
        freeze(spark, src, out, branch="nope")
    with pytest.raises(ValueError, match="already exists"):
        snapshots.branch(out, "audit")
