"""vacuum(): reclaim encoded run dirs with zero live chunks.

``compact`` retires chunks logically via tombstones; ``vacuum`` is the
physical GC — the Iceberg ``expire_snapshots`` / ``remove_orphan_files``
analog scoped to what is provably safe without a catalog: only runs
WITH a committed manifest and ZERO live chunks are deleted. Deletion
must be invisible to every read path and to freeze-resume (the manifest
history stays append-only).
"""

from __future__ import annotations

import os

import pytest

from cryo_spark import compact, decode, decode_frozen, freeze, vacuum
from cryo_spark.engine import read_encoded, read_manifest


SMALL = 20_000
BIG = 400_000


def _rows(df):
    return sorted(
        (r.doc_id, tuple(r.tokens), r.n_tok, r.source)
        for r in df.collect()
    )


@pytest.fixture()
def compacted(spark, sequences_path, tmp_path):
    out = str(tmp_path / "out")
    freeze(spark, sequences_path, out, target_tokens=SMALL)
    before = _rows(decode(read_encoded(spark, out)))
    s = compact(spark, out, target_tokens=BIG)
    assert s["run"] is not None
    return out, before, s


def test_vacuum_reclaims_fully_retired_run(spark, compacted):
    out, before, s = compacted
    # the original freeze run is fully retired by the compaction, so its
    # encoded dir is dead weight on disk
    runs_before = set(os.listdir(f"{out}/encoded"))
    assert len(runs_before) == 2
    v = vacuum(spark, out)
    assert v["n_deleted_runs"] == 1
    assert v["bytes_reclaimed"] > 0
    assert f"run={s['run']}" in set(os.listdir(f"{out}/encoded"))
    assert f"run={v['deleted_runs'][0]}" not in set(os.listdir(f"{out}/encoded"))
    # bit-identical through BOTH read paths after the physical delete
    assert _rows(decode(read_encoded(spark, out))) == before
    assert _rows(decode_frozen(spark, out)) == before
    # manifest history is append-only: no run is erased from it
    man = read_manifest(spark, out)
    assert man.select("run").distinct().count() == 2


def test_vacuum_idempotent(spark, compacted):
    out, before, _ = compacted
    vacuum(spark, out)
    v2 = vacuum(spark, out)
    assert v2["n_deleted_runs"] == 0 and v2["bytes_reclaimed"] == 0
    assert _rows(decode(read_encoded(spark, out))) == before


def test_vacuum_noop_without_retirement(spark, sequences_path, tmp_path):
    out = str(tmp_path / "out")
    freeze(spark, sequences_path, out, target_tokens=BIG)
    before = _rows(decode(read_encoded(spark, out)))
    v = vacuum(spark, out)
    assert v["n_deleted_runs"] == 0
    assert _rows(decode(read_encoded(spark, out))) == before


def test_vacuum_leaves_inflight_runs_alone(spark, compacted):
    out, before, _ = compacted
    # an encoded dir with NO manifest entry may belong to an in-flight
    # freeze mid-write: vacuum must not touch it
    inflight = f"{out}/encoded/run=00inflight00"
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-0.parquet"), "wb") as f:
        f.write(b"not yet committed")
    v = vacuum(spark, out)
    assert os.path.isdir(inflight)
    assert "00inflight00" not in v["deleted_runs"]


def test_freeze_resume_unaffected_by_vacuum(spark, sequences_path, compacted):
    out, _, _ = compacted
    vacuum(spark, out)
    # the original plan's chunks remain done in the manifest even though
    # their original payload files are gone (data lives in the compacted
    # run), so a re-freeze must encode nothing
    s = freeze(spark, sequences_path, out, target_tokens=SMALL)
    assert s["n_encoded"] == 0


def test_vacuum_rejects_remote_paths(spark):
    with pytest.raises(ValueError):
        vacuum(spark, "s3://bucket/table")


def test_vacuum_on_empty_output(spark, tmp_path):
    v = vacuum(spark, str(tmp_path / "nothing"))
    assert v == dict(snapshot=None, n_deleted_runs=0, bytes_reclaimed=0,
                     deleted_runs=[])
