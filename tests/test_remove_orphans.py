"""remove_orphans (Iceberg remove_orphan_files analog).

Contract under test: only dirs that NO commit claims AND that are older
than the age guard are deleted; committed data, too-young dirs, and the
decoded corpus are untouched; removal is recorded as an orphan_gc log
entry that the visibility replay ignores.
"""

from __future__ import annotations

import os
import shutil

from cryo_spark import (decode_frozen, freeze, remove_orphans,
                        verify_output, write_sequences)
from cryo_spark import snapshots
from cryo_spark.engine import _encoded_path, _tombstones_path


def _plant_orphan(out, base_fn, name, age_s):
    """Copy the first committed run dir to an unclaimed name, backdated."""
    base = base_fn(out)
    src = os.path.join(base, sorted(
        d for d in os.listdir(base) if d.startswith("run="))[0])
    dst = os.path.join(base, f"run={name}")
    shutil.copytree(src, dst)
    old = __import__("time").time() - age_s
    for root, dirs, files in os.walk(dst):
        for f in (*files, *dirs):
            os.utime(os.path.join(root, f), (old, old))
    os.utime(dst, (old, old))
    return dst


def test_orphans_removed_committed_kept(spark, tmp_path):
    src = str(tmp_path / "in.parquet")
    write_sequences(src, n=400, seed=5)
    out = str(tmp_path / "out")
    freeze(spark, src, out, target_tokens=20_000)
    before = sorted((r.doc_id, r.n_tok)
                    for r in decode_frozen(spark, out).collect())

    old = _plant_orphan(out, _encoded_path, "rdeadwriter00", age_s=7200)
    young = _plant_orphan(out, _encoded_path, "rlivewriter00", age_s=0)

    rep = remove_orphans(spark, out, min_age_s=3600)
    assert rep["n_removed"] == 1 and rep["bytes_reclaimed"] > 0
    assert not os.path.isdir(old)
    assert os.path.isdir(young)            # age guard: maybe in-flight
    assert sorted((r.doc_id, r.n_tok)
                  for r in decode_frozen(spark, out).collect()) == before

    # the young one ages out on the next pass
    rep2 = remove_orphans(spark, out, min_age_s=0)
    assert rep2["n_removed"] == 1 and not os.path.isdir(young)
    assert verify_output(spark, out)["status"] == "ok"
    # audit entries exist and change no visibility
    kinds = [e["kind"] for e in snapshots.log(out)]
    assert kinds.count("orphan_gc") == 2
    assert decode_frozen(spark, out).count() == 400


def test_uncommitted_tombstone_dir_is_orphan(spark, tmp_path):
    src = str(tmp_path / "in.parquet")
    write_sequences(src, n=300, seed=6)
    out = str(tmp_path / "out")
    freeze(spark, src, out, target_tokens=20_000)
    # a compaction that died before its manifest commit: tombstones
    # written under its own (unknown) run id
    ts_dir = os.path.join(_tombstones_path(out), "run=rdeadcompact0")
    os.makedirs(ts_dir)
    with open(os.path.join(ts_dir, "part-0.parquet"), "wb") as f:
        f.write(b"x")
    old = __import__("time").time() - 7200
    os.utime(os.path.join(ts_dir, "part-0.parquet"), (old, old))
    os.utime(ts_dir, (old, old))
    rep = remove_orphans(spark, out, min_age_s=3600)
    assert rep["removed"] == ["tombstones/run=rdeadcompact0"]
    assert decode_frozen(spark, out).count() == 300


def test_nothing_to_remove(spark, tmp_path):
    src = str(tmp_path / "in.parquet")
    write_sequences(src, n=200, seed=7)
    out = str(tmp_path / "out")
    freeze(spark, src, out, target_tokens=20_000)
    rep = remove_orphans(spark, out, min_age_s=0)
    assert rep == dict(snapshot=None, n_removed=0, bytes_reclaimed=0,
                       removed=[])
