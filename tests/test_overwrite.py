"""freeze(overwrite=True) REPLACES previously visible chunks.

Before this semantics landed, an overwrite re-freeze piled a second
copy of every row into the output (both runs stayed visible). Now the
new run's commit atomically tombstones the previously visible chunks —
compact's mechanism — so reads see one copy, time travel below the
rewrite sees the originals, and vacuum reclaims the retired bytes.
"""

from __future__ import annotations

from cryo_spark import decode_frozen, freeze, vacuum, write_sequences


def test_full_overwrite_replaces(spark, tmp_path):
    src = str(tmp_path / "in.parquet")
    write_sequences(src, n=400, seed=4)
    out = str(tmp_path / "out")
    s1 = freeze(spark, src, out, target_tokens=20_000)
    assert decode_frozen(spark, out).count() == 400
    s2 = freeze(spark, src, out, target_tokens=20_000, overwrite=True)
    assert s2["n_retired"] > 0 and s2["n_encoded"] > 0
    # one copy, not two
    assert decode_frozen(spark, out).count() == 400
    dec = decode_frozen(spark, out)
    assert dec.select("doc_id").distinct().count() == 400
    # time travel below the rewrite sees the original run
    assert decode_frozen(spark, out, as_of=s1["snapshot"]).count() == 400
    # the retired run's bytes are now vacuumable
    rep = vacuum(spark, out)
    assert rep["n_deleted_runs"] == 1
    assert decode_frozen(spark, out).count() == 400


def test_ranged_overwrite_keeps_other_ranges(spark, tmp_path):
    src = str(tmp_path / "in.parquet")
    write_sequences(src, n=600, seed=5)
    out = str(tmp_path / "out")
    freeze(spark, src, out, target_tokens=20_000, keys="0:300")
    freeze(spark, src, out, target_tokens=20_000, keys="300:600")
    assert decode_frozen(spark, out).count() == 600
    # re-freeze ONE range with overwrite: the other range survives
    s = freeze(spark, src, out, target_tokens=20_000, keys="0:300",
               overwrite=True)
    assert s["n_retired"] > 0
    dec = decode_frozen(spark, out)
    assert dec.count() == 600
    assert dec.select("doc_id").distinct().count() == 600


def test_overwrite_on_fresh_output_is_append(spark, tmp_path):
    src = str(tmp_path / "in.parquet")
    write_sequences(src, n=200, seed=6)
    out = str(tmp_path / "out")
    s = freeze(spark, src, out, target_tokens=20_000, overwrite=True)
    assert s["n_retired"] == 0
    from cryo_spark import snapshot_log

    assert [e["kind"] for e in snapshot_log(out)] == ["append"]
    assert decode_frozen(spark, out).count() == 200
