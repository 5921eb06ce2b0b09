"""Run-id parse safety: the scientific-notation partition-inference trap.

uuid4().hex[:12] occasionally mints all-digits-plus-one-'e' ids
('622402893e04'): Spark partition-value inference parses the run= dir
as a DOUBLE, so `run` flows as the wrong type AND value — the source of
the session-long UNSUPPORTED_CALL / missing_runs full-suite flakes.
"""

from __future__ import annotations

import pytest

from cryo_spark import engine, freeze, write_sequences

EVIL = "622402893e04"  # parses as 622402893 * 10^4 under inference


def test_new_run_ids_are_structurally_non_numeric():
    for _ in range(64):
        rid = engine._new_run_id()
        assert len(rid) == 12 and rid[0] == "r"
        with pytest.raises(ValueError):
            float(rid)


def test_legacy_numeric_run_id_reads_exact_string(spark, tmp_path):
    out = str(tmp_path / "o")
    df = spark.createDataFrame([(EVIL, 1), ("rsafe0000000", 2)],
                               "run string, x int")
    df.write.partitionBy("run").parquet(f"{out}/manifest")
    man = engine.read_manifest(spark, out)
    assert dict(man.dtypes)["run"] == "string"
    assert sorted(r["run"] for r in man.collect()) == [EVIL, "rsafe0000000"]
    # run stays a real partition column: the filter prunes, not just matches
    assert man.filter(man.run == EVIL).count() == 1


def test_freeze_run_id_prefixed(spark, tmp_path):
    src = str(tmp_path / "seqs.parquet")
    write_sequences(src, n=50, seed=7)
    out = str(tmp_path / "out")
    s = freeze(spark, src, out, target_tokens=30_000)
    assert s["run"].startswith("r")
    assert engine.verify_output(spark, out)["status"] == "ok"
