"""Edge cases for pii_redact / boilerplate_strip the sf corpora can't hit.

The oracle comparison (tools/check_oracles.py) proves Spark == DuckDB on
the synthetic corpora; these cover pre-existing PII in the text body and
the boilerplate singleton / tie rules.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from cryo_spark.suite import _BP_PREF_LEN


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_pii_redact_catches_preexisting_pii(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cryo_spark.suite import pii_redact

    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([
                "mail me at alice.b@corp.io today",   # pre-existing email
                "digits 555-0199 in body",             # pre-existing phone
            ]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["a", "a"]),
            "n_chars": pa.array([32, 24], pa.int64()),
        }),
        tmp_path / "documents.parquet",
    )
    rows = {r["doc_id"]: r for r in pii_redact(spark, str(tmp_path)).collect()}
    # each doc: one planted email + one planted phone, plus its own span
    assert rows[1]["n_emails"] == 2 and rows[1]["n_phones"] == 1
    assert rows[2]["n_emails"] == 1 and rows[2]["n_phones"] == 2


def test_boilerplate_strip_singleton_and_majority(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cryo_spark.suite import boilerplate_strip

    bp = "SITEHDR:"  # exactly _BP_PREF_LEN bytes
    assert len(bp) == _BP_PREF_LEN
    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                bp + " body one",
                bp + " body two",
                "no header here",      # same source, different prefix
                bp + " lone site",     # other source: singleton, n < 2
            ]),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s1", "s1", "s1", "s2"]),
            "n_chars": pa.array([17, 17, 14, 18], pa.int64()),
        }),
        tmp_path / "documents.parquet",
    )
    rows = {r["doc_id"]: r for r in boilerplate_strip(spark, str(tmp_path)).collect()}
    assert rows[1]["stripped"] == 1 and rows[2]["stripped"] == 1
    assert rows[1]["clean_len"] == len(" body one")
    assert rows[3]["stripped"] == 0          # prefix differs
    assert rows[4]["stripped"] == 0          # singleton source never strips


def test_boilerplate_strip_plan_broadcasts_prefix_table(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cryo_spark.suite import boilerplate_strip

    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["aaaaaaaa x", "aaaaaaaa y"]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([10, 10], pa.int64()),
        }),
        tmp_path / "documents.parquet",
    )
    plan = boilerplate_strip(spark, str(tmp_path))._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
