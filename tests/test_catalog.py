"""Named-table catalog: name -> location binding over frozen outputs.

The catalog holds ONLY the binding (Iceberg catalog-entry analog);
spec + history stay self-described in the output dir, so loads resolve
the family from the table itself.
"""

from __future__ import annotations

import pytest

from cryo_spark import collect, freeze, write_sequences
from cryo_spark.catalog import Catalog


@pytest.fixture()
def frozen(spark, tmp_path):
    src = str(tmp_path / "seqs.parquet")
    write_sequences(src, n=400, seed=9)
    out = str(tmp_path / "out")
    freeze(spark, src, out, target_tokens=20_000)
    return src, out


def test_register_load_roundtrip(spark, tmp_path, frozen):
    src, out = frozen
    cat = Catalog(str(tmp_path / "cat.json"))
    cat.register("train_seqs", out)
    got = sorted(r.doc_id for r in cat.load(spark, "train_seqs").collect())
    want = sorted(r.doc_id for r in collect(spark, out).collect())
    assert got == want and len(got) == 400
    # collect kwargs pass through (keys pruning)
    assert cat.load(spark, "train_seqs", keys="0:10").count() == 10


def test_tables_reports_self_described_state(spark, tmp_path, frozen):
    _, out = frozen
    cat = Catalog(str(tmp_path / "cat.json"))
    cat.register("t1", out)
    info = cat.tables()["t1"]
    assert info["family"] == "sequences"
    assert info["head_seq"] == 1
    assert info["location"].endswith("/out")


def test_binding_rules(spark, tmp_path, frozen):
    _, out = frozen
    cat = Catalog(str(tmp_path / "cat.json"))
    cat.register("t1", out)
    with pytest.raises(ValueError, match="already registered"):
        cat.register("t1", out)
    cat.register("t1", out, replace=True)
    with pytest.raises(ValueError, match="not a frozen output"):
        cat.register("t2", str(tmp_path))
    with pytest.raises(ValueError, match="unknown table"):
        cat.location("nope")
    cat.unregister("t1")
    assert cat.tables() == {}
