"""Cross-validate the vendored Iceberg writer against the clean-room reader.

r4 verdict item 3: with no external Iceberg engine installable, the
metadata chain is checked by TWO independent spec transcriptions —
cryo_spark.iceberg/avroio (writer + reader) and
tests/iceberg_cleanroom.py (reader only, written from the spec text
with no imports from either module). A Hypothesis sweep commits random
table states (schemas, snapshot chains, file stats, partition tuples)
and both readers must agree on file sets, record counts, bounds and
time-travel for every one; any divergence is a bug in one of the two.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import types as T

from cryo_spark import iceberg

import iceberg_cleanroom as cleanroom  # tests dir is on pytest's sys.path


def test_cleanroom_is_independent():
    """The second reader must not lean on the implementation under test."""
    import ast
    import inspect

    src = inspect.getsource(cleanroom)
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, ast.Import):
            mods = [a.name for a in node.names]
        elif isinstance(node, ast.ImportFrom):
            mods = [node.module or ""]
        else:
            continue
        for m in mods:
            assert not m.startswith("cryo_spark"), (
                f"clean-room reader imports {m}: not independent")


_FIELD_TYPES = {
    "int": T.IntegerType(),
    "long": T.LongType(),
    "string": T.StringType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
}

_BOUNDABLE = ("int", "long", "string", "double", "float")

_field_names = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8),
    min_size=1, max_size=6, unique=True)


def _value_for(ice_type: str, draw):
    if ice_type == "int":
        return draw(st.integers(-(2**31), 2**31 - 1))
    if ice_type == "long":
        return draw(st.integers(-(2**63), 2**63 - 1))
    if ice_type == "string":
        return draw(st.text(max_size=12))
    if ice_type == "double":
        return draw(st.floats(allow_nan=False, allow_infinity=False))
    # float bounds round-trip through IEEE binary32: draw width-32 so
    # the original value is exactly representable
    return draw(st.floats(allow_nan=False, allow_infinity=False, width=32))


@st.composite
def table_states(draw):
    names = draw(_field_names)
    kinds = [draw(st.sampled_from(sorted(_FIELD_TYPES))) for _ in names]
    schema = T.StructType([
        T.StructField(n, _FIELD_TYPES[k], nullable=True)
        for n, k in zip(names, kinds)
    ])
    # optional identity partition over the first string/int/long field
    part_src = next((i for i, k in enumerate(kinds)
                     if k in ("string", "int", "long")), None)
    partitioned = part_src is not None and draw(st.booleans())
    n_snaps = draw(st.integers(1, 3))
    snaps = []
    fid = 0
    for _ in range(n_snaps):
        files = []
        for _ in range(draw(st.integers(0, 4))):
            fid += 1
            stats_lo, stats_hi, vcounts = [], [], []
            bounds = {}
            for i, (n, k) in enumerate(zip(names, kinds), start=1):
                if draw(st.booleans()):
                    vcounts.append({"key": i, "value":
                                    draw(st.integers(0, 2**40))})
                if k in _BOUNDABLE and draw(st.booleans()):
                    lo = _value_for(k, draw)
                    hi = _value_for(k, draw)
                    if (k not in ("double", "float") and lo > hi) or (
                            k in ("double", "float") and lo > hi):
                        lo, hi = hi, lo
                    stats_lo.append({"key": i,
                                     "value": iceberg._bound_bytes(lo, k)})
                    stats_hi.append({"key": i,
                                     "value": iceberg._bound_bytes(hi, k)})
                    bounds[n] = (lo, hi)
            f = {
                "path": f"/data/f{fid:05d}.parquet",
                "record_count": draw(st.integers(0, 2**48)),
                "file_size": draw(st.integers(0, 2**48)),
                "stats": {"value_counts": vcounts,
                          "null_value_counts": [],
                          "lower_bounds": stats_lo,
                          "upper_bounds": stats_hi},
                "_bounds": bounds,
            }
            if partitioned:
                k = kinds[part_src]
                v = draw(st.one_of(st.none(),
                                   st.just(_value_for(k, draw))))
                f["partition"] = {"p": v}
            files.append(f)
        snaps.append(files)
    part_fields = ([{"name": "p", "transform": "identity",
                     "source-id": part_src + 1, "field-id": 1000}]
                   if partitioned else None)
    return schema, snaps, part_fields


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(state=table_states())
def test_readers_agree_on_random_tables(state, tmp_path_factory):
    schema, snaps, part_fields = state
    loc = str(tmp_path_factory.mktemp("icb"))
    snap_ids = []
    for i, files in enumerate(snaps):
        iceberg.commit_append(loc, files, schema, now_ms=1000 + i,
                              partition_fields=part_fields)
        snap_ids.append(i + 1)

    want_cum: list[dict] = []
    for files, sid in zip(snaps, snap_ids):
        want_cum = want_cum + files  # append-only history
        ours = iceberg.scan_table(loc, snapshot_id=sid)
        theirs = cleanroom.scan(loc, snapshot_id=sid)
        # identical file sets in identical order, counts and sizes exact
        assert [f["path"] for f in theirs["files"]] == \
            [f["path"] for f in ours["files"]] == \
            [os.path.abspath(f["path"]) for f in want_cum]
        assert [f["record_count"] for f in theirs["files"]] == \
            [f["record_count"] for f in ours["files"]] == \
            [f["record_count"] for f in want_cum]
        assert [f["file_size"] for f in theirs["files"]] == \
            [f["file_size"] for f in ours["files"]] == \
            [f["file_size"] for f in want_cum]
        # bounds: the clean-room reader must recover the ORIGINAL values
        for cf, wf in zip(theirs["files"], want_cum):
            assert cf["bounds"] == wf["_bounds"]
        # partition tuples agree between readers and with the input
        for cf, of, wf in zip(theirs["files"], ours["files"], want_cum):
            want_part = ({"p": wf.get("partition", {}).get("p")}
                         if part_fields else {})
            assert cf["partition"] == of["partition"] == want_part
    # current snapshot == last snapshot (time-travel default)
    assert (cleanroom.scan(loc)["snapshot_id"]
            == iceberg.scan_table(loc)["snapshot_id"] == snap_ids[-1])


def test_cleanroom_reads_real_export(spark, tmp_path):
    """Both readers on a REAL engine export (footer stats included)."""
    import cryo_spark

    src = str(tmp_path / "in.parquet")
    cryo_spark.write_sequences(src, n=800, seed=3)
    out = str(tmp_path / "out")
    cryo_spark.freeze(spark, src, out, target_tokens=30_000)
    iceberg.export_frozen(spark, out, now_ms=1)
    loc = f"{out}/iceberg"
    ours = iceberg.scan_table(loc)
    theirs = cleanroom.scan(loc)
    assert [f["path"] for f in theirs["files"]] == \
        [f["path"] for f in ours["files"]]
    assert sum(f["record_count"] for f in theirs["files"]) == \
        sum(f["record_count"] for f in ours["files"])
    # the clean-room bounds must match the parquet footers directly
    import pyarrow.parquet as pq

    for f in theirs["files"]:
        md = pq.ParquetFile(f["path"]).metadata
        assert f["record_count"] == md.num_rows
        if "chunk_id" in f["bounds"]:
            lo, hi = f["bounds"]["chunk_id"]
            col = [md.row_group(g).column(c)
                   for g in range(md.num_row_groups)
                   for c in range(md.row_group(g).num_columns)
                   if md.row_group(g).column(c).path_in_schema == "chunk_id"]
            mn = min(c.statistics.min for c in col)
            mx = max(c.statistics.max for c in col)
            assert (lo, hi) == (mn, mx)


def test_cleanroom_reads_partitioned_export(spark, tmp_path):
    """Partition tuples through the independent decoder."""
    import dataclasses

    from cryo_spark import engine
    from cryo_spark.tablespec import EVENTS

    spec = dataclasses.replace(EVENTS, partition_col=None,
                               partition_transform="day(ts)")
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "out")
    engine.freeze(spark, src, out, target_tokens=100_000, spec=spec)
    loc = str(tmp_path / "pt")
    iceberg.export_frozen(spark, out, table_location=loc,
                          partitioned=True, now_ms=1)
    ours = iceberg.scan_table(loc)
    theirs = cleanroom.scan(loc)
    assert [(f["path"], f["partition"]) for f in theirs["files"]] == \
        [(f["path"], f["partition"]) for f in ours["files"]]
    assert len({f["partition"]["part"] for f in theirs["files"]}) > 1
