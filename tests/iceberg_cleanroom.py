"""Clean-room Iceberg v2 metadata-chain reader (independent second
implementation, for cross-validation only).

r4 verdict item 3: no external Iceberg engine (pyiceberg, Spark runtime
jar, duckdb-iceberg) is installable in this container, so the next-best
cross-check of the vendored writer (cryo_spark/iceberg.py + avroio.py)
is a SECOND reader written directly from the public spec texts with no
imports from either module — two independent transcriptions of the
same grammar must agree on every table state, or one of them is wrong.

Sources (public):
- Avro 1.11 spec, binary encoding + object container file
  (https://avro.apache.org/docs/1.11.1/specification/): zigzag varint
  longs, length-prefixed bytes/strings, IEEE LE floats, union = branch
  index then value, record = fields in declaration order, array/map =
  count-prefixed blocks (negative count carries a byte size) ended by
  a 0 block; container = magic "Obj\x01", metadata map, 16-byte sync,
  then (count, size, data, sync) blocks.
- Iceberg table spec v2 (https://iceberg.apache.org/spec/): the chain
  version-hint.text -> v<N>.metadata.json -> current snapshot ->
  manifest-list Avro -> manifest Avro -> data-file entries; DELETED
  (status=2) entries drop out of scans; bounds are the spec's binary
  single-value serialization (little-endian ints/longs/floats, UTF-8
  strings).

DELIBERATELY not shared with cryo_spark.avroio: independent decode
loop, no schema "writer" half, resolves field names only (the slice a
scan needs). Importing anything from cryo_spark.iceberg/avroio here
would defeat the point; the test module pins that with an import
assertion.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any

# --------------------------------------------------------------------------
# Avro binary decoding (from the Avro 1.11 spec text)
# --------------------------------------------------------------------------


class _Reader:
    """Cursor over one Avro-encoded buffer."""

    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf = buf
        self.pos = pos

    def long(self) -> int:
        # spec: variable-length zig-zag, little-endian 7-bit groups
        shift = 0
        raw = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            raw |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (raw >> 1) ^ -(raw & 1)

    def nbytes(self, n: int) -> bytes:
        out = self.buf[self.pos:self.pos + n]
        if len(out) != n:
            raise EOFError("truncated avro buffer")
        self.pos += n
        return out


def _resolve(schema: Any, named: dict[str, Any]) -> Any:
    if isinstance(schema, str) and schema in named:
        return named[schema]
    return schema


def _register(schema: dict, named: dict[str, Any]) -> None:
    name = schema.get("name")
    if name:
        named[name] = schema
        ns = schema.get("namespace")
        if ns:
            named[f"{ns}.{name}"] = schema


def decode_value(r: _Reader, schema: Any, named: dict[str, Any]) -> Any:
    schema = _resolve(schema, named)
    if isinstance(schema, list):  # union: long branch index, then value
        return decode_value(r, schema[r.long()], named)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        v = r.nbytes(1)[0]
        return v != 0
    if t in ("int", "long"):
        return r.long()
    if t == "float":
        return struct.unpack("<f", r.nbytes(4))[0]
    if t == "double":
        return struct.unpack("<d", r.nbytes(8))[0]
    if t == "bytes":
        return r.nbytes(r.long())
    if t == "string":
        return r.nbytes(r.long()).decode("utf-8")
    if t == "fixed":
        _register(schema, named)
        return r.nbytes(schema["size"])
    if t == "enum":
        _register(schema, named)
        return schema["symbols"][r.long()]
    if t == "array":
        _register(schema, named) if isinstance(schema, dict) else None
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:  # negative block count: byte size follows
                n = -n
                r.long()
            for _ in range(n):
                out.append(decode_value(r, schema["items"], named))
    if t == "map":
        m: dict[str, Any] = {}
        while True:
            n = r.long()
            if n == 0:
                return m
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                k = r.nbytes(r.long()).decode("utf-8")
                m[k] = decode_value(r, schema["values"], named)
    if t == "record":
        _register(schema, named)
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]] = decode_value(r, f["type"], named)
        return rec
    raise TypeError(f"avro type {t!r} not needed by the iceberg chain")


def read_avro(path: str) -> list[dict]:
    """Decode one Avro object container file -> list of records."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != b"Obj\x01":
        raise ValueError(f"{path}: bad avro magic {buf[:4]!r}")
    r = _Reader(buf, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.nbytes(r.long()).decode("utf-8")
            meta[k] = r.nbytes(r.long())
    codec = meta.get("avro.codec", b"null")
    if codec == b"deflate":
        import zlib
        inflate = lambda d: zlib.decompress(d, -15)  # noqa: E731
    elif codec in (b"null", b""):
        inflate = None
    else:
        raise ValueError(f"{path}: codec {codec!r} unsupported")
    schema = json.loads(meta["avro.schema"])
    sync = r.nbytes(16)
    records: list[dict] = []
    named: dict[str, Any] = {}
    while r.pos < len(buf):
        cnt = r.long()
        size = r.long()
        block = r.nbytes(size)
        if inflate is not None:
            block = inflate(block)
        br = _Reader(block)
        for _ in range(cnt):
            records.append(decode_value(br, schema, named))
        if br.pos != len(block):
            raise ValueError(f"{path}: {len(block) - br.pos} stray bytes "
                             "in block")
        if r.nbytes(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return records


# --------------------------------------------------------------------------
# Iceberg v2 metadata chain (from the table-spec text)
# --------------------------------------------------------------------------


def load_metadata(location: str) -> dict:
    hint = os.path.join(location, "metadata", "version-hint.text")
    with open(hint) as f:
        version = int(f.read().strip())
    with open(os.path.join(location, "metadata",
                           f"v{version}.metadata.json")) as f:
        md = json.load(f)
    if md.get("format-version") != 2:
        raise ValueError(f"format-version {md.get('format-version')} != 2")
    return md


def snapshots_of(md: dict) -> list[dict]:
    return [{"snapshot_id": s["snapshot-id"],
             "timestamp_ms": s["timestamp-ms"],
             "manifest_list": s["manifest-list"]}
            for s in md.get("snapshots", [])]


def _decode_bound(raw: bytes, ice_type: str) -> Any:
    # spec appendix D: binary single-value serialization
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


def scan(location: str, snapshot_id: int | None = None) -> dict:
    """Plan a scan from the metadata chain alone (the Iceberg contract).

    Returns {"files": [{"path", "record_count", "file_size",
    "partition", "bounds": {col: (lo, hi)}}...], "snapshot_id": ...} —
    the same decision surface cryo_spark.iceberg.scan_table exposes,
    derived by an independent decoder.
    """
    md = load_metadata(location)
    snap_id = (md["current-snapshot-id"] if snapshot_id is None
               else snapshot_id)
    snap = next(s for s in md["snapshots"] if s["snapshot-id"] == snap_id)
    schema = next(s for s in md["schemas"]
                  if s["schema-id"] == md["current-schema-id"])
    type_of_id = {}
    for f in schema["fields"]:
        if isinstance(f["type"], str):
            type_of_id[f["id"]] = f["type"]
    name_of_id = {f["id"]: f["name"] for f in schema["fields"]}
    files = []
    for m in read_avro(snap["manifest-list"]):
        if m.get("content", 0) != 0:  # data manifests only
            continue
        for e in read_avro(m["manifest_path"]):
            if e["status"] == 2:  # DELETED
                continue
            df = e["data_file"]
            bounds: dict[str, tuple] = {}
            lo = {kv["key"]: kv["value"]
                  for kv in (df.get("lower_bounds") or [])}
            hi = {kv["key"]: kv["value"]
                  for kv in (df.get("upper_bounds") or [])}
            for fid in sorted(set(lo) | set(hi)):
                t = type_of_id.get(fid)
                if t is None:
                    continue
                bounds[name_of_id[fid]] = (
                    None if fid not in lo else _decode_bound(lo[fid], t),
                    None if fid not in hi else _decode_bound(hi[fid], t),
                )
            files.append({
                "path": df["file_path"],
                "record_count": df["record_count"],
                "file_size": df["file_size_in_bytes"],
                "partition": df.get("partition") or {},
                "bounds": bounds,
            })
    return {"files": files, "snapshot_id": snap_id}
