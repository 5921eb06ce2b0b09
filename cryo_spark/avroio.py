"""Minimal Apache Avro object-container-file writer/reader (vendored).

Iceberg v2 metadata (manifest lists and manifest files) is Avro, and
this container has no avro/fastavro and no network, so the subset of
Avro 1.11 the Iceberg spec needs is implemented here from the PUBLIC
Avro specification (https://avro.apache.org/docs/1.11.1/specification/)
— binary encoding + the object container file format, "null" codec
only. No code is taken from any Avro library; the format grammar below
is transcribed from the spec text:

- zigzag varint for int/long; IEEE LE for float/double
- bytes/string: long length + payload; fixed: raw n bytes
- array/map: blocks of (long count, items...) terminated by count 0;
  readers also accept the negative-count + byte-size block variant
- union: long branch index, then the branch value
- record: field values in declaration order
- container: magic "Obj\\x01", file-metadata map (avro.schema,
  avro.codec), 16-byte sync marker, then (count, size, data, sync)
  blocks

Schemas are the JSON objects themselves (dicts/lists/strs), so Iceberg
field-id attributes ride along untouched. Supported types: null,
boolean, int, long, float, double, bytes, string, fixed, enum, array,
map, union, record, and named-type references.

Reference parity: cryo's output contract is parquet + report JSON
(crates/freeze/src/types/files.rs:63-105); this module exists for the
Iceberg flavor of the same commit metadata.
"""

from __future__ import annotations

import hashlib
import io
import json
import struct
from typing import Any, Iterable

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# binary encoding
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(out: bytearray, n: int) -> None:
    z = _zigzag(n) & ((1 << 64) - 1)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return _unzigzag(acc), pos


class _Names:
    """Named-type registry (record/fixed/enum referenced by name)."""

    def __init__(self) -> None:
        self.types: dict[str, Any] = {}

    def define(self, schema: dict) -> None:
        name = schema.get("name")
        if name:
            self.types[name] = schema
            ns = schema.get("namespace")
            if ns:
                self.types[f"{ns}.{name}"] = schema

    def resolve(self, schema: Any) -> Any:
        if isinstance(schema, str) and schema in self.types:
            return self.types[schema]
        return schema


_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}


def _encode(schema: Any, val: Any, out: bytearray, names: _Names) -> None:
    schema = names.resolve(schema)
    if isinstance(schema, list):  # union: pick the first matching branch
        idx = _union_branch(schema, val, names)
        write_long(out, idx)
        _encode(schema[idx], val, out, names)
        return
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        if val is not None:
            raise TypeError(f"null schema got {val!r}")
    elif t == "boolean":
        out.append(1 if val else 0)
    elif t in ("int", "long"):
        write_long(out, int(val))
    elif t == "float":
        out += struct.pack("<f", float(val))
    elif t == "double":
        out += struct.pack("<d", float(val))
    elif t == "bytes":
        b = bytes(val)
        write_long(out, len(b))
        out += b
    elif t == "string":
        b = str(val).encode("utf-8")
        write_long(out, len(b))
        out += b
    elif t == "fixed":
        names.define(schema)
        b = bytes(val)
        if len(b) != schema["size"]:
            raise ValueError(f"fixed size {schema['size']} got {len(b)}")
        out += b
    elif t == "enum":
        names.define(schema)
        write_long(out, schema["symbols"].index(val))
    elif t == "array":
        items = list(val)
        if items:
            write_long(out, len(items))
            for it in items:
                _encode(schema["items"], it, out, names)
        write_long(out, 0)
    elif t == "map":
        entries = dict(val)
        if entries:
            write_long(out, len(entries))
            for k, v in entries.items():
                _encode("string", k, out, names)
                _encode(schema["values"], v, out, names)
        write_long(out, 0)
    elif t == "record":
        names.define(schema)
        for f in schema["fields"]:
            fname = f["name"]
            if isinstance(val, dict):
                if fname in val:
                    fval = val[fname]
                elif "default" in f:
                    fval = f["default"]
                else:
                    raise KeyError(f"record field {fname!r} missing")
            else:
                fval = getattr(val, fname)
            _encode(f["type"], fval, out, names)
    else:
        raise TypeError(f"unsupported avro type {t!r}")


def _union_branch(union: list, val: Any, names: _Names) -> int:
    def matches(s: Any) -> bool:
        s = names.resolve(s)
        t = s if isinstance(s, str) else s["type"]
        if t == "null":
            return val is None
        if val is None:
            return False
        if t == "boolean":
            return isinstance(val, bool)
        if t in ("int", "long"):
            return isinstance(val, int) and not isinstance(val, bool)
        if t in ("float", "double"):
            return isinstance(val, float)
        if t == "string":
            return isinstance(val, str)
        if t in ("bytes", "fixed"):
            return isinstance(val, (bytes, bytearray))
        if t == "array":
            return isinstance(val, (list, tuple))
        if t in ("map", "record"):
            return isinstance(val, dict)
        if t == "enum":
            return isinstance(val, str)
        return False

    for i, s in enumerate(union):
        if matches(s):
            return i
    raise TypeError(f"no union branch in {union} matches {val!r}")


def _decode(schema: Any, buf: bytes, pos: int, names: _Names
            ) -> tuple[Any, int]:
    schema = names.resolve(schema)
    if isinstance(schema, list):
        idx, pos = read_long(buf, pos)
        return _decode(schema[idx], buf, pos, names)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return read_long(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "bytes":
        n, pos = read_long(buf, pos)
        return bytes(buf[pos:pos + n]), pos + n
    if t == "string":
        n, pos = read_long(buf, pos)
        return buf[pos:pos + n].decode("utf-8"), pos + n
    if t == "fixed":
        names.define(schema)
        n = schema["size"]
        return bytes(buf[pos:pos + n]), pos + n
    if t == "enum":
        names.define(schema)
        i, pos = read_long(buf, pos)
        return schema["symbols"][i], pos
    if t == "array":
        out = []
        while True:
            cnt, pos = read_long(buf, pos)
            if cnt == 0:
                break
            if cnt < 0:  # negative-count block: byte size follows
                cnt = -cnt
                _, pos = read_long(buf, pos)
            for _ in range(cnt):
                v, pos = _decode(schema["items"], buf, pos, names)
                out.append(v)
        return out, pos
    if t == "map":
        out_m: dict[str, Any] = {}
        while True:
            cnt, pos = read_long(buf, pos)
            if cnt == 0:
                break
            if cnt < 0:
                cnt = -cnt
                _, pos = read_long(buf, pos)
            for _ in range(cnt):
                k, pos = _decode("string", buf, pos, names)
                v, pos = _decode(schema["values"], buf, pos, names)
                out_m[k] = v
        return out_m, pos
    if t == "record":
        names.define(schema)
        rec: dict[str, Any] = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _decode(f["type"], buf, pos, names)
        return rec, pos
    raise TypeError(f"unsupported avro type {t!r}")


# ---------------------------------------------------------------------------
# object container file
# ---------------------------------------------------------------------------


def write_container(path: str, schema: Any, records: Iterable[Any],
                    metadata: dict[str, bytes] | None = None) -> int:
    """Write an Avro object container file; returns its byte length.

    The 16-byte sync marker is derived deterministically from the
    schema + path (sha1 prefix) so repeated builds of the same metadata
    are byte-identical — the differential harness compares table dirs
    at the byte level.
    """
    schema_json = json.dumps(schema, separators=(",", ":"))
    sync = hashlib.sha1(
        b"cryo_spark.avro\x00" + path.encode() + schema_json.encode()
    ).digest()[:16]
    names = _Names()
    body = bytearray()
    n = 0
    for rec in records:
        _encode(schema, rec, body, names)
        n += 1
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": schema_json.encode(),
            "avro.codec": b"null"}
    for k, v in (metadata or {}).items():
        meta[k] = v
    mbuf = bytearray()
    write_long(mbuf, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        write_long(mbuf, len(kb))
        mbuf += kb
        write_long(mbuf, len(v))
        mbuf += v
    write_long(mbuf, 0)
    out.write(bytes(mbuf))
    out.write(sync)
    if n:
        head = bytearray()
        write_long(head, n)
        write_long(head, len(body))
        out.write(bytes(head))
        out.write(bytes(body))
        out.write(sync)
    data = out.getvalue()
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    import os
    os.replace(tmp, path)
    return len(data)


def read_container(path: str) -> tuple[Any, dict[str, bytes], list[Any]]:
    """Read an Avro object container file -> (schema, metadata, records)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != MAGIC:
        raise ValueError(f"{path}: not an avro container (magic "
                         f"{buf[:4]!r})")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        cnt, pos = read_long(buf, pos)
        if cnt == 0:
            break
        if cnt < 0:
            cnt = -cnt
            _, pos = read_long(buf, pos)
        for _ in range(cnt):
            klen, pos = read_long(buf, pos)
            k = buf[pos:pos + klen].decode()
            pos += klen
            vlen, pos = read_long(buf, pos)
            meta[k] = bytes(buf[pos:pos + vlen])
            pos += vlen
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise ValueError(f"{path}: unsupported avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode())
    sync = buf[pos:pos + 16]
    pos += 16
    names = _Names()
    records: list[Any] = []
    while pos < len(buf):
        cnt, pos = read_long(buf, pos)
        size, pos = read_long(buf, pos)
        end = pos + size
        for _ in range(cnt):
            rec, pos = _decode(schema, buf, pos, names)
            records.append(rec)
        if pos != end:
            raise ValueError(f"{path}: block size mismatch "
                             f"({pos} != {end})")
        if buf[pos:pos + 16] != sync:
            raise ValueError(f"{path}: bad sync marker at {pos}")
        pos += 16
    return schema, meta, records
