"""TableSpec: the engine's per-table contract (columns, key, weight).

Round 1 hardcoded the BASELINE.json input shape (doc_id, tokens, n_tok,
source) through the plan/pack/encode/decode path. A training-data lake
holds more than one table of that family — embedding tables, label
tables — and the reference itself is schema-driven (every dataset
declares its columns once,
/root/reference/crates/freeze/src/datasets/*.rs, and the engine's
collect/freeze machinery is generic over them). TableSpec is that idea
for this engine: one declarative description per table, consumed by

- layout.plan_chunks      (which columns weigh the balance histogram)
- engine pack kernel      (which list columns reinterpret to binary)
- engine encode kernel    (which codec family per column)
- engine decode kernel    (how to rebuild each column bit-identically)

Supported column kinds map 1:1 onto codec families (codecs/):

  str                        -> choose_str   (strdict / strfsst / strplain)
  binary                     -> choose_str   (same buffer layout; opaque
                                              payloads re-typed zero-copy)
  int32 / int64              -> choose_int   (dict / rle / for / bitpack / ...)
  float32 / float64          -> choose_float (falp / fbss / fplain)
  list<int32> / list<int64>  -> choose_int on flat values + choose_int lengths
  list<float32/float64>      -> choose_float on flat values + choose_int lengths

The key column may be ``str`` or ``int64``; non-string keys are cast to
their decimal string form *only for hashing and manifest min/max* (the
stored column keeps its native type and round-trips bit-identically).
The cast is pyarrow's, applied identically in the planner's histogram
kernel and the executors' pack kernel, so chunk assignment stays a pure
function of the data at any parallelism level (FIXTURES.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SCALAR_PA = {
    "str": pa.string(),
    "binary": pa.binary(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    # tz-free microsecond timestamps (Spark TIMESTAMP_NTZ; what Spark
    # reads from parquet isAdjustedToUTC=false). Stored/encoded as
    # int64 epoch-micros through the int codec family — delta-of-delta
    # ('dod') collapses the near-regular spacing of event streams —
    # and rebuilt as timestamp[us] on decode, bit-identical.
    "timestamp": pa.timestamp("us"),
}
_LIST_ITEM = {
    "list<int32>": np.dtype("<i4"),
    "list<int64>": np.dtype("<i8"),
    "list<float32>": np.dtype("<f4"),
    "list<float64>": np.dtype("<f8"),
}
_SPARK_TYPE = {
    "str": "string",
    "binary": "binary",
    "int32": "int",
    "int64": "long",
    "float32": "float",
    "float64": "double",
    "timestamp": "timestamp_ntz",
    "list<int32>": "array<int>",
    "list<int64>": "array<long>",
    "list<float32>": "array<float>",
    "list<float64>": "array<double>",
}


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    kind: str  # key of _SPARK_TYPE

    def __post_init__(self):
        if self.kind not in _SPARK_TYPE:
            raise ValueError(f"unknown column kind {self.kind!r}")

    @property
    def is_list(self) -> bool:
        return self.kind in _LIST_ITEM

    @property
    def item_dtype(self) -> np.dtype:
        return _LIST_ITEM[self.kind]

    @property
    def item_size(self) -> int:
        return _LIST_ITEM[self.kind].itemsize

    @property
    def spark_type(self) -> str:
        return _SPARK_TYPE[self.kind]

    @property
    def pa_item_type(self) -> pa.DataType:
        return pa.from_numpy_dtype(_LIST_ITEM[self.kind])

    @property
    def pa_type(self) -> pa.DataType:
        if self.is_list:
            return pa.list_(self.pa_item_type)
        return _SCALAR_PA[self.kind]

    @property
    def np_dtype(self) -> np.dtype:
        """Numpy dtype of a scalar column's values (raises for lists/str)."""
        return {
            "int32": np.dtype("<i4"), "int64": np.dtype("<i8"),
            "float32": np.dtype("<f4"), "float64": np.dtype("<f8"),
            "timestamp": np.dtype("<i8"),  # epoch-micros at the codec layer
        }[self.kind]


_NULL_PART = "__null__"   # partition value of a null transform input
_DAY_US = 86_400_000_000


def _parse_transform(expr: str) -> tuple[str, tuple[str, ...]]:
    """Parse ``year|month|day|hour(col)`` / ``bucket(n, col)`` /
    ``truncate(w, col)``. Temporal transforms follow Iceberg's
    semantics: the value is the UNITS-SINCE-EPOCH index (years since
    1970, months since 1970-01, days/hours since the epoch instant)."""
    import re

    m = re.fullmatch(
        r"\s*(year|month|day|hour|bucket|truncate)\(\s*(.+?)\s*\)\s*", expr)
    if m:
        kind = m.group(1)
        args = tuple(a.strip() for a in m.group(2).split(","))
        if kind in ("year", "month", "day", "hour") and len(args) == 1:
            return kind, args
        if (kind in ("bucket", "truncate") and len(args) == 2
                and args[0].isdigit() and int(args[0]) > 0):
            return kind, args
    raise ValueError(
        f"bad partition_transform {expr!r}; expected year(col), month(col), "
        "day(col), hour(col), bucket(n, col) or truncate(w, col)")


def partition_values(t: pa.Table, spec: "TableSpec") -> pa.Array | None:
    """Per-row partition value (string array), or None for one partition.

    THE definition of a row's partition — the plan histogram and the
    executors' pack kernel both call this, so placement stays a pure
    function of the data (FIXTURES.md §4) under hidden partitioning
    exactly as it does for an identity partition column. Null transform
    inputs map to the sentinel '__null__' partition (Iceberg puts null
    values in their own partition too).
    """
    if spec.partition_col is not None:
        return t.column(spec.partition_col).combine_chunks()
    if spec.partition_transform is None:
        return None
    kind, args = _parse_transform(spec.partition_transform)
    a = t.column(args[-1]).combine_chunks()
    if kind in ("day", "hour"):
        vals = a.cast(pa.int64()).fill_null(0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        unit = _DAY_US if kind == "day" else _DAY_US // 24
        out = pc.cast(pa.array(np.floor_divide(vals, unit)), pa.string())
    elif kind in ("year", "month"):
        # proleptic-Gregorian calendar fields, offset to Iceberg's
        # years/months-since-epoch indices; arrow and Spark agree on
        # year()/month() for the full timestamp range
        y = pc.subtract(pc.year(a), 1970)
        idx = (y if kind == "year"
               else pc.add(pc.multiply(y, 12), pc.subtract(pc.month(a), 1)))
        out = pc.cast(idx.fill_null(0), pa.string())
    elif kind == "bucket":
        from . import hashing

        n = int(args[0])
        s = a if a.type == pa.string() else pc.cast(a, pa.string())
        h = hashing.hash_utf8(s.fill_null(""))
        out = pc.cast(pa.array((h % np.uint64(n)).astype(np.int64)),
                      pa.string())
    else:  # truncate
        out = pc.utf8_slice_codeunits(a, 0, int(args[0]))
    if a.null_count:
        out = pc.if_else(a.is_valid(), out, pa.scalar(_NULL_PART))
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def partition_expr(spec: "TableSpec"):
    """Spark Column form of :func:`partition_values` (same strings).

    Used by the range/zorder bounds aggregation, which groups in SQL.
    ``bucket`` has no JVM twin of the numpy hash — range/zorder layouts
    reject it; the hash layout's histogram runs arrow-side and never
    needs this expression.
    """
    from pyspark.sql import functions as F

    if spec.partition_col is not None:
        return F.col(spec.partition_col)
    if spec.partition_transform is None:
        return F.lit("")
    kind, args = _parse_transform(spec.partition_transform)
    col = args[-1]
    if kind in ("day", "hour"):
        # floor over double is exact here: |micros| < 2^53 (year 2255)
        # and adjacent inputs differ by >= 1 us, far above the ulp at
        # day-index magnitude — matches numpy floor_divide bit-for-bit
        unit = _DAY_US if kind == "day" else _DAY_US // 24
        e = F.expr(
            "CAST(CAST(floor(timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {col}) "
            f"/ {unit}.0) AS BIGINT) AS STRING)")
    elif kind == "year":
        e = F.expr(f"CAST(year({col}) - 1970 AS STRING)")
    elif kind == "month":
        e = F.expr(
            f"CAST((year({col}) - 1970) * 12 + month({col}) - 1 AS STRING)")
    elif kind == "truncate":
        e = F.substring(col, 1, int(args[0]))
    else:
        raise ValueError(
            "bucket() partition transform requires the hash layout "
            "(no SQL twin of the planner's hash)")
    return F.coalesce(e, F.lit(_NULL_PART))


@dataclass(frozen=True)
class TableSpec:
    """Declarative table contract.

    ``weight``: the column that weighs a row in the chunk-balance plan —
    a scalar int column (its value), a list column (its element count),
    or None (every row weighs 1). ``partition_col``: the string column
    whose distinct values become top-level partitions (the reference's
    per-source output dirs); None collapses to a single partition.

    ``partition_transform``: Iceberg hidden partitioning — a DERIVED
    partition value, computed identically at plan and pack time, never
    stored as a column. Grammar (Iceberg's transform menu):

      ``year|month|day|hour(col)``  units-since-epoch index of a
                            timestamp column (Iceberg's temporal menu)
      ``bucket(n, col)``    hash_utf8(value) mod n of a str/int column
      ``truncate(w, col)``  first w code points of a str column

    Mutually exclusive with ``partition_col`` (which IS the identity
    transform). Transform values are strings (like source values); the
    underlying column still round-trips bit-identically as data.
    """

    name: str
    key: str
    columns: tuple[ColumnSpec, ...]
    partition_col: str | None = None
    weight: str | None = None
    partition_transform: str | None = None

    def __post_init__(self):
        by_name = {c.name: c for c in self.columns}
        if len(by_name) != len(self.columns):
            raise ValueError("duplicate column names")
        key = by_name.get(self.key)
        if key is None or key.kind not in ("str", "int64", "int32"):
            raise ValueError("key must be an existing str/int column")
        if self.partition_col is not None and (
            self.partition_col not in by_name
            or by_name[self.partition_col].kind != "str"
        ):
            raise ValueError("partition_col must be an existing str column")
        if self.weight is not None and (
            self.weight not in by_name
            or (by_name[self.weight].kind not in ("int32", "int64")
                and not by_name[self.weight].is_list)
        ):
            raise ValueError("weight must be an int or list column")
        if self.partition_transform is not None:
            if self.partition_col is not None:
                raise ValueError(
                    "partition_transform and partition_col are mutually "
                    "exclusive (partition_col IS the identity transform)")
            kind, args = _parse_transform(self.partition_transform)
            col = by_name.get(args[-1])
            if col is None:
                raise ValueError(
                    f"partition_transform references unknown column "
                    f"{args[-1]!r}")
            want = {"year": ("timestamp",), "month": ("timestamp",),
                    "day": ("timestamp",), "hour": ("timestamp",),
                    "bucket": ("str", "int32", "int64"),
                    "truncate": ("str",)}[kind]
            if col.kind not in want:
                raise ValueError(
                    f"{kind}() partition transform needs a column of kind "
                    f"{want}; {col.name!r} is {col.kind!r}")

    def col(self, name: str) -> ColumnSpec:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)

    def with_column(self, col: ColumnSpec) -> "TableSpec":
        """Schema evolution (Iceberg add-column): this spec + one column.

        Outputs frozen under the OLD spec stay readable under the new
        one — chunks that predate the column decode it as all-null
        (engine._decode_chunk); new freezes carry real values. No
        rewrite of committed history, same contract as Iceberg's
        add_column metadata change.
        """
        import dataclasses

        return dataclasses.replace(
            self, name=self.name, columns=(*self.columns, col))

    @property
    def key_col(self) -> ColumnSpec:
        return self.col(self.key)

    @property
    def list_column(self) -> str | None:
        """First list column — the payload whose value count the manifest
        reports as ``tokens`` (FreezeSummary's row-count analog)."""
        for c in self.columns:
            if c.is_list:
                return c.name
        return None

    @property
    def weight_col(self) -> ColumnSpec | None:
        return None if self.weight is None else self.col(self.weight)

    @property
    def footer_stat_col(self) -> str | None:
        """Column whose parquet-footer num_values equals the total plan
        weight EXACTLY (the statistic an Iceberg manifest carries):
        a list weight's flattened element count, the payload list column
        a scalar weight is pinned to (the input contract n_tok ==
        len(tokens)), or the key for unit weights (row count). None
        means no footer statistic matches — planning must scan."""
        w = self.weight_col
        if w is None:
            return self.key
        if w.is_list:
            return w.name
        if self.list_column:
            return self.list_column
        return None

    def spark_ddl(self, names: list[str] | None = None) -> str:
        cols = self.columns if names is None else [self.col(n) for n in names]
        return ", ".join(f"{c.name} {c.spark_type}" for c in cols)

    def packed_ddl(self) -> str:
        """Schema of the pre-shuffle packed rows: list columns become
        binary (engine pack kernel), scalars pass through."""
        parts = [
            f"{c.name} binary" if c.is_list else f"{c.name} {c.spark_type}"
            for c in self.columns
        ]
        parts += ["partition_id int", "chunk_id int", "shuffle_key int"]
        return ", ".join(parts)

    def packed_pa_schema(self) -> pa.schema:
        fields = [
            (c.name, pa.binary() if c.is_list else _SCALAR_PA[c.kind])
            for c in self.columns
        ]
        fields += [("partition_id", pa.int32()), ("chunk_id", pa.int32()),
                   ("shuffle_key", pa.int32())]
        return pa.schema(fields)

    def plan_columns(self) -> list[str]:
        """Columns the balance-histogram scan needs (column-pruned)."""
        cols = [self.key]
        if self.weight is not None and self.weight not in cols:
            cols.append(self.weight)
        if self.partition_col is not None and self.partition_col not in cols:
            cols.append(self.partition_col)
        if self.partition_transform is not None:
            src = _parse_transform(self.partition_transform)[1][-1]
            if src not in cols:
                cols.append(src)
        return cols

    def to_dict(self) -> dict:
        """JSON-portable form (the Iceberg table-metadata schema analog:
        frozen outputs persist this next to the snapshot log so readers
        need no out-of-band spec)."""
        d = {
            "name": self.name,
            "key": self.key,
            "columns": [{"name": c.name, "kind": c.kind}
                        for c in self.columns],
            "partition_col": self.partition_col,
            "weight": self.weight,
        }
        # omitted when unset: specs persisted by older engine versions
        # round-trip byte-identically (fingerprint stability)
        if self.partition_transform is not None:
            d["partition_transform"] = self.partition_transform
        return d

    def to_json(self) -> str:
        import json

        return json.dumps(self.to_dict(), indent=1)

    @classmethod
    def from_dict(cls, d: dict) -> "TableSpec":
        """Inverse of :meth:`to_dict`; ``__post_init__`` re-validates, so
        a hand-written JSON spec gets the same checks as a literal one."""
        extra = set(d) - {"name", "key", "columns", "partition_col",
                          "weight", "partition_transform"}
        if extra:
            raise ValueError(f"unknown TableSpec fields: {sorted(extra)}")
        return cls(
            name=d["name"],
            key=d["key"],
            columns=tuple(ColumnSpec(c["name"], c["kind"])
                          for c in d["columns"]),
            partition_col=d.get("partition_col"),
            weight=d.get("weight"),
            partition_transform=d.get("partition_transform"),
        )

    @classmethod
    def from_json(cls, text: str) -> "TableSpec":
        import json

        return cls.from_dict(json.loads(text))


def key_strings(t: pa.Table, spec: TableSpec) -> pa.Array:
    """The key column as a string array (identity for str keys).

    Used for bucket hashing and manifest min/max only — the stored key
    keeps its native type. Raises on null keys (the key IS the space)."""
    arr = t.column(spec.key).combine_chunks()
    if arr.null_count:
        raise ValueError(f"{spec.key} must be non-null (it is the key space)")
    if spec.key_col.kind != "str":
        arr = pc.cast(arr, pa.string())
    return arr


def row_weights(t: pa.Table, spec: TableSpec) -> np.ndarray:
    """Per-row planning weight as float64 (exact below 2^53)."""
    n = t.num_rows
    c = spec.weight_col
    if c is None:
        return np.ones(n, dtype=np.float64)
    arr = t.column(spec.weight).combine_chunks()
    if c.is_list:
        off = arr.offset
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[off : off + n + 1]
        w = np.diff(offsets).astype(np.float64)
        if arr.null_count:
            w *= arr.is_valid().to_numpy(zero_copy_only=False)
        return w
    return (
        arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.float64)
    )


SEQUENCES = TableSpec(
    name="sequences",
    key="doc_id",
    columns=(
        ColumnSpec("doc_id", "str"),
        ColumnSpec("tokens", "list<int32>"),
        ColumnSpec("n_tok", "int32"),
        ColumnSpec("source", "str"),
    ),
    partition_col="source",
    weight="n_tok",
)

EMBEDDINGS = TableSpec(
    name="embeddings",
    key="vec_id",
    columns=(
        ColumnSpec("vec_id", "int64"),
        ColumnSpec("embedding", "list<float32>"),
        ColumnSpec("label", "int32"),
    ),
    partition_col=None,
    weight="embedding",
)

MEDIA = TableSpec(
    name="media",
    key="media_id",
    columns=(
        ColumnSpec("media_id", "str"),
        ColumnSpec("payload", "binary"),
        ColumnSpec("mime", "str"),
        ColumnSpec("n_bytes", "int64"),
    ),
    partition_col=None,
    weight="n_bytes",
)

DOCUMENTS = TableSpec(
    name="documents",
    key="doc_id",
    columns=(
        ColumnSpec("doc_id", "int64"),
        ColumnSpec("text", "str"),
        ColumnSpec("lang", "str"),
        ColumnSpec("source", "str"),
        ColumnSpec("n_chars", "int64"),
    ),
    partition_col="source",
    weight="n_chars",
)

EVENTS = TableSpec(
    name="events",
    key="event_id",
    columns=(
        ColumnSpec("event_id", "int64"),
        ColumnSpec("ts", "timestamp"),
        ColumnSpec("user_id", "int64"),
        ColumnSpec("event_type", "str"),
        ColumnSpec("value", "float64"),
        ColumnSpec("props", "str"),
    ),
    partition_col="event_type",
    weight=None,  # every event weighs 1: chunks balance on row count
)

# Named registry for CLI/job surfaces (`--table sequences|embeddings|...`)
# — the analog of the reference's dataset-name lookup
# (/root/reference/crates/freeze/src/datasets/mod.rs).
PACKED_SEQUENCES = TableSpec(
    name="packed_sequences",
    key="window_id",
    columns=(
        ColumnSpec("window_id", "int64"),
        ColumnSpec("tokens", "list<int32>"),
        ColumnSpec("n_tok", "int32"),
        ColumnSpec("n_docs", "int32"),
    ),
    partition_col=None,
    weight="n_tok",
)

SPECS: dict[str, TableSpec] = {
    s.name: s
    for s in (SEQUENCES, EMBEDDINGS, DOCUMENTS, MEDIA, PACKED_SEQUENCES,
              EVENTS)
}


def resolve_spec(name_or_path: str) -> TableSpec:
    """Resolve a ``--table`` argument: a registry name, or a path to a
    JSON spec file (user-defined table family — the reference takes only
    built-in dataset names; JSON specs are this engine's extension point
    for arbitrary (key, lists, scalars) tables without code changes)."""
    import os

    if name_or_path in SPECS:
        return SPECS[name_or_path]
    if name_or_path.endswith(".json") or os.path.sep in name_or_path:
        with open(name_or_path) as f:
            return TableSpec.from_json(f.read())
    raise ValueError(
        f"unknown table {name_or_path!r}: not in {sorted(SPECS)} and not a "
        "JSON spec path"
    )
