"""Projection semantics: include/exclude/columns set algebra + validation.

Re-expresses the reference's schema projection layer:
- ``compute_used_columns`` set algebra with the ``all`` marker
  (/root/reference/crates/freeze/src/types/schemas.rs:326-356): the used
  subset starts from per-table defaults, ``columns=`` replaces it,
  ``include=``/``exclude=`` adjust it, and the literal string ``"all"``
  expands to every known column.
- validation that every include/exclude/columns entry names a real
  column (/root/reference/crates/cli/src/parse/schemas.rs:115-167 —
  permissive include at schema level, validated at parse level; we
  validate eagerly, the stricter of the two).
- column ORDER is schema order, not request order — the property the
  reference's differential harness checks
  (/root/reference/crates/python/python/cryo_test/cryo_test/comparison.py:17-93).

The engine's fixed input schema lives here too, as the default table
spec; the projection helpers work on any ordered spec so encoded-table
and manifest projections share the code path.
"""

from __future__ import annotations

ALL = "all"

# (name, spark type, in default projection) — the input contract of
# BASELINE.json:input_hint
SEQUENCES_COLUMNS: list[tuple[str, str, bool]] = [
    ("doc_id", "string", True),
    ("tokens", "array<int>", True),
    ("n_tok", "int", True),
    ("source", "string", True),
]


class ColumnError(ValueError):
    """An include/exclude/columns entry names no known column."""


def compute_used_columns(
    all_columns: list[str],
    default_columns: list[str] | None = None,
    columns: list[str] | None = None,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> list[str]:
    """The reference's projection set algebra, in schema order.

    - ``columns`` replaces the default set entirely; ``[ALL]`` selects
      every column (schemas.rs:332-338).
    - otherwise start from ``default_columns`` (or all), add
      ``include`` (``[ALL]`` expands), remove ``exclude``.
    - every named column must exist (ColumnError otherwise); output
      order is ``all_columns`` order regardless of request order.
    """
    known = set(all_columns)
    for group, names in (("columns", columns), ("include", include), ("exclude", exclude)):
        for n in names or []:
            if n != ALL and n not in known:
                raise ColumnError(f"{group} entry {n!r} matches no column of {all_columns}")

    if columns is not None:
        used = known if ALL in columns else set(columns)
    else:
        used = set(default_columns if default_columns is not None else all_columns)
        if include:
            used |= known if ALL in include else set(include)
        if exclude:
            used -= set(exclude)
    return [c for c in all_columns if c in used]


def hex_columns(df, columns: list[str] | None = None, prefix: bool = True):
    """Binary -> hex string representation transform.

    The reference's ColumnEncoding::Hex applied per binary column
    (/root/reference/crates/freeze/src/types/conversions.rs:60-101,
    dyn_values.rs:352-356) — forced for csv/json sinks
    (/root/reference/crates/cli/src/parse/schemas.rs:37-40). Spark-side:
    ``lower(hex(c))`` with an optional ``0x`` prefix; a pure projection,
    no UDF.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    binary_cols = {f.name for f in df.schema.fields if isinstance(f.dataType, BinaryType)}
    targets = binary_cols if columns is None else (set(columns) & binary_cols)
    out = df
    for name in [f.name for f in df.schema.fields if f.name in targets]:
        h = F.lower(F.hex(F.col(name)))
        out = out.withColumn(name, F.concat(F.lit("0x"), h) if prefix else h)
    return out


def unhex_columns(df, columns: list[str]):
    """Hex string -> binary decode (0x prefix tolerated).

    Inverse of hex_columns — the reference's hex_string_to_binary
    (/root/reference/crates/cli/src/parse/parse_utils.rs:4-8: strip
    optional 0x, decode). Spark-side: ``unhex(regexp_replace(...))``,
    a pure projection, no UDF.
    """
    from pyspark.sql import functions as F

    out = df
    for name in columns:
        out = out.withColumn(
            name, F.unhex(F.regexp_replace(F.col(name), "^0x", ""))
        )
    return out
