"""Key-range request grammar (cryo's block-range syntax, over doc keys).

Implements the reference's range grammar
(/root/reference/crates/cli/src/parse/blocks.rs:149-372) for numeric
document keys:

- ``N``            one key
- ``a:b``          keys [a, b-1]   (end-exclusive, like the reference)
- ``a:``           keys [a, latest]
- ``:b``           keys [0, b-1]
- ``a:+n``         keys [a, a+n-1]
- ``-n:b``         the n keys ending at b: [b-n+1, b]
- ``a:b:stride``   every stride-th key of [a, b-1]
- ``a:b/n``        n evenly spaced keys from [a, b-1]
- ``K/M/B`` suffixes (case-insensitive, float mantissa: ``0.5M``),
  ``_`` separators, space-separated multi-token lists, ``latest``.

Ranges become BETWEEN predicates (parquet row-group pruning via
min/max statistics); stride is a residual modulo condition on top of
the pushable envelope; ``/n`` subsets are small explicit IN lists.
For string keys in a zero-padded fixed-width format (the engine's
``doc-%012d``), the envelope is emitted against the raw string column
— lexicographic order equals numeric order — so the scan still prunes,
with the numeric condition evaluated as a residual.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

from pyspark.sql import Column, functions as F


@dataclass(frozen=True)
class KeyRange:
    """Closed interval [start, end], optional stride (every stride-th key)."""

    start: int
    end: int
    stride: int = 1


@dataclass(frozen=True)
class KeyNumbers:
    numbers: tuple[int, ...]


_SUFFIX = {"k": 1e3, "m": 1e6, "b": 1e9}


def _parse_number(ref: str, *, position: str, latest: int | None) -> int:
    if ref == "latest" or (ref == "" and position == "last"):
        if latest is None:
            raise ValueError("'latest' requires a resolved latest key")
        return latest
    if ref == "":
        if position == "first":
            return 0
        raise ValueError("empty key reference")
    mul = _SUFFIX.get(ref[-1].lower())
    if mul is not None:
        return int(round(float(ref[:-1]) * mul))
    return int(float(ref))


def _evenly_spaced(start: int, end: int, n: int) -> tuple[int, ...]:
    """The reference's evenly_spaced_subset (blocks.rs:253-272): floor of a
    fractional accumulator — NOT a simple arange, endpoints included."""
    total = end - start + 1
    if n <= 0 or total <= 0:
        return ()
    if n >= total:
        return tuple(range(start, end + 1))
    interval = (total - 1) / (n - 1)
    acc = 0.0
    out = []
    for _ in range(n):
        out.append(start + math.floor(acc))
        acc += interval
    return tuple(out)


def parse_key_specs(spec: str, latest: int | None = None) -> list[KeyRange | KeyNumbers]:
    """Parse a space-separated list of range tokens into key chunks."""
    chunks: list[KeyRange | KeyNumbers] = []
    for token in spec.split(" "):
        if not token:
            continue
        token = token.replace("_", "")
        parts = token.split(":")
        if len(parts) == 1:
            chunks.append(KeyNumbers((_parse_number(parts[0], position="none", latest=latest),)))
            continue
        if len(parts) == 3:
            first, second, stride_s = parts
            stride = int(stride_s)
            n_keep = None
        elif len(parts) == 2:
            first, second = parts
            stride = 1
            n_keep = None
            m = re.fullmatch(r"(.*)/(\d+)", second)
            if m:
                second, n_keep = m.group(1), int(m.group(2))
        else:
            raise ValueError(f"bad range token {token!r}")

        if first.startswith("-"):
            end = _parse_number(second, position="last", latest=latest)
            start = end - _parse_number(first[1:], position="none", latest=latest) + 1
        elif second.startswith("+"):
            start = _parse_number(first, position="first", latest=latest)
            end = start + _parse_number(second[1:], position="none", latest=latest) - 1
        else:
            start = _parse_number(first, position="first", latest=latest)
            end = _parse_number(second, position="last", latest=latest)
            if second not in ("latest", ""):
                end -= 1  # end-exclusive numeric bound, like the reference
        if end < start:
            raise ValueError(f"end < start in {token!r}")
        if n_keep is not None:
            chunks.append(KeyNumbers(_evenly_spaced(start, end, n_keep)))
        elif stride != 1:
            chunks.append(KeyRange(start, end, stride))
        else:
            chunks.append(KeyRange(start, end))
    if not chunks:
        raise ValueError("empty key spec")
    return chunks


def key_predicate(
    chunks: list[KeyRange | KeyNumbers],
    key: Column,
    *,
    envelope: Column | None = None,
    fmt: str | None = None,
) -> Column:
    """Spark predicate selecting the requested keys.

    ``key`` is the numeric key expression. When the stored column is a
    zero-padded string (``fmt`` e.g. ``doc-%012d`` with ``envelope`` =
    the raw string column), range bounds are ALSO emitted against the
    raw column so the parquet scan prunes row groups on its min/max
    stats; the numeric conditions stay as residuals. Stride becomes a
    modulo residual over the pushable BETWEEN envelope.
    """
    terms: list[Column] = []
    for c in chunks:
        if isinstance(c, KeyNumbers):
            t = key.isin(list(c.numbers))
            if fmt is not None and envelope is not None:
                t = t & envelope.isin([fmt % n for n in c.numbers])
        else:
            t = key.between(c.start, c.end)
            if fmt is not None and envelope is not None:
                t = t & envelope.between(fmt % c.start, fmt % c.end)
            if c.stride != 1:
                t = t & (((key - c.start) % c.stride) == 0)
        terms.append(t)
    pred = terms[0]
    for t in terms[1:]:
        pred = pred | t
    return pred
