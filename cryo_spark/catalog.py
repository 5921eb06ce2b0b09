"""Lightweight named-table catalog over frozen outputs.

On a real deployment the engine sits behind an Iceberg/Hive catalog:
the catalog's atomic snapshot swap replaces snapshots.py's link(2)-CAS
(that module documents the adapter seam), and table names resolve to
locations. In-sandbox, the catalog is a JSON file mapping table names
to output directories — ONLY the name -> location binding, exactly the
Iceberg catalog's table-location entry. Every table stays
self-describing (spec.json + snapshot log live in the output dir), so
nothing but the binding is duplicated and a table can always be read
without the catalog.

Writes are atomic (tmp + rename, single-writer discipline like the
reference CLI's one-process-per-output-dir model).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    """A JSON-file catalog of named frozen outputs."""

    def __init__(self, path: str):
        self.path = path

    # -- storage ------------------------------------------------------

    def _read(self) -> dict[str, dict]:
        try:
            with open(self.path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _write(self, entries: dict[str, dict]) -> None:
        tmp = f"{self.path}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(entries, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    # -- bindings -----------------------------------------------------

    def register(self, name: str, output_dir: str,
                 replace: bool = False) -> None:
        """Bind ``name`` to a frozen output directory.

        The target must look like an engine output (manifest/ or
        snapshots/ present) — a catalog of dangling names helps no one.
        """
        if not name or name.strip() != name:
            raise ValueError(f"bad table name {name!r}")
        if not any(
            os.path.isdir(os.path.join(output_dir, d))
            for d in ("manifest", "snapshots")
        ):
            raise ValueError(
                f"{output_dir!r} is not a frozen output (no manifest/ or "
                "snapshots/)")
        entries = self._read()
        if name in entries and not replace:
            raise ValueError(f"table {name!r} already registered "
                             f"(at {entries[name]['location']!r})")
        entries[name] = dict(location=os.path.abspath(output_dir))
        self._write(entries)

    def unregister(self, name: str) -> None:
        entries = self._read()
        if name not in entries:
            raise ValueError(f"unknown table {name!r}")
        del entries[name]
        self._write(entries)

    def location(self, name: str) -> str:
        entries = self._read()
        if name not in entries:
            raise ValueError(
                f"unknown table {name!r}; registered: {sorted(entries)}")
        return entries[name]["location"]

    # -- views --------------------------------------------------------

    def tables(self) -> dict[str, dict]:
        """Bindings enriched with each output's self-described state
        (spec family, snapshot head) — read from the table, not stored
        in the catalog."""
        from . import engine, snapshots

        out = {}
        for name, e in sorted(self._read().items()):
            loc = e["location"]
            spec = engine.load_output_spec(loc)
            log = snapshots.log(loc) if os.path.isdir(loc) else []
            out[name] = dict(
                location=loc,
                family=None if spec is None else spec.name,
                head_seq=log[-1]["seq"] if log else None,
            )
        return out

    # -- reads --------------------------------------------------------

    def load(self, spark: SparkSession, name: str, **collect_kwargs
             ) -> DataFrame:
        """``collect()`` by table name; the spec comes from the output's
        own spec.json (self-describing), not from the catalog."""
        from . import engine

        loc = self.location(name)
        spec = engine.load_output_spec(loc)
        if spec is not None and "spec" not in collect_kwargs:
            collect_kwargs["spec"] = spec
        return engine.collect(spark, loc, **collect_kwargs)
