"""cryo_spark — a PySpark-native per-column lightweight-compression engine.

A from-scratch engine with the capabilities of ``whaleclub777/cryo``
(partitioned columnar extract→transform→encode→write with chunking,
per-column representation encoding, manifest/resume), re-expressed
Spark-first: DataFrame layout transformations + vectorized Arrow/pandas
codec kernels + a manifest-driven freeze job.

Public API (cryo analog: ``cryo.collect`` / ``cryo.freeze``,
/root/reference/crates/python/python/cryo/_collect.py:53-143):

- ``encode(df, ...) -> DataFrame``   — encoded chunk table (no sink)
- ``decode(enc_df) -> DataFrame``    — inverse, bit-identical rows
- ``freeze(spark, input_path, output_dir, ...) -> dict`` — full job with
  manifest, skip-existing resume, atomic commit, metrics.
"""

from .colocated import join_frozen
from .engine import (collect, compact, consolidate_manifests, decode,
                     decode_frozen, delete_where,
                     describe, encode, export, export_shards, freeze,
                     load_output_plan, pack, purge_deletes, read_appends,
                     read_encoded, read_manifest, remove_orphans, upsert,
                     vacuum, verify_output)
from .aio import async_collect, async_decode, async_encode, async_freeze
from .snapshots import log as snapshot_log
from .fixtures import (
    generate_embeddings,
    generate_sequences,
    write_embeddings,
    write_sequences,
)
from .schema import compute_used_columns, hex_columns, unhex_columns
from .tablespec import SPECS, ColumnSpec, TableSpec

__version__ = "0.1.0"

__all__ = [
    "encode", "decode", "decode_frozen", "freeze", "compact", "collect",
    "export", "export_shards", "pack", "vacuum", "consolidate_manifests",
    "remove_orphans", "read_encoded", "read_manifest", "snapshot_log",
    "delete_where", "purge_deletes", "upsert", "describe", "verify_output",
    "read_appends", "join_frozen", "load_output_plan",
    "async_collect", "async_freeze", "async_encode", "async_decode",
    "compute_used_columns", "hex_columns", "unhex_columns",
    "generate_sequences", "write_sequences",
    "generate_embeddings", "write_embeddings",
    "TableSpec", "ColumnSpec", "SPECS",
]
