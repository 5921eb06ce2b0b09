"""Arrow-native distributed parquet source (row-group-granular scan tasks).

Why not ``spark.read.parquet`` for the encode job: Spark's scan hands
rows to a python stage through ColumnarToRow + ArrowWriter, which boxes
every element of the ``tokens array<int>`` column twice. Measured on
the 2.1B-token bench input, the JVM scan+pack map stage runs ~10.5 s at
local[16]; a pyarrow read of the same columns decodes at ~62M tokens/s
per core with the list column staying columnar end-to-end (~3x the
whole map stage).

Shape: the driver plans (file, row-group range) tasks from parquet
footers — the same planning shape as an Iceberg/Delta scan (file +
split metadata from a manifest) — and a round-robin repartition spreads
them; each task reads its row groups with pyarrow (column pruning
pushed into the reader) and streams batches into the caller's kernel.
Spark still owns distribution, scheduling, retries and everything
downstream of the scan. The reference's analog is its keyed fetch layer
(/root/reference/crates/freeze/src/types/sources.rs:394-1124) where the
engine, not a generic scan node, owns data acquisition.

Local filesystem paths only (sandbox); an object-store deployment would
swap the listing for the table format's manifest and pyarrow's
filesystem layer — the task shape is unchanged.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession

from ..arrowutil import amap

DEFAULT_TASK_BYTES = 192 << 20  # compressed bytes per scan task


def supports(input_path: str) -> bool:
    """Local parquet file or directory of parquet shards."""
    if "://" in input_path:
        return False
    if os.path.isfile(input_path):
        return True
    return os.path.isdir(input_path) and any(
        f.endswith(".parquet") for f in os.listdir(input_path)
    )


def _files(input_path: str) -> list[str]:
    if os.path.isfile(input_path):
        return [input_path]
    return sorted(
        os.path.join(input_path, f)
        for f in os.listdir(input_path)
        if f.endswith(".parquet")
    )


def scan_meta(input_path: str, columns: list[str] | None = None
              ) -> list[tuple[str, list[int]]]:
    """(path, per-row-group bytes of the REQUESTED columns) from footers.

    One footer read per file on the driver — the same planning metadata
    an Iceberg/Delta manifest would hand over without touching footers.
    Column-aware sizing matters: the planning histogram reads only
    (doc_id, n_tok, source) ≈ 3% of the bytes, so sizing its tasks by
    full-row bytes would dispatch ~10x more python tasks than the work
    deserves.
    """

    def rg_bytes(g):
        if columns is None:
            return g.total_byte_size
        want = set(columns)
        return sum(
            g.column(c).total_uncompressed_size
            for c in range(g.num_columns)
            if g.column(c).path_in_schema.split(".")[0] in want
        )

    return [
        (
            path,
            [rg_bytes(md.row_group(rg)) for rg in range(md.num_row_groups)],
        )
        for path in _files(input_path)
        for md in [pq.ParquetFile(path).metadata]
    ]


def column_values(input_path: str, column: str) -> int:
    """EXACT leaf-value count of one column across the table, footers only.

    Parquet column-chunk metadata records num_values per row group — for
    the tokens list column that is the total token count, so planning
    needs no scan job at all (the same statistic an Iceberg manifest
    carries)."""
    total = 0
    for path in _files(input_path):
        md = pq.ParquetFile(path).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c in range(g.num_columns):
                col = g.column(c)
                if col.path_in_schema.split(".")[0] == column:
                    total += col.num_values
    return total


def pack_tasks(
    meta: list[tuple[str, list[int]]], target_bytes: int
) -> list[tuple[list[str], list[int], list[int]]]:
    """Greedy-pack row-group runs into ~target_bytes tasks, spanning files.

    A task is (paths, rg_starts, rg_counts) — parallel lists of file
    segments. Spanning files matters both ways: a 10 GB file fans out
    over row groups, and a directory of 64 small shards packs into a
    handful of tasks instead of one python dispatch per shard
    (~12 ms/task serialized per executor — the dominant non-scaling
    cost the r1 scaling bench measured).
    """
    tasks: list[tuple[list[str], list[int], list[int]]] = []
    cur: tuple[list[str], list[int], list[int]] = ([], [], [])
    acc = 0

    def flush():
        nonlocal cur, acc
        if cur[0]:
            tasks.append(cur)
        cur, acc = ([], [], []), 0

    for path, rg_sizes in meta:
        start = None
        for rg, sz in enumerate(rg_sizes):
            if start is None:
                start = rg
            acc += sz
            if acc >= target_bytes:
                cur[0].append(path)
                cur[1].append(start)
                cur[2].append(rg - start + 1)
                start = None
                flush()
        if start is not None:
            cur[0].append(path)
            cur[1].append(start)
            cur[2].append(len(rg_sizes) - start)
    flush()
    return tasks


def plan_scan_tasks(
    input_path: str, target_bytes: int = DEFAULT_TASK_BYTES
) -> list[tuple[list[str], list[int], list[int]]]:
    """Tasks of ~target_bytes (uncompressed) each; row groups are the
    split unit (parquet's own independence boundary) — the analog of
    cryo's subchunk_by_size over the key space
    (/root/reference/crates/freeze/src/types/chunks/subchunks.rs:13-33).
    """
    tasks = pack_tasks(scan_meta(input_path), target_bytes)
    return tasks


def arrow_scan(
    spark: SparkSession,
    input_path: str,
    columns: list[str],
    kernel,
    out_ddl: str,
    target_bytes: int = DEFAULT_TASK_BYTES,
) -> DataFrame:
    """Distributed pyarrow scan feeding ``kernel`` (an iterator-of-batches
    transform, same contract as a mapInArrow function).

    Task count is wave-aligned: rounded up to a multiple of the cluster
    parallelism so the last scheduling wave is full at every level —
    e.g. 64 shards on 16 cores would otherwise run 4 full waves at
    local[16] but leave local[4]'s task count identical, paying the same
    serialized python dispatch at a quarter of the useful work.
    """
    meta = scan_meta(input_path, columns)
    total = sum(sum(s) for _, s in meta)
    par = max(1, spark.sparkContext.defaultParallelism)
    n_desired = max(1, -(-total // target_bytes))
    n_tasks = -(-n_desired // par) * par  # round up to full waves
    tasks = pack_tasks(meta, max(1, -(-total // n_tasks)))
    return _run_tasks(spark, tasks, columns, kernel, out_ddl)


def select_row_groups(path: str, column: str,
                      wanted: set) -> list[int] | None:
    """Row groups whose ``column`` min/max stats may contain ANY wanted
    value; None when any group lacks stats (caller reads everything).

    The physical-projection half of the encoded layout: files written
    by engine._enc_writer cluster rows by (column, chunk_id), so a
    skinny projection's wanted values fall into a contiguous band of
    row groups and everything outside the band — the fat payload
    columns — is never read off disk.
    """
    md = pq.ParquetFile(path).metadata
    out: list[int] = []
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        stats = None
        for c in range(g.num_columns):
            col = g.column(c)
            if col.path_in_schema == column:
                stats = col.statistics
                break
        if stats is None or not stats.has_min_max:
            return None
        if any(stats.min <= w <= stats.max for w in wanted):
            out.append(rg)
    return out


def _runs(rgs: list[int]) -> list[tuple[int, int]]:
    """Collapse a sorted row-group list into (start, count) runs."""
    runs: list[tuple[int, int]] = []
    for rg in rgs:
        if runs and runs[-1][0] + runs[-1][1] == rg:
            runs[-1] = (runs[-1][0], runs[-1][1] + 1)
        else:
            runs.append((rg, 1))
    return runs


def _run_tasks(spark, tasks, columns, kernel, out_ddl) -> DataFrame:
    tdf = spark.createDataFrame(
        [(list(p), list(s), list(c)) for p, s, c in tasks],
        "paths array<string>, rg_starts array<int>, rg_counts array<int>",
    ).repartition(max(1, len(tasks)))  # no-column repartition = round-robin

    def read_tasks(task_batches):
        for tb in task_batches:
            for row in range(tb.num_rows):
                paths = tb.column("paths")[row].as_py()
                starts = tb.column("rg_starts")[row].as_py()
                counts = tb.column("rg_counts")[row].as_py()
                # consecutive segments of the same path read as ONE
                # kernel invocation: a row-group SELECTION (possibly
                # non-contiguous) must not split a file's chunks across
                # invocations — the file-granular decode contract
                i = 0
                while i < len(paths):
                    path = paths[i]
                    rgs: list[int] = []
                    while i < len(paths) and paths[i] == path:
                        rgs.extend(range(starts[i], starts[i] + counts[i]))
                        i += 1
                    pf = pq.ParquetFile(path)
                    t = pf.read_row_groups(
                        rgs, columns=columns, use_threads=False,
                    )
                    yield from kernel(t.to_batches())

    return amap(tdf, read_tasks, out_ddl)


def arrow_scan_files(
    spark: SparkSession,
    files: list[str],
    columns: list[str],
    kernel,
    out_ddl: str,
    target_bytes: int = DEFAULT_TASK_BYTES,
    row_groups: dict[str, list[int]] | None = None,
) -> DataFrame:
    """Arrow scan over an explicit file list with FILE-granular splits.

    Unlike :func:`arrow_scan`, a file is never divided across tasks and
    the kernel is invoked once per whole file — the contract the
    shuffle-free decode relies on (an encoded chunk's rows never span
    files, but do span row groups). Multiple small files still pack
    into one task; the kernel runs per file within it.

    ``row_groups`` restricts each file to the given row-group subset
    (from :func:`select_row_groups`): one kernel invocation still sees
    all of a file's SELECTED groups together, so per-chunk decode stays
    whole for every surviving column.
    """
    want = set(columns)
    metas = []
    for path in files:
        md = pq.ParquetFile(path).metadata
        rgs = (row_groups.get(path) if row_groups is not None else None)
        if rgs is None:
            rgs = list(range(md.num_row_groups))
        nbytes = sum(
            g.column(c).total_uncompressed_size
            for rg in rgs
            for g in [md.row_group(rg)]
            for c in range(g.num_columns)
            if g.column(c).path_in_schema.split(".")[0] in want
        )
        metas.append((path, nbytes, rgs))
    par = max(1, spark.sparkContext.defaultParallelism)
    total = sum(m[1] for m in metas)
    n_desired = max(1, -(-total // target_bytes))
    n_tasks = min(len(files), -(-n_desired // par) * par)  # full waves
    per_task = max(1, -(-total // max(1, n_tasks)))
    tasks: list[tuple[list[str], list[int], list[int]]] = []
    cur: tuple[list[str], list[int], list[int]] = ([], [], [])
    acc = 0
    for path, nbytes, rgs in metas:
        if not rgs:
            continue  # no surviving row groups: nothing to read
        for start, count in _runs(rgs):
            cur[0].append(path)
            cur[1].append(start)
            cur[2].append(count)
        acc += nbytes
        if acc >= per_task:
            tasks.append(cur)
            cur, acc = ([], [], []), 0
    if cur[0]:
        tasks.append(cur)
    return _run_tasks(spark, tasks, columns, kernel, out_ddl)
