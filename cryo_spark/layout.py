"""Deterministic chunk layout: sequence-count range partitioning + salting.

The reference splits its key space into fixed-size chunks before
scheduling (subchunk_by_size,
/root/reference/crates/freeze/src/types/chunks/subchunks.rs:13-33, with
aligned boundaries /root/reference/crates/freeze/src/types/chunks/number_chunk.rs:76-89).
Our key space is (source, doc_id) and the balance target is *tokens per
chunk*, per BASELINE.json:north_rule ("explicit repartitioning by
sequence-count ranges and salting of skewed source partitions").

Chunk boundaries must be a pure function of the data — NOT of the
partition count — so runs at local[8] and local[32] produce identical
chunks (FIXTURES.md §4). We plan on the driver from a coarse histogram:

1. one cheap scan totals the token count -> needed chunk count;
2. one aggregation buckets every row by ``pmod(xxhash64(doc_id), B)``
   (B sized to give ~16 buckets per chunk, capped so the collected
   histogram stays bounded at any data scale) and sums tokens per
   (source, bucket) — a map-side-combined groupBy;
3. a driver-side cumulative sweep over bucket ranges closes a chunk
   every ~target_tokens; a single bucket heavier than the target is
   *salted*: split deterministically across ceil(tokens/target) chunk
   ids by a second hash — the skew handling the reference lacks
   (SURVEY.md §2.10).

A doc_id prefix histogram was rejected: zero-padded ids ("doc-000...42")
put all discriminating characters at the end, collapsing every prefix
length into 1 group or n_docs groups. Hash buckets are uniform for any
id shape and keep the planner's collect bounded.

Assignment back to rows is a broadcast equi-join on (source, bucket) —
no extra shuffle; the only shuffle in the encode job is the
repartition/groupBy on (partition_id, chunk_id) that co-locates chunks.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

DEFAULT_TARGET_TOKENS = 1 << 21  # ~2M tokens ≈ 8 MiB int32 per chunk
BUCKETS_PER_CHUNK = 16
MAX_BUCKETS = 1 << 20  # caps the driver-side histogram at any scale


@dataclass
class ChunkPlan:
    n_buckets: int
    target_tokens: int
    n_chunks: int
    n_salted_buckets: int
    partition_of_source: dict[str, int]
    # rows: (source, bucket, partition_id, chunk_base, n_salts)
    mapping: list[tuple[str, int, int, int, int]]


def sweep(
    hist: list[tuple[str, int, int]], target_tokens: int
) -> tuple[list[tuple[str, int, int, int, int]], int, int, dict[str, int]]:
    """Greedy cumulative sweep over (source, bucket, tokens) histogram rows.

    Returns (mapping, n_chunks, n_salted_buckets, partition_of_source).
    Pure driver-side function of the histogram — unit-testable and the
    seat of determinism.
    """
    by_source: dict[str, list[tuple[int, int]]] = {}
    for source, bucket, tokens in hist:
        by_source.setdefault(source, []).append((bucket, tokens))
    sources = sorted(by_source)
    partition_of_source = {s: i for i, s in enumerate(sources)}

    mapping: list[tuple[str, int, int, int, int]] = []
    next_chunk = 0
    n_salted = 0
    for s in sources:
        acc = 0
        open_chunk = -1
        for bucket, tok in sorted(by_source[s]):
            if tok > target_tokens:
                n_salts = math.ceil(tok / target_tokens)
                mapping.append((s, bucket, partition_of_source[s], next_chunk, n_salts))
                next_chunk += n_salts
                n_salted += 1
                continue
            if open_chunk < 0 or acc + tok > target_tokens:
                open_chunk = next_chunk
                next_chunk += 1
                acc = 0
            mapping.append((s, bucket, partition_of_source[s], open_chunk, 1))
            acc += tok
    return mapping, next_chunk, n_salted, partition_of_source


def plan_chunks(df: DataFrame, target_tokens: int = DEFAULT_TARGET_TOKENS) -> ChunkPlan:
    """Compute deterministic chunk boundaries; two driver jobs, small collects."""
    total_tokens = int(
        df.agg(F.sum("n_tok").alias("t")).first()["t"] or 0
    )
    needed = max(1, math.ceil(total_tokens / target_tokens))
    n_buckets = min(MAX_BUCKETS, max(256, needed * BUCKETS_PER_CHUNK))

    hist_rows = (
        df.groupBy(
            "source",
            F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int").alias("bucket"),
        )
        .agg(F.sum("n_tok").alias("tokens"))
        .collect()
    )
    hist = [(r["source"], int(r["bucket"]), int(r["tokens"])) for r in hist_rows]
    mapping, n_chunks, n_salted, partition_of_source = sweep(hist, target_tokens)
    return ChunkPlan(
        n_buckets=n_buckets,
        target_tokens=target_tokens,
        n_chunks=n_chunks,
        n_salted_buckets=n_salted,
        partition_of_source=partition_of_source,
        mapping=mapping,
    )


def assign_chunks(df: DataFrame, plan: ChunkPlan) -> DataFrame:
    """Attach (partition_id, chunk_id) via a broadcast join on (source, bucket).

    chunk_id is a pure function of (source, xxhash64(doc_id), histogram)
    — identical at any parallelism level. Salted buckets spread across
    their chunk span by a second, independent hash.
    """
    spark = df.sparkSession
    map_df = spark.createDataFrame(
        plan.mapping,
        "source string, bucket int, partition_id int, chunk_base int, n_salts int",
    )
    joined = df.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(plan.n_buckets)).cast("int")
    ).join(F.broadcast(map_df), ["source", "bucket"], "inner")
    return joined.withColumn(
        "chunk_id",
        (
            F.col("chunk_base")
            + F.when(
                F.col("n_salts") > 1,
                F.pmod(F.xxhash64("doc_id", F.lit(1)), F.col("n_salts")),
            ).otherwise(F.lit(0))
        ).cast("int"),
    ).drop("bucket", "chunk_base", "n_salts")
