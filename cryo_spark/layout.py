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
chunks (FIXTURES.md §4). We therefore plan on the driver from a coarse
histogram:

1. one scan chooses a doc_id prefix length P whose distinct-prefix count
   gives enough granularity (approx_count_distinct over candidate
   lengths, computed in a single pass);
2. one aggregation collects per-(source, prefix) token totals — a
   map-side-combined groupBy whose result is bounded by construction;
3. a driver-side cumulative sweep closes a chunk every ~target_tokens;
   any single prefix group heavier than the target is *salted*: split
   deterministically across ceil(tokens/target) chunk ids by
   pmod(xxhash64(doc_id), n_salts) — the skew handling the reference
   lacks (SURVEY.md §2.10).

Assignment back to rows is a broadcast equi-join on (source, prefix) —
no extra shuffle; the only shuffle in the encode job is the
groupBy(partition_id, chunk_id) that co-locates each chunk.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

PREFIX_CANDIDATES = (4, 6, 8, 10, 12, 16, 24, 32)
DEFAULT_TARGET_TOKENS = 1 << 21  # ~2M tokens ≈ 8 MiB int32 per chunk
MAX_PLAN_GROUPS = 500_000  # driver-side histogram bound


@dataclass
class ChunkPlan:
    prefix_len: int
    target_tokens: int
    n_chunks: int
    n_salted_groups: int
    partition_of_source: dict[str, int]
    # rows: (source, prefix, partition_id, chunk_base, n_salts)
    mapping: list[tuple[str, str, int, int, int]]


def _choose_prefix_len(df: DataFrame, needed_chunks: int) -> int:
    aggs = [
        F.approx_count_distinct(F.substring("doc_id", 1, p)).alias(f"p{p}")
        for p in PREFIX_CANDIDATES
    ]
    row = df.agg(*aggs).first()
    want = max(64, needed_chunks * 16)
    for p in PREFIX_CANDIDATES:
        if row[f"p{p}"] >= want:
            return p
    return PREFIX_CANDIDATES[-1]


def plan_chunks(df: DataFrame, target_tokens: int = DEFAULT_TARGET_TOKENS) -> ChunkPlan:
    """Compute deterministic chunk boundaries; two driver jobs, small collects."""
    totals = df.agg(
        F.sum("n_tok").alias("tokens"), F.count(F.lit(1)).alias("rows")
    ).first()
    total_tokens = int(totals["tokens"] or 0)
    needed = max(1, math.ceil(total_tokens / target_tokens))
    prefix_len = _choose_prefix_len(df, needed)

    hist = (
        df.groupBy("source", F.substring("doc_id", 1, prefix_len).alias("prefix"))
        .agg(F.sum("n_tok").alias("tokens"), F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    if len(hist) > MAX_PLAN_GROUPS:
        raise ValueError(
            f"chunk-plan histogram too large ({len(hist)} groups); "
            f"shorten PREFIX_CANDIDATES or raise MAX_PLAN_GROUPS"
        )
    by_source: dict[str, list] = {}
    for r in hist:
        by_source.setdefault(r["source"], []).append(r)

    sources = sorted(by_source)
    partition_of_source = {s: i for i, s in enumerate(sources)}

    mapping: list[tuple[str, str, int, int, int]] = []
    next_chunk = 0
    n_salted = 0
    for s in sources:
        groups = sorted(by_source[s], key=lambda r: r["prefix"])
        acc = 0
        open_chunk = -1
        for g in groups:
            tok = int(g["tokens"])
            if tok > target_tokens:
                # skewed group: dedicate a salted span of chunk ids
                n_salts = math.ceil(tok / target_tokens)
                mapping.append((s, g["prefix"], partition_of_source[s], next_chunk, n_salts))
                next_chunk += n_salts
                n_salted += 1
                continue
            if open_chunk < 0 or acc + tok > target_tokens:
                open_chunk = next_chunk
                next_chunk += 1
                acc = 0
            mapping.append((s, g["prefix"], partition_of_source[s], open_chunk, 1))
            acc += tok
    return ChunkPlan(
        prefix_len=prefix_len,
        target_tokens=target_tokens,
        n_chunks=next_chunk,
        n_salted_groups=n_salted,
        partition_of_source=partition_of_source,
        mapping=mapping,
    )


def assign_chunks(df: DataFrame, plan: ChunkPlan) -> DataFrame:
    """Attach (partition_id, chunk_id) via a broadcast join on (source, prefix).

    chunk_id is a pure function of (source, doc_id prefix histogram,
    xxhash64(doc_id)) — identical at any parallelism level.
    """
    spark = df.sparkSession
    map_df = spark.createDataFrame(
        plan.mapping, "source string, prefix string, partition_id int, chunk_base int, n_salts int"
    )
    joined = df.withColumn("prefix", F.substring("doc_id", 1, plan.prefix_len)).join(
        F.broadcast(map_df), ["source", "prefix"], "inner"
    )
    return joined.withColumn(
        "chunk_id",
        (
            F.col("chunk_base")
            + F.when(F.col("n_salts") > 1, F.pmod(F.xxhash64("doc_id"), F.col("n_salts")))
            .otherwise(F.lit(0))
        ).cast("int"),
    ).drop("prefix", "chunk_base", "n_salts")
