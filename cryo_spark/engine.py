"""Encode / decode / freeze — the Spark jobs of the engine.

Shape of the pipeline (cryo's freeze lifecycle re-expressed Spark-first,
/root/reference/crates/freeze/src/freeze.rs:26-77):

  plan chunks (driver, deterministic)            -> layout.plan_chunks
  skip existing chunks (resume)                  -> anti-join vs manifest
  co-locate each chunk                           -> ONE shuffle: groupBy(partition_id, chunk_id)
  per-chunk vectorized encode                    -> applyInPandas (Arrow batches, numpy kernels)
  atomic write + manifest                        -> per-run parquet dir + manifest append

Every per-value operation happens inside numpy/pyarrow kernels — no
per-row Python (BASELINE.json:input_hint). The encoded table is one row
per (chunk × column): the reference's one-file-per-(datatype×partition)
layout (/root/reference/crates/freeze/src/types/files.rs:63-105) with
the file replaced by a binary payload cell keyed by (partition_id,
chunk_id, column).
"""

from __future__ import annotations

import time
import uuid

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import layout
from .codecs import choose_int, choose_str, decode_any, encode_any
from .codecs.bits import get_blob, put_blob

ENCODED_DDL = (
    "partition_id int, chunk_id int, column string, codec_id string, "
    "n_rows long, n_values long, raw_bytes long, enc_bytes long, "
    "min_doc_id string, max_doc_id string, wall_ms double, status string, "
    "payload binary"
)
MANIFEST_COLUMNS = [
    "partition_id", "chunk_id", "column", "codec_id", "n_rows", "raw_bytes",
    "enc_bytes", "min_doc_id", "max_doc_id", "wall_ms", "status",
]
SEQUENCES_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


# ---------------------------------------------------------------------------
# per-chunk kernels (run inside executors via applyInPandas)
# ---------------------------------------------------------------------------

def _encode_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
    """Encode one chunk: rows sorted by doc_id, one output row per column."""
    pdf = pdf.sort_values("doc_id", kind="mergesort", ignore_index=True)
    pid = int(pdf["partition_id"].iloc[0])
    cid = int(pdf["chunk_id"].iloc[0])
    n_rows = len(pdf)
    min_doc = str(pdf["doc_id"].iloc[0])
    max_doc = str(pdf["doc_id"].iloc[-1])

    out: list[dict] = []

    def emit(column: str, codec_id: str, payload: bytes, n_values: int,
             raw_bytes: int, wall_ms: float) -> None:
        out.append(
            dict(
                partition_id=pid, chunk_id=cid, column=column, codec_id=codec_id,
                n_rows=n_rows, n_values=n_values, raw_bytes=raw_bytes,
                enc_bytes=len(payload), min_doc_id=min_doc, max_doc_id=max_doc,
                wall_ms=wall_ms, status="ok", payload=payload,
            )
        )

    # --- tokens: flatten -> lengths blob + values blob, each auto-selected ---
    t0 = time.perf_counter()
    token_arrays = pdf["tokens"].to_numpy()
    lengths = np.fromiter((len(a) for a in token_arrays), dtype=np.int64, count=n_rows)
    flat = (
        np.concatenate(token_arrays).astype(np.int32, copy=False)
        if n_rows and lengths.sum() > 0
        else np.empty(0, dtype=np.int32)
    )
    lens_choice = choose_int(lengths.astype(np.int32))
    vals_choice = choose_int(flat)
    parts: list[bytes] = []
    put_blob(parts, lens_choice.payload)
    put_blob(parts, vals_choice.payload)
    payload = b"".join(parts)
    emit(
        "tokens",
        f"{vals_choice.codec_id}|lens={lens_choice.codec_id}",
        payload,
        int(len(flat)),
        int(flat.nbytes + 4 * n_rows),
        (time.perf_counter() - t0) * 1000,
    )

    # --- n_tok ----------------------------------------------------------------
    t0 = time.perf_counter()
    n_tok = pdf["n_tok"].to_numpy().astype(np.int32)
    ch = choose_int(n_tok)
    emit("n_tok", ch.codec_id, ch.payload, n_rows, int(n_tok.nbytes),
         (time.perf_counter() - t0) * 1000)

    # --- string columns ---------------------------------------------------------
    for column in ("doc_id", "source"):
        t0 = time.perf_counter()
        values = pdf[column].tolist()
        ch = choose_str(values)
        raw = sum(len(s.encode("utf-8")) for s in values) + 4 * n_rows
        emit(column, ch.codec_id, ch.payload, n_rows, int(raw),
             (time.perf_counter() - t0) * 1000)

    return pd.DataFrame(out)


def _decode_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
    """Inverse of :func:`_encode_chunk`: encoded column rows -> data rows."""
    rows = {r["column"]: r for _, r in pdf.iterrows()}
    tok_row = rows["tokens"]
    buf = memoryview(tok_row["payload"])
    lens_blob, pos = get_blob(buf, 0)
    vals_blob, pos = get_blob(buf, pos)
    lengths = decode_any(bytes(lens_blob)).astype(np.int64)
    flat = decode_any(bytes(vals_blob))
    token_arrays = np.split(flat, np.cumsum(lengths)[:-1]) if len(lengths) else []

    doc_id = decode_any(rows["doc_id"]["payload"]).to_pylist()
    source = decode_any(rows["source"]["payload"]).to_pylist()
    n_tok = decode_any(rows["n_tok"]["payload"])
    return pd.DataFrame(
        {
            "doc_id": doc_id,
            "tokens": token_arrays,
            "n_tok": n_tok.astype(np.int32),
            "source": source,
        }
    )


# ---------------------------------------------------------------------------
# DataFrame-level API (cryo.collect analog: no sink)
# ---------------------------------------------------------------------------

def encode(
    df: DataFrame,
    target_tokens: int = layout.DEFAULT_TARGET_TOKENS,
    plan: layout.ChunkPlan | None = None,
) -> DataFrame:
    """Encode a sequences DataFrame into the encoded-chunk table.

    One shuffle (groupBy chunk key); chunk boundaries deterministic.
    """
    if plan is None:
        plan = layout.plan_chunks(df, target_tokens)
    assigned = layout.assign_chunks(df, plan)
    return assigned.groupBy("partition_id", "chunk_id").applyInPandas(
        _encode_chunk, ENCODED_DDL
    )


def decode(enc_df: DataFrame) -> DataFrame:
    """Decode the encoded-chunk table back to bit-identical sequences."""
    cols = ["partition_id", "chunk_id", "column", "payload"]
    return (
        enc_df.select(*cols)
        .groupBy("partition_id", "chunk_id")
        .applyInPandas(lambda pdf: _decode_chunk(pdf), SEQUENCES_DDL)
    )


# ---------------------------------------------------------------------------
# freeze: full job with manifest + resume (cryo.freeze analog)
# ---------------------------------------------------------------------------

def _manifest_path(output_dir: str) -> str:
    return f"{output_dir}/manifest"


def _encoded_path(output_dir: str) -> str:
    return f"{output_dir}/encoded"


def read_manifest(spark: SparkSession, output_dir: str) -> DataFrame | None:
    try:
        return spark.read.parquet(_manifest_path(output_dir))
    except Exception:
        return None


def read_encoded(spark: SparkSession, output_dir: str) -> DataFrame:
    """Committed chunks only: encoded rows whose chunk is in the manifest.

    A run that died between writing encoded files and committing its
    manifest leaves orphan files; the semi-join makes them invisible —
    the atomicity discipline of the reference's tmp-rename
    (/root/reference/crates/freeze/src/types/dataframes/export.rs:13-23)
    done relationally.
    """
    enc = spark.read.parquet(_encoded_path(output_dir))
    man = read_manifest(spark, output_dir)
    if man is None:
        return enc.limit(0)
    keys = man.filter(F.col("status") == "ok").select(
        "run", "partition_id", "chunk_id"
    ).distinct()
    return enc.join(F.broadcast(keys), ["run", "partition_id", "chunk_id"], "left_semi")


def freeze(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    target_tokens: int = layout.DEFAULT_TARGET_TOKENS,
    overwrite: bool = False,
) -> dict:
    """Run the full encode job with skip-existing resume.

    Returns a summary dict (cryo's FreezeSummary analog,
    /root/reference/crates/freeze/src/types/summaries.rs:21-31).
    """
    t_start = time.perf_counter()
    df = spark.read.parquet(input_path)
    plan = layout.plan_chunks(df, target_tokens)
    planned = {(s_pid_cb[2], s_pid_cb[3] + i)
               for s_pid_cb in plan.mapping for i in range(s_pid_cb[4])}

    done: set[tuple[int, int]] = set()
    if not overwrite:
        man = read_manifest(spark, output_dir)
        if man is not None:
            done = {
                (r["partition_id"], r["chunk_id"])
                for r in man.filter(F.col("status") == "ok")
                .select("partition_id", "chunk_id").distinct().collect()
            }
    missing = sorted(planned - done)
    n_skipped = len(planned) - len(missing)
    if not missing:
        return dict(
            n_chunks=plan.n_chunks, n_encoded=0, n_skipped=n_skipped,
            wall_s=time.perf_counter() - t_start, tokens=0, enc_bytes=0,
            raw_bytes=0, tokens_per_sec=0.0, run=None,
        )

    run_id = uuid.uuid4().hex[:12]
    assigned = layout.assign_chunks(df, plan)
    if done:
        missing_df = spark.createDataFrame(missing, "partition_id int, chunk_id int")
        assigned = assigned.join(
            F.broadcast(missing_df), ["partition_id", "chunk_id"], "left_semi"
        )
    enc = assigned.groupBy("partition_id", "chunk_id").applyInPandas(
        _encode_chunk, ENCODED_DDL
    )
    enc_dir = f"{_encoded_path(output_dir)}/run={run_id}"
    t_enc = time.perf_counter()
    enc.write.mode("error").parquet(enc_dir)
    enc_wall = time.perf_counter() - t_enc

    # manifest rows derive from the committed files (payload column pruned)
    written = spark.read.parquet(enc_dir)
    man_dir = f"{_manifest_path(output_dir)}/run={run_id}"
    written.select(*MANIFEST_COLUMNS).write.mode("error").parquet(man_dir)

    stats = (
        spark.read.parquet(man_dir)
        .agg(
            F.sum(F.when(F.col("column") == "tokens", F.col("enc_bytes")).otherwise(0)),
            F.sum("enc_bytes"),
            F.sum("raw_bytes"),
            F.sum(F.when(F.col("column") == "tokens", F.col("n_rows")).otherwise(0)),
        )
        .first()
    )
    tokens = int(
        spark.read.parquet(enc_dir)
        .filter(F.col("column") == "tokens")
        .agg(F.sum("n_values"))
        .first()[0]
        or 0
    )
    return dict(
        n_chunks=plan.n_chunks,
        n_encoded=len(missing),
        n_skipped=n_skipped,
        wall_s=time.perf_counter() - t_start,
        encode_wall_s=enc_wall,
        tokens=tokens,
        enc_bytes=int(stats[1] or 0),
        raw_bytes=int(stats[2] or 0),
        tokens_per_sec=tokens / enc_wall if enc_wall > 0 else 0.0,
        run=run_id,
    )
