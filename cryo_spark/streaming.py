"""Incremental encode via Structured Streaming.

The reference is a batch tool whose incremental idioms are re-resolved
open ranges + skip-existing resume (SURVEY.md §2.12). The Spark-native
expression of the same contract is a file-source stream feeding the
batch encode through ``foreachBatch``: each micro-batch of newly arrived
sequence files is chunk-planned, encoded and manifest-committed with the
exact same kernels and layout as ``freeze`` — so the streaming path
inherits determinism, the manifest, and the compression gates for free,
and checkpointing gives exactly-once per input file.

Chunk ids are namespaced per micro-batch (``batch_id * BATCH_STRIDE``)
so successive batches never collide in the manifest key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import engine, layout, snapshots
from .tablespec import SEQUENCES, TableSpec

BATCH_STRIDE = 1 << 20  # max chunks per micro-batch before ids would collide


def stream_encode(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    target_tokens: int = layout.DEFAULT_TARGET_TOKENS,
    schema: str | None = None,
    spec: TableSpec = SEQUENCES,
):
    """Start a file-source stream that encodes new files as they land.

    Returns the StreamingQuery; callers drive it with
    ``processAllAvailable()`` (tests) or leave it running (production).
    ``schema`` defaults to the spec's DDL (override only to widen the
    reader, e.g. extra ignored columns).
    """
    if schema is None:
        schema = spec.spark_ddl()

    def encode_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        plan = layout.plan_chunks(batch_df, target_tokens, spec=spec)
        if plan.n_chunks >= BATCH_STRIDE:
            raise ValueError(
                f"micro-batch needs {plan.n_chunks} chunks >= stride {BATCH_STRIDE}; "
                "raise BATCH_STRIDE or target_tokens"
            )
        base = batch_id * BATCH_STRIDE
        enc = engine._grouped_encode(batch_df, plan, chunk_id_offset=base,
                                     spec=spec)
        run_id = f"stream{batch_id:08d}"
        enc_dir = f"{output_dir}/encoded/run={run_id}"
        enc.write.mode("overwrite") \
            .option("compression", "uncompressed") \
            .option("parquet.enable.dictionary", "false") \
            .parquet(enc_dir)
        written = batch_df.sparkSession.read.parquet(enc_dir)
        written.select(*engine.MANIFEST_COLUMNS).write.mode("overwrite").parquet(
            f"{output_dir}/manifest/run={run_id}"
        )
        # ordered history entry (idempotent per run: a retried batch
        # re-commits the same run id and keeps its original seq)
        snapshots.commit(output_dir, run_id, "append", batch_id=batch_id)

    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 32)
        .parquet(input_dir)
    )
    return (
        reader.writeStream.foreachBatch(encode_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
