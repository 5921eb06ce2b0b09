"""spark-submit entrypoint for the freeze (encode) job.

Cluster usage (north rule: runs via spark-submit --py-files on a
multi-executor cluster):

    python -m zipfile -c cryo_spark.zip cryo_spark/
    spark-submit --py-files cryo_spark.zip jobs/freeze_job.py \
        --input s3://bucket/sequences --output s3://bucket/encoded \
        --target-tokens 2097152

The job is resumable: re-submitting after an interruption recomputes
only chunks missing from the manifest (cryo's skip-existing,
/root/reference/crates/freeze/src/freeze.rs:96-99). ``--overwrite``
re-encodes everything; ``--dry-run`` prints the plan and exits.

Local smoke:

    spark-submit --py-files /tmp/cryo_spark.zip jobs/freeze_job.py \
        --input /tmp/seqs --output /tmp/out --master 'local[4]'
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="sequences parquet path")
    ap.add_argument("--output", required=True, help="output dir (encoded/ manifest/ report/)")
    ap.add_argument("--table", default="sequences",
                    help="table spec name (tablespec.SPECS: sequences|embeddings)")
    ap.add_argument("--target-tokens", type=int, default=2 << 20)
    ap.add_argument("--overwrite", action="store_true")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--keys", default=None,
                    help="key-range spec (a:b, a:+n, a:b:stride, a:b/n, K/M/B, latest)")
    ap.add_argument("--n-chunks", type=int, default=None)
    ap.add_argument("--partition-by", default=None,
                    help="comma list of encoded key columns for partitioned output dirs")
    ap.add_argument("--decode-verify", action="store_true",
                    help="decode the committed output and verify row count")
    ap.add_argument("--master", default=None,
                    help="override master (default: whatever spark-submit provides)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("cryo_spark_freeze")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()

    # resolve cryo_spark whether shipped via --py-files, on PYTHONPATH,
    # or sitting next to this job file (repo checkout run directly)
    try:
        import cryo_spark
    except ModuleNotFoundError:
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import cryo_spark
    from cryo_spark.session import ship_package
    from cryo_spark.tablespec import SPECS

    ship_package(spark)
    summary = cryo_spark.freeze(
        spark, args.input, args.output,
        target_tokens=args.target_tokens,
        overwrite=args.overwrite,
        dry_run=args.dry_run,
        keys=args.keys,
        n_chunks=args.n_chunks,
        partition_by=[c.strip() for c in args.partition_by.split(",")]
        if args.partition_by else None,
        spec=SPECS[args.table],
    )
    if args.decode_verify and not args.dry_run:
        from cryo_spark import engine

        n = cryo_spark.decode(engine.read_encoded(spark, args.output),
                              spec=SPECS[args.table]).count()
        summary["decoded_rows"] = n
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
