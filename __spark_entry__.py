"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship encode→decode round-trip aggregation
on sf0.001. ``queries()`` / ``oracle_sql()`` expose the full suite from
``cryo_spark.suite`` — engine round-trips with arithmetic-derived token
oracles, the reference operator inventory (SURVEY.md §2), and the
training-data pipeline operators.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cryo_spark import suite  # noqa: E402
from cryo_spark.session import ship_package  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ship_package(spark)
    return suite.entry_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + engine ops."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ship_package(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in suite.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (rows-only where omitted)."""
    return dict(suite.ORACLES)
