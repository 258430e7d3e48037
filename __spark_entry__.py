"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query (TPC-H Q1 shape) on sf0.001.
queries()      -> one callable per implemented operator (SURVEY §2 +
                  the LLM-data-pipeline operators).
oracle_sql()   -> DuckDB-equivalent SQL for each query, colocated with
                  the implementations in reader_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reader_spark.queries import CATALOG  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from reader_spark.queries import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in CATALOG.items() if sql is not None}
