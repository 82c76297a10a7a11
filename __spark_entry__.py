"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship incremental-extract query at sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2, checked against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigquery_cross_environment_etl_pipeline_spark import queries_catalog as _qc


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: incremental time-windowed extract on sf0.001 events.

    The reference's core semantics (billing_etl.py:270-298): scan the
    source restricted to the half-open watermark window, ready to append.
    """
    return _qc.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _qc.spark_queries()


def oracle_sql() -> dict[str, str]:
    return _qc.oracle_queries()
