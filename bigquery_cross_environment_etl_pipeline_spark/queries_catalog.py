"""Named query catalog: the SURVEY.md §2 operator inventory materialized
as (spark_query, oracle_sql) pairs over the driver test tables.

Conventions that keep the driver's hash-compare honest:
- every computed column is aliased identically in Spark and SQL;
- timestamp outputs are rendered as strings with explicit 6-digit
  fractional seconds on BOTH sides (dodges tz/precision drift);
- money aggregates are computed in DECIMAL (exact in both engines,
  independent of summation order), then rounded and cast to double.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.registry import load_table

# Incremental window used by the flagship / extract queries (events span
# 2024-01-01 .. 2024-01-31 at every sf — TESTDATA.md).
WINDOW_START = "2024-01-10 00:00:00"
WINDOW_END = "2024-01-20 00:00:00"

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def _fmt_ts(col: str, alias: str) -> F.Column:
    return F.date_format(col, TS_FMT_SPARK).alias(alias)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental extract: events in [watermark, now) — S1/P4."""
    from .operators.extract import window_scan

    events = load_table(spark, sf_dir, "events")
    return window_scan(events, "ts", WINDOW_START, WINDOW_END)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

_SPARK: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        _SPARK[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return dict(_SPARK)


def oracle_queries() -> dict[str, str]:
    _load_all()
    return dict(_ORACLE)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .plans import (  # noqa: F401
        analytics,
        decision_support,
        etl,
        extended,
        graph,
        llm,
        nested,
    )

    _LOADED = True
