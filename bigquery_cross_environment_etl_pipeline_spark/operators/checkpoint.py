"""Checkpoint / watermark log (T1-T4, S4, S10, A3).

The reference keeps an append-only MySQL status table and derives the
next extraction window from the latest SUCCESS row
(reference core/database/billing_etl_db.py:12-61;
core/services/billing_etl.py:135-139). Here the log is an append-only
parquet table managed by the engine:

- ``save`` appends one status row (S10) — None columns stay NULL rather
  than being dropped from the INSERT (billing_etl_db.py:29); same effect.
- ``last_success_watermark`` is the argmax read (S4/A3):
  latest ``end_date_time`` where status='SUCCESS' for (org_id, project_id)
  — ``ORDER BY end_date_time DESC LIMIT 1`` in the reference
  (billing_etl_db.py:46-51), a single MAX aggregate here.
- ``latest_per_key`` generalizes A3 to all keys at once via a window
  function — one shuffle instead of one query per tenant.

Scale notes: the log is tiny relative to the data (one row per job run),
so reads are broadcast-size; the parquet append is a single-partition
write. On a cluster this table would live in a transactional format
(Delta/Iceberg); plain parquet append is the v1 stand-in (jars not in
this image) and the protocol (IN_PROGRESS -> SUCCESS/FAILED) is
format-agnostic.
"""

from __future__ import annotations

import datetime as dt
import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Concurrent tenant jobs append to one status log; Spark's file commit
#: protocol shares a _temporary dir per output path, so parallel appends
#: to the SAME path must be serialized in-process. (On a cluster the log
#: would be a transactional table and this lock disappears.)
_APPEND_LOCK = threading.Lock()

from ..schemas import CHECKPOINT_SCHEMA, STATUS_SUCCESS, VALID_STATUSES


class CheckpointLog:
    """Append-only job-status log backing the incremental protocol."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def read(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], CHECKPOINT_SCHEMA)
        return self.spark.read.schema(CHECKPOINT_SCHEMA).parquet(self.path)

    def save(
        self,
        status: str,
        org_id: int,
        project_id: str,
        end_date_time: dt.datetime | None = None,
        now: dt.datetime | None = None,
    ) -> None:
        """S10: append one status row (IN_PROGRESS before load, SUCCESS /
        FAILED after — reference billing_etl.py:173-216)."""
        if status not in VALID_STATUSES:
            raise ValueError(f"invalid status {status!r}; expected one of {sorted(VALID_STATUSES)}")
        row = [(int(org_id), str(project_id), status, end_date_time, now or dt.datetime.now())]
        df = self.spark.createDataFrame(row, CHECKPOINT_SCHEMA)
        with _APPEND_LOCK:
            df.coalesce(1).write.mode("append").parquet(self.path)

    def last_success_watermark(self, org_id: int, project_id: str) -> dt.datetime | None:
        """S4: latest SUCCESS end_date_time for one tenant (T1)."""
        row = (
            self.read()
            .filter(
                (F.col("org_id") == int(org_id))
                & (F.col("project_id") == project_id)
                & (F.col("status") == STATUS_SUCCESS)
            )
            .agg(F.max("end_date_time").alias("wm"))
            .first()
        )
        return row["wm"] if row else None

    def latest_per_key(self) -> DataFrame:
        """A3 generalized: latest SUCCESS watermark per (org_id, project_id).

        One grouped MAX — feeds the multi-tenant fan-out as a broadcast
        side rather than a per-tenant point query.
        """
        return (
            self.read()
            .filter(F.col("status") == STATUS_SUCCESS)
            .groupBy("org_id", "project_id")
            .agg(F.max("end_date_time").alias("watermark"))
        )
