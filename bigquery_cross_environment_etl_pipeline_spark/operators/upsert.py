"""Key-based merge/upsert without a transactional table format.

The reference's point UPDATEs (S11/S12, billing_etl_db.py:91-162) are
MERGE-shaped: match on keys, update matched, keep the rest. Without
Delta/Iceberg jars (absent in this image) the engine emulates MERGE as
a dataflow: ``updates ∪ (target ⟕anti updates)`` — one shuffle on the
key columns, last-write-wins per key.

Scale notes: both sides shuffle on the merge keys once (or zero times if
the target is bucketed by the keys); the anti join is the same cost
class as Delta's inner merge join. Non-atomicity vs concurrent writers
is the documented divergence (SURVEY.md §7.4.6) — the dataflow is
format-agnostic and swaps for ``MERGE INTO`` when a transactional
format is on the classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Rows from ``updates`` win on key collision; unmatched target rows
    survive. Schemas must align by name."""
    updates_aligned = updates.select(*target.columns)
    surviving = target.join(updates_aligned.select(*keys), keys, "left_anti")
    return surviving.unionByName(updates_aligned)
