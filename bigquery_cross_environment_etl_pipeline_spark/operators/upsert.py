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
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Rows from ``updates`` win on key collision; unmatched target rows
    survive. Schemas must align by name."""
    updates_aligned = updates.select(*target.columns)
    surviving = target.join(updates_aligned.select(*keys), keys, "left_anti")
    return surviving.unionByName(updates_aligned)


def apply_changes(
    changes: DataFrame,
    keys: list[str],
    sequence_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """CDC APPLY CHANGES: collapse a keyed change stream (upserts +
    deletes, ordered per key by ``sequence_cols``) into the final
    snapshot — the ``apply_changes``/``MERGE`` shape every warehouse
    sync job runs downstream of the reference's extract (its MySQL →
    BigQuery flow replays full batches; this is the row-level form).

    Per key the row with the highest sequence wins; if that winner's
    ``op_col`` equals ``delete_op`` the key is absent from the output.
    One shuffle on the key columns (window rank); ties on the full
    sequence are broken deterministically only if callers include a
    unique tiebreaker column in ``sequence_cols`` — do that.

    Scale notes: at 100 TB this is the textbook AQE-skew-safe window
    aggregation — the shuffle carries the change stream once, hashed on
    the key; no join against the (possibly huge) existing snapshot is
    needed because the stream itself is collapsed first, and the
    snapshot merge then reuses ``merge_upsert`` (anti-join class).
    """
    return collapse_changes(changes, keys, sequence_cols).filter(
        F.col(op_col) != F.lit(delete_op)
    )


def collapse_changes(
    changes: DataFrame,
    keys: list[str],
    sequence_cols: list[str],
) -> DataFrame:
    """Latest change per key (highest sequence wins), KEEPING delete
    tombstones — the merge-state form of ``apply_changes``. A streaming
    CDC merge must retain tombstones between micro-batches so a
    late-arriving lower-sequence row for a deleted key cannot
    resurrect it; filter the delete op only at serving time."""
    order = [F.col(c).desc() for c in sequence_cols]
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
