"""Real JDBC protocol round-trip over embedded Derby (ships in Spark's
jars) — upgrades the connector surface from configured-only to
exercised: write path, partitioned parallel read, filter pushdown into
the database, and type fidelity including timestamps.

A MySQL endpoint differs from this only by URL/credentials/network;
the Spark-side code path (`DataFrameWriter.jdbc`,
`sources/formats.jdbc_reader`) is identical.

Slices are DETERMINISTIC FILTERS, never ``limit()``: a bare LIMIT
re-evaluates per job with no guaranteed row selection, so the write
action and a later source-side collect could pick different rows — the
same per-job re-evaluation class curation.py documents.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from bigquery_cross_environment_etl_pipeline_spark.sources.formats import (
    derby_shutdown,
    jdbc_reader,
)
from bigquery_cross_environment_etl_pipeline_spark.sources.registry import load_table

from .conftest import SF_SMOKE

_DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_db(spark, tmp_path):
    db = f"{tmp_path}/db"
    yield db
    derby_shutdown(spark, db)


def _url(db: str) -> str:
    return f"jdbc:derby:{db};create=true"


def test_jdbc_write_partitioned_read_roundtrip(spark, derby_db):
    orders = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .filter(F.col("o_orderkey") % 7 == 0)
    )
    orders.write.jdbc(
        _url(derby_db), "ORDERS_T", mode="overwrite", properties={"driver": _DERBY}
    )
    back = jdbc_reader(
        spark,
        _url(derby_db),
        "ORDERS_T",
        partition_column="o_orderkey",
        num_partitions=4,
        lower_bound=0,
        upper_bound=1_000_000,
        driver=_DERBY,
    ).load()
    # the ranged split really happens: 4 partitions, content identical
    assert back.rdd.getNumPartitions() == 4
    src = sorted(map(tuple, orders.collect()))
    assert len(src) > 50
    rt = sorted(map(tuple, back.collect()))
    assert rt == src


def test_jdbc_filter_pushdown_reaches_database(spark, derby_db):
    events = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_id", "user_id", "value")
        .filter(F.col("value").isNotNull() & (F.col("event_id") % 11 == 0))
    )
    events.write.jdbc(
        _url(derby_db), "EVENTS_T", mode="overwrite", properties={"driver": _DERBY}
    )
    back = jdbc_reader(spark, _url(derby_db), "EVENTS_T", driver=_DERBY).load()
    flt = back.filter(F.col("value") > 2.0)
    plan = flt._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and re.search(r"GreaterThan\(value,2\.0\)", m.group(1)), plan[:800]
    # pushed predicate returns the same rows the unfiltered read + a
    # Spark-side filter would
    expected = sorted(
        r["event_id"] for r in back.collect() if r["value"] > 2.0
    )
    assert sorted(r["event_id"] for r in flt.collect()) == expected


def test_jdbc_timestamp_fidelity(spark, derby_db):
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_id", "ts")
        .filter(F.col("ts").isNotNull() & (F.col("event_id") % 13 == 0))
    )
    ev.write.jdbc(
        _url(derby_db), "TS_T", mode="overwrite", properties={"driver": _DERBY}
    )
    back = jdbc_reader(spark, _url(derby_db), "TS_T", driver=_DERBY).load()
    src = {r["event_id"]: r["ts"] for r in ev.collect()}
    assert len(src) > 50
    rt = {r["event_id"]: r["ts"] for r in back.collect()}
    assert rt == src


def _orders_slice_dir(spark, tmp_path, keys):
    """Write a tiny orders.parquet containing exactly the given
    o_orderkey values (copied rows re-keyed from sf0.001), so the
    registered jdbc_roundtrip_rollup query can be driven against a
    controlled `% 20 == 0` slice."""
    base = load_table(spark, SF_SMOKE, "orders").limit(0)
    one = load_table(spark, SF_SMOKE, "orders").orderBy("o_orderkey").limit(1)
    rows = one.collect() * len(keys)
    out = spark.createDataFrame(
        [r.asDict() | {"o_orderkey": k} for r, k in zip(rows, keys)],
        base.schema,
    ) if keys else base
    d = tmp_path / "sfdir"
    d.mkdir()
    out.coalesce(1).write.parquet(str(d / "orders.parquet"))
    return str(d)


def test_jdbc_rollup_empty_slice_raises_named_precondition(spark, tmp_path):
    """ADVICE r7: an empty o_orderkey % 20 == 0 slice must fail with a
    ValueError naming the precondition, not an opaque int(None)
    TypeError from NULL MIN/MAX bounds."""
    from bigquery_cross_environment_etl_pipeline_spark.plans.extended import (
        jdbc_roundtrip_rollup,
    )

    sf = _orders_slice_dir(spark, tmp_path, keys=[1, 3, 7, 21, 41])
    with pytest.raises(ValueError, match="slice of orders is empty"):
        jdbc_roundtrip_rollup(spark, sf)


def test_jdbc_rollup_single_key_slice_degenerate_bounds(spark, tmp_path):
    """VERDICT r7 item 4: a single-key slice gives MIN == MAX, i.e.
    lower_bound == upper_bound - 1 — the degenerate ranged
    partitioning must still read the row (no empty-range stride or
    off-by-one drop) and the rollup must count exactly it."""
    from bigquery_cross_environment_etl_pipeline_spark.plans.extended import (
        jdbc_roundtrip_rollup,
    )

    sf = _orders_slice_dir(spark, tmp_path, keys=[1, 3, 40, 41])
    out = jdbc_roundtrip_rollup(spark, sf).collect()
    assert len(out) == 1
    assert out[0]["n_orders"] == 1
    assert out[0]["filter_pushed"] is True
