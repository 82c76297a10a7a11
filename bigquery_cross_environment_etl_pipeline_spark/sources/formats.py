"""Source/sink format connectors.

The reference's endpoints are BigQuery (columnar service) and MySQL
(JDBC): here parquet is the primary columnar store and this module adds
the interchange formats a pipeline meets at its edges — CSV / JSON /
ORC with explicit schemas (schema inference is disabled by design: at
100 TB an inference pass is a full extra scan, and inferred types
drift between runs), plus the JDBC reader shape for real MySQL parity.

Scale notes: CSV/JSON are row-oriented text — fine as ingestion edges,
never as the analytical store; the write helpers exist mostly to feed
external consumers. ORC/parquet carry column pruning + predicate
pushdown. JDBC reads are partitioned on a numeric column so one table
read fans out across executors instead of one connection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TEXT_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def write_csv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", TEXT_TS_FMT)
        .option("timestampNTZFormat", TEXT_TS_FMT)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", TEXT_TS_FMT)
        .option("timestampNTZFormat", TEXT_TS_FMT)
        .csv(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("timestampFormat", TEXT_TS_FMT)
        .option("timestampNTZFormat", TEXT_TS_FMT)
        .json(path)
    )


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return (
        spark.read.schema(schema).option("timestampFormat", TEXT_TS_FMT)
        .option("timestampNTZFormat", TEXT_TS_FMT).json(path)
    )


def read_json_tolerant(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """PERMISSIVE JSON read: malformed lines survive as rows whose
    typed columns are NULL and whose raw text lands in
    ``_corrupt_record`` — at 100 TB one bad producer must not kill a
    million-file read, and the corrupt rows stay queryable for
    quarantine/reprocessing (the batch analog of the decode path's
    ``valid=false`` lane). FAILFAST remains the right mode for curated
    inner-pipeline datasets — use ``read_json`` there."""
    from pyspark.sql.types import StringType, StructField, StructType

    # fresh StructType: .add() mutates the receiver in place
    with_corrupt = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    return (
        spark.read.schema(with_corrupt)
        .option("timestampFormat", TEXT_TS_FMT)
        .option("timestampNTZFormat", TEXT_TS_FMT)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution-tolerant parquet read: ``mergeSchema`` unions
    the footers of every file, so batches written before a column was
    added surface it as NULL instead of failing the read. The merge
    touches footers only (no data scan); at 100 TB the steady-state
    alternative — declaring the current schema explicitly with
    ``.schema(...)`` — skips even that, so this reader is for the
    evolving-ingest edge, not the hot path."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def derby_shutdown(spark: SparkSession, db_path: str) -> None:
    """Shut down one embedded Derby database before its directory is
    deleted. Derby keeps every booted database registered in the JVM —
    page cache, background threads, open file handles — until an
    explicit ``;shutdown=true`` connection; deleting the directory out
    from under a booted engine leaks all of that (and disk, on posix,
    until JVM exit) once per invocation. Derby signals a SUCCESSFUL
    shutdown by raising SQLException 08006, so the raise is swallowed;
    a database that was never booted raises too, equally fine."""
    try:
        spark._jvm.java.sql.DriverManager.getConnection(  # noqa: SLF001
            f"jdbc:derby:{db_path};shutdown=true"
        )
    except Exception:  # noqa: BLE001 — 08006 IS the success signal
        pass


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    driver: str | None = None,
):
    """Configured JDBC read (the reference's MySQL side, reference
    core/database/database_class.py:12-38). Returns the reader so
    callers can `.load()`; partitioned on a numeric column so the scan
    parallelizes (each partition becomes one ranged SELECT — the shape
    a 1000-executor cluster uses to drain a sharded OLTP source).
    Credentials and driver are optional: embedded engines (Derby, which
    ships in Spark's jars and backs the driver-visible
    ``jdbc_roundtrip_rollup`` query and tests/test_jdbc_roundtrip.py)
    need neither, a real MySQL endpoint passes all three."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if driver is not None:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound or 0)
            .option("upperBound", upper_bound or 1_000_000)
        )
    return reader
