"""Bans HUGEINT (int128) from every oracle's output schema.

Round-8 root cause of the r6/r7 `corpus_sequence_packing` driver hash
FAILs: DuckDB's SUM(BIGINT) returns HUGEINT, and a consumer that
fetches through Arrow surfaces HUGEINT as decimal128(38,0) -> Python
Decimal — which hashes unequal to Spark's int64 even when every value
is numerically identical. A fetchall() consumer (this repo's local
parity harness) gets plain Python ints instead, so the divergence was
invisible locally for two rounds. The class is only reachable through
the oracle's *output* types, so this gate runs every registered oracle
against the sf0.001 parquet in plain DuckDB (no Spark session — fast)
and fails on any HUGEINT/UHUGEINT output column.

If an oracle legitimately needs int128 intermediates (wide sums), keep
them inside a CTE and CAST the projected column to BIGINT — the fix
applied to corpus_sequence_packing's start_offset.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

BANNED = {"HUGEINT", "UHUGEINT"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


def test_no_oracle_emits_hugeint(con):
    from __spark_entry__ import oracle_sql

    offenders: list[str] = []
    for name, sql in sorted(oracle_sql().items()):
        rel = con.sql(sql)
        hits = [
            f"{col}:{typ}"
            for col, typ in zip(rel.columns, (str(t) for t in rel.types))
            if typ in BANNED
        ]
        if hits:
            offenders.append(f"{name}: {', '.join(hits)}")
    assert not offenders, (
        "oracle output columns with int128 types (Arrow consumers see "
        "Decimal, not int — CAST ... AS BIGINT inside the oracle):\n"
        + "\n".join(offenders)
    )
