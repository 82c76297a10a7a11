"""Bounded-memory DuckDB sessions for the replay tools.

DuckDB's default memory budget is 80% of detected RAM, which ignores
the Spark JVM sharing the box: over a 200+ query replay the heavy
canary oracles (recursive CTEs, all-pairs truth arms) then die with a
hard malloc failure instead of spilling, and in round 8 one such OOM
cascaded into 23 consecutive one-sided 'errors'. This helper is the
single shared policy both tools (edge_fixture, arrow_replay) use so
the cap, spill location, and retry semantics cannot drift:

- memory_limit = min(24 GB, half of detected RAM) — bounded DOWN on
  small hosts too (a hardcoded 24 GB would RAISE the budget above the
  default on a 16 GB box, inverting the intent);
- a spill directory so the bound means out-of-core, not failure,
  removed on close();
- ``run(fn)`` retries ONCE on a typed/bad_alloc OOM with a fresh
  connection, and on ANY failure drops the connection so no later
  query ever runs against a closed or poisoned session (the cascade
  is structurally impossible: a missing connection is rebuilt on the
  next call).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Callable, Sequence, TypeVar

import duckdb

T = TypeVar("T")


def _memory_limit() -> str:
    try:
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    except (ValueError, OSError, AttributeError):
        total = 64 << 30
    gb = max(1, min(24, (total // 2) >> 30))
    return f"{gb}GB"


def is_oom(ex: BaseException) -> bool:
    if isinstance(ex, duckdb.OutOfMemoryException):
        return True
    s = str(ex).lower()
    # ArrowMemoryError / std::bad_alloc surface as generic exceptions
    return (
        "out of memory" in s
        or "bad_alloc" in s
        or "failed to allocate" in s
        or "malloc" in s
    )


class BoundedOracle:
    """A DuckDB session over ``{data_dir}/{table}.parquet`` views with
    the bounded-memory policy above. Use ``run(fn)`` for every query;
    call ``close()`` (or use as a context manager) to drop the spill
    directory."""

    def __init__(self, data_dir: str, tables: Sequence[str]):
        self.data_dir = data_dir
        self.tables = list(tables)
        self.spill = tempfile.mkdtemp(prefix="duck_spill_")
        self._con: duckdb.DuckDBPyConnection | None = None

    def _connect(self) -> duckdb.DuckDBPyConnection:
        c = duckdb.connect(
            config={"memory_limit": _memory_limit(), "temp_directory": self.spill}
        )
        for t in self.tables:
            c.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{self.data_dir}/{t}.parquet'"
            )
        return c

    def _drop_con(self) -> None:
        if self._con is not None:
            try:
                self._con.close()
            except Exception:  # noqa: BLE001 — already broken, drop it
                pass
            self._con = None

    def run(self, fn: Callable[[duckdb.DuckDBPyConnection], T]) -> T:
        """Execute ``fn(con)``; one fresh-connection retry on OOM. Any
        failure (including a failed reconnect) leaves the session
        connection-less, so the NEXT call reconnects — a single bad
        query can never poison the rest of a sweep."""
        last: BaseException | None = None
        for attempt in (0, 1):
            try:
                if self._con is None:
                    self._con = self._connect()
                return fn(self._con)
            except Exception as ex:  # noqa: BLE001 — classified below
                self._drop_con()
                last = ex
                if not is_oom(ex):
                    raise
        raise last  # second OOM: report it, connection already dropped

    def close(self) -> None:
        self._drop_con()
        shutil.rmtree(self.spill, ignore_errors=True)

    def __enter__(self) -> "BoundedOracle":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
