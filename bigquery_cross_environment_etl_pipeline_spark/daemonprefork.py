"""pyspark.daemon wrapper that preloads heavyweight modules pre-fork.

Measured problem (optimization round 11, guide §4.5): every pyspark
worker process imports the scientific stack on first use — ~4.7 s CPU
each (1.4 s user + 3.3 s sys, dominated by numpy/pandas/pyarrow shared
objects) — and a session fans out to 60+ workers when two Python stages
chain, so the first Python-stage query of a session pays 150–400 s of
pure import CPU (measured: 413 s worker CPU on the first
``multimodal_jpeg_decode`` pass of a fresh session vs 40 s once warm).

Fix: point ``spark.python.daemon.module`` at this module (set in
``session.get_spark``).  The daemon imports the stack ONCE before it
starts forking; every worker inherits the already-initialized modules
through fork copy-on-write, so per-worker startup drops to the fork
itself.  This also runs the package import side effects pre-fork —
notably ``workerenv.ensure_fast_zip_invalidation`` — so every worker is
born with the per-task zipimport fix, not just the ones that unpickle a
package-referencing UDF.

Every import is best-effort: a missing optional module must never take
down the daemon (workers would then fail to launch at all).  The
wrapped stock daemon keeps full responsibility for the protocol.
"""

from __future__ import annotations


def _preload() -> None:
    for mod in (
        "numpy",
        "pandas",
        "pyarrow",
        "pyspark.sql.pandas.serializers",
        "pyspark.sql.pandas.types",
        "pyspark.worker",
        # package side effects: zipimport invalidation fix; operators
        # commonly unpickled into workers ride along copy-on-write
        "bigquery_cross_environment_etl_pipeline_spark",
        "bigquery_cross_environment_etl_pipeline_spark.operators.jpeg",
        "bigquery_cross_environment_etl_pipeline_spark.operators.multimodal",
    ):
        try:
            __import__(mod)
        except Exception:  # noqa: BLE001 — preload is strictly best-effort
            pass


if __name__ == "__main__":
    _preload()
    # install the worker-side zipimport fix explicitly (the package
    # import above applies it only under the worker-context heuristic;
    # the daemon is the one place it must NEVER be missed — every
    # worker inherits it through fork)
    try:
        from bigquery_cross_environment_etl_pipeline_spark import workerenv

        workerenv.ensure_fast_zip_invalidation()
    except Exception:  # noqa: BLE001 — best-effort, like the preload
        pass
    from pyspark.daemon import manager

    manager()
