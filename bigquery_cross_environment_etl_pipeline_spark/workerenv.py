"""Python-worker import-system fix (optimization round 11, guide §4).

Measured problem: Spark's per-task worker setup
(``pyspark/worker_util.py::setup_spark_files``) calls
``importlib.invalidate_caches()`` on EVERY task.  On CPython 3.11 a
``zipimporter.invalidate_caches()`` re-reads the whole zip central
directory eagerly, and the worker ``sys.path`` carries three archives
(pyspark.zip 1,328 entries, spark-core jar 5,359 entries, py4j zip) —
measured at **~0.17 s CPU per Python task** on this interpreter, which
dwarfs the actual UDF work of most Arrow-batched stages (an identity
``mapInPandas`` over 32 tasks costs ~5.5 s of worker CPU, of which the
UDF itself is 0.07 s; see OPTIMIZATION_r11.md).

Fix: make ``zipimporter.invalidate_caches`` mtime-checked — re-read the
directory only when the archive actually changed (newer CPython does
exactly this; 3.11's eager re-read is the old behaviour).  Semantics are
preserved: a zip shipped or replaced mid-session has a different mtime
(or a brand-new path, which builds a fresh finder) and still
invalidates; the static Spark distribution archives stop being
re-parsed thousands of times per session.

The patch is applied from the package import ONLY in worker/daemon
processes (``pyspark.worker``/``pyspark.daemon`` already imported —
the round-12 ADVICE scoping: driver, tests, and embedding hosts keep
stock zipimport semantics), and unconditionally from the daemon
preload module (``daemonprefork``), so every worker forked after the
daemon imported us carries it.  Idempotent and process-local.
"""

from __future__ import annotations

import os
import zipimport

_PATCHED = False


def ensure_fast_zip_invalidation() -> None:
    """Install the mtime-checked ``zipimporter.invalidate_caches``."""
    global _PATCHED
    if _PATCHED:
        return
    _PATCHED = True
    try:
        orig = zipimport.zipimporter.invalidate_caches
    except AttributeError:  # no zipimport invalidation on this runtime
        return

    def invalidate_if_changed(self) -> None:
        # nanosecond mtime + size: a rewrite within coarse-mtime
        # granularity (or a same-second replace) still invalidates
        try:
            st = os.stat(self.archive)
            stamp = (st.st_mtime_ns, st.st_size)
        except OSError:
            stamp = None
        if getattr(self, "_bqxe_seen_stamp", None) == stamp and stamp is not None:
            return
        self._bqxe_seen_stamp = stamp
        orig(self)

    try:
        zipimport.zipimporter.invalidate_caches = invalidate_if_changed
    except (AttributeError, TypeError):  # immutable type: leave stock behaviour
        pass
