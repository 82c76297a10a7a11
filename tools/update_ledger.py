#!/usr/bin/env python
"""Regenerate the driver-green rotation ledger from CORRECTNESS_r*.json.

The external correctness driver hash-checks only the FIRST ~50 entries
of ``queries()`` each round.  To guarantee every oracle-bearing query
earns external evidence, the catalog orders its window from this
ledger: never-green queries first, then greens oldest-round-first
(see queries_catalog._window_order).  Run this tool at the start of
each round, after the driver has written CORRECTNESS_r{N}.json:

    python tools/update_ledger.py

It writes bigquery_cross_environment_etl_pipeline_spark/rotation_ledger.json with, per query, the list of
rounds in which the driver recorded a hash_match (and, separately,
rows-only matches for the declared non-replayable queries).
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(
    REPO, "bigquery_cross_environment_etl_pipeline_spark", "rotation_ledger.json"
)


def build_ledger(repo: str = REPO, live_names: set[str] | None = None) -> dict:
    """``live_names`` restricts the ledger to names registered in the
    CURRENT catalog (VERDICT r7 item 3): a query renamed or removed
    after earning driver evidence (e.g. ``dedup_ngram_jaccard_pairs``
    -> ``dedup_ngram_jaccard_verify_blocked`` in round 4) must not
    keep a dead ledger key — the rotation would budget refresh slots
    for a name the driver can never check again, and coverage
    accounting would count evidence no live query owns."""
    green: dict[str, list[int]] = {}
    rows_only: dict[str, list[int]] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        with open(path) as f:
            record = json.load(f)
        for name, res in record.items():
            if live_names is not None and name not in live_names:
                continue
            if res.get("hash_match"):
                green.setdefault(name, []).append(rnd)
            elif res.get("rows_match") and not res.get("err"):
                rows_only.setdefault(name, []).append(rnd)
    return {
        "rounds_scanned": sorted(set(rounds)),
        "green": {k: sorted(v) for k, v in sorted(green.items())},
        "rows_only": {k: sorted(v) for k, v in sorted(rows_only.items())},
    }


def catalog_names(repo: str = REPO) -> set[str]:
    """Names registered in the current catalog. Imports the package
    (and therefore a JVM-less pyspark), so only main() pays it — tests
    that already hold a catalog pass live_names explicitly."""
    import sys

    sys.path.insert(0, repo)
    from bigquery_cross_environment_etl_pipeline_spark import queries_catalog

    return set(queries_catalog.spark_queries())


def main() -> None:
    ledger = build_ledger(live_names=catalog_names())
    with open(LEDGER, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    n_green = len(ledger["green"])
    print(
        f"wrote {LEDGER}: rounds={ledger['rounds_scanned']} "
        f"green={n_green} rows_only={len(ledger['rows_only'])}"
    )


if __name__ == "__main__":
    main()
