"""Source-level drift detectors for conventions the oracles repeat.

Some cross-engine contracts appear verbatim in many plain-string
oracles (converting them all to f-strings around a shared generator
would risk brace escaping across 16+ SQL bodies). These tests pin the
canonical shape instead: any site that drifts from the exact fragment
fails here before it can hash-diverge in production.
"""

from __future__ import annotations

import glob
import os
import re

PLANS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bigquery_cross_environment_etl_pipeline_spark",
    "plans",
)

#: the ONE finite-money guard shape (edge-replay contract: inf/NaN
#: metric values are missing, mirroring Spark's native inf->DECIMAL
#: NULL). DECIMAL precision may vary; everything else may not.
#: precision 18 or 19 — 19 is the WIDENED LEFT FACTOR of an exact
#: product (18x18 overflows DuckDB's int64 decimal path on |value|
#: >= 1e9; 19 promotes the product to the int128 path while Spark's
#: result precision 19+18+1 = 38 still fits)
_FINITE_DEC = re.compile(
    r"\(CASE WHEN isfinite\(value\)\s+"
    r"THEN CAST\(value AS DECIMAL\(1[89],[24]\)\) END\)"
)


def test_every_isfinite_guard_matches_the_canonical_fragment():
    bad: list[str] = []
    total = 0
    for path in glob.glob(os.path.join(PLANS, "*.py")):
        src = open(path).read()
        # every isfinite(value) must sit inside the canonical guard —
        # count raw mentions vs canonical matches
        raw = len(re.findall(r"isfinite\(value\)", src))
        canonical = len(_FINITE_DEC.findall(src))
        # sites where isfinite(value) is a WHERE filter (histogram) or
        # guards a different expression (credits' -value/10,
        # safe_ratio) are the declared exceptions below
        declared = len(
            re.findall(
                r"WHERE isfinite\(value\)|isfinite\(value\)\s*\n?\s*THEN CAST\(-value",
                src,
            )
        )
        total += raw
        if raw != canonical + declared:
            bad.append(
                f"{os.path.basename(path)}: {raw} isfinite(value) mentions,"
                f" {canonical} canonical + {declared} declared exceptions"
            )
    assert total >= 16, "the finite-money guards should exist"
    assert not bad, "drifted isfinite guards:\n" + "\n".join(bad)
