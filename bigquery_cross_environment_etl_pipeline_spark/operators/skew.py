"""Skew mitigation: salted joins.

AQE's skew-join handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); explicit
salting remains necessary when ONE key dominates so heavily that even
split shuffle blocks overload (the classic null-key / hot-tenant case at
100 TB).

Mechanics: the skewed (large) side gets a random-but-deterministic salt
in [0, n); the small side is replicated n times with every salt value;
the join key becomes (key, salt). Each hot key's rows spread over n
reducers; results are identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the large side salted and the small
    side replicated ``n_salts`` times. Deterministic salt (hash of the
    full row's key + a per-row id via monotonically stable pmod of
    xxhash) so re-runs shuffle identically."""
    salted_large = large.withColumn(
        "_salt", F.pmod(F.xxhash64(*large.columns), F.lit(n_salts)).cast("int")
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_large.join(replicated_small, [key, "_salt"], how)
    return out.drop("_salt")
