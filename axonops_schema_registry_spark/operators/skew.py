"""Skew mitigation operators: salted joins and bucketed co-location.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; ``salted_join`` is the explicit fallback for the pathological case
AQE can't fix — a single hot key whose matching rows exceed one
executor's memory (the reference analog: one subject holding a huge
share of versions/events).

Salting scheme: the big side gets a deterministic per-row salt in
[0, n_salt); the small side is replicated n_salt times (one copy per salt
value); the join keys on (key, salt), spreading the hot key across
``n_salt`` tasks.  Join semantics are exactly preserved for inner joins.

``write_bucketed`` is the co-location path: both fact tables bucketed by
the join key ⇒ the sort-merge join runs with NO exchange on either side
(asserted in tests/test_bucketing.py) — at 100 TB this is the difference
between an hourly pipeline shuffling petabytes and one that reads
pre-bucketed data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salt: int = 8) -> DataFrame:
    """Inner equi-join with the hot-key rows of ``big`` spread over
    ``n_salt`` sub-partitions.  ``small`` is replicated n_salt ×."""
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt))
        .cast("int"))
    salts = F.explode(F.expr(f"sequence(0, {n_salt - 1})")).alias("__salt")
    replicated_small = small.select("*", salts)
    out = salted_big.join(replicated_small, [key, "__salt"], "inner")
    return out.drop("__salt")


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 8) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` so later joins on ``key``
    between co-bucketed tables need no shuffle."""
    (df.write.mode("overwrite")
       .bucketBy(n_buckets, key).sortBy(key)
       .format("parquet")
       .saveAsTable(table))
