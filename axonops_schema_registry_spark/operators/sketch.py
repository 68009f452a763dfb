"""Distinct-count sketches over DataFrames.

Two paths:

- ``approx_count_distinct`` (Spark's built-in HLL++) is the production
  default — JVM-native, order-insensitive, mergeable, O(1) state.
- ``kmv_sketch`` / ``kmv_estimate`` implement a K-minimum-values sketch
  whose STATE is inspectable and mergeable as plain arrays: keep the k
  smallest normalized hashes of the values; the (k-1)/kth-minimum
  estimator gives distinct counts within ~1/sqrt(k) relative error.
  KMV's value over HLL here is exact mergeability semantics in pure
  DataFrame ops (array_sort ∘ union ∘ slice) — the shape used when
  sketches are stored per partition/day and unioned at read time
  (the hypertable-rollup pattern for COUNT DISTINCT, which plain
  count/sum/min/max rollups cannot re-aggregate).

Determinism: hashes come from xxhash64, normalization is fixed-point —
the same data always yields the same sketch and estimate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO64 = 18446744073709551616.0  # 2^64


def _unit_hash(col: str | Column) -> Column:
    """xxhash64 mapped to (0, 1): u = (h + 2^63 + 1) / 2^64."""
    h = F.xxhash64(F.col(col) if isinstance(col, str) else col)
    return (h.cast("double") / F.lit(_TWO64)) + F.lit(0.5)


def kmv_sketch(df: DataFrame, keys: Sequence[str], value_col: str,
               k: int = 256) -> DataFrame:
    """Per-key KMV sketch: the k smallest unit-hashes of the distinct
    values, as a sorted array column ``kmv`` (plus ``n_kept``).

    The distinct-hash aggregation map-side combines; the per-key top-k
    selection runs over DISTINCT hashes (value cardinality), not rows.
    """
    hashes = (df.select(*keys, _unit_hash(value_col).alias("__u"))
              .groupBy(*keys, "__u").agg(F.lit(1).alias("__one")))
    return (hashes.groupBy(*keys)
            .agg(F.slice(F.array_sort(F.collect_list("__u")), 1, k)
                 .alias("kmv"))
            .withColumn("n_kept", F.size("kmv")))


def kmv_merge(col_a: Column, col_b: Column, k: int = 256) -> Column:
    """Merge two sketches: union → sort → first k.  Associative and
    commutative, so day sketches roll up to month sketches exactly like
    sums roll up — the re-aggregation property HLL offers only as an
    opaque binary."""
    return F.slice(F.array_sort(F.array_union(col_a, col_b)), 1, k)


def kmv_estimate(kmv_col: Column, k: int = 256) -> Column:
    """Distinct estimate: exact (= array size) below k, else
    (k-1) / kth_minimum."""
    size = F.size(kmv_col)
    kth = F.element_at(kmv_col, k)
    return (F.when(size < k, size.cast("double"))
            .otherwise(F.lit(float(k - 1)) / kth))
