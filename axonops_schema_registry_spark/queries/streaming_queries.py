"""Batch-analog specs for the streaming operators (ST2/ST3/ST6): the same
pure DataFrame→DataFrame transformations the streaming pipeline runs,
executed in batch mode so the driver's DuckDB oracle can check them.
(ST7's batch analog is a10_event_metrics; the streaming execution itself
is covered by tests/test_streaming.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from axonops_schema_registry_spark.catalog import load_table
from axonops_schema_registry_spark.queries.base import QuerySpec
from axonops_schema_registry_spark.streaming.audit import (
    cef_format,
    filter_event_types,
    normalize_audit,
    rate_limit_flags,
)


def st2_filtered_cef_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2+ST3: enabled-type filter + CEF sink formatting (audit.go:244-299)."""
    audit = normalize_audit(load_table(spark, sf_dir, "events"))
    return cef_format(filter_event_types(audit, ("error", "purchase")))


ST2_ORACLE = """
SELECT 'CEF:0|axonops|schema-registry-spark|1.0|' || event_type || '|'
       || event_type || '|'
       || CASE WHEN event_type = 'error' THEN '7' ELSE '3' END || '|'
       || 'act=' || CAST(user_id AS VARCHAR)
       || ' request=' || CAST(user_id AS VARCHAR) || '-'
                      || CAST(event_id AS VARCHAR)
       || ' outcome='
       || CASE WHEN event_type = 'error' THEN 'failure' ELSE 'success' END
         AS line
FROM events WHERE event_type IN ('error', 'purchase')
"""


def st6_rate_limit_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6: windowed per-actor rate limiting (ratelimit.go as analytics)."""
    audit = normalize_audit(load_table(spark, sf_dir, "events"))
    flags = rate_limit_flags(audit, window="1 hour", max_per_window=3)
    return flags.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
        .alias("window_start"), "actor_id", "n_requests", "rate_limited")


ST6_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       user_id AS actor_id, COUNT(*) AS n_requests,
       COUNT(*) > 3 AS rate_limited
FROM events GROUP BY 1, 2
"""


def st8_exporter_filter_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: exporter subject filtering + rename + context re-homing
    (exporter.go:274-305; context addressing context.go:47-60) — batch
    analog of the schema-linking push."""
    from axonops_schema_registry_spark.registry.model import registry_corpus
    from axonops_schema_registry_spark.streaming.exporter import (
        exporter_transform,
    )

    corpus = registry_corpus(spark, sf_dir).filter(~F.col("deleted"))
    return exporter_transform(
        corpus.select("subject", "version", "schema_id"),
        subjects=["src1*"],
        subject_rename_format="${subject}-mirror",
        context_type="CUSTOM", context="dr-site")


ST8_ORACLE = """
WITH corpus AS (
  SELECT source AS subject,
         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS INT)
           AS version,
         doc_id AS schema_id, (doc_id % 20 = 0) AS deleted
  FROM documents)
SELECT subject, version, schema_id,
       ':.dr-site:' || subject || '-mirror' AS exported_subject
FROM corpus
WHERE NOT deleted AND regexp_matches(lower(subject), '^src1.*$')
"""


SPECS: list[QuerySpec] = [
    QuerySpec("st2_filtered_cef_lines", st2_filtered_cef_lines, ST2_ORACLE,
              tags=("streaming",)),
    QuerySpec("st6_rate_limit_flags", st6_rate_limit_flags, ST6_ORACLE,
              tags=("streaming",)),
    QuerySpec("st8_exporter_filter_rename", st8_exporter_filter_rename,
              ST8_ORACLE, tags=("streaming", "registry")),
]
