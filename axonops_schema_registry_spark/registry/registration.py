"""The registration pipeline (SURVEY.md §2.10) as one declarative Spark job.

Reference write path (/root/reference/internal/registry/registry.go:63-220 +
postgres/store.go:540-680): parse → canonicalize → fingerprint → dedup →
compatibility gate → version allocation → append.  The reference needs DB
transactions and optimistic retries for the version/ID race; in the batch
model the race disappears — versions are assigned with a deterministic
window over the batch order.

Pipeline stages (all lazy, one job):
1. fingerprint incoming via the canonical-form pandas UDF (F10-F12);
2. duplicate detection: left join against existing (subject, fingerprint)
   + first-occurrence window within the batch (J7);
3. compatibility gate: join candidates to the subject's history (latest or
   full per mode), pairwise ``check_pair`` UDF, aggregate verdict (C1-C3);
4. version assignment: ``prior_max + row_number()`` over accepted rows
   (A2 without the transaction).

Scale: every join/window keys on ``subject`` — co-partitioned end to end,
a single shuffle lineage; history joins broadcast when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from axonops_schema_registry_spark.registry.spark_udfs import (
    check_pair_udf,
    fingerprint_udf,
    ship_package,
)


def register_batch(spark: SparkSession, existing: DataFrame,
                   incoming: DataFrame, mode: str = "BACKWARD",
                   native_fingerprint: bool = False) -> DataFrame:
    """Process a registration batch.

    ``existing``: (subject, version, schema_type, schema_text[, deleted])
    current corpus.  ``incoming``: (subject, seq, schema_type,
    schema_text) where ``seq`` is the deterministic batch order.

    Soft-delete lifecycle (postgres/store.go:617-625,
    delete_and_reregister.feature): DEDUP and the COMPAT HISTORY consider
    only live rows — a schema whose fingerprint exists solely on deleted
    rows re-registers — but VERSION allocation takes MAX(version) over ALL
    rows including deleted ones (store.go:553-557), so version numbers are
    never reused.

    Returns (subject, seq, status, assigned_version, n_issues) with status
    ∈ {registered, duplicate, incompatible}.
    """
    ship_package(spark)
    if native_fingerprint:
        # opaque (non-schema) content: sha2 over raw text stays entirely
        # JVM-side — no Python workers in the fingerprint stage.  Use for
        # RAW corpora; parsed schema types need the canonical-form UDF.
        def fp(text_col: str, _type_col: str):
            return F.sha2(F.col(text_col), 256)
    else:
        fp = fingerprint_udf(strict=True)  # dedup must distinguish defaults
    check = check_pair_udf()

    if "deleted" not in existing.columns:
        existing = existing.withColumn("deleted", F.lit(False))
    # cached: existing feeds dedup, the compat history AND prior-max —
    # without the cache the fingerprint UDF would run 3x over the corpus
    existing_fp = existing.withColumn(
        "fingerprint", fp("schema_text", "schema_type")).cache()
    existing_live = existing_fp.filter(~F.col("deleted"))
    inc = incoming.withColumn(
        "fingerprint", fp("schema_text", "schema_type")).cache()

    # -- stage 2: dedup (live rows only) ----------------------------------
    dup_vs_existing = existing_live.select("subject", "fingerprint").distinct() \
        .withColumn("dup_existing", F.lit(True))
    w_batch = (Window.partitionBy("subject", "fingerprint").orderBy("seq"))
    inc = (inc
           .join(dup_vs_existing, ["subject", "fingerprint"], "left")
           .withColumn("dup_in_batch", F.row_number().over(w_batch) > 1)
           .withColumn("is_duplicate",
                       F.coalesce(F.col("dup_existing"), F.lit(False))
                       | F.col("dup_in_batch")))

    # -- stage 3: compatibility gate --------------------------------------
    transitive = mode.endswith("_TRANSITIVE")
    w_latest = Window.partitionBy("subject").orderBy(F.desc("version"))
    history = existing_live.select("subject", "version",
                                   F.col("schema_text").alias("old_text"))
    if not transitive:
        history = (history.withColumn("__rn", F.row_number().over(w_latest))
                          .filter(F.col("__rn") == 1).drop("__rn"))
    base = mode.replace("_TRANSITIVE", "").upper()

    candidates = inc.filter(~F.col("is_duplicate"))
    paired = candidates.join(history, "subject", "left")
    if base in ("NONE",):
        verdict = candidates.select(
            "subject", "seq", F.lit(True).alias("is_compatible"),
            F.lit(0).alias("n_issues"))
    else:
        backward = check("schema_text", "old_text", "schema_type") \
            if base in ("BACKWARD", "FULL") else None
        forward = check("old_text", "schema_text", "schema_type") \
            if base in ("FORWARD", "FULL") else None
        issue_cols = []
        if backward is not None:
            issue_cols.append(F.size(backward["messages"]))
        if forward is not None:
            issue_cols.append(F.size(forward["messages"]))
        pair_issues = sum(issue_cols[1:], issue_cols[0])
        verdict = (paired
                   .withColumn("pair_issues",
                               F.when(F.col("old_text").isNull(), F.lit(0))
                               .otherwise(pair_issues))
                   .groupBy("subject", "seq")
                   .agg(F.sum("pair_issues").cast("int").alias("n_issues"))
                   .withColumn("is_compatible", F.col("n_issues") == 0))

    # -- stage 4: version assignment (max over ALL rows incl. deleted) ----
    prior_max = existing_fp.groupBy("subject").agg(
        F.max("version").alias("prior_max"))
    accepted = (candidates.join(verdict.select("subject", "seq",
                                               "is_compatible", "n_issues"),
                                ["subject", "seq"])
                .filter(F.col("is_compatible")))
    w_assign = Window.partitionBy("subject").orderBy("seq")
    assigned = (accepted
                .join(F.broadcast(prior_max), "subject", "left")
                .withColumn("assigned_version",
                            (F.coalesce(F.col("prior_max"), F.lit(0))
                             + F.row_number().over(w_assign)).cast("int")))

    # -- assemble statuses -------------------------------------------------
    dupes = inc.filter(F.col("is_duplicate")).select(
        "subject", "seq", F.lit("duplicate").alias("status"),
        F.lit(None).cast("int").alias("assigned_version"),
        F.lit(0).alias("n_issues"))
    rejected = (candidates.join(verdict.select("subject", "seq",
                                               "is_compatible", "n_issues"),
                                ["subject", "seq"])
                .filter(~F.col("is_compatible"))
                .select("subject", "seq",
                        F.lit("incompatible").alias("status"),
                        F.lit(None).cast("int").alias("assigned_version"),
                        "n_issues"))
    registered = assigned.select(
        "subject", "seq", F.lit("registered").alias("status"),
        "assigned_version", F.lit(0).alias("n_issues"))
    return registered.unionByName(rejected).unionByName(dupes)


def import_batch(spark: SparkSession, existing: DataFrame,
                 incoming: DataFrame) -> DataFrame:
    """S9 bulk import with explicit IDs + conflict detection
    (/root/reference/internal/registry/registry.go:1184-1309).

    ``existing``: (schema_id, fingerprint); ``incoming``: (schema_id,
    subject, fingerprint).  Status per incoming row:
    - ``imported``  — id unknown, claim it;
    - ``exists``    — id known with the SAME fingerprint (idempotent);
    - ``conflict``  — id known with a DIFFERENT fingerprint (the
      reference's 409/42201 import conflict).
    """
    # No broadcast hint: ``existing`` is the full corpus (the BIG side at
    # scale) — the shuffle keys on schema_id and AQE picks broadcast when
    # the batch actually is small.
    ex = existing.select(F.col("schema_id"),
                         F.col("fingerprint").alias("existing_fp"))
    joined = incoming.join(ex, "schema_id", "left")
    status = (F.when(F.col("existing_fp").isNull(), "imported")
               .when(F.col("existing_fp") == F.col("fingerprint"), "exists")
               .otherwise("conflict"))
    return joined.select("schema_id", "subject", "fingerprint",
                         status.alias("status"))
