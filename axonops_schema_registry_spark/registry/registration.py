"""The registration pipeline (SURVEY.md §2.10) as one declarative Spark job.

Reference write path (/root/reference/internal/registry/registry.go:63-220 +
postgres/store.go:540-680): parse → canonicalize → fingerprint → dedup →
compatibility gate → version allocation → append.  The reference needs DB
transactions and optimistic retries for the version/ID race; in the batch
model the race disappears — versions are assigned with a deterministic
window over the batch order.

Pipeline stages (all lazy, one job):
1. fingerprint incoming via the canonical-form pandas UDF (F10-F12);
2. duplicate detection vs the existing corpus: left join against existing
   live (subject, fingerprint) (J7);
3. compatibility gate: EXACT sequential per-subject semantics via a
   cogrouped ``applyInPandas`` — each candidate (in ``seq`` order) is
   checked against the subject's history PLUS the same-batch candidates
   accepted before it, exactly like the reference's serialized write path
   (registry.go:63-220 takes a per-subject lock).  A candidate identical
   to an earlier *accepted* candidate is a duplicate; identical to an
   earlier *rejected* one is re-checked (and rejected as incompatible,
   not duplicate) — both match sequential-server behavior.
4. version assignment: ``prior_max + row_number()`` over accepted rows
   (A2 without the transaction).

Scale: every join/window keys on ``subject`` — co-partitioned end to end,
a single shuffle lineage; history joins broadcast when small.  The
sequential gate parallelizes across subjects (the reference serializes
per subject too); per-group state is one subject's version history, which
is bounded.  ``mode="NONE"`` short-circuits to a fully declarative plan
with no Python stage.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from axonops_schema_registry_spark.registry.spark_udfs import (
    fingerprint_udf,
    ship_package,
)

def _gate_schema(ctx_col: str | None) -> str:
    """Verdict schema — MUST carry the context column when one is in play:
    contexts can reuse (subject, seq) pairs (seq restarts per tenant), so a
    verdict keyed on (subject, seq) alone would cross-match across contexts
    in the downstream joins."""
    ctx = f"{ctx_col} string, " if ctx_col else ""
    return f"{ctx}subject string, seq long, status string, n_issues int"


def _reserved_set(metadata_json) -> set[str]:
    """'confluent:reserved' comma-list from a metadata JSON text
    (registry.go:1460-1481)."""
    import json as _json

    if not metadata_json or not isinstance(metadata_json, str):
        return set()
    try:
        props = (_json.loads(metadata_json) or {}).get("properties") or {}
    except ValueError:
        return set()
    val = props.get("confluent:reserved") or ""
    return {f.strip() for f in val.split(",") if f.strip()}


def _top_level_fields(schema_text: str, schema_type: str) -> set[str]:
    """Top-level field names only (HasTopLevelField,
    schema/types.go:31-35) — nested record/object fields don't count."""
    from axonops_schema_registry_spark.registry.fields import (
        extract_fields,
    )

    return {f["name"] for f in extract_fields(schema_text, schema_type)
            if "." not in (f["path"] or "")}


def _sequential_gate(mode: str, ctx_col: str | None = None,
                     validate_fields: bool = False):
    """Per-subject sequential compat gate (cogrouped candidates × history).

    Candidates arrive pre-filtered of duplicates vs the existing corpus;
    history is the subject's live rows.  Accepted candidates join the
    in-memory history/fingerprint set so later candidates see them —
    the intra-batch pass the purely join-based gate lacked.

    When candidates carry a ``__level`` column (per-subject configured
    compatibility, resolved subject → global → ``mode`` default like the
    reference's GetConfigFull chain), it overrides ``mode`` for that
    subject's group.

    With ``validate_fields`` the reserved-field rules run after the
    compat check on each candidate's RAW ``__metadata`` against the
    latest stored metadata (registry.go:175-180, 1483-1512): a reserved
    name colliding with a top-level schema field, or a previously
    reserved name dropped from the request metadata, rejects the row
    with status ``reserved_conflict`` (the reference's 409).  Stored
    metadata inherits from the previous version when a request carries
    none — AFTER validation, like maybeSetMetadataRuleSet."""

    def gate(cand: pd.DataFrame, hist: pd.DataFrame) -> pd.DataFrame:
        from axonops_schema_registry_spark.registry.compat import (
            check_compatibility,
        )

        cand = cand.sort_values("seq")
        hist = hist.sort_values("version")
        level = mode
        if "__level" in cand.columns and len(cand):
            level = cand["__level"].iloc[0] or mode
        texts = hist["old_text"].tolist()
        latest_meta = None
        if validate_fields and len(hist) and \
                "__metadata" in hist.columns:
            latest_meta = hist["__metadata"].iloc[-1]
        accepted_fps: set[str] = set()
        # itertuples mangles leading-underscore names — pull the
        # metadata column out positionally instead
        cand_meta = (cand["__metadata"].tolist()
                     if validate_fields and "__metadata" in cand.columns
                     else [None] * len(cand))
        out = []
        for i, row in enumerate(cand.itertuples(index=False)):
            key = ((getattr(row, ctx_col), row.subject, row.seq)
                   if ctx_col else (row.subject, row.seq))
            if row.fingerprint in accepted_fps:
                out.append(key + ("duplicate", 0))
                continue
            ok, msgs = check_compatibility(
                row.schema_text, texts, level, row.schema_type)
            if not ok:
                out.append(key + ("incompatible", len(msgs)))
                continue
            if validate_fields:
                raw_meta = cand_meta[i]
                reserved = _reserved_set(raw_meta)
                issues = len(_reserved_set(latest_meta) - reserved)
                issues += len(reserved & _top_level_fields(
                    row.schema_text, row.schema_type))
                if issues:
                    out.append(key + ("reserved_conflict", issues))
                    continue
                latest_meta = raw_meta if raw_meta is not None \
                    else latest_meta
            texts.append(row.schema_text)
            accepted_fps.add(row.fingerprint)
            out.append(key + ("registered", 0))
        cols = (([ctx_col] if ctx_col else [])
                + ["subject", "seq", "status", "n_issues"])
        return pd.DataFrame(out, columns=cols)

    return gate


def register_batch(spark: SparkSession, existing: DataFrame,
                   incoming: DataFrame, mode: str = "BACKWARD",
                   native_fingerprint: bool = False,
                   modes: DataFrame | None = None,
                   levels: DataFrame | None = None,
                   group_col: str | None = None,
                   ctx_col: str | None = None,
                   metadata_col: str | None = None,
                   validate_fields: bool = False) -> DataFrame:
    """Process a registration batch.

    ``existing``: (subject, version, schema_type, schema_text[, deleted])
    current corpus.  ``incoming``: (subject, seq, schema_type,
    schema_text) where ``seq`` is the deterministic batch order.

    ``modes``: optional (subject nullable, mode) write-mode table
    (storage.go:144-147); rows whose resolved mode blocks normal
    registration short-circuit with status ``readonly_mode``
    (READONLY/READONLY_OVERRIDE → the 42205 error) or ``import_mode``
    (IMPORT requires explicit IDs → import_batch), before any
    fingerprint/compat work — mirroring CheckModeForWrite running ahead
    of the write path (registry_helpers.go:14, handlers.go:605-660).

    ``levels``: optional configured-compatibility table — per subject
    the gate uses subject level → global row → ``mode`` default, the
    reference's GetConfigFull chain (registry.go:706-776;
    j6_config_fallback is the read-side twin).  With ``ctx_col`` set and
    a (registry_ctx, subject, level) table, the FULL 4-tier chain
    applies: per-(ctx, subject) → ctx global → __GLOBAL context global
    → ``mode``.  Broadcast joins only; the sequential gate reads the
    resolved level per group.

    ``ctx_col``: multi-tenant context column present in BOTH ``existing``
    and ``incoming`` (the reference scopes every registry operation by
    context, registrycontext): dedup, the compat gate, and version
    allocation all key on (ctx, subject) — histories in other contexts
    are invisible.

    ``group_col``: compatibility-group column name present in BOTH
    ``existing`` and ``incoming`` (the metadata property the subject's
    ``compatibilityGroup`` config names, registry.go:1399-1431): the
    gate and the duplicate check scope to (subject, group) — history in
    other groups is invisible, exactly the reference's filter — while
    version allocation stays per subject (store.go:553-557).

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
    mode = (mode or "BACKWARD").upper()
    base_keys = ([ctx_col] if ctx_col else []) + ["subject"]

    # -- stage 0: write-mode gate (before any schema work) -----------------
    blocked = None
    if modes is not None:
        from axonops_schema_registry_spark.registry.modes import (
            with_resolved_mode,
            write_block_status,
        )

        flagged = with_resolved_mode(incoming, modes, ctx_col=ctx_col) \
            .withColumn("__block", write_block_status())
        blocked = flagged.filter(F.col("__block").isNotNull()).select(
            *(([ctx_col] if ctx_col else []) + ["subject"]), "seq",
            F.col("__block").alias("status"),
            F.lit(None).cast("int").alias("assigned_version"),
            F.lit(0).alias("n_issues"))
        incoming = (flagged.filter(F.col("__block").isNull())
                    .drop("__block", "resolved_mode"))

    if native_fingerprint:
        # opaque (non-schema) content: sha2 over raw text stays entirely
        # JVM-side — no Python workers in the fingerprint stage.  Use for
        # RAW corpora; parsed schema types need the canonical-form UDF.
        def fp(text_col: str, _type_col: str):
            return F.sha2(F.col(text_col), 256)
    else:
        fp = fingerprint_udf(strict=True)  # dedup must distinguish defaults

    if "deleted" not in existing.columns:
        existing = existing.withColumn("deleted", F.lit(False))
    # cached: existing feeds dedup, the compat history AND prior-max —
    # without the cache the fingerprint UDF would run 3x over the corpus.
    # Lifetime: registered for facade-level release
    # (operators.core.release_plan_caches); at 100 TB prefer writing
    # fingerprints as a corpus column (they're content-stable) so this
    # stage caches nothing.
    from axonops_schema_registry_spark.operators.core import plan_cache

    existing_fp = plan_cache(existing.withColumn(
        "fingerprint", fp("schema_text", "schema_type")))
    existing_live = existing_fp.filter(~F.col("deleted"))
    inc = plan_cache(incoming.withColumn(
        "fingerprint", fp("schema_text", "schema_type")))

    # -- stage 2: dedup vs the existing corpus (live rows only) -----------
    # with a compatibility group, idempotency scopes to the group too
    # (reference dedup requires metadata equality, registry.go:121-131)
    dup_keys = base_keys + ["fingerprint"] + ([group_col] if group_col else [])
    dup_vs_existing = existing_live.select(*dup_keys).distinct() \
        .withColumn("dup_existing", F.lit(True))
    inc = (inc
           .join(dup_vs_existing, dup_keys, "left")
           .withColumn("dup_existing",
                       F.coalesce(F.col("dup_existing"), F.lit(False))))
    candidates = inc.filter(~F.col("dup_existing"))

    # -- stage 3: compatibility gate --------------------------------------
    gate_keys = base_keys + ([group_col] if group_col else [])
    vf = validate_fields and metadata_col is not None
    if mode == "NONE" and levels is None and not vf:
        # no gate → every non-duplicate registers; sequential semantics
        # degenerate to first-occurrence-wins, expressible declaratively
        # with zero Python stages
        w_batch = Window.partitionBy(*dup_keys).orderBy("seq")
        flagged = candidates.withColumn(
            "__dup_in_batch", F.row_number().over(w_batch) > 1)
        verdict = flagged.select(
            *base_keys, "seq",
            F.when(F.col("__dup_in_batch"), "duplicate")
             .otherwise("registered").alias("status"),
            F.lit(0).alias("n_issues"))
    else:
        gate_in = candidates.select(
            *base_keys, "seq", "schema_type", "schema_text",
            "fingerprint",
            *([group_col] if group_col else []),
            *([F.col(metadata_col).alias("__metadata")] if vf else []))
        if levels is not None:
            from axonops_schema_registry_spark.registry.modes import (
                with_resolved_level,
            )

            gate_in = (with_resolved_level(gate_in, levels,
                                           ctx_col=ctx_col, default=mode)
                       .withColumnRenamed("resolved_level", "__level"))
        history = existing_live.select(
            *base_keys, "version", F.col("schema_text").alias("old_text"),
            *([group_col] if group_col else []),
            *([F.col(metadata_col).alias("__metadata")] if vf else []))
        verdict = (gate_in
                   .groupBy(*gate_keys)
                   .cogroup(history.groupBy(*gate_keys))
                   .applyInPandas(_sequential_gate(mode, ctx_col=ctx_col,
                                                   validate_fields=vf),
                                  _gate_schema(ctx_col)))

    # -- stage 4: version assignment (max over ALL rows incl. deleted) ----
    prior_max = existing_fp.groupBy(*base_keys).agg(
        F.max("version").alias("prior_max"))
    verdict_keys = base_keys + ["seq"]
    accepted = (candidates.join(
        verdict.filter(F.col("status") == "registered")
               .select(*verdict_keys), verdict_keys))
    w_assign = Window.partitionBy(*base_keys).orderBy("seq")
    # no broadcast hint: prior_max is one row per CORPUS subject (can be
    # millions at fleet scale) while the batch side is small — AQE
    # broadcasts whichever side actually is small
    assigned = (accepted
                .join(prior_max, base_keys, "left")
                .withColumn("assigned_version",
                            (F.coalesce(F.col("prior_max"), F.lit(0))
                             + F.row_number().over(w_assign)).cast("int")))

    # -- assemble statuses -------------------------------------------------
    dupes_existing = inc.filter(F.col("dup_existing")).select(
        *base_keys, "seq", F.lit("duplicate").alias("status"),
        F.lit(None).cast("int").alias("assigned_version"),
        F.lit(0).alias("n_issues"))
    dupes_in_batch = (candidates
                      .join(verdict.filter(F.col("status") == "duplicate")
                                   .select(*verdict_keys),
                            verdict_keys)
                      .select(*base_keys, "seq",
                              F.lit("duplicate").alias("status"),
                              F.lit(None).cast("int")
                              .alias("assigned_version"),
                              F.lit(0).alias("n_issues")))
    rejected = (candidates
                .join(verdict.filter(F.col("status").isin(
                          "incompatible", "reserved_conflict"))
                             .select(*verdict_keys, "status", "n_issues"),
                      verdict_keys)
                .select(*base_keys, "seq", "status",
                        F.lit(None).cast("int").alias("assigned_version"),
                        "n_issues"))
    registered = assigned.select(
        *base_keys, "seq", F.lit("registered").alias("status"),
        "assigned_version", F.lit(0).alias("n_issues"))
    out = (registered.unionByName(rejected)
           .unionByName(dupes_in_batch).unionByName(dupes_existing))
    if blocked is not None:
        out = out.unionByName(blocked)
    return out


def import_batch(spark: SparkSession, existing: DataFrame,
                 incoming: DataFrame,
                 modes: DataFrame | None = None) -> DataFrame:
    """S9 bulk import with explicit IDs + conflict detection
    (/root/reference/internal/registry/registry.go:1184-1309).

    ``existing``: (schema_id, fingerprint); ``incoming``: (schema_id,
    subject, fingerprint).  Status per incoming row:
    - ``imported``  — id unknown, claim it;
    - ``exists``    — id known with the SAME fingerprint (idempotent);
    - ``conflict``  — id known with a DIFFERENT fingerprint (the
      reference's 409/42201 import conflict);
    - ``not_import_mode`` — when a ``modes`` table is given and the
      subject's resolved mode is not IMPORT (explicit-ID import REQUIRES
      IMPORT mode, handlers.go:1656-1664).
    """
    if modes is not None:
        from axonops_schema_registry_spark.registry.modes import (
            with_resolved_mode,
        )

        incoming = with_resolved_mode(incoming, modes)
    # No broadcast hint: ``existing`` is the full corpus (the BIG side at
    # scale) — the shuffle keys on schema_id and AQE picks broadcast when
    # the batch actually is small.
    ex = existing.select(F.col("schema_id"),
                         F.col("fingerprint").alias("existing_fp"))
    joined = incoming.join(ex, "schema_id", "left")
    status = (F.when(F.col("existing_fp").isNull(), "imported")
               .when(F.col("existing_fp") == F.col("fingerprint"), "exists")
               .otherwise("conflict"))
    if modes is not None:
        status = F.when(F.col("resolved_mode") != "IMPORT",
                        "not_import_mode").otherwise(status)
    return joined.select("schema_id", "subject", "fingerprint",
                         status.alias("status"))
