"""Write-mode gating (READWRITE / READONLY / READONLY_OVERRIDE / IMPORT).

Re-expresses the reference's mode dimension and write gate
(/root/reference/internal/storage/storage.go:144-147 ModeRecord,
/root/reference/internal/registry/registry_helpers.go:14-23
CheckModeForWrite, registry.go:889-930 GetMode fallback chain,
api/handlers/handlers.go:605-660 registration gating) as declarative
Spark joins:

- a ``modes`` table of (subject, mode) rows where ``subject IS NULL``
  carries the global mode (ModeRecord's "empty for global" convention);
- resolution per subject: READONLY_OVERRIDE on the global row is a kill
  switch that beats per-subject modes; otherwise per-subject → global →
  READWRITE default;
- normal registration is blocked by READONLY/READONLY_OVERRIDE
  (status ``readonly_mode``, the 42205 error) and by IMPORT (status
  ``import_mode`` — explicit-ID import is the only write IMPORT allows);
- bulk import with explicit IDs REQUIRES IMPORT mode (status
  ``not_import_mode`` otherwise, handlers.go:1656-1664).

Scale: the modes table is configuration (tiny) — always broadcast; the
resolution is one broadcast join + a literal coalesce chain, no shuffle
of the data side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MODES = ("READWRITE", "READONLY", "READONLY_OVERRIDE", "IMPORT")

WRITE_BLOCKING = ("READONLY", "READONLY_OVERRIDE")


def _global_mode(modes: DataFrame) -> Column:
    """The global mode as a scalar subquery-style literal-ish column:
    a 1-row aggregate cross-joined by the caller."""
    return (modes.filter(F.col("subject").isNull())
            .agg(F.max("mode").alias("global_mode")))


DEFAULT_CONTEXT = "."
GLOBAL_CONTEXT = "__GLOBAL"


def with_resolved_mode(df: DataFrame, modes: DataFrame,
                       subject_col: str = "subject",
                       ctx_col: str | None = None) -> DataFrame:
    """Attach ``resolved_mode`` to ``df`` per the fallback chain.

    Two shapes:

    - ``modes`` = (subject nullable, mode): 3-tier chain — kill switch →
      per-subject → global row → READWRITE.
    - ``modes`` = (registry_ctx, subject nullable, mode) AND ``ctx_col``
      given: the reference's full 4-tier chain (registry.go:889-930) —
      READONLY_OVERRIDE on the default context's global row (itself
      resolved default ctx → __GLOBAL, registry.go:933-960) beats all;
      then per-(ctx, subject) → ctx global → __GLOBAL context global →
      READWRITE.

    Everything is configuration-sized → broadcast joins only; the data
    side of ``df`` never shuffles.
    """
    if ctx_col is None or "registry_ctx" not in modes.columns:
        subj_modes = (modes.filter(F.col("subject").isNotNull())
                      .select(F.col("subject").alias(subject_col),
                              F.col("mode").alias("__subject_mode")))
        glob = _global_mode(modes)
        out = (df
               .join(F.broadcast(subj_modes), subject_col, "left")
               .crossJoin(F.broadcast(glob)))
        resolved = (F.when(F.col("global_mode") == "READONLY_OVERRIDE",
                           F.lit("READONLY_OVERRIDE"))
                    .otherwise(F.coalesce(F.col("__subject_mode"),
                                          F.col("global_mode"),
                                          F.lit("READWRITE"))))
        return (out.withColumn("resolved_mode", resolved)
                   .drop("__subject_mode", "global_mode"))

    globals_ = modes.filter(F.col("subject").isNull())
    # resolveGlobalMode: default ctx global, else __GLOBAL ctx global
    kill = (globals_
            .filter(F.col("registry_ctx").isin(DEFAULT_CONTEXT,
                                               GLOBAL_CONTEXT))
            .agg(F.max(F.when(F.col("registry_ctx") == DEFAULT_CONTEXT,
                              F.col("mode"))).alias("__default_glob"),
                 F.max(F.when(F.col("registry_ctx") == GLOBAL_CONTEXT,
                              F.col("mode"))).alias("__global_glob")))
    subj_modes = (modes.filter(F.col("subject").isNotNull())
                  .select(F.col("registry_ctx").alias(ctx_col),
                          F.col("subject").alias(subject_col),
                          F.col("mode").alias("__subject_mode")))
    ctx_glob = (globals_
                .filter(F.col("registry_ctx") != GLOBAL_CONTEXT)
                .select(F.col("registry_ctx").alias(ctx_col),
                        F.col("mode").alias("__ctx_mode")))
    out = (df
           .join(F.broadcast(subj_modes), [ctx_col, subject_col], "left")
           .join(F.broadcast(ctx_glob), ctx_col, "left")
           .crossJoin(F.broadcast(kill)))
    resolved_kill = F.coalesce(F.col("__default_glob"),
                               F.col("__global_glob"))
    resolved = (F.when(resolved_kill == "READONLY_OVERRIDE",
                       F.lit("READONLY_OVERRIDE"))
                .otherwise(F.coalesce(F.col("__subject_mode"),
                                      F.col("__ctx_mode"),
                                      F.col("__global_glob"),
                                      F.lit("READWRITE"))))
    return (out.withColumn("resolved_mode", resolved)
               .drop("__subject_mode", "__ctx_mode", "__default_glob",
                     "__global_glob"))


def with_resolved_level(df: DataFrame, levels: DataFrame,
                        subject_col: str = "subject",
                        ctx_col: str | None = None,
                        default: str = "BACKWARD") -> DataFrame:
    """Attach ``resolved_level`` (compatibility level) per the reference's
    GetConfigFull 4-tier chain (registry.go:706-776):

    - ``levels`` = (subject nullable, level): subject config → global row
      → ``default`` (the 3-tier shape j6/r7 already used).
    - ``levels`` = (registry_ctx, subject nullable, level) AND ``ctx_col``
      given: per-(ctx, subject) config → ctx-level global → __GLOBAL
      context global → ``default``.  Unlike modes there is NO kill
      switch — levels only fall through.

    Configuration-sized broadcast joins only; ``df`` never shuffles.
    """
    if ctx_col is None or "registry_ctx" not in levels.columns:
        subj = (levels.filter(F.col("subject").isNotNull())
                .select(F.col("subject").alias(subject_col),
                        F.col("level").alias("__subject_level")))
        glob = (levels.filter(F.col("subject").isNull())
                .agg(F.max("level").alias("__global_level")))
        out = (df.join(F.broadcast(subj), subject_col, "left")
                 .crossJoin(F.broadcast(glob)))
        resolved = F.upper(F.coalesce(F.col("__subject_level"),
                                      F.col("__global_level"),
                                      F.lit(default)))
        return (out.withColumn("resolved_level", resolved)
                   .drop("__subject_level", "__global_level"))

    globals_ = levels.filter(F.col("subject").isNull())
    subj = (levels.filter(F.col("subject").isNotNull())
            .select(F.col("registry_ctx").alias(ctx_col),
                    F.col("subject").alias(subject_col),
                    F.col("level").alias("__subject_level")))
    ctx_glob = (globals_
                .filter(F.col("registry_ctx") != GLOBAL_CONTEXT)
                .select(F.col("registry_ctx").alias(ctx_col),
                        F.col("level").alias("__ctx_level")))
    global_glob = (globals_
                   .filter(F.col("registry_ctx") == GLOBAL_CONTEXT)
                   .agg(F.max("level").alias("__global_level")))
    out = (df
           .join(F.broadcast(subj), [ctx_col, subject_col], "left")
           .join(F.broadcast(ctx_glob), ctx_col, "left")
           .crossJoin(F.broadcast(global_glob)))
    resolved = F.upper(F.coalesce(F.col("__subject_level"),
                                  F.col("__ctx_level"),
                                  F.col("__global_level"),
                                  F.lit(default)))
    return (out.withColumn("resolved_level", resolved)
               .drop("__subject_level", "__ctx_level", "__global_level"))


def write_block_status(mode_col: str = "resolved_mode") -> Column:
    """NULL when writes are allowed, else the blocking status string for
    NORMAL registration (no explicit ID)."""
    return (F.when(F.col(mode_col).isin(*WRITE_BLOCKING),
                   F.lit("readonly_mode"))
            .when(F.col(mode_col) == "IMPORT", F.lit("import_mode")))
