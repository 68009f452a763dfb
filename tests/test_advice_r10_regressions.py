"""Regression pins for the ADVICE r10 findings.

1. DSIR1_ORACLE's nrt CTE must COALESCE the target-slice total to 0 —
   a corpus with NO source='src0' rows otherwise NULLs every oracle
   weight while the Spark operator degrades to a uniform target LM
   (the CUR2_ORACLE already coalesced; dsir1's now matches).
2. A data-holding store without params.json (pre-pinning legacy) must
   refuse to auto-pin — covered in test_dedup_store_production.py
   (test_legacy_store_without_params_refuses_auto_pin).
3. min_span_words island-granularity approximation — documented in the
   remove_duplicated_spans docstring; behavior pinned here: an island
   merged from SHORT overlapping matches is still gated by its merged
   width (the documented conservative-toward-removal semantics).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from axonops_schema_registry_spark.queries import SPEC_BY_NAME
from tests.oracle_harness import _frame_result, spark_result


@pytest.fixture()
def empty_target_sf_dir(spark, tmp_path):
    """A documents table with ZERO source='src0' rows (the dsir1
    target slice) — the edge where the oracle's bare SUM went NULL."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(30)), "en",
          f"srcX{i % 3}", 30) for i in range(1, 61)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    out = str(tmp_path / "documents.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_dsir1_oracle_matches_operator_on_empty_target(
        spark, empty_target_sf_dir):
    spec = SPEC_BY_NAME["dsir1_importance_selection"]
    scols, srows = spark_result(spark, spec, empty_target_sf_dir)
    con = duckdb.connect()
    # Spark writes documents.parquet as a DIRECTORY of part files
    path = os.path.join(empty_target_sf_dir, "documents.parquet",
                        "*.parquet")
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM read_parquet('{path}')")
    ocols, orows = _frame_result(con.execute(spec.oracle).fetchdf())
    con.close()
    assert scols == ocols
    assert len(srows) == len(orows) > 0
    # the weights must be REAL numbers (uniform-target degradation),
    # not NULLs — the exact failure the bare SUM produced
    for s, o in zip(srows, orows):
        assert s == o
        assert ("null",) not in s


def test_min_span_words_gates_on_merged_island_width(spark):
    """Two distinct 8-gram matches (different partners) that ABUT in
    one document merge into a single island; min_span_words compares
    against the MERGED width, so the chained island is cut even though
    no single duplicated substring reaches the gate — the documented
    island-granularity approximation (never a false negative; may cut
    chains of shorter matches)."""
    from axonops_schema_registry_spark.llm.dedup import (
        remove_duplicated_spans,
    )

    w = [f"w{j}" for j in range(1, 17)]            # doc 1: w1..w16
    f9 = " ".join(f"g{j}" for j in range(9))
    h9 = " ".join(f"h{j}" for j in range(9))
    docs = spark.createDataFrame(
        [(1, " ".join(w)),
         # shares w1..w10 with doc 1 → duplicates doc-1 k-gram
         # positions 1..3 (each match only 10 words long)
         (2, " ".join(w[0:10]) + " " + f9),
         # shares w4..w13 with doc 1 → duplicates positions 4..6;
         # 1..3 and 4..6 are CONSECUTIVE, so doc 1's island merges
         # to positions 1..6 = 13 words wide
         (3, " ".join(w[3:13]) + " " + h9)],
        "doc_id bigint, text string")
    out = {r.id: r.n_removed
           for r in remove_duplicated_spans(
               docs, min_span_words=12).collect()}
    # doc 1's merged island is 13 wide (>= 12) though no single
    # duplicated substring exceeds 10 words: the merged-width gate
    # cuts it (words 1..13)
    assert out[1] == 13
    # docs 2/3 hold single 10-wide islands (< 12): kept intact
    assert out[2] == 0 and out[3] == 0
