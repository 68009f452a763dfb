#!/usr/bin/env python
"""ccb1 A/B under the driver protocol (VERDICT r18 ask #1): one cold
JVM, bench.py's warm recipe (full-SF page cache + smoke/full plan
passes), then min-of-3 timed runs of the ccb1 spec with clearCache
before each — for ONE variant per process, so JIT state never leaks
across arms.

Usage: python scripts/r19_ccb1_ab.py {cache|nocache}
  cache   — unigram_surprisal as shipped (shared token frame cached)
  nocache — plain factoring: same token frame definition, no cache
            (the r17 execution shape: the explode runs once per half)
"""

from __future__ import annotations

import glob
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE = "/root/testdata/sf0.001"


def main() -> None:
    variant = sys.argv[1]
    assert variant in ("cache", "nocache")

    from axonops_schema_registry_spark.llm import text as T
    from axonops_schema_registry_spark.queries import SPEC_BY_NAME
    from axonops_schema_registry_spark.session import get_spark

    if variant == "nocache":
        def plain(docs, id_col="doc_id", text_col="text"):
            toks = T._lm_tokens(docs, id_col, text_col)
            return T._score_tokens(toks, T._lm_from_tokens(toks),
                                   id_col)

        T.unigram_surprisal = plain

    spark = get_spark("ccb1-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spec = SPEC_BY_NAME["ccb1_perplexity_buckets"]

    # bench.py's warm protocol, scoped to this plan
    for f in sorted(glob.glob(os.path.join(SF_DIR, "*.parquet"))):
        paths = ([f] if os.path.isfile(f) else
                 sorted(glob.glob(os.path.join(f, "*.parquet"))))
        for p in paths:
            with open(p, "rb") as fh:
                while fh.read(1 << 24):
                    pass
    spec.build(spark, SMOKE).collect()
    spark.catalog.clearCache()
    spec.build(spark, SF_DIR).collect()

    best = float("inf")
    draws = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        spec.build(spark, SF_DIR).collect()
        dt = time.perf_counter() - t0
        draws.append(round(dt, 3))
        best = min(best, dt)
    print(f"RESULT {variant} min={best:.3f} draws={draws}")


if __name__ == "__main__":
    main()
